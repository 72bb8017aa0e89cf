"""Profiler integration: jax.profiler traces + per-phase kernel timing.

The reference records only coarse setup/total wall-clock (`cpu_time`,
Example-Drivers/monteCarloDriver.f95:255-259, persisted as netCDF attrs
:701-703).  Here the analog is a real device trace: wrap any run in
``jax.profiler.trace(dir)`` (bench.py --profile, drivers --profile) and
``profile_report`` parses the captured xplane with xprof into a per-phase
device-time table — transport kernel vs tally/refill vs reductions — the
per-kernel breakdown SURVEY.md section 5 asks for.
"""

from __future__ import annotations

import glob
import json
import os

# Heuristic phase buckets for this framework's kernels, keyed by HLO
# category (xprof's "hlo_stats" tool).
_PHASES = (
    ("custom-call", "transport kernel (Pallas event block)"),
    ("reduce-window", "lane refill (cumulative sum)"),
    ("convolution", "tally / table reads (one-hot matmul)"),
    ("loop fusion", "elementwise transport (XLA-fused event step)"),
    ("data formatting", "layout / broadcast glue"),
    ("reduce", "reductions (counters, loop condition)"),
)


def latest_xplane(trace_dir: str) -> str | None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    return max(paths, key=os.path.getmtime) if paths else None


def hlo_self_times(xplane_path: str):
    """[(category, op_name, occurrences, self_time_us)] from an xplane."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in d["cols"]]
    i_cat = cols.index("HLO op category")
    i_name = cols.index("HLO op name")
    i_occ = cols.index("#Occurrences")
    i_self = cols.index("Total self time (us)")
    rows = []
    for r in d["rows"]:
        vals = [(c or {}).get("v") for c in r["c"]]
        rows.append((str(vals[i_cat]), str(vals[i_name]),
                     int(float(vals[i_occ] or 0)), float(vals[i_self] or 0.0)))
    return rows


def profile_report(trace_dir: str) -> str:
    """Per-phase device-time table for the newest trace under trace_dir."""
    path = latest_xplane(trace_dir)
    if path is None:
        return f"# no xplane trace found under {trace_dir}"
    try:
        rows = hlo_self_times(path)
    except Exception as e:  # xprof optional: report, don't fail the run
        return f"# trace captured at {path}; xprof parse failed: {e}"
    total = sum(r[3] for r in rows) or 1.0
    by_phase = {}
    for cat, _name, _occ, self_us in rows:
        for key, label in _PHASES:
            if cat.startswith(key):
                by_phase[label] = by_phase.get(label, 0.0) + self_us
                break
        else:
            by_phase["other"] = by_phase.get("other", 0.0) + self_us
    lines = [f"# device time by phase ({os.path.basename(path)}; "
             f"total {total/1e3:.2f} ms)"]
    for label, us in sorted(by_phase.items(), key=lambda kv: -kv[1]):
        lines.append(f"#   {label:<48s} {us/1e3:9.2f} ms  {100*us/total:5.1f}%")
    top = sorted(rows, key=lambda r: -r[3])[:5]
    lines.append("# top ops:")
    for cat, name, occ, self_us in top:
        lines.append(f"#   {name:<28s} {cat:<18s} x{occ:<6d} {self_us/1e3:9.2f} ms")
    return "\n".join(lines)
