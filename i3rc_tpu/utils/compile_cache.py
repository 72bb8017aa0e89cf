"""Persistent XLA compilation cache for the transport executables.

Some of this framework's executables are expensive to build — the Mosaic
event-block kernels compile in ~2 minutes and the queued-radiance general
kernel with the Iwabuchi estimator was measured at 5.5 minutes — and the
TPU relay in the bench environment has killed worker processes during
back-to-back long compiles.  The persistent cache makes every repeated
run (drivers, bench re-runs, the benchmark-case suite, test sessions on
the same scene shapes) reuse the compiled artifact across processes.

Persistence is scoped to ACCELERATOR backends by default.  CPU AOT
executables embed the compile machine's vector features PLUS XLA-chosen
pseudo-features (+prefer-no-scatter/+prefer-no-gather) that host feature
detection never reports, so reloading a CPU artifact logs cpu_aot_loader
feature-mismatch errors on every load — even on the host that compiled
it — and a genuinely foreign artifact can SIGILL.  No directory keying
fixes the pseudo-feature complaint (measured: the round-3
host-fingerprint key still logged it), so CPU persistence is opt-in:
set I3RC_COMPILE_CACHE_CPU=1 (same-host dev loops only) or point
I3RC_COMPILE_CACHE_DIR=<path> explicitly.  TPU executables are
serialized against the chip generation, which the platform name in the
directory key captures.

Enabled automatically when the integrator layer loads — unless the
embedding application (or JAX_COMPILATION_CACHE_DIR / explicit
jax.config) already configured a cache dir, which is left untouched.
Opt out entirely with I3RC_COMPILE_CACHE=0.
Failures are swallowed: the cache is an optimization, never a dependency.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False


def _host_fingerprint() -> str:
    """Short stable fingerprint of the host CPU's instruction-set features.

    Two hosts with the same flags load each other's CPU AOT artifacts
    safely; anything else gets its own cache subdirectory.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("I3RC_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        if (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir):
            # An embedding application already chose a cache location —
            # don't clobber it (and leave its min-time/size policy alone).
            return
        explicit = os.environ.get("I3RC_COMPILE_CACHE_DIR")
        if explicit:
            path = explicit
        else:
            backend = jax.default_backend()
            if backend == "cpu" and \
                    os.environ.get("I3RC_COMPILE_CACHE_CPU", "0") != "1":
                # CPU AOT reloads log feature-mismatch errors by design
                # (see module docstring) — persistence is accelerator-only
                # unless explicitly requested.
                return
            key = backend if backend != "cpu" \
                else f"cpu-{_host_fingerprint()}"
            path = os.path.join(os.path.expanduser("~"), ".cache",
                                f"i3rc_tpu_xla-{key}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Only executables worth the disk round-trip; tiny kernels recompile
        # faster than they deserialize.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - best effort only
        pass
