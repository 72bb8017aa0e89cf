"""Persistent XLA compilation cache for the transport executables.

Some of this framework's executables are expensive to build — the Mosaic
event-block kernels compile in ~2 minutes and the queued-radiance general
kernel with the Iwabuchi estimator was measured at 5.5 minutes — and the
TPU relay in the bench environment has killed worker processes during
back-to-back long compiles.  The persistent cache makes every repeated
run (drivers, bench re-runs, the benchmark-case suite, test sessions on
the same scene shapes) reuse the compiled artifact across processes.

Enabled automatically when the integrator layer loads; opt out with
I3RC_COMPILE_CACHE=0, redirect with I3RC_COMPILE_CACHE_DIR=<path>.
Failures are swallowed: the cache is an optimization, never a dependency.
"""

from __future__ import annotations

import os

_DONE = False


def enable() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("I3RC_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        path = os.environ.get(
            "I3RC_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "i3rc_tpu_xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Only executables worth the disk round-trip; tiny kernels recompile
        # faster than they deserialize.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - best effort only
        pass
