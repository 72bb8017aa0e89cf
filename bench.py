"""Headline benchmark + on-TPU smoke checks for the i3rc_tpu framework.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline",          # headline flux case
   "checks_passed": bool,                              # on-TPU smoke suite
   "extra_metrics": [...]}                             # radiance / Landsat /
                                                       # broadband rows
Baseline target: 5e8 photons/sec/chip (BASELINE.json).

Headline workload: I3RC phase-1 case 1 (32x1x32 step cloud, tau 2/18,
HG g=0.85, conservative), solar mu0=0.5, flux outputs — the reference's
shipped monteCarloDriver configuration domain; maximum cross-section
transport (monteCarloRadiativeTransfer.f95:492-497; the TPU-optimal
default for this domain).

The smoke checks run ON the bench device (TPU), where f32-vs-bf16 matmul
precision classes of bug live (see ops/gather.DOT_PRECISION; CPU tests
cannot catch those):
  1. energy closure: conservative cloud + black surface -> Fup + Fdn == 1
  2. step-cloud Fup vs the recorded cross-validated value (0.5805)
  3. Beer-Lambert direct transmission through an absorbing slab via the
     GENERAL wavefront kernel (exercises one-hot table reads end-to-end)

Flags: --quick (1/8 photons), --profile (capture a jax.profiler trace and
print a per-phase time table to stderr), --no-extras (headline only).

Time budget: the driver wraps this script in an external `timeout`; a
run that exceeds it records rc=124 and NO metric at all (this happened
in round 4: a new row's cold compile pushed the total past the cap and
the whole round's bench was lost).  So the script enforces its own
budget (BENCH_TIME_BUDGET_S, default 1200 s) from a watchdog THREAD —
a thread, not a signal handler, because SIGTERM/SIGALRM handlers only
run between Python bytecodes and an XLA compile blocks the main thread
in C for minutes.  When the budget expires the watchdog prints the JSON
line with every row completed so far and hard-exits; each extra row is
additionally skipped up front if the remaining budget is below its
historical cost, so the headline + checks always make it out.
"""

import argparse
import json
import logging
import sys
import time

logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)


def _median_time(fn, keys, ready):
    times = []
    for k in keys:
        t0 = time.perf_counter()
        res = fn(k)
        ready(res)
        # Defensive sync: a tiny device_get is an unconditional barrier even
        # where an experimental backend's block_until_ready is unreliable
        # (adds one scalar transfer, <1 ms, to every timed rep uniformly).
        import jax as _jax
        import numpy as _np
        _np.asarray(_jax.tree.leaves(res)[0]).ravel()[:1]
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], res


def _drain(arr):
    """block_until_ready + a scalar device_get: the unconditional barrier
    (see _median_time) applied to warm-up runs so no pending work leaks
    into the first timed rep."""
    import jax as _jax
    import numpy as _np
    _jax.block_until_ready(arr)
    _np.asarray(arr).ravel()[:1]


def run_headline(jax, scale, n_runs=3):
    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    # 2^30 photons per dispatch: the persistent-photon refill keeps lane
    # occupancy high through the bulk of the run; the drain tail (up to
    # max_events after the last launch) amortizes to ~nothing at this size
    # (measured round 3, with the device_get timing barrier: 265M photons/s
    # at 2^24 -> 462M at 2^27 -> 495M at 2^29 -> 510M at 2^30, same kernel —
    # collision chaining depth 3; ~2.1 s per dispatch).
    n_photons = (1 << 30) // scale
    integ = _step_cloud_integrator(
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False))
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 18, n_photons))
    key = jax.random.key(0, impl="rbg")
    for i in range(2):  # compile + dispatch settling
        res = fn(jax.random.fold_in(key, 100 + i))
        _drain(res.flux_up)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(n_runs)],
                           lambda r: jax.block_until_ready(r.flux_up))
    return n_photons / dt, res, dt


def run_radiance(jax, scale):
    """Step cloud + the 3 standard I3RC radiance detectors (fastpath)."""
    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    # Detectors ride the Mosaic event block for closed-shadow HG plans
    # (collisions record (contribution, column) pairs; the glue tallies) —
    # measured 36 -> 107 M photons/s late round 3.  Big dispatches amortize
    # the drain tail exactly like the flux headline.
    n_photons = (1 << 27) // scale
    integ = _step_cloud_integrator(
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False))
    integ = integ.with_params(intensity_mus=[1.0, 0.5, 0.5],
                              intensity_phis=[0.0, 0.0, 180.0])
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 18, n_photons))
    key = jax.random.key(1, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.intensity)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(3)],
                           lambda r: jax.block_until_ready(r.intensity))
    return n_photons / dt, res


def run_glint(jax, scale):
    """Thin cirrus over a Cox-Munk ocean, flux only: the BRDF fastpath row.

    Round-4 gate (VERDICT r3 #1): the Wishlist BRDF surfaces elect the
    fused fastpath + Pallas event block — bottom hits pend as kind 2, the
    per-block glue samples the cosine-weighted outgoing direction and
    carries the max(R,1) weight.  tau=0.2 so most photons actually reach
    the surface and the BRDF path dominates the workload."""
    import numpy as np
    from i3rc_tpu import Domain, Integrator, PhaseFunction, SurfaceDescription
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.phase_functions import (
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.config import IntegratorConfig

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(
            henyey_greenstein_coefficients(0.75, 48))], key=[1.0])
    dom = Domain.create([0.0, 1000.0], [0.0, 1000.0], [0.0, 1000.0])
    ext = np.full((1, 1, 1), 0.2 / 1000.0)
    dom = dom.add_component("cirrus", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    surface = SurfaceDescription.uniform([5.0, 1.34], brdf_name="cox_munk")
    n_photons = (1 << 27) // scale
    integ = Integrator.create(
        dom, surface=surface,
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False))
    fn = integ.batch_fn(PhotonSource.directional(0.707, 0.0), n_photons,
                        n_lanes=min(1 << 18, n_photons))
    key = jax.random.key(5, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.flux_up)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(3)],
                           lambda r: jax.block_until_ready(r.flux_up))
    return n_photons / dt, res


def run_landsat(jax, scale):
    """I3RC case 4 (128x128x119 Landsat scene) flux — the large-domain path."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.landsat_cloud import make_landsat_cloud

    # Tuned column-mode shape (PERF_NOTES.md round-3 column ledger): narrow
    # wavefront (2^15 lanes), deep K=32 event blocks, big dispatch — the
    # factored one-hot column read scales super-linearly with lane count.
    n_photons = (1 << 23) // scale
    integ = Integrator.create(
        make_landsat_cloud(1.0),
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False))
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 15, n_photons))
    key = jax.random.key(2, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.flux_up)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(2)],
                           lambda r: jax.block_until_ready(r.flux_up))
    return n_photons / dt, res


def run_landsat_general(jax, scale):
    """Landsat flux through the GENERAL kernel (fastpath off): the
    serial-gather chained flux tracer (wavefront.make_chained_flux_tracer).
    Regression row for VERDICT r2 #2 — the >262k-cell general-domain path."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.landsat_cloud import make_landsat_cloud

    n_photons = (1 << 21) // scale
    integ = Integrator.create(
        make_landsat_cloud(1.0),
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False,
                                use_fastpath=False))
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 16, n_photons))
    key = jax.random.key(6, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.flux_up)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(2)],
                           lambda r: jax.block_until_ready(r.flux_up))
    return n_photons / dt, res


def run_landsat_absorbing_radiance(jax, scale):
    """Landsat ssa=0.99 + 2 detectors: the GENERAL kernel (no fast route —
    column media exclude detectors), queued local estimation.  The
    regression row for the big-domain non-fastpath class (VERDICT r2 #10)."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.landsat_cloud import make_landsat_cloud

    # Round-5 shape retune (scan on the bench chip): the chained
    # ratio-tracking radiance kernel is tail- and occupancy-bound, not
    # width-bound — 2^21 photons through NARROW 2^13-lane wavefronts beat
    # the round-4 2^17/2^15 shape 4x (1.15e5 vs 2.9e4 photons/s; wider
    # 2^15 lanes WASTE lanes frozen on pending ray slots, and small
    # dispatches pay the ray-drain tail every time).
    n_photons = (1 << 21) // scale
    integ = Integrator.create(
        make_landsat_cloud(0.99),
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False),
        intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 13, n_photons))
    key = jax.random.key(3, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.intensity)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(2)],
                           lambda r: jax.block_until_ready(r.intensity))
    return n_photons / dt, res


def run_general_radiance(jax, scale):
    """Step cloud + 3 detectors through the GENERAL kernel (fastpath off):
    the queued (persistent-ray) local-estimation path every non-default
    estimator configuration rides."""
    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    n_photons = (1 << 19) // scale
    integ = _step_cloud_integrator(
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False,
                                use_fastpath=False, majorant_block_size=16))
    integ = integ.with_params(intensity_mus=[1.0, 0.5, 0.5],
                              intensity_phis=[0.0, 0.0, 180.0])
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 16, n_photons))
    key = jax.random.key(4, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.intensity)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(2)],
                           lambda r: jax.block_until_ready(r.intensity))
    return n_photons / dt, res


def run_spectral(jax, scale):
    """Spectral k-distribution loop (1 band x 2 k) over the step cloud."""
    import numpy as np

    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.k_distribution import KDistribution
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.models.step_cloud import make_step_cloud

    # 2^24 photons/batch: the per-k baked Pallas dispatches amortize their
    # fixed costs (measured 126 M/s at 2^22 -> 320 M/s at 2^24; 2^26-single-
    # batch regresses to 240 M/s).
    n_per_batch = (1 << 24) // scale
    n_batches = 2
    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    kd = [KDistribution.create(
        z, np.broadcast_to([[4e-4, 4e-3]], (32, 2)).copy(), [0.7, 0.3],
        wavelength_limits=(2.6, 2.8), spectral_fraction=1.0)]
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=False,
                           majorant_block_size=16)
    # Steady-state spectral loop with baked per-k fastpath executables
    # (spectral.run_band(bake_fastpath=True)): each k-point's gas profile
    # bakes into a gas-channel fastpath compile, cached across band runs in
    # integrator_cache — the timed pass measures transport, not compiles.
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component, run_band
    z0 = np.asarray(dom.z_edges)
    dom_gas = domain_with_gas_component(
        dom, kd[0].absorption_profiles_on(z0)[:, 0])
    integ = Integrator.create(dom_gas, config=cfg)
    cache = {}
    warm = run_band(integ, dom, kd[0], src, n_per_batch, n_batches, seed=5,
                    bake_fastpath=True, integrator_cache=cache)  # warm + compile
    np.asarray(warm.mean.flux_up).ravel()[:1]   # drain before timing
    t0 = time.perf_counter()
    band = run_band(integ, dom, kd[0], src, n_per_batch, n_batches, seed=6,
                    bake_fastpath=True, integrator_cache=cache)
    # device_get barrier: run_band returns device arrays; without a real
    # transfer the async relay under-measures (see _median_time).
    np.asarray(band.mean.flux_up).ravel()[:1]
    dt = time.perf_counter() - t0
    n_traced = n_per_batch * n_batches * 2  # 2 k-points per band
    # Fused single-dispatch mode (run_band(fuse_k=True)): every k point of
    # the band rides ONE executable, k as a per-lane attribute
    # (fastpath.GasKTables) — one compile and one dispatch sequence per
    # band regardless of n_k.  Equal total photons as the baked pass.
    # Guarded: a fused failure must not cost the whole bench run.
    try:
        fused_warm = run_band(integ, dom, kd[0], src, n_per_batch,
                              n_batches, seed=5, fuse_k=True,
                              integrator_cache=cache)
        np.asarray(fused_warm.mean.flux_up).ravel()[:1]
        t0 = time.perf_counter()
        fused = run_band(integ, dom, kd[0], src, n_per_batch, n_batches,
                         seed=6, fuse_k=True, integrator_cache=cache)
        np.asarray(fused.mean.flux_up).ravel()[:1]
        dt_f = time.perf_counter() - t0
        return n_traced / dt, band.mean, n_traced / dt_f, fused.mean
    except Exception as e:  # pragma: no cover - device-specific failures
        print(f"# fused-k bench row failed: {e!r}", file=sys.stderr)
        return n_traced / dt, band.mean, 0.0, band.mean


def run_polarized(jax, scale):
    """Rayleigh atmosphere, Stokes-vector transport + 2 Stokes detectors:
    the polarized tracer (integrators/polarized.py — reference Wishlist
    item 3, no reference baseline exists).  Round-5 measured 1.0e7
    photons/s at this shape (packed 6-wide matrix-element reads); the cross-check value is the principal-plane
    DoP at the near-90-degree geometry (~0.7, examples/
    rayleigh_polarization.py)."""
    import numpy as np

    from i3rc_tpu import (
        Domain,
        PhaseMatrix,
        PhaseMatrixTable,
        PolarizedIntegrator,
    )
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    tab = PhaseMatrixTable.from_phase_matrices(
        [PhaseMatrix.rayleigh(depolarization=0.03)], [1.0])
    dom = Domain.create([0.0, 1000.0], [0.0, 1000.0],
                        np.linspace(0.0, 8000.0, 9))
    ext = np.full((1, 1, 8), 0.4 / 8000.0)
    dom = dom.add_component("rayleigh", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), tab)
    n_photons = (1 << 23) // scale
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=200),
        intensity_mus=[0.9, 0.5], intensity_phis=[0.0, 0.0])
    fn = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n_photons,
                        n_lanes=min(1 << 16, n_photons))
    key = jax.random.key(8, impl="rbg")
    res = fn(jax.random.fold_in(key, 99))
    _drain(res.intensity)
    dt, res = _median_time(fn, [jax.random.fold_in(key, i) for i in range(2)],
                           lambda r: jax.block_until_ready(r.intensity))
    return n_photons / dt, res


def run_checks(jax, quick):
    """On-device smoke suite; returns (ok, messages)."""
    import numpy as np

    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.integrators.integrator import Integrator

    msgs = []
    ok = True
    n = 1 << 18 if quick else 1 << 20

    # Beer-Lambert through the GENERAL wavefront kernel: an absorbing slab
    # (ssa=0) transmits exactly exp(-tau/mu0); the tally rides the one-hot
    # read path whose precision class failed silently once (commit 20aef97).
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    dom = Domain.create([0.0, 500.0], [0.0, 500.0], np.linspace(0.0, 250.0, 5))
    ext = np.full((1, 1, 4), 1.0 / 250.0)
    dom = dom.add_component("absorber", ext, np.zeros_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    integ = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=100))
    res = integ.batch_fn(PhotonSource.directional(0.8, 0.0), n)(
        jax.random.PRNGKey(7))
    expect = float(np.exp(-1.0 / 0.8))
    got = float(res.mean_flux_down)
    sigma = float(np.sqrt(expect * (1 - expect) / n))
    if abs(got - expect) > 5 * sigma:
        ok = False
        msgs.append(f"FAIL beer-lambert: Fdn={got:.5f} expect {expect:.5f} "
                    f"(5 sigma = {5*sigma:.5f})")
    else:
        msgs.append(f"ok beer-lambert: Fdn={got:.5f} vs {expect:.5f}")
    return ok, msgs


def check_headline(res, n_photons):
    """Energy closure + recorded-value checks on the headline run."""
    import numpy as np

    msgs = []
    ok = True
    fup = float(res.mean_flux_up)
    closure = fup + float(res.mean_flux_down)
    if abs(closure - 1.0) > 1e-4:
        ok = False
        msgs.append(f"FAIL energy closure: Fup+Fdn = {closure:.6f}")
    else:
        msgs.append(f"ok energy closure: {closure:.6f}")
    # Recorded cross-validated value (BENCH_CASES.md; independent scalar MC
    # agreement documented in tests/test_integrator.py).
    expect = 0.58055
    sigma = float(np.sqrt(0.58 * 0.42 / n_photons))
    if abs(fup - expect) > max(5 * sigma, 1e-3):
        ok = False
        msgs.append(f"FAIL step-cloud Fup: {fup:.5f} vs recorded {expect:.5f}")
    else:
        msgs.append(f"ok step-cloud Fup: {fup:.5f} vs recorded {expect:.5f}")
    if int(res.n_bad):
        ok = False
        msgs.append(f"FAIL n_bad = {int(res.n_bad)}")
    return ok, msgs


class _BenchState:
    """Shared mutable bench state the watchdog thread can emit from."""

    def __init__(self, t_start, budget):
        import threading
        self.t_start = t_start
        self.deadline = t_start + budget
        self.budget = budget
        self.out = None          # headline dict, set once computed
        self.extras = []
        self.messages = []
        # False until the smoke checks actually RUN and pass (--no-check
        # flips it explicitly): if the watchdog fires before the checks
        # complete, the emitted line must not claim a checked run.
        self.checks_passed = False
        self.emitted = False
        self.lock = threading.Lock()

    def remaining(self):
        return self.deadline - time.time()

    def emit(self):
        """Print the ONE JSON line (idempotent; thread-safe)."""
        with self.lock:
            if self.emitted or self.out is None:
                return False
            self.emitted = True
            self.out["checks_passed"] = self.checks_passed
            self.out["extra_metrics"] = self.extras
            print(json.dumps(self.out))
            sys.stdout.flush()
            for m in self.messages:
                print(f"# {m}", file=sys.stderr)
            sys.stderr.flush()
            return True

    def watchdog(self):
        """Daemon thread: at the deadline, emit whatever is done and exit.

        Runs even while the main thread is stuck inside a C-level XLA
        compile (which releases the GIL) — the one case signal-based
        timeouts cannot cover."""
        import os
        while True:
            rem = self.remaining()
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        if self.out is not None and not self.emitted:
            self.messages.append(
                f"time budget {self.budget:.0f}s exhausted; emitted with "
                f"{len(self.extras)} completed extra rows")
            self.emit()
            os._exit(0 if self.checks_passed else 1)
        # Headline not done yet: nothing useful to print — leave the
        # driver's external timeout to deal with it.


def _guarded_row(state, label, est_s, fn):
    """Run one extra-metric row under the global budget.

    Skips the row if the remaining budget is under its historical cost
    (est_s, cold-compile worst case); converts row exceptions into a
    message instead of sinking the whole bench."""
    rem = state.remaining()
    if rem < est_s:
        state.messages.append(
            f"skip row '{label}': {rem:.0f}s budget left < {est_s:.0f}s est")
        return None
    t0 = time.perf_counter()
    try:
        out = fn()
    except Exception as e:  # pragma: no cover - device-specific failures
        state.messages.append(f"FAIL row '{label}': {e!r}")
        return None
    state.messages.append(f"row '{label}': {time.perf_counter() - t0:.0f}s")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="1/8 photon counts")
    ap.add_argument("--no-extras", action="store_true", help="headline only")
    ap.add_argument("--no-check", action="store_true", help="skip smoke checks")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the headline run")
    ap.add_argument("--budget", type=float, default=None,
                    help="total wall-clock budget in seconds "
                         "(default $BENCH_TIME_BUDGET_S or 1200)")
    args = ap.parse_args()

    import os
    import threading

    budget = args.budget if args.budget is not None else float(
        os.environ.get("BENCH_TIME_BUDGET_S", "1200"))
    state = _BenchState(time.time(), budget)
    threading.Thread(target=state.watchdog, daemon=True).start()

    import jax

    # The axon relay backing the bench chip has been observed to return
    # UNAVAILABLE transiently (recovery takes minutes).  Device acquisition
    # is the only unrecoverable step, so retry IT for a bounded window
    # instead of letting one flaky init sink the whole bench run.  A failed
    # init leaves jax's backend table empty, so retrying re-runs it; a
    # QUIET plugin failure instead falls back to CPU silently — treat that
    # as a failure too when a TPU relay is configured, so the bench never
    # reports a CPU rate as the chip headline.
    tpu_expected = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and \
        os.environ.get("JAX_PLATFORMS", "") != "cpu"
    for attempt in range(10):
        try:
            dev = jax.devices()[0]
            if tpu_expected and dev.platform == "cpu":
                raise RuntimeError(
                    "UNAVAILABLE: axon relay configured but backend fell "
                    "back to CPU")
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == 9:
                raise
            try:
                import jax.extend
                jax.extend.backend.clear_backends()
            except Exception:
                if "fell back to CPU" in str(e):
                    # The CPU backend is now cached; without clear_backends
                    # every retry would see the same cached platform, so
                    # there is nothing to wait for.
                    raise
            print(f"# device init UNAVAILABLE (attempt {attempt + 1}/10); "
                  f"retrying in 60 s", file=sys.stderr)
            time.sleep(60)

    scale = 8 if args.quick else 1

    if args.profile:
        from i3rc_tpu.utils.profiling import profile_report
        with jax.profiler.trace(args.profile):
            rate, res, dt = run_headline(jax, scale, n_runs=2)
        print(profile_report(args.profile), file=sys.stderr)
    else:
        rate, res, dt = run_headline(jax, scale)
    n_headline = (1 << 30) // scale

    state.out = {
        "metric": "photons/sec/chip (I3RC step cloud, flux, max cross-section)",
        "value": rate,
        "unit": "photons/s",
        "vs_baseline": rate / 5e8,
    }
    state.messages.append(
        f"Fup={float(res.mean_flux_up):.4f} dt={dt*1e3:.1f}ms "
        f"device={jax.devices()[0]} headline at +{time.time()-state.t_start:.0f}s")

    if args.no_check:
        state.checks_passed = True
    else:
        ok1, m1 = check_headline(res, n_headline)
        ok2, m2 = run_checks(jax, args.quick)
        state.checks_passed = ok1 and ok2
        state.messages.extend(m1 + m2)

    if not args.no_extras:
        import numpy as np

        def row(label, est_s, fn, metric):
            got = _guarded_row(state, label, est_s, fn)
            if got is not None:
                state.extras.append(
                    {"metric": metric, "value": got[0], "unit": "photons/s"})
            return got

        # est_s = cold-compile worst case measured on the bench chip; rows
        # whose budget has run out are skipped, most-important first order.
        r = row("radiance", 150, lambda: run_radiance(jax, scale),
                "photons/sec/chip (step cloud, 3 radiance detectors)")
        l = row("landsat", 150, lambda: run_landsat(jax, scale),
                "photons/sec/chip (Landsat case 4, 1.95M cells, flux)")
        g = row("glint", 180, lambda: run_glint(jax, scale),
                "photons/sec/chip (Cox-Munk glint, thin cirrus, flux, BRDF fastpath)")
        b = _guarded_row(state, "spectral", 280,
                         lambda: run_spectral(jax, scale))
        if b is not None:
            b_rate, b_res, bf_rate, bf_res = b
            state.extras.append(
                {"metric": "photons/sec/chip (broadband k-distribution, 2 k-points)",
                 "value": b_rate, "unit": "photons/s"})
            state.extras.append(
                {"metric": "photons/sec/chip (broadband fused-k, single dispatch per band)",
                 "value": bf_rate, "unit": "photons/s"})
        lg = row("landsat_general", 180,
                 lambda: run_landsat_general(jax, scale),
                 "photons/sec/chip (Landsat case 4, general kernel, chained)")
        la = row("landsat_radiance", 220,
                 lambda: run_landsat_absorbing_radiance(jax, scale),
                 "photons/sec/chip (Landsat ssa=0.99 + 2 detectors, general kernel)")
        gr = row("general_radiance", 180,
                 lambda: run_general_radiance(jax, scale),
                 "photons/sec/chip (step cloud + 3 detectors, general kernel queued)")
        p = row("polarized", 120, lambda: run_polarized(jax, scale),
                "photons/sec/chip (Rayleigh atmosphere, Stokes transport + 2 Stokes detectors)")
        cross = []
        if r is not None:
            cross.append("radiance I=" + str(
                [round(float(v), 4) for v in np.asarray(r[1].mean_intensity)]))
        if l is not None:
            cross.append(f"landsat Fup={float(l[1].mean_flux_up):.4f}")
        if g is not None:
            cross.append(
                f"glint Fup={float(np.asarray(g[1].mean_flux_up)):.4f}")
        if b is not None:
            cross.append(
                f"broadband Fup={float(np.asarray(b_res.flux_up).mean()):.4f}"
                f" fused Fup={float(np.asarray(bf_res.flux_up).mean()):.4f}")
        if p is not None:
            dop = float(np.asarray(p[1].degree_of_polarization)[0])
            cross.append(f"polarized DoP(94deg)={dop:.3f}")
        if cross:
            state.messages.append(" ".join(cross))

    state.emit()
    if not state.checks_passed:
        sys.exit(1)


if __name__ == "__main__":
    main()
