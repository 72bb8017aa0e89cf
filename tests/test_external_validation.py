"""External validation against an independent deterministic oracle.

SURVEY.md section 4 calls for golden comparisons against the Fortran
reference and the published I3RC Phase-1 intercomparison tables.  Neither is
reachable in this environment — there is no Fortran compiler and no network
egress (verified; see BENCH_CASES.md) — so this suite supplies the strongest
available substitutes:

1. A discrete-ordinates slab solver (tests/disort_oracle.py): a completely
   independent deterministic method (eigenmode solution of the RTE, no
   Monte Carlo, no shared code), converged to ~1e-7 in flux.  This is the
   reference's own verification methodology — planeParallel exists to check
   the MC against "fluxes ... computed using other methods"
   (Example-Drivers/planeParallel.f95:12-16).  Every transport kernel
   (fastpath, Pallas fastpath, general max cross-section, general ray
   tracing) is gated against it at 3 sigma.
2. Frozen I3RC-case anchors: high-precision values recorded on TPU at 2^24
   photons AFTER the one-hot precision fix (commit 20aef97), cross-validated
   in round 1 by an independent photon-serial scalar MC
   (tests/reference_mc.py) and here by kernel-vs-kernel agreement.  They pin
   the benchmark scenes against regression at 2 sigma of the test budget.

The oracle itself is validated in-suite: Beer-Lambert to float64 precision,
conservative energy closure, and quadrature convergence.
"""

import jax
import numpy as np
import pytest

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.integrator import Integrator
from i3rc_tpu.models.slab import make_slab_domain
from i3rc_tpu.models.step_cloud import make_step_cloud

from tests.disort_oracle import hg_slab_fluxes

# ---------------------------------------------------------------------------
# Oracle self-checks
# ---------------------------------------------------------------------------

def test_oracle_beer_lambert_exact():
    r, t = hg_slab_fluxes(1.0, 1e-12, 0.85, 0.5)
    assert r == pytest.approx(0.0, abs=1e-10)
    assert t == pytest.approx(np.exp(-2.0), abs=1e-10)


def test_oracle_energy_closure_conservative():
    for tau, mu0 in [(1.0, 0.5), (18.0, 0.5), (18.0, 1.0)]:
        r, t = hg_slab_fluxes(tau, 1.0, 0.85, mu0)
        assert r + t == pytest.approx(1.0, abs=1e-6)


def test_oracle_stream_convergence():
    r32, t32 = hg_slab_fluxes(2.0, 0.99, 0.85, 0.5, n_streams=32)
    r64, t64 = hg_slab_fluxes(2.0, 0.99, 0.85, 0.5, n_streams=64)
    assert r32 == pytest.approx(r64, abs=2e-6)
    assert t32 == pytest.approx(t64, abs=2e-6)


# ---------------------------------------------------------------------------
# Monte Carlo kernels vs the oracle (3 sigma of the photon budget)
# ---------------------------------------------------------------------------

def _slab_mc(tau, ssa, mu0, cfg, n, key=0, **kwargs):
    integ = Integrator.create(make_slab_domain(tau, ssa), config=cfg, **kwargs)
    res = integ.batch_fn(PhotonSource.directional(mu0, 0.0), n)(
        jax.random.PRNGKey(key))
    return res


FAST = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                        compute_volume_absorption=False)
GENERAL_MAXXS = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                                 compute_volume_absorption=False,
                                 majorant_block_size=16, use_fastpath=False)
GENERAL_RT = IntegratorConfig(use_ray_tracing=True, max_events=2000,
                              compute_volume_absorption=False,
                              use_fastpath=False)


@pytest.mark.parametrize("tau,mu0,n,cfg_name", [
    (1.0, 0.5, 1 << 18, "fast"),
    (18.0, 0.5, 1 << 16, "fast"),
    (1.0, 0.5, 1 << 16, "maxxs"),
    (1.0, 0.5, 1 << 16, "rt"),
])
def test_conservative_slab_vs_oracle(tau, mu0, n, cfg_name):
    cfg = {"fast": FAST, "maxxs": GENERAL_MAXXS, "rt": GENERAL_RT}[cfg_name]
    r_ex, t_ex = hg_slab_fluxes(tau, 1.0, 0.85, mu0, n_legendre=64)
    res = _slab_mc(tau, 1.0, mu0, cfg, n)
    sigma = np.sqrt(r_ex * (1.0 - r_ex) / n)
    assert float(res.mean_flux_up) == pytest.approx(r_ex, abs=3 * sigma)
    assert float(res.mean_flux_down) == pytest.approx(t_ex, abs=3 * sigma)


@pytest.mark.parametrize("tau,ssa,mu0,cfg_name", [
    (2.0, 0.99, 0.5, "maxxs"),
    (1.0, 0.9, 1.0, "rt"),
    (2.0, 0.99, 0.5, "fast"),   # fastpath: Bernoulli absorption estimator
    (1.0, 0.9, 0.5, "fast"),
])
def test_absorbing_slab_vs_oracle(tau, ssa, mu0, cfg_name):
    n = 1 << 16
    cfg = {"maxxs": GENERAL_MAXXS, "rt": GENERAL_RT, "fast": FAST}[cfg_name]
    r_ex, t_ex = hg_slab_fluxes(tau, ssa, 0.85, mu0, n_legendre=64)
    res = _slab_mc(tau, ssa, mu0, cfg, n, key=3)
    sigma = np.sqrt(max(r_ex * (1 - r_ex), t_ex * (1 - t_ex)) / n)
    assert float(res.mean_flux_up) == pytest.approx(r_ex, abs=3 * sigma)
    assert float(res.mean_flux_down) == pytest.approx(t_ex, abs=3 * sigma)
    # Absorbed fraction closes the budget against the oracle too.
    a_ex = 1.0 - r_ex - t_ex
    assert float(res.mean_flux_absorbed) == pytest.approx(a_ex, abs=3 * sigma)


@pytest.mark.parametrize("ssa", [1.0, 0.95])
def test_pallas_fastpath_slab_vs_oracle(ssa):
    """The Mosaic event-block kernel against the deterministic oracle
    (ssa<1 exercises the 4-draw Bernoulli-absorption block)."""
    n = 1 << 16
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False,
                           use_pallas_fastpath=True)
    r_ex, t_ex = hg_slab_fluxes(1.0, ssa, 0.85, 0.5, n_legendre=64)
    res = _slab_mc(1.0, ssa, 0.5, cfg, n, key=5)
    sigma = np.sqrt(max(r_ex * (1 - r_ex), t_ex * (1 - t_ex)) / n)
    assert float(res.mean_flux_up) == pytest.approx(r_ex, abs=3 * sigma)
    assert float(res.mean_flux_down) == pytest.approx(t_ex, abs=3 * sigma)
    assert float(res.mean_flux_absorbed) == pytest.approx(
        1.0 - r_ex - t_ex, abs=3 * sigma)


def _gas_slab(tau_cloud, tau_gas, nz=8):
    """Cloud slab + horizontally-uniform pure-absorber gas component."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    base = Domain.create([0, 500.], [0, 500.], np.linspace(0, 250, nz + 1))
    ext = np.full((1, 1, nz), tau_cloud / 250.0)
    base = base.add_component("cloud", ext, np.ones_like(ext),
                              np.zeros(ext.shape, np.int32), table)
    return base, domain_with_gas_component(
        base, np.full(nz, tau_gas / 250.0))


@pytest.mark.parametrize("tau_gas,pallas", [(0.5, False), (0.5, True)])
def test_gas_channel_slab_vs_oracle(tau_gas, pallas):
    """Gas-channel fastpath vs the oracle for the COMBINED medium: a
    uniform cloud (tau_c, ssa 1, HG) plus uniform gas absorber (tau_g) is
    exactly an HG slab with tau = tau_c + tau_g, ssa = tau_c / tau."""
    n = 1 << 16
    _, dom = _gas_slab(1.0, tau_gas)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False,
                           use_pallas_fastpath=pallas or None)
    integ = Integrator.create(dom, config=cfg)
    from i3rc_tpu.integrators.fastpath import fast_plan
    plan = fast_plan(integ.geometry, integ._flat, integ.optics,
                     integ.surface, integ.intensity, integ.config)
    assert plan is not None and plan.gas_factor is not None
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(11))
    tau_t = 1.0 + tau_gas
    r_ex, t_ex = hg_slab_fluxes(tau_t, 1.0 / tau_t, 0.85, 0.5, n_legendre=64)
    sigma = np.sqrt(max(r_ex * (1 - r_ex), t_ex * (1 - t_ex)) / n)
    assert float(res.mean_flux_up) == pytest.approx(r_ex, abs=3 * sigma)
    assert float(res.mean_flux_down) == pytest.approx(t_ex, abs=3 * sigma)
    assert float(res.mean_flux_absorbed) == pytest.approx(
        1.0 - r_ex - t_ex, abs=3 * sigma)


def test_gas_override_spectral_path_vs_oracle():
    """The fastpath's gas-channel override: per-k gas profiles ride through
    ONE executable as traced chain values.  (The Integrator routes spectral
    overrides to the general kernel — traced values can't compress, so this
    path measured slower on TPU — but the machinery stays correct and
    available; driven directly here.)"""
    from i3rc_tpu.core.optics import flatten_optics
    from i3rc_tpu.integrators.fastpath import fast_plan, make_fast_tracer
    from i3rc_tpu.integrators.integrator import device_optics_from_flat
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    n = 1 << 16
    base, dom0 = _gas_slab(1.0, 0.5)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False)
    integ = Integrator.create(dom0, config=cfg)
    plan = fast_plan(integ.geometry, integ._flat, integ.optics,
                     integ.surface, integ.intensity, integ.config)
    assert plan is not None and plan.gas_factor is not None
    tracer = make_fast_tracer(integ.geometry, plan, integ.config, n)
    src = PhotonSource.directional(0.5, 0.0)

    @jax.jit
    def run(key, opt):
        batch = src.sample(key, n)
        return tracer(key, batch, src, optics_override=opt)

    for tg in (1.0, 0.1):
        dom_k = domain_with_gas_component(base, np.full(8, tg / 250.0))
        opt_k = device_optics_from_flat(flatten_optics(dom_k),
                                        cfg.majorant_block_size)
        raw = run(jax.random.PRNGKey(7), opt_k)
        fup = float(np.asarray(raw.flux_up).sum()) / n
        fdn = float(np.asarray(raw.flux_down).sum()) / n
        tau_t = 1.0 + tg
        r_ex, t_ex = hg_slab_fluxes(tau_t, 1.0 / tau_t, 0.85, 0.5,
                                    n_legendre=64)
        sigma = np.sqrt(max(r_ex * (1 - r_ex), t_ex * (1 - t_ex)) / n)
        assert fup == pytest.approx(r_ex, abs=3 * sigma)
        assert fdn == pytest.approx(t_ex, abs=3 * sigma)


# ---------------------------------------------------------------------------
# Frozen I3RC benchmark anchors (regression gates at the test photon budget)
# ---------------------------------------------------------------------------

# Recorded on TPU v5e at 2^24 photons (sigma ~ 1.2e-4) post commit 20aef97,
# all three kernels agreeing within 1.1 sigma of each other and of the
# independent scalar MC (tests/test_integrator.py).  NOT published I3RC
# consensus numbers — those are unreachable offline; see module docstring.
I3RC_STEP_CLOUD_FUP = 0.58054   # case 1, non-absorbing, mu0=0.5, phi0=0


def test_step_cloud_anchor():
    n = 1 << 17
    integ = Integrator.create(make_step_cloud(1.0), config=FAST)
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(9))
    sigma = np.sqrt(I3RC_STEP_CLOUD_FUP * (1 - I3RC_STEP_CLOUD_FUP) / n)
    assert float(res.mean_flux_up) == pytest.approx(I3RC_STEP_CLOUD_FUP,
                                                    abs=3 * sigma)
    assert float(res.mean_flux_up + res.mean_flux_down) == pytest.approx(
        1.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Native (C++) scalar-MC oracle: triangulates the 2-D scenes
# ---------------------------------------------------------------------------

native_mc = pytest.importorskip("i3rc_tpu.native.scalar_mc")
needs_native = pytest.mark.skipif(not native_mc.available(),
                                  reason="native oracle not built "
                                  "(scripts/build_native.sh)")


@needs_native
def test_cpp_oracle_matches_disort_slab():
    """C++ photon-serial MC vs the deterministic oracle on the slab.

    Recorded at 8M photons: Fup 0.164897 vs 0.164878 (+0.1 sigma).  CI
    budget is smaller; both oracles share no code with the framework or
    each other (triangulation)."""
    n = 1 << 20
    ext = np.full((1, 1, 4), 1.0 / 250.0)
    r = native_mc.trace(ext, np.ones_like(ext), 0.85, [0, 500.0], [0, 500.0],
                        np.linspace(0, 250, 5), 0.5, 0.0, n, seed=3)
    fup = r["flux_up"].sum() / n
    r_ex, _ = hg_slab_fluxes(1.0, 1.0, 0.85, 0.5)
    sigma = np.sqrt(r_ex * (1 - r_ex) / n)
    assert fup == pytest.approx(r_ex, abs=3 * sigma)
    assert r["n_bad"] == 0


@needs_native
def test_cpp_oracle_step_cloud_anchor():
    """Independent C++ MC confirms the frozen step-cloud anchor at 2 sigma.

    Recorded at 4M photons: Fup 0.58079 vs the TPU anchor 0.58054
    (+1.0 sigma).  The gate combines this run's MC sigma with the anchor's
    own recording sigma (2^24 photons, ~1.2e-4) in quadrature — the 2-sigma
    contract of SURVEY section 4 / PARITY.md."""
    n = 1 << 21
    n_col, n_lay = 32, 32
    tau = np.where(np.arange(n_col) < 16, 2.0, 18.0)
    ext = np.broadcast_to((tau / 250.0)[:, None, None],
                          (n_col, 1, n_lay)).copy()
    r = native_mc.trace(ext, np.ones_like(ext), 0.85,
                        np.linspace(0, 500, n_col + 1), [0, 500.0],
                        np.linspace(0, 250, n_lay + 1), 0.5, 0.0, n, seed=11)
    fup = r["flux_up"].sum() / n
    var = I3RC_STEP_CLOUD_FUP * (1 - I3RC_STEP_CLOUD_FUP)
    sigma = np.sqrt(var / n + var / (1 << 24))
    assert fup == pytest.approx(I3RC_STEP_CLOUD_FUP, abs=2 * sigma)
    assert r["n_bad"] == 0


@needs_native
def test_cpp_oracle_radar_cloud_c1():
    """Radar-cloud case 2 with the Dermendjian C.1 TABULATED phase function
    vs the C++ oracle — the first external gate for this scene (it had
    none; BENCH_CASES.md round 2).  The oracle samples C.1 by exact
    piecewise-quadratic CDF inversion over the (mu, value) pairs
    (scalar_mc.cc TabPhase); the framework samples its 256-segment cubic
    mu(p) fit through the general kernel.  Same continuous distribution,
    fully independent implementations.

    Match: I3RC-Examples/i3rcRadarCloud.f95:27-156 (scene),
    Code/inversePhaseFunctions.f95:68-176 (CDF construction)."""
    import os

    from i3rc_tpu.models.radar_cloud import DATA_DIR, load_extinction, make_radar_cloud

    n = 1 << 15
    dom = make_radar_cloud(phase_function="c1")
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False,
                           majorant_block_size=16, use_fastpath=False)
    integ = Integrator.create(dom, config=cfg)
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(21))
    fup = float(res.mean_flux_up)

    raw = np.loadtxt(os.path.join(DATA_DIR, "C.1_PF"))
    mu = np.cos(np.deg2rad(raw[:, 0]))[::-1].copy()   # ascending in mu
    val = raw[:, 1][::-1].copy()
    ext = load_extinction()
    ro = native_mc.trace(ext, np.ones_like(ext), 0.0,
                         np.asarray(dom.x_edges), np.asarray(dom.y_edges),
                         np.asarray(dom.z_edges), 0.5, 0.0, 4 * n, seed=23,
                         phase_mu=mu, phase_val=val)
    fup_o = ro["flux_up"].sum() / (4 * n)
    sigma = np.sqrt(fup_o * (1 - fup_o) * (1.0 / n + 1.0 / (4 * n)))
    assert fup == pytest.approx(fup_o, abs=3 * sigma)
    # A few photons in the thickest columns legitimately hit the event
    # budget (max_events=2000); they must stay a negligible fraction.
    assert ro["n_bad"] == 0 and int(res.n_bad) < 1e-3 * n


@needs_native
def test_cpp_oracle_landsat_flux():
    """The FULL Landsat case-4 scene (128x128x119, per-column homogeneous
    cloud layers, HG g=0.85) vs the C++ oracle — the first EXTERNAL gate
    for this scene (previously kernel-vs-kernel plus the generator's own
    column-tau identity).  The oracle walks the per-cell float64 grid
    photon-serially; the framework runs the parametric column fastpath —
    independent representations of the same medium.

    Match: I3RC-Examples/i3rcLandsatCloud.f95:26-140 (scene),
    monteCarloRadiativeTransfer.f95:400-707 (transport)."""
    from i3rc_tpu.models.landsat_cloud import make_landsat_cloud

    n = 1 << 16   # CPU column-fastpath cost bounds the framework side;
    dom = make_landsat_cloud(1.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=False)
    integ = Integrator.create(dom, config=cfg)
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(31))
    fup = float(res.mean_flux_up)

    comp = dom.components[0]
    ext = np.asarray(comp.extinction, np.float64)
    # the float64 oracle is cheap (~50k photons/s), so run it 4x harder.
    ro = native_mc.trace(ext, np.ones_like(ext), 0.85,
                         np.asarray(dom.x_edges), np.asarray(dom.y_edges),
                         np.asarray(dom.z_edges), 0.5, 0.0, 4 * n, seed=33)
    fup_o = ro["flux_up"].sum() / (4 * n)
    sigma = np.sqrt(fup_o * (1 - fup_o) * (1.0 / n + 1.0 / (4 * n)))
    assert fup == pytest.approx(fup_o, abs=3 * sigma)
    assert ro["n_bad"] == 0 and int(res.n_bad) < 1e-3 * n


@needs_native
def test_cpp_oracle_step_cloud_radiances():
    """Step-cloud radiance triplet (the benchmark detector set) vs the C++
    oracle's independent local-estimate implementation (path_tau + exact
    HG phase values, scalar_mc.cc) — the first EXTERNAL gate for radiance
    fields (they were validated only by a single-scatter closed form and
    kernel-vs-kernel agreement; VERDICT round 2 missing #3).

    Match: computeIntensityContribution,
    Integrators/monteCarloRadiativeTransfer.f95:1419-1611."""
    n = 1 << 15
    mus = [1.0, 0.5, 0.5]
    phis = [0.0, 0.0, 180.0]
    integ = Integrator.create(
        make_step_cloud(1.0),
        config=IntegratorConfig(use_ray_tracing=False, max_events=2000,
                                compute_volume_absorption=False),
        intensity_mus=mus, intensity_phis=phis)
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(31))
    i_fw = np.asarray(res.mean_intensity)

    n_col, n_lay = 32, 32
    tau = np.where(np.arange(n_col) < 16, 2.0, 18.0)
    ext = np.broadcast_to((tau / 250.0)[:, None, None],
                          (n_col, 1, n_lay)).copy()
    n_o = 4 * n
    ro = native_mc.trace(ext, np.ones_like(ext), 0.85,
                         np.linspace(0, 500, n_col + 1), [0, 500.0],
                         np.linspace(0, 250, n_lay + 1), 0.5, 0.0, n_o,
                         seed=33, detector_mus=mus, detector_phis=phis)
    i_or = ro["intensity"].sum(axis=0) / n_o
    # Per-detector sigma from the oracle's own column scatter (weight sums
    # are near-Poisson over columns; combine both runs' budgets).
    for d in range(3):
        rel = np.sqrt(1.0 / n + 1.0 / n_o)
        tol = 3.0 * max(float(i_or[d]) * 2.5 * rel, 1e-4)
        assert float(i_fw[d]) == pytest.approx(float(i_or[d]), abs=tol), (
            d, i_fw, i_or)
    assert ro["n_bad"] == 0 and int(res.n_bad) == 0
