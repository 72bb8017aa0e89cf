"""Fused elementwise fastpath: eligibility, dispatch, statistical agreement.

The fastpath (integrators/fastpath.py) must produce the same physics as the
general wavefront kernel — same expectations, different RNG event stream —
whenever it elects itself.  These tests pin the eligibility logic, the
separable-field detection, and cross-check fluxes between the two kernels.
"""

import jax
import numpy as np
import pytest

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.fastpath import (
    StepFactor,
    detect_hg,
    fast_plan,
    hg_cosine,
    separable_factors,
)


def _step_cloud(config, **kwargs):
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.integrators.integrator import Integrator

    return Integrator.create(make_step_cloud(1.0), config=config, **kwargs)


FAST_CFG = IntegratorConfig(use_ray_tracing=False, max_events=500,
                            compute_volume_absorption=False,
                            majorant_block_size=16)


def _plan(integ):
    return fast_plan(integ.geometry, integ._flat, integ.optics, integ.surface,
                     integ.intensity, integ.config)


def test_step_cloud_is_eligible():
    integ = _step_cloud(FAST_CFG)
    plan = _plan(integ)
    assert plan is not None
    assert plan.hg_g == pytest.approx(0.85)
    # step in x at mid-domain; uniform in y and z.
    assert (plan.fx.n_ops, plan.fy.n_ops, plan.fz.n_ops) == (1, 0, 0)
    # tau 2 / tau 18 halves over 250 m: factor ratio 1:9.
    assert plan.fx.values == pytest.approx((2.0 / 18.0, 1.0), rel=1e-6)
    assert plan.fz.values == pytest.approx((18.0 / 250.0,), rel=1e-6)


def test_file_round_trip_keeps_eligibility(tmp_path):
    """write_domain -> read_domain must not demote the fastpath: the f32
    storage of Legendre coefficients and extinctions once broke HG
    detection (and with it every gas-channel/fused-spectral plan on
    file-based scenes — the production .dom workflow)."""
    from i3rc_tpu.integrators import spectral
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.io.netcdf import read_domain, write_domain
    from i3rc_tpu.models.step_cloud import make_step_cloud

    write_domain(make_step_cloud(1.0), str(tmp_path / "sc.dom"))
    dom = read_domain(str(tmp_path / "sc.dom"))
    plan = _plan(Integrator.create(dom, config=FAST_CFG))
    assert plan is not None and plan.hg_g == pytest.approx(0.85, abs=1e-6)
    # With a gas component + detectors: the fused-spectral shape.
    gas = np.full(dom.n_z, 2e-4)
    integ = Integrator.create(
        spectral.domain_with_gas_component(dom, gas), config=FAST_CFG,
        intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    plan = _plan(integ)
    assert plan is not None and plan.gas_factor is not None
    assert plan.closed_shadow


@pytest.mark.parametrize("kwargs,cfg", [
    # ray tracing transport is not expressible
    (dict(), IntegratorConfig(use_ray_tracing=True)),
    # GRIDDED BRDF parameter fields need a per-lane parameter gather at
    # every flush -> general kernel (uniform-parameter BRDFs are eligible:
    # see test_brdf_surface_on_fastpath)
    (dict(surface=__import__("i3rc_tpu.core.surface", fromlist=["S"])
          .SurfaceDescription.create(
              np.tile(np.float32([0.2, 0.8, -0.1]), (2, 1, 1)),
              [0.0, 250.0, 500.0], [0.0, 500.0], brdf_name="rpv")),
     FAST_CFG),
    # estimator-CHANGING radiance options use the general local-estimate
    # machinery (Iwabuchi roulette and ratio tracking are eligible: the
    # exact tau is available — see test_iwabuchi_on_fastpath)
    (dict(intensity_mus=[0.5], intensity_phis=[0.0]),
     IntegratorConfig(use_ray_tracing=False, compute_volume_absorption=False,
                      limit_intensity_contributions=True,
                      max_intensity_contribution=0.1)),
    (dict(intensity_mus=[0.5], intensity_phis=[0.0]),
     IntegratorConfig(use_ray_tracing=False, compute_volume_absorption=False,
                      use_hybrid_phase_funs=True)),
    # explicit opt-out
    (dict(), IntegratorConfig(use_ray_tracing=False, compute_volume_absorption=False,
                              use_fastpath=False)),
])
def test_ineligible_configs_fall_back(kwargs, cfg):
    integ = _step_cloud(cfg, **kwargs)
    assert _plan(integ) is None


def test_reflecting_surface_on_fastpath():
    """Lambertian albedo > 0: every bottom hit tallies Fdn eagerly, then
    Bernoulli reflection (prob A) or silent death.  Transparent domain:
    Fdn == 1 exactly (each photon hits once), Fup == A statistically."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))],
        key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    n = 1 << 17
    integ = Integrator.create(dom, config=FAST_CFG, surface_albedo=0.4)
    assert _plan(integ) is not None
    assert _plan(integ).surface_albedo == pytest.approx(0.4)
    res = integ.batch_fn(PhotonSource.directional(0.7, 30.0), n)(
        jax.random.PRNGKey(4))
    sig = np.sqrt(0.4 * 0.6 / n)
    assert float(res.mean_flux_down) == pytest.approx(1.0, abs=1e-4)
    assert float(res.mean_flux_up) == pytest.approx(0.4, abs=4 * sig)
    # Step cloud + A=0.2 vs the general kernel (4-sigma two-sample).
    src = PhotonSource.directional(0.5, 0.0)
    f = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                          surface_albedo=0.2)
    g = Integrator.create(make_step_cloud(1.0), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False), surface_albedo=0.2)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(8))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(9))
    s2 = np.sqrt(2 * 0.25 / n)
    assert float(rf.mean_flux_up) == pytest.approx(
        float(rg.mean_flux_up), abs=4 * s2)
    assert float(rf.mean_flux_down) == pytest.approx(
        float(rg.mean_flux_down), abs=4 * s2)


def test_reflecting_surface_radiance():
    """Surface contributions to radiance detectors (component slot 0):
    Lambertian emission is direction-independent and upward-only — the
    transparent domain gives exactly A/pi up and 0 down (the general
    kernel's trace from the boundary in a downward direction is a
    zero-step trace, dropped per the reference's non-positive-step guard
    :1711-1714, and physically a Lambertian reflects upward only); the
    step cloud cross-checks against the general kernel including the
    by-component split."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))],
        key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    n = 1 << 15
    f0 = Integrator.create(dom, config=FAST_CFG, surface_albedo=0.4, **det)
    assert _plan(f0) is not None and _plan(f0).detectors
    r = f0.compute(jax.random.PRNGKey(1), PhotonSource.directional(0.7, 0.0), n)
    iv = np.asarray(r.mean_intensity)
    sig = np.sqrt(0.4 * 0.6 / n) / np.pi
    assert iv[0] == pytest.approx(0.4 / np.pi, abs=4 * sig)
    assert iv[1] == 0.0

    src = PhotonSource.directional(0.5, 0.0)
    f = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                          surface_albedo=0.3, **det)
    g = Integrator.create(make_step_cloud(1.0), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False), surface_albedo=0.3, **det)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(11))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(12))
    np.testing.assert_allclose(np.asarray(rf.mean_intensity),
                               np.asarray(rg.mean_intensity), rtol=0.06)
    bc_f = np.asarray(rf.intensity_by_component).mean(axis=(0, 1))
    bc_g = np.asarray(rg.intensity_by_component).mean(axis=(0, 1))
    assert bc_f[0, 0] > 0      # surface slot populated for the up detector
    np.testing.assert_allclose(bc_f[:, 0], bc_g[:, 0], rtol=0.1)


def test_tabulated_phase_on_fastpath():
    """Non-HG single-entry tables (the Dermendjian C.1 from the radar
    case) sample the piecewise-cubic inverse-CDF fit on the fastpath;
    cross-checked against the general kernel on a uniform slab."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import PhaseFunctionTable
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated

    table = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                    key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250, 5))
    ext = np.full((1, 1, 4), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False)
    f = Integrator.create(dom, config=cfg)
    plan = _plan(f)
    assert plan is not None and plan.cubic is not None
    assert plan.cubic.shape == (256, 4)
    g = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False))
    n = 1 << 16
    src = PhotonSource.directional(0.5, 0.0)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(5))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(6))
    s2 = np.sqrt(2 * 0.25 / n)
    assert float(rf.mean_flux_up) == pytest.approx(float(rg.mean_flux_up),
                                                   abs=4 * s2)
    assert float(rf.mean_flux_up + rf.mean_flux_down) == pytest.approx(
        1.0, abs=1e-4)
    # Exact-HG tables keep the closed-form inversion (no cubic).
    assert _plan(_step_cloud(FAST_CFG)).cubic is None


def test_absorbing_reflecting_volume_combo():
    """All three Bernoulli estimators stacked (ssa<1 + albedo>0 + per-cell
    absorption tally) against the general kernel, plus the exact
    flux/volume identity."""
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.integrators.integrator import Integrator

    n = 1 << 16
    src = PhotonSource.directional(0.5, 0.0)
    f = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=True), surface_albedo=0.3)
    plan = _plan(f)
    assert plan is not None and plan.surface_albedo == pytest.approx(0.3)
    assert plan.ssa == pytest.approx(0.99)
    g = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=True, majorant_block_size=16,
        use_fastpath=False), surface_albedo=0.3)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(18))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(19))
    s2 = np.sqrt(2 * 0.25 / n)
    for name in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        assert float(getattr(rf, name)) == pytest.approx(
            float(getattr(rg, name)), abs=5 * s2), name
    vol = np.asarray(rf.volume_absorption)
    np.testing.assert_allclose(vol.sum(axis=2) * (250.0 / 32),
                               np.asarray(rf.flux_absorbed), rtol=1e-5)


def test_volume_absorption_on_fastpath():
    """compute_volume_absorption elects the fastpath: conservative media
    give the identically-zero profile for free; absorbing media tally
    kind-3 deaths per fine cell at flush time.  The per-column layer sums
    must reproduce flux_absorbed EXACTLY (same deaths, two keys)."""
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.integrators.integrator import Integrator

    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=True)
    cons = Integrator.create(make_step_cloud(1.0), config=cfg)
    assert _plan(cons) is not None
    r = cons.batch_fn(src, n)(jax.random.PRNGKey(1))
    assert float(np.abs(np.asarray(r.volume_absorption)).max()) == 0.0

    integ = Integrator.create(make_step_cloud(0.99), config=cfg)
    assert _plan(integ) is not None
    r = integ.batch_fn(src, n)(jax.random.PRNGKey(2))
    vol = np.asarray(r.volume_absorption)        # (nx, ny, nz), per meter
    np.testing.assert_allclose(vol.sum(axis=2) * (250.0 / 32),
                               np.asarray(r.flux_absorbed), rtol=1e-5)
    # Profile shape agrees with the general kernel's continuous deposit.
    gen = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=True, majorant_block_size=16,
        use_fastpath=False))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(3))
    pf, pg = np.asarray(r.absorbed_profile), np.asarray(rg.absorbed_profile)
    # Bernoulli-death tally has ~binomial noise per layer; 8 sigma of the
    # largest layer bounds the whole profile comfortably at this budget.
    dz = 250.0 / 32
    np.testing.assert_allclose(pf, pg,
                               atol=8 * np.sqrt((pg * dz / n)).max() / dz
                               + 5e-7)


def test_absorbing_cloud_is_eligible():
    """ssa < 1 runs the fastpath with Bernoulli absorption (one death per
    photon at the collision), same expectation as analog weighting; checked
    against the deterministic oracle in test_external_validation.py."""
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.integrators.integrator import Integrator

    integ = Integrator.create(make_step_cloud(0.99), config=FAST_CFG)
    plan = _plan(integ)
    assert plan is not None and plan.ssa == pytest.approx(0.99)
    n = 1 << 16
    src = PhotonSource.directional(0.5, 0.0)
    res = integ.batch_fn(src, n)(jax.random.PRNGKey(21))
    gen = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(22))
    sigma = float(np.sqrt(2 * 0.5 * 0.5 / n))
    assert float(res.mean_flux_up) == pytest.approx(float(rg.mean_flux_up),
                                                    abs=4 * sigma)
    assert float(res.mean_flux_absorbed) == pytest.approx(
        float(rg.mean_flux_absorbed), abs=4 * sigma)
    # Weight budget closes: up + down + absorbed == 1.
    total = float(res.mean_flux_up + res.mean_flux_down + res.mean_flux_absorbed)
    assert total == pytest.approx(1.0, abs=1e-5)


def test_separable_factor_detection():
    x = np.array([1.0, 1.0, 2.0, 2.0])
    y = np.array([1.0])
    z = np.array([0.0, 3.0, 3.0])
    ext = x[:, None, None] * y[None, :, None] * z[None, None, :]
    f = separable_factors(ext, np.arange(5.0), np.arange(2.0), np.arange(4.0))
    assert f is not None
    fx, fy, fz = f
    got = (np.asarray([float(fx(np.float32(v + 0.5))) for v in range(4)])[:, None]
           * float(fy(np.float32(0.5)))
           * np.asarray([float(fz(np.float32(v + 0.5))) for v in range(3)])[None, :])
    np.testing.assert_allclose(got, ext[:, 0, :], rtol=1e-6)
    # Non-separable field: declined.
    bad = ext.copy()
    bad[1, 0, 1] *= 1.5
    assert separable_factors(bad, np.arange(5.0), np.arange(2.0), np.arange(4.0)) is None


def test_hg_detection_and_inversion():
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )

    hg = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.7, 32))], key=[1.0])
    assert detect_hg(hg) == pytest.approx(0.7)
    not_hg = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(np.array([0.7, 0.3]))], key=[1.0])
    assert detect_hg(not_hg) is None

    # f32 round trip (netCDF stores coefficients as f32): the implied g^l
    # error compounds linearly with the order, and a flat tolerance used to
    # reject every file-read HG domain at l >~ 20, silently demoting .dom
    # workflows off the HG/Pallas fastpath.
    c64 = henyey_greenstein_coefficients(0.85, 64)
    rounded = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(np.float64(np.float32(c64)))], key=[1.0])
    assert detect_hg(rounded) == pytest.approx(0.85, abs=1e-6)

    # Inversion: mean of sampled cosines is g; CDF round-trips.
    g = 0.85
    u = np.linspace(1e-6, 1.0 - 1e-6, 20001)
    mu = np.asarray(hg_cosine(g, u.astype(np.float32)))
    # E[mu] via the trapezoid over the uniform deviate IS the asymmetry.
    assert np.trapezoid(mu, u) == pytest.approx(g, abs=1e-4)
    # Analytic CDF of HG evaluated at the sampled mu returns u.
    cdf = (1 - g**2) / (2 * g) * (1 / np.sqrt(1 + g**2 - 2 * g * mu.astype(np.float64))
                                  - 1 / (1 + g))
    np.testing.assert_allclose(cdf, u, atol=5e-4)


def test_fastpath_matches_general_kernel():
    """Flux cross-check at 2^16 photons: agreement within 3 sigma."""
    n = 1 << 16
    src = PhotonSource.directional(0.5, 0.0)
    fast = _step_cloud(FAST_CFG)
    gen = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       majorant_block_size=16, use_fastpath=False))
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(3))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(4))
    sigma = float(np.sqrt(2 * 0.58 * 0.42 / n))  # two independent estimates
    assert float(rf.mean_flux_up) == pytest.approx(float(rg.mean_flux_up),
                                                   abs=3 * sigma)
    # Conservative cloud over a black surface: energy closes exactly.
    assert float(rf.mean_flux_up + rf.mean_flux_down) == pytest.approx(1.0, abs=1e-5)
    assert int(rf.n_bad) == 0


def test_fastpath_radiance_matches_general_kernel():
    """Local-estimate radiance: fastpath's unrolled segment-DDA shadow rays +
    analytic HG phase values vs the general kernel's tabulated machinery."""
    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    fast = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                        compute_volume_absorption=False), **det)
    gen = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       majorant_block_size=16,
                                       use_fastpath=False), **det)
    assert _plan(fast) is not None and _plan(fast).detectors
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(11))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(12))
    i_f = np.asarray(rf.mean_intensity)
    i_g = np.asarray(rg.mean_intensity)
    # ~1% relative statistical spread at 2^15 photons for these detectors.
    np.testing.assert_allclose(i_f, i_g, rtol=0.06)
    # Flux tallies ride along unchanged.
    assert float(rf.mean_flux_up + rf.mean_flux_down) == pytest.approx(1.0, abs=1e-5)


def test_fastpath_absorbing_radiance_matches_general_kernel():
    """ssa<1 with detectors: Bernoulli death is applied BEFORE the collision's
    local-estimate contribution, so the expected contribution at collision k
    is ssa^k x phase — exactly the general kernel's analog weighting (weight
    multiplied by ssa before computeIntensityContribution)."""
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.integrators.integrator import Integrator

    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    fast = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False), **det)
    gen = Integrator.create(make_step_cloud(0.99), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False), **det)
    assert _plan(fast) is not None and _plan(fast).ssa == pytest.approx(0.99)
    i_f = np.asarray(fast.batch_fn(src, n)(jax.random.PRNGKey(31)).mean_intensity)
    i_g = np.asarray(gen.batch_fn(src, n)(jax.random.PRNGKey(32)).mean_intensity)
    np.testing.assert_allclose(i_f, i_g, rtol=0.06)


def test_gas_channel_eligibility_and_closure():
    """Cloud + horizontally-uniform pure absorber elects the gas-channel
    fastpath; weight budget closes; physics is gated against the
    combined-medium oracle in test_external_validation.py."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    nz = 8
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    base = Domain.create([0, 500.], [0, 500.], np.linspace(0, 250, nz + 1))
    ext = np.full((1, 1, nz), 1.0 / 250.0)
    base = base.add_component("cloud", ext, np.ones_like(ext),
                              np.zeros(ext.shape, np.int32), table)
    dom = domain_with_gas_component(base, np.full(nz, 0.5 / 250.0))
    integ = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False))
    plan = _plan(integ)
    assert plan is not None and plan.gas_factor is not None
    assert plan.gas_idx == 1 and plan.ssa == 1.0
    # Uniform profile compresses to a single chain segment.
    assert plan.gas_factor.n_ops == 0
    n = 1 << 15
    res = integ.batch_fn(PhotonSource.directional(0.5, 0.0), n)(
        jax.random.PRNGKey(41))
    total = float(res.mean_flux_up + res.mean_flux_down
                  + res.mean_flux_absorbed)
    assert total == pytest.approx(1.0, abs=1e-5)
    # A spatially-varying second scatterer (not a gas shape) falls back.
    dom2 = base.add_component(
        "cloud2", np.linspace(1, 2, nz).reshape(1, 1, nz) / 250.0,
        np.ones((1, 1, nz)), np.zeros((1, 1, nz), np.int32), table)
    integ2 = Integrator.create(dom2, config=FAST_CFG)
    assert _plan(integ2) is None


def _c1_gas_domain(nz=4, with_gas=True):
    """Tabulated (C.1) cloud slab, optionally + uniform gas absorber —
    the production broadband shape (Mie cloud + k-distribution gas)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import PhaseFunctionTable
    from i3rc_tpu.integrators.spectral import domain_with_gas_component
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated

    table = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                    key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250, nz + 1))
    ext = np.full((1, 1, nz), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    if with_gas:
        dom = domain_with_gas_component(dom, np.full(nz, 0.5 / 250.0))
    return dom


def test_gas_channel_tabulated_phase_eligibility():
    """Non-HG (tabulated) cloud + gas absorber elects the fastpath with
    BOTH the cubic sampler and the gas chain; detectors additionally get
    the closed shadow trace + forward cubic."""
    from i3rc_tpu.integrators.integrator import Integrator

    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False)
    integ = Integrator.create(_c1_gas_domain(), config=cfg)
    plan = _plan(integ)
    assert plan is not None
    assert plan.cubic is not None and plan.gas_factor is not None
    integ_d = Integrator.create(_c1_gas_domain(), config=cfg,
                                intensity_mus=[1.0, 0.5],
                                intensity_phis=[0.0, 0.0])
    plan_d = _plan(integ_d)
    assert plan_d is not None and plan_d.closed_shadow
    assert plan_d.fwd_cubic is not None and plan_d.gas_factor is not None


def test_gas_channel_tabulated_phase_matches_general():
    """Flux + radiance cross-check of the tabulated-cloud + gas fastpath
    against the general kernel (same physics, independent kernels)."""
    from i3rc_tpu.integrators.integrator import Integrator

    n = 1 << 16
    src = PhotonSource.directional(0.5, 0.0)
    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    fast = Integrator.create(_c1_gas_domain(), config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False), **det)
    assert _plan(fast) is not None
    gen = Integrator.create(_c1_gas_domain(), config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False), **det)
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(61))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(62))
    s2 = np.sqrt(2 * 0.25 / n)
    for name in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        assert float(getattr(rf, name)) == pytest.approx(
            float(getattr(rg, name)), abs=5 * s2), name
    # C.1's forward peak makes single-seed local-estimate radiances noisy
    # (~2-3% stderr at 2^16; measured no bias over 8 seeds, diff < 1 sigma).
    # 0.15 is ~5 sigma — a missing gas shadow tau would bias by ~40%.
    np.testing.assert_allclose(np.asarray(rf.mean_intensity),
                               np.asarray(rg.mean_intensity), rtol=0.15)


def test_fastpath_refill_budget_exact():
    """n_photons >> lanes: every photon is launched and tallied exactly once."""
    n, lanes = 40000, 4096
    src = PhotonSource.directional(0.5, 0.0)
    integ = _step_cloud(FAST_CFG)
    res = integ.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(7))
    # Tallied weight (Fup + Fdn summed over columns, un-normalized by columns)
    total = float(res.mean_flux_up + res.mean_flux_down)
    assert total == pytest.approx(1.0, abs=1e-5)
    assert int(res.n_photons) == n


def test_column_medium_matches_general_kernel():
    """Column-structured field (the Landsat shape): one homogeneous layer per
    column, exact two-segment transport + per-event one-hot column read."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.integrator import Integrator

    rng = np.random.default_rng(0)
    nx = ny = 8
    nz = 12
    v = rng.uniform(0.0, 0.05, (nx, ny))
    v[0, 0] = 0.0  # an empty column
    ntop = rng.integers(1, nz + 1, (nx, ny))
    ext = np.zeros((nx, ny, nz))
    for i in range(nx):
        for j in range(ny):
            ext[i, j, :ntop[i, j]] = v[i, j]
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    dom = Domain.create(np.linspace(0, 240, nx + 1), np.linspace(0, 240, ny + 1),
                        np.linspace(0, 120, nz + 1))
    dom = dom.add_component("c", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    src = PhotonSource.directional(0.5, 0.0)
    n = 1 << 15
    fast = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500, compute_volume_absorption=False))
    gen = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500, compute_volume_absorption=False,
        use_fastpath=False, majorant_block_size=4))
    plan = fast_plan(fast.geometry, fast._flat, fast.optics, fast.surface,
                     fast.intensity, fast.config)
    assert plan is not None and plan.column_data is not None
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(2))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(3))
    sigma = float(np.sqrt(2 * 0.24 * 0.76 / n))
    assert float(rf.mean_flux_up) == pytest.approx(float(rg.mean_flux_up),
                                                   abs=3 * sigma)
    assert float(rf.mean_flux_up + rf.mean_flux_down) == pytest.approx(1.0, abs=1e-5)
    assert int(rf.n_bad) == 0


def test_multi_entry_column_props_matches_general_kernel():
    """Per-column ssa + multi-entry (Mie/Reff-keyed) phase tables elect the
    fastpath via the widened column read (FastPlan.column_props) — the
    PhysicalPropertiesToDomain production shape, where each column's Reff
    keys its own table entry (PhysicalPropertiesToDomain.f95:242-276)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.integrator import Integrator

    rng = np.random.default_rng(7)
    nx = ny = 8
    nz = 10
    v = rng.uniform(0.01, 0.06, (nx, ny))
    v[1, 1] = 0.0
    ntop = rng.integers(1, nz + 1, (nx, ny))
    ssa_col = rng.uniform(0.9, 1.0, (nx, ny))
    pfi_col = rng.integers(0, 3, (nx, ny))
    ext = np.zeros((nx, ny, nz))
    ssa = np.zeros((nx, ny, nz))
    pfi = np.zeros((nx, ny, nz), np.int32)
    for i in range(nx):
        for j in range(ny):
            ext[i, j, :ntop[i, j]] = v[i, j]
            ssa[i, j, :ntop[i, j]] = ssa_col[i, j]
            pfi[i, j, :ntop[i, j]] = pfi_col[i, j]
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 32))
         for g in (0.5, 0.7, 0.85)], key=[2.0, 6.0, 10.0])
    dom = Domain.create(np.linspace(0, 240, nx + 1), np.linspace(0, 240, ny + 1),
                        np.linspace(0, 120, nz + 1))
    dom = dom.add_component("mie", ext, ssa, pfi, table)
    src = PhotonSource.directional(0.5, 0.0)
    n = 1 << 15
    fast = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500, compute_volume_absorption=False))
    gen = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500, compute_volume_absorption=False,
        use_fastpath=False, majorant_block_size=4))
    plan = fast_plan(fast.geometry, fast._flat, fast.optics, fast.surface,
                     fast.intensity, fast.config)
    assert plan is not None and plan.column_props
    assert plan.column_data.shape[1] == 5 and plan.cubic_entries == 3
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(2))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(3))
    sigma = float(np.sqrt(2 * 0.3 * 0.7 / n))
    for field in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        assert float(getattr(rf, field)) == pytest.approx(
            float(getattr(rg, field)), abs=4 * sigma), field
    closure = float(rf.mean_flux_up + rf.mean_flux_down
                    + rf.mean_flux_absorbed)
    assert closure == pytest.approx(1.0, abs=1e-5)
    assert int(rf.n_bad) == 0


def test_column_structure_detection():
    from i3rc_tpu.integrators.fastpath import column_structure

    ext = np.zeros((2, 2, 4))
    ext[0, 0, :2] = 0.5
    ext[0, 1, 1:3] = 0.25  # elevated base is fine
    cd = column_structure(ext, np.arange(5.0))
    np.testing.assert_allclose(cd, [[0.5, 0, 2], [0.25, 1, 3],
                                    [0.0, 0, 0], [0.0, 0, 0]])
    # non-contiguous or non-constant runs are declined
    bad1 = ext.copy(); bad1[0, 0, 3] = 0.5
    assert column_structure(bad1, np.arange(5.0)) is None
    bad2 = ext.copy(); bad2[0, 0, 1] = 0.4
    assert column_structure(bad2, np.arange(5.0)) is None


def test_step_factor_lookup():
    f = StepFactor((1.0, 2.5), (10.0, 20.0, 30.0))
    pos = np.array([0.5, 1.0, 2.0, 2.5, 3.0], np.float32)
    np.testing.assert_allclose(np.asarray(f(pos)), [10, 20, 20, 30, 30])


def test_auto_unroll_defaults():
    """fastpath_unroll=None (the default) resolves to 8 for separable plans
    (the Mosaic compile-time sweet spot) and 32 for column plans (XLA
    path; deeper blocks amortize the gather-bound loop's fixed costs —
    measured 1.5 -> 2.1 M photons/s on Landsat, PERF_NOTES.md)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.integrator import Integrator

    assert _plan(_step_cloud(FAST_CFG)).unroll == 8
    assert _plan(_step_cloud(IntegratorConfig(
        use_ray_tracing=False, fastpath_unroll=16))).unroll == 16
    # Explicit 0 is rejected (warning), not silently treated as auto.
    assert IntegratorConfig(use_ray_tracing=False,
                            fastpath_unroll=0).validate().fastpath_unroll \
        is None

    # Column scene: per-(x, y) single-run columns with differing tops.
    nx, ny, nz = 4, 4, 6
    tops = np.arange(nx * ny).reshape(nx, ny) % (nz + 1)
    ext = np.where(np.arange(nz)[None, None, :] < tops[:, :, None],
                   0.01 + 0.001 * tops[:, :, None], 0.0)
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    dom = Domain.create(30.0 * np.arange(nx + 1), 30.0 * np.arange(ny + 1),
                        20.0 * np.arange(nz + 1))
    dom = dom.add_component("c", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    col_integ = Integrator.create(dom, config=FAST_CFG)
    plan = _plan(col_integ)
    assert plan is not None and plan.column_data is not None
    assert plan.unroll == 32
    # The default lane width is resolved by batch_fn (Integrator._default
    # _lanes) — the layer that actually builds the batch — so callers who
    # pass no n_lanes get the tuned narrow wavefront on column media.
    assert col_integ._default_lanes == (1 << 15)
    assert _step_cloud(FAST_CFG)._default_lanes == (1 << 20)


def test_pallas_event_block_matches_xla_fastpath():
    """The Mosaic event-block kernel (interpret mode off-TPU) reproduces the
    XLA fastpath statistically: same physics code (fast_event), different
    RNG stream (TPU hardware PRNG vs threefry)."""
    n = 1 << 13
    lanes = 1 << 12  # exercises refill; multiple of 1024 (pallas tile rows)
    src = PhotonSource.directional(0.5, 0.0)
    xla = _step_cloud(FAST_CFG)
    pal = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       majorant_block_size=16,
                                       use_pallas_fastpath=True))
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(5))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(6))
    sigma = float(np.sqrt(2 * 0.58 * 0.42 / n))
    assert float(rp.mean_flux_up) == pytest.approx(float(rx.mean_flux_up),
                                                   abs=4 * sigma)
    # Conservative cloud over a black surface: energy closes exactly.
    assert float(rp.mean_flux_up + rp.mean_flux_down) == pytest.approx(1.0, abs=1e-5)
    assert int(rp.n_bad) == 0


def test_pallas_matches_xla_reflecting_surface():
    """A > 0 rides the full Pallas event-block kernel: surface reflection
    resolves at flush time (eager Fdn tally + Bernoulli revive), outside
    the event block, so the Mosaic kernel itself stays surface-agnostic.
    Cross-check both fluxes Pallas-vs-XLA on the step cloud at A=0.4."""
    n = 1 << 13
    lanes = 1 << 12
    src = PhotonSource.directional(0.5, 0.0)
    xla = _step_cloud(FAST_CFG, surface_albedo=0.4)
    pal = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       majorant_block_size=16,
                                       use_pallas_fastpath=True),
                      surface_albedo=0.4)
    assert _plan(pal) is not None and _plan(pal).surface_albedo == pytest.approx(0.4)
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(15))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(16))
    sigma = float(np.sqrt(2 * 0.25 / n))
    assert float(rp.mean_flux_up) == pytest.approx(float(rx.mean_flux_up),
                                                   abs=4 * sigma)
    assert float(rp.mean_flux_down) == pytest.approx(float(rx.mean_flux_down),
                                                     abs=4 * sigma)
    assert int(rp.n_bad) == 0


def test_pallas_matches_xla_gas_channel():
    """The factorized gas collision channel inside the Mosaic event block
    (gas=gas_mode in _build_pallas_block): cross-check fluxes + absorbed
    weight Pallas-vs-XLA, and the weight budget closes."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    nz = 8
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    base = Domain.create([0, 500.], [0, 500.], np.linspace(0, 250, nz + 1))
    ext = np.full((1, 1, nz), 1.0 / 250.0)
    base = base.add_component("cloud", ext, np.ones_like(ext),
                              np.zeros(ext.shape, np.int32), table)
    dom = domain_with_gas_component(base, np.full(nz, 0.5 / 250.0))
    n = 1 << 13
    lanes = 1 << 12
    src = PhotonSource.directional(0.5, 0.0)
    xla = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False))
    pal = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False, use_pallas_fastpath=True))
    assert _plan(pal) is not None and _plan(pal).gas_factor is not None
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(25))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(26))
    sigma = float(np.sqrt(2 * 0.25 / n))
    for field in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        assert float(getattr(rp, field)) == pytest.approx(
            float(getattr(rx, field)), abs=4 * sigma), field
    total = float(rp.mean_flux_up + rp.mean_flux_down + rp.mean_flux_absorbed)
    assert total == pytest.approx(1.0, abs=1e-5)
    assert int(rp.n_bad) == 0


def test_pallas_radiance_smoke():
    """Quick-tier smoke for the Mosaic radiance path (the statistical
    Pallas-vs-XLA cross-checks are slow-tier): the detector triplet lands
    near the frozen anchors, fluxes close, no photon is lost."""
    n = 1 << 12
    src = PhotonSource.directional(0.5, 0.0)
    pal = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       use_pallas_fastpath=True),
                      intensity_mus=[1.0, 0.5, 0.5],
                      intensity_phis=[0.0, 0.0, 180.0])
    assert _plan(pal).closed_shadow
    rp = pal.batch_fn(src, n, n_lanes=1 << 11)(jax.random.PRNGKey(55))
    np.testing.assert_allclose(np.asarray(rp.mean_intensity),
                               [0.1285, 0.3285, 0.1800], rtol=0.35)
    assert float(rp.mean_flux_up + rp.mean_flux_down) == pytest.approx(
        1.0, abs=1e-5)
    assert int(rp.n_bad) == 0


def test_pallas_matches_xla_radiance_detectors():
    """Radiance detectors inside the Mosaic event block (closed-shadow HG
    plans, _build_pallas_block n_detectors): collisions record
    (contribution, exit column) pairs, the per-block glue replays them
    through the one-hot tally.  Cross-check the I3RC detector triplet
    Pallas-vs-XLA on the step cloud; fluxes must still close."""
    n = 1 << 14
    lanes = 1 << 12
    src = PhotonSource.directional(0.5, 0.0)
    det = dict(intensity_mus=[1.0, 0.5, 0.5], intensity_phis=[0.0, 0.0, 180.0])
    xla = _step_cloud(FAST_CFG, **det)
    pal = _step_cloud(IntegratorConfig(use_ray_tracing=False, max_events=500,
                                       compute_volume_absorption=False,
                                       use_pallas_fastpath=True), **det)
    plan = _plan(pal)
    assert plan is not None and plan.closed_shadow and len(plan.detectors) == 3
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(35))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(36))
    ix = np.asarray(rx.mean_intensity)
    ip = np.asarray(rp.mean_intensity)
    # Radiance relative MC noise at 2^14 photons is ~2-3%; 4 sigma ~ 10%.
    np.testing.assert_allclose(ip, ix, rtol=0.12)
    # Frozen cross-validated anchors (BENCH_CASES.md case 2 triplet).
    np.testing.assert_allclose(ip, [0.1285, 0.3285, 0.1800], rtol=0.12)
    assert float(rp.mean_flux_up + rp.mean_flux_down) == pytest.approx(1.0, abs=1e-5)
    assert int(rp.n_bad) == 0


def test_pallas_radiance_with_gas_channel():
    """Gas-channel plans keep detectors on the Mosaic path: the closed
    shadow trace folds the baked gas profile's vertical segments in, and
    the gas collision channel itself already rides the event block."""
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component
    from i3rc_tpu.models.step_cloud import make_step_cloud

    dom = domain_with_gas_component(make_step_cloud(1.0), np.full(32, 3e-4))
    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    n = 1 << 14
    lanes = 1 << 12
    src = PhotonSource.directional(0.5, 0.0)
    xla = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False), **det)
    pal = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, use_pallas_fastpath=True), **det)
    plan = _plan(pal)
    assert plan is not None and plan.gas_factor is not None \
        and plan.closed_shadow
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(45))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(46))
    np.testing.assert_allclose(np.asarray(rp.mean_intensity),
                               np.asarray(rx.mean_intensity), rtol=0.12)
    total = float(rp.mean_flux_up + rp.mean_flux_down + rp.mean_flux_absorbed)
    assert total == pytest.approx(1.0, abs=1e-5)
    assert int(rp.n_bad) == 0


def test_column_volume_absorption_matches_general():
    """Volume absorption (heating rates) on COLUMN media: kind-3 deaths
    scatter into the per-cell grid at flush time, so absorbing column
    scenes (Landsat ssa<1 + heating-rate output) elect the fastpath
    instead of falling to the general kernel (round-2 gap)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.integrator import Integrator

    rng = np.random.default_rng(11)
    nx = ny = 8
    nz = 8
    v = rng.uniform(0.01, 0.05, (nx, ny))
    ntop = rng.integers(2, nz + 1, (nx, ny))
    ext = np.zeros((nx, ny, nz))
    for i in range(nx):
        for j in range(ny):
            ext[i, j, :ntop[i, j]] = v[i, j]
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    dom = Domain.create(np.linspace(0, 240, nx + 1), np.linspace(0, 240, ny + 1),
                        np.linspace(0, 120, nz + 1))
    dom = dom.add_component("c", ext, np.full_like(ext, 0.95),
                            np.zeros(ext.shape, np.int32), table)
    src = PhotonSource.directional(0.5, 0.0)
    n = 1 << 15
    fast = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500))
    plan = fast_plan(fast.geometry, fast._flat, fast.optics, fast.surface,
                     fast.intensity, fast.config)
    assert plan is not None and plan.column_data is not None
    gen = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        use_fastpath=False, majorant_block_size=4))
    rf = fast.batch_fn(src, n)(jax.random.PRNGKey(2))
    rg = gen.batch_fn(src, n)(jax.random.PRNGKey(3))
    sigma = float(np.sqrt(2 * 0.1 * 0.9 / n))
    assert float(rf.mean_flux_absorbed) == pytest.approx(
        float(rg.mean_flux_absorbed), abs=4 * sigma)
    # The layer-resolved profile agrees too (coarser per-layer statistics).
    pf_ = np.asarray(rf.absorbed_profile)
    pg_ = np.asarray(rg.absorbed_profile)
    np.testing.assert_allclose(pf_, pg_, atol=6 * sigma * np.sqrt(nz))
    assert int(rf.n_bad) == 0


def test_multi_entry_column_props_eligibility():
    """Quick-tier guard: per-column ssa + multi-entry tables produce a
    column_props plan with the widened read and flattened cubic (the full
    statistical cross-check runs in the slow tier)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.integrators.integrator import Integrator

    nx = ny = 4
    nz = 4
    ext = np.zeros((nx, ny, nz))
    ssa = np.zeros((nx, ny, nz))
    pfi = np.zeros((nx, ny, nz), np.int32)
    ext[:, :, :2] = 0.02
    ssa[:, :, :2] = 0.97
    pfi[1, 1, :2] = 1
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 16))
         for g in (0.5, 0.8)], key=[2.0, 8.0])
    dom = Domain.create(np.linspace(0, 120, nx + 1), np.linspace(0, 120, ny + 1),
                        np.linspace(0, 60, nz + 1))
    dom = dom.add_component("mie", ext, ssa, pfi, table)
    integ = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, compute_volume_absorption=False))
    plan = _plan(integ)
    assert plan is not None and plan.column_props
    assert plan.column_data.shape == (nx * ny, 5)
    assert plan.cubic_entries == 2
    assert plan.ssa == pytest.approx(0.97)
    # pf index 1 recorded for the (1, 1) column
    assert plan.column_data[1 * ny + 1, 4] == 1.0


def test_closed_shadow_matches_marching_trace():
    """Closed-form transmittance (FastPlan.closed_shadow) vs the unrolled
    marching segment-DDA: both integrate the same piecewise-constant
    extinction exactly and the shadow traces draw no RNG, so the same key
    produces identical collisions and the radiance fields must agree to
    float32 trace accuracy (column totals tighter than per-column, which
    tolerates rare wrap-edge column assignment swaps)."""
    import dataclasses

    from i3rc_tpu.integrators.fastpath import make_fast_tracer

    n = 1 << 14
    src = PhotonSource.directional(0.5, 0.0)
    det = dict(intensity_mus=[1.0, 0.5, -0.5],
               intensity_phis=[0.0, 40.0, 180.0])
    integ = _step_cloud(IntegratorConfig(use_ray_tracing=False,
                                         max_events=500,
                                         compute_volume_absorption=False),
                        **det)
    plan = _plan(integ)
    assert plan is not None and plan.closed_shadow and len(plan.detectors) == 3
    marching = dataclasses.replace(plan, closed_shadow=False, shadow_steps=24)
    t_closed = make_fast_tracer(integ.geometry, plan, integ.config, n)
    t_march = make_fast_tracer(integ.geometry, marching, integ.config, n)
    key = jax.random.PRNGKey(77)
    k_src, k_trace = jax.random.split(key)
    batch = src.sample(k_src, n)
    r_c = t_closed(k_trace, batch, src)
    r_m = t_march(k_trace, batch, src)
    i_c = np.asarray(r_c.intensity, np.float64)
    i_m = np.asarray(r_m.intensity, np.float64)
    assert i_c.sum() > 0.0
    np.testing.assert_allclose(i_c.sum(), i_m.sum(), rtol=2e-4)
    np.testing.assert_allclose(i_c, i_m, rtol=0.02,
                               atol=1e-3 * float(i_m.max()))
    # Fluxes ride the identical transport stream: bitwise-equal tallies.
    np.testing.assert_array_equal(np.asarray(r_c.flux_up),
                                  np.asarray(r_m.flux_up))


def test_forward_cubic_fit_accuracy():
    """The log-space cubic fit of the forward phase table reproduces the
    C.1 values (forward peak included) to a few tenths of a percent —
    far inside the MC noise the radiance cross-checks resolve."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import PhaseFunctionTable
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.tables import build_forward_cubic
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated

    table = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                    key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250, 5))
    ext = np.full((1, 1, 4), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    integ = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, compute_volume_absorption=False))
    flat = integ._flat
    coeffs = build_forward_cubic(flat)[0, 0]           # (S, 4)
    s = coeffs.shape[0]
    theta = np.linspace(1e-4, np.pi - 1e-4, 4001)
    pos = theta / np.pi * s
    seg = np.clip(pos.astype(int), 0, s - 1)
    t = pos - seg
    c = coeffs[seg].astype(np.float64)
    fit = np.exp(((c[:, 3] * t + c[:, 2]) * t + c[:, 1]) * t + c[:, 0])
    exact = np.asarray(flat.forward_tables[0].values(theta))[:, 0]
    np.testing.assert_allclose(fit, exact, rtol=5e-3)


def test_tabulated_phase_radiance_on_fastpath():
    """Tabulated-phase (C.1) radiance detectors stay on the fastpath:
    the log-cubic forward read + closed-form shadow traces cross-check
    against the general kernel's dense-table local estimation."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import PhaseFunctionTable
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    table = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                    key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250, 5))
    ext = np.full((1, 1, 4), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    f = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False), **det)
    plan = _plan(f)
    assert plan is not None and plan.fwd_cubic is not None
    assert plan.closed_shadow and plan.detectors
    g = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False), **det)
    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(21))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(22))
    i_f = np.asarray(rf.mean_intensity)
    i_g = np.asarray(rg.mean_intensity)
    assert i_f.min() > 0.0
    np.testing.assert_allclose(i_f, i_g, rtol=0.08)
    assert float(rf.mean_flux_up + rf.mean_flux_down) == pytest.approx(
        1.0, abs=1e-4)


def test_closed_shadow_eligibility():
    """Plan wiring for the closed-form transmittance: 2-D scenes elect it
    (no step-budget cap), fully-3-D separable scenes keep the bounded
    marching trace, tabulated tables carry the forward-value fit."""
    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    p2d = _plan(_step_cloud(FAST_CFG, **det))
    assert p2d is not None and p2d.closed_shadow and p2d.shadow_steps == 0
    assert p2d.fwd_cubic is None  # exact HG: analytic phase value

    # Both horizontal factors non-trivial: marching fallback with a budget.
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))],
        key=[1.0])
    nx = ny = 2
    vx = np.array([1.0, 2.0])
    vy = np.array([1.0, 3.0])
    ext = (vx[:, None, None] * vy[None, :, None]
           * np.full((1, 1, 4), 4.0 / 250.0))
    dom = Domain.create(np.linspace(0, 500, nx + 1), np.linspace(0, 500, ny + 1),
                        np.linspace(0, 250, 5))
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    p3d = _plan(Integrator.create(dom, config=FAST_CFG, **det))
    assert p3d is not None and not p3d.closed_shadow and p3d.shadow_steps > 0


def test_gas_radiance_eligibility():
    """Gas-channel plans admit detectors on the closed shadow trace only:
    the gas adds vertical closed-form segments to every shadow ray; the
    marching fallback (both horizontal factors varying) rejects."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    nz = 4
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    base = Domain.create(np.linspace(0, 500, 3), [0, 500.],
                         np.linspace(0, 250, nz + 1))
    ext = (np.array([1.0, 3.0])[:, None, None]
           * np.full((1, 1, nz), 1.0 / 250.0))
    base = base.add_component("cloud", ext, np.ones_like(ext),
                              np.zeros(ext.shape, np.int32), table)
    gas_prof = np.array([0.5, 0.5, 1.5, 1.5]) / 250.0
    dom = domain_with_gas_component(base, gas_prof)
    plan = _plan(Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False), **det))
    assert plan is not None and plan.gas_factor is not None
    assert plan.closed_shadow and len(plan.detectors) == 2
    assert plan.gas_factor.n_ops == 1    # two gas segments

    # Both horizontal factors non-trivial: no closed trace, gas rejects.
    ext3 = (np.array([1.0, 3.0])[:, None, None]
            * np.array([1.0, 2.0])[None, :, None]
            * np.full((1, 1, nz), 1.0 / 250.0))
    base3 = Domain.create(np.linspace(0, 500, 3), np.linspace(0, 500, 3),
                          np.linspace(0, 250, nz + 1))
    base3 = base3.add_component("cloud", ext3, np.ones_like(ext3),
                                np.zeros(ext3.shape, np.int32), table)
    dom3 = domain_with_gas_component(base3, gas_prof)
    assert _plan(Integrator.create(dom3, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False), **det)) is None


def test_gas_radiance_matches_general_kernel():
    """Gas channel + radiance detectors on the fastpath: the closed shadow
    trace includes the gas vertical integral; cross-check radiances and the
    energy budget against the general kernel's dense local estimation."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import domain_with_gas_component

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[0.0, 0.0])
    nz = 4
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    base = Domain.create(np.linspace(0, 500, 3), [0, 500.],
                         np.linspace(0, 250, nz + 1))
    ext = (np.array([1.0, 3.0])[:, None, None]
           * np.full((1, 1, nz), 1.0 / 250.0))
    base = base.add_component("cloud", ext, np.ones_like(ext),
                              np.zeros(ext.shape, np.int32), table)
    dom = domain_with_gas_component(
        base, np.array([0.5, 0.5, 1.5, 1.5]) / 250.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False)
    f = Integrator.create(dom, config=cfg, **det)
    plan = _plan(f)
    assert plan is not None and plan.gas_factor is not None
    assert plan.closed_shadow
    g = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=2000,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False), **det)
    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(31))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(32))
    i_f = np.asarray(rf.mean_intensity)
    i_g = np.asarray(rg.mean_intensity)
    assert i_f.min() > 0.0
    np.testing.assert_allclose(i_f, i_g, rtol=0.08)
    total = float(rf.mean_flux_up + rf.mean_flux_down
                  + rf.mean_flux_absorbed)
    assert total == pytest.approx(1.0, abs=1e-4)
    # Fup is small (~0.04: the gas absorbs most of the beam) so its
    # per-run MC sigma at 2^15 photons is ~3% — keep this a loose sanity
    # bound; the radiance agreement above is the real gate.
    np.testing.assert_allclose(
        float(rf.mean_flux_up), float(rg.mean_flux_up), rtol=0.12)


def _thin_domain():
    """Essentially transparent 1-cell domain (surface physics isolated)."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction, PhaseFunctionTable, henyey_greenstein_coefficients)

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 64))],
        key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-9)
    return dom.add_component("thin", ext, np.ones_like(ext),
                             np.zeros(ext.shape, np.int32), table)


def test_brdf_surface_on_fastpath():
    """Uniform-parameter BRDF surfaces ride the flush-time importance draw
    (FastPlan.brdf_fn): revive w.p. min(R, 1) under the cosine-weighted
    outgoing draw, excess max(R, 1) carried on the lane weight.  Quick
    gates (fastpath only — the general-kernel cross-check is the slow-tier
    test below): (a) eligibility incl. Pallas; (b) the 'lambertian' BRDF
    kernel reproduces the scalar-albedo path; (c) transparent-domain
    Cox-Munk Fup equals the host-side hemispheric expectation of the same
    kernel under the cosine-weighted draw (closed-form Monte Carlo)."""
    from i3rc_tpu.core.surface import SurfaceDescription, cox_munk_brdf
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    n = 1 << 14

    # (a) eligibility (host-side only — no compile): every registered
    # uniform BRDF elects the fastpath; gridded fields are tested
    # ineligible in test_ineligible_configs_fall_back.
    for name, params in (("lambertian", [0.3]), ("rpv", [0.2, 0.8, -0.1]),
                         ("cox_munk", [8.0, 1.34]),
                         ("ross_li", [0.2, 0.05, 0.02])):
        integ = Integrator.create(
            make_step_cloud(1.0), config=FAST_CFG,
            surface=SurfaceDescription.uniform(np.float32(params),
                                               brdf_name=name))
        plan = _plan(integ)
        assert plan is not None and plan.brdf_fn is not None, name

    # (b) transparent domain: photons arrive at mu=-0.7/phi=30 exactly
    # once; E[Fup] = E_u1,u2[ R(in -> sqrt(u1), 2 pi u2) ], evaluated on a
    # dense host-side grid of the SAME kernel (midpoint rule).
    import jax.numpy as jnp
    surf = SurfaceDescription.uniform(np.float32([8.0, 1.34]),
                                      brdf_name="cox_munk")
    f0 = Integrator.create(_thin_domain(), config=FAST_CFG, surface=surf)
    assert _plan(f0) is not None and _plan(f0).brdf_fn is not None
    r = f0.batch_fn(PhotonSource.directional(0.7, 30.0), n)(
        jax.random.PRNGKey(23))
    g = 256
    u1 = (np.arange(g) + 0.5) / g
    u2 = (np.arange(g) + 0.5) / g
    mu_o = np.sqrt(u1)[:, None] * np.ones((1, g))
    phi_o = 2.0 * np.pi * u2[None, :] * np.ones((g, 1))
    refl = np.asarray(cox_munk_brdf(
        jnp.float32([8.0, 1.34]), jnp.float32(-0.7),
        jnp.asarray(mu_o, jnp.float32), jnp.float32(np.deg2rad(30.0)),
        jnp.asarray(phi_o, jnp.float32)))
    expect = float(refl.mean())
    # Glint weights fatten the tails: allow ~6 sigma of a Bernoulli bound.
    sig = np.sqrt(max(expect * (1 + expect), 0.05) / n)
    assert float(r.mean_flux_up) == pytest.approx(expect, abs=6 * sig)
    assert float(r.mean_flux_down) == pytest.approx(1.0, abs=1e-4)
    assert int(r.n_bad) == 0


def test_brdf_flux_matches_general_kernel():
    """Cox-Munk glint and Ross-Li hotspot fluxes: fastpath (Bernoulli +
    weight carry) vs the general kernel (continuous weights) — same
    expectation, 4-sigma two-sample gates.  Slow tier (general-kernel
    photon budget)."""
    from i3rc_tpu.core.surface import SurfaceDescription
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    gen_cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                               compute_volume_absorption=False,
                               majorant_block_size=16, use_fastpath=False)
    # Lambertian-as-BRDF == the scalar-albedo path (wgt stays exactly 1).
    lam = Integrator.create(
        make_step_cloud(1.0), config=FAST_CFG,
        surface=SurfaceDescription.uniform([0.3], brdf_name="lambertian"))
    alb = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                            surface_albedo=0.3)
    rl = lam.batch_fn(src, n)(jax.random.PRNGKey(21))
    ra = alb.batch_fn(src, n)(jax.random.PRNGKey(22))
    s2 = float(np.sqrt(2 * 0.25 / n))
    assert float(rl.mean_flux_up) == pytest.approx(float(ra.mean_flux_up),
                                                   abs=4 * s2)
    for brdf_name, params in (("cox_munk", [8.0, 1.34]),
                              ("ross_li", [0.2, 0.05, 0.02])):
        surf = SurfaceDescription.uniform(np.float32(params),
                                          brdf_name=brdf_name)
        f = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                              surface=surf)
        assert _plan(f) is not None and _plan(f).brdf_fn is not None
        g = Integrator.create(make_step_cloud(1.0), config=gen_cfg,
                              surface=surf)
        rf = f.batch_fn(src, n)(jax.random.PRNGKey(31))
        rg = g.batch_fn(src, n)(jax.random.PRNGKey(32))
        # Glint weight carries fatten the tails; measured batch stderr on
        # this shape is ~1.7e-3 at 2^16 -> 4-sigma two-sample ~ 0.014 at
        # 2^15.
        assert float(rf.mean_flux_up) == pytest.approx(
            float(rg.mean_flux_up), abs=0.017), brdf_name
        assert float(rf.mean_flux_down) == pytest.approx(
            float(rg.mean_flux_down), abs=0.017), brdf_name
        assert int(rf.n_bad) == 0


def test_brdf_radiance_on_fastpath():
    """BRDF surface radiance on the fastpath: every bottom hit estimates
    R(in -> detector)/pi with the pre-reflection lane weight (the general
    kernel's surface_detector_pf).  Transparent domain -> the estimate is
    DETERMINISTIC: I_d == R(sun -> d)/pi from the host-side reference
    implementation.  The step cloud cross-checks against the general
    kernel including the surface component slot."""
    from i3rc_tpu.core.surface import SurfaceDescription
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[40.0, 0.0])
    surf = SurfaceDescription.uniform(np.float32([0.2, 0.8, -0.1]),
                                      brdf_name="rpv")
    f0 = Integrator.create(_thin_domain(), config=FAST_CFG, surface=surf,
                           **det)
    plan = _plan(f0)
    assert plan is not None and plan.brdf_fn is not None and plan.detectors
    n = 1 << 14
    r = f0.compute(jax.random.PRNGKey(3),
                   PhotonSource.directional(0.7, 30.0), n)
    iv = np.asarray(r.mean_intensity)
    expect = float(surf.reflectance_host(
        np.float32([0.0]), np.float32([0.0]), np.float32([-0.7]),
        np.float32([0.5]), np.float32([np.deg2rad(30.0)]),
        np.float32([np.deg2rad(40.0)]))[0]) / np.pi
    assert iv[0] == pytest.approx(expect, rel=1e-3)
    assert iv[1] == 0.0          # reflection emits upward only


def test_brdf_radiance_matches_general_kernel():
    """BRDF surface radiance, fastpath vs general kernel on the step cloud
    (statistical; the deterministic closed-form pin is the quick-tier
    test above).  Slow tier."""
    from i3rc_tpu.core.surface import SurfaceDescription
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    det = dict(intensity_mus=[0.5, -0.5], intensity_phis=[40.0, 0.0])
    surf = SurfaceDescription.uniform(np.float32([0.2, 0.8, -0.1]),
                                      brdf_name="rpv")
    src = PhotonSource.directional(0.5, 0.0)
    n = 1 << 15
    f = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                          surface=surf, **det)
    g = Integrator.create(make_step_cloud(1.0), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False), surface=surf, **det)
    rf = f.batch_fn(src, n)(jax.random.PRNGKey(41))
    rg = g.batch_fn(src, n)(jax.random.PRNGKey(42))
    np.testing.assert_allclose(np.asarray(rf.mean_intensity),
                               np.asarray(rg.mean_intensity), rtol=0.08)
    bc_f = np.asarray(rf.intensity_by_component).mean(axis=(0, 1))
    bc_g = np.asarray(rg.intensity_by_component).mean(axis=(0, 1))
    assert bc_f[0, 0] > 0          # surface slot populated (up detector)
    np.testing.assert_allclose(bc_f[:, 0], bc_g[:, 0], rtol=0.12)


def test_pallas_matches_xla_brdf_surface():
    """BRDF reflection resolves in the per-block glue, so BRDF runs keep
    the full Pallas event-block kernel (the lane weight scales replayed
    records/tallies outside Mosaic).  Cross-check Pallas-vs-XLA fluxes and
    detector radiances on the step cloud with the Cox-Munk surface."""
    from i3rc_tpu.core.surface import SurfaceDescription
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    n = 1 << 13
    lanes = 1 << 12
    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 60.0])
    surf = SurfaceDescription.uniform(np.float32([6.0, 1.34]),
                                      brdf_name="cox_munk")
    src = PhotonSource.directional(0.5, 0.0)
    xla = Integrator.create(make_step_cloud(1.0), config=FAST_CFG,
                            surface=surf, **det)
    pal = Integrator.create(make_step_cloud(1.0), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_pallas_fastpath=True), surface=surf, **det)
    assert _plan(pal) is not None and _plan(pal).brdf_fn is not None
    rx = xla.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(51))
    rp = pal.batch_fn(src, n, n_lanes=lanes)(jax.random.PRNGKey(52))
    sigma = float(np.sqrt(2 * 0.25 / n))
    assert float(rp.mean_flux_up) == pytest.approx(float(rx.mean_flux_up),
                                                   abs=5 * sigma)
    assert float(rp.mean_flux_down) == pytest.approx(
        float(rx.mean_flux_down), abs=5 * sigma)
    np.testing.assert_allclose(np.asarray(rp.mean_intensity),
                               np.asarray(rx.mean_intensity), rtol=0.15)


def test_iwabuchi_on_fastpath():
    """zeta_min > 0 radiance runs ELECT the fastpath (round-4): the
    roulette is an elementwise rule on the exact closed-form tau, matching
    the general kernel's estimator in expectation.  Gates: eligibility,
    unbiasedness vs the exact-estimator fastpath, and the general-kernel
    cross-check."""
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    iw_cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                              compute_volume_absorption=False,
                              majorant_block_size=16,
                              use_russian_roulette_for_intensity=True,
                              zeta_min=0.3)
    f_iw = Integrator.create(make_step_cloud(1.0), config=iw_cfg, **det)
    assert _plan(f_iw) is not None          # elects the fastpath
    f_ex = Integrator.create(make_step_cloud(1.0), config=FAST_CFG, **det)
    g_iw = Integrator.create(make_step_cloud(1.0), config=IntegratorConfig(
        use_ray_tracing=False, max_events=500,
        compute_volume_absorption=False, majorant_block_size=16,
        use_fastpath=False, use_russian_roulette_for_intensity=True,
        zeta_min=0.3), **det)
    n = 1 << 15
    src = PhotonSource.directional(0.5, 0.0)
    r_iw = f_iw.batch_fn(src, n)(jax.random.PRNGKey(61))
    r_ex = f_ex.batch_fn(src, n)(jax.random.PRNGKey(62))
    r_g = g_iw.batch_fn(src, n)(jax.random.PRNGKey(63))
    np.testing.assert_allclose(np.asarray(r_iw.mean_intensity),
                               np.asarray(r_ex.mean_intensity), rtol=0.05)
    np.testing.assert_allclose(np.asarray(r_iw.mean_intensity),
                               np.asarray(r_g.mean_intensity), rtol=0.05)


def test_ratio_tracking_upgrades_to_exact_on_fastpath():
    """use_ratio_tracking_for_intensity runs ELECT the fastpath, where the
    transmittance is already closed-form: the request upgrades to the
    exact trace (identical expectation, strictly lower variance).  The
    plan and the traced results are bit-identical to the default
    estimator's (same kernel, same RNG stream)."""
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.models.step_cloud import make_step_cloud

    det = dict(intensity_mus=[0.5], intensity_phis=[0.0])
    rt_cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                              compute_volume_absorption=False,
                              majorant_block_size=16,
                              use_ratio_tracking_for_intensity=True)
    f_rt = Integrator.create(make_step_cloud(1.0), config=rt_cfg, **det)
    assert _plan(f_rt) is not None
    f_ex = Integrator.create(make_step_cloud(1.0), config=FAST_CFG, **det)
    n = 1 << 13
    src = PhotonSource.directional(0.5, 0.0)
    r_rt = f_rt.batch_fn(src, n)(jax.random.PRNGKey(71))
    r_ex = f_ex.batch_fn(src, n)(jax.random.PRNGKey(71))
    np.testing.assert_array_equal(np.asarray(r_rt.intensity),
                                  np.asarray(r_ex.intensity))
