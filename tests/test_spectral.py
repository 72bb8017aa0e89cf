"""Broadband k-distribution spectral loop tests (beyond-reference capability).

Oracle: with a transparent cloud field and pure gaseous absorption, each k
point is exact Beer-Lambert, so the broadband transmission is the weighted
sum  T = sum_b f_b sum_k w_bk exp(-tau_bk / mu0)  in closed form.
"""

from dataclasses import replace

import jax
import numpy as np
import pytest

from i3rc_tpu import Domain, IntegratorConfig, PhotonSource
from i3rc_tpu.core.k_distribution import (
    KDistribution,
    read_k_distribution,
    write_k_distribution,
)
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)
from i3rc_tpu.integrators.spectral import run_broadband


def transparent_domain(n_layers=4, thickness=1.0):
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, thickness, n_layers + 1))
    ext = np.full((1, 1, n_layers), 1e-9)
    return dom.add_component("cloud", ext, np.ones_like(ext),
                             np.zeros(ext.shape, np.int32), table)


def test_k_distribution_object_and_io(tmp_path):
    z = np.linspace(0.0, 1.0, 5)
    profiles = np.array([[0.1, 1.0], [0.2, 2.0], [0.3, 3.0], [0.4, 4.0]])
    kd = KDistribution.create(z, profiles, [0.7, 0.3],
                              description="test band",
                              wavelength_limits=(2.6, 2.8),
                              spectral_fraction=0.4)
    assert kd.n_k == 2 and kd.n_layers == 4
    # regridding conserves column optical depth
    coarse = np.array([0.0, 0.5, 1.0])
    p = kd.absorption_profile(0, coarse)
    assert np.sum(p * np.diff(coarse)) == pytest.approx(
        np.sum(profiles[:, 0] * np.diff(z)))
    path = str(tmp_path / "band.kd")
    write_k_distribution(kd, path)
    back = read_k_distribution(path)
    np.testing.assert_allclose(back.absorption_profiles, profiles, rtol=1e-6)
    np.testing.assert_allclose(back.weights, [0.7, 0.3], rtol=1e-6)
    assert back.spectral_fraction == pytest.approx(0.4, rel=1e-6)
    assert back.wavelength_limits[0] == pytest.approx(2.6, rel=1e-6)


def test_broadband_beer_lambert():
    mu0 = 0.5
    dom = transparent_domain()
    z = np.asarray(dom.z_edges)
    # Two bands, two k points each; tau = profile * thickness(=1)
    taus = {0: np.array([0.2, 2.0]), 1: np.array([0.05, 0.8])}
    weights = {0: np.array([0.6, 0.4]), 1: np.array([0.5, 0.5])}
    fractions = {0: 0.7, 1: 0.3}
    kds = [KDistribution.create(
        z, np.broadcast_to(taus[b][None, :] / (z[-1] - z[0]), (4, 2)).copy(),
        weights[b], spectral_fraction=fractions[b]) for b in (0, 1)]

    broadband, bands = run_broadband(
        dom, kds, PhotonSource.directional(mu0, 0.0),
        n_photons_per_batch=20_000, n_batches=2, seed=4,
        config=IntegratorConfig(use_ray_tracing=False))

    expected = sum(fractions[b] * np.sum(weights[b] * np.exp(-taus[b] / mu0))
                   for b in (0, 1))
    got = float(np.asarray(broadband.flux_down).mean())
    assert got == pytest.approx(expected, rel=5e-3)
    # Per-band means also match their own closed forms, within the band's
    # own reported standard error (the (value, StdErr) contract).
    for b in (0, 1):
        band_expected = np.sum(weights[b] * np.exp(-taus[b] / mu0))
        band_got = float(np.asarray(bands[b].mean.flux_down).mean())
        assert band_got == pytest.approx(band_expected, rel=5e-3)
        band_se = float(np.asarray(bands[b].stderr.flux_down).mean())
        assert np.isfinite(band_se) and band_se > 0
        assert abs(band_got - band_expected) < 6 * max(band_se, 1e-5)
    # Absorbed + transmitted closes (reflection negligible)
    total = float(np.asarray(broadband.flux_down).mean()
                  + np.asarray(broadband.flux_absorbed).mean())
    assert total == pytest.approx(1.0, rel=5e-3)


def test_broadband_bake_fastpath_matches_traced():
    """run_band(bake_fastpath=True): per-k baked fastpath executables give
    the same band means as the traced-override general-kernel path (the
    ~20x production spectral-loop mode; PERF_NOTES 'Gas-channel
    fastpath').  Different RNG streams, so agreement is statistical."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.step_cloud import make_step_cloud

    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[4e-4, 4e-3]], (32, 2)).copy(), [0.7, 0.3],
        spectral_fraction=1.0)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=False,
                           majorant_block_size=16)
    integ = Integrator.create(
        dom_gas := domain_with_gas_component(
            dom, kd.absorption_profiles_on(z)[:, 0]), config=cfg)
    n = 1 << 13
    cache = {}
    baked = run_band(integ, dom, kd, src, n, 2, seed=5,
                     bake_fastpath=True, integrator_cache=cache)
    traced = run_band(integ, dom, kd, src, n, 2, seed=5)
    f_b = float(np.asarray(baked.mean.flux_up).mean())
    f_t = float(np.asarray(traced.mean.flux_up).mean())
    sigma = float(np.sqrt(2 * 0.4 * 0.6 / (2 * n * 2)))
    assert f_b == pytest.approx(f_t, abs=4 * sigma)


def test_broadband_fuse_k_matches_baked():
    """run_band(fuse_k=True): the whole band in ONE dispatch (k as a
    per-lane attribute, fastpath.GasKTables) agrees with the per-k baked
    fastpath loop on every flux component and closes energy exactly.
    Different RNG streams and lane partitions, so agreement is
    statistical."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.step_cloud import make_step_cloud

    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[4e-4], [4e-3], [2e-2]], (3, 32)).T.copy(),
        [0.5, 0.3, 0.2], spectral_fraction=1.0)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=False,
                           majorant_block_size=16)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg)
    n = 1 << 13
    baked = run_band(integ, dom, kd, src, n, 2, seed=5,
                     bake_fastpath=True, integrator_cache={})
    fused = run_band(integ, dom, kd, src, n, 2, seed=7, fuse_k=True,
                     integrator_cache={})
    sigma = float(np.sqrt(2 * 0.4 * 0.6 / (2 * n * 2)))
    for field in ("flux_up", "flux_down", "flux_absorbed"):
        f_b = float(np.asarray(getattr(baked.mean, field)).mean())
        f_f = float(np.asarray(getattr(fused.mean, field)).mean())
        assert f_f == pytest.approx(f_b, abs=4 * sigma), field
        # Both modes report a band-mean stderr (fused: batches are full
        # weighted-band samples; baked: sqrt(sum_k (w_k se_k)^2)).
        for b in (baked, fused):
            se = float(np.asarray(getattr(b.stderr, field)).mean())
            assert np.isfinite(se) and se >= 0, field
    closure = sum(float(np.asarray(getattr(fused.mean, f)).mean())
                  for f in ("flux_up", "flux_down", "flux_absorbed"))
    assert closure == pytest.approx(1.0, rel=1e-5)


def test_fuse_k_beer_lambert():
    """Quick fused-k gate: with a transparent cloud, every k point is exact
    Beer-Lambert, so the fused single-dispatch band transmission must match
    the closed form  T = sum_k w_k exp(-tau_k / mu0).  (The statistical
    fused-vs-baked cross-checks are in the slow tier; this keeps a cheap
    closed-form test of the fused path in the quick gate.)"""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )

    mu0 = 0.5
    # Near-transparent cloud: tau_c = 1e-3 — big enough to survive the f32
    # fractional-extinction reconstruction next to the gas (transparent_
    # domain's 1e-9 would be rounded away and kill gas eligibility),
    # small enough to leave Beer-Lambert intact at the 5e-3 gate.
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, 1.0, 5))
    ext = np.full((1, 1, 4), 1e-3)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    z = np.asarray(dom.z_edges)
    taus = np.array([0.2, 2.0])
    weights = np.array([0.6, 0.4])
    kd = KDistribution.create(
        z, np.broadcast_to(taus[None, :] / (z[-1] - z[0]), (4, 2)).copy(),
        weights, spectral_fraction=1.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=100,
                           compute_volume_absorption=False)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg)
    n = 20_000
    band = run_band(integ, dom, kd, PhotonSource.directional(mu0, 0.0),
                    n, 2, seed=3, fuse_k=True, integrator_cache={})
    expected = float(np.sum(weights * np.exp(-taus / mu0)))
    got = float(np.asarray(band.mean.flux_down).mean())
    assert got == pytest.approx(expected, rel=5e-3)
    closure = sum(float(np.asarray(getattr(band.mean, f)).mean())
                  for f in ("flux_up", "flux_down", "flux_absorbed"))
    assert closure == pytest.approx(1.0, rel=1e-5)


def test_fuse_k_volume_absorption_beer_lambert():
    """Fused-k heating-rate bands: with a near-transparent cloud the
    per-layer gas absorption is closed-form — the direct beam deposits
    A_l = sum_k w_k [exp(-tau_k (1-z_top)/mu0) - exp(-tau_k (1-z_bot)/mu0)]
    in layer l.  Gates the exact Gz-inversion death positions (a constant-
    gz interpolation would smear absorption across the layers a long
    clear-air step crosses — exactly this geometry)."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )

    mu0 = 0.5
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, 1.0, 5))
    # Cloud in the BOTTOM layer only: the clear-air step above it spans
    # three gas layers in ONE transport step (no cloud faces), which is
    # where a constant-gz death interpolation smears the heating profile.
    ext = np.array([1e-3, 0.0, 0.0, 0.0]).reshape(1, 1, 4)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    z = np.asarray(dom.z_edges)
    # LAYERED gas profiles (per-layer tau, bottom-up): non-uniform in z so
    # the constant-gz interpolation would misplace deaths (it deposits
    # uniformly in distance along the spanning step).
    layer_taus = np.array([[0.05, 1.5],
                           [0.10, 0.3],
                           [0.20, 0.1],
                           [0.40, 0.05]])       # (n_lay, n_k)
    weights = np.array([0.6, 0.4])
    dz = 0.25
    kd = KDistribution.create(z, layer_taus / dz, weights,
                              spectral_fraction=1.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=100,
                           compute_volume_absorption=True)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg)
    n = 40_000
    band = run_band(integ, dom, kd, PhotonSource.directional(mu0, 0.0),
                    n, 2, seed=3, fuse_k=True, integrator_cache={})
    vol = np.asarray(band.mean.volume_absorption).reshape(4)  # (nz,), per m
    expect = np.zeros(4)
    for k, w in enumerate(weights):
        # tau above each edge (edges bottom-up, 5 of them)
        tau_above = np.concatenate(
            [np.cumsum(layer_taus[::-1, k])[::-1], [0.0]])
        t_at = np.exp(-tau_above / mu0)          # transmission at each edge
        expect += w * (t_at[1:] - t_at[:-1]) / dz   # per-meter deposit
    sigma = np.sqrt(np.maximum(expect * dz, 1e-4) / (2 * n)) / dz
    assert np.all(np.abs(vol - expect) < 5 * sigma + 8e-3), (vol, expect)
    # The volume tally integrates to the absorbed flux.
    fabs = float(np.asarray(band.mean.flux_absorbed).mean())
    assert vol.sum() * dz == pytest.approx(fabs, abs=1e-5)


def test_fuse_k_volume_absorption_matches_baked():
    """Fused-k heating rates on the step cloud (absorbing cloud + layered
    gas): the 3-D volume-absorption field's layer profile agrees with the
    per-k baked loop, which bakes each k's gas into its own executable and
    resolves gas deaths at exact gas-face granularity.  Mixed death
    classes (cloud Bernoulli + gas threshold) both land in their cells."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.step_cloud import make_step_cloud

    dom = make_step_cloud(0.99)
    z = np.asarray(dom.z_edges)
    nz = z.size - 1
    # Bottom-heavy layered gas, two k points; 4 vertical blocks (the gas
    # chain compresses run-lengths and caps at MAX_SEGMENTS=24 faces).
    prof = np.stack(
        [np.repeat([2e-3, 1e-3, 5e-4, 2e-4], nz // 4),
         np.repeat([8e-2, 3e-2, 1.5e-2, 8e-3], nz // 4)], axis=1)
    kd = KDistribution.create(z, prof, [0.6, 0.4], spectral_fraction=1.0)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=200,
                           compute_volume_absorption=True)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg)
    n = 1 << 13
    fused = run_band(integ, dom, kd, src, n, 3, seed=7, fuse_k=True,
                     integrator_cache={})
    baked = run_band(integ, dom, kd, src, n, 3, seed=5, bake_fastpath=True,
                     integrator_cache={})
    v_f = np.asarray(fused.mean.volume_absorption).reshape(-1, nz).sum(0)
    v_b = np.asarray(baked.mean.volume_absorption).reshape(-1, nz).sum(0)
    se_f = np.sqrt((np.asarray(fused.stderr.volume_absorption)
                    .reshape(-1, nz) ** 2).sum(0))
    se_b = np.sqrt((np.asarray(baked.stderr.volume_absorption)
                    .reshape(-1, nz) ** 2).sum(0))
    sig = np.sqrt(se_f ** 2 + se_b ** 2) + 1e-4 * max(v_b.max(), 1e-9)
    assert np.all(np.abs(v_f - v_b) < 5 * sig), (v_f, v_b, sig)
    # Integral closes against the absorbed flux in both modes.
    dz = float(z[1] - z[0])
    for b in (fused, baked):
        fabs = float(np.asarray(b.mean.flux_absorbed).mean())
        vint = float(np.asarray(b.mean.volume_absorption).reshape(-1, nz)
                     .mean(0).sum() * dz)
        assert vint == pytest.approx(fabs, rel=2e-5, abs=1e-6)


def test_fuse_k_tabulated_cloud_matches_traced():
    """Fused-k with a TABULATED (non-HG, C.1) cloud — the production
    broadband class (Mie cloud + k-distribution gas) — against the
    traced-override general-kernel loop: fluxes and radiances agree."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated

    table = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                    key=[1.0])
    nz = 4
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250, nz + 1))
    ext = np.full((1, 1, nz), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[0.3, 3.0]], (nz, 2)).copy() / 250.0, [0.7, 0.3],
        spectral_fraction=1.0)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                           compute_volume_absorption=False)
    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    integ_f = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg, **det)
    n = 1 << 14
    fused = run_band(integ_f, dom, kd, src, n, 4, seed=7, fuse_k=True,
                     integrator_cache={})
    assert fused.per_k == []    # really took the fused dispatch
    integ_g = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=replace(cfg, use_fastpath=False, majorant_block_size=4),
        **det)
    traced = run_band(integ_g, dom, kd, src, n, 4, seed=5)
    for f in ("flux_up", "flux_down", "flux_absorbed"):
        a = float(np.asarray(getattr(fused.mean, f)).mean())
        b = float(np.asarray(getattr(traced.mean, f)).mean())
        se = np.hypot(float(np.asarray(getattr(fused.stderr, f)).mean()),
                      float(np.asarray(getattr(traced.stderr, f)).mean()))
        assert abs(a - b) < 5 * se + 5e-4, (f, a, b, se)
    i_f = np.asarray(fused.mean.intensity).reshape(-1, 2).mean(0)
    i_g = np.asarray(traced.mean.intensity).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(i_f, i_g, rtol=0.15)


def test_fuse_k_auto_fallback():
    """fuse_k='auto': fused dispatch when the band is eligible (per_k is
    empty — batches are whole-band samples), per-k fallback when it is
    not (non-separable 3-D cloud; per_k holds each k's stats)."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=100)

    # Eligible: uniform slab cloud -> fused (per_k empty).
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, 1.0, 5))
    ext = np.full((1, 1, 4), 1e-3)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[0.4, 4.0]], (4, 2)).copy(), [0.6, 0.4],
        spectral_fraction=1.0)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg)
    band = run_band(integ, dom, kd, src, 4096, 2, seed=3, fuse_k="auto",
                    integrator_cache={})
    assert band.per_k == []

    # Ineligible: random 3-D cloud (not rank-1 separable) -> baked fallback.
    rng = np.random.default_rng(0)
    dom3 = Domain.create(np.linspace(0, 4.0, 5), [0, 1.0],
                         np.linspace(0, 1.0, 5))
    ext3 = rng.uniform(0.5, 2.0, (4, 1, 4))
    dom3 = dom3.add_component("cloud", ext3, np.ones_like(ext3),
                              np.zeros(ext3.shape, np.int32), table)
    z3 = np.asarray(dom3.z_edges)
    kd3 = KDistribution.create(
        z3, np.broadcast_to([[0.4, 4.0]], (4, 2)).copy(), [0.6, 0.4],
        spectral_fraction=1.0)
    integ3 = Integrator.create(
        domain_with_gas_component(dom3, kd3.absorption_profiles_on(z3)[:, 0]),
        config=cfg)
    cache3 = {}
    band3 = run_band(integ3, dom3, kd3, src, 4096, 2, seed=3, fuse_k="auto",
                     integrator_cache=cache3)
    assert len(band3.per_k) == 2
    # No fastpath plan exists for this cloud, so the fallback must be the
    # traced-override loop (ONE executable for all k), not per-k baked
    # general-kernel recompiles: the cache holds only the memoized auto
    # decision (so later band runs skip the failed-fused probe), never a
    # baked per-k integrator.
    assert list(cache3) == [("auto_decision", id(kd3), id(dom3), False)]
    assert cache3[("auto_decision", id(kd3), id(dom3), False)][0] == {
        "bake_fastpath": False}
    closure = sum(float(np.asarray(getattr(band3.mean, f)).mean())
                  for f in ("flux_up", "flux_down", "flux_absorbed"))
    assert closure == pytest.approx(1.0, rel=2e-2)
    # Second run of the same band: decision served from the cache (no new
    # entries, same statistics).
    band3b = run_band(integ3, dom3, kd3, src, 4096, 2, seed=3, fuse_k="auto",
                      integrator_cache=cache3)
    assert len(cache3) == 1
    np.testing.assert_allclose(np.asarray(band3b.mean.flux_up),
                               np.asarray(band3.mean.flux_up))


def test_spectral_loop_brdf_surface_sharded():
    """BASELINE config 5 end-to-end shape: kDistribution spectral loop +
    surface BRDF + sharded mesh.  Since round 4 uniform-parameter BRDF
    surfaces elect the fastpath (flush-time BRDF reflection), so
    fuse_k='auto' must pick the FUSED single-dispatch loop, run sharded
    over the 8-device CPU mesh, the RPV surface must raise the band's
    upwelling flux over the black-surface band, and the fused band must
    agree statistically with the traced-override general-kernel loop."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.surface import SurfaceDescription
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.parallel.mesh import default_mesh

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=100)
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, 1.0, 5))
    ext = np.full((1, 1, 4), 1.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[0.2, 2.0]], (4, 2)).copy(), [0.6, 0.4],
        spectral_fraction=1.0)
    mesh = default_mesh(np.array(jax.devices()[:8]))
    rpv = SurfaceDescription.uniform([0.4, 1.0, 0.0], brdf_name="rpv")
    dom_gas = domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0])

    def band_for(surface, fuse_k="auto", expect=None):
        integ = Integrator.create(dom_gas, config=cfg, surface=surface)
        cache = {}
        band = run_band(integ, dom, kd, src, 2048, 8, seed=7, mesh=mesh,
                        fuse_k=fuse_k, integrator_cache=cache)
        if expect is not None:
            assert cache[("auto_decision", id(kd), id(dom), False)][0] == expect
        fup = np.asarray(band.mean.flux_up)
        se = np.asarray(band.stderr.flux_up)
        return float(fup.mean()), float(np.sqrt((se ** 2).mean()))

    # Round 4: uniform-parameter BRDFs are fastpath- (hence fused-)eligible.
    fup_rpv, se_rpv = band_for(rpv, expect={"fuse_k": True})
    fup_black, _ = band_for(None)
    assert 0.0 < fup_black < fup_rpv < 1.0
    # Cross-check the fused BRDF band against the traced-override general
    # loop (the round-3 fallback path): same physics, different kernels.
    fup_gen, se_gen = band_for(rpv, fuse_k=False)
    assert abs(fup_rpv - fup_gen) < 5.0 * np.hypot(se_rpv, se_gen) + 1e-6, (
        fup_rpv, fup_gen, se_rpv, se_gen)


def test_fuse_k_rejects_override():
    """fuse_k guard: optics overrides don't apply (every k profile baked)."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.optics import flatten_optics
    from i3rc_tpu.integrators.integrator import (
        Integrator,
        device_optics_from_flat,
    )
    from i3rc_tpu.integrators.spectral import domain_with_gas_component
    from i3rc_tpu.models.step_cloud import make_step_cloud
    from i3rc_tpu.parallel.mesh import run_batches

    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[4e-4, 4e-3]], (32, 2)).copy(), [0.7, 0.3])
    dom_gas = domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0])
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=100)
    integ = Integrator.create(
        dom_gas, config=cfg,
        gas_k=(kd.absorption_profiles_on(z).T, kd.weights))
    optics = device_optics_from_flat(flatten_optics(dom_gas),
                                     cfg.majorant_block_size)
    with pytest.raises(ValueError, match="overrides"):
        run_batches(integ, PhotonSource.directional(0.5, 0.0), 1 << 10, 1,
                    optics_override=optics)


def test_fuse_k_radiance_matches_baked():
    """Fused-k bands with radiance detectors + reflecting surface: each
    lane adds its OWN k profile's gas tau to the closed shadow trace, so
    the per-detector band means agree with the per-k baked loop (which
    bakes each k's gas into its own executable).  Downward detector
    included (gas tau = Gz(z)/|mu_d| branch); equal total photons."""
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.step_cloud import make_step_cloud

    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    kd = KDistribution.create(
        z, np.broadcast_to([[2e-3], [2e-2]], (2, 32)).T.copy(), [0.6, 0.4],
        spectral_fraction=1.0)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=200,
                           compute_volume_absorption=False)
    integ = Integrator.create(
        domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
        config=cfg, intensity_mus=[1.0, 0.5, -0.5],
        intensity_phis=[0.0, 0.0, 0.0], surface_albedo=0.3)
    n = 1 << 12
    fused = run_band(integ, dom, kd, src, n, 3, seed=7, fuse_k=True,
                     integrator_cache={})
    baked = run_band(integ, dom, kd, src, n, 3, seed=5, bake_fastpath=True,
                     integrator_cache={})
    i_f = np.asarray(fused.mean.intensity).reshape(-1, 3).mean(axis=0)
    i_b = np.asarray(baked.mean.intensity).reshape(-1, 3).mean(axis=0)
    se_f = np.asarray(fused.stderr.intensity).reshape(-1, 3).mean(axis=0)
    se_b = np.asarray(baked.stderr.intensity).reshape(-1, 3).mean(axis=0)
    sig = np.sqrt(se_f ** 2 + se_b ** 2 + 1e-10)
    assert np.all(np.abs(i_f - i_b) < 5 * sig), (i_f, i_b, sig)
    for field in ("flux_up", "flux_down", "flux_absorbed"):
        f_f = float(np.asarray(getattr(fused.mean, field)).mean())
        f_b = float(np.asarray(getattr(baked.mean, field)).mean())
        assert f_f == pytest.approx(f_b, abs=0.02), field
