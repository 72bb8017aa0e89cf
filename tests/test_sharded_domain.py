"""Sharded-domain tracing: decomposition, migration, agreement.

Beyond-reference capability (SURVEY.md section 5 stretch): the domain is
decomposed in x across mesh devices instead of replicated; photons migrate
between shards through ppermute.  Round 3 generalized the tracer to the
full single-component voxel representation (arbitrary 3-D extinction/ssa,
absorption, reflecting surfaces) with lossless receiver-granted migration.
Validated on the virtual CPU mesh against the replicated-domain kernels on
the same scenes.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.integrator import Integrator
from i3rc_tpu.models.landsat_cloud import make_landsat_cloud
from i3rc_tpu.parallel.sharded_domain import shardable, trace_sharded


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("shard",))


def test_landsat_is_shardable():
    assert shardable(make_landsat_cloud(1.0), _mesh(4))
    # ssa < 1 and any 3-D field are in scope since round 3.
    assert shardable(make_landsat_cloud(0.99), _mesh(4))


def test_sharded_matches_single_device():
    """4-way x-decomposition reproduces the replicated-domain fastpath on
    the ABSORBING Landsat scene (ssa = 0.99 — the round-2 prototype was
    conservative-only).

    CI budget: 2^14 photons (sigma ~ 0.006; the bugs this guards — silent
    immigrant loss, slab-boundary leaks — showed up as 0.1-0.4 absolute
    errors)."""
    dom = make_landsat_cloud(0.99)
    n = 1 << 14
    src = PhotonSource.directional(0.5, 0.0)
    mesh = _mesh(4)
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(2))
    n_total = int(raw.n_photons)
    fup_sharded = float(raw.flux_up.sum()) / n_total
    fabs_sharded = float(raw.flux_absorbed.sum()) / n_total
    # Every photon accounted for: exits + deaths + budget-capped == launched.
    assert (float(raw.flux_up.sum() + raw.flux_down.sum()
                  + raw.flux_absorbed.sum()) + int(raw.n_bad)
            == pytest.approx(n_total, abs=0.5))
    # Migration is lossless by construction (receiver-granted sends); only
    # event-budget drops may appear.
    assert int(raw.n_bad) < 0.001 * n_total + 2
    assert float(raw.n_lane_events) > 0  # photons actually migrated

    ref = Integrator.create(
        dom, config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                     compute_volume_absorption=False))
    res = ref.batch_fn(src, n)(jax.random.PRNGKey(7))
    fup_ref = float(res.mean_flux_up)
    sigma = np.sqrt(fup_ref * (1 - fup_ref) * (1.0 / n + 1.0 / n_total))
    assert fup_sharded == pytest.approx(fup_ref, abs=4 * sigma)
    assert fabs_sharded == pytest.approx(float(res.mean_flux_absorbed),
                                         abs=4 * sigma)


def test_sharded_reflecting_surface():
    """Reflecting Lambertian surface under the sharded tracer: flux tallies
    match the replicated general kernel on a small 3-D random field."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )

    rng = np.random.default_rng(3)
    nx, ny, nz = 16, 4, 6
    ext = rng.uniform(0.0, 0.02, (nx, ny, nz))
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.7, 32))],
        key=[1.0])
    dom = Domain.create(np.linspace(0, 480, nx + 1), np.linspace(0, 120, ny + 1),
                        np.linspace(0, 180, nz + 1))
    dom = dom.add_component("c", ext, np.full_like(ext, 0.95),
                            np.zeros(ext.shape, np.int32), table)
    src = PhotonSource.directional(0.6, 30.0)
    n = 1 << 14
    mesh = _mesh(4)
    assert shardable(dom, mesh)
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(5),
                        surface_albedo=0.4)
    n_total = int(raw.n_photons)
    fup_s = float(raw.flux_up.sum()) / n_total

    ref = Integrator.create(
        dom, surface_albedo=0.4,
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False,
                                use_fastpath=False))
    res = ref.batch_fn(src, n)(jax.random.PRNGKey(9))
    fup_r = float(res.mean_flux_up)
    sigma = np.sqrt(max(fup_r * (1 - fup_r), 0.05) * (1.0 / n + 1.0 / n_total))
    assert fup_s == pytest.approx(fup_r, abs=4 * sigma)
    assert int(raw.n_bad) < 0.001 * n_total + 2


def test_sharded_memory_is_decomposed():
    """Each shard holds 1/n_dev of the cell matrix — the point of the
    feature.  (The public entry shards the (n_dev, cells/n_dev, 2) matrix
    over the mesh axis; verify the per-device buffer shape.)"""
    from i3rc_tpu.core.optics import flatten_optics

    dom = make_landsat_cloud(1.0)
    flat = flatten_optics(dom)
    n_cells = flat.total_ext.size
    n_dev = 4
    per_shard = flat.total_ext.reshape(n_dev, -1)
    assert per_shard.shape[1] == n_cells // n_dev


def _random_absorbing_domain(seed=3, albedo_key=0.95):
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )

    rng = np.random.default_rng(seed)
    nx, ny, nz = 16, 4, 6
    ext = rng.uniform(0.0, 0.02, (nx, ny, nz))
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.7, 32))],
        key=[1.0])
    dom = Domain.create(np.linspace(0, 480, nx + 1),
                        np.linspace(0, 120, ny + 1),
                        np.linspace(0, 180, nz + 1))
    return dom.add_component("c", ext, np.full_like(ext, albedo_key),
                             np.zeros(ext.shape, np.int32), table), nx, ny, nz


def test_sharded_radiance_detectors():
    """Local-estimate radiances on the sharded tracer: migrating shadow
    rays (exact cell-DDA tau, receiver-granted ppermute across slabs)
    reproduce the replicated general kernel's detectors — including a
    reflecting surface term and a downward detector — within the combined
    statistical error.  The slanted mu=0.6/phi=45 detector guarantees the
    shadow rays themselves cross shard boundaries."""
    dom, nx, ny, nz = _random_absorbing_domain()
    src = PhotonSource.directional(0.6, 30.0)
    mus = [1.0, 0.6, -0.5]
    phis = [0.0, 45.0, 0.0]
    n = 1 << 15
    mesh = _mesh(4)
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(5),
                        surface_albedo=0.4,
                        intensity_mus=mus, intensity_phis=phis)
    n_total = int(raw.n_photons)
    assert int(raw.n_bad) < 0.001 * n_total + 2
    # Domain-mean radiance per detector: sum of the raw per-column weight
    # tallies over the uniform grid / total photons.
    I_sh = (np.asarray(raw.intensity).reshape(nx * ny, len(mus)).sum(axis=0)
            / n_total)
    byc = np.asarray(raw.intensity_by_component).reshape(nx * ny, len(mus), 2)
    # Surface (slot 0) contributes to upward detectors only, and the
    # by-component split sums back to the total field.
    np.testing.assert_allclose(byc.sum(axis=-1).sum(axis=0) / n_total, I_sh,
                               rtol=1e-5)
    assert byc[:, 2, 0].sum() == 0.0          # downward detector: no surface
    assert byc[:, 0, 0].sum() > 0.0           # nadir detector sees the surface

    from i3rc_tpu.parallel.mesh import run_batches

    ref = Integrator.create(
        dom, surface_albedo=0.4, intensity_mus=mus, intensity_phis=phis,
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                use_fastpath=False))
    stats = run_batches(ref, src, n // 8, 8, seed=9)
    I_ref = np.asarray(stats.mean.intensity).mean(axis=(0, 1))
    se_ref = np.asarray(stats.stderr.intensity).mean(axis=(0, 1))
    # Combined error: replicated stderr (per-batch spread of the domain
    # mean) twice over, as a proxy for the sharded run's own sigma.
    for d in range(len(mus)):
        assert abs(I_sh[d] - I_ref[d]) < 5 * np.hypot(se_ref[d], se_ref[d]), (
            d, I_sh[d], I_ref[d], se_ref[d])


def test_sharded_volume_absorption():
    """Heating-rate tallies on the sharded tracer: per-cell Bernoulli
    deaths sum to the column flux_absorbed field exactly, and the profile
    matches the replicated kernel's volume absorption."""
    dom, nx, ny, nz = _random_absorbing_domain()
    src = PhotonSource.directional(0.6, 30.0)
    n = 1 << 14
    mesh = _mesh(4)
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(2),
                        compute_volume_absorption=True)
    n_total = int(raw.n_photons)
    vol = np.asarray(raw.volume_absorption).reshape(nx, ny, nz)
    # Per-cell deaths sum to the per-column deaths (same Bernoulli events).
    np.testing.assert_allclose(
        vol.sum(axis=-1), np.asarray(raw.flux_absorbed).reshape(nx, ny),
        rtol=1e-6)

    ref = Integrator.create(
        dom, config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                     compute_volume_absorption=True,
                                     use_fastpath=False))
    res = ref.batch_fn(src, n)(jax.random.PRNGKey(11))
    # z profile of absorbed energy (domain totals), normalized per photon.
    dz = float(np.diff(np.asarray(dom.z_edges))[0])
    prof_sh = vol.sum(axis=(0, 1)) / n_total
    prof_ref = (np.asarray(res.volume_absorption).sum(axis=(0, 1)) * dz
                / (nx * ny))
    sigma = np.sqrt(prof_ref.clip(min=1e-4) / n)   # Poisson-ish per layer
    np.testing.assert_array_less(np.abs(prof_sh - prof_ref), 5 * sigma + 5e-4)


def test_sharded_multicomponent_tabulated():
    """Round-4 generalization: a 2-component scene — a TABULATED-phase
    (Dermendjian C.1) cloud plus a Rayleigh-like component with a second
    HG entry — shards with the cumulative-extinction component pick and
    the replicated cubic mu(p)/log-P fits.  Fluxes AND radiances match the
    replicated general kernel, and the by-component split resolves both
    scatterers."""
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.models.radar_cloud import load_c1_tabulated
    from i3rc_tpu.parallel.mesh import run_batches

    rng = np.random.default_rng(11)
    nx, ny, nz = 16, 4, 6
    cloud_ext = rng.uniform(0.0, 0.02, (nx, ny, nz))
    cloud_ext[cloud_ext < 0.004] = 0.0
    c1 = PhaseFunctionTable.from_phase_functions([load_c1_tabulated()],
                                                 key=[1.0])
    ray_tab = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(np.array([0.0, 0.1]))], key=[1.0])
    dom = Domain.create(np.linspace(0, 480, nx + 1),
                        np.linspace(0, 120, ny + 1),
                        np.linspace(0, 180, nz + 1))
    dom = dom.add_component("cloud", cloud_ext, np.full_like(cloud_ext, 0.95),
                            np.zeros(cloud_ext.shape, np.int32), c1)
    dom = dom.add_component("rayleigh", np.full(nz, 2e-3),
                            np.ones(nz), np.zeros(nz, np.int32), ray_tab)
    mesh = _mesh(4)
    assert shardable(dom, mesh)

    src = PhotonSource.directional(0.6, 30.0)
    mus, phis = [1.0, -0.5], [0.0, 0.0]
    n = 1 << 15
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(13),
                        intensity_mus=mus, intensity_phis=phis)
    n_total = int(raw.n_photons)
    assert int(raw.n_bad) < 0.001 * n_total + 2
    fup_s = float(raw.flux_up.sum()) / n_total
    fabs_s = float(raw.flux_absorbed.sum()) / n_total
    I_sh = (np.asarray(raw.intensity).reshape(nx * ny, 2).sum(axis=0)
            / n_total)
    byc = np.asarray(raw.intensity_by_component).reshape(nx * ny, 2, 3)
    # Black surface: slot 0 empty; both scatterer slots populated; the
    # split sums back to the total.
    assert byc[:, :, 0].sum() == 0.0
    assert byc[:, 0, 1].sum() > 0.0 and byc[:, 0, 2].sum() > 0.0
    np.testing.assert_allclose(byc.sum(axis=-1).sum(axis=0) / n_total, I_sh,
                               rtol=1e-5)

    ref = Integrator.create(
        dom, intensity_mus=mus, intensity_phis=phis,
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                use_fastpath=False))
    stats = run_batches(ref, src, n // 8, 8, seed=17)
    fup_r = float(np.asarray(stats.mean.flux_up).mean())
    sigma = np.sqrt(max(fup_r * (1 - fup_r), 0.02) * (1.0 / n + 1.0 / n_total))
    assert fup_s == pytest.approx(fup_r, abs=4 * sigma)
    assert fabs_s == pytest.approx(
        float(np.asarray(stats.mean.flux_absorbed).mean()), abs=4 * sigma)
    I_ref = np.asarray(stats.mean.intensity).mean(axis=(0, 1))
    se_ref = np.asarray(stats.stderr.intensity).mean(axis=(0, 1))
    byc_ref = np.asarray(stats.mean.intensity_by_component).mean(axis=(0, 1))
    for d in range(2):
        assert abs(I_sh[d] - I_ref[d]) < 5 * np.hypot(se_ref[d], se_ref[d]), (
            d, I_sh[d], I_ref[d], se_ref[d])
    # Per-component agreement (domain means, looser: fewer samples/slot).
    byc_sh = byc.sum(axis=0) / n_total
    np.testing.assert_allclose(byc_sh[:, 1:], byc_ref[:, 1:],
                               rtol=0.25, atol=2e-4)
