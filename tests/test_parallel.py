"""Mesh batch-parallelism tests on the 8-device virtual CPU mesh.

The reference's equivalence guarantee is the no-MPI stub module with an
identical interface (Code/multipleProcesses_nompi.f95); ours is stronger:
device-count-invariant results, tested 1 device vs 8.
"""

import jax
import numpy as np
import pytest

from i3rc_tpu import Domain, Integrator, PhaseFunction, PhotonSource
from i3rc_tpu.core.phase_functions import PhaseFunctionTable, henyey_greenstein_coefficients
from i3rc_tpu.parallel.mesh import BatchStats, default_mesh, run_batches


@pytest.fixture(scope="module")
def slab_integrator():
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))
    table = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250.0, 3))
    ext = np.full((1, 1, 2), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), table)
    return Integrator.create(dom, surface_albedo=0.1)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_run_batches_stats(slab_integrator):
    src = PhotonSource.directional(0.5, 0.0)
    stats = run_batches(slab_integrator, src, 5_000, 8, seed=10)
    assert stats.n_batches == 8
    fup = float(stats.mean.flux_up.mean())
    err = float(stats.stderr.flux_up.mean())
    assert 0.0 < fup < 1.0
    assert 0.0 < err < 0.1
    # Energy closure in the mean: top exit + atmospheric absorption + the
    # (1 - albedo) fraction absorbed at each surface hit.
    total = float(stats.mean.flux_up.mean() + 0.9 * stats.mean.flux_down.mean()
                  + stats.mean.flux_absorbed.mean())
    assert abs(total - 1.0) < 5e-3


def test_device_count_invariance(slab_integrator):
    """Same seed -> same batch streams -> identical results on 1 vs 8 devices."""
    src = PhotonSource.directional(0.5, 0.0)
    mesh1 = default_mesh(np.array(jax.devices()[:1]))
    mesh8 = default_mesh()
    s1 = run_batches(slab_integrator, src, 2_000, 8, seed=3, mesh=mesh1)
    s8 = run_batches(slab_integrator, src, 2_000, 8, seed=3, mesh=mesh8)
    np.testing.assert_allclose(np.asarray(s1.mean.flux_up),
                               np.asarray(s8.mean.flux_up), rtol=1e-6)
    # stderr suffers E[x^2]-mean^2 cancellation, which amplifies float32
    # reduction-order differences between the two meshes.
    np.testing.assert_allclose(np.asarray(s1.stderr.flux_down),
                               np.asarray(s8.stderr.flux_down), rtol=2e-2)


def test_rbg_rng_impl(slab_integrator):
    """Hardware-RNG key impl flows through the kernel; same physics."""
    src = PhotonSource.directional(0.5, 0.0)
    ref = run_batches(slab_integrator, src, 20_000, 8, seed=5)
    rbg = run_batches(slab_integrator, src, 20_000, 8, seed=5, rng_impl="rbg")
    fup_ref = float(ref.mean.flux_up.mean())
    fup_rbg = float(rbg.mean.flux_up.mean())
    sigma = float(ref.stderr.flux_up.mean()) + float(rbg.stderr.flux_up.mean())
    assert abs(fup_ref - fup_rbg) < 3 * sigma
    total = float(rbg.mean.flux_up.mean() + 0.9 * rbg.mean.flux_down.mean()
                  + rbg.mean.flux_absorbed.mean())
    assert abs(total - 1.0) < 5e-3


def test_solar_flux_scaling(slab_integrator):
    src = PhotonSource.directional(0.5, 0.0)
    stats = run_batches(slab_integrator, src, 2_000, 4, seed=1)
    scaled = stats.scaled(2.0)
    np.testing.assert_allclose(np.asarray(scaled.mean.flux_up),
                               2.0 * np.asarray(stats.mean.flux_up))
