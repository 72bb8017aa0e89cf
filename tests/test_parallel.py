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


def test_two_process_distributed(tmp_path):
    """Real multi-process distribution: 2 jax.distributed CPU processes x 2
    devices each, cross-process psum, MasterProc-only official output.

    The reference analog is an MPI job over multipleProcesses_mpi.f95:26-55;
    here each subprocess is a host in the jax.distributed sense, and the
    moment reduction crosses the process boundary.
    """
    import json
    import os
    import socket
    import subprocess
    import sys as _sys

    # Pick a free coordinator port.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}

    procs = [subprocess.Popen(
        [_sys.executable, worker, coordinator, "2", str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    views = []
    for pid in range(2):
        with open(tmp_path / f"view_{pid}.json") as f:
            views.append(json.load(f))
    # psum is an allreduce: both processes hold the full reduced moments.
    np.testing.assert_array_equal(views[0]["mean_flux_up"],
                                  views[1]["mean_flux_up"])
    assert views[0]["is_master"] and not views[1]["is_master"]
    assert views[0]["n_global_devices"] == 4
    # Only the master wrote the official result (monteCarloDriver.f95:382).
    assert (tmp_path / "result.json").exists()

    # Same batches in-process on the 8-device test mesh: the counter-based
    # RNG makes results layout-independent (stronger than the reference's
    # per-rank MT19937 streams, which only promise independence).
    from i3rc_tpu.integrators.config import IntegratorConfig
    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys
    if sys_path_root not in sys.path:
        sys.path.insert(0, sys_path_root)
    from __graft_entry__ import _step_cloud_integrator

    integ = _step_cloud_integrator(
        n_col=8, n_lay=8,
        config=IntegratorConfig(use_ray_tracing=False, max_events=200))
    local = run_batches(integ, PhotonSource.directional(0.5, 0.0),
                        n_photons_per_batch=512, n_batches=8, seed=11)
    np.testing.assert_allclose(np.asarray(local.mean.flux_up, np.float64),
                               np.asarray(views[0]["mean_flux_up"]),
                               rtol=1e-6)
