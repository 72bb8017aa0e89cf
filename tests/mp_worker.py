"""Worker process for the multi-process jax.distributed test.

Each process owns 2 virtual CPU devices; the global mesh spans
n_processes x 2 devices.  Mirrors one MPI rank of the reference driver
(multipleProcesses_mpi.f95:26-55): initialize, run local batches, allreduce
moments, every process reports what it sees (the reference reduces to rank 0
only because rank 0 writes the output; psum is an allreduce so the
MasterProc convention is an I/O choice, not a data dependence).

Usage: python mp_worker.py <coordinator> <n_processes> <process_id> <outdir>
"""

import json
import sys


def main(coordinator: str, n_processes: int, process_id: int, outdir: str):
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_processes,
                               process_id=process_id)

    import numpy as np

    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.parallel.mesh import default_mesh, run_batches

    from __graft_entry__ import _step_cloud_integrator

    assert len(jax.devices()) == 2 * n_processes, (
        f"global device count {len(jax.devices())} != {2 * n_processes}")
    mesh = default_mesh()  # global: every device on every process

    integ = _step_cloud_integrator(
        n_col=8, n_lay=8,
        config=IntegratorConfig(use_ray_tracing=False, max_events=200))
    stats = run_batches(integ, PhotonSource.directional(0.5, 0.0),
                        n_photons_per_batch=512, n_batches=8, seed=11,
                        mesh=mesh)

    out = {
        "process_id": process_id,
        "n_global_devices": len(jax.devices()),
        "is_master": jax.process_index() == 0,
        "mean_flux_up": np.asarray(stats.mean.flux_up, np.float64).tolist(),
        "stderr_flux_up": np.asarray(stats.stderr.flux_up, np.float64).tolist(),
        "mean_flux_down": float(np.asarray(stats.mean.flux_down).mean()),
    }
    # MasterProc convention: only process 0 writes the "official" result
    # file; every process writes its own view for the cross-check.
    with open(f"{outdir}/view_{process_id}.json", "w") as f:
        json.dump(out, f)
    if jax.process_index() == 0:
        with open(f"{outdir}/result.json", "w") as f:
            json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
