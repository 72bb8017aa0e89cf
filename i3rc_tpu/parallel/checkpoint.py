"""Batch-level checkpoint / resume for long Monte Carlo runs.

The reference has no run-level checkpointing (its RNG save/restore is
unexported dead code with bugs, RandomNumbersForMC.f95:301-346), but its
batch structure is the natural recovery unit: batches are independent and
reseedable by (iseed, batch) (monteCarloDriver.f95:277; SURVEY.md section 5).
With counter-based streams this framework gets exact resume: batch b always
produces the same results, so persisting the accumulated first/second
moments plus the number of completed batches is a complete checkpoint.

``run_batches_resumable`` runs batches in chunks, persisting the moment
accumulators (npz) after each chunk and picking up from the file on restart.
A fingerprint of (seed, photons/batch, grid shape) guards against resuming
into a different run.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from i3rc_tpu.parallel.mesh import default_mesh, run_batches, stats_from_sums


def _fingerprint(integrator, source, n_photons_per_batch, seed):
    return np.array([seed, n_photons_per_batch,
                     integrator.geometry.n_x, integrator.geometry.n_y,
                     integrator.geometry.n_z,
                     hash(source) % (1 << 31)], dtype=np.int64)


def save_checkpoint(path, sum1, sum2, batches_done, fingerprint):
    leaves1, treedef = jax.tree.flatten(sum1)
    leaves2 = jax.tree.leaves(sum2)
    payload = {f"s1_{i}": np.asarray(l) for i, l in enumerate(leaves1)}
    payload.update({f"s2_{i}": np.asarray(l) for i, l in enumerate(leaves2)})
    payload["batches_done"] = np.int64(batches_done)
    payload["fingerprint"] = fingerprint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path, template_sum1, fingerprint):
    """Returns (sum1, sum2, batches_done) or None if absent/mismatched."""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        if not np.array_equal(data["fingerprint"], fingerprint):
            return None
        leaves1, treedef = jax.tree.flatten(template_sum1)
        s1 = [data[f"s1_{i}"] for i in range(len(leaves1))]
        s2 = [data[f"s2_{i}"] for i in range(len(leaves1))]
        return (jax.tree.unflatten(treedef, s1), jax.tree.unflatten(treedef, s2),
                int(data["batches_done"]))


def run_batches_resumable(integrator, source, n_photons_per_batch: int,
                          n_batches: int, seed: int = 10, mesh=None,
                          derive=None, checkpoint_path: str = "",
                          chunk_batches: int = 0, **kwargs):
    """run_batches with periodic moment checkpoints and exact resume."""
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    chunk = max(int(chunk_batches) or n_dev, n_dev)
    chunk = -(-chunk // n_dev) * n_dev
    n_batches = max(int(n_batches), 2)
    n_batches = -(-n_batches // n_dev) * n_dev

    fp = _fingerprint(integrator, source, n_photons_per_batch, seed)
    sum1 = sum2 = None
    done = 0
    if checkpoint_path:
        # Tree template (shapes only) for loading, without running anything.
        raw_fn = integrator.batch_fn(source, n_photons_per_batch,
                                     n_lanes=kwargs.get("n_lanes"))

        def one(k):
            res = raw_fn(k)
            return {"results": res, "derived": derive(res)} if derive else res

        shapes = jax.eval_shape(one, jax.random.PRNGKey(0))
        template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
        state = load_checkpoint(checkpoint_path, template, fp)
        if state is not None:
            sum1, sum2, done = state

    while done < n_batches:
        todo = min(chunk, n_batches - done)
        c1, c2, _ = run_batches(integrator, source, n_photons_per_batch, todo,
                                seed=seed, mesh=mesh, derive=derive,
                                batch_offset=done, _return_sums=True, **kwargs)
        if sum1 is None:
            sum1, sum2 = c1, c2
        else:
            sum1 = jax.tree.map(lambda a, b: a + b, sum1, c1)
            sum2 = jax.tree.map(lambda a, b: a + b, sum2, c2)
        done += todo
        if checkpoint_path:
            save_checkpoint(checkpoint_path, sum1, sum2, done, fp)

    return stats_from_sums(sum1, sum2, done)
