"""Batch-level data parallelism over a TPU mesh.

The reference's entire distributed backend is one 133-line MPI module:
static batch partitioning across ranks, independent RNG streams per batch,
and a single MPI_REDUCE(SUM) of the moment accumulators at the end
(Code/multipleProcesses_mpi.f95; Example-Drivers/monteCarloDriver.f95:264-348).

TPU-native mapping (SURVEY.md section 5):
  * ranks            -> devices of a 1-D jax.sharding.Mesh (axis "batch")
  * batchesPerProcessor loop -> lax.scan over each device's batch ids inside
                        shard_map (compiled once, runs b/d times)
  * (iseed, batch) MT19937 seeding -> fold_in(PRNGKey(seed), global_batch_id),
    so results are bitwise identical for any device count (strictly stronger
    than the reference, which only guarantees statistical independence)
  * sumAcrossProcesses -> jax.lax.psum over the mesh axis (an allreduce; the
    reference reduces to rank 0 only because only rank 0 writes output)
  * MasterProc I/O   -> process_index() == 0 on multi-host deployments

Like the reference (monteCarloDriver.f95:268-271), the number of batches is
rounded up to divide evenly among devices.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from i3rc_tpu.core.rng import batch_key


def default_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'batch'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("batch",))


def initialize_multihost(**kwargs) -> Mesh:
    """Multi-host setup: the initializeProcesses analog for TPU pods.

    Calls jax.distributed.initialize (coordinator/process ids from the
    standard env vars or kwargs) and returns the global batch mesh spanning
    every chip in the slice.  Output should be written by
    jax.process_index() == 0 — the MasterProc convention
    (multipleProcesses_mpi.f95:26-39; monteCarloDriver.f95:382).
    """
    import jax.distributed

    jax.distributed.initialize(**kwargs)
    return default_mesh()


@dataclass(frozen=True)
class BatchStats:
    """Mean and standard error over independent batches, per output field.

    The (value, stderr) pairing is the reference's statistical contract:
    mean = sum(x)/n, stderr = sqrt((sum(x^2)/n - mean^2)/(n-1))
    (monteCarloDriver.f95:358-378).
    """

    mean: object    # pytree matching Results
    stderr: object
    n_batches: int

    def scaled(self, solar_flux: float) -> "BatchStats":
        """Scale by the incident solar flux (monteCarloDriver.f95:358-377)."""
        scale = lambda a: a * solar_flux
        return BatchStats(jax.tree.map(scale, self.mean),
                          jax.tree.map(scale, self.stderr), self.n_batches)


def run_batches(integrator, source, n_photons_per_batch: int, n_batches: int,
                seed: int = 10, mesh: Mesh | None = None, derive=None,
                n_lanes: int | None = None, optics_override=None,
                batch_offset: int = 0, rng_impl: str | None = None,
                chunk_batches: int | None = None, derive_token=None,
                _return_sums: bool = False) -> BatchStats:
    """Run independent photon batches across the mesh and reduce moments.

    Results are independent of the device count: batch b always uses the
    stream fold_in(PRNGKey(seed), b) regardless of which device runs it.

    ``derive``, if given, maps a per-batch Results to an extra pytree whose
    moments are accumulated alongside (e.g. domain means, whose standard
    error across batches is not derivable from per-pixel moments — the
    reference accumulates them separately, monteCarloDriver.f95:300-305).
    The returned stats trees are then dicts {"results":..., "derived":...}.
    Callers that build ``derive`` as a per-call closure should pass a stable
    hashable ``derive_token`` identifying it, so the compiled executable is
    reused across calls (the fallback key is id(derive), which never repeats
    for closures and would grow the cache one executable per call).

    ``chunk_batches`` bounds how many batches each DEVICE runs per XLA
    dispatch: moments are summed across dispatches on the host (identical
    floating-point result to one fused scan).  Long single dispatches are
    fragile on remote-attached accelerators, so drivers chunk by default.
    """
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    if not _return_sums:
        n_batches = max(int(n_batches), 2)
    per_dev = -(-int(n_batches) // n_dev)  # round up to divide evenly (:268-271)
    n_batches = per_dev * n_dev
    if chunk_batches and per_dev > chunk_batches:
        s1 = s2 = None
        done = 0
        while done < n_batches:
            take = min(int(chunk_batches) * n_dev, n_batches - done)
            c1, c2, _ = run_batches(
                integrator, source, n_photons_per_batch, take, seed=seed,
                mesh=mesh, derive=derive, n_lanes=n_lanes,
                optics_override=optics_override,
                batch_offset=batch_offset + done, rng_impl=rng_impl,
                derive_token=derive_token, _return_sums=True)
            s1 = c1 if s1 is None else jax.tree.map(lambda a, b: a + b, s1, c1)
            s2 = c2 if s2 is None else jax.tree.map(lambda a, b: a + b, s2, c2)
            done += take
        if _return_sums:
            return s1, s2, n_batches
        return stats_from_sums(s1, s2, n_batches)

    compiled = integrator.batch_fn(source, n_photons_per_batch, n_lanes=n_lanes)

    def make_batch_fn(override):
        def raw_fn(k):
            # optics_override rides through the same executable (spectral
            # loop): same shapes, different values, no retrace.
            return compiled(k) if override is None else compiled(k, override)
        if derive is None:
            return raw_fn

        def derived_fn(k):
            res = raw_fn(k)
            return {"results": res, "derived": derive(res)}
        return derived_fn

    # rng_impl="rbg" swaps the wide per-event draws to the TPU hardware
    # RngBitGenerator (see core/rng.batch_key); default stays threefry.
    base_key = (jax.random.PRNGKey(seed) if rng_impl is None
                else jax.random.key(seed, impl=rng_impl))
    template = jax.eval_shape(make_batch_fn(optics_override), base_key)
    shapes = [l.shape for l in jax.tree.leaves(template)]
    treedef = jax.tree.structure(template)

    # The compiled scan wrapper is cached on the integrator: the base key,
    # batch ids, and the optics override are ARGUMENTS, so reseeds, chunked
    # dispatches (batch_offset), and the spectral k-loop all reuse one
    # executable instead of recompiling per call.
    cache = integrator.__dict__.setdefault("_run_batches_cache", {})
    ov_key = (None if optics_override is None else
              tuple((l.shape, str(l.dtype))
                    for l in jax.tree.leaves(optics_override)))
    mesh_key = (mesh.axis_names, tuple(d.id for d in mesh.devices.ravel()))
    if derive is None:
        d_key = None
    elif derive_token is not None:
        d_key = ("token", derive_token)
    else:
        d_key = ("id", id(derive))
    cache_key = (source, int(n_photons_per_batch), n_lanes, int(n_batches),
                 mesh_key, d_key, rng_impl, ov_key)
    if cache_key not in cache:
        def worker(ids, key_arg, override):
            # ids: (per_dev,) this device's global batch indices
            batch_fn = make_batch_fn(override)

            def body(carry, b):
                res = batch_fn(jax.random.fold_in(key_arg, b))
                leaves = jax.tree.leaves(res)
                s1 = [c + l.astype(jnp.float32) for c, l in zip(carry[0], leaves)]
                s2 = [c + jnp.square(l.astype(jnp.float32))
                      for c, l in zip(carry[1], leaves)]
                return (s1, s2), None

            zeros = [jnp.zeros(s, jnp.float32) for s in shapes]
            (s1, s2), _ = jax.lax.scan(body, (zeros, [z.copy() for z in zeros]),
                                       ids)
            # sumAcrossProcesses analog — allreduce over the mesh axis.
            s1 = [jax.lax.psum(a, "batch") for a in s1]
            s2 = [jax.lax.psum(a, "batch") for a in s2]
            return s1, s2

        # check_vma=False: the kernel's while_loop carries mix batch-varying
        # photon state with replicated constants (initial z / status), which
        # the varying-manual-axes checker rejects even though the program is
        # correct.
        shard = jax.shard_map(worker, mesh=mesh,
                              in_specs=(P("batch"), P(), P()), out_specs=P(),
                              check_vma=False)
        cache[cache_key] = jax.jit(shard)

    ids = batch_offset + jnp.arange(n_batches, dtype=jnp.int32)
    s1, s2 = cache[cache_key](ids, base_key, optics_override)
    if _return_sums:
        return (jax.tree.unflatten(treedef, s1), jax.tree.unflatten(treedef, s2),
                n_batches)
    return stats_from_sums(jax.tree.unflatten(treedef, s1),
                           jax.tree.unflatten(treedef, s2), n_batches)


def stats_from_sums(sum1, sum2, n_batches: int) -> BatchStats:
    """Mean + stderr from accumulated first/second moments (:358-378)."""
    mean = jax.tree.map(lambda a: a / n_batches, sum1)
    stderr = jax.tree.map(
        lambda a, b: jnp.sqrt(jnp.maximum(b / n_batches - jnp.square(a / n_batches),
                                          0.0) / (n_batches - 1)),
        sum1, sum2)
    return BatchStats(mean=mean, stderr=stderr, n_batches=n_batches)
