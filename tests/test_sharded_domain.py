"""Sharded-domain tracing prototype: decomposition, migration, agreement.

Beyond-reference capability (SURVEY.md section 5 stretch): the domain is
decomposed in x across mesh devices instead of replicated; photons migrate
between shards through ppermute.  Validated on the virtual CPU mesh against
the single-device column fastpath on the same scene.
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


def test_sharded_matches_single_device():
    """4-way x-decomposition reproduces the replicated-domain fastpath.

    CI budget: 2^14 photons (sigma ~ 0.006; the bugs this guards — silent
    immigrant loss, slab-boundary leaks — showed up as 0.1-0.4 absolute
    errors).  At 2^18 photons the prototype measured Fup = 0.51485 vs the
    single-device 0.5149 (recorded in BENCH_CASES.md)."""
    dom = make_landsat_cloud(1.0)
    n = 1 << 14
    src = PhotonSource.directional(0.5, 0.0)
    mesh = _mesh(4)
    raw = trace_sharded(dom, src, n, mesh, n_lanes_per_shard=1 << 12,
                        max_events=500, seed_key=jax.random.PRNGKey(2))
    n_total = int(raw.n_photons)
    fup_sharded = float(raw.flux_up.sum()) / n_total
    # Every photon accounted for: exits + overflow-bad == launched.
    assert (float(raw.flux_up.sum() + raw.flux_down.sum()) + int(raw.n_bad)
            == pytest.approx(n_total, abs=0.5))
    # Migration-overflow losses must be a negligible fraction.
    assert int(raw.n_bad) < 0.001 * n_total + 2

    ref = Integrator.create(
        dom, config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                     compute_volume_absorption=False))
    res = ref.batch_fn(src, n)(jax.random.PRNGKey(7))
    fup_ref = float(res.mean_flux_up)
    sigma = np.sqrt(fup_ref * (1 - fup_ref) * (1.0 / n + 1.0 / n_total))
    assert fup_sharded == pytest.approx(fup_ref, abs=4 * sigma)


def test_sharded_memory_is_decomposed():
    """Each shard holds 1/n_dev of the column optics — the point of the
    feature.  (The public entry shards the (n_dev, cols/n_dev, 3) table
    over the mesh axis; verify the per-device buffer shape.)"""
    from i3rc_tpu.core.optics import flatten_optics
    from i3rc_tpu.integrators.fastpath import column_structure

    dom = make_landsat_cloud(1.0)
    flat = flatten_optics(dom)
    cols = column_structure(flat.total_ext, np.asarray(dom.z_edges))
    n_dev = 4
    per_shard = cols.reshape(n_dev, -1, 3)
    assert per_shard.shape[1] == cols.shape[0] // n_dev
