"""Pallas backend: eligibility gating everywhere; physics only on real TPU."""

import jax
import numpy as np
import pytest

from i3rc_tpu import Integrator, IntegratorConfig, PhotonSource
from i3rc_tpu.integrators.pallas_backend import try_pallas_batch_fn
from i3rc_tpu.models import make_step_cloud

ON_TPU = jax.devices()[0].platform == "tpu"


def test_eligibility_gating():
    dom = make_step_cloud(0.99)
    src = PhotonSource.directional(0.5, 0.0)
    integ = Integrator.create(
        dom, config=IntegratorConfig(use_ray_tracing=False, majorant_block_size=16))
    # Ray tracing -> not eligible
    integ_rt = Integrator.create(dom, config=IntegratorConfig(use_ray_tracing=True))
    assert try_pallas_batch_fn(integ_rt, src, 4096, n_lanes=2048, n_grid=2) is None
    # Intensity -> not eligible
    integ_int = Integrator.create(
        dom, config=IntegratorConfig(use_ray_tracing=False),
        intensity_mus=[0.5], intensity_phis=[0.0])
    assert try_pallas_batch_fn(integ_int, src, 4096, n_lanes=2048, n_grid=2) is None
    # Internal source -> not eligible
    src_int = PhotonSource.internal_flux(0.5, 0.5, 0.5, True)
    assert try_pallas_batch_fn(integ, src_int, 4096, n_lanes=2048, n_grid=2) is None
    # Indivisible photon count -> not eligible
    assert try_pallas_batch_fn(integ, src, 4097, n_lanes=2048, n_grid=2) is None
    # The benchmark configuration IS eligible (construction only off-TPU)
    assert try_pallas_batch_fn(integ, src, 4096, n_lanes=2048, n_grid=2) is not None


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel requires a real TPU")
def test_pallas_matches_xla_kernel():
    dom = make_step_cloud(0.99)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, majorant_block_size=16,
                           max_events=300)
    integ = Integrator.create(dom, config=cfg, surface_albedo=0.2)
    n = 1 << 16
    fn = try_pallas_batch_fn(integ, src, n, n_lanes=2048, n_grid=4)
    r_pal = fn(jax.random.PRNGKey(0))
    r_xla = integ.compute(jax.random.PRNGKey(1), src, n)
    sigma = 3.5 * 0.5 / np.sqrt(n)
    for field in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        a = float(getattr(r_pal, field))
        b = float(getattr(r_xla, field))
        assert abs(a - b) < sigma + 2e-3, (field, a, b)
