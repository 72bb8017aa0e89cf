"""Glue between the Integrator and the Pallas fused flux kernel.

``try_pallas_batch_fn`` returns a compiled (key) -> Results callable when the
configuration fits the kernel's scope (flux outputs, max-XS/Woodcock,
regular grids, scalar Lambertian albedo, procedural top illumination),
else None — callers fall back to the XLA wavefront kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.integrators.results import normalize_tallies
from i3rc_tpu.integrators.wavefront import RawTallies
from i3rc_tpu.ops.pallas_transport import PallasPlan, make_flux_kernel

_SUPPORTED_SOURCES = ("directional", "random_azimuth", "flux_weighted")


def _pad_rows(a: np.ndarray, multiple: int = 128) -> np.ndarray:
    r = a.shape[0]
    pad = (-r) % multiple
    if pad:
        a = np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


def try_pallas_batch_fn(integrator, source, n_photons: int,
                        n_lanes: int = 8192, n_grid: int | None = None,
                        interpret: bool = False):
    """Compiled pallas batch function, or None if out of scope."""
    cfg = integrator.config
    geom = integrator.geometry
    flat = integrator._flat
    if (cfg.use_ray_tracing or integrator.intensity is not None
            or integrator.surface.uses_brdf
            or source.kind not in _SUPPORTED_SOURCES
            or not (geom.xy_regular and geom.z_regular)):
        return None
    n_grid = n_grid or max(1, min(32, n_photons // n_lanes))
    if n_photons % n_grid:
        return None
    n_cells_real = geom.n_x * geom.n_y * geom.n_z
    if n_cells_real > 8192:
        return None  # VMEM-resident domain only

    # Padded device tables
    n_comp = integrator.optics.n_components
    cell_matrix = _pad_rows(np.asarray(integrator.optics.cell_matrix))
    n_cells = cell_matrix.shape[0]
    cubic = _pad_rows(np.asarray(integrator.tables.inverse_cubic))

    if integrator.coarse_geometry is not None:
        cg = integrator.coarse_geometry
        maj = _pad_rows(np.asarray(integrator.optics.block_majorant)[:, None])
        n_blocks_coarse = maj.shape[0]
        cbx = geom.n_x // cg.n_x
        cby = geom.n_y // cg.n_y
        cbz = geom.n_z // cg.n_z
    else:
        maj = np.zeros((128, 1), np.float32)
        maj[0, 0] = float(integrator.optics.max_extinction)
        n_blocks_coarse = 0
        cbx = cby = cbz = 1

    plan = PallasPlan(
        n_x=geom.n_x, n_y=geom.n_y, n_z=geom.n_z, n_comp=n_comp,
        n_cells=n_cells, n_blocks_coarse=n_blocks_coarse,
        n_segments=integrator.tables.n_segments,
        max_entries=integrator.tables.max_entries,
        x0=geom.x0, y0=geom.y0, z0=geom.z0,
        x_max=geom.x_max, y_max=geom.y_max, z_max=geom.z_max,
        dx=geom.dx, dy=geom.dy, dz=geom.dz,
        cbx=cbx, cby=cby, cbz=cbz,
        source_kind=source.kind,
        solar_mu=float(source.solar_mu),
        solar_phi=float(np.deg2rad(source.solar_azimuth)),
        albedo=float(integrator.surface.albedo),
        use_rr=cfg.use_russian_roulette,
        rr_w=float(cfg.russian_roulette_w),
        lanes=n_lanes, n_grid=n_grid, budget=n_photons // n_grid,
        max_iters=cfg.max_events * (n_photons // n_grid // n_lanes + 2),
        max_inner=4 * ((geom.n_x // cbx) + (geom.n_y // cby) + (geom.n_z // cbz))
        if n_blocks_coarse else 8,
    )
    kernel = make_flux_kernel(plan, interpret=interpret)
    cell_dev = jnp.asarray(cell_matrix)
    maj_dev = jnp.asarray(maj, dtype=jnp.float32)
    cubic_dev = jnp.asarray(cubic)
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z

    @jax.jit
    def run(key):
        seed = jax.random.key_data(key).astype(jnp.int32)[..., -1:].reshape(1)
        cells, counters = kernel(seed, cell_dev, maj_dev, cubic_dev)
        cells = cells[: n_cells_real].reshape(n_x * n_y, n_z, 4)
        raw = RawTallies(
            flux_up=jnp.sum(cells[:, :, 0], axis=1),
            flux_down=jnp.sum(cells[:, :, 1], axis=1),
            flux_absorbed=jnp.sum(cells[:, :, 2], axis=1),
            volume_absorption=cells[:, :, 3].reshape(n_x * n_y * n_z),
            intensity=jnp.zeros(0, jnp.float32),
            intensity_by_component=jnp.zeros(0, jnp.float32),
            intensity_excess=jnp.zeros(0, jnp.float32),
            n_photons=jnp.int32(n_photons),
            n_bad=counters[0, 1].astype(jnp.int32),
            n_iterations=counters[0, 3].astype(jnp.int32),
            n_lane_events=counters[0, 2])
        return normalize_tallies(raw, n_x, n_y, n_z, 0, n_comp,
                                 integrator._col_weights, integrator._dz)

    return run
