"""Vectorized voxel traversal (Amanatides-Woo DDA) over a photon wavefront.

Re-designs accumulateExtinctionAlongPath (Integrators/
monteCarloRadiativeTransfer.f95:1654-1807) for SIMD execution: every photon
lane advances one cell crossing per inner iteration inside a single
``lax.while_loop``; lanes that have finished (reached the target optical
depth, left the domain, or errored) are masked out until all lanes complete.

Key departures from the Fortran (documented per SURVEY.md section 7):

  * Cell indices are authoritative (int32); positions are set exactly onto
    cell edges at crossings, which removes most of the reference's
    ``spacing()`` epsilon nudges.  The near-corner guard (:1744-1769) is kept
    as a relative-epsilon test.
  * Periodic wrap in x/y is exact: index modulo plus edge re-assignment,
    instead of the reference's +-2*spacing offsets (:1774-1788).
  * A non-positive step still flags the lane as bad (the reference's
    extAccumulated = -2 path, :1711-1714), as does exceeding the crossing
    budget (grazing trajectories) — both are surfaced in the n_bad counter.

Status codes double as the transport event classification.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Lane status after a trace.
TRACING = 0   # still going (internal only)
SCATTER = 1   # reached the target optical depth inside the domain
EXIT_TOP = 2  # left through the top boundary
EXIT_BOT = 3  # left through the bottom boundary
BAD = 4       # geometry error or crossing budget exceeded

_EPS = jnp.float32(1.1920929e-7)  # 2**-23: float32 ulp scale for spacing() analogs
_HUGE = jnp.float32(3.0e38)


@dataclass(frozen=True)
class GridGeometry:
    """Static per-domain geometry baked into the trace kernels.

    Edge arrays live on device; scalar bounds are Python floats (compiled as
    constants — an Integrator owns one domain, so this never retraces).
    """

    x_edges: jax.Array  # (nx+1,) float32
    y_edges: jax.Array
    z_edges: jax.Array
    n_x: int
    n_y: int
    n_z: int
    x0: float
    y0: float
    z0: float
    x_max: float
    y_max: float
    z_max: float
    dx: float  # first-cell widths; exact for regular grids
    dy: float
    dz: float
    xy_regular: bool
    z_regular: bool

    @staticmethod
    def from_edges(x_edges, y_edges, z_edges, xy_regular, z_regular) -> "GridGeometry":
        import numpy as np

        xe = np.asarray(x_edges, dtype=np.float32)
        ye = np.asarray(y_edges, dtype=np.float32)
        ze = np.asarray(z_edges, dtype=np.float32)
        return GridGeometry(
            x_edges=jnp.asarray(xe), y_edges=jnp.asarray(ye), z_edges=jnp.asarray(ze),
            n_x=xe.size - 1, n_y=ye.size - 1, n_z=ze.size - 1,
            x0=float(xe[0]), y0=float(ye[0]), z0=float(ze[0]),
            x_max=float(xe[-1]), y_max=float(ye[-1]), z_max=float(ze[-1]),
            dx=float(xe[1] - xe[0]), dy=float(ye[1] - ye[0]), dz=float(ze[1] - ze[0]),
            xy_regular=bool(xy_regular), z_regular=bool(z_regular),
        )

    # --- position -> cell index -------------------------------------------
    def locate_x(self, x):
        """Cell index for x positions (findXYIndicies analog, :1353-1374)."""
        if self.xy_regular:
            i = jnp.floor((x - self.x0) / self.dx).astype(jnp.int32)
        else:
            i = jnp.searchsorted(self.x_edges, x, side="right").astype(jnp.int32) - 1
        return jnp.clip(i, 0, self.n_x - 1)

    def locate_y(self, y):
        if self.xy_regular:
            i = jnp.floor((y - self.y0) / self.dy).astype(jnp.int32)
        else:
            i = jnp.searchsorted(self.y_edges, y, side="right").astype(jnp.int32) - 1
        return jnp.clip(i, 0, self.n_y - 1)

    def locate_z(self, z):
        if self.z_regular:
            i = jnp.floor((z - self.z0) / self.dz).astype(jnp.int32)
        else:
            i = jnp.searchsorted(self.z_edges, z, side="right").astype(jnp.int32) - 1
        return jnp.clip(i, 0, self.n_z - 1)

    def wrap_x(self, x):
        """Periodic wrap into [x0, x_max) (makePeriodic analog, :2063-2082)."""
        w = self.x_max - self.x0
        out = self.x0 + jnp.mod(x - self.x0, w)
        return jnp.where(out >= self.x_max, self.x0, out)

    def wrap_y(self, y):
        w = self.y_max - self.y0
        out = self.y0 + jnp.mod(y - self.y0, w)
        return jnp.where(out >= self.y_max, self.y0, out)


def _spacing(x):
    return _EPS * jnp.maximum(jnp.abs(x), jnp.float32(1e-20))


def make_crossing_stepper(geom: GridGeometry, total_ext_flat: jax.Array,
                          ux, uy, uz, cell_matrix: jax.Array | None = None):
    """One-cell-crossing step function over per-lane DDA state.

    The directions are fixed for the stepper's lifetime — trace_extinction
    builds one per trace, and the persistent shadow-ray wavefront
    (wavefront.py queued radiance) reuses one stepper across transport
    events, advancing rays a bounded number of crossings per event instead
    of running each trace to completion inline.

    Returns step(state, tau_target, active) -> state with
    state = (x, y, z, ix, iy, iz, tau, status); lanes whose status is not
    TRACING (or not active) pass through unchanged.
    """
    n_y, n_z = geom.n_y, geom.n_z

    side_x = (ux >= 0).astype(jnp.int32)   # sideIncrement (:1683)
    side_y = (uy >= 0).astype(jnp.int32)
    side_z = (uz >= 0).astype(jnp.int32)
    inc_x = 2 * side_x - 1                 # cellIncrement (:1685)
    inc_y = 2 * side_y - 1
    inc_z = 2 * side_z - 1

    inv_ux = jnp.where(jnp.abs(ux) >= 2e-30, 1.0 / ux, _HUGE)
    inv_uy = jnp.where(jnp.abs(uy) >= 2e-30, 1.0 / uy, _HUGE)
    inv_uz = jnp.where(jnp.abs(uz) >= 2e-30, 1.0 / uz, _HUGE)

    def step(state, tau_target, active):
        x, y, z, ix, iy, iz, tau, status = state
        tracing = active & (status == TRACING)

        # Next-face coordinates: arithmetic for regular grids (consistent
        # with locate_*'s floor division and gather-free), edge-array gather
        # only for irregular spacing.
        if geom.xy_regular:
            ex = geom.x0 + (ix + side_x).astype(jnp.float32) * geom.dx
            ey = geom.y0 + (iy + side_y).astype(jnp.float32) * geom.dy
        else:
            ex = geom.x_edges[jnp.clip(ix + side_x, 0, geom.n_x)]
            ey = geom.y_edges[jnp.clip(iy + side_y, 0, geom.n_y)]
        if geom.z_regular:
            ez = geom.z0 + (iz + side_z).astype(jnp.float32) * geom.dz
        else:
            ez = geom.z_edges[jnp.clip(iz + side_z, 0, geom.n_z)]
        # Distance to next face per axis; huge where the ray is parallel.
        sx = jnp.where(jnp.abs(ux) >= 2e-30, (ex - x) * inv_ux, _HUGE)
        sy = jnp.where(jnp.abs(uy) >= 2e-30, (ey - y) * inv_uy, _HUGE)
        sz = jnp.where(jnp.abs(uz) >= 2e-30, (ez - z) * inv_uz, _HUGE)
        step = jnp.minimum(jnp.minimum(sx, sy), sz)

        bad = tracing & (step <= 0.0)  # :1711-1714

        flat = jnp.clip((ix * n_y + iy) * n_z + iz, 0, total_ext_flat.shape[0] - 1)
        if cell_matrix is not None:
            # Fused one-hot matmul read: serialized gathers cost ~8 ns/lane
            # on TPU (see ops/gather.py); the extinction column rides the MXU.
            # read_rows factorizes the one-hot above 128 rows — this runs once
            # per grid crossing, so the narrow split matters here most of all.
            from i3rc_tpu.ops.gather import read_rows

            cell_ext = read_rows(cell_matrix[:, :1], flat)[:, 0]
        else:
            cell_ext = total_ext_flat[flat]

        # Would this crossing overshoot the target optical depth?
        overshoot = tracing & ~bad & (tau + step * cell_ext > tau_target)
        partial = jnp.where(cell_ext > 0.0, (tau_target - tau) / jnp.maximum(cell_ext, 1e-30), 0.0)

        full = tracing & ~bad & ~overshoot

        # --- overshoot lanes: partial step, stop inside the cell (:1721-1731)
        x = jnp.where(overshoot, x + partial * ux, x)
        y = jnp.where(overshoot, y + partial * uy, y)
        z = jnp.where(overshoot, z + partial * uz, z)
        tau = jnp.where(overshoot, tau_target, tau)
        status = jnp.where(overshoot, SCATTER, status)

        # --- full crossings: advance to the closest face (:1744-1769)
        # An axis crosses if it attains the min step, or lands within
        # float32 spacing of its face (the reference's rounding guard).
        new_x = x + step * ux
        new_y = y + step * uy
        new_z = z + step * uz
        cross_x = full & ((sx <= step) | (jnp.abs(ex - new_x) <= 2.0 * _spacing(new_x)))
        cross_y = full & ((sy <= step) | (jnp.abs(ey - new_y) <= 2.0 * _spacing(new_y)))
        cross_z = full & ((sz <= step) | (jnp.abs(ez - new_z) <= 2.0 * _spacing(new_z)))

        x = jnp.where(cross_x, ex, jnp.where(full, new_x, x))
        y = jnp.where(cross_y, ey, jnp.where(full, new_y, y))
        z = jnp.where(cross_z, ez, jnp.where(full, new_z, z))
        ix = jnp.where(cross_x, ix + inc_x, ix)
        iy = jnp.where(cross_y, iy + inc_y, iy)
        iz = jnp.where(cross_z, iz + inc_z, iz)
        tau = jnp.where(full, tau + step * cell_ext, tau)

        # --- periodic x/y (:1774-1788): exact edge reassignment
        wrap_lo_x = full & (ix < 0)
        wrap_hi_x = full & (ix >= geom.n_x)
        ix = jnp.where(wrap_lo_x, geom.n_x - 1, jnp.where(wrap_hi_x, 0, ix))
        x = jnp.where(wrap_lo_x, geom.x_max, jnp.where(wrap_hi_x, geom.x0, x))
        wrap_lo_y = full & (iy < 0)
        wrap_hi_y = full & (iy >= geom.n_y)
        iy = jnp.where(wrap_lo_y, geom.n_y - 1, jnp.where(wrap_hi_y, 0, iy))
        y = jnp.where(wrap_lo_y, geom.y_max, jnp.where(wrap_hi_y, geom.y0, y))

        # --- vertical exits (:1793-1804)
        out_top = full & (iz >= geom.n_z)
        out_bot = full & (iz < 0)
        status = jnp.where(out_top, EXIT_TOP, jnp.where(out_bot, EXIT_BOT, status))
        z = jnp.where(out_top, geom.z_max, jnp.where(out_bot, geom.z0, z))
        iz = jnp.clip(iz, 0, geom.n_z - 1)

        status = jnp.where(bad, BAD, status)
        return x, y, z, ix, iy, iz, tau, status

    return step


def trace_extinction(geom: GridGeometry, total_ext_flat: jax.Array,
                     x, y, z, ix, iy, iz, ux, uy, uz,
                     tau_target, active, max_crossings: int,
                     cell_matrix: jax.Array | None = None):
    """Trace lanes until tau_target extinction is accumulated or they exit.

    All arguments are per-lane arrays except geom/total_ext_flat/max_crossings.
    ``total_ext_flat`` is total extinction raveled C-order over (nx, ny, nz).
    Returns (x, y, z, ix, iy, iz, tau_accumulated, status); lanes with
    ``active`` False pass through unchanged with status BAD ignored by caller.

    Mirrors accumulateExtinctionAlongPath semantics: stops exactly at
    tau_target inside a cell (status SCATTER), or at the top/bottom boundary
    (status EXIT_*), with periodic x/y.
    """
    step = make_crossing_stepper(geom, total_ext_flat, ux, uy, uz,
                                 cell_matrix=cell_matrix)

    def body(carry):
        state, it = carry
        return step(state, tau_target, active), it + 1

    def cond(carry):
        state, it = carry
        status = state[7]
        return jnp.any(active & (status == TRACING)) & (it < max_crossings)

    status0 = jnp.where(active, TRACING, BAD)
    tau0 = jnp.zeros_like(x)
    state = (x, y, z, ix, iy, iz, tau0, status0)
    (state, _) = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    x, y, z, ix, iy, iz, tau, status = state
    # Lanes that exhausted the crossing budget are bad (grazing trajectories).
    status = jnp.where(active & (status == TRACING), BAD, status)
    return x, y, z, ix, iy, iz, tau, status
