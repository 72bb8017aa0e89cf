"""The photon-transport kernel: a photon-parallel wavefront in pure XLA.

This is the TPU re-design of computeRT (Integrators/
monteCarloRadiativeTransfer.f95:400-707).  The reference traces one photon at
a time through a nested photonLoop/scatteringLoop; here a wide
structure-of-arrays batch of photons advances together, one transport event
per iteration of a masked ``lax.while_loop``:

  sample free path -> move (voxel DDA or maximum cross-section jump) ->
  classify (exit top / exit bottom / collision) -> tally -> surface
  reflection or scattering (component pick, absorption, local-estimate
  radiance, Russian roulette, inverse-CDF angle, direction rotation)

Dead lanes are masked through; the loop ends when every lane is dead or the
event budget is reached (survivors count as bad, the reference's nBad
diagnostic :451,488).

Random numbers are counter-based: each event step folds the batch key and
draws whole (lanes,) vectors, so the stream depends only on (seed, batch,
event) — never on sharding (SURVEY.md section 5).

Algorithmic deltas vs the Fortran, all physics-preserving (SURVEY.md sec. 7):
  * Azimuth rotation uses the direct spherical rotation formula with
    phi = 2 pi u instead of NEXT_DIRECT's rejection loop (:2086-2113) —
    mathematically the same distribution, branch-free.
  * Directions are renormalized after each rotation (float32 drift guard).
  * In max cross-section mode the collision cell is recomputed from the
    post-jump position; the reference reuses indices from the previous event
    (:586-588 reads totalExt at stale xIndex/yIndex/zIndex — a defect for
    heterogeneous domains).
  * The inverse-CDF lookup interpolates on the grid the table was built on
    (i/(n-1)); the reference mixes 1/n and 1/(n-1) spacings (:1405-1413).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.core.rng import TINY, exponential_deviate
from i3rc_tpu.ops.dda import BAD, EXIT_BOT, EXIT_TOP, SCATTER, GridGeometry, trace_extinction
from i3rc_tpu.ops.tally import tally_add

_MIN_MU = jnp.float32(1e-6)  # surface-reflection vertical floor (:542-549)
PI = np.pi


@dataclass(frozen=True)
class DeviceOptics:
    """Flattened optics on device; all C-order raveled for 1-D gathers."""

    total_ext: jax.Array      # (nx*ny*nz,)
    cumulative_ext: jax.Array  # (nx*ny*nz*ncomp,)
    ssa: jax.Array            # (nx*ny*nz*ncomp,)
    phase_index: jax.Array    # (nx*ny*nz*ncomp,) int32
    n_components: int
    max_extinction: float


@dataclass(frozen=True)
class DeviceTables:
    inverse: jax.Array        # (ncomp*max_entries*n_inv,) angles
    n_inverse_steps: int
    forward: jax.Array | None        # (ncomp*max_entries*n_fwd,) values (maybe hybrid)
    forward_orig: jax.Array | None   # original forward values (for low orders)
    n_forward_steps: int
    max_entries: int


@dataclass(frozen=True)
class SurfaceSpec:
    """Either a scalar Lambertian albedo or a gridded BRDF."""

    albedo: float = 0.0
    brdf_fn: object = None            # traceable (params, mu_i, mu_o, phi_i, phi_o)
    params: jax.Array | None = None   # (nxs*nys, n_params)
    x_edges: jax.Array | None = None
    y_edges: jax.Array | None = None
    n_xs: int = 1
    n_ys: int = 1

    @property
    def uses_brdf(self) -> bool:
        return self.brdf_fn is not None


@dataclass(frozen=True)
class IntensitySpec:
    directions: jax.Array      # (3, D) unit vectors
    abs_mu: jax.Array          # (D,)
    exit_status: jax.Array     # (D,) int32: EXIT_TOP for up-going, EXIT_BOT for down
    n_directions: int


@dataclass(frozen=True)
class RawTallies:
    """Un-normalized accumulators (sum of photon weights)."""

    flux_up: jax.Array          # (nx*ny,)
    flux_down: jax.Array
    flux_absorbed: jax.Array
    volume_absorption: jax.Array  # (nx*ny*nz,)
    intensity: jax.Array          # (nx*ny*D,) or (0,)
    intensity_by_component: jax.Array  # (nx*ny*D*(ncomp+1),) or (0,)
    intensity_excess: jax.Array        # (D*(ncomp+1),) or (0,)
    n_photons: jax.Array          # scalar i32
    n_bad: jax.Array              # scalar i32


jax.tree_util.register_dataclass(
    RawTallies,
    data_fields=["flux_up", "flux_down", "flux_absorbed", "volume_absorption",
                 "intensity", "intensity_by_component", "intensity_excess",
                 "n_photons", "n_bad"],
    meta_fields=[])


def make_direction_cosines(mu, phi):
    """(sin t cos p, sin t sin p, mu) — makeDirectionCosines (:2041-2059)."""
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    return sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), mu


def rotate_direction(ux, uy, uz, cos_scat, u_azimuth):
    """New direction after scattering by cos_scat with uniform azimuth.

    Physics-equivalent replacement for NEXT_DIRECT (:2086-2113): the Marchuk
    rejection sampler draws a uniform azimuth; here chi = 2 pi u feeds the
    standard rotation, branch-free, then renormalizes (float32 drift).
    """
    chi = 2.0 * PI * u_azimuth
    cos_chi = jnp.cos(chi)
    sin_chi = jnp.sin(chi)
    sin_scat = jnp.sqrt(jnp.maximum(1.0 - cos_scat * cos_scat, 0.0))
    denom2 = jnp.maximum(1.0 - uz * uz, 0.0)
    denom = jnp.sqrt(denom2)
    near_pole = denom < 1e-6
    inv_denom = jnp.where(near_pole, 0.0, 1.0 / jnp.maximum(denom, 1e-12))
    nx = sin_scat * (ux * uz * cos_chi - uy * sin_chi) * inv_denom + ux * cos_scat
    ny = sin_scat * (uy * uz * cos_chi + ux * sin_chi) * inv_denom + uy * cos_scat
    nz = -sin_scat * cos_chi * denom + uz * cos_scat
    # Vertical incidence limit: rotate about z directly.
    pol_x = sin_scat * cos_chi
    pol_y = jnp.sign(uz) * sin_scat * sin_chi
    pol_z = jnp.sign(uz) * cos_scat
    nx = jnp.where(near_pole, pol_x, nx)
    ny = jnp.where(near_pole, pol_y, ny)
    nz = jnp.where(near_pole, pol_z, nz)
    norm = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    return nx * norm, ny * norm, nz * norm


def _gather_component_arrays(optics: DeviceOptics, flat_cell):
    """Per-lane (L, ncomp) cumulative extinction from flat cell indices."""
    base = flat_cell * optics.n_components
    offs = jnp.arange(optics.n_components, dtype=jnp.int32)
    return optics.cumulative_ext[base[:, None] + offs[None, :]]


def _table_lookup(flat_table, row_base, position, n_steps):
    """Linear interpolation into rows of a flattened (rows, n_steps) table.

    position is in [0, 1]; grid points sit at i / (n_steps - 1).
    """
    pos = jnp.clip(position, 0.0, 1.0) * (n_steps - 1)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n_steps - 2)
    frac = pos - i0.astype(pos.dtype)
    a0 = flat_table[row_base + i0]
    a1 = flat_table[row_base + i0 + 1]
    return (1.0 - frac) * a0 + frac * a1


def make_batch_tracer(geom: GridGeometry, optics: DeviceOptics, tables: DeviceTables,
                      surface: SurfaceSpec, intensity: IntensitySpec | None,
                      config, n_photons: int):
    """Build the jittable single-batch transport function.

    Returns trace(key, batch: PhotonBatch) -> RawTallies.  Geometry, optics
    and configuration are closed over (one specialization per Integrator).
    """
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    n_cols = n_x * n_y
    n_comp = optics.n_components
    compute_intensity = intensity is not None
    n_dirs = intensity.n_directions if compute_intensity else 0
    max_crossings = config.max_crossings or 8 * (n_x + n_y + n_z)
    max_int_crossings = config.max_intensity_crossings or 8 * (n_x + n_y + n_z)
    use_rt = config.use_ray_tracing
    inv_max_ext = 1.0 / max(optics.max_extinction, 1e-30)
    comp_offsets = jnp.arange(n_comp, dtype=jnp.int32)

    def surface_reflectance(x, y, mu_in, mu_out, phi_in, phi_out):
        """computeSurfaceReflectance analog (surfaceProperties.f95:121-148)."""
        if not surface.uses_brdf:
            return jnp.full_like(x, surface.albedo)
        xp = surface.x_edges[0] + jnp.mod(x - surface.x_edges[0],
                                          surface.x_edges[-1] - surface.x_edges[0])
        yp = surface.y_edges[0] + jnp.mod(y - surface.y_edges[0],
                                          surface.y_edges[-1] - surface.y_edges[0])
        ixs = jnp.clip(jnp.searchsorted(surface.x_edges, xp, side="right") - 1, 0,
                       surface.n_xs - 1).astype(jnp.int32)
        iys = jnp.clip(jnp.searchsorted(surface.y_edges, yp, side="right") - 1, 0,
                       surface.n_ys - 1).astype(jnp.int32)
        params = surface.params[ixs * surface.n_ys + iys]
        return surface.brdf_fn(params, mu_in, mu_out, phi_in, phi_out)

    def intensity_contribution(key, mask, is_surface, x, y, z, ix, iy, iz,
                               ux, uy, uz, weight, comp, order, tallies):
        """Local estimation toward each detector direction.

        Mirrors computeIntensityContribution (:1419-1611): per direction,
        phase value at the photon->detector angle from the tabulated forward
        matrices (hybrid or original by scattering order), times the
        transmission to the boundary — full trace or the Iwabuchi (2006)
        Russian-roulette variants; optional clipping with excess bookkeeping.
        Tally lands at the column where the directional trace leaves the
        domain (xIndexF/yIndexF in the reference).
        """
        L = x.shape[0]
        D = n_dirs
        dirs = intensity.directions  # (3, D)
        # Scattering angle photon -> detector: acos of the projection (:1487-1489).
        proj = jnp.clip(ux[:, None] * dirs[0][None, :] + uy[:, None] * dirs[1][None, :]
                        + uz[:, None] * dirs[2][None, :], -1.0, 1.0)
        ang = jnp.arccos(proj)  # (L, D)

        # Phase value: rows selected by (component, phase index) (:1495-1508).
        flat_cell = (ix * n_y + iy) * n_z + iz
        pf_idx = optics.phase_index[flat_cell * n_comp + comp]
        row = (comp * tables.max_entries + pf_idx) * tables.n_forward_steps
        pos = ang / PI
        pf_val = _table_lookup(tables.forward, row[:, None], pos, tables.n_forward_steps)
        if config.use_hybrid_phase_funs and config.num_orders_orig_phase_fun > 0:
            pf_orig = _table_lookup(tables.forward_orig, row[:, None], pos,
                                    tables.n_forward_steps)
            pf_val = jnp.where((order <= config.num_orders_orig_phase_fun)[:, None],
                               pf_orig, pf_val)
        # Normalized: P/(4 pi |mu_d|); surface reflection contributes 1/pi
        # (:1473-1480, :1509).
        norm_pf = pf_val / (4.0 * PI * intensity.abs_mu[None, :])
        norm_pf = jnp.where(is_surface[:, None], 1.0 / PI, norm_pf)

        # Directional transmission traces: (L, D) pseudo-lanes flattened.
        def tile_l(a):
            return jnp.broadcast_to(a[:, None], (L, D)).reshape(L * D)

        def tile_d(a):
            return jnp.broadcast_to(a[None, :], (L, D)).reshape(L * D)

        mask_ld = tile_l(mask)
        if config.use_russian_roulette_for_intensity:
            u_free, u_accept = (jax.random.uniform(k, (L, D), dtype=jnp.float32)
                                for k in jax.random.split(key, 2))
            tau_free = exponential_deviate(u_free)
            small = PI * norm_pf <= config.zeta_min
            tau_max = -jnp.log(config.zeta_min
                               / jnp.maximum(PI * norm_pf, TINY))
            target = jnp.where(small, tau_free, tau_max + tau_free).reshape(L * D)
        else:
            target = jnp.full((L * D,), 3.0e38, dtype=jnp.float32)

        (fx, fy, fz, fix, fiy, fiz, tau, status) = trace_extinction(
            geom, optics.total_ext,
            tile_l(x), tile_l(y), tile_l(z),
            tile_l(ix), tile_l(iy), tile_l(iz),
            tile_d(dirs[0]), tile_d(dirs[1]), tile_d(dirs[2]),
            target, mask_ld, max_int_crossings)
        del fx, fy, fz, fiz
        escaped = (status == tile_d(intensity.exit_status)).reshape(L, D)
        tau = tau.reshape(L, D)

        if config.use_russian_roulette_for_intensity:
            # Iwabuchi Eq 13 (small contributions) and Eq 14 (roulette on
            # large optical depths), fused into one trace (:1536-1596).
            contrib_small = jnp.where(
                escaped & (u_accept <= PI * norm_pf / config.zeta_min),
                weight[:, None] * config.zeta_min / PI, 0.0)
            contrib_large = jnp.where(
                escaped & (tau <= tau_max),
                weight[:, None] * norm_pf * jnp.exp(-tau),
                jnp.where(escaped, weight[:, None] * config.zeta_min / PI, 0.0))
            contrib = jnp.where(small, contrib_small, contrib_large)
        else:
            # Full transmission exp(-tau) to the boundary (:1512-1535).
            contrib = jnp.where(escaped, weight[:, None] * norm_pf * jnp.exp(-tau), 0.0)
        contrib = jnp.where(mask[:, None], contrib, 0.0)

        comp_slot = jnp.where(is_surface, 0, comp + 1)  # component 0 = surface
        if config.limit_intensity_contributions:
            over = contrib - config.max_intensity_contribution
            excess_add = jnp.maximum(over, 0.0)
            contrib = jnp.minimum(contrib, config.max_intensity_contribution)
            ex_idx = (tile_d(jnp.arange(D, dtype=jnp.int32)) * (n_comp + 1)
                      + tile_l(comp_slot))
            tallies["intensity_excess"] = tally_add(
                tallies["intensity_excess"], ex_idx, excess_add.reshape(L * D))

        col_f = (fix * n_y + fiy)  # exit column, (L*D,)
        d_idx = tile_d(jnp.arange(D, dtype=jnp.int32))
        int_idx = col_f * D + d_idx
        tallies["intensity"] = tally_add(tallies["intensity"], int_idx,
                                         contrib.reshape(L * D))
        byc_idx = int_idx * (n_comp + 1) + tile_l(comp_slot)
        tallies["intensity_by_component"] = tally_add(
            tallies["intensity_by_component"], byc_idx, contrib.reshape(L * D))
        return tallies

    def event_step(key, k, state):
        (alive, x, y, z, ux, uy, uz, w, ix, iy, iz, order, tallies) = state
        ek = jax.random.fold_in(key, k)
        ks = jax.random.split(ek, 8)
        L = x.shape[0]
        u = [jax.random.uniform(kk, (L,), dtype=jnp.float32) for kk in ks[:7]]
        (u_tau, u_srf_mu, u_srf_phi, u_comp, u_rr, u_scat, u_chi) = u
        k_int = ks[7]

        tau = exponential_deviate(u_tau)

        if use_rt:
            # Ray tracing: travel until tau extinction accumulates (:481-487).
            (rx, ry, rz, rix, riy, riz, _tau_acc, status) = trace_extinction(
                geom, optics.total_ext, x, y, z, ix, iy, iz, ux, uy, uz,
                tau, alive, max_crossings)
            exit_top = alive & (status == EXIT_TOP)
            exit_bot = alive & (status == EXIT_BOT)
            collide = alive & (status == SCATTER)
            physical = collide  # every ray-traced collision is physical
            bad = alive & (status == BAD)
        else:
            # Maximum cross-section jump (:492-497).
            s = tau * inv_max_ext
            px = x + ux * s
            py = y + uy * s
            pz = z + uz * s
            exit_top = alive & (pz >= geom.z_max)
            exit_bot = alive & ~exit_top & (pz <= geom.z0)
            collide = alive & ~exit_top & ~exit_bot
            # Trace back to the boundary plane for the tally column (:504-527).
            bt_top = jnp.abs((pz - geom.z_max) / jnp.where(jnp.abs(uz) > 1e-30, uz, 1.0))
            bt_bot = jnp.abs((pz - geom.z0) / jnp.where(jnp.abs(uz) > 1e-30, uz, 1.0))
            bt = jnp.where(exit_top, bt_top, bt_bot)
            rx = jnp.where(exit_top | exit_bot,
                           geom.wrap_x(px - ux * bt), geom.wrap_x(px))
            ry = jnp.where(exit_top | exit_bot,
                           geom.wrap_y(py - uy * bt), geom.wrap_y(py))
            rz = jnp.where(exit_top, geom.z_max, jnp.where(exit_bot, geom.z0, pz))
            rix = geom.locate_x(rx)
            riy = geom.locate_y(ry)
            riz = geom.locate_z(rz)
            # Physical vs mathematical collision (:586-588) — cell re-located
            # at the new position (the reference reuses stale indices here).
            flat_c = (rix * n_y + riy) * n_z + riz
            cell_ext = optics.total_ext[flat_c]
            physical = collide & (u_comp < cell_ext * inv_max_ext)
            # u_comp is reused below only on physical lanes with a fresh draw:
            bad = jnp.zeros_like(alive) & alive

        col = rix * n_y + riy

        # --- boundary tallies (:499-531) -----------------------------------
        tallies["flux_up"] = tally_add(tallies["flux_up"], col, w, exit_top)
        tallies["flux_down"] = tally_add(tallies["flux_down"], col, w, exit_bot)

        # --- surface reflection (:515-580) ----------------------------------
        new_mu_s = jnp.maximum(jnp.sqrt(u_srf_mu), _MIN_MU)  # mu = sqrt(u) (:547)
        new_phi_s = 2.0 * PI * u_srf_phi
        phi_in = jnp.arctan2(uy, ux)
        refl = surface_reflectance(rx, ry, uz, new_mu_s, phi_in, new_phi_s)
        w_srf = w * refl
        surf_alive = exit_bot & (w_srf > TINY)
        sux, suy, suz = make_direction_cosines(new_mu_s, new_phi_s)

        # --- physical collision (:590-688) -----------------------------------
        flat_cell = (rix * n_y + riy) * n_z + riz
        base = flat_cell * n_comp
        cum = optics.cumulative_ext[base[:, None] + comp_offsets[None, :]]
        u_pick = jax.random.uniform(jax.random.fold_in(ek, 101), (L,), dtype=jnp.float32) \
            if not use_rt else u_comp
        comp = jnp.sum((u_pick[:, None] >= cum).astype(jnp.int32), axis=1)
        comp = jnp.clip(comp, 0, n_comp - 1)
        ssa_v = optics.ssa[base + comp]
        absorbed = w * (1.0 - ssa_v)
        tallies["flux_absorbed"] = tally_add(tallies["flux_absorbed"], col,
                                             absorbed, physical)
        tallies["volume_absorption"] = tally_add(tallies["volume_absorption"],
                                                 flat_cell, absorbed, physical)
        w_sc = w * ssa_v
        order_next = order + (physical | exit_bot).astype(jnp.int32)

        # --- local-estimate radiance (:565-580 surface, :652-668 collision) --
        if compute_intensity:
            any_event = physical | surf_alive
            w_event = jnp.where(exit_bot, w_srf, w_sc)
            tallies = intensity_contribution(
                k_int, any_event, exit_bot, rx, ry, rz, rix, riy, riz,
                ux, uy, uz, w_event, comp, order_next, tallies)

        # --- Russian roulette (:673-679) --------------------------------------
        if config.use_russian_roulette:
            rr_w = config.russian_roulette_w
            do_rr = physical & (w_sc < rr_w / 2.0)
            killed = do_rr & (u_rr >= w_sc / rr_w)
            w_sc = jnp.where(do_rr, jnp.where(killed, 0.0, rr_w), w_sc)
        scat_alive = physical & (w_sc > TINY)

        # --- scattering angle + rotation (:682-688) ----------------------------
        pf_idx = optics.phase_index[base + comp]
        row = (comp * tables.max_entries + pf_idx) * tables.n_inverse_steps
        theta = _table_lookup(tables.inverse, row, u_scat, tables.n_inverse_steps)
        nux, nuy, nuz = rotate_direction(ux, uy, uz, jnp.cos(theta), u_chi)

        # --- commit per-lane updates -------------------------------------------
        math_move = collide & ~physical if not use_rt else jnp.zeros_like(alive)
        moved = scat_alive | surf_alive | math_move
        x = jnp.where(moved, rx, x)
        y = jnp.where(moved, ry, y)
        z = jnp.where(surf_alive, geom.z0, jnp.where(moved, rz, z))
        ix = jnp.where(moved, rix, ix)
        iy = jnp.where(moved, riy, iy)
        iz = jnp.where(surf_alive, 0, jnp.where(moved, riz, iz))
        ux = jnp.where(scat_alive, nux, jnp.where(surf_alive, sux, ux))
        uy = jnp.where(scat_alive, nuy, jnp.where(surf_alive, suy, uy))
        uz = jnp.where(scat_alive, nuz, jnp.where(surf_alive, suz, uz))
        w = jnp.where(physical, w_sc, jnp.where(exit_bot, w_srf, w))
        order = order_next
        alive = scat_alive | surf_alive | math_move
        tallies["n_bad"] = tallies["n_bad"] + jnp.sum(bad).astype(jnp.int32)
        return (alive, x, y, z, ux, uy, uz, w, ix, iy, iz, order, tallies)

    def trace(key, batch):
        L = n_photons
        # Scale normalized entry positions to the domain (:464-466).
        x = geom.x0 + batch.x * (geom.x_max - geom.x0)
        y = geom.y0 + batch.y * (geom.y_max - geom.y0)
        z = geom.z0 + batch.z * (geom.z_max - geom.z0)
        ux, uy, uz = make_direction_cosines(batch.mu, batch.phi)
        ix = geom.locate_x(x)
        iy = geom.locate_y(y)
        iz = geom.locate_z(z)
        w = jnp.ones(L, dtype=jnp.float32)
        order = jnp.zeros(L, dtype=jnp.int32)
        alive = jnp.ones(L, dtype=bool)
        tallies = {
            "flux_up": jnp.zeros(n_cols, jnp.float32),
            "flux_down": jnp.zeros(n_cols, jnp.float32),
            "flux_absorbed": jnp.zeros(n_cols, jnp.float32),
            "volume_absorption": jnp.zeros(n_cols * n_z, jnp.float32),
            "intensity": jnp.zeros(n_cols * n_dirs if compute_intensity else 0,
                                   jnp.float32),
            "intensity_by_component": jnp.zeros(
                n_cols * n_dirs * (n_comp + 1) if compute_intensity else 0, jnp.float32),
            "intensity_excess": jnp.zeros(
                n_dirs * (n_comp + 1) if compute_intensity else 0, jnp.float32),
            "n_bad": jnp.zeros((), jnp.int32),
        }

        def cond(carry):
            k, state = carry
            return jnp.any(state[0]) & (k < config.max_events)

        def body(carry):
            k, state = carry
            return k + 1, event_step(key, k, state)

        state = (alive, x, y, z, ux, uy, uz, w, ix, iy, iz, order, tallies)
        k_final, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        del k_final
        alive = state[0]
        tallies = state[12]
        # Lanes alive at the event budget vanish with their weight: count bad.
        n_bad = tallies["n_bad"] + jnp.sum(alive).astype(jnp.int32)
        return RawTallies(
            flux_up=tallies["flux_up"], flux_down=tallies["flux_down"],
            flux_absorbed=tallies["flux_absorbed"],
            volume_absorption=tallies["volume_absorption"],
            intensity=tallies["intensity"],
            intensity_by_component=tallies["intensity_by_component"],
            intensity_excess=tallies["intensity_excess"],
            n_photons=jnp.int32(L), n_bad=n_bad)

    return trace
