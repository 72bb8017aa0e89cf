"""Pallas TPU kernel: the fused flux transport event loop.

The XLA wavefront kernel (integrators/wavefront.py) spends ~0.33 ms per
event iteration at 2^17 lanes across ~6 separately-launched fusion groups.
This kernel runs the ENTIRE photon batch inside one pallas_call: per grid
block, a wavefront of lanes lives in VMEM as (R, 128) tiles and advances
through the full event loop — refill, Woodcock/global-majorant free path,
boundary tallies, Lambertian surface reflection, component pick, absorption,
Russian roulette, cubic inverse-CDF scattering, rotation — with the domain
tables VMEM-resident and the per-event one-hot reads/tallies as in-register
MXU matmuls.  No HBM round trips between events, no XLA fusion boundaries.

Scope (the benchmark path; everything else uses the XLA kernel):
  * flux outputs (volume absorption included), no local-estimate radiance
  * maximum cross-section / super-voxel Woodcock transport (no ray tracing)
  * regular grids, top-illumination procedural sources (directional /
    random-azimuth / flux-weighted), scalar Lambertian albedo
  * any number of components / phase-function entries

RNG: the TPU hardware PRNG (pltpu.prng_seed / prng_random_bits), seeded per
(batch key, grid block).  Streams differ from the XLA kernel's threefry —
agreement with it is statistical, like every other cross-check here.

Mosaic constraints honored throughout: every per-lane value is 2-D
((R, 128) or (B, k)); no 1-D bitcasts/iotas; no scatter/dynamic_slice
(one-hots + static slices + concatenation instead); no uint32->f32 casts.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = 1.1754944e-38
PI = float(np.pi)


def _uniform(r):
    """U[0,1) float32 (R, 128) tile from the hardware PRNG (24-bit mantissa)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((r, 128)), jnp.uint32)
    mant = pltpu.bitcast(bits >> 8, jnp.int32)  # < 2^24, same bits as int32
    return mant.astype(jnp.float32) * jnp.float32(2.0 ** -24)


_HI = jax.lax.Precision.HIGHEST  # Mosaic's default dot rounds inputs to bf16


def _exclusive_cumsum(flags, r):
    """Exclusive cumsum of a 0/1 (R, 128) tile, via triangular matmuls."""
    k = 128
    x2 = flags.astype(jnp.float32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    lt_incl = (row_i <= col_i).astype(jnp.float32)
    within = jnp.dot(x2, lt_incl, preferred_element_type=jnp.float32,
                     precision=_HI)
    row_tot = within[:, k - 1:k]                      # (r, 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    lt_excl = (ri < ci).astype(jnp.float32)
    offs = jnp.dot(lt_excl.T, row_tot, preferred_element_type=jnp.float32,
                   precision=_HI)
    return (within + offs - x2).astype(jnp.int32)


def _read_cells(table, flat_idx, m):
    """One-hot gather of rows flat_idx (R,128) from table (C, m) in VMEM.

    Batched 3-D form (Mosaic rejects cross-lane reshapes): the lane-aligned
    lo one-hot (R,128,128) contracts against each 128-row table slab on the
    MXU; the hi digit selects the slab.  Exact: one nonzero per reduction,
    full-precision dots.  Returns m tiles of shape (R, 128).
    """
    r = flat_idx.shape[0]
    c = table.shape[0]
    n_hi = c // 128
    hi = flat_idx // 128
    lo = flat_idx - hi * 128
    j3 = jax.lax.broadcasted_iota(jnp.int32, (r, 128, 128), 2)
    oh = (lo[:, :, None] == j3).astype(jnp.float32)   # (R, 128, 128)
    # One dot against all slabs side by side keeps VMEM temporaries small.
    t_all = jnp.concatenate([table[h * 128:(h + 1) * 128, :]
                             for h in range(n_hi)], axis=1)  # (128, n_hi*m)
    mm = jax.lax.dot_general(oh, t_all, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_HI)            # (R, 128, n_hi*m)
    acc = [jnp.zeros((r, 128), jnp.float32) for _ in range(m)]
    for h in range(n_hi):
        sel = (hi == h).astype(jnp.float32)
        for j in range(m):
            acc[j] = acc[j] + sel * mm[:, :, h * m + j]
    return acc


def _tally_cells_ref(tally_ref, flat_idx, value_tiles):
    """tally_ref (C, m) += values at flat_idx (R,128) — in-place on the VMEM
    output ref (keeping the accumulator in the while carry explodes register
    pressure: (1024, 4) is ~130 vregs)."""
    r = flat_idx.shape[0]
    c, m = tally_ref.shape
    n_hi = c // 128
    hi = flat_idx // 128
    lo = flat_idx - hi * 128
    j3 = jax.lax.broadcasted_iota(jnp.int32, (r, 128, 128), 2)
    oh = (lo[:, :, None] == j3).astype(jnp.float32)   # (R, 128, 128lo)
    # Fold the hi-digit selection into the value columns, then one dot.
    valh = jnp.concatenate(
        [(v * (hi == h).astype(jnp.float32))[:, :, None]
         for h in range(n_hi) for v in value_tiles], axis=2)  # (R,128,n_hi*m)
    # t3[r, lo, h*m+j] = sum_lane oh[r, lane, lo] * valh[r, lane, h*m+j]
    t3 = jax.lax.dot_general(oh, valh, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32,
                             precision=_HI)            # (R, 128lo, n_hi*m)
    tsum = jnp.sum(t3, axis=0)                         # (128, n_hi*m)
    for h in range(n_hi):
        tally_ref[h * 128:(h + 1) * 128, :] += tsum[:, h * m:(h + 1) * m]


@dataclass(frozen=True)
class PallasPlan:
    """Static configuration baked into one kernel compilation."""

    n_x: int
    n_y: int
    n_z: int
    n_comp: int
    n_cells: int          # padded to a multiple of 128
    n_blocks_coarse: int  # coarse majorant cells padded to 128 (0 = global)
    n_segments: int
    max_entries: int
    x0: float
    y0: float
    z0: float
    x_max: float
    y_max: float
    z_max: float
    dx: float
    dy: float
    dz: float
    cbx: int              # coarse block sizes in cells
    cby: int
    cbz: int
    source_kind: str
    solar_mu: float
    solar_phi: float
    albedo: float
    use_rr: bool
    rr_w: float
    lanes: int            # per grid block (multiple of 128)
    n_grid: int
    budget: int           # photons per grid block
    max_iters: int
    max_inner: int        # woodcock block-crossing bound per event


def make_flux_kernel(plan: PallasPlan, interpret: bool = False):
    """Build the pallas_call wrapper: (seed32, cell_matrix, majorant, cubic)
    -> (cells_tally (n_cells, 4), counters (1, 128))."""
    B = plan.lanes
    R = B // 128
    n_comp = plan.n_comp
    m_cols = 1 + 3 * n_comp
    inv_dx = 1.0 / plan.dx
    inv_dy = 1.0 / plan.dy
    inv_dz = 1.0 / plan.dz
    width_x = plan.x_max - plan.x0
    width_y = plan.y_max - plan.y0
    use_woodcock = plan.n_blocks_coarse > 0
    ncx = plan.n_x // plan.cbx if use_woodcock else 1
    ncy = plan.n_y // plan.cby if use_woodcock else 1
    ncz = plan.n_z // plan.cbz if use_woodcock else 1
    cdx = plan.dx * plan.cbx if use_woodcock else width_x
    cdy = plan.dy * plan.cby if use_woodcock else width_y
    cdz = plan.dz * plan.cbz if use_woodcock else (plan.z_max - plan.z0)
    nudge = 1e-4 * min(cdx, cdy, cdz)

    def kernel(seed_ref, cell_ref, maj_ref, cubic_ref, tally_ref, count_ref):
        block = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], block)

        @pl.when(block == 0)
        def _():
            tally_ref[:] = jnp.zeros_like(tally_ref)
            count_ref[:] = jnp.zeros_like(count_ref)

        cell_tab = cell_ref[:]
        cubic_tab = cubic_ref[:]
        maj_tab = maj_ref[:]

        def sample_photons():
            x = plan.x0 + _uniform(R) * width_x
            y = plan.y0 + _uniform(R) * width_y
            z = jnp.full((R, 128), plan.z_max - 1e-6 * (plan.z_max - plan.z0),
                         jnp.float32)
            if plan.source_kind == "directional":
                mu = jnp.full((R, 128), -abs(plan.solar_mu), jnp.float32)
                phi = jnp.full((R, 128), plan.solar_phi, jnp.float32)
            elif plan.source_kind == "random_azimuth":
                mu = jnp.full((R, 128), -abs(plan.solar_mu), jnp.float32)
                phi = 2.0 * PI * _uniform(R)
            else:  # flux_weighted
                mu = -jnp.sqrt(jnp.maximum(_uniform(R), TINY))
                phi = 2.0 * PI * _uniform(R)
            st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
            return x, y, z, st * jnp.cos(phi), st * jnp.sin(phi), mu

        def wrap_x(v):
            out = plan.x0 + jnp.mod(v - plan.x0, width_x)
            return jnp.where(out >= plan.x_max, plan.x0, out)

        def wrap_y(v):
            out = plan.y0 + jnp.mod(v - plan.y0, width_y)
            return jnp.where(out >= plan.y_max, plan.y0, out)

        x, y, z, ux, uy, uz = sample_photons()
        w = jnp.ones((R, 128), jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        lane_ids = row_ids * 128 + col_ids
        # Masks travel the while carry as int32: i1 vectors fail to legalize.
        alive_i = (lane_ids < plan.budget).astype(jnp.int32)
        launched = jnp.int32(min(B, plan.budget))

        def event(state):
            (it, alive_i, launched, x, y, z, ux, uy, uz, w,
             n_bad, n_events) = state
            alive = alive_i != 0

            # --- refill -------------------------------------------------------
            dead = ~alive
            new_id = launched + _exclusive_cumsum(dead, R)
            refill = dead & (new_id < plan.budget)
            fx, fy, fz, fux, fuy, fuz = sample_photons()
            x = jnp.where(refill, fx, x)
            y = jnp.where(refill, fy, y)
            z = jnp.where(refill, fz, z)
            ux = jnp.where(refill, fux, ux)
            uy = jnp.where(refill, fuy, uy)
            uz = jnp.where(refill, fuz, uz)
            w = jnp.where(refill, 1.0, w)
            launched = launched + jnp.sum(refill.astype(jnp.int32))
            alive = alive | refill

            # --- free path: DDA over the coarse majorant grid ------------------
            tau = -jnp.log(jnp.maximum(_uniform(R), TINY))
            inv_ux = jnp.where(jnp.abs(ux) > 1e-30, 1.0 / ux, 3e38)
            inv_uy = jnp.where(jnp.abs(uy) > 1e-30, 1.0 / uy, 3e38)
            inv_uz = jnp.where(jnp.abs(uz) > 1e-30, 1.0 / uz, 3e38)
            side_x = (ux >= 0).astype(jnp.float32)
            side_y = (uy >= 0).astype(jnp.float32)
            side_z = (uz >= 0).astype(jnp.float32)

            def dda_body(i, dst):
                px, py, pz, tleft, status, maj = dst
                tracing = alive & (status == 0)
                cx = jnp.clip(((px - plan.x0) / cdx).astype(jnp.int32), 0, ncx - 1)
                cy = jnp.clip(((py - plan.y0) / cdy).astype(jnp.int32), 0, ncy - 1)
                cz = jnp.clip(((pz - plan.z0) / cdz).astype(jnp.int32), 0, ncz - 1)
                if use_woodcock:
                    cflat = (cx * ncy + cy) * ncz + cz
                    (mj,) = _read_cells(maj_tab, cflat, 1)
                else:
                    mj = jnp.full((R, 128), 1.0, jnp.float32) * maj_tab[0, 0]
                ex = plan.x0 + (cx.astype(jnp.float32) + side_x) * cdx
                ey = plan.y0 + (cy.astype(jnp.float32) + side_y) * cdy
                ez = plan.z0 + (cz.astype(jnp.float32) + side_z) * cdz
                sx = jnp.where(jnp.abs(ux) > 1e-30, (ex - px) * inv_ux, 3e38)
                sy = jnp.where(jnp.abs(uy) > 1e-30, (ey - py) * inv_uy, 3e38)
                sz = jnp.where(jnp.abs(uz) > 1e-30, (ez - pz) * inv_uz, 3e38)
                step = jnp.maximum(jnp.minimum(jnp.minimum(sx, sy), sz), 0.0)
                s_col = tleft / jnp.maximum(mj, 1e-30)
                collide_here = s_col <= step
                adv = jnp.where(collide_here, s_col, step + nudge)
                px2 = wrap_x(px + ux * adv)
                py2 = wrap_y(py + uy * adv)
                pz2 = pz + uz * adv
                tleft2 = jnp.where(collide_here, 0.0, tleft - step * mj)
                out_top = pz2 >= plan.z_max
                out_bot = pz2 <= plan.z0
                new_status = jnp.where(
                    collide_here, 1,
                    jnp.where(out_top, 2, jnp.where(out_bot, 3, 0)))
                pz2 = jnp.where(out_top, plan.z_max,
                                jnp.where(out_bot, plan.z0, pz2))
                px = jnp.where(tracing, px2, px)
                py = jnp.where(tracing, py2, py)
                pz = jnp.where(tracing, pz2, pz)
                tleft = jnp.where(tracing, tleft2, tleft)
                status = jnp.where(tracing, new_status, status)
                maj = jnp.where(tracing, mj, maj)
                return px, py, pz, tleft, status, maj

            status0 = jnp.zeros((R, 128), jnp.int32)
            maj0 = jnp.ones((R, 128), jnp.float32)
            px, py, pz, _tl, status, maj = jax.lax.fori_loop(
                0, plan.max_inner, dda_body, (x, y, z, tau, status0, maj0))
            bad = alive & (status == 0)
            exit_top = alive & (status == 2)
            exit_bot = alive & (status == 3)
            collide = alive & (status == 1)

            # --- fine cell + collision classification ---------------------------
            fxi = jnp.clip(((px - plan.x0) * inv_dx).astype(jnp.int32), 0, plan.n_x - 1)
            fyi = jnp.clip(((py - plan.y0) * inv_dy).astype(jnp.int32), 0, plan.n_y - 1)
            fzi = jnp.clip(((pz - plan.z0) * inv_dz).astype(jnp.int32), 0, plan.n_z - 1)
            flat = (fxi * plan.n_y + fyi) * plan.n_z + fzi
            cell = _read_cells(cell_tab, flat, m_cols)  # list of (R,128) tiles
            cell_ext = cell[0]
            physical = collide & (_uniform(R) < cell_ext / jnp.maximum(maj, 1e-30))

            # --- component pick + absorption ------------------------------------
            u_comp = _uniform(R)
            comp = jnp.zeros((R, 128), jnp.int32)
            for j in range(n_comp - 1):
                comp = comp + (u_comp >= cell[1 + j]).astype(jnp.int32)
            # The cell matrix stores CO-albedo (1 - ssa) in the absorption
            # block (see integrators/integrator.device_optics_from_flat).
            if n_comp == 1:
                coalb_v = cell[1 + n_comp]
                pf_idx = cell[1 + 2 * n_comp].astype(jnp.int32)
            else:
                coalb_v = jnp.zeros((R, 128), jnp.float32)
                pf_idx_f = jnp.zeros((R, 128), jnp.float32)
                for j in range(n_comp):
                    selj = (comp == j).astype(jnp.float32)
                    coalb_v = coalb_v + selj * cell[1 + n_comp + j]
                    pf_idx_f = pf_idx_f + selj * cell[1 + 2 * n_comp + j]
                pf_idx = pf_idx_f.astype(jnp.int32)
            absorbed = w * coalb_v
            w_sc = w * (1.0 - coalb_v)

            # --- surface reflection (Lambertian albedo) --------------------------
            new_mu = jnp.maximum(jnp.sqrt(_uniform(R)), 1e-6)
            new_phi = 2.0 * PI * _uniform(R)
            w_srf = w * plan.albedo
            surf_alive = exit_bot & (w_srf > TINY)
            st = jnp.sqrt(jnp.maximum(1.0 - new_mu * new_mu, 0.0))
            sux = st * jnp.cos(new_phi)
            suy = st * jnp.sin(new_phi)

            # --- tallies ----------------------------------------------------------
            zero = jnp.zeros((R, 128), jnp.float32)
            _tally_cells_ref(tally_ref, flat, [
                jnp.where(exit_top, w, zero),
                jnp.where(exit_bot, w, zero),
                jnp.where(physical, absorbed, zero),
                jnp.where(physical, absorbed, zero),
            ])

            # --- Russian roulette --------------------------------------------------
            if plan.use_rr:
                u_rr = _uniform(R)
                do_rr = physical & (w_sc < plan.rr_w / 2.0)
                killed = do_rr & (u_rr >= w_sc / plan.rr_w)
                w_sc = jnp.where(do_rr, jnp.where(killed, 0.0, plan.rr_w), w_sc)
            scat_alive = physical & (w_sc > TINY)

            # --- scattering: cubic inverse CDF + rotation ---------------------------
            u_scat = _uniform(R)
            pos = jnp.clip(u_scat, 0.0, 1.0) * plan.n_segments
            seg = jnp.clip(pos.astype(jnp.int32), 0, plan.n_segments - 1)
            t = pos - seg.astype(jnp.float32)
            row = (comp * plan.max_entries + pf_idx) * plan.n_segments + seg
            c0, c1, c2, c3 = _read_cells(cubic_tab, row, 4)
            cos_sc = jnp.clip(((c3 * t + c2) * t + c1) * t + c0, -1.0, 1.0)
            chi = 2.0 * PI * _uniform(R)
            cos_chi = jnp.cos(chi)
            sin_chi = jnp.sin(chi)
            sin_sc = jnp.sqrt(jnp.maximum(1.0 - cos_sc * cos_sc, 0.0))
            denom = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 0.0))
            near_pole = denom < 1e-6
            invd = jnp.where(near_pole, 0.0, 1.0 / jnp.maximum(denom, 1e-12))
            sgn_uz = jnp.where(uz >= 0, 1.0, -1.0)
            nx_ = sin_sc * (ux * uz * cos_chi - uy * sin_chi) * invd + ux * cos_sc
            ny_ = sin_sc * (uy * uz * cos_chi + ux * sin_chi) * invd + uy * cos_sc
            nz_ = -sin_sc * cos_chi * denom + uz * cos_sc
            nx_ = jnp.where(near_pole, sin_sc * cos_chi, nx_)
            ny_ = jnp.where(near_pole, sgn_uz * sin_sc * sin_chi, ny_)
            nz_ = jnp.where(near_pole, sgn_uz * cos_sc, nz_)
            nrm = jax.lax.rsqrt(jnp.maximum(nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-12))
            nx_, ny_, nz_ = nx_ * nrm, ny_ * nrm, nz_ * nrm

            # --- commit --------------------------------------------------------------
            moved = scat_alive | surf_alive
            x = jnp.where(moved, px, x)
            y = jnp.where(moved, py, y)
            z = jnp.where(surf_alive, plan.z0, jnp.where(moved, pz, z))
            ux = jnp.where(scat_alive, nx_, jnp.where(surf_alive, sux, ux))
            uy = jnp.where(scat_alive, ny_, jnp.where(surf_alive, suy, uy))
            uz = jnp.where(scat_alive, nz_, jnp.where(surf_alive, new_mu, uz))
            w = jnp.where(physical, w_sc, jnp.where(exit_bot, w_srf, w))
            alive = scat_alive | surf_alive
            n_bad = n_bad + jnp.sum(bad.astype(jnp.int32))
            n_events = n_events + jnp.sum(
                (exit_top | exit_bot | collide).astype(jnp.float32))
            return (it + 1, alive.astype(jnp.int32), launched,
                    x, y, z, ux, uy, uz, w, n_bad, n_events)

        def cond(state):
            it, alive_, launched_ = state[0], state[1], state[2]
            return ((jnp.any(alive_ != 0) | (launched_ < plan.budget))
                    & (it < plan.max_iters))

        state = (jnp.int32(0), alive_i, launched, x, y, z, ux, uy, uz, w,
                 jnp.int32(0), jnp.float32(0.0))
        state = jax.lax.while_loop(cond, event, state)
        it_final = state[0]
        n_bad, n_events = state[10], state[11]

        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        counters = jnp.where(slot == 0, jnp.float32(plan.budget),
                   jnp.where(slot == 1, n_bad.astype(jnp.float32),
                   jnp.where(slot == 2, n_events,
                   jnp.where(slot == 3, it_final.astype(jnp.float32), 0.0))))
        count_ref[:] = count_ref[:] + counters

    def run(seed32, cell_matrix, majorant, cubic):
        return pl.pallas_call(
            kernel,
            grid=(plan.n_grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(cell_matrix.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(majorant.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cubic.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((plan.n_cells, 4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((plan.n_cells, 4), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(seed32, cell_matrix, majorant, cubic)

    return run
