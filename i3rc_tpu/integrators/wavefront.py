"""The photon-transport kernel: a photon-parallel wavefront in pure XLA.

This is the TPU re-design of computeRT (Integrators/
monteCarloRadiativeTransfer.f95:400-707).  The reference traces one photon at
a time through a nested photonLoop/scatteringLoop; here a wide
structure-of-arrays batch of photons advances together, one transport event
per iteration of a masked ``lax.while_loop``:

  refill dead lanes from the photon budget ("persistent photons") ->
  sample free path -> move (voxel DDA or maximum cross-section jump) ->
  classify (exit top / exit bottom / collision) -> tally -> surface
  reflection or scattering (component pick, absorption, local-estimate
  radiance, Russian roulette, inverse-CDF angle, direction rotation)

Random numbers are counter-based: each event step folds the batch key and
draws whole (lanes,) vectors, so the stream depends only on (seed, batch,
event, lane) — never on the device mesh (SURVEY.md section 5).

TPU-specific design (motivated by measurement — see PERF_NOTES.md):
data-dependent gathers/scatters serialize at ~8 ns/element on TPU, so the
kernel avoids them wherever a fused one-hot matmul can ride the MXU:

  * ALL per-cell quantities (total extinction, cumulative component
    fractions, albedos, phase indices) are packed as columns of one
    (n_cells, m) matrix and fetched with a single one-hot matmul per event;
  * the scattering angle comes from a piecewise-cubic fit of the inverse
    CDF in mu(p) (256 segments x 4 coefficients, exact to ~3e-7 in mu
    against the reference's analytic inversion) — one narrow one-hot read
    instead of two gathers into a 9001-point table;
  * all four tallies (flux up/down/absorbed, volume absorption) accumulate
    through a single one-hot transpose-matmul into an (n_cells, 4) buffer,
    reduced to columns once per batch;
  * dead lanes are refilled with fresh photons from the batch budget, so
    lane occupancy stays high instead of draining into a divergence tail.

Algorithmic deltas vs the Fortran, all physics-preserving (SURVEY.md sec. 7):
  * Azimuth rotation uses the direct spherical rotation formula with
    phi = 2 pi u instead of NEXT_DIRECT's rejection loop (:2086-2113) —
    the same distribution, branch-free.
  * Directions are renormalized after each rotation (float32 drift guard).
  * In max cross-section mode the collision cell is recomputed from the
    post-jump position; the reference reuses indices from the previous event
    (:586-588 reads totalExt at stale xIndex/yIndex/zIndex — a defect for
    heterogeneous domains).
  * The scattering angle interpolates mu(p) (smooth) rather than theta(p)
    (sqrt singularity at the forward peak); both approximate the same exact
    inverse CDF, ours ~100x closer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.core.rng import TINY, exponential_deviate
from i3rc_tpu.ops.dda import (
    BAD,
    EXIT_BOT,
    EXIT_TOP,
    SCATTER,
    TRACING,
    GridGeometry,
    make_crossing_stepper,
    trace_extinction,
)
from i3rc_tpu.ops.gather import ONEHOT_MAX_ROWS, read_rows
from i3rc_tpu.ops.tally import tally_add, tally_multi

_MIN_MU = jnp.float32(1e-6)  # surface-reflection vertical floor (:542-549)
PI = np.pi


@dataclass(frozen=True)
class DeviceOptics:
    """Flattened optics on device — a pytree, so the spectral (k-distribution)
    loop can swap per-band/per-k optics through the SAME compiled kernel.

    ``cell_matrix`` packs every per-cell quantity as float32 columns:
      [ total_ext | cum_1..cum_n | (1-ssa)_1..(1-ssa)_n | pfidx_1..pfidx_n ]
    — the absorption block stores CO-albedo so nearly-conservative media
    keep full relative accuracy through the one-hot read (see read_cell_data)
    (phase indices are small ints, exact in float32).  The flat arrays remain
    for the serialized-gather fallback on very large domains.
    """

    cell_matrix: jax.Array     # (n_cells, 1 + 3*ncomp)
    total_ext: jax.Array       # (n_cells,)
    cumulative_ext: jax.Array  # (n_cells*ncomp,)
    ssa: jax.Array             # (n_cells*ncomp,)
    phase_index: jax.Array     # (n_cells*ncomp,) int32
    max_extinction: jax.Array  # scalar float32 (traced: varies per k-point)
    block_majorant: jax.Array  # (n_blocks,) super-voxel majorants; (0,) if off
    n_components: int
    # Static single-component specializations (None when not applicable):
    # spatially uniform ssa / phase index over every cell with extinction.
    # The kernel then reads only the extinction column and skips the
    # component pick; uniform_ssa == 1.0 also drops the absorption tally.
    uniform_ssa: float | None = None
    uniform_phase_index: int | None = None

    @property
    def n_cells(self) -> int:
        return self.total_ext.shape[0]

    @property
    def use_onehot(self) -> bool:
        return self.n_cells <= ONEHOT_MAX_ROWS


jax.tree_util.register_dataclass(
    DeviceOptics,
    data_fields=["cell_matrix", "total_ext", "cumulative_ext", "ssa",
                 "phase_index", "max_extinction", "block_majorant"],
    meta_fields=["n_components", "uniform_ssa", "uniform_phase_index"])


@dataclass(frozen=True)
class DeviceTables:
    inverse_cubic: jax.Array   # (ncomp*max_entries*n_segments, 4) mu(p) fit
    n_segments: int
    forward: jax.Array | None        # (ncomp*max_entries*n_fwd,) (maybe hybrid)
    forward_orig: jax.Array | None   # original forward values (low orders)
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
    exit_status: jax.Array     # (D,) int32: EXIT_TOP for up-going, EXIT_BOT down
    n_directions: int


@dataclass(frozen=True)
class RawTallies:
    """Un-normalized accumulators (sums of photon weights)."""

    flux_up: jax.Array          # (nx*ny,)
    flux_down: jax.Array
    flux_absorbed: jax.Array
    volume_absorption: jax.Array  # (nx*ny*nz,)
    intensity: jax.Array          # (nx*ny*D,) or (0,)
    intensity_by_component: jax.Array  # (nx*ny*D*(ncomp+1),) or (0,)
    intensity_excess: jax.Array        # (D*(ncomp+1),) or (0,)
    n_photons: jax.Array          # scalar i32
    n_bad: jax.Array              # scalar i32
    n_iterations: jax.Array       # scalar i32: event-loop trips (diagnostic)
    n_lane_events: jax.Array      # scalar f32: total live lane-events (diagnostic)


jax.tree_util.register_dataclass(
    RawTallies,
    data_fields=["flux_up", "flux_down", "flux_absorbed", "volume_absorption",
                 "intensity", "intensity_by_component", "intensity_excess",
                 "n_photons", "n_bad", "n_iterations", "n_lane_events"],
    meta_fields=[])


def make_direction_cosines(mu, phi):
    """(sin t cos p, sin t sin p, mu) — makeDirectionCosines (:2041-2059)."""
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    return sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), mu


def _sincos_2pi(u):
    """(sin, cos) of 2 pi u for u in [0, 1) — quarter-wave polynomials.

    The azimuth deviate spans exactly one period, so no range reduction is
    needed: quadrant from floor(4u), then degree-7/8 least-squares fits on
    the quarter wave (max error 1.6e-6, below accumulated float32 noise; the
    rotated direction is renormalized afterwards regardless).  XLA's generic
    sin/cos lower to range-reduced polynomials about twice this size, and
    the rotation was measured at ~40% of the event-loop iteration.
    """
    t = 4.0 * u
    q = jnp.floor(t)
    r = t - q
    r2 = r * r
    s = r * (1.5707924 + r2 * (-0.64590601
                               + r2 * (0.07946485 + r2 * (-0.0043527978))))
    c = 0.99999997 + r2 * (-1.2336987
                           + r2 * (0.25365383
                                   + r2 * (-0.020816208 + r2 * 8.612909e-4)))
    swap = (q == 1.0) | (q == 3.0)
    sin_q = jnp.where(swap, c, s)
    cos_q = jnp.where(swap, s, c)
    sign_sin = jnp.where(q >= 2.0, -1.0, 1.0)
    sign_cos = jnp.where((q == 1.0) | (q == 2.0), -1.0, 1.0)
    return sign_sin * sin_q, sign_cos * cos_q


def rotate_direction(ux, uy, uz, cos_scat, u_azimuth, renormalize=True):
    """New direction after scattering by cos_scat with uniform azimuth.

    Physics-equivalent replacement for NEXT_DIRECT (:2086-2113): the Marchuk
    rejection sampler draws a uniform azimuth; here chi = 2 pi u feeds the
    standard rotation, branch-free, then renormalizes (float32 drift).

    renormalize=False skips the final rsqrt for hot paths that renormalize
    in bulk elsewhere (the fastpath renormalizes once per K-event block:
    drift per rotation is ~1e-7, so the block-boundary norm error stays
    below ~1e-6 — far under the statistical gates).
    """
    sin_chi, cos_chi = _sincos_2pi(u_azimuth)
    sin_scat = jnp.sqrt(jnp.maximum(1.0 - cos_scat * cos_scat, 0.0))
    denom2 = jnp.maximum(1.0 - uz * uz, 0.0)
    # One rsqrt supplies both sqrt(denom2) and its reciprocal.
    rs = jax.lax.rsqrt(jnp.maximum(denom2, 1e-12))
    denom = denom2 * rs
    near_pole = denom < 1e-6
    inv_denom = jnp.where(near_pole, 0.0, rs)
    nx = sin_scat * (ux * uz * cos_chi - uy * sin_chi) * inv_denom + ux * cos_scat
    ny = sin_scat * (uy * uz * cos_chi + ux * sin_chi) * inv_denom + uy * cos_scat
    nz = -sin_scat * cos_chi * denom + uz * cos_scat
    # Vertical incidence limit: rotate about z directly.  (where-based sign:
    # the branch is only selected at |uz| ~ 1, and it lowers on Mosaic.)
    sgn_z = jnp.where(uz >= 0.0, 1.0, -1.0)
    pol_x = sin_scat * cos_chi
    pol_y = sgn_z * sin_scat * sin_chi
    pol_z = sgn_z * cos_scat
    nx = jnp.where(near_pole, pol_x, nx)
    ny = jnp.where(near_pole, pol_y, ny)
    nz = jnp.where(near_pole, pol_z, nz)
    if not renormalize:
        return nx, ny, nz
    norm = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    return nx * norm, ny * norm, nz * norm


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


def make_chained_flux_tracer(geom: GridGeometry, optics: DeviceOptics,
                             tables: DeviceTables, config, n_photons: int,
                             n_lanes: int | None,
                             coarse_geom: GridGeometry,
                             chain: int, dda_steps: int,
                             intensity: "IntensitySpec | None" = None):
    """Large-domain kernel: C Woodcock cycles per event-loop iteration.

    The general event loop pays three per-iteration fixed costs that dwarf
    the physics once the per-cell read is a single serialized gather
    (measured on the 1.95M-cell Landsat scene, 2^17 lanes, v5e): the
    column tally chain (~0.8 ms), the coarse-DDA while_loop that runs every
    lane to the WORST lane's crossing count (19.4 avg lockstep iterations
    where the mean flight needs ~4, ~0.64 ms), and the RNG/refill/loop
    plumbing.  This tracer restructures the iteration for the weight-1
    workload class (black surface, uniform single-component optics —
    absorption, if any, by Bernoulli survival exactly like the fastpath's
    estimator, FastPlan.ssa):

      * ``chain`` tentative collisions resolve per iteration — each cycle
        advances the coarse DDA a FIXED ``dda_steps`` crossings (unrolled,
        no while_loop; unfinished flights carry their remaining optical
        depth to the next cycle, exact because the remaining target is
        deterministic), then one gather + Woodcock accept + rotation.
      * Weight is identically 1 (Bernoulli absorption, black surface, no
        roulette), so exits are pure counts: a lane records (column, kind)
        in registers — it can exit at most once per iteration since refill
        happens only at iteration start — and ONE column tally matmul per
        iteration commits up to C cycles' worth of exits.

    Radiance detectors (round 4 — the serial-gather radiance path): each
    lane owns D RATIO-TRACKING shadow-ray slots that ride the same C-cycle
    structure.  A physical collision arms its per-detector prefactors
    ssa * P(cos Theta)/(4 pi |mu_d|) — the estimator of
    computeIntensityContribution (monteCarloRadiativeTransfer.f95:
    1419-1510) under the weight-1/Bernoulli scheme — and the lane FREEZES
    until its slots are free (at most one estimate event per lane per
    iteration).  Rays sample tentative collisions against the super-voxel
    majorants with the same fixed-step resumable coarse DDA as photons,
    multiply the running transmittance by (1 - ext/majorant) per tentative
    (unbiased: E[T] = exp(-tau), the ratio-tracking estimator the inline
    general kernel uses), roulette at zeta_min, and pend their escape
    contribution pf * T in registers — ONE intensity scatter-add per
    iteration commits them.  This removes both per-collision nested
    while_loops (the trace AND the round loop) that cap the inline
    estimator at ~1.75e4 photons/s on Landsat-class scenes.

    Physics matched: the maximum-cross-section loop of
    monteCarloRadiativeTransfer.f95:400-707 with per-block majorants;
    expectations identical to the general kernel (cross-checked in
    tests/test_serial_path.py), different RNG event stream.
    """
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    # Default wavefront width: with radiance detectors the kernel is
    # occupancy-bound (a lane freezes while its ray slots drain), and the
    # round-5 bench-chip scan measured NARROW wavefronts fastest — 2^13
    # lanes beat 2^15 by 2.7x at equal dispatch (1.15e5 vs 4.3e4 photons/s
    # on Landsat + 2 detectors).  Flux-only keeps the wide default.
    default_lanes = (1 << 13) if intensity is not None else (1 << 20)
    L = int(n_lanes or min(n_photons, default_lanes))
    D = intensity.n_directions if intensity is not None else 0
    max_iters = config.max_events * (n_photons // L + 2) * (2 if D else 1)
    inv_cap = jnp.float32(1e-30)
    if D:
        LD = L * D
        _dirs = intensity.directions
        dxs_t = jnp.broadcast_to(_dirs[0][None, :], (L, D)).reshape(LD)
        dys_t = jnp.broadcast_to(_dirs[1][None, :], (L, D)).reshape(LD)
        dzs_t = jnp.broadcast_to(_dirs[2][None, :], (L, D)).reshape(LD)
        exit_status_t = jnp.broadcast_to(intensity.exit_status[None, :],
                                         (L, D)).reshape(LD)
        d_idx_t = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None, :],
                                   (L, D)).reshape(LD)
        zeta = jnp.float32(max(config.zeta_min, 1e-3))
        max_ray_rounds = 4 * int(config.max_intensity_crossings
                                 or max(1024, 8 * (n_x + n_y + n_z)))

    def trace(key, batch, source=None, optics_override=None):
        opt = optics if optics_override is None else optics_override
        assert (opt.n_components == 1 and opt.uniform_ssa is not None
                and opt.uniform_phase_index is not None), (
            "chained tracer requires uniform single-component optics")
        ssa_u = jnp.float32(opt.uniform_ssa)
        absorbing = float(opt.uniform_ssa) < 1.0
        s_seg = tables.n_segments
        pf_row0 = opt.uniform_phase_index * s_seg
        if D:
            fwd_row0 = opt.uniform_phase_index * tables.n_forward_steps

        x = geom.x0 + batch.x * (geom.x_max - geom.x0)
        y = geom.y0 + batch.y * (geom.y_max - geom.y0)
        z = geom.z0 + batch.z * (geom.z_max - geom.z0)
        ux, uy, uz = make_direction_cosines(batch.mu, batch.phi)
        order = jnp.zeros(L, jnp.int32)
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        alive = lane_ids < n_photons
        launched = jnp.int32(min(L, n_photons))
        in_flight = jnp.zeros(L, bool)
        tau_rem = jnp.zeros(L, jnp.float32)
        zeros_i = jnp.zeros(L, jnp.int32)
        tallies = {
            "columns": jnp.zeros((n_x * n_y, 3 if absorbing else 2),
                                 jnp.float32),
            "n_bad": jnp.zeros((), jnp.int32),
            "n_lane_events": jnp.zeros((), jnp.float32),
        }
        if D:
            tallies["intensity"] = jnp.zeros(n_x * n_y * D, jnp.float32)
            tallies["intensity_by_component"] = jnp.zeros(n_x * n_y * D * 2,
                                                          jnp.float32)
        np_draws = 5 if absorbing else 4

        def body(carry):
            k, st_all = carry
            (alive, launched, x, y, z, ux, uy, uz, order, in_flight,
             tau_rem, bix, biy, biz, tallies) = st_all[:15]
            if D:
                (pend, pend_pf, r_alive, r_inflight, r_tau_rem, rT, rpf,
                 rpx, rpy, rpz, rbix, rbiy, rbiz, r_rounds) = st_all[15:]
            opt_ = opt
            ek = jax.random.fold_in(key, k)
            ks = jax.random.split(ek, 3)
            u = jax.random.uniform(ks[0], (chain, np_draws, L),
                                   dtype=jnp.float32)
            if D:
                u_r = jax.random.uniform(ks[2], (chain, 2, LD),
                                         dtype=jnp.float32)

            n_bad = tallies["n_bad"]
            n_ev = tallies["n_lane_events"]

            if D:
                # --- arm pending estimates into free ray slots ------------
                # (a slot set is free when no slot of the lane is alive;
                # escape/kill both clear r_alive, so one check suffices).
                rays_free = ~jnp.any(r_alive.reshape(L, D), axis=1)
                release = pend & rays_free
                arm = jnp.broadcast_to(release[:, None], (L, D)).reshape(LD)
                tile = lambda a: jnp.broadcast_to(a[:, None],
                                                  (L, D)).reshape(LD)
                rpx = jnp.where(arm, tile(x), rpx)
                rpy = jnp.where(arm, tile(y), rpy)
                rpz = jnp.where(arm, tile(z), rpz)
                rT = jnp.where(arm, 1.0, rT)
                rpf = jnp.where(arm, pend_pf.reshape(LD), rpf)
                r_inflight = r_inflight & ~arm
                r_rounds = jnp.where(arm, 0, r_rounds)
                r_alive = r_alive | arm
                pend = pend & ~release

            # --- refill dead lanes (iteration start only) -------------------
            if n_photons > L:
                dead = ~alive if not D else (~alive & ~pend)
                dead_i = dead.astype(jnp.int32)
                new_id = launched + jnp.cumsum(dead_i) - dead_i
                refill = dead & (new_id < n_photons)
                fresh = source.sample(ks[1], L)
                x = jnp.where(refill, geom.x0 + fresh.x * (geom.x_max - geom.x0), x)
                y = jnp.where(refill, geom.y0 + fresh.y * (geom.y_max - geom.y0), y)
                z = jnp.where(refill, geom.z0 + fresh.z * (geom.z_max - geom.z0), z)
                fux, fuy, fuz = make_direction_cosines(fresh.mu, fresh.phi)
                ux = jnp.where(refill, fux, ux)
                uy = jnp.where(refill, fuy, uy)
                uz = jnp.where(refill, fuz, uz)
                order = jnp.where(refill, 0, order)
                in_flight = in_flight & ~refill
                launched = launched + jnp.sum(refill.astype(jnp.int32))
                alive = alive | refill

            exit_col = zeros_i
            exit_kind = zeros_i      # 0 none, 1 top, 2 bottom, 3 absorbed
            if D:
                r_esc = jnp.zeros(LD, bool)
                r_esc_col = jnp.zeros(LD, jnp.int32)
                r_contrib = jnp.zeros(LD, jnp.float32)
                rstep = make_crossing_stepper(
                    coarse_geom, opt_.block_majorant, dxs_t, dys_t, dzs_t,
                    cell_matrix=opt_.block_majorant[:, None])

            for c in range(chain):
                u_tau, u_accept, u_scat, u_chi = (u[c, 0], u[c, 1], u[c, 2],
                                                  u[c, 3])
                transportable = alive & ~pend if D else alive
                start_new = transportable & ~in_flight
                tau_t = jnp.where(start_new, exponential_deviate(u_tau), tau_rem)
                bix = jnp.where(start_new, coarse_geom.locate_x(x), bix)
                biy = jnp.where(start_new, coarse_geom.locate_y(y), biy)
                biz = jnp.where(start_new, coarse_geom.locate_z(z), biz)
                step = make_crossing_stepper(
                    coarse_geom, opt_.block_majorant, ux, uy, uz,
                    cell_matrix=opt_.block_majorant[:, None])
                st = (x, y, z, bix, biy, biz, jnp.zeros(L, jnp.float32),
                      jnp.full(L, TRACING, jnp.int32))
                for _ in range(dda_steps):
                    st = step(st, tau_t, transportable)
                x, y, z, bix, biy, biz, tau_acc, status = st

                still = transportable & (status == TRACING)
                tentative = transportable & (status == SCATTER)
                ex_top = transportable & (status == EXIT_TOP)
                ex_bot = transportable & (status == EXIT_BOT)
                badlane = transportable & (status == BAD)
                in_flight = still
                tau_rem = jnp.where(still, tau_t - tau_acc, 0.0)

                # --- Woodcock accept at the tentative point -----------------
                fix = geom.locate_x(x)
                fiy = geom.locate_y(y)
                fiz = geom.locate_z(z)
                flat_cell = (fix * n_y + fiy) * n_z + fiz
                if optics.use_onehot:
                    cell_ext = read_rows(opt_.cell_matrix[:, :1], flat_cell)[:, 0]
                else:
                    cell_ext = opt_.total_ext[flat_cell]
                block_flat = (bix * coarse_geom.n_y + biy) * coarse_geom.n_z + biz
                maj = read_rows(opt_.block_majorant[:, None], block_flat)[:, 0]
                physical = tentative & (u_accept < cell_ext / jnp.maximum(maj, inv_cap))
                absorbed = (physical & (u[c, 4] >= ssa_u)) if absorbing \
                    else jnp.zeros_like(physical)
                scatter = physical & ~absorbed

                if D:
                    # Per-detector estimate prefactors from the INCOMING
                    # direction (pre-rotation), ssa-weighted (the reference
                    # estimates with the post-absorption weight, :642-655);
                    # the lane freezes until its slots arm next iteration.
                    proj = jnp.clip(
                        ux[:, None] * _dirs[0][None, :]
                        + uy[:, None] * _dirs[1][None, :]
                        + uz[:, None] * _dirs[2][None, :], -1.0, 1.0)
                    pos_f = jnp.arccos(proj) / PI
                    pf_val = _table_lookup(tables.forward,
                                           jnp.full((L, 1), fwd_row0,
                                                    jnp.int32),
                                           pos_f, tables.n_forward_steps)
                    pf_new = (pf_val * ssa_u
                              / (4.0 * PI * intensity.abs_mu[None, :]))
                    pend_pf = jnp.where(physical[:, None], pf_new, pend_pf)
                    pend = pend | physical

                # --- scattering: inverse-CDF cubic sample + rotation --------
                pos = jnp.clip(u_scat, 0.0, 1.0) * s_seg
                seg = jnp.clip(pos.astype(jnp.int32), 0, s_seg - 1)
                t = pos - seg.astype(pos.dtype)
                cc = read_rows(tables.inverse_cubic, pf_row0 + seg)
                mu_s = jnp.clip(((cc[:, 3] * t + cc[:, 2]) * t + cc[:, 1]) * t
                                + cc[:, 0], -1.0, 1.0)
                nux, nuy, nuz = rotate_direction(ux, uy, uz, mu_s, u_chi)
                ux = jnp.where(scatter, nux, ux)
                uy = jnp.where(scatter, nuy, uy)
                uz = jnp.where(scatter, nuz, uz)
                order_next = order + physical.astype(jnp.int32)
                over = scatter & (order_next >= config.max_events)
                order = order_next

                # --- exits: pend in registers (<= one per lane/iteration) ---
                col = fix * n_y + fiy
                hit = ex_top | ex_bot | absorbed
                exit_col = jnp.where(hit, col, exit_col)
                exit_kind = jnp.where(
                    ex_top, 1, jnp.where(ex_bot, 2,
                                         jnp.where(absorbed, 3, exit_kind)))
                badlane = badlane | over
                n_bad = n_bad + jnp.sum(badlane).astype(jnp.int32)
                n_ev = n_ev + jnp.sum((tentative | ex_top | ex_bot)
                                      .astype(jnp.float32))
                alive = alive & ~(hit | badlane)

                if D:
                    # --- ratio-tracking ray cycle (same fixed-step shape) --
                    r_act = r_alive
                    r_start = r_act & ~r_inflight
                    r_taut = jnp.where(r_start,
                                       exponential_deviate(u_r[c, 0]),
                                       r_tau_rem)
                    rbix = jnp.where(r_start, coarse_geom.locate_x(rpx), rbix)
                    rbiy = jnp.where(r_start, coarse_geom.locate_y(rpy), rbiy)
                    rbiz = jnp.where(r_start, coarse_geom.locate_z(rpz), rbiz)
                    rst = (rpx, rpy, rpz, rbix, rbiy, rbiz,
                           jnp.zeros(LD, jnp.float32),
                           jnp.full(LD, TRACING, jnp.int32))
                    for _ in range(dda_steps):
                        rst = rstep(rst, r_taut, r_act)
                    (rpx, rpy, rpz, rbix, rbiy, rbiz, r_tacc, r_status) = rst
                    r_still = r_act & (r_status == TRACING)
                    r_tent = r_act & (r_status == SCATTER)
                    r_exit = r_act & ((r_status == EXIT_TOP)
                                      | (r_status == EXIT_BOT))
                    r_good = r_exit & (r_status == exit_status_t)
                    r_inflight = r_still
                    r_tau_rem = jnp.where(r_still, r_taut - r_tacc, 0.0)
                    # Tentative: multiply by the null-collision ratio.
                    rfc = ((geom.locate_x(rpx) * n_y + geom.locate_y(rpy))
                           * n_z + geom.locate_z(rpz))
                    if optics.use_onehot:
                        r_ext = read_rows(opt_.cell_matrix[:, :1], rfc)[:, 0]
                    else:
                        r_ext = opt_.total_ext[rfc]
                    r_bf = ((rbix * coarse_geom.n_y + rbiy) * coarse_geom.n_z
                            + rbiz)
                    r_maj = read_rows(opt_.block_majorant[:, None],
                                      r_bf)[:, 0]
                    ratio = jnp.clip(1.0 - r_ext / jnp.maximum(r_maj,
                                                               inv_cap),
                                     0.0, 1.0)
                    rT = jnp.where(r_tent, rT * ratio, rT)
                    rr = r_tent & (rT < zeta)
                    killed = rr & (u_r[c, 1] >= rT / zeta)
                    rT = jnp.where(rr, jnp.where(killed, 0.0, zeta), rT)
                    # Escapes pend their contribution (slots arm only at
                    # iteration start, so at most one escape per slot).
                    r_esc_col = jnp.where(
                        r_good,
                        geom.locate_x(rpx) * n_y + geom.locate_y(rpy),
                        r_esc_col)
                    r_contrib = jnp.where(r_good, rpf * rT, r_contrib)
                    r_esc = r_esc | r_good
                    r_rounds = r_rounds + r_act.astype(jnp.int32)
                    r_over = r_act & (r_rounds > max_ray_rounds)
                    n_bad = n_bad + jnp.sum(
                        ((r_act & (r_status == BAD)) | r_over)
                        .astype(jnp.int32))
                    r_alive = (r_tent & (rT > 0.0) & ~r_over) | r_still

            vals = [(exit_kind == 1).astype(jnp.float32),
                    (exit_kind == 2).astype(jnp.float32)]
            if absorbing:
                vals.append((exit_kind == 3).astype(jnp.float32))
            tallies = dict(tallies)
            tallies["columns"] = tally_multi(tallies["columns"], exit_col,
                                             jnp.stack(vals, axis=1))
            if D:
                int_idx = r_esc_col * D + d_idx_t
                tallies["intensity"] = tally_add(
                    tallies["intensity"], int_idx, r_contrib, r_esc)
                # Black surface: every contribution is the single cloud
                # component (slot 1; slot 0 = surface stays zero).
                tallies["intensity_by_component"] = tally_add(
                    tallies["intensity_by_component"], int_idx * 2 + 1,
                    r_contrib, r_esc)
            tallies["n_bad"] = n_bad
            tallies["n_lane_events"] = n_ev
            out = (alive, launched, x, y, z, ux, uy, uz, order,
                   in_flight, tau_rem, bix, biy, biz, tallies)
            if D:
                out = out + (pend, pend_pf, r_alive, r_inflight, r_tau_rem,
                             rT, rpf, rpx, rpy, rpz, rbix, rbiy, rbiz,
                             r_rounds)
            return k + 1, out

        def cond(carry):
            k, state = carry
            busy = jnp.any(state[0]) | (state[1] < n_photons)
            if D:
                busy = busy | jnp.any(state[15]) | jnp.any(state[17])
            return busy & (k < max_iters)

        state0 = (alive, launched, x, y, z, ux, uy, uz, order, in_flight,
                  tau_rem, zeros_i, zeros_i, zeros_i, tallies)
        if D:
            zeros_ld_f = jnp.zeros(LD, jnp.float32)
            zeros_ld_i = jnp.zeros(LD, jnp.int32)
            state0 = state0 + (
                jnp.zeros(L, bool), jnp.zeros((L, D), jnp.float32),
                jnp.zeros(LD, bool), jnp.zeros(LD, bool), zeros_ld_f,
                zeros_ld_f, zeros_ld_f, zeros_ld_f, zeros_ld_f, zeros_ld_f,
                zeros_ld_i, zeros_ld_i, zeros_ld_i, zeros_ld_i)
        k_final, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))
        tallies = state[14]
        # Lanes/records still live at the cap vanish: count bad.
        n_bad = tallies["n_bad"] + jnp.sum(state[0]).astype(jnp.int32)
        if D:
            n_bad = n_bad + jnp.sum((state[15] & ~state[0])
                                    .astype(jnp.int32)) \
                + jnp.sum(state[17].astype(jnp.int32))
        zero_cols = jnp.zeros(n_x * n_y, jnp.float32)
        cols = tallies["columns"]
        return RawTallies(
            flux_up=cols[:, 0],
            flux_down=cols[:, 1],
            flux_absorbed=cols[:, 2] if cols.shape[1] > 2 else zero_cols,
            volume_absorption=jnp.zeros(n_x * n_y * n_z, jnp.float32),
            intensity=tallies.get("intensity", jnp.zeros(0, jnp.float32)),
            intensity_by_component=tallies.get(
                "intensity_by_component", jnp.zeros(0, jnp.float32)),
            intensity_excess=jnp.zeros(D * 2 if D else 0, jnp.float32),
            n_photons=jnp.int32(n_photons), n_bad=n_bad,
            n_iterations=k_final,
            n_lane_events=tallies["n_lane_events"])

    return trace


def make_batch_tracer(geom: GridGeometry, optics: DeviceOptics, tables: DeviceTables,
                      surface: SurfaceSpec, intensity: IntensitySpec | None,
                      config, n_photons: int, n_lanes: int | None = None,
                      coarse_geom: GridGeometry | None = None):
    """Build the jittable single-batch transport function.

    Returns trace(key, batch: PhotonBatch) -> RawTallies.  ``n_lanes`` is the
    wavefront width; when smaller than n_photons, dead lanes are refilled
    from the remaining budget each event ("persistent photons").
    """
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    n_comp = optics.n_components
    compute_intensity = intensity is not None
    n_dirs = intensity.n_directions if compute_intensity else 0
    # Auto crossing budgets: grazing trajectories cross x/y faces many times
    # per unit of vertical travel (periodic wrap), so small grids still need
    # a generous floor; over-budget lanes are dropped and counted bad.
    max_crossings = config.max_crossings or max(1024, 8 * (n_x + n_y + n_z))
    max_int_crossings = config.max_intensity_crossings or max(1024, 8 * (n_x + n_y + n_z))
    use_rt = config.use_ray_tracing
    # Super-voxel Woodcock transport: free paths sampled against a coarse
    # majorant grid via the same DDA (inhomogeneous exponential sampling),
    # then collisions resolved physical/null against the fine cell. Removes
    # the global-majorant null-collision tax in optically thin regions.
    use_woodcock = (not use_rt) and coarse_geom is not None
    # Zero-albedo Lambertian surface: photons hitting the bottom always die,
    # so the per-event reflection math compiles away (see event_step).
    black_surface = (not surface.uses_brdf) and float(surface.albedo) == 0.0
    if coarse_geom is not None:
        max_block_crossings = max(64, 4 * (coarse_geom.n_x + coarse_geom.n_y
                                           + coarse_geom.n_z))
    # Chained-cycle specialization (see make_chained_flux_tracer): auto-on
    # for serial-gather domains, where the per-iteration fixed costs it
    # amortizes dominate; an explicit general_chain wins either way.
    # Eligibility = the weight-1 class: black surface, uniform single-
    # component optics (absorption by Bernoulli survival), no volume
    # absorption; radiance detectors require the ratio-tracking estimator
    # (which Integrator.create auto-enables on serial-gather domains) —
    # deterministic/Iwabuchi traces keep the inline general kernel.
    chain = int(config.general_chain) or (6 if not optics.use_onehot else 1)
    if (chain > 1 and not use_rt and use_woodcock
            and black_surface and optics.n_components == 1
            and optics.uniform_ssa is not None
            and optics.uniform_phase_index is not None
            and not config.compute_volume_absorption
            and (not compute_intensity
                 or (config.use_ratio_tracking_for_intensity
                     and not config.use_hybrid_phase_funs
                     and not config.limit_intensity_contributions))):
        return make_chained_flux_tracer(
            geom, optics, tables, config, n_photons, n_lanes, coarse_geom,
            chain, int(config.general_dda_steps) or 8,
            intensity=intensity if compute_intensity else None)
    L = int(n_lanes or min(n_photons, 1 << 20))
    n_cells = optics.n_cells
    # Column-keyed tallies ride the one-hot transpose-matmul whenever the
    # COLUMN count allows it, even when the cell count forces serial-gather
    # reads (Landsat: 1.95M cells but only 16,384 columns).
    col_onehot = (n_x * n_y) <= ONEHOT_MAX_ROWS
    # Queued (persistent-ray) local estimation — see IntegratorConfig.
    # Ratio tracking keeps its inline estimator (its rounds are already
    # bounded by the majorant optical depth, not the cell count).
    # Queued estimation needs the fused one-hot read path: its bounded-M
    # ray advance reads a cell per slot per step whether or not the slot
    # is tracing, and on serial-gather domains (> ONEHOT_MAX_ROWS cells,
    # ~8 ns/lane regardless of masking) that multiplies the dominant cost
    # by M — the run-to-completion inline estimator is strictly cheaper
    # there.
    use_queued = (compute_intensity
                  and config.use_queued_intensity
                  and optics.use_onehot
                  and not (config.use_ratio_tracking_for_intensity
                           and coarse_geom is not None))
    ray_steps = int(config.intensity_ray_steps)
    if ray_steps <= 0:
        # Auto: a typical boundary trace crosses ~(nx-wraps + nz) cells;
        # serving that within a couple of transport events keeps lanes
        # from stalling on busy ray slots (see IntegratorConfig).
        ray_steps = min(64, max(8, (n_x + n_y + n_z) // 2))
    if use_queued:
        LD = L * n_dirs
        _dirs = intensity.directions  # (3, D)
        dxs_t = jnp.broadcast_to(_dirs[0][None, :], (L, n_dirs)).reshape(LD)
        dys_t = jnp.broadcast_to(_dirs[1][None, :], (L, n_dirs)).reshape(LD)
        dzs_t = jnp.broadcast_to(_dirs[2][None, :], (L, n_dirs)).reshape(LD)
        exit_status_t = jnp.broadcast_to(intensity.exit_status[None, :],
                                         (L, n_dirs)).reshape(LD)
        d_idx_t = jnp.broadcast_to(
            jnp.arange(n_dirs, dtype=jnp.int32)[None, :], (L, n_dirs)
        ).reshape(LD)
    RAY_DONE = jnp.int32(-1)  # slot drained / never armed
    # Safety cap on loop iterations: with refill, the loop needs about
    # (n_photons / L) * mean_orders + tail iterations; ray stalls can
    # roughly double the queued-radiance event count.
    max_iters = config.max_events * (n_photons // L + 2) * (2 if use_queued
                                                            else 1)

    def read_cell_data(opt, flat_cell):
        """One fused read of every per-cell quantity: (L, 1 + 3*ncomp).

        The absorption block carries CO-albedo (1 - ssa): the absorbed
        fraction of nearly-conservative media would lose all relative
        accuracy to the read's 1.4e-5 error if ssa itself were stored
        (1 - 0.99999 amplifies it 10^5-fold).
        """
        if optics.use_onehot:
            return read_rows(opt.cell_matrix, flat_cell)
        # Serial-gather domains: ONE packed-row gather.  Measured on v5e
        # (benchmarks/gather_probe.py): XLA's serialized gather costs
        # ~35 ns/lane per OP at 2^17 lanes *independent of row width* —
        # an (R, 8) float32 row costs the same as a single int8 column —
        # so fetching the packed cell matrix in one gather beats the
        # former four indexed reads ~4x.
        return opt.cell_matrix[flat_cell]

    def sample_cos_scat(comp, pf_idx, u):
        """Scattering-angle cosine from the piecewise-cubic inverse CDF."""
        s = tables.n_segments
        pos = jnp.clip(u, 0.0, 1.0) * s
        seg = jnp.clip(pos.astype(jnp.int32), 0, s - 1)
        t = pos - seg.astype(pos.dtype)
        row = (comp * tables.max_entries + pf_idx) * s + seg
        c = read_rows(tables.inverse_cubic, row)  # (L, 4)
        mu = ((c[:, 3] * t + c[:, 2]) * t + c[:, 1]) * t + c[:, 0]
        return jnp.clip(mu, -1.0, 1.0)

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

    def ratio_transmittance(opt, key, live0, px, py, pz, dx, dy, dz):
        """Unbiased transmittance to the boundary by ratio tracking.

        Tentative collisions are sampled against the super-voxel majorants
        (the same coarse DDA as Woodcock transport); each multiplies the
        running transmittance by (1 - ext/majorant).  Roulette at zeta_min
        keeps the expected round count ~ the majorant optical depth.  Returns
        (T, exit_fix, exit_fiy, escaped) over the flat lane-direction axis.
        No reference analog: the reference always integrates tau cell by cell
        (monteCarloRadiativeTransfer.f95:1512-1535); E[T] equals its
        exp(-tau) exactly.
        """
        n = px.shape[0]
        zeros_i = jnp.zeros(n, jnp.int32)
        state = (live0, jnp.where(live0, 1.0, 0.0).astype(jnp.float32),
                 px, py, pz, zeros_i, zeros_i, jnp.zeros(n, bool),
                 jnp.int32(0))

        def cond(s):
            return jnp.any(s[0]) & (s[-1] < max_int_crossings)

        def body(s):
            live, T, px, py, pz, fix_o, fiy_o, esc_o, it = s
            u_free, u_kill = jax.random.uniform(
                jax.random.fold_in(key, it), (2, n), dtype=jnp.float32)
            tau_t = exponential_deviate(u_free)
            (rx, ry, rz, fbx, fby, fbz, _ta, status) = trace_extinction(
                coarse_geom, opt.block_majorant, px, py, pz,
                coarse_geom.locate_x(px), coarse_geom.locate_y(py),
                coarse_geom.locate_z(pz),
                dx, dy, dz, tau_t, live, max_block_crossings,
                cell_matrix=opt.block_majorant[:, None])
            exited = live & ((status == EXIT_TOP) | (status == EXIT_BOT))
            esc_o = esc_o | exited
            fix_o = jnp.where(exited, geom.locate_x(rx), fix_o)
            fiy_o = jnp.where(exited, geom.locate_y(ry), fiy_o)
            collided = live & (status == SCATTER)
            flat_cell = ((geom.locate_x(rx) * n_y + geom.locate_y(ry)) * n_z
                         + geom.locate_z(rz))
            cell_ext = read_rows(opt.cell_matrix[:, :1], flat_cell)[:, 0]
            block_flat = (fbx * coarse_geom.n_y + fby) * coarse_geom.n_z + fbz
            maj = read_rows(opt.block_majorant[:, None], block_flat)[:, 0]
            ratio = jnp.clip(1.0 - cell_ext / jnp.maximum(maj, 1e-30), 0.0, 1.0)
            T = jnp.where(collided, T * ratio, T)
            # Roulette on the running transmittance: unbiased, bounds rounds.
            zeta = jnp.float32(max(config.zeta_min, 1e-3))
            rr = collided & (T < zeta)
            killed = rr & (u_kill >= T / zeta)
            T = jnp.where(rr, jnp.where(killed, 0.0, zeta), T)
            live = collided & (T > 0.0)
            px = jnp.where(live, rx, px)
            py = jnp.where(live, ry, py)
            pz = jnp.where(live, rz, pz)
            return (live, T, px, py, pz, fix_o, fiy_o, esc_o, it + 1)

        (_, T, _, _, _, fix_o, fiy_o, esc_o, _) = jax.lax.while_loop(
            cond, body, state)
        return T, fix_o, fiy_o, esc_o

    # Exact BRDF local estimation at surface reflections: a non-Lambertian
    # kernel's detector contribution must evaluate the BRDF toward the
    # DETECTOR direction with the pre-reflection weight.  The reference's
    # 1/pi surface term with the post-reflection weight
    # (monteCarloRadiativeTransfer.f95:1473-1480, :565-580) is exact only
    # for Lambertian surfaces (where R is direction-independent); for a
    # peaked kernel (Cox-Munk glint) it would replace the lobe with its
    # hemispheric average.  Albedo surfaces keep the reference's exact
    # code path bit for bit.  Upward detectors only: the surface reflects
    # into the upper hemisphere.
    if compute_intensity and surface.uses_brdf:
        _det_mu = intensity.directions[2]
        _det_phi = jnp.arctan2(intensity.directions[1], intensity.directions[0])

        def surface_detector_pf(sx, sy, uz_in, phi_in):
            shp = (sx.shape[0], n_dirs)
            refl = surface_reflectance(
                jnp.broadcast_to(sx[:, None], shp),
                jnp.broadcast_to(sy[:, None], shp),
                jnp.broadcast_to(uz_in[:, None], shp),
                jnp.broadcast_to(_det_mu[None, :], shp),
                jnp.broadcast_to(phi_in[:, None], shp),
                jnp.broadcast_to(_det_phi[None, :], shp))
            return jnp.where(_det_mu[None, :] > 0.0, refl / PI, 0.0)
    else:
        surface_detector_pf = None

    def intensity_contribution(opt, key, mask, is_surface, x, y, z, ix, iy, iz,
                               ux, uy, uz, weight, comp, pf_idx, order, tallies):
        """Local estimation toward each detector direction.

        Mirrors computeIntensityContribution (:1419-1611): per direction,
        phase value at the photon->detector angle from the tabulated forward
        matrices (hybrid or original by scattering order), times the
        transmission to the boundary — full trace or the Iwabuchi (2006)
        Russian-roulette variants; optional clipping with excess bookkeeping.
        Tally lands at the column where the directional trace leaves the
        domain (xIndexF/yIndexF in the reference).
        """
        D = n_dirs
        dirs = intensity.directions  # (3, D)
        # Scattering angle photon -> detector: acos of the projection (:1487-1489).
        proj = jnp.clip(ux[:, None] * dirs[0][None, :] + uy[:, None] * dirs[1][None, :]
                        + uz[:, None] * dirs[2][None, :], -1.0, 1.0)
        ang = jnp.arccos(proj)  # (L, D)

        # Phase value: rows selected by (component, phase index) (:1495-1508).
        row = (comp * tables.max_entries + pf_idx) * tables.n_forward_steps
        pos = ang / PI
        pf_val = _table_lookup(tables.forward, row[:, None], pos, tables.n_forward_steps)
        if config.use_hybrid_phase_funs and config.num_orders_orig_phase_fun > 0:
            pf_orig = _table_lookup(tables.forward_orig, row[:, None], pos,
                                    tables.n_forward_steps)
            pf_val = jnp.where((order <= config.num_orders_orig_phase_fun)[:, None],
                               pf_orig, pf_val)
        # Normalized: P/(4 pi |mu_d|); surface reflection contributes 1/pi
        # (:1473-1480, :1509) — or R(in->detector)/pi for BRDF surfaces
        # (see surface_detector_pf; the weight is then pre-reflection).
        norm_pf = pf_val / (4.0 * PI * intensity.abs_mu[None, :])
        if surface_detector_pf is not None:
            norm_pf = jnp.where(is_surface[:, None],
                                surface_detector_pf(x, y, uz,
                                                    jnp.arctan2(uy, ux)),
                                norm_pf)
        else:
            norm_pf = jnp.where(is_surface[:, None], 1.0 / PI, norm_pf)

        # Directional transmission traces: (L, D) pseudo-lanes flattened.
        def tile_l(a):
            return jnp.broadcast_to(a[:, None], (L, D)).reshape(L * D)

        def tile_d(a):
            return jnp.broadcast_to(a[None, :], (L, D)).reshape(L * D)

        mask_ld = tile_l(mask)
        dxs, dys, dzs = tile_d(dirs[0]), tile_d(dirs[1]), tile_d(dirs[2])
        if config.use_ratio_tracking_for_intensity and coarse_geom is not None:
            # Ratio tracking (null-collision transmittance estimator): free
            # paths against the super-voxel majorants, multiplying the running
            # transmittance by (1 - ext/majorant) at each tentative collision.
            # Unbiased for E[T] = exp(-tau); expected rounds ~ majorant
            # optical depth along the ray instead of O(cells crossed), with
            # roulette at zeta_min bounding deep (tiny-T) paths.
            T_hat, fix, fiy, escaped_f = ratio_transmittance(
                opt, key, mask_ld, tile_l(x), tile_l(y), tile_l(z),
                dxs, dys, dzs)
            escaped = escaped_f.reshape(L, D)
            contrib = jnp.where(escaped, weight[:, None] * norm_pf
                                * T_hat.reshape(L, D), 0.0)
        else:
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
                geom, opt.total_ext,
                tile_l(x), tile_l(y), tile_l(z),
                tile_l(ix), tile_l(iy), tile_l(iz),
                dxs, dys, dzs,
                target, mask_ld, max_int_crossings,
                cell_matrix=opt.cell_matrix if optics.use_onehot else None)
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

    _BIG_TAU = jnp.float32(1.0e30)

    def intensity_emission(opt, key, emit, is_surface, px, py, pz,
                           ux, uy, uz, weight, comp, pf_idx, order, rays):
        """Arm the D per-lane ray slots for lanes in ``emit``.

        All contribution prefactors are computed here, at emission time, so
        ray completion only needs exp(-tau): mirrors
        computeIntensityContribution's per-direction prefactor
        (monteCarloRadiativeTransfer.f95:1419-1510) with hybrid-table
        selection, and folds the Iwabuchi small/large split (:1536-1596)
        into a unified completion rule
            contrib = escaped ? (tau <= taumax ? pfw_exp*exp(-tau)
                                               : pfw_flat) : 0
        (plain estimator: taumax = +inf, target = +inf — trace to the
        boundary; Iwabuchi small: emit only if accepted, taumax = -1,
        target = tau_free; Iwabuchi large: target = tau_max + tau_free).
        """
        D = n_dirs
        dirs = intensity.directions
        proj = jnp.clip(ux[:, None] * dirs[0][None, :]
                        + uy[:, None] * dirs[1][None, :]
                        + uz[:, None] * dirs[2][None, :], -1.0, 1.0)
        ang = jnp.arccos(proj)
        row = (comp * tables.max_entries + pf_idx) * tables.n_forward_steps
        pos = ang / PI
        pf_val = _table_lookup(tables.forward, row[:, None], pos,
                               tables.n_forward_steps)
        if config.use_hybrid_phase_funs and config.num_orders_orig_phase_fun > 0:
            pf_orig = _table_lookup(tables.forward_orig, row[:, None], pos,
                                    tables.n_forward_steps)
            pf_val = jnp.where(
                (order <= config.num_orders_orig_phase_fun)[:, None],
                pf_orig, pf_val)
        norm_pf = pf_val / (4.0 * PI * intensity.abs_mu[None, :])
        if surface_detector_pf is not None:
            norm_pf = jnp.where(is_surface[:, None],
                                surface_detector_pf(px, py, uz,
                                                    jnp.arctan2(uy, ux)),
                                norm_pf)
        else:
            norm_pf = jnp.where(is_surface[:, None], 1.0 / PI, norm_pf)

        if config.use_russian_roulette_for_intensity:
            u_free, u_accept = (jax.random.uniform(kk, (L, D),
                                                   dtype=jnp.float32)
                                for kk in jax.random.split(key, 2))
            tau_free = exponential_deviate(u_free)
            small = PI * norm_pf <= config.zeta_min
            tau_max = -jnp.log(config.zeta_min
                               / jnp.maximum(PI * norm_pf, TINY))
            accept_small = u_accept <= PI * norm_pf / config.zeta_min
            emit_slot = emit[:, None] & (~small | accept_small)
            target = jnp.where(small, tau_free, tau_max + tau_free)
            pfw_exp = jnp.where(small, 0.0, weight[:, None] * norm_pf)
            pfw_flat = jnp.broadcast_to(
                weight[:, None] * jnp.float32(config.zeta_min / PI), (L, D))
            taumax = jnp.where(small, -1.0, tau_max)
        else:
            emit_slot = jnp.broadcast_to(emit[:, None], (L, D))
            target = jnp.full((L, D), _BIG_TAU)
            pfw_exp = weight[:, None] * norm_pf
            pfw_flat = jnp.zeros((L, D), jnp.float32)
            taumax = jnp.full((L, D), _BIG_TAU)

        def put(name, new2d):
            old = rays[name].reshape(L, D)
            rays[name] = jnp.where(emit[:, None], new2d,
                                   old).reshape(LD).astype(rays[name].dtype)

        put("status", jnp.where(emit_slot, TRACING, RAY_DONE))
        for name, src in (("px", px), ("py", py), ("pz", pz)):
            put(name, src[:, None])
        put("ix", geom.locate_x(px)[:, None])
        put("iy", geom.locate_y(py)[:, None])
        put("iz", geom.locate_z(pz)[:, None])
        put("tau", jnp.zeros((1, 1), jnp.float32))
        put("nc", jnp.zeros((1, 1), jnp.int32))
        put("target", target)
        put("taumax", taumax)
        put("pfw_exp", pfw_exp)
        put("pfw_flat", pfw_flat)
        comp_slot = jnp.where(is_surface, 0, comp + 1)  # component 0 = surface
        rays["cslot"] = jnp.where(emit, comp_slot, rays["cslot"])
        return rays

    def intensity_ray_advance(opt, rays):
        """Advance every armed ray by up to ray_steps cell crossings."""
        stepper = make_crossing_stepper(
            geom, opt.total_ext, dxs_t, dys_t, dzs_t,
            cell_matrix=opt.cell_matrix if optics.use_onehot else None)
        rstate = (rays["px"], rays["py"], rays["pz"],
                  rays["ix"], rays["iy"], rays["iz"],
                  rays["tau"], rays["status"])
        live0 = rays["status"] == TRACING
        always = jnp.ones((LD,), bool)
        for _ in range(ray_steps):
            rstate = stepper(rstate, rays["target"], always)
        (rays["px"], rays["py"], rays["pz"], rays["ix"], rays["iy"],
         rays["iz"], rays["tau"], status) = rstate
        # Crossing budget (grazing rays): counted in blocks of ray_steps.
        nc = rays["nc"] + jnp.where(live0, ray_steps, 0)
        status = jnp.where((status == TRACING) & (nc > max_int_crossings),
                           BAD, status)
        rays["nc"] = nc
        rays["status"] = status
        return rays

    def intensity_drain(rays, tallies):
        """Tally completed rays and free their slots."""
        status = rays["status"]
        fin = status > TRACING          # SCATTER / EXIT_* / BAD
        esc = fin & (status == exit_status_t)
        tau = rays["tau"]
        contrib = jnp.where(
            esc,
            jnp.where(tau <= rays["taumax"],
                      rays["pfw_exp"] * jnp.exp(-jnp.minimum(tau, 80.0)),
                      rays["pfw_flat"]),
            0.0)
        cslot_t = jnp.broadcast_to(rays["cslot"][:, None],
                                   (L, n_dirs)).reshape(LD)
        if config.limit_intensity_contributions:
            over = jnp.maximum(contrib - config.max_intensity_contribution,
                               0.0)
            contrib = jnp.minimum(contrib, config.max_intensity_contribution)
            ex_idx = d_idx_t * (n_comp + 1) + cslot_t
            tallies["intensity_excess"] = tally_add(
                tallies["intensity_excess"], ex_idx, over)
        col_f = rays["ix"] * n_y + rays["iy"]
        int_idx = col_f * n_dirs + d_idx_t
        tallies["intensity"] = tally_add(tallies["intensity"], int_idx,
                                         contrib)
        byc_idx = int_idx * (n_comp + 1) + cslot_t
        tallies["intensity_by_component"] = tally_add(
            tallies["intensity_by_component"], byc_idx, contrib)
        rays["status"] = jnp.where(fin, RAY_DONE, status)
        return rays, tallies

    def event_step(opt, key, source, k, state):
        if use_queued:
            *core, qs, tallies = state
        else:
            *core, tallies = state
            qs = None
        if use_rt:
            (alive, launched, x, y, z, ux, uy, uz, w, ix, iy, iz, order) = core
        else:
            # Cell indices are recomputed from positions each event in the
            # Woodcock / max cross-section modes, so they stay out of the
            # loop carry (3 fewer arrays to mask and spill per iteration).
            (alive, launched, x, y, z, ux, uy, uz, w, order) = core
            ix = iy = iz = None

        if use_queued:
            qs = dict(qs)
            rays = dict(qs["rays"])
            pend = qs["pend"]
            rays_free = ~jnp.any((rays["status"] == TRACING).reshape(L, n_dirs),
                                 axis=1)
            # Frozen lanes whose rays just drained resolve this event; lanes
            # still waiting skip transport entirely.  (pend lanes are alive,
            # so the refill below never touches them.)
            release = alive & pend & rays_free

        # Static one-component specializations (meta fields of the optics
        # pytree, so spectral overrides recompile as needed): uniform ssa and
        # phase table shrink the fused read to the extinction column and
        # delete the component pick; ssa == 1 also drops the absorbed tally.
        uniform1 = (opt.n_components == 1
                    and opt.uniform_ssa is not None
                    and opt.uniform_phase_index is not None)
        conservative = uniform1 and opt.uniform_ssa == 1.0
        # Weight-based roulette can only ever fire if some mechanism reduces
        # photon weight below 1 (absorption, a reflecting surface, or the
        # intensity estimator's weight handling).
        rr_active = config.use_russian_roulette and not (
            conservative and black_surface and not compute_intensity)

        ek = jax.random.fold_in(key, k)
        ks = jax.random.split(ek, 3)
        # One hardware-RNG pass supplies every per-lane deviate this compiled
        # configuration can consume; rows for statically-dead branches
        # (black surface, uniform optics, inactive roulette) are not drawn.
        names = ["tau", "scat", "chi"]
        if not use_rt:
            names.append("accept")
        if not black_surface:
            names += ["srf_mu", "srf_phi"]
        if not uniform1:
            names.append("comp")
        if rr_active:
            names.append("rr")
        u = jax.random.uniform(ks[0], (len(names), L), dtype=jnp.float32)
        d = {n: u[i] for i, n in enumerate(names)}
        u_tau, u_scat, u_chi = d["tau"], d["scat"], d["chi"]
        u_accept = d.get("accept")
        u_srf_mu, u_srf_phi = d.get("srf_mu"), d.get("srf_phi")
        u_comp, u_rr = d.get("comp"), d.get("rr")
        k_int, k_refill = ks[1], ks[2]

        # --- persistent-photon refill of dead lanes -------------------------
        if n_photons > L:
            dead = ~alive
            dead_i = dead.astype(jnp.int32)
            new_id = launched + jnp.cumsum(dead_i) - dead_i
            refill = dead & (new_id < n_photons)
            fresh = source.sample(k_refill, L)
            x = jnp.where(refill, geom.x0 + fresh.x * (geom.x_max - geom.x0), x)
            y = jnp.where(refill, geom.y0 + fresh.y * (geom.y_max - geom.y0), y)
            z = jnp.where(refill, geom.z0 + fresh.z * (geom.z_max - geom.z0), z)
            fux, fuy, fuz = make_direction_cosines(fresh.mu, fresh.phi)
            ux = jnp.where(refill, fux, ux)
            uy = jnp.where(refill, fuy, uy)
            uz = jnp.where(refill, fuz, uz)
            w = jnp.where(refill, 1.0, w)
            order = jnp.where(refill, 0, order)
            if use_rt:
                ix = jnp.where(refill, geom.locate_x(x), ix)
                iy = jnp.where(refill, geom.locate_y(y), iy)
                iz = jnp.where(refill, geom.locate_z(z), iz)
            launched = launched + jnp.sum(refill.astype(jnp.int32))
            alive = alive | refill

        # Lanes that transport this event (must be bound AFTER the refill
        # extends ``alive``): queued-radiance pend lanes sit out.
        active = (alive & ~pend) if use_queued else alive

        tau = exponential_deviate(u_tau)
        inv_max_ext = 1.0 / jnp.maximum(opt.max_extinction, 1e-30)

        if use_rt:
            # Ray tracing: travel until tau extinction accumulates (:481-487).
            (rx, ry, rz, rix, riy, riz, _tau_acc, status) = trace_extinction(
                geom, opt.total_ext, x, y, z, ix, iy, iz, ux, uy, uz,
                tau, active, max_crossings,
                cell_matrix=opt.cell_matrix if optics.use_onehot else None)
            exit_top = active & (status == EXIT_TOP)
            exit_bot = active & (status == EXIT_BOT)
            collide = active & (status == SCATTER)
            bad = active & (status == BAD)
        elif use_woodcock:
            # Tentative collision by DDA over the block-majorant grid.
            cbx = coarse_geom.locate_x(x)
            cby = coarse_geom.locate_y(y)
            cbz = coarse_geom.locate_z(z)
            (rx, ry, rz, fbx, fby, fbz, _tau_acc, status) = trace_extinction(
                coarse_geom, opt.block_majorant, x, y, z, cbx, cby, cbz,
                ux, uy, uz, tau, active, max_block_crossings,
                cell_matrix=opt.block_majorant[:, None])
            exit_top = active & (status == EXIT_TOP)
            exit_bot = active & (status == EXIT_BOT)
            collide = active & (status == SCATTER)
            bad = active & (status == BAD)
            rix = geom.locate_x(rx)
            riy = geom.locate_y(ry)
            riz = geom.locate_z(rz)
            block_flat = (fbx * coarse_geom.n_y + fby) * coarse_geom.n_z + fbz
            from i3rc_tpu.ops.gather import read_rows as _rr

            maj_here = _rr(opt.block_majorant[:, None], block_flat)[:, 0]
            inv_maj = 1.0 / jnp.maximum(maj_here, 1e-30)
        else:
            # Maximum cross-section jump (:492-497).
            s = tau * inv_max_ext
            px = x + ux * s
            py = y + uy * s
            pz = z + uz * s
            exit_top = active & (pz >= geom.z_max)
            exit_bot = active & ~exit_top & (pz <= geom.z0)
            collide = active & ~exit_top & ~exit_bot
            # Trace back to the boundary plane for the tally column (:504-527).
            safe_uz = jnp.where(jnp.abs(uz) > 1e-30, uz, 1.0)
            bt = jnp.where(exit_top, (pz - geom.z_max) / safe_uz,
                           (pz - geom.z0) / safe_uz)
            bt = jnp.abs(bt)
            hit_boundary = exit_top | exit_bot
            rx = geom.wrap_x(jnp.where(hit_boundary, px - ux * bt, px))
            ry = geom.wrap_y(jnp.where(hit_boundary, py - uy * bt, py))
            rz = jnp.where(exit_top, geom.z_max, jnp.where(exit_bot, geom.z0, pz))
            rix = geom.locate_x(rx)
            riy = geom.locate_y(ry)
            riz = geom.locate_z(rz)
            bad = jnp.zeros_like(alive)

        flat_cell = (rix * n_y + riy) * n_z + riz

        # --- one fused read of all per-cell optics --------------------------
        if uniform1:
            if optics.use_onehot:
                cell_ext = read_rows(opt.cell_matrix[:, :1], flat_cell)[:, 0]
            else:
                # 1-D gather of the flat extinction (no (R, 1) slice copy).
                cell_ext = opt.total_ext[flat_cell]
        else:
            cell = read_cell_data(opt, flat_cell)      # (L, 1 + 3*ncomp)
            cell_ext = cell[:, 0]
            cum = cell[:, 1:1 + n_comp]
            coalb_cols = cell[:, 1 + n_comp:1 + 2 * n_comp]   # 1 - ssa
            pfi_cols = cell[:, 1 + 2 * n_comp:1 + 3 * n_comp]

        if use_rt:
            physical = collide  # every ray-traced collision is physical
        elif use_woodcock:
            physical = collide & (u_accept < cell_ext * inv_maj)
        else:
            # Physical vs mathematical collision (:586-588) — cell re-located
            # at the new position (the reference reuses stale indices here).
            physical = collide & (u_accept < cell_ext * inv_max_ext)

        # --- surface reflection (:515-580) ----------------------------------
        if black_surface:
            # Static specialization: a zero-albedo Lambertian surface absorbs
            # every photon, so the reflection trig (sqrt/atan2/sincos per lane
            # per event) is dropped from the compiled loop entirely.
            w_srf = jnp.zeros_like(w)
            surf_alive = jnp.zeros_like(exit_bot)
            sux, suy, suz = ux, uy, uz
        else:
            new_mu_s = jnp.maximum(jnp.sqrt(u_srf_mu), _MIN_MU)  # mu = sqrt(u) (:547)
            new_phi_s = 2.0 * PI * u_srf_phi
            phi_in = jnp.arctan2(uy, ux)
            refl = surface_reflectance(rx, ry, uz, new_mu_s, phi_in, new_phi_s)
            w_srf = w * refl
            surf_alive = exit_bot & (w_srf > TINY)
            sux, suy, suz = make_direction_cosines(new_mu_s, new_phi_s)

        # --- physical collision: component pick + absorption (:634-649) -----
        if uniform1:
            comp = jnp.zeros(L, jnp.int32)
            coalb_v = jnp.full((L,), 1.0 - opt.uniform_ssa, jnp.float32)
            pf_idx = jnp.full((L,), opt.uniform_phase_index, jnp.int32)
        else:
            comp = jnp.sum((u_comp[:, None] >= cum).astype(jnp.int32), axis=1)
            comp = jnp.clip(comp, 0, n_comp - 1)
            if n_comp == 1:
                coalb_v = coalb_cols[:, 0]
                pf_idx = pfi_cols[:, 0].astype(jnp.int32)
            else:
                sel = jax.nn.one_hot(comp, n_comp, dtype=jnp.float32)
                coalb_v = jnp.sum(coalb_cols * sel, axis=1)
                pf_idx = jnp.sum(pfi_cols * sel, axis=1).astype(jnp.int32)
        absorbed = w * coalb_v
        w_sc = w * (1.0 - coalb_v)
        order_next = order + (physical | exit_bot).astype(jnp.int32)

        # --- all tallies in one fused transpose-matmul ------------------------
        # Keyed on cells when volume absorption is tallied, else on columns
        # (much narrower one-hot; flux fields only need the column).
        if optics.use_onehot and config.compute_volume_absorption:
            tally_vals = jnp.stack([
                jnp.where(exit_top, w, 0.0),
                jnp.where(exit_bot, w, 0.0),
                jnp.where(physical, absorbed, 0.0),
                jnp.where(physical, absorbed, 0.0),
            ], axis=1)
            tallies["cells"] = tally_multi(tallies["cells"], flat_cell, tally_vals)
        elif col_onehot:
            tally_cols = [jnp.where(exit_top, w, 0.0),
                          jnp.where(exit_bot, w, 0.0)]
            if not conservative:     # ssa == 1 -> absorbed is identically 0
                tally_cols.append(jnp.where(physical, absorbed, 0.0))
            col = rix * n_y + riy
            tallies["columns"] = tally_multi(tallies["columns"], col,
                                             jnp.stack(tally_cols, axis=1))
            if config.compute_volume_absorption and not optics.use_onehot:
                # Per-cell absorption on a serial-gather domain: the cell
                # key space is too tall for the one-hot, scatter-add it.
                tallies["volume_absorption"] = tally_add(
                    tallies["volume_absorption"], flat_cell, absorbed, physical)
        else:
            col = rix * n_y + riy
            tallies["flux_up"] = tally_add(tallies["flux_up"], col, w, exit_top)
            tallies["flux_down"] = tally_add(tallies["flux_down"], col, w, exit_bot)
            tallies["flux_absorbed"] = tally_add(tallies["flux_absorbed"], col,
                                                 absorbed, physical)
            if config.compute_volume_absorption:
                tallies["volume_absorption"] = tally_add(
                    tallies["volume_absorption"], flat_cell, absorbed, physical)

        math_move = (collide & ~physical) if not use_rt else jnp.zeros_like(alive)

        if use_queued:
            # --- queued local estimation: emit / defer / resolve -------------
            # This event's new estimation events (physical collisions and
            # live surface reflections) emit their D shadow rays NOW if the
            # lane's slots are free, else the lane freezes (pend) with its
            # record fields until the slots drain; frozen lanes released
            # this event resolve with this event's deviates.  Exactly the
            # inline estimator's expectations, at full ray occupancy.
            want_surf = (jnp.zeros_like(exit_bot) if black_surface
                         else exit_bot)
            want = physical | want_surf
            emit_now = want & rays_free
            defer = want & ~rays_free
            is_surf_eff = jnp.where(release, qs["pend_surf"], want_surf)
            comp_eff = jnp.where(release, qs["pend_comp"], comp)
            pf_eff = jnp.where(release, qs["pend_pf"], pf_idx)
            px_eff = jnp.where(release, x, rx)
            py_eff = jnp.where(release, y, ry)
            pz_eff = jnp.where(release, z, rz)
            resolve = emit_now | release
            res_surf = resolve & is_surf_eff
            res_phys = resolve & ~is_surf_eff

            # Surface resolution: BRDF/albedo with the FROZEN incoming
            # direction and THIS event's outgoing draw (:556-563); the
            # record weight is the post-reflection weight (:565-580).
            if black_surface:
                w_srf_eff = jnp.zeros_like(w)
                surf_alive_eff = jnp.zeros_like(res_surf)
            else:
                refl_eff = surface_reflectance(px_eff, py_eff, uz, new_mu_s,
                                               jnp.arctan2(uy, ux), new_phi_s)
                w_srf_eff = w * refl_eff
                surf_alive_eff = res_surf & (w_srf_eff > TINY)

            # BRDF surfaces record the PRE-reflection weight: the per-
            # detector reflectance rides norm_pf (surface_detector_pf).
            w_surf_rec = w if surface_detector_pf is not None else w_srf_eff
            w_rec = jnp.where(is_surf_eff, w_surf_rec,
                              jnp.where(release, w, w_sc))
            # BRDF mode fires the estimate on EVERY surface hit: the sampled
            # direction's reflectance may be 0 (clamped kernels) while the
            # detector direction's is not.
            emit = (resolve if surface_detector_pf is not None
                    else resolve & (~is_surf_eff | (w_srf_eff > TINY)))
            rays = intensity_emission(opt, k_int, emit, is_surf_eff,
                                      px_eff, py_eff, pz_eff, ux, uy, uz,
                                      w_rec, comp_eff, pf_eff, order_next,
                                      rays)

            # --- Russian roulette at resolution (:673-679) -------------------
            w_res = jnp.where(release, w, w_sc)
            if rr_active:
                rr_w = config.russian_roulette_w
                do_rr = res_phys & (w_res < rr_w / 2.0)
                killed = do_rr & (u_rr >= w_res / rr_w)
                w_res = jnp.where(do_rr, jnp.where(killed, 0.0, rr_w), w_res)
            scat_alive = res_phys & (w_res > TINY)

            # --- scattering angle + rotation (:682-688) ----------------------
            cos_scat = sample_cos_scat(comp_eff, pf_eff, u_scat)
            nux, nuy, nuz = rotate_direction(ux, uy, uz, cos_scat, u_chi)

            over_budget = ((scat_alive | surf_alive_eff)
                           & (order_next >= config.max_events))
            bad = bad | over_budget

            # --- commit ------------------------------------------------------
            move_now = want | math_move        # transported lanes that stopped
            x = jnp.where(move_now, rx, x)
            y = jnp.where(move_now, ry, y)
            z = jnp.where(move_now, rz, z)
            if use_rt:
                ix = jnp.where(move_now, rix, ix)
                iy = jnp.where(move_now, riy, iy)
                iz = jnp.where(res_surf, 0, jnp.where(move_now, riz, iz))
            ux = jnp.where(scat_alive, nux,
                           jnp.where(surf_alive_eff, sux, ux))
            uy = jnp.where(scat_alive, nuy,
                           jnp.where(surf_alive_eff, suy, uy))
            uz = jnp.where(scat_alive, nuz,
                           jnp.where(surf_alive_eff, suz, uz))
            w = jnp.where(res_phys, w_res, w)
            w = jnp.where(res_surf, w_srf_eff, w)
            w = jnp.where(defer & physical, w_sc, w)  # freeze post-absorption
            order = order_next
            held = alive & pend & ~release
            alive = (scat_alive | surf_alive_eff | math_move | defer
                     | held) & ~over_budget
            qs["pend"] = defer | held
            qs["pend_surf"] = jnp.where(defer, want_surf,
                                        qs["pend_surf"] & (pend & ~release))
            qs["pend_comp"] = jnp.where(defer, comp, qs["pend_comp"])
            qs["pend_pf"] = jnp.where(defer, pf_idx, qs["pend_pf"])

            # --- advance + drain the persistent rays -------------------------
            rays = intensity_ray_advance(opt, rays)
            rays, tallies = intensity_drain(rays, tallies)
            qs["rays"] = rays
        else:
            # --- local-estimate radiance, inline (:565-580, :652-668) --------
            if compute_intensity:
                # BRDF mode: every surface hit estimates (see queued emit).
                any_event = physical | (exit_bot if surface_detector_pf
                                        is not None else surf_alive)
                w_surf_ev = w if surface_detector_pf is not None else w_srf
                w_event = jnp.where(exit_bot, w_surf_ev, w_sc)
                tallies = intensity_contribution(
                    opt, k_int, any_event, exit_bot, rx, ry, rz, rix, riy,
                    riz, ux, uy, uz, w_event, comp, pf_idx, order_next,
                    tallies)

            # --- Russian roulette (:673-679) ---------------------------------
            if rr_active:
                rr_w = config.russian_roulette_w
                do_rr = physical & (w_sc < rr_w / 2.0)
                killed = do_rr & (u_rr >= w_sc / rr_w)
                w_sc = jnp.where(do_rr, jnp.where(killed, 0.0, rr_w), w_sc)
            scat_alive = physical & (w_sc > TINY)

            # --- scattering angle + rotation (:682-688) ----------------------
            cos_scat = sample_cos_scat(comp, pf_idx, u_scat)
            nux, nuy, nuz = rotate_direction(ux, uy, uz, cos_scat, u_chi)

            # --- per-photon event budget (TPU bad-photon guard) --------------
            over_budget = (scat_alive | surf_alive) & (order_next >= config.max_events)
            bad = bad | over_budget

            # --- commit per-lane updates -------------------------------------
            moved = scat_alive | surf_alive | math_move
            x = jnp.where(moved, rx, x)
            y = jnp.where(moved, ry, y)
            z = jnp.where(surf_alive, geom.z0, jnp.where(moved, rz, z))
            if use_rt:
                ix = jnp.where(moved, rix, ix)
                iy = jnp.where(moved, riy, iy)
                iz = jnp.where(surf_alive, 0, jnp.where(moved, riz, iz))
            ux = jnp.where(scat_alive, nux, jnp.where(surf_alive, sux, ux))
            uy = jnp.where(scat_alive, nuy, jnp.where(surf_alive, suy, uy))
            uz = jnp.where(scat_alive, nuz, jnp.where(surf_alive, suz, uz))
            w = jnp.where(physical, w_sc, jnp.where(exit_bot, w_srf, w))
            order = order_next
            alive = (scat_alive | surf_alive | math_move) & ~over_budget

        tallies["n_bad"] = tallies["n_bad"] + jnp.sum(bad).astype(jnp.int32)
        tallies["n_lane_events"] = tallies["n_lane_events"] + jnp.sum(
            (exit_top | exit_bot | collide).astype(jnp.float32))
        if use_rt:
            core = (alive, launched, x, y, z, ux, uy, uz, w, ix, iy, iz, order)
        else:
            core = (alive, launched, x, y, z, ux, uy, uz, w, order)
        if use_queued:
            return core + (qs, tallies)
        return core + (tallies,)

    def trace(key, batch, source=None, optics_override=None):
        opt = optics if optics_override is None else optics_override
        assert opt.n_components == n_comp, "optics override must keep shape"
        # Scale normalized entry positions to the domain (:464-466).
        x = geom.x0 + batch.x * (geom.x_max - geom.x0)
        y = geom.y0 + batch.y * (geom.y_max - geom.y0)
        z = geom.z0 + batch.z * (geom.z_max - geom.z0)
        ux, uy, uz = make_direction_cosines(batch.mu, batch.phi)
        if use_rt:
            ix = geom.locate_x(x)
            iy = geom.locate_y(y)
            iz = geom.locate_z(z)
        w = jnp.ones(L, dtype=jnp.float32)
        order = jnp.zeros(L, dtype=jnp.int32)
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        alive = lane_ids < n_photons
        launched = jnp.int32(min(L, n_photons))
        tallies = {
            "n_bad": jnp.zeros((), jnp.int32),
            "n_lane_events": jnp.zeros((), jnp.float32),
            "intensity": jnp.zeros(n_x * n_y * n_dirs if compute_intensity else 0,
                                   jnp.float32),
            "intensity_by_component": jnp.zeros(
                n_x * n_y * n_dirs * (n_comp + 1) if compute_intensity else 0,
                jnp.float32),
            "intensity_excess": jnp.zeros(
                n_dirs * (n_comp + 1) if compute_intensity else 0, jnp.float32),
        }
        # Mirrors event_step's static specialization flags (same expressions).
        conservative = (opt.n_components == 1
                        and opt.uniform_ssa == 1.0
                        and opt.uniform_phase_index is not None)
        if optics.use_onehot and config.compute_volume_absorption:
            tallies["cells"] = jnp.zeros((n_cells, 4), jnp.float32)
        elif col_onehot:
            tallies["columns"] = jnp.zeros((n_x * n_y, 2 if conservative else 3),
                                           jnp.float32)
            if config.compute_volume_absorption and not optics.use_onehot:
                tallies["volume_absorption"] = jnp.zeros(n_x * n_y * n_z,
                                                         jnp.float32)
        else:
            tallies["flux_up"] = jnp.zeros(n_x * n_y, jnp.float32)
            tallies["flux_down"] = jnp.zeros(n_x * n_y, jnp.float32)
            tallies["flux_absorbed"] = jnp.zeros(n_x * n_y, jnp.float32)
            if config.compute_volume_absorption:
                tallies["volume_absorption"] = jnp.zeros(n_x * n_y * n_z, jnp.float32)

        def cond(carry):
            k, state = carry
            alive_, launched_ = state[0], state[1]
            busy = jnp.any(alive_) | (launched_ < n_photons)
            if use_queued:
                # Persistent rays may outlive their photons — drain them.
                busy = busy | jnp.any(state[-2]["rays"]["status"] == TRACING)
            return busy & (k < max_iters)

        def body(carry):
            k, state = carry
            return k + 1, event_step(opt, key, source, k, state)

        if use_rt:
            core = (alive, launched, x, y, z, ux, uy, uz, w, ix, iy, iz,
                    order)
        else:
            core = (alive, launched, x, y, z, ux, uy, uz, w, order)
        if use_queued:
            zeros_ld_f = jnp.zeros(LD, jnp.float32)
            zeros_ld_i = jnp.zeros(LD, jnp.int32)
            qs0 = {
                "pend": jnp.zeros(L, bool),
                "pend_surf": jnp.zeros(L, bool),
                "pend_comp": jnp.zeros(L, jnp.int32),
                "pend_pf": jnp.zeros(L, jnp.int32),
                "rays": {
                    "status": jnp.full(LD, RAY_DONE, jnp.int32),
                    "px": zeros_ld_f, "py": zeros_ld_f, "pz": zeros_ld_f,
                    "ix": zeros_ld_i, "iy": zeros_ld_i, "iz": zeros_ld_i,
                    "tau": zeros_ld_f, "nc": zeros_ld_i,
                    "target": zeros_ld_f, "taumax": zeros_ld_f,
                    "pfw_exp": zeros_ld_f, "pfw_flat": zeros_ld_f,
                    "cslot": jnp.zeros(L, jnp.int32),
                },
            }
            state = core + (qs0, tallies)
        else:
            state = core + (tallies,)
        k_final, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        alive = state[0]
        tallies = state[-1]
        # Lanes alive at the iteration cap vanish with their weight: count bad.
        n_bad = tallies["n_bad"] + jnp.sum(alive).astype(jnp.int32)

        if optics.use_onehot and config.compute_volume_absorption:
            cells = tallies["cells"].reshape(n_x * n_y, n_z, 4)
            flux_up = jnp.sum(cells[:, :, 0], axis=1)
            flux_down = jnp.sum(cells[:, :, 1], axis=1)
            flux_absorbed = jnp.sum(cells[:, :, 2], axis=1)
            volume_absorption = cells[:, :, 3].reshape(n_x * n_y * n_z)
        elif col_onehot:
            flux_up = tallies["columns"][:, 0]
            flux_down = tallies["columns"][:, 1]
            flux_absorbed = (jnp.zeros(n_x * n_y, jnp.float32) if conservative
                             else tallies["columns"][:, 2])
            volume_absorption = tallies.get(
                "volume_absorption", jnp.zeros(n_x * n_y * n_z, jnp.float32))
        else:
            flux_up = tallies["flux_up"]
            flux_down = tallies["flux_down"]
            flux_absorbed = tallies["flux_absorbed"]
            volume_absorption = tallies.get(
                "volume_absorption", jnp.zeros(n_x * n_y * n_z, jnp.float32))

        return RawTallies(
            flux_up=flux_up, flux_down=flux_down, flux_absorbed=flux_absorbed,
            volume_absorption=volume_absorption,
            intensity=tallies["intensity"],
            intensity_by_component=tallies["intensity_by_component"],
            intensity_excess=tallies["intensity_excess"],
            n_photons=jnp.int32(n_photons), n_bad=n_bad,
            n_iterations=k_final, n_lane_events=tallies["n_lane_events"])

    return trace
