"""Sharded-domain tracing: domain decomposition with photon migration (ICI).

BEYOND the reference's capability set.  The reference replicates the full
domain on every rank (Example-Drivers/monteCarloDriver.f95:159) and its own
wishlist flags the memory cost (Wishlist.txt:43-49).  Here the domain is
DECOMPOSED along x across the devices of a mesh: each device holds only its
x-slab of the per-cell optics, photons are traced locally, and a photon
crossing a slab boundary migrates to the neighbor device through
jax.lax.ppermute — on real hardware that collective rides the ICI links.

Representation (round 4 — generalized from the round-3 single-component
tracer): the GENERAL MULTI-COMPONENT voxel slab — per cell, total
extinction plus per-component cumulative extinction fractions,
single-scattering albedos, and phase-table rows (the
getOpticalPropertiesByComponent flattening, opticalProperties.f95:429-539)
— with ARBITRARY phase functions: scattering samples the same
piecewise-cubic mu(p) inverse-CDF fit as the replicated kernels
(tables.build_inverse_cubic), so Mie cloud + aerosol + Rayleigh scenes
shard.  The (small) cubic tables are replicated per shard; only the
per-cell matrix is decomposed.  Black or reflecting Lambertian surface.
Transport is maximum cross-section (the reference's :492-497 alternative):
free flights are memoryless in DISTANCE under the global majorant, so a
flight that would leave the slab simply stops at the boundary and migrates
carrying its remaining optical depth — no ray data beyond the local slab
is ever needed.  Collisions pick their component by cumulative-extinction
inversion (the findIndex pick, monteCarloRadiativeTransfer.f95:637-638)
from one factored one-hot read of the local (nx_loc*ny*nz, 1+3C) matrix;
absorption is Bernoulli survival (the fastpath's estimator); bottom hits
Bernoulli-revive with a Lambertian draw when the surface reflects.

Migration is lossless: each block, every shard tells its upstream neighbor
how much inbox space it has (a scalar ppermute in the reverse direction)
and senders pack at most that many photons — unsent migrants keep their
tag and retry next block, so nothing is ever dropped (the round-2
prototype counted inbox overflow in n_bad instead).

Radiance detectors (round 3, late): local estimation with MIGRATING shadow
rays.  At every physical collision the photon freezes (``pend``) with its
per-detector prefactors w*ssa_c*P_c(cos Theta)/(4 pi |mu_d|) — the exact
estimator of computeIntensityContribution
(monteCarloRadiativeTransfer.f95:1419-1510) under this tracer's
weight-1/Bernoulli scheme, with the picked component's phase VALUE read
from the replicated log-cubic forward fit (tables.build_forward_cubic) —
until the shard's shadow-ray pool has D free slots; reflecting-surface
hits emit A/pi toward upward detectors the same way (:1473-1480).  Shadow rays accumulate the EXACT line integral of
extinction cell by cell (the :1512-1535 trace), and a ray reaching its
slab's x face migrates to the neighbor shard carrying its accumulated tau
— the same receiver-granted ppermute scheme as photons — so transmittance
traces cross the decomposition without any shard ever holding remote
optics.  Escaping rays tally w*exp(-tau) at their exit column.  The
photon-freeze backpressure is the queued-radiance design of the replicated
general kernel (integrators/wavefront.py), adapted to a shared pool.

Volume absorption (``compute_volume_absorption=True``): Bernoulli deaths
tally into their exact local cell at flush time, giving the per-cell
heating-rate field on sharded domains.

Per-device memory is the point: a shard stores nx/n_dev of the cell matrix
(asserted in tests), so the tractable domain size scales linearly with the
mesh.  Total migration count is returned for observability (the multichip
dryrun prints it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from i3rc_tpu.core.optics import flatten_optics
from i3rc_tpu.core.rng import exponential_deviate
from i3rc_tpu.integrators.tables import build_forward_cubic, build_inverse_cubic
from i3rc_tpu.integrators.wavefront import (
    RawTallies,
    _sincos_2pi,
    make_direction_cosines,
    rotate_direction,
)
from i3rc_tpu.ops.dda import GridGeometry
from i3rc_tpu.ops.gather import read_rows
from i3rc_tpu.ops.tally import tally_add, tally_multi


def shardable(domain, mesh: Mesh) -> bool:
    """Is this domain expressible by the sharded general-slab tracer?

    Multi-component optics with arbitrary (tabulated or Legendre) phase
    functions on a regular grid whose x extent divides the mesh; any 3-D
    extinction/ssa fields, any Lambertian surface albedo.  (Scattering
    samples the replicated piecewise-cubic inverse-CDF fits, so no phase-
    function class restricts sharding.)
    """
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    if not (domain.xy_regularly_spaced and domain.z_regularly_spaced):
        return False
    return flat.total_ext.shape[0] % n_dev == 0


def trace_sharded(domain, source, n_photons: int, mesh: Mesh,
                  n_lanes_per_shard: int = 1 << 14, max_events: int = 500,
                  unroll: int = 8, seed_key=None,
                  surface_albedo: float = 0.0,
                  intensity_mus=None, intensity_phis=None,
                  compute_volume_absorption: bool = False) -> RawTallies:
    """Trace n_photons over an x-decomposed domain on the mesh.

    Returns a RawTallies with global (n_x*n_y,) flux columns (weight sums;
    normalize with integrators.results.normalize_tallies as usual), plus —
    when requested — the (n_x*n_y*n_z,) volume-absorption field and the
    (n_x*n_y*D,) local-estimate radiance field for D detector directions
    (``intensity_mus`` in cosine, ``intensity_phis`` in degrees, the
    Integrator.create convention).  ``n_lane_events`` carries the TOTAL
    MIGRATION COUNT (photon + shadow-ray hops across slab boundaries) — the
    observability hook for the multichip dryrun.

    With detectors, ``n_bad`` additionally counts shadow rays still in
    flight when the block budget ran out (undelivered radiance
    contributions), so the photon-conservation identity
    ``sum(flux) + n_bad == n_photons`` holds only for D == 0 runs.
    """
    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    geom = GridGeometry.from_edges(domain.x_edges, domain.y_edges,
                                   domain.z_edges,
                                   domain.xy_regularly_spaced,
                                   domain.z_regularly_spaced)
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    assert n_x % n_dev == 0, "n_x must divide the mesh"
    nx_loc = n_x // n_dev
    C = flat.n_components
    n_cells = n_x * n_y * n_z
    # Per-cell [total_ext | cum_1..C | ssa_1..C | pf_row_1..C], x-major so
    # the leading axis shards cleanly.  pf_row is the entry's row index
    # into the REPLICATED cubic tables ((comp * max_entries + pf_idx) —
    # exact small ints in float32); the cumulative fractions drive the
    # component pick (opticalProperties.f95:429-539).
    ext3 = np.asarray(flat.total_ext, np.float32)
    inv_cub = build_inverse_cubic(flat)           # (C, max_e, n_seg, 4)
    max_entries = inv_cub.shape[1]
    n_seg = inv_cub.shape[2]
    comp_rows = (np.arange(C)[None, :] * max_entries
                 + np.asarray(flat.phase_index).reshape(n_cells, C))
    cellmat = np.concatenate([
        ext3.reshape(n_cells, 1),
        np.asarray(flat.cumulative_ext, np.float32).reshape(n_cells, C),
        np.asarray(flat.ssa, np.float32).reshape(n_cells, C),
        comp_rows.astype(np.float32),
    ], axis=1)
    cellmat = cellmat.reshape(n_dev, nx_loc * n_y * n_z, 1 + 3 * C)
    inv_cub_flat = inv_cub.reshape(C * max_entries * n_seg, 4)
    max_ext = float(ext3.max())
    assert max_ext > 0.0, "empty domain"
    inv_max_ext = np.float32(1.0 / max_ext)
    reflecting = float(surface_albedo) > 0.0
    vol_mode = bool(compute_volume_absorption)

    # Detector geometry (Integrator.create's convention: mu in cosine,
    # phi in degrees; direction = ray propagation direction).
    D = 0 if intensity_mus is None else len(np.atleast_1d(intensity_mus))
    if D:
        mus_d = np.asarray(intensity_mus, np.float64).ravel()
        phis_d = np.deg2rad(np.asarray(intensity_phis, np.float64).ravel())
        sin_d = np.sqrt(np.maximum(1.0 - mus_d ** 2, 0.0))
        det_dirs = np.stack([sin_d * np.cos(phis_d), sin_d * np.sin(phis_d),
                             mus_d]).astype(np.float32)          # (3, D)
        assert np.all(np.abs(mus_d) > 1e-6), "detector mu must be nonzero"
        inv_amu = (1.0 / (4.0 * np.pi * np.abs(mus_d))).astype(np.float32)
        # Surface (Lambertian) prefactor A/pi toward UPWARD detectors only
        # (reflected radiance has no downward component).
        surf_pf_np = np.where(mus_d > 0.0, surface_albedo / np.pi,
                              0.0).astype(np.float32)
        # Ray direction table, (D, 3); a ray's qdet = slot * D + d encodes
        # its by-component slot (0 = surface, 1 + comp = scatterer) with
        # its direction d, both surviving migration in one int field.
        det_tab_np = det_dirs.T.astype(np.float32)
        # Replicated log-cubic forward fits: the phase VALUE toward each
        # detector (tables.build_forward_cubic; the reference's forward-
        # table interpolation, monteCarloRadiativeTransfer.f95:1487-1509).
        fwd_cub = build_forward_cubic(flat)
        n_fwd_seg = fwd_cub.shape[2]
        fwd_cub_flat = fwd_cub.reshape(C * max_entries * n_fwd_seg, 4)

    L = int(n_lanes_per_shard)
    R = L                           # shadow-ray pool slots per shard
    CAP = max(128, L // 16)         # per-direction migration buffer slots
    RESERVE = 2 * CAP               # free-lane headroom kept for immigrants
    INBOX = 2 * CAP                 # carried per-direction inbox capacity
    K = int(unroll)
    per_shard_budget = -(-n_photons // n_dev)
    n_total = per_shard_budget * n_dev
    x0, y0, z0 = geom.x0, geom.y0, geom.z0
    x_max, y_max, z_max = geom.x_max, geom.y_max, geom.z_max
    inv_dx, inv_dy = 1.0 / geom.dx, 1.0 / geom.dy
    inv_dz = 1.0 / geom.dz
    shard_w = (x_max - x0) / n_dev
    nudge = np.float32(8 * 2.0 ** -23 * max(abs(x0), abs(x_max), abs(z_max)))
    max_blocks = -(-4 * max_events * (per_shard_budget // L + 2) // K)
    if D:
        # Shadow rays drain at ~K cells/block; budget the extra latency.
        max_blocks = 2 * max_blocks + 4 * (nx_loc + n_y + n_z) // K
    key = seed_key if seed_key is not None else jax.random.PRNGKey(0)
    n_draws = 7  # tau, accept, absorb, scatter, azimuth, surface, component

    def worker(local_cells):
        local_cells = local_cells[0]     # shard_map keeps the (1,) shard axis
        me = jax.lax.axis_index(axis)
        x_lo = x0 + shard_w * me.astype(jnp.float32)
        x_hi = x_lo + jnp.float32(shard_w)
        inv_cubic = jnp.asarray(inv_cub_flat)     # replicated mu(p) fits
        if D:
            det_tab = jnp.asarray(det_tab_np)                  # (D, 3)
            fwd_cubic = jnp.asarray(fwd_cub_flat)  # replicated log P fits
            inv_amu_t = jnp.asarray(inv_amu)                   # (D,)
            surf_pf_t = jnp.asarray(surf_pf_np)                # (D,)
            ddx = jnp.asarray(det_dirs[0])
            ddy = jnp.asarray(det_dirs[1])
            ddz = jnp.asarray(det_dirs[2])

        def sample_local(k):
            b = source.sample(k, L)
            # Equal-width slabs + an x-uniform source: confining each
            # shard's draws to its own slab IS the global distribution.
            return (x_lo + b.x * jnp.float32(shard_w),
                    y0 + b.y * (y_max - y0),
                    z0 + b.z * (z_max - z0)) + make_direction_cosines(b.mu, b.phi)

        def event(u, st):
            """One maximum-cross-section flight + tentative collision.

            The flight stops at the first of: the tentative collision
            (tau/max_ext), the z boundaries (exit), or the slab's x faces
            (migration, carrying the remaining optical depth — exact by
            the memorylessness of the homogenized free path, :492-497).
            Lanes frozen on a full shadow-ray pool (``pend``) sit out.
            """
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad,
             pend, pend_pf, pend_srf, pend_comp) = st
            act = alive & ~pend
            tau = jnp.where(tau > 0.0, tau, exponential_deviate(u[0]))
            big = jnp.float32(3e38)
            s_col = tau * inv_max_ext
            s_top = jnp.where(uz >= 2e-30, (jnp.float32(z_max) - z) / uz, big)
            s_bot = jnp.where(uz <= -2e-30, (jnp.float32(z0) - z) / uz, big)
            s_xhi = jnp.where(ux >= 2e-30, (x_hi - x) / ux, big)
            s_xlo = jnp.where(ux <= -2e-30, (x_lo - x) / ux, big)
            s_mig = jnp.minimum(s_xhi, s_xlo)
            s_exit = jnp.minimum(s_top, s_bot)
            adv = jnp.maximum(jnp.minimum(jnp.minimum(s_col, s_exit), s_mig),
                              0.0)
            collide = act & (s_col <= s_exit) & (s_col <= s_mig)
            leave = act & ~collide & (s_exit <= s_mig)
            migrate = act & ~collide & ~leave
            exit_top = leave & (s_top <= s_bot)
            exit_bot = leave & ~exit_top

            nx_p = x + ux * adv
            ny_p = y + uy * adv
            nz_p = z + uz * adv
            # Push migrants strictly past the slab face; wrap at the domain
            # edge (the ring ppermute maps edge shards to each other).
            nx_p = jnp.where(migrate,
                             jnp.where(s_xhi <= s_xlo, x_hi + nudge,
                                       x_lo - nudge), nx_p)
            wx = x_max - x0
            nx_p = jnp.where(nx_p >= x_max, nx_p - wx,
                             jnp.where(nx_p < x0, nx_p + wx, nx_p))
            wy = y_max - y0
            ny_p = jnp.where(ny_p >= y_max, ny_p - wy,
                             jnp.where(ny_p < y0, ny_p + wy, ny_p))
            nz_p = jnp.where(exit_top, jnp.float32(z_max),
                             jnp.where(exit_bot, jnp.float32(z0), nz_p))
            # Remaining optical depth carries across flights: consumed in
            # full at collisions, pro rata otherwise.  Dead lanes keep
            # their frozen positions (the flush reads the tally column
            # from them).
            tau = jnp.where(collide, 0.0,
                            jnp.where(act, tau - adv * jnp.float32(max_ext),
                                      tau))
            x = jnp.where(act, nx_p, x)
            y = jnp.where(act, ny_p, y)
            z = jnp.where(act, nz_p, z)

            # Physical-vs-null collision against the LOCAL cell read, then
            # the component pick by cumulative-extinction inversion
            # (findIndex, monteCarloRadiativeTransfer.f95:637-638).
            ix = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32),
                          0, nx_loc - 1)
            iy = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            iz = jnp.clip(((z - z0) * inv_dz).astype(jnp.int32), 0, n_z - 1)
            cell = read_rows(local_cells, (ix * n_y + iy) * n_z + iz)
            physical = collide & (u[1] < cell[:, 0] * inv_max_ext)
            if C == 1:
                comp = jnp.zeros(L, jnp.int32)
                ssa_v = cell[:, 2]
                rowb = cell[:, 3].astype(jnp.int32)
            else:
                cum = cell[:, 1:1 + C]
                comp = jnp.clip(jnp.sum((u[6][:, None] >= cum)
                                        .astype(jnp.int32), axis=1),
                                0, C - 1)
                sel = jax.nn.one_hot(comp, C, dtype=jnp.float32)
                ssa_v = jnp.sum(cell[:, 1 + C:1 + 2 * C] * sel, axis=1)
                rowb = jnp.sum(cell[:, 1 + 2 * C:1 + 3 * C] * sel,
                               axis=1).astype(jnp.int32)
            died = physical & (u[2] >= ssa_v)   # Bernoulli absorption
            scatter = physical & ~died

            if D:
                # Local estimation record: per-detector prefactors from the
                # INCOMING direction (pre-rotation), weighted by the picked
                # component's ssa, with its phase VALUE from the replicated
                # log-cubic forward fit — the w*ssa*P/(4 pi |mu_d|) of
                # :1419-1510 under this tracer's weight-1 scheme.  Emission
                # (pool allocation) happens in the block glue; the lane
                # freezes until then.
                proj = jnp.clip(ux[:, None] * ddx[None, :]
                                + uy[:, None] * ddy[None, :]
                                + uz[:, None] * ddz[None, :], -1.0, 1.0)
                posd = jnp.arccos(proj) * jnp.float32(n_fwd_seg / np.pi)
                segd = jnp.clip(posd.astype(jnp.int32), 0, n_fwd_seg - 1)
                td = posd - segd.astype(posd.dtype)
                cf = read_rows(fwd_cubic,
                               (rowb[:, None] * n_fwd_seg + segd)
                               .reshape(L * D)).reshape(L, D, 4)
                pf_v = jnp.exp(((cf[..., 3] * td + cf[..., 2]) * td
                                + cf[..., 1]) * td + cf[..., 0])
                pf_new = pf_v * inv_amu_t[None, :] * ssa_v[:, None]
                pend_pf = jnp.where(physical[:, None], pf_new, pend_pf)
                pend_comp = jnp.where(physical, comp, pend_comp)
                pend_srf = pend_srf & ~physical
                pend = pend | physical

            pk = jnp.where(exit_top, 1,
                           jnp.where(exit_bot, 2, jnp.where(died, 3, pk)))
            tag = jnp.where(migrate, jnp.where(ux >= 0.0, 1, -1), tag)
            # Scattering angle from the picked component's piecewise-cubic
            # inverse CDF (the replicated kernels' mu(p) fit).
            pos_s = jnp.clip(u[3], 0.0, 1.0) * n_seg
            seg_s = jnp.clip(pos_s.astype(jnp.int32), 0, n_seg - 1)
            t_s = pos_s - seg_s.astype(pos_s.dtype)
            c4 = read_rows(inv_cubic, rowb * n_seg + seg_s)
            cs = jnp.clip(((c4[:, 3] * t_s + c4[:, 2]) * t_s
                           + c4[:, 1]) * t_s + c4[:, 0], -1.0, 1.0)
            nux, nuy, nuz = rotate_direction(ux, uy, uz, cs, u[4])
            ux = jnp.where(scatter, nux, ux)
            uy = jnp.where(scatter, nuy, uy)
            uz = jnp.where(scatter, nuz, uz)
            orders = orders + physical.astype(jnp.int32)
            over = act & (orders >= max_events)
            bad = bad + over.astype(jnp.int32)
            alive = alive & (pk == 0) & (tag == 0) & ~over
            return (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad,
                    pend, pend_pf, pend_srf, pend_comp)

        def pack_send(m, fields, cap, n_cap):
            """Pack the first ``cap`` masked lanes into an n_cap-slot buffer.

            Lanes beyond the receiver-granted cap keep their migration tag
            and retry next block — nothing is ever dropped at the sender.
            """
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            safe = m & (rank < cap)
            slot = jnp.where(safe, rank, n_cap)     # n_cap -> out of range
            bufs = tuple(
                jnp.zeros(n_cap, f.dtype).at[slot].set(
                    jnp.where(safe, f, jnp.zeros_like(f)), mode="drop")
                for f in fields)
            return bufs, jnp.sum(safe.astype(jnp.int32)), safe

        def body(carry):
            kb = carry["kb"]
            launched = carry["launched"]
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad,
             pend, pend_pf, pend_srf, pend_comp) = carry["st"]
            columns = carry["columns"]
            n_mig = carry["n_mig"]
            inbox, inbox_n = carry["inbox"], carry["inbox_n"]

            # Flush exits/deaths into the LOCAL column tallies.
            ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32),
                           0, nx_loc - 1)
            iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            colf = ixf * n_y + iyf
            vals = jnp.stack([(pk == 1).astype(jnp.float32),
                              (pk == 2).astype(jnp.float32),
                              (pk == 3).astype(jnp.float32)], axis=1)
            columns = tally_multi(columns, colf, vals)
            if vol_mode:
                # Heating rates: Bernoulli deaths land in their exact cell.
                izf = jnp.clip(((z - z0) * inv_dz).astype(jnp.int32),
                               0, n_z - 1)
                carry["vol"] = tally_add(carry["vol"],
                                         (colf * n_z + izf),
                                         (pk == 3).astype(jnp.float32))
            if D and reflecting:
                # Reflected-radiance record A/pi toward upward detectors,
                # armed BEFORE the Bernoulli revive (the record carries the
                # pre-Bernoulli expectation; :1473-1480).
                emit_srf = pk == 2
                pend_pf = jnp.where(emit_srf[:, None], surf_pf_t[None, :],
                                    pend_pf)
                pend_srf = pend_srf | emit_srf
                pend = pend | emit_srf
            if reflecting:
                # Bernoulli revive with a fresh Lambertian draw (the
                # fastpath's pause-at-flush scheme; Fdn is already tallied).
                u_r = jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(key, me),
                                       -kb - 1 - (1 << 25)),
                    (3, L), dtype=jnp.float32)
                revive = (pk == 2) & (u_r[0] < jnp.float32(surface_albedo))
                mu_r = jnp.maximum(jnp.sqrt(u_r[1]), jnp.float32(1e-6))
                sin_r = jnp.sqrt(jnp.maximum(1.0 - u_r[1], 0.0))
                sch, cch = _sincos_2pi(u_r[2])
                ux = jnp.where(revive, sin_r * cch, ux)
                uy = jnp.where(revive, sin_r * sch, uy)
                uz = jnp.where(revive, mu_r, uz)
                z = jnp.where(revive, z0 + nudge, z)
                tau = jnp.where(revive, 0.0, tau)
                orders = jnp.where(revive, orders + 1, orders)
                alive = alive | revive
            pk = jnp.zeros_like(pk)

            if D:
                (q_alive, qx, qy, qz, qtau, qpf, qdet, qtag) = carry["qs"]
                q_inbox, q_inbox_n = carry["q_inbox"], carry["q_inbox_n"]
                acc_int, acc_byc = carry["acc_int"], carry["acc_byc"]

                # ---- emission drain: allocate D pool slots per pending
                # lane (qdet = slot * D + d encodes the by-component slot —
                # 0 = surface, 1 + comp = scatterer — so it survives
                # migration in one int field) ------------------------------
                free_q = ~q_alive & (qtag == 0)
                free_rank = jnp.cumsum(free_q.astype(jnp.int32)) - 1
                n_free = jnp.sum(free_q.astype(jnp.int32))
                req_rank = jnp.cumsum(pend.astype(jnp.int32)) - 1
                can = pend & ((req_rank + 1) * D <= n_free)
                idx_of_rank = jnp.zeros(R, jnp.int32).at[
                    jnp.where(free_q, free_rank, R)].set(
                        jnp.arange(R, dtype=jnp.int32), mode="drop")
                for d in range(D):
                    slot_rank = req_rank * D + d
                    pidx = jnp.where(
                        can,
                        idx_of_rank[jnp.clip(slot_rank, 0, R - 1)],
                        R)
                    qx = qx.at[pidx].set(x, mode="drop")
                    qy = qy.at[pidx].set(y, mode="drop")
                    qz = qz.at[pidx].set(z, mode="drop")
                    qtau = qtau.at[pidx].set(jnp.zeros(L, jnp.float32),
                                             mode="drop")
                    qpf = qpf.at[pidx].set(pend_pf[:, d], mode="drop")
                    qdet = qdet.at[pidx].set(
                        jnp.where(pend_srf, d,
                                  (pend_comp + 1) * D + d).astype(jnp.int32),
                        mode="drop")
                    q_alive = q_alive.at[pidx].set(jnp.ones(L, bool),
                                                   mode="drop")
                pend = pend & ~can

                # ---- shadow-ray advance: K exact cell-DDA steps ----------
                for _ in range(K):
                    step = q_alive & (qtag == 0)
                    dirv = read_rows(det_tab, qdet % D)
                    rdx, rdy, rdz = dirv[:, 0], dirv[:, 1], dirv[:, 2]
                    qix = jnp.clip(((qx - x_lo) * inv_dx).astype(jnp.int32),
                                   0, nx_loc - 1)
                    qiy = jnp.clip(((qy - y0) * inv_dy).astype(jnp.int32),
                                   0, n_y - 1)
                    qiz = jnp.clip(((qz - z0) * inv_dz).astype(jnp.int32),
                                   0, n_z - 1)
                    extq = read_rows(local_cells,
                                     (qix * n_y + qiy) * n_z + qiz)[:, 0]
                    big = jnp.float32(3e38)
                    fxq = x_lo + (qix + (rdx >= 0).astype(jnp.float32)) \
                        * jnp.float32(geom.dx)
                    fyq = y0 + (qiy + (rdy >= 0).astype(jnp.float32)) \
                        * jnp.float32(geom.dy)
                    fzq = z0 + (qiz + (rdz >= 0).astype(jnp.float32)) \
                        * jnp.float32(geom.dz)
                    s_x = jnp.where(jnp.abs(rdx) >= 2e-30, (fxq - qx) / rdx,
                                    big)
                    s_y = jnp.where(jnp.abs(rdy) >= 2e-30, (fyq - qy) / rdy,
                                    big)
                    s_z = jnp.where(jnp.abs(rdz) >= 2e-30, (fzq - qz) / rdz,
                                    big)
                    s = jnp.maximum(
                        jnp.minimum(jnp.minimum(s_x, s_y), s_z), 0.0)
                    qtau = jnp.where(step, qtau + extq * s, qtau)
                    adv = s + s * jnp.float32(1e-6) + nudge
                    nqx = qx + rdx * adv
                    nqy = qy + rdy * adv
                    nqz = qz + rdz * adv
                    # Periodic y; x handled by migration/global wrap.
                    wy = y_max - y0
                    nqy = jnp.where(nqy >= y_max, nqy - wy,
                                    jnp.where(nqy < y0, nqy + wy, nqy))
                    esc_top = step & (rdz > 0) & (nqz >= z_max)
                    esc_bot = step & (rdz < 0) & (nqz <= z0)
                    escaped = esc_top | esc_bot
                    # Exit column from the crossing point (:1512-1535 exit
                    # bookkeeping: xIndexF/yIndexF); pre-wrap, so the
                    # overshoot clips back into the local slab.
                    eix = jnp.clip(((nqx - x_lo) * inv_dx).astype(jnp.int32),
                                   0, nx_loc - 1)
                    eiy = jnp.clip(((nqy - y0) * inv_dy).astype(jnp.int32),
                                   0, n_y - 1)
                    contrib = jnp.where(escaped, qpf * jnp.exp(-qtau), 0.0)
                    det_id = qdet % D
                    idx_i = (eix * n_y + eiy) * D + det_id
                    acc_int = tally_add(acc_int, idx_i, contrib, escaped)
                    # By-component slot from the qdet encoding:
                    # 0 = surface, 1 + comp = scatterer.
                    slot = qdet // D
                    acc_byc = tally_add(acc_byc, idx_i * (C + 1) + slot,
                                        contrib, escaped)
                    q_alive = q_alive & ~escaped
                    mig_q = step & ~escaped & ((nqx >= x_hi) | (nqx < x_lo))
                    wx = x_max - x0
                    nqx = jnp.where(nqx >= x_max, nqx - wx,
                                    jnp.where(nqx < x0, nqx + wx, nqx))
                    qtag = jnp.where(mig_q,
                                     jnp.where(rdx >= 0.0, 1, -1), qtag)
                    qx = jnp.where(step, nqx, qx)
                    qy = jnp.where(step, nqy, qy)
                    qz = jnp.where(step, nqz, qz)

                # ---- shadow-ray migration (receiver-granted, lossless) ---
                rfields = (qx, qy, qz, qtau, qpf, qdet.astype(jnp.float32))
                for d_i, dirn in enumerate((1, -1)):
                    m = qtag == dirn
                    space = jnp.minimum(jnp.int32(CAP),
                                        jnp.int32(INBOX) - q_inbox_n[d_i])
                    perm_fwd = [(i, (i + dirn) % n_dev) for i in range(n_dev)]
                    perm_rev = [(i, (i - dirn) % n_dev) for i in range(n_dev)]
                    grant = jax.lax.ppermute(space, axis, perm_rev)
                    bufs, n_send, sent = pack_send(m, rfields, grant, CAP)
                    qtag = jnp.where(sent, 0, qtag)
                    q_alive = q_alive & ~sent
                    recv = tuple(jax.lax.ppermute(b, axis, perm_fwd)
                                 for b in bufs)
                    n_recv = jax.lax.ppermute(n_send, axis, perm_fwd)
                    n_mig = n_mig + n_send
                    inb, n_in = q_inbox[d_i], q_inbox_n[d_i]
                    sel = jnp.arange(INBOX + CAP) < n_in
                    vbuf = tuple(
                        jnp.where(sel, jnp.pad(bi, (0, CAP)),
                                  jnp.roll(jnp.pad(br, (0, INBOX)), n_in))
                        for bi, br in zip(inb, recv))
                    n_tot = n_in + n_recv
                    free = ~q_alive & (qtag == 0)
                    frank = jnp.cumsum(free.astype(jnp.int32)) - 1
                    take = free & (frank < n_tot)
                    slot_q = jnp.where(take, frank, 0)

                    def merge(cur, buf):
                        return jnp.where(take, buf[slot_q], cur)

                    qx = merge(qx, vbuf[0]); qy = merge(qy, vbuf[1])
                    qz = merge(qz, vbuf[2]); qtau = merge(qtau, vbuf[3])
                    qpf = merge(qpf, vbuf[4])
                    qdet = jnp.where(take, vbuf[5][slot_q].astype(jnp.int32),
                                     qdet)
                    q_alive = q_alive | take
                    absorbed = jnp.sum(take.astype(jnp.int32))
                    n_left = n_tot - absorbed
                    if d_i == 0:
                        new_q0 = (tuple(jnp.roll(b, -absorbed)[:INBOX]
                                        for b in vbuf), n_left)
                    else:
                        new_q1 = (tuple(jnp.roll(b, -absorbed)[:INBOX]
                                        for b in vbuf), n_left)
                q_inbox = (new_q0[0], new_q1[0])
                q_inbox_n = jnp.stack([new_q0[1], new_q1[1]])
                carry["qs"] = (q_alive, qx, qy, qz, qtau, qpf, qdet, qtag)
                carry["q_inbox"], carry["q_inbox_n"] = q_inbox, q_inbox_n
                carry["acc_int"], carry["acc_byc"] = acc_int, acc_byc

            # Photon migration: receiver-granted send budgets (reverse-
            # direction scalar ppermute), pack, ppermute, merge into free
            # lanes (never into lanes still holding an emission record).
            fields = (x, y, z, ux, uy, uz, tau,
                      orders.astype(jnp.float32))
            new_inbox = []
            for d_i, dirn in enumerate((1, -1)):
                m = tag == dirn
                # My downstream neighbor tells me how many it can take.
                space = jnp.minimum(jnp.int32(CAP),
                                    jnp.int32(INBOX) - inbox_n[d_i])
                perm_fwd = [(i, (i + dirn) % n_dev) for i in range(n_dev)]
                perm_rev = [(i, (i - dirn) % n_dev) for i in range(n_dev)]
                grant = jax.lax.ppermute(space, axis, perm_rev)
                bufs, n_send, sent = pack_send(m, fields, grant, CAP)
                tag = jnp.where(sent, 0, tag)   # unsent retry next block
                recv = tuple(jax.lax.ppermute(b, axis, perm_fwd)
                             for b in bufs)
                n_recv = jax.lax.ppermute(n_send, axis, perm_fwd)
                n_mig = n_mig + n_send
                inb, n_in = inbox[d_i], inbox_n[d_i]
                # Virtual concatenation [inbox(0..n_in) | recv(0..n_recv)]
                # into an INBOX+CAP buffer, all shapes static.
                sel = jnp.arange(INBOX + CAP) < n_in
                vbuf = tuple(
                    jnp.where(sel, jnp.pad(bi, (0, CAP)),
                              jnp.roll(jnp.pad(br, (0, INBOX)), n_in))
                    for bi, br in zip(inb, recv))
                n_tot = n_in + n_recv
                free = ~alive & (tag == 0) & ~pend
                frank = jnp.cumsum(free.astype(jnp.int32)) - 1
                take = free & (frank < n_tot)
                slot = jnp.where(take, frank, 0)

                def merge(cur, buf):
                    return jnp.where(take, buf[slot], cur)

                x = merge(x, vbuf[0]); y = merge(y, vbuf[1]); z = merge(z, vbuf[2])
                ux = merge(ux, vbuf[3]); uy = merge(uy, vbuf[4]); uz = merge(uz, vbuf[5])
                tau = merge(tau, vbuf[6])
                orders = jnp.where(take, vbuf[7][slot].astype(jnp.int32), orders)
                alive = alive | take
                absorbed = jnp.sum(take.astype(jnp.int32))
                n_left = n_tot - absorbed       # <= INBOX by the grant
                new_inbox.append((
                    tuple(jnp.roll(b, -absorbed)[:INBOX] for b in vbuf),
                    n_left))
            inbox = (new_inbox[0][0], new_inbox[1][0])
            inbox_n = jnp.stack([new_inbox[0][1], new_inbox[1][1]])

            # Refill fresh local photons from the per-shard budget, leaving
            # RESERVE free lanes as immigration headroom.
            dead = ~alive & (tag == 0) & ~pend
            di = dead.astype(jnp.int32)
            rank = jnp.cumsum(di) - di
            n_free = jnp.sum(di)
            allowed = jnp.maximum(n_free - RESERVE, 0)
            new_id = launched + rank
            refill = dead & (rank < allowed) & (new_id < per_shard_budget)
            fx_, fy_, fz_, fux, fuy, fuz = sample_local(
                jax.random.fold_in(jax.random.fold_in(key, me), -kb - 1))
            x = jnp.where(refill, fx_, x)
            y = jnp.where(refill, fy_, y)
            z = jnp.where(refill, fz_, z)
            ux = jnp.where(refill, fux, ux)
            uy = jnp.where(refill, fuy, uy)
            uz = jnp.where(refill, fuz, uz)
            tau = jnp.where(refill, 0.0, tau)
            orders = jnp.where(refill, 0, orders)
            launched = launched + jnp.sum(refill.astype(jnp.int32))
            alive = alive | refill

            st = (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad,
                  pend, pend_pf, pend_srf, pend_comp)
            for j in range(K):
                u = jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(key, me), kb * K + j),
                    (n_draws, L), dtype=jnp.float32)
                st = event(u, st)
            carry["kb"] = kb + 1
            carry["launched"] = launched
            carry["st"] = st
            carry["columns"] = columns
            carry["n_mig"] = n_mig
            carry["inbox"], carry["inbox_n"] = inbox, inbox_n
            return carry

        def cond(carry):
            st = carry["st"]
            pending = (jnp.any(st[0]) | jnp.any(st[9] != 0)
                       | jnp.any(st[10] != 0)
                       | jnp.any(carry["inbox_n"] > 0)
                       | (carry["launched"] < per_shard_budget))
            if D:
                qs = carry["qs"]
                pending = (pending | jnp.any(st[12]) | jnp.any(qs[0])
                           | jnp.any(qs[7] != 0)
                           | jnp.any(carry["q_inbox_n"] > 0))
            any_pending = jax.lax.psum(pending.astype(jnp.int32), axis) > 0
            return any_pending & (carry["kb"] < max_blocks)

        zero_f = jnp.zeros(L, jnp.float32)
        zero_i = jnp.zeros(L, jnp.int32)
        Dp = max(D, 1)
        st0 = (jnp.zeros(L, bool), zero_f, zero_f, zero_f, zero_f, zero_f,
               zero_f, zero_f, zero_i, zero_i, zero_i, zero_i,
               jnp.zeros(L, bool), jnp.zeros((L, Dp), jnp.float32),
               jnp.zeros(L, bool), zero_i)
        empty_dir = tuple(jnp.zeros(INBOX, jnp.float32) for _ in range(8))
        carry0 = {
            "kb": jnp.int32(0), "launched": jnp.int32(0), "st": st0,
            "columns": jnp.zeros((nx_loc * n_y, 3), jnp.float32),
            "n_mig": jnp.int32(0),
            "inbox": (empty_dir, empty_dir),
            "inbox_n": jnp.zeros(2, jnp.int32),
        }
        if vol_mode:
            carry0["vol"] = jnp.zeros(nx_loc * n_y * n_z, jnp.float32)
        if D:
            empty_q = tuple(jnp.zeros(INBOX, jnp.float32) for _ in range(6))
            carry0.update({
                "qs": (jnp.zeros(R, bool), jnp.zeros(R, jnp.float32),
                       jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.float32),
                       jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.float32),
                       jnp.zeros(R, jnp.int32), jnp.zeros(R, jnp.int32)),
                "q_inbox": (empty_q, empty_q),
                "q_inbox_n": jnp.zeros(2, jnp.int32),
                "acc_int": jnp.zeros(nx_loc * n_y * D, jnp.float32),
                "acc_byc": jnp.zeros(nx_loc * n_y * D * (C + 1),
                                     jnp.float32),
            })
        carry = jax.lax.while_loop(cond, body, carry0)
        (alive, x, y, z, *_rest) = carry["st"]
        pk, tag = carry["st"][9], carry["st"][10]
        columns = carry["columns"]
        # Final flush of any pending exits (no revive: the loop only ends
        # with pk == 2 pending if the block cap was hit).
        ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32), 0, nx_loc - 1)
        iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
        vals = jnp.stack([(pk == 1).astype(jnp.float32),
                          (pk == 2).astype(jnp.float32),
                          (pk == 3).astype(jnp.float32)], axis=1)
        columns = tally_multi(columns, ixf * n_y + iyf, vals)
        if vol_mode:
            izf = jnp.clip(((z - z0) * inv_dz).astype(jnp.int32), 0, n_z - 1)
            carry["vol"] = tally_add(carry["vol"],
                                     (ixf * n_y + iyf) * n_z + izf,
                                     (pk == 3).astype(jnp.float32))
        n_bad = (jnp.sum(carry["st"][11]) + jnp.sum(carry["inbox_n"])
                 + jnp.sum((alive | (tag != 0)).astype(jnp.int32)))
        if D:
            # Undelivered radiance contributions (records still pending,
            # rays still in flight) count as bad when the block cap hit.
            # Lanes already counted above (alive / migration-tagged) are
            # excluded so a frozen live photon is not double-counted.
            qs = carry["qs"]
            pend_only = carry["st"][12] & ~(alive | (tag != 0))
            n_bad = n_bad + (jnp.sum(pend_only.astype(jnp.int32))
                             + jnp.sum((qs[0] | (qs[7] != 0))
                                       .astype(jnp.int32))
                             + jnp.sum(carry["q_inbox_n"]))
        n_bad = jax.lax.psum(n_bad, axis)
        n_mig = jax.lax.psum(carry["n_mig"], axis)
        outs = [columns, n_bad, carry["kb"], n_mig]
        if vol_mode:
            outs.append(carry["vol"])
        if D:
            outs.append(carry["acc_int"])
            outs.append(carry["acc_byc"])
        return tuple(outs)

    out_specs_outer = [P(axis), P(), P(), P()]
    if vol_mode:
        out_specs_outer.append(P(axis))
    if D:
        out_specs_outer.extend([P(axis), P(axis)])
    shard = jax.shard_map(worker, mesh=mesh, in_specs=P(axis),
                          out_specs=tuple(out_specs_outer), check_vma=False)
    outs = jax.jit(shard)(jnp.asarray(cellmat))
    columns, n_bad, kb, n_mig = outs[:4]
    pos = 4
    n_cols = n_x * n_y
    if vol_mode:
        vol = outs[pos].reshape(n_cols * n_z)
        pos += 1
    else:
        vol = jnp.zeros(n_cols * n_z, jnp.float32)
    if D:
        acc_int = outs[pos].reshape(n_cols * D)
        acc_byc = outs[pos + 1].reshape(n_cols * D * (C + 1))
    else:
        acc_int = jnp.zeros(0, jnp.float32)
        acc_byc = jnp.zeros(0, jnp.float32)
    columns = columns.reshape(n_cols, 3)
    return RawTallies(
        flux_up=columns[:, 0], flux_down=columns[:, 1],
        flux_absorbed=columns[:, 2],
        volume_absorption=vol,
        intensity=acc_int,
        intensity_by_component=acc_byc,
        intensity_excess=jnp.zeros(D * (C + 1), jnp.float32),
        n_photons=jnp.int32(n_total), n_bad=n_bad,
        n_iterations=kb * K, n_lane_events=n_mig.astype(jnp.float32))
