"""Sharded-domain tracing: domain decomposition with photon migration (ICI).

BEYOND the reference's capability set.  The reference replicates the full
domain on every rank (Example-Drivers/monteCarloDriver.f95:159) and its own
wishlist flags the memory cost (Wishlist.txt:43-49).  Here the domain is
DECOMPOSED along x across the devices of a mesh: each device holds only its
x-slab of the per-cell optics, photons are traced locally, and a photon
crossing a slab boundary migrates to the neighbor device through
jax.lax.ppermute — on real hardware that collective rides the ICI links.

Representation (round 3 — generalized from the round-2 column prototype):
the GENERAL single-component voxel slab — arbitrary 3-D per-cell extinction
and single-scattering albedo, HG phase function, black or reflecting
Lambertian surface.  Transport is maximum cross-section (the reference's
:492-497 alternative): free flights are memoryless in DISTANCE under the
global majorant, so a flight that would leave the slab simply stops at the
boundary and migrates carrying its remaining optical depth — no ray data
beyond the local slab is ever needed.  Collisions resolve against one
factored one-hot read of the local (nx_loc*ny*nz, 2) [ext, ssa] matrix;
absorption is Bernoulli survival (the fastpath's estimator); bottom hits
Bernoulli-revive with a Lambertian draw when the surface reflects.

Migration is lossless: each block, every shard tells its upstream neighbor
how much inbox space it has (a scalar ppermute in the reverse direction)
and senders pack at most that many photons — unsent migrants keep their
tag and retry next block, so nothing is ever dropped (the round-2
prototype counted inbox overflow in n_bad instead).

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
from i3rc_tpu.integrators.fastpath import detect_hg, hg_cosine
from i3rc_tpu.integrators.wavefront import (
    RawTallies,
    _sincos_2pi,
    make_direction_cosines,
    rotate_direction,
)
from i3rc_tpu.ops.dda import GridGeometry
from i3rc_tpu.ops.gather import read_rows
from i3rc_tpu.ops.tally import tally_multi


def shardable(domain, mesh: Mesh) -> bool:
    """Is this domain expressible by the sharded general-slab tracer?

    Single-component HG optics on a regular grid whose x extent divides the
    mesh; any 3-D extinction/ssa field, any Lambertian surface albedo.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    if flat.n_components != 1:
        return False
    if detect_hg(flat.forward_tables[0]) is None:
        return False
    if not (domain.xy_regularly_spaced and domain.z_regularly_spaced):
        return False
    return flat.total_ext.shape[0] % n_dev == 0


def trace_sharded(domain, source, n_photons: int, mesh: Mesh,
                  n_lanes_per_shard: int = 1 << 14, max_events: int = 500,
                  unroll: int = 8, seed_key=None,
                  surface_albedo: float = 0.0) -> RawTallies:
    """Trace n_photons over an x-decomposed domain on the mesh.

    Returns a RawTallies with global (n_x*n_y,) flux columns (weight sums;
    normalize with integrators.results.normalize_tallies as usual).
    ``n_lane_events`` carries the TOTAL MIGRATION COUNT (photon hops across
    slab boundaries) — the observability hook for the multichip dryrun.
    """
    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    geom = GridGeometry.from_edges(domain.x_edges, domain.y_edges,
                                   domain.z_edges,
                                   domain.xy_regularly_spaced,
                                   domain.z_regularly_spaced)
    g = detect_hg(flat.forward_tables[0])
    assert g is not None, "domain not shardable (non-HG phase function)"
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    assert n_x % n_dev == 0, "n_x must divide the mesh"
    nx_loc = n_x // n_dev
    # Per-cell [ext, ssa], x-major so the leading axis shards cleanly.
    ext3 = np.asarray(flat.total_ext, np.float32)
    ssa3 = np.asarray(flat.ssa, np.float32)[..., 0]
    cellmat = np.stack([ext3.reshape(n_x * n_y * n_z),
                        ssa3.reshape(n_x * n_y * n_z)], axis=1)
    cellmat = cellmat.reshape(n_dev, nx_loc * n_y * n_z, 2)
    max_ext = float(ext3.max())
    assert max_ext > 0.0, "empty domain"
    inv_max_ext = np.float32(1.0 / max_ext)
    reflecting = float(surface_albedo) > 0.0

    L = int(n_lanes_per_shard)
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
    key = seed_key if seed_key is not None else jax.random.PRNGKey(0)
    n_draws = 6  # tau, accept, absorb, scatter, azimuth, surface

    def worker(local_cells):
        local_cells = local_cells[0]     # shard_map keeps the (1,) shard axis
        me = jax.lax.axis_index(axis)
        x_lo = x0 + shard_w * me.astype(jnp.float32)
        x_hi = x_lo + jnp.float32(shard_w)

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
            """
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad) = st
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
            collide = alive & (s_col <= s_exit) & (s_col <= s_mig)
            leave = alive & ~collide & (s_exit <= s_mig)
            migrate = alive & ~collide & ~leave
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
            tau = jnp.where(collide, 0.0, tau - adv * jnp.float32(max_ext))
            x = jnp.where(alive, nx_p, x)
            y = jnp.where(alive, ny_p, y)
            z = jnp.where(alive, nz_p, z)

            # Physical-vs-null collision against the LOCAL cell read.
            ix = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32),
                          0, nx_loc - 1)
            iy = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            iz = jnp.clip(((z - z0) * inv_dz).astype(jnp.int32), 0, n_z - 1)
            cell = read_rows(local_cells, (ix * n_y + iy) * n_z + iz)
            physical = collide & (u[1] < cell[:, 0] * inv_max_ext)
            died = physical & (u[2] >= cell[:, 1])   # Bernoulli absorption
            scatter = physical & ~died

            pk = jnp.where(exit_top, 1,
                           jnp.where(exit_bot, 2, jnp.where(died, 3, pk)))
            tag = jnp.where(migrate, jnp.where(ux >= 0.0, 1, -1), tag)
            cs = hg_cosine(g, u[3])
            nux, nuy, nuz = rotate_direction(ux, uy, uz, cs, u[4])
            ux = jnp.where(scatter, nux, ux)
            uy = jnp.where(scatter, nuy, uy)
            uz = jnp.where(scatter, nuz, uz)
            orders = orders + physical.astype(jnp.int32)
            over = alive & (orders >= max_events)
            bad = bad + over.astype(jnp.int32)
            alive = alive & (pk == 0) & (tag == 0) & ~over
            return (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad)

        def pack_send(m, fields, cap):
            """Pack the first ``cap`` masked lanes into a CAP-slot buffer.

            Lanes beyond the receiver-granted cap keep their migration tag
            and retry next block — nothing is dropped at the sender.
            """
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            safe = m & (rank < cap)
            slot = jnp.where(safe, rank, CAP)       # CAP -> out of range
            bufs = tuple(
                jnp.zeros(CAP, f.dtype).at[slot].set(
                    jnp.where(safe, f, jnp.zeros_like(f)), mode="drop")
                for f in fields)
            return bufs, jnp.sum(safe.astype(jnp.int32)), safe

        def body(carry):
            (kb, launched, st, columns, n_mig, inbox, inbox_n) = carry
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad) = st

            # Flush exits/deaths into the LOCAL column tallies.
            ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32),
                           0, nx_loc - 1)
            iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            colf = ixf * n_y + iyf
            vals = jnp.stack([(pk == 1).astype(jnp.float32),
                              (pk == 2).astype(jnp.float32),
                              (pk == 3).astype(jnp.float32)], axis=1)
            columns = tally_multi(columns, colf, vals)
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

            # Migration: receiver-granted send budgets (reverse-direction
            # scalar ppermute), pack, ppermute, merge into free lanes.
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
                bufs, n_send, sent = pack_send(m, fields, grant)
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
                free = ~alive & (tag == 0)
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
            dead = ~alive & (tag == 0)
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

            st = (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad)
            for j in range(K):
                u = jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(key, me), kb * K + j),
                    (n_draws, L), dtype=jnp.float32)
                st = event(u, st)
            return kb + 1, launched, st, columns, n_mig, inbox, inbox_n

        def cond(carry):
            kb, launched, st, _, _, _, inbox_n = carry
            pending = (jnp.any(st[0]) | jnp.any(st[9] != 0)
                       | jnp.any(st[10] != 0)
                       | jnp.any(inbox_n > 0)
                       | (launched < per_shard_budget))
            any_pending = jax.lax.psum(pending.astype(jnp.int32), axis) > 0
            return any_pending & (kb < max_blocks)

        zero_f = jnp.zeros(L, jnp.float32)
        zero_i = jnp.zeros(L, jnp.int32)
        st0 = (jnp.zeros(L, bool), zero_f, zero_f, zero_f, zero_f, zero_f,
               zero_f, zero_f, zero_i, zero_i, zero_i, zero_i)
        columns0 = jnp.zeros((nx_loc * n_y, 3), jnp.float32)
        empty_dir = tuple(jnp.zeros(INBOX, jnp.float32) for _ in range(8))
        inbox0 = (empty_dir, empty_dir)
        (kb, launched, st, columns, n_mig, inbox,
         inbox_n) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), st0, columns0,
                         jnp.int32(0), inbox0, jnp.zeros(2, jnp.int32)))
        # Final flush of any pending exits (no revive: the loop only ends
        # with pk == 2 pending if the block cap was hit).
        (alive, x, y, z, *_rest) = st
        pk = st[9]
        ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32), 0, nx_loc - 1)
        iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
        vals = jnp.stack([(pk == 1).astype(jnp.float32),
                          (pk == 2).astype(jnp.float32),
                          (pk == 3).astype(jnp.float32)], axis=1)
        columns = tally_multi(columns, ixf * n_y + iyf, vals)
        n_bad = (jnp.sum(st[11]) + jnp.sum(inbox_n)
                 + jnp.sum((st[0] | (st[10] != 0)).astype(jnp.int32)))
        n_bad = jax.lax.psum(n_bad, axis)
        n_mig = jax.lax.psum(n_mig, axis)
        return columns, n_bad, kb, n_mig

    shard = jax.shard_map(worker, mesh=mesh, in_specs=P(axis),
                          out_specs=(P(axis), P(), P(), P()), check_vma=False)
    columns, n_bad, kb, n_mig = jax.jit(shard)(jnp.asarray(cellmat))
    columns = columns.reshape(n_x * n_y, 3)
    n_cols = n_x * n_y
    return RawTallies(
        flux_up=columns[:, 0], flux_down=columns[:, 1],
        flux_absorbed=columns[:, 2],
        volume_absorption=jnp.zeros(n_cols * geom.n_z, jnp.float32),
        intensity=jnp.zeros(0, jnp.float32),
        intensity_by_component=jnp.zeros(0, jnp.float32),
        intensity_excess=jnp.zeros(0, jnp.float32),
        n_photons=jnp.int32(n_total), n_bad=n_bad,
        n_iterations=kb * K, n_lane_events=n_mig.astype(jnp.float32))
