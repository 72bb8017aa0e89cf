"""Sharded-domain tracing: domain decomposition with photon migration (ICI).

BEYOND the reference's capability set.  The reference replicates the full
domain on every rank (Example-Drivers/monteCarloDriver.f95:159) and its own
wishlist flags the memory cost (Wishlist.txt:43-49).  Here the domain is
DECOMPOSED along x across the devices of a mesh: each device holds only its
x-slab of the per-column optics, photons are traced locally, and a photon
crossing a slab boundary migrates to the neighbor device through
jax.lax.ppermute — on real hardware that collective rides the ICI links.

Prototype scope (this round): column-structured media — the same class the
column fastpath handles (per-(x,y) column one homogeneous cloud layer;
exactly the I3RC Landsat scene, i3rcLandsatCloud.f95:100-104) — flux
outputs, conservative scattering, black surface, HG phase function.  The
mechanism (slab ownership, frozen-migrant tagging, capacity-bounded pack /
ppermute / unpack into free lanes, per-shard tallies with a disjoint
gather) is representation-independent; widening it to the general
wavefront kernel is engineering, not architecture.

Per-device memory is the point: a shard stores n_cols/n_dev column entries
(asserted in tests), so the tractable domain size scales linearly with the
mesh.  Migration overflow beyond the per-block buffer capacity is counted
in n_bad rather than silently dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from i3rc_tpu.core.optics import flatten_optics
from i3rc_tpu.core.rng import exponential_deviate
from i3rc_tpu.integrators.fastpath import (
    column_structure,
    detect_hg,
    hg_cosine,
)
from i3rc_tpu.integrators.wavefront import (
    RawTallies,
    make_direction_cosines,
    rotate_direction,
)
from i3rc_tpu.ops.dda import GridGeometry
from i3rc_tpu.ops.tally import tally_multi


def shardable(domain, mesh: Mesh) -> bool:
    """Is this domain expressible by the sharded column prototype?"""
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    occupied = flat.total_ext > 0.0
    if flat.n_components != 1 or not np.all(flat.ssa[occupied] == 1.0):
        return False
    if detect_hg(flat.forward_tables[0]) is None:
        return False
    nx = flat.total_ext.shape[0]
    if nx % n_dev:
        return False
    return column_structure(flat.total_ext,
                            np.asarray(domain.z_edges)) is not None


def trace_sharded(domain, source, n_photons: int, mesh: Mesh,
                  n_lanes_per_shard: int = 1 << 14, max_events: int = 500,
                  unroll: int = 8, seed_key=None) -> RawTallies:
    """Trace n_photons over an x-decomposed domain on the mesh.

    Returns a RawTallies with global (n_x*n_y,) flux columns (weight sums;
    normalize with integrators.results.normalize_tallies as usual).
    """
    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    flat = flatten_optics(domain)
    geom = GridGeometry.from_edges(domain.x_edges, domain.y_edges,
                                   domain.z_edges,
                                   domain.xy_regularly_spaced,
                                   domain.z_regularly_spaced)
    g = detect_hg(flat.forward_tables[0])
    cols = column_structure(flat.total_ext, np.asarray(domain.z_edges))
    assert g is not None and cols is not None, "domain not shardable"
    n_x, n_y = geom.n_x, geom.n_y
    assert n_x % n_dev == 0, "n_x must divide the mesh"
    nx_loc = n_x // n_dev
    # (n_dev, nx_loc*n_y, 3): leading axis sharded over the mesh.
    col3 = cols.reshape(n_x, n_y, 3).reshape(n_dev, nx_loc * n_y, 3)

    L = int(n_lanes_per_shard)
    CAP = max(128, L // 16)         # per-direction migration buffer slots
    RESERVE = 2 * CAP               # free-lane headroom kept for immigrants
    K = int(unroll)
    per_shard_budget = -(-n_photons // n_dev)
    n_total = per_shard_budget * n_dev
    x0, y0, z0 = geom.x0, geom.y0, geom.z0
    x_max, y_max, z_max = geom.x_max, geom.y_max, geom.z_max
    inv_dx, inv_dy = 1.0 / geom.dx, 1.0 / geom.dy
    shard_w = (x_max - x0) / n_dev
    nudge = np.float32(8 * 2.0 ** -23 * max(abs(x0), abs(x_max), abs(z_max)))
    max_blocks = -(-2 * max_events * (per_shard_budget // L + 2) // K)
    key = seed_key if seed_key is not None else jax.random.PRNGKey(0)

    def worker(local_cols):
        local_cols = local_cols[0]       # shard_map keeps the (1,) shard axis
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
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad) = st
            tau = jnp.where(tau > 0.0, tau, exponential_deviate(u[0]))
            ix = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32), 0, nx_loc - 1)
            iy = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            cdat = local_cols[ix * n_y + iy]        # (L, 3) local slab read
            vcol, zb, zt = cdat[:, 0], cdat[:, 1], cdat[:, 2]
            ext = jnp.where((z >= zb) & (z < zt), vcol, 0.0)
            up_x = ux >= 0.0
            up_z = uz >= 0.0
            face_x = x_lo + (jnp.floor((x - x_lo) * inv_dx)
                             + up_x.astype(jnp.float32)) * jnp.float32(geom.dx)
            face_y = y0 + (jnp.floor((y - y0) * inv_dy)
                           + (uy >= 0.0).astype(jnp.float32)) * jnp.float32(geom.dy)
            face_z = jnp.where(up_z,
                               jnp.where(z < zb, zb,
                                         jnp.where(z < zt, zt, jnp.float32(z_max))),
                               jnp.where(z > zt, zt,
                                         jnp.where(z > zb, zb, jnp.float32(z0))))
            big = jnp.float32(3e38)
            sx = jnp.where(jnp.abs(ux) >= 2e-30, (face_x - x) / ux, big)
            sy = jnp.where(jnp.abs(uy) >= 2e-30, (face_y - y) / uy, big)
            sz = jnp.where(jnp.abs(uz) >= 2e-30, (face_z - z) / uz, big)
            s_bnd = jnp.maximum(jnp.minimum(jnp.minimum(sx, sy), sz), 0.0)
            s_col = jnp.where(ext > 0.0, tau / jnp.maximum(ext, 1e-38), big)
            collide = alive & (s_col <= s_bnd)
            cross = alive & ~collide
            adv = jnp.minimum(s_col, s_bnd)
            sgn = lambda up: jnp.where(up, nudge, -nudge)
            nx_p = x + ux * adv
            ny_p = y + uy * adv
            nz_p = z + uz * adv
            nx_p = jnp.where(cross & (sx <= s_bnd), face_x + sgn(up_x), nx_p)
            ny_p = jnp.where(cross & (sy <= s_bnd), face_y + sgn(uy >= 0.0), ny_p)
            nz_p = jnp.where(cross & (sz <= s_bnd), face_z + sgn(up_z), nz_p)
            # y stays periodic locally; x wraps at the DOMAIN edge only (the
            # slab edge is a migration, handled below).
            wy = y_max - y0
            ny_p = jnp.where(ny_p >= y_max, ny_p - wy,
                             jnp.where(ny_p < y0, ny_p + wy, ny_p))
            wx = x_max - x0
            nx_p = jnp.where(nx_p >= x_max, nx_p - wx,
                             jnp.where(nx_p < x0, nx_p + wx, nx_p))
            exit_top = cross & (nz_p >= z_max)
            exit_bot = cross & ~exit_top & (nz_p <= z0)
            migrate = cross & ~exit_top & ~exit_bot & (
                (nx_p >= x_hi) | (nx_p < x_lo))
            pk = jnp.where(exit_top, 1, jnp.where(exit_bot, 2, pk))
            tag = jnp.where(migrate, jnp.where(up_x, 1, -1), tag)
            tau = jnp.where(cross, tau - s_bnd * ext,
                            jnp.where(collide, 0.0, tau))
            x = jnp.where(alive, nx_p, x)
            y = jnp.where(alive, ny_p, y)
            z = jnp.where(alive, nz_p, z)
            cs = hg_cosine(g, u[1])
            nux, nuy, nuz = rotate_direction(ux, uy, uz, cs, u[2])
            ux = jnp.where(collide, nux, ux)
            uy = jnp.where(collide, nuy, uy)
            uz = jnp.where(collide, nuz, uz)
            orders = orders + collide.astype(jnp.int32)
            over = alive & (orders >= max_events)
            bad = bad + over.astype(jnp.int32)
            alive = alive & (pk == 0) & (tag == 0) & ~over
            return (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad)

        def pack_send(m, fields):
            """Pack the first CAP masked lanes into a buffer.

            Returns (bufs, n_sent, sent_mask); lanes beyond CAP keep their
            migration tag and retry next block — nothing is dropped at the
            sender.
            """
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            safe = m & (rank < CAP)
            slot = jnp.where(safe, rank, CAP)       # CAP -> out of range
            bufs = tuple(
                jnp.zeros(CAP, f.dtype).at[slot].set(
                    jnp.where(safe, f, jnp.zeros_like(f)), mode="drop")
                for f in fields)
            return bufs, jnp.sum(safe.astype(jnp.int32)), safe

        def body(carry):
            kb, launched, st, columns, bad_x, inbox, inbox_n = carry
            (alive, x, y, z, ux, uy, uz, tau, orders, pk, tag, bad) = st

            # Flush exits into the LOCAL column tallies.
            ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32), 0, nx_loc - 1)
            iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            colf = ixf * n_y + iyf
            vals = jnp.stack([(pk == 1).astype(jnp.float32),
                              (pk == 2).astype(jnp.float32)], axis=1)
            columns = tally_multi(columns, colf, vals)
            pk = jnp.zeros_like(pk)

            # Migration: pack per direction, ppermute, merge into free lanes.
            # Immigrants that find no free lane stay in a carried INBOX and
            # merge with priority next block; only an inbox overflow beyond
            # CAP is dropped (counted bad).  The refill below reserves
            # headroom so the inbox drains promptly.
            fields = (x, y, z, ux, uy, uz, tau,
                      orders.astype(jnp.float32))
            new_inbox = []
            for d_i, dirn in enumerate((1, -1)):
                m = tag == dirn
                bufs, n_send, sent = pack_send(m, fields)
                tag = jnp.where(sent, 0, tag)   # unsent retry next block
                perm = [(i, (i + dirn) % n_dev) for i in range(n_dev)]
                recv = tuple(jax.lax.ppermute(b, axis, perm) for b in bufs)
                n_recv = jax.lax.ppermute(n_send, axis, perm)
                inb, n_in = inbox[d_i], inbox_n[d_i]
                # Virtual concatenation [inbox(0..n_in) | recv(0..n_recv)]
                # into a 3*CAP buffer, all shapes static (inbox is 2*CAP).
                sel = jnp.arange(3 * CAP) < n_in
                vbuf = tuple(
                    jnp.where(sel, jnp.pad(bi, (0, CAP)),
                              jnp.roll(jnp.pad(br, (0, 2 * CAP)), n_in))
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
                n_left = n_tot - absorbed
                bad_x = bad_x + jnp.maximum(n_left - 2 * CAP, 0)
                n_left = jnp.minimum(n_left, 2 * CAP)
                new_inbox.append((
                    tuple(jnp.roll(b, -absorbed)[: 2 * CAP] for b in vbuf),
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
                    (3, L), dtype=jnp.float32)
                st = event(u, st)
            return kb + 1, launched, st, columns, bad_x, inbox, inbox_n

        def cond(carry):
            kb, launched, st, _, _, _, inbox_n = carry
            pending = (jnp.any(st[0]) | jnp.any(st[10] != 0)
                       | jnp.any(inbox_n > 0)
                       | (launched < per_shard_budget))
            any_pending = jax.lax.psum(pending.astype(jnp.int32), axis) > 0
            return any_pending & (kb < max_blocks)

        zero_f = jnp.zeros(L, jnp.float32)
        zero_i = jnp.zeros(L, jnp.int32)
        st0 = (jnp.zeros(L, bool), zero_f, zero_f, zero_f, zero_f, zero_f,
               zero_f, zero_f, zero_i, zero_i, zero_i, zero_i)
        columns0 = jnp.zeros((nx_loc * n_y, 2), jnp.float32)
        empty_dir = tuple(jnp.zeros(2 * CAP, jnp.float32) for _ in range(8))
        inbox0 = (empty_dir, empty_dir)
        (kb, launched, st, columns, bad_x, inbox,
         inbox_n) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), st0, columns0,
                         jnp.int32(0), inbox0, jnp.zeros(2, jnp.int32)))
        # Final flush of any pending exits.
        (alive, x, y, z, *_rest) = st
        pk = st[9]
        ixf = jnp.clip(((x - x_lo) * inv_dx).astype(jnp.int32), 0, nx_loc - 1)
        iyf = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
        vals = jnp.stack([(pk == 1).astype(jnp.float32),
                          (pk == 2).astype(jnp.float32)], axis=1)
        columns = tally_multi(columns, ixf * n_y + iyf, vals)
        n_bad = (jnp.sum(st[11]) + bad_x + jnp.sum(inbox_n)
                 + jnp.sum((st[0] | (st[10] != 0)).astype(jnp.int32)))
        n_bad = jax.lax.psum(n_bad, axis)
        return columns, n_bad, kb

    shard = jax.shard_map(worker, mesh=mesh, in_specs=P(axis),
                          out_specs=(P(axis), P(), P()), check_vma=False)
    columns, n_bad, kb = jax.jit(shard)(jnp.asarray(col3))
    columns = columns.reshape(n_x * n_y, 2)
    n_cols = n_x * n_y
    zero_cols = jnp.zeros(n_cols, jnp.float32)
    return RawTallies(
        flux_up=columns[:, 0], flux_down=columns[:, 1],
        flux_absorbed=zero_cols,
        volume_absorption=jnp.zeros(n_cols * geom.n_z, jnp.float32),
        intensity=jnp.zeros(0, jnp.float32),
        intensity_by_component=jnp.zeros(0, jnp.float32),
        intensity_excess=jnp.zeros(0, jnp.float32),
        n_photons=jnp.int32(n_total), n_bad=n_bad,
        n_iterations=kb * K, n_lane_events=jnp.float32(0.0))
