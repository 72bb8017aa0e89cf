"""Polarized (vector) radiative transfer: Stokes-vector photon transport.

The reference's Wishlist item 3 (Wishlist.txt:20-31) sketches polarized RT
as: phase matrices in place of phase functions, photons carrying full
Stokes vectors, polarization rotated at each scattering event, polarized
local estimation for radiances, polarized reporting.  The reference never
built it; this module does, TPU-first, on the wavefront design of
integrators/wavefront.py (photon-parallel SoA state, masked
``lax.while_loop``, counter-based RNG, maximum-cross-section transport —
computeRT's transport mode, monteCarloRadiativeTransfer.f95:492-497).

Polarization bookkeeping uses the EULER-FRAME method: each photon carries,
besides its direction ``u``, a unit vector ``e1`` perpendicular to ``u``;
the Stokes vector (1, q, u, v) (normalized to I = 1; the magnitude lives
in the scalar weight ``w``) is defined on the right-handed triad
(e1, e2 = u x e1, u), Q > 0 meaning polarization along e1.  At a
scattering event with azimuth chi and angle theta:

    1. rotate the frame about u by chi:  e1' = cos chi e1 + sin chi e2
       and the Stokes vector with it (the 2chi rotation L(chi));
    2. the scattering plane is now span(u, e1'); apply the phase matrix
       M(theta) of core/phase_matrices (Q parallel to the plane — the
       frames line up by construction);
    3. the new direction is u' = cos theta u + sin theta e1' and the new
       frame vector e1'' = -sin theta u + cos theta e1' stays in the
       scattering plane, perpendicular to u'.

This is branch-free vector algebra — no spherical-triangle angle
extraction, no atan2, no pole singularities beyond a single guarded
normalization — which is exactly what the TPU's vector unit wants.

Sampling is importance-based and unbiased: (theta, chi) are drawn from
P11's inverse CDF x uniform azimuth (reusing the scalar piecewise-cubic
mu(p) fit, integrators/tables.build_inverse_cubic), and the photon weight
is multiplied by the true polarized intensity ratio
[M(theta) L(chi) S]_I / a1(theta) (expectation 1 by the normalization of
a1), after which the Stokes vector is re-normalized to I = 1.

Radiances use polarized local estimation: at each collision, for every
detector direction d, the estimate [L(a) M(theta_d) L(chi_d) S] — rotated
via a *virtual* scattering toward d and then by the angle a that aligns
the scattering-plane frame with the DETECTOR MERIDIAN frame (the plane of
d and the z-axis; x-z plane for nadir/zenith detectors) — is multiplied
by w ssa / (4 pi |mu_d|) and by a ratio-tracking transmittance to the
boundary (unbiased, E[T] = exp(-tau); the scalar serial-domain estimator,
wavefront.py:794-850 analog, here against the global majorant).
Reported Stokes components are thus (I, Q, U, V) with Q > 0 parallel to
the detector's meridian plane — the convention polarized-RT
intercomparisons use.

Scope (documented, enforced by accumulated-Status errors): every optical
component must carry a PhaseMatrixTable; surfaces are black or Lambertian
(a Lambertian reflection depolarizes, the standard approximation);
maximum-cross-section transport only.  Everything else of the scalar
surface — 1D/3D multi-component media, z sub-ranges, periodic horizontal
wrap, refilled lanes, flux + absorbed + per-column radiance outputs —
carries over.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.core.optics import Domain, flatten_optics
from i3rc_tpu.core.phase_matrices import PhaseMatrixTable
from i3rc_tpu.core.rng import exponential_deviate
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.results import column_weights
from i3rc_tpu.integrators.tables import build_inverse_cubic
from i3rc_tpu.integrators.wavefront import (
    PI,
    _sincos_2pi,
    make_direction_cosines,
)
from i3rc_tpu.ops.dda import GridGeometry
from i3rc_tpu.ops.tally import tally_add
from i3rc_tpu.utils.errors import Status

_TINY = jnp.float32(1e-12)
_ROULETTE_W = 0.01  # photon-weight roulette floor (weight spread comes only
# from the polarized-ratio multiplier, so this triggers rarely)


# ---------------------------------------------------------------------------
# Results
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class PolarizedResults:
    """Normalized polarized outputs.

    ``intensity`` is (nx, ny, D, 4) Stokes (I, Q, U, V) per column per
    detector, Q/U in the detector-meridian convention (module docstring);
    fluxes are scalar (I) per unit incident flux, exactly like Results.
    """

    flux_up: jax.Array            # (nx, ny)
    flux_down: jax.Array          # (nx, ny)
    flux_absorbed: jax.Array      # (nx, ny)
    intensity: jax.Array          # (nx, ny, D, 4)
    n_photons: jax.Array
    n_bad: jax.Array

    @property
    def mean_flux_up(self):
        return jnp.mean(self.flux_up)

    @property
    def mean_flux_down(self):
        return jnp.mean(self.flux_down)

    @property
    def mean_flux_absorbed(self):
        return jnp.mean(self.flux_absorbed)

    @property
    def mean_intensity(self):
        """(D, 4) domain-mean Stokes radiances."""
        return jnp.mean(self.intensity, axis=(0, 1))

    @property
    def degree_of_polarization(self):
        """(D,) domain-mean linear+circular DoP sqrt(Q^2+U^2+V^2)/I."""
        s = self.mean_intensity
        return jnp.sqrt(s[:, 1] ** 2 + s[:, 2] ** 2 + s[:, 3] ** 2) / \
            jnp.maximum(s[:, 0], _TINY)


jax.tree_util.register_dataclass(
    PolarizedResults,
    data_fields=["flux_up", "flux_down", "flux_absorbed", "intensity",
                 "n_photons", "n_bad"],
    meta_fields=[])


# ---------------------------------------------------------------------------
# Table baking
# ---------------------------------------------------------------------------
def _bake_matrix_tables(domain: Domain, n_fwd: int) -> dict:
    """Flatten every component's PhaseMatrixTable onto a uniform angle grid.

    Returns float32 arrays of shape (ncomp * max_entries * n_fwd,) for a1
    and the five ratios r_x = x / a1 (zero where a1 underflows) — ratios
    rather than absolute elements so nearly-zero a1 angles can't blow up
    the interpolation, mirroring how the scalar kernel reads CO-albedo.
    """
    angles = np.linspace(0.0, np.pi, n_fwd)
    comps = []
    for c in domain.components:
        entries = []
        for m in c.table.phase_matrices:
            v = m.values(angles)
            a1 = np.maximum(v["a1"], 0.0)
            safe = np.maximum(a1, 1e-30)
            entries.append(np.stack([
                a1,
                np.where(a1 > 0, v["b1"] / safe, 0.0),
                np.where(a1 > 0, v["a2"] / safe, 0.0),
                np.where(a1 > 0, v["a3"] / safe, 0.0),
                np.where(a1 > 0, v["a4"] / safe, 0.0),
                np.where(a1 > 0, v["b2"] / safe, 0.0),
            ]))                                       # (6, n_fwd)
        comps.append(np.stack(entries))               # (entries, 6, n_fwd)
    max_entries = max(c.shape[0] for c in comps)
    out = np.zeros((len(comps), max_entries, 6, n_fwd), np.float32)
    for i, c in enumerate(comps):
        out[i, :c.shape[0]] = c
        if c.shape[0] < max_entries:
            out[i, c.shape[0]:] = c[-1]
    # ONE packed (rows, 6) table: the six elements of an angle read come
    # back in two 6-wide row gathers (the two interpolation endpoints)
    # instead of twelve scalar gathers — serialized-gather cost on TPU is
    # per ROW, nearly independent of row width (PERF_NOTES.md).
    packed = np.moveaxis(out, 2, 3).reshape(-1, 6)   # (ncomp*ME*n_fwd, 6)
    return {"packed": jnp.asarray(packed), "n_fwd": n_fwd,
            "max_entries": max_entries}


def _meridian_basis(dirs: np.ndarray):
    """Per-detector meridian frame (m1, m2, d), m1 in the plane of d and
    z (the x-z plane when d is vertical), m2 = d x m1."""
    d = dirs.T                                        # (D, 3)
    z = np.array([0.0, 0.0, 1.0])
    m1 = z[None, :] - d * d[:, 2:3]
    nrm = np.linalg.norm(m1, axis=1, keepdims=True)
    x = np.array([1.0, 0.0, 0.0])
    fallback = x[None, :] - d * d[:, 0:1]
    fb_n = np.linalg.norm(fallback, axis=1, keepdims=True)
    m1 = np.where(nrm > 1e-6, m1 / np.maximum(nrm, 1e-30),
                  fallback / np.maximum(fb_n, 1e-30))
    m2 = np.cross(d, m1)
    return m1.astype(np.float32), m2.astype(np.float32)


def _initial_frame(ux, uy, uz):
    """Meridian-plane e1 for a direction (x-z plane fallback at the poles)."""
    px = -uz * ux
    py = -uz * uy
    pz = 1.0 - uz * uz
    nrm = jnp.sqrt(px * px + py * py + pz * pz)
    pole = nrm < 1e-6
    inv = jnp.where(pole, 0.0, 1.0 / jnp.maximum(nrm, _TINY))
    return (jnp.where(pole, 1.0, px * inv),
            jnp.where(pole, 0.0, py * inv),
            jnp.where(pole, 0.0, pz * inv))


# ---------------------------------------------------------------------------
# The tracer
# ---------------------------------------------------------------------------
def make_polarized_tracer(geom: GridGeometry, flat, tabs, inv_cubic,
                          config, n_photons: int, n_lanes: int,
                          intensity_dirs, surface_albedo: float,
                          source_stokes):
    """Build trace(key, batch, source) -> raw polarized tallies.

    ``flat`` holds the device optics arrays (total_ext, cum, ssa, pfidx as
    flat gathers — the polarized path is estimator-bound, not read-bound,
    so the serialized gather is the right simplicity trade at v1);
    ``tabs`` the baked matrix tables; ``inv_cubic`` the scalar mu(p) fit.
    """
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    L = int(n_lanes)
    ncomp = int(flat["ncomp"])
    maj = float(flat["max_ext"])
    inv_maj = 1.0 / maj
    S = int(inv_cubic.shape[0] // (ncomp * tabs["max_entries"]))
    ME = int(tabs["max_entries"])
    n_fwd = int(tabs["n_fwd"])
    # Iteration budget: each loop trip is one TENTATIVE collision against
    # the GLOBAL majorant, so heterogeneous domains burn null collisions
    # without advancing `order` — scale the budget by the mean
    # null-collision factor (majorant over mean nonzero extinction), else
    # photons in clear air would hit the cap mid-flight and land in n_bad.
    null_factor = max(1, min(64, int(np.ceil(flat["null_factor"]))))
    max_iters = config.max_events * (n_photons // L + 2) * null_factor
    lambert = float(surface_albedo) > 0.0
    alb = jnp.float32(surface_albedo)
    s0 = jnp.asarray(np.asarray(source_stokes, np.float32))
    if intensity_dirs is not None:
        D = int(intensity_dirs.shape[1])
        dirs = jnp.asarray(intensity_dirs, jnp.float32)      # (3, D)
        m1_np, m2_np = _meridian_basis(np.asarray(intensity_dirs))
        m1 = jnp.asarray(m1_np)                               # (D, 3)
        m2 = jnp.asarray(m2_np)
        abs_mu = jnp.abs(dirs[2])
        up_going = jnp.asarray(np.asarray(intensity_dirs)[2] > 0)
        LD = L * D
        tile = lambda a: jnp.broadcast_to(a[:, None], (L, D)).reshape(LD)
        dxs = jnp.broadcast_to(dirs[0][None, :], (L, D)).reshape(LD)
        dys = jnp.broadcast_to(dirs[1][None, :], (L, D)).reshape(LD)
        dzs = jnp.broadcast_to(dirs[2][None, :], (L, D)).reshape(LD)
        d_idx = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None, :],
                                 (L, D)).reshape(LD)
        up_ld = jnp.broadcast_to(up_going[None, :], (L, D)).reshape(LD)
        zeta = jnp.float32(max(min(config.zeta_min, 1.0), 1e-3))
        # Ratio-tracking rounds are bounded by the majorant optical depth
        # (mean rounds ~ maj * geometric path).  The bound must cover the
        # GRAZING detector's slant path (validation allows any |mu| > 0),
        # so no floor beyond numeric safety; a generous cap is fine — the
        # while_loop exits when no ray is active, so the budget is a
        # safety bound, not a trip count.  Over-budget rays land in n_bad.
        min_abs_mu = max(float(np.min(np.abs(np.asarray(intensity_dirs)[2]))),
                         1e-3)
        max_rounds = min(64 + 8 * int(maj * (geom.z_max - geom.z0)
                                      / min_abs_mu), 1 << 20)
    else:
        D = 0

    def read(arr, idx):
        return arr[idx]

    def locate_flat(x, y, z):
        fx = geom.locate_x(x)
        fy = geom.locate_y(y)
        fz = geom.locate_z(z)
        return (fx * n_y + fy) * n_z + fz, fx * n_y + fy

    def stokes_rotate(q, u, c2, s2):
        """L(chi) on the (Q, U) pair given cos 2chi, sin 2chi."""
        return c2 * q + s2 * u, -s2 * q + c2 * u

    def matrix_apply(row, pos, q, u, v):
        """[M(theta) S] for normalized S = (1, q, u, v); returns Stokes.

        One interpolated read of the packed (rows, 6) element table: two
        6-wide row gathers total (see _bake_matrix_tables)."""
        p = jnp.clip(pos, 0.0, 1.0) * (n_fwd - 1)
        i0 = jnp.clip(p.astype(jnp.int32), 0, n_fwd - 2)
        frac = (p - i0.astype(p.dtype))[:, None]
        r0 = tabs["packed"][row + i0]
        r1 = tabs["packed"][row + i0 + 1]
        e = (1.0 - frac) * r0 + frac * r1
        a1, rb1, ra2 = e[:, 0], e[:, 1], e[:, 2]
        ra3, ra4, rb2 = e[:, 3], e[:, 4], e[:, 5]
        i2 = a1 * (1.0 + rb1 * q)
        q2 = a1 * (rb1 + ra2 * q)
        u2 = a1 * (ra3 * u + rb2 * v)
        v2 = a1 * (-rb2 * u + ra4 * v)
        return i2, q2, u2, v2, a1

    def trace(key, batch, source=None):
        x = geom.x0 + batch.x * (geom.x_max - geom.x0)
        y = geom.y0 + batch.y * (geom.y_max - geom.y0)
        z = geom.z0 + batch.z * (geom.z_max - geom.z0)
        ux, uy, uz = make_direction_cosines(batch.mu, batch.phi)
        e1x, e1y, e1z = _initial_frame(ux, uy, uz)
        q = jnp.full(L, s0[1] / jnp.maximum(s0[0], _TINY))
        us = jnp.full(L, s0[2] / jnp.maximum(s0[0], _TINY))
        v = jnp.full(L, s0[3] / jnp.maximum(s0[0], _TINY))
        w = jnp.ones(L, jnp.float32)
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        alive = lane_ids < n_photons
        launched = jnp.int32(min(L, n_photons))
        order = jnp.zeros(L, jnp.int32)
        tallies = {
            "up": jnp.zeros(n_x * n_y, jnp.float32),
            "down": jnp.zeros(n_x * n_y, jnp.float32),
            "absorbed": jnp.zeros(n_x * n_y, jnp.float32),
            "n_bad": jnp.zeros((), jnp.int32),
        }
        if D:
            tallies["intensity"] = jnp.zeros(n_x * n_y * D * 4, jnp.float32)

        def detector_estimates(ek, xs, ys, zs, ux, uy, uz, e1x, e1y, e1z,
                               q, us, v, w_scat, comp, pfidx, est_mask,
                               is_surface, tallies):
            """Polarized local estimation + ratio-tracking transmittance.

            ``is_surface`` lanes are Lambertian reflections: they
            contribute w_post / pi, depolarized, to UP-going detectors
            (the reference's surface term,
            monteCarloRadiativeTransfer.f95:1473-1480, with the
            post-reflection weight) and ride the same transmittance
            trace as the volume estimates."""
            # e2 = u x e1 completes the triad.
            e2x = uy * e1z - uz * e1y
            e2y = uz * e1x - ux * e1z
            e2z = ux * e1y - uy * e1x
            # Azimuth of each detector direction in the photon frame.
            T = lambda a: tile(a)
            ctd = T(ux) * dxs + T(uy) * dys + T(uz) * dzs
            ctd = jnp.clip(ctd, -1.0, 1.0)
            dpar = T(e1x) * dxs + T(e1y) * dys + T(e1z) * dzs
            dperp = T(e2x) * dxs + T(e2y) * dys + T(e2z) * dzs
            st2 = jnp.maximum(dpar * dpar + dperp * dperp, 0.0)
            deg = st2 < 1e-12          # detector along u: chi undefined,
            inv_st2 = jnp.where(deg, 0.0, 1.0 / jnp.maximum(st2, _TINY))
            c2 = jnp.where(deg, 1.0, (dpar * dpar - dperp * dperp) * inv_st2)
            s2 = jnp.where(deg, 0.0, 2.0 * dpar * dperp * inv_st2)
            qr, ur = stokes_rotate(T(q), T(us), c2, s2)
            row = (T(comp) * ME + T(pfidx)) * n_fwd
            pos = jnp.arccos(ctd) / PI
            i2, q2, u2, v2, _a1 = matrix_apply(row, pos, qr, ur, T(v))
            # Scattering-plane frame after the virtual scattering toward d:
            # e1_s = (-sin theta u + cos theta e1d) with e1d the unit
            # in-plane transverse toward d; e2_s its u-cross.  Align with
            # the detector meridian frame by the rotation a with
            # cos a = e1_s . m1, sin a = e1_s . m2.
            st = jnp.sqrt(st2)
            inv_st = jnp.where(deg, 0.0, 1.0 / jnp.maximum(st, _TINY))
            e1dx = (dxs - ctd * T(ux)) * inv_st
            e1dy = (dys - ctd * T(uy)) * inv_st
            e1dz = (dzs - ctd * T(uz)) * inv_st
            e1sx = -st * T(ux) + ctd * e1dx
            e1sy = -st * T(uy) + ctd * e1dy
            e1sz = -st * T(uz) + ctd * e1dz
            e2sx = T(uy) * e1dz - T(uz) * e1dy
            e2sy = T(uz) * e1dx - T(ux) * e1dz
            e2sz = T(ux) * e1dy - T(uy) * e1dx
            m1g = m1[d_idx]            # (LD, 3)
            m2g = m2[d_idx]
            ca = e1sx * m1g[:, 0] + e1sy * m1g[:, 1] + e1sz * m1g[:, 2]
            sa = e1sx * m2g[:, 0] + e1sy * m2g[:, 1] + e1sz * m2g[:, 2]
            # Degenerate geometry (d parallel u): frame alignment undefined
            # but Q2/U2 carry no chi-dependence either (b-terms only);
            # report unrotated.
            c2a = jnp.where(deg, 1.0, ca * ca - sa * sa)
            s2a = jnp.where(deg, 0.0, 2.0 * ca * sa)
            # SIGN: (ca, sa) are components of the OLD basis vector e1_s in
            # the TARGET (meridian) basis — the rotation taking (e1_s, e2_s)
            # to (m1, m2) through m1 = cos X e1_s + sin X e2_s has
            # cos X = ca but sin X = -sa (m2 = -sin X e1_s + cos X e2_s
            # dotted with e1_s gives -sin X).  So the Stokes alignment is
            # L(-a): the transpose of the chi-rotation above, hence -s2a.
            # Pinned by the geometric oracle in
            # tests/test_polarized.py::_expected_single_scatter (the
            # polarization of singly-scattered Rayleigh light lies along
            # the scattering-plane normal, built with cross products only).
            qd, ud = stokes_rotate(q2, u2, c2a, -s2a)
            pref = T(w_scat) / (4.0 * PI * abs_mu[d_idx])
            # Lambertian-reflection lanes: depolarized w/pi toward upward
            # detectors, no phase matrix, no meridian rotation.
            surf_ld = T(is_surface)
            surf_amp = jnp.where(dzs > 0.0, T(w_scat) / PI, 0.0)
            i_amp = jnp.where(surf_ld, surf_amp, pref * i2)
            q_amp = jnp.where(surf_ld, 0.0, pref * qd)
            u_amp = jnp.where(surf_ld, 0.0, pref * ud)
            v_amp = jnp.where(surf_ld, 0.0, pref * v2)
            # --- ratio-tracking transmittance to the boundary -------------
            act0 = tile(est_mask)
            st_ray = (tile(xs), tile(ys), tile(zs), jnp.ones(LD, jnp.float32),
                      act0, jnp.zeros(LD, bool), jnp.zeros(LD, jnp.int32),
                      jnp.int32(0))

            def ray_cond(s):
                return jnp.any(s[4]) & (s[7] < max_rounds)

            def ray_body(s):
                rx, ry, rz, rT, act, esc, ecol, rnd = s
                rk = jax.random.fold_in(ek, rnd)
                ru = jax.random.uniform(rk, (2, LD), dtype=jnp.float32)
                step = exponential_deviate(ru[0]) * inv_maj
                nz_ = rz + step * dzs
                hit_top = act & (nz_ >= geom.z_max)
                hit_bot = act & (nz_ <= geom.z0)
                out = hit_top | hit_bot
                good = out & (hit_top == up_ld)
                # Exit column at the boundary crossing point.
                tb = jnp.where(out,
                               (jnp.where(hit_top, geom.z_max, geom.z0) - rz)
                               / jnp.where(jnp.abs(dzs) < 1e-12, 1e-12, dzs),
                               step)
                nx_ = geom.wrap_x(rx + tb * dxs)
                ny_ = geom.wrap_y(ry + tb * dys)
                ecol = jnp.where(good,
                                 geom.locate_x(nx_) * n_y + geom.locate_y(ny_),
                                 ecol)
                esc = esc | good
                nz_ = jnp.clip(nz_, geom.z0, geom.z_max)
                flat_c, _ = locate_flat(nx_, ny_, nz_)
                ext_c = read(flat["total_ext"], flat_c)
                ratio = jnp.clip(1.0 - ext_c * inv_maj, 0.0, 1.0)
                coll = act & ~out
                rT = jnp.where(coll, rT * ratio, rT)
                rr = coll & (rT < zeta)
                killed = rr & (ru[1] >= rT / zeta)
                rT = jnp.where(rr, jnp.where(killed, 0.0, zeta), rT)
                act = coll & (rT > 0.0)
                return (nx_, ny_, nz_, rT, act, esc, ecol, rnd + 1)

            rxf, ryf, rzf, rT, act_f, esc, ecol, _ = jax.lax.while_loop(
                ray_cond, ray_body, st_ray)
            idx4 = (ecol * D + d_idx) * 4
            for k_s, amp in enumerate((i_amp, q_amp, u_amp, v_amp)):
                tallies["intensity"] = tally_add(
                    tallies["intensity"], idx4 + k_s, amp * rT, esc)
            tallies["n_bad"] = tallies["n_bad"] + jnp.sum(
                act_f.astype(jnp.int32))
            return tallies

        def body(carry):
            k, st = carry
            (alive, launched, x, y, z, ux, uy, uz, e1x, e1y, e1z,
             q, us, v, w, order, tallies) = st
            ek = jax.random.fold_in(key, k)
            ks = jax.random.split(ek, 2)
            u8 = jax.random.uniform(ks[0], (8, L), dtype=jnp.float32)

            # --- refill dead lanes ------------------------------------------
            if n_photons > L:
                dead = ~alive
                dead_i = dead.astype(jnp.int32)
                new_id = launched + jnp.cumsum(dead_i) - dead_i
                refill = dead & (new_id < n_photons)
                fresh = source.sample(ks[1], L)
                x = jnp.where(refill,
                              geom.x0 + fresh.x * (geom.x_max - geom.x0), x)
                y = jnp.where(refill,
                              geom.y0 + fresh.y * (geom.y_max - geom.y0), y)
                z = jnp.where(refill,
                              geom.z0 + fresh.z * (geom.z_max - geom.z0), z)
                fux, fuy, fuz = make_direction_cosines(fresh.mu, fresh.phi)
                ux = jnp.where(refill, fux, ux)
                uy = jnp.where(refill, fuy, uy)
                uz = jnp.where(refill, fuz, uz)
                f1x, f1y, f1z = _initial_frame(fux, fuy, fuz)
                e1x = jnp.where(refill, f1x, e1x)
                e1y = jnp.where(refill, f1y, e1y)
                e1z = jnp.where(refill, f1z, e1z)
                q = jnp.where(refill, s0[1] / jnp.maximum(s0[0], _TINY), q)
                us = jnp.where(refill, s0[2] / jnp.maximum(s0[0], _TINY), us)
                v = jnp.where(refill, s0[3] / jnp.maximum(s0[0], _TINY), v)
                w = jnp.where(refill, 1.0, w)
                order = jnp.where(refill, 0, order)
                launched = launched + jnp.sum(refill.astype(jnp.int32))
                alive = alive | refill

            # --- free path against the global majorant ----------------------
            step = exponential_deviate(u8[0]) * inv_maj
            nz_ = z + step * uz
            hit_top = alive & (nz_ >= geom.z_max)
            hit_bot = alive & (nz_ <= geom.z0)
            out = hit_top | hit_bot
            tb = jnp.where(out,
                           (jnp.where(hit_top, geom.z_max, geom.z0) - z)
                           / jnp.where(jnp.abs(uz) < 1e-12, 1e-12, uz),
                           step)
            x = geom.wrap_x(x + tb * ux)
            y = geom.wrap_y(y + tb * uy)
            z = jnp.clip(nz_, geom.z0, geom.z_max)
            col = geom.locate_x(x) * n_y + geom.locate_y(y)

            tallies = dict(tallies)
            tallies["up"] = tally_add(tallies["up"], col, w, hit_top)
            tallies["down"] = tally_add(tallies["down"], col, w, hit_bot)

            # --- Lambertian surface (depolarizing) --------------------------
            if lambert:
                refl = hit_bot
                w = jnp.where(refl, w * alb, w)
                mu_r = jnp.sqrt(jnp.maximum(u8[6], _TINY))
                sr = jnp.sqrt(jnp.maximum(1.0 - mu_r * mu_r, 0.0))
                s_chi, c_chi = _sincos_2pi(u8[7])
                ux = jnp.where(refl, sr * c_chi, ux)
                uy = jnp.where(refl, sr * s_chi, uy)
                uz = jnp.where(refl, mu_r, uz)
                r1x, r1y, r1z = _initial_frame(ux, uy, uz)
                e1x = jnp.where(refl, r1x, e1x)
                e1y = jnp.where(refl, r1y, e1y)
                e1z = jnp.where(refl, r1z, e1z)
                q = jnp.where(refl, 0.0, q)
                us = jnp.where(refl, 0.0, us)
                v = jnp.where(refl, 0.0, v)
                z = jnp.where(refl, geom.z0, z)
                alive = alive & (~hit_top) & (~hit_bot | refl)
            else:
                alive = alive & ~out

            # --- collision classification -----------------------------------
            flat_c, col_c = locate_flat(x, y, z)
            ext_c = read(flat["total_ext"], flat_c)
            physical = alive & ~out & (u8[1] < ext_c * inv_maj)

            # Component pick via cumulative fractional extinction
            # (opticalProperties.f95:429-539).
            comp = jnp.zeros(L, jnp.int32)
            if ncomp > 1:
                for c in range(ncomp - 1):
                    cum_c = read(flat["cum"], flat_c * ncomp + c)
                    comp = comp + (u8[2] >= cum_c).astype(jnp.int32)
            ssa_c = read(flat["ssa"], flat_c * ncomp + comp)
            pfidx = read(flat["pfidx"], flat_c * ncomp + comp)
            w_scat = jnp.where(physical, w * ssa_c, w)
            tallies["absorbed"] = tally_add(
                tallies["absorbed"], col_c, w * (1.0 - ssa_c), physical)

            if D:
                surf_est = refl if lambert else jnp.zeros(L, bool)
                tallies = detector_estimates(
                    jax.random.fold_in(ek, 7919), x, y, z, ux, uy, uz,
                    e1x, e1y, e1z, q, us, v, w_scat, comp, pfidx,
                    physical | surf_est, surf_est, tallies)

            # --- polarized scattering ---------------------------------------
            # chi-rotation of frame and Stokes.
            s_chi, c_chi = _sincos_2pi(u8[4])
            e2x = uy * e1z - uz * e1y
            e2y = uz * e1x - ux * e1z
            e2z = ux * e1y - uy * e1x
            r1x = c_chi * e1x + s_chi * e2x
            r1y = c_chi * e1y + s_chi * e2y
            r1z = c_chi * e1z + s_chi * e2z
            c2 = c_chi * c_chi - s_chi * s_chi
            s2 = 2.0 * s_chi * c_chi
            qr, ur = stokes_rotate(q, us, c2, s2)
            # theta from the scalar inverse-CDF cubic (P11 importance).
            pos = jnp.clip(u8[3], 0.0, 1.0) * S
            seg = jnp.clip(pos.astype(jnp.int32), 0, S - 1)
            t = pos - seg.astype(pos.dtype)
            crow = (comp * ME + pfidx) * S + seg
            cc = inv_cubic[crow]
            mu_s = jnp.clip(((cc[:, 3] * t + cc[:, 2]) * t + cc[:, 1]) * t
                            + cc[:, 0], -1.0, 1.0)
            row = (comp * ME + pfidx) * n_fwd
            pos_t = jnp.arccos(mu_s) / PI
            i2, q2, u2, v2, a1v = matrix_apply(row, pos_t, qr, ur, v)
            wmul = jnp.where(a1v > 1e-20, i2 / jnp.maximum(a1v, _TINY), 1.0)
            inv_i2 = jnp.where(i2 > 1e-20, 1.0 / jnp.maximum(i2, _TINY), 0.0)
            nq = q2 * inv_i2
            nu = u2 * inv_i2
            nv = v2 * inv_i2
            sin_s = jnp.sqrt(jnp.maximum(1.0 - mu_s * mu_s, 0.0))
            nux = mu_s * ux + sin_s * r1x
            nuy = mu_s * uy + sin_s * r1y
            nuz = mu_s * uz + sin_s * r1z
            n1x = -sin_s * ux + mu_s * r1x
            n1y = -sin_s * uy + mu_s * r1y
            n1z = -sin_s * uz + mu_s * r1z
            # Renormalize direction; re-orthogonalize the frame against it.
            nrm = jax.lax.rsqrt(jnp.maximum(
                nux * nux + nuy * nuy + nuz * nuz, _TINY))
            nux, nuy, nuz = nux * nrm, nuy * nrm, nuz * nrm
            dot = n1x * nux + n1y * nuy + n1z * nuz
            n1x, n1y, n1z = n1x - dot * nux, n1y - dot * nuy, n1z - dot * nuz
            nrm1 = jax.lax.rsqrt(jnp.maximum(
                n1x * n1x + n1y * n1y + n1z * n1z, _TINY))
            n1x, n1y, n1z = n1x * nrm1, n1y * nrm1, n1z * nrm1

            ux = jnp.where(physical, nux, ux)
            uy = jnp.where(physical, nuy, uy)
            uz = jnp.where(physical, nuz, uz)
            e1x = jnp.where(physical, n1x, e1x)
            e1y = jnp.where(physical, n1y, e1y)
            e1z = jnp.where(physical, n1z, e1z)
            q = jnp.where(physical, nq, q)
            us = jnp.where(physical, nu, us)
            v = jnp.where(physical, nv, v)
            w = jnp.where(physical, w_scat * wmul, w)

            # Weight roulette + event budget (any-time roulette is unbiased;
            # survivors double until they clear the floor).
            low = alive & (w < _ROULETTE_W)
            die = low & (u8[5] >= 0.5)
            w = jnp.where(low & ~die, w * 2.0, w)
            order = order + physical.astype(jnp.int32)
            over = physical & (order >= config.max_events)
            tallies["n_bad"] = tallies["n_bad"] + jnp.sum(over.astype(jnp.int32))
            alive = alive & ~die & ~over

            return k + 1, (alive, launched, x, y, z, ux, uy, uz,
                           e1x, e1y, e1z, q, us, v, w, order, tallies)

        def cond(carry):
            k, st = carry
            return (jnp.any(st[0]) | (st[1] < n_photons)) & (k < max_iters)

        st0 = (alive, launched, x, y, z, ux, uy, uz, e1x, e1y, e1z,
               q, us, v, w, order, tallies)
        k_final, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st0))
        tallies = st[16]
        n_bad = tallies["n_bad"] + jnp.sum(st[0]).astype(jnp.int32)
        return {
            "up": tallies["up"], "down": tallies["down"],
            "absorbed": tallies["absorbed"],
            "intensity": tallies.get("intensity",
                                     jnp.zeros(0, jnp.float32)),
            "n_photons": jnp.int32(n_photons), "n_bad": n_bad,
        }

    return trace


# ---------------------------------------------------------------------------
# Public integrator
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class PolarizedIntegrator:
    """Stokes-vector Monte Carlo integrator (Wishlist.txt:20-31, built).

    Mirrors the scalar Integrator's surface: ``create`` then ``compute`` /
    ``batch_fn``.  Every domain component must carry a
    :class:`~i3rc_tpu.core.phase_matrices.PhaseMatrixTable`.
    """

    geometry: GridGeometry
    config: IntegratorConfig
    _flat: dict
    _tabs: dict
    _inv_cubic: jax.Array
    _intensity_dirs: object
    _surface_albedo: float
    _source_stokes: tuple
    _col_weights: np.ndarray

    @staticmethod
    def create(domain: Domain, config: IntegratorConfig | None = None,
               surface_albedo: float = 0.0,
               intensity_mus=None, intensity_phis=None,
               source_stokes=(1.0, 0.0, 0.0, 0.0),
               n_forward_steps: int = 1024) -> "PolarizedIntegrator":
        config = config or IntegratorConfig()
        s = Status()
        s.fail_if(not domain.components, "domain contains no components")
        for c in domain.components:
            s.fail_if(not isinstance(c.table, PhaseMatrixTable),
                      f"component {c.name}: polarized transport needs a "
                      "PhaseMatrixTable (got a scalar phase-function table)")
        s.fail_if(not 0.0 <= surface_albedo <= 1.0,
                  "surface albedo out of range")
        s.fail_if((intensity_mus is None) != (intensity_phis is None),
                  "both or neither of intensityMus and intensityPhis")
        stokes = np.asarray(source_stokes, np.float64)
        s.fail_if(stokes.shape != (4,), "source_stokes must have 4 entries")
        if stokes.shape == (4,):
            s.fail_if(stokes[0] <= 0.0, "source Stokes I must be positive")
            s.fail_if(stokes[1] ** 2 + stokes[2] ** 2 + stokes[3] ** 2
                      > stokes[0] ** 2 * (1.0 + 1e-6),
                      "source Stokes vector over-polarized (Q^2+U^2+V^2 > I^2)")
        dirs = None
        if intensity_mus is not None:
            mus = np.atleast_1d(np.asarray(intensity_mus, np.float64))
            phis = np.atleast_1d(np.asarray(intensity_phis, np.float64))
            s.fail_if(mus.size != phis.size,
                      "intensityMus and intensityPhis must be the same length")
            s.fail_if(bool(np.any(np.abs(mus) > 1.0)),
                      "intensityMus must be in [-1, 1]")
            s.fail_if(bool(np.any(np.abs(mus) < 1e-30)),
                      "intensityMus can't be 0 (directly sideways)")
            sin_t = np.sqrt(np.maximum(1.0 - mus ** 2, 0.0))
            pr = np.deg2rad(phis)
            dirs = np.stack([sin_t * np.cos(pr), sin_t * np.sin(pr), mus])
        s.check("PolarizedIntegrator.create")

        flat_np = flatten_optics(domain)
        scalar_tables = tuple(c.table.scalar for c in domain.components)
        inv_cubic_np = build_inverse_cubic(
            replace(flat_np, forward_tables=scalar_tables))
        ncomp = flat_np.n_components
        n_cells = int(np.prod(flat_np.total_ext.shape))
        ext_pos = flat_np.total_ext[flat_np.total_ext > 0]
        flat = {
            "total_ext": jnp.asarray(flat_np.total_ext.reshape(-1)),
            "cum": jnp.asarray(flat_np.cumulative_ext.reshape(-1)),
            "ssa": jnp.asarray(flat_np.ssa.reshape(-1)),
            "pfidx": jnp.asarray(flat_np.phase_index.reshape(-1)),
            "ncomp": ncomp,
            "max_ext": flat_np.max_extinction,
            "n_cells": n_cells,
            # Mean null-collision factor of the global-majorant transport:
            # sizes the event-loop iteration budget (see max_iters).
            "null_factor": (float(flat_np.max_extinction)
                            / max(float(ext_pos.mean()), 1e-30)
                            if ext_pos.size else 1.0),
        }
        tabs = _bake_matrix_tables(domain, n_forward_steps)
        geom = GridGeometry.from_edges(
            domain.x_edges, domain.y_edges, domain.z_edges,
            domain.xy_regularly_spaced, domain.z_regularly_spaced)
        inv_cubic = jnp.asarray(inv_cubic_np.reshape(-1, 4))
        return PolarizedIntegrator(
            geometry=geom, config=config, _flat=flat, _tabs=tabs,
            _inv_cubic=inv_cubic, _intensity_dirs=dirs,
            _surface_albedo=float(surface_albedo),
            _source_stokes=tuple(float(t) for t in stokes),
            _col_weights=column_weights(domain.x_edges, domain.y_edges))

    # ------------------------------------------------------------------
    def batch_fn(self, source, n_photons: int, n_lanes: int | None = None):
        cache = self.__dict__.setdefault("_compiled_cache", {})
        L = int(n_lanes or min(n_photons, 1 << 17))
        ck = (source, int(n_photons), L)
        if ck not in cache:
            n_x, n_y = self.geometry.n_x, self.geometry.n_y
            D = (0 if self._intensity_dirs is None
                 else self._intensity_dirs.shape[1])
            tracer = make_polarized_tracer(
                self.geometry, self._flat, self._tabs, self._inv_cubic,
                self.config, int(n_photons), L, self._intensity_dirs,
                self._surface_albedo, self._source_stokes)
            cw = jnp.asarray(self._col_weights)

            @jax.jit
            def run(key):
                k_src, k_tr = jax.random.split(key)
                batch = source.sample(k_src, L)
                raw = tracer(k_tr, batch, source)
                ppc = (raw["n_photons"].astype(jnp.float32) / (n_x * n_y)
                       * cw)
                inv = 1.0 / ppc
                inten = (raw["intensity"].reshape(n_x, n_y, D, 4)
                         * inv[:, :, None, None]) if D else \
                    jnp.zeros((n_x, n_y, 0, 4), jnp.float32)
                return PolarizedResults(
                    flux_up=raw["up"].reshape(n_x, n_y) * inv,
                    flux_down=raw["down"].reshape(n_x, n_y) * inv,
                    flux_absorbed=raw["absorbed"].reshape(n_x, n_y) * inv,
                    intensity=inten,
                    n_photons=raw["n_photons"], n_bad=raw["n_bad"])

            cache[ck] = run
        return cache[ck]

    def compute(self, key, source, n_photons: int) -> PolarizedResults:
        return self.batch_fn(source, n_photons)(key)
