"""Independent photon-serial Monte Carlo oracle for cross-checking the kernel.

A deliberately naive, scalar (one photon at a time) implementation following
the reference algorithm (Integrators/monteCarloRadiativeTransfer.f95:400-707)
with numpy's own RNG — a different code path and different random stream from
the wavefront kernel, so agreement is a statistical 2-sigma test of the
physics, exactly the validation contract SURVEY.md section 4 prescribes.

Supports: ray tracing through a voxel grid with periodic x/y, Lambertian
surface, multi-component cumulative-extinction selection, absorption tallies,
Russian roulette, inverse-CDF scattering with Marchuk rejection azimuth.
Slow: use a few thousand photons.
"""

from __future__ import annotations

import numpy as np


def trace_photons(rng, x_edges, y_edges, z_edges, total_ext, cum_frac, ssa,
                  pf_index, inverse_tables, n_photons, solar_mu, solar_phi,
                  surface_albedo=0.0, rr_weight=1.0, use_rr=True, max_orders=10000):
    """Returns dict of raw tallies (sums of weights), same convention as the kernel."""
    nx, ny, nz = total_ext.shape
    n_comp = cum_frac.shape[-1]
    flux_up = np.zeros((nx, ny))
    flux_down = np.zeros((nx, ny))
    flux_abs = np.zeros((nx, ny))
    vol_abs = np.zeros((nx, ny, nz))
    x0, xmax = x_edges[0], x_edges[-1]
    y0, ymax = y_edges[0], y_edges[-1]
    z0, zmax = z_edges[0], z_edges[-1]

    def locate(edges, p):
        return min(max(int(np.searchsorted(edges, p, side="right") - 1), 0),
                   len(edges) - 2)

    for _ in range(n_photons):
        x = x0 + rng.random() * (xmax - x0)
        y = y0 + rng.random() * (ymax - y0)
        z = zmax - 1e-6 * (zmax - z0)
        mu = -abs(solar_mu)
        st = np.sqrt(1 - mu * mu)
        d = np.array([st * np.cos(solar_phi), st * np.sin(solar_phi), mu])
        w = 1.0
        ix, iy, iz = locate(x_edges, x), locate(y_edges, y), locate(z_edges, z)

        for _order in range(max_orders):
            tau_target = -np.log(max(rng.random(), 1e-38))
            # --- DDA to tau_target or boundary ---
            tau = 0.0
            status = None
            while True:
                sx = ((x_edges[ix + (d[0] >= 0)] - x) / d[0]) if abs(d[0]) > 1e-30 else 1e30
                sy = ((y_edges[iy + (d[1] >= 0)] - y) / d[1]) if abs(d[1]) > 1e-30 else 1e30
                sz = ((z_edges[iz + (d[2] >= 0)] - z) / d[2]) if abs(d[2]) > 1e-30 else 1e30
                step = min(sx, sy, sz)
                if step <= 0:
                    status = "bad"
                    break
                ext = total_ext[ix, iy, iz]
                if tau + step * ext > tau_target:
                    frac = (tau_target - tau) / ext
                    x += frac * d[0]
                    y += frac * d[1]
                    z += frac * d[2]
                    status = "scatter"
                    break
                tau += step * ext
                if sx <= step:
                    x = x_edges[ix + (d[0] >= 0)]
                    ix += 1 if d[0] >= 0 else -1
                else:
                    x += step * d[0]
                if sy <= step:
                    y = y_edges[iy + (d[1] >= 0)]
                    iy += 1 if d[1] >= 0 else -1
                else:
                    y += step * d[1]
                if sz <= step:
                    z = z_edges[iz + (d[2] >= 0)]
                    iz += 1 if d[2] >= 0 else -1
                else:
                    z += step * d[2]
                if ix < 0:
                    ix, x = nx - 1, xmax
                elif ix >= nx:
                    ix, x = 0, x0
                if iy < 0:
                    iy, y = ny - 1, ymax
                elif iy >= ny:
                    iy, y = 0, y0
                if iz >= nz:
                    status = "top"
                    break
                if iz < 0:
                    status = "bottom"
                    break
            if status == "bad":
                break
            if status == "top":
                flux_up[ix, iy] += w
                break
            if status == "bottom":
                flux_down[ix, iy] += w
                iz = 0
                z = z0
                mu_new = np.sqrt(max(rng.random(), 1e-12))
                phi_new = 2 * np.pi * rng.random()
                w *= surface_albedo
                if w <= 1e-30:
                    break
                st = np.sqrt(1 - mu_new**2)
                d = np.array([st * np.cos(phi_new), st * np.sin(phi_new), mu_new])
                continue
            # --- scattering event ---
            u = rng.random()
            comp = 0
            while comp < n_comp - 1 and u >= cum_frac[ix, iy, iz, comp]:
                comp += 1
            s = ssa[ix, iy, iz, comp]
            if s < 1.0:
                flux_abs[ix, iy] += w * (1 - s)
                vol_abs[ix, iy, iz] += w * (1 - s)
                w *= s
            if use_rr and w < rr_weight / 2:
                if rng.random() >= w / rr_weight:
                    break
                w = rr_weight
            # inverse-CDF angle, table grid at i/(n-1)
            table = inverse_tables[comp][pf_index[ix, iy, iz, comp]]
            n_steps = len(table)
            pos = rng.random() * (n_steps - 1)
            i0 = min(int(pos), n_steps - 2)
            theta = table[i0] * (1 - (pos - i0)) + table[i0 + 1] * (pos - i0)
            cos_t = np.cos(theta)
            # Marchuk rejection azimuth (NEXT_DIRECT, :2086-2113)
            while True:
                ax = 1 - 2 * rng.random()
                ay = 1 - 2 * rng.random()
                dd = ax * ax + ay * ay
                if dd <= 1.0:
                    break
            b = np.sqrt((1 - cos_t**2) / dd)
            ax *= b
            ay *= b
            bb = d[0] * ax - d[1] * ay
            dd = cos_t - bb / (1 + abs(d[2]))
            d = np.array([d[0] * dd + ax, d[1] * dd - ay,
                          d[2] * cos_t - np.sign(d[2] * bb) * abs(bb)])
            d /= np.linalg.norm(d)
        # photon done
    return {"flux_up": flux_up, "flux_down": flux_down,
            "flux_absorbed": flux_abs, "volume_absorption": vol_abs,
            "n_photons": n_photons}
