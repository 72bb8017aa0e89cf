"""Surface reflection: gridded BRDF parameters with a pluggable kernel.

Re-implements Code/surfaceProperties.f95: a surface is an x/y grid of BRDF
parameter vectors; reflection weight is computed by a swappable kernel
function R(params, mu_in, mu_out, phi_in, phi_out).  The shipped kernel is
Lambertian (R = params[0], surfaceProperties.f95:154-162), and positions are
wrapped periodically before the cell lookup (:212-231).

TPU design: the BRDF kernel must be jit-traceable.  It receives per-photon
parameter vectors gathered from the grid plus the incident/outgoing angles
(all float32 arrays) and returns reflectance weights.  Registering a new
BRDF is one function, the exact analog of swapping R() in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from i3rc_tpu.utils.errors import Status


def lambertian_brdf(params, mu_in, mu_out, phi_in, phi_out):
    """Lambertian albedo: reflectance = parameter 1 (surfaceProperties.f95:154-162)."""
    del mu_in, mu_out, phi_in, phi_out
    return params[..., 0]


# RPV (Rahman-Pinty-Verstraete) is a common 3-parameter land BRDF; provided
# as a second registered kernel to demonstrate the swap point (the reference
# ships only Lambertian but documents the swap at surfaceProperties.f95:150-153).
def rpv_brdf(params, mu_in, mu_out, phi_in, phi_out):
    """RPV BRDF with params = (rho0, k, theta_hg); returns directional reflectance."""
    rho0, k, theta = params[..., 0], params[..., 1], params[..., 2]
    mu_i = jnp.abs(mu_in)
    mu_r = jnp.abs(mu_out)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i**2, 0.0))
    sin_r = jnp.sqrt(jnp.maximum(1.0 - mu_r**2, 0.0))
    cos_dphi = jnp.cos(phi_in - phi_out)
    cos_g = mu_i * mu_r + sin_i * sin_r * cos_dphi
    g_hg = (1.0 - theta**2) / (1.0 + theta**2 + 2.0 * theta * cos_g) ** 1.5
    tan_i = sin_i / jnp.maximum(mu_i, 1e-6)
    tan_r = sin_r / jnp.maximum(mu_r, 1e-6)
    big_g = jnp.sqrt(jnp.maximum(tan_i**2 + tan_r**2 - 2.0 * tan_i * tan_r * cos_dphi, 0.0))
    hot = 1.0 + (1.0 - rho0) / (1.0 + big_g)
    m = (mu_i * mu_r * (mu_i + mu_r)) ** (k - 1.0)
    return rho0 * m * g_hg * hot


def cox_munk_brdf(params, mu_in, mu_out, phi_in, phi_out):
    """Cox-Munk ocean sun-glint BRDF; params = (wind_speed m/s, refractive index).

    The reference's own wishlist names Cox-Munk as the wanted ocean kernel
    (/root/reference/Wishlist.txt:14-18).  Isotropic Gaussian wave-slope
    statistics (Cox & Munk 1954): sigma^2 = 0.003 + 0.00512 W, facet pdf
    P(tan beta) = exp(-tan^2 beta / sigma^2) / (pi sigma^2), unpolarized
    Fresnel reflection off the tilted facet, and the Smith (1967)
    bidirectional shadowing/hiding factor 1/(1 + Lambda_i + Lambda_r) for
    the same Gaussian slope statistics — without it pi*f_r ~ 1/(mu_i mu_r)
    diverges at grazing sun/view geometry and inflates photon weights;
    Smith bounds it (S -> O(mu) as either direction grazes).  Angles are
    the transport kernel's convention: mu_* are propagation-direction z
    cosines (mu_in < 0 arriving at the bottom boundary), phi_* are
    propagation azimuths.  Returns the reflectance factor pi * f_r — the
    photon-weight multiplier under the integrator's cosine-weighted
    outgoing draw, exactly like the Lambertian kernel returns its albedo.
    """
    wind, n_re = params[..., 0], params[..., 1]
    mu_i = jnp.maximum(jnp.abs(mu_in), 1e-3)
    mu_r = jnp.maximum(jnp.abs(mu_out), 1e-3)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i**2, 0.0))
    sin_r = jnp.sqrt(jnp.maximum(1.0 - mu_r**2, 0.0))
    cos_dphi = jnp.cos(phi_out - phi_in)
    # Incident propagation i = (s_i, 0, -mu_i); reflected r aligned at
    # delta-phi.  The reflecting facet normal is (r - i)/|r - i|.
    dot_ir = sin_i * sin_r * cos_dphi - mu_i * mu_r
    v_norm = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dot_ir, 1e-12))
    cos_beta = jnp.clip((mu_i + mu_r) / v_norm, 1e-3, 1.0)   # facet tilt
    cos_w = jnp.clip(0.5 * v_norm, 1e-6, 1.0)                # local incidence
    tan2_beta = (1.0 - cos_beta**2) / cos_beta**2
    sigma2 = 0.003 + 0.00512 * wind
    slope_pdf = jnp.exp(-tan2_beta / sigma2) / (jnp.pi * sigma2)
    # Unpolarized Fresnel, real index (air -> water).
    sin_w = jnp.sqrt(jnp.maximum(1.0 - cos_w**2, 0.0))
    sin_t = jnp.clip(sin_w / n_re, 0.0, 1.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t**2, 0.0))
    r_s = (cos_w - n_re * cos_t) / (cos_w + n_re * cos_t)
    r_p = (n_re * cos_w - cos_t) / (n_re * cos_w + cos_t)
    fresnel = 0.5 * (r_s**2 + r_p**2)
    f_r = slope_pdf * fresnel / (4.0 * mu_i * mu_r * cos_beta**4)

    # Smith shadowing for the same isotropic Gaussian slopes: the 1-D slope
    # variance along any azimuth is sigma^2/2, so the Smith parameter is
    # a = cot(theta) / sigma; Lambda(a) = (exp(-a^2)/(a sqrt(pi)) -
    # erfc(a)) / 2; S = 1 / (1 + Lambda_i + Lambda_r).  Reciprocal in
    # (i, r) and -> 1 at nadir, so the closed-form nadir value and the
    # reciprocity property are unchanged.
    from jax.scipy.special import erfc

    sigma = jnp.sqrt(sigma2)

    def smith_lambda(mu):
        sin_t = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 1e-12))
        a = jnp.maximum(mu / (sin_t * sigma), 1e-4)
        return 0.5 * (jnp.exp(-a * a) / (a * jnp.sqrt(jnp.pi)) - erfc(a))

    shadow = 1.0 / (1.0 + smith_lambda(mu_i) + smith_lambda(mu_r))
    return jnp.pi * f_r * shadow


def ross_li_brdf(params, mu_in, mu_out, phi_in, phi_out):
    """Li-Sparse-Ross-Thick (MODIS kernel) BRDF; params = (f_iso, f_vol, f_geo).

    The reference's wishlist names Li-Sparse-Ross-Thick as the wanted
    vegetation kernel (/root/reference/Wishlist.txt:14-18).  RossThick
    volumetric + LiSparse-Reciprocal geometric kernels with the MODIS
    constants h/b = 2, b/r = 1 (Lucht, Schaaf & Strahler 2000); the
    kernel-weight sum is itself a reflectance factor, clamped at 0 where
    the linear combination goes unphysical.  Angle convention as in
    cox_munk_brdf (propagation directions); the kernels' relative azimuth
    has its backscatter (hotspot) at OPPOSING propagation azimuths, hence
    the sign flip on cos(delta phi).
    """
    f_iso, f_vol, f_geo = params[..., 0], params[..., 1], params[..., 2]
    mu_i = jnp.maximum(jnp.abs(mu_in), 1e-3)
    mu_r = jnp.maximum(jnp.abs(mu_out), 1e-3)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i**2, 0.0))
    sin_r = jnp.sqrt(jnp.maximum(1.0 - mu_r**2, 0.0))
    cos_rel = -jnp.cos(phi_out - phi_in)       # hotspot at reversed azimuth
    sin_rel = jnp.sin(phi_out - phi_in)
    # RossThick: phase angle xi between the sun and view RAYS.
    cos_xi = jnp.clip(mu_i * mu_r + sin_i * sin_r * cos_rel, -1.0, 1.0)
    xi = jnp.arccos(cos_xi)
    k_vol = (((jnp.pi / 2.0 - xi) * cos_xi + jnp.sin(xi))
             / (mu_i + mu_r) - jnp.pi / 4.0)
    # LiSparse-Reciprocal with b/r = 1 (primed angles equal the originals).
    tan_i = sin_i / mu_i
    tan_r = sin_r / mu_r
    sec_i = 1.0 / mu_i
    sec_r = 1.0 / mu_r
    d2 = jnp.maximum(tan_i**2 + tan_r**2 - 2.0 * tan_i * tan_r * cos_rel, 0.0)
    cos_t = jnp.clip(2.0 * jnp.sqrt(d2 + (tan_i * tan_r * sin_rel) ** 2)
                     / (sec_i + sec_r), -1.0, 1.0)
    t = jnp.arccos(cos_t)
    overlap = (t - jnp.sin(t) * cos_t) * (sec_i + sec_r) / jnp.pi
    k_geo = (overlap - sec_i - sec_r
             + 0.5 * (1.0 + cos_xi) * sec_i * sec_r)
    return jnp.maximum(f_iso + f_vol * k_vol + f_geo * k_geo, 0.0)


BRDF_REGISTRY = {"lambertian": lambertian_brdf, "rpv": rpv_brdf,
                 "cox_munk": cox_munk_brdf, "ross_li": ross_li_brdf}


@dataclass(frozen=True)
class SurfaceDescription:
    """x/y-gridded BRDF parameters (type surfaceDescription, surfaceProperties.f95:34-38)."""

    x_edges: np.ndarray            # (nx_s + 1,)
    y_edges: np.ndarray            # (ny_s + 1,)
    parameters: np.ndarray         # (nx_s, ny_s, n_params) float32
    brdf_name: str = "lambertian"

    @staticmethod
    def create(parameters, x_edges, y_edges, brdf_name="lambertian") -> "SurfaceDescription":
        """newSurfaceDescriptionXY analog (surfaceProperties.f95:60-96).

        ``parameters`` has shape (nx_s, ny_s, n_params); note the reference
        stores (n_params, nx, ny) — we keep parameters innermost so gathers
        pull one contiguous vector per photon.
        """
        parameters = np.asarray(parameters, dtype=np.float32)
        x_edges = np.asarray(x_edges, dtype=np.float64)
        y_edges = np.asarray(y_edges, dtype=np.float64)
        s = Status()
        s.fail_if(brdf_name not in BRDF_REGISTRY,
                  f"unknown BRDF '{brdf_name}'; registered: {sorted(BRDF_REGISTRY)}")
        s.fail_if(parameters.ndim != 3, "parameters must be (nx, ny, n_params)")
        if parameters.ndim == 3:
            s.fail_if(parameters.shape[0] != x_edges.size - 1
                      or parameters.shape[1] != y_edges.size - 1,
                      "position vectors are the wrong length for the parameter grid")
        s.fail_if(bool(np.any(np.diff(x_edges) <= 0.0) | np.any(np.diff(y_edges) <= 0.0)),
                  "positions must be unique and increasing")
        if brdf_name == "lambertian" and parameters.ndim == 3:
            s.fail_if(bool(np.any((parameters[..., 0] < 0.0) | (parameters[..., 0] > 1.0))),
                      "Lambertian surface reflectance must be between 0 and 1")
        s.check("SurfaceDescription.create")
        return SurfaceDescription(x_edges, y_edges, parameters, brdf_name)

    @staticmethod
    def uniform(parameters, brdf_name="lambertian") -> "SurfaceDescription":
        """Horizontally uniform surface (newSurfaceUniform, surfaceProperties.f95:98-117)."""
        params = np.asarray(parameters, dtype=np.float32)[None, None, :]
        big = np.finfo(np.float32).max
        return SurfaceDescription.create(params, np.array([0.0, big]), np.array([0.0, big]),
                                         brdf_name)

    @property
    def n_parameters(self) -> int:
        return self.parameters.shape[-1]

    @property
    def is_uniform(self) -> bool:
        return self.parameters.shape[0] == 1 and self.parameters.shape[1] == 1

    def reflectance_host(self, x, y, mu_in, mu_out, phi_in, phi_out):
        """Host-side reference implementation (computeSurfaceReflectance analog)."""
        x0, x1 = self.x_edges[0], self.x_edges[-1]
        y0, y1 = self.y_edges[0], self.y_edges[-1]
        xp = x0 + np.mod(x - x0, x1 - x0)
        yp = y0 + np.mod(y - y0, y1 - y0)
        ix = np.clip(np.searchsorted(self.x_edges, xp, side="right") - 1, 0,
                     self.parameters.shape[0] - 1)
        iy = np.clip(np.searchsorted(self.y_edges, yp, side="right") - 1, 0,
                     self.parameters.shape[1] - 1)
        fn = BRDF_REGISTRY[self.brdf_name]
        return np.asarray(fn(jnp.asarray(self.parameters[ix, iy]),
                             jnp.asarray(mu_in), jnp.asarray(mu_out),
                             jnp.asarray(phi_in), jnp.asarray(phi_out)))
