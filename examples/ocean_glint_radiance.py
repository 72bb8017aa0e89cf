"""Sun glint over a Cox-Munk ocean: radiance scan across the specular lobe.

Demonstrates the BRDF-exact surface local estimation (the wishlist surface
objects, /root/reference/Wishlist.txt:14-18): a wind-roughened ocean under a
thin cirrus layer, with upward detectors scanning azimuth at the solar zenith
so the specular peak and its wind-speed broadening are visible directly in
the detector radiances.

Run (CPU is fine; ~1 min):
    python examples/ocean_glint_radiance.py [wind_speed_m_s]
"""

import sys

import jax
import numpy as np

from i3rc_tpu import (
    Domain,
    Integrator,
    PhotonSource,
    SurfaceDescription,
)
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)


def main() -> None:
    wind = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    n_refr = 1.34                      # sea-water refractive index
    mu0, az0 = 0.707, 0.0              # 45-degree sun, propagation azimuth 0

    # Thin cirrus (tau = 0.2, g = 0.75) over a 1 km column.
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.75, 48))],
        key=[1.0])
    dom = Domain.create([0.0, 1000.0], [0.0, 1000.0], [0.0, 1000.0])
    ext = np.full((1, 1, 1), 0.2 / 1000.0)
    dom = dom.add_component("cirrus", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)

    surface = SurfaceDescription.uniform([wind, n_refr], brdf_name="cox_munk")

    # Detectors: upward at the mirrored zenith, sweeping azimuth through the
    # glint (detector azimuth = propagation azimuth of the collected light;
    # the specular peak keeps the incident propagation azimuth).
    azimuths = np.arange(0.0, 181.0, 15.0)
    mus = [mu0] * azimuths.size
    integ = Integrator.create(dom, surface=surface,
                              intensity_mus=mus, intensity_phis=list(azimuths))
    res = integ.compute(jax.random.PRNGKey(0),
                        PhotonSource.directional(mu0, az0), 200_000)
    rad = np.asarray(res.mean_intensity, np.float64)

    print(f"wind = {wind:.1f} m/s, sun at mu0 = {mu0}, tau_cirrus = 0.2")
    print(f"{'det azimuth':>12} {'radiance':>12}")
    for a, r in zip(azimuths, rad):
        bar = "#" * int(round(60 * r / max(rad.max(), 1e-30)))
        print(f"{a:12.0f} {r:12.5f}  {bar}")
    print(f"albedo-like Fup = {float(res.mean_flux_up):.4f} "
          f"(dark ocean away from the glint)")


if __name__ == "__main__":
    main()
