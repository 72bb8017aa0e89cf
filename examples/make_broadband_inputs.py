"""Generate the input files for examples/broadbandDriver.nml.

Writes the I3RC step-cloud domain plus two k-distribution files (a weak
visible-like band and a stronger absorption band) into the given directory
(default: the examples/ directory itself):

    python examples/make_broadband_inputs.py [out_dir]
    python -m i3rc_tpu.drivers.broadband_driver examples/broadbandDriver.nml
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i3rc_tpu.core.k_distribution import KDistribution, write_k_distribution
from i3rc_tpu.io.netcdf import write_domain
from i3rc_tpu.models.step_cloud import make_step_cloud


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.abspath(__file__))
    dom = make_step_cloud(1.0)
    write_domain(dom, os.path.join(out, "StepCloud.dom"))
    z = np.asarray(dom.z_edges)
    bands = [
        ((0.5, 0.7), 0.9, [2e-4, 2e-3], [0.8, 0.2]),
        ((2.6, 2.8), 0.1, [2e-3, 4e-2], [0.6, 0.4]),
    ]
    for i, (lims, frac, ks, w) in enumerate(bands):
        kd = KDistribution.create(
            z, np.broadcast_to(np.asarray(ks)[None, :], (z.size - 1, 2)).copy(),
            w, wavelength_limits=lims, spectral_fraction=frac,
            description=f"example band {i}")
        write_k_distribution(kd, os.path.join(out, f"band{i}.kd"))
    print(f"wrote StepCloud.dom, band0.kd, band1.kd to {out}")


if __name__ == "__main__":
    main()
