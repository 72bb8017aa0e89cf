"""Benchmark scene generators (L5): the I3RC phase-1 community test cases.

Input data files under ``data/`` are the public I3RC community inputs
(radar-derived extinction, Landsat optical depth/thickness, Dermendjian C.1
phase function) shipped with the reference in I3RC-Examples/Data.
"""

from i3rc_tpu.models.step_cloud import make_step_cloud
from i3rc_tpu.models.radar_cloud import make_radar_cloud
from i3rc_tpu.models.landsat_cloud import make_landsat_cloud
from i3rc_tpu.models.slab import make_slab_domain

__all__ = ["make_step_cloud", "make_radar_cloud", "make_landsat_cloud",
           "make_slab_domain"]
