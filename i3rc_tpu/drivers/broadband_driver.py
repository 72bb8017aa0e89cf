"""Broadband (correlated-k) driver: namelist-configured spectral loops.

The capability the reference declares but never finished (kDistribution.f95
is a stub; no driver consumes it).  This driver completes the loop the
reference's BASELINE config 5 describes: read a domain (optionally one per
band), read k-distribution files, run every band's k points through the
spectral machinery (`integrators/spectral.py`), and write broadband fluxes
— and radiances / heating rates when requested — with standard errors, in
the reference's (value, StdErr) output formats.

Namelist groups: the monteCarloDriver five (radiativeTransfer, monteCarlo,
algorithms, output, fileNames — same keys, same defaults,
Example-Drivers/monteCarloDriver.f95:90-103) plus one new group:

    &spectral
      kDistributionFiles = "band1.kd", "band2.kd"   ! required
      bandDomainFiles    = "d1.dom", "d2.dom"       ! optional, per band
      spectralMode       = "auto"   ! auto | fused | baked | traced
    /

Modes map to spectral.run_band: "fused" traces every k point of a band in
ONE dispatch (k as a per-lane attribute); "baked" compiles one fastpath
executable per k point (cached); "traced" pushes per-k optics through one
executable per band (works for every workload); "auto" tries fused and
falls back to baked.

Run:  python -m i3rc_tpu.drivers.broadband_driver broadband.nml
"""

from __future__ import annotations

import sys
import time

import numpy as np

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.core.k_distribution import read_k_distribution
from i3rc_tpu.drivers import results_io
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.spectral import run_broadband
from i3rc_tpu.io.netcdf import read_domain
from i3rc_tpu.parallel.mesh import default_mesh
from i3rc_tpu.utils.namelist import read_namelist


from i3rc_tpu.drivers.nml_common import get as _get
from i3rc_tpu.drivers.nml_common import intensity_directions


def _listify(v):
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return [str(x) for x in v]
    return [str(v)]


_MODE_KW = {
    "auto": dict(fuse_k="auto"),
    "fused": dict(fuse_k=True),
    "baked": dict(bake_fastpath=True),
    "traced": dict(),
}


def run_from_namelist(namelist_path: str, quiet: bool = False) -> dict:
    """Execute the broadband driver; returns a dict for programmatic use."""
    t0 = time.perf_counter()
    g = read_namelist(namelist_path)

    solar_flux = float(_get(g, "radiativetransfer", "solarflux", 1.0))
    solar_mu = float(_get(g, "radiativetransfer", "solarmu", 1.0))
    solar_azimuth = float(_get(g, "radiativetransfer", "solarazimuth", 0.0))
    surface_albedo = float(_get(g, "radiativetransfer", "surfacealbedo", 0.0))
    intensity_mus = np.atleast_1d(np.asarray(
        _get(g, "radiativetransfer", "intensitymus", [0.0]), dtype=np.float64))
    intensity_phis = np.atleast_1d(np.asarray(
        _get(g, "radiativetransfer", "intensityphis", [0.0]), dtype=np.float64))

    n_photons = int(_get(g, "montecarlo", "numphotonsperbatch", 10000))
    n_batches = int(_get(g, "montecarlo", "numbatches", 4))
    iseed = int(_get(g, "montecarlo", "iseed", 10))

    use_ray_tracing = bool(_get(g, "algorithms", "useraytracing", False))
    majorant_block_size = int(_get(g, "algorithms", "majorantblocksize", 16))
    max_events = int(_get(g, "algorithms", "maxevents", 500))

    report_volume = bool(_get(g, "output", "reportvolumeabsorption", False))
    report_profile = bool(_get(g, "output", "reportabsorptionprofile", False))

    domain_file = str(_get(g, "filenames", "domainfilename", ""))
    out_flux = str(_get(g, "filenames", "outputfluxfile", ""))
    out_rad = str(_get(g, "filenames", "outputradfile", ""))
    out_abs_prof = str(_get(g, "filenames", "outputabsproffile", ""))
    out_netcdf = str(_get(g, "filenames", "outputnetcdffile", ""))

    kd_files = _listify(_get(g, "spectral", "kdistributionfiles", None))
    band_dom_files = _listify(_get(g, "spectral", "banddomainfiles", None))
    mode = str(_get(g, "spectral", "spectralmode", "auto")).lower()
    if not kd_files:
        raise ValueError("spectral namelist group needs kDistributionFiles")
    if mode not in _MODE_KW:
        raise ValueError(f"spectralMode must be one of {sorted(_MODE_KW)}, "
                         f"got {mode!r}")
    if band_dom_files and len(band_dom_files) != len(kd_files):
        raise ValueError("bandDomainFiles must match kDistributionFiles "
                         f"({len(band_dom_files)} vs {len(kd_files)})")

    mus, phis, compute_intensity = intensity_directions(
        intensity_mus, intensity_phis, bool(out_rad) or bool(out_netcdf))

    kds = [read_k_distribution(p) for p in kd_files]
    band_domains = ([read_domain(p) for p in band_dom_files]
                    if band_dom_files else None)
    base_domain = (band_domains[0] if band_domains is not None
                   else read_domain(domain_file))

    config = IntegratorConfig(
        use_ray_tracing=use_ray_tracing,
        majorant_block_size=majorant_block_size,
        max_events=max_events,
        compute_volume_absorption=(report_volume or report_profile
                                   or bool(out_abs_prof)),
    )
    source = PhotonSource.directional(solar_mu, solar_azimuth)
    mesh = default_mesh()
    t_setup = time.perf_counter() - t0
    if not quiet:
        print(f"Setup time (secs, approx): {t_setup:.1f}")

    # Domain means are accumulated PER BATCH (derive), so their standard
    # error is the batch spread of the mean — the reference's separate
    # domain-mean accumulators (monteCarloDriver.f95:300-305).  Deriving
    # them from the per-pixel stderr map would overstate the error by
    # ~sqrt(n_pixels) (pixel errors are not independent within a batch).
    def derive(res):
        out = {
            "mean_flux_up": res.mean_flux_up,
            "mean_flux_down": res.mean_flux_down,
            "mean_flux_absorbed": res.mean_flux_absorbed,
            "absorbed_profile": res.absorbed_profile,
        }
        if compute_intensity:
            out["mean_intensity"] = res.mean_intensity
        return out

    cache: dict = {}
    broadband, bands = run_broadband(
        base_domain, kds, source, n_photons, n_batches, seed=iseed,
        mesh=mesh, config=config, surface_albedo=surface_albedo,
        intensity_mus=mus, intensity_phis=phis, band_domains=band_domains,
        integrator_cache=cache, derive=derive,
        derive_token=("broadband_driver_means", compute_intensity),
        **_MODE_KW[mode])
    broadband_res, broadband_der = broadband["results"], broadband["derived"]
    # Broadband standard error: bands are independent runs, so the
    # spectral-fraction-weighted band stderrs add in quadrature (the
    # reference's (value, StdErr) contract, monteCarloDriver.f95:358-378).
    import jax

    bb_var = None
    for band in bands:
        contrib = jax.tree.map(lambda s, f=band.spectral_fraction:
                               (s * f) ** 2, band.stderr)
        bb_var = contrib if bb_var is None else jax.tree.map(
            lambda a, b: a + b, bb_var, contrib)
    bb_err = jax.tree.map(jax.numpy.sqrt, bb_var)
    bb_err_res, bb_err_der = bb_err["results"], bb_err["derived"]
    t_total = time.perf_counter() - t0
    if not quiet:
        print(f"Total time (secs, approx): {t_total:.1f}")

    np_ = lambda a: np.asarray(a) * solar_flux
    x_edges = np.asarray(base_domain.x_edges)
    y_edges = np.asarray(base_domain.y_edges)
    z_edges = np.asarray(base_domain.z_edges)
    cfg = dict(domain_file=domain_file or ";".join(band_dom_files),
               k_distribution_files=";".join(kd_files), spectral_mode=mode,
               num_photons=n_photons * n_batches * sum(k.n_k for k in kds),
               num_batches=n_batches, num_bands=len(kds),
               solar_flux=solar_flux, solar_mu=solar_mu,
               solar_azimuth=solar_azimuth, surface_albedo=surface_albedo,
               seed=iseed, time_total=t_total, time_setup=t_setup,
               n_devices=mesh.devices.size,
               # Header/attribute contract keys (results_io); this driver
               # runs the default estimator configuration.
               use_ray_tracing=use_ray_tracing,
               use_russian_roulette=config.use_russian_roulette,
               use_hybrid=config.use_hybrid_phase_funs,
               hybrid_width=config.hybrid_phase_fun_width,
               use_rr_intensity=config.use_russian_roulette_for_intensity,
               zeta_min=config.zeta_min,
               limit_intensity=config.limit_intensity_contributions,
               max_intensity=config.max_intensity_contribution,
               n_phase_intervals=config.min_forward_table_size)

    flux_up = (np_(broadband_res.flux_up), np_(bb_err_res.flux_up))
    flux_down = (np_(broadband_res.flux_down), np_(bb_err_res.flux_down))
    flux_abs = (np_(broadband_res.flux_absorbed), np_(bb_err_res.flux_absorbed))
    mean_stats = [(float(np_(broadband_der[k])), float(np_(bb_err_der[k])))
                  for k in ("mean_flux_up", "mean_flux_down",
                            "mean_flux_absorbed")]
    radiance = ((np_(broadband_res.intensity), np_(bb_err_res.intensity))
                if compute_intensity else None)
    volume = (np_(broadband_res.volume_absorption),
              np_(bb_err_res.volume_absorption))
    # Layer-mean absorption profile, per meter (Results.absorbed_profile
    # convention), with its batch-derived stderr.
    profile = (np_(broadband_der["absorbed_profile"]),
               np_(bb_err_der["absorbed_profile"]))

    if jax.process_index() == 0:
        if out_flux:
            results_io.write_flux_ascii(out_flux, cfg, x_edges, y_edges,
                                        z_edges, mean_stats, flux_up,
                                        flux_down, flux_abs)
        if out_abs_prof:
            results_io.write_absorption_profile_ascii(out_abs_prof, cfg,
                                                      z_edges, profile)
        if out_rad and compute_intensity:
            results_io.write_radiance_ascii(out_rad, cfg, x_edges, y_edges,
                                            z_edges, mus, phis, radiance)
        if out_netcdf:
            results_io.write_results_netcdf(
                out_netcdf, cfg, x_edges, y_edges, z_edges,
                flux_up, flux_down, flux_abs,
                absorption_profile=profile if report_profile else None,
                absorbed_volume=volume if report_volume else None,
                intensity=radiance, intensity_mus=mus, intensity_phis=phis)
        if not quiet:
            for band in bands:
                lam = band.wavelength_limits
                bm = float(np.asarray(band.mean["derived"]["mean_flux_up"]))
                be = float(np.asarray(band.stderr["derived"]["mean_flux_up"]))
                print(f"  band {lam[0]:.3f}-{lam[1]:.3f}um  "
                      f"f={band.spectral_fraction:.3f}  "
                      f"Fup {bm:.4f} +- {be:.4f}")
            print("Wrote results")

    return {"cfg": cfg, "mean_stats": mean_stats, "flux_up": flux_up,
            "flux_down": flux_down, "flux_absorbed": flux_abs,
            "radiance": radiance, "volume": volume, "profile": profile,
            "bands": bands}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m i3rc_tpu.drivers.broadband_driver "
              "<namelist.nml>", file=sys.stderr)
        return 1
    run_from_namelist(argv[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
