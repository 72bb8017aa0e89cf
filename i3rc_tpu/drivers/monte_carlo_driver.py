"""The production driver: namelist-configured, mesh-parallel Monte Carlo.

Re-implements Example-Drivers/monteCarloDriver.f95 (:6-432): reads the five
namelists (radiativeTransfer, monteCarlo, algorithms, output, fileNames)
from the file named on the command line, reads the domain, runs numBatches
independent photon batches (distributed over the device mesh instead of MPI
ranks), accumulates first/second moments, and writes ASCII and/or netCDF
results with standard errors.

Drop-in compatible with the reference's shipped .nml files:

    python -m i3rc_tpu.drivers.monte_carlo_driver monteCarloDriver.nml
"""

from __future__ import annotations

import sys
import time

import numpy as np

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.integrator import Integrator
from i3rc_tpu.io.netcdf import read_domain
from i3rc_tpu.parallel.mesh import default_mesh, run_batches
from i3rc_tpu.utils.namelist import read_namelist
from i3rc_tpu.drivers import results_io


from i3rc_tpu.drivers.nml_common import get as _get
from i3rc_tpu.drivers.nml_common import intensity_directions


def run_from_namelist(namelist_path: str, quiet: bool = False) -> dict:
    """Execute the full driver; returns a dict of stats for programmatic use."""
    t0 = time.perf_counter()
    g = read_namelist(namelist_path)

    # --- namelist parameters with reference defaults (:60-103) -------------
    solar_flux = float(_get(g, "radiativetransfer", "solarflux", 1.0))
    solar_mu = float(_get(g, "radiativetransfer", "solarmu", 1.0))
    solar_azimuth = float(_get(g, "radiativetransfer", "solarazimuth", 0.0))
    surface_albedo = float(_get(g, "radiativetransfer", "surfacealbedo", 0.0))
    intensity_mus = np.atleast_1d(np.asarray(
        _get(g, "radiativetransfer", "intensitymus", [0.0]), dtype=np.float64))
    intensity_phis = np.atleast_1d(np.asarray(
        _get(g, "radiativetransfer", "intensityphis", [0.0]), dtype=np.float64))

    n_photons = int(_get(g, "montecarlo", "numphotonsperbatch", 0))
    n_batches = int(_get(g, "montecarlo", "numbatches", 100))
    iseed = int(_get(g, "montecarlo", "iseed", 10))
    n_phase_intervals = int(_get(g, "montecarlo", "nphaseintervals", 10001))

    use_ray_tracing = bool(_get(g, "algorithms", "useraytracing", True))
    use_rr = bool(_get(g, "algorithms", "userussianroulette", True))
    use_hybrid = bool(_get(g, "algorithms", "usehybridphasefunsforintencalcs", False))
    hybrid_width = float(_get(g, "algorithms", "hybridphasefunwidth", 7.0))
    n_orders_orig = int(_get(g, "algorithms", "numordersorigphasefunintencalcs", 0))
    use_rr_intensity = bool(_get(g, "algorithms", "userussianrouletteforintensity", True))
    zeta_min = float(_get(g, "algorithms", "zetamin", 0.3))
    limit_intensity = bool(_get(g, "algorithms", "limitintensitycontributions", False))
    max_intensity = float(_get(g, "algorithms", "maxintensitycontribution", 77.0))
    # TPU-native extension: super-voxel majorant size.  Defaults ON (16):
    # unbiased (identical expectations, different event sequence) and ~10x
    # faster than the reference's single global maximum cross-section on
    # heterogeneous clouds.  Set majorantBlockSize = 0 for the reference's
    # exact algorithm.
    majorant_block_size = int(_get(g, "algorithms", "majorantblocksize", 16))
    # Polarized extension (reference Wishlist item 3): Stokes-vector
    # transport + polarized radiances.  Requires a domain whose components
    # carry phase MATRICES (the io/netcdf.py phaseMatrixElements extension).
    polarized = bool(_get(g, "algorithms", "polarized", False))

    report_volume = bool(_get(g, "output", "reportvolumeabsorption", False))
    report_profile = bool(_get(g, "output", "reportabsorptionprofile", False))

    domain_file = str(_get(g, "filenames", "domainfilename", ""))
    out_flux = str(_get(g, "filenames", "outputfluxfile", ""))
    out_rad = str(_get(g, "filenames", "outputradfile", ""))
    out_abs_prof = str(_get(g, "filenames", "outputabsproffile", ""))
    out_abs_vol = str(_get(g, "filenames", "outputabsvolumefile", ""))
    out_netcdf = str(_get(g, "filenames", "outputnetcdffile", ""))

    # Intensity directions: nonzero mus count (:151-154)
    mus, phis, compute_intensity = intensity_directions(
        intensity_mus, intensity_phis, bool(out_rad) or bool(out_netcdf))

    # --- domain + integrator ------------------------------------------------
    domain = read_domain(domain_file)
    config = IntegratorConfig(
        use_ray_tracing=use_ray_tracing,
        use_russian_roulette=use_rr,
        use_hybrid_phase_funs=use_hybrid,
        hybrid_phase_fun_width=hybrid_width,
        num_orders_orig_phase_fun=n_orders_orig,
        use_russian_roulette_for_intensity=use_rr_intensity,
        zeta_min=zeta_min,
        limit_intensity_contributions=limit_intensity,
        max_intensity_contribution=max_intensity,
        min_forward_table_size=n_phase_intervals,
        min_inverse_table_size=n_phase_intervals,
        majorant_block_size=majorant_block_size,
        # Skip the 3D tally when neither absorption output is requested.
        compute_volume_absorption=(report_volume or report_profile
                                   or bool(out_abs_prof) or bool(out_abs_vol)),
    )
    if polarized:
        from i3rc_tpu.integrators.polarized import PolarizedIntegrator

        if config.compute_volume_absorption:
            import warnings as _warnings

            from i3rc_tpu.utils.errors import I3RCWarning
            _warnings.warn("polarized transport reports column absorption "
                           "only; volume-absorption outputs are skipped",
                           I3RCWarning, stacklevel=2)
        integ = PolarizedIntegrator.create(
            domain, config=config, surface_albedo=surface_albedo,
            intensity_mus=mus, intensity_phis=phis)
    else:
        integ = Integrator.create(domain, config=config,
                                  surface_albedo=surface_albedo,
                                  intensity_mus=mus, intensity_phis=phis)
    source = PhotonSource.directional(solar_mu, solar_azimuth)
    t_setup = time.perf_counter() - t0
    if not quiet:
        print(f"Setup time (secs, approx): {t_setup:.1f}")

    # --- batches over the mesh ---------------------------------------------
    mesh = default_mesh()

    def derive(res):
        out = {
            "mean_flux_up": res.mean_flux_up,
            "mean_flux_down": res.mean_flux_down,
            "mean_flux_absorbed": res.mean_flux_absorbed,
        }
        if not polarized:
            out["absorbed_profile"] = res.absorbed_profile
        if compute_intensity:
            out["mean_intensity"] = res.mean_intensity
        return out

    # chunk_batches bounds single-dispatch runtime: remote-attached TPU
    # runtimes kill device executions that run for many minutes, which a
    # 16-batch fused scan of a radiance configuration can reach.
    stats = run_batches(integ, source, n_photons, n_batches, seed=iseed,
                        chunk_batches=2, mesh=mesh, derive=derive,
                        derive_token=("mc_driver_means", compute_intensity)
                        ).scaled(solar_flux)
    n_batches = stats.n_batches
    t_total = time.perf_counter() - t0
    if not quiet:
        print(f"Total time (secs, approx): {t_total:.1f}")

    res_m, res_e = stats.mean["results"], stats.stderr["results"]
    der_m, der_e = stats.mean["derived"], stats.stderr["derived"]

    cfg = dict(domain_file=domain_file, num_photons=n_photons * n_batches,
               num_batches=n_batches, use_ray_tracing=use_ray_tracing,
               use_russian_roulette=use_rr, use_hybrid=use_hybrid,
               hybrid_width=hybrid_width, solar_flux=solar_flux,
               solar_mu=solar_mu, solar_azimuth=solar_azimuth,
               surface_albedo=surface_albedo, use_rr_intensity=use_rr_intensity,
               zeta_min=zeta_min, limit_intensity=limit_intensity,
               max_intensity=max_intensity, seed=iseed,
               n_phase_intervals=n_phase_intervals, time_total=t_total,
               time_setup=t_setup, n_devices=mesh.devices.size)

    x_edges = np.asarray(domain.x_edges)
    y_edges = np.asarray(domain.y_edges)
    z_edges = np.asarray(domain.z_edges)
    np_ = lambda a: np.asarray(a)
    flux_up = (np_(res_m.flux_up), np_(res_e.flux_up))
    flux_down = (np_(res_m.flux_down), np_(res_e.flux_down))
    flux_abs = (np_(res_m.flux_absorbed), np_(res_e.flux_absorbed))
    if polarized:
        # Polarized transport tallies column absorption only.
        nz = domain.n_z
        zeros3 = np.zeros(flux_up[0].shape + (nz,), np.float32)
        profile = (np.zeros(nz, np.float32), np.zeros(nz, np.float32))
        volume = (zeros3, zeros3)
    else:
        profile = (np_(der_m["absorbed_profile"]), np_(der_e["absorbed_profile"]))
        volume = (np_(res_m.volume_absorption), np_(res_e.volume_absorption))
    radiance = ((np_(res_m.intensity), np_(res_e.intensity))
                if compute_intensity else None)
    mean_stats = [(float(der_m[k]), float(der_e[k]))
                  for k in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed")]

    # --- outputs (process 0 only on multi-host) -----------------------------
    import jax

    if jax.process_index() == 0:
        if out_flux:
            results_io.write_flux_ascii(out_flux, cfg, x_edges, y_edges, z_edges,
                                        mean_stats, flux_up, flux_down, flux_abs)
        if out_abs_prof:
            results_io.write_absorption_profile_ascii(out_abs_prof, cfg, z_edges, profile)
        if out_abs_vol:
            results_io.write_volume_absorption_ascii(out_abs_vol, cfg, x_edges,
                                                     y_edges, z_edges, volume)
        if out_rad and compute_intensity:
            results_io.write_radiance_ascii(out_rad, cfg, x_edges, y_edges, z_edges,
                                            mus, phis, radiance)
        if out_netcdf:
            results_io.write_results_netcdf(
                out_netcdf, cfg, x_edges, y_edges, z_edges,
                flux_up, flux_down, flux_abs,
                absorption_profile=profile if report_profile else None,
                absorbed_volume=volume if report_volume else None,
                intensity=radiance, intensity_mus=mus, intensity_phis=phis)
        if not quiet:
            print("Wrote results")

    return {"cfg": cfg, "mean_stats": mean_stats, "flux_up": flux_up,
            "flux_down": flux_down, "flux_absorbed": flux_abs,
            "absorbed_profile": profile, "volume": volume, "radiance": radiance,
            "stats": stats}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    profile_dir = None
    if "--profile" in argv:
        i = argv.index("--profile")
        profile_dir = argv[i + 1] if i + 1 < len(argv) else "profile_trace"
        argv = argv[:i] + argv[i + 2 if i + 1 < len(argv) else i + 1:]
    if len(argv) == 0:
        # getOneArgument's stdin fallback (userInterface_Unix.f95:70-99):
        # with no CLI argument the reference prompts for the file name.
        print("Enter the namelist file name: ", end="", flush=True)
        line = sys.stdin.readline().strip()
        if line:
            argv = [line]
    if len(argv) != 1:
        print("usage: python -m i3rc_tpu.drivers.monte_carlo_driver "
              "[--profile DIR] <namelist.nml>", file=sys.stderr)
        return 1
    if profile_dir:
        # Device trace + per-phase table: the cpu_time_setup/total analog
        # (monteCarloDriver.f95:255-259) at kernel resolution.
        import jax

        from i3rc_tpu.utils.profiling import profile_report
        with jax.profiler.trace(profile_dir):
            run_from_namelist(argv[0])
        print(profile_report(profile_dir), file=sys.stderr)
    else:
        run_from_namelist(argv[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
