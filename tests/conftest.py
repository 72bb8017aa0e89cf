"""Test configuration: force an 8-device virtual CPU mesh + suite tiers.

Multi-chip hardware is not available in CI; sharding tests run on 8 virtual
CPU devices (the reference's analog is the no-MPI stub backend with identical
interfaces, Code/multipleProcesses_nompi.f95).

Note: the environment's axon (TPU) plugin registers itself from
sitecustomize and overwrites jax_platforms to "axon,cpu", so env vars alone
don't stick — the config must be updated after import, before first device
use.

Suite tiers: the heavy statistical cross-checks (large photon counts,
kernel-vs-kernel and oracle gates at tight sigma) are marked ``slow`` and
skipped by default so ``pytest -q`` stays a <5-minute gate; run the FULL
~40-minute suite with ``pytest --slow`` before release-grade changes to the
transport kernels.  The slow list lives here (node-id substrings) so test
files stay unmarked.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Heavy statistical tests (measured >= ~12 s each; ~2/3 of total wall time).
# Everything here is a high-photon-count consistency gate whose failure
# modes are statistical drift, not smoke breakage — the quick tier keeps at
# least one cheap test of every feature they cover.
SLOW_TESTS = [
    "test_spectral.py::test_broadband_fuse_k_matches_baked",
    "test_spectral.py::test_fuse_k_volume_absorption_matches_baked",
    "test_spectral.py::test_fuse_k_radiance_matches_baked",
    "test_spectral.py::test_fuse_k_tabulated_cloud_matches_traced",
    "test_external_validation.py::test_step_cloud_anchor",
    "test_external_validation.py::test_conservative_slab_vs_oracle[18.0-0.5-65536-fast]",
    "test_external_validation.py::test_conservative_slab_vs_oracle[1.0-0.5-262144-fast]",
    "test_sharded_domain.py::test_sharded_matches_single_device",
    "test_fastpath.py::test_fastpath_radiance_matches_general_kernel",
    "test_fastpath.py::test_fastpath_absorbing_radiance_matches_general",
    "test_fastpath.py::test_absorbing_reflecting_volume_combo",
    "test_fastpath.py::test_reflecting_surface_radiance",
    "test_fastpath.py::test_absorbing_cloud_is_eligible",
    "test_fastpath.py::test_volume_absorption_on_fastpath",
    "test_fastpath.py::test_fastpath_matches_general_kernel",
    "test_fastpath.py::test_pallas_event_block_matches_xla_fastpath",
    "test_fastpath.py::test_pallas_matches_xla_reflecting_surface",
    "test_fastpath.py::test_pallas_matches_xla_gas_channel",
    "test_fastpath.py::test_column_medium_matches_general_kernel",
    "test_fastpath.py::test_reflecting_surface_on_fastpath",
    "test_fastpath.py::test_tabulated_phase_on_fastpath",
    "test_fastpath.py::test_tabulated_phase_radiance_on_fastpath",
    "test_fastpath.py::test_closed_shadow_matches_marching_trace",
    "test_fastpath.py::test_gas_channel_eligibility_and_closure",
    "test_fastpath.py::test_gas_channel_tabulated_phase_matches_general",
    "test_fastpath.py::test_gas_radiance_matches_general_kernel",
    "test_fastpath.py::test_fastpath_refill_budget_exact",
    "test_fastpath.py::test_multi_entry_column_props_matches_general_kernel",
    "test_fastpath.py::test_column_volume_absorption_matches_general",
    "test_integrator.py::test_wavefront_matches_scalar_oracle_step_cloud",
    "test_integrator.py::test_single_scattering_radiance",
    "test_integrator.py::test_conservative_energy_closure",
    "test_parallel.py::test_two_process_distributed",
    "test_tools.py::test_physical_to_domain_pipeline",
    "test_tools.py::test_make_mie_table_water",
    "test_drivers.py::test_monte_carlo_driver_flux_outputs",
    "test_drivers.py::test_broadband_driver",
    "test_variance_reduction.py::test_ratio_tracking_unbiased",
    "test_variance_reduction.py::test_intensity_mode_agreement",
    "test_variance_reduction.py::test_barker_clipping_redistributes",
    "test_variance_reduction.py::test_iwabuchi_rr_unbiased",
    "test_variance_reduction.py::test_hybrid_with_orig_orders",
    "test_variance_reduction.py::test_hybrid_phase_functions",
    "test_phase_functions.py::test_legendre_projection_roundtrip",
    "test_external_validation.py::test_absorbing_slab_vs_oracle",
    "test_external_validation.py::test_gas_channel_slab_vs_oracle",
    "test_external_validation.py::test_pallas_fastpath_slab_vs_oracle",
    "test_external_validation.py::test_gas_override_spectral_path_vs_oracle",
    "test_spectral.py::test_broadband_beer_lambert",
    "test_spectral.py::test_broadband_bake_fastpath_matches_traced",
    "test_external_validation.py::test_cpp_oracle_radar_cloud_c1",
    "test_external_validation.py::test_cpp_oracle_step_cloud_radiances",
    "test_external_validation.py::test_cpp_oracle_landsat_flux",
    "test_misc_features.py::test_irregular_z_grid_energy_closure",
    # Late-round-3 retier (quick gate crept to ~9 min): the interpret-mode
    # Pallas radiance cross-checks, the sharded radiance detectors, and
    # further >=19 s statistical gates whose features keep a cheap quick
    # test (pallas radiance smoke, fuse_k beer-lambert, serial-path
    # matches-onehot).
    "test_fastpath.py::test_pallas_matches_xla_radiance_detectors",
    "test_fastpath.py::test_pallas_radiance_with_gas_channel",
    "test_sharded_domain.py::test_sharded_radiance_detectors",
    "test_spectral.py::test_fuse_k_volume_absorption_beer_lambert",
    "test_serial_path.py::test_serial_path_radiance_matches_onehot",
    "test_serial_path.py::test_chained_flux_tracer_matches_plain_general",
    # 35 s statistical consistency gate; the deterministic closed-form BRDF
    # radiance pins stay in the quick tier.
    "test_misc_features.py::test_brdf_lambertian_equivalence_radiance",
    # Round-4 statistical gates vs the general kernel (BRDF fastpath,
    # fastpath Iwabuchi, chained/sharded radiance, multi-component
    # sharding).  Quick tier keeps: test_brdf_surface_on_fastpath
    # (closed-form transparent-domain gates), the deterministic
    # test_brdf_radiance pin inside test_brdf_radiance_on_fastpath's slow
    # sibling is covered by test_pallas_matches_xla_brdf_surface, and
    # test_ratio_tracking_upgrades_to_exact_on_fastpath.
    "test_fastpath.py::test_brdf_flux_matches_general_kernel",
    "test_fastpath.py::test_brdf_radiance_matches_general_kernel",
    "test_fastpath.py::test_iwabuchi_on_fastpath",
    "test_serial_path.py::test_chained_radiance_tracer_matches_inline",
    "test_sharded_domain.py::test_sharded_multicomponent_tabulated",
    # Round-5 polarized statistical gates; quick tier keeps the matrix
    # core, energy closure, single-scattering analytic Stokes pins, the
    # netCDF roundtrip, and the driver end-to-end run.
    "test_polarized.py::test_identity_matrix_matches_scalar_kernel",
    "test_polarized.py::test_lambertian_surface_depolarizes",
    "test_polarized.py::test_polarized_multicomponent",
]


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run the heavy statistical suite (~40 min total)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(
        reason="slow statistical gate; run with --slow for the full suite")
    for item in items:
        if any(s in item.nodeid for s in SLOW_TESTS):
            item.add_marker(skip)
