"""Broadband spectral loop over k-distributions.

The capability the reference declares but never finished (kDistribution.f95
stubs; BASELINE.json config 5: "Broadband LES cumulus: kDistribution
spectral loop + surface BRDF, sharded TPU mesh").

For each band: the domain gets a "Gas absorption" component whose 1D
extinction profile is the band's k-point profile (ssa = 0, isotropic phase —
matching how PhysicalPropertiesToDomain adds molecular absorption,
PhysicalPropertiesToDomain.f95:330-347).  One Integrator (one XLA
compilation) serves ALL the band's k points: per k, only the gas component's
extinction changes, and the re-flattened optics are pushed through the same
executable as a traced DeviceOptics argument.  Band results accumulate as

    total = sum_bands spectral_fraction_b * sum_k w_bk * Results_bk

with per-(band,k) batch statistics reduced over the device mesh like any
other run.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from i3rc_tpu.core.k_distribution import KDistribution
from i3rc_tpu.core.optics import Domain, flatten_optics
from i3rc_tpu.core.phase_functions import PhaseFunction, PhaseFunctionTable
from i3rc_tpu.integrators.integrator import Integrator, device_optics_from_flat
from i3rc_tpu.parallel.mesh import default_mesh, run_batches

# Cold-cache crossover between the fused single-dispatch loop and per-k
# baked Mosaic executables, in photons per k point (round-5 bench-chip
# measurement — see run_band's auto branch and BENCH_CASES.md).
BAKED_CROSSOVER_PHOTONS_PER_K = 4_000_000_000

GAS_COMPONENT_NAME = "Gas absorption"


def domain_with_gas_component(domain: Domain, profile: np.ndarray) -> Domain:
    """Domain plus a horizontally uniform pure-absorption component."""
    gas_table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(np.zeros(1))], key=[0.0],
        description=GAS_COMPONENT_NAME)
    profile = np.asarray(profile, dtype=np.float64)
    return domain.add_component(GAS_COMPONENT_NAME, profile,
                                np.zeros_like(profile),
                                np.zeros(profile.shape, np.int32), gas_table)


@dataclass(frozen=True)
class BandResult:
    """One band's accumulated (weighted) mean results and k-point details."""

    mean: object          # weighted pytree of Results over k points
    per_k: list           # list of BatchStats per k point
    wavelength_limits: tuple
    spectral_fraction: float
    # Standard error of the band mean, pytree matching `mean` (the
    # reference's (value, StdErr) statistical contract,
    # monteCarloDriver.f95:358-378).  Per-k modes combine independent
    # k-point runs as sqrt(sum_k (w_k se_k)^2); the fused mode's batches
    # are full weighted-band samples, so run_batches' stderr IS the band
    # stderr.
    stderr: object = None


def run_band(integrator: Integrator, base_domain: Domain, kdist: KDistribution,
             source, n_photons_per_batch, n_batches, seed=10, mesh=None,
             derive=None, derive_token=None, bake_fastpath=False,
             integrator_cache: dict | None = None, fuse_k=False):
    """All k points of one band through the band integrator's executable.

    ``bake_fastpath=True`` instead builds ONE Integrator per k point, so
    each k-point's gas profile is baked statically and eligible workloads
    ride the gas-channel fastpath (Pallas event-block kernel) — ~20x the
    traced-override throughput (PERF_NOTES.md round 2 "Gas-channel
    fastpath").  The cost is one compile per distinct k point; pass a
    long-lived ``integrator_cache`` dict so repeated band runs (production
    spectral loops, benchmark steady state) reuse the executables.

    ``fuse_k=True`` traces EVERY k point of the band in one dispatch
    through one executable (fastpath.GasKTables): k becomes a per-lane
    attribute, lanes partition by quadrature weight with exact per-k
    photon quotas, and the tallies accumulate the weighted band sum
    directly.  ``n_photons_per_batch`` keeps the per-k meaning of the
    other modes — each fused batch traces ``n_photons_per_batch * n_k``
    photons total, so switching modes never changes the photon budget.  Fluxes, radiance detectors (closed-shadow-eligible
    geometries: each lane adds its own k profile's gas tau to the shadow
    trace), and volume absorption (heating-rate bands: gas deaths invert
    the lane's cumulative Gz for their exact cell).  The returned
    BandResult.mean is the band mean as usual; per_k is empty
    (individual k-point statistics are not separated — each batch is a
    full weighted-band sample, so batch statistics measure the band
    mean's stderr, which is what the broadband loop propagates).

    ``fuse_k="auto"`` tries the fused dispatch and falls back when the
    workload is ineligible (non-gas-channel cloud shape, BRDF surface,
    non-default estimators, ...): to the per-k baked loop when the baked
    integrator still elects a fastpath plan, otherwise to the
    traced-override loop (one general-kernel executable for every k) —
    the production default for mixed-scene spectral sweeps.
    """
    profiles = kdist.absorption_profiles_on(np.asarray(base_domain.z_edges))
    if fuse_k == "auto":
        # Memoize the eligibility decision: an ineligible workload would
        # otherwise pay the failed fused Integrator.create plus a probe
        # build on EVERY band run of a production spectral loop.  The key
        # includes WHICH SIDE of the photon-budget crossover this call is
        # on — a small warm-up run must not pin the fused mode for a later
        # above-crossover production sweep (or vice versa).
        photons_per_k = int(n_photons_per_batch) * int(n_batches)
        above_crossover = photons_per_k >= BAKED_CROSSOVER_PHOTONS_PER_K
        dkey = ("auto_decision", id(kdist), id(base_domain), above_crossover)
        if integrator_cache is not None and dkey in integrator_cache:
            decision = integrator_cache[dkey][0]
            return run_band(integrator, base_domain, kdist, source,
                            n_photons_per_batch, n_batches, seed=seed,
                            mesh=mesh, derive=derive,
                            derive_token=derive_token,
                            integrator_cache=integrator_cache, **decision)
        # Budget-aware mode pick (round-5 bench-chip measurement, see
        # BENCH_CASES.md "broadband crossover"): per-photon, baked per-k
        # Mosaic executables run 2.5-5x faster than the fused XLA dispatch
        # (1.6e8 vs 6.6e7 photons/s at 2^23-photon batches; 3.2e8 at
        # 2^24), but cost one ~30-80 s Mosaic compile PER K POINT where
        # fused compiles once per band — so on a COLD compile cache baked
        # only wins above ~3-9e9 photons per k point.  Below the
        # crossover, fused-first; above it, baked-first when the baked
        # integrator elects the gas-channel fastpath.  (The persistent
        # compile cache, utils/compile_cache.py, makes every repeated
        # configuration warm, where baked wins at ANY budget — users
        # re-running production bands can force mode="baked".)
        if above_crossover:
            probe = Integrator.create(
                domain_with_gas_component(base_domain, profiles[:, 0]),
                config=integrator.config,
                surface_albedo=integrator._surface_albedo,
                surface=integrator._surface_arg,
                intensity_mus=integrator._intensity_mus,
                intensity_phis=integrator._intensity_phis)
            from i3rc_tpu.integrators import fastpath as _fp
            if _fp.fast_plan(probe.geometry, probe._flat, probe.optics,
                             probe.surface, probe.intensity,
                             probe.config) is not None:
                if integrator_cache is not None:
                    integrator_cache[dkey] = (dict(bake_fastpath=True),
                                              kdist, base_domain)
                return run_band(integrator, base_domain, kdist, source,
                                n_photons_per_batch, n_batches, seed=seed,
                                mesh=mesh, derive=derive,
                                derive_token=derive_token,
                                bake_fastpath=True,
                                integrator_cache=integrator_cache)
        try:
            band = run_band(integrator, base_domain, kdist, source,
                            n_photons_per_batch, n_batches, seed=seed,
                            mesh=mesh, derive=derive,
                            derive_token=derive_token, fuse_k=True,
                            integrator_cache=integrator_cache)
            if integrator_cache is not None:
                integrator_cache[dkey] = (dict(fuse_k=True), kdist,
                                          base_domain)
            return band
        except ValueError:
            # Fused ineligible.  Per-k baking only pays when the baked
            # integrator elects the gas-channel fastpath; when it would
            # land on the general kernel anyway, baking recompiles that
            # kernel n_k times where the traced-override loop pushes every
            # k point through ONE executable (round-2 broadband design).
            from i3rc_tpu.integrators import fastpath as _fp
            probe = Integrator.create(
                domain_with_gas_component(base_domain, profiles[:, 0]),
                config=integrator.config,
                surface_albedo=integrator._surface_albedo,
                surface=integrator._surface_arg,
                intensity_mus=integrator._intensity_mus,
                intensity_phis=integrator._intensity_phis)
            baked_fast = _fp.fast_plan(
                probe.geometry, probe._flat, probe.optics, probe.surface,
                probe.intensity, probe.config) is not None
            if integrator_cache is not None:
                integrator_cache[dkey] = (dict(bake_fastpath=baked_fast),
                                          kdist, base_domain)
            return run_band(integrator, base_domain, kdist, source,
                            n_photons_per_batch, n_batches, seed=seed,
                            mesh=mesh, derive=derive,
                            derive_token=derive_token,
                            bake_fastpath=baked_fast,
                            integrator_cache=integrator_cache)
    if fuse_k:
        cache = integrator_cache if integrator_cache is not None else {}
        # The entry retains (kdist, base_domain) alongside the integrator so
        # the id()-based key can never be served stale by id reuse after a
        # caller's objects are collected (same hazard ADVICE.md flagged for
        # run_batches' derive cache).
        ckey = ("fused", id(kdist), id(base_domain))
        hit = cache.get(ckey)
        if hit is not None:
            integ_f = hit[0]
        else:
            dom_0 = domain_with_gas_component(base_domain, profiles[:, 0])
            integ_f = Integrator.create(
                dom_0, config=integrator.config,
                surface_albedo=integrator._surface_albedo,
                surface=integrator._surface_arg,
                intensity_mus=integrator._intensity_mus,
                intensity_phis=integrator._intensity_phis,
                gas_k=(profiles.T, kdist.weights))
        stats = run_batches(integ_f, source,
                            n_photons_per_batch * kdist.n_k, n_batches,
                            seed=seed, mesh=mesh, derive=derive,
                            derive_token=derive_token)
        if hit is None:
            # Cache only after a successful dispatch: an ineligible
            # workload raises inside run_batches (batch_tracer's gas_k
            # guard), and auto-mode fallbacks must not leave an unusable
            # fused integrator behind.
            cache[ckey] = (integ_f, kdist, base_domain)
        return BandResult(mean=stats.mean, per_k=[],
                          wavelength_limits=kdist.wavelength_limits,
                          spectral_fraction=kdist.spectral_fraction,
                          stderr=stats.stderr)
    per_k = []
    mean_accum = None
    var_accum = None
    for k in range(kdist.n_k):
        if bake_fastpath:
            cache = integrator_cache if integrator_cache is not None else {}
            # Entries retain (kdist, base_domain) so the id()-based key can
            # never be served stale by id reuse (same hazard as the fused
            # cache above).
            ckey = (id(kdist), k, id(base_domain))
            hit_k = cache.get(ckey)
            if hit_k is not None:
                integ_k = hit_k[0]
            else:
                dom_k = domain_with_gas_component(base_domain, profiles[:, k])
                integ_k = Integrator.create(
                    dom_k, config=integrator.config,
                    surface_albedo=integrator._surface_albedo,
                    surface=integrator._surface_arg,
                    intensity_mus=integrator._intensity_mus,
                    intensity_phis=integrator._intensity_phis)
                cache[ckey] = (integ_k, kdist, base_domain)
            stats = run_batches(integ_k, source, n_photons_per_batch,
                                n_batches, seed=seed + 1000 * k, mesh=mesh,
                                derive=derive, derive_token=derive_token)
        else:
            dom_k = domain_with_gas_component(base_domain, profiles[:, k])
            optics_k = device_optics_from_flat(
                flatten_optics(dom_k), integrator.config.majorant_block_size)
            stats = run_batches(integrator, source, n_photons_per_batch,
                                n_batches, seed=seed + 1000 * k, mesh=mesh,
                                derive=derive, derive_token=derive_token,
                                optics_override=optics_k)
        per_k.append(stats)
        w = float(kdist.weights[k])
        tree = stats.mean
        mean_accum = jax.tree.map(
            lambda a, acc=None: a * w, tree) if mean_accum is None else \
            jax.tree.map(lambda acc, a: acc + a * w, mean_accum, tree)
        var_accum = jax.tree.map(
            lambda s: (s * w) ** 2, stats.stderr) if var_accum is None else \
            jax.tree.map(lambda acc, s: acc + (s * w) ** 2, var_accum,
                         stats.stderr)
    return BandResult(mean=mean_accum, per_k=per_k,
                      wavelength_limits=kdist.wavelength_limits,
                      spectral_fraction=kdist.spectral_fraction,
                      stderr=jax.tree.map(jax.numpy.sqrt, var_accum))


def run_broadband(base_domain: Domain, k_distributions, source,
                  n_photons_per_batch: int, n_batches: int, seed: int = 10,
                  mesh=None, config=None, surface_albedo: float = 0.0,
                  surface=None, intensity_mus=None, intensity_phis=None,
                  band_domains=None, derive=None, derive_token=None,
                  bake_fastpath=False, integrator_cache: dict | None = None,
                  fuse_k=False):
    """The broadband driver: spectral loop over bands and k points.

    ``band_domains`` optionally supplies a per-band Domain (per-band cloud
    optics, e.g. Mie tables at each band's wavelength); otherwise the same
    base_domain is reused.  Returns (broadband_mean_tree, [BandResult...]):
    the broadband tree is the spectral-fraction-weighted sum over bands.
    """
    mesh = mesh or default_mesh()
    bands = list(k_distributions)
    results = []
    broadband = None
    for b, kdist in enumerate(bands):
        dom_b = band_domains[b] if band_domains is not None else base_domain
        # One compile per band: the integrator is built WITH a gas component
        # (k point 0) so shapes match every subsequent override.
        dom_gas = domain_with_gas_component(
            dom_b, kdist.absorption_profiles_on(np.asarray(dom_b.z_edges))[:, 0])
        integ = Integrator.create(dom_gas, config=config,
                                  surface_albedo=surface_albedo, surface=surface,
                                  intensity_mus=intensity_mus,
                                  intensity_phis=intensity_phis)
        band = run_band(integ, dom_b, kdist, source, n_photons_per_batch,
                        n_batches, seed=seed + 100000 * b, mesh=mesh,
                        derive=derive, derive_token=derive_token,
                        bake_fastpath=bake_fastpath,
                        integrator_cache=integrator_cache, fuse_k=fuse_k)
        results.append(band)
        contrib = jax.tree.map(lambda a: a * band.spectral_fraction, band.mean)
        broadband = contrib if broadband is None else jax.tree.map(
            lambda acc, a: acc + a, broadband, contrib)
    return broadband, results
