"""The user-facing Monte Carlo integrator.

Maps the reference's integrator lifecycle (new_Integrator / specifyParameters
/ computeRadiativeTransfer / reportResults, Integrators/
monteCarloRadiativeTransfer.f95:154-156) onto an immutable object:

    integ = Integrator.create(domain, config=..., surface_albedo=...,
                              intensity_mus=[...], intensity_phis=[...])
    results = integ.compute(key, source, n_photons)   # one batch
    results.mean_flux_up, results.flux_down, ...

``create`` flattens the domain once, builds the phase-function tables at the
configured resolutions, and bakes everything into a jitted batch tracer.
``with_params`` returns a reconfigured copy (the specifyParameters analog —
immutability replaces the reference's single mutation point).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.core.optics import Domain, FlatOptics, flatten_optics
from i3rc_tpu.core.surface import BRDF_REGISTRY, SurfaceDescription
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.results import Results, column_weights, normalize_tallies
from i3rc_tpu.integrators.tables import (
    build_forward_tables,
    build_inverse_cubic,
    hybridize,
)
from i3rc_tpu.integrators.wavefront import (
    DeviceOptics,
    DeviceTables,
    IntensitySpec,
    SurfaceSpec,
    make_batch_tracer,
)
from i3rc_tpu.ops.dda import EXIT_BOT, EXIT_TOP, GridGeometry
from i3rc_tpu.utils import compile_cache
from i3rc_tpu.utils.errors import Status

# Long transport compiles (Mosaic event blocks ~2 min, queued-radiance
# Iwabuchi ~5.5 min) persist across processes; see utils/compile_cache.
# Enabled lazily at Integrator.create — not at import — so the backend is
# already resolved (the cache dir is keyed by platform + host features)
# and an embedding application's own jax.config is never clobbered.


def majorant_block_shape(grid_shape, block_size: int):
    """Per-axis block sizes: the largest divisor of each axis <= block_size.

    Returns None when the requested size is 0 (reference behavior: one
    global maximum cross-section, monteCarloRadiativeTransfer.f95:439).
    """
    if block_size <= 0:
        return None

    def best_divisor(n):
        b = min(block_size, n)
        while n % b:
            b -= 1
        return b

    return tuple(best_divisor(n) for n in grid_shape)


def block_majorants(total_ext: np.ndarray, blocks) -> np.ndarray:
    """Per-super-voxel maximum extinction, flattened C-order."""
    nx, ny, nz = total_ext.shape
    bx, by, bz = blocks
    r = total_ext.reshape(nx // bx, bx, ny // by, by, nz // bz, bz)
    return r.max(axis=(1, 3, 5)).ravel()


def device_optics_from_flat(flat: FlatOptics, majorant_block_size: int = 0) -> DeviceOptics:
    """Pack FlatOptics into the kernel's device pytree (see DeviceOptics)."""
    n_cells = flat.total_ext.size
    n_comp = flat.n_components
    cell_matrix = np.concatenate([
        flat.total_ext.reshape(n_cells, 1),
        flat.cumulative_ext.reshape(n_cells, n_comp),
        # CO-albedo: keeps the absorbed fraction of nearly-conservative
        # media at full relative accuracy through the one-hot read.
        1.0 - flat.ssa.reshape(n_cells, n_comp),
        flat.phase_index.reshape(n_cells, n_comp).astype(np.float32),
    ], axis=1)
    blocks = majorant_block_shape(flat.total_ext.shape, majorant_block_size)
    majorant = (block_majorants(flat.total_ext, blocks) if blocks
                else np.zeros(0, np.float32))
    # Single-component uniformity flags (kernel specializations).  Only
    # cells with extinction matter: ssa/phase values are never consumed
    # where no physical collision can occur.
    uniform_ssa = uniform_pf = None
    if n_comp == 1:
        occupied = flat.total_ext.ravel() > 0.0
        if occupied.any():
            s = flat.ssa.ravel()[occupied]
            p = flat.phase_index.ravel()[occupied]
            if np.all(s == s[0]):
                uniform_ssa = float(s[0])
            if np.all(p == p[0]):
                uniform_pf = int(p[0])
    return DeviceOptics(
        uniform_ssa=uniform_ssa,
        uniform_phase_index=uniform_pf,
        cell_matrix=jnp.asarray(cell_matrix),
        total_ext=jnp.asarray(flat.total_ext.ravel()),
        cumulative_ext=jnp.asarray(flat.cumulative_ext.ravel()),
        ssa=jnp.asarray(flat.ssa.ravel()),
        phase_index=jnp.asarray(flat.phase_index.ravel(), dtype=jnp.int32),
        max_extinction=jnp.float32(flat.max_extinction),
        block_majorant=jnp.asarray(majorant, dtype=jnp.float32),
        n_components=n_comp,
    )


def coarse_geometry(domain: Domain, blocks) -> GridGeometry:
    """Super-voxel grid geometry: every (bx, by, bz)-th fine edge."""
    bx, by, bz = blocks
    return GridGeometry.from_edges(
        domain.x_edges[::bx], domain.y_edges[::by], domain.z_edges[::bz],
        domain.xy_regularly_spaced, domain.z_regularly_spaced)


@dataclass(frozen=True)
class Integrator:
    """Immutable, device-resident radiative transfer solver for one domain."""

    geometry: GridGeometry
    optics: DeviceOptics
    tables: DeviceTables
    surface: SurfaceSpec
    intensity: IntensitySpec | None
    config: IntegratorConfig
    coarse_geometry: object
    _flat: FlatOptics
    _col_weights: np.ndarray
    _dz: np.ndarray
    _domain: Domain
    _surface_arg: SurfaceDescription | None
    _surface_albedo: float
    _intensity_mus: object
    _intensity_phis: object
    # Fused spectral-k batching (fastpath.GasKTables): (profiles, weights)
    # with profiles (n_k, n_z).  Set via create(gas_k=...); requires a
    # gas-channel fastpath plan.  See integrators/spectral.py run_band.
    _gas_k: object = None

    # ------------------------------------------------------------------
    @staticmethod
    def create(domain: Domain, config: IntegratorConfig | None = None,
               surface_albedo: float = 0.0,
               surface: SurfaceDescription | None = None,
               intensity_mus=None, intensity_phis=None,
               gas_k=None) -> "Integrator":
        """new_Integrator + specifyParameters in one constructor.

        ``gas_k=(profiles, weights)`` with profiles (n_k, n_z) enables fused
        spectral-k batching: the domain must carry the gas-channel shape
        (spectral.domain_with_gas_component); every k point of the band
        then traces in one dispatch (fastpath.GasKTables).  Fluxes,
        radiance detectors (closed-shadow-eligible plans), and volume
        absorption (gas deaths invert the lane's cumulative gas depth for
        their exact cell) are all supported.
        """
        compile_cache.enable()
        config = (config or IntegratorConfig()).validate()
        s = Status()
        s.fail_if(surface is not None and surface_albedo != 0.0,
                  "only one surface specification can be provided")
        s.fail_if(not (0.0 <= surface_albedo <= 1.0), "surface albedo out of range")
        s.fail_if((intensity_mus is None) != (intensity_phis is None),
                  "both or neither of intensityMus and intensityPhis must be supplied")
        if intensity_mus is not None:
            mus = np.atleast_1d(np.asarray(intensity_mus, dtype=np.float64))
            phis = np.atleast_1d(np.asarray(intensity_phis, dtype=np.float64))
            s.fail_if(mus.size != phis.size,
                      "intensityMus and intensityPhis must be the same length")
            s.fail_if(bool(np.any(np.abs(mus) > 1.0)), "intensityMus must be in [-1, 1]")
            s.fail_if(bool(np.any(np.abs(mus) < 1e-30)),
                      "intensityMus can't be 0 (directly sideways)")
            s.fail_if(bool(np.any((phis < 0.0) | (phis > 360.0))),
                      "intensityPhis must be between 0 and 360")
        if gas_k is not None:
            prof_k = np.asarray(gas_k[0], np.float64)
            w_k = np.atleast_1d(np.asarray(gas_k[1], np.float64))
            n_z_dom = len(domain.z_edges) - 1
            s.fail_if(prof_k.ndim != 2 or prof_k.shape[1] != n_z_dom,
                      "gas_k profiles must be (n_k, n_z)")
            s.fail_if(prof_k.ndim == 2 and prof_k.shape[0] != w_k.size,
                      "gas_k profiles and weights disagree on n_k")
            s.fail_if(bool(np.any(w_k <= 0.0)), "gas_k weights must be > 0")
            s.fail_if(bool(np.any(prof_k < 0.0)),
                      "gas_k profiles must be non-negative")
            gas_k = (prof_k, w_k)
        s.check("Integrator.create")

        flat = flatten_optics(domain)
        geom = GridGeometry.from_edges(domain.x_edges, domain.y_edges, domain.z_edges,
                                       domain.xy_regularly_spaced, domain.z_regularly_spaced)

        # Serial-gather domains (> ONEHOT_MAX_ROWS cells) default to
        # super-voxel Woodcock transport: with a single global majorant a
        # heterogeneous 1.95M-cell scene spends nearly all its events on
        # null collisions, and each event pays a ~35 ns/lane serialized
        # read (benchmarks/gather_probe.py).  Block majorants are exact in
        # expectation (same estimator, fewer tentative collisions); an
        # explicit majorant_block_size always wins.
        from i3rc_tpu.ops.gather import ONEHOT_MAX_ROWS
        if config.majorant_block_size == 0 and flat.total_ext.size > ONEHOT_MAX_ROWS:
            # blk=8 measured best on Landsat (1.57M vs 1.35M ph/s at blk=16;
            # blk=4 loses to coarse-DDA crossing count — benchmarks sweep).
            config = replace(config, majorant_block_size=8)
        if (intensity_mus is not None
                and flat.total_ext.size > ONEHOT_MAX_ROWS
                and config.majorant_block_size > 0
                and not config.use_ratio_tracking_for_intensity
                and not config.use_russian_roulette_for_intensity):
            # Local estimation on serial-gather domains: the deterministic
            # cell-by-cell trace pays a serialized gather per crossing per
            # (lane, detector) pseudo-lane — measured 3.1e3 photons/s on the
            # Landsat + 2-detector case.  Ratio tracking bounds the cost at
            # O(majorant optical depth) per contribution; unbiased, same
            # expectation, extra variance.  Explicit estimator choices
            # (Iwabuchi roulette, or ratio tracking itself) are respected.
            import warnings as _warnings

            from i3rc_tpu.utils.errors import I3RCWarning
            _warnings.warn(
                "large domain with radiance detectors: enabling ratio-"
                "tracking transmittance (unbiased; set "
                "use_russian_roulette_for_intensity for the Iwabuchi "
                "estimator instead)", I3RCWarning, stacklevel=2)
            config = replace(config, use_ratio_tracking_for_intensity=True)

        # Device optics: per-cell quantities packed as columns of one matrix
        # so the kernel fetches everything with a single fused one-hot matmul
        # (see wavefront.py docstring); flat copies back the serial fallback.
        optics = device_optics_from_flat(flat, config.majorant_block_size)
        blocks = majorant_block_shape(flat.total_ext.shape, config.majorant_block_size)
        coarse_geom = coarse_geometry(domain, blocks) if blocks else None

        # Tables: inverse CDF always; forward only when intensity is requested.
        compute_intensity = intensity_mus is not None
        cubic = build_inverse_cubic(flat)
        fwd = fwd_orig = None
        if compute_intensity:
            fwd_orig_np = build_forward_tables(flat, config.min_forward_table_size)
            fwd_np = fwd_orig_np
            if config.use_hybrid_phase_funs and config.hybrid_phase_fun_width > 0.0:
                fwd_np = hybridize(fwd_orig_np, config.hybrid_phase_fun_width)
            fwd = jnp.asarray(fwd_np.ravel())
            fwd_orig = jnp.asarray(fwd_orig_np.ravel())
        tables = DeviceTables(
            inverse_cubic=jnp.asarray(cubic.reshape(-1, 4)),
            n_segments=cubic.shape[2],
            forward=fwd, forward_orig=fwd_orig,
            n_forward_steps=config.min_forward_table_size if compute_intensity else 0,
            max_entries=cubic.shape[1],
        )

        if surface is not None:
            sspec = SurfaceSpec(
                brdf_fn=BRDF_REGISTRY[surface.brdf_name],
                params=jnp.asarray(surface.parameters.reshape(-1, surface.n_parameters)),
                x_edges=jnp.asarray(surface.x_edges, dtype=jnp.float32),
                y_edges=jnp.asarray(surface.y_edges, dtype=jnp.float32),
                n_xs=surface.parameters.shape[0], n_ys=surface.parameters.shape[1])
        else:
            sspec = SurfaceSpec(albedo=float(surface_albedo))

        ispec = None
        if compute_intensity:
            phis_rad = np.deg2rad(phis)
            sin_t = np.sqrt(np.maximum(1.0 - mus**2, 0.0))
            dirs = np.stack([sin_t * np.cos(phis_rad), sin_t * np.sin(phis_rad), mus])
            ispec = IntensitySpec(
                directions=jnp.asarray(dirs, dtype=jnp.float32),
                abs_mu=jnp.asarray(np.abs(mus), dtype=jnp.float32),
                exit_status=jnp.asarray(np.where(mus > 0, EXIT_TOP, EXIT_BOT),
                                        dtype=jnp.int32),
                n_directions=mus.size)

        return Integrator(
            geometry=geom, optics=optics, tables=tables, surface=sspec,
            intensity=ispec, config=config, coarse_geometry=coarse_geom, _flat=flat,
            _col_weights=column_weights(domain.x_edges, domain.y_edges),
            _dz=np.diff(np.asarray(domain.z_edges, dtype=np.float64)).astype(np.float32),
            _domain=domain, _surface_arg=surface, _surface_albedo=float(surface_albedo),
            _intensity_mus=None if intensity_mus is None else np.asarray(intensity_mus),
            _intensity_phis=None if intensity_phis is None else np.asarray(intensity_phis),
            _gas_k=gas_k,
        )

    # ------------------------------------------------------------------
    def with_params(self, **kwargs) -> "Integrator":
        """Reconfigure and rebuild (the specifyParameters analog, :830-1069).

        Accepts any IntegratorConfig field plus surface_albedo / surface /
        intensity_mus / intensity_phis.  Returns a new Integrator;
        immutability replaces the reference's in-place mutation.
        """
        cfg_updates = {k: v for k, v in kwargs.items() if hasattr(self.config, k)}
        other = {k: v for k, v in kwargs.items() if not hasattr(self.config, k)}
        unknown = set(other) - {"surface_albedo", "surface", "intensity_mus",
                                "intensity_phis"}
        if unknown:
            raise TypeError(f"with_params: unknown parameters {sorted(unknown)}")
        surface = other.get("surface", self._surface_arg)
        albedo = other.get("surface_albedo",
                           0.0 if "surface" in other else self._surface_albedo)
        mus = other.get("intensity_mus", self._intensity_mus)
        phis = other.get("intensity_phis", self._intensity_phis)
        return Integrator.create(self._domain, config=replace(self.config, **cfg_updates),
                                 surface_albedo=albedo, surface=surface,
                                 intensity_mus=mus, intensity_phis=phis,
                                 gas_k=self._gas_k)

    @property
    def is_ready(self) -> bool:
        """isReady_Integrator analog — construction guarantees readiness."""
        return True

    @property
    def grid_shape(self):
        return (self.geometry.n_x, self.geometry.n_y, self.geometry.n_z)

    # ------------------------------------------------------------------
    def batch_tracer(self, n_photons: int, n_lanes: int | None = None):
        """The raw jittable (key, PhotonBatch, source) -> RawTallies function.

        Eligible workloads dispatch to the fused elementwise fastpath
        (integrators/fastpath.py); anything it can't express — spectral
        optics overrides included — uses the general wavefront kernel.
        (The fastpath CAN trace a gas-channel override — traced per-k
        values through one executable, tests/test_external_validation.py —
        but measured SLOWER than the general kernel on TPU: traced chain
        values can't compress, so every z layer becomes a segment face and
        events/photon balloon.  Overrides therefore stay general; the
        baked gas channel keeps the fastpath for monochromatic runs.)
        """
        from i3rc_tpu.integrators.fastpath import make_fast_tracer

        general = make_batch_tracer(self.geometry, self.optics, self.tables,
                                    self.surface, self.intensity, self.config,
                                    n_photons, n_lanes,
                                    coarse_geom=self.coarse_geometry)
        plan = self._fast_plan
        if self._gas_k is not None:
            # Fused spectral-k batching: the whole band in one dispatch.
            # Requires the gas-channel fastpath shape — fail loudly rather
            # than silently tracing only the k=0 profile on a fallback.
            from dataclasses import replace as _replace

            from i3rc_tpu.integrators.fastpath import GasKTables
            if plan is None or plan.gas_factor is None:
                raise ValueError(
                    "gas_k spectral batching requires a gas-channel "
                    "fastpath plan (separable cloud + horizontally uniform "
                    "pure-absorber component; radiance detectors "
                    "additionally need closed-shadow eligibility — at most "
                    "one varying horizontal factor and |mu_d| > 1e-6; see "
                    "fastpath.fast_plan)")
            plan = _replace(plan, gas_k=GasKTables(*self._gas_k))
            fast = make_fast_tracer(self.geometry, plan, self.config,
                                    n_photons, n_lanes)

            def trace_k(key, batch, source=None, optics_override=None):
                if optics_override is not None:
                    raise ValueError("gas_k batching bakes every k profile; "
                                     "optics overrides don't apply")
                return fast(key, batch, source)

            return trace_k
        if plan is None:
            return general
        fast = make_fast_tracer(self.geometry, plan, self.config, n_photons, n_lanes)

        def trace(key, batch, source=None, optics_override=None):
            if optics_override is not None:
                return general(key, batch, source, optics_override)
            return fast(key, batch, source)

        return trace

    @property
    def _fast_plan(self):
        """The (host-side) fastpath plan, computed once per integrator.

        Used both to dispatch batch_tracer and to pick the default lane
        width — plan construction includes table fits, so it is cached.
        """
        if "_fast_plan_cache" not in self.__dict__:
            from i3rc_tpu.integrators.fastpath import fast_plan

            self.__dict__["_fast_plan_cache"] = fast_plan(
                self.geometry, self._flat, self.optics, self.surface,
                self.intensity, self.config)
        return self.__dict__["_fast_plan_cache"]

    @property
    def _default_lanes(self) -> int:
        """Workload-tuned wavefront width when the caller passes none.

        Column media default to narrow wavefronts: their per-event factored
        one-hot column read scales super-linearly with lane count (2^15
        lanes measured 1.5x the throughput of 2^17 on the full Landsat
        scene — PERF_NOTES.md round-3 column ledger); everything else
        stays wide.  Serial-gather radiance (the chained ratio-tracking
        tracer) goes NARROWER still: lanes freeze while their ray slots
        drain, and the round-5 bench-chip scan measured 2^13 lanes 2.7x
        faster than 2^15 at equal dispatch (Landsat + 2 detectors).
        """
        from i3rc_tpu.ops.gather import ONEHOT_MAX_ROWS
        if (self.intensity is not None
                and self._flat.total_ext.size > ONEHOT_MAX_ROWS
                and self.config.use_ratio_tracking_for_intensity
                # ... but only when the CHAINED tracer actually engages
                # (mirror make_batch_tracer's eligibility: weight-1 class);
                # the inline general kernel stays wide-friendly, and 2^13
                # lanes on it would be a large regression.
                and not self.surface.uses_brdf
                and float(self.surface.albedo) == 0.0
                and self.optics.n_components == 1
                and self.optics.uniform_ssa is not None
                and self.optics.uniform_phase_index is not None
                and not self.config.compute_volume_absorption
                and not self.config.use_hybrid_phase_funs
                and not self.config.limit_intensity_contributions
                and self.config.majorant_block_size > 0
                and not self.config.use_ray_tracing):
            return 1 << 13
        plan = self._fast_plan
        return (1 << 15) if (plan is not None
                             and plan.column_data is not None) else (1 << 20)

    def batch_fn(self, source: PhotonSource, n_photons: int,
                 n_lanes: int | None = None):
        """Compiled (key[, optics]) -> Results; cached per (source, sizes).

        The optional second argument swaps in a different DeviceOptics of the
        same shape through the SAME executable — the spectral k-distribution
        loop's mechanism (see spectral.py).
        """
        cache = self.__dict__.setdefault("_compiled_cache", {})
        lanes = int(n_lanes or min(n_photons, self._default_lanes))
        cache_key = (source, int(n_photons), lanes)
        if cache_key not in cache:
            n_dirs = self.intensity.n_directions if self.intensity else 0
            tracer = self.batch_tracer(n_photons, lanes)

            @jax.jit
            def run(k, optics_override=None):
                k_src, k_trace = jax.random.split(k)
                batch = source.sample(k_src, lanes)
                raw = tracer(k_trace, batch, source, optics_override)
                return normalize_tallies(raw, self.geometry.n_x, self.geometry.n_y,
                                         self.geometry.n_z, n_dirs,
                                         self.optics.n_components,
                                         self._col_weights, self._dz)

            cache[cache_key] = run
        return cache[cache_key]

    def compute(self, key: jax.Array, source: PhotonSource, n_photons: int) -> Results:
        """Trace one batch of photons and return normalized results.

        The computeRadiativeTransfer analog (:262-398).  ``key`` is the batch
        stream (e.g. rng.batch_key(seed, batch_index)).
        """
        return self.batch_fn(source, n_photons)(key)
