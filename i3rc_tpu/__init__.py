"""i3rc_tpu — a TPU-native 3D Monte Carlo solar radiative transfer framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
I3RC community Monte Carlo model (reference: /root/reference, Fortran 95).
The reference's photon-serial tracing loop becomes a photon-parallel wavefront
kernel (masked ``lax.while_loop`` over wide structure-of-arrays photon
batches); its MPI batch decomposition becomes ``shard_map`` over a device mesh
with ``psum`` tally reduction; its Mersenne-Twister RNG becomes counter-based
Threefry streams keyed on (seed, batch, event) so results are independent of
the sharding layout.

Layer map (mirrors SURVEY.md section 1):
  utils/        L0 foundation (errors, namelist config, character utils)
  core/         L0/L1 numerics + physics data objects
  ops/          vectorized traversal + tally primitives (XLA and Pallas)
  integrators/  L2 the Monte Carlo solver
  parallel/     device-mesh batch data parallelism
  io/           netCDF-compatible artifact formats
  drivers/      L3 end-user programs (planeParallel, monteCarloDriver)
  models/       L5 benchmark scene generators (I3RC phase-1 cases)
  tools/        L4 preprocessing (Mie tables, property-file converters)
"""

__version__ = "0.1.0"

_EXPORTS = {
    "Domain": "i3rc_tpu.core.optics",
    "OpticalComponent": "i3rc_tpu.core.optics",
    "PhaseFunction": "i3rc_tpu.core.phase_functions",
    "PhaseFunctionTable": "i3rc_tpu.core.phase_functions",
    "SurfaceDescription": "i3rc_tpu.core.surface",
    "PhotonSource": "i3rc_tpu.core.illumination",
    "KDistribution": "i3rc_tpu.core.k_distribution",
    "Integrator": "i3rc_tpu.integrators.integrator",
    "IntegratorConfig": "i3rc_tpu.integrators.integrator",
    "Results": "i3rc_tpu.integrators.results",
    "PhaseMatrix": "i3rc_tpu.core.phase_matrices",
    "PhaseMatrixTable": "i3rc_tpu.core.phase_matrices",
    "PolarizedIntegrator": "i3rc_tpu.integrators.polarized",
    "PolarizedResults": "i3rc_tpu.integrators.polarized",
    "run_batches": "i3rc_tpu.parallel.mesh",
    "run_broadband": "i3rc_tpu.integrators.spectral",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    # Lazy exports keep `import i3rc_tpu` light: JAX and device state only
    # materialize when the integrator layer is actually touched.
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'i3rc_tpu' has no attribute '{name}'")
