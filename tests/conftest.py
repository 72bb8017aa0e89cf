"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on 8 virtual
CPU devices (the reference's analog is the no-MPI stub backend with identical
interfaces, Code/multipleProcesses_nompi.f95).

Note: the environment's axon (TPU) plugin registers itself from
sitecustomize and overwrites jax_platforms to "axon,cpu", so env vars alone
don't stick — the config must be updated after import, before first device
use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
