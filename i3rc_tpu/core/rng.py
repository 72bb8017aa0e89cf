"""Counter-based random streams for Monte Carlo photon transport.

The reference uses a stateful Mersenne Twister seeded per batch with
``(iseed, batch)`` (Code/RandomNumbersForMC.f95:169-239;
Example-Drivers/monteCarloDriver.f95:277) so every batch is a decorrelated
stream but results depend on how batches map to ranks only through batch ids.

The TPU design replaces this with JAX's counter-based Threefry: a key is
derived as fold_in(fold_in(seed_key, batch), event_step), and each draw is a
wide vector across photon lanes.  Consequences (all strictly better than the
reference while preserving its statistical contract):

  * results are bitwise independent of the device mesh / sharding layout,
  * any batch can be replayed in isolation (free elastic recovery),
  * no sequential state to thread through the kernel.

Validation against the Fortran code is therefore statistical (2-sigma),
never bitwise — see SURVEY.md section 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Smallest positive normal float32: lower bound for -log(u) arguments,
# mirroring the reference's max(tiny(x), u) guard
# (Integrators/monteCarloRadiativeTransfer.f95:480).
# np scalar (not a jax array): usable as a closure constant inside Pallas
# kernels, where captured concrete jax arrays are rejected.
TINY = np.float32(1.1754944e-38)


def batch_key(seed: int, batch: int, impl: str | None = None) -> jax.Array:
    """Decorrelated stream for one batch: the (iseed, batch) analog.

    ``impl`` selects the generator ("threefry2x32" default; "rbg" uses the
    TPU-native hardware RngBitGenerator for the wide per-event draws while
    keying/splitting stays threefry — measured ~13% faster end-to-end on the
    transport kernel with indistinguishable statistics).  The impl rides on
    the typed key through every downstream fold_in/split/uniform, so kernels
    never need to know.  Either choice meets the reference's contract
    (statistical independence between batches, RandomNumbersForMC.f95:169-239).
    """
    base = (jax.random.PRNGKey(seed) if impl is None
            else jax.random.key(seed, impl=impl))
    return jax.random.fold_in(base, batch)


def event_key(key: jax.Array, step) -> jax.Array:
    """Sub-stream for one event step inside the transport loop."""
    return jax.random.fold_in(key, step)


def uniforms(key: jax.Array, shape, n: int):
    """n independent U(0,1) float32 arrays of the given shape.

    One call per transport event supplies all random numbers that event
    needs across every photon lane.
    """
    ks = jax.random.split(key, n)
    return tuple(jax.random.uniform(k, shape, dtype=jnp.float32) for k in ks)


def exponential_deviate(u: jax.Array) -> jax.Array:
    """Optical-depth free path tau = -log(max(tiny, u)).

    Mirrors Integrators/monteCarloRadiativeTransfer.f95:480, including the
    guard against u == 0.
    """
    return -jnp.log(jnp.maximum(u, TINY))
