"""Results: normalized radiative quantities for one photon batch.

Implements the normalization stage of computeRadiativeTransfer
(Integrators/monteCarloRadiativeTransfer.f95:327-395): clipped-intensity
excess redistribution, division by the average number of photons per column
(area-weighted for irregular grids), and volume absorption divided by layer
thickness.  ``reportResults`` (:711-826) maps to plain properties.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Results:
    """Normalized outputs; fluxes are per unit incident flux on the domain."""

    flux_up: jax.Array            # (nx, ny)
    flux_down: jax.Array          # (nx, ny)
    flux_absorbed: jax.Array      # (nx, ny)
    volume_absorption: jax.Array  # (nx, ny, nz)
    intensity: jax.Array          # (nx, ny, D); D may be 0
    intensity_by_component: jax.Array  # (nx, ny, D, ncomp+1); component 0 = surface
    n_photons: jax.Array
    n_bad: jax.Array

    # reportResults' domain means (:739-742, :796-807)
    @property
    def mean_flux_up(self):
        return jnp.mean(self.flux_up)

    @property
    def mean_flux_down(self):
        return jnp.mean(self.flux_down)

    @property
    def mean_flux_absorbed(self):
        return jnp.mean(self.flux_absorbed)

    @property
    def absorbed_profile(self):
        """Layer-mean absorption profile (:776-782)."""
        return jnp.mean(self.volume_absorption, axis=(0, 1))

    @property
    def mean_intensity(self):
        return jnp.mean(self.intensity, axis=(0, 1))


jax.tree_util.register_dataclass(
    Results,
    data_fields=["flux_up", "flux_down", "flux_absorbed", "volume_absorption",
                 "intensity", "intensity_by_component", "n_photons", "n_bad"],
    meta_fields=[])


def column_weights(x_edges, y_edges) -> np.ndarray:
    """Relative area of each column, normalized to mean 1 (:358-367)."""
    dx = np.diff(np.asarray(x_edges, dtype=np.float64))
    dy = np.diff(np.asarray(y_edges, dtype=np.float64))
    area = dx[:, None] * dy[None, :]
    return (area / area.mean()).astype(np.float32)


def normalize_tallies(raw, n_x, n_y, n_z, n_dirs, n_comp,
                      col_weights: np.ndarray, dz: np.ndarray) -> Results:
    """Raw weight sums -> per-unit-flux results (jit-traceable)."""
    shape_cols = (n_x, n_y)
    photons_per_column = (raw.n_photons.astype(jnp.float32) / (n_x * n_y)
                          * jnp.asarray(col_weights))
    inv_ppc = 1.0 / photons_per_column

    flux_up = raw.flux_up.reshape(shape_cols) * inv_ppc
    flux_down = raw.flux_down.reshape(shape_cols) * inv_ppc
    flux_abs = raw.flux_absorbed.reshape(shape_cols) * inv_ppc
    vol = (raw.volume_absorption.reshape(n_x, n_y, n_z) * inv_ppc[:, :, None]
           / jnp.asarray(dz, dtype=jnp.float32)[None, None, :])

    if n_dirs > 0:
        intensity = raw.intensity.reshape(n_x, n_y, n_dirs)
        by_comp = raw.intensity_by_component.reshape(n_x, n_y, n_dirs, n_comp + 1)
        excess = raw.intensity_excess.reshape(n_dirs, n_comp + 1)
        # Redistribute clipped excess proportionally to each component's
        # spatial pattern (:327-347), before normalization.
        comp_sum = jnp.sum(by_comp, axis=(0, 1))  # (D, ncomp+1)
        scale = jnp.where(comp_sum > 0.0, excess / jnp.maximum(comp_sum, 1e-30), 0.0)
        intensity = intensity + jnp.sum(by_comp * scale[None, None, :, :], axis=-1)
        by_comp = by_comp * (1.0 + scale[None, None, :, :])
        intensity = intensity * inv_ppc[:, :, None]
        by_comp = by_comp * inv_ppc[:, :, None, None]
    else:
        intensity = jnp.zeros((n_x, n_y, 0), jnp.float32)
        by_comp = jnp.zeros((n_x, n_y, 0, n_comp + 1), jnp.float32)

    return Results(flux_up=flux_up, flux_down=flux_down, flux_absorbed=flux_abs,
                   volume_absorption=vol, intensity=intensity,
                   intensity_by_component=by_comp,
                   n_photons=raw.n_photons, n_bad=raw.n_bad)
