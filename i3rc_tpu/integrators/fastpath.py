"""Fused elementwise transport fastpath (flux, separable optics, HG phase).

Motivation (measured on TPU v5e, see PERF_NOTES.md): the general wavefront
kernel (integrators/wavefront.py) spends most of each event iteration on
one-hot matmul table reads, the one-hot tally, and the refill cumsum — MXU
and reduction work whose cost per lane-event bounded round 1 at ~27M
photons/s.  This module specializes benchmark-shaped workloads to a *purely
elementwise* event step that XLA fuses into a handful of kernels per K-event
block:

  * Free paths by null-collision (Woodcock) tracking over a coarse majorant
    grid, flattened to ONE block-crossing-or-tentative-collision per event —
    no inner DDA while_loop, so the whole step is branch-free vector code.
    With a single global block this degenerates to the reference's maximum
    cross-section method (monteCarloRadiativeTransfer.f95:492-497).
  * Extinction reads become closed-form piecewise-constant lookups: the
    domain's total extinction is auto-factorized as a separable rank-1 field
    ext(x,y,z) = fx(x) * fy(y) * fz(z) whose 1-D factors are few-segment step
    functions evaluated by a where-chain (exact — bit-checked host-side — for
    the I3RC step cloud and any separable medium).  No gather, no one-hot.
  * Henyey-Greenstein phase functions are inverted analytically
    (mu = (1+g^2 - ((1-g^2)/(1+g(2u-1)))^2) / 2g) instead of through the
    tabulated piecewise-cubic inverse CDF (detected from Legendre moments
    xi_l = g^l; the general path samples the same distribution through a
    256-segment cubic fit of the truncated expansion).
  * Tallies and lane refill are DEFERRED: every photon keeps weight
    exactly 1 for its whole life — absorption (1-ssa), gas extinction, and
    surface reflection (albedo A) are all Bernoulli survival events — so a
    photon tallies once at its death (exit kind + column pend in per-lane
    registers) and the flush runs every K events: one small one-hot tally
    matmul and one refill cumsum per K-event block instead of per event.
    Volume absorption (heating rates) rides the same flush (kind-3 deaths
    keyed by fine cell); reflecting surfaces pause bottom hits until the
    flush, which tallies Fdn and Bernoulli-revives the lane with a fresh
    Lambertian direction (probability = albedo) — the event kernel stays
    surface-agnostic, so reflecting runs keep the Pallas path.

Eligibility is checked host-side (``fast_plan``); ineligible configurations
fall back to the general kernel unchanged.  Expectations are identical to
the general kernel (same physics, same estimators); RNG event streams
differ, so agreement is statistical — covered by tests/test_fastpath.py.

Reference analog: the photonLoop/scatteringLoop pair,
Integrators/monteCarloRadiativeTransfer.f95:400-707.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.core.rng import TINY, exponential_deviate
from i3rc_tpu.integrators.wavefront import (
    RawTallies,
    _sincos_2pi,
    make_direction_cosines,
    rotate_direction,
)
from i3rc_tpu.ops.tally import tally_multi

# np scalar: closure constants must not be concrete jax arrays (the Pallas
# event-block kernel closes over fast_event and rejects captured arrays).
_HUGE = np.float32(3.0e38)

# Most segments per 1-D factor before the where-chain lookup stops paying.
MAX_SEGMENTS = 24


# ---------------------------------------------------------------------------
# Host-side plan construction
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StepFactor:
    """Piecewise-constant 1-D function of position: values[i] applies on
    [thresholds[i-1], thresholds[i]) with implicit end thresholds."""

    thresholds: tuple[float, ...]  # ascending interior breakpoints
    values: tuple[float, ...]      # len(thresholds) + 1

    def __call__(self, pos):
        v = jnp.full_like(pos, jnp.float32(self.values[0]))
        for t, val in zip(self.thresholds, self.values[1:]):
            v = jnp.where(pos >= jnp.float32(t), jnp.float32(val), v)
        return v

    def eval_np(self, pos: np.ndarray) -> np.ndarray:
        """Host-side (numpy) evaluation, for plan-consistency checks."""
        v = np.full(np.shape(pos), self.values[0], dtype=np.float64)
        for t, val in zip(self.thresholds, self.values[1:]):
            v = np.where(np.asarray(pos) >= t, val, v)
        return v

    def face_up(self, pos, hi: float):
        """Nearest segment boundary (or domain edge) above pos (strict)."""
        face = jnp.full_like(pos, jnp.float32(hi))
        for t in reversed(self.thresholds):
            face = jnp.where(pos < jnp.float32(t), jnp.float32(t), face)
        return face

    def face_dn(self, pos, lo: float):
        """Nearest segment boundary (or domain edge) below pos (strict)."""
        face = jnp.full_like(pos, jnp.float32(lo))
        for t in self.thresholds:
            face = jnp.where(pos > jnp.float32(t), jnp.float32(t), face)
        return face

    def next_face(self, pos, up, lo: float, hi: float):
        """Nearest segment boundary (or domain edge) in the travel direction.

        ``up`` is the direction sign as a bool; positions sit strictly
        between faces (crossings nudge past them), so strict compares make
        progress guaranteed.
        """
        return jnp.where(up, self.face_up(pos, hi), self.face_dn(pos, lo))

    @property
    def n_ops(self) -> int:
        return len(self.thresholds)


def _compress_factor(values: np.ndarray, edges: np.ndarray) -> StepFactor | None:
    """Run-length compress per-cell values into a StepFactor over position."""
    values = np.asarray(values, dtype=np.float64)
    change = np.flatnonzero(np.diff(values)) + 1
    if change.size > MAX_SEGMENTS:
        return None
    return StepFactor(tuple(float(edges[i]) for i in change),
                      tuple([float(values[0])] + [float(values[i]) for i in change]))


def separable_factors(ext: np.ndarray, x_edges, y_edges, z_edges):
    """Exact rank-1 factorization ext = fx ⊗ fy ⊗ fz, or None.

    Chooses the max-extinction cell as pivot and verifies the outer product
    reproduces the field to float32 accuracy.  Zero fields factorize
    trivially.  Returns (StepFactor, StepFactor, StepFactor).
    """
    ext = np.asarray(ext, dtype=np.float64)
    if ext.ndim != 3:
        return None
    if not np.any(ext):
        zero = StepFactor((), (0.0,))
        return zero, StepFactor((), (1.0,)), StepFactor((), (1.0,))
    i0, j0, k0 = np.unravel_index(np.argmax(ext), ext.shape)
    pivot = ext[i0, j0, k0]
    vx = ext[:, j0, k0] / pivot
    vy = ext[i0, :, k0] / pivot
    vz = ext[i0, j0, :]
    recon = vx[:, None, None] * vy[None, :, None] * vz[None, None, :]
    if not np.allclose(recon, ext, rtol=1e-6, atol=1e-9 * pivot):
        return None
    fx = _compress_factor(vx, np.asarray(x_edges, float))
    fy = _compress_factor(vy, np.asarray(y_edges, float))
    fz = _compress_factor(vz, np.asarray(z_edges, float))
    if fx is None or fy is None or fz is None:
        return None
    return fx, fy, fz


def column_structure(ext: np.ndarray, z_edges: np.ndarray,
                     ssa: np.ndarray | None = None,
                     pfi: np.ndarray | None = None) -> np.ndarray | None:
    """(n_cols, 3) [v, z_base, z_top] when every column is one homogeneous
    layer (contiguous constant-extinction z-run, clear elsewhere), else None.

    The I3RC Landsat scene has exactly this shape: each column's cloud
    occupies nint(thickness/20m) layers from the domain base with uniform
    extinction tau/thickness (i3rcLandsatCloud.f95:100-104).

    With ``ssa``/``pfi`` given (per-cell single-scattering albedo and phase
    index), the run must also be uniform in both per column and the result
    gains two columns: (n_cols, 5) [v, z_base, z_top, ssa, pf_index] — the
    PhysicalPropertiesToDomain single-layer class, where each column's
    Reff keys one Mie-table entry (PhysicalPropertiesToDomain.f95:242-276).
    """
    from i3rc_tpu.ops.gather import ONEHOT_MAX_ROWS

    nx, ny, nz = ext.shape
    if nx * ny > ONEHOT_MAX_ROWS:
        return None
    flat = ext.reshape(nx * ny, nz)
    nonzero = flat > 0.0
    count = nonzero.sum(axis=1)
    first = np.where(count > 0, np.argmax(nonzero, axis=1), 0)
    last = np.where(count > 0, nz - 1 - np.argmax(nonzero[:, ::-1], axis=1), -1)
    if not np.all((last - first + 1 == count) | (count == 0)):
        return None  # non-contiguous cloud layer somewhere
    v = flat.max(axis=1)
    in_run = nonzero
    if not np.all(np.where(in_run, flat, v[:, None]) == v[:, None]):
        return None  # extinction varies within a column's run
    z_edges = np.asarray(z_edges, np.float64)
    zb = z_edges[first]
    zt = z_edges[last + 1]
    zb = np.where(count > 0, zb, z_edges[0])
    zt = np.where(count > 0, zt, z_edges[0])
    cols = [v, zb, zt]
    if ssa is not None:
        for field in (np.asarray(ssa, np.float64).reshape(nx * ny, nz),
                      np.asarray(pfi, np.float64).reshape(nx * ny, nz)):
            col_ids = np.arange(nx * ny)
            rep = field[col_ids, first]          # run value per column
            if not np.all(np.where(in_run, field, rep[:, None])
                          == rep[:, None]):
                return None  # ssa / phase index varies within a run
            cols.append(np.where(count > 0, rep, 0.0))
    return np.stack(cols, axis=1).astype(np.float32)


def detect_hg(table) -> float | None:
    """Asymmetry parameter when the (single-entry) table is pure HG.

    HG Legendre moments are xi_l = g^l (core/phase_functions.py:49-51); any
    table built that way — planeParallel's HG branch, the I3RC step cloud —
    is detected exactly.  Tabulated or multi-entry tables return None.
    """
    if len(table.phase_functions) != 1:
        return None
    pf = table.phase_functions[0]
    c = pf.legendre_coefficients
    if c is None or c.size < 2:
        return None
    g = float(c[0])
    if abs(g) >= 1.0:
        return None
    # Tolerance grows linearly with the order: netCDF round trips store the
    # coefficients as f32, so c[0] carries ~6e-8 relative rounding and the
    # implied g^l error compounds as ~l * 6e-8 (a flat rtol rejected every
    # file-read HG domain at l >~ 20, silently demoting .dom workflows off
    # the HG/Pallas fastpath).
    orders = np.arange(1, c.size + 1)
    expect = g ** orders
    tol = 2.5e-7 * (orders + 1) * np.abs(expect) + 1e-12
    if not np.all(np.abs(np.asarray(c, float) - expect) <= tol):
        return None
    return g


@dataclass(frozen=True)
class GasKTables:
    """Fused spectral-k batching: every k point of a band in ONE dispatch.

    The k-distribution loop's per-k work differs ONLY in the gas absorption
    profile, so k becomes a per-LANE attribute instead of a per-dispatch
    one: lanes partition into contiguous blocks (one per k point, sized by
    quadrature weight), each block traces against its own gas profile read
    from a tiny (n_k * n_z, 2) one-hot table, and exits tally with the
    lane-static weight w_k * n_photons / budget_k — the weighted band sum
    accumulates in a single pass through one executable.  Replaces both the
    traced-override path (whose traced chain defeats run-length compression
    — every z layer becomes a segment face) and per-k baked recompiles.
    Radiance detectors are supported on closed-shadow-eligible plans: the
    cloud shadow tau is closed-form as usual, and each lane adds its OWN k
    profile's gas tau from the cumulative Gz it already carries —
    (Gz(exit) - Gz(z)) / dz_d, one subtract per detector per collision.

    Reference scope: kDistribution.f95 declares the spectral loop but never
    finishes it; the lane-batched design has no Fortran analog.
    """

    profiles: object   # np.ndarray (n_k, n_z): per-layer gas extinction
    weights: object    # np.ndarray (n_k,): positive quadrature weights


@dataclass(frozen=True)
class FastPlan:
    """Static (host-side) description of one fastpath compilation.

    The 1-D segment structure doubles as the transport grid: free paths are
    sampled against the *exact* local extinction (piecewise constant within
    a segment box), advancing one segment-crossing or collision per event.
    Null collisions are eliminated by construction — for a separable field
    the product of per-axis segment values IS the extinction, so every
    tentative collision is physical and no acceptance test is needed.
    """

    fx: StepFactor
    fy: StepFactor
    fz: StepFactor
    hg_g: float
    unroll: int
    # Local-estimate radiance detectors: per detector (dx, dy, dz, |mu|).
    # Empty tuple = flux-only.  shadow_steps bounds the unrolled segment-DDA
    # transmittance trace (segments crossed to the z boundary, any start).
    detectors: tuple = ()
    shadow_steps: int = 0
    # Column-structured medium (e.g. the I3RC Landsat scene,
    # i3rcLandsatCloud.f95:100-104): per (x, y) column one homogeneous cloud
    # layer [z_base, z_top) of extinction v, clear elsewhere.  column_data is
    # (n_cols, 3) float32 [v, z_base, z_top]; the per-event lookup is one
    # factored one-hot read (the dominant cost for big scenes — measured
    # ~5.6 ns/lane for 16k columns vs ~0.2 ns/lane for everything else).
    column_data: object = None
    # Uniform single-scattering albedo.  ssa < 1 uses Bernoulli absorption
    # (survival sampling): at each collision the photon is absorbed with
    # probability 1 - ssa and tallied (weight 1) at its column — one death
    # per photon, so the deferred-tally/flush design is unchanged.  Same
    # expectation as the reference's analog weighting (:642-649); slightly
    # higher variance, far faster on this kernel.
    ssa: float = 1.0
    # Gas channel: a second, horizontally-uniform pure-absorber component
    # (the k-distribution "Gas absorption" shape, integrators/spectral.py)
    # handled as a FACTORIZED collision channel: each photon carries one
    # exponential gas-tau threshold (tgas, drawn at launch/refill) that the
    # traveled gas optical depth consumes; crossing it kills the photon
    # (weight 1, kind 3) at the crossing point.  Exactly equivalent in
    # expectation to folding the absorber into the total extinction, but
    # the cloud transport grid stays separable and collisions stay pure
    # scatter/Bernoulli events.  gas_factor holds the baked per-layer
    # profile (spectral runs override it per k-point with traced values —
    # see trace(optics_override)); gas_idx is the component slot.
    gas_factor: object = None
    gas_idx: int = -1
    # Non-HG single-entry phase function: (n_segments, 4) piecewise-cubic
    # inverse-CDF coefficients (tables.build_inverse_cubic — the same
    # mu(p) fit the general kernel samples from, ~3e-7 accurate).  None
    # for exact-HG tables (the analytic inversion is cheaper and exact).
    # XLA path only; no radiance detectors (phase VALUES would need the
    # forward table too).
    cubic: object = None
    # Lambertian surface albedo.  > 0 keeps weight-1 photons by Bernoulli:
    # bottom hits pend as kind 2 (tallying Fdn at the flush like any exit)
    # and the per-block glue revives the lane with probability A (mu =
    # sqrt(u), uniform azimuth, NEXT_DIRECT's Lambertian draw).  The event
    # kernel is surface-agnostic, so reflecting runs keep the Pallas path.
    surface_albedo: float = 0.0
    # Per-column optical properties (multi-entry Mie/Reff-keyed tables —
    # the PhysicalPropertiesToDomain production class): column_data widens
    # to (n_cols, 5) [v, z_base, z_top, ssa, pf_index]; the column read
    # supplies the per-lane ssa (Bernoulli absorption) and the cubic
    # inverse-CDF row base (pf_index * n_segments).  plan.ssa then holds
    # the MINIMUM column ssa (static absorbing/conservative switch only).
    column_props: bool = False
    # Number of table entries flattened into `cubic` ((entries*nseg, 4)).
    cubic_entries: int = 1
    # Forward phase VALUES for tabulated-phase radiance: (n_segments, 4)
    # piecewise-cubic coefficients of log P vs scattering angle
    # (tables.build_forward_cubic).  None for HG plans (analytic value) and
    # for flux-only tabulated plans.  With this, single-entry tabulated
    # tables (Mie, Dermendjian C.1) keep the fastpath WITH detectors —
    # previously any detector forced the general kernel.
    fwd_cubic: object = None
    # Closed-form shadow traces: when at most ONE horizontal factor is
    # non-trivial (the common 2-D benchmark shape), the optical depth from
    # any point to the z boundary along a fixed detector direction has a
    # closed form — per z segment, the horizontal line integral is a
    # difference of the (periodically extended) cumulative integral of the
    # non-trivial factor.  O(n_z_seg * n_h_seg) selects per detector per
    # event instead of up to 24 unrolled DDA steps, exact to float32, and
    # immune to the step-budget eligibility cap (shadow_steps is unused).
    closed_shadow: bool = False
    # Fused spectral-k batching (see GasKTables): attached by
    # Integrator.batch_tracer when the integrator was created with gas_k;
    # requires a gas-channel plan, no volume absorption.  Radiance
    # detectors ride the closed shadow trace (cloud tau closed-form, gas
    # tau from the carried per-k cumulative).
    gas_k: object = None
    # Uniform-parameter BRDF surface (Cox-Munk / RPV / Ross-Li / gridless
    # Lambertian): reflection resolves at the per-block flush like the
    # Lambertian Bernoulli — revive with probability min(R, 1) under the
    # cosine-weighted outgoing draw, with the excess max(R, 1) carried on
    # a per-lane weight that multiplies every tally (the weight is
    # constant within a K-event block, so it never enters the Pallas
    # kernel).  brdf_fn is the traceable kernel; brdf_params the (n_p,)
    # parameter vector.  Reference swap point: surfaceProperties.f95:
    # 154-162 inside monteCarloRadiativeTransfer.f95:515-563.
    brdf_fn: object = None
    brdf_params: object = None


def fast_plan(geom, flat, optics, surface, intensity, config) -> FastPlan | None:
    """Eligibility check + plan for the fused elementwise kernel.

    Requirements (everything else uses the general wavefront kernel):
    single-component optics with uniform ssa in (0, 1] and one HG phase
    function — optionally plus a horizontally-uniform pure-absorber second
    component (the spectral gas shape; see FastPlan.gas_factor) — a
    Lambertian surface (any albedo) or a uniform-parameter BRDF surface
    (Cox-Munk / RPV / Ross-Li; gridded parameter fields go general),
    non-ray-tracing transport, regular grid, separable few-segment
    extinction.  Radiance detectors are supported with exact transmittance
    traces for HG (analytic phase value) and single-entry tabulated tables
    (log-cubic forward read, FastPlan.fwd_cubic); Iwabuchi roulette
    (zeta_min) is honored as an elementwise rule on the exact tau, and
    ratio-tracking requests upgrade to the exact trace (same expectation,
    lower variance).  Hybrid phase functions and contribution clipping go
    general (they change the estimator).  The transmittance is closed-form
    when at most one horizontal factor varies (FastPlan.closed_shadow) and
    a step-bounded segment march otherwise.  Gas-channel plans admit
    detectors on the closed trace only (the gas adds its own vertical
    closed-form segments to every shadow ray).
    """
    if not getattr(config, "use_fastpath", True):
        return None
    if config.use_ray_tracing:
        return None
    if intensity is not None and (
            config.use_hybrid_phase_funs
            or config.limit_intensity_contributions):
        # Hybrid forward peaks and contribution clipping change the
        # estimator itself; they stay on the general kernel.  Iwabuchi
        # roulette IS admitted — the closed/marching shadow trace supplies
        # the exact tau its test needs (see the detector block in
        # fast_event; monteCarloRadiativeTransfer.f95:1536-1596) — and
        # ratio tracking upgrades to the exact trace: identical
        # expectation, strictly lower variance, and the fastpath's
        # transmittance is closed-form rather than a per-cell march, so
        # the cost ratio tracking exists to avoid is already gone.
        return None
    brdf_fn = None
    brdf_params = None
    if surface.uses_brdf:
        # Uniform-parameter BRDFs ride the flush-time importance draw
        # (reference swap point surfaceProperties.f95:154-162 + reflection
        # sampling monteCarloRadiativeTransfer.f95:515-563): bottom hits
        # pend as kind 2 exactly like Lambertian, and the per-block glue
        # draws the cosine-weighted outgoing direction, evaluates the BRDF
        # kernel, revives with probability min(R, 1) and carries max(R, 1)
        # on the lane weight (see make_fast_tracer's brdf_mode).  Gridded
        # parameter fields would need a per-lane parameter gather at every
        # flush — they stay on the general kernel.
        if not (surface.n_xs == 1 and surface.n_ys == 1):
            return None
        brdf_fn = surface.brdf_fn
        brdf_params = np.asarray(surface.params, np.float32).reshape(-1)
        surface_albedo = 0.0
    else:
        surface_albedo = float(surface.albedo)
        if not (0.0 <= surface_albedo <= 1.0):
            return None
    if not (geom.xy_regular and geom.z_regular):
        return None

    gas_factor = None
    gas_idx = -1
    if optics.n_components == 2:
        # Cloud + gas: one pure-absorber horizontally-uniform component
        # (the spectral loop's "Gas absorption", spectral.py:36-46) rides as
        # a factorized collision channel; the other must satisfy the usual
        # single-component requirements.
        total = np.asarray(flat.total_ext, np.float64)
        cum = np.asarray(flat.cumulative_ext, np.float64)
        ssa_c = np.asarray(flat.ssa, np.float64)
        pfi = np.asarray(flat.phase_index)
        exts = [cum[..., 0] * total, (cum[..., 1] - cum[..., 0]) * total]

        def is_gas(c):
            occ = exts[c] > 0.0
            if not occ.any() or np.any(ssa_c[..., c][occ] != 0.0):
                return False
            prof = exts[c]
            # The per-component field is reconstructed from f32 FRACTIONAL
            # cumulative extinction, so horizontal uniformity holds only to
            # ~eps_f32 * total_ext (different rounding under different
            # cloud columns) — tolerate that reconstruction noise.
            tol = 1e-6 * max(prof.max(), 1e-30) + 4e-7 * float(total.max())
            return bool(np.ptp(prof, axis=(0, 1)).max() <= tol)

        gas_idx = next((c for c in (1, 0) if is_gas(c)), -1)
        if gas_idx < 0:
            return None
        cloud_idx = 1 - gas_idx
        # Bake the horizontal mean (squeezes the reconstruction noise) and
        # derive the cloud field by exact subtraction from the total.
        gas_profile = exts[gas_idx].mean(axis=(0, 1))
        cloud_ext = np.maximum(total - gas_profile[None, None, :], 0.0)
        occ = cloud_ext > 0.0
        if not occ.any():
            return None
        s_occ = ssa_c[..., cloud_idx][occ]
        p_occ = pfi[..., cloud_idx][occ]
        if not (np.all(s_occ == s_occ.flat[0]) and np.all(p_occ == p_occ.flat[0])):
            return None
        uniform_ssa = float(s_occ.flat[0])
        if not (0.0 < uniform_ssa <= 1.0):
            return None
        # Snap near-equal adjacent layers (reconstruction noise) so run-
        # length compression isn't defeated by 1-ulp wiggles.
        snap = 1e-6 * max(gas_profile.max(), 1e-30) + 4e-7 * float(total.max())
        for i in range(1, gas_profile.size):
            if abs(gas_profile[i] - gas_profile[i - 1]) <= snap:
                gas_profile[i] = gas_profile[i - 1]
        gas_factor = _compress_factor(gas_profile, np.asarray(geom.z_edges))
        if gas_factor is None:
            return None
        g = detect_hg(flat.forward_tables[cloud_idx])
        cloud_field = np.asarray(cloud_ext, np.float32)
    per_col_props = False
    if gas_factor is not None:
        pass
    elif optics.n_components == 1 and optics.uniform_ssa is not None \
            and optics.uniform_phase_index is not None:
        if not (0.0 < optics.uniform_ssa <= 1.0):
            return None
        uniform_ssa = float(optics.uniform_ssa)
        g = detect_hg(flat.forward_tables[0])
        cloud_field = flat.total_ext
    elif optics.n_components == 1 and intensity is None:
        # Per-cell ssa / phase index (multi-entry Mie/Reff-keyed tables):
        # only the column path can carry them — per-column uniform values
        # ride the column read (see FastPlan.column_props).
        if np.any((np.asarray(flat.ssa) < 0.0)
                  | (np.asarray(flat.ssa) > 1.0)):
            return None
        per_col_props = True
        uniform_ssa = 1.0      # per-lane values come from the column read
        g = None
        cloud_field = flat.total_ext
    elif optics.n_components != 2:
        return None
    cubic = None
    cubic_entries = 1
    fwd_cubic = None
    if per_col_props:
        # Every entry's piecewise-cubic mu(p) fit, flattened: the kernel's
        # row base is pf_index * n_segments from the column read.
        from i3rc_tpu.integrators.tables import build_inverse_cubic

        cub = np.asarray(build_inverse_cubic(flat)[0], np.float32)
        cubic_entries = cub.shape[0]
        cubic = cub.reshape(-1, 4)
        g = 0.0
    elif g is None or g == 0.0:
        # Not (exactly) Henyey-Greenstein: single-entry tables sample the
        # same piecewise-cubic mu(p) inverse-CDF fit as the general kernel
        # (one small one-hot row read per event — XLA path only).  Radiance
        # detectors additionally read phase VALUES from a log-space cubic
        # fit of the forward table (FastPlan.fwd_cubic).  With a gas
        # channel the fits are built from the CLOUD component's table —
        # the gas is a pure absorber and never samples a direction or a
        # detector value — admitting the production broadband class
        # (tabulated/Mie cloud + k-distribution gas) to the fastpath and
        # the fused spectral dispatch.
        if gas_factor is not None:
            comp = cloud_idx
        elif optics.n_components == 1:
            comp = 0
        else:
            return None
        if len(flat.forward_tables[comp].phase_functions) != 1:
            return None
        from i3rc_tpu.integrators.tables import (build_forward_cubic,
                                                 build_inverse_cubic)

        cubic = np.asarray(build_inverse_cubic(flat)[comp, 0], np.float32)
        if intensity is not None:
            fwd_cubic = np.asarray(build_forward_cubic(flat)[comp, 0],
                                   np.float32)
        g = 0.0
    factors = None if per_col_props else separable_factors(
        cloud_field, np.asarray(geom.x_edges),
        np.asarray(geom.y_edges), np.asarray(geom.z_edges))
    if factors is not None and (factors[0].n_ops + factors[1].n_ops
                                + factors[2].n_ops > MAX_SEGMENTS):
        factors = None
    column_data = None
    if factors is None:
        if intensity is not None:   # unrolled shadow rays need few segments
            return None
        if gas_factor is not None:  # gas rides the separable path only
            return None
        column_data = column_structure(
            flat.total_ext, np.asarray(geom.z_edges),
            ssa=np.asarray(flat.ssa)[..., 0] if per_col_props else None,
            pfi=np.asarray(flat.phase_index)[..., 0] if per_col_props
            else None)
        if column_data is None:
            return None
        if per_col_props:
            occ = column_data[:, 0] > 0.0
            uniform_ssa = (float(column_data[occ, 3].min()) if occ.any()
                           else 1.0)
        trivial = StepFactor((), (1.0,))
        fx = fy = fz = trivial
    elif per_col_props:
        return None
    else:
        fx, fy, fz = factors

    # Volume absorption (heating rates) no longer restricts eligibility:
    # kind-3 deaths tally per fine cell at flush time — one-hot for grids
    # up to 2^18 cells, XLA scatter-add beyond (column media included);
    # conservative media absorb nothing and the profile is identically 0.

    detectors = ()
    shadow_steps = 0
    closed_shadow = False
    if intensity is not None:
        dirs = np.asarray(intensity.directions, float)       # (3, D)
        mus = np.asarray(intensity.abs_mu, float)
        xe = np.asarray(geom.x_edges, float)
        ye = np.asarray(geom.y_edges, float)
        ze = np.asarray(geom.z_edges, float)

        for d in range(dirs.shape[1]):
            dx_, dy_, dz_ = dirs[:, d]
            detectors += ((float(dx_), float(dy_), float(dz_), float(mus[d])),)
        # Closed-form transmittance (see FastPlan.closed_shadow): eligible
        # whenever at most one horizontal factor varies and every detector
        # leaves the z range (|dz| bounded away from the horizon).
        closed_shadow = ((fx.n_ops > 0) + (fy.n_ops > 0) <= 1
                         and all(abs(d_[2]) > 1e-6 for d_ in detectors))
        if gas_factor is not None and not closed_shadow:
            # Shadow rays carry the (horizontally uniform) gas as a
            # closed-form vertical integral; the marching fallback's face
            # set doesn't include gas segments, so gas + detectors
            # requires closed-trace eligibility.
            return None
        if not closed_shadow:
            # Marching fallback: bound the unrolled segment-DDA step count.
            def min_gap(f: StepFactor, lo, hi):
                pts = np.asarray([lo, *f.thresholds, hi])
                return float(np.diff(pts).min())

            for d in range(dirs.shape[1]):
                dx_, dy_, dz_ = dirs[:, d]
                path = (ze[-1] - ze[0]) / max(abs(dz_), 1e-6)
                steps = 2 + fz.n_ops + 1
                if fx.n_ops:
                    steps += int(path * abs(dx_) / min_gap(fx, xe[0], xe[-1])) + 1
                steps += int(path * abs(dx_) / (xe[-1] - xe[0])) + 1  # wraps
                if fy.n_ops:
                    steps += int(path * abs(dy_) / min_gap(fy, ye[0], ye[-1])) + 1
                steps += int(path * abs(dy_) / (ye[-1] - ye[0])) + 1
                shadow_steps = max(shadow_steps, steps)
            if shadow_steps > 24:
                return None

    cfg_unroll = getattr(config, "fastpath_unroll", None)
    unroll = (int(cfg_unroll) if cfg_unroll
              else (32 if column_data is not None else 8))
    return FastPlan(fx=fx, fy=fy, fz=fz,
                    hg_g=g, unroll=unroll,
                    detectors=detectors, shadow_steps=shadow_steps,
                    column_data=column_data, ssa=uniform_ssa,
                    gas_factor=gas_factor, gas_idx=gas_idx,
                    cubic=cubic, surface_albedo=surface_albedo,
                    column_props=per_col_props, cubic_entries=cubic_entries,
                    closed_shadow=closed_shadow, fwd_cubic=fwd_cubic,
                    brdf_fn=brdf_fn, brdf_params=brdf_params)


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

def hg_cosine(g: float, u):
    """Exact HG inverse CDF: the closed form of sampleHG (g != 0)."""
    g = jnp.float32(g)
    frac = (1.0 - g * g) / (1.0 + g * (2.0 * u - 1.0))
    return jnp.clip((1.0 + g * g - frac * frac) / (2.0 * g), -1.0, 1.0)


def hg_phase(g: float, cos_theta):
    """HG phase value, normalized so integral over d(mu) is 2 (P_iso == 1)."""
    g = jnp.float32(g)
    r = jax.lax.rsqrt(jnp.maximum(1.0 + g * g - 2.0 * g * cos_theta, 1e-12))
    return (1.0 - g * g) * r * r * r


def _build_pallas_block(fast_event, track_y: bool, L: int, K: int,
                        interpret: bool = False, blk_rows: int | None = None,
                        vmem_mb: int | None = None, n_draws: int = 3,
                        gas: bool = False, n_detectors: int = 0):
    """Mosaic kernel running K fast_event steps with VMEM-resident state.

    The wavefront state (13 per-lane arrays) is tiled (rows, 128) and
    blocked over a 1-D grid; each program advances its lane block through K
    complete events — free-path sampling, segment crossing, collision,
    HG scattering rotation, exit bookkeeping — without touching HBM.
    Randomness comes from the TPU hardware PRNG (pltpu.prng_random_bits),
    seeded per (batch-key words, grid program), one (BLK, 128) draw per use
    (3 per event), uint32 -> [0,1) via the top-24-bit ladder.

    ``n_detectors`` > 0 runs local-estimate radiance INSIDE the event block
    (closed-shadow HG plans only; see make_fast_tracer's gating): every
    collision's per-detector contribution and shadow-exit column are
    recorded to K x D output pairs instead of tallied in-kernel — the
    per-block XLA glue replays the records through the same one-hot tally
    the XLA fastpath uses per event.  Same estimator, same expectation;
    the tally work just leaves the hot loop, whose per-event cost stays
    within ~2x of the flux kernel (the closed shadow trace is ~40
    elementwise ops per detector).

    Returns block_fn(seed2 (1,2) i32, state_tuple) -> state_tuple (plus,
    with detectors, a list of K*D (contribution (L,), column (L,)) record
    pairs in event-major order) operating on the XLA-side (L,)-shaped
    state (reshapes at the boundary are free).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // 128
    BLK = min(R, blk_rows or 256)
    while R % BLK or BLK % 8:
        BLK -= 8
    n_grid = R // BLK

    f32, i32 = jnp.float32, jnp.int32
    fields = ["alive", "x"] + (["y"] if track_y else []) + [
        "z", "ux", "uy", "uz", "tau", "orders", "pk", "bad", "evct"] + (
        ["tgas"] if gas else [])
    int_fields = {"alive", "orders", "pk", "bad", "evct"}
    n_state = len(fields)

    def _to_unit(bits):
        # uint32 -> [0, 1): mantissa-fill to [1, 2) then subtract 1 — pure
        # bit ops + one f32 subtract (Mosaic has no uint32->f32 cast).
        mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        return pltpu.bitcast(mant, f32) - f32(1.0)

    def _uniform_hw():
        return _to_unit(pltpu.bitcast(pltpu.prng_random_bits((BLK, 128)),
                                      jnp.uint32))

    def _uniform_hash(lane_key, ctr):
        # Counter-based murmur-style mix — the interpret-mode fallback (the
        # TPU interpreter's emulated hardware PRNG yields zeros under a
        # multi-device CPU backend).  Quality is adequate for the CI-level
        # statistical assertions; real runs use the hardware PRNG.
        x = lane_key ^ (jnp.uint32(ctr) * jnp.uint32(0x9E3779B9))
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
        return _to_unit(x ^ (x >> jnp.uint32(16)))

    ND = int(n_detectors)

    def kernel(seed_ref, *refs):
        ins = refs[:n_state]
        outs = refs[n_state:2 * n_state]
        rec_refs = refs[2 * n_state:]
        # Mosaic accepts at most two seed words: mix the grid program into
        # the second (odd-constant multiply decorrelates adjacent programs).
        pid = pl.program_id(0)
        if not interpret:
            pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + pid * (-1640531527))
            draw = lambda ctr: _uniform_hw()
        else:
            row = jax.lax.broadcasted_iota(jnp.uint32, (BLK, 128), 0)
            col = jax.lax.broadcasted_iota(jnp.uint32, (BLK, 128), 1)
            lk = (row * jnp.uint32(128) + col
                  + jnp.uint32(BLK * 128) * jnp.uint32(pid))
            s01 = (seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
                   ^ seed_ref[0, 1].astype(jnp.uint32))
            lane_key = lk * jnp.uint32(0xC2B2AE35) ^ s01
            draw = lambda ctr: _uniform_hash(lane_key, ctr)
        v = {name: ref[...] for name, ref in zip(fields, ins)}
        st = (v["alive"] != 0, v["x"], v["y"] if track_y else f32(0.0),
              v["z"], v["ux"], v["uy"], v["uz"], v["tau"], v["orders"],
              v["pk"], v["bad"], v["evct"], f32(0.0)) + (
            (v["tgas"],) if gas else ())
        # Python-unrolled event loop.  (A lax.fori_loop body was tried to
        # bound register liveness for K>=32; it hangs Mosaic compilation —
        # the unrolled form with the raised VMEM cap is the working shape.)
        records = []
        sink = records.append if ND else None
        det_sink = (lambda d, c, col: sink((c, col))) if ND else None
        for j in range(K):
            st = fast_event(tuple(draw(n_draws * j + i)
                                  for i in range(n_draws)), st,
                            det_sink=det_sink)
        for i, (c_, col_) in enumerate(records):
            rec_refs[2 * i][...] = c_
            rec_refs[2 * i + 1][...] = col_
        (alive, x, y, z, ux, uy, uz, tau, orders, pk, bad, evct, _) = st[:13]
        new = {"alive": alive.astype(i32), "x": x, "z": z, "ux": ux,
               "uy": uy, "uz": uz, "tau": tau, "orders": orders,
               "pk": pk, "bad": bad, "evct": evct}
        if track_y:
            new["y"] = y
        if gas:
            new["tgas"] = st[13]
        for name, ref in zip(fields, outs):
            ref[...] = new[name]

    spec = pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rec_shapes = [jax.ShapeDtypeStruct((R, 128), f32 if i % 2 == 0 else i32)
                  for i in range(2 * K * ND)]
    call = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * n_state,
        out_specs=[spec] * (n_state + 2 * K * ND),
        out_shape=[jax.ShapeDtypeStruct((R, 128), i32 if n in int_fields else f32)
                   for n in fields] + rec_shapes,
        input_output_aliases={i + 1: i for i in range(n_state)},
        # Off-TPU (tests): the TPU-semantics interpreter, which emulates the
        # Mosaic primitives (hardware PRNG included), unlike interpret=True.
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024) if vmem_mb else None),
    )

    def block_fn(seed2, st):
        (alive, x, y, z, ux, uy, uz, tau, orders, pk, bad, evct,
         acc_int) = st[:13]
        args = {"alive": alive.astype(i32), "x": x, "z": z, "ux": ux,
                "uy": uy, "uz": uz, "tau": tau, "orders": orders, "pk": pk,
                "bad": bad, "evct": evct}
        if track_y:
            args["y"] = y
        if gas:
            args["tgas"] = st[13]
        outs = call(seed2, *[args[n].reshape(R, 128) for n in fields])
        new = {n: o.reshape(L) for n, o in zip(fields, outs[:n_state])}
        state = (new["alive"] != 0, new["x"], new["y"] if track_y else y,
                 new["z"], new["ux"], new["uy"], new["uz"], new["tau"],
                 new["orders"], new["pk"], new["bad"],
                 new["evct"], acc_int) + ((new["tgas"],) if gas else ())
        if ND:
            rec = outs[n_state:]
            return state, [(rec[2 * i].reshape(L), rec[2 * i + 1].reshape(L))
                           for i in range(K * ND)]
        return state

    return block_fn


def make_fast_tracer(geom, plan: FastPlan, config, n_photons: int,
                     n_lanes: int | None = None):
    """Build trace(key, batch, source) -> RawTallies for the fast plan."""
    n_x, n_y, n_z = geom.n_x, geom.n_y, geom.n_z
    # Column media default to narrow wavefronts: their per-event factored
    # one-hot column read scales super-linearly with lane count (2^15 lanes
    # measured 1.5x the throughput of 2^17 on the full Landsat scene —
    # PERF_NOTES.md round-3 column ledger); separable media stay wide.
    default_l = (1 << 15) if plan.column_data is not None else (1 << 20)
    L = int(n_lanes or min(n_photons, default_l))
    K = max(1, plan.unroll)
    x0, y0, z0 = geom.x0, geom.y0, geom.z0
    x_max, y_max, z_max = geom.x_max, geom.y_max, geom.z_max
    inv_dx = 1.0 / geom.dx
    inv_dy = 1.0 / geom.dy
    # Face-push nudges: ~8 float32 ulps of the coordinate scale per axis —
    # enough that floor() relocates into the next block, small enough that
    # the extra path length (< 1e-5 of a block) is statistically invisible.
    nudge_x = np.float32(8 * 2.0 ** -23 * max(abs(x0), abs(x_max)))
    nudge_y = np.float32(8 * 2.0 ** -23 * max(abs(y0), abs(y_max)))
    nudge_z = np.float32(8 * 2.0 ** -23 * max(abs(z0), abs(z_max)))
    max_events = config.max_events
    # Global hang guard (counts K-event blocks): fastpath events include
    # block crossings and null collisions, so allow ~2x the general budget.
    max_blocks = -(-2 * max_events * (n_photons // L + 2) // K)
    n_cols = n_x * n_y

    fx, fy, fz = plan.fx, plan.fy, plan.fz
    table_mode = plan.cubic is not None
    if table_mode:
        from i3rc_tpu.ops.gather import read_rows as _read_rows_cubic
        cubic_table = jnp.asarray(plan.cubic)     # (entries*n_segments, 4)
        n_seg_cubic = int(plan.cubic.shape[0]) // int(plan.cubic_entries)
    fwd_mode = plan.fwd_cubic is not None
    if fwd_mode:
        fwd_table = jnp.asarray(plan.fwd_cubic)   # (n_fwd_seg, 4) log P
        n_fwd_seg = int(plan.fwd_cubic.shape[0])
    col_props = bool(plan.column_props)

    def _inv_factor(f: StepFactor) -> StepFactor:
        # Reciprocal-value chain (zero segments -> 0; masked by ext > 0).
        return StepFactor(f.thresholds,
                          tuple(1.0 / v if v else 0.0 for v in f.values))

    inv_fx, inv_fy, inv_fz = map(_inv_factor, (fx, fy, fz))
    column_mode = plan.column_data is not None
    if column_mode:
        from i3rc_tpu.ops.gather import read_rows as _read_rows
        column_table = jnp.asarray(plan.column_data)
        read_rows = _read_rows
    # y drops out of the kernel entirely for slab-symmetric domains (n_y == 1
    # with a uniform y factor): nothing reads it — a y "crossing" is a pure
    # periodic wrap with no physics and no tally key.
    track_y = column_mode or not (n_y == 1 and fy.n_ops == 0)
    # Bernoulli absorption (see FastPlan.ssa): collisions draw a 4th
    # uniform; absorbed photons die with pending kind 3.
    absorbing = plan.ssa < 1.0
    n_draws = 4 if absorbing else 3
    # Iwabuchi (2006) intensity Russian roulette (config.zeta_min,
    # monteCarloRadiativeTransfer.f95:1536-1596): the shadow trace already
    # yields the EXACT tau, so the roulette reduces to an elementwise rule
    # on it (one extra uniform per detector per event) — same estimator
    # distribution as the general kernel's trace-capped form (the cap
    # there only randomizes WHERE the trace stops; the contribution law
    # given tau is identical).  Ratio-tracking requests use the exact
    # trace instead (same expectation, strictly lower variance — see
    # fast_plan's eligibility note).
    iw_mode = bool(plan.detectors) and bool(
        getattr(config, "use_russian_roulette_for_intensity", False))
    iw_base = n_draws
    if iw_mode:
        n_draws += len(plan.detectors)
        zeta_iw = np.float32(max(float(config.zeta_min), 1e-30))
    # Reflecting Lambertian surface (see FastPlan.surface_albedo): bottom
    # hits PAUSE the lane (pending kind 2, exactly like a black-surface
    # exit) and resolve at the per-block flush: Fdn tallies at the frozen
    # hit column, then the glue REVIVES the lane with probability A —
    # fresh Lambertian direction (mu = sqrt(u), uniform azimuth,
    # NEXT_DIRECT's surface draw, monteCarloRadiativeTransfer.f95:542-549)
    # — before the refill claims it.  Identical expectation and variance to
    # the reference's w *= A weighting in Bernoulli form; a hitting lane
    # idles for the remainder of its K-event block (measured cheaper than
    # the per-event eager tally it replaces), and the event kernel stays
    # surface-agnostic — reflecting runs keep the full Pallas speed.
    #
    # BRDF surfaces (see FastPlan.brdf_fn) resolve at the same flush hook:
    # the glue evaluates R = brdf_fn(params, mu_in, mu_out, phi_in,
    # phi_out) under the cosine-weighted outgoing draw (the reference's
    # mu = sqrt(u) + weight *= R, monteCarloRadiativeTransfer.f95:542-563)
    # and revives with probability min(R, 1), carrying max(R, 1) on a
    # per-lane weight ``wgt``.  R <= 1 is exactly the Lambertian Bernoulli
    # generalized; R > 1 (glint peaks, hotspots) keeps the estimator
    # unbiased for any R >= 0.  wgt is constant within a K-event block
    # (it only changes at the flush), so it never enters the Pallas
    # kernel: the glue scales flush tallies and replayed detector records.
    brdf_mode = plan.brdf_fn is not None
    if brdf_mode:
        brdf_fn = plan.brdf_fn
        brdf_params = jnp.asarray(plan.brdf_params, jnp.float32)
        det_phi = tuple(float(np.arctan2(dyd, dxd))
                        for (dxd, dyd, _, _) in plan.detectors)
    reflecting = plan.surface_albedo > 0.0 or brdf_mode
    # Gas channel (see FastPlan.gas_factor): per-lane exponential gas-tau
    # threshold (tgas, state slot 13) consumed along every traveled step;
    # crossing it is a kind-3 death at the crossing point.  The chain
    # values are baked floats by default; a spectral-k override replaces
    # them with traced scalars (XLA path only — the Pallas closure requires
    # host constants).
    gas_mode = plan.gas_factor is not None
    if gas_mode:
        baked_gas = (plan.gas_factor, _inv_factor(plan.gas_factor))
        n_z_layers = n_z
        inv_dz_g = np.float32(n_z_layers / (z_max - z0))
        dz_g = np.float32((z_max - z0) / n_z_layers)

    def make_gas_eval(profile=None):
        """(gz(z), inv_gz(z), gas_face(z, up_z)) — baked or traced values."""
        if profile is None:
            g_fac, ig_fac = baked_gas
            return (g_fac, ig_fac,
                    lambda z, up: g_fac.next_face(z, up, z0, z_max))
        vals = [profile[i] for i in range(n_z_layers)]
        inv_vals = [jnp.where(v > 0, 1.0 / jnp.maximum(v, TINY), 0.0)
                    for v in vals]
        edges = [z0 + (i + 1) * float(dz_g) for i in range(n_z_layers - 1)]

        def chain(values):
            def f(z):
                acc = jnp.broadcast_to(jnp.float32(values[0]), z.shape) \
                    if np.isscalar(values[0]) else \
                    jnp.broadcast_to(values[0].astype(jnp.float32), z.shape)
                for t, v in zip(edges, values[1:]):
                    acc = jnp.where(z >= jnp.float32(t), v, acc)
                return acc
            return f

        def gas_face(z, up):
            layer = jnp.floor((z - z0) * inv_dz_g)
            return z0 + (layer + up.astype(jnp.float32)) * dz_g

        return chain(vals), chain(inv_vals), gas_face

    # ------------------------------------------------------------------
    # Fused spectral-k batching (see GasKTables): k is a per-LANE attribute.
    # Transport never stops at gas faces; instead each lane carries the
    # CUMULATIVE gas optical depth Gz(z) of its own k profile (piecewise
    # linear in z, so the gas depth of ANY step — however many layers it
    # crosses — is (Gz(z2) - Gz(z1)) / uz, one tiny one-hot read at the
    # step endpoint).  The threshold test then runs at step granularity:
    # strictly equivalent to the per-face consumption in expectation (the
    # decision points — collisions, boundaries — see the exact traveled
    # depth), with the death POSITION interpolated within the step
    # (constant-gz fraction; volume absorption is gated off, so only the
    # flux_absorbed column key sees the sub-step approximation).
    # ------------------------------------------------------------------
    gask_mode = getattr(plan, "gas_k", None) is not None
    if gask_mode:
        assert gas_mode, "gas_k requires a gas-channel plan"
        # Detectors ride the closed shadow trace (fast_plan returns None for
        # gas plans without closed-trace eligibility): the cloud tau comes
        # from shadow_closed, the per-lane-k gas tau from the carried
        # cumulative Gz — see the detector block in fast_event.
        assert not plan.detectors or plan.closed_shadow, \
            "gas_k detectors require the closed shadow trace"
        # Volume absorption IS supported: with the tally on, gas deaths
        # invert the lane's cumulative Gz for their exact z layer (see
        # gk_vol in the event step); cloud deaths are exact already.
        from i3rc_tpu.core.illumination import _TOP_Z
        from i3rc_tpu.ops.gather import read_rows as _read_rows_gk

        _gk_prof = np.asarray(plan.gas_k.profiles, np.float64)   # (n_k, n_z)
        _gk_w = np.asarray(plan.gas_k.weights, np.float64)
        n_k = _gk_prof.shape[0]
        assert _gk_prof.shape == (n_k, n_z) and np.all(_gk_w > 0.0)
        assert L >= n_k, "need at least one lane per k point"
        assert n_photons >= n_k, "need at least one photon per k point"
        dz_gk = float(z_max - z0) / n_z
        inv_dz_gk = np.float32(n_z / (z_max - z0))
        _gk_cum = np.concatenate(
            [np.zeros((n_k, 1)), np.cumsum(_gk_prof * dz_gk, axis=1)], axis=1)
        gk_table = jnp.asarray(
            np.stack([_gk_prof, _gk_cum[:, :n_z]], axis=-1)
            .reshape(n_k * n_z, 2).astype(np.float32))
        # Lane partition: contiguous per-k blocks sized by weight (>= 1).
        _frac = _gk_w / _gk_w.sum()
        gk_counts = np.maximum(1, np.floor(_frac * L).astype(np.int64))
        for _ in range(int(L - gk_counts.sum())):
            gk_counts[np.argmax(_frac * L - gk_counts)] += 1
        while gk_counts.sum() > L:
            gk_counts[np.argmax(gk_counts)] -= 1
        gk_starts = np.concatenate([[0], np.cumsum(gk_counts)[:-1]])
        # Per-k photon budgets: exact partition of n_photons by weight.
        gk_budget = np.maximum(1, np.floor(_frac * n_photons).astype(np.int64))
        for _ in range(int(n_photons - gk_budget.sum())):
            gk_budget[np.argmax(_frac * n_photons - gk_budget)] += 1
        while gk_budget.sum() > n_photons:
            gk_budget[np.argmax(gk_budget)] -= 1
        # Lane-static vectors: k row offset, tally weight, launch-G, budget.
        k_idx_np = np.repeat(np.arange(n_k), gk_counts)
        gk_row_off = jnp.asarray((k_idx_np * n_z).astype(np.int32))
        gk_lane_w = jnp.asarray(
            (_gk_w * n_photons / gk_budget)[k_idx_np].astype(np.float32))
        # Per-lane TOTAL gas column Gz(z_max): shadow rays to the top carry
        # (Gz(z_max) - Gz(z)) / dzd of per-k gas; to the bottom, Gz(z)/|dzd|.
        gk_gtop_lane = jnp.asarray(
            _gk_cum[:, n_z][k_idx_np].astype(np.float32))
        _zl = z0 + float(_TOP_Z) * (z_max - z0)
        _ll = min(int((_zl - z0) / dz_gk), n_z - 1)
        _gl_k = _gk_cum[:, _ll] + (_zl - (z0 + _ll * dz_gk)) * _gk_prof[:, _ll]
        gk_launch_G = jnp.asarray(_gl_k[k_idx_np].astype(np.float32))
        gk_budget_lane = jnp.asarray(gk_budget[k_idx_np].astype(np.int32))
        gk_rank0 = jnp.asarray(
            (np.arange(L) - gk_starts[k_idx_np]).astype(np.int32))
        gk_counts_t = np.asarray(gk_counts, np.int32)
        gk_starts_idx = jnp.asarray(gk_starts.astype(np.int32))
        gk_slices = [(int(s), int(s + c))
                     for s, c in zip(gk_starts, gk_counts)]
        n_photons_total = int(gk_budget.sum())
        # Heating-rate bands (compute_volume_absorption): gas deaths must
        # land in their EXACT z layer, so the event step inverts the
        # piecewise-linear Gz at the death target.  The per-lane cumulative
        # row is lane-STATIC (k is a lane attribute) — one (L, n_z) f32
        # broadcast-compare finds the death layer, one extra one-hot row
        # read linearizes within it.  Only paid when the tally is on.
        gk_vol = bool(getattr(config, "compute_volume_absorption", False))
        if gk_vol:
            gk_cum_lane = jnp.asarray(
                _gk_cum[:, :n_z][k_idx_np].astype(np.float32))
    else:
        gk_vol = False

    def wrap_fast(v, lo, hi):
        """Periodic wrap for positions at most one event-step outside."""
        w = hi - lo
        return jnp.where(v >= hi, v - w, jnp.where(v < lo, v + w, v))

    D = len(plan.detectors)

    def shadow_trace(d_idx, live, px, py, pz):
        """Exact optical depth to the z boundary along detector d_idx.

        Fully unrolled segment DDA (plan.shadow_steps bounds the crossings):
        the transmittance trace of computeIntensityContribution
        (monteCarloRadiativeTransfer.f95:1512-1535), which integrates tau
        cell by cell — here segment box by segment box, closed-form.
        Returns (tau, exit column, exited).
        """
        dxd, dyd, dzd, _ = plan.detectors[d_idx]
        going_up = dzd >= 0.0
        use_x = abs(dxd) >= 1e-12
        use_y = track_y and abs(dyd) >= 1e-12
        inv_dzd = jnp.float32(1.0 / dzd)
        tau = jnp.zeros_like(px)
        col = jnp.zeros(L, jnp.int32)
        done = ~live
        for _ in range(plan.shadow_steps):
            ext_s = fx(px) * fz(pz)
            if track_y:
                ext_s = ext_s * fy(py)
            face_zs = (fz.face_up(pz, z_max) if going_up else fz.face_dn(pz, z0))
            s_z = (face_zs - pz) * inv_dzd
            s_b = s_z
            if use_x:
                face_xs = (fx.face_up(px, x_max) if dxd >= 0
                           else fx.face_dn(px, x0))
                s_x = (face_xs - px) * jnp.float32(1.0 / dxd)
                s_b = jnp.minimum(s_b, s_x)
            if use_y:
                face_ys = (fy.face_up(py, y_max) if dyd >= 0
                           else fy.face_dn(py, y0))
                s_y = (face_ys - py) * jnp.float32(1.0 / dyd)
                s_b = jnp.minimum(s_b, s_y)
            s_b = jnp.maximum(s_b, 0.0)
            tau = jnp.where(done, tau, tau + s_b * ext_s)
            npz = pz + dzd * s_b
            npz = jnp.where(s_z <= s_b,
                            face_zs + (nudge_z if going_up else -nudge_z), npz)
            if use_x:
                npx = px + dxd * s_b
                npx = jnp.where(s_x <= s_b,
                                face_xs + (nudge_x if dxd >= 0 else -nudge_x), npx)
                npx = wrap_fast(npx, x0, x_max)
            else:
                npx = px
            if use_y:
                npy = py + dyd * s_b
                npy = jnp.where(s_y <= s_b,
                                face_ys + (nudge_y if dyd >= 0 else -nudge_y), npy)
                npy = wrap_fast(npy, y0, y_max)
            elif track_y:
                npy = py
            exit_now = ~done & ((npz >= z_max) if going_up else (npz <= z0))
            ixs = jnp.clip(((npx - x0) * inv_dx).astype(jnp.int32), 0, n_x - 1)
            if track_y and n_y > 1:
                iys = jnp.clip(((npy - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
                col_s = ixs * n_y + iys
            else:
                col_s = ixs
            col = jnp.where(exit_now, col_s, col)
            done = done | exit_now
            px = jnp.where(done, px, npx)
            pz = jnp.where(done, pz, npz)
            if track_y:
                py = jnp.where(done, py, npy)
        return tau, col, done & live

    # Closed-form transmittance (FastPlan.closed_shadow): with at most one
    # non-trivial horizontal factor fh, tau(p -> z boundary along d) =
    # sum over fz segments of  v_z * c_other * integral of fh along the
    # ray's horizontal footprint in that segment's t-window — and the
    # horizontal line integral is a difference of FhP, the periodic
    # extension of the cumulative integral of fh (piecewise linear, few
    # segments).  Exact (same quantity the marching trace integrates box
    # by box), O(n_z_seg * n_h_seg) selects, no step budget, and the exit
    # column is one wrap + floor.  Replaces the transmittance trace of
    # computeIntensityContribution (monteCarloRadiativeTransfer.f95:
    # 1512-1535) with a constant-cost evaluation.
    if D and plan.closed_shadow:
        if fx.n_ops:
            _h_f, _h_lo, _h_hi, _h_axis = fx, x0, x_max, 0
            _c_other = float(fy.values[0])
        elif fy.n_ops:
            _h_f, _h_lo, _h_hi, _h_axis = fy, y0, y_max, 1
            _c_other = float(fx.values[0])
        else:
            _h_f, _h_axis = None, -1
            _c_other = float(fx.values[0]) * float(fy.values[0])
        _z_seg_lo = (float(z0),) + fz.thresholds
        _z_seg_hi = fz.thresholds + (float(z_max),)
        _z_vals = tuple(float(v) * _c_other for v in fz.values)
        # Gas plans: the horizontally-uniform gas profile adds its own
        # vertical closed-form segments (no horizontal factor) to every
        # shadow trace — the reference integrates TOTAL extinction along
        # the path (accumulateExtinctionAlongPath sums all components,
        # monteCarloRadiativeTransfer.f95:1654-1807).  Fused-k plans skip
        # the BAKED segments: each lane adds its own k profile's gas tau
        # from the carried cumulative (detector block in fast_event).
        if gas_mode and not gask_mode:
            _gf = plan.gas_factor
            _g_seg_lo = (float(z0),) + _gf.thresholds
            _g_seg_hi = _gf.thresholds + (float(z_max),)
            _g_vals = tuple(float(v) for v in _gf.values)
        if _h_f is not None:
            _h_starts = (float(_h_lo),) + _h_f.thresholds
            _h_ends = _h_f.thresholds + (float(_h_hi),)
            _h_cums = [0.0]
            for s_, e_, v_ in zip(_h_starts, _h_ends, _h_f.values):
                _h_cums.append(_h_cums[-1] + float(v_) * (e_ - s_))
            _h_tot = np.float32(_h_cums[-1])
            _h_W = np.float32(_h_hi - _h_lo)
            _h_invW = np.float32(1.0 / (_h_hi - _h_lo))

            def _cum_h(xu):
                """FhP: cumulative integral of fh, periodically extended."""
                n = jnp.floor((xu - jnp.float32(_h_lo)) * _h_invW)
                r = xu - n * _h_W
                F = jnp.float32(_h_f.values[0]) * (r - jnp.float32(_h_lo))
                for s_, v_, c_ in zip(_h_starts[1:], _h_f.values[1:],
                                      _h_cums[1:]):
                    F = jnp.where(r >= jnp.float32(s_),
                                  jnp.float32(c_)
                                  + jnp.float32(v_) * (r - jnp.float32(s_)),
                                  F)
                return n * _h_tot + F

        _wrap_W_x = np.float32(x_max - x0)
        _wrap_inv_x = np.float32(1.0 / (x_max - x0))
        if track_y and n_y > 1:
            _wrap_W_y = np.float32(y_max - y0)
            _wrap_inv_y = np.float32(1.0 / (y_max - y0))

        def shadow_closed(d_idx, live, px, py, pz):
            dxd, dyd, dzd, _ = plan.detectors[d_idx]
            inv_dzd = jnp.float32(1.0 / dzd)
            going_up = dzd >= 0.0
            dhd = (dxd, dyd)[_h_axis] if _h_axis >= 0 else 0.0
            ph = (px, py)[_h_axis] if _h_axis >= 0 else None
            tau = jnp.zeros_like(px)
            for zl, zh, v in zip(_z_seg_lo, _z_seg_hi, _z_vals):
                if v <= 0.0:
                    continue
                if going_up:
                    t_lo = jnp.maximum((jnp.float32(zl) - pz) * inv_dzd, 0.0)
                    t_hi = jnp.maximum((jnp.float32(zh) - pz) * inv_dzd, 0.0)
                else:
                    t_lo = jnp.maximum((jnp.float32(zh) - pz) * inv_dzd, 0.0)
                    t_hi = jnp.maximum((jnp.float32(zl) - pz) * inv_dzd, 0.0)
                if _h_axis >= 0 and abs(dhd) > 1e-12:
                    seg = (_cum_h(ph + t_hi * jnp.float32(dhd))
                           - _cum_h(ph + t_lo * jnp.float32(dhd))) \
                        * jnp.float32(1.0 / dhd)
                elif _h_axis >= 0:
                    seg = _h_f(ph) * (t_hi - t_lo)
                else:
                    seg = t_hi - t_lo
                tau = tau + jnp.float32(v) * jnp.maximum(seg, 0.0)
            if gas_mode and not gask_mode:
                for zl, zh, v in zip(_g_seg_lo, _g_seg_hi, _g_vals):
                    if v <= 0.0:
                        continue
                    if going_up:
                        t_lo = jnp.maximum((jnp.float32(zl) - pz) * inv_dzd,
                                           0.0)
                        t_hi = jnp.maximum((jnp.float32(zh) - pz) * inv_dzd,
                                           0.0)
                    else:
                        t_lo = jnp.maximum((jnp.float32(zh) - pz) * inv_dzd,
                                           0.0)
                        t_hi = jnp.maximum((jnp.float32(zl) - pz) * inv_dzd,
                                           0.0)
                    tau = tau + jnp.float32(v) * jnp.maximum(t_hi - t_lo, 0.0)
            t_ex = ((jnp.float32(z_max) if going_up else jnp.float32(z0))
                    - pz) * inv_dzd
            xe = px + t_ex * jnp.float32(dxd)
            xe = xe - _wrap_W_x * jnp.floor((xe - x0) * _wrap_inv_x)
            ix = jnp.clip(((xe - x0) * inv_dx).astype(jnp.int32), 0, n_x - 1)
            if track_y and n_y > 1:
                ye_ = py + t_ex * jnp.float32(dyd)
                ye_ = ye_ - _wrap_W_y * jnp.floor((ye_ - y0) * _wrap_inv_y)
                iy = jnp.clip(((ye_ - y0) * inv_dy).astype(jnp.int32),
                              0, n_y - 1)
                col = ix * n_y + iy
            else:
                col = ix
            return tau, col, live

        shadow_fn = shadow_closed
    else:
        shadow_fn = shadow_trace

    # Segment-march depth: one event consumes the free path through up to
    # MARCH segment crossings before (or until) the collision, so the event
    # count per photon approaches the collision count and the expensive
    # per-event fixed costs (RNG draws, exponential deviate, scattering
    # rotation, counters) amortize over several crossings.  Column mode
    # keeps MARCH = 1: its per-substep one-hot column read dominates.
    MARCH = 1 if column_mode else max(1, int(getattr(config, "fastpath_march", 1)))
    # Collision chaining (bonus phases): after the main-phase collision and
    # scattering rotation, resolve up to CHAIN further collisions inline —
    # each draws a fresh free path and commits immediately IF the candidate
    # point stays strictly inside the current segment box (where extinction
    # is constant by construction, so the tentative collision is physical
    # with no further face logic).  A candidate outside the box defers: the
    # drawn optical depth becomes tau_rem and the next full event handles
    # the crossing — correct by the memorylessness of the free path in
    # optical depth.  In collision-dominated media (the tau=18 step-cloud
    # half: most collisions are followed by another collision in the same
    # segment) this roughly halves the number of full events per photon at
    # ~1/3 of a full event's vector cost per bonus phase; for column media
    # chained collisions skip the dominant per-event one-hot column read.
    # Radiance detectors disable chaining (every collision needs its shadow
    # traces, which dominate that path anyway).  gas_k disables it too: a
    # bonus move crosses gas layers, so each phase would need its own
    # endpoint read — the chain's saving inverts.
    # Depth auto (fastpath_chain < 0): workload-dependent optimum, round-5
    # A/B on the bench chip — plain cloud media peak at 2 (5.41e8 vs
    # 5.10e8 at 3: the deeper chain's extra where-lane work outweighs its
    # chain-hit rate), the BAKED gas channel at 3 (3.21e8 vs 2.43e8 at 2:
    # its gas-threshold test rides the bonus phases, so deeper chaining
    # still amortizes the endpoint read).
    chain_cfg = int(getattr(config, "fastpath_chain", -1))
    if chain_cfg < 0:
        chain_cfg = 3 if gas_mode else 2
    CHAIN = 0 if (D or gask_mode) else max(0, chain_cfg)
    bonus_draws = 4 if absorbing else 3
    bonus_base = n_draws
    n_draws += CHAIN * bonus_draws

    def fast_event(u, st, gas=None, det_sink=None, wgt=None):
        (alive, x, y, z, ux, uy, uz, tau_rem, orders, pk, bad, evct,
         acc_int) = st[:13]
        idx_extra = 13
        if gas_mode:
            tgas = st[idx_extra]
            idx_extra += 1
            if gask_mode:
                gcur = st[idx_extra]     # cumulative gas depth Gz(z), per k
                idx_extra += 1
            else:
                gz_fn, inv_gz_fn, gas_face = gas if gas is not None \
                    else make_gas_eval()
        tau_rem = jnp.where(tau_rem > 0.0, tau_rem, exponential_deviate(u[0]))

        # Exact local extinction (constant within the current segment box)
        # and distance to the nearest segment face in the travel direction.
        # The segment structure IS the transport grid, so every tentative
        # collision is physical — no null collisions, no acceptance test.
        up_x = ux >= 0.0
        up_z = uz >= 0.0
        sign_x = jnp.where(up_x, nudge_x, -nudge_x)
        sign_z = jnp.where(up_z, nudge_z, -nudge_z)
        if track_y:
            up_y = uy >= 0.0
            sign_y = jnp.where(up_y, nudge_y, -nudge_y)
        moving = alive
        collided = jnp.zeros_like(alive)
        for _ in range(MARCH):
            if column_mode:
                # One factored one-hot read per event fetches the lane's
                # column [v, z_base, z_top]; transport within the column is
                # exact (homogeneous layer + clear air), faces are the fine
                # x/y grid and the column's own z window.
                ix_c = jnp.clip(((x - x0) * inv_dx).astype(jnp.int32), 0, n_x - 1)
                iy_c = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
                cdat = read_rows(column_table, ix_c * n_y + iy_c)
                vcol, zb, zt = cdat[:, 0], cdat[:, 1], cdat[:, 2]
                if col_props:
                    # Per-column ssa + phase-table entry (multi-entry Mie
                    # tables): integers < 2^16 read exactly at
                    # DOT_PRECISION "high" (ops/gather.py note).
                    ssa_lane = cdat[:, 3]
                    pf_row = cdat[:, 4].astype(jnp.int32) * n_seg_cubic
                ext = jnp.where((z >= zb) & (z < zt), vcol, 0.0)
                face_x = x0 + (jnp.floor((x - x0) * inv_dx)
                               + up_x.astype(jnp.float32)) * geom.dx
                face_y = y0 + (jnp.floor((y - y0) * inv_dy)
                               + (uy >= 0.0).astype(jnp.float32)) * geom.dy
                face_z = jnp.where(
                    up_z,
                    jnp.where(z < zb, zb,
                              jnp.where(z < zt, zt, jnp.float32(z_max))),
                    jnp.where(z > zt, zt,
                              jnp.where(z > zb, zb, jnp.float32(z0))))
            else:
                ext = fx(x) * fz(z)
                if track_y:
                    ext = ext * fy(y)
                # Collision distance by multiply: the inverse-value chains
                # cost the same handful of selects as the forward chains but
                # replace the tau_rem/ext division (zero-valued segments
                # carry inv 0 and are masked by the ext > 0 select).
                inv_ext = inv_fx(x) * inv_fz(z)
                if track_y:
                    inv_ext = inv_ext * inv_fy(y)
                face_x = fx.next_face(x, up_x, x0, x_max)
                face_z = fz.next_face(z, up_z, z0, z_max)
                if track_y:
                    face_y = fy.next_face(y, up_y, y0, y_max)
            if gas_mode and not gask_mode:
                # Steps also stop at gas-segment faces so gz is constant
                # along the step; the gas channel competes as a third
                # outcome (below).  (gas_k never stops at gas faces — its
                # consumption is the closed-form cumulative difference.)
                gzv = gz_fn(z)
                face_zg = gas_face(z, up_z)
                face_z = jnp.where(up_z, jnp.minimum(face_z, face_zg),
                                   jnp.maximum(face_z, face_zg))
            sx = jnp.where(jnp.abs(ux) >= 2e-30, (face_x - x) / ux, _HUGE)
            sz = jnp.where(jnp.abs(uz) >= 2e-30, (face_z - z) / uz, _HUGE)
            s_bnd = jnp.minimum(sx, sz)
            if track_y:
                sy = jnp.where(jnp.abs(uy) >= 2e-30, (face_y - y) / uy, _HUGE)
                s_bnd = jnp.minimum(s_bnd, sy)
            s_bnd = jnp.maximum(s_bnd, 0.0)
            if column_mode:
                s_col = jnp.where(ext > 0.0,
                                  tau_rem / jnp.maximum(ext, TINY), _HUGE)
            else:
                s_col = jnp.where(ext > 0.0, tau_rem * inv_ext, _HUGE)

            if gas_mode and not gask_mode:
                s_gas = jnp.where(gzv > 0.0, tgas * inv_gz_fn(z), _HUGE)
                collide_m = moving & (s_col <= s_bnd) & (s_col <= s_gas)
                gas_die = moving & ~collide_m & (s_gas <= s_bnd)
                cross = moving & ~collide_m & ~gas_die
                adv = jnp.minimum(jnp.minimum(s_col, s_bnd), s_gas)
                # Gas tau is consumed along EVERY traveled step; gas deaths
                # stop exactly at the threshold-crossing point (adv==s_gas).
                tgas = jnp.where(moving, tgas - adv * gzv, tgas)
            else:
                collide_m = moving & (s_col <= s_bnd)
                cross = moving & ~collide_m
                adv = jnp.minimum(s_col, s_bnd)
            nxp = x + ux * adv
            nzp = z + uz * adv
            # Push the crossed coordinate(s) strictly past the face so the
            # next lookup lands in the new segment (ties push several axes:
            # harmless).
            nxp = jnp.where(cross & (sx <= s_bnd), face_x + sign_x, nxp)
            nzp = jnp.where(cross & (sz <= s_bnd), face_z + sign_z, nzp)
            nxp = wrap_fast(nxp, x0, x_max)
            if track_y:
                nyp = y + uy * adv
                nyp = jnp.where(cross & (sy <= s_bnd), face_y + sign_y, nyp)
                nyp = wrap_fast(nyp, y0, y_max)

            if gask_mode:
                # Per-k gas consumption over the WHOLE step, closed form:
                # one endpoint read of (gz, cum) gives Gz(z2); the traveled
                # gas depth is (Gz(z2) - Gz(z1)) / uz regardless of how
                # many gas layers the step crossed.  Threshold crossings
                # die mid-step at the constant-gz interpolated fraction.
                z_end = jnp.clip(nzp, jnp.float32(z0), jnp.float32(z_max))
                lay2 = jnp.clip(((z_end - z0) * inv_dz_gk).astype(jnp.int32),
                                0, n_z - 1)
                grow = _read_rows_gk(gk_table, gk_row_off + lay2)
                g2 = grow[:, 0]
                g_next = grow[:, 1] + (
                    z_end - (jnp.float32(z0)
                             + lay2.astype(jnp.float32) * jnp.float32(dz_gk))
                ) * g2
                dgas = jnp.where(jnp.abs(uz) >= 1e-6,
                                 (g_next - gcur) / uz, g2 * adv)
                dgas = jnp.maximum(dgas, 0.0)
                gas_die = moving & (dgas >= tgas)
                fdie = jnp.clip(tgas / jnp.maximum(dgas, TINY), 0.0, 1.0)
                if gk_vol:
                    # Exact death position: invert the lane's piecewise-
                    # linear Gz at the death target G_t = Gz(z1) + tgas*uz
                    # (both uz signs: traveled gas depth is (Gz(z2)-Gz(z1))
                    # /uz).  Death layer from the lane-static cumulative
                    # row; linear within the layer.  The constant-gz
                    # fraction stays for |uz| ~ 0 steps (single layer —
                    # already exact) and for the tally-off fast shape.
                    G_t = gcur + tgas * uz
                    ld = jnp.sum((gk_cum_lane <= G_t[:, None])
                                 .astype(jnp.int32), axis=1) - 1
                    ld = jnp.clip(ld, 0, n_z - 1)
                    row_d = _read_rows_gk(gk_table, gk_row_off + ld)
                    gz_ld = row_d[:, 0]
                    z_d = (jnp.float32(z0)
                           + ld.astype(jnp.float32) * jnp.float32(dz_gk)
                           + jnp.where(gz_ld > 0.0,
                                       (G_t - row_d[:, 1])
                                       / jnp.maximum(gz_ld, TINY),
                                       0.5 * jnp.float32(dz_gk)))
                    denom = uz * adv
                    f_ex = jnp.clip((z_d - z) / jnp.where(
                        jnp.abs(denom) > 0.0, denom, 1.0), 0.0, 1.0)
                    fdie = jnp.where(jnp.abs(uz) >= 1e-6, f_ex, fdie)
                xd = wrap_fast(x + ux * adv * fdie, x0, x_max)
                zd = z + uz * adv * fdie
                if track_y:
                    yd = wrap_fast(y + uy * adv * fdie, y0, y_max)
                collide_m = collide_m & ~gas_die
                cross = cross & ~gas_die
                surv = moving & ~gas_die
                tgas = jnp.where(surv, tgas - dgas, tgas)
                gcur = jnp.where(surv, g_next, gcur)

            exit_top = cross & (nzp >= z_max)
            exit_bot = cross & ~exit_top & (nzp <= z0)
            # Bottom arrivals pend as kind 2 regardless of the surface: for
            # a reflecting surface the flush tallies Fdn and the glue
            # Bernoulli-revives the lane (see `reflecting` above).
            pk = jnp.where(exit_top, 1, jnp.where(exit_bot, 2, pk))
            if gas_mode:
                pk = jnp.where(gas_die, 3, pk)
            tau_rem = jnp.where(cross, tau_rem - s_bnd * ext,
                                jnp.where(collide_m, 0.0, tau_rem))
            # Commit positions for every lane that moved: collided lanes
            # stop AT the collision, exiting lanes AT the (wrapped) boundary
            # point — the flush derives the tally column from the frozen
            # position, so no per-event column index is computed here.
            if gask_mode:
                x = jnp.where(gas_die, xd, jnp.where(moving, nxp, x))
                z = jnp.where(gas_die, zd, jnp.where(moving, nzp, z))
                if track_y:
                    y = jnp.where(gas_die, yd, jnp.where(moving, nyp, y))
            else:
                x = jnp.where(moving, nxp, x)
                z = jnp.where(moving, nzp, z)
                if track_y:
                    y = jnp.where(moving, nyp, y)
            collided = collided | collide_m
            moving = cross & ~exit_top & ~exit_bot

        if absorbing:
            # Bernoulli absorption at the collision (see FastPlan.ssa):
            # absorbed photons die with weight 1 at their frozen position;
            # only survivors contribute to detectors and scatter.  Same
            # expectation as the reference's analog weighting (:642-649).
            # Per-column-property plans read the lane's ssa from the column.
            ssa_v = ssa_lane if col_props else jnp.float32(plan.ssa)
            die = collided & (u[3] >= ssa_v)
            pk = jnp.where(die, 3, pk)
            collided = collided & ~die

        # Local-estimate radiance: every physical collision contributes
        # P(photon->detector)/(4 pi |mu_d|) x exp(-tau to the boundary) at
        # the shadow ray's exit column (computeIntensityContribution,
        # monteCarloRadiativeTransfer.f95:1419-1611; weight == 1 here).
        if D:
            pos_y = y if track_y else None
            for d, (dxd, dyd, dzd, amu) in enumerate(plan.detectors):
                proj = jnp.clip(ux * dxd + uy * dyd + uz * dzd, -1.0, 1.0)
                if fwd_mode:
                    # Tabulated phase VALUE at the photon->detector angle:
                    # log-space cubic row read (FastPlan.fwd_cubic), the
                    # fastpath form of the reference's forward-table
                    # interpolation (:1487-1509).
                    angd = jnp.arccos(proj)
                    posd = angd * jnp.float32(n_fwd_seg / np.pi)
                    segd = jnp.clip(posd.astype(jnp.int32), 0, n_fwd_seg - 1)
                    tdv = posd - segd.astype(posd.dtype)
                    cf = _read_rows_cubic(fwd_table, segd)
                    pf_v = jnp.exp(((cf[:, 3] * tdv + cf[:, 2]) * tdv
                                    + cf[:, 1]) * tdv + cf[:, 0])
                    norm_pf = pf_v * jnp.float32(1.0 / (4.0 * np.pi * amu))
                else:
                    norm_pf = hg_phase(plan.hg_g, proj) * jnp.float32(
                        1.0 / (4.0 * np.pi * amu))
                tau_d, col_d, ok = shadow_fn(d, collided, x, pos_y, z)
                if gask_mode:
                    # Per-lane-k gas along the shadow ray, closed form from
                    # the carried cumulative: (Gz(exit) - Gz(z)) / dzd with
                    # Gz(z0) = 0 — gcur is Gz at the frozen collision point.
                    g_exit = gk_gtop_lane if dzd > 0.0 else 0.0
                    tau_d = tau_d + jnp.maximum(
                        (g_exit - gcur) * jnp.float32(1.0 / dzd), 0.0)
                if iw_mode:
                    # Iwabuchi Eq 13/14 on the exact tau (the general
                    # kernel's trace cap only randomizes where the trace
                    # stops; given tau, the contribution law is this):
                    #   pf_pi <= zeta: accept w.p. pf_pi/zeta -> zeta/pi
                    #   else: tau <= tau_max -> exact; beyond tau_max,
                    #         survive w.p. exp(tau_max - tau) -> zeta/pi.
                    u_iw = u[iw_base + d]
                    pf_pi = jnp.float32(np.pi) * norm_pf
                    tau_max = -jnp.log(zeta_iw / jnp.maximum(pf_pi, TINY))
                    zp = jnp.float32(float(zeta_iw) / np.pi)
                    c_small = jnp.where(u_iw * zeta_iw <= pf_pi, zp, 0.0)
                    c_large = jnp.where(
                        tau_d <= tau_max, norm_pf * jnp.exp(-tau_d),
                        jnp.where(u_iw < jnp.exp(tau_max - tau_d), zp, 0.0))
                    contrib = jnp.where(
                        ok, jnp.where(pf_pi <= zeta_iw, c_small, c_large),
                        0.0)
                else:
                    contrib = jnp.where(ok, norm_pf * jnp.exp(-tau_d), 0.0)
                if wgt is not None:
                    # BRDF lane weight (XLA path; the Pallas path scales
                    # the replayed records in the glue instead).
                    contrib = contrib * wgt
                if gask_mode:
                    # Spectral weight w_k * n_photons / budget_k, same as
                    # the flux tallies (flush): the detector fields
                    # accumulate the weighted band sum directly.
                    contrib = contrib * gk_lane_w
                if det_sink is not None:
                    # Mosaic event block: record (contribution, exit column)
                    # per detector; the per-block XLA glue tallies the
                    # records (same expectation, the one-hot tally just
                    # moves off the hot loop — see _build_pallas_block).
                    det_sink(d, contrib, col_d)
                    continue
                vals = jnp.stack([contrib if j == d else jnp.zeros_like(contrib)
                                  for j in range(D)], axis=1)
                acc_int = tally_multi(acc_int, col_d, vals)

        def sample_mu(uu):
            if not table_mode:
                return hg_cosine(plan.hg_g, uu)
            # Piecewise-cubic inverse CDF (the general kernel's mu(p) fit,
            # wavefront.sample_cos_scat): one 4-wide one-hot row read.
            # Per-column-property plans offset into the lane's table entry.
            pos = jnp.clip(uu, 0.0, 1.0) * n_seg_cubic
            seg = jnp.clip(pos.astype(jnp.int32), 0, n_seg_cubic - 1)
            t_c = pos - seg.astype(pos.dtype)
            c = _read_rows_cubic(cubic_table,
                                 pf_row + seg if col_props else seg)
            return jnp.clip(
                ((c[:, 3] * t_c + c[:, 2]) * t_c + c[:, 1]) * t_c + c[:, 0],
                -1.0, 1.0)

        cos_scat = sample_mu(u[1])
        # Renormalization deferred to the per-block glue (see body/renorm):
        # saves an rsqrt in the hot kernel; drift is ~1e-7 per rotation.
        nux, nuy, nuz = rotate_direction(ux, uy, uz, cos_scat, u[2],
                                         renormalize=False)
        ux = jnp.where(collided, nux, ux)
        uy = jnp.where(collided, nuy, uy)
        uz = jnp.where(collided, nuz, uz)
        n_coll = collided.astype(jnp.int32)

        if CHAIN:
            # Collision chaining (see the CHAIN comment above): the segment
            # box around the frozen collision point — extinction is constant
            # inside it, so a candidate that stays strictly within commits
            # as a physical collision with no face logic; one that leaves
            # defers its drawn optical depth to the next full event
            # (memorylessness of the free path makes that exact).  Windows
            # and the local inverse extinction are chain-invariant: every
            # committed candidate remains in the same box.
            if column_mode:
                cwx = x0 + jnp.floor((x - x0) * inv_dx) * geom.dx
                wx_lo, wx_hi = cwx, cwx + jnp.float32(geom.dx)
                wz_lo, wz_hi = zb, zt
                inv_ext_c = 1.0 / jnp.maximum(vcol, TINY)
                if track_y:
                    cwy = y0 + jnp.floor((y - y0) * inv_dy) * geom.dy
                    wy_lo, wy_hi = cwy, cwy + jnp.float32(geom.dy)
            else:
                wx_lo, wx_hi = fx.face_dn(x, x0), fx.face_up(x, x_max)
                wz_lo, wz_hi = fz.face_dn(z, z0), fz.face_up(z, z_max)
                inv_ext_c = inv_fx(x) * inv_fz(z)
                if track_y:
                    wy_lo, wy_hi = fy.face_dn(y, y0), fy.face_up(y, y_max)
                    inv_ext_c = inv_ext_c * inv_fy(y)
            if gas_mode:
                gzv_c = gz_fn(z)
                up_b = jnp.ones_like(collided)
                wz_lo = jnp.maximum(wz_lo, gas_face(z, ~up_b))
                wz_hi = jnp.minimum(wz_hi, gas_face(z, up_b))
            chain = collided
            for b in range(CHAIN):
                i0 = bonus_base + b * bonus_draws
                tau_new = exponential_deviate(u[i0])
                s_c = tau_new * inv_ext_c
                cx = x + ux * s_c
                cz = z + uz * s_c
                inside = (cx > wx_lo) & (cx < wx_hi) \
                    & (cz > wz_lo) & (cz < wz_hi)
                if track_y:
                    cy = y + uy * s_c
                    inside = inside & (cy > wy_lo) & (cy < wy_hi)
                if gas_mode:
                    gcost = s_c * gzv_c
                    inside = inside & (gcost < tgas)
                commit = chain & inside
                # Deferred lanes carry the drawn optical depth into the next
                # full event; their position/direction stay at the last
                # committed collision.
                tau_rem = jnp.where(chain & ~inside, tau_new, tau_rem)
                x = jnp.where(commit, cx, x)
                z = jnp.where(commit, cz, z)
                if track_y:
                    y = jnp.where(commit, cy, y)
                if gas_mode:
                    tgas = jnp.where(commit, tgas - gcost, tgas)
                n_coll = n_coll + commit.astype(jnp.int32)
                if absorbing:
                    die_c = commit & (u[i0 + 3] >= (
                        ssa_lane if col_props else jnp.float32(plan.ssa)))
                    pk = jnp.where(die_c, 3, pk)
                    commit = commit & ~die_c
                cos_b = sample_mu(u[i0 + 1])
                bx_, by_, bz_ = rotate_direction(ux, uy, uz, cos_b,
                                                 u[i0 + 2], renormalize=False)
                ux = jnp.where(commit, bx_, ux)
                uy = jnp.where(commit, by_, uy)
                uz = jnp.where(commit, bz_, uz)
                chain = commit

        orders = orders + n_coll
        over = alive & (orders >= max_events)
        # Per-lane counters, reduced once per batch: a cross-lane sum here
        # would break the event step's single-fusion structure.
        bad = bad + over.astype(jnp.int32)
        evct = evct + alive.astype(jnp.int32)
        alive = alive & (pk == 0) & ~over
        return ((alive, x, y, z, ux, uy, uz, tau_rem, orders, pk, bad, evct,
                 acc_int) + ((tgas,) if gas_mode else ())
                + ((gcur,) if gask_mode else ()))

    # ------------------------------------------------------------------
    # Pallas event-block: K events per HBM round-trip.  The XLA fastpath
    # dispatches each event as (at best) one fused elementwise kernel, so
    # every event pays a full read+write of the wavefront state from HBM
    # (~13 MB at 2^17 lanes — measured ~27 us/event, right at the bandwidth
    # bound).  The Mosaic kernel keeps the state VMEM-resident across the
    # whole K-event block: traffic drops K-fold and the VPU runs from
    # registers.  Physics is byte-for-byte the same code (fast_event);
    # only the RNG stream differs (TPU hardware PRNG, seeded per
    # (batch key, block index, grid program)).
    # ------------------------------------------------------------------
    want_pallas = config.use_pallas_fastpath
    if want_pallas is None:
        want_pallas = jax.default_backend() == "tpu"
    # gas_k stays on the XLA fastpath: its per-lane one-hot endpoint read
    # inside the Mosaic kernel would re-create the tiny-dot chains that
    # killed pallas take one (PERF_NOTES.md).  Radiance detectors ride the
    # Mosaic kernel when the shadow trace is closed-form and the phase
    # value is analytic HG (no table reads in the event step): collisions
    # record (contribution, exit column) pairs that the per-block glue
    # tallies — see _build_pallas_block(n_detectors).
    # (Gas-channel plans qualify too: fast_plan only admits gas + detectors
    # with closed-trace eligibility, and shadow_closed folds the baked gas
    # profile's vertical segments in as pure elementwise work.)
    # Bound the record path's output count: it adds 2*K*D full (L,)-sized
    # kernel outputs (HBM traffic + Mosaic output slots scale with K*D), so
    # a many-detector run (e.g. a 16-direction azimuth scan at K=8) would
    # balloon the kernel.  Past the cap, fall back to the XLA fastpath's
    # per-event tally (still detector-capable, no Mosaic output pressure).
    # 32 covers the bench/test shapes (K=8 x D<=4) with margin.
    pallas_detectors = bool(D) and plan.closed_shadow and not fwd_mode \
        and plan.cubic is None and K * D <= 32
    use_pallas = (want_pallas and (D == 0 or pallas_detectors)
                  and not column_mode
                  and not table_mode and not gask_mode and L % 1024 == 0)
    if use_pallas:
        import os
        pallas_block = _build_pallas_block(
            fast_event, track_y, L, K, n_draws=n_draws, gas=gas_mode,
            n_detectors=D if pallas_detectors else 0,
            interpret=jax.default_backend() != "tpu",
            # Tuning knobs (measured optimum baked in as defaults; the env
            # vars exist for perf experiments on new hardware).
            blk_rows=int(os.environ.get("I3RC_PALLAS_BLK", "0")) or None,
            # Mosaic's default 16 MB scoped-VMEM cap rejects the K=16-32
            # unrolled event block (per-event temporaries stay live across
            # the unroll); v5e has headroom — 64 MB measured safe and fast.
            vmem_mb=int(os.environ.get("I3RC_PALLAS_VMEM_MB", "0")) or 64)

    # Per-cell absorption tally (heating rates): kind-3 deaths keyed by
    # (column, layer) at flush time.  Same expectation as the general
    # kernel's continuous (1-ssa)-weight deposit; one small one-hot per
    # K-event block.
    vol_tally = (getattr(config, "compute_volume_absorption", False)
                 and (absorbing or gas_mode))
    inv_dz_cell = np.float32(n_z / (z_max - z0))

    def flush(columns, vol, pk, x, y, z, wgt=None):
        # The tally column comes from the frozen exit position (exits commit
        # the wrapped boundary point into x/y; absorptions the collision
        # point), so the event step never computes a per-event column index.
        ix = jnp.clip(((x - x0) * inv_dx).astype(jnp.int32), 0, n_x - 1)
        if track_y and n_y > 1:
            iy = jnp.clip(((y - y0) * inv_dy).astype(jnp.int32), 0, n_y - 1)
            col = ix * n_y + iy
        else:
            col = ix
        kinds = [(pk == 1), (pk == 2)] + (
            [(pk == 3)] if absorbing or gas_mode else [])
        vals = jnp.stack([k.astype(jnp.float32) for k in kinds], axis=1)
        if wgt is not None:
            vals = vals * wgt[:, None]     # BRDF lane weight
        if gask_mode:
            # Lane-static spectral weight w_k * n_photons / budget_k: the
            # tallies accumulate the weighted band sum directly.
            vals = vals * gk_lane_w[:, None]
        if vol_tally:
            iz = jnp.clip(((z - z0) * inv_dz_cell).astype(jnp.int32),
                          0, n_z - 1)
            w3 = (pk == 3).astype(jnp.float32)
            if wgt is not None:
                w3 = w3 * wgt
            if gask_mode:
                w3 = w3 * gk_lane_w
            if n_cols * n_z <= (1 << 18):
                vol = tally_multi(vol, col * n_z + iz, w3[:, None])
            else:
                # Big grids (e.g. Landsat 1.95M cells): XLA scatter-add at
                # flush time — ~1 ms per 2^17 lanes, amortized over the
                # K-event block (vs ~0.7 ms/event for the column read, so
                # heating-rate output costs ~+15% instead of forcing the
                # general kernel).
                from i3rc_tpu.ops.tally import tally_scatter

                vol = tally_scatter(
                    vol[:, 0], jnp.where(pk == 3, col * n_z + iz,
                                         n_cols * n_z), w3)[:, None]
        return tally_multi(columns, col, vals), vol, jnp.zeros_like(pk)

    def trace(key, batch, source=None, optics_override=None):
        if optics_override is not None:
            if gask_mode:
                raise ValueError("gas_k fused spectral batching bakes every "
                                 "k profile; optics overrides don't apply")
            if not gas_mode:
                raise ValueError("fastpath bakes optics statically; only "
                                 "the gas channel takes overrides")
            # Spectral k-loop: the override's gas component values replace
            # the baked chain as TRACED scalars (one executable serves all
            # k points, mirroring the general kernel's optics argument).
            # The Pallas closure needs host constants, so override traces
            # run the XLA event loop.
            #
            # Plan-consistency guard: the override may only change the GAS
            # profile — the cloud part is baked into the segment factors.
            # When the override is concrete (direct/test calls; under jit
            # the arrays are tracers and the caller is responsible — the
            # Integrator itself never routes overrides here) verify that
            # the gas fraction is horizontally uniform and the residual
            # cloud field still matches the baked factorization.
            if not isinstance(optics_override.total_ext, jax.core.Tracer):
                tot = np.asarray(optics_override.total_ext).reshape(
                    n_x, n_y, n_z)
                cumv = np.asarray(optics_override.cumulative_ext).reshape(
                    n_x, n_y, n_z, 2)
                frac_g = (cumv[..., 1] - cumv[..., 0] if plan.gas_idx == 1
                          else cumv[..., 0])
                gasf = tot * frac_g
                tol = 1e-5 * max(float(tot.max()), 1e-30)
                if float(np.ptp(gasf, axis=(0, 1)).max()) > tol:
                    raise ValueError(
                        "fastpath gas override: gas component is not "
                        "horizontally uniform")
                cloud = tot - gasf.mean(axis=(0, 1))[None, None, :]
                xc = x0 + (np.arange(n_x) + 0.5) * geom.dx
                yc = y0 + (np.arange(n_y) + 0.5) * geom.dy
                zc = z0 + (np.arange(n_z) + 0.5) * (z_max - z0) / n_z
                recon = (fx.eval_np(xc)[:, None, None]
                         * fy.eval_np(yc)[None, :, None]
                         * fz.eval_np(zc)[None, None, :])
                if not np.allclose(cloud, recon, rtol=1e-4, atol=tol):
                    raise ValueError(
                        "fastpath gas override: cloud component differs "
                        "from the baked plan (only the gas profile may "
                        "change per k point)")
            cum = optics_override.cumulative_ext.reshape(n_x * n_y * n_z, 2)
            frac = cum[:, 1] - cum[:, 0] if plan.gas_idx == 1 else cum[:, 0]
            prof = (optics_override.total_ext * frac).reshape(
                n_x, n_y, n_z)[0, 0, :]
            gas_eval = make_gas_eval(prof)
            pallas_ok = False
        else:
            gas_eval = None      # fast_event falls back to the baked chain
            pallas_ok = True
        x = x0 + batch.x * (x_max - x0)
        y = y0 + batch.y * (y_max - y0)
        z = z0 + batch.z * (z_max - z0)
        ux, uy, uz = make_direction_cosines(batch.mu, batch.phi)
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        if gask_mode:
            # Per-k budgets: lane i launches iff its within-block rank fits
            # its k point's photon quota; `launched` is the (n_k,) count.
            alive = gk_rank0 < gk_budget_lane
            launched = jnp.asarray(
                np.minimum(gk_counts, gk_budget).astype(np.int32))
        else:
            alive = lane_ids < n_photons
            launched = jnp.int32(min(L, n_photons))
        zeros_i = jnp.zeros(L, jnp.int32)
        columns = jnp.zeros((n_cols, 3 if absorbing or gas_mode else 2),
                            jnp.float32)
        vol = jnp.zeros((n_cols * n_z, 1) if vol_tally else (1, 1),
                        jnp.float32)

        def body(carry):
            if brdf_mode:
                kb, launched, st, columns, vol, srf, wgt = carry
            else:
                kb, launched, st, columns, vol, srf = carry
                wgt = None
            (alive, x, y, z, ux, uy, uz, tau_rem, orders, pk,
             bad, evct, acc_int) = st[:13]
            if gas_mode:
                tgas = st[13]
            if gask_mode:
                gcur = st[14]
            # Per-block direction renormalization: the event step skips the
            # per-rotation rsqrt (rotate_direction(renormalize=False)), so
            # f32 drift (~1e-7/rotation) is squeezed out here, once per K
            # events, fused into this glue's elementwise work.
            rn = jax.lax.rsqrt(jnp.maximum(ux * ux + uy * uy + uz * uz,
                                           jnp.float32(1e-12)))
            ux, uy, uz = ux * rn, uy * rn, uz * rn
            hit_bot = pk == 2        # before the flush zeroes pk
            # Flush last block's deaths, then refill those lanes (FIFO).
            columns, vol, pk = flush(columns, vol, pk, x, y, z, wgt=wgt)
            if reflecting:
                # Surface resolution (see `reflecting` above): Fdn is
                # already tallied by the flush (kind 2); revive the lane
                # with probability A — or min(R, 1) under the BRDF kernel,
                # carrying max(R, 1) on the lane weight — with a fresh
                # cosine-weighted direction, before the refill can claim
                # it.  tau_rem carries through the bounce (free-path
                # memorylessness).
                u_r = jax.random.uniform(
                    jax.random.fold_in(key, -kb - 1 - (1 << 25)), (3, L),
                    dtype=jnp.float32)
                mu_r = jnp.maximum(jnp.sqrt(u_r[1]), jnp.float32(1e-6))
                sin_r = jnp.sqrt(jnp.maximum(1.0 - u_r[1], 0.0))
                sch, cch = _sincos_2pi(u_r[2])
                if brdf_mode:
                    # R = brdf(params, in, out) under the cosine-weighted
                    # draw — the reference's weight *= R at mu = sqrt(u)
                    # (monteCarloRadiativeTransfer.f95:542-563) in
                    # Bernoulli-plus-carry form: unbiased for any R >= 0.
                    phi_in = jnp.arctan2(uy, ux)
                    phi_out = jnp.float32(2.0 * np.pi) * u_r[2]
                    refl = jnp.maximum(
                        brdf_fn(brdf_params, uz, mu_r, phi_in, phi_out),
                        0.0)
                    revive = hit_bot & (u_r[0] < jnp.minimum(refl, 1.0))
                else:
                    revive = hit_bot & (
                        u_r[0] < jnp.float32(plan.surface_albedo))
                if D:
                    # Surface radiance (component 0): Lambertian emission
                    # is direction-independent — weight-1 survivors
                    # contribute 1/pi x exp(-tau) at the shadow ray's exit
                    # column, the A-expectation of the general kernel's
                    # w*A/pi (computeIntensityContribution :1473-1480).
                    # BRDF surfaces estimate on EVERY bottom hit instead:
                    # R(in -> detector)/pi with the PRE-reflection lane
                    # weight (the general kernel's surface_detector_pf —
                    # the sampled bounce's R may be ~0 while the detector
                    # direction's is not).
                    zs = jnp.where(hit_bot, z0 + nudge_z, z)
                    pos_ys = y if track_y else None
                    emit_s = hit_bot if brdf_mode else revive
                    if iw_mode:
                        u_s = jax.random.uniform(
                            jax.random.fold_in(key, -kb - 1 - (1 << 26)),
                            (D, L), dtype=jnp.float32)
                    for d in range(D):
                        if plan.detectors[d][2] <= 0.0:
                            # Surface reflection emits upward only; the
                            # general kernel agrees operationally (its trace
                            # from the boundary in a downward direction is a
                            # zero-step trace, dropped as BAD — matching the
                            # reference's non-positive-step guard,
                            # monteCarloRadiativeTransfer.f95:1711-1714).
                            continue
                        tau_d, col_d, okd = shadow_fn(d, emit_s, x,
                                                      pos_ys, zs)
                        if gask_mode:
                            # Revived lanes sit at the surface: the per-k
                            # gas tau to the top is the full column.
                            tau_d = tau_d + gk_gtop_lane * jnp.float32(
                                1.0 / plan.detectors[d][2])
                        if brdf_mode:
                            refl_d = jnp.maximum(brdf_fn(
                                brdf_params, uz,
                                jnp.float32(plan.detectors[d][2]), phi_in,
                                jnp.float32(det_phi[d])), 0.0)
                            npf_s = refl_d * jnp.float32(1.0 / np.pi)
                        else:
                            npf_s = jnp.float32(1.0 / np.pi)
                        if iw_mode:
                            # Same Iwabuchi rule as the collision block.
                            pf_pi_s = jnp.float32(np.pi) * npf_s
                            tmax_s = -jnp.log(
                                zeta_iw / jnp.maximum(pf_pi_s, TINY))
                            zp_s = jnp.float32(float(zeta_iw) / np.pi)
                            cs_ = jnp.where(u_s[d] * zeta_iw <= pf_pi_s,
                                            zp_s, 0.0)
                            cl_ = jnp.where(
                                tau_d <= tmax_s, npf_s * jnp.exp(-tau_d),
                                jnp.where(u_s[d] < jnp.exp(tmax_s - tau_d),
                                          zp_s, 0.0))
                            contrib = jnp.where(
                                okd, jnp.where(pf_pi_s <= zeta_iw, cs_, cl_),
                                0.0)
                        else:
                            contrib = jnp.where(
                                okd, npf_s * jnp.exp(-tau_d), 0.0)
                        if brdf_mode:
                            contrib = contrib * wgt   # pre-reflection weight
                        if gask_mode:
                            contrib = contrib * gk_lane_w
                        vals = jnp.stack(
                            [contrib if j == d else jnp.zeros_like(contrib)
                             for j in range(D)], axis=1)
                        srf = tally_multi(srf, col_d, vals)
                if brdf_mode:
                    wgt = jnp.where(revive, wgt * jnp.maximum(refl, 1.0),
                                    wgt)
                ux = jnp.where(revive, sin_r * cch, ux)
                uy = jnp.where(revive, sin_r * sch, uy)
                uz = jnp.where(revive, mu_r, uz)
                z = jnp.where(revive, z0 + nudge_z, z)
                orders = jnp.where(revive, orders + 1, orders)
                alive = alive | revive
                if gask_mode:
                    # Revived lanes sit at the surface: Gz(z0) == 0.
                    gcur = jnp.where(revive, 0.0, gcur)
            if gask_mode:
                # Per-k quota refill: rank each dead lane within its k
                # block (exclusive cumsum rebased at the static block
                # starts) and admit while that k point's photon budget
                # lasts — the spectral allocation stays exactly
                # weight-proportional even though per-k lifetimes differ
                # (strongly absorbing k points recycle lanes faster).
                dead = ~alive
                dead_i = dead.astype(jnp.int32)
                cs_excl = jnp.cumsum(dead_i) - dead_i
                base = jnp.take(cs_excl, gk_starts_idx)
                rank = cs_excl - jnp.repeat(base, gk_counts_t,
                                            total_repeat_length=L)
                launched_lane = jnp.repeat(launched, gk_counts_t,
                                           total_repeat_length=L)
                refill = dead & (launched_lane + rank < gk_budget_lane)
                fresh = source.sample(jax.random.fold_in(key, -kb - 1), L)
                x = jnp.where(refill, x0 + fresh.x * (x_max - x0), x)
                y = jnp.where(refill, y0 + fresh.y * (y_max - y0), y)
                z = jnp.where(refill, z0 + fresh.z * (z_max - z0), z)
                fux, fuy, fuz = make_direction_cosines(fresh.mu, fresh.phi)
                ux = jnp.where(refill, fux, ux)
                uy = jnp.where(refill, fuy, uy)
                uz = jnp.where(refill, fuz, uz)
                tau_rem = jnp.where(refill, 0.0, tau_rem)
                orders = jnp.where(refill, 0, orders)
                u_g = jax.random.uniform(
                    jax.random.fold_in(key, -kb - 1 - (1 << 24)), (L,),
                    dtype=jnp.float32)
                tgas = jnp.where(refill, exponential_deviate(u_g), tgas)
                gcur = jnp.where(refill, gk_launch_G, gcur)
                if brdf_mode:
                    wgt = jnp.where(refill, 1.0, wgt)
                refill_i = refill.astype(jnp.int32)
                launched = launched + jnp.stack(
                    [jnp.sum(refill_i[s:e]) for s, e in gk_slices])
                alive = alive | refill
            elif n_photons > L:
                # (Measured: gating this behind lax.cond(launched < n) to
                # skip the drain-phase cumsum COSTS ~15% — the cond's tensor
                # operand copies outweigh the saved work.  Keep it inline.)
                dead = ~alive
                dead_i = dead.astype(jnp.int32)
                new_id = launched + jnp.cumsum(dead_i) - dead_i
                refill = dead & (new_id < n_photons)
                fresh = source.sample(jax.random.fold_in(key, -kb - 1), L)
                x = jnp.where(refill, x0 + fresh.x * (x_max - x0), x)
                y = jnp.where(refill, y0 + fresh.y * (y_max - y0), y)
                z = jnp.where(refill, z0 + fresh.z * (z_max - z0), z)
                fux, fuy, fuz = make_direction_cosines(fresh.mu, fresh.phi)
                ux = jnp.where(refill, fux, ux)
                uy = jnp.where(refill, fuy, uy)
                uz = jnp.where(refill, fuz, uz)
                tau_rem = jnp.where(refill, 0.0, tau_rem)
                orders = jnp.where(refill, 0, orders)
                if gas_mode:
                    u_g = jax.random.uniform(
                        jax.random.fold_in(key, -kb - 1 - (1 << 24)), (L,),
                        dtype=jnp.float32)
                    tgas = jnp.where(refill, exponential_deviate(u_g), tgas)
                if brdf_mode:
                    wgt = jnp.where(refill, 1.0, wgt)
                launched = launched + jnp.sum(refill.astype(jnp.int32))
                alive = alive | refill
            st = (alive, x, y, z, ux, uy, uz, tau_rem, orders, pk,
                  bad, evct, acc_int) + ((tgas,) if gas_mode else ()) \
                + ((gcur,) if gask_mode else ())
            if use_pallas and pallas_ok:
                kd = jax.lax.bitcast_convert_type(
                    jax.random.key_data(jax.random.fold_in(key, kb)),
                    jnp.int32).ravel()
                seed2 = jnp.stack([kd[0], kd[-1]]).reshape(1, 2)
                if pallas_detectors:
                    st, recs = pallas_block(seed2, st)
                    # Replay the K x D recorded (contribution, column)
                    # pairs through the flat per-detector one-hot tally —
                    # identical expectation to the XLA fastpath's per-event
                    # tally_multi, off the hot loop.  The BRDF lane weight
                    # is constant across the block, so it scales the
                    # records here instead of entering the Mosaic kernel.
                    af = st[12].reshape(n_cols * D, 1)
                    for i, (c_, col_) in enumerate(recs):
                        cw = c_ * wgt if brdf_mode else c_
                        af = tally_multi(af, col_ * D + (i % D), cw[:, None])
                    st = st[:12] + (af.reshape(n_cols, D),) + st[13:]
                else:
                    st = pallas_block(seed2, st)
            else:
                # Per-event RNG dispatch: XLA keeps each (3, L) draw
                # VMEM-resident (a single (K, 3, L) block draw was measured
                # 9% slower — the buffer spills to HBM and every event
                # re-reads it).
                for j in range(K):
                    u = jax.random.uniform(jax.random.fold_in(key, kb * K + j),
                                           (n_draws, L), dtype=jnp.float32)
                    st = fast_event(u, st, gas=gas_eval,
                                    wgt=wgt if brdf_mode else None)
            out = (kb + 1, launched, st, columns, vol, srf)
            return out + ((wgt,) if brdf_mode else ())

        def cond(carry):
            kb, launched, st = carry[0], carry[1], carry[2]
            budget_open = (jnp.sum(launched) < n_photons_total if gask_mode
                           else launched < n_photons)
            live = jnp.any(st[0]) | budget_open
            if reflecting:
                # Paused bottom hits await their flush-time Bernoulli.
                live = live | jnp.any(st[9] == 2)
            return live & (kb < max_blocks)

        acc_int0 = jnp.zeros((n_cols, D) if D else (1, 1), jnp.float32)
        srf0 = jnp.zeros((n_cols, D) if reflecting and D else (1, 1),
                         jnp.float32)
        st = (alive, x, y, z, ux, uy, uz, jnp.zeros(L, jnp.float32),
              zeros_i, zeros_i, zeros_i, zeros_i, acc_int0)
        if gas_mode:
            # Sentinel key 0xB0000000, disjoint (as uint32) from the
            # positive event keys fold_in(key, kb*K + j) (< ~2^26) AND the
            # wrapped negative refill keys -kb-1 / gas-refill -kb-1-(1<<24)
            # / surface-revive -kb-1-(1<<25) / surface-Iwabuchi
            # -kb-1-(1<<26) (all >= 2^32 - 2^27): the launch gas
            # thresholds must not reuse any event block's transport stream.
            tgas0 = exponential_deviate(jax.random.uniform(
                jax.random.fold_in(key, 0xB0000000), (L,), dtype=jnp.float32))
            st = st + (tgas0,)
        if gask_mode:
            st = st + (gk_launch_G,)
        carry0 = (jnp.int32(0), launched, st, columns, vol, srf0)
        if brdf_mode:
            carry0 = carry0 + (jnp.ones(L, jnp.float32),)
        fin = jax.lax.while_loop(cond, body, carry0)
        kb, launched, st, columns, vol, srf_acc = fin[:6]
        wgt_fin = fin[6] if brdf_mode else None
        columns, vol, _ = flush(columns, vol, st[9], st[1], st[2], st[3],
                                wgt=wgt_fin)
        # Lanes alive at the block cap vanish with their weight: count bad
        # (in reflecting mode a paused bottom hit loses its possible
        # continuation the same way — its Fdn is already tallied).
        n_bad = jnp.sum(st[10] + st[0].astype(jnp.int32))
        if reflecting:
            n_bad = n_bad + jnp.sum((st[9] == 2).astype(jnp.int32))

        zero_cols = jnp.zeros(n_cols, jnp.float32)
        zero0 = jnp.zeros(0, jnp.float32)
        if D:
            coll = st[12].reshape(n_cols * D)
            # Component slot 0 is the surface; scatterers follow in
            # component order.
            srf = (srf_acc.reshape(n_cols * D) if reflecting
                   else jnp.zeros_like(coll))
            intensity = coll + srf
            if gas_mode:
                # The gas (pure absorber) never scatters toward a
                # detector: its slot stays zero, the cloud's collisions
                # land at the cloud's component index.
                slots = [srf, jnp.zeros_like(coll), jnp.zeros_like(coll)]
                slots[1 + (1 - plan.gas_idx)] = coll
            else:
                slots = [srf, coll]
            by_comp = jnp.stack(slots, axis=1).reshape(-1)
        else:
            intensity = by_comp = zero0
        fdn = columns[:, 1]
        return RawTallies(
            flux_up=columns[:, 0], flux_down=fdn,
            flux_absorbed=(columns[:, 2] if absorbing or gas_mode
                           else zero_cols),
            volume_absorption=(vol[:, 0] if vol_tally
                               else jnp.zeros(n_cols * n_z, jnp.float32)),
            intensity=intensity, intensity_by_component=by_comp,
            intensity_excess=jnp.zeros(
                D * (3 if gas_mode else 2) if D else 0, jnp.float32),
            n_photons=jnp.int32(n_photons), n_bad=n_bad,
            n_iterations=kb * K,
            n_lane_events=jnp.sum(st[11]).astype(jnp.float32))

    return trace
