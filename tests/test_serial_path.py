"""The serial-gather (large-domain) kernel path vs the one-hot path.

Domains above ops/gather.ONEHOT_MAX_ROWS cells read per-cell optics with
XLA serialized gathers (one packed cell_matrix row per event) and tally by
column one-hot + volume scatter-add (wavefront.py read_cell_data / the
col_onehot tally branch).  No CI-sized domain crosses the real threshold,
so these tests lower it and cross-check both code paths on the SAME domain,
same seed, same transport structure: the RNG stream and every collision
decision are identical, so tallies must agree to float32 summation-order
noise (CPU matmuls don't round to bf16 — see ops/gather.DOT_PRECISION).

Reference behavior matched: accumulateExtinctionAlongPath traces the
Landsat-scale domains through the same loop as small ones
(/root/reference/Integrators/monteCarloRadiativeTransfer.f95:1654-1807).
"""

import jax
import numpy as np
import pytest

import i3rc_tpu.integrators.wavefront as wavefront_mod
import i3rc_tpu.ops.gather as gather_mod
from i3rc_tpu import Domain, Integrator, IntegratorConfig, PhaseFunction, PhotonSource
from i3rc_tpu.core.phase_functions import (
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)


def _domain(uniform_ssa):
    """8x8x8 heterogeneous cloud; optionally spatially varying ssa."""
    rng = np.random.default_rng(7)
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    ext = rng.uniform(0.0, 0.03, (8, 8, 8))
    ext[ext < 0.008] = 0.0          # clear patches exercise the majorant DDA
    ssa = (np.full_like(ext, 0.9) if uniform_ssa
           else rng.uniform(0.5, 1.0, ext.shape))
    dom = Domain.create(np.linspace(0.0, 800.0, 9), np.linspace(0.0, 800.0, 9),
                        np.linspace(0.0, 400.0, 9))
    return dom.add_component("cloud", ext, ssa, np.zeros(ext.shape, np.int32),
                             table)


def _run(dom, n=20_000, intensity=False):
    kwargs = (dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
              if intensity else {})
    # use_queued_intensity off: the queued estimator is a one-hot-only
    # specialization, and the comparison here needs both paths to consume
    # the identical RNG stream.  Ratio tracking is pinned ON for radiance
    # runs because Integrator.create auto-enables it on serial-gather
    # domains with detectors (integrator.py) — pinning it keeps the ref
    # (one-hot) and serial runs on the same estimator and RNG stream.
    integ = Integrator.create(
        dom,
        config=IntegratorConfig(use_ray_tracing=False, max_events=200,
                                compute_volume_absorption=True,
                                majorant_block_size=4, use_fastpath=False,
                                use_queued_intensity=False,
                                use_ratio_tracking_for_intensity=intensity),
        surface_albedo=0.3, **kwargs)
    return integ.compute(jax.random.PRNGKey(11),
                         PhotonSource.directional(0.5, 0.0), n)


def _lower_threshold(monkeypatch, rows):
    # wavefront.py binds ONEHOT_MAX_ROWS at import; patch both modules.
    monkeypatch.setattr(gather_mod, "ONEHOT_MAX_ROWS", rows)
    monkeypatch.setattr(wavefront_mod, "ONEHOT_MAX_ROWS", rows)


@pytest.mark.parametrize("uniform_ssa", [True, False])
def test_serial_path_matches_onehot(monkeypatch, uniform_ssa):
    dom = _domain(uniform_ssa)
    ref = _run(dom)
    _lower_threshold(monkeypatch, 64)
    ser = _run(dom)
    np.testing.assert_allclose(np.asarray(ser.flux_up), np.asarray(ref.flux_up),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ser.flux_down),
                               np.asarray(ref.flux_down), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ser.flux_absorbed),
                               np.asarray(ref.flux_absorbed),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ser.volume_absorption).sum(),
                               np.asarray(ref.volume_absorption).sum(),
                               rtol=2e-4, atol=1e-8)


def test_serial_path_radiance_matches_onehot(monkeypatch):
    """Inline local estimation on the serial path (queued needs one-hot)."""
    dom = _domain(True)
    ref = _run(dom, n=5_000, intensity=True)
    _lower_threshold(monkeypatch, 64)
    ser = _run(dom, n=5_000, intensity=True)
    np.testing.assert_allclose(np.asarray(ser.intensity),
                               np.asarray(ref.intensity), rtol=5e-4, atol=1e-6)


def test_chained_flux_tracer_matches_plain_general():
    """The chained-cycle flux specialization (make_chained_flux_tracer) vs
    the plain event loop: same expectations, different RNG event stream —
    statistical agreement + exact energy closure on a conservative cloud.

    chain=2 / dda_steps=2 deliberately: XLA:CPU's LLVM backend compiles the
    fully unrolled while-body single-threaded, so compile time scales with
    chain*dda_steps (chain=4/dda=8 takes many minutes on a 1-core CI box).
    The small shape is also the BETTER structural test — flights that need
    more than 2 crossings carry tau_rem/in_flight across cycles, exercising
    the resume path that large dda_steps budgets rarely hit."""
    rng = np.random.default_rng(3)
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    ext = rng.uniform(0.0, 0.03, (8, 8, 8))
    ext[ext < 0.01] = 0.0
    dom = Domain.create(np.linspace(0, 800.0, 9), np.linspace(0, 800.0, 9),
                        np.linspace(0, 400.0, 9))
    dom = dom.add_component("c", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    n = 60_000
    out = {}
    for name, ch in (("plain", 1), ("chain", 2)):
        integ = Integrator.create(dom, config=IntegratorConfig(
            use_ray_tracing=False, max_events=200,
            compute_volume_absorption=False, majorant_block_size=4,
            use_fastpath=False, general_chain=ch, general_dda_steps=2))
        out[name] = integ.compute(jax.random.PRNGKey(5),
                                  PhotonSource.directional(0.5, 0.0), n)
    d = abs(float(out["plain"].mean_flux_up) - float(out["chain"].mean_flux_up))
    sigma = np.sqrt(2 * 0.25 / n)
    assert d < 4 * sigma, f"chained Fup off by {d / sigma:.1f} sigma"
    total = float(out["chain"].mean_flux_up + out["chain"].mean_flux_down)
    assert abs(total - (1.0 - int(out["chain"].n_bad) / n)) < 1e-5


def test_big_domain_auto_enables_block_majorants():
    """Integrator.create flips majorant_block_size 0 -> 8 above the
    one-hot threshold (here forced by the real Landsat scene size)."""
    from i3rc_tpu.models.landsat_cloud import make_landsat_cloud

    integ = Integrator.create(
        make_landsat_cloud(1.0),
        config=IntegratorConfig(use_ray_tracing=False))
    assert integ.config.majorant_block_size == 8
    assert integ.coarse_geometry is not None
    assert integ.optics.block_majorant.size > 0


def test_chained_radiance_tracer_matches_inline():
    """The chained ratio-tracking radiance path (round 4): lane-owned
    shadow-ray slots riding the C-cycle loop vs the plain general kernel's
    estimators.  Same expectations (ratio tracking is unbiased for
    E[T] = exp(-tau)); cross-check intensities against BOTH the inline
    ratio-tracking kernel and the deterministic-trace kernel, plus flux
    agreement and the Bernoulli-absorption budget."""
    import i3rc_tpu.integrators.wavefront as wf

    rng = np.random.default_rng(7)
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    ext = rng.uniform(0.0, 0.03, (8, 8, 8))
    ext[ext < 0.01] = 0.0
    dom = Domain.create(np.linspace(0, 800.0, 9), np.linspace(0, 800.0, 9),
                        np.linspace(0, 400.0, 9))
    dom = dom.add_component("c", ext, np.full_like(ext, 0.9),
                            np.zeros(ext.shape, np.int32), table)
    det = dict(intensity_mus=[1.0, 0.5], intensity_phis=[0.0, 0.0])
    n = 40_000
    src = PhotonSource.directional(0.5, 0.0)

    chained = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=200,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False, general_chain=2, general_dda_steps=2,
        use_ratio_tracking_for_intensity=True), **det)
    # Dispatch check: the chained tracer elects itself for this shape.
    called = {}
    orig = wf.make_chained_flux_tracer

    def spy(*a, **k):
        called["intensity"] = k.get("intensity")
        return orig(*a, **k)

    wf.make_chained_flux_tracer = spy
    try:
        r_ch = chained.compute(jax.random.PRNGKey(9), src, n)
    finally:
        wf.make_chained_flux_tracer = orig
    assert called and called["intensity"] is not None

    r_rt = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=200,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False, general_chain=1,
        use_ratio_tracking_for_intensity=True), **det).compute(
            jax.random.PRNGKey(10), src, n)
    r_det = Integrator.create(dom, config=IntegratorConfig(
        use_ray_tracing=False, max_events=200,
        compute_volume_absorption=False, majorant_block_size=4,
        use_fastpath=False, general_chain=1), **det).compute(
            jax.random.PRNGKey(11), src, n)

    sigma = np.sqrt(2 * 0.25 / n)
    for field in ("mean_flux_up", "mean_flux_down", "mean_flux_absorbed"):
        d = abs(float(getattr(r_ch, field)) - float(getattr(r_det, field)))
        assert d < 4 * sigma, f"{field} off by {d / sigma:.1f} sigma"
    i_ch = np.asarray(r_ch.mean_intensity)
    i_rt = np.asarray(r_rt.mean_intensity)
    i_det = np.asarray(r_det.mean_intensity)
    np.testing.assert_allclose(i_ch, i_rt, rtol=0.08)
    np.testing.assert_allclose(i_ch, i_det, rtol=0.08)
    # By-component: black surface -> slot 0 empty, slot 1 == the total.
    byc = np.asarray(r_ch.intensity_by_component)
    assert byc.reshape(-1, 2)[:, 0].sum() == 0.0
    np.testing.assert_allclose(byc.reshape(-1, 2)[:, 1].sum(),
                               np.asarray(r_ch.intensity).sum(), rtol=1e-6)
