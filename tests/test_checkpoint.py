"""Batch-level checkpoint/resume: exactness of the recovery contract."""

import numpy as np
import pytest

from i3rc_tpu import Domain, Integrator, PhotonSource
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)
from i3rc_tpu.parallel.checkpoint import run_batches_resumable
from i3rc_tpu.parallel.mesh import run_batches


@pytest.fixture(scope="module")
def integ():
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 32))],
        key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250.0, 3))
    ext = np.full((1, 1, 2), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), table)
    return Integrator.create(dom, surface_albedo=0.1)


SRC = PhotonSource.directional(0.5, 0.0)


def test_resumable_matches_single_shot(integ, tmp_path):
    ref = run_batches(integ, SRC, 2_000, 16, seed=5)
    ck = str(tmp_path / "run.ckpt")
    got = run_batches_resumable(integ, SRC, 2_000, 16, seed=5,
                                checkpoint_path=ck, chunk_batches=8)
    np.testing.assert_allclose(np.asarray(got.mean.flux_up),
                               np.asarray(ref.mean.flux_up), rtol=1e-6)
    # stderr suffers E[x^2]-mean^2 cancellation, which amplifies float32
    # reduction-order differences between the chunked and one-shot sums.
    np.testing.assert_allclose(np.asarray(got.stderr.flux_down),
                               np.asarray(ref.stderr.flux_down), rtol=1e-2)


def test_resume_after_interruption(integ, tmp_path):
    ck = str(tmp_path / "interrupted.ckpt")
    # "Crash" after the first chunk: run only 8 of 16 batches, checkpointing.
    run_batches_resumable(integ, SRC, 2_000, 8, seed=5, checkpoint_path=ck,
                          chunk_batches=8)
    # Restart asking for the full 16: must reuse the 8 done batches.
    got = run_batches_resumable(integ, SRC, 2_000, 16, seed=5,
                                checkpoint_path=ck, chunk_batches=8)
    ref = run_batches(integ, SRC, 2_000, 16, seed=5)
    assert got.n_batches == 16
    np.testing.assert_allclose(np.asarray(got.mean.flux_up),
                               np.asarray(ref.mean.flux_up), rtol=1e-6)


def test_fingerprint_mismatch_restarts(integ, tmp_path):
    ck = str(tmp_path / "fp.ckpt")
    run_batches_resumable(integ, SRC, 2_000, 8, seed=5, checkpoint_path=ck)
    # Different seed -> checkpoint ignored, fresh run matching single-shot
    got = run_batches_resumable(integ, SRC, 2_000, 8, seed=6, checkpoint_path=ck)
    ref = run_batches(integ, SRC, 2_000, 8, seed=6)
    np.testing.assert_allclose(np.asarray(got.mean.flux_up),
                               np.asarray(ref.mean.flux_up), rtol=1e-6)
