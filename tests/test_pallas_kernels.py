"""Pallas kernel tests (SURVEY.md §4.2): kernel-vs-jnp equivalence in
interpret mode on CPU; real-mode equivalence runs on TPU via scripts/."""

import numpy as np
import pytest

from honk_tpu import frontend as fe
from honk_tpu.ops import compute_mfccs_pallas


@pytest.mark.parametrize("batch", [1, 3])
def test_pallas_mfcc_matches_jnp(batch, rng):
    audio = (rng.standard_normal((batch, 16000)) * 0.2).astype(np.float32)
    ref = np.asarray(fe.compute_mfccs_jit(audio))
    got = np.asarray(compute_mfccs_pallas(audio, interpret=True))
    assert got.shape == ref.shape == (batch, 101, 40)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_pallas_mfcc_silence_zero():
    out = np.asarray(compute_mfccs_pallas(np.zeros((1, 16000), np.float32), interpret=True))
    assert np.all(out == 0.0)


def test_pallas_mfcc_matches_golden(rng):
    sig = (rng.standard_normal(16000) * 0.1).astype(np.float64)
    golden = fe.compute_mfccs_reference(sig)
    got = np.asarray(compute_mfccs_pallas(sig[None].astype(np.float32), interpret=True))[0]
    np.testing.assert_allclose(got, golden, atol=5e-3, rtol=1e-3)
