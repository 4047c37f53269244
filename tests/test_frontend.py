"""Golden-value tests for the MFCC frontend (SURVEY.md §4.1).

The float64 numpy implementation in honk_tpu.frontend.reference is the
oracle for the exact librosa recipe the reference uses
(utils/manage_audio.py::AudioPreprocessor). The batched jnp frontend must
match it to ~1e-3 absolute (f32 vs f64).
"""

import numpy as np
import pytest

from honk_tpu import frontend as fe
from honk_tpu.frontend import filters as F


def _signals(rng):
    t = np.arange(16000) / 16000.0
    # Pure tones/chirps have mel bins with analytically ~zero energy where
    # f32-vs-f64 roundoff explodes through log() — a degeneracy the real
    # pipeline never sees on speech. Dither them slightly so the comparison
    # exercises the dominant spectral structure, not cancellation noise.
    dither = 1e-3 * rng.standard_normal(16000)
    return {
        "impulse": np.eye(1, 16000, 8000, dtype=np.float64)[0],
        "sine440": 0.5 * np.sin(2 * np.pi * 440 * t) + dither,
        "chirp": 0.3 * np.sin(2 * np.pi * (100 + 3000 * t) * t) + dither,
        "noise": rng.standard_normal(16000) * 0.1,
        "silence": np.zeros(16000),
        "speechy": 0.2 * np.sin(2 * np.pi * 200 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.05 * rng.standard_normal(16000),
    }


def test_shapes():
    x = np.zeros((2, 16000), np.float32)
    out = fe.compute_mfccs_jit(x)
    assert out.shape == (2, F.N_FRAMES, F.N_DCT) == (2, 101, 40)
    assert out.dtype == np.float32


def test_mel_filterbank_properties():
    fb = F.mel_filterbank()
    assert fb.shape == (40, 241)
    assert (fb >= 0).all()
    # Each filter has support; triangles overlap; band edges respected.
    assert (fb.sum(axis=1) > 0).all()
    freqs = np.linspace(0, 8000, 241)
    active = fb.sum(axis=0) > 0
    assert not active[freqs < 19.0].any()
    assert not active[freqs > 4001.0].any()


def test_dct_orthonormal():
    d = F.dct_basis(40, 40)
    assert np.allclose(d @ d.T, np.eye(40), atol=1e-12)


def test_silence_is_all_zero_mfcc():
    # honk's positive-mask log maps zero mel energy to zero, and DCT of the
    # zero vector is zero — silence must produce exactly-zero features.
    out = np.asarray(fe.compute_mfccs_jit(np.zeros((1, 16000), np.float32)))
    assert np.all(out == 0.0)


@pytest.mark.parametrize("name", ["impulse", "sine440", "chirp", "noise", "speechy"])
def test_jnp_matches_golden(name, rng):
    sig = _signals(rng)[name]
    golden = fe.compute_mfccs_reference(sig)
    got = np.asarray(fe.compute_mfccs_jit(sig[None].astype(np.float32)))[0]
    assert golden.shape == got.shape == (101, 40)
    # f32 pipeline vs f64 oracle; the reference itself runs f32 librosa, so
    # the oracle is strictly tighter than the real parity requirement.
    np.testing.assert_allclose(got, golden, atol=5e-3, rtol=1e-3)


def test_batched_equals_single(rng):
    sigs = np.stack([v for v in _signals(rng).values()]).astype(np.float32)
    batch_out = np.asarray(fe.compute_mfccs_jit(sigs))
    for i in range(len(sigs)):
        single = np.asarray(fe.compute_mfccs_jit(sigs[i : i + 1]))[0]
        np.testing.assert_allclose(batch_out[i], single, atol=1e-5)


def test_golden_fft_matches_gemm_dft(rng):
    # The GEMM real-DFT basis must equal numpy's rfft on random frames.
    frames = rng.standard_normal((7, F.N_FFT))
    cos_m, sin_m = F.rdft_matrices()
    re, im = frames @ cos_m, frames @ sin_m
    spec = np.fft.rfft(frames, axis=-1)
    np.testing.assert_allclose(re, spec.real, atol=1e-8)
    np.testing.assert_allclose(im, spec.imag, atol=1e-8)
