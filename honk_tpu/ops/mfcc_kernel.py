"""Fused Pallas MFCC kernel: window -> GEMM-DFT -> |.|^2 -> mel -> log -> DCT.

TPU-native replacement for the reference's librosa frontend
(``utils/manage_audio.py::AudioPreprocessor.compute_mfccs``): one Pallas
kernel computes the full per-frame feature chain, keeping every
intermediate (windowed frames, DFT real/imag, power spectrum, mel
energies) in VMEM — the plain XLA version writes the (rows, 241) power
and (rows, 40) mel tensors to HBM between dots.

Design (see /opt/skills/guides/pallas_guide.md):
- Frames are flattened to (rows=B*101, 480) and the grid tiles rows in
  blocks of ROW_BLOCK; each block runs five MXU matmuls against
  compile-time constant matrices zero-padded to lane-aligned shapes:
      frames (R, 512) @ dft_cos/sin (512, 256) -> power (R, 256)
      power (R, 256) @ mel (256, 128) -> logmel (R, 128)
      logmel (R, 128) @ dct (128, 128) -> out (R, 128)
  Zero padding is semantics-preserving end to end: padded DFT rows/cols
  contribute zero energy, padded mel columns stay exactly 0 through the
  positive-masked log (honk's convention maps 0 -> 0, not log(0)), and
  padded DCT rows multiply those zeros.
- All matmuls run at float32 HIGHEST precision (parity-gated frontend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..frontend import filters as F
from ..frontend.mfcc import frame_audio

ROW_BLOCK = 256
N_FFT_PAD = 512  # 480 -> 512
N_RFFT_PAD = 256  # 241 -> 256
N_MEL_PAD = 128  # 40 -> 128
N_DCT_PAD = 128  # 40 -> 128

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _padded_consts():
    """Zero-padded constant operands (numpy; lifted as XLA constants)."""
    c = F.frontend_constants(np.float32)
    win = np.zeros(N_FFT_PAD, np.float32)
    win[: F.N_FFT] = c["window"]
    dft_cos = np.zeros((N_FFT_PAD, N_RFFT_PAD), np.float32)
    dft_cos[: F.N_FFT, : F.N_RFFT] = c["dft_cos"]
    dft_sin = np.zeros((N_FFT_PAD, N_RFFT_PAD), np.float32)
    dft_sin[: F.N_FFT, : F.N_RFFT] = c["dft_sin"]
    mel = np.zeros((N_RFFT_PAD, N_MEL_PAD), np.float32)
    mel[: F.N_RFFT, : F.N_MELS] = c["mel"]
    dct = np.zeros((N_MEL_PAD, N_DCT_PAD), np.float32)
    dct[: F.N_MELS, : F.N_DCT] = c["dct"]
    return win, dft_cos, dft_sin, mel, dct


def _mfcc_kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref):
    w = frames_ref[:] * win_ref[:]  # (R, 512), broadcast row
    re = jnp.dot(w, cos_ref[:], preferred_element_type=jnp.float32, precision=_PREC)
    im = jnp.dot(w, sin_ref[:], preferred_element_type=jnp.float32, precision=_PREC)
    power = re * re + im * im  # (R, 256)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=_PREC)
    logmel = jnp.where(mel > 0, jnp.log(jnp.where(mel > 0, mel, 1.0)), mel)
    out_ref[:] = jnp.dot(
        logmel, dct_ref[:], preferred_element_type=jnp.float32, precision=_PREC
    )


def _mfcc_rows(frames_padded: jax.Array, interpret: bool = False) -> jax.Array:
    """(rows, 512) padded frames -> (rows, 128) padded MFCC rows."""
    rows = frames_padded.shape[0]
    assert rows % ROW_BLOCK == 0
    win, dft_cos, dft_sin, mel, dct = _padded_consts()
    grid = (rows // ROW_BLOCK,)
    return pl.pallas_call(
        _mfcc_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, N_DCT_PAD), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (ROW_BLOCK, N_FFT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, N_FFT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (N_FFT_PAD, N_RFFT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (N_FFT_PAD, N_RFFT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (N_RFFT_PAD, N_MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (N_MEL_PAD, N_DCT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLOCK, N_DCT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * (2 * N_FFT_PAD * N_RFFT_PAD + N_RFFT_PAD * N_MEL_PAD + N_MEL_PAD * N_DCT_PAD),
            bytes_accessed=rows * (N_FFT_PAD + N_DCT_PAD) * 4,
            transcendentals=rows * N_MEL_PAD,
        ),
        interpret=interpret,
    )(
        frames_padded,
        jnp.asarray(win)[None, :],
        jnp.asarray(dft_cos),
        jnp.asarray(dft_sin),
        jnp.asarray(mel),
        jnp.asarray(dct),
    )


def compute_mfccs_pallas(audio: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched fused-Pallas MFCC: (B, 16000) f32 -> (B, 101, 40) f32.

    Numerically equivalent to honk_tpu.frontend.compute_mfccs (tested to
    ~1e-5); use interpret=True to run the kernel on CPU in tests.
    """
    B = audio.shape[0]
    frames = frame_audio(audio)  # (B, 101, 480)
    rows = B * F.N_FRAMES
    rows_pad = -(-rows // ROW_BLOCK) * ROW_BLOCK
    flat = frames.reshape(rows, F.N_FFT)
    flat = jnp.pad(flat, ((0, rows_pad - rows), (0, N_FFT_PAD - F.N_FFT)))
    out = _mfcc_rows(flat, interpret=interpret)
    return out[:rows, : F.N_DCT].reshape(B, F.N_FRAMES, F.N_DCT)
