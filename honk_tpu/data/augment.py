"""On-device batch assembly and augmentation (jit-able).

Equivalent of the per-item augmentation in reference
``utils/train.py::SpeechDataset.__getitem__ / _timeshift_audio``
(random time-shift +-100 ms with zero fill, background-noise mix at
``a = rand()*0.1`` with prob ``noise_prob``, silence = pure scaled noise),
redesigned TPU-first: the whole batch is assembled inside the jit-ed
train step from device-resident packed arrays — gathers + masked
element-wise ops, no host round trip, no Python per-item loop
(BASELINE.json:5 "SpeechDataset loading/augmentation becomes a jit-able
on-device pipeline").

Silence sampling follows the reference's virtual-length convention:
an index is drawn from [0, n + n_silence); indices >= n are silence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AugmentConfig(NamedTuple):
    noise_prob: float = 0.8
    timeshift_samples: int = 1600  # +-100 ms at 16 kHz
    noise_scale: float = 0.1
    n_silence: int = 0  # virtual silence slots in the train sampler


def timeshift(audio: jax.Array, shift: jax.Array) -> jax.Array:
    """Batched shift with zero fill. shift > 0 delays (moves content right).

    audio: (B, N) float32; shift: (B,) int32 in [-ts, ts].
    """
    n = audio.shape[1]
    pos = jnp.arange(n)[None, :]
    src = pos - shift[:, None]
    valid = (src >= 0) & (src < n)
    gathered = jnp.take_along_axis(audio, jnp.clip(src, 0, n - 1), axis=1)
    return jnp.where(valid, gathered, 0.0)


def pad_pool(audio_i16: jax.Array, timeshift_samples: int = 1600) -> jax.Array:
    """Zero-pad the packed corpus once: (N, S) -> (N, S + 2*ts) int16.

    Done once at load time so that per-step clip selection AND time-shift
    collapse into a single contiguous-slice gather (see sample_train_batch).
    A per-element take_along_axis shift costs ~190 ms/step at batch 1024 on
    a v5e; a (1, S)-slice gather from the padded pool costs ~2 ms.
    """
    return jnp.pad(audio_i16, ((0, 0), (timeshift_samples, timeshift_samples)))


def make_noise_windows(
    noise: jax.Array, n_samples: int = 16000, stride: int = 2000
) -> jax.Array:
    """Precompute overlapping background-noise windows: (M,) -> (R, n) float32.

    The reference draws a random offset into each noise file per sample
    (utils/train.py::SpeechDataset, noise snippet slicing); offset-granular
    slicing on TPU is a strided gather, so we quantize offsets to `stride`
    samples (default 125 ms) by materializing overlapping windows once.
    Statistically equivalent for augmentation; turns the per-step noise
    fetch into a fast row gather.
    """
    noise = jnp.asarray(noise, jnp.float32)
    if noise.shape[0] < n_samples:
        reps = -(-n_samples // noise.shape[0])
        noise = jnp.tile(noise, reps)
    n_off = max(1, (noise.shape[0] - n_samples) // stride + 1)
    starts = (jnp.arange(n_off) * stride).clip(0, noise.shape[0] - n_samples)
    return jax.vmap(lambda s: jax.lax.dynamic_slice(noise, (s,), (n_samples,)))(starts)


@functools.partial(jax.jit, static_argnames=("batch_size", "cfg"))
def sample_train_batch(
    key: jax.Array,
    audio_pad_i16: jax.Array,  # (N, S + 2*ts) int16, pre-padded (pad_pool), device-resident
    labels: jax.Array,  # (N,) int32
    noise_windows: jax.Array,  # (R, S) float32 (make_noise_windows)
    batch_size: int,
    cfg: AugmentConfig,
) -> tuple[jax.Array, jax.Array]:
    """Draw and augment one training batch fully on device.

    Returns (audio (B, S) float32 in [-1, 1], labels (B,) int32).

    TPU-first layout: clip selection and the +-ts sample time-shift are ONE
    gather of (1, S) contiguous slices from the pre-padded pool — shifting by
    k is reading the padded row at offset ts - k. No per-element gather
    anywhere on the hot path.
    """
    n = audio_pad_i16.shape[0]
    ts = cfg.timeshift_samples
    n_samples = audio_pad_i16.shape[1] - 2 * ts
    k_idx, k_shift, k_off, k_noise, k_scale = jax.random.split(key, 5)

    # Virtual-length sampling: idx >= n means a silence example.
    idx = jax.random.randint(k_idx, (batch_size,), 0, n + cfg.n_silence)
    is_silence = idx >= n
    safe_idx = jnp.where(is_silence, 0, idx)

    # Fused select + time-shift: slice padded row at offset ts - shift.
    shift = jax.random.randint(k_shift, (batch_size,), -ts, ts + 1)
    start = ts - shift

    def slice_one(i, s):
        return jax.lax.dynamic_slice(audio_pad_i16, (i, s), (1, n_samples))[0]

    audio = jax.vmap(slice_one)(safe_idx, start).astype(jnp.float32) / 32768.0
    audio = jnp.where(is_silence[:, None], 0.0, audio)
    lab = jnp.where(is_silence, 0, labels[safe_idx])

    # Background-noise mix: prob noise_prob, always for silence.
    row = jax.random.randint(k_off, (batch_size,), 0, noise_windows.shape[0])
    nslice = noise_windows[row]
    add = (jax.random.uniform(k_noise, (batch_size,)) < cfg.noise_prob) | is_silence
    scale = jax.random.uniform(k_scale, (batch_size,)) * cfg.noise_scale
    audio = jnp.clip(audio + jnp.where(add, scale, 0.0)[:, None] * nslice, -1.0, 1.0)
    return audio, lab


def prepare_train_arrays(
    audio_i16, noise, cfg: AugmentConfig, noise_stride: int = 2000, layout: str = "auto"
) -> tuple[jax.Array, jax.Array]:
    """One-time load-side prep of the device-resident corpus arrays.

    layout="pallas": sub-row packing for the fused assembly kernel
    (ops/assemble_kernel.py, ~0.24 ms/batch on TPU). layout="xla":
    padded pool + noise windows for sample_train_batch (runs anywhere,
    exact per-sample shifts). "auto" picks pallas iff the default
    backend is a real TPU and the clips are 1 s.
    """
    audio_i16 = np.asarray(audio_i16)
    n_samples = audio_i16.shape[1]
    if layout == "auto":
        layout = (
            "pallas"
            if jax.default_backend() == "tpu" and n_samples == 16000
            else "xla"
        )
    if layout == "pallas":
        from ..ops.assemble_kernel import pack_noise_subrows, pack_pool_subrows

        return (
            pack_pool_subrows(audio_i16, cfg.timeshift_samples),
            pack_noise_subrows(noise),
        )
    return (
        pad_pool(jnp.asarray(audio_i16), cfg.timeshift_samples),
        make_noise_windows(jnp.asarray(noise), n_samples, noise_stride),
    )


@functools.partial(jax.jit, static_argnames=("batch_size",))
def eval_batch(
    audio_i16: jax.Array, labels: jax.Array, start: jax.Array, batch_size: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Deterministic eval batch [start, start+B), with validity mask for the tail.

    `start` is traced (dynamic) so sweeping a split compiles exactly once.
    """
    n = audio_i16.shape[0]
    idx = start + jnp.arange(batch_size)
    valid = idx < n
    safe = jnp.where(valid, idx, 0)
    audio = audio_i16[safe].astype(jnp.float32) / 32768.0
    return audio, labels[safe], valid
