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


def _noise_slices(noise: jax.Array, offsets: jax.Array, n: int) -> jax.Array:
    """Gather (B, n) slices of the 1-D noise buffer at the given offsets."""
    return jax.vmap(lambda o: jax.lax.dynamic_slice(noise, (o,), (n,)))(offsets)


@functools.partial(jax.jit, static_argnames=("batch_size", "cfg"))
def sample_train_batch(
    key: jax.Array,
    audio_i16: jax.Array,  # (N, 16000) int16, device-resident
    labels: jax.Array,  # (N,) int32
    noise: jax.Array,  # (M,) float32
    batch_size: int,
    cfg: AugmentConfig,
) -> tuple[jax.Array, jax.Array]:
    """Draw and augment one training batch fully on device.

    Returns (audio (B, 16000) float32 in [-1, 1], labels (B,) int32).
    """
    n = audio_i16.shape[0]
    n_samples = audio_i16.shape[1]
    k_idx, k_shift, k_off, k_noise, k_scale = jax.random.split(key, 5)

    # Virtual-length sampling: idx >= n means a silence example.
    idx = jax.random.randint(k_idx, (batch_size,), 0, n + cfg.n_silence)
    is_silence = idx >= n
    safe_idx = jnp.where(is_silence, 0, idx)
    audio = audio_i16[safe_idx].astype(jnp.float32) / 32768.0
    audio = jnp.where(is_silence[:, None], 0.0, audio)
    lab = jnp.where(is_silence, 0, labels[safe_idx])

    # Time-shift +-timeshift_samples with zero fill (train only).
    shift = jax.random.randint(
        k_shift, (batch_size,), -cfg.timeshift_samples, cfg.timeshift_samples + 1
    )
    audio = timeshift(audio, shift)

    # Background-noise mix: prob noise_prob, always for silence.
    off = jax.random.randint(k_off, (batch_size,), 0, noise.shape[0] - n_samples)
    nslice = _noise_slices(noise, off, n_samples)
    add = (jax.random.uniform(k_noise, (batch_size,)) < cfg.noise_prob) | is_silence
    scale = jax.random.uniform(k_scale, (batch_size,)) * cfg.noise_scale
    audio = jnp.clip(audio + jnp.where(add, scale, 0.0)[:, None] * nslice, -1.0, 1.0)
    return audio, lab


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
