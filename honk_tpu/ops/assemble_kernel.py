"""Fused Pallas batch-assembly kernel: corpus -> augmented training batch.

TPU-native replacement for the per-item host pipeline in reference
``utils/train.py::SpeechDataset.__getitem__/_timeshift_audio`` (clip
selection, +-100 ms time-shift with zero fill, background-noise mix,
silence synthesis, clipping). The XLA fallback (data/augment.py) does it
with a contiguous-slice gather (~3.5 ms at batch 1024 on v5e); this
kernel does the whole assembly with per-sample dynamic DMAs and in-VMEM
arithmetic in ~0.24 ms — 64 MB of HBM write at close to memory speed.

Kernel design (pallas_guide.md):
- The corpus is packed once into (N * ROW_SUBS, 128) int16 "sub-rows"
  (128 samples each): each clip occupies ROW_SUBS sub-rows = zero pad of
  PAD_SUB sub-rows, 125 sub-rows of audio, zero tail to an 8-multiple.
  Mosaic requires dim-0 DMA slices to be provably 8-aligned, so the
  per-sample copy start is passed as ``base8`` and multiplied by 8
  inside the kernel (syntactic divisibility), and CP=SUB+8+padding
  sub-rows are copied so any residual shift r in [0, 8) is present.
- Time-shift therefore quantizes to 128 samples (8 ms). The feature hop
  is 160 samples (10 ms), so sub-hop shift granularity is statistically
  invisible to the classifier; the XLA path keeps exact per-sample
  shifts for strict-parity runs.
- The residual shift r selects sub-rows [r, r+SUB) of the copied block:
  done with 8 static slices + vector selects (exact; an MXU one-hot
  matmul would round samples to bf16).
- Background noise is DMA'd from a flat sub-row buffer at 1024-sample
  granularity; silence examples use gain 0 + forced noise, matching the
  reference's silence = scaled background snippet.
- Per grid step, all 2*BLK DMAs are issued before any is awaited, so
  copies overlap each other and the VPU work of the previous samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.augment import AugmentConfig

LANES = 128
N_SAMPLES = 16000
SUB = N_SAMPLES // LANES  # 125 sub-rows of real audio per clip
CP = 136  # sub-rows DMA'd per sample: SUB + 8 residual, 8-aligned


def _geometry(timeshift_samples: int) -> tuple[int, int, int]:
    """(pad_sub, row_subs, q_max) for a given max shift in samples."""
    pad_sub = max(1, -(-timeshift_samples // LANES))  # ceil
    s_max = 2 * pad_sub  # start sub-row range is [0, 2*pad_sub]
    row_subs = -(-((s_max // 8) * 8 + CP) // 8) * 8
    return pad_sub, row_subs, min(pad_sub, timeshift_samples // LANES)


def pack_pool_subrows(audio_i16, timeshift_samples: int = 1600):
    """(N, 16000) int16 -> (N * ROW_SUBS, 128) int16 device array.

    One-time load-side packing for the assembly kernel (the analogue of
    data/augment.py::pad_pool for the XLA path).
    """
    audio_i16 = np.asarray(audio_i16, np.int16)
    n, s = audio_i16.shape
    assert s == N_SAMPLES, f"assembly kernel supports 1 s clips; got {s} samples"
    pad_sub, row_subs, _ = _geometry(timeshift_samples)
    packed = np.zeros((n, row_subs * LANES), np.int16)
    packed[:, pad_sub * LANES : pad_sub * LANES + s] = audio_i16
    return jnp.asarray(packed.reshape(n * row_subs, LANES))


def pack_noise_subrows(noise, min_subrows: int = 2 * CP):
    """1-D float noise -> (M, 128) float32 flat sub-row buffer."""
    noise = np.asarray(noise, np.float32).reshape(-1)
    if noise.shape[0] < min_subrows * LANES:
        reps = -(-min_subrows * LANES // max(1, noise.shape[0]))
        noise = np.tile(noise, reps)
    m = noise.shape[0] // LANES
    return jnp.asarray(noise[: m * LANES].reshape(m, LANES))


def _make_kernel(blk: int):
    def kernel(base8_ref, fine_ref, gain_ref, nsub8_ref, nscale_ref,
               pool_ref, noise_ref, out_ref, abuf, nbuf, asem, nsem):
        i = pl.program_id(0)

        def audio_copy(b):
            g = i * blk + b
            return pltpu.make_async_copy(
                pool_ref.at[pl.ds(base8_ref[g] * 8, CP)], abuf.at[b], asem.at[b]
            )

        def noise_copy(b):
            g = i * blk + b
            return pltpu.make_async_copy(
                noise_ref.at[pl.ds(nsub8_ref[g] * 8, CP)], nbuf.at[b], nsem.at[b]
            )

        for b in range(blk):
            audio_copy(b).start()
            noise_copy(b).start()
        for b in range(blk):
            audio_copy(b).wait()
            noise_copy(b).wait()
        for b in range(blk):
            g = i * blk + b
            a = abuf[b].astype(jnp.float32) * gain_ref[g]  # (CP, LANES)
            # Residual sub-row shift r in [0, 8): exact static-slice select.
            r = fine_ref[g]
            shifted = a[0:SUB, :]
            for rr in range(1, 8):
                shifted = jnp.where(r == rr, a[rr : rr + SUB, :], shifted)
            v = shifted + nbuf[b, :SUB, :] * nscale_ref[g]
            out_ref[b, :, :] = jnp.clip(v, -1.0, 1.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _assemble_call(base8, fine, gain, nsub8, nscale, pool, noise, blk, interpret=False):
    b = base8.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b // blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (blk, SUB, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((blk, CP, LANES), jnp.int16),
            pltpu.VMEM((blk, CP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((blk,)),
            pltpu.SemaphoreType.DMA((blk,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(blk),
        out_shape=jax.ShapeDtypeStruct((b, SUB, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base8, fine, gain, nsub8, nscale, pool, noise)


def _pick_blk(batch_size: int) -> int:
    for blk in (16, 8, 4, 2, 1):
        if batch_size % blk == 0:
            return blk
    return 1


@functools.partial(
    jax.jit, static_argnames=("batch_size", "cfg", "n_clips", "interpret", "data_axis")
)
def sample_train_batch_pallas(
    key: jax.Array,
    pool_subrows: jax.Array,  # (N * ROW_SUBS, 128) int16 (pack_pool_subrows)
    labels: jax.Array,  # (N,) int32
    noise_subrows: jax.Array,  # (M, 128) float32 (pack_noise_subrows)
    batch_size: int,
    cfg: AugmentConfig,
    n_clips: int | None = None,
    interpret: bool = False,
    data_axis: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Pallas twin of data/augment.py::sample_train_batch.

    Same sampling semantics (virtual-length silence slots, noise prob,
    scaled noise mix, clip), with the time-shift quantized to 128-sample
    sub-rows (see module docstring). Returns ((B, 16000) f32, (B,) i32).

    With ``data_axis`` (under an ambient mesh), the tiny per-sample scalar
    draws happen GLOBALLY in XLA (so results are bitwise-identical across
    mesh sizes) and only the DMA kernel runs per-shard via shard_map — the
    corpus is replicated, each device assembles its own batch shard.
    """
    pad_sub, row_subs, q_max = _geometry(cfg.timeshift_samples)
    n = n_clips if n_clips is not None else labels.shape[0]
    assert pool_subrows.shape[0] == n * row_subs, (
        f"pool packed for {pool_subrows.shape[0] // row_subs} clips "
        f"(row_subs={row_subs}), labels say {n}"
    )
    k_idx, k_shift, k_off, k_noise, k_scale = jax.random.split(key, 5)

    idx = jax.random.randint(k_idx, (batch_size,), 0, n + cfg.n_silence)
    is_silence = idx >= n
    safe_idx = jnp.where(is_silence, 0, idx)
    lab = jnp.where(is_silence, 0, labels[safe_idx])

    q = jax.random.randint(k_shift, (batch_size,), -q_max, q_max + 1, jnp.int32)
    s = pad_sub - q  # start sub-row within the padded row
    s0 = (s // 8) * 8
    base8 = (safe_idx * row_subs + s0) // 8  # row_subs is a multiple of 8
    fine = s - s0

    gain = jnp.where(is_silence, 0.0, 1.0 / 32768.0).astype(jnp.float32)
    n_noise8 = (noise_subrows.shape[0] - CP) // 8 + 1
    nsub8 = jax.random.randint(k_off, (batch_size,), 0, n_noise8, jnp.int32)
    add = (jax.random.uniform(k_noise, (batch_size,)) < cfg.noise_prob) | is_silence
    nscale = (
        jnp.where(add, 1.0, 0.0) * jax.random.uniform(k_scale, (batch_size,)) * cfg.noise_scale
    ).astype(jnp.float32)

    scalars = (base8.astype(jnp.int32), fine.astype(jnp.int32), gain, nsub8, nscale)
    if data_axis is None:
        out = _assemble_call(
            *scalars, pool_subrows, noise_subrows,
            blk=_pick_blk(batch_size), interpret=interpret,
        )
    else:
        from jax.sharding import PartitionSpec as P

        def shard_fn(b8, fi, g, n8, ns, pool, noise):
            return _assemble_call(
                b8, fi, g, n8, ns, pool, noise,
                blk=_pick_blk(b8.shape[0]), interpret=interpret,
            )

        out = jax.shard_map(
            shard_fn,
            in_specs=(P(data_axis),) * 5 + (P(None, None), P(None, None)),
            out_specs=P(data_axis),
            # pallas_call's out_shape carries no varying-mesh-axes info.
            check_vma=False,
        )(*scalars, pool_subrows, noise_subrows)
    return out.reshape(batch_size, N_SAMPLES), lab
