"""Fused Pallas res-stack inference megakernel (res8 / res26 families).

TPU-native replacement for the reference's per-layer torch conv stack
(``utils/model.py::SpeechResModel``): ONE Pallas kernel runs the entire
post-pool residual stack — n_layers 3x3 convs, ReLU, identity residuals,
affine-free BatchNorm (eval: folded to per-channel scale/offset) — plus
the global average pool and the final Dense, with every activation
resident in VMEM. The XLA path materializes each layer's (B, 25, 13, 45)
activation in HBM; here HBM traffic is one block read + logits write.

Kernel design (pallas_guide.md):
- Layout: NHWC blocks of B_BLK utterances, channels zero-padded to 64
  lanes (45 real). Each 3x3 conv is an in-VMEM im2col (9 statically-
  shifted views of the zero-border-padded activation buffer written into
  one (B*H*W, 9C) scratch) followed by ONE MXU dot at contraction depth
  9C=576 — much better systolic-array utilization than nine K=64 dots,
  and a single live accumulator. Zero borders make VALID slicing
  implement SAME padding exactly.
- Residual structure matches the reference bit-for-bit in f32:
      y = relu(conv_i(x)); if i even: y += old; old = y   (pre-BN sum)
      x = y * bn_scale_i + bn_offset_i                    (affine-free BN)
- compute_dtype=bfloat16 casts matmul operands (f32 accumulate) for MXU
  rate; float32 is available for strict-parity serving.
- res15's dilation-16 convs need 16-pixel halos (VMEM-prohibitive at
  101x40); it stays on the XLA path. Scope: res8/res8-narrow/res26[-narrow].
  The ruling VMEM math for res15 (no pooling, H=101 W=40, dilations
  1,1,1,2,2,2,4,4,4,8,8,8,16): a max-halo zero border of 16 makes
  xbuf (B,133,72,64) = 2.45 MB/sample f32, plus the residual carry
  (B,101,40,64) = 1.03 MB/sample, 1.9 MB of weights and ~1.5 MB/sample of
  dot operands/accumulators -> only B_blk=2 fits under ~16 MB VMEM, and a
  (2*101*40, 64)x(64,64) dot runs the 128-wide MXU at <=25% utilization
  with 45->64 channel padding already wasting 2x FLOPs. The fused kernel
  would be compute-bound at a ~4x FLOP handicap vs XLA's implicit-GEMM
  conv; not worth it.

The surrounding ``res_forward_fused`` runs conv0+pool in XLA (one big
MXU conv on the 101x40 map), pads, invokes the kernel, and returns logits.

STATUS — RETIRED FROM THE PRODUCTION PATH, BY MEASUREMENT. Numerically
validated (interpret-mode tests vs the XLA model, tests/test_res_kernel.py).
The fori_loop body killed the compile-time problem (20 s vs >9 min for the
unrolled variant), and the im2col restructure fixed the VMEM overflow —
but on the real v5e chip (2026-08-20, jax 0.9 / libtpu 0.0.34,
scripts/bench_res_kernel.py, marginal-chain timing, batch 256, B_blk=4):

    XLA forward    0.360 ms/batch  (710k audio-s/s)
    fused kernel  12.778 ms/batch  ( 20k audio-s/s)   0.028x

The geometry is simply hostile to a hand-rolled kernel: M=B_blk*325 rows
x N=64 lanes leaves >half the MXU idle, the 9 im2col relayout writes per
layer are VPU-serial, and the sequential fori_loop defeats Mosaic's
pipelining — while XLA's implicit-GEMM conv of the same stack sustains
~42 TFLOP/s-equivalent. The kernel stays in-tree as a validated design
study + interpret-mode regression target; the XLA path is production.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_PAD = 64
LABEL_PAD = 128


def _make_kernel(n_layers: int, H: int, W: int, B_blk: int, compute_dtype):
    """Builds the megakernel body for a fixed geometry.

    The layer loop is a lax.fori_loop (layer weights indexed dynamically
    from VMEM), so Mosaic compiles the 9-dot conv body ONCE instead of
    n_layers times — the fully-unrolled variant took >9 min of Mosaic
    compile for res8's 54 dots; the loop body compiles in seconds and is
    what makes res26 (24 layers) compilable at all.
    """

    def kernel(x_ref, w_ref, s_ref, o_ref, dw_ref, db_ref, out_ref, xbuf, col_ref, old_ref):
        # xbuf: (B, H+2, W+2, C) zero-bordered activations (scratch)
        # col_ref: (B*H*W, 9*C) im2col scratch in compute dtype
        # old_ref: (B, H, W, C) residual carry (scratch)
        xbuf[:] = x_ref[:]
        old_ref[:] = x_ref[:, 1 : H + 1, 1 : W + 1, :]

        def layer(i, _):
            # im2col: 9 statically-shifted VMEM views written into one
            # (B*H*W, 9C) buffer, then ONE MXU dot at contraction depth
            # 9C=576 — far better systolic-array utilization than nine
            # K=64 dots, and only one live accumulator.
            for t in range(9):
                dy, dx = t // 3, t % 3
                col_ref[:, t * C_PAD : (t + 1) * C_PAD] = (
                    xbuf[:, dy : dy + H, dx : dx + W, :]
                    .reshape(B_blk * H * W, C_PAD)
                    .astype(compute_dtype)
                )
            w = w_ref[i].astype(compute_dtype)  # (9C, C)
            acc = jnp.dot(col_ref[:], w, preferred_element_type=jnp.float32)
            y = jnp.maximum(acc, 0.0).reshape(B_blk, H, W, C_PAD)
            # Residual add on even 1-based layers (reference semantics:
            # old = y is the post-add, pre-BN activation).
            is_res = (i + 1) % 2 == 0
            y = y + jnp.where(is_res, 1.0, 0.0) * old_ref[:]

            @pl.when(is_res)
            def _():
                old_ref[:] = y

            xbuf[:, 1 : H + 1, 1 : W + 1, :] = y * s_ref[i] + o_ref[i]
            return 0

        jax.lax.fori_loop(0, n_layers, layer, 0)

        feats = jnp.mean(
            xbuf[:, 1 : H + 1, 1 : W + 1, :].reshape(B_blk, H * W, C_PAD), axis=1
        )
        # out_ref is the FULL (B, LABELS) buffer (not grid-blocked: small
        # B_blk values violate the 8-sublane output-block constraint);
        # each program writes its own row slice.
        out_ref[pl.ds(pl.program_id(0) * B_blk, B_blk), :] = (
            jnp.dot(
                feats.astype(compute_dtype),
                dw_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + db_ref[:]
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_layers", "H", "W", "B_blk", "compute_dtype", "interpret")
)
def _res_stack_call(
    x_padded,  # (B, H+2, W+2, C_PAD) f32, zero borders
    w_all,  # (n_layers, 9*C_PAD, C_PAD) f32, tap-major im2col layout
    bn_scale,  # (n_layers, C_PAD)
    bn_offset,  # (n_layers, C_PAD)
    dense_w,  # (C_PAD, LABEL_PAD)
    dense_b,  # (LABEL_PAD,)
    n_layers: int,
    H: int,
    W: int,
    B_blk: int = 4,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    B = x_padded.shape[0]
    assert B % B_blk == 0, f"batch {B} must be divisible by block {B_blk}"
    grid = (B // B_blk,)
    kernel = _make_kernel(n_layers, H, W, B_blk, compute_dtype)
    flops = 2 * B * n_layers * 9 * H * W * C_PAD * C_PAD
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, LABEL_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (B_blk, H + 2, W + 2, C_PAD), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_layers, 9 * C_PAD, C_PAD),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_layers, C_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, C_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, LABEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LABEL_PAD,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B_blk, H + 2, W + 2, C_PAD), jnp.float32),
            pltpu.VMEM((B_blk * H * W, 9 * C_PAD), compute_dtype),
            pltpu.VMEM((B_blk, H, W, C_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x_padded.size * 4, transcendentals=0
        ),
        interpret=interpret,
    )(x_padded, w_all, bn_scale, bn_offset, dense_w, dense_b)


def pack_res_params(variables: dict[str, Any], config: dict[str, Any]):
    """Fold flax res-model variables into megakernel operand arrays."""
    params = variables["params"]
    stats = variables["batch_stats"]
    n_maps = config["n_feature_maps"]
    n_layers = config["n_layers"]
    eps = 1e-5

    # Tap-major im2col weight layout: row block t = dy*3+dx of (9C, C)
    # matches the kernel's col_ref packing order.
    w_all = np.zeros((n_layers, 9 * C_PAD, C_PAD), np.float32)
    bn_scale = np.zeros((n_layers, C_PAD), np.float32)
    bn_offset = np.zeros((n_layers, C_PAD), np.float32)
    for i in range(1, n_layers + 1):
        k = np.asarray(params[f"conv{i}"]["kernel"])  # (3, 3, C, C)
        for t in range(9):
            dy, dx = t // 3, t % 3
            w_all[i - 1, t * C_PAD : t * C_PAD + n_maps, :n_maps] = k[dy, dx]
        mean = np.asarray(stats[f"bn{i}"]["mean"])
        var = np.asarray(stats[f"bn{i}"]["var"])
        s = 1.0 / np.sqrt(var + eps)
        bn_scale[i - 1, :n_maps] = s
        bn_offset[i - 1, :n_maps] = -mean * s

    dw = np.zeros((C_PAD, LABEL_PAD), np.float32)
    db = np.zeros((LABEL_PAD,), np.float32)
    dk = np.asarray(params["output"]["kernel"])  # (C, n_labels)
    # Padded channels are exactly zero through the whole stack (zero
    # weights produce zero pre-activations; BN scale 0 keeps them zero),
    # so the mean over real channels is unaffected.
    dw[:n_maps, : dk.shape[1]] = dk
    db[: dk.shape[1]] = np.asarray(params["output"]["bias"])
    return (
        jnp.asarray(w_all),
        jnp.asarray(bn_scale),
        jnp.asarray(bn_offset),
        jnp.asarray(dw),
        jnp.asarray(db),
    )


def res_forward_fused(
    variables: dict[str, Any],
    config: dict[str, Any],
    feats: jax.Array,  # (B, 101, 40) MFCC
    packed=None,
    B_blk: int = 4,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused inference forward for res8/res26 geometries: logits (B, n_labels).

    conv0 + avg-pool run in XLA (one large-map MXU conv); the rest is the
    megakernel. Requires eval-mode batch_stats (training uses the XLA path).
    """
    assert not config.get("use_dilation"), "dilated res15 uses the XLA path"
    n_maps = config["n_feature_maps"]
    n_layers = config["n_layers"]
    params = variables["params"]

    x = feats[..., None]
    k0 = jnp.asarray(params["conv0"]["kernel"])
    y = jax.lax.conv_general_dilated(
        x, k0, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = jax.nn.relu(y)
    if "res_pool" in config:
        p = tuple(config["res_pool"])
        y = jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, *p, 1), (1, *p, 1), "VALID"
        ) / float(p[0] * p[1])
    B, H, W, _ = y.shape

    # Zero-border + channel pad -> (B, H+2, W+2, C_PAD)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, C_PAD - n_maps)))

    if packed is None:
        packed = pack_res_params(variables, config)
    w_all, bn_scale, bn_offset, dw, db = packed
    out = _res_stack_call(
        y, w_all, bn_scale, bn_offset, dw, db,
        n_layers=n_layers, H=H, W=W, B_blk=B_blk,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    return out[:, : config["n_labels"]]
