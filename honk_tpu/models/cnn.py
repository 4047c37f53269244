"""Sainath & Parada CNN family as a flax module (NHWC, TPU layout).

Equivalent of reference ``utils/model.py::SpeechModel`` (reconstructed —
SURVEY.md §0): conv1 [+ conv2] with ReLU/dropout/max-pool, optional
low-rank linear bottleneck, optional dnn1/dnn2, and a final linear
classifier. The ``tf_variant`` flag mirrors the TF Speech Commands
tutorial numerics: truncated-normal(0.01) init, zero biases, and no ReLU
after dnn1.

TPU-first notes:
- Activations are NHWC (B, time, freq, channels) — TPU conv layout; the
  reference is NCHW. Before flattening into the dense layers we transpose
  to NCHW order so dense-weight layouts stay checkpoint-compatible with
  torch state dicts (see models/torch_compat.py).
- All convs run in VALID padding (torch default padding=0); pooling uses
  window == stride with floor semantics, matching torch MaxPool2d.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _pool_out(size: int, pool: int) -> int:
    return size // pool


def _conv_out(size: int, kernel: int, stride: int) -> int:
    return (size - kernel) // stride + 1


class SpeechModel(nn.Module):
    """CNN keyword spotter. Input: (B, 101, 40) MFCC -> (B, n_labels) logits."""

    config: dict[str, Any]
    # None = backend-fast matmul passes (bf16 on MXU) for training speed;
    # "highest" = full-f32, required for torch-checkpoint parity eval.
    precision: Any = None
    # Computation dtype for convs/dense (activations). Params stay f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        tf_variant = bool(cfg.get("tf_variant", False))
        dropout = cfg.get("dropout_prob", 0.5)
        if tf_variant:
            kernel_init = nn.initializers.truncated_normal(stddev=0.01)
            bias_init = nn.initializers.zeros_init()
        else:
            # torch nn.Conv2d/Linear default: kaiming-uniform fan_in.
            kernel_init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")
            bias_init = nn.initializers.zeros_init()

        x = x[..., None]  # (B, T, F, 1)

        x = nn.Conv(
            features=cfg["n_feature_maps1"],
            kernel_size=tuple(cfg["conv1_size"]),
            strides=tuple(cfg["conv1_stride"]),
            padding="VALID",
            kernel_init=kernel_init,
            bias_init=bias_init,
            precision=self.precision,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=dropout, deterministic=not train)(x)
        p1 = tuple(cfg["conv1_pool"])
        if p1 != (1, 1):
            x = nn.max_pool(x, window_shape=p1, strides=p1, padding="VALID")

        if "n_feature_maps2" in cfg:
            x = nn.Conv(
                features=cfg["n_feature_maps2"],
                kernel_size=tuple(cfg["conv2_size"]),
                strides=tuple(cfg["conv2_stride"]),
                padding="VALID",
                kernel_init=kernel_init,
                bias_init=bias_init,
                precision=self.precision,
                dtype=self.dtype,
                name="conv2",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=dropout, deterministic=not train)(x)
            p2 = tuple(cfg["conv2_pool"])
            if p2 != (1, 1):
                x = nn.max_pool(x, window_shape=p2, strides=p2, padding="VALID")

        # Flatten in NCHW order for torch-checkpoint-compatible dense layouts.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        dense_init = kernel_init if tf_variant else nn.initializers.variance_scaling(
            1.0 / 3, "fan_in", "uniform"
        )
        if "lin_size" in cfg:
            x = nn.Dense(cfg["lin_size"], kernel_init=dense_init, bias_init=bias_init, precision=self.precision, dtype=self.dtype, name="lin")(x)
        if "dnn1_size" in cfg:
            x = nn.Dense(cfg["dnn1_size"], kernel_init=dense_init, bias_init=bias_init, precision=self.precision, dtype=self.dtype, name="dnn1")(x)
            if not tf_variant:
                x = nn.relu(x)
            x = nn.Dropout(rate=dropout, deterministic=not train)(x)
        if "dnn2_size" in cfg:
            x = nn.Dense(cfg["dnn2_size"], kernel_init=dense_init, bias_init=bias_init, precision=self.precision, dtype=self.dtype, name="dnn2")(x)
            x = nn.Dropout(rate=dropout, deterministic=not train)(x)
        return nn.Dense(cfg["n_labels"], kernel_init=dense_init, bias_init=bias_init, precision=self.precision, name="output")(x.astype(jnp.float32))

    @staticmethod
    def feature_shape(cfg: dict[str, Any]) -> tuple[int, int, int]:
        """(T, F, C) after the conv stack, for converter bookkeeping."""
        t, f = cfg["height"], cfg["width"]
        t = _conv_out(t, cfg["conv1_size"][0], cfg["conv1_stride"][0])
        f = _conv_out(f, cfg["conv1_size"][1], cfg["conv1_stride"][1])
        t, f = _pool_out(t, cfg["conv1_pool"][0]), _pool_out(f, cfg["conv1_pool"][1])
        c = cfg["n_feature_maps1"]
        if "n_feature_maps2" in cfg:
            t = _conv_out(t, cfg["conv2_size"][0], cfg["conv2_stride"][0])
            f = _conv_out(f, cfg["conv2_size"][1], cfg["conv2_stride"][1])
            t, f = _pool_out(t, cfg["conv2_pool"][0]), _pool_out(f, cfg["conv2_pool"][1])
            c = cfg["n_feature_maps2"]
        return t, f, c
