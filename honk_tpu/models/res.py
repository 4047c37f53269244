"""Tang & Lin residual KWS family as a flax module (NHWC, TPU layout).

Equivalent of reference ``utils/model.py::SpeechResModel`` (reconstructed —
SURVEY.md §0). Architecture per layer i in 0..n_layers:

    y = relu(conv_i(x))            # 3x3, bias-free; dilation 2^(i//3) if enabled
    i == 0: optional avg-pool (res8: 4x3, res26: 2x2); old_x = y
    i  > 0 and i even: x = y + old_x; old_x = x      (identity residual)
    else:              x = y
    i  > 0: x = batchnorm_i(x)     # affine-free (no scale/bias), AFTER the add

then global mean over (time, freq) and a final Dense(n_maps -> n_labels).

Note the reference applies BN *after* the residual add and has no BN on
conv0 — faithfully reproduced here (checkpoint parity depends on it).
BatchNorm matches torch BatchNorm2d(affine=False) semantics: batch stats
in training (with running-stat update, torch momentum 0.1 == flax
momentum 0.9), running stats in eval, eps 1e-5.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SpeechResModel(nn.Module):
    """Residual keyword spotter. Input: (B, 101, 40) MFCC -> (B, n_labels) logits."""

    config: dict[str, Any]
    # None = backend-fast matmul passes (bf16 on MXU) for training speed;
    # "highest" = full-f32, required for torch-checkpoint parity eval.
    precision: Any = None
    # Computation dtype for convs/dense (activations). Params stay f32.
    # bf16 halves activation HBM traffic; BN always reduces in f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        n_maps = cfg["n_feature_maps"]
        n_layers = cfg["n_layers"]
        use_dilation = bool(cfg.get("use_dilation", False))
        # torch nn.Conv2d default init (kaiming-uniform, fan_in).
        kernel_init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")

        x = x[..., None]  # (B, T, F, 1)
        y = nn.relu(
            nn.Conv(
                n_maps, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                kernel_init=kernel_init, precision=self.precision,
                dtype=self.dtype, name="conv0",
            )(x)
        )
        if "res_pool" in cfg:
            p = tuple(cfg["res_pool"])
            y = nn.avg_pool(y, window_shape=p, strides=p, padding="VALID")
        x = old_x = y

        for i in range(1, n_layers + 1):
            d = int(2 ** ((i - 1) // 3)) if use_dilation else 1
            y = nn.relu(
                nn.Conv(
                    n_maps, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False,
                    kernel_init=kernel_init, precision=self.precision,
                    dtype=self.dtype, name=f"conv{i}",
                )(x)
            )
            if i % 2 == 0:
                x = y + old_x
                old_x = x
            else:
                x = y
            x = nn.BatchNorm(
                use_running_average=not train,
                use_bias=False,
                use_scale=False,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn{i}",
            )(x)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average over time x freq
        return nn.Dense(cfg["n_labels"], kernel_init=kernel_init, precision=self.precision, name="output")(x)
