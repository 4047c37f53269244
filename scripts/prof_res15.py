"""Where does the res15 train step lose 5x vs roofline? (VERDICT r3 #2)

res15 = 13 dilated 3x3 convs at 45 maps on UNPOOLED 101x40 maps; the r3
ladder measured ~42 implied TFLOP/s training (21% of the 197 bf16 peak)
with no analysis. This script decomposes the step on the real chip:

  - full fwd / fwd+bwd step time (reference point)
  - per-dilation conv cost (d = 1, 2, 4, 8, 16): is dilation (XLA
    space-to-batch) the sink, or are all convs equally slow?
  - channel-padding probe: the same conv at 45 / 64 / 128 maps — if cost
    is flat, the MXU lane dim is padded and 45-map convs waste 2.8x
  - BN + residual-add cost (HBM-bound glue between convs)

Timing: dependency-chained lax.scan marginals (bench.py methodology),
median of reps, device_get fence.

    python scripts/prof_res15.py --batch 256 --out runs/prof_res15_r04.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", type=int, default=40)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    B, T, F = args.batch, 101, 40
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, F, 45)).astype(np.float32), jnp.bfloat16)

    def marginal(short_fn, long_fn, *a):
        float(jax.device_get(short_fn(*a)))
        float(jax.device_get(long_fn(*a)))
        ms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jax.device_get(short_fn(*a)))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jax.device_get(long_fn(*a)))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (args.long - args.short)
            if m > 0:
                ms.append(m)
        return float(np.median(ms))

    def scan_of(body, length, *consts):
        @jax.jit
        def run(x):
            def step(carry, _):
                return body(carry, *consts), None

            y, _ = jax.lax.scan(step, x, None, length=length)
            return jnp.sum(y.astype(jnp.float32))

        return run

    import flax.linen as nn

    results = {"batch": B, "device": str(jax.devices()[0])}

    # ---- single dilated conv cost per dilation level (fwd) ----
    def conv_body(d, maps):
        conv = nn.Conv(
            maps, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
            use_bias=False, dtype=jnp.bfloat16,
        )
        key = jax.random.PRNGKey(0)
        w = conv.init(key, jnp.zeros((1, T, F, maps), jnp.bfloat16))

        def body(x):
            # tiny data-dependence keeps the chain honest
            return conv.apply(w, x) + x * jnp.bfloat16(1e-6)

        return body

    conv_ms = {}
    for d in (1, 2, 4, 8, 16):
        body = conv_body(d, 45)
        f = lambda x, _b=body: _b(x)
        t = marginal(
            scan_of(lambda c, : f(c), args.short),
            scan_of(lambda c, : f(c), args.long),
            x0,
        )
        conv_ms[d] = t * 1e3
    results["conv45_fwd_ms_by_dilation"] = {str(k): round(v, 4) for k, v in conv_ms.items()}

    # ---- per-dilation conv fwd+bwd (value_and_grad wrt weights+input) ----
    def conv_grad_body(d, maps):
        conv = nn.Conv(
            maps, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
            use_bias=False, dtype=jnp.bfloat16,
        )
        key = jax.random.PRNGKey(0)
        w0 = conv.init(key, jnp.zeros((1, T, F, maps), jnp.bfloat16))

        def loss(w, x):
            return jnp.sum(conv.apply(w, x).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1))

        def body(x):
            gw, gx = g(w0, x)
            return gx + x * jnp.bfloat16(1e-6) + jnp.sum(
                jax.tree.leaves(gw)[0].astype(jnp.bfloat16)
            ) * jnp.bfloat16(1e-9)

        return body

    convb_ms = {}
    for d in (1, 2, 4, 8, 16):
        body = conv_grad_body(d, 45)
        t = marginal(
            scan_of(lambda c, : body(c), args.short),
            scan_of(lambda c, : body(c), args.long),
            x0,
        )
        convb_ms[d] = t * 1e3
    results["conv45_fwdbwd_ms_by_dilation"] = {str(k): round(v, 4) for k, v in convb_ms.items()}
    conv_flops3 = B * T * F * 45 * 45 * 9 * 2 * 3  # fwd + dgrad + wgrad
    results["conv45_fwdbwd_implied_tflops_by_dilation"] = {
        str(d): round(conv_flops3 / (convb_ms[d] * 1e-3) / 1e12, 1) for d in convb_ms
    }

    # ---- channel-padding probe: conv cost at 45 / 64 / 128 maps, d=1 ----
    ch_ms = {}
    for maps in (45, 64, 128):
        xm = jnp.asarray(rng.standard_normal((B, T, F, maps)).astype(np.float32), jnp.bfloat16)
        body = conv_body(1, maps)
        t = marginal(
            scan_of(lambda c, : body(c), args.short),
            scan_of(lambda c, : body(c), args.long),
            xm,
        )
        ch_ms[maps] = t * 1e3
    results["conv_fwd_ms_by_maps_d1"] = {str(k): round(v, 4) for k, v in ch_ms.items()}

    # ---- BN(affine-free, train) + residual add cost ----
    bn = nn.BatchNorm(use_running_average=False, use_bias=False, use_scale=False,
                      momentum=0.9, epsilon=1e-5)
    bnv = bn.init(jax.random.PRNGKey(0), x0)

    def bn_body(x):
        y, _ = bn.apply(bnv, x, mutable=["batch_stats"])
        return y + x * jnp.bfloat16(1e-6)

    results["bn_residual_ms"] = round(
        marginal(
            scan_of(lambda c, : bn_body(c), args.short),
            scan_of(lambda c, : bn_body(c), args.long),
            x0,
        ) * 1e3, 4,
    )

    # ---- full res15 fwd and train step (context) ----
    from honk_tpu.data import AugmentConfig, prepare_train_arrays
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = find_config("res15")
    model = find_model("res15")(config=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F), jnp.float32), train=False)

    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))

    def fwd_body(c):
        logits = model.apply(variables, c * jnp.float32(1.0), train=False)
        return c + jnp.mean(logits) * 1e-6

    results["res15_fwd_ms"] = round(
        marginal(
            scan_of(lambda c, : fwd_body(c), args.short),
            scan_of(lambda c, : fwd_body(c), args.long),
            feats,
        ) * 1e3, 4,
    )

    aug = AugmentConfig(n_silence=B // 10)
    audio_i16, noise = prepare_train_arrays(
        rng.integers(-3000, 3000, (2048, 16000), dtype=np.int16),
        (rng.standard_normal(16000 * 40) * 0.05).astype(np.float32), aug,
    )
    labels = jnp.asarray(rng.integers(2, 12, (2048,), dtype=np.int32))
    tx = make_optimizer()
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, B, aug, donate=False)

    def make_train_scan(length):
        @jax.jit
        def run(state, audio, labels, noise):
            key = jax.random.PRNGKey(1)

            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st, m = step(st, sub, audio, labels, noise)
                return (st, k), m["loss"]

            (_, _), losses = jax.lax.scan(body, (state, key), None, length=length)
            return losses[-1]

        return run

    f_s, f_l = make_train_scan(args.short), make_train_scan(args.long)
    results["res15_train_step_ms"] = round(
        marginal(f_s, f_l, state0, audio_i16, labels, noise) * 1e3, 4
    )

    # ---- implied flops ----
    conv_flops = B * T * F * 45 * 45 * 9 * 2  # one 3x3 conv, fwd
    results["conv45_implied_tflops_by_dilation"] = {
        str(d): round(conv_flops / (conv_ms[d] * 1e-3) / 1e12, 1) for d in conv_ms
    }
    # x3 fwd/bwd factor, same convention as bench.py's implied_tflops.
    results["res15_train_implied_tflops"] = round(
        (B * (1788e6 + 47e6) * 3) / (results["res15_train_step_ms"] * 1e-3) / 1e12, 1
    )
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
