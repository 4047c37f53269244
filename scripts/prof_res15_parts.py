"""res15 train-step decomposition, part 2 (VERDICT r3 #2).

prof_res15.py measured: single conv fwd 0.44 ms (86 TFLOP/s), fwd+bwd
0.91 ms (124 TFLOP/s), BN+res 0.12 ms, full fwd 6.35 ms — but the full
train step is 33.4 ms where the sum of parts predicts ~18 ms. This
script isolates WHERE the composed graph loses the difference:

  - full-model value_and_grad, train-mode BN (batch stats, mutable)
  - full-model value_and_grad, eval-mode BN (running stats, no mutable)
  - 13-conv relu stack fwd+bwd, no BN / no residual
  - train-mode grad WITHOUT the f32 cast around BN (dtype-homogeneous)

    python scripts/prof_res15_parts.py --batch 256 --out runs/prof_res15_parts_r04.json
"""

from __future__ import annotations

import argparse
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
    import flax.linen as nn
    import jax.numpy as jnp

    from honk_tpu.models import find_config, find_model

    B, T, F = args.batch, 101, 40
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))

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
        return float(np.median(ms)) * 1e3

    def scan_of(body, length):
        @jax.jit
        def run(x):
            def step(c, _):
                return body(c), None

            y, _ = jax.lax.scan(step, x, None, length=length)
            return jnp.sum(y.astype(jnp.float32))

        return run

    results = {"batch": B, "device": str(jax.devices()[0])}

    cfg = find_config("res15")
    model = find_model("res15")(config=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F), jnp.float32), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    # 1. full model fwd+bwd, TRAIN-mode BN (the step's configuration)
    def loss_train(p_, x):
        out, _ = model.apply(
            {"params": p_, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_train = jax.grad(loss_train)

    def body_train(x):
        g = g_train(params, x)
        return x + jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)) * 1e-9

    results["full_grad_train_bn_ms"] = round(
        marginal(scan_of(body_train, args.short), scan_of(body_train, args.long), feats), 3
    )

    # 2. full model fwd+bwd, EVAL-mode BN (running stats; no batch-stat work)
    def loss_eval(p_, x):
        out = model.apply({"params": p_, "batch_stats": stats}, x, train=False)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_eval = jax.grad(loss_eval)

    def body_eval(x):
        g = g_eval(params, x)
        return x + jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)) * 1e-9

    results["full_grad_eval_bn_ms"] = round(
        marginal(scan_of(body_eval, args.short), scan_of(body_eval, args.long), feats), 3
    )

    # 3. bare 13-conv relu stack (no BN, no residual), fwd+bwd
    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(13):
                d = int(2 ** (i // 3))
                x = nn.relu(
                    nn.Conv(45, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                            use_bias=False, dtype=jnp.bfloat16)(x)
                )
            return x

    stack = ConvStack()
    x45 = jnp.asarray(rng.standard_normal((B, T, F, 45)).astype(np.float32), jnp.bfloat16)
    w = stack.init(jax.random.PRNGKey(0), x45)

    def loss_stack(w_, x):
        return jnp.mean(stack.apply(w_, x).astype(jnp.float32) ** 2)

    g_stack = jax.grad(loss_stack)

    def body_stack(x):
        g = g_stack(w, x)
        return x + jnp.sum(jax.tree.leaves(g)[0]).astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    results["convstack13_grad_ms"] = round(
        marginal(scan_of(body_stack, args.short), scan_of(body_stack, args.long), x45), 3
    )

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
