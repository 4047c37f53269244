"""res15: per-step host dispatch (donated state) vs params-as-scan-carry.

The round-4 decomposition (PERF_RES15.md) attributed ~9.4 ms of res15's
33.4 ms train step to XLA re-laying-out the 13 conv kernels every
lax.scan iteration when they ride the carry (real training folds steps
with make_train_scan). The one unmeasured alternative (VERDICT r4 #2):
dispatch each step as its OWN program with donated state — the shape
`train/loop.py` already takes when ``steps_per_call=1`` — so weights are
plain donated inputs/outputs of one program, never a scan carry, and XLA
can keep them in a fixed layout across steps.

Timing: K dependent dispatches enqueued back-to-back (async; the only
per-step host traffic is a 2-word PRNG key), fenced by a device_get of
the LAST step's loss (chain-dependent through the donated state), with
marginal-cost extraction (t_long - t_short)/(K_long - K_short) to cancel
the fence/RTT constant — the same methodology as bench.py. The scan path
is measured identically in the same process for an apples-to-apples A/B.

    python scripts/prof_res15_dispatch.py --batch 256 --out runs/prof_res15_dispatch_r05.json
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
    p.add_argument("--model", default="res15")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", type=int, default=40)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if not 0 < args.short < args.long:
        p.error(f"need 0 < --short ({args.short}) < --long ({args.long}): "
                "the marginal divisor is (long - short) and the key list "
                "holds `long` entries")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig, prepare_train_arrays
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step
    from honk_tpu.train.steps import make_train_scan

    B = args.batch
    rng = np.random.default_rng(0)
    cfg = find_config(args.model)
    model = find_model(args.model)(config=cfg, dtype=jnp.bfloat16)

    aug = AugmentConfig(n_silence=B // 10)
    audio_i16, noise = prepare_train_arrays(
        rng.integers(-3000, 3000, (2048, 16000), dtype=np.int16),
        (rng.standard_normal(16000 * 40) * 0.05).astype(np.float32), aug,
    )
    audio_i16 = jnp.asarray(audio_i16)
    noise = jnp.asarray(noise)
    labels = jnp.asarray(rng.integers(2, 12, (2048,), dtype=np.int32))
    tx = make_optimizer()

    results = {"batch": B, "model": args.model, "device": str(jax.devices()[0])}

    # ---- A: steps folded in a lax.scan (weights as carry; product
    # ``steps_per_call>1`` path, the r4 ladder configuration) ----
    scan_s = make_train_scan(model, tx, B, aug, args.short)
    scan_l = make_train_scan(model, tx, B, aug, args.long)

    def run_scan(scan, state, key):
        state, m = scan(state, key, audio_i16, labels, noise)
        return state, m["loss"]

    def time_scan():
        state = create_train_state(model, tx, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        state, l = run_scan(scan_s, state, key)
        float(jax.device_get(l))
        state, l = run_scan(scan_l, state, key)
        float(jax.device_get(l))
        ms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, l = run_scan(scan_s, state, key)
            float(jax.device_get(l))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, l = run_scan(scan_l, state, key)
            float(jax.device_get(l))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (args.long - args.short)
            if m > 0:
                ms.append(m * 1e3)
        return float(np.median(ms))

    results["scan_carry_ms_per_step"] = round(time_scan(), 3)

    # ---- B: one dispatch per step, state donated (product
    # ``steps_per_call=1`` path) ----
    step = make_train_step(model, tx, B, aug, donate=True)
    keys = [jax.device_put(k) for k in np.asarray(jax.random.split(jax.random.PRNGKey(1), args.long))]

    def run_steps(state, n):
        m = None
        for i in range(n):
            state, m = step(state, keys[i], audio_i16, labels, noise)
        return state, m["loss"]

    def time_steps():
        state = create_train_state(model, tx, jax.random.PRNGKey(0))
        state, l = run_steps(state, args.short)
        float(jax.device_get(l))
        state, l = run_steps(state, args.long)
        float(jax.device_get(l))
        ms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, l = run_steps(state, args.short)
            float(jax.device_get(l))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, l = run_steps(state, args.long)
            float(jax.device_get(l))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (args.long - args.short)
            if m > 0:
                ms.append(m * 1e3)
        return float(np.median(ms))

    results["step_dispatch_ms_per_step"] = round(time_steps(), 3)

    # ---- C: per-step dispatch with AUTO layouts on the donated state —
    # the layout freedom a scan carry can never have. XLA picks the
    # conv-preferred layout for each weight/optimizer buffer; the state
    # stays in that layout BETWEEN steps, so the per-iteration relayout
    # the r4 decomposition measured (~9.4 ms) should disappear if layout
    # round-tripping is really the cost. ----
    from jax.experimental.layout import Format, Layout

    fn = make_train_step(model, tx, B, aug, donate=False, jit=False)
    auto = Format(Layout.AUTO)
    jstep = jax.jit(
        fn, donate_argnums=(0,),
        in_shardings=(auto, None, None, None, None),
        out_shardings=(auto, None),
    )
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0))
    comp = jstep.lower(state0, keys[0], audio_i16, labels, noise).compile()
    state_fmt = comp.input_formats[0][0]
    leaves = jax.tree.leaves(state_fmt)
    results["auto_layout_nondefault_leaves"] = sum(
        1 for f in leaves
        if f.layout.major_to_minor != tuple(range(len(f.layout.major_to_minor) - 1, -1, -1))
    )
    results["auto_layout_total_leaves"] = len(leaves)

    def run_auto(state, n):
        m = None
        for i in range(n):
            state, m = comp(state, keys[i], audio_i16, labels, noise)
        return state, m["loss"]

    def time_auto():
        state = jax.device_put(
            create_train_state(model, tx, jax.random.PRNGKey(0)), state_fmt
        )
        state, l = run_auto(state, args.short)
        float(jax.device_get(l))
        state, l = run_auto(state, args.long)
        float(jax.device_get(l))
        ms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, l = run_auto(state, args.short)
            float(jax.device_get(l))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, l = run_auto(state, args.long)
            float(jax.device_get(l))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (args.long - args.short)
            if m > 0:
                ms.append(m * 1e3)
        return float(np.median(ms))

    results["step_dispatch_auto_layout_ms_per_step"] = round(time_auto(), 3)

    a = results["scan_carry_ms_per_step"]
    b = results["step_dispatch_ms_per_step"]
    c = results["step_dispatch_auto_layout_ms_per_step"]
    results["speedup_step_vs_scan"] = round(a / b, 3)
    results["speedup_auto_vs_scan"] = round(a / c, 3)
    results["train_audio_s_per_s_scan"] = round(B / (a * 1e-3), 1)
    results["train_audio_s_per_s_step"] = round(B / (b * 1e-3), 1)
    results["train_audio_s_per_s_auto"] = round(B / (c * 1e-3), 1)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
