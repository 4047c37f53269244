"""Benchmark: res8 train + inference throughput in audio-seconds/s/chip.

North-star metric (BASELINE.json:2,5): audio-seconds of 16 kHz utterance
processing per wall-clock second per chip, for the flagship res8 model,
full pipeline (on-device augmentation + MFCC frontend + model fwd[/bwd]).
Target >= 50,000 audio-s/s/chip; vs_baseline is value / 50000.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Run on the real TPU (default session env). Inputs stay device-resident —
at 50k audio-s/s host feeding would need 1.6 GB/s through the tunnel,
so the bench (like the real pipeline) keeps the corpus in HBM
(SURVEY.md §6 "feed/layout-bound, not FLOP-bound").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _bench_fn(fn, iters: int, warmup: int = 3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step
    from honk_tpu.train.steps import make_forward

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    model_name = os.environ.get("BENCH_MODEL", "res8")

    cfg = find_config(model_name)
    model = find_model(model_name)(config=cfg)
    rng = np.random.default_rng(0)

    # ---- inference ----
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    forward = make_forward(model)
    audio = jnp.asarray(rng.standard_normal((batch, 16000)).astype(np.float32) * 0.1)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    infer_s = _bench_fn(lambda: forward(params, batch_stats, audio), iters)
    infer_aps = batch / infer_s  # 1 s of audio per utterance

    # ---- training (full pipeline: sample+augment+mfcc+fwd/bwd+sgd) ----
    n_clips = max(batch, 2048)
    audio_i16 = jnp.asarray(rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16))
    labels = jnp.asarray(rng.integers(2, 12, (n_clips,), dtype=np.int32))
    noise = jnp.asarray(rng.standard_normal(16000 * 40).astype(np.float32) * 0.05)
    tx = make_optimizer()
    state = create_train_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, batch, AugmentConfig(n_silence=batch // 10))
    key = jax.random.PRNGKey(1)

    # donated state: rebind each call
    state_holder = [state]

    def run_step():
        s, m = step(state_holder[0], key, audio_i16, labels, noise)
        state_holder[0] = s
        return m["loss"]

    train_s = _bench_fn(run_step, iters)
    train_aps = batch / train_s

    value = float(np.sqrt(infer_aps * train_aps))  # geometric mean of the two modes
    result = {
        "metric": "audio_seconds_per_s_per_chip_res8_train_infer_geomean",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 50000.0, 4),
        "infer_audio_s_per_s": round(infer_aps, 1),
        "train_audio_s_per_s": round(train_aps, 1),
        "batch": batch,
        "model": model_name,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
