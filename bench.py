"""Benchmark: res8 train + inference throughput in audio-seconds/s/chip.

North-star metric (BASELINE.json:2,5): audio-seconds of 16 kHz utterance
processing per wall-clock second per chip, for the flagship res8 model,
full pipeline (on-device augmentation + MFCC frontend + model fwd[/bwd]).
Target >= 50,000 audio-s/s/chip; vs_baseline is value / 50000.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Methodology: the hot loop is a lax.scan of K batches inside ONE XLA
program over a device-resident audio pool — measuring device throughput,
not host/tunnel dispatch latency (this dev box reaches the chip through a
~30 ms RTT tunnel; production serving pipelines dispatches). Per-batch
time is the MARGINAL cost between a short and a long scan,
(t_long - t_short) / (L_long - L_short), which cancels fixed
dispatch/transfer overhead and any small-program fast-path anomalies in
the tunnel. Inputs stay in HBM: at 50k audio-s/s host feeding would need
1.6 GB/s (SURVEY.md §6 "feed/layout-bound, not FLOP-bound").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig
    from honk_tpu.frontend.mfcc import compute_mfccs
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    scan_short = int(os.environ.get("BENCH_SCAN_SHORT", "10"))
    scan_long = int(os.environ.get("BENCH_SCAN_LONG", "50"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    model_name = os.environ.get("BENCH_MODEL", "res8")

    cfg = find_config(model_name)
    model = find_model(model_name)(config=cfg)
    rng = np.random.default_rng(0)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # Device-resident audio pool; each scan step reads a rolling slice.
    pool_n = max(2048, batch * 2)
    pool = jnp.asarray((rng.standard_normal((pool_n, 16000)) * 0.1).astype(np.float32))

    @jax.jit
    def infer_step(params, batch_stats, pool, carry):
        """One inference batch; `carry` creates a data dependency so chained
        dispatches are forcibly serialized (no caching/skip possible)."""
        start = (carry.astype(jnp.int32) % 7) * ((pool_n - batch) // 7)
        audio = jax.lax.dynamic_slice(pool, (start, 0), (batch, 16000)) + carry * 1e-12
        feats = compute_mfccs(audio)
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        logits = model.apply(v, feats, train=False)
        return jnp.abs(jnp.sum(logits)) % 997.0 + 1.0

    def chain_time(step_fn, n_links, *args, carry0):
        """Wall time of a dependency chain of n_links dispatches."""
        carry = carry0
        t0 = time.perf_counter()
        for _ in range(n_links):
            carry = step_fn(*args, carry)
        jax.block_until_ready(carry)
        return time.perf_counter() - t0

    def marginal(step_fn, *args, carry0):
        """Marginal per-link time between short and long chains (cancels
        fixed dispatch/tunnel overhead); median of reps."""
        chain_time(step_fn, 3, *args, carry0=carry0)  # warmup/compile
        ms = []
        for _ in range(reps):
            ts = chain_time(step_fn, scan_short, *args, carry0=carry0)
            tl = chain_time(step_fn, scan_long, *args, carry0=carry0)
            ms.append((tl - ts) / (scan_long - scan_short))
        return float(np.median(ms))

    infer_t = marginal(infer_step, params, batch_stats, pool, carry0=jnp.float32(1.0))
    infer_aps = batch / infer_t

    # ---- training: scan of full train steps (sample+augment+mfcc+fwd/bwd+sgd) ----
    n_clips = pool_n
    audio_i16 = jnp.asarray(rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16))
    labels = jnp.asarray(rng.integers(2, 12, (n_clips,), dtype=np.int32))
    noise = jnp.asarray((rng.standard_normal(16000 * 40) * 0.05).astype(np.float32))
    tx = make_optimizer()
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, batch, AugmentConfig(n_silence=batch // 10), donate=False)

    key = jax.random.PRNGKey(1)

    def train_link(audio_i16, labels, noise, carry):
        # carry = (state, loss); state threading serializes the chain.
        state, _ = carry
        new_state, metrics = step(state, key, audio_i16, labels, noise)
        return (new_state, metrics["loss"])

    def train_chain(n_links):
        carry = (state0, jnp.float32(0.0))
        t0 = time.perf_counter()
        for _ in range(n_links):
            carry = train_link(audio_i16, labels, noise, carry)
        jax.block_until_ready(carry)
        return time.perf_counter() - t0

    train_chain(3)  # warmup/compile
    ms = []
    for _ in range(reps):
        ts = train_chain(scan_short)
        tl = train_chain(scan_long)
        ms.append((tl - ts) / (scan_long - scan_short))
    train_t = float(np.median(ms))
    train_aps = batch / train_t

    value = float(np.sqrt(infer_aps * train_aps))  # geometric mean of the two modes
    result = {
        "metric": "audio_seconds_per_s_per_chip_res8_train_infer_geomean",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 50000.0, 4),
        "infer_audio_s_per_s": round(infer_aps, 1),
        "train_audio_s_per_s": round(train_aps, 1),
        "batch": batch,
        "scan_lens": [scan_short, scan_long],
        "model": model_name,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
