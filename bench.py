"""Benchmark: res8 train + inference throughput in audio-seconds/s/chip.

North-star metric (BASELINE.json:2,5): audio-seconds of 16 kHz utterance
processing per wall-clock second per chip, for the flagship res8 model,
full pipeline (on-device augmentation + MFCC frontend + model fwd[/bwd]).
Target >= 50,000 audio-s/s/chip; vs_baseline is value / 50000.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Methodology: dependency-chained dispatches (each link consumes the
previous link's output, so nothing can be elided) in LONG chains, with
per-batch time taken as the MARGINAL cost between a short and a long
chain: (t_long - t_short) / (L_long - L_short). This dev box reaches the
chip through a tunnel whose completion acks are unreliable at fine grain
(sub-chains can "complete" in microseconds); seconds-scale chains swamp
that, and the marginal cancels fixed dispatch overhead. A flops sanity
field reports implied TFLOP/s — if it exceeds the chip's peak the
measurement is flagged suspect. Inputs stay in HBM: at 50k audio-s/s
host feeding would need 1.6 GB/s (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compile cache: bench compiles 4 scan programs (~20-40s each
    # cold over the tunnel); caching makes reruns start timing immediately
    # and keeps total runtime well inside driver timeouts.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig
    from honk_tpu.frontend.mfcc import compute_mfccs
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    # r4: scan lens raised from (8, 32) to (32, 160). The marginal's noise
    # is (per-chain tunnel jitter)/(L_long - L_short); at (8, 32) the
    # denominator was 24 steps (~44 ms of train work) and train marginals
    # swung +/-25% run-to-run. 128 steps (~230 ms) buys ~5x noise
    # reduction for <1 s of extra device time per rep (VERDICT r3 #6:
    # target train spread max/min <= 1.2).
    scan_short = int(os.environ.get("BENCH_SCAN_SHORT", "32"))
    scan_long = int(os.environ.get("BENCH_SCAN_LONG", "160"))
    # Inference steps are ~3x shorter than train steps, so its marginal
    # gets 2x the scan lengths to keep a comparable work term (>=160 ms)
    # against the same tunnel jitter.
    infer_short, infer_long = 2 * scan_short, 2 * scan_long
    # 7 reps (up from 3 in r01/r02): the r01->r02 infer swing (-26% on
    # byte-identical code) showed the tunnel's noise floor is wide; more
    # reps are nearly free with the compile cache, and the JSON now
    # reports per-mode min/median/max so round-over-round deltas can be
    # judged against the measured spread instead of a bare median.
    reps = int(os.environ.get("BENCH_REPS", "7"))
    model_name = os.environ.get("BENCH_MODEL", "res8")

    import jax.numpy as _jnp

    dtype = _jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    cfg = find_config(model_name)
    model = find_model(model_name)(config=cfg, dtype=dtype)
    rng = np.random.default_rng(0)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # Device-resident audio pool; each scan step reads a rolling slice.
    pool_n = max(2048, batch * 2)
    pool = jnp.asarray((rng.standard_normal((pool_n, 16000)) * 0.1).astype(np.float32))

    def make_infer_scan(length):
        @jax.jit
        def infer_scan(params, batch_stats, pool, seed):
            def body(carry, _):
                i, acc = carry
                start = (i * batch) % (pool_n - batch)
                audio = jax.lax.dynamic_slice(pool, (start, 0), (batch, 16000)) + acc * 1e-12
                feats = compute_mfccs(audio, fast=dtype == jnp.bfloat16)
                v = {"params": params}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                logits = model.apply(v, feats, train=False)
                return (i + 1, acc + jnp.sum(logits)), None

            (i, acc), _ = jax.lax.scan(body, (0, seed), None, length=length)
            return acc

        return infer_scan

    def scan_marginal(short_fn, long_fn, lens, *args):
        """Median marginal per-iteration time between two in-jit scan lengths.

        Timing is taken as time-to-device_get of a scalar that data-depends
        on the ENTIRE chain: the tunnel's completion acks (block_until_ready)
        are unreliable at fine grain, but a device->host fetch cannot return
        before the bytes exist, so device_get is the only honest fence here.
        The marginal between two lengths cancels fixed dispatch + transfer
        overhead. Negative marginals (timing noise) are discarded.
        """
        float(jax.device_get(short_fn(*args, jnp.float32(0.0))))
        float(jax.device_get(long_fn(*args, jnp.float32(0.0))))
        ms = []
        for r in range(reps):
            seed = jnp.float32((r + 1) * 1e-6)
            t0 = time.perf_counter()
            float(jax.device_get(short_fn(*args, seed)))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jax.device_get(long_fn(*args, seed)))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (lens[1] - lens[0])
            if m > 0:
                ms.append(m)
        if not ms:
            raise RuntimeError("all marginal timings were non-positive; tunnel timing unusable")
        return float(np.median(ms)), ms

    infer_t, infer_ms = scan_marginal(
        make_infer_scan(infer_short), make_infer_scan(infer_long),
        (infer_short, infer_long), params, batch_stats, pool,
    )
    infer_aps = batch / infer_t

    # ---- training: scan of full train steps (sample+augment+mfcc+fwd/bwd+sgd) ----
    from honk_tpu.data import prepare_train_arrays

    n_clips = pool_n
    aug = AugmentConfig(n_silence=batch // 10)
    audio_i16, noise = prepare_train_arrays(
        rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16),
        (rng.standard_normal(16000 * 40) * 0.05).astype(np.float32),
        aug,
    )
    labels = jnp.asarray(rng.integers(2, 12, (n_clips,), dtype=np.int32))
    tx = make_optimizer()
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, batch, aug, donate=False)

    def make_train_scan(length):
        @jax.jit
        def train_scan(state, audio_i16, labels, noise, seed):
            key = jax.random.PRNGKey(1)
            key = jax.random.fold_in(key, (seed * 1e7).astype(jnp.int32))

            def body(carry, _):
                state, key = carry
                key, sub = jax.random.split(key)
                state, metrics = step(state, sub, audio_i16, labels, noise)
                return (state, key), metrics["loss"]

            (state, _), losses = jax.lax.scan(body, (state, key), None, length=length)
            return losses[-1]

        return train_scan

    train_t, train_ms = scan_marginal(
        make_train_scan(scan_short), make_train_scan(scan_long),
        (scan_short, scan_long), state0, audio_i16, labels, noise,
    )
    train_aps = batch / train_t

    # Sanity: implied model+frontend FLOP rate. Mult-add footprints per
    # 1 s utterance from the governing papers (SURVEY.md §6: res8 ~30M,
    # res15 ~894M, res26 ~380M; narrow ~1/5) x2 FLOPs + frontend ~47e6.
    model_flops = {
        "res8": 124e6, "res8-narrow": 28e6,
        "res15": 1788e6, "res15-narrow": 330e6,
        "res26": 760e6, "res26-narrow": 150e6,
        "cnn-trad-pool2": 190e6,
    }
    fwd_flops_per_sample = model_flops.get(model_name, 124e6) + 47e6
    infer_tflops = infer_aps * fwd_flops_per_sample / 1e12
    train_tflops = train_aps * 3 * fwd_flops_per_sample / 1e12
    # v5e bf16 peak is ~197 TFLOP/s (394 is the int8 number); anything at or
    # above peak implies the timing elided work.
    suspect = bool(infer_tflops > 197 or train_tflops > 197)

    def spread(ms):
        """Per-rep marginal times -> audio-s/s {min, median, max} + raw."""
        aps = sorted(batch / m for m in ms)
        return {
            "min": round(aps[0], 1),
            "median": round(float(np.median(aps)), 1),
            "max": round(aps[-1], 1),
            "n_reps": len(aps),
            "per_rep": [round(a, 1) for a in aps],
        }

    value = float(np.sqrt(infer_aps * train_aps))  # geometric mean of the two modes
    result = {
        "metric": f"audio_seconds_per_s_per_chip_{model_name.replace('-', '_')}_train_infer_geomean",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 50000.0, 4),
        "infer_audio_s_per_s": round(infer_aps, 1),
        "train_audio_s_per_s": round(train_aps, 1),
        "infer_spread": spread(infer_ms),
        "train_spread": spread(train_ms),
        "batch": batch,
        "scan_lens": [scan_short, scan_long],
        "infer_scan_lens": [infer_short, infer_long],
        "model": model_name,
        "device": str(jax.devices()[0]),
        "implied_tflops": [round(infer_tflops, 1), round(train_tflops, 1)],
        "suspect": suspect,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
