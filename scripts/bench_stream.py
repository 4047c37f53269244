"""Benchmark: batched multi-stream online serving throughput, real TPU.

BASELINE.json:11 (streaming continuous inference, batched multi-stream
serving): N concurrent online streams advanced by the one jit-ed
BatchStreamer step. Reports audio-seconds of stream advanced per second —
N_streams * chunk_seconds per step. Chained scan + device_get fence,
marginal between two scan lengths (see bench.py for methodology).

    ST_STREAMS=256 ST_CHUNK=3200 python scripts/bench_stream.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from honk_tpu.config import StreamConfig
    from honk_tpu.models import find_config, find_model
    from honk_tpu.stream import BatchStreamer

    model_name = os.environ.get("ST_MODEL", "res8")
    n_streams = int(os.environ.get("ST_STREAMS", "256"))
    chunk = int(os.environ.get("ST_CHUNK", "3200"))  # 200 ms per step
    ls, ll = 8, 32
    reps = int(os.environ.get("ST_REPS", "3"))

    cfg = find_config(model_name)
    model = find_model(model_name)(config=cfg, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False
    )
    bs = BatchStreamer(model, variables, n_streams, StreamConfig(), chunk)
    rng = np.random.default_rng(0)
    # Audio pool the scan slides over (device-resident).
    pool = jnp.asarray(
        (rng.standard_normal((ll, n_streams, chunk)) * 0.1).astype(np.float32)
    )

    step = bs._step_all  # jit-ed select-free (state, chunks) -> (state, smoothed)

    # Serving-shaped measurement: T back-to-back step dispatches (that IS
    # the production call pattern — a serving loop can't scan-fold chunks
    # it hasn't received), fenced once at the end by fetching a posterior
    # that data-depends on the whole chain; marginal between two chain
    # lengths cancels fixed overhead.
    def run_chain(length, seed):
        state = bs.reset()
        post = None
        t0 = time.perf_counter()
        for t in range(length):
            state, post = step(state, pool[t % ll] + seed * 1e-12)
        float(jax.device_get(jnp.sum(post)))
        return time.perf_counter() - t0

    run_chain(ls, jnp.float32(0.0))  # compile + warm
    ms = []
    for r in range(reps):
        seed = jnp.float32((r + 1) * 1e-6)
        ts = run_chain(ls, seed)
        tl = run_chain(ll, seed)
        m = (tl - ts) / (ll - ls)
        if m > 0:
            ms.append(m)
    per_step = float(np.median(ms))
    audio_per_step = n_streams * chunk / 16000.0
    print(
        json.dumps(
            {
                "model": model_name,
                "n_streams": n_streams,
                "chunk_samples": chunk,
                "step_ms": round(per_step * 1e3, 3),
                "audio_s_per_s": round(audio_per_step / per_step, 1),
                "realtime_streams_capacity": int(
                    n_streams * (chunk / 16000.0) / per_step
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
