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

    step = bs._step  # jit-ed (state, chunks) -> (state, smoothed)

    def make_scan(length):
        @jax.jit
        def scan(state, seed):
            def body(carry, t):
                st, acc = carry
                chunks = pool[t % ll] + acc * 1e-12
                st, post = step(st, chunks)
                return (st, acc + jnp.sum(post)), None

            (state, acc), _ = jax.lax.scan(
                body, (state, seed), jnp.arange(length), length=length
            )
            return acc

        return scan

    fs, fl = make_scan(ls), make_scan(ll)
    float(jax.device_get(fs(bs.reset(), jnp.float32(0.0))))
    float(jax.device_get(fl(bs.reset(), jnp.float32(0.0))))
    ms = []
    for r in range(reps):
        seed = jnp.float32((r + 1) * 1e-6)
        t0 = time.perf_counter()
        float(jax.device_get(fs(bs.reset(), seed)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jax.device_get(fl(bs.reset(), seed)))
        tl = time.perf_counter() - t0
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
