"""Benchmark: fused Pallas res megakernel vs the XLA forward, real TPU.

Settles the megakernel question with data (round-1 verdict item #5): times
the post-MFCC classifier forward — (B, 101, 40) feats -> logits — through
(a) the plain flax/XLA model and (b) ops/res_kernel.res_forward_fused
(fori_loop-over-layers body), at serving batch sizes. Same marginal-chain
methodology as bench.py (dependency-chained scans, device_get fence,
marginal between two scan lengths).

    RK_MODEL=res8 RK_BATCH=1024 python scripts/bench_res_kernel.py
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

    from honk_tpu.models import find_config, find_model
    from honk_tpu.ops.res_kernel import pack_res_params, res_forward_fused

    model_name = os.environ.get("RK_MODEL", "res8")
    batch = int(os.environ.get("RK_BATCH", "1024"))
    ls, ll = 8, 32
    reps = int(os.environ.get("RK_REPS", "3"))

    cfg = find_config(model_name)
    model = find_model(model_name)(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False
    )
    packed = pack_res_params(variables, cfg)

    pool_n = max(2048, batch * 2)
    pool = jnp.asarray((rng.standard_normal((pool_n, 101, 40)) * 2).astype(np.float32))

    def make_scan(which, length):
        # variables/packed are jit ARGS, not closure constants — baked-in
        # weight constants slow XLA compilation drastically over the tunnel.
        @jax.jit
        def scan(variables, packed, pool, seed):
            def body(carry, _):
                i, acc = carry
                start = (i * batch) % (pool_n - batch)
                feats = jax.lax.dynamic_slice(pool, (start, 0, 0), (batch, 101, 40)) + acc * 1e-12
                if which == "xla":
                    logits = model.apply(variables, feats, train=False)
                else:
                    logits = res_forward_fused(variables, cfg, feats, packed=packed)
                return (i + 1, acc + jnp.sum(logits.astype(jnp.float32))), None

            (_, acc), _ = jax.lax.scan(body, (0, seed), None, length=length)
            return acc

        return scan

    def marginal(which):
        fs, fl = make_scan(which, ls), make_scan(which, ll)
        t0 = time.perf_counter()
        float(jax.device_get(fs(variables, packed, pool, jnp.float32(0.0))))
        compile_s = time.perf_counter() - t0
        float(jax.device_get(fl(variables, packed, pool, jnp.float32(0.0))))
        ms = []
        for r in range(reps):
            seed = jnp.float32((r + 1) * 1e-6)
            t0 = time.perf_counter()
            float(jax.device_get(fs(variables, packed, pool, seed)))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jax.device_get(fl(variables, packed, pool, seed)))
            tl = time.perf_counter() - t0
            m = (tl - ts) / (ll - ls)
            if m > 0:
                ms.append(m)
        return float(np.median(ms)), compile_s

    xla_t, xla_c = marginal("xla")
    fused_t, fused_c = marginal("fused")
    print(
        json.dumps(
            {
                "model": model_name,
                "batch": batch,
                "xla_ms_per_batch": round(xla_t * 1e3, 3),
                "fused_ms_per_batch": round(fused_t * 1e3, 3),
                "xla_audio_s_per_s": round(batch / xla_t, 1),
                "fused_audio_s_per_s": round(batch / fused_t, 1),
                "speedup_fused_over_xla": round(xla_t / fused_t, 3),
                "compile_s": {"xla": round(xla_c, 1), "fused": round(fused_c, 1)},
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
