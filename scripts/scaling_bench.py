"""DP scaling-efficiency harness (BASELINE.json:5 — measured at 1 chip,
1 host, N>=2 hosts).

On real multi-chip hardware, run per mesh size:
    python scripts/scaling_bench.py 1 2 4 8
On this dev box (one real chip), the same harness runs on the 8-virtual-
device CPU mesh to validate the *mechanism* (per-device work stays
constant as devices grow => near-flat step time = good weak scaling);
absolute numbers come from real chips.

Prints one JSON line per mesh size:
    {"n_devices": N, "step_ms": ..., "audio_s_per_s": ...,
     "scaling_efficiency_vs_1": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sizes: list[int], per_device_batch: int | None = None, force_cpu: bool | None = None):
    if force_cpu is None:
        force_cpu = os.environ.get("SCALING_CPU", "0") == "1"
    if per_device_batch is None:
        # CPU mesh validates the mechanism only; keep per-device work small.
        per_device_batch = int(os.environ.get("SCALING_BATCH", "16" if force_cpu else "128"))
    scan_short = int(os.environ.get("SCALING_SCAN_SHORT", "5" if force_cpu else "20"))
    scan_long = int(os.environ.get("SCALING_SCAN_LONG", "20" if force_cpu else "80"))
    if force_cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the same step graphs recompile per mesh size
    # otherwise (tens of seconds each on XLA:CPU).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig, prepare_train_arrays
    from honk_tpu.models import find_config, find_model
    from honk_tpu.parallel import make_data_mesh, replicate
    from honk_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = find_config("res8")
    model = find_model("res8")(config=cfg)
    tx = make_optimizer()
    rng = np.random.default_rng(0)
    n_clips = 1024
    audio_np = rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16)
    labels_np = rng.integers(2, 12, (n_clips,), dtype=np.int32)
    noise_np = (rng.standard_normal(16000 * 10) * 0.05).astype(np.float32)

    base = None
    for n in sizes:
        if n > jax.device_count():
            print(json.dumps({"n_devices": n, "skipped": "not enough devices"}))
            continue
        mesh = make_data_mesh(n, "data")
        batch = per_device_batch * n  # weak scaling: constant per-device work
        state = replicate(mesh, create_train_state(model, tx, jax.random.PRNGKey(0)))
        aug = AugmentConfig(n_silence=8)
        audio_pad_np, noise_win_np = prepare_train_arrays(audio_np, noise_np, aug)
        audio = replicate(mesh, audio_pad_np)
        labels = replicate(mesh, jnp.asarray(labels_np))
        noise = replicate(mesh, noise_win_np)
        step = make_train_step(model, tx, batch, aug, donate=False, data_axis="data")

        def scan_steps(L):
            @jax.jit
            def f(state, seed):
                def body(c, _):
                    s, k = c
                    k, sub = jax.random.split(k)
                    s, m = step(s, sub, audio, labels, noise)
                    return (s, k), m["loss"]

                key = jax.random.fold_in(jax.random.PRNGKey(2), (seed * 1e6).astype(jnp.int32))
                (s, _), losses = jax.lax.scan(body, (state, key), None, length=L)
                return losses[-1]

            return f

        with jax.set_mesh(mesh):
            s20, s80 = scan_steps(scan_short), scan_steps(scan_long)
            jax.block_until_ready(s20(state, jnp.float32(0.0)))
            jax.block_until_ready(s80(state, jnp.float32(0.0)))
            ms = []
            for r in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(s20(state, jnp.float32(r + 1.0)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                jax.block_until_ready(s80(state, jnp.float32(r + 1.0)))
                t2 = time.perf_counter() - t0
                ms.append((t2 - t1) / (scan_long - scan_short))
        step_s = float(np.median(ms))
        aps = batch / step_s
        if base is None:
            base = step_s
        row = {
            "n_devices": n,
            "global_batch": batch,
            "step_ms": round(step_s * 1e3, 3),
            "audio_s_per_s": round(aps, 1),
            "scaling_efficiency_vs_1": round(base / step_s, 4),
        }
        if force_cpu:
            # Virtual devices share the host's cores: weak-scaling step time
            # grows ~linearly with N by construction, so efficiency-vs-1 is
            # NOT meaningful here — this mode only validates that the sharded
            # program runs and partitions. Real efficiency needs real chips.
            row["note"] = "virtual CPU mesh (shared cores): mechanism check only"
            row["serialized_throughput_frac"] = round(base * n / step_s, 4)
        print(json.dumps(row))


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    main(sizes)
