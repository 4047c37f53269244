"""Worker for the two-process distributed-training integration test.

Spawned by tests/test_multiprocess.py: each process owns 4 virtual CPU
devices, joins the jax.distributed runtime over loopback (the same
coordinator handshake a multi-host TPU pod uses, SURVEY.md §2.3), and
drives REAL training via honk_tpu.train.train for two epochs. The parent
asserts both processes agree on the trained parameters.

Usage: python tests/mp_worker.py <pid> <nproc> <port> <data_dir> <out_json>

HONK_MP_PLATFORM=tpu runs the same coordinator + training path against
the real TPU chip instead of 4 virtual CPU devices (slow lane; exits 42
if no TPU is reachable so the test can skip cleanly).
"""

import json
import os
import sys

PLATFORM = os.environ.get("HONK_MP_PLATFORM", "cpu")
if PLATFORM == "cpu":
    # Per-process device topology must be set before the first backend init.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # sitecustomize pins jax_platforms to "axon,cpu", but under
    # jax.distributed the tunnel platform is only registered under its
    # canonical name "tpu" — the "axon" alias fails backend resolution.
    jax.config.update("jax_platforms", "tpu,cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, out_path = sys.argv[4], sys.argv[5]

    from honk_tpu.parallel import initialize_distributed, is_primary

    if PLATFORM == "tpu":
        try:
            initialize_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
            if jax.default_backend() == "cpu":
                return 42  # no TPU attached -> cleanly skippable
        except Exception as e:  # backend/tunnel unavailable
            print(f"tpu init failed: {e}", flush=True)
            return 42
    else:
        initialize_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
        assert jax.device_count() == 4 * nproc, jax.device_count()
        assert jax.local_device_count() == 4
    assert jax.process_count() == nproc, jax.process_count()
    assert is_primary() == (pid == 0)

    import numpy as np

    from honk_tpu.config import DataConfig, ExperimentConfig, TrainConfig
    from honk_tpu.metrics import MetricsLogger
    from honk_tpu.train import train

    cfg = ExperimentConfig(
        data=DataConfig(data_dir=data_dir, noise_prob=0.1, timeshift_ms=40),
        train=TrainConfig(
            # TPU mode keeps the compile small (tunnel compiles are minutes
            # cold); CPU mode keeps the historical cnn-trad-pool2 coverage.
            model="res8-narrow" if PLATFORM == "tpu" else "cnn-trad-pool2",
            batch_size=16,
            n_epochs=1 if PLATFORM == "tpu" else 2,
            lr=(0.01,),
            schedule=(),
            dev_every=1,
            eval_batch_size=32,
            steps_per_call=4,
        ),
    )
    ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else None
    result = train(cfg, logger=MetricsLogger(), checkpoint_dir=ckpt_dir)
    if ckpt_dir and is_primary():  # host-0-only checkpoint write (cli parity)
        from honk_tpu.ckpt import Checkpointer

        ck = Checkpointer(ckpt_dir)
        ck.save_best(result["best"])
        ck.wait_until_finished()

    params = jax.device_get(result["best"]["params"])
    checksum = float(sum(np.float64(np.abs(leaf).sum()) for leaf in jax.tree.leaves(params)))
    with open(out_path, "w") as f:
        json.dump(
            {
                "process": pid,
                "n_processes": jax.process_count(),
                "n_devices": jax.device_count(),
                "test_acc": result["test_acc"],
                "best_dev": result["best_dev_acc"],
                "param_checksum": checksum,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
