"""Difficulty-tuning probe for the hard-mode corpus (VERDICT r2 #1).

Trains res8 (and optionally res8-narrow) for a few epochs on several
hard-corpus variants IN ONE PROCESS, reusing one set of compiled/loaded
programs across variants (all variants share shapes because the file
layout depends only on seed/counts, not on the signal knobs). This makes
knob tuning tractable over the TPU tunnel, where per-program load costs
minutes.

    python scripts/hard_probe.py --epochs 8 \
        --variants '[{"snr_db":[0,12],"speaker_spread":0.15,"formant_jitter":0.035}]'

Prints one JSON line per (variant, model, epoch) with train loss/acc and
dev acc, plus a summary line per variant.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--clips_per_word", type=int, default=800)
    p.add_argument("--n_speakers", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--models", nargs="+", default=["res8"])
    p.add_argument("--lr", type=float, nargs="+", default=[0.1, 0.01, 0.001])
    p.add_argument("--schedule", type=int, nargs="*", default=None,
                   help="lr boundaries in steps; default = 1/3 and 2/3 of the run")
    p.add_argument("--variants", default='[{}]',
                   help="JSON list of generate_hard_dataset knob dicts")
    p.add_argument("--root", default="/tmp/hard_probe")
    args = p.parse_args(argv)
    variants = json.loads(args.variants)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from honk_tpu.data import (
        AugmentConfig, generate_hard_dataset, load_speech_commands, prepare_train_arrays,
    )
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer
    from honk_tpu.train.steps import make_eval_sweep, make_train_scan

    # Build per-model machinery ONCE; reuse across variants (same shapes).
    machinery = {}

    for vi, knobs in enumerate(variants):
        root = f"{args.root}_{vi}"
        if not os.path.isdir(os.path.join(root, "yes")):
            t0 = time.time()
            generate_hard_dataset(
                root,
                clips_per_word=args.clips_per_word,
                n_speakers=args.n_speakers,
                seed=args.seed,
                **{k: tuple(v) if isinstance(v, list) else v for k, v in knobs.items()},
            )
            print(json.dumps({"variant": vi, "generated_s": round(time.time() - t0, 1)}), flush=True)
        ds = load_speech_commands(root)
        n_train = len(ds.train)
        n_sil = int(0.1 * n_train)
        aug = AugmentConfig(n_silence=n_sil)
        steps_per_epoch = max(1, math.ceil((n_train + n_sil) / args.batch))
        total_steps = steps_per_epoch * args.epochs
        schedule = tuple(args.schedule) if args.schedule is not None else (
            total_steps // 3, 2 * total_steps // 3,
        )
        audio_pad, noise_win = prepare_train_arrays(ds.train.audio, ds.noise, aug)
        audio_d = jnp.asarray(audio_pad)
        labels_d = jnp.asarray(ds.train.labels)
        noise_d = jnp.asarray(noise_win)
        dev_audio = jnp.asarray(ds.dev.audio)
        dev_labels = jnp.asarray(ds.dev.labels)

        for name in args.models:
            mk = (name, steps_per_epoch, schedule)
            if mk not in machinery:
                cfg = find_config(name)
                cfg["n_labels"] = ds.n_labels
                model = find_model(name)(config=cfg, dtype=jnp.bfloat16)
                tx = make_optimizer(lrs=tuple(args.lr), boundaries=schedule)
                scan = make_train_scan(model, tx, args.batch, aug, steps_per_epoch, donate=False)
                sweep = make_eval_sweep(model, 256)
                machinery[mk] = (model, tx, scan, sweep)
            model, tx, scan, sweep = machinery[mk]

            state = create_train_state(model, tx, jax.random.PRNGKey(args.seed))
            key = jax.random.PRNGKey(args.seed + 1)
            curve = []
            for epoch in range(args.epochs):
                t0 = time.time()
                key, sub = jax.random.split(key)
                state, m = scan(state, sub, audio_d, labels_d, noise_d)
                c, t = sweep(state.params, state.batch_stats, dev_audio, dev_labels)
                loss, acc, c_v, t_v = jax.device_get((m["loss"], m["acc"], c, t))
                dev = float(c_v) / max(float(t_v), 1)
                curve.append(dev)
                print(json.dumps({
                    "variant": vi, "model": name, "epoch": epoch,
                    "loss": round(float(loss), 4), "train_acc": round(float(acc), 4),
                    "dev_acc": round(dev, 4), "wall_s": round(time.time() - t0, 2),
                }), flush=True)
            print(json.dumps({
                "variant": vi, "model": name, "knobs": knobs,
                "dev_curve": [round(d, 4) for d in curve],
                "final_dev": round(curve[-1], 4), "best_dev": round(max(curve), 4),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
