"""Pairwise statistical comparison of zoo models on the shared test split.

VERDICT r3 #1: marginal accuracies on a shared test set are the WRONG
instrument for model ranking — the binomial SEs of two models are not
independent (the models agree on most clips). The correct paired
instrument is McNemar's test on the per-clip correctness vectors:

    b = clips model A gets right and B wrong
    c = clips model B gets right and A wrong
    z = (b - c) / sqrt(b + c)

|z| >= 2 resolves the ordering at ~2 SE regardless of how large the
agreeing majority is. This script evaluates every model in a zoo
MANIFEST on the corpus test split, stores per-clip correctness vectors
(<zoo>/<model>_test_correct.npy), and writes marginal accuracy +- SE and
all pairwise McNemar stats into MANIFEST["ladder_stats"].

    python scripts/compare_zoo.py zoo_hard_v2 --data_dir data/hard_v2 \
        --dev_pct 10 --test_pct 80
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("zoo_dir")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--dev_pct", type=float, default=10.0)
    p.add_argument("--test_pct", type=float, default=10.0)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from honk_tpu.data import load_speech_commands
    from honk_tpu.models import find_config, find_model, load_honk_checkpoint
    from honk_tpu.train.steps import make_forward

    manifest_path = os.path.join(args.zoo_dir, "MANIFEST.json")
    with open(manifest_path) as f:
        manifest = json.load(f)

    ds = load_speech_commands(args.data_dir, dev_pct=args.dev_pct, test_pct=args.test_pct)
    audio = np.asarray(ds.test.audio)
    if audio.dtype == np.int16:  # packed corpus stores PCM16
        audio = audio.astype(np.float32) / 32768.0
    labels = np.asarray(ds.test.labels)
    n = len(labels)
    B = args.batch
    n_pad = -(-n // B) * B
    audio_pad = np.zeros((n_pad, audio.shape[1]), audio.dtype)
    audio_pad[:n] = audio

    correct = {}
    for name in manifest["models"]:
        cfg = find_config(name)
        cfg["n_labels"] = ds.n_labels
        # precision="highest" matches the recorded eval path (train/loop.py
        # evaluate): full-f32 matmuls for reproducible parity numbers.
        model = find_model(name)(config=cfg, precision="highest")
        variables = load_honk_checkpoint(os.path.join(args.zoo_dir, f"{name}.pt"))
        forward = jax.jit(make_forward(model))
        preds = np.empty((n_pad,), np.int32)
        for s in range(0, n_pad, B):
            logits = forward(
                variables["params"], variables.get("batch_stats", {}),
                jnp.asarray(audio_pad[s : s + B]),
            )
            preds[s : s + B] = np.asarray(jnp.argmax(logits, -1))
        vec = preds[:n] == labels
        correct[name] = vec
        np.save(os.path.join(args.zoo_dir, f"{name}_test_correct.npy"), vec)
        acc = float(vec.mean())
        se = float(np.sqrt(acc * (1 - acc) / n))
        manifest["models"][name]["test_acc_recheck"] = round(acc, 4)
        manifest["models"][name]["test_acc_se"] = round(se, 5)
        print(f"{name}: acc={acc:.4f} +- {se:.4f} (n={n})", flush=True)

    stats = {}
    for a, b_name in itertools.combinations(correct, 2):
        va, vb = correct[a], correct[b_name]
        b = int((va & ~vb).sum())  # a right, b wrong
        c = int((~va & vb).sum())  # b right, a wrong
        z = (b - c) / max(np.sqrt(b + c), 1e-9)
        key = f"{a}_vs_{b_name}"
        stats[key] = {
            "n_only_first_correct": b,
            "n_only_second_correct": c,
            "mcnemar_z": round(float(z), 2),
            # None on an exact tie — naming either side would record an
            # arbitrary ordering in the committed manifest.
            "winner": None if b == c else (a if z > 0 else b_name),
            "resolved_2se": bool(abs(z) >= 2.0),
        }
        print(f"{key}: b={b} c={c} z={z:+.2f} "
              f"{'RESOLVED' if abs(z) >= 2 else 'unresolved'}", flush=True)

    manifest["ladder_stats"] = {
        "n_test_clips": n,
        "method": "paired McNemar z on shared-test per-clip correctness; |z|>=2 ~ 2 SE",
        "pairwise": stats,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
