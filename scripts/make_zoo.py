"""Build a local pretrained-model zoo (offline honk-models equivalent).

The reference ecosystem ships trained ``.pt`` state dicts in the external
repo ``castorini/honk-models`` (SURVEY.md §2.1 #16); this machine has no
egress, so the zoo is built locally instead: train each requested
ConfigType on the synthetic corpus (or a real Speech Commands tree via
--data_dir), keep the best-dev model, and export it in BOTH formats —

    zoo/<model>.pt         honk-format torch state dict (loadable by the
                           reference AND by ``--type eval --input_file``)
    zoo/<model>/           orbax checkpoint ("best")
    zoo/MANIFEST.json      per-model test accuracy, param count, labels

Usage:
    python scripts/make_zoo.py zoo --models res8 res8-narrow cnn-trad-pool2
    python -m honk_tpu.cli.train --type eval --model res8 \
        --input_file zoo/res8.pt --data_dir data/speech_dataset
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_zoo(
    out_dir: str,
    models: list[str],
    data_dir: str,
    n_epochs: int,
    batch_size: int,
    seed: int = 0,
    compute_dtype: str = "bfloat16",
    lr: tuple[float, ...] | None = None,
    schedule: tuple[int, ...] | None = None,
    steps_per_call: int | None = None,
    hard: bool = False,
    dev_pct: float = 10.0,
    test_pct: float = 10.0,
) -> dict:
    import jax

    # Persistent compile cache: zoo builds re-run the same train/eval
    # programs across models and rounds; cold loads over the TPU tunnel
    # cost minutes each (see tests/conftest.py for the test-side cache).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from honk_tpu.ckpt import Checkpointer
    from honk_tpu.config import DataConfig, ExperimentConfig, TrainConfig  # noqa: F401
    from honk_tpu.data import generate_dataset, load_speech_commands
    from honk_tpu.models import flax_to_torch_state_dict
    from honk_tpu.train import train

    if not os.path.isdir(os.path.join(data_dir, "yes")):
        if hard:
            from honk_tpu.data import generate_hard_dataset

            generate_hard_dataset(data_dir)
        else:
            generate_dataset(data_dir)
    # Non-default split pcts build a measurement-grade zoo: e.g. the hard_v2
    # parity instrument uses 30/10/60 train/dev/test so TEST is large enough
    # (SE <= 0.45%) to resolve sub-percent model differences while train
    # stays in the data-limited regime where capacity ordering is decisive.
    dataset = load_speech_commands(data_dir, dev_pct=dev_pct, test_pct=test_pct)
    os.makedirs(out_dir, exist_ok=True)

    # Corpus provenance: prefer the generator recipe (CORPUS.json, written
    # by generate_hard_dataset / scripts/make_corpus.py) over a volatile
    # absolute path — /tmp paths do not survive reboots on this box.
    corpus_recipe = None
    recipe_path = os.path.join(data_dir, "CORPUS.json")
    if os.path.isfile(recipe_path):
        with open(recipe_path) as f:
            corpus_recipe = json.load(f)
    split_sizes = {
        "train": len(dataset.train),
        "dev": len(dataset.dev),
        "test": len(dataset.test),
    }

    # Merge into an existing manifest so the zoo can be built incrementally
    # (e.g. res models with the reference lr ladder, CNNs with a gentler lr).
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        # Refuse to silently mix label sets: a rebuild into an existing zoo
        # with a different corpus must either match or start fresh.
        assert manifest["n_labels"] == dataset.n_labels and manifest["labels"] == list(
            dataset.label_names
        ), (
            f"existing manifest labels {manifest['labels']} != corpus labels "
            f"{list(dataset.label_names)}; use a fresh out_dir"
        )
        manifest["corpus"] = data_dir
        manifest["corpus_recipe"] = corpus_recipe
        manifest["split_sizes"] = split_sizes
    else:
        manifest = {
            "corpus": data_dir,
            "corpus_recipe": corpus_recipe,
            "split_sizes": split_sizes,
            "n_labels": dataset.n_labels,
            "labels": list(dataset.label_names),
            "models": {},
        }
    for name in models:
        tkw = dict(
            model=name,
            n_epochs=n_epochs,
            batch_size=batch_size,
            seed=seed,
            compute_dtype=compute_dtype,
        )
        # Reference recipe (lr ladder) by default; overridable for small
        # corpora / CNN variants that want a gentler constant lr.
        if lr is not None:
            tkw["lr"] = tuple(lr)
        if schedule is not None:
            tkw["schedule"] = tuple(schedule)
        if steps_per_call is not None:
            tkw["steps_per_call"] = steps_per_call
        cfg = ExperimentConfig(
            data=DataConfig(data_dir=data_dir, seed=seed, dev_pct=dev_pct, test_pct=test_pct),
            train=TrainConfig(**tkw),
        )
        result = train(cfg, dataset=dataset)
        best = result["best"]

        ck = Checkpointer(os.path.join(out_dir, name))
        ck.save("best", best, wait=True)

        import torch

        sd = flax_to_torch_state_dict(best)
        torch.save(sd, os.path.join(out_dir, f"{name}.pt"))

        n_params = sum(int(np.asarray(p).size) for p in jax.tree.leaves(best["params"]))
        manifest["models"][name] = {
            "pt": f"{name}.pt",
            "orbax": f"{name}/",
            "test_acc": round(float(result["test_acc"]), 4),
            "best_dev_acc": round(float(result["best_dev_acc"]), 4),
            "n_params": n_params,
            "recipe": {
                "n_epochs": n_epochs,
                "batch_size": batch_size,
                "seed": seed,
                "compute_dtype": compute_dtype,
                "lr": list(lr) if lr is not None else list(TrainConfig().lr),
                "schedule": list(schedule) if schedule is not None else list(TrainConfig().schedule),
                "dev_pct": dev_pct,
                "test_pct": test_pct,
                "n_test_clips": len(dataset.test),
            },
        }
        print(f"zoo: {name} test_acc={result['test_acc']:.4f} params={n_params}", flush=True)

    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")
    return manifest


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir")
    p.add_argument("--models", nargs="+", default=["res8", "res8-narrow", "cnn-trad-pool2"])
    p.add_argument("--data_dir", default="data/speech_dataset")
    p.add_argument("--n_epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"], default="bfloat16")
    p.add_argument("--lr", type=float, nargs="+", default=None)
    p.add_argument("--schedule", type=int, nargs="*", default=None)
    p.add_argument("--steps_per_call", type=int, default=None)
    p.add_argument("--hard", action="store_true",
                   help="generate a hard-mode corpus if data_dir is missing")
    p.add_argument("--dev_pct", type=float, default=10.0)
    p.add_argument("--test_pct", type=float, default=10.0)
    args = p.parse_args(argv)
    build_zoo(
        args.out_dir, args.models, args.data_dir,
        args.n_epochs, args.batch_size, args.seed, args.compute_dtype,
        lr=tuple(args.lr) if args.lr is not None else None,
        schedule=tuple(args.schedule) if args.schedule is not None else None,
        steps_per_call=args.steps_per_call,
        hard=args.hard,
        dev_pct=args.dev_pct,
        test_pct=args.test_pct,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
