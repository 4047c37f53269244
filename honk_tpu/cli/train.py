"""Training/eval CLI mirroring the reference's flag interface.

Reference: ``python -m utils.train --type {train,eval} --model res8 ...``
(utils/train.py::main + ConfigBuilder). Here:

    python -m honk_tpu.cli.train --type train --model res8 \
        --data_dir data/speech_dataset --n_epochs 26 \
        --lr 0.1 0.01 0.001 --schedule 3000 6000 --output_dir ckpts/res8

Multi-host launch adds --coordinator/--process-id/--num-processes
(one process per host; see honk_tpu/parallel/runtime.py).
"""

from __future__ import annotations

import argparse
import dataclasses

from ..config import DataConfig, ExperimentConfig, MeshConfig, TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="honk_tpu.train", description=__doc__)
    p.add_argument("--type", choices=["train", "eval"], default="train")
    d, t = DataConfig(), TrainConfig()
    p.add_argument("--data_dir", default=d.data_dir)
    p.add_argument("--wanted_words", nargs="+", default=list(d.wanted_words))
    p.add_argument("--unknown_prob", type=float, default=d.unknown_prob)
    p.add_argument("--silence_prob", type=float, default=d.silence_prob)
    p.add_argument("--noise_prob", type=float, default=d.noise_prob)
    p.add_argument("--timeshift_ms", type=float, default=d.timeshift_ms)
    p.add_argument("--dev_pct", type=float, default=d.dev_pct,
                   help="SHA1-bucket validation percentage (TF Speech Commands convention)")
    p.add_argument("--test_pct", type=float, default=d.test_pct,
                   help="SHA1-bucket test percentage")
    p.add_argument("--model", default=t.model)
    p.add_argument("--batch_size", type=int, default=t.batch_size)
    p.add_argument("--n_epochs", type=int, default=t.n_epochs)
    p.add_argument("--lr", type=float, nargs="+", default=list(t.lr))
    p.add_argument("--schedule", type=int, nargs="*", default=list(t.schedule))
    p.add_argument("--momentum", type=float, default=t.momentum)
    p.add_argument("--weight_decay", type=float, default=t.weight_decay)
    p.add_argument("--use_nesterov", action="store_true")
    p.add_argument("--dev_every", type=int, default=t.dev_every)
    p.add_argument("--seed", type=int, default=t.seed)
    p.add_argument("--eval_batch_size", type=int, default=t.eval_batch_size)
    p.add_argument(
        "--compute_dtype", choices=["bfloat16", "float32"], default=t.compute_dtype,
        help="activation dtype for training compute (float32 = strict parity mode)",
    )
    p.add_argument(
        "--steps_per_call", type=int, default=t.steps_per_call,
        help="train steps folded into one compiled dispatch (1 disables)",
    )
    p.add_argument("--input_file", default="", help="warm-start/eval checkpoint (orbax dir or honk .pt)")
    p.add_argument("--output_dir", default="ckpts/run", help="checkpoint directory")
    p.add_argument("--metrics_jsonl", default="", help="JSONL metrics sink path")
    p.add_argument(
        "--save_every_epochs", type=int, default=5,
        help="epochs between periodic step checkpoints (crash recovery)",
    )
    p.add_argument(
        "--profile-dir", default="",
        help="capture a jax.profiler trace of the first train dispatch here",
    )
    p.add_argument("--synthetic", action="store_true", help="generate a synthetic dataset into data_dir first (no-network dev)")
    # multi-host
    p.add_argument("--coordinator", default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--n_devices", type=int, default=0)
    return p


def args_to_config(args: argparse.Namespace) -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(
            data_dir=args.data_dir,
            wanted_words=tuple(args.wanted_words),
            unknown_prob=args.unknown_prob,
            silence_prob=args.silence_prob,
            noise_prob=args.noise_prob,
            timeshift_ms=args.timeshift_ms,
            dev_pct=args.dev_pct,
            test_pct=args.test_pct,
            seed=args.seed,
        ),
        train=TrainConfig(
            model=args.model,
            batch_size=args.batch_size,
            n_epochs=args.n_epochs,
            lr=tuple(args.lr),
            schedule=tuple(args.schedule),
            momentum=args.momentum,
            weight_decay=args.weight_decay,
            use_nesterov=args.use_nesterov,
            dev_every=args.dev_every,
            seed=args.seed,
            eval_batch_size=args.eval_batch_size,
            compute_dtype=args.compute_dtype,
            steps_per_call=args.steps_per_call,
            input_file=args.input_file,
            output_file=args.output_dir,
        ),
        mesh=MeshConfig(n_devices=args.n_devices),
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ..parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    if args.synthetic:
        import os

        from ..data import generate_dataset

        if not os.path.isdir(os.path.join(args.data_dir, "yes")):
            generate_dataset(args.data_dir)

    cfg = args_to_config(args)
    from ..metrics import MetricsLogger

    logger = MetricsLogger(args.metrics_jsonl or None)

    if args.type == "train":
        from ..ckpt import Checkpointer
        from ..train import train

        result = train(
            cfg,
            logger=logger,
            checkpoint_dir=args.output_dir,
            save_every_epochs=args.save_every_epochs,
            profile_dir=args.profile_dir or None,
        )
        import jax

        if jax.process_index() == 0:  # host-0 writes (shared-fs pod layout)
            ck = Checkpointer(args.output_dir)
            ck.save_best(result["best"])
            ck.save_step(int(result["state"].step), {
                "params": result["state"].params,
                "batch_stats": result["state"].batch_stats,
            })
            ck.wait_until_finished()  # saves are async; fence before process exit
        return 0

    # eval path
    from ..train import evaluate

    variables = _load_variables(args.input_file)
    evaluate(cfg, variables)
    return 0


def _load_variables(path: str):
    if path.endswith(".pt"):
        from ..models import load_honk_checkpoint

        return load_honk_checkpoint(path)
    from ..ckpt import Checkpointer

    import os

    ck = Checkpointer(path if os.path.isdir(path) else os.path.dirname(path) or ".")
    name = "best" if ck.has("best") else os.path.basename(path)
    return ck.restore(name)


if __name__ == "__main__":
    raise SystemExit(main())
