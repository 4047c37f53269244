"""Host-side training and evaluation loops.

Equivalent of reference ``utils/train.py::train / evaluate`` (SURVEY.md
§3.1-3.2), with the TPU-native structure: packed corpus resident in HBM,
one jit-ed program per step (see steps.py), dev eval every ``dev_every``
epochs keeping the best-dev model, final test accuracy printed the same
way the reference does.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data import AugmentConfig, load_speech_commands
from ..data.dataset import PackedDataset, PackedSplit
from ..metrics import MetricsLogger
from ..models import find_config, find_model
from ..parallel import make_data_mesh, replicate, replicated
from .state import TrainState, create_train_state, make_optimizer
from .steps import make_eval_sweep, make_train_scan, make_train_step


def evaluate_split(eval_sweep, params, batch_stats, split: PackedSplit) -> float:
    """Deterministic accuracy over a packed split: ONE device dispatch.

    ``eval_sweep`` is from ``make_eval_sweep``; under an ambient mesh the
    sweep runs data-parallel with on-device correct/total accumulation.
    """
    audio = jnp.asarray(split.audio)
    labels = jnp.asarray(split.labels)
    correct, total = eval_sweep(params, batch_stats, audio, labels)
    return int(correct) / max(int(total), 1)


def train(
    cfg: ExperimentConfig,
    dataset: PackedDataset | None = None,
    logger: MetricsLogger | None = None,
    checkpoint_dir: str | None = None,
    save_every_epochs: int = 5,
    resume: bool = True,
    profile_dir: str | None = None,
) -> dict[str, Any]:
    """Full training run. Returns {'state', 'best_dev_acc', 'test_acc', 'model'}.

    With ``checkpoint_dir``: periodic step-indexed orbax checkpoints
    (params + optimizer state + step + epoch + best-dev bookkeeping) every
    ``save_every_epochs`` epochs, and resume-from-latest on restart —
    capability the reference lacks (SURVEY.md §5.3-5.4; a crash there
    loses the run except the last best-dev model).

    With ``profile_dir``: captures a jax.profiler trace (TensorBoard/
    Perfetto) of the first dispatch of the first epoch (SURVEY.md §5.1).
    """
    logger = logger or MetricsLogger()
    if dataset is None:
        dataset = load_speech_commands(
            cfg.data.data_dir,
            wanted_words=tuple(cfg.data.wanted_words),
            unknown_prob=cfg.data.unknown_prob,
            silence_prob=cfg.data.silence_prob,
            dev_pct=cfg.data.dev_pct,
            test_pct=cfg.data.test_pct,
            seed=cfg.data.seed,
        )

    model_cfg = find_config(cfg.train.model)
    model_cfg["n_labels"] = dataset.n_labels
    model = find_model(cfg.train.model)(
        config=model_cfg, dtype=jnp.dtype(cfg.train.compute_dtype)
    )

    tx = make_optimizer(
        lrs=tuple(cfg.train.lr),
        boundaries=tuple(cfg.train.schedule),
        momentum=cfg.train.momentum,
        weight_decay=cfg.train.weight_decay,
        nesterov=cfg.train.use_nesterov,
    )

    mesh = make_data_mesh(cfg.mesh.n_devices, cfg.mesh.data_axis)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(model, tx, rng)
    state = replicate(mesh, state)

    n_train = len(dataset.train)
    n_silence = int(cfg.data.silence_prob * n_train)
    aug = AugmentConfig(
        noise_prob=cfg.data.noise_prob,
        timeshift_samples=cfg.data.timeshift_samples,
        n_silence=n_silence,
    )

    # Device-resident packed corpus (replicated; gathers are local). The pool
    # is pre-padded and the noise pre-windowed once so the per-step batch
    # assembly is pure contiguous-slice gathers (data/augment.py).
    from ..data import prepare_train_arrays

    # Pallas assembly under a mesh: scalar draws are global (bitwise-equal
    # across mesh sizes), the DMA kernel runs per-shard via shard_map.
    audio_pad, noise_win = prepare_train_arrays(dataset.train.audio, dataset.noise, aug)
    audio_i16 = replicate(mesh, audio_pad)
    labels_arr = replicate(mesh, jnp.asarray(dataset.train.labels))
    noise = replicate(mesh, noise_win)
    train_step = make_train_step(
        model, tx, cfg.train.batch_size, aug, data_axis=cfg.mesh.data_axis
    )
    eval_sweep = make_eval_sweep(
        model, cfg.train.eval_batch_size, data_axis=cfg.mesh.data_axis
    )

    steps_per_epoch = max(1, math.ceil((n_train + n_silence) / cfg.train.batch_size))
    # One dispatch per chunk of steps (see make_train_scan): per-step host
    # round-trips otherwise dominate these small models. The epoch tail
    # (steps_per_epoch % chunk) gets its own compiled scan so no epoch ever
    # falls back to per-step dispatches.
    chunk = min(steps_per_epoch, max(1, cfg.train.steps_per_call))
    train_scan = (
        make_train_scan(
            model, tx, cfg.train.batch_size, aug, chunk, data_axis=cfg.mesh.data_axis
        )
        if chunk > 1
        else None
    )
    tail = steps_per_epoch % chunk if train_scan is not None else 0
    tail_scan = (
        make_train_scan(
            model, tx, cfg.train.batch_size, aug, tail, data_axis=cfg.mesh.data_axis
        )
        if tail > 1
        else None
    )
    key = jax.random.PRNGKey(cfg.train.seed + 1)

    # Device-resident eval splits: transferred ONCE (a per-eval host->device
    # copy of the dev split costs more than the eval itself over a tunnel).
    dev_audio = replicate(mesh, np.asarray(dataset.dev.audio))
    dev_labels = replicate(mesh, np.asarray(dataset.dev.labels))
    test_audio = replicate(mesh, np.asarray(dataset.test.audio))
    test_labels = replicate(mesh, np.asarray(dataset.test.labels))

    # Device-side best-dev retention: the comparison AND the param snapshot
    # happen on device (masked select), so improving epochs never stall the
    # host loop on a param fetch; the best model is fetched once at run end.
    @jax.jit
    def _update_best(best_dev_d, best_vars_d, correct, total, params, stats):
        dev_acc = correct.astype(jnp.float32) / jnp.maximum(total, 1).astype(jnp.float32)
        better = dev_acc > best_dev_d
        new_vars = jax.tree.map(
            lambda new, old: jnp.where(better, new, old),
            {"params": params, "batch_stats": stats},
            best_vars_d,
        )
        return jnp.where(better, dev_acc, best_dev_d), new_vars

    best_dev = -1.0
    # Host copies from the start: train_step donates state buffers, so any
    # live reference held across a step would be use-after-free.
    best = jax.device_get({"params": state.params, "batch_stats": state.batch_stats})
    start_epoch = 0

    ckpt = None
    if checkpoint_dir is not None:
        from ..ckpt import Checkpointer

        ckpt = Checkpointer(checkpoint_dir)
        if resume:
            template = {
                "state": state,
                "epoch": 0,
                "best_dev": -1.0,
                "best": best,
                "key": key,
            }
            restored = ckpt.restore_latest(template)
            if restored is not None:
                _, payload = restored
                state = jax.tree.map(jnp.asarray, payload["state"])
                start_epoch = int(payload["epoch"]) + 1
                best_dev = float(payload["best_dev"])
                best = payload["best"]
                key = jnp.asarray(payload["key"])
                logger.log("resume", epoch=start_epoch, step=int(state.step), best_dev=best_dev)

    best_dev_d = replicate(mesh, np.float32(best_dev))
    best_vars_d = replicate(mesh, best)

    def _save(epoch: int) -> None:
        # Multi-process runs: host 0 writes, everyone restores — requires a
        # shared filesystem (the standard pod setup). Params are replicated
        # so host 0's copy is THE state.
        if ckpt is None or jax.process_index() != 0:
            return
        ckpt.save_step(
            int(state.step),
            {
                "state": jax.device_get(state),
                "epoch": epoch,
                "best_dev": best_dev,
                "best": jax.device_get(best_vars_d),
                "key": jax.device_get(key),
            },
        )

    import time as _time

    def _dispatch(fn, *args):
        # First dispatch optionally runs under a jax.profiler trace
        # (blocked to completion so device activity lands in the capture).
        nonlocal profile_dir
        if profile_dir is not None:
            from ..metrics import trace_to

            with trace_to(profile_dir):
                out = fn(*args)
                jax.block_until_ready(out[1]["loss"])
            profile_dir = None
            return out
        return fn(*args)

    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, cfg.train.n_epochs):
            # Per-epoch metrics accumulate ON DEVICE (weighted by steps per
            # dispatch) and are fetched as two scalars at epoch end — per-item
            # float() fetches over a tunnel would otherwise dominate the step
            # compute for these small models.
            loss_sum = jnp.float32(0.0)
            acc_sum = jnp.float32(0.0)
            t0 = _time.perf_counter()
            done = 0
            while train_scan is not None and steps_per_epoch - done >= chunk:
                state, m = _dispatch(train_scan, state, key, audio_i16, labels_arr, noise)
                loss_sum = loss_sum + m["loss"] * chunk
                acc_sum = acc_sum + m["acc"] * chunk
                done += chunk
            if tail_scan is not None and steps_per_epoch - done == tail:
                state, m = _dispatch(tail_scan, state, key, audio_i16, labels_arr, noise)
                loss_sum = loss_sum + m["loss"] * tail
                acc_sum = acc_sum + m["acc"] * tail
                done += tail
            for _ in range(steps_per_epoch - done):
                state, m = _dispatch(train_step, state, key, audio_i16, labels_arr, noise)
                loss_sum = loss_sum + m["loss"]
                acc_sum = acc_sum + m["acc"]
            # Fence on the accumulated metrics before reading the clock
            # (device_get of chain-dependent scalars, not block_until_ready:
            # see bench.py on why). This fence makes audio_s_per_s a PURE
            # train-throughput number; the dev eval below is timed
            # separately and logged as eval_s so its share of wall time is
            # visible at real-corpus scale (it recompiles per split length
            # and grows with the dev split).
            loss_v, acc_v = jax.device_get((loss_sum, acc_sum))
            dt = _time.perf_counter() - t0
            do_dev = (epoch + 1) % cfg.train.dev_every == 0
            eval_s = 0.0
            if do_dev:
                t1 = _time.perf_counter()
                correct, total = eval_sweep(
                    state.params, state.batch_stats, dev_audio, dev_labels
                )
                best_dev_d, best_vars_d = _update_best(
                    best_dev_d, best_vars_d, correct, total,
                    state.params, state.batch_stats,
                )
                c_v, t_v = jax.device_get((correct, total))
                eval_s = _time.perf_counter() - t1
            audio_s = steps_per_epoch * cfg.train.batch_size  # 1 s utterances
            logger.log(
                "train_epoch",
                epoch=epoch,
                step=int(state.step),
                loss=float(loss_v) / steps_per_epoch,
                acc=float(acc_v) / steps_per_epoch,
                audio_s_per_s=round(audio_s / max(dt, 1e-9) / max(1, jax.device_count()), 1),
                **({"eval_s": round(eval_s, 4)} if do_dev else {}),
            )
            if do_dev:
                # f32 on both sides so host and device best-dev bookkeeping
                # can never disagree on a comparison.
                dev_acc = float(np.float32(int(c_v)) / np.float32(max(int(t_v), 1)))
                logger.log("dev_eval", epoch=epoch, dev_acc=dev_acc)
                best_dev = max(best_dev, dev_acc)
            if (epoch + 1) % save_every_epochs == 0:
                _save(epoch)

        best = jax.device_get(best_vars_d)

    if ckpt is not None:
        ckpt.wait_until_finished()  # saves are async; fence before returning
    with jax.set_mesh(mesh):
        correct, total = eval_sweep(
            best["params"], best["batch_stats"], test_audio, test_labels
        )
        test_acc = int(correct) / max(int(total), 1)
    # Reference prints exactly this phrase (utils/train.py::evaluate);
    # host-0 only under a multi-process runtime.
    logger.log("final", test_acc=test_acc)
    if jax.process_index() == 0:
        print(f"final test accuracy: {test_acc}")
    return {
        "state": state,
        "best": best,
        "best_dev_acc": best_dev,
        "test_acc": test_acc,
        "model": model,
        "dataset": dataset,
    }


def evaluate(cfg: ExperimentConfig, variables: dict[str, Any], dataset: PackedDataset | None = None) -> float:
    """Test-set accuracy for given weights (reference --type eval path)."""
    if dataset is None:
        # Same sampling knobs as train(): an eval with non-default
        # unknown/silence probabilities must score the same test-set
        # composition the training run reported (ADVICE r4).
        dataset = load_speech_commands(
            cfg.data.data_dir,
            wanted_words=tuple(cfg.data.wanted_words),
            unknown_prob=cfg.data.unknown_prob,
            silence_prob=cfg.data.silence_prob,
            dev_pct=cfg.data.dev_pct,
            test_pct=cfg.data.test_pct,
            seed=cfg.data.seed,
        )
    model_cfg = find_config(cfg.train.model)
    model_cfg["n_labels"] = dataset.n_labels
    model = find_model(cfg.train.model)(config=model_cfg, precision="highest")
    mesh = make_data_mesh(cfg.mesh.n_devices, cfg.mesh.data_axis)
    eval_sweep = make_eval_sweep(
        model, cfg.train.eval_batch_size, data_axis=cfg.mesh.data_axis
    )
    with jax.set_mesh(mesh):
        acc = evaluate_split(
            eval_sweep, variables["params"], variables.get("batch_stats", {}), dataset.test
        )
    if jax.process_index() == 0:
        print(f"final test accuracy: {acc}")
    return acc
