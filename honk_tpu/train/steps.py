"""Jit-ed train/eval steps: ONE compiled program per step.

TPU-first structure (SURVEY.md §3.1): the reference's hot loop crosses
Python<->C boundaries per batch (DataLoader workers, librosa, ATen);
here a single XLA program does batch sampling + augmentation + MFCC
frontend + forward + backward + SGD update on device. The only
host->device traffic per step is the scalar PRNG key — the packed corpus
lives in HBM for the whole run. Under a data mesh, the batch dimension is
sharded and XLA inserts the gradient all-reduce over ICI/DCN.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..data.augment import AugmentConfig, sample_train_batch
from ..frontend.mfcc import compute_mfccs
from .state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    batch_size: int,
    aug_cfg: AugmentConfig,
    donate: bool = True,
    data_axis: str | None = None,
    jit: bool = True,
):
    """Build the jit-ed train step.

    step(state, key, audio_pad_i16, labels, noise_windows) -> (state, metrics)

    ``audio_pad_i16`` / ``noise_windows`` are the load-time-prepared arrays
    from ``data.prepare_train_arrays`` (padded pool + overlapping noise
    windows) so batch assembly is contiguous-slice gathers only.

    With ``data_axis`` set (and an ambient mesh via ``jax.set_mesh``), the
    sampled batch is constrained to shard along that axis, making the
    forward/backward data-parallel; XLA inserts the gradient all-reduce
    because params stay replicated.
    """
    from jax.sharding import PartitionSpec as P

    def train_step(state: TrainState, key: jax.Array, audio_i16, labels_arr, noise):
        k_sample, k_dropout = jax.random.split(jax.random.fold_in(key, state.step))
        if audio_i16.shape[-1] == 128:  # sub-row packing -> fused Pallas assembly
            from ..ops.assemble_kernel import sample_train_batch_pallas

            audio, labels = sample_train_batch_pallas(
                k_sample, audio_i16, labels_arr, noise, batch_size, aug_cfg,
                interpret=jax.default_backend() != "tpu",
                data_axis=data_axis,
            )
        else:
            audio, labels = sample_train_batch(
                k_sample, audio_i16, labels_arr, noise, batch_size, aug_cfg
            )
        if data_axis is not None:
            audio = jax.lax.with_sharding_constraint(audio, P(data_axis))
            labels = jax.lax.with_sharding_constraint(labels, P(data_axis))
        # Training-grade frontend precision rides the same knob as the
        # model's compute dtype (strict f32 parity mode keeps HIGH passes).
        fast_frontend = getattr(model, "dtype", None) == jnp.bfloat16
        feats = compute_mfccs(audio, fast=fast_frontend)

        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables: dict[str, Any] = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                logits, mut = model.apply(
                    variables, feats, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k_dropout},
                )
                new_stats = mut["batch_stats"]
            else:
                logits = model.apply(variables, feats, train=True, rngs={"dropout": k_dropout})
                new_stats = state.batch_stats
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
        )
        return new_state, {"loss": loss, "acc": acc}

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_scan(
    model,
    tx: optax.GradientTransformation,
    batch_size: int,
    aug_cfg: AugmentConfig,
    n_steps: int,
    donate: bool = True,
    data_axis: str | None = None,
):
    """Build a jit-ed N-step training scan: ONE dispatch per N steps.

    Per-step host dispatch costs dominate small models (the step itself is
    ~8 ms at batch 1024 on v5e; a host round-trip per step can cost more
    than the step). lax.scan-ing the step inside one compiled program
    removes that entirely — the reference's per-batch Python loop has no
    analogue of this. PRNG semantics are IDENTICAL to calling the single
    step N times: the step folds the epoch key with state.step, which
    advances inside the scan.

    scan_fn(state, key, audio, labels, noise) -> (state, {loss, acc}),
    metrics averaged over the N steps.
    """
    step = make_train_step(
        model, tx, batch_size, aug_cfg, donate=False, data_axis=data_axis, jit=False
    )

    def scan_fn(state: TrainState, key: jax.Array, audio, labels, noise):
        def body(st, _):
            st, m = step(st, key, audio, labels, noise)
            return st, (m["loss"], m["acc"])

        state, (losses, accs) = jax.lax.scan(body, state, None, length=n_steps)
        return state, {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}

    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_eval_sweep(model, batch_size: int, data_axis: str | None = None):
    """Build ONE compiled program that evaluates a whole packed split.

    sweep(params, batch_stats, audio_i16, labels) -> (correct, total)
    device scalars. Scans ceil(n/B) fixed-size batches with device-side
    accumulation — no per-batch host round trip (the reference's eval
    DataLoader loop crosses the host per batch, SURVEY.md §3.2). With
    ``data_axis`` set and an ambient mesh, every batch shards across the
    mesh and XLA inserts the cross-device reduction for the accumulated
    correct/total counts (SURVEY.md §5.8: eval metric reduction via psum).
    Compiles once per split length.
    """
    from jax.sharding import PartitionSpec as P

    def sweep(params, batch_stats, audio_i16, labels):
        n = audio_i16.shape[0]
        n_batches = -(-n // batch_size)
        variables: dict[str, Any] = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def body(carry, b):
            correct, total = carry
            idx = b * batch_size + jnp.arange(batch_size)
            valid = idx < n
            safe = jnp.where(valid, idx, 0)
            audio = audio_i16[safe].astype(jnp.float32) / 32768.0
            lab = labels[safe]
            if data_axis is not None:
                audio = jax.lax.with_sharding_constraint(audio, P(data_axis))
                lab = jax.lax.with_sharding_constraint(lab, P(data_axis))
                valid = jax.lax.with_sharding_constraint(valid, P(data_axis))
            feats = compute_mfccs(audio)
            logits = model.apply(variables, feats, train=False)
            hit = (jnp.argmax(logits, axis=-1) == lab) & valid
            return (
                correct + jnp.sum(hit.astype(jnp.int32)),
                total + jnp.sum(valid.astype(jnp.int32)),
            ), None

        (correct, total), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0)), jnp.arange(n_batches)
        )
        return correct, total

    return jax.jit(sweep)


def make_eval_step(model):
    """Build the jit-ed eval step over raw audio batches.

    eval_step(params, batch_stats, audio_f32, labels, valid)
      -> (n_correct, n_valid) device scalars
    """

    def eval_step(params, batch_stats, audio, labels, valid):
        feats = compute_mfccs(audio)
        variables: dict[str, Any] = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, feats, train=False)
        correct = (jnp.argmax(logits, axis=-1) == labels) & valid
        return jnp.sum(correct.astype(jnp.int32)), jnp.sum(valid.astype(jnp.int32))

    return jax.jit(eval_step)


def make_forward(model):
    """Jit-ed raw-audio -> logits forward (serving / streaming / bench)."""

    fast_frontend = getattr(model, "dtype", None) == jnp.bfloat16

    @jax.jit
    def forward(params, batch_stats, audio):
        feats = compute_mfccs(audio, fast=fast_frontend)
        variables: dict[str, Any] = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, feats, train=False)

    return forward
