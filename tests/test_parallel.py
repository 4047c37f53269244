"""Distributed DP tests on the virtual 8-device CPU mesh (SURVEY.md §4.5).

Sharded-vs-single-device training must produce (tolerance-)equal params
after several steps: identical PRNG keys drive identical sampled batches,
so the only difference is where the per-example compute runs and the
XLA-inserted gradient all-reduce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu.data import AugmentConfig, prepare_train_arrays
from honk_tpu.models import find_config, find_model
from honk_tpu.parallel import make_data_mesh, replicate
from honk_tpu.train import create_train_state, make_optimizer, make_train_step


_AUG = AugmentConfig(n_silence=4)


def _setup(n_clips=64):
    rng = np.random.default_rng(0)
    audio, noise = prepare_train_arrays(
        rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16),
        (rng.standard_normal(16000 * 3) * 0.05).astype(np.float32),
        _AUG,
    )
    labels = jnp.asarray(rng.integers(2, 12, (n_clips,), dtype=np.int32))
    cfg = find_config("res8-narrow")
    model = find_model("res8-narrow")(config=cfg)
    tx = make_optimizer(lrs=(0.01,), boundaries=())
    return model, tx, audio, labels, noise


def _run(model, tx, audio, labels, noise, n_devices, data_axis, steps=2, batch=16):
    mesh = make_data_mesh(n_devices, "data")
    state = create_train_state(model, tx, jax.random.PRNGKey(0))
    state = replicate(mesh, state)
    audio_r, labels_r, noise_r = replicate(mesh, (audio, labels, noise))
    step = make_train_step(model, tx, batch, _AUG, donate=False, data_axis=data_axis)
    key = jax.random.PRNGKey(7)
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(steps):
            state, metrics = step(state, key, audio_r, labels_r, noise_r)
            losses.append(float(metrics["loss"]))
    return jax.device_get(state), losses


def test_dp_matches_single_device():
    model, tx, audio, labels, noise = _setup()
    s1, l1 = _run(model, tx, audio, labels, noise, 1, None)
    s8, l8 = _run(model, tx, audio, labels, noise, 8, "data")
    # Identical PRNG keys -> identical sampled batches; the first-step loss
    # must agree to float-reduction noise.
    np.testing.assert_allclose(l1[0], l8[0], rtol=1e-5)
    # Params after 2 steps: BN+ReLU amplify reassociation noise, so compare
    # with a noise-scale tolerance (semantic divergence would be >>1e-3).
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(a, b, atol=5e-4)
        assert np.max(np.abs(a - b)) < 1e-3


def test_batch_is_actually_sharded():
    """The sampled batch inside the step must be distributed: verify the
    jit-ed program's output shards land on all 8 devices when we surface
    the constrained batch."""
    from jax.sharding import PartitionSpec as P

    mesh = make_data_mesh(8, "data")

    @jax.jit
    def make_batch(x):
        y = x * 2.0
        return jax.lax.with_sharding_constraint(y, P("data"))

    with jax.set_mesh(mesh):
        out = make_batch(jnp.zeros((16, 100), jnp.float32))
        out.block_until_ready()
    devices = {s.device for s in out.addressable_shards}
    assert len(devices) == 8


def test_dp_eval_matches_single_device():
    """The production eval sweep (one compiled program, on-device
    correct/total accumulation) must give identical counts on a 1-device
    and an 8-device mesh — argmax counting is exact, so equality is
    bitwise, not tolerance-based."""
    from honk_tpu.train import make_eval_sweep

    rng = np.random.default_rng(3)
    n = 100  # deliberately not a multiple of batch or mesh size
    audio = jnp.asarray(rng.integers(-3000, 3000, (n, 16000), dtype=np.int16))
    labels = jnp.asarray(rng.integers(0, 12, (n,), dtype=np.int32))
    cfg = find_config("res8-narrow")
    model = find_model("res8-narrow")(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False
    )

    results = {}
    for n_dev, axis in ((1, None), (8, "data")):
        mesh = make_data_mesh(n_dev, "data")
        sweep = make_eval_sweep(model, batch_size=32, data_axis=axis)
        with jax.set_mesh(mesh):
            c, t = sweep(
                replicate(mesh, variables["params"]),
                replicate(mesh, variables.get("batch_stats", {})),
                replicate(mesh, audio),
                replicate(mesh, labels),
            )
        results[n_dev] = (int(c), int(t))
    assert results[1][1] == n  # tail mask: every real row counted once
    assert results[1] == results[8], results


def test_eval_metric_reduction_psum():
    """Eval correctness is a pure reduction; check an explicit shard_map
    psum path agrees with the direct computation."""
    from jax.sharding import PartitionSpec as P

    mesh = make_data_mesh(8, "data")
    x = jnp.arange(64, dtype=jnp.int32)

    def count_even(xs):
        local = jnp.sum((xs % 2 == 0).astype(jnp.int32))
        return jax.lax.psum(local, "data")

    total = jax.jit(
        jax.shard_map(count_even, mesh=mesh, in_specs=P("data"), out_specs=P())
    )(x)
    assert int(total) == 32


def test_dp_step_collective_bytes_match_param_count():
    """Quantified scaling evidence (SCALING.md): the compiled DP train step
    must contain exactly ONE fused gradient all-reduce whose payload is the
    model's parameter count (+2 metric scalars), plus only the small
    BatchNorm statistics all-reduces (which make BN GLOBAL-batch under DP).
    Anything else appearing here (e.g. a param all-gather per step) would
    invalidate the scaling projection."""
    import re

    model, tx, audio, labels, noise = _setup()
    mesh = make_data_mesh(8, "data")
    state = create_train_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, 16, _AUG, donate=False, data_axis="data")
    with jax.set_mesh(mesh):
        state_r = replicate(mesh, state)
        args_r = replicate(mesh, (audio, labels, noise))
        txt = step.lower(state_r, jax.random.PRNGKey(1), *args_r).compile().as_text()

    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}
    payloads = []
    for line in txt.splitlines():
        m = re.match(r"\s*%\S+ = (.*?) all-reduce(?:-start)?\(", line)
        if not m:
            continue
        b = 0
        for dt, dims in re.findall(r"(f32|bf16|s32|u32|pred)\[([0-9,]*)\]", m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b += n * dt_bytes[dt]
        payloads.append(b)

    n_params = sum(int(np.asarray(p).size) for p in jax.tree.leaves(state.params))
    grad_bytes = n_params * 4 + 8  # grads + loss/acc scalars fused in
    assert grad_bytes in payloads, (payloads, grad_bytes)
    # Everything else must be BN statistics: res8-narrow has 6 BN layers,
    # each contributing (mean, meansq) forward + a backward pair of the
    # same shape -> all tiny relative to the gradient payload.
    rest = sorted(p for p in payloads if p != grad_bytes)
    assert sum(rest) < 0.05 * grad_bytes, rest
    total = sum(payloads)
    # The total per-step collective payload is what SCALING.md's 2-host
    # projection uses: params + <5% overhead.
    assert total < 1.05 * grad_bytes


def test_cross_topology_checkpoint_resume(tmp_path):
    """VERDICT r4 #8: a checkpoint written by a single-device run must
    resume onto an 8-device mesh (and the reverse) and CONTINUE training —
    exactly what a real multi-host deployment does first. Checkpoints
    store host arrays (device_get at save), so they are topology-free;
    this pins that property end to end through train()'s resume path."""
    from honk_tpu import data as D
    from honk_tpu.config import DataConfig, ExperimentConfig, MeshConfig, TrainConfig

    from honk_tpu.train import train

    root = str(tmp_path / "sc")
    D.generate_dataset(root, clips_per_word=6, n_speakers=3, noise_seconds=2)

    def cfg(n_devices, n_epochs):
        return ExperimentConfig(
            data=DataConfig(data_dir=root, noise_prob=0.1),
            train=TrainConfig(
                model="res8-narrow", batch_size=16, n_epochs=n_epochs,
                lr=(0.01,), schedule=(), dev_every=2, eval_batch_size=32,
            ),
            mesh=MeshConfig(n_devices=n_devices),
        )

    # 1 device -> 8 devices
    ck1 = str(tmp_path / "ck1")
    r1 = train(cfg(1, 2), checkpoint_dir=ck1, save_every_epochs=1)
    step_1dev = int(r1["state"].step)
    r2 = train(cfg(8, 4), checkpoint_dir=ck1, save_every_epochs=10)
    assert int(r2["state"].step) > step_1dev  # continued
    assert int(r2["state"].step) < 2 * step_1dev + 4  # did NOT redo epochs 0-1
    # The resumed state really trained under the 8-device mesh and the
    # final eval ran; params are finite.
    assert np.isfinite(r2["test_acc"])
    for leaf in jax.tree.leaves(r2["state"].params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # 8 devices -> 1 device
    ck2 = str(tmp_path / "ck2")
    r3 = train(cfg(8, 2), checkpoint_dir=ck2, save_every_epochs=1)
    step_8dev = int(r3["state"].step)
    r4 = train(cfg(1, 4), checkpoint_dir=ck2, save_every_epochs=10)
    assert int(r4["state"].step) > step_8dev
    assert int(r4["state"].step) < 2 * step_8dev + 4
    assert np.isfinite(r4["test_acc"])

    # Same data, same seeds, same total epochs: the two topology paths
    # land within float-reduction noise of each other (the mesh only
    # changes where per-example compute runs and the all-reduce order).
    np.testing.assert_allclose(
        np.asarray(r2["state"].step), np.asarray(r4["state"].step)
    )
    for a, b in zip(jax.tree.leaves(r2["state"].params), jax.tree.leaves(r4["state"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)
