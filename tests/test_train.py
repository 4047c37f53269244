"""End-to-end training tests (SURVEY.md §4.6): overfit a tiny synthetic set.

The minimum end-to-end slice (SURVEY.md §7.3): synthetic dataset ->
on-device augmentation -> MFCC frontend -> model -> jit-ed SGD train step.
cnn-trad-pool2 (no BatchNorm: eval matches train behavior immediately)
must overfit far beyond chance; res8-narrow must show learning progress
(its affine-free BN running stats need thousands of steps to converge,
so its eval accuracy is only sanity-checked).
"""

import numpy as np
import pytest

from honk_tpu import data as D
from honk_tpu.config import DataConfig, ExperimentConfig, TrainConfig
from honk_tpu.metrics import MetricsLogger
from honk_tpu.train import train


@pytest.fixture(scope="module")
def small_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sc"))
    D.generate_dataset(root, clips_per_word=12, n_speakers=4, noise_seconds=4)
    return root


def test_overfit_smoke_cnn(small_root, capsys):
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=small_root, noise_prob=0.1, timeshift_ms=40),
        train=TrainConfig(
            model="cnn-trad-pool2",
            batch_size=32,
            n_epochs=6,
            lr=(0.003,),
            schedule=(),
            dev_every=2,
            eval_batch_size=64,
            # f32 on CPU: emulated-bf16 training at this lr is marginal and
            # XLA:CPU's threaded reductions are run-order nondeterministic,
            # so the bf16 run occasionally diverges under load. bf16 is a
            # TPU perf feature; CPU tests validate recipe semantics.
            compute_dtype="float32",
        ),
    )
    result = train(cfg, logger=MetricsLogger())
    out = capsys.readouterr().out
    assert "final test accuracy:" in out  # reference-parity output line
    # Separable synthetic classes; chance is ~1/12.
    assert result["best_dev_acc"] > 0.5, f"dev acc {result['best_dev_acc']}"
    assert result["test_acc"] > 0.4, f"test acc {result['test_acc']}"


def test_res8_narrow_learns(small_root):
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=small_root, noise_prob=0.1, timeshift_ms=40),
        train=TrainConfig(
            model="res8-narrow",
            batch_size=32,
            n_epochs=6,
            lr=(0.05,),
            schedule=(),
            dev_every=6,
            eval_batch_size=64,
        ),
    )
    losses = []

    class CaptureLogger(MetricsLogger):
        def log(self, kind, **fields):
            if kind == "train_epoch":
                losses.append(fields["loss"])
            super().log(kind, **fields)

    result = train(cfg, logger=CaptureLogger())
    assert np.isfinite(result["test_acc"])
    # Loss must decrease substantially over training.
    assert losses[-1] < losses[0] * 0.8, f"no learning: {losses}"


def test_scan_steps_match_single_steps():
    """make_train_scan(N) must reproduce N make_train_step calls (same PRNG
    stream: the step folds the epoch key with state.step)."""
    import jax
    import jax.numpy as jnp

    from honk_tpu.data import AugmentConfig, prepare_train_arrays
    from honk_tpu.models import find_config, find_model
    from honk_tpu.train import create_train_state, make_optimizer
    from honk_tpu.train.steps import make_train_scan, make_train_step

    rng = np.random.default_rng(0)
    aug = AugmentConfig(n_silence=2)
    audio, noise = prepare_train_arrays(
        rng.integers(-3000, 3000, (16, 16000), dtype=np.int16),
        (rng.standard_normal(16000 * 2) * 0.05).astype(np.float32),
        aug,
    )
    labels = jnp.asarray(rng.integers(2, 12, (16,), dtype=np.int32))
    model = find_model("res8-narrow")(config=find_config("res8-narrow"))
    tx = make_optimizer(lrs=(0.01,), boundaries=())
    key = jax.random.PRNGKey(5)

    step = make_train_step(model, tx, 8, aug, donate=False)
    s1 = create_train_state(model, tx, jax.random.PRNGKey(0))
    step_losses = []
    for _ in range(3):
        s1, m1 = step(s1, key, audio, labels, noise)
        step_losses.append(float(m1["loss"]))

    scan = make_train_scan(model, tx, 8, aug, 3, donate=False)
    s2 = create_train_state(model, tx, jax.random.PRNGKey(0))
    s2, m2 = scan(s2, key, audio, labels, noise)

    assert int(s1.step) == int(s2.step) == 3
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # scan reports the mean over its N steps
    np.testing.assert_allclose(float(np.mean(step_losses)), float(m2["loss"]), rtol=1e-5)


@pytest.mark.slow
def test_full_recipe_converges(tmp_path):
    """Scaled-down regression of the committed real-TPU run
    (runs/res8_full_recipe_tpu.jsonl, final test accuracy 1.0): the COMPLETE
    reference recipe semantics — lr ladder stepped on global steps, SGD
    momentum 0.9 + wd 1e-5, noise/silence/unknown augmentation defaults,
    dev-every/best-dev retention — must converge on a separable corpus."""
    root = str(tmp_path / "sc")
    D.generate_dataset(root, clips_per_word=40, n_speakers=8, noise_seconds=8)
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=root),
        train=TrainConfig(
            model="res8",
            batch_size=64,
            n_epochs=14,
            lr=(0.1, 0.01, 0.001),
            schedule=(70, 100),
            dev_every=2,
            eval_batch_size=128,
        ),
    )
    result = train(cfg, logger=MetricsLogger())
    assert result["test_acc"] >= 0.9, f"test acc {result['test_acc']}"


def test_profile_dir_captures_trace(small_root, tmp_path):
    """--profile-dir plumbing (SURVEY.md §5.1): the first train dispatch
    runs under jax.profiler.trace and must produce trace artifacts."""
    import glob

    prof = str(tmp_path / "trace")
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=small_root, noise_prob=0.1, timeshift_ms=40),
        train=TrainConfig(
            model="cnn-trad-pool2",
            batch_size=16,
            n_epochs=1,
            lr=(0.01,),
            schedule=(),
            dev_every=1,
            eval_batch_size=32,
        ),
    )
    train(cfg, logger=MetricsLogger(), profile_dir=prof)
    files = glob.glob(prof + "/**/*", recursive=True)
    assert files, "jax.profiler trace produced no artifacts"


@pytest.mark.slow
def test_hard_recipe_band_and_capacity_ordering(tmp_path):
    """Recipe-dynamics regression (VERDICT r2 #1): on the HARD synthetic
    corpus the reference recipe must land res8 in a mid-accuracy band —
    not saturate at 1.0 (which hides schedule/BN/weight-decay bugs) and
    not collapse — and res8 must beat res8-narrow by a clear margin at
    this data scale (capacity binds when data is scarce; CPU-calibrated:
    res8 ~0.72, narrow ~0.59). The FULL-SCALE +-3% accuracy gate lives in
    test_zoo.py::test_committed_zoo_hard_v2_accuracy_band against the
    committed zoo_hard_v2 artifacts (train-scarce 10/10/80 split, TEST
    n=9559, pairwise McNemar ordering resolved at >=2 SE)."""
    import math

    from honk_tpu import data as D

    root = str(tmp_path / "hard")
    # (n_speakers=20, seed=0) gives balanced 80/10/10 speaker buckets.
    D.generate_hard_dataset(root, clips_per_word=120, n_speakers=20, seed=0)
    ds = D.load_speech_commands(root)
    assert min(len(ds.dev), len(ds.test)) >= 100  # balanced buckets sanity

    spe = math.ceil((len(ds.train) + int(0.1 * len(ds.train))) / 64)
    total = spe * 8
    accs = {}
    for model in ("res8", "res8-narrow"):
        cfg = ExperimentConfig(
            data=DataConfig(data_dir=root),
            train=TrainConfig(
                model=model, batch_size=64, n_epochs=8,
                lr=(0.1, 0.01, 0.001), schedule=(total // 3, 2 * total // 3),
                dev_every=2, eval_batch_size=256, steps_per_call=spe,
            ),
        )
        accs[model] = train(cfg, dataset=ds, logger=MetricsLogger())["test_acc"]

    # CPU-calibrated band around the measured ~0.72 (was 0.55-0.95; a 2%
    # recipe bug passed the old band — r3 VERDICT Weak #1).
    assert 0.62 <= accs["res8"] <= 0.82, accs
    assert accs["res8-narrow"] >= 0.3, accs  # narrow still far above chance (1/12)
    assert accs["res8"] >= accs["res8-narrow"] + 0.05, accs  # capacity ordering
