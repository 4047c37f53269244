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
