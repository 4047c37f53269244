"""Cross-runtime accuracy equality (SURVEY.md §4.3, hardening the 0.3%
parity gate of BASELINE.json:5 without reference artifacts).

A TRAINED model (not random weights — training bakes in real BN running
stats and non-symmetric params) must give the SAME test-set accuracy and
~identical logits through:
  (a) the jax eval path (production), and
  (b) the independent torch twin loaded via the flax->torch converter,
and must survive a flax -> honk .pt -> flax round trip bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu import data as D
from honk_tpu.config import DataConfig, ExperimentConfig, TrainConfig
from honk_tpu.frontend.mfcc import compute_mfccs
from honk_tpu.metrics import MetricsLogger
from honk_tpu.models import find_config, find_model
from honk_tpu.models.torch_compat import (
    build_torch_model,
    flax_to_torch_state_dict,
    load_honk_checkpoint,
)
from honk_tpu.train import make_eval_sweep, train

MODEL = "res8-narrow"


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sc"))
    D.generate_dataset(root, clips_per_word=10, n_speakers=4, noise_seconds=4)
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=root, noise_prob=0.1, timeshift_ms=40),
        train=TrainConfig(
            model=MODEL,
            batch_size=32,
            n_epochs=3,
            lr=(0.05,),
            schedule=(),
            dev_every=3,
            eval_batch_size=64,
        ),
    )
    result = train(cfg, logger=MetricsLogger())
    return result  # contains 'best' variables and 'dataset'


def _jax_eval(variables, split):
    model = find_model(MODEL)(config=dict(find_config(MODEL)), precision="highest")
    sweep = make_eval_sweep(model, batch_size=64)
    c, t = sweep(
        variables["params"], variables.get("batch_stats", {}),
        jnp.asarray(split.audio), jnp.asarray(split.labels),
    )
    return int(c), int(t)


def _torch_eval(variables, split):
    import torch

    tm = build_torch_model(MODEL)
    tm.load_state_dict(flax_to_torch_state_dict(variables))
    tm.eval()
    audio = jnp.asarray(split.audio).astype(jnp.float32) / 32768.0
    feats = np.asarray(compute_mfccs(audio))
    with torch.no_grad():
        logits = tm(torch.from_numpy(feats)).numpy()
    correct = int((logits.argmax(-1) == split.labels).sum())
    return correct, len(split), logits


def test_trained_model_accuracy_equal_across_runtimes(trained):
    variables = trained["best"]
    split = trained["dataset"].test
    jc, jt = _jax_eval(variables, split)
    tc, tt, t_logits = _torch_eval(variables, split)
    assert jt == tt == len(split)
    assert jc == tc, f"jax {jc}/{jt} vs torch {tc}/{tt}"

    # Logits themselves must agree closely (same features, same weights).
    model = find_model(MODEL)(config=dict(find_config(MODEL)), precision="highest")
    audio = jnp.asarray(split.audio).astype(jnp.float32) / 32768.0
    feats = compute_mfccs(audio)
    j_logits = np.asarray(model.apply(variables, feats, train=False))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4)


def test_trained_pt_round_trip(trained, tmp_path):
    """flax -> honk-format .pt -> flax must be lossless on a trained model."""
    import torch

    variables = trained["best"]
    pt = str(tmp_path / "model.pt")
    torch.save(flax_to_torch_state_dict(variables), pt)
    back = load_honk_checkpoint(pt)

    flat_a = {str(p): a for p, a in jax.tree_util.tree_leaves_with_path(variables)}
    flat_b = {str(p): b for p, b in jax.tree_util.tree_leaves_with_path(back)}
    assert flat_a.keys() == flat_b.keys()
    for p in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[p]), np.asarray(flat_b[p]), err_msg=p
        )

    split = trained["dataset"].test
    assert _jax_eval(back, split) == _jax_eval(variables, split)
