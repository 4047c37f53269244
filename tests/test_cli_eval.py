"""CLI eval path tests: reference .pt import and orbax-best round trips.

The reference workflow is ``--type eval --input_file model.pt`` on a
checkpoint from castorini/honk-models; no real artifact is reachable
here, so one is synthesized with the in-repo torch twin and saved with
torch.save(state_dict) exactly like SerializableModule.save.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from honk_tpu import data as D
from honk_tpu.cli.train import main
from honk_tpu.models.torch_compat import build_torch_model


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sc"))
    D.generate_dataset(root, clips_per_word=6, n_speakers=3, noise_seconds=2)
    return root


def test_eval_from_honk_pt(corpus, tmp_path, capsys):
    tm = build_torch_model("res8-narrow")
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)

    rc = main([
        "--type", "eval", "--model", "res8-narrow",
        "--data_dir", corpus, "--input_file", pt, "--eval_batch_size", "32",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final test accuracy:" in out
    acc = float(out.rsplit("final test accuracy:", 1)[1].strip().split()[0])
    assert 0.0 <= acc <= 1.0 and np.isfinite(acc)
