"""Model-zoo builder tests (SURVEY.md §2.1 #16).

The reference's pretrained zoo is the external ``castorini/honk-models``
repo of torch state dicts; with zero egress the equivalent capability is
``scripts/make_zoo.py``: train locally, export honk-format ``.pt`` +
orbax + manifest, and evaluate through the same ``--type eval
--input_file model.pt`` path a reference user would use.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from honk_tpu import data as D


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zoo_sc"))
    D.generate_dataset(root, clips_per_word=12, n_speakers=4, noise_seconds=4)
    return root


@pytest.mark.slow  # ~112 s end-to-end training on the 2-core box; the
# fast lane keeps .pt-eval coverage via test_cli_eval's synthesized path.
def test_make_zoo_and_eval_pt(corpus, tmp_path, capsys):
    from make_zoo import build_zoo

    out = str(tmp_path / "zoo")
    # f32 compute: emulated-bf16 CNN training on XLA:CPU occasionally
    # diverges at this lr under load (threaded-reduction nondeterminism).
    manifest = build_zoo(
        out, ["cnn-trad-pool2"], corpus, n_epochs=4, batch_size=32, seed=0,
        compute_dtype="float32", lr=(0.003,), schedule=(),
    )
    entry = manifest["models"]["cnn-trad-pool2"]
    assert os.path.isfile(os.path.join(out, entry["pt"]))
    assert os.path.isfile(os.path.join(out, "MANIFEST.json"))
    with open(os.path.join(out, "MANIFEST.json")) as f:
        assert json.load(f)["models"]["cnn-trad-pool2"]["n_params"] == entry["n_params"]
    # Separable synthetic classes: far beyond 1/12 chance.
    assert entry["test_acc"] > 0.3, entry

    # The zoo .pt must ride the reference-style eval path end to end.
    from honk_tpu.cli.train import main as cli_main

    rc = cli_main([
        "--type", "eval",
        "--model", "cnn-trad-pool2",
        "--data_dir", corpus,
        "--input_file", os.path.join(out, entry["pt"]),
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if "final test accuracy:" in l]
    assert line, "eval CLI must print the reference's accuracy line"
    acc = float(line[-1].split(":")[1])
    # torch->flax round trip preserves the trained model's quality.
    assert abs(acc - entry["test_acc"]) < 0.15


@pytest.mark.slow
def test_committed_zoo_hard_artifacts_eval(tmp_path, capsys):
    """The COMMITTED zoo_hard .pt artifacts must load through the
    reference-style eval CLI and score well above chance on a freshly
    generated hard corpus drawn from the recorded recipe distribution
    (smaller clip count; seed 0 shares speaker parameters with the
    training corpus, so accuracy should be near the trained level)."""
    import json

    from honk_tpu import data as D
    from honk_tpu.cli.train import main as cli_main

    with open("zoo_hard/MANIFEST.json") as f:
        manifest = json.load(f)
    assert manifest["split_sizes"]["test"] > 0
    root = str(tmp_path / "hard")
    rec = manifest["corpus_recipe"]
    D.generate_hard_dataset(
        root, clips_per_word=120, n_speakers=20, seed=rec["seed"],
        snr_db=tuple(rec["snr_db"]), speaker_spread=rec["speaker_spread"],
        formant_jitter=rec["formant_jitter"],
    )
    rc = cli_main([
        "--type", "eval", "--model", "res8-narrow",
        "--data_dir", root, "--input_file", "zoo_hard/res8-narrow.pt",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if "final test accuracy:" in l]
    acc = float(line[-1].split(":")[1])
    assert acc > 0.6, f"committed artifact scored {acc}"
