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


def test_zoo_hard_v2_ladder_stats_consistent():
    """FAST consistency gate for the committed parity instrument
    (VERDICT r3 #1): the MANIFEST's pairwise McNemar stats must be
    recomputable from the committed per-clip correctness vectors, and the
    required capacity ordering must be resolved at >= 2 SE:
    res15 > res8, res26 > res8, res8 > res8-narrow."""
    import numpy as np

    with open("zoo_hard_v2/MANIFEST.json") as f:
        manifest = json.load(f)
    stats = manifest["ladder_stats"]
    vecs = {
        name: np.load(f"zoo_hard_v2/{name}_test_correct.npy")
        for name in manifest["models"]
    }
    n = stats["n_test_clips"]
    for v in vecs.values():
        assert v.shape == (n,) and v.dtype == bool

    for key, s in stats["pairwise"].items():
        a, b_name = key.split("_vs_")
        va, vb = vecs[a], vecs[b_name]
        b = int((va & ~vb).sum())
        c = int((~va & vb).sum())
        assert b == s["n_only_first_correct"], key
        assert c == s["n_only_second_correct"], key
        z = (b - c) / max(np.sqrt(b + c), 1e-9)
        assert abs(z - s["mcnemar_z"]) < 0.01, key
        assert s["resolved_2se"] == (abs(z) >= 2.0), key

    # The capacity ordering the instrument exists to pin (paper ordering;
    # res15-vs-res26 and res15-narrow-vs-res26-narrow are paper-consistent
    # near-ties and not required). res26-narrow rows require the 78-epoch
    # retrain (VERDICT r4 #3a, MANIFEST recipe_note): at the 26-epoch
    # recipe the 24-layer narrow net was undertrained and inverted the
    # res26-narrow-vs-res8-narrow direction.
    # cnn-trad-pool2 rows require the stable-lr retrain (r5 recipe_note):
    # at lr 0.01 the dropout+dense net diverges on this corpus and the r4
    # row sat a spurious 20 points below res8. Paper position: ~res8-narrow
    # level, below every residual-wide model.
    required = [
        ("res15", "res8"), ("res26", "res8"), ("res8", "res8-narrow"),
        ("res15", "res8-narrow"), ("res26", "res8-narrow"),
        ("res15-narrow", "res8-narrow"), ("res26-narrow", "res8-narrow"),
        ("res8", "cnn-trad-pool2"), ("res15", "cnn-trad-pool2"),
        ("res26", "cnn-trad-pool2"), ("res15-narrow", "cnn-trad-pool2"),
        ("res26-narrow", "cnn-trad-pool2"),
        ("cnn-trad-pool2", "res8-narrow"),
    ]
    for winner, loser in required:
        key = f"{winner}_vs_{loser}" if f"{winner}_vs_{loser}" in stats["pairwise"] else f"{loser}_vs_{winner}"
        s = stats["pairwise"][key]
        assert s["resolved_2se"], (key, s)
        assert s["winner"] == winner, (key, s)


def test_zoo_hard_v2_split_sizes_recomputable():
    """VERDICT r4 #4: the instrument's split accounting must be
    unambiguous and recomputable. From the corpus FILE LISTING alone
    (SHA1 bucketing hashes filenames — no decode): train = known-bucket
    files + int(0.1*known) unknowns, NO materialized silence (train
    silence is synthesized per batch); dev/test additionally get
    int(0.1*n) materialized silence. Must equal MANIFEST split_sizes."""
    import os

    from honk_tpu.data import DEFAULT_WANTED_WORDS
    from honk_tpu.data import splits as S

    with open("zoo_hard_v2/MANIFEST.json") as f:
        manifest = json.load(f)
    root = manifest["corpus"]
    words = set(manifest["corpus_recipe"]["words"])
    assert words == set(DEFAULT_WANTED_WORDS)
    known = [0, 0, 0]
    for folder in sorted(os.listdir(root)):
        path = os.path.join(root, folder)
        if not os.path.isdir(path) or folder == "_background_noise_":
            continue
        if folder not in words:
            continue  # unknown-word files are ALLOCATED, not bucketed
        for fname in sorted(os.listdir(path)):
            if fname.endswith(".wav"):
                known[S.which_set(os.path.join(path, fname), 10, 80)] += 1
    expect = {}
    for bucket, name in ((S.TRAIN, "train"), (S.DEV, "dev"), (S.TEST, "test")):
        n = known[bucket] + int(0.1 * known[bucket])  # + unknown allocation
        if name != "train":
            n += int(0.1 * n)  # materialized silence (dev/test only)
        expect[name] = n
    assert expect == manifest["split_sizes"], (expect, manifest["split_sizes"])
    # And the adopted instrument probe row records the SAME sizes.
    with open("runs/instrument_probes_r04.json") as f:
        probes = json.load(f)["probes"]
    adopted = [p for p in probes if "ADOPTED" in p.get("split", "")]
    assert len(adopted) == 1
    assert f"train {expect['train']}, dev {expect['dev']}, test {expect['test']}" in adopted[0]["split"]


@pytest.mark.slow
def test_committed_zoo_hard_v2_accuracy_band(tmp_path, capsys):
    """SLOW full-fidelity gate (VERDICT r3 #1 'tighten the band to +-3%'):
    regenerate the EXACT hard_v2 corpus from the recorded recipe (the
    generator is byte-reproducible), evaluate the committed .pt artifacts
    through the reference-style eval CLI with the recorded split, and
    assert each model lands within +-3% of its recorded test accuracy —
    a recipe/eval regression of the size the old 0.55-0.95 band would
    have passed now fails."""
    from honk_tpu import data as D
    from honk_tpu.cli.train import main as cli_main

    with open("zoo_hard_v2/MANIFEST.json") as f:
        manifest = json.load(f)
    rec = manifest["corpus_recipe"]
    assert rec["generator"].endswith("generate_hard_dataset")
    root = str(tmp_path / "hard_v2")
    D.generate_hard_dataset(
        root,
        clips_per_word=rec["clips_per_word"],
        n_speakers=rec["n_speakers"],
        noise_seconds=rec["noise_seconds"],
        seed=rec["seed"],
        snr_db=tuple(rec["snr_db"]),
        speaker_spread=rec["speaker_spread"],
        formant_jitter=rec["formant_jitter"],
        # Full recipe fidelity: a zoo built from a 2-segment or ngram
        # corpus must be validated on THAT corpus, not the glide default.
        segments_per_word=rec.get("segments_per_word", 1),
        word_mode=rec.get("word_mode", "glide"),
    )
    accs = {}
    for name in ("res8", "res8-narrow", "res15"):
        recipe = manifest["models"][name]["recipe"]
        rc = cli_main([
            "--type", "eval", "--model", name,
            "--data_dir", root,
            "--input_file", f"zoo_hard_v2/{name}.pt",
            "--dev_pct", str(recipe["dev_pct"]),
            "--test_pct", str(recipe["test_pct"]),
        ])
        assert rc == 0
        line = [l for l in capsys.readouterr().out.splitlines() if "final test accuracy:" in l]
        accs[name] = float(line[-1].split(":")[1])
        recorded = manifest["models"][name]["test_acc_recheck"]
        assert abs(accs[name] - recorded) <= 0.03, (name, accs[name], recorded)
    # Ordering holds on the regenerated corpus too.
    assert accs["res15"] > accs["res8"] > accs["res8-narrow"], accs
