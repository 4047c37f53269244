"""Dataset-generator tests (SURVEY.md §2.1 keyword_spotting_data_generator).

Offline end-to-end: a synthetic 'video' (long waveform with tone-words at
known times) + SRT/VTT captions -> occurrence alignment -> clip
extraction -> honk-layout output -> model-based quality report.
"""

import os

import numpy as np
import pytest

from honk_tpu import datagen as G
from honk_tpu.data.wavio import read_wav, write_wav

SR = 16000

SRT = """\
1
00:00:01,000 --> 00:00:03,000
yes we can go

2
00:00:05,500 --> 00:00:06,500
no

3
00:00:10,000 --> 00:00:10,000
degenerate block yes
"""

VTT = """\
WEBVTT

00:01.000 --> 00:03.000
<c>yes</c> we can go

note-cue
00:05.500 --> 00:06.500
no
"""


def test_parse_srt():
    caps = G.parse_srt(SRT)
    assert len(caps) == 3
    assert caps[0].start == 1.0 and caps[0].end == 3.0
    assert caps[0].text == "yes we can go"
    assert caps[1].text == "no"


def test_parse_vtt_strips_tags_and_header():
    caps = G.parse_vtt(VTT)
    assert len(caps) == 2
    assert caps[0].text.startswith("yes")
    assert caps[0].start == 1.0
    assert caps[1].start == 5.5


def test_find_keyword_occurrences_interpolates():
    caps = G.parse_srt(SRT)
    occs = G.find_keyword_occurrences(caps, ["yes", "no"])
    # 'yes' in block 1 (word 0 of 4 over [1,3] -> starts at 1.0);
    # 'no' in block 2; block 3 is degenerate (end==start) and dropped.
    assert [o.keyword for o in occs] == ["yes", "no"]
    assert occs[0].start == pytest.approx(1.0)
    assert occs[0].end <= occs[0].start + 1.0
    assert occs[1].start == pytest.approx(5.5)


def _tone(freq, dur_s, amp=0.5):
    t = np.arange(int(dur_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _make_video(root):
    """120 s of near-silence with loud tones at caption-aligned times."""
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(20 * SR) * 0.002).astype(np.float32)
    # 'yes' spoken at ~1.0-1.5 s, 'no' at ~5.5-6.0 s (match SRT timing).
    audio[SR : SR + SR // 2] += _tone(440, 0.5)
    audio[int(5.5 * SR) : int(5.5 * SR) + SR // 2] += _tone(880, 0.5)
    write_wav(os.path.join(root, "vid0.wav"), audio, SR)
    with open(os.path.join(root, "vid0.srt"), "w") as f:
        f.write(SRT)
    return audio


def test_extract_and_write_clips(tmp_path):
    src_root = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    os.makedirs(src_root)
    _make_video(src_root)

    items = list(G.LocalFileSource(src_root))
    assert len(items) == 1 and items[0].source_id == "vid0"
    occs = G.find_keyword_occurrences(items[0].captions, ["yes", "no"])
    clips = G.extract_clips(items[0].audio, occs)
    assert {c.keyword for c in clips} == {"yes", "no"}
    for c in clips:
        assert c.audio.shape == (16000,)
        # RMS recentering must land the window on the loud tone.
        assert np.abs(c.audio).max() > 0.2

    paths = G.write_clips(clips, out_root, "vid0")
    assert all("_nohash_" in p for p in paths)
    for p in paths:
        data, sr = read_wav(p)
        assert sr == SR and data.shape == (16000,)
    # honk directory layout: <word>/<source>_nohash_<n>.wav
    assert os.path.exists(os.path.join(out_root, "yes", "vid0_nohash_0.wav"))
    assert os.path.exists(os.path.join(out_root, "no", "vid0_nohash_0.wav"))


def test_quality_report(tmp_path):
    """A freshly-initialized model yields a structurally-correct report."""
    import jax
    import jax.numpy as jnp

    from honk_tpu.models import find_config, find_model
    from honk_tpu.serve.service import default_labels

    src_root = str(tmp_path / "src")
    os.makedirs(src_root)
    _make_video(src_root)
    item = next(iter(G.LocalFileSource(src_root)))
    occs = G.find_keyword_occurrences(item.captions, ["yes", "no"])
    clips = G.extract_clips(item.audio, occs)

    labels = default_labels()
    cfg = find_config("res8-narrow")
    cfg["n_labels"] = len(labels)
    model = find_model("res8-narrow")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)

    report = G.evaluate_clips(model, dict(variables), labels, clips, batch_size=8)
    assert report["n_clips"] == len(clips) and report["n_scored"] == len(clips)
    assert set(report["per_keyword"]) == {"yes", "no"}
    for stats in report["per_keyword"].values():
        assert 0.0 <= stats["acceptance"] <= 1.0
        assert stats["total"] >= 1
    assert len(report["verdicts"]) == len(clips)


def test_youtube_source_fails_actionably():
    with pytest.raises(RuntimeError, match="LocalFileSource"):
        G.YouTubeSource(["yes"])


def test_datagen_cli(tmp_path, capsys):
    from honk_tpu.datagen.cli import main

    src_root = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    os.makedirs(src_root)
    _make_video(src_root)
    rc = main(["--keywords", "yes", "no", "--source", "local",
               "--input_dir", src_root, "--out_dir", out_root])
    assert rc == 0
    out = capsys.readouterr().out
    assert "vid0" in out and "total:" in out
    assert os.path.exists(os.path.join(out_root, "yes"))
