"""manage_audio CLI tests (reference ``python -m utils.manage_audio``)."""

import os

import numpy as np

from honk_tpu.cli.manage_audio import main
from honk_tpu.data.wavio import read_wav, write_wav


def _write_padded_tone(path, lead=4000, body=8000):
    sig = np.zeros(lead + body + lead, np.float32)
    t = np.arange(body) / 16000.0
    sig[lead : lead + body] = 0.5 * np.sin(2 * np.pi * 440 * t)
    write_wav(path, sig, 16000)


def test_trim_shortens_silence(tmp_path, capsys):
    d = str(tmp_path)
    _write_padded_tone(os.path.join(d, "a.wav"))
    rc = main(["trim", d, "--threshold", "0.01"])
    assert rc in (0, None)
    data, sr = read_wav(os.path.join(d, "a.wav"))
    assert sr == 16000
    assert data.shape[0] < 16000  # leading/trailing silence removed
    assert np.abs(data).max() > 0.4  # tone kept


def test_window_keeps_max_energy(tmp_path):
    d = str(tmp_path)
    _write_padded_tone(os.path.join(d, "a.wav"), lead=12000, body=8000)
    main(["window", d, "--size", "8000"])
    data, _ = read_wav(os.path.join(d, "a.wav"))
    assert data.shape[0] == 8000
    assert np.sqrt(np.mean(data**2)) > 0.2  # landed on the tone


def test_synth_and_info(tmp_path, capsys):
    d = str(tmp_path / "corpus")
    main(["synth", d, "--clips", "2"])
    wavs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".wav")
    ]
    assert len(wavs) > 10
    capsys.readouterr()
    main(["info", wavs[0]])
    out = capsys.readouterr().out
    assert "rms" in out or "dur" in out or wavs[0] in out
