"""Native wavpack loader tests: exact agreement with the Python reader,
error handling, and dataset integration."""

import os

import numpy as np
import pytest

from honk_tpu.data import wavio
from honk_tpu.native import wavpack


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([16000, 8000, 20000, 1]):
        x = (rng.standard_normal(n) * 0.3).clip(-1, 1).astype(np.float32)
        p = str(d / f"t{i}.wav")
        wavio.write_wav(p, x)
        paths.append(p)
    return paths


def test_native_available():
    assert wavpack.available(), "native wavpack should build with the baked toolchain"


def test_native_matches_python_reader(wav_dir):
    out, lengths = wavpack.load_files_packed(wav_dir, 16000)
    for i, p in enumerate(wav_dir):
        ref = wavio.read_wav_int16(p)
        ref = np.pad(ref[:16000], (0, 16000 - min(16000, len(ref))))
        np.testing.assert_array_equal(out[i], ref)
        assert lengths[i] == min(
            16000, len(wavio.read_wav_int16(p))
        ) or lengths[i] == len(wavio.read_wav_int16(p))


def test_native_bad_file(tmp_path, wav_dir):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"definitely not a wav file")
    out, lengths = wavpack.load_files_packed(wav_dir + [bad], 16000)
    assert lengths[-1] == -1
    assert (out[-1] == 0).all()


def test_dataset_load_uses_native(tmp_path):
    from honk_tpu.data import generate_dataset, load_speech_commands

    root = str(tmp_path / "sc")
    generate_dataset(root, clips_per_word=4, n_speakers=2, noise_seconds=2)
    ds = load_speech_commands(root)
    total = len(ds.train) + len(ds.dev) + len(ds.test)
    assert total > 0
    assert ds.train.audio.dtype == np.int16
    # Decoded audio must be non-trivial (real signal, not fallback zeros).
    assert np.abs(ds.train.audio.astype(np.int32)).mean() > 10
