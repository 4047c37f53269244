"""fetch_data.sh pipeline test (SURVEY.md §3.5, `[U] fetch_data.sh`).

Zero egress here, so the network layer is exercised against a file:// URL:
a tarball in the Speech Commands archive layout (word dirs at the archive
root, `_background_noise_/`) must download+extract into the honk directory
layout and load end-to-end through the packed-dataset reader.
"""

import os
import subprocess
import tarfile

import pytest

from honk_tpu import data as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fetch_data.sh")


def test_fetch_extract_load(tmp_path):
    # Build a miniature archive in the official layout.
    src = tmp_path / "src"
    D.generate_dataset(str(src), clips_per_word=4, n_speakers=2, noise_seconds=2)
    tar_path = tmp_path / "speech_commands_v0.01.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for entry in sorted(os.listdir(src)):
            tf.add(os.path.join(src, entry), arcname=entry)

    dest = tmp_path / "data"
    out = subprocess.run(
        ["bash", SCRIPT, str(dest), f"file://{tar_path}"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert (dest / "yes").is_dir() and (dest / "_background_noise_").is_dir()

    ds = D.load_speech_commands(str(dest))
    assert len(ds.train) > 0 and ds.noise.size > 0

    # Idempotent: a second run is a no-op.
    again = subprocess.run(
        ["bash", SCRIPT, str(dest), f"file://{tar_path}"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert again.returncode == 0 and "already present" in again.stdout
