"""Synthetic miniature Speech Commands fixture (SURVEY.md §4.6).

This machine has no network and no copy of the real dataset; tests and
smoke training runs use a procedurally generated dataset in the exact
honk directory layout:

    root/<word>/<speaker-hash>_nohash_<n>.wav     (1 s, 16 kHz PCM16)
    root/_background_noise_/*.wav                 (long noise clips)

Each word is a distinct deterministic "vowel chord" (word-specific
formant frequencies with speaker-specific pitch/jitter), so classifiers
can genuinely learn to separate them — good enough for overfit smoke
tests and end-to-end pipeline validation.
"""

from __future__ import annotations

import os

import numpy as np

from .wavio import write_wav

DEFAULT_WORDS = ("yes", "no", "up", "down", "left", "right", "on", "off", "stop", "go")
UNKNOWN_WORDS = ("cat", "dog", "tree")


def _word_signal(word_idx: int, speaker: int, n: int, sr: int, rng: np.random.Generator) -> np.ndarray:
    t = np.arange(sr) / sr
    # Word identity -> a deterministic, well-separated chord of 3 formants:
    # base frequencies spaced ~170 Hz apart so classes are cleanly separable
    # in mel space (the fixture must be learnable for overfit smoke tests).
    f0 = 230.0 + 170.0 * word_idx
    formants = np.array([f0, 2.13 * f0, 3.41 * f0])
    formants = np.minimum(formants, 3900.0)
    pitch = 0.97 + 0.06 * ((speaker % 7) / 7.0)
    sig = np.zeros_like(t)
    for k, f in enumerate(formants):
        sig += (0.5 / (k + 1)) * np.sin(2 * np.pi * f * pitch * t + rng.uniform(0, 2 * np.pi))
    # Amplitude envelope: word "spoken" in the middle ~0.6 s.
    center = 0.5 + 0.05 * rng.standard_normal()
    env = np.exp(-(((t - center) / 0.18) ** 2))
    sig = 0.4 * sig * env + 0.005 * rng.standard_normal(len(t))
    return np.clip(sig, -1.0, 1.0)


def generate_dataset(
    root: str,
    words: tuple[str, ...] = DEFAULT_WORDS,
    unknown_words: tuple[str, ...] = UNKNOWN_WORDS,
    clips_per_word: int = 12,
    n_speakers: int = 6,
    noise_seconds: int = 8,
    sr: int = 16000,
    seed: int = 0,
) -> str:
    """Write the synthetic dataset under `root`; returns `root`."""
    rng = np.random.default_rng(seed)
    for w_idx, word in enumerate(tuple(words) + tuple(unknown_words)):
        d = os.path.join(root, word)
        os.makedirs(d, exist_ok=True)
        for i in range(clips_per_word):
            speaker = i % n_speakers
            # Hex speaker id mimics the real corpus's "<hash>_nohash_<n>.wav".
            sid = f"{abs(hash((word, speaker))) % (16**8):08x}"
            path = os.path.join(d, f"{sid}_nohash_{i // n_speakers}.wav")
            write_wav(path, _word_signal(w_idx, speaker, i, sr, rng), sr)
    nd = os.path.join(root, "_background_noise_")
    os.makedirs(nd, exist_ok=True)
    for name, gen in [
        ("white_noise.wav", lambda n: 0.1 * rng.standard_normal(n)),
        ("pink_ish_noise.wav", lambda n: np.cumsum(0.01 * rng.standard_normal(n)) % 0.4 - 0.2),
    ]:
        write_wav(os.path.join(nd, name), gen(noise_seconds * sr), sr)
    return root
