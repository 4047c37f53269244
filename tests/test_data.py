"""Data pipeline tests: split parity, packing, on-device augmentation (SURVEY.md §4.4, §4.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from honk_tpu import data as D


def test_which_set_parity_known_values():
    # Golden values computed from the TF Speech Commands convention:
    # SHA1 of the filename with _nohash_* stripped, bucketed mod 2^27-1.
    # All clips of one "speaker" hash identically -> same split.
    a = D.which_set("/x/yes/abcd1234_nohash_0.wav")
    for n in range(1, 5):
        assert D.which_set(f"/y/no/abcd1234_nohash_{n}.wav") == a


def test_which_set_distribution():
    rng = np.random.default_rng(0)
    buckets = [
        D.which_set(f"{rng.integers(16**8):08x}_nohash_0.wav") for _ in range(4000)
    ]
    frac_dev = buckets.count(D.DEV) / len(buckets)
    frac_test = buckets.count(D.TEST) / len(buckets)
    assert 0.07 < frac_dev < 0.13
    assert 0.07 < frac_test < 0.13


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("speech_dataset"))
    D.generate_dataset(root, clips_per_word=8, n_speakers=4)
    return D.load_speech_commands(root, seed=0)


def test_packed_dataset_structure(dataset):
    assert dataset.n_labels == 12
    assert dataset.label_names[:2] == ("__silence__", "__unknown__")
    total = len(dataset.train) + len(dataset.dev) + len(dataset.test)
    assert total > 0
    assert dataset.train.audio.dtype == np.int16
    assert dataset.train.audio.shape[1] == 16000
    assert dataset.noise.dtype == np.float32
    assert len(dataset.noise) > 16001
    # Eval splits materialize silence with label 0.
    if dataset.dev.n_silence:
        assert (dataset.dev.labels[-dataset.dev.n_silence :] == 0).all()


def test_wav_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    D.write_wav(p, x)
    back, sr = D.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, x, atol=1e-4)
    i16 = D.read_wav_int16(p)
    assert i16.dtype == np.int16


def test_timeshift_semantics():
    audio = jnp.asarray(np.arange(1, 11, dtype=np.float32)[None, :].repeat(3, 0))
    shift = jnp.asarray([0, 2, -3])
    out = np.asarray(D.timeshift(audio, shift))
    np.testing.assert_array_equal(out[0], np.arange(1, 11))
    np.testing.assert_array_equal(out[1], [0, 0, 1, 2, 3, 4, 5, 6, 7, 8])
    np.testing.assert_array_equal(out[2], [4, 5, 6, 7, 8, 9, 10, 0, 0, 0])


def test_sample_train_batch(dataset):
    cfg = D.AugmentConfig(n_silence=max(1, int(0.1 * len(dataset.train))))
    audio, noise = D.prepare_train_arrays(dataset.train.audio, dataset.noise, cfg)
    labels = jnp.asarray(dataset.train.labels)
    key = jax.random.PRNGKey(0)
    batch, lab = D.sample_train_batch(key, audio, labels, noise, 64, cfg)
    assert batch.shape == (64, 16000) and lab.shape == (64,)
    b = np.asarray(batch)
    assert np.abs(b).max() <= 1.0
    assert np.isfinite(b).all()
    # Deterministic in the key.
    batch2, lab2 = D.sample_train_batch(key, audio, labels, noise, 64, cfg)
    np.testing.assert_array_equal(np.asarray(batch), np.asarray(batch2))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab2))
    # Different keys give different batches.
    batch3, _ = D.sample_train_batch(jax.random.PRNGKey(1), audio, labels, noise, 64, cfg)
    assert not np.array_equal(np.asarray(batch), np.asarray(batch3))
    # Silence appears with roughly the configured frequency over many draws.
    labs = []
    for i in range(20):
        _, l = D.sample_train_batch(jax.random.PRNGKey(i), audio, labels, noise, 64, cfg)
        labs.append(np.asarray(l))
    frac_sil = (np.concatenate(labs) == 0).mean()
    expect = cfg.n_silence / (len(dataset.train) + cfg.n_silence)
    assert abs(frac_sil - expect) < 0.05


def test_eval_batch_mask(dataset):
    audio = jnp.asarray(dataset.dev.audio)
    labels = jnp.asarray(dataset.dev.labels)
    n = len(dataset.dev)
    bs = 32
    seen = 0
    for start in range(0, n, bs):
        a, l, valid = D.eval_batch(audio, labels, start, bs)
        seen += int(np.asarray(valid).sum())
    assert seen == n


def test_hard_dataset_reproducible_and_speaker_split(tmp_path):
    """Hard-mode corpus (recipe-dynamics rehearsal): same args must produce
    byte-identical corpora (md5 speaker ids, seeded RNG — reproducibility
    the easy generator's salted hash() naming cannot give), and the SHA1
    split must bucket whole SPEAKERS (a speaker id never appears in two
    splits), mirroring the real corpus convention."""
    import hashlib
    import os

    from honk_tpu.data import generate_hard_dataset, load_speech_commands
    from honk_tpu.data import splits as S

    kw = dict(clips_per_word=8, n_speakers=8, noise_seconds=2, seed=3)
    a = generate_hard_dataset(str(tmp_path / "a"), **kw)
    b = generate_hard_dataset(str(tmp_path / "b"), **kw)

    def digest(root):
        h = hashlib.sha1()
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                h.update(f.encode())
                with open(os.path.join(dirpath, f), "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    assert digest(a) == digest(b)

    # speaker-atomic split: each sid maps to exactly one bucket
    sid_bucket = {}
    for word in os.listdir(a):
        d = os.path.join(a, word)
        if not os.path.isdir(d) or word == "_background_noise_":
            continue
        for f in os.listdir(d):
            if not f.endswith(".wav"):
                continue
            sid = f.split("_nohash_")[0]
            bucket = S.which_set(os.path.join(d, f), 10.0, 10.0)
            assert sid_bucket.setdefault(sid, bucket) == bucket, (sid, word)

    ds = load_speech_commands(a)
    assert ds.n_labels == 12 and len(ds.train) > 0


def test_ngram_word_set_has_equal_bigram_twins(tmp_path):
    """The n-gram instrument's core property: every twin pair shares
    unigram AND bigram multisets (so only >=trigram context separates
    them), and the generated corpus is reproducible and loadable."""
    from collections import Counter

    from honk_tpu.data import generate_hard_dataset, load_speech_commands
    from honk_tpu.data.synthetic import _NGRAM_WORDS

    def bigrams(w):
        return Counter(w[i : i + 2] for i in range(len(w) - 1))

    twins = list(zip(_NGRAM_WORDS[0:12:2], _NGRAM_WORDS[1:12:2]))
    assert len(twins) == 6
    for a, b in twins:
        assert a != b
        assert Counter(a) == Counter(b), (a, b)  # unigrams match
        assert bigrams(a) == bigrams(b), (a, b)  # bigrams match

    kw = dict(clips_per_word=8, n_speakers=8, noise_seconds=2, seed=3, word_mode="ngram")
    a = generate_hard_dataset(str(tmp_path / "a"), **kw)
    b = generate_hard_dataset(str(tmp_path / "b"), **kw)
    import hashlib
    import os

    def digest(root):
        h = hashlib.sha1()
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                h.update(f.encode())
                with open(os.path.join(dirpath, f), "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    assert digest(a) == digest(b)
    ds = load_speech_commands(a)
    assert ds.n_labels == 12 and len(ds.train) > 0
