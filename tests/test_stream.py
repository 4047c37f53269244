"""Streaming inference tests (SURVEY.md §4.7): long synthetic audio with
known keyword positions; offline/online agreement; O(1) state size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu.config import StreamConfig
from honk_tpu.models import find_config, find_model
from honk_tpu.stream import Streamer, smooth_posteriors, stream_file
from honk_tpu.stream.streamer import frame_mfccs
from honk_tpu import frontend as fe


def test_frame_mfccs_matches_batched_frontend():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    a = np.asarray(frame_mfccs(jnp.asarray(audio)))
    b = np.asarray(fe.compute_mfccs_jit(audio[None]))[0]
    assert a.shape == (101, 40)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_smooth_posteriors():
    post = jnp.asarray(np.eye(4, dtype=np.float32))  # 4 windows, 4 labels
    sm = np.asarray(smooth_posteriors(post, 2))
    np.testing.assert_allclose(sm[0], [1, 0, 0, 0])
    np.testing.assert_allclose(sm[1], [0.5, 0.5, 0, 0])
    np.testing.assert_allclose(sm[2], [0, 0.5, 0.5, 0])


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = find_config("res8-narrow")
    model = find_model("res8-narrow")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    return model, variables


def test_stream_file_shapes(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)  # 4 s
    cfg = StreamConfig(hop_samples=3200, smoothing_window=3)
    smoothed, events = stream_file(model, variables, audio, cfg)
    # (4s*16000 - 16000)/3200 + 1 = 16 windows
    assert smoothed.shape == (16, 12)
    np.testing.assert_allclose(smoothed.sum(-1), 1.0, atol=1e-4)
    assert isinstance(events, list)


def test_online_streamer_state_is_fixed_size(model_and_vars):
    model, variables = model_and_vars
    s = Streamer(model, variables, StreamConfig(smoothing_window=3), chunk_samples=3200)
    state = s.reset()
    sizes0 = jax.tree.map(lambda x: x.shape, state)
    rng = np.random.default_rng(2)
    for i in range(10):
        chunk = (rng.standard_normal(3200) * 0.1).astype(np.float32)
        state, post = s.process(state, chunk)
        assert post.shape == (12,)
        assert np.isfinite(np.asarray(post)).all()
    assert jax.tree.map(lambda x: x.shape, state) == sizes0  # O(1) memory


def test_online_matches_offline_after_warmup(model_and_vars):
    """Once the online ring holds a full window, its raw posterior should be
    close to the offline window posterior at the same position (boundary
    effects differ: online framing is causal, offline uses center padding,
    so we compare argmax stability rather than exact values)."""
    model, variables = model_and_vars
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    scfg = StreamConfig(hop_samples=3200, smoothing_window=1)
    smoothed_off, _ = stream_file(model, variables, audio, scfg)

    s = Streamer(model, variables, scfg, chunk_samples=3200)
    state = s.reset()
    on = []
    for i in range(len(audio) // 3200):
        state, post = s.process(state, audio[i * 3200 : (i + 1) * 3200])
        on.append(np.asarray(post))
    on = np.stack(on)
    # Offline window w ends at sample 16000 + w*3200; online chunk c ends at
    # (c+1)*3200 -> window w aligns with chunk c = w + (16000/3200) - 1.
    k = 16000 // 3200 - 1
    agree = 0
    total = 0
    for w in range(smoothed_off.shape[0]):
        c = w + k
        if c < len(on):
            total += 1
            agree += int(smoothed_off[w].argmax() == on[c].argmax())
    assert total >= 5
    assert agree / total >= 0.6, f"online/offline argmax agreement {agree}/{total}"
