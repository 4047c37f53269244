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


def test_batch_streamer_matches_independent_streamers(model_and_vars):
    """N batched streams must reproduce N independent Streamers exactly:
    streams cannot interact (frozen BN, per-example model)."""
    from honk_tpu.stream import BatchStreamer

    model, variables = model_and_vars
    scfg = StreamConfig(smoothing_window=3)
    n, chunk, steps = 3, 3200, 5
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((n, steps * chunk)) * 0.1).astype(np.float32)

    singles = [Streamer(model, variables, scfg, chunk) for _ in range(n)]
    states = [s.reset() for s in singles]
    ref = np.zeros((steps, n, 12), np.float32)
    for t in range(steps):
        for i in range(n):
            states[i], post = singles[i].process(states[i], audio[i, t * chunk : (t + 1) * chunk])
            ref[t, i] = np.asarray(post)

    bs = BatchStreamer(model, variables, n, scfg, chunk)
    state = bs.reset()
    for t in range(steps):
        state, post = bs.process(state, audio[:, t * chunk : (t + 1) * chunk])
        np.testing.assert_allclose(np.asarray(post), ref[t], atol=1e-5)


def test_batch_streamer_shards_across_mesh(model_and_vars):
    """With data_axis set, the stream axis of the state/posteriors must be
    distributed over all 8 devices of the mesh."""
    from honk_tpu.parallel import make_data_mesh, replicate
    from honk_tpu.stream import BatchStreamer

    model, variables = model_and_vars
    mesh = make_data_mesh(8, "data")
    bs = BatchStreamer(
        model, replicate(mesh, variables), 8, StreamConfig(), 3200, data_axis="data"
    )
    rng = np.random.default_rng(6)
    chunks = (rng.standard_normal((8, 3200)) * 0.1).astype(np.float32)
    with jax.set_mesh(mesh):
        state = bs.reset()
        state, post = bs.process(state, chunks)
        jax.block_until_ready(post)
    assert post.shape == (8, 12)
    assert np.isfinite(np.asarray(post)).all()
    devices = {s.device for s in state.feat_ring.addressable_shards}
    assert len(devices) == 8, f"stream state on {len(devices)} devices"
