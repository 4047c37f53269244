"""Service-layer tests: snippet utils, label service, personalization,
HTTP endpoints (real socket), checkpoint resume."""

import base64
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu.audio import AudioSnippet
from honk_tpu.models import find_config, find_model
from honk_tpu.serve import LabelService, TrainingService, serve


# ---- AudioSnippet ----
def test_snippet_trim():
    x = np.zeros(16000, np.float32)
    x[4000:8000] = 0.5 * np.sin(np.linspace(0, 200, 4000))
    s = AudioSnippet(x).trim(threshold=0.05)
    assert 3800 <= len(s) <= 4400  # keeps only the loud span (window quantized)


def test_snippet_trim_window_finds_energy():
    x = np.zeros(48000, np.float32)
    x[30000:34000] = 0.8
    s = AudioSnippet(x).trim_window(16000)
    assert len(s) == 16000
    assert s.data.sum() > 3000 * 0.8  # the energetic span is inside


def test_snippet_contrastive():
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    negs = AudioSnippet(x).generate_contrastive(8)
    assert len(negs) == 8
    for n in negs:
        assert len(n) == 16000
        assert not np.array_equal(n.data, x)


def test_snippet_all_silent_trim():
    s = AudioSnippet(np.zeros(8000, np.float32)).trim()
    assert len(s) == 0


# ---- LabelService ----
@pytest.fixture(scope="module")
def service():
    cfg = find_config("res8-narrow")
    model = find_model("res8-narrow")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    return LabelService("res8-narrow", variables, precision=None)


def test_label_service_evaluate(service):
    rng = np.random.default_rng(0)
    label, prob = service.evaluate((rng.standard_normal(12000) * 0.1).astype(np.float32))
    assert label in service.labels
    assert 0.0 <= prob <= 1.0


def test_label_service_batch(service):
    rng = np.random.default_rng(1)
    out = service.evaluate_batch((rng.standard_normal((4, 16000)) * 0.1).astype(np.float32))
    assert len(out) == 4


def test_label_service_long(service):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    events = service.evaluate_long(audio)
    assert isinstance(events, list)


def test_training_service_personalizes(service):
    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000.0
    positive = (0.4 * np.sin(2 * np.pi * 700 * t) * np.exp(-((t - 0.5) ** 2) / 0.05)).astype(
        np.float32
    )
    trainer = TrainingService(service, learning_rate=0.05, steps=30)
    result = trainer.fine_tune([positive, positive * 0.9], target_label="yes")
    new_svc = LabelService("res8-narrow", result["variables"], precision=None)
    label, prob = new_svc.evaluate(positive)
    assert label == "yes", f"personalization failed: {label} ({prob})"


# ---- HTTP ----
def test_http_listen_and_errors(service):
    httpd = serve(service, port=0, enable_training=False)  # port 0 = ephemeral
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        # valid /listen
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(16000) * 3000).astype(np.int16).tobytes()
        body = json.dumps({"wav_data": base64.b64encode(pcm).decode()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/listen", data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert "label" in out and "prob" in out and "contains_command" in out

        # /labels
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/labels") as r:
            assert json.loads(r.read())["labels"] == service.labels

        # malformed body -> 400
        req = urllib.request.Request(f"http://127.0.0.1:{port}/listen", data=b"not json")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # training disabled -> 503
        req = urllib.request.Request(f"http://127.0.0.1:{port}/train", data=b"{}")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503

        # /stream: continuous detection over 3 s of audio
        pcm3 = (rng.standard_normal(48000) * 3000).astype(np.int16).tobytes()
        body = json.dumps({"wav_data": base64.b64encode(pcm3).decode()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stream", data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert "detections" in out and isinstance(out["detections"], list)
    finally:
        httpd.shutdown()


# ---- checkpoint resume ----
def test_train_resume(tmp_path):
    from honk_tpu import data as D
    from honk_tpu.config import DataConfig, ExperimentConfig, TrainConfig
    from honk_tpu.train import train

    root = str(tmp_path / "sc")
    D.generate_dataset(root, clips_per_word=6, n_speakers=3, noise_seconds=2)
    ckdir = str(tmp_path / "ck")
    cfg = ExperimentConfig(
        data=DataConfig(data_dir=root, noise_prob=0.1),
        train=TrainConfig(
            model="res8-narrow", batch_size=16, n_epochs=2, lr=(0.01,), schedule=(),
            dev_every=2, eval_batch_size=32,
        ),
    )
    r1 = train(cfg, checkpoint_dir=ckdir, save_every_epochs=1)
    step_after = int(r1["state"].step)

    # Resume: asking for 4 epochs continues from epoch 2, not from scratch.
    cfg.train.n_epochs = 4
    r2 = train(cfg, checkpoint_dir=ckdir, save_every_epochs=10)
    assert int(r2["state"].step) > step_after
    assert int(r2["state"].step) < 2 * step_after + 4  # did NOT redo epochs 0-1


# ---- session-based multi-stream HTTP serving (VERDICT r2 #3) ----
def _post(port, path, obj):
    body = json.dumps(obj).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_http_stream_sessions_match_independent_streamers(service):
    """N concurrent HTTP sessions sharing one BatchStreamer slab must
    produce EXACTLY the posteriors of N independent Streamers, under
    irregular interleaving (masked slots must not advance)."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    httpd = serve(service, port=0, enable_training=False, n_stream_slots=4, stream_cfg=scfg)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        rng = np.random.default_rng(11)
        n, chunk = 3, 3200
        audio = (rng.standard_normal((n, 6 * chunk)) * 0.1).astype(np.float32)

        # Reference: independent single streamers.
        singles = [Streamer(service.model, service.variables, scfg, chunk) for _ in range(n)]
        sstates = [s.reset() for s in singles]
        ref = [[] for _ in range(n)]
        for i in range(n):
            for t in range(6):
                sstates[i], post = singles[i].process(
                    sstates[i], audio[i, t * chunk : (t + 1) * chunk]
                )
                ref[i].append(np.asarray(post))

        sids = [_post(port, "/stream/open", {})["stream_id"] for _ in range(n)]
        # Irregular interleave: session i advances on its own schedule.
        order = [0, 0, 1, 2, 0, 1, 2, 2, 1, 0, 1, 2, 0, 1, 2, 0, 1, 2]
        cursor = [0] * n
        for i in order:
            t = cursor[i]
            pcm = (audio[i, t * chunk : (t + 1) * chunk] * 32767).astype("<i2").tobytes()
            out = _post(
                port, "/stream/push",
                {"stream_id": sids[i], "wav_data": base64.b64encode(pcm).decode()},
            )
            # int16 quantization of the chunk costs ~3e-5; posteriors match
            # the independent streamer at that tolerance.
            np.testing.assert_allclose(out["posterior"], ref[i][t], atol=2e-3)
            cursor[i] = t + 1
        assert cursor == [6, 6, 6]

        # close frees the slot; reopening reuses it with FRESH state
        closed = _post(port, "/stream/close", {"stream_id": sids[0]})
        assert "events" in closed
        sid_new = _post(port, "/stream/open", {})["stream_id"]
        pcm = (audio[0, :chunk] * 32767).astype("<i2").tobytes()
        out = _post(
            port, "/stream/push",
            {"stream_id": sid_new, "wav_data": base64.b64encode(pcm).decode()},
        )
        np.testing.assert_allclose(out["posterior"], ref[0][0], atol=2e-3)

        # unknown stream id -> 404
        try:
            _post(port, "/stream/push", {"stream_id": "nope", "wav_data": ""})
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_label_service_batch_streamer(service):
    """N concurrent streams through the service API: one jit-ed step
    advances all (BASELINE.json:11 batched multi-stream serving)."""
    bs = service.make_batch_streamer(4, chunk_samples=3200)
    rng = np.random.default_rng(9)
    state = bs.reset()
    for _ in range(6):
        chunks = (rng.standard_normal((4, 3200)) * 0.1).astype(np.float32)
        state, post = bs.process(state, chunks)
    post = np.asarray(post)
    assert post.shape == (4, len(service.labels))
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)


def test_stream_hub_slots_and_errors(service):
    """Direct StreamHub unit coverage: slot exhaustion raises, close frees
    the slot, pushes to unknown/closed sessions raise KeyError, and a
    wrong-size chunk raises ValueError."""
    from honk_tpu.serve import StreamHub

    hub = StreamHub(service, n_slots=2, chunk_samples=3200)
    a, b = hub.open(), hub.open()
    with pytest.raises(RuntimeError):
        hub.open()
    rng = np.random.default_rng(1)
    chunk = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    out = hub.push(a, chunk)
    assert set(out) == {"posterior", "label", "prob", "events"}
    with pytest.raises(ValueError):
        hub.push(a, chunk[:100])
    hub.close(a)
    with pytest.raises(KeyError):
        hub.push(a, chunk)
    c = hub.open()  # freed slot is reusable
    assert hub.push(c, chunk)["posterior"] == out["posterior"]  # fresh state
    hub.close(b)
    hub.close(c)


# ---- crash recovery (SURVEY §5.3) ----
def test_restore_latest_ignores_partial_save_dirs(tmp_path):
    """A process killed mid-save leaves orbax's staging directory
    ('step_XXXXXXXX.orbax-checkpoint-tmp-<pid>') behind; resume must fall
    back to the newest COMPLETE checkpoint instead of crashing on the
    partial name or restoring garbage."""
    from honk_tpu.ckpt import Checkpointer

    ck = Checkpointer(str(tmp_path))
    ck.save_step(2, {"x": np.arange(3)})
    ck.wait_until_finished()
    # Simulate a kill mid-save of step 5: staging dir, never committed.
    (tmp_path / "step_00000005.orbax-checkpoint-tmp-12345").mkdir()
    step, tree = ck.restore_latest({"x": np.zeros(3, np.int64)})
    assert step == 2
    np.testing.assert_array_equal(tree["x"], np.arange(3))


def test_training_survives_sigkill_and_resumes(tmp_path):
    """Integration: SIGKILL a real cli.train subprocess mid-run (after at
    least one epoch checkpoint landed), rerun the same command, and the
    second run must RESUME (log a resume record with epoch > 0) and
    finish all epochs."""
    import json as _json
    import os as _os
    import signal
    import subprocess
    import sys
    import time as _time

    from honk_tpu import data as D

    root = str(tmp_path / "sc")
    D.generate_dataset(root, clips_per_word=8, n_speakers=4, noise_seconds=2)
    mfile = str(tmp_path / "m.jsonl")
    ck = str(tmp_path / "ck")
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    # python -c wrapper: only a config update reliably forces the CPU
    # backend in a subprocess (sitecustomize overrides JAX_PLATFORMS).
    wrapper = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','/tmp/jax_test_compile_cache');"
        "from honk_tpu.cli.train import main; import sys;"
        "raise SystemExit(main(sys.argv[1:]))"
    )
    cmd = [
        sys.executable, "-c", wrapper, "--type", "train",
        "--model", "res8-narrow", "--data_dir", root,
        "--n_epochs", "6", "--lr", "0.01", "--schedule",
        "--batch_size", "16", "--eval_batch_size", "32",
        "--save_every_epochs", "1", "--steps_per_call", "4",
        "--output_dir", ck, "--metrics_jsonl", mfile,
    ]
    env = dict(_os.environ, PYTHONPATH=repo)
    env.pop("XLA_FLAGS", None)
    p = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # Wait until >= 2 epochs are durably checkpointed, then kill hard.
    deadline = _time.time() + 300
    while _time.time() < deadline:
        steps = [d for d in (_os.listdir(ck) if _os.path.isdir(ck) else []) if d.startswith("step_") and "." not in d]
        if len(steps) >= 2:
            break
        if p.poll() is not None:
            break
        _time.sleep(0.2)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)  # exact child PID (no pattern kills)
        p.wait()
        killed = True
    else:
        killed = False  # tiny run finished before 2 saves; resume still tested below
    assert _os.path.isdir(ck) and any(d.startswith("step_") for d in _os.listdir(ck))

    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [_json.loads(l) for l in open(mfile)]
    finals = [r for r in rows if r["kind"] == "final"]
    assert finals, "second run must complete"
    if killed:
        resumes = [r for r in rows if r["kind"] == "resume"]
        assert resumes and resumes[-1]["epoch"] > 0, "second run must resume, not restart"


def test_stream_push_many_matches_individual_pushes(service):
    """The coalesced batched tick (one masked dispatch for N sessions)
    must produce exactly the same posteriors/events as advancing each
    session with its own push — including over HTTP."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    scfg = StreamConfig(smoothing_window=3)
    rng = np.random.default_rng(21)
    n, chunk, ticks = 3, 3200, 4
    audio = (rng.standard_normal((n, ticks * chunk)) * 0.1).astype(np.float32)

    hub_a = StreamHub(service, n_slots=4, cfg=scfg, chunk_samples=chunk)
    hub_b = StreamHub(service, n_slots=4, cfg=scfg, chunk_samples=chunk)
    sids_a = [hub_a.open() for _ in range(n)]
    sids_b = [hub_b.open() for _ in range(n)]
    for t in range(ticks):
        batched = hub_a.push_many(
            {sids_a[i]: audio[i, t * chunk : (t + 1) * chunk] for i in range(n)}
        )
        for i in range(n):
            single = hub_b.push(sids_b[i], audio[i, t * chunk : (t + 1) * chunk])
            np.testing.assert_allclose(
                batched[sids_a[i]]["posterior"], single["posterior"], atol=1e-5
            )

    # And over HTTP: one /stream/push_many call advances all sessions;
    # posteriors must match a fresh hub advanced directly (modulo int16
    # quantization of the HTTP chunk payload).
    hub_c = StreamHub(service, n_slots=4, cfg=scfg, chunk_samples=chunk)
    sids_c = [hub_c.open() for _ in range(n)]
    ref = hub_c.push_many({sids_c[i]: audio[i, :chunk] for i in range(n)})

    httpd = serve(service, port=0, enable_training=False, n_stream_slots=4, stream_cfg=scfg)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        sids = [_post(port, "/stream/open", {})["stream_id"] for _ in range(n)]
        payload = {}
        for i in range(n):
            pcm = (audio[i, :chunk] * 32767).astype("<i2").tobytes()
            payload[sids[i]] = base64.b64encode(pcm).decode()
        out = _post(port, "/stream/push_many", {"chunks": payload})
        assert set(out["results"]) == set(sids)
        for i in range(n):
            np.testing.assert_allclose(
                out["results"][sids[i]]["posterior"],
                ref[sids_c[i]]["posterior"],
                atol=2e-3,
            )
    finally:
        httpd.shutdown()


def test_http_demo_page(service):
    """GET / serves the browser demo page with the service's labels."""
    httpd = serve(service, port=0, enable_training=False, n_stream_slots=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        assert "honk_tpu" in page and "/listen" in page
        # live-stream mode drives the session API from the browser
        assert "/stream/open" in page and "/stream/push" in page and "/stream/close" in page
        assert json.dumps(service.labels) in page
    finally:
        httpd.shutdown()


# ---------------------------------------------------------------------------
# Round-4 serving-hub coverage (VERDICT r3 #3a/#7, ADVICE r3): incremental
# O(1) session detection == batch recompute, concurrent multi-thread load on
# one hub, and live weight refresh reaching open sessions.
# ---------------------------------------------------------------------------


def test_stream_session_incremental_matches_batch_recompute(service):
    """A session's incrementally-emitted events (StreamDetector, O(1)
    state) must be byte-identical to re-running detect_stream over the
    full posterior history — the recompute the hub no longer performs."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import detect_stream

    scfg = StreamConfig(smoothing_window=3, detection_threshold=0.3, min_gap_windows=3)
    chunk, ticks = 3200, 40
    hub = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    sid = hub.open()
    rng = np.random.default_rng(41)
    series, incremental = [], []
    for t in range(ticks):
        out = hub.push(sid, (rng.standard_normal(chunk) * 0.3).astype(np.float32))
        series.append(np.asarray(out["posterior"], np.float32))
        incremental.extend(out["events"])
    batch = detect_stream(np.stack(series), scfg, chunk)
    batch_json = [
        {"time_s": round(e.time_s, 3), "label": service.labels[e.label], "prob": round(e.score, 4)}
        for e in batch
    ]
    # Posteriors are rounded to 6 decimals over the JSON surface; scores can
    # differ in the 4th decimal, so compare times/labels exactly and probs
    # loosely.
    assert [(e["time_s"], e["label"]) for e in incremental] == [
        (e["time_s"], e["label"]) for e in batch_json
    ]
    for a, b in zip(incremental, batch_json):
        assert abs(a["prob"] - b["prob"]) < 1e-3
    closed = hub.close(sid)
    assert closed["events"] == incremental  # close returns the full history


def test_stream_hub_concurrent_load(service):
    """VERDICT r3 #7: >=4 threads doing interleaved open/push/close against
    ONE hub — no deadlock, no cross-session contamination (each thread's
    posteriors equal an independent Streamer on its own audio), and slots
    recycle correctly under contention."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    from honk_tpu.serve import StreamHub

    n_threads, chunk, ticks = 4, 3200, 6
    hub = StreamHub(service, n_slots=n_threads, cfg=scfg, chunk_samples=chunk)
    rng = np.random.default_rng(77)
    audio = (rng.standard_normal((n_threads, ticks * chunk)) * 0.1).astype(np.float32)

    # Reference: independent streamers per thread-track.
    ref = []
    for i in range(n_threads):
        s = Streamer(service.model, service.variables, scfg, chunk)
        st = s.reset()
        rows = []
        for t in range(ticks):
            st, post = s.process(st, audio[i, t * chunk : (t + 1) * chunk])
            rows.append(np.asarray(post))
        ref.append(np.stack(rows))

    errors = []

    def worker(i):
        try:
            for _round in range(2):  # close + reopen: slot recycling under load
                sid = hub.open()
                for t in range(ticks):
                    out = hub.push(sid, audio[i, t * chunk : (t + 1) * chunk])
                    np.testing.assert_allclose(
                        np.asarray(out["posterior"]), ref[i][t], atol=1e-5
                    )
                hub.close(sid)
        except Exception as e:  # pragma: no cover - surfaced via errors list
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
        assert not th.is_alive(), "hub deadlocked under concurrent load"
    assert not errors, errors
    # All slots recycled: a full house opens again.
    sids = [hub.open() for _ in range(n_threads)]
    for sid in sids:
        hub.close(sid)


def test_hub_set_variables_reaches_open_sessions(service):
    """ADVICE r3: weight swaps (e.g. /train personalization) must reach
    already-open stream sessions from their next chunk — the slab takes
    weights as a traced argument, not a baked-in constant."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    chunk = 3200
    model = service.model
    new_vars = model.init(
        jax.random.PRNGKey(123), jnp.zeros((1, 101, 40), jnp.float32), train=False
    )
    rng = np.random.default_rng(55)
    a0 = (rng.standard_normal(chunk) * 0.1).astype(np.float32)
    a1 = (rng.standard_normal(chunk) * 0.1).astype(np.float32)

    # Reference: single streamer with the same mid-stream swap.
    s = Streamer(model, service.variables, scfg, chunk)
    st = s.reset()
    st, p0 = s.process(st, a0)
    s.set_variables(new_vars)
    st, p1 = s.process(st, a1)

    hub = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    sid = hub.open()
    out0 = hub.push(sid, a0)
    hub.set_variables(new_vars)
    out1 = hub.push(sid, a1)
    np.testing.assert_allclose(np.asarray(out0["posterior"]), np.asarray(p0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["posterior"]), np.asarray(p1), atol=1e-5)
    # The swap actually changed behaviour (different random init).
    assert not np.allclose(np.asarray(p1), np.asarray(p0), atol=1e-3)
    hub.close(sid)


def test_stream_hub_survives_fetch_failure(service):
    """A device-fetch failure mid-push must raise to the caller but NOT
    wedge the session: tickets always advance (try/finally in push_many),
    so later pushes and close() cannot deadlock on the apply condition."""
    from honk_tpu.serve import StreamHub

    hub = StreamHub(service, n_slots=2, chunk_samples=3200)
    sid = hub.open()
    chunk = np.zeros(3200, np.float32)
    real_process = hub._bs.process

    class Boom:
        def __array__(self, *a, **k):
            raise RuntimeError("device lost")

    def bad_process(state, chunks, mask):
        state, _post = real_process(state, chunks, mask)
        return state, Boom()

    hub._bs.process = bad_process
    try:
        with pytest.raises(RuntimeError, match="device lost"):
            hub.push(sid, chunk)
    finally:
        hub._bs.process = real_process
    out = hub.push(sid, chunk)  # session still usable, no deadlock
    assert "posterior" in out
    assert "events" in hub.close(sid)


# ---------------------------------------------------------------------------
# Round-5 serving-path coverage (VERDICT r4 #1/#5): binary push frames,
# cross-gateway tick coalescing, and explicit degraded-session semantics
# after a device-fetch failure.
# ---------------------------------------------------------------------------


def _post_bin(port, sids, rows, posterior=False):
    """POST /stream/push_bin: u32 header_len | header JSON | PCM16 LE."""
    header = json.dumps({"stream_ids": sids, "posterior": posterior}).encode()
    pcm = (np.concatenate(rows) * 32767).astype("<i2").tobytes()
    body = len(header).to_bytes(4, "little") + header + pcm
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/stream/push_bin",
        data=body,
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_stream_push_bin_matches_json_push_many(service):
    """The binary gateway frame must advance sessions identically to the
    JSON push_many path on the same PCM16 chunks; posterior is omitted by
    default and included on request; malformed frames are 400."""
    from honk_tpu.config import StreamConfig

    scfg = StreamConfig(smoothing_window=3)
    n, chunk, ticks = 3, 3200, 3
    rng = np.random.default_rng(33)
    audio = (rng.standard_normal((n, ticks * chunk)) * 0.1).astype(np.float32)
    # Quantize once so both paths see the SAME int16 audio.
    audio = (audio * 32767).astype(np.int16).astype(np.float32) / 32767.0

    httpd = serve(service, port=0, enable_training=False, n_stream_slots=2 * n, stream_cfg=scfg)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        sids_bin = [_post(port, "/stream/open", {})["stream_id"] for _ in range(n)]
        sids_json = [_post(port, "/stream/open", {})["stream_id"] for _ in range(n)]
        for t in range(ticks):
            rows = [audio[i, t * chunk : (t + 1) * chunk] for i in range(n)]
            out_bin = _post_bin(port, sids_bin, rows, posterior=(t == ticks - 1))
            payload = {
                sids_json[i]: base64.b64encode(
                    (rows[i] * 32767).astype("<i2").tobytes()
                ).decode()
                for i in range(n)
            }
            out_json = _post(port, "/stream/push_many", {"chunks": payload})
            for i in range(n):
                b = out_bin["results"][sids_bin[i]]
                j = out_json["results"][sids_json[i]]
                assert b["label"] == j["label"]
                # int16 round-trips differ by <=1 LSB between the two
                # encodes; posteriors agree to quantization tolerance.
                assert abs(b["prob"] - j["prob"]) < 2e-3
                assert [e["label"] for e in b["events"]] == [
                    e["label"] for e in j["events"]
                ]
                if t == ticks - 1:
                    np.testing.assert_allclose(b["posterior"], j["posterior"], atol=2e-3)
                else:
                    assert "posterior" not in b  # binary path skips it by default

        # malformed: payload length mismatch -> 400
        header = json.dumps({"stream_ids": sids_bin}).encode()
        bad = len(header).to_bytes(4, "little") + header + b"\x00\x00"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stream/push_bin", data=bad,
            headers={"Content-Type": "application/octet-stream"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_stream_open_slot_exhaustion_is_503(service):
    """Capacity (all slots in use) is 503, not 400 (ADVICE r4)."""
    httpd = serve(service, port=0, enable_training=False, n_stream_slots=1)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        sid = _post(port, "/stream/open", {})["stream_id"]
        try:
            _post(port, "/stream/open", {})
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        _post(port, "/stream/close", {"stream_id": sid})
    finally:
        httpd.shutdown()


def test_hub_coalesces_concurrent_pushes(service):
    """Concurrent push_many calls from different threads must MERGE into
    shared slab dispatches (the full-slab serving path, VERDICT r4 #1) —
    and the coalesced results must still equal independent Streamers."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    n_threads, chunk, ticks = 4, 3200, 5
    hub = StreamHub(service, n_slots=n_threads, cfg=scfg, chunk_samples=chunk,
                    coalesce_ms=200.0)
    rng = np.random.default_rng(91)
    audio = (rng.standard_normal((n_threads, ticks * chunk)) * 0.1).astype(np.float32)

    ref = []
    for i in range(n_threads):
        s = Streamer(service.model, service.variables, scfg, chunk)
        st = s.reset()
        rows = []
        for t in range(ticks):
            st, post = s.process(st, audio[i, t * chunk : (t + 1) * chunk])
            rows.append(np.asarray(post))
        ref.append(np.stack(rows))

    dispatches = [0]
    real_process = hub._bs.process

    def counting_process(state, chunks, mask):
        dispatches[0] += 1
        return real_process(state, chunks, mask)

    hub._bs.process = counting_process
    sids = [hub.open() for _ in range(n_threads)]
    barrier = threading.Barrier(n_threads)
    errors = []

    def worker(i):
        try:
            for t in range(ticks):
                barrier.wait(timeout=60)
                out = hub.push(sids[i], audio[i, t * chunk : (t + 1) * chunk])
                np.testing.assert_allclose(
                    np.asarray(out["posterior"]), ref[i][t], atol=1e-5
                )
        except Exception as e:  # pragma: no cover
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
        assert not th.is_alive(), "hub deadlocked under coalesced load"
    assert not errors, errors
    # Coalescing must have merged pushes: without it this is exactly
    # n_threads * ticks dispatches. The barrier makes every round's four
    # pushes near-simultaneous, so most rounds coalesce fully; allow
    # scheduling slop but require a real reduction.
    assert dispatches[0] <= n_threads * ticks * 0.75, dispatches[0]
    for sid in sids:
        hub.close(sid)


def test_fetch_failure_degrades_session_with_aligned_times(service):
    """VERDICT r4 #5 semantics: after a device-fetch failure the device
    ring HAS consumed the chunk, so the hub advances the detector cursor —
    later event TIMES stay aligned with a never-failed session, exactly
    the lost row's own event is missing, and the session is surfaced as
    degraded on subsequent pushes and on close."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    # min_gap_windows=1 -> no refractory coupling between rows, so the
    # only possible difference is the lost row's own event.
    scfg = StreamConfig(smoothing_window=2, detection_threshold=0.05, min_gap_windows=1)
    chunk, ticks, fail_at = 3200, 8, 3
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal((ticks, chunk)) * 0.3).astype(np.float32)

    hub_ok = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    hub_bad = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    sid_ok, sid_bad = hub_ok.open(), hub_bad.open()

    class Boom:
        def __array__(self, *a, **k):
            raise RuntimeError("device lost")

    real_process = hub_bad._bs.process

    def bad_process(state, chunks, mask):
        state, _post = real_process(state, chunks, mask)
        return state, Boom()

    ok_events, bad_events = [], []
    for t in range(ticks):
        out_ok = hub_ok.push(sid_ok, audio[t])
        ok_events.append(out_ok["events"])
        if t == fail_at:
            hub_bad._bs.process = bad_process
            with pytest.raises(RuntimeError, match="device lost"):
                hub_bad.push(sid_bad, audio[t])
            hub_bad._bs.process = real_process
            bad_events.append([])  # the lost row's events are gone
        else:
            out_bad = hub_bad.push(sid_bad, audio[t])
            bad_events.append(out_bad["events"])
            if t > fail_at:
                assert out_bad.get("degraded") is True  # surfaced
            else:
                assert "degraded" not in out_bad
        assert "degraded" not in out_ok

    # Every tick OTHER than the failed one produced identical events —
    # same times, labels, probs: the time axis did not shift.
    for t in range(ticks):
        if t != fail_at:
            assert bad_events[t] == ok_events[t], (t, bad_events[t], ok_events[t])

    closed_bad = hub_bad.close(sid_bad)
    assert closed_bad.get("degraded") is True
    closed_ok = hub_ok.close(sid_ok)
    lost = ok_events[fail_at]
    assert closed_ok["events"] == [e for evs in ok_events for e in evs]
    # The degraded session's history is the clean history minus exactly
    # the lost row's events.
    expect = [e for t, evs in enumerate(ok_events) if t != fail_at for e in evs]
    assert closed_bad["events"] == expect
    # This scenario must actually exercise an event stream (otherwise the
    # test proves nothing): require at least one event somewhere.
    assert sum(len(e) for e in ok_events) >= 1, "scenario produced no events"
    del lost


def test_pipelined_hub_is_exactly_lag_one(service):
    """Pipelined (double-buffered) mode: a push's response carries EXACTLY
    the session's previous chunk's result (posterior/label/events), the
    first push is pending, and close() flushes the final chunk — the full
    event history equals the synchronous hub's on the same audio."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    scfg = StreamConfig(smoothing_window=3, detection_threshold=0.05, min_gap_windows=2)
    chunk, ticks = 3200, 10
    rng = np.random.default_rng(17)
    audio = (rng.standard_normal((ticks, chunk)) * 0.3).astype(np.float32)

    hub_sync = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    hub_pipe = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk, pipelined=True)
    sid_s, sid_p = hub_sync.open(), hub_pipe.open()

    sync_out, pipe_out = [], []
    for t in range(ticks):
        sync_out.append(hub_sync.push(sid_s, audio[t]))
        pipe_out.append(hub_pipe.push(sid_p, audio[t]))

    assert pipe_out[0].get("pending") is True and pipe_out[0]["events"] == []
    for t in range(1, ticks):
        assert "pending" not in pipe_out[t]
        assert pipe_out[t]["label"] == sync_out[t - 1]["label"]
        assert pipe_out[t]["prob"] == sync_out[t - 1]["prob"]
        assert pipe_out[t]["posterior"] == sync_out[t - 1]["posterior"]
        assert pipe_out[t]["events"] == sync_out[t - 1]["events"]

    closed_s = hub_sync.close(sid_s)
    closed_p = hub_pipe.close(sid_p)  # flushes the last chunk's result
    assert closed_p["events"] == closed_s["events"]
    assert len(closed_s["events"]) >= 1, "scenario produced no events"


def test_pipelined_hub_concurrent_sessions_match_streamers(service):
    """Pipelined mode under concurrent multi-thread load: every session's
    lag-1 posteriors equal an independent Streamer's, and close() flushes."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    n_threads, chunk, ticks = 4, 3200, 6
    hub = StreamHub(service, n_slots=n_threads, cfg=scfg, chunk_samples=chunk,
                    coalesce_ms=50.0, pipelined=True)
    rng = np.random.default_rng(23)
    audio = (rng.standard_normal((n_threads, ticks * chunk)) * 0.1).astype(np.float32)

    ref = []
    for i in range(n_threads):
        s = Streamer(service.model, service.variables, scfg, chunk)
        st = s.reset()
        rows = []
        for t in range(ticks):
            st, post = s.process(st, audio[i, t * chunk : (t + 1) * chunk])
            rows.append(np.asarray(post))
        ref.append(np.stack(rows))

    sids = [hub.open() for _ in range(n_threads)]
    errors = []

    def worker(i):
        try:
            for t in range(ticks):
                out = hub.push(sids[i], audio[i, t * chunk : (t + 1) * chunk])
                if t == 0:
                    assert out.get("pending") is True
                else:
                    np.testing.assert_allclose(
                        np.asarray(out["posterior"]), ref[i][t - 1], atol=1e-5
                    )
        except Exception as e:  # pragma: no cover
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
        assert not th.is_alive(), "pipelined hub deadlocked"
    assert not errors, errors
    for sid in sids:
        hub.close(sid)


def test_restore_latest_mismatched_run_is_actionable(tmp_path):
    """Resuming into a checkpoint dir written by a DIFFERENT run (other
    model/corpus/split) must fail with an actionable error, not an opaque
    orbax tree mismatch (round-5 field failure: stale default
    --output_dir)."""
    from honk_tpu.ckpt import Checkpointer

    ck = Checkpointer(str(tmp_path))
    ck.save_step(5, {"params": {"conv0": np.zeros((3, 3), np.float32)}, "epoch": 1})
    ck.wait_until_finished()
    with pytest.raises(RuntimeError, match="different run's checkpoints"):
        # Different tree structure (another model's param/opt layout).
        ck.restore_latest(
            {"params": {"dense": np.zeros((4,), np.float32),
                        "bn": np.zeros((2,), np.float32)}, "epoch": 0}
        )


def test_restore_latest_shape_mismatch_is_actionable(tmp_path):
    """Orbax validates tree structure but NOT leaf shapes; a
    same-structure checkpoint from another run must be caught at restore
    time (clear error) rather than at the first train step."""
    from honk_tpu.ckpt import Checkpointer

    ck = Checkpointer(str(tmp_path))
    ck.save_step(7, {"params": np.arange(9, dtype=np.float32).reshape(3, 3), "epoch": 1})
    ck.wait_until_finished()
    with pytest.raises(RuntimeError, match="different run's checkpoints"):
        ck.restore_latest({"params": np.zeros((7, 2), np.float32), "epoch": 0})


def test_pipelined_hub_open_close_churn(service):
    """Chaos coverage for the pipelined hub's riskiest interleavings:
    threads continuously open/push/close sessions (slot recycling under
    coalescing + background fetchers) while others stream steadily. No
    deadlock, no cross-session contamination: every session's lag-1
    posteriors equal an independent Streamer on its own audio."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    chunk, ticks, churn_rounds = 3200, 4, 3
    hub = StreamHub(service, n_slots=4, cfg=scfg, chunk_samples=chunk,
                    coalesce_ms=10.0, pipelined=True)
    rng = np.random.default_rng(101)
    audio = (rng.standard_normal((4, ticks * chunk)) * 0.1).astype(np.float32)

    ref = []
    for i in range(4):
        s = Streamer(service.model, service.variables, scfg, chunk)
        st = s.reset()
        rows = []
        for t in range(ticks):
            st, post = s.process(st, audio[i, t * chunk : (t + 1) * chunk])
            rows.append(np.asarray(post))
        ref.append(np.stack(rows))

    errors = []

    def churner(i):
        # Fresh session per round: exercises slot recycle + close-flush
        # while other sessions are mid-tick.
        try:
            for _ in range(churn_rounds):
                sid = hub.open()
                for t in range(ticks):
                    out = hub.push(sid, audio[i, t * chunk : (t + 1) * chunk])
                    if t == 0:
                        assert out.get("pending") is True
                    else:
                        np.testing.assert_allclose(
                            np.asarray(out["posterior"]), ref[i][t - 1], atol=1e-5
                        )
                hub.close(sid)
        except Exception as e:  # pragma: no cover
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=churner, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
        assert not th.is_alive(), "pipelined hub deadlocked under churn"
    assert not errors, errors
    # All slots recycled cleanly.
    sids = [hub.open() for _ in range(4)]
    for sid in sids:
        hub.close(sid)


def test_int16_wire_hub_matches_float_wire_exactly(service):
    """wire_dtype="int16" ships raw PCM16 to the device and decodes
    on-chip; for PCM16-derived audio (every HTTP path) the round trip is
    EXACT, so posteriors and events must equal the float-wire hub's
    bit-for-bit."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    scfg = StreamConfig(smoothing_window=3, detection_threshold=0.05, min_gap_windows=2)
    chunk, ticks = 3200, 6
    rng = np.random.default_rng(61)
    pcm = (rng.standard_normal((ticks, chunk)) * 9000).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0  # _decode_pcm16 convention

    hub_f = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk)
    hub_i = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk,
                      wire_dtype="int16")
    sid_f, sid_i = hub_f.open(), hub_i.open()
    for t in range(ticks):
        out_f = hub_f.push(sid_f, as_float[t])
        # int16 hub accepts the float form too (exact re-quantization)...
        out_i = hub_i.push(sid_i, as_float[t])
        assert out_i["posterior"] == out_f["posterior"]
        assert out_i["events"] == out_f["events"]
    # ...and raw int16 rows through push_rows (the binary HTTP path).
    hub_r = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk,
                      wire_dtype="int16")
    sid_r = hub_r.open()
    for t in range(ticks):
        out_r = hub_r.push_rows([sid_r], pcm[t : t + 1])[sid_r]
        # same series as hub_i: identical posteriors tick for tick
    assert hub_r.close(sid_r)["events"] == hub_i.close(sid_i)["events"]
    hub_f.close(sid_f)


def test_pipelined_overlapped_pushes_keep_lag_one(service):
    """A streaming client may post chunk k+1 before reading chunk k's
    response (two requests in flight — the bench's --inflight shape).
    Every response must STILL be exactly the previous chunk's result: the
    lag-1 lookup reads the session's own previous tick directly, so no
    history can be evicted by later applies."""
    from concurrent.futures import ThreadPoolExecutor

    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub
    from honk_tpu.stream import Streamer

    scfg = StreamConfig(smoothing_window=3)
    chunk, ticks = 3200, 8
    hub = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk, pipelined=True)
    rng = np.random.default_rng(71)
    audio = (rng.standard_normal((ticks, chunk)) * 0.1).astype(np.float32)

    s = Streamer(service.model, service.variables, scfg, chunk)
    st = s.reset()
    ref = []
    for t in range(ticks):
        st, post = s.process(st, audio[t])
        ref.append(np.asarray(post))

    sid = hub.open()
    sess = hub._sessions[sid]
    outs = [None] * ticks
    with ThreadPoolExecutor(max_workers=2) as pool:
        pending = []
        for t in range(ticks):
            # Keep two pushes in flight. The hub's contract is ARRIVAL
            # order (like one pipelined HTTP connection), so order the
            # arrivals: wait until chunk t has joined a tick before
            # submitting t+1 — while t's response is still outstanding.
            before = sess.last_tick
            pending.append((t, pool.submit(hub.push, sid, audio[t])))
            deadline = time.time() + 30
            while sess.last_tick is before:
                assert time.time() < deadline, "push never joined a tick"
                time.sleep(0.001)
            if len(pending) == 2:
                i, fut = pending.pop(0)
                outs[i] = fut.result(timeout=60)
        for i, fut in pending:
            outs[i] = fut.result(timeout=60)
    assert outs[0].get("pending") is True
    for t in range(1, ticks):
        assert "pending" not in outs[t], (t, outs[t])
        np.testing.assert_allclose(
            np.asarray(outs[t]["posterior"]), ref[t - 1], atol=1e-5
        )
    closed = hub.close(sid)
    assert len(closed["events"]) >= 0
    hub.shutdown()


def test_pipelined_fetch_failure_yields_degraded_pending(service):
    """In pipelined mode a background fetch failure must NOT re-deliver an
    older chunk's result: the next push returns {pending, degraded} and
    later pushes carry the degraded flag with correct lag-1 results."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    scfg = StreamConfig(smoothing_window=3)
    chunk = 3200
    hub = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk, pipelined=True)
    sid = hub.open()
    rng = np.random.default_rng(87)
    chunks = (rng.standard_normal((6, chunk)) * 0.1).astype(np.float32)

    class Boom:
        def __array__(self, *a, **k):
            raise RuntimeError("device lost")

    real_process = hub._bs.process
    fail_once = [True]

    def flaky_process(state, chs, mask):
        state, post = real_process(state, chs, mask)
        if fail_once[0]:
            fail_once[0] = False
            return state, Boom()
        return state, post

    out0 = hub.push(sid, chunks[0])  # first push: pending (no failure yet)
    assert out0.get("pending") is True and "degraded" not in out0
    hub._bs.process = flaky_process
    try:
        out1 = hub.push(sid, chunks[1])  # tick 1 dispatch ok, its FETCH fails
    finally:
        hub._bs.process = real_process
    # out1 returns tick 0's result: fine, fetched before the failure.
    assert "pending" not in out1
    out2 = hub.push(sid, chunks[2])
    # tick 1's fetch failed -> no result to deliver; degraded, not a
    # re-delivery of tick 0's result.
    assert out2.get("pending") is True and out2.get("degraded") is True
    out3 = hub.push(sid, chunks[3])
    # tick 2 fetched fine; subsequent results flow again, flagged degraded.
    assert "pending" not in out3 and out3.get("degraded") is True
    closed = hub.close(sid)
    assert closed.get("degraded") is True
    hub.shutdown()


def test_pipelined_dispatch_failure_rolls_back_session_chain(service):
    """A DISPATCH failure consumed nothing: the session's tick chain must
    roll back so the NEXT push still delivers the previous chunk's lag-1
    result — not a spurious degraded/pending against the failed tick."""
    from honk_tpu.config import StreamConfig
    from honk_tpu.serve import StreamHub

    scfg = StreamConfig(smoothing_window=3)
    chunk = 3200
    hub = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk, pipelined=True)
    sid = hub.open()
    rng = np.random.default_rng(93)
    chunks = (rng.standard_normal((4, chunk)) * 0.1).astype(np.float32)

    out0 = hub.push(sid, chunks[0])
    assert out0.get("pending") is True
    out1 = hub.push(sid, chunks[1])  # delivers chunk 0's result
    assert "pending" not in out1

    real_process = hub._bs.process

    def broken_process(state, chs, mask):
        raise RuntimeError("dispatch refused")

    hub._bs.process = broken_process
    try:
        with pytest.raises(RuntimeError, match="dispatch refused"):
            hub.push(sid, chunks[2])
    finally:
        hub._bs.process = real_process
    # The failed dispatch consumed nothing: re-pushing chunk 2 must return
    # chunk 1's result (normal lag-1), with NO degraded flag.
    out2 = hub.push(sid, chunks[2])
    assert "pending" not in out2 and "degraded" not in out2
    # And it is exactly chunk 1's result: compare against a clean hub.
    hub2 = StreamHub(service, n_slots=2, cfg=scfg, chunk_samples=chunk, pipelined=True)
    sid2 = hub2.open()
    hub2.push(sid2, chunks[0])
    hub2.push(sid2, chunks[1])
    ref2 = hub2.push(sid2, chunks[2])
    assert out2["posterior"] == ref2["posterior"]
    hub.close(sid)
    hub2.close(sid2)
    hub.shutdown()
    hub2.shutdown()


def test_apply_exception_does_not_wedge_the_hub(service):
    """An exception inside the vectorized apply must advance the global
    apply sequence anyway (surfacing like a fetch failure) — otherwise
    every later tick's apply waits forever and the whole hub hangs."""
    from honk_tpu.serve import StreamHub

    hub = StreamHub(service, n_slots=2, chunk_samples=3200)
    sid = hub.open()
    chunk = np.zeros(3200, np.float32)

    real_apply = hub._apply
    boom = [True]

    def flaky_apply(tick, fetched):
        if boom[0]:
            boom[0] = False
            raise RuntimeError("apply exploded")
        return real_apply(tick, fetched)

    hub._apply = flaky_apply
    with pytest.raises(RuntimeError, match="apply exploded"):
        hub.push(sid, chunk)
    # The seq chain advanced despite the exception: later pushes and
    # close() complete instead of hanging on the apply condition.
    out = hub.push(sid, chunk)
    assert "posterior" in out
    assert "events" in hub.close(sid)


def test_push_bin_fuzz_never_kills_the_connection(service):
    """Malformed binary frames (random bytes, truncated headers, non-dict
    headers, wrong payload sizes, bogus lengths) must each produce a 4xx
    JSON error WITHOUT desyncing the keep-alive connection — a valid
    request afterwards on the SAME connection must still succeed."""
    import http.client

    httpd = serve(service, port=0, enable_training=False, n_stream_slots=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port)

        def post(path, body, ctype="application/octet-stream"):
            conn.request("POST", path, body, {"Content-Type": ctype})
            r = conn.getresponse()
            data = r.read()
            return r.status, json.loads(data)

        status, o = post("/stream/open", b"{}", "application/json")
        assert status == 200
        sid = o["stream_id"]
        good_header = json.dumps({"stream_ids": [sid]}).encode()
        good = (
            len(good_header).to_bytes(4, "little") + good_header
            + b"\x00\x00" * 3200
        )

        rng = np.random.default_rng(5)
        frames = [
            b"",  # empty body
            b"\x01",  # shorter than the length prefix
            (10**6).to_bytes(4, "little") + b"{}",  # header length > body
            len(b"[1,2]").to_bytes(4, "little") + b"[1,2]",  # non-dict header
            len(b'{"x":1}').to_bytes(4, "little") + b'{"x":1}',  # no stream_ids
            len(good_header).to_bytes(4, "little") + good_header + b"\x00" * 7,  # odd/short payload
            rng.bytes(200),  # random garbage
            len(b'{"stream_ids":["nope"]}').to_bytes(4, "little")
            + b'{"stream_ids":["nope"]}' + b"\x00\x00" * 3200,  # unknown sid
        ]
        for i, frame in enumerate(frames):
            status, err = post("/stream/push_bin", frame)
            assert 400 <= status < 500, (i, status, err)
            assert "error" in err, (i, err)
            # The connection survives: a VALID push right after succeeds.
            status, ok = post("/stream/push_bin", good)
            assert status == 200 and sid in ok["results"], (i, status, ok)
        status, _ = post("/stream/close", json.dumps({"stream_id": sid}).encode(),
                         "application/json")
        assert status == 200
        conn.close()
    finally:
        httpd.shutdown()
