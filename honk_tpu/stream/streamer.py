"""Streaming continuous keyword detection over long/unbounded audio.

Equivalent of reference ``service.py::stride`` + ``utils/speech_demo.py``
(overlapping 1 s windows evaluated every hop, posteriors smoothed, then
thresholded — SURVEY.md §3.4), redesigned TPU-first (BASELINE.json:11):

- **Offline/batched** (``stream_file``): every 10 ms MFCC frame of the
  long audio is computed exactly once by the batched GEMM frontend, then
  overlapping 101-frame windows are *views* over the frame axis (a
  gather), and the classifier runs over all windows as one batch. This is
  the vectorized form of the "persistent feature buffer — recompute only
  the new frames" optimization: per window only hop/10ms new frames of
  frontend work, O(1) in window overlap.
- **Online/stateful** (``Streamer``): fixed-size chunks feed a persistent
  on-chip feature ring buffer; each chunk computes only its own new
  frames' MFCCs, pushes them into the ring, and scores the current
  window. State is a pytree of fixed-shape device arrays — the step is
  one jit-ed program, O(1) memory in stream length.

Posterior smoothing: mean of the last ``smoothing_window`` window
posteriors; a detection fires when the smoothed probability of a
non-silence/non-unknown label exceeds ``detection_threshold``, with a
refractory gap of ``min_gap_windows`` between fires.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamConfig
from ..frontend import filters as F
from ..frontend.mfcc import compute_mfccs, power_spectrum, mel_log, _consts, _mm

WINDOW_FRAMES = F.N_FRAMES  # 101
HOP = F.HOP_LENGTH  # 160
NFFT = F.N_FFT  # 480


def frame_mfccs(audio: jax.Array) -> jax.Array:
    """All center=True MFCC frames of arbitrary-length audio: (L,) -> (n_frames, 40)."""
    pad = NFFT // 2
    padded = jnp.pad(audio[None, :], ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + audio.shape[0] // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(NFFT)[None, :]
    frames = padded[0, idx]
    return _mfcc_of_frames(frames)


def _mfcc_of_frames(frames: jax.Array) -> jax.Array:
    """(n, 480) raw sample frames -> (n, 40) MFCC (shared GEMM path)."""
    c = _consts()
    p = power_spectrum(frames[None])[0]
    m = mel_log(p[None])[0]
    return _mm(m, c["dct"])


@functools.partial(jax.jit, static_argnames=("hop_frames", "batch"))
def _window_gather(feats: jax.Array, hop_frames: int, batch: int) -> jax.Array:
    """(n_frames, 40) -> (batch, 101, 40) overlapping windows."""
    starts = jnp.arange(batch) * hop_frames
    idx = starts[:, None] + jnp.arange(WINDOW_FRAMES)[None, :]
    return feats[idx]


def smooth_posteriors(post: jax.Array, w: int) -> jax.Array:
    """Trailing mean over the window axis: (n, L) -> (n, L)."""
    n = post.shape[0]
    cs = jnp.cumsum(post, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    starts = jnp.maximum(jnp.arange(n) - w + 1, 0)
    counts = (jnp.arange(n) - starts + 1).astype(post.dtype)
    return (cs[jnp.arange(n) + 1] - cs[starts]) / counts[:, None]


@dataclasses.dataclass
class Detection:
    time_s: float
    label: int
    score: float


@dataclasses.dataclass
class DetectorState:
    """O(1) cursor for incremental event detection.

    Carries exactly the state ``detect`` threads through its loop: the
    window index and the last fire index. A long-lived serving session
    advances this one smoothed row at a time (``detect_step``) and gets
    byte-identical events to re-running ``detect`` over the full series.
    """

    i: int = 0
    last_fire: int = -(10**9)


def detect_step(
    probs: np.ndarray, st: DetectorState, cfg: StreamConfig, hop_s: float
) -> Detection | None:
    """Advance the detector by ONE smoothed posterior row.

    Event semantics (shared by ``detect``/``detect_stream`` and the
    serving hub — tests/test_stream.py pins them):

    - A detection fires only when a keyword label is BOTH the overall
      argmax of the smoothed posterior AND above ``detection_threshold``.
      Requiring the overall argmax means windows where ``__silence__``/
      ``__unknown__`` carries most of the mass cannot fire a
      low-confidence keyword — this keeps the false-alarm rate on
      noise-only spans at zero (ground-truth planted-keyword tests).
    - The refractory gap ``min_gap_windows`` is GLOBAL: after any fire,
      nothing fires for the next ``min_gap_windows - 1`` windows,
      regardless of label. Smoothed posteriors are correlated over one
      window length (1 s), so an argmax flip inside the gap (default
      4 x 200 ms = 0.8 s < the 1 s window) is almost surely the same
      acoustic event being re-read, not a new keyword — firing it would
      let two labels alternating above threshold emit an event per
      window. Distinct keywords >= the gap apart each fire (tested).

    ``time_s`` is the START of the 1 s detection window.
    """
    i = st.i
    st.i += 1
    label = int(probs.argmax())
    if label < 2:  # silence/unknown wins the window -> no detection
        return None
    score = float(probs[label])
    if score < cfg.detection_threshold:
        return None
    if i - st.last_fire < cfg.min_gap_windows:
        return None
    st.last_fire = i
    return Detection(time_s=i * hop_s, label=label, score=score)


def detect(smoothed: np.ndarray, cfg: StreamConfig, hop_s: float) -> list[Detection]:
    """Threshold smoothed posteriors into detection events (host-side).

    Batch form of ``detect_step`` (same code path — see its docstring for
    the event semantics).
    """
    st = DetectorState()
    events: list[Detection] = []
    for i in range(smoothed.shape[0]):
        e = detect_step(smoothed[i], st, cfg, hop_s)
        if e is not None:
            events.append(e)
    return events


class StreamDetector:
    """Incremental ONLINE detector: one smoothed row per chunk, O(1) state.

    Wraps ``detect_step`` with the same window-start time shift as
    ``detect_stream`` so a serving session that feeds each ``Streamer``
    posterior as it arrives emits byte-identical events to re-running
    ``detect_stream`` over the whole accumulated series (tested) — without
    the O(n) memory / O(n^2) cumulative compute of the recompute.
    """

    def __init__(self, cfg: StreamConfig, chunk_samples: int):
        self.cfg = cfg
        self.hop_s = chunk_samples / F.SAMPLE_RATE
        self._shift = self.hop_s - WINDOW_FRAMES * HOP / F.SAMPLE_RATE
        self._st = DetectorState()

    def step(self, probs: np.ndarray) -> Detection | None:
        e = detect_step(probs, self._st, self.cfg, self.hop_s)
        if e is None:
            return None
        return Detection(
            time_s=max(0.0, e.time_s + self._shift), label=e.label, score=e.score
        )


def detect_stream(
    smoothed_series: np.ndarray, cfg: StreamConfig, chunk_samples: int
) -> list[Detection]:
    """Detection events from an ONLINE smoothed-posterior series.

    ``smoothed_series[c]`` is the posterior after feeding chunk ``c`` to a
    ``Streamer``; that step's (causal) window ends at sample
    ``(c+1)*chunk_samples``, so its start is that minus one window. Event
    times are shifted accordingly to be comparable with offline
    ``detect``/``stream_file`` times (both report window-start seconds).
    """
    hop_s = chunk_samples / F.SAMPLE_RATE
    shift = hop_s - WINDOW_FRAMES * HOP / F.SAMPLE_RATE  # ~ chunk - 1 s
    events = detect(np.asarray(smoothed_series), cfg, hop_s)
    return [
        Detection(time_s=max(0.0, e.time_s + shift), label=e.label, score=e.score)
        for e in events
    ]


def stream_file(
    model,
    variables: dict[str, Any],
    audio: np.ndarray,
    cfg: StreamConfig | None = None,
    data_axis: str | None = None,
) -> tuple[np.ndarray, list[Detection]]:
    """Offline continuous detection over a long mono waveform.

    Returns (smoothed posteriors (n_windows, n_labels), detections).

    With ``data_axis`` set (and an ambient mesh), the window batch is
    sharded across the mesh — hours of audio score data-parallel over a
    pod slice (windows are padded to a mesh multiple, classified, and
    the padding dropped; results are identical to the unsharded path).
    """
    cfg = cfg or StreamConfig()
    hop_frames = cfg.hop_samples // HOP
    audio_j = jnp.asarray(audio, jnp.float32)
    feats = frame_mfccs(audio_j)  # each frame computed exactly once
    n_frames = feats.shape[0]
    n_windows = max(0, (n_frames - WINDOW_FRAMES) // hop_frames + 1)
    if n_windows == 0:
        return np.zeros((0, 1)), []
    n_padded = n_windows
    if data_axis is not None:
        # Pad to a multiple of the AMBIENT MESH's data-axis size, not
        # jax.device_count(): under a sub-mesh (or any mesh whose named
        # axis size doesn't divide the process's device count) the two
        # differ and a device-count pad would not shard evenly.
        mesh_shape = dict(jax.sharding.get_abstract_mesh().shape)
        n_dev = mesh_shape.get(data_axis, jax.device_count())
        n_padded = -(-n_windows // n_dev) * n_dev
    windows = _window_gather(feats, hop_frames, n_windows)
    if n_padded != n_windows:
        windows = jnp.concatenate(
            [windows, jnp.zeros((n_padded - n_windows,) + windows.shape[1:], windows.dtype)]
        )
    if data_axis is not None:
        from jax.sharding import PartitionSpec as P

        windows = jax.lax.with_sharding_constraint(windows, P(data_axis))
    logits = model.apply(variables, windows, train=False)[:n_windows]
    post = jax.nn.softmax(logits, axis=-1)
    smoothed = np.asarray(smooth_posteriors(post, cfg.smoothing_window))
    hop_s = cfg.hop_samples / F.SAMPLE_RATE
    return smoothed, detect(smoothed, cfg, hop_s)


class StreamState(NamedTuple):
    """Fixed-shape device-resident streaming state (O(1) in stream length)."""

    sample_tail: jax.Array  # (NFFT,) last samples for framing context
    feat_ring: jax.Array  # (WINDOW_FRAMES, 40) rolling feature window
    post_ring: jax.Array  # (smoothing_window, n_labels) recent posteriors
    frames_seen: jax.Array  # () int32
    windows_seen: jax.Array  # () int32


class Streamer:
    """Online chunked streaming: one jit-ed step per fixed-size chunk.

    Chunk size must be a multiple of the 10 ms frame hop. Each step
    computes MFCCs for the chunk's new frames ONLY, rolls them into the
    persistent feature ring, scores the window, and pushes the posterior
    into the smoothing ring.
    """

    def __init__(self, model, variables, cfg: StreamConfig | None = None, chunk_samples: int = 3200):
        assert chunk_samples % HOP == 0, "chunk must be a multiple of the 10ms hop"
        self.cfg = cfg or StreamConfig()
        self.model = model
        self.variables = variables
        self.chunk = chunk_samples
        self.n_new = chunk_samples // HOP
        self.n_labels = int(model.config["n_labels"])
        self._step = jax.jit(self._step_impl)

    def set_variables(self, variables) -> None:
        """Swap model weights for subsequent steps (e.g. after /train
        personalization). The weights are a traced ARGUMENT of the jitted
        step, not a baked-in constant, so the swap takes effect on the
        next chunk with no recompile (same shapes)."""
        self.variables = variables

    def reset(self) -> StreamState:
        return StreamState(
            sample_tail=jnp.zeros((NFFT,), jnp.float32),
            feat_ring=jnp.zeros((WINDOW_FRAMES, F.N_DCT), jnp.float32),
            post_ring=jnp.zeros((self.cfg.smoothing_window, self.n_labels), jnp.float32),
            frames_seen=jnp.zeros((), jnp.int32),
            windows_seen=jnp.zeros((), jnp.int32),
        )

    def _step_impl(self, variables, state: StreamState, chunk: jax.Array):
        # PCM16 wire format decodes ON DEVICE: serving can ship raw int16
        # (half the host->device bytes of float32, zero host conversion)
        # and the step upcasts with the exact _decode_pcm16 scaling. jit
        # specializes per input dtype, so the float path is unchanged.
        if chunk.dtype == jnp.int16:
            chunk = chunk.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        # Assemble [tail | chunk]; new frames start inside the tail so each
        # 480-sample frame has full left context (no center padding online —
        # a causal 30 ms latency instead).
        buf = jnp.concatenate([state.sample_tail, chunk])
        starts = np.arange(self.n_new) * HOP
        idx = starts[:, None] + np.arange(NFFT)[None, :]
        frames = buf[idx]
        new_feats = _mfcc_of_frames(frames)  # (n_new, 40)

        feat_ring = jnp.roll(state.feat_ring, -self.n_new, axis=0)
        feat_ring = feat_ring.at[-self.n_new :].set(new_feats)

        logits = self.model.apply(variables, feat_ring[None], train=False)[0]
        post = jax.nn.softmax(logits)
        post_ring = jnp.roll(state.post_ring, -1, axis=0).at[-1].set(post)

        frames_seen = state.frames_seen + self.n_new
        windows_seen = state.windows_seen + 1
        have = jnp.minimum(windows_seen, self.cfg.smoothing_window).astype(jnp.float32)
        # Mean over the filled part of the ring.
        w = self.cfg.smoothing_window
        mask = (jnp.arange(w) >= (w - jnp.minimum(windows_seen, w)))[:, None]
        smoothed = jnp.sum(jnp.where(mask, post_ring, 0.0), axis=0) / have

        new_state = StreamState(
            sample_tail=buf[-NFFT:],
            feat_ring=feat_ring,
            post_ring=post_ring,
            frames_seen=frames_seen,
            windows_seen=windows_seen,
        )
        return new_state, smoothed

    def process(self, state: StreamState, chunk: np.ndarray) -> tuple[StreamState, np.ndarray]:
        """Feed one chunk; returns (state, smoothed posterior (n_labels,))."""
        assert chunk.shape == (self.chunk,)
        return self._step(self.variables, state, jnp.asarray(chunk, jnp.float32))


class BatchStreamer:
    """N concurrent online streams advanced by ONE jit-ed step.

    Batched multi-stream serving (BASELINE.json:11, SURVEY.md §5.7): the
    per-stream state gains a leading stream axis (a vmap of the single
    Streamer step), so N independent audio streams are scored by one
    compiled program — the classifier sees a (N, 101, 40) batch, which is
    the MXU-friendly shape. With ``data_axis`` set and an ambient mesh the
    stream axis shards across chips, scaling serving over a pod slice.

    Semantics are EXACTLY N independent Streamers (tested): streams do not
    interact — BN is frozen at inference and the model is per-example.
    """

    def __init__(
        self,
        model,
        variables,
        n_streams: int,
        cfg: StreamConfig | None = None,
        chunk_samples: int = 3200,
        data_axis: str | None = None,
    ):
        self._single = Streamer(model, variables, cfg, chunk_samples)
        self.cfg = self._single.cfg
        self.n_streams = n_streams
        self.chunk = chunk_samples
        self.n_labels = self._single.n_labels
        # Weights broadcast (in_axes=None): one copy serves every stream,
        # and — as a traced argument — can be swapped without recompiling
        # (set_variables; /train personalization reaches live sessions).
        vstep = jax.vmap(self._single._step_impl, in_axes=(None, 0, 0))

        def _constrain(state, chunks):
            if data_axis is not None:
                from jax.sharding import PartitionSpec as P

                c = lambda x: jax.lax.with_sharding_constraint(x, P(data_axis))
                state = jax.tree.map(c, state)
                chunks = c(chunks)
            return state, chunks

        def step_all(variables, state: StreamState, chunks: jax.Array):
            state, chunks = _constrain(state, chunks)
            return vstep(variables, state, chunks)

        def step_masked(variables, state: StreamState, chunks: jax.Array, mask: jax.Array):
            state, chunks = _constrain(state, chunks)
            new_state, post = vstep(variables, state, chunks)
            # Inactive slots (mask False) keep their previous state verbatim:
            # session-based serving (serve/streams.py) advances only the
            # slots whose sessions pushed a chunk this dispatch, in ONE
            # compiled program over the whole slab. The unmasked all-slots
            # path above stays select-free so full-slab serving pays zero
            # masking overhead.
            sel = lambda n, o: jnp.where(mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
            return jax.tree.map(sel, new_state, state), jnp.where(mask[:, None], post, 0.0)

        # Donate the state: serving holds exactly one live state per call.
        self._step_all = jax.jit(step_all, donate_argnums=(1,))
        self._step_masked = jax.jit(step_masked, donate_argnums=(1,))

    @property
    def variables(self):
        return self._single.variables

    def set_variables(self, variables) -> None:
        """Swap model weights for subsequent steps (no recompile)."""
        self._single.set_variables(variables)

    def reset(self) -> StreamState:
        single = self._single.reset()
        return jax.tree.map(
            lambda x: jnp.zeros((self.n_streams,) + x.shape, x.dtype), single
        )

    def process(
        self,
        state: StreamState,
        chunks: np.ndarray,
        mask: np.ndarray | None = None,
    ) -> tuple[StreamState, np.ndarray]:
        """Feed one chunk per stream; returns (state, smoothed (N, n_labels)).

        ``mask`` (N,) bool selects which slots advance; None = all. Masked
        slots' states are untouched and their posterior row is zeros.
        """
        assert chunks.shape == (self.n_streams, self.chunk), chunks.shape
        # int16 chunks pass through verbatim (decoded on device); anything
        # else is normalized to float32 as before.
        dtype = jnp.int16 if chunks.dtype == np.int16 else jnp.float32
        if mask is None:
            return self._step_all(self.variables, state, jnp.asarray(chunks, dtype))
        return self._step_masked(
            self.variables, state, jnp.asarray(chunks, dtype), jnp.asarray(mask, bool)
        )
