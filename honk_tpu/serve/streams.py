"""Session-based multi-stream serving hub.

Product surface for batched multi-stream detection (BASELINE.json:11,
VERDICT r2 #3): N concurrent HTTP clients each hold a *session*; all
sessions share ONE ``BatchStreamer`` slab, so every dispatch scores up to
``n_slots`` live streams as a single (N, 101, 40) batch — the MXU-shaped
serving path — instead of one tiny program per client. Slots whose
sessions did not push a chunk this dispatch are masked out and keep their
state (see ``BatchStreamer.process(mask=...)``).

Protocol (wired into serve/http.py):

    POST /stream/open  {"chunk_samples"?}          -> {"stream_id", "chunk_samples"}
    POST /stream/push  {"stream_id", "wav_data"}   -> {"posterior", "label", "prob", "events"}
    POST /stream/close {"stream_id"}               -> {"events": [...all session events]}

Each session's smoothed posteriors are thresholded host-side with an
INCREMENTAL ``StreamDetector`` (O(1) state per session — the same
``detect_step`` cursor the offline ``detect`` loops over, so a session's
event stream is byte-identical to re-running ``detect_stream`` on the
full posterior history, which the tests assert, without the O(n) memory /
O(n^2) cumulative compute of a recompute per push).

Concurrency: the hub lock is held only for session bookkeeping and the
slab DISPATCH (JAX dispatch is async — enqueueing the step costs
microseconds); the device-result fetch, the expensive part of a push,
happens OUTSIDE the lock, so concurrent HTTP ticks overlap their device
waits instead of serializing on one big lock. Per-session event order is
preserved by a dispatch ticket: each push applies its detector updates
only after the session's previous dispatch has applied (condition
variable), so out-of-order thread wakeups cannot reorder events.
"""

from __future__ import annotations

import threading
import uuid
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamConfig
from ..stream import StreamDetector
from ..stream.streamer import Detection


class StreamSession:
    __slots__ = ("sid", "slot", "detector", "events", "pending_ticket", "applied_ticket")

    def __init__(self, sid: str, slot: int, detector: StreamDetector):
        self.sid = sid
        self.slot = slot
        self.detector = detector  # O(1) incremental event detection
        self.events: list[Detection] = []
        # Dispatch-order bookkeeping (see push_many): ticket of the latest
        # dispatch touching this session / of the latest one applied.
        self.pending_ticket = 0
        self.applied_ticket = 0


class StreamHub:
    """N concurrent streaming sessions over one shared BatchStreamer slab."""

    def __init__(
        self,
        service,
        n_slots: int = 8,
        cfg: StreamConfig | None = None,
        chunk_samples: int = 3200,
        data_axis: str | None = None,
    ):
        self.cfg = cfg or StreamConfig()
        self.chunk = chunk_samples
        self.n_slots = n_slots
        self.labels = service.labels
        self._bs = service.make_batch_streamer(
            n_slots, self.cfg, chunk_samples, data_axis
        )
        self._state = self._bs.reset()
        self._free = list(range(n_slots))
        self._sessions: dict[str, StreamSession] = {}
        self._lock = threading.Lock()
        self._apply_cv = threading.Condition()
        self._next_ticket = 1
        # Zero one slot of every state leaf (slot reuse after close).
        self._reset_slot = jax.jit(
            lambda state, i: jax.tree.map(lambda x: x.at[i].set(jnp.zeros_like(x[i])), state)
        )

    def set_variables(self, variables) -> None:
        """Swap the slab's model weights (personalization via /train).

        Takes effect from the next dispatch; no recompile (the weights are
        a traced argument of the slab step, see BatchStreamer).
        """
        with self._lock:
            self._bs.set_variables(variables)

    def open(self) -> str:
        with self._lock:
            if not self._free:
                raise RuntimeError(f"all {self.n_slots} stream slots in use")
            slot = self._free.pop()
            sid = uuid.uuid4().hex[:12]
            self._state = self._reset_slot(self._state, slot)
            self._sessions[sid] = StreamSession(
                sid, slot, StreamDetector(self.cfg, self.chunk)
            )
            return sid

    def push(self, sid: str, chunk: np.ndarray) -> dict[str, Any]:
        """Advance one session by one chunk; returns posterior + new events.

        One masked slab dispatch per call; use ``push_many`` to advance
        several sessions in a single dispatch (the batched serving path).
        """
        return self.push_many({sid: chunk})[sid]

    def push_many(self, chunks_by_sid: dict[str, np.ndarray]) -> dict[str, dict[str, Any]]:
        """Advance SEVERAL sessions with ONE masked slab dispatch.

        This is the batched serving path over HTTP: a gateway holding N
        client connections posts one chunk per session per tick and the
        whole tick costs a single compiled step over the slab (the model
        sees one (n_slots, 101, 40) batch) instead of N dispatches.
        Returns {sid: {posterior, label, prob, events}}.
        """
        with self._lock:
            sessions = []
            chunks = np.zeros((self.n_slots, self.chunk), np.float32)
            mask = np.zeros((self.n_slots,), bool)
            for sid, chunk in chunks_by_sid.items():
                sess = self._sessions.get(sid)
                if sess is None:
                    raise KeyError(f"unknown stream_id {sid!r}")
                if chunk.shape != (self.chunk,):
                    raise ValueError(
                        f"chunk must be {self.chunk} samples, got {chunk.shape}"
                    )
                chunks[sess.slot] = chunk
                mask[sess.slot] = True
                sessions.append(sess)
            if not sessions:
                return {}
            # Async dispatch: enqueues the compiled step and returns device
            # futures without waiting for the result.
            self._state, post = self._bs.process(self._state, chunks, mask)
            ticket = self._next_ticket
            self._next_ticket += 1
            predecessor = {}
            for sess in sessions:
                predecessor[sess.sid] = sess.pending_ticket
                sess.pending_ticket = ticket
        # Device wait OUTSIDE the lock: other threads can validate,
        # dispatch the next tick, or open/close sessions meanwhile. The
        # finally block guarantees applied_ticket always reaches `ticket`
        # even if the fetch raises — otherwise every later push (and
        # close) of these sessions would wait on the condition forever.
        applied = []  # (sess, smoothed, new_events)
        fetched = None
        try:
            fetched = np.asarray(post)
        finally:
            with self._apply_cv:
                for sess in sessions:
                    # Dispatches touching a session apply in dispatch
                    # order; tickets are totally ordered, so waiting on a
                    # strictly smaller predecessor cannot deadlock.
                    while sess.applied_ticket != predecessor[sess.sid]:
                        self._apply_cv.wait()
                try:
                    if fetched is not None:  # fetch raised otherwise
                        # Only the ORDER-dependent state advances under
                        # the condition lock (detector cursor + event
                        # history); JSON formatting happens outside it.
                        for sess in sessions:
                            smoothed = fetched[sess.slot]
                            e = sess.detector.step(smoothed)
                            new = [e] if e is not None else []
                            sess.events.extend(new)
                            applied.append((sess, smoothed, new))
                finally:
                    # Tickets ALWAYS advance, even on a device error —
                    # otherwise later pushes/closes of these sessions
                    # would wait on the condition forever.
                    for sess in sessions:
                        sess.applied_ticket = ticket
                    self._apply_cv.notify_all()
        out = {}
        for sess, smoothed, new in applied:
            idx = int(smoothed.argmax())
            out[sess.sid] = {
                "posterior": [round(float(p), 6) for p in smoothed],
                "label": self.labels[idx],
                "prob": float(smoothed[idx]),
                "events": [self._event_json(e) for e in new],
            }
        return out

    def close(self, sid: str) -> dict[str, Any]:
        with self._lock:
            sess = self._sessions.pop(sid, None)
            if sess is None:
                raise KeyError(f"unknown stream_id {sid!r}")
            pending = sess.pending_ticket
        # Wait for in-flight dispatches that captured this session before
        # recycling its slot (their slab writes would otherwise land in a
        # successor session's freshly reset state).
        with self._apply_cv:
            while sess.applied_ticket != pending:
                self._apply_cv.wait()
        with self._lock:
            self._free.append(sess.slot)
        return {"events": [self._event_json(e) for e in sess.events]}

    def _event_json(self, e: Detection) -> dict[str, Any]:
        return {"time_s": round(e.time_s, 3), "label": self.labels[e.label], "prob": round(e.score, 4)}
