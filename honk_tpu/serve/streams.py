"""Session-based multi-stream serving hub with coalesced, pipelined ticks.

Product surface for batched multi-stream detection (BASELINE.json:11,
SURVEY.md §5.7 — reconstructed `[U] service.py` multi-client serving): N
concurrent HTTP clients each hold a *session*; all sessions share ONE
``BatchStreamer`` slab, so every dispatch scores up to ``n_slots`` live
streams as a single (N, 101, 40) batch — the MXU-shaped serving path —
instead of one tiny program per client.

Protocol (wired into serve/http.py):

    POST /stream/open  {"chunk_samples"?}          -> {"stream_id", "chunk_samples"}
    POST /stream/push  {"stream_id", "wav_data"}   -> {"posterior", "label", "prob", "events"}
    POST /stream/close {"stream_id"}               -> {"events": [...all session events]}
    POST /stream/push_bin  (binary PCM16 frame)    -> {"results": {...}}  (serve/http.py)

Design, driven by the measured r4 serving gap (62 sustained real-time
streams over HTTP vs 322 device-only on the same slab — VERDICT r4 #1):

- **Coalesced ticks.** Concurrent ``push_many`` calls (e.g. several
  gateway threads each holding a block of sessions) MERGE into one
  pending *tick*: the first arriving thread becomes the tick's leader,
  optionally waits up to ``coalesce_ms`` for the remaining open sessions
  to join, and dispatches ONE masked slab step for all of them. Without
  this, K gateways sharing an N-slot slab each dispatch the full N-row
  program with only N/K active rows — K× the device work per audio
  second. In synchronous mode the leader also waits for the previous
  tick to finish first, so gateway phases that drifted apart re-merge
  into full-slab ticks instead of ping-ponging sparse ones.
- **Vectorized detection.** Per tick, event detection for ALL sessions is
  one numpy pass over the fetched (n_slots, n_labels) posteriors —
  slot-indexed cursor/refractory arrays replace a per-session Python
  ``detector.step`` loop. Semantics are byte-identical to running
  ``stream.detect_step`` per session (tests assert this), i.e. to
  re-running ``detect_stream`` over each session's full history.
- **Pipelined mode** (``pipelined=True``): the dominant per-tick cost of
  synchronous serving is the dependent device→host result fetch (a full
  RTT per tick — tens of ms over this environment's TPU tunnel, µs on a
  co-located host, but a dependent round trip either way; measured here,
  concurrent fetches overlap almost perfectly while serial ones pay the
  RTT each). In pipelined mode dispatch never waits for results: a pool
  of background fetcher threads pulls completed ticks (up to
  ``pipeline_depth`` in flight — backpressure bounds memory and lag) and
  applies them in dispatch order. A push's response waits only for the
  session's OWN PREVIOUS tick to be applied — its result rode a fetch
  that started a full tick earlier, so the wait is near zero in steady
  state, yet the response is still EXACTLY the previous chunk's result
  (lag one, tested). The first push of a session returns
  ``{"pending": true}``; ``close`` flushes, so no event is ever lost.
  Event *detection* latency grows by one chunk (200 ms default).

Ordering invariants: a session joins a new tick only after its previous
tick was dispatched (pipelined) or applied (sync), so a session's chunks
enter the slab in push order; tick applies are globally sequenced by
dispatch order (``_applied_seq``), so detector cursors advance in chunk
order even when fetches complete out of order. "Push order" means
ARRIVAL order at ``push_rows``: a client that overlaps requests must
preserve arrival order itself — HTTP/1.1 *pipelining on one connection*
does (the server handles each connection's requests sequentially, and
the response only waits for the PREVIOUS tick, so one pipelined
connection still overlaps ticks); round-robining several connections
does NOT (two server threads race to the hub, and chunks posted µs apart
can swap).

Failure semantics (VERDICT r4 #5): if the device-result FETCH fails, the
device ring has still consumed every masked chunk, so the hub ADVANCES
the failed sessions' detector cursors to keep the time axis aligned with
the device state, marks them ``degraded``, and surfaces ``"degraded":
true`` on every subsequent push/close of those sessions. Exactly the lost
rows' own events are missed; later event *times* match a never-failed
session (tested), though a detection inside the lost row would also have
armed the refractory gap, so one extra early fire is possible within
``min_gap_windows`` of the failure. A DISPATCH failure consumed nothing:
it raises to the pushers and leaves sessions untouched. In sync mode
fetch failures also raise to the tick's pushers; in pipelined mode the
pusher already got its (lag-1) response, so fetch failures surface only
through the degraded flag.
"""

from __future__ import annotations

import queue
import threading
import time
import uuid
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamConfig
from ..stream import StreamDetector  # noqa: F401  (re-export for compat)
from ..stream.streamer import WINDOW_FRAMES, HOP, Detection
from ..frontend import filters as F


class StreamSession:
    __slots__ = ("sid", "slot", "events", "last_tick", "degraded")

    def __init__(self, sid: str, slot: int):
        self.sid = sid
        self.slot = slot
        self.events: list[Detection] = []
        self.last_tick: _Tick | None = None  # most recent tick carrying this session
        self.degraded = False


class _Tick:
    """One coalesced slab dispatch: chunks from one or more push calls."""

    __slots__ = (
        "chunks", "mask", "sessions", "prev_of", "seq", "future", "claimed",
        "dispatched", "done", "error", "fetch_error", "results",
    )

    def __init__(self, n_slots: int, chunk: int, dtype=np.float32):
        self.chunks = np.zeros((n_slots, chunk), dtype)
        self.mask = np.zeros((n_slots,), bool)
        self.sessions: list[StreamSession] = []
        # sid -> the session's previous tick at join time: the rollback
        # target if THIS tick's dispatch fails (nothing was consumed).
        self.prev_of: dict[str, "_Tick | None"] = {}
        self.seq = -1  # assigned at successful dispatch
        self.future = None  # device array (unfetched posterior)
        self.claimed = False  # exactly one thread fetches+applies
        self.dispatched = threading.Event()
        self.done = threading.Event()  # set once APPLIED (results final)
        self.error: BaseException | None = None  # dispatch failure
        self.fetch_error: BaseException | None = None  # fetch failure
        # sid -> (posterior row, label idx, prob, new events, degraded)
        self.results: dict[str, tuple] = {}


class StreamHub:
    """N concurrent streaming sessions over one shared BatchStreamer slab."""

    def __init__(
        self,
        service,
        n_slots: int = 8,
        cfg: StreamConfig | None = None,
        chunk_samples: int = 3200,
        data_axis: str | None = None,
        coalesce_ms: float = 0.0,
        pipelined: bool = False,
        pipeline_depth: int = 4,
        wire_dtype: str = "float32",
    ):
        self.cfg = cfg or StreamConfig()
        self.chunk = chunk_samples
        self.n_slots = n_slots
        self.labels = service.labels
        self.pipelined = pipelined
        # "int16": ship raw PCM16 to the device and decode there — half
        # the host->device bytes and zero host float conversion on the
        # binary path. PCM16-derived float chunks (every HTTP path)
        # round-trip EXACTLY (x = i/32768 is a power-of-two division);
        # direct float pushes quantize to the nearest PCM16 step.
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32|int16, got {wire_dtype!r}")
        self.wire_dtype = np.int16 if wire_dtype == "int16" else np.float32
        self._bs = service.make_batch_streamer(
            n_slots, self.cfg, chunk_samples, data_axis
        )
        self._state = self._bs.reset()
        self._free = list(range(n_slots))
        self._sessions: dict[str, StreamSession] = {}
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: _Tick | None = None
        self._last_tick: _Tick | None = None  # most recently dispatched
        self._next_seq = 0
        self._applied_seq = -1
        self._apply_cv = threading.Condition()
        self._coalesce_s = coalesce_ms / 1000.0
        # Pipelined mode: background fetcher pool + in-flight bound.
        self._depth = max(1, pipeline_depth)
        self._outstanding = 0
        self._fetchers_started = False
        self._fetch_q: "queue.SimpleQueue[_Tick]" | None = None
        # Slot-indexed detector state (vectorized detect_step, see _apply):
        # windows seen and last-fire window index per slot.
        self._det_i = np.zeros((n_slots,), np.int64)
        self._det_last = np.full((n_slots,), -(10**9), np.int64)
        # Online event times are window-START seconds, like detect_stream:
        # a chunk's causal window ends at its last sample, so shift back by
        # one window length (clamped at 0).
        self.hop_s = chunk_samples / F.SAMPLE_RATE
        self._shift = self.hop_s - WINDOW_FRAMES * HOP / F.SAMPLE_RATE
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
            self._det_i[slot] = 0
            self._det_last[slot] = -(10**9)
            self._sessions[sid] = StreamSession(sid, slot)
            return sid

    def push(self, sid: str, chunk: np.ndarray) -> dict[str, Any]:
        """Advance one session by one chunk; returns posterior + new events."""
        return self.push_many({sid: chunk})[sid]

    def push_many(
        self, chunks_by_sid: dict[str, np.ndarray], want_posterior: bool = True
    ) -> dict[str, dict[str, Any]]:
        """Advance SEVERAL sessions; concurrent calls coalesce into one dispatch.

        Returns {sid: {posterior?, label, prob, events, degraded?}}. With
        ``want_posterior=False`` the (relatively expensive) per-label
        posterior list is omitted — the binary HTTP path uses this.
        """
        if not chunks_by_sid:
            return {}
        sids = list(chunks_by_sid)
        for sid in sids:  # unknown-session beats bad-chunk (KeyError -> 404)
            if sid not in self._sessions:
                raise KeyError(f"unknown stream_id {sid!r}")
        rows = np.empty((len(sids), self.chunk), np.float32)
        for k, sid in enumerate(sids):
            c = chunks_by_sid[sid]
            if c.shape != (self.chunk,):
                raise ValueError(f"chunk must be {self.chunk} samples, got {c.shape}")
            if c.dtype == np.int16:
                # Raw PCM16 chunks scale like _decode_pcm16 — assigning
                # them into the float staging buffer verbatim would feed
                # the model 32768x-out-of-range audio.
                rows[k] = c.astype(np.float32) / np.float32(32768.0)
            else:
                rows[k] = c
        return self.push_rows(sids, rows, want_posterior)

    def push_rows(
        self, sids: Sequence[str], rows: np.ndarray, want_posterior: bool = True
    ) -> dict[str, dict[str, Any]]:
        """Advance sessions ``sids`` with pre-decoded chunk ``rows``.

        ``rows`` is (len(sids), chunk_samples) float32 — the zero-copy
        entry the binary HTTP endpoint feeds directly from the request
        body (no per-session base64/JSON work).
        """
        if rows.shape != (len(sids), self.chunk):
            raise ValueError(
                f"rows must be ({len(sids)}, {self.chunk}), got {rows.shape}"
            )
        if len(set(sids)) != len(sids):
            raise ValueError("duplicate stream_id in one push")
        if rows.dtype != self.wire_dtype:
            if rows.dtype == np.int16:
                # Raw PCM16 toward a float wire: the _decode_pcm16 scaling.
                rows = rows.astype(np.float32) / np.float32(32768.0)
            elif self.wire_dtype == np.int16:
                # Float audio toward the int16 wire — exact for
                # PCM16-derived floats (i/32768 * 32768 == i); arbitrary
                # floats quantize to the nearest PCM16 step.
                rows = np.clip(
                    np.rint(rows.astype(np.float32) * np.float32(32768.0)),
                    -32768, 32767,
                ).astype(np.int16)
            else:
                # e.g. float64 audio with the float32 wire: convert only —
                # dividing here would silently crush real audio to ~1e-5.
                rows = rows.astype(np.float32)
        while True:
            with self._cv:
                sessions = []
                for sid in sids:
                    sess = self._sessions.get(sid)
                    if sess is None:
                        raise KeyError(f"unknown stream_id {sid!r}")
                    sessions.append(sess)
                # A session joins a new tick only once its previous tick
                # was dispatched (pipelined) / applied (sync): chunks enter
                # the slab in push order, and concurrent sync ticks always
                # carry disjoint sessions.
                blockers = []
                for s in sessions:
                    t = s.last_tick
                    if t is not None:
                        gate = t.dispatched if self.pipelined else t.done
                        if not gate.is_set():
                            blockers.append(t)
                if not blockers:
                    tick = self._pending
                    leader = tick is None
                    if leader:
                        tick = self._pending = _Tick(
                            self.n_slots, self.chunk, self.wire_dtype
                        )
                    # Each session's own previous tick: the pipelined
                    # response waits for exactly that to be applied
                    # (lag-1 contract) — nothing else.
                    prevs = [s.last_tick for s in sessions]
                    for k, sess in enumerate(sessions):
                        tick.chunks[sess.slot] = rows[k]
                        tick.mask[sess.slot] = True
                        tick.sessions.append(sess)
                        tick.prev_of[sess.sid] = sess.last_tick
                        sess.last_tick = tick
                    self._cv.notify_all()  # leader may now have full coverage
                    break
            for t in blockers:  # wait OUTSIDE the lock, then retry
                (t.dispatched if self.pipelined else t.done).wait()
        if leader:
            self._run_tick(tick)
        else:
            (tick.dispatched if self.pipelined else tick.done).wait()
        if tick.error is not None:  # dispatch failed: nothing was consumed
            raise tick.error
        if not self.pipelined:
            if tick.fetch_error is not None:
                raise tick.fetch_error
            return self._format_sync(tick, sids, want_posterior)
        # Lag-1 wait: the previous tick's fetch started a full tick ago on
        # the background pool, so this is near-zero in steady state.
        for t in prevs:
            if t is not None:
                t.done.wait()
        return self._format_pipelined(sids, prevs, want_posterior)

    # ---- tick lifecycle (leader thread) ----

    def _run_tick(self, tick: _Tick) -> None:
        if not self.pipelined:
            # Serialize sync ticks: waiting here (lock NOT held, so the
            # pending tick keeps filling) re-merges gateway phases — every
            # session freed by the previous apply re-posts and joins THIS
            # tick within the coalesce window.
            with self._cv:
                prev = self._last_tick
            if prev is not None:
                prev.done.wait()
        try:
            with self._cv:
                if self._coalesce_s > 0.0:
                    # Wait for the remaining open sessions to join — but
                    # never longer than the coalesce window, and not at
                    # all if every open session is already aboard (single
                    # gateway / lone session: zero added latency).
                    deadline = time.monotonic() + self._coalesce_s
                    while int(tick.mask.sum()) < min(self.n_slots, len(self._sessions)):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(remaining)
                if self.pipelined:
                    # Backpressure: bound dispatched-but-unapplied ticks
                    # (memory for their chunk buffers, and client lag).
                    while self._outstanding >= self._depth:
                        self._cv.wait()
                self._pending = None  # later pushes start the next tick
                try:
                    # Async dispatch: enqueues the compiled step and
                    # returns device futures without waiting.
                    self._state, tick.future = self._bs.process(
                        self._state, tick.chunks, tick.mask
                    )
                except BaseException as e:
                    tick.error = e
                    # Nothing was consumed: unwind each session's chain to
                    # its pre-join tick, so the NEXT push still delivers
                    # the previous chunk's (lag-1) result instead of a
                    # spurious degraded/pending against the failed tick.
                    for sess in tick.sessions:
                        if sess.last_tick is tick:
                            sess.last_tick = tick.prev_of[sess.sid]
                    return  # finally-block unblocks everyone
                tick.seq = self._next_seq
                self._next_seq += 1
                self._outstanding += 1
                self._last_tick = tick
                # The device owns its copy now; drop the (n_slots, chunk)
                # staging buffer so in-flight ticks don't pin ~n_slots*chunk
                # *4 bytes each at pipeline depth.
                tick.chunks = None
            tick.dispatched.set()
            if self.pipelined:
                # Never wait for results here: the background pool fetches
                # and applies (in dispatch order); responses only wait for
                # each session's own previous tick.
                self._ensure_fetchers()
                self._fetch_q.put(tick)
            else:
                self._ensure_applied(tick)
        finally:
            # No waiter may hang, whatever failed above.
            tick.dispatched.set()
            if tick.error is not None or not self.pipelined:
                tick.done.set()

    def _ensure_fetchers(self) -> None:
        if self._fetchers_started:
            return
        with self._cv:
            if self._fetchers_started:
                return
            self._fetch_q = queue.SimpleQueue()
            for i in range(self._depth):
                threading.Thread(
                    target=self._fetch_loop, name=f"hub-fetch-{i}", daemon=True
                ).start()
            self._fetchers_started = True

    def _fetch_loop(self) -> None:
        # Several fetchers pull concurrently: device->host result fetches
        # overlap (measured ~RTT/depth effective), while _ensure_applied
        # still applies ticks strictly in dispatch order.
        while True:
            tick = self._fetch_q.get()
            if tick is None:  # shutdown sentinel
                return
            try:
                self._ensure_applied(tick)
            except BaseException:  # pragma: no cover - belt and braces:
                # a dead fetcher would strand later ticks; errors are
                # already recorded on the tick (fetch_error) for callers.
                continue

    def shutdown(self) -> None:
        """Stop the background fetcher pool (pipelined mode).

        Already-dispatched ticks are still fetched/applied before the
        threads exit (sentinels queue BEHIND them). Idempotent; a hub is
        not usable for new pushes afterwards in pipelined mode.
        """
        with self._cv:
            if not self._fetchers_started:
                return
            q = self._fetch_q
        for _ in range(self._depth):
            q.put(None)

    def _ensure_applied(self, tick: _Tick) -> None:
        """Fetch + apply ``tick`` exactly once; all other callers wait."""
        with self._cv:
            claim = not tick.claimed
            tick.claimed = True
        if not claim:
            tick.done.wait()
            return
        try:
            fetched = None
            try:
                fetched = np.asarray(tick.future)  # device wait, no lock held
            except BaseException as e:
                # Fetch failed but the device consumed the chunks ->
                # degraded-cursor semantics in _apply.
                tick.fetch_error = e
            with self._apply_cv:
                # Applies are globally sequenced by dispatch order so
                # detector cursors advance in chunk order even when
                # fetches complete out of order.
                while self._applied_seq != tick.seq - 1:
                    self._apply_cv.wait()
                try:
                    self._apply(tick, fetched)
                except BaseException as e:
                    # Surfaced like a fetch failure (sync pushers raise it;
                    # pipelined sessions see degraded/pending).
                    tick.fetch_error = e
                finally:
                    # The seq chain ALWAYS advances — a wedged chain would
                    # block every later tick's apply and hang the hub.
                    self._applied_seq = tick.seq
                    self._apply_cv.notify_all()
        finally:
            tick.done.set()
            with self._cv:
                self._outstanding -= 1
                self._cv.notify_all()

    def _apply(self, tick: _Tick, fetched: np.ndarray | None) -> None:
        """Vectorized detect_step over every session in the tick.

        One numpy pass computes argmax/threshold/refractory for all
        sessions (slot-indexed cursor arrays); only firing sessions touch
        Python-level event objects. Runs under ``_apply_cv``.
        """
        sess_list = tick.sessions
        slots = np.fromiter((s.slot for s in sess_list), np.int64, len(sess_list))
        if fetched is None:
            # Fetch failed: advance the cursors so later event times stay
            # aligned with the device posterior history; the lost rows'
            # own events are gone (module docstring, VERDICT r4 #5).
            self._det_i[slots] += 1
            for sess in sess_list:
                sess.degraded = True
            return
        rows = fetched[slots]  # (k, n_labels)
        labs = rows.argmax(axis=1)
        k = len(sess_list)
        # float64, matching detect_step's `float(probs[label])` compare:
        # numpy's weak scalar promotion would otherwise compare in float32
        # and a score within 1 ULP of the threshold could diverge from the
        # byte-identical-events contract.
        scores = rows[np.arange(k), labs].astype(np.float64)
        i_vals = self._det_i[slots]
        fire = (
            (labs >= 2)  # a keyword wins the window (not silence/unknown)
            & (scores >= self.cfg.detection_threshold)
            & (i_vals - self._det_last[slots] >= self.cfg.min_gap_windows)
        )
        self._det_i[slots] = i_vals + 1
        if fire.any():
            self._det_last[slots[fire]] = i_vals[fire]
        for j, sess in enumerate(sess_list):
            new: list[Detection] = []
            if fire[j]:
                e = Detection(
                    time_s=max(0.0, float(i_vals[j]) * self.hop_s + self._shift),
                    label=int(labs[j]),
                    score=float(scores[j]),
                )
                sess.events.append(e)
                new = [e]
            tick.results[sess.sid] = (
                rows[j], int(labs[j]), float(scores[j]), new, sess.degraded
            )

    # ---- response formatting ----

    def _format_sync(
        self, tick: _Tick, sids: Sequence[str], want_posterior: bool
    ) -> dict[str, dict[str, Any]]:
        return self._format([tick.results[sid] for sid in sids], sids, want_posterior)

    def _format_pipelined(
        self, sids: Sequence[str], prevs: Sequence["_Tick | None"], want_posterior: bool
    ) -> dict[str, dict[str, Any]]:
        # Lag-1 contract: each session's response is its OWN previous
        # tick's applied result — looked up directly on that tick (the
        # caller already waited for it), so no per-session history can be
        # evicted by later applies, however the client overlaps requests.
        picked: list[tuple | None] = [
            None if prev is None else prev.results.get(sid)
            for sid, prev in zip(sids, prevs)
        ]
        out = self._format(
            [r for r in picked if r is not None],
            [sid for sid, r in zip(sids, picked) if r is not None],
            want_posterior,
        )
        for sid, prev, r in zip(sids, prevs, picked):
            if r is None:
                d: dict[str, Any] = {"pending": True, "events": []}
                if prev is not None:
                    # The previous tick applied but produced no result for
                    # this session: its fetch failed. Surface degraded
                    # instead of re-delivering an older chunk's result.
                    d["degraded"] = True
                out[sid] = d
        return out

    def _format(
        self, results: list[tuple], sids: Sequence[str], want_posterior: bool
    ) -> dict[str, dict[str, Any]]:
        out: dict[str, dict[str, Any]] = {}
        plist = None
        if want_posterior and results:
            # One vectorized rounding pass for this caller's sessions
            # (float64 first: np.round then matches Python round()'s
            # behaviour on the JSON surface).
            rows = np.stack([r[0] for r in results]).astype(np.float64)
            plist = np.round(rows, 6).tolist()
        for j, (sid, res) in enumerate(zip(sids, results)):
            _row, lab, prob, new, degraded = res
            d: dict[str, Any] = {
                "label": self.labels[lab],
                "prob": prob,
                "events": [self._event_json(e) for e in new],
            }
            if want_posterior:
                d["posterior"] = plist[j]
            if degraded:
                d["degraded"] = True
            out[sid] = d
        return out

    def close(self, sid: str) -> dict[str, Any]:
        with self._lock:
            sess = self._sessions.pop(sid, None)
            if sess is None:
                raise KeyError(f"unknown stream_id {sid!r}")
            tick = sess.last_tick
        if tick is not None:
            # Flush: wait for the in-flight dispatch that captured this
            # session (its slab write must not land in a successor
            # session's reset slot), and — pipelined — fetch/apply it if
            # nobody else will, so the final chunk's events are emitted.
            tick.dispatched.wait()
            if tick.error is None:
                self._ensure_applied(tick)
            else:
                tick.done.wait()
        with self._cv:
            self._free.append(sess.slot)
            self._cv.notify_all()  # open-session count changed (leader predicate)
        out: dict[str, Any] = {"events": [self._event_json(e) for e in sess.events]}
        if sess.degraded:
            out["degraded"] = True
        return out

    def _event_json(self, e: Detection) -> dict[str, Any]:
        return {"time_s": round(e.time_s, 3), "label": self.labels[e.label], "prob": round(e.score, 4)}
