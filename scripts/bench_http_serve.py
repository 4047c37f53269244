"""End-to-end HTTP serving capacity bench (VERDICT r3 #3b, r4 #1).

The device-layer stream bench (scripts/bench_stream.py) times ONLY the
jitted slab step; the product surface adds HTTP parsing, payload decode, a
session hub, and host-side detection. This script measures what the REAL
path sustains: N concurrent gateway threads, each holding a block of
sessions on one ThreadingHTTPServer + StreamHub, pushing per-tick frames
for >= ``--seconds`` seconds over persistent HTTP/1.1 connections.

Round-5 serving path (VERDICT r4 #1): gateways post BINARY frames
(/stream/push_bin — raw PCM16, no JSON/base64 per chunk), the hub
COALESCES concurrent gateway ticks into full-slab dispatches, and per-tick
detection is one vectorized numpy pass. ``--json`` falls back to the r4
JSON+base64 push_many path for an apples-to-apples regression point.

Reported metric: sustained real-time streams/chip through HTTP — i.e.
audio-seconds pushed per wall-clock second (each live stream consumes
1 s of audio per second). Also reported: the device-only capacity of the
same slab size (one BatchStreamer loop, no HTTP), so the host share of
the gap is explicit.

    python scripts/bench_http_serve.py --slots 64 --gateways 4 --seconds 60 \
        --checkpoint zoo_hard_v2/res8.pt --out runs/bench_http_serve_r05.json
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="res8")
    p.add_argument("--checkpoint", default="zoo_hard_v2/res8.pt")
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--gateways", type=int, default=4)
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--chunk", type=int, default=3200)
    p.add_argument("--coalesce-ms", type=float, default=4.0)
    p.add_argument("--pipelined", action="store_true",
                   help="double-buffered hub: responses lag one chunk, the "
                        "result fetch overlaps the next tick's device step")
    p.add_argument("--inflight", type=int, default=0,
                   help="HTTP requests each gateway keeps in flight (needs "
                        "--pipelined for >1; 0 = auto: 2 pipelined, 1 sync). "
                        "Streaming clients push the next chunk without "
                        "blocking on the previous response, so >1 models "
                        "the real client; sessions stay strictly ordered "
                        "(a chunk only joins a tick after the previous "
                        "one dispatched).")
    p.add_argument("--json", action="store_true",
                   help="use the JSON+base64 push_many path (r4 baseline) "
                        "instead of binary /stream/push_bin")
    p.add_argument("--wire-dtype", choices=["float32", "int16"], default="float32",
                   help="int16: raw PCM16 goes to the device verbatim and "
                        "decodes on-chip (half the host->device bytes)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from honk_tpu.models import load_honk_checkpoint
    from honk_tpu.serve import LabelService, serve
    from honk_tpu.stream import BatchStreamer

    variables = load_honk_checkpoint(args.checkpoint)
    svc = LabelService(args.model, variables, precision=None)

    # ---- device-only capacity of the same slab (reference point) ----
    bs = BatchStreamer(svc.model, svc.variables, args.slots, chunk_samples=args.chunk)
    state = bs.reset()
    rng = np.random.default_rng(0)
    chunks = (rng.standard_normal((args.slots, args.chunk)) * 0.1).astype(np.float32)
    mask = np.ones((args.slots,), bool)
    for _ in range(3):  # warmup/compile (masked path = the serving path)
        state, post = bs.process(state, chunks, mask)
    np.asarray(post)
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        state, post = bs.process(state, chunks, mask)
    np.asarray(post)
    dev_dt = time.perf_counter() - t0
    chunk_s = args.chunk / 16000.0
    device_streams = args.slots * iters * chunk_s / dev_dt

    # ---- real path: ThreadingHTTPServer + StreamHub over a socket ----
    httpd = serve(
        svc, port=0, enable_training=False,
        n_stream_slots=args.slots, chunk_samples=args.chunk,
        stream_coalesce_ms=args.coalesce_ms, stream_pipelined=args.pipelined,
        stream_wire_dtype=args.wire_dtype,
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    # Count actual slab dispatches: coalescing quality = chunks/dispatch
    # (ideal = slots, i.e. every tick advances the full slab).
    hub = httpd.hub
    dispatch_n = [0]
    real_process = hub._bs.process

    def counting_process(state, chs, msk):
        dispatch_n[0] += 1
        return real_process(state, chs, msk)

    hub._bs.process = counting_process

    if args.slots % args.gateways != 0:
        p.error(f"--slots ({args.slots}) must be divisible by --gateways ({args.gateways}) "
                "so every slot is driven (otherwise host_share is skewed)")
    per_gateway = args.slots // args.gateways
    assert per_gateway >= 1
    pcm = (chunks[0] * 32767).astype("<i2").tobytes()
    b64 = base64.b64encode(pcm).decode()

    counts = [0] * args.gateways
    stop = threading.Event()
    errors: list[str] = []

    inflight = args.inflight or (2 if args.pipelined else 1)
    if inflight > 1 and not args.pipelined:
        p.error("--inflight > 1 requires --pipelined (sync responses wait for "
                "their own tick, so pipelined requests would deadlock the "
                "connection)")

    def gateway(g: int):
        # ONE persistent HTTP/1.1 connection per gateway, with true HTTP
        # pipelining when --inflight > 1: the next tick's request bytes go
        # onto the socket BEFORE the previous response is read. A single
        # connection is the hub's documented overlap shape — the server
        # handles a connection's requests sequentially, so chunk arrival
        # order is preserved, while the lag-1 response rule still lets
        # `inflight` ticks overlap (round-robining SEPARATE connections
        # would race two server threads and could swap chunks).
        import socket

        sock = socket.create_connection(("127.0.0.1", port))
        rfile = sock.makefile("rb")

        def send_req(path: str, body: bytes, ctype: str) -> None:
            head = (
                f"POST {path} HTTP/1.1\r\nHost: bench\r\n"
                f"Content-Type: {ctype}\r\nContent-Length: {len(body)}\r\n\r\n"
            ).encode()
            sock.sendall(head + body)

        def read_reply() -> dict:
            status = rfile.readline()
            code = int(status.split()[1])
            clen = 0
            while True:
                line = rfile.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-length":
                    clen = int(v)
            data = rfile.read(clen)
            if code != 200:
                raise RuntimeError(f"-> {code}: {data[:200]!r}")
            return json.loads(data)

        def rpc(path: str, obj) -> dict:
            send_req(path, json.dumps(obj).encode(), "application/json")
            return read_reply()

        try:
            sids = [rpc("/stream/open", {})["stream_id"] for _ in range(per_gateway)]
            if args.json:
                path, ctype = "/stream/push_many", "application/json"
                frame = json.dumps({"chunks": {sid: b64 for sid in sids}}).encode()
            else:
                # Binary frame prebuilt once (audio constant per tick, as in
                # the r4 bench): header JSON + per_gateway PCM16 blocks.
                header = json.dumps({"stream_ids": sids}).encode()
                frame = len(header).to_bytes(4, "little") + header + pcm * per_gateway
                path, ctype = "/stream/push_bin", "application/octet-stream"
            outstanding = 0
            while not stop.is_set():
                if outstanding >= inflight:
                    out = read_reply()
                    assert len(out["results"]) == per_gateway
                    counts[g] += per_gateway
                    outstanding -= 1
                send_req(path, frame, ctype)
                outstanding += 1
            while outstanding:  # drain
                out = read_reply()
                assert len(out["results"]) == per_gateway
                counts[g] += per_gateway
                outstanding -= 1
            for sid in sids:
                rpc("/stream/close", {"stream_id": sid})
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))
            stop.set()
        finally:
            rfile.close()
            sock.close()

    threads = [threading.Thread(target=gateway, args=(g,)) for g in range(args.gateways)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    time.sleep(args.seconds)
    stop.set()
    for th in threads:
        th.join(timeout=60)
    dt = time.perf_counter() - t0
    httpd.shutdown()
    if errors:
        print(json.dumps({"error": errors[:3]}))
        return 1

    total_chunks = sum(counts)
    http_streams = total_chunks * chunk_s / dt
    result = {
        "metric": "sustained_realtime_streams_per_chip_http",
        "value": round(http_streams, 1),
        "unit": "streams (1s audio/s each)",
        "device_only_streams": round(device_streams, 1),
        "host_share": round(1.0 - http_streams / device_streams, 4),
        "payload": "json+base64" if args.json else "binary pcm16",
        "pipelined": args.pipelined,
        "inflight": inflight,
        "wire_dtype": args.wire_dtype,
        "coalesce_ms": args.coalesce_ms,
        "dispatches": dispatch_n[0],
        "chunks_per_dispatch": round(total_chunks / max(1, dispatch_n[0]), 1),
        "slots": args.slots,
        "gateways": args.gateways,
        "chunk_samples": args.chunk,
        "seconds": round(dt, 1),
        "total_chunks": total_chunks,
        "model": args.model,
        "checkpoint": args.checkpoint,
        "device": str(jax.devices()[0]),
        "note": (
            "server+gateways share one 2-core host process; device_only_streams "
            "is the same slab stepped without HTTP. Gateways reuse one HTTP/1.1 "
            "connection each; the hub coalesces concurrent gateway ticks into "
            "full-slab dispatches and detects events in one vectorized pass."
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
