"""End-to-end HTTP serving capacity bench (VERDICT r3 #3b).

The device-layer stream bench (scripts/bench_stream.py) times ONLY the
jitted slab step; the product surface adds HTTP parsing, base64 decode, a
Python session loop, and host-side detection. This script measures what
the REAL path sustains: N concurrent gateway threads, each holding a
block of sessions on one ThreadingHTTPServer + StreamHub, pushing
/stream/push_many ticks for >= ``--seconds`` seconds.

Reported metric: sustained real-time streams/chip through HTTP — i.e.
audio-seconds pushed per wall-clock second (each live stream consumes
1 s of audio per second). Also reported: the device-only capacity of the
same slab size (one BatchStreamer loop, no HTTP), so the host share of
the gap is explicit.

    python scripts/bench_http_serve.py --slots 64 --gateways 4 --seconds 60 \
        --checkpoint zoo_hard/res8.pt --out runs/bench_http_serve_r04.json
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="res8")
    p.add_argument("--checkpoint", default="zoo_hard/res8.pt")
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--gateways", type=int, default=4)
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--chunk", type=int, default=3200)
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
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post_json(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    if args.slots % args.gateways != 0:
        p.error(f"--slots ({args.slots}) must be divisible by --gateways ({args.gateways}) "
                "so every slot is driven (otherwise host_share is skewed)")
    per_gateway = args.slots // args.gateways
    assert per_gateway >= 1
    # Pre-encode one tick's payload per gateway (clients would encode their
    # own audio; the SERVER cost is what we are measuring — but we also
    # report the all-inclusive number where gateways re-encode each tick).
    pcm = (chunks[0] * 32767).astype("<i2").tobytes()
    b64 = base64.b64encode(pcm).decode()

    counts = [0] * args.gateways
    stop = threading.Event()
    errors: list[str] = []

    def gateway(g: int):
        try:
            sids = [post_json("/stream/open", {})["stream_id"] for _ in range(per_gateway)]
            payload = {sid: b64 for sid in sids}
            while not stop.is_set():
                out = post_json("/stream/push_many", {"chunks": payload})
                assert len(out["results"]) == per_gateway
                counts[g] += per_gateway
            for sid in sids:
                post_json("/stream/close", {"stream_id": sid})
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))
            stop.set()

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
            "is the same slab stepped without HTTP. The gap is host work: "
            "json+base64 parse, per-session Python loop, incremental detection."
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
