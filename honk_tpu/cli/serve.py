"""Serving CLI: start the keyword-spotting HTTP service.

Equivalent of the reference's root server entry (``python .`` with
config.json selecting backend/model/commands). Here:

    python -m honk_tpu.cli.serve --model res8 --checkpoint ckpts/res8 \
        [--port 16888] [--no-train] [--config config.json]

--config accepts a reference-style config.json with keys
{"model_path": ..., "commands": "cmd1,cmd2,..."}.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="honk_tpu.serve", description=__doc__)
    p.add_argument("--model", default="res8")
    p.add_argument("--checkpoint", required=False, default="")
    p.add_argument("--port", type=int, default=16888)
    p.add_argument("--no-train", action="store_true")
    p.add_argument("--config", default="", help="reference-style config.json")
    p.add_argument(
        "--stream-slots", type=int, default=8,
        help="concurrent /stream sessions sharing one batched slab (0 disables)",
    )
    p.add_argument("--chunk-samples", type=int, default=3200)
    p.add_argument(
        "--coalesce-ms", type=float, default=2.0,
        help="tick leader waits this long for other open sessions to join "
             "before dispatching the slab (0 disables; no wait when every "
             "open session already joined)",
    )
    p.add_argument(
        "--wire-dtype", choices=["float32", "int16"], default="float32",
        help="int16 ships raw PCM16 chunks to the device and decodes "
             "on-chip: half the host->device bytes, no host float "
             "conversion on the binary path (PCM16-derived audio "
             "round-trips exactly)",
    )
    p.add_argument(
        "--pipelined", action="store_true",
        help="double-buffered stream hub: each push returns the session's "
             "PREVIOUS chunk's result (exact lag-1), hiding the device "
             "result fetch behind the next tick — higher sustained "
             "capacity, one extra chunk of detection latency",
    )
    args = p.parse_args(argv)

    labels = None
    checkpoint = args.checkpoint
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
        checkpoint = cfg.get("model_path", checkpoint)
        if "commands" in cfg:
            labels = ["__silence__", "__unknown__", *cfg["commands"].split(",")]

    from ..serve import LabelService, serve

    service = LabelService(args.model, checkpoint, labels=labels)
    httpd = serve(
        service,
        port=args.port,
        enable_training=not args.no_train,
        n_stream_slots=args.stream_slots,
        chunk_samples=args.chunk_samples,
        stream_coalesce_ms=args.coalesce_ms,
        stream_pipelined=args.pipelined,
        stream_wire_dtype=args.wire_dtype,
    )
    print(f"listening on :{args.port} model={args.model} labels={service.labels}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
