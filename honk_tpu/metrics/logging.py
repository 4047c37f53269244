"""Structured metrics: stdout (host 0 only) + JSONL sink.

Replaces the reference's ``print_eval`` stdout prints (SURVEY.md §5.5)
with per-step structured records: loss, accuracy, audio-seconds/s/chip,
wall time. Multi-host safe: only process 0 writes.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, TextIO

import jax


class MetricsLogger:
    def __init__(self, jsonl_path: str | None = None, stream: TextIO = sys.stdout):
        self._stream = stream
        self._file = None
        self._primary = jax.process_index() == 0
        if jsonl_path and self._primary:
            self._file = open(jsonl_path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, kind: str, **fields: Any) -> None:
        if not self._primary:
            return
        rec = {"kind": kind, "t": round(time.time() - self._t0, 3), **_to_py(fields)}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
        pretty = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}" for k, v in rec.items() if k != "kind"
        )
        print(f"[{kind}] {pretty}", file=self._stream, flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()


def _to_py(fields: dict[str, Any]) -> dict[str, Any]:
    out = {}
    for k, v in fields.items():
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float):
            v = round(v, 6)
        out[k] = v
    return out
