"""Minimal HTTP serving front end for the label/training services.

Equivalent of the reference's root server entry (``python .`` starting an
HTTP server on port 16888 with evaluate/train endpoints for the browser
demo — reconstructed [中], SURVEY.md §2.1). Endpoints:

    POST /listen   {"wav_data": <base64 PCM16 16 kHz mono>, "method": "all"}
        -> {"contains_command": bool, "label": str, "prob": float}
    POST /train    {"positives": [<base64 wav>...], "label": "<word>"}
        -> {"final_loss": float}
    GET  /labels   -> {"labels": [...]}

stdlib http.server only (no extra deps); single-threaded — the TPU is a
serial resource anyway. Start via ``python -m honk_tpu.cli.serve``.
"""

from __future__ import annotations

import base64
import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any

import numpy as np

from .service import LabelService, TrainingService


def _decode_pcm16(b64: str) -> np.ndarray:
    raw = base64.b64decode(b64)
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0


def make_handler(service: LabelService, trainer: TrainingService | None):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/labels":
                self._send(200, {"labels": service.labels})
            else:
                self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            if self.path == "/listen":
                try:
                    audio = _decode_pcm16(payload["wav_data"])
                except (KeyError, ValueError) as e:
                    self._send(400, {"error": f"wav_data missing/invalid: {e}"})
                    return
                label, prob = service.evaluate(audio)
                self._send(
                    200,
                    {
                        "contains_command": label not in ("__silence__", "__unknown__"),
                        "label": label,
                        "prob": prob,
                    },
                )
            elif self.path == "/stream":
                # Continuous detection over long audio: overlapping windows +
                # posterior smoothing (stream module), events as JSON.
                try:
                    audio = _decode_pcm16(payload["wav_data"])
                except (KeyError, ValueError) as e:
                    self._send(400, {"error": f"wav_data missing/invalid: {e}"})
                    return
                self._send(200, {"detections": service.evaluate_long(audio)})
            elif self.path == "/train":
                if trainer is None:
                    self._send(503, {"error": "training service disabled"})
                    return
                try:
                    positives = [_decode_pcm16(p) for p in payload["positives"]]
                    target = payload["label"]
                except (KeyError, ValueError) as e:
                    self._send(400, {"error": f"positives/label missing: {e}"})
                    return
                result = trainer.fine_tune(positives, target)
                service.variables = result["variables"]
                self._send(200, {"final_loss": result["final_loss"]})
            else:
                self._send(404, {"error": "unknown endpoint"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(service: LabelService, port: int = 16888, enable_training: bool = True) -> HTTPServer:
    trainer = TrainingService(service) if enable_training else None
    httpd = HTTPServer(("0.0.0.0", port), make_handler(service, trainer))
    return httpd
