"""Model-based quality evaluation for generated clips.

The reference pairs its generator with a human labeling/evaluation
workflow (``keyword_spotting_data_generator/evaluation``, SURVEY.md
§2.1). TPU-native replacement: a trained KWS model scores every
extracted clip in one batched forward pass; a clip is accepted when the
model's top-1 label matches its claimed keyword at sufficient
confidence. Output is a per-keyword acceptance report plus per-clip
verdicts, usable both to filter a generated dataset and to compare
generator configurations.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.mfcc import compute_mfccs
from .extract import ExtractedClip


def evaluate_clips(
    model,
    variables: dict[str, Any],
    labels: Sequence[str],
    clips: Iterable[ExtractedClip],
    min_prob: float = 0.5,
    batch_size: int = 256,
) -> dict[str, Any]:
    """Score clips with a trained model; returns the acceptance report.

    ``labels`` is the model's output-index -> label-name list (the label
    service convention, serve/service.py). Clips whose keyword is not in
    ``labels`` are reported under ``unknown_keywords`` rather than scored.
    """
    clips = list(clips)
    idx_of = {w: i for i, w in enumerate(labels)}
    scored = [c for c in clips if c.keyword in idx_of]
    skipped = [c.keyword for c in clips if c.keyword not in idx_of]

    @jax.jit
    def forward(audio):
        feats = compute_mfccs(audio)
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1)

    verdicts: list[dict[str, Any]] = []
    for i in range(0, len(scored), batch_size):
        chunk = scored[i : i + batch_size]
        batch = np.stack([c.audio for c in chunk])
        pad = batch_size - batch.shape[0]
        if pad:  # keep one compiled shape
            batch = np.pad(batch, ((0, pad), (0, 0)))
        probs = np.asarray(forward(jnp.asarray(batch)))[: len(chunk)]
        for c, p in zip(chunk, probs):
            top = int(p.argmax())
            want = idx_of[c.keyword]
            verdicts.append(
                {
                    "keyword": c.keyword,
                    "source_time": float(c.source_time),
                    "pred": labels[top],
                    "prob": float(p[top]),
                    "keyword_prob": float(p[want]),
                    "accept": bool(top == want and p[top] >= min_prob),
                }
            )

    per_kw: dict[str, dict[str, int]] = {}
    for v in verdicts:
        s = per_kw.setdefault(v["keyword"], {"total": 0, "accepted": 0})
        s["total"] += 1
        s["accepted"] += int(v["accept"])
    report = {
        "n_clips": len(clips),
        "n_scored": len(scored),
        "unknown_keywords": sorted(set(skipped)),
        "per_keyword": {
            k: {**s, "acceptance": (s["accepted"] / s["total"]) if s["total"] else 0.0}
            for k, s in sorted(per_kw.items())
        },
        "verdicts": verdicts,
    }
    return report
