"""Label and training services: single-utterance eval + personalization.

Equivalent of reference ``service.py::LabelService / TorchLabelService /
TrainingService`` (reconstructed — SURVEY.md §0):

- ``LabelService.evaluate(audio)`` -> (label, prob): trims/pads to 1 s,
  runs MFCC + classifier, softmax. ``evaluate_long`` slides overlapping
  windows over arbitrary-length audio (the reference's ``stride`` helper)
  and returns the best-scoring window per the smoothed posterior.
- ``TrainingService``: few-shot personalization — fine-tunes a base
  checkpoint on user positives plus contrastive negatives generated from
  them (``AudioSnippet.generate_contrastive``), with the base keywords'
  logits kept by a small number of SGD steps on a frozen-frontend path.

TPU notes: evaluate() is a jit-ed raw-audio->logits program; long audio
reuses the stream module's batched windowing (each frame's MFCC computed
once, windows are gathers).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import AudioSnippet
from ..config import StreamConfig
from ..data import DEFAULT_WANTED_WORDS, LABEL_SILENCE, LABEL_UNKNOWN
from ..models import find_config, find_model, load_honk_checkpoint
from ..stream import stream_file
from ..train.steps import make_forward


def default_labels(wanted_words: Sequence[str] = DEFAULT_WANTED_WORDS) -> list[str]:
    return [LABEL_SILENCE, LABEL_UNKNOWN, *wanted_words]


class LabelService:
    """Single-utterance and long-audio keyword classification."""

    def __init__(
        self,
        model_name: str,
        variables: dict[str, Any] | str,
        labels: Sequence[str] | None = None,
        precision: str | None = "highest",
    ):
        cfg = find_config(model_name)
        self.labels = list(labels or default_labels())
        cfg["n_labels"] = len(self.labels)
        self.model = find_model(model_name)(config=cfg, precision=precision)
        if isinstance(variables, str):
            variables = (
                load_honk_checkpoint(variables)
                if variables.endswith(".pt")
                else _load_orbax(variables)
            )
        self.variables = variables
        self._forward = make_forward(self.model)

    def evaluate(self, audio: np.ndarray) -> tuple[str, float]:
        """audio: float32 mono [-1,1], any length -> (label, prob)."""
        snip = AudioSnippet(np.asarray(audio, np.float32))
        if len(snip) > 16000:
            snip.trim_window(16000)
        snip.pad_to(16000)
        logits = self._forward(
            self.variables["params"],
            self.variables.get("batch_stats", {}),
            jnp.asarray(snip.data)[None, :],
        )
        probs = np.asarray(jax.nn.softmax(logits[0]))
        idx = int(probs.argmax())
        return self.labels[idx], float(probs[idx])

    def evaluate_batch(self, audio: np.ndarray) -> list[tuple[str, float]]:
        """(B, 16000) float32 -> [(label, prob)] per utterance."""
        logits = self._forward(
            self.variables["params"],
            self.variables.get("batch_stats", {}),
            jnp.asarray(audio, jnp.float32),
        )
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        idx = probs.argmax(axis=-1)
        return [(self.labels[int(i)], float(p[int(i)])) for i, p in zip(idx, probs)]

    def evaluate_long(
        self,
        audio: np.ndarray,
        stream_cfg: StreamConfig | None = None,
        data_axis: str | None = None,
    ) -> list[dict[str, Any]]:
        """Continuous detection over long audio; returns detection events.

        ``data_axis`` + an ambient mesh shards the window batch across
        chips (see stream_file) for pod-scale offline scoring.
        """
        smoothed, events = stream_file(
            self.model, self.variables, np.asarray(audio, np.float32), stream_cfg,
            data_axis=data_axis,
        )
        return [
            {"time_s": e.time_s, "label": self.labels[e.label], "prob": e.score}
            for e in events
        ]

    def make_batch_streamer(
        self,
        n_streams: int,
        stream_cfg: StreamConfig | None = None,
        chunk_samples: int = 3200,
        data_axis: str | None = None,
    ):
        """N concurrent online streams scored by one jit-ed step.

        Batched multi-stream serving (BASELINE.json:11): feed
        ``(n_streams, chunk_samples)`` chunks per call; with ``data_axis``
        and an ambient mesh the streams shard across chips.
        """
        from ..stream import BatchStreamer

        return BatchStreamer(
            self.model, self.variables, n_streams, stream_cfg, chunk_samples, data_axis
        )


class TrainingService:
    """Few-shot personalization: fine-tune on user positives + contrastives.

    The new keyword takes over an existing label slot (like the reference's
    web demo, which personalizes one of the command words); negatives are
    contrastive scrambles of the positives plus optional user negatives.
    """

    def __init__(self, base: LabelService, learning_rate: float = 0.01, steps: int = 60):
        self.base = base
        self.lr = learning_rate
        self.steps = steps

    def fine_tune(
        self,
        positives: list[np.ndarray],
        target_label: str,
        negatives: list[np.ndarray] | None = None,
        seed: int = 0,
    ) -> dict[str, Any]:
        """Returns new variables adapted so `positives` score as `target_label`."""
        import optax

        from ..frontend.mfcc import compute_mfccs

        label_idx = self.base.labels.index(target_label)
        unknown_idx = self.base.labels.index(LABEL_UNKNOWN)

        pos = [AudioSnippet(p).trim_window(16000).pad_to(16000).data for p in positives]
        negs = [n for p in positives for n in AudioSnippet(p).generate_contrastive(4, seed)]
        neg = [AudioSnippet(n.data).pad_to(16000).data[:16000] for n in negs]
        if negatives:
            neg += [AudioSnippet(n).trim_window(16000).pad_to(16000).data for n in negatives]
        # Balance classes: contrastive generation yields ~4 negatives per
        # positive; unbalanced CE drags everything to __unknown__.
        if len(pos) < len(neg):
            reps = -(-len(neg) // len(pos))
            pos = (pos * reps)[: len(neg)]

        x = jnp.asarray(np.stack(pos + neg), jnp.float32)
        y = jnp.asarray(
            np.array([label_idx] * len(pos) + [unknown_idx] * len(neg), np.int32)
        )

        model = self.base.model
        variables = self.base.variables
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.sgd(self.lr, momentum=0.9)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            feats = compute_mfccs(x)

            def loss_fn(p):
                v = {"params": p}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                logits = model.apply(v, feats, train=False)  # frozen BN stats
                return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        loss = None
        for _ in range(self.steps):
            params, opt_state, loss = step(params, opt_state, x, y)
        new_vars = {"params": params}
        if batch_stats:
            new_vars["batch_stats"] = batch_stats
        return {"variables": new_vars, "final_loss": float(loss)}


def _load_orbax(path: str) -> dict[str, Any]:
    import os

    from ..ckpt import Checkpointer

    ck = Checkpointer(path if os.path.isdir(path) else os.path.dirname(path) or ".")
    return ck.restore("best") if ck.has("best") else ck.restore(os.path.basename(path))
