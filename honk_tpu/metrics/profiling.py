"""Profiling hooks (SURVEY.md §5.1 — the reference has none).

Thin wrappers over jax.profiler: capture a TensorBoard/Perfetto trace
around training or streaming steps, plus named-scope annotation helpers.

    from honk_tpu.metrics import trace_to
    with trace_to("/tmp/trace"):   # view with tensorboard --logdir /tmp/trace
        state, m = train_step(...)

CLI: ``python -m honk_tpu.cli.train --profile-dir /tmp/trace ...`` traces
the first few steps of epoch 0.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_to(log_dir: str | None):
    """jax.profiler.trace wrapper that no-ops when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named scope for trace readability: with annotate('train_step'): ..."""
    return jax.profiler.TraceAnnotation(name)
