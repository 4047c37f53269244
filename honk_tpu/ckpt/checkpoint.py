"""Checkpointing via orbax: step checkpoints, best-dev retention, resume.

Equivalent of reference ``utils/model.py::SerializableModule.save/load``
(= torch.save of a state dict, keeping the best-dev model), extended with
what the reference lacks (SURVEY.md §5.3-5.4): step-indexed periodic
checkpoints including optimizer state and data-pipeline PRNG state, and
resume-from-latest. Reference ``.pt`` files are imported via
``honk_tpu.models.torch_compat.load_honk_checkpoint``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax wrapper: save/restore pytrees at step-indexed paths + 'best'."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any, force: bool = True, wait: bool = False) -> None:
        """Write a checkpoint ASYNCHRONOUSLY (orbax background thread).

        Training does not stall on the write (SURVEY.md §5.3 plans async
        saves); reads and directory scans below fence on in-flight writes,
        so a save is never observed half-finished. Pass ``wait=True`` (or
        call ``wait_until_finished``) to block.
        """
        path = self._path(name)
        self._ckptr.save(path, _to_numpy(tree), force=force)
        if wait:
            self._ckptr.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Block until all in-flight async saves are durable."""
        self._ckptr.wait_until_finished()

    def save_step(self, step: int, tree: Any) -> None:
        self.save(f"step_{step:08d}", tree)

    def save_best(self, tree: Any) -> None:
        self.save("best", tree)

    def restore(self, name: str, template: Any | None = None) -> Any:
        self._ckptr.wait_until_finished()
        path = self._path(name)
        if template is not None:
            out = self._ckptr.restore(path, target=_to_numpy(template))
            # Orbax validates tree STRUCTURE against the template but not
            # leaf shapes — a same-structure checkpoint from a different
            # run would restore wrong-shaped arrays that only blow up at
            # the first train step. Check here, where the cause is clear.
            mismatched = [
                f"{jax.tree_util.keystr(k)}: ckpt {np.shape(a)} != expected {np.shape(b)}"
                for (k, a), b in zip(
                    jax.tree_util.tree_leaves_with_path(out), jax.tree.leaves(template)
                )
                if hasattr(b, "shape") and np.shape(a) != np.shape(b)
            ]
            if mismatched:
                raise ValueError(
                    f"checkpoint {name!r} in {self.directory!r} has mismatched "
                    f"array shapes: {'; '.join(mismatched[:5])}"
                )
            return out
        return self._ckptr.restore(path)

    def latest_step(self) -> int | None:
        self._ckptr.wait_until_finished()
        # Strict name match: a process killed mid-save leaves orbax's
        # staging dir ("step_XXXXXXXX.orbax-checkpoint-tmp-<pid>") behind;
        # the commit is an atomic rename, so anything not exactly
        # "step_XXXXXXXX" is an uncommitted partial and must be ignored —
        # resume falls back to the newest COMPLETE checkpoint (the
        # crash-recovery tests kill training mid-run to assert this).
        import re

        steps = [
            int(m.group(1))
            for d in os.listdir(self.directory)
            if (m := re.fullmatch(r"step_(\d{8,})", d))
            and os.path.isdir(os.path.join(self.directory, d))
        ]
        return max(steps) if steps else None

    def restore_latest(self, template: Any | None = None) -> tuple[int, Any] | None:
        step = self.latest_step()
        if step is None:
            return None
        try:
            return step, self.restore(f"step_{step:08d}", template)
        except OSError:
            # Transient/filesystem failures are NOT a template mismatch —
            # the "use a fresh dir / delete the checkpoints" advice below
            # would destroy a perfectly good run. Let the real error out.
            raise
        except Exception as e:
            # Orbax surfaces template/checkpoint structure mismatches as
            # opaque tree errors; the by-far most common cause is resuming
            # into a checkpoint dir written by a DIFFERENT run (other
            # model, corpus, or split). Fail with the actionable cause.
            raise RuntimeError(
                f"failed to restore checkpoint step_{step:08d} from "
                f"{self.directory!r} against the current train state — the "
                "directory likely holds a different run's checkpoints "
                "(different model/corpus/split). Use a fresh --output_dir "
                "to start a new run, or delete the stale checkpoints to "
                "retrain in place."
            ) from e

    def has(self, name: str) -> bool:
        self._ckptr.wait_until_finished()
        return os.path.isdir(self._path(name))


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
