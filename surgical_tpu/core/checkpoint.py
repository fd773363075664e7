"""Checkpoint store with metadata manifests.

The reference encodes metrics into checkpoint FILENAMES and requires a human
to paste the winning filename into the next script's constants
(train_evp.py:893-907, README.md:76-96). Here checkpoints are orbax-backed
pytrees plus a ``manifest.json`` per step recording metrics/config, so
"best checkpoint by metric" is a query, not a filename parse, and cross-stage
hand-offs are programmatic.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- paths -------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def _manifest_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}.manifest.json")

    def _aux_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}.aux")

    # -- api ---------------------------------------------------------------
    def save(
        self,
        step: int,
        state: Any,
        metrics: dict | None = None,
        config: dict | None = None,
        extra: dict | None = None,
        aux: Any = None,
        force: bool = True,
    ) -> None:
        """Save the primary state pytree (typically params), plus:

        - ``aux``: a second pytree (batch_stats / optimizer state / anything
          needed to *continue training* but not to *use* the model). Kept
          separate so inference-time restores need only a params template.
          Fixes the reference's silent eval-divergence class of bug where BN
          running stats live outside the saved state_dict slice
          (generate_evp_LFB.py:412-437 depends on them being present).
        - ``extra``: small JSON-able host state (e.g. plateau controller),
          recorded in the manifest.
        """
        path = self._step_dir(step)
        self._ckptr.save(path, state, force=force)
        if aux is not None:
            self._ckptr.save(self._aux_dir(step), aux, force=force)
        self._ckptr.wait_until_finished()
        manifest = {
            "step": step,
            "metrics": _jsonable(metrics or {}),
            "config": _jsonable(config or {}),
            "extra": _jsonable(extra or {}),
            "has_aux": aux is not None,
        }
        with open(self._manifest_path(step), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and name.endswith(".manifest.json"):
                out.append(int(name[len("step_") : -len(".manifest.json")]))
        return sorted(out)

    def manifest(self, step: int) -> dict:
        with open(self._manifest_path(step)) as f:
            return json.load(f)

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    def best_step(self, metric: str, mode: str = "max") -> int | None:
        best, best_val = None, None
        for step in self.steps():
            val = self.manifest(step)["metrics"].get(metric)
            if val is None:
                continue
            if (
                best_val is None
                or (mode == "max" and val > best_val)
                or (mode == "min" and val < best_val)
            ):
                best, best_val = step, val
        return best

    def restore(self, step: int, template: Any) -> Any:
        """Restore into the shape/dtype/sharding structure of `template`."""
        return self._ckptr.restore(self._step_dir(step), template)

    def restore_aux(self, step: int, template: Any) -> Any:
        """Restore the auxiliary training state saved alongside ``step``."""
        return self._ckptr.restore(self._aux_dir(step), template)

    def has_aux(self, step: int) -> bool:
        return os.path.isdir(self._aux_dir(step))


def _jsonable(tree: Any) -> Any:
    def conv(x):
        if isinstance(x, (np.floating, np.integer)):
            return x.item()
        if isinstance(x, (np.ndarray, jax.Array)):
            return np.asarray(x).tolist()
        return x

    if isinstance(tree, dict):
        return {k: _jsonable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_jsonable(v) for v in tree]
    return conv(tree)
