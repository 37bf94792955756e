"""Orbax checkpoints with the reference's self-describing metadata contract.

The reference saves per-epoch dicts ``{epoch, model/optimizer/scheduler
state, history}`` plus ``best_model`` / ``latest_model`` and embeds
metadata (id2label, class counts) for shape-free recovery (SURVEY.md §5.4,
`train_detection.py:181-193`, `eval_temp_dfine_over.py:44-71`). Here:

- ``save(step, state, metadata)``  — orbax pytree checkpoint under
  ``<dir>/step_<n>`` + ``metadata.json`` + crash-safe ``history.json``
- ``best``/``latest`` symlinked by name in ``markers.json``
- ``restore`` by step / "best" / "latest", with the saved metadata returned
  alongside so consumers self-configure like the reference's loaders.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- markers ----------------------------------------------------------
    def _markers(self) -> Dict[str, int]:
        p = os.path.join(self.directory, "markers.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def _write_markers(self, m: Dict[str, int]) -> None:
        with open(os.path.join(self.directory, "markers.json"), "w") as f:
            json.dump(m, f)

    # -- save / restore ---------------------------------------------------
    def save(self, step: int, state: Any,
             metadata: Optional[Dict] = None,
             history: Optional[Dict] = None,
             is_best: bool = False) -> str:
        path = os.path.join(self.directory, f"step_{step}")
        state = jax.tree_util.tree_map(lambda x: x, state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if metadata is not None:
            with open(os.path.join(self.directory, "metadata.json"), "w") as f:
                json.dump(metadata, f, indent=1)
        if history is not None:   # crash-safe per-epoch dump
            with open(os.path.join(self.directory, "history.json"), "w") as f:
                json.dump(history, f)
        m = self._markers()
        m["latest"] = step
        if is_best:
            m["best"] = step
        self._write_markers(m)
        return path

    def restore(self, which="latest", target: Any = None
                ) -> Tuple[Any, Dict]:
        if isinstance(which, str):
            m = self._markers()
            if which not in m:
                raise FileNotFoundError(
                    f"no '{which}' checkpoint in {self.directory}")
            step = m[which]
        else:
            step = int(which)
        path = os.path.join(self.directory, f"step_{step}")
        try:
            state = self._ckptr.restore(path, target) if target is not None \
                else self._ckptr.restore(path)
        except ValueError as e:
            if "shape" not in str(e).lower():
                raise
            # a raw orbax shape error usually means model-config drift
            # between save and restore — e.g. the Ultralytics
            # max_channels width clamp (round 3) changed m-scale YOLO
            # channel widths, so older m-scale checkpoints no longer fit
            # the current module tree. metadata.json persists the config
            # (flavour/scale for YOLO) so the mismatch is diagnosable.
            raise ValueError(
                f"checkpoint {path} does not match the target's parameter "
                f"shapes — the model config likely changed between save "
                f"and restore; compare {self.directory}/metadata.json "
                f"against the config you are restoring into. "
                f"Original error: {e}") from e
        meta_path = os.path.join(self.directory, "metadata.json")
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        metadata["step"] = step
        return state, metadata

    def load_history(self) -> Dict:
        p = os.path.join(self.directory, "history.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    @property
    def has_checkpoint(self) -> bool:
        return bool(self._markers())
