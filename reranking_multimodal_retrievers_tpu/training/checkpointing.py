"""Checkpoint management (orbax).

Capability parity with the reference's Lightning ``ModelCheckpoint`` +
manual-load behaviors (SURVEY.md §5: monitor metric / save_top_k /
save_last — `runway_for_ml/experiment.py:316-320`; test-time resolution
``load_model_path`` > best > named — `experiment.py:483-514`; partial
state-dict load with ``strict=False`` — `FLMR_base_executor.py:277-302`;
optimizer-state restore — `:354-359`).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


class CheckpointManager:
    """Step-named checkpoints with top-k retention on a monitored metric and
    a ``last`` alias."""

    def __init__(
        self,
        ckpt_dir: str,
        monitor: Optional[str] = None,
        mode: str = "max",
        save_top_k: int = 1,
    ):
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        os.makedirs(ckpt_dir, exist_ok=True)
        self._index_path = os.path.join(ckpt_dir, "index.json")
        self._index = self._load_index()

    def _load_index(self) -> Dict[str, Any]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {"checkpoints": [], "best": None, "last": None}

    def _write_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    # --------------------------------------------------------------- save
    def save(self, state, step: int, metrics: Optional[Dict[str, float]] = None,
             name: Optional[str] = None) -> str:
        import orbax.checkpoint as ocp

        name = name or f"step_{step}"
        path = os.path.abspath(os.path.join(self.ckpt_dir, name))
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _tree_to_numpy(state))
        entry = {"name": name, "step": step, "metrics": metrics or {}}
        # re-saving a name (e.g. an interval save and a validation save
        # landing on the same step) replaces its entry — the on-disk dir was
        # just rewritten above, so a second index row would be a dangling
        # duplicate that also double-counts against top-k pruning
        self._index["checkpoints"] = [
            c for c in self._index["checkpoints"] if c["name"] != name
        ]
        self._index["checkpoints"].append(entry)
        self._index["last"] = name
        score = (metrics or {}).get(self.monitor) if self.monitor else None
        if score is not None:
            best = self._index.get("best")
            better = (
                best is None
                or (self.mode == "max" and score > best["score"])
                or (self.mode == "min" and score < best["score"])
            )
            if better:
                self._index["best"] = {"name": name, "score": score}
        self._prune()
        self._write_index()
        return path

    def _prune(self):
        if self.save_top_k < 0 or self.monitor is None:
            return
        scored = [
            c for c in self._index["checkpoints"]
            if self.monitor in c["metrics"]
        ]
        reverse = self.mode == "max"
        scored.sort(key=lambda c: c["metrics"][self.monitor], reverse=reverse)
        keep = {c["name"] for c in scored[: self.save_top_k]}
        # checkpoints the monitored metric never reached (e.g. a recall
        # monitor while validation reports loss only) are pruned by RECENCY
        # to the same top-k budget — never all deleted, which used to leave
        # only 'last' and silently void save_top_k
        unscored = [
            c for c in self._index["checkpoints"]
            if self.monitor not in c["metrics"]
        ]
        unscored.sort(key=lambda c: c["step"], reverse=True)
        keep.update(c["name"] for c in unscored[: self.save_top_k])
        keep.add(self._index.get("last"))
        best = self._index.get("best")
        if best:
            keep.add(best["name"])
        remaining = []
        for c in self._index["checkpoints"]:
            if c["name"] in keep:
                remaining.append(c)
            else:
                p = os.path.join(self.ckpt_dir, c["name"])
                if os.path.exists(p):
                    shutil.rmtree(p)
        self._index["checkpoints"] = remaining

    # ------------------------------------------------------------- restore
    def resolve(self, load_model_path: Optional[str] = None) -> Optional[str]:
        """Reference resolution order (`experiment.py:483-514`):
        explicit path > best > last."""
        if load_model_path:
            return load_model_path
        best = self._index.get("best")
        if best:
            return os.path.join(self.ckpt_dir, best["name"])
        if self._index.get("last"):
            return os.path.join(self.ckpt_dir, self._index["last"])
        return None

    @staticmethod
    def restore(path: str, target=None):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        if target is None:
            return restored
        return _partial_update(target, restored)


def pack_opt_state(opt_state) -> Dict[str, Any]:
    """Flatten an optax state (namedtuple pytree) into an orbax-friendly flat
    dict of leaves. Optimizer state must survive checkpoints for resume to be
    correct (reference restores it, `FLMR_base_executor.py:354-359`); orbax
    round-trips dicts faithfully but not optax's namedtuple nodes, so we save
    leaves and rebuild against a freshly ``tx.init``-ed template on restore."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {f"leaf_{i:05d}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}


def unpack_opt_state(template_opt_state, packed: Dict[str, Any]):
    """Rebuild an optax state from :func:`pack_opt_state` output using the
    structure of a freshly initialized state."""
    treedef = jax.tree_util.tree_structure(template_opt_state)
    leaves = [packed[k] for k in sorted(packed.keys())]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _partial_update(target, restored):
    """strict=False-style merge: leaves present in both (same path) are taken
    from the checkpoint; everything else keeps the target's value
    (reference `FLMR_base_executor.py:277-302`)."""
    if isinstance(target, dict) and isinstance(restored, dict):
        out = {}
        for k, v in target.items():
            out[k] = _partial_update(v, restored[k]) if k in restored else v
        return out
    return restored if restored is not None else target
