"""EvalRecorder: per-sample / per-stat evaluation log container.

Parity with the reference (`runway_for_ml/utils/eval_recorder.py`, 332 LoC):
log sample rows and scalar stats during eval, save/load as json+pkl, merge
recorders across ranks/passes, and rename for multiple eval passes.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, List, Optional


class EvalRecorder:
    def __init__(self, name: str = "eval", base_dir: str = "."):
        self.name = name
        self.base_dir = base_dir
        self.sample_logs: Dict[str, List[Any]] = {}
        self.stats_logs: Dict[str, List[Any]] = {}
        self.meta: Dict[str, Any] = {}

    # ----------------------------------------------------------- logging
    def log_sample_dict(self, sample: Dict[str, Any]) -> None:
        """Column-wise append; missing columns backfill with None."""
        n = self.num_samples
        for k in sample:
            if k not in self.sample_logs:
                self.sample_logs[k] = [None] * n
        for k in self.sample_logs:
            self.sample_logs[k].append(sample.get(k))

    def log_sample_dict_batch(self, batch: Dict[str, List[Any]]) -> None:
        lengths = {len(v) for v in batch.values()}
        assert len(lengths) == 1, "batch columns must have equal length"
        for i in range(lengths.pop()):
            self.log_sample_dict({k: v[i] for k, v in batch.items()})

    def log_stats_dict(self, stats: Dict[str, Any]) -> None:
        for k, v in stats.items():
            self.stats_logs.setdefault(k, []).append(v)

    @property
    def num_samples(self) -> int:
        return max((len(v) for v in self.sample_logs.values()), default=0)

    def get_sample_logs_column(self, key: str) -> List[Any]:
        return self.sample_logs.get(key, [])

    def get_sample_logs_by_index(self, idx: int) -> Dict[str, Any]:
        return {k: v[idx] for k, v in self.sample_logs.items()}

    def get_rows(self) -> List[Dict[str, Any]]:
        return [self.get_sample_logs_by_index(i) for i in range(self.num_samples)]

    # ------------------------------------------------------------- merge
    def merge(self, other: "EvalRecorder") -> "EvalRecorder":
        for row in other.get_rows():
            self.log_sample_dict(row)
        for k, vs in other.stats_logs.items():
            self.stats_logs.setdefault(k, []).extend(vs)
        return self

    def rename(self, new_name: str) -> "EvalRecorder":
        self.name = new_name
        return self

    # ---------------------------------------------------------- save/load
    def _paths(self, file_format: str):
        d = os.path.join(self.base_dir, self.name)
        return d, os.path.join(d, f"recorder.{file_format}")

    def save_to_disk(self, file_format: str = "pkl") -> str:
        d, path = self._paths(file_format)
        os.makedirs(d, exist_ok=True)
        payload = {
            "name": self.name,
            "sample_logs": self.sample_logs,
            "stats_logs": self.stats_logs,
            "meta": self.meta,
        }
        if file_format == "json":
            with open(path, "w") as f:
                json.dump(payload, f, default=str)
        else:
            with open(path, "wb") as f:
                pickle.dump(payload, f)
        return path

    @classmethod
    def load_from_disk(
        cls, name: str, base_dir: str, file_format: str = "pkl"
    ) -> "EvalRecorder":
        rec = cls(name=name, base_dir=base_dir)
        _, path = rec._paths(file_format)
        if file_format == "json":
            with open(path) as f:
                payload = json.load(f)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        rec.sample_logs = payload["sample_logs"]
        rec.stats_logs = payload["stats_logs"]
        rec.meta = payload.get("meta", {})
        return rec
