"""Observability: metrics history, profiling, wandb gating, device stats.

Parity with the reference's aux subsystems (SURVEY.md §5):
- ``MetricsHistoryLogger`` — in-memory metric history
  (`runway_for_ml/utils/metrics_log_callback.py:7-51`);
- ``profile_trace`` — systematic tracing the reference lacks (it had ad-hoc
  wall-clock prints, `Reranker_base_executor.py:898,937-939`): wraps
  ``jax.profiler`` traces viewable in TensorBoard/Perfetto;
- ``maybe_wandb`` — wandb is optional and absent offline; this returns a
  no-op recorder in that case (reference gates on ``meta.logger_enable``);
- ``device_memory_stats`` — the `cuda_stats.py` role for TPU HBM.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


class MetricsHistoryLogger:
    """In-memory metric history keyed by name (PTL-logger role)."""

    def __init__(self):
        self.history: Dict[str, List] = defaultdict(list)

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        for k, v in metrics.items():
            self.history[k].append((step, v))

    def series(self, name: str):
        return self.history.get(name, [])

    def latest(self, name: str):
        s = self.series(name)
        return s[-1][1] if s else None


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None, label: str = "trace"):
    """Profile a region: jax.profiler trace when a log_dir is given, always
    wall-clock timing."""
    t0 = time.perf_counter()
    if log_dir:
        import jax

        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
    logger.info("%s took %.3fs", label, time.perf_counter() - t0)


class _NoOpRun:
    def log(self, *a, **k):
        pass

    def finish(self):
        pass


def maybe_wandb(config) -> object:
    """Return a live wandb run when enabled+installed, else a no-op."""
    enabled = "wandb" in (config.get_path("meta.logger_enable", []) or [])
    if not enabled:
        return _NoOpRun()
    try:
        import wandb

        return wandb.init(
            project=config.get_path("meta.WANDB.project", "rmr-tpu"),
            name=config.get_path("meta.experiment_name", "run"),
            config=config.to_dict(),
        )
    except Exception as e:
        logger.warning("wandb unavailable (%s); metrics go to jsonl only", e)
        return _NoOpRun()


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GB (the `cuda_stats.py` role)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 1e9,
            }
        except Exception:
            out[str(d)] = {}
    return out
