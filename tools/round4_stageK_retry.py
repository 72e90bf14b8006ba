"""Round-4 stage-K retry: the first full-size full-context vision reranker
run (BCE, lr 1e-4, 6 epochs) beat raw order only weakly (R@5 0.282 vs
0.232) with valid loss still falling at 750 steps. The small-scale winner
(`experiments/synth_rerank_full_context_vision/version_0`, R@5 0.882) used
negative_sampling at lr 3e-4 — rerun stage K with those hyperparameters
and doubled epochs, warm-started from the same stage-R backbone.

Usage: python tools/round4_stageK_retry.py   (repo root, real TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_vision_run import (  # noqa: E402
    latest_version, resolve_ckpt, run, test_metrics,
)

STATIC_PATH = "experiments/synth_static_retrieval_vision.json"


def main_driver():
    t0 = time.time()
    exp = "synth_rerank_full_context_fullsize"
    backbone = resolve_ckpt(latest_version("synth_flmr_fullsize"))
    opts = [
        f"model_config.retrieve_result_path='{STATIC_PATH}'",
        f"model_config.reranker_backbone_path='{backbone}'",
        "model_config.loss_fn='negative_sampling'",
        "train.optimizer_config.optimizer_params.lr=0.0003",
        "train.trainer_paras.max_epochs=12",
    ]
    run(["--config", f"configs/{exp}.json", "--mode", "train",
         "--opts"] + opts)
    d = latest_version(exp)
    # opts[:3] (advisor r4): include the loss_fn override in the test run so
    # the test-time model matches training — BCE vs negative_sampling rank
    # identically (both rank by head-1 logits), but a 2H_BCE checkpoint
    # tested under the config-default BCE would silently score the wrong
    # head if this pattern were copied.
    run(["--config", f"configs/{exp}.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{d}'"] + opts[:3])
    m = test_metrics(d)
    r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
    print(f"[r4 K-retry] full-size vision reranker PRRecall@5 "
          f"rerank={r5:.4f} raw={raw5:.4f} delta={r5 - raw5:+.4f} "
          f"({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main_driver())
