"""Round-4 vision-reranker runs (VERDICT r3 next-round #3 and #7).

1. Retrain the spliced ``RerankModel`` + attention fusion on the tail
   visual-key task with the doc budget FIX: round 3's run used
   ``doc_maxlen`` 48, but the splice keeps only context tokens
   ``[2 : Lc-Lq+2]`` (reference `rerank_model.py:204-224`), i.e. 32 of the
   40 passage words — the planted tail key (word positions 22-39) was cut
   off for most passages, so the model could only memorize (train loss
   0.01, valid loss 1.48 and rising, reranked R@5 0.102 < raw 0.232).
   With ``doc_maxlen`` 64 the splice window covers the whole passage —
   the same fix the text-only fusion config already carried.

2. One attempt at the interaction family with vision
   (`interaction_rerank_model.py:86-166` role): the frozen VISION
   retriever supplies query late-interaction rows (including the image
   mapping rows) and 64-token doc rows; MORES cross-attention must learn
   the image-row <-> tail-color-row match from frozen dim-64 features.
   The reference's own ModPreFLMR is marginal (0.23 -> 0.25); a marginal
   or negative result here is committed as the documented negative.

Usage: python tools/rerun_vision_rerankers.py [--stage fusion|interaction|all]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_vision_run import latest_version, resolve_ckpt, run, test_metrics  # noqa: E402

STATIC = "experiments/synth_static_retrieval_vision.json"


def run_family(exp: str, opts_extra):
    static_opt = f"model_config.retrieve_result_path='{STATIC}'"
    run(["--config", f"configs/{exp}.json", "--mode", "train",
         "--opts", static_opt, *opts_extra])
    d = latest_version(exp)
    run(["--config", f"configs/{exp}.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{d}'", static_opt, *opts_extra])
    m = test_metrics(d)
    r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
    print(f"[r4 vision] {exp} PRRecall@5 rerank={r5:.4f} raw={raw5:.4f} "
          f"delta={r5 - raw5:+.4f}")
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["fusion", "interaction", "all"],
                    default="all")
    args = ap.parse_args()
    assert os.path.exists(STATIC), "run synth_vision_run.py --stage B first"
    backbone = resolve_ckpt(latest_version("synth_flmr_vision"))
    if args.stage in ("fusion", "all"):
        run_family("synth_rerank_fusion_vision", [
            f"model_config.reranker_backbone_path='{backbone}'",
            f"model_config.retriever_model_path='{backbone}'",
            "train.trainer_paras.max_epochs=12",
        ])
    if args.stage in ("interaction", "all"):
        run_family("synth_rerank_interaction_vision", [
            f"model_config.retriever_model_path='{backbone}'",
        ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
