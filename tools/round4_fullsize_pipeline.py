"""Round-4 recovery pipeline: produce the full-size trained reranker
artifact (VERDICT r3 ask #1) on a fresh checkout where `cache/` and all
`ckpts/` are gone (both are gitignored — only config/metrics/logs survive
between rounds).

Stages, serialized on the one real chip:

1. vtail text retriever (tail-mode corpus, vision-blind raw order) —
   retrains `synth_flmr_vtail` and mines the static top-100 lists for both
   the test split and the train split, exactly as
   `tools/synth_vision_run.py:stage_b` does, writing
   `experiments/synth_static_retrieval_vision.json`.
2. full-size stage R retriever (BERT-base/ViT-B-32/dim-128) — train only;
   the committed `experiments/synth_flmr_fullsize/version_0` already carries
   the tested artifact (R@5 0.878); this rerun just recreates the backbone
   checkpoint stage K warm-starts from.
3. stage K: `tools/synth_fullsize_run.py:stage_reranker` — the full-size
   FullContext vision reranker over the static lists.

Usage: python tools/round4_fullsize_pipeline.py [--from-stage 1|2|3]
Run from the repo root with no JAX env overrides -> real TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_vision_run import (  # noqa: E402
    latest_version, make_train_split_config, resolve_ckpt, run, test_metrics,
)

STATIC_PATH = "experiments/synth_static_retrieval_vision.json"


def stage1_static_lists():
    t0 = time.time()
    run(["--config", "configs/synth_flmr_vtail.json", "--mode", "train"])
    flmr_dir = latest_version("synth_flmr_vtail")
    run(["--config", "configs/synth_flmr_vtail.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{flmr_dir}'"])
    m = test_metrics(flmr_dir)
    print(f"[r4 S1] vtail raw R@5={m['pos_item_ids_recall_at_5']:.4f} "
          f"(round-3 reference point: 0.232)")
    ckpt = resolve_ckpt(flmr_dir)
    tcfg = make_train_split_config("configs/synth_flmr_vtail.json",
                                   "synth_flmr_vtail_trainsplit")
    run(["--config", tcfg, "--mode", "test",
         "--opts", f"test.load_model_path='{ckpt}'"])
    train_dir = latest_version("synth_flmr_vtail_trainsplit")
    static = {}
    for d in (flmr_dir, train_dir):
        dump = json.load(open(os.path.join(d,
                                           "test_predictions_rank_0.json")))
        for entry in dump["predictions"]:
            static[str(entry["question_id"])] = entry["top_ranking_passages"]
    with open(STATIC_PATH, "w") as f:
        json.dump(static, f)
    print(f"[r4 S1] static retrieval for {len(static)} queries -> "
          f"{STATIC_PATH} ({time.time() - t0:.0f}s)")


def stage2_fullsize_retriever():
    t0 = time.time()
    run(["--config", "configs/synth_flmr_fullsize.json", "--mode", "train"])
    d = latest_version("synth_flmr_fullsize")
    ckpt = resolve_ckpt(d)
    print(f"[r4 S2] full-size retriever backbone at {ckpt} "
          f"({time.time() - t0:.0f}s)")


def stage3_fullsize_reranker():
    t0 = time.time()
    from synth_fullsize_run import stage_reranker

    m = stage_reranker()
    print(f"[r4 S3] done in {time.time() - t0:.0f}s: "
          f"rerank R@5={m['recall_at_5']:.4f} raw={m['raw_recall_at_5']:.4f}")


def main_driver():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-stage", type=int, default=1, choices=[1, 2, 3])
    args = ap.parse_args()
    if args.from_stage <= 1:
        stage1_static_lists()
    if args.from_stage <= 2:
        stage2_fullsize_retriever()
    stage3_fullsize_reranker()


if __name__ == "__main__":
    main_driver()
