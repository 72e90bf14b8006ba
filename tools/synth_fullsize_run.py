"""Full-size multimodal accuracy demonstration (VERDICT r2 #2 — and the
"nothing is both trained AND full-size" gap): the same visual-key synthetic
task as `tools/synth_vision_run.py`, trained at REFERENCE MODEL SCALE on the
real chip:

- retriever: BERT-base-shape text encoder (12×768), ViT-B/32 vision tower
  (12×768, 224px), dim-128 late interaction, 32-token transformer mapping
  prefix — the PreFLMR-B architecture (`modeling_flmr.py:1285-1360`) with a
  task-sized vocab;
- reranker: the same full-size FLMR backbone + the reference's 1-layer
  768-wide cross-encoder (`rerank_model.py:64-79`), trained over static
  retrieval mined by the stage-B text retriever (tail task — the reranker
  must read the image to find the positive).

Run AFTER `synth_vision_run.py --stage B` (reuses its static retrieval
lists — the tail corpus text is identical; only image resolution differs).

Usage: python tools/synth_fullsize_run.py [--stage R|K|all]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_vision_run import latest_version, run, test_metrics  # noqa: E402


def stage_retriever():
    exp = "synth_flmr_fullsize"
    run(["--config", f"configs/{exp}.json", "--mode", "train"])
    d = latest_version(exp)
    run(["--config", f"configs/{exp}.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{d}'"])
    m = test_metrics(d)
    print(f"[fullsize R] multimodal FLMR (BERT-base/ViT-B-32/dim128) "
          f"R@5={m['pos_item_ids_recall_at_5']:.4f} "
          f"R@1={m['pos_item_ids_recall_at_1']:.4f} over 500 unseen queries")
    return m


def stage_reranker():
    static_path = "experiments/synth_static_retrieval_vision.json"
    assert os.path.exists(static_path), (
        "run tools/synth_vision_run.py --stage B first (mines the static "
        "retrieval lists this reranker trains over)")
    exp = "synth_rerank_full_context_fullsize"
    static_opt = f"model_config.retrieve_result_path='{static_path}'"
    # warm-start the spliced FLMR backbone from the stage-R full-size vision
    # retriever — the reference's standing recipe (rerankers always splice a
    # PRETRAINED PreFLMR, `Reranker_base_executor.py:185-242`); the head/tail
    # vocabs are byte-identical (same deterministic word lists), so token
    # ids align
    from synth_vision_run import resolve_ckpt

    backbone = resolve_ckpt(latest_version("synth_flmr_fullsize"))
    backbone_opt = f"model_config.reranker_backbone_path='{backbone}'"
    run(["--config", f"configs/{exp}.json", "--mode", "train", "--opts",
         static_opt, backbone_opt])
    d = latest_version(exp)
    run(["--config", f"configs/{exp}.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{d}'", static_opt, backbone_opt])
    m = test_metrics(d)
    r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
    print(f"[fullsize K] full-size vision reranker PRRecall@5 "
          f"rerank={r5:.4f} raw={raw5:.4f} delta={r5 - raw5:+.4f}")
    assert r5 > raw5, "full-size reranker did not beat raw order"
    return m


def main_driver():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["R", "K", "all"], default="all")
    args = ap.parse_args()
    if args.stage in ("R", "all"):
        stage_retriever()
    if args.stage in ("K", "all"):
        stage_reranker()
    return 0


if __name__ == "__main__":
    sys.exit(main_driver())
