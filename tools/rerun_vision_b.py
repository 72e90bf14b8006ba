"""Resume `synth_vision_run.py --stage B` after the reranker step: reuse the
already-trained tail-corpus retriever + mined static lists and (re)train just
the two vision rerankers, then run stage C. One-shot recovery helper."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_vision_run import (  # noqa: E402
    latest_version, resolve_ckpt, run, stage_c, test_metrics,
)


def main():
    static_path = "experiments/synth_static_retrieval_vision.json"
    assert os.path.exists(static_path)
    ckpt = resolve_ckpt(latest_version("synth_flmr_vtail"))
    # the stage-A vision-trained FLMR: its ViT + mapping network already hold
    # the (position, color) → key-word circuit; the reference's rerankers are
    # likewise never trained from scratch — they splice a pretrained PreFLMR
    backbone = resolve_ckpt(latest_version("synth_flmr_vision"))
    static_opt = f"model_config.retrieve_result_path='{static_path}'"
    backbone_opt = f"model_config.reranker_backbone_path='{backbone}'"
    results = {}
    exps = os.environ.get(
        "RERUN_EXPS",
        "synth_rerank_full_context_vision,synth_rerank_fusion_vision",
    ).split(",")
    for exp in exps:
        # fusion's FROZEN retriever is the stage-A VISION FLMR: its MaxSim
        # score matrix over (query text+image tokens) × context tokens is the
        # attention bias — the image↔tail-key matches the raw text order is
        # blind to (reference `rerank_model.py:276-319` semantics)
        extra = ([f"model_config.retriever_model_path='{backbone}'"]
                 if "fusion" in exp else [])
        run(["--config", f"configs/{exp}.json", "--mode", "train",
             "--opts", "train.trainer_paras.max_epochs=12", static_opt,
             backbone_opt, *extra])
        rr_dir = latest_version(exp)
        run(["--config", f"configs/{exp}.json", "--mode", "test",
             "--opts", f"meta.experiment_dir='{rr_dir}'", static_opt, *extra])
        m = test_metrics(rr_dir)
        r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
        results[exp] = (r5, raw5)
        print(f"[vision B] {exp} PRRecall@5 rerank={r5:.4f} raw={raw5:.4f} "
              f"delta={r5 - raw5:+.4f}")
    print(json.dumps({"stage_c": stage_c()}, indent=1))
    failed = [e for e, (r5, raw5) in results.items() if r5 <= raw5 + 0.1]
    if failed:
        print(f"[vision B] below raw+0.1 margin: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
