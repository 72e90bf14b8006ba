"""Synthetic-task accuracy demonstration driver (VERDICT r1 #1).

Runs the full pipeline on one device (TPU by default — run with no JAX env
overrides from the repo root):

1. train the FLMR retriever on the adjacency-pair task (configs/synth_flmr);
2. retrieve top-100 for the TRAIN and TEST query splits with the trained
   retriever (two `--mode test` runs; the train-split one swaps the test
   loader to split='train');
3. merge both prediction dumps into a static-retrieval json
   (`RerankerExecutor.init_retrieve` shape, reference
   `Reranker_base_executor.py:244-271`);
4. train the FullContextRerankModel on retrieved docs (1 gold positive + N
   retrieved hard negatives, `neg_sample_retrieved`);
5. rerank the top-100 per test query and report reranked-vs-raw PRRecall@K
   side by side (`compute_rerank_DPR_scores`, reference
   `metrics_processors.py:712`).

Success = reranked recall_at_5 > raw_recall_at_5 by a clear margin over the
500-query test split, with ≥300-step training curves in each experiment's
metrics.jsonl — the qualitative shape of the reference's OK-VQA plot
(0.23 → 0.28, `plots.ipynb` cell 16).

Usage: python tools/synth_accuracy_run.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reranking_multimodal_retrievers_tpu.cli.main import main  # noqa: E402

# --scale big: 4000 pairs / 80k passages / 10240-word vocab — the scale at
# which the DECODER rerankers generalize (at the default 1500-pair scale a
# 2-layer causal LM memorizes the ~1000 train keys instead of learning the
# key-matching circuit; the bidirectional cross-encoder generalizes at both)
SCALES = {
    "default": {"suffix": "", "static": "experiments/synth_static_retrieval.json"},
    "big": {"suffix": "_big",
            "static": "experiments/synth_static_retrieval_big.json"},
}


def run(args_list):
    rc = main(args_list)
    assert rc == 0, f"CLI failed ({rc}): {args_list}"


def latest_version(exp_name: str) -> str:
    base = os.path.join("experiments", exp_name)
    versions = sorted(
        (d for d in os.listdir(base) if d.startswith("version_")),
        key=lambda d: int(d.split("_")[1]),
    )
    return os.path.join(base, versions[-1])


def make_train_split_config(suffix: str = "") -> str:
    """synth_flmr variant whose test loader serves the TRAIN queries (for
    mining the reranker's training retrieval lists)."""
    cfg = json.load(open(f"configs/synth_flmr{suffix}.json"))
    ds_cfg = cfg["data_pipeline"]["transforms"]["output:PrepareDataloaders"][
        "setup_kwargs"]["datasets_config"]
    ds_cfg["test"][0]["split"] = "train"
    cfg["meta"]["experiment_name"] = f"synth_flmr{suffix}_trainsplit"
    # generated configs live under cache/ (never tracked), not configs/
    os.makedirs("cache", exist_ok=True)
    path = f"cache/_generated_synth_flmr{suffix}_trainsplit.json"
    json.dump(cfg, open(path, "w"), indent=2)
    return path


def main_driver():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny epochs for a smoke pass")
    ap.add_argument("--skip-retriever", action="store_true",
                    help="reuse existing retriever ckpt + static retrieval")
    ap.add_argument("--encoder-only", action="store_true",
                    help="skip the decoder (monoBLIP2-Opt) reranker stage")
    ap.add_argument("--scale", choices=sorted(SCALES), default="default",
                    help="task scale; 'big' uses the *_big configs")
    ap.add_argument("--families", default=None,
                    help="comma-separated config basenames (sans scale "
                         "suffix) overriding the default family list, e.g. "
                         "'synth_rerank_decoder_blip2_t5'")
    args = ap.parse_args()

    sc = SCALES[args.scale]
    sfx, static_path = sc["suffix"], sc["static"]
    if args.quick:
        # quick is a plumbing smoke pass: keep its 1-epoch retrieval out of
        # the full-run static file that --skip-retriever reuses
        static_path = static_path.replace(".json", "_quick.json")
    epochs = "1" if args.quick else ("8" if sfx else "12")
    rr_epochs = "1" if args.quick else ("3" if sfx else "4")

    if not args.skip_retriever:
        # 1. retriever training
        run(["--config", f"configs/synth_flmr{sfx}.json", "--mode", "train",
             "--opts", f"train.trainer_paras.max_epochs={epochs}"])
        flmr_dir = latest_version(f"synth_flmr{sfx}")
        print(f"[synth] retriever trained -> {flmr_dir}")

        # 2a. retrieve for the TEST split
        run(["--config", f"configs/synth_flmr{sfx}.json", "--mode", "test",
             "--opts", f"meta.experiment_dir='{flmr_dir}'"])
        # 2b. retrieve for the TRAIN split (fresh experiment dir, explicit
        # checkpoint path — resolution order `experiment.py:483-514`)
        from reranking_multimodal_retrievers_tpu.training.checkpointing import (
            CheckpointManager,
        )

        ckpt = CheckpointManager(os.path.join(flmr_dir, "ckpts")).resolve()
        assert ckpt, f"no checkpoint under {flmr_dir}/ckpts"
        tcfg = make_train_split_config(sfx)
        run(["--config", tcfg, "--mode", "test",
             "--opts", f"test.load_model_path='{ckpt}'"])
        train_dir = latest_version(f"synth_flmr{sfx}_trainsplit")

        # 3. merge into static retrieval
        static = {}
        for d in (flmr_dir, train_dir):
            dump = json.load(open(os.path.join(
                d, "test_predictions_rank_0.json")))
            for entry in dump["predictions"]:
                static[str(entry["question_id"])] = entry[
                    "top_ranking_passages"]
        os.makedirs("experiments", exist_ok=True)
        with open(static_path, "w") as f:
            json.dump(static, f)
        print(f"[synth] static retrieval for {len(static)} queries -> "
              f"{static_path}")

    # 4+5 per reranker family: train on retrieved docs, rerank the test
    # split, assert rerank beats the raw retrieval order. The decoder
    # (monoBLIP2-Opt yes/no) family is the reference's best model
    # (`plots.ipynb` cell 16, R@5 0.40) — demonstrating its learning
    # dynamics too, not just the encoder family's.
    dec_epochs = "1" if args.quick else ("6" if sfx else "4")
    # the interaction family trains a from-scratch cross-attention stack over
    # FROZEN 64-d late-interaction features — no token identities to latch
    # onto — so it needs several times the epochs of the families that train
    # a text encoder end-to-end (its config also carries a hotter lr)
    int_epochs = "1" if args.quick else ("8" if sfx else "16")

    def is_encoder(name: str) -> bool:
        return "full_context" in name or "interaction" in name

    def epochs_for(name: str) -> str:
        if "interaction" in name:
            return int_epochs
        return rr_epochs if is_encoder(name) else dec_epochs

    if args.families:
        families = [(f"{name}{sfx}", epochs_for(name))
                    for name in args.families.split(",") if name]
    else:
        families = [(f"synth_rerank_full_context{sfx}", rr_epochs)]
        if not args.encoder_only:
            families.append((f"synth_rerank_decoder_blip2_opt{sfx}",
                             dec_epochs))
    static_opt = f"model_config.retrieve_result_path='{static_path}'"
    for exp, ep in families:
        extra = []
        if "interaction" in exp or "fusion" in exp:
            # these families score against a FROZEN retriever; point it at
            # the stage-1 trained synth FLMR checkpoint (the reference loads
            # pretrained PreFLMR, `Reranker_base_executor.py:210-241`)
            from reranking_multimodal_retrievers_tpu.training.checkpointing import (
                CheckpointManager,
            )

            flmr_dir = latest_version(f"synth_flmr{sfx}")
            rck = CheckpointManager(os.path.join(flmr_dir, "ckpts")).resolve()
            assert rck, f"no retriever checkpoint under {flmr_dir}/ckpts"
            extra = [f"model_config.retriever_model_path='{rck}'"]
        run(["--config", f"configs/{exp}.json", "--mode", "train",
             "--opts", f"train.trainer_paras.max_epochs={ep}", static_opt,
             *extra])
        rr_dir = latest_version(exp)

        run(["--config", f"configs/{exp}.json", "--mode", "test",
             "--opts", f"meta.experiment_dir='{rr_dir}'", static_opt, *extra])
        dump = json.load(open(os.path.join(rr_dir,
                                           "test_predictions_rank_0.json")))
        m = dump["metrics"]
        print(json.dumps({k: v for k, v in m.items() if "recall" in k},
                         indent=1))
        r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
        print(f"[synth] {exp} PRRecall@5 rerank={r5:.4f} raw={raw5:.4f} "
              f"delta={r5 - raw5:+.4f}")
        # the decoder families only generalize at --scale big (see SCALES
        # note: at default scale the 2-layer causal LM memorizes train keys
        # — the committed default-scale decoder artifact shows the same).
        # The interaction family also memorizes at default scale: a
        # from-scratch cross-attention stack over FROZEN 64-d features has no
        # token identities to generalize over (train loss 0.005, valid ~1.0;
        # even its train-split rerank trails raw — the committed artifact is
        # the documented negative). Assert the margin only where learning is
        # expected.
        decisive = not args.quick and ("full_context" in exp
                                       or "fusion" in exp or sfx)
        if decisive:
            assert r5 > raw5, f"{exp} did not beat raw retrieval order"
        elif r5 <= raw5:
            why = ("expected at 1 epoch; run without --quick" if args.quick
                   else "expected at default scale for decoders; use "
                        "--scale big")
            print(f"[synth] NOTE: {exp} did not beat raw ({why})")
    return 0


if __name__ == "__main__":
    sys.exit(main_driver())
