"""Round-5 data-scaled stage K: 4x the training pairs for the full-size
vision reranker.

The round-5 stage-K campaign (PARITY.md §Full-size multimodal runs) showed
every healthy full-size run lands at +0.05..+0.08 over raw — matching the
reference's own margin (`plots.ipynb` cell 16, 0.23→0.28) — because 1000
train pairs cannot train a 110M-param cross-encoder past early
memorization (measured valid-recall curves: peak at epoch 1-3, then
decline). This pipeline scales the TASK, not the model: num_pairs
1500→4500 (4000 train / 500 test), everything else identical.

Stages (serialized on the one chip):
1. vtail text retriever on the scaled tail task + static top-100 mining
   for the test AND train splits -> experiments/
   synth_static_retrieval_vision_big.json (NEW path — the committed
   1500-pair chain and its .gz stay untouched).
2. scaled stage-R backbone: the full-size retriever retrained on the
   scaled HEAD task with the scaled 10240-word vocab. Required because
   warm-start is (correctly) loud about shape mismatches: the committed
   1500-pair backbone carries a 4096-row embedding that can neither fit
   nor align with the scaled vocabulary. Head and tail vocabs stay
   byte-identical (same word-list parameters), so one shared scaled
   vocab file keeps token ids aligned across all three runs.
3. stage K: the full-size FullContext vision reranker over the scaled
   lists, warm-started from the SCALED backbone, negative_sampling,
   lr 1e-4, warmup 200, per-epoch full validation + best-ckpt selection.

Usage: python tools/round5_stageK_scaled.py [--from-stage 1|2|3]
       [--pairs 4500] [--epochs 8] (repo root, real TPU)
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

STATIC_PATH = "experiments/synth_static_retrieval_vision_big.json"
GEN = "data_pipeline.transforms.input:GenerateSynthetic.setup_kwargs"


def _gen_opts(pairs: int, image_size: int):
    """Generator overrides shared by every run of the scaled task: more
    pairs, fresh image dirs (key->image assignment depends on num_pairs, so
    reusing the 1500-pair dirs would serve stale images), a DEDICATED vocab
    path (the generator rewrites its vocab file on every setup — pointing
    the scaled task at the shared path clobbers every checkpoint trained
    against the 1500-pair vocab, the exact round-3 failure mode PARITY
    documents), and a vocab_size that actually fits the scaled vocabulary
    (4500 pairs -> 9908 words; the task-sized 4096 table made every token
    id past 4095 an out-of-range gather -> NaN loss from step 1, the
    round-5 scaled-run postmortem)."""
    suffix = "_big32" if image_size == 32 else "_big224"
    vocab = [
        f"{GEN}.vocab_path='cache/synth_vision_vocab_big/vocab.txt'",
        "model_config.flmr.text_config.vocab_size=10240",
    ]
    if image_size == 224:  # stage-K config also sizes the cross-encoder
        vocab.append("model_config.cross_encoder.vocab_size=10240")
    return [
        f"{GEN}.num_pairs={pairs}",
        f"{GEN}.images_dir='cache/synth_vision_images{suffix}'",
    ] + vocab


def stage1_static_lists(pairs: int):
    t0 = time.time()
    gen = _gen_opts(pairs, 32)
    run(["--config", "configs/synth_flmr_vtail.json", "--mode", "train",
         "--opts"] + gen)
    flmr_dir = latest_version("synth_flmr_vtail")
    run(["--config", "configs/synth_flmr_vtail.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{flmr_dir}'"] + gen)
    m = test_metrics(flmr_dir)
    print(f"[r5 S1] scaled vtail raw R@5="
          f"{m['pos_item_ids_recall_at_5']:.4f} "
          f"(1500-pair point: 0.232)", flush=True)
    ckpt = resolve_ckpt(flmr_dir)
    tcfg = make_train_split_config("configs/synth_flmr_vtail.json",
                                   "synth_flmr_vtail_trainsplit")
    run(["--config", tcfg, "--mode", "test",
         "--opts", f"test.load_model_path='{ckpt}'"] + gen)
    train_dir = latest_version("synth_flmr_vtail_trainsplit")
    static = {}
    for d in (flmr_dir, train_dir):
        dump = json.load(open(os.path.join(d,
                                           "test_predictions_rank_0.json")))
        for entry in dump["predictions"]:
            static[str(entry["question_id"])] = entry["top_ranking_passages"]
    with open(STATIC_PATH, "w") as f:
        json.dump(static, f)
    print(f"[r5 S1] static retrieval for {len(static)} queries -> "
          f"{STATIC_PATH} ({time.time() - t0:.0f}s)", flush=True)


def stage2_scaled_backbone(pairs: int):
    """Scaled stage-R: head-task full-size retriever, train-only (the
    committed 1500-pair `synth_flmr_fullsize/version_0` already proves the
    head task is solvable at 0.878; this rerun exists to produce a
    backbone whose embedding rows match the scaled vocab)."""
    t0 = time.time()
    gen = [
        f"{GEN}.num_pairs={pairs}",
        f"{GEN}.images_dir='cache/synth_vision_images_head224_big'",
        f"{GEN}.vocab_path='cache/synth_vision_vocab_big/vocab.txt'",
        "model_config.flmr.text_config.vocab_size=10240",
        # 8 epochs: the 1500-pair run's ib_loss hit 0.005 by 496 steps;
        # 4x the data reaches the same token count in a quarter the epochs
        "train.trainer_paras.max_epochs=8",
    ]
    run(["--config", "configs/synth_flmr_fullsize.json", "--mode", "train",
         "--opts"] + gen)
    d = latest_version("synth_flmr_fullsize")
    print(f"[r5 S2] scaled backbone at {resolve_ckpt(d)} "
          f"({time.time() - t0:.0f}s)", flush=True)


def stage3_reranker(pairs: int, epochs: int):
    t0 = time.time()
    exp = "synth_rerank_full_context_fullsize"
    backbone = resolve_ckpt(latest_version("synth_flmr_fullsize"))
    opts = _gen_opts(pairs, 224) + [
        f"model_config.retrieve_result_path='{STATIC_PATH}'",
        f"model_config.reranker_backbone_path='{backbone}'",
        "model_config.loss_fn='negative_sampling'",
        "train.optimizer_config.optimizer_params.lr=0.0001",
        "train.optimizer_config.scheduler_params.num_warmup_steps=200",
        f"train.trainer_paras.max_epochs={epochs}",
        "train.trainer_paras.check_val_every_n_epoch=1",
        "valid.trainer_paras.limit_val_batches=32",
        "model_config.modules=['full_context_reranker',"
        "'train_with_retrieved_docs','neg_sample_retrieved',"
        "'full_validation']",
    ]
    run(["--config", f"configs/{exp}.json", "--mode", "train",
         "--opts"] + opts)
    d = latest_version(exp)
    run(["--config", f"configs/{exp}.json", "--mode", "test",
         "--opts", f"meta.experiment_dir='{d}'"] + opts)
    m = test_metrics(d)
    r5, raw5 = m["recall_at_5"], m["raw_recall_at_5"]
    print(f"[r5 K-scaled] {pairs - 500}-train-pair full-size vision "
          f"reranker PRRecall@5 rerank={r5:.4f} raw={raw5:.4f} "
          f"delta={r5 - raw5:+.4f} ({time.time() - t0:.0f}s)", flush=True)
    return 0


def main_driver():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-stage", type=int, default=1, choices=[1, 2, 3])
    ap.add_argument("--pairs", type=int, default=4500)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()
    if args.from_stage <= 1:
        stage1_static_lists(args.pairs)
    if args.from_stage <= 2:
        stage2_scaled_backbone(args.pairs)
    return stage3_reranker(args.pairs, args.epochs)


if __name__ == "__main__":
    sys.exit(main_driver())
