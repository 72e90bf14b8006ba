"""End-to-end CLI smoke tests on dummy data (the reference's de-facto
integration test shape: real configs + limit_batches, SURVEY.md §4)."""

import json
import math
import os

import pytest

from reranking_multimodal_retrievers_tpu.cli.main import main

pytestmark = pytest.mark.filterwarnings("ignore")


def _opts(tmp_path, name):
    return [
        f"meta.EXPERIMENT_FOLDER='{tmp_path}/experiments'",
        f"data_pipeline.cache_dir='{tmp_path}/cache'",
    ]


def test_flmr_train_then_test(tmp_path):
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "flmr")),
        "train.trainer_paras.max_epochs=1",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_flmr" / "version_0")
    assert os.path.exists(os.path.join(exp_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(exp_dir, "config.json"))

    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "flmr")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    preds = os.path.join(exp_dir, "test_predictions_rank_0.json")
    assert os.path.exists(preds)
    with open(preds) as f:
        dump = json.load(f)
    assert "recall_at_5" in dump["metrics"]
    assert dump["predictions"][0]["top_ranking_passages"]

    # eval mode recomputes metrics from the prediction dump
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "eval",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "flmr")),
        f"meta.experiment_dir='{exp_dir}'",
    ])
    assert rc == 0


def test_reranker_train_then_test(tmp_path):
    rc = main([
        "--config", "configs/okvqa_rerank_full_context.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "rr")),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rerank_full_context" / "version_0")
    rc = main([
        "--config", "configs/okvqa_rerank_full_context.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "rr")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    with open(os.path.join(exp_dir, "test_predictions_rank_0.json")) as f:
        dump = json.load(f)
    # side-by-side rerank vs raw metrics present
    assert "raw_recall_at_5" in dump["metrics"]
    assert "pos_item_ids_raw_recall_at_5" in dump["metrics"]


def test_spliced_fusion_reranker_train_then_test(tmp_path):
    """Spliced RerankModel + PreFLMR attention fusion e2e: the frozen
    retriever's token-score matrix biases the cross-encoder attention
    (reference `Reranker_base_executor.py:590-592`, `rerank_model.py:276-319`)."""
    rc = main([
        "--config", "configs/okvqa_rerank_fusion.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "fu")),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rerank_fusion" / "version_0")
    rc = main([
        "--config", "configs/okvqa_rerank_fusion.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "fu")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    with open(os.path.join(exp_dir, "test_predictions_rank_0.json")) as f:
        dump = json.load(f)
    assert "recall_at_5" in dump["metrics"]
    assert dump["predictions"][0]["top_ranking_passages"]


def test_spliced_fusion_text_only_train_then_test(tmp_path):
    """text_only × spliced RerankModel × fusion: no pixel tensors anywhere —
    the ViT is skipped entirely (the reference's text_only module instead
    zeroes the vision branch, `rerank_model.py:352-358`). This is the
    configuration the synthetic-task fusion demo runs
    (`configs/synth_rerank_fusion.json`)."""
    cfg = json.load(open("configs/okvqa_rerank_fusion.json"))
    cfg["model_config"]["modules"] = list(
        set(cfg["model_config"]["modules"]) | {"text_only"}
    )
    cfg_path = str(tmp_path / "fusion_text_only.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    rc = main([
        "--config", cfg_path, "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "fut")),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rerank_fusion" / "version_0")
    rc = main([
        "--config", cfg_path, "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "fut")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    with open(os.path.join(exp_dir, "test_predictions_rank_0.json")) as f:
        dump = json.load(f)
    assert "recall_at_5" in dump["metrics"]
    assert dump["predictions"][0]["top_ranking_passages"]


def test_blip2_decoder_reranker_train_then_test(tmp_path):
    """The real-backbone (BLIP-2/Flan-T5 + LoRA) decoder reranker e2e
    (reference `decoder_rerank_model.py:81-159`)."""
    rc = main([
        "--config", "configs/okvqa_rerank_decoder_blip2.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "b2")),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rerank_decoder_blip2" / "version_0")
    rc = main([
        "--config", "configs/okvqa_rerank_decoder_blip2.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "b2")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    with open(os.path.join(exp_dir, "test_predictions_rank_0.json")) as f:
        dump = json.load(f)
    assert "recall_at_5" in dump["metrics"]


def test_full_validation_drives_best_checkpoint_monitor(tmp_path):
    """With the `full_validation` module flag, validation runs the full
    rerank eval (not loss-only), the valid/recall metrics land in
    metrics.jsonl, and the checkpoint index carries the monitored ranking
    score so best-checkpoint resolution works (reference role: Lightning
    ModelCheckpoint monitoring valid/pos_item_ids_recall_at_5 —
    `Reranker_base_executor.py` fast vs full evaluate split)."""
    rc = main([
        "--config", "configs/okvqa_rerank_full_context.json", "--mode",
        "train", "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "fv")),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.check_val_every_n_epoch=1",
        "train.monitor='pos_item_ids_recall_at_5'",
        "train.monitor_mode='max'",
        "valid.trainer_paras.limit_val_batches=2",
        "model_config.modules=['full_context_reranker',"
        "'train_with_retrieved_docs','neg_sample_retrieved',"
        "'full_validation']",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rerank_full_context"
                  / "version_0")
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("valid/pos_item_ids_recall_at_5" in r for r in rows)
    with open(os.path.join(exp_dir, "ckpts", "index.json")) as f:
        index = json.load(f)
    assert index["checkpoints"], index
    assert "pos_item_ids_recall_at_5" in index["checkpoints"][-1]["metrics"]
    assert index["best"] is not None
    assert index["best"]["score"] is not None


def test_evqa_retrieve_then_rerank(tmp_path):
    """EVQA end-to-end (BASELINE.json configs[4]): FLMR retrieve → dump
    predictions → rerank the static retrieval with the cross-encoder →
    compute_rerank_DPR_scores (reference EVQA configs under
    `configs/Rerank/EVQA/`, dataset `evqa_datasets.py:44`)."""
    rc = main([
        "--config", "configs/evqa_flmr.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "ev")),
        "train.trainer_paras.max_epochs=1",
    ])
    assert rc == 0
    flmr_dir = str(tmp_path / "experiments" / "evqa_flmr" / "version_0")
    rc = main([
        "--config", "configs/evqa_flmr.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "ev")),
        f"meta.experiment_dir='{flmr_dir}'",
        "test.trainer_paras.limit_test_batches=2",
    ])
    assert rc == 0
    retrieve_dump = os.path.join(flmr_dir, "test_predictions_rank_0.json")
    assert os.path.exists(retrieve_dump)

    rr_dir = str(tmp_path / "experiments" / "evqa_rerank_full_context" / "version_0")
    rc = main([
        "--config", "configs/evqa_rerank_full_context.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "ev")),
        f"meta.experiment_dir='{rr_dir}'",
        f"model_config.retrieve_result_path='{retrieve_dump}'",
        "test.trainer_paras.limit_test_batches=2",
    ])
    assert rc == 0
    with open(os.path.join(rr_dir, "test_predictions_rank_0.json")) as f:
        dump = json.load(f)
    # rerank-vs-raw side-by-side present, over the real retrieved lists
    assert "recall_at_5" in dump["metrics"]
    assert "raw_recall_at_5" in dump["metrics"]
    assert not any(
        p.get("static_retrieval_missing") for p in dump["predictions"]
    )


def test_prepare_data_mode(tmp_path):
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "prepare_data",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "prep")),
    ])
    assert rc == 0


def test_rag_blip2_train_then_test(tmp_path):
    """RAG answer generation (reference `RAG_BLIP_executor.py` — working
    here: RAG-sequence marginal loss over retrieved docs + per-doc greedy
    generation with a BLIP-2 generator)."""
    rc = main([
        "--config", "configs/okvqa_rag_blip2.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "rag")),
        "train.trainer_paras.max_epochs=1",
        "valid.trainer_paras.limit_val_batches=0",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_rag_blip2" / "version_0")
    assert os.path.exists(os.path.join(exp_dir, "metrics.jsonl"))
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(math.isfinite(l) for l in losses)

    rc = main([
        "--config", "configs/okvqa_rag_blip2.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "rag")),
        f"meta.experiment_dir='{exp_dir}'",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    preds = os.path.join(exp_dir, "test_predictions_rank_0.json")
    with open(preds) as f:
        dump = json.load(f)
    # per-doc generations present → the reference's beam-ranked EM family
    # (metrics_processors.py:90-142), ranked by real per-doc generation loss
    assert "exact_match_at_1" in dump["metrics"]
    assert "exact_match_at_5" in dump["metrics"]
    entry = dump["predictions"][0]
    assert "per_doc_predictions" in entry and "loss_with_doc_scores" in entry
    assert len(entry["per_doc_predictions"]) == len(entry["loss_with_doc_scores"])


def test_validation_indexing_source(tmp_path):
    """validation_indexing_source (reference `FLMR_base_executor.py:230-255`):
    validation retrieval runs each query against ITS source dataset's
    passage sub-corpus, not the merged one."""
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "vis")),
        "train.trainer_paras.max_epochs=1",
        "model_config.validation_indexing_source=['okvqa','wit']",
        "valid.trainer_paras.limit_val_batches=1",
    ])
    assert rc == 0
    # the run's validation retrieval wrote predictions via metrics; re-run a
    # test-mode pass in valid mode by checking the executor wiring directly
    from reranking_multimodal_retrievers_tpu.utils.config_system import (
        load_config,
    )
    from reranking_multimodal_retrievers_tpu.utils.registries import (
        Executor_Registry,
    )

    cfg = load_config("configs/okvqa_flmr.json")
    cfg.meta.EXPERIMENT_FOLDER = f"{tmp_path}/experiments"
    cfg.data_pipeline.cache_dir = f"{tmp_path}/cache"
    cfg.model_config.validation_indexing_source = ["okvqa", "wit"]
    ex = Executor_Registry["FLMRExecutor"](cfg, use_dummy_data=True)
    # sub-corpora got built and partition the dummy corpus by source
    assert set(ex.source_id2doc) == {"okvqa", "wit"}
    n = sum(len(v) for v in ex.source_id2doc.values())
    assert n == len(ex.id2doc) and all(ex.source_id2doc.values())
    out = ex.evaluate("valid")
    by_src = {"okvqa": 0, "wit": 1}
    for entry in out["batch_retrieval_result"]:
        qid = entry["question_id"]
        qnum = int(qid[1:])
        src = ["okvqa", "wit"][qnum % 2]
        # every retrieved pid comes from the query's own source pool
        for p in entry["top_ranking_passages"]:
            pnum = int(p["passage_id"][1:])
            assert pnum % 2 == by_src[src], (qid, p["passage_id"])


def test_multimodal_docs_indexing(tmp_path):
    """'multimodal_docs' (reference `FLMR_base_executor.py:703-715`): per-doc
    image features prepend vision tokens during corpus indexing — the built
    index must differ from the text-only one."""
    import numpy as np

    from reranking_multimodal_retrievers_tpu.utils.config_system import (
        load_config,
    )
    from reranking_multimodal_retrievers_tpu.utils.registries import (
        Executor_Registry,
    )
    import reranking_multimodal_retrievers_tpu.executors  # register

    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "prepare_data",
        "--use_dummy_data", "--opts", *(_opts(tmp_path, "mm")),
    ])
    assert rc == 0
    cfg = load_config("configs/okvqa_flmr.json")
    cfg.meta.EXPERIMENT_FOLDER = f"{tmp_path}/experiments"
    cfg.data_pipeline.cache_dir = f"{tmp_path}/cache"
    ex = Executor_Registry["FLMRExecutor"](cfg, use_dummy_data=True)
    plain = ex.build_index()

    # attach per-passage vision features shaped for the config's vision tower
    img = ex.model.config.vision_config.hidden_size
    rng = np.random.default_rng(0)
    ex.prepared_data["id2doc_image_features"] = {
        pid: rng.normal(size=(img,)).astype(np.float32)
        for pid in ex.id2doc
    }
    cfg.model_config.modules = list(
        cfg.model_config.get("modules", [])) + ["multimodal_docs"]
    mm = ex.build_index()
    # vision tokens extend the doc representation: more valid tokens and
    # different embeddings
    assert mm.mask.sum() > plain.mask.sum()
    assert mm.embeddings.shape != plain.embeddings.shape or not np.allclose(
        np.asarray(mm.embeddings, np.float32),
        np.asarray(plain.embeddings, np.float32),
    )
