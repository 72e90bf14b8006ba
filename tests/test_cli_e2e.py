"""End-to-end CLI smoke tests on dummy data (the reference's de-facto
integration test shape: real configs + limit_batches, SURVEY.md §4)."""

import json
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


def test_prepare_data_mode(tmp_path):
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "prepare_data",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path, "prep")),
    ])
    assert rc == 0
