"""Kill-and-resume: a second process-equivalent run restores params AND
optimizer state (reference restores optimizer state on resume,
`FLMR_base_executor.py:354-359`; Lightning passes ckpt_path to fit)."""

import json
import os

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.cli.main import main

pytestmark = pytest.mark.filterwarnings("ignore")


def _opts(tmp_path):
    return [
        f"meta.EXPERIMENT_FOLDER='{tmp_path}/experiments'",
        f"data_pipeline.cache_dir='{tmp_path}/cache'",
    ]


def test_flmr_kill_and_resume(tmp_path):
    # phase 1: train 2 steps, checkpointing every step, then "die"
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path)),
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
        "train.save_interval=1",
        "valid.trainer_paras.limit_val_batches=0",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_flmr" / "version_0")
    ckpts = os.path.join(exp_dir, "ckpts")
    with open(os.path.join(ckpts, "index.json")) as f:
        index = json.load(f)
    assert index["last"] == "step_2"

    # phase 2: a fresh run resumes from the last checkpoint — the step
    # counter continues (3, 4) instead of restarting (1, 2), proving params,
    # optimizer state, and step all round-tripped
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "train",
        "--use_dummy_data",
        "--opts", *(_opts(tmp_path)),
        f"meta.experiment_dir='{exp_dir}'",
        "train.resume=True",
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
        "train.save_interval=1",
        "valid.trainer_paras.limit_val_batches=0",
    ])
    assert rc == 0
    steps = []
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if "total_loss" in row:
                steps.append(row["step"])
                assert np.isfinite(row["total_loss"])
    assert steps == [1, 2, 3, 4], steps


def test_reranker_opt_state_roundtrip(tmp_path):
    """The reranker checkpoint carries optimizer state: resumed training
    continues from the restored moments (exact leaf equality after restore)."""
    import jax

    from reranking_multimodal_retrievers_tpu.executors.experiment import Experiment
    from reranking_multimodal_retrievers_tpu.utils.config_system import load_config, apply_opts
    from reranking_multimodal_retrievers_tpu.training.checkpointing import (
        CheckpointManager, pack_opt_state, unpack_opt_state,
    )

    config = load_config("configs/okvqa_rerank_full_context.json")
    apply_opts(config, _opts(tmp_path) + [
        "train.trainer_paras.max_epochs=1",
        "train.trainer_paras.limit_train_batches=2",
    ])
    config.set_path("mode", "train")
    exp = Experiment(config, use_dummy_data=True)
    exp.train()
    ex = exp.executor
    saved = ex.state_to_save()
    assert "opt_state" in saved and saved["opt_state"]

    path = ex.ckpt_manager.save(saved, step=99)
    restored = CheckpointManager.restore(path)
    rebuilt = unpack_opt_state(ex._opt_state, restored["opt_state"])
    for a, b in zip(
        jax.tree_util.tree_leaves(rebuilt),
        jax.tree_util.tree_leaves(ex._opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
