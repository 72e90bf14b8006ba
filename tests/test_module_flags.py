"""The reference's full `model_config.modules` flag vocabulary (SURVEY §5).

Each flag named in the reference grep
(`Reranker_base_executor.py:151-183,568-601`, `FLMR_base_executor.py:722-723`,
`dpr_datasets.py:128-139`, `retriever_dpr.py:55,89`) must be recognized and
change behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_separate_query_and_item_encoders_flag():
    from reranking_multimodal_retrievers_tpu.models.legacy_retrievers import (
        DPRConfig, VisualDPR,
    )

    ids = jnp.ones((2, 8), jnp.int32)
    am = jnp.ones((2, 8), jnp.int32)
    item_ids = jnp.ones((4, 8), jnp.int32)
    item_am = jnp.ones((4, 8), jnp.int32)
    sep = VisualDPR(DPRConfig.tiny())
    shared = VisualDPR(DPRConfig.tiny(separate_query_and_item_encoders=False))
    p_sep = sep.init(jax.random.PRNGKey(0), ids, am, item_ids, item_am)["params"]
    p_sh = shared.init(jax.random.PRNGKey(0), ids, am, item_ids, item_am)["params"]
    assert "item_encoder" in p_sep and "item_encoder" not in p_sh
    out = shared.apply({"params": p_sh}, ids, am, item_ids, item_am)
    assert np.isfinite(float(out.loss))


def test_use_self_negatives_restricts_source():
    from reranking_multimodal_retrievers_tpu.data.datasets import (
        CommonDatasetForDPR,
    )

    rows = [{"question_id": "q0", "questions": "x", "pos_item_ids": ["A0"],
             "source_name": "A"}]
    id2doc = {f"{s}{i}": f"text {s}{i}" for s in "AB" for i in range(6)}
    id2source = {k: k[0] for k in id2doc}

    class _DS(CommonDatasetForDPR):
        def __init__(self, **kw):
            CommonDatasetForDPR.__init__(
                self, config={}, dataset=rows, modules_config={}, **kw,
            )

    ds = _DS(passages={"id2doc": id2doc}, num_negative_samples=4,
             use_self_negatives=True, id2source=id2source)
    sample = ds[0]
    assert all(n.startswith("A") for n in sample["neg_item_ids"]), sample
    ds2 = _DS(passages={"id2doc": id2doc}, num_negative_samples=4,
              use_self_negatives=False, id2source=id2source)
    # without the flag, cross-source negatives are allowed (statistically
    # certain over a few draws with 6/12 ids per source)
    negs = set()
    for _ in range(8):
        negs.update(ds2[0]["neg_item_ids"])
    assert any(n.startswith("B") for n in negs)


def test_flipr_flag_in_engine_config():
    from reranking_multimodal_retrievers_tpu.engine import EngineConfig

    cfg = EngineConfig.make(interaction="flipr", query_maxlen=64)
    assert cfg.interaction == "flipr"


def test_fusion_with_mores_constructs(tmp_path):
    """VERDICT r1 weak #6: preflmr_attention_fusion × interaction_type=MORES.
    The reference's MORESSym raises NotImplementedError at runtime
    (`mores_model.py:74-75`) even though its interaction model builds and
    passes the fusion bias; here the combination is supported (the fusion
    block decomposes onto MORES's factored attention — semantics tested in
    `test_rerankers.py::test_interaction_rerank_fusion`), so the executor
    must construct it."""
    import json

    import reranking_multimodal_retrievers_tpu.data.ops  # noqa: F401 (registry)
    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )
    from reranking_multimodal_retrievers_tpu.utils.config_system import (
        ConfigDict,
    )

    cfg = ConfigDict(json.load(open("configs/okvqa_rerank_interaction.json")))
    cfg.data_pipeline["cache_dir"] = str(tmp_path / "cache")
    cfg.meta["experiment_dir"] = str(tmp_path / "exp")
    assert cfg.model_config["interaction_type"] == "MORES"
    cfg.model_config["modules"] = list(
        set(cfg.model_config.get("modules", []))
        | {"interaction_reranker", "preflmr_attention_fusion"}
    )
    ex_mores = RerankerExecutor(cfg, use_dummy_data=True)
    assert ex_mores.reranker_family == "interaction"
    assert ex_mores.reranker_config.interaction_type == "MORES"

    # the supported combination (CrossEncoder + fusion) still constructs
    cfg2 = ConfigDict(json.load(open("configs/okvqa_rerank_interaction.json")))
    cfg2.data_pipeline["cache_dir"] = str(tmp_path / "cache2")
    cfg2.meta["experiment_dir"] = str(tmp_path / "exp2")
    cfg2.model_config["interaction_type"] = "CrossEncoder"
    cfg2.model_config["modules"] = list(
        set(cfg2.model_config.get("modules", []))
        | {"interaction_reranker", "preflmr_attention_fusion"}
    )
    ex = RerankerExecutor(cfg2, use_dummy_data=True)
    assert ex.reranker_family == "interaction"


def test_neg_sample_retrieved_actually_samples(tmp_path):
    """`neg_sample_retrieved` must SAMPLE negatives from the retrieved list
    (reference `Reranker_base_executor.py:486-531` uses
    ``local_random.sample``), not slice the top-N deterministically — a
    model trained on a frozen 5-doc subset treats the other 95 eval
    candidates as out-of-distribution and reranks worse than raw."""
    import json

    import reranking_multimodal_retrievers_tpu.data.ops  # noqa: F401 (registry)
    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )
    from reranking_multimodal_retrievers_tpu.utils.config_system import (
        ConfigDict,
    )

    cfg = ConfigDict(json.load(open("configs/okvqa_rerank_full_context.json")))
    cfg.data_pipeline["cache_dir"] = str(tmp_path / "cache")
    cfg.meta["experiment_dir"] = str(tmp_path / "exp")
    assert "neg_sample_retrieved" in cfg.model_config["modules"]
    ex = RerankerExecutor(cfg, use_dummy_data=True)

    docs = [{"passage_id": f"d{i}", "content": f"doc {i}", "score": -i}
            for i in range(ex.docs_to_rerank)]
    ex.questionId2topPassages["q_samp"] = docs
    ex.id2doc.update({d["passage_id"]: d["content"] for d in docs})

    seen_negs = set()
    for _ in range(40):
        sel, lab = ex._select_training_docs("q_samp", ["d3"])
        assert sel[0] == "d3" and lab[0] == 1  # positive first, labeled 1
        assert all(l == 0 for l in lab[1:])
        assert "d3" not in sel[1:]
        seen_negs.update(sel[1:])
    # over 40 draws the union of sampled negatives must go far beyond a
    # deterministic top-N slice
    assert len(seen_negs) > ex.num_negative_samples * 3, seen_negs


def test_retriever_model_path_loads_frozen_retriever(tmp_path):
    """The reference's interaction/fusion rerankers score against a
    PRETRAINED frozen PreFLMR retriever (`Reranker_base_executor.py:210-241`);
    `model_config.retriever_model_path` is the equivalent here — an orbax
    checkpoint from FLMRExecutor restored into the frozen retriever, with a
    loud failure on a config/checkpoint tree mismatch."""
    import json

    import jax
    import numpy as np

    import reranking_multimodal_retrievers_tpu.data.ops  # noqa: F401 (registry)
    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )
    from reranking_multimodal_retrievers_tpu.training.checkpointing import (
        CheckpointManager,
    )
    from reranking_multimodal_retrievers_tpu.utils.config_system import (
        ConfigDict,
    )

    def make_cfg(sub):
        cfg = ConfigDict(json.load(open("configs/okvqa_rerank_interaction.json")))
        cfg.data_pipeline["cache_dir"] = str(tmp_path / sub / "cache")
        cfg.meta["experiment_dir"] = str(tmp_path / sub / "exp")
        return cfg

    ex0 = RerankerExecutor(make_cfg("a"), use_dummy_data=True)
    assert ex0._retriever_params is not None

    # a "trained" retriever: every leaf shifted by a recognizable constant
    trained = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 0.125, ex0._retriever_params
    )
    cm = CheckpointManager(str(tmp_path / "ckpt"))
    path = cm.save({"params": trained}, step=7)

    cfg = make_cfg("b")
    cfg.model_config["retriever_model_path"] = path
    ex1 = RerankerExecutor(cfg, use_dummy_data=True)
    got = jax.tree_util.tree_leaves(ex1._retriever_params)
    want = jax.tree_util.tree_leaves(trained)
    assert all(np.allclose(g, w) for g, w in zip(got, want))

    # a checkpoint whose tree does not match the configured retriever fails
    # loudly instead of silently scoring with random weights
    bad = cm.save({"params": {"bogus": np.zeros((3,), np.float32)}},
                  step=8, name="bad")
    cfg2 = make_cfg("c")
    cfg2.model_config["retriever_model_path"] = bad
    import pytest

    with pytest.raises(ValueError, match="retriever_model_path"):
        RerankerExecutor(cfg2, use_dummy_data=True)


def test_use_int8_index_flag(tmp_path):
    """'use_int8_index' routes eval retrieval through the W8A8
    QuantizedTokenIndex exact scan (`executors/flmr_executor.py`)."""
    import json
    import os

    from reranking_multimodal_retrievers_tpu.cli.main import main

    opts = [
        f"meta.EXPERIMENT_FOLDER='{tmp_path}/experiments'",
        f"data_pipeline.cache_dir='{tmp_path}/cache'",
    ]
    rc = main([
        "--config", "configs/okvqa_flmr.json", "--mode", "test",
        "--use_dummy_data",
        "--opts", *opts,
        "model_config.modules=['use_int8_index']",
        "test.trainer_paras.limit_test_batches=1",
    ])
    assert rc == 0
    exp_dir = str(tmp_path / "experiments" / "okvqa_flmr" / "version_0")
    preds = os.path.join(exp_dir, "test_predictions_rank_0.json")
    with open(preds) as f:
        dump = json.load(f)
    assert "recall_at_5" in dump["metrics"]
    assert dump["predictions"][0]["top_ranking_passages"]
