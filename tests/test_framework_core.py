"""Config system, pipeline DAG + caching, metrics processors, EvalRecorder."""

import os

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.utils import (
    ConfigDict,
    apply_opts,
    load_config,
    register_transform_functor,
)
from reranking_multimodal_retrievers_tpu.utils.config_system import merge_patch
from reranking_multimodal_retrievers_tpu.data import DataPipeline, BaseTransform
from reranking_multimodal_retrievers_tpu.metrics import MetricsProcessor, EvalRecorder
from reranking_multimodal_retrievers_tpu.metrics.retrieval_metrics import (
    recall_at_k,
    ndcg_at_k,
)
from reranking_multimodal_retrievers_tpu.metrics.vqa_accuracy import (
    normalize_answer,
    vqa_accuracy,
)


# ------------------------------------------------------------------ config
def test_config_dict_paths_and_opts():
    cfg = ConfigDict({"train": {"batch_size": 8, "trainer_paras": {"max_epochs": 2}}})
    assert cfg.train.batch_size == 8
    apply_opts(cfg, ["train.batch_size=32", "train.trainer_paras.max_epochs=5",
                     "test.new_key='hello'"])
    assert cfg.train.batch_size == 32
    assert cfg.train.trainer_paras.max_epochs == 5
    assert cfg.test.new_key == "hello"


def test_merge_patch_jsonnet_semantics():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    patch = {"a": {"y": 20, "z": 30}, "b": None, "c": 4}
    out = merge_patch(base, patch)
    assert out.a.x == 1 and out.a.y == 20 and out.a.z == 30
    assert "b" not in out and out.c == 4


def test_merge_patch_drops_nulls_in_new_subdicts():
    # RFC 7396 §2 / std.mergePatch: recurse into patch sub-dicts even when
    # the base has no dict there, so nulls are dropped rather than kept.
    out = merge_patch({}, {"a": {"b": None, "c": 1}})
    assert out.to_dict() == {"a": {"c": 1}}
    out = merge_patch({"a": 5}, {"a": {"b": None}})
    assert out.to_dict() == {"a": {}}


def test_apply_opts_json_literals():
    # Configs are JSON: true/false/null must parse as booleans/None, not
    # as truthy strings.
    cfg = ConfigDict({"m": {"flag": True, "other": 1}})
    apply_opts(cfg, ["m.flag=false", "m.other=null", "m.on=true"])
    assert cfg.m.flag is False
    assert cfg.m.other is None
    assert cfg.m.on is True


def test_load_config_json_and_py(tmp_path):
    import json

    p = tmp_path / "c.json"
    p.write_text(json.dumps({"meta": {"seed": 42}}))
    cfg = load_config(str(p))
    assert cfg.meta.seed == 42

    q = tmp_path / "c.py"
    q.write_text("config = {'meta': {'seed': 7}}\n")
    cfg2 = load_config(str(q))
    assert cfg2.meta.seed == 7


# ---------------------------------------------------------------- pipeline
@register_transform_functor
class _SourceNumbers(BaseTransform):
    def _call(self, data):
        n = 4 if self.use_dummy_data else self.setup_kwargs.get("n", 10)
        return list(range(n))


@register_transform_functor
class _DoubleNumbers(BaseTransform):
    calls = 0

    def _call(self, data):
        type(self).calls += 1
        return [x * 2 for x in data]


def _pipeline_config(tmp_path, regenerate=False):
    return ConfigDict(
        {
            "cache_dir": str(tmp_path / "cache"),
            "transforms": {
                "input:src": {
                    "transform_name": "_SourceNumbers",
                    "setup_kwargs": {"n": 6},
                },
                "output:double": {
                    "transform_name": "_DoubleNumbers",
                    "input_node": "input:src",
                    "cache": True,
                    "regenerate": regenerate,
                },
            },
        }
    )


def test_pipeline_dag_and_cache(tmp_path):
    cfg = _pipeline_config(tmp_path)
    _DoubleNumbers.calls = 0
    dp = DataPipeline(cfg)
    out = dp.get_data(["output:double"], explode=True)
    assert out == [0, 2, 4, 6, 8, 10]
    assert _DoubleNumbers.calls == 1
    # fresh pipeline → disk cache hit, no recompute
    dp2 = DataPipeline(cfg)
    out2 = dp2.get_data(["output:double"], explode=True)
    assert out2 == out
    assert _DoubleNumbers.calls == 1
    # UPSTREAM kwargs change → the downstream node's cache key changes too
    # (transitive signature) → recompute without any regenerate flag
    # (regression: the old own-kwargs-only key served the stale cache)
    cfg3 = _pipeline_config(tmp_path)
    cfg3.transforms["input:src"].setup_kwargs.n = 3
    dp3 = DataPipeline(cfg3)
    out3 = dp3.get_data(["output:double"], explode=True)
    assert out3 == [0, 2, 4]
    assert _DoubleNumbers.calls == 2


def test_pipeline_dummy_mode_uses_separate_cache(tmp_path):
    cfg = _pipeline_config(tmp_path)
    dp = DataPipeline(cfg, use_dummy_data=True)
    out = dp.get_data(["output:double"], explode=True)
    assert out == [0, 2, 4, 6]  # dummy source yields 4 rows
    assert os.path.isdir(str(tmp_path / "cache" / "dummy"))


# ----------------------------------------------------------------- metrics
class _Proc(MetricsProcessor):
    def __init__(self, metrics):
        self.config = ConfigDict({"metrics": metrics})


def _passages(contents, ids=None):
    return [
        {"content": c, "passage_id": (ids[i] if ids else str(i))}
        for i, c in enumerate(contents)
    ]


def test_compute_DPR_scores():
    proc = _Proc([{"name": "compute_DPR_scores"}])
    batch = [
        {
            "top_ranking_passages": _passages(["paris is nice", "nothing", "paris again"]),
            "answers": ["Paris"],
            "gold_answer": "Paris",
        },
        {
            "top_ranking_passages": _passages(["nope", "nope", "nope"]),
            "answers": ["Rome"],
            "gold_answer": "Rome",
        },
    ]
    out = proc.compute_metrics({"batch_retrieval_result": batch, "Ks": [1, 3]})
    assert out.metrics["recall_at_1"] == 0.5
    assert out.metrics["recall_at_3"] == 0.5
    assert out.metrics["precision_at_3"] == pytest.approx((2 / 3) / 2)


def test_compute_rerank_DPR_scores_with_pos_ids():
    proc = _Proc([{"name": "compute_rerank_DPR_scores_with_pos_ids"}])
    batch = [
        {
            "top_ranking_passages": _passages(["a", "b"], ids=["p1", "p2"]),
            "raw_top_ranking_passages": _passages(["b", "a"], ids=["p2", "p1"]),
            "pos_item_ids": ["p1"],
        }
    ]
    out = proc.compute_metrics({"batch_retrieval_result": batch, "Ks": [1]})
    assert out.metrics["pos_item_ids_recall_at_1"] == 1.0
    assert out.metrics["pos_item_ids_raw_recall_at_1"] == 0.0


def test_vqa_accuracy_normalization():
    assert normalize_answer("The two dogs!") == "2 dogs"
    assert vqa_accuracy("two", ["two"] * 10) == 1.0
    assert vqa_accuracy("two", ["two"] * 3 + ["three"] * 7) == pytest.approx(0.9)
    assert vqa_accuracy("five", ["two"] * 10) == 0.0


def test_retrieval_metric_helpers():
    rel = np.array([[1, 0, 0], [0, 0, 1]])
    assert recall_at_k(rel, 1) == 0.5
    assert recall_at_k(rel, 3) == 1.0
    # hand-computed: row1 dcg=1/log2(2)=1, idcg=1 → 1;
    # row2 dcg=1/log2(4)=0.5, idcg=1 → 0.5; mean 0.75
    assert ndcg_at_k(rel, 3) == pytest.approx(0.75)


# ----------------------------------------------------------- eval recorder
def test_eval_recorder_roundtrip(tmp_path):
    rec = EvalRecorder("test_rec", str(tmp_path))
    rec.log_sample_dict({"question_id": "q1", "score": 0.5})
    rec.log_sample_dict({"question_id": "q2", "score": 0.7, "extra": "x"})
    rec.log_stats_dict({"loss": 0.1})
    assert rec.num_samples == 2
    assert rec.get_sample_logs_column("extra") == [None, "x"]
    for fmt in ("pkl", "json"):
        rec.save_to_disk(fmt)
        loaded = EvalRecorder.load_from_disk("test_rec", str(tmp_path), fmt)
        assert loaded.num_samples == 2
        assert loaded.stats_logs["loss"] == [0.1]
    other = EvalRecorder("other", str(tmp_path))
    other.log_sample_dict({"question_id": "q3", "score": 0.9})
    rec.merge(other)
    assert rec.num_samples == 3
    assert rec.rename("renamed").name == "renamed"


def test_eval_recorder_multipass_and_column_merge(tmp_path):
    """Reference semantics (`runway_for_ml/utils/eval_recorder.py:52-55,
    158-199,253-271`): a second pass annotates the same rows in place;
    same-length recorders merge column-wise."""
    rec = EvalRecorder("mp", str(tmp_path))
    rec.log_sample_dict({"question_id": "q1", "pred": "a"})
    rec.log_sample_dict({"question_id": "q2", "pred": "b"})
    # second pass adds a column and overwrites a value, without growing rows
    rec.reset_for_new_pass()
    rec.log_sample_dict({"question_id": "q1", "acc": 1.0})
    rec.log_sample_dict({"question_id": "q2", "acc": 0.0, "pred": "b2"})
    assert rec.num_samples == 2
    assert rec.get_sample_logs_column("acc") == [1.0, 0.0]
    assert rec.get_sample_logs_column("pred") == ["a", "b2"]
    assert rec[1]["question_id"] == "q2"
    assert len(rec) == 2

    # column merge (the reference's `merge`): same length required
    other = EvalRecorder("cols", str(tmp_path))
    other.log_sample_dict({"rank": 3})
    other.log_sample_dict({"rank": 1})
    other.log_stats_dict({"recall": 0.5})
    rec.merge_columns([other])
    assert rec.get_sample_logs_column("rank") == [3, 1]
    assert rec.stats_logs["recall"] == [0.5]

    short = EvalRecorder("short", str(tmp_path))
    short.log_sample_dict({"x": 1})
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        rec.merge_columns([short])

    # set/replace columns and bulk data
    rec.set_sample_logs_column("pred", ["z1", "z2"])
    assert rec.get_sample_logs_column("pred") == ["z1", "z2"]
    rec.set_sample_logs_data({"a": [1, 2, 3], "b": [4, 5, 6]})
    assert len(rec) == 3 and rec[2] == {"a": 3, "b": 6}


# ------------------------------------------------- RAG-generation metrics
def _rag_proc(metrics, modules=()):
    proc = _Proc(metrics)
    proc.config.model_config = ConfigDict({"modules": list(modules)})
    return proc


def test_compute_exact_match_beam_variant():
    """Reference `metrics_processors.py:90-142`: proposals ranked by
    ascending doc loss, deduped, running-hit flag over 5 beams."""
    proc = _rag_proc([{"name": "compute_exact_match"}])
    data = {
        "batch_answers": [["paris", "france"], ["rome"]],
        # q1: best-loss proposal wrong, 2nd right -> EM@1=0, EM@2..5=1
        # q2: best-loss proposal right -> EM@1..5=1
        "batch_generation_outputs_for_docs": [
            ["paris", "london", "london"],  # dedup -> ranked by loss
            ["rome", "milan"],
        ],
        "batch_loss_with_doc_scores": [[2.0, 1.0, 3.0], [0.5, 0.9]],
    }
    out = proc.compute_metrics(data)
    assert out.metrics["exact_match_at_1"] == 0.5   # only q2 hits at beam 1
    assert out.metrics["exact_match_at_2"] == 1.0   # q1's 'paris' at beam 2
    assert out.metrics["exact_match_at_5"] == 1.0


def test_compute_exact_match_simple_fallback():
    proc = _rag_proc([{"name": "compute_exact_match"}])
    out = proc.compute_metrics(
        {"predictions": ["Paris", "x"], "answers": [["paris"], ["rome"]]}
    )
    assert out.metrics["exact_match"] == 0.5


def test_compute_exact_match_with_numeric_values():
    """Reference `:143-197`: text match OR float within numeric range."""
    proc = _rag_proc([{"name": "compute_exact_match_with_numeric_values"}])
    data = {
        "batch_answers": [["42"], ["paris"], ["7"]],
        "batch_predictions": [
            {"answer": "41.5"},   # not in list, inside [40, 43] -> correct
            {"answer": "Paris"},  # text match after cleaning -> correct
            {"answer": "9"},      # not in list, outside [6, 8] -> wrong
        ],
        "batch_numeric_ranges": [(40.0, 43.0), None, (6.0, 8.0)],
    }
    out = proc.compute_metrics(data)
    assert out.metrics["accuracy"] == pytest.approx(2 / 3)


def test_compute_retrieval_metrics_rag_contract():
    """Reference `:199-405`: containment recall/precision over retrieved
    docs + retriever-hit breakdown ranked by generation loss."""
    proc = _rag_proc([{"name": "compute_retrieval_metrics"}])
    docs1 = _passages(["the capital is paris", "irrelevant"])
    docs2 = _passages(["nothing here", "nope"])
    data = {
        "batch_answers": [["paris"], ["rome"]],
        "batch_question_ids": ["q1", "q2"],
        "batch_retrieved_docs": [docs1, docs2],
        "batch_generation_outputs_for_docs": [
            ["paris", "london"], ["milan", "milan"]],
        "batch_loss_with_doc_scores": [[0.1, 2.0], [1.0, 0.5]],
    }
    out = proc.compute_metrics(data)
    m = out.metrics
    assert m["recall"] == 0.5            # q1 finds 'paris', q2 finds nothing
    assert m["precision"] == pytest.approx((1 / 2 + 0) / 2)
    assert m["gold_recall"] == 0.5
    assert m["n_retrieved_docs"] == 2
    # hit analysis: q1 doc0 = exact match + contained -> successful_hit;
    # q1 picked (lowest loss) = doc0 -> selected_successful_hit for q1
    assert m["successful_hit"] == pytest.approx(1 / 4)
    assert m["selected_successful_hit"] == 0.5
    assert m["selected_failed_no_hit"] == 0.5


def test_compute_retrieval_metrics_null_document_flag():
    proc = _rag_proc([{"name": "compute_retrieval_metrics"}],
                     modules=["add_null_document"])
    docs = _passages(["NULL", "paris here"])
    data = {
        "batch_answers": [["paris"]],
        "batch_question_ids": ["q"],
        "batch_retrieved_docs": [docs],
    }
    m = proc.compute_metrics(data).metrics
    assert m["recall"] == 1.0 and m["n_retrieved_docs"] == 1


def test_compute_retrieval_metrics_triplet_flag():
    proc = _rag_proc([{"name": "compute_retrieval_metrics"}],
                     modules=["use_triplet_in_retrieval_metrics"])
    docs = [{"content": "x", "title": "t1"}, {"content": "y", "title": "t9"}]
    data = {
        "batch_answers": [["whatever"]],
        "batch_question_ids": ["q"],
        "batch_retrieved_docs": [docs],
        "triplet_ref_ids": {"q": ["t1"]},
    }
    m = proc.compute_metrics(data).metrics
    assert m["recall"] == 1.0 and m["precision"] == 0.5
