"""EvalRecorder eval-pipeline lifecycle (VERDICT r1 #7).

The reference turns post-hoc evaluation into pipeline nodes run from
``on_validation_end``/``on_test_end``
(`runway_for_ml/executors/base_executor.py:335-372`,
`data_transforms.py:264-310`): the executor's live recorder is handed to the
pipeline's ``input:GetEvaluationRecorder`` node, transforms annotate it, and
the result is renamed + saved.
"""

import json
import os

import pytest

from reranking_multimodal_retrievers_tpu.data import DataPipeline
from reranking_multimodal_retrievers_tpu.data.ops.generic import (
    DummyTransform,
    GetEvaluationRecorder,
    LoadHFDataset,
    MergeAllEvalRecorderAndSave,
    SplitHFDatasetToTrainTestValidation,
)
from reranking_multimodal_retrievers_tpu.data.transforms import BaseTransform
from reranking_multimodal_retrievers_tpu.executors.base import BaseExecutor
from reranking_multimodal_retrievers_tpu.metrics import EvalRecorder
from reranking_multimodal_retrievers_tpu.utils.config_system import ConfigDict
from reranking_multimodal_retrievers_tpu.utils.registries import (
    DataTransform_Registry,
    register_transform_functor,
)


@register_transform_functor
class _AnnotateRecall(BaseTransform):
    """Toy eval transform: adds a 'hit' column from per-row predictions."""

    def setup(self, gold_key="gold", pred_key="pred", **kwargs):
        self.gold_key, self.pred_key = gold_key, pred_key
        return self

    def _call(self, rec):
        hits = [
            int(g == p)
            for g, p in zip(rec.get_sample_logs_column(self.gold_key),
                            rec.get_sample_logs_column(self.pred_key))
        ]
        rec.set_sample_logs_column("hit", hits)
        rec.log_stats_dict({"accuracy": sum(hits) / max(len(hits), 1)})
        return rec


def _lifecycle_executor(tmp_path, config):
    """A minimal executor exercising ONLY the recorder lifecycle."""
    ex = object.__new__(BaseExecutor)
    ex.config = config
    ex.use_dummy_data = False
    ex.global_step = 7
    ex.experiment_dir = str(tmp_path)
    return ex


def _eval_pipeline_cfg():
    return ConfigDict({
        "transforms": {
            "input:GetEvaluationRecorder": {
                "transform_name": "GetEvaluationRecorder",
                "setup_kwargs": {},
            },
            "process:Annotate": {
                "transform_name": "_AnnotateRecall",
                "input_node": "input:GetEvaluationRecorder",
                "setup_kwargs": {},
            },
            "output:Merge": {
                "transform_name": "MergeAllEvalRecorderAndSave",
                "input_node": "process:Annotate",
                "setup_kwargs": {"eval_recorder_prefix": None,
                                 "eval_record_name": "post"},
            },
        },
        "out_ops": ["output:Merge"],
    })


def test_on_eval_end_runs_configured_pipeline(tmp_path):
    cfg = ConfigDict({"test": {"eval_pipeline": _eval_pipeline_cfg()}})
    ex = _lifecycle_executor(tmp_path, cfg)

    rec = ex.on_eval_start("test")
    assert rec.name == "test-evaluation"
    for g, p in [("a", "a"), ("b", "x"), ("c", "c"), ("d", "d")]:
        ex.record_sample({"gold": g, "pred": p})

    out = ex.on_eval_end("test")
    # the pipeline annotated the LIVE recorder (pass-through head node)
    assert out.get_sample_logs_column("hit") == [1, 0, 1, 1]
    assert out.stats_logs["accuracy"] == [0.75]
    # pre-pipeline recorder saved under its own name, post-pipeline renamed
    assert os.path.exists(tmp_path / "test-evaluation" / "recorder.json")
    post_dirs = [d for d in os.listdir(tmp_path) if "after_eval_pipeline" in d]
    assert post_dirs, os.listdir(tmp_path)
    payload = json.load(
        open(tmp_path / post_dirs[0] / "recorder.json"))
    assert payload["sample_logs"]["hit"] == [1, 0, 1, 1]


def test_validation_recorder_naming_and_fallback_rows(tmp_path):
    """valid runs get ``validation-{cnt}-{step}`` names; executors that never
    call record_sample still get rows from evaluation results."""
    ex = _lifecycle_executor(tmp_path, ConfigDict({}))
    rec1 = ex.on_eval_start("valid")
    assert rec1.name == "validation-1-7"
    results = ConfigDict({
        "metrics": {"recall_at_5": 0.5},
        "batch_retrieval_result": [
            {"question_id": "q0", "top_ranking_passages": ["p1"]},
            {"question_id": "q1", "top_ranking_passages": ["p9"]},
        ],
    })
    out = ex.on_eval_end("valid", results)
    assert out is rec1 and len(rec1) == 2
    assert rec1.get_sample_logs_column("question_id") == ["q0", "q1"]
    assert rec1.stats_logs["recall_at_5"] == [0.5]
    # second valid pass increments the counter
    assert ex.on_eval_start("valid").name == "validation-2-7"


def test_get_evaluation_recorder_load_and_passthrough(tmp_path):
    rec = EvalRecorder(name="test-evaluation", base_dir=str(tmp_path))
    rec.log_sample_dict({"x": 1})
    rec.save_to_disk(file_format="json")

    fn = GetEvaluationRecorder(global_config=None)
    fn.setup(base_dir=str(tmp_path))
    loaded = fn(None)  # no injected data -> loads from disk
    assert loaded.get_sample_logs_column("x") == [1]
    live = EvalRecorder(name="live")
    assert fn(live) is live  # injected recorder short-circuits


def test_merge_transform_row_appends_and_saves(tmp_path):
    a = EvalRecorder(name="shard-a", base_dir=str(tmp_path))
    b = EvalRecorder(name="shard-b", base_dir=str(tmp_path))
    for i in range(3):
        a.log_sample_dict({"q": f"a{i}"})
    for i in range(2):
        b.log_sample_dict({"q": f"b{i}"})
    fn = MergeAllEvalRecorderAndSave()
    fn.setup(eval_recorder_prefix="merged", base_dir=str(tmp_path))
    out = fn([a, b])
    assert len(out) == 5 and out.name == "merged-shard-a"
    assert os.path.exists(tmp_path / "merged-shard-a" / "recorder.json")


def test_generic_hf_transforms_registered_and_split():
    import datasets as hfds

    for name in ("LoadHFDataset", "SplitHFDatasetToTrainTestValidation",
                 "HFDatasetTokenizeTransform", "DummyTransform",
                 "GetEvaluationRecorder", "MergeAllEvalRecorderAndSave"):
        assert name in DataTransform_Registry, name

    ds = hfds.DatasetDict({"train": hfds.Dataset.from_dict(
        {"text": [f"t{i}" for i in range(20)]})})
    fn = SplitHFDatasetToTrainTestValidation()
    fn.setup(test_size=0.2, valid_size=0.2,
             train_test_split_kwargs={"seed": 0})
    out = fn(ds)
    assert set(out.keys()) == {"train", "test", "validation"}
    assert len(out["train"]) == 12
    assert len(out["test"]) == 4 and len(out["validation"]) == 4

    assert DummyTransform()(ds) is ds


def test_load_hf_dataset_from_disk(tmp_path):
    import datasets as hfds

    ds = hfds.Dataset.from_dict({"a": [1, 2, 3]})
    ds.save_to_disk(str(tmp_path / "toy"))
    fn = LoadHFDataset()
    fn.setup(dataset_name="toy", dataset_path=str(tmp_path))
    out = fn(None)
    assert list(out["a"]) == [1, 2, 3]


def test_tokenize_transform_prefixes_columns():
    import datasets as hfds

    from reranking_multimodal_retrievers_tpu.data.ops.generic import (
        HFDatasetTokenizeTransform,
    )

    ds = {"train": hfds.Dataset.from_dict(
        {"question": ["what is a dog", "where is paris"]})}
    fn = HFDatasetTokenizeTransform()
    fn.setup(
        tokenizer_config={"TokenizerClass": "BertTokenizerFast",
                          "tokenize_kwargs": {"padding": "max_length",
                                              "truncation": True,
                                              "max_length": 8}},
        tokenize_fields_list=["question"],
    )
    out = fn(ds)
    assert "question_input_ids" in out["train"].column_names
    assert "question_attention_mask" in out["train"].column_names
    assert len(out["train"]["question_input_ids"][0]) == 8


def test_tokenize_transform_passes_through_unselected_splits():
    """Splits outside splits_to_process (this repo's 'valid' and
    '*_passages' tables) must survive untouched, not vanish."""
    import datasets as hfds

    from reranking_multimodal_retrievers_tpu.data.ops.generic import (
        HFDatasetTokenizeTransform,
    )

    passages = hfds.Dataset.from_dict({"passage_content": ["p0", "p1"]})
    ds = {
        "train": hfds.Dataset.from_dict({"question": ["what is a dog"]}),
        "valid": hfds.Dataset.from_dict({"question": ["where is paris"]}),
        "test_passages": passages,
    }
    fn = HFDatasetTokenizeTransform()
    fn.setup(
        tokenizer_config={"TokenizerClass": "BertTokenizerFast",
                          "tokenize_kwargs": {"padding": "max_length",
                                              "truncation": True,
                                              "max_length": 8}},
        tokenize_fields_list=["question"],
        splits_to_process=["train"],
    )
    out = fn(ds)
    assert "question_input_ids" in out["train"].column_names
    # untokenized splits pass through unchanged
    assert out["valid"] is ds["valid"]
    assert out["test_passages"] is passages


def test_load_hf_dataset_fields_projection(tmp_path):
    """setup(fields=[...]) projects to those columns (both a bare Dataset
    and a DatasetDict)."""
    import datasets as hfds

    ds = hfds.Dataset.from_dict({"a": [1, 2], "b": ["x", "y"], "c": [0, 0]})
    ds.save_to_disk(str(tmp_path / "toy"))
    fn = LoadHFDataset()
    fn.setup(dataset_name="toy", dataset_path=str(tmp_path),
             fields=["a", "b", "missing_is_skipped"])
    out = fn(None)
    assert sorted(out.column_names) == ["a", "b"]

    hfds.DatasetDict({"train": ds}).save_to_disk(str(tmp_path / "toy2"))
    fn2 = LoadHFDataset()
    fn2.setup(dataset_name="toy2", dataset_path=str(tmp_path), fields=["b"])
    out2 = fn2(None)
    assert out2["train"].column_names == ["b"]
