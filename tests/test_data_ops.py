"""Data-ops tests: the M2KR dummy pipeline end-to-end into dataloaders,
BM25 mining, module parser, and loader behaviors."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.utils import ConfigDict
from reranking_multimodal_retrievers_tpu.data import DataPipeline
from reranking_multimodal_retrievers_tpu.data.ops.m2kr_ops import make_dummy_m2kr
from reranking_multimodal_retrievers_tpu.data.ops.wikipedia_ops import BM25Index
import reranking_multimodal_retrievers_tpu.data.ops  # noqa: F401 (register)


def test_make_dummy_m2kr_shape():
    d = make_dummy_m2kr()
    assert set(d.keys()) >= {"train", "valid", "test", "train_passages"}
    row = d["train"][0]
    assert {"question_id", "question", "answers", "pos_item_ids"} <= set(row)


def test_bm25_index():
    docs = ["paris is the capital of france", "berlin germany", "rome italy capital"]
    idx = BM25Index(docs)
    assert idx.search("capital of france", 1)[0] == 0
    assert idx.search("germany", 1)[0] == 1


def _full_pipeline_config(tmp_path):
    query_maxlen, doc_maxlen = 24, 48
    modules_config = {
        "input_modules": [
            {"type": "QuestionInput", "option": "default"},
            {"type": "VisionInput", "option": "from_file"},
        ],
        "postprocess_module_list": [
            {"type": "PostProcessFLMRQuestionInputTokenization", "max_length": query_maxlen},
            {"type": "PostProcessVisionInputProcessing"},
        ],
        "decoder_input_modules": [
            {"type": "SimilarityOutput", "option": "default"},
        ],
        "postprocess_decoder_input_module_list": [
            {"type": "PostProcessFLMRItemInputTokenization", "max_length": doc_maxlen},
        ],
    }
    return ConfigDict(
        {
            "cache_dir": str(tmp_path / "cache"),
            "transforms": {
                "input:LoadM2KR": {
                    "transform_name": "LoadPreprocessedData",
                    "setup_kwargs": {},
                },
                "output:PrepareDataloaders": {
                    "transform_name": "PrepareDataloaders",
                    "input_node": "input:LoadM2KR",
                    "setup_kwargs": {
                        "datasets_config": {
                            "train": [
                                {
                                    "dataset_type": "OKVQADatasetForDPR",
                                    "split": "train",
                                    "use_column": "okvqa_data",
                                    "modules_config": modules_config,
                                }
                            ],
                            "valid": [
                                {
                                    "dataset_type": "OKVQADatasetForDPR",
                                    "split": "valid",
                                    "use_column": "okvqa_data",
                                    "modules_config": modules_config,
                                }
                            ],
                        },
                        "tokenizer_config": {
                            "tokenizer": {
                                "TokenizerClass": "FLMRQueryTokenizer",
                                "query_maxlen": query_maxlen,
                            },
                            "decoder_tokenizer": {
                                "TokenizerClass": "FLMRContextTokenizer",
                                "doc_maxlen": doc_maxlen,
                            },
                        },
                    },
                },
            },
        }
    )


def _wrap_global(tmp_path):
    # global config the dataloader layer consults
    return ConfigDict(
        {
            "mode": "train",
            "train": {"batch_size": 4},
            "valid": {"batch_size": 4},
            "meta": {"seed": 0},
            "model_config": {"num_negative_samples": 2},
        }
    )


def test_m2kr_pipeline_to_dataloaders(tmp_path):
    cfg = _full_pipeline_config(tmp_path)
    # PrepareDataloaders needs the data under use_column: wrap via a node
    cfg.transforms["process:Wrap"] = ConfigDict(
        {
            "transform_name": "WrapOutputIntoKeys",
            "input_node": "input:LoadM2KR",
            "setup_kwargs": {"output_keys": ["okvqa_data"]},
        }
    )
    cfg.transforms["output:PrepareDataloaders"]["input_node"] = "process:Wrap"
    dp = DataPipeline(cfg, use_dummy_data=True, global_config=_wrap_global(tmp_path))
    out = dp.get_data(["output:PrepareDataloaders"], explode=True)

    loaders = out["data_loaders"]
    assert "train/OKVQADatasetForDPR.train" in loaders["train"]
    loader = loaders["train"]["train/OKVQADatasetForDPR.train"]
    batch = next(iter(loader))
    # FLMR query tokenization: [B, query_maxlen]
    assert batch["input_ids"].shape == (4, 24)
    assert batch["input_ids"].dtype == np.int32
    # contexts: 1 pos + 2 neg per question, under decoder_ keys
    assert batch["decoder_input_ids"].shape == (4 * 3, 48)
    assert len(batch["passage_contents"]) == 4 * 3
    assert len(batch["pos_item_ids"]) == 4
    assert all(len(n) == 2 for n in batch["neg_item_ids"])
    assert batch["questions"][0].startswith("Answer the following")


def test_loader_pad_last_and_determinism(tmp_path):
    from reranking_multimodal_retrievers_tpu.data.loaders import DataLoader

    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.array([i])}

    dl = DataLoader(_DS(), batch_size=4, pad_last=True)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[-1]["_real_count"] == 2
    assert batches[-1]["x"].shape == (4, 1)  # padded to full batch

    dl2 = DataLoader(_DS(), batch_size=4, shuffle=True, drop_last=True, seed=1)
    order1 = [b["x"].ravel().tolist() for b in dl2]
    order2 = [b["x"].ravel().tolist() for b in dl2]
    assert order1 == order2  # same epoch → same order
    dl2.set_epoch(1)
    order3 = [b["x"].ravel().tolist() for b in dl2]
    assert order1 != order3


def test_wikipedia_pseudo_annotation_mining():
    """PrepareWikipediaPassageAnnotations (reference
    `wikipedia_data_ops.py:312-540`): answer-phrase candidates, token_set
    rating against gold+question+caption+objects, lowest-tie drop, and the
    train-drop / test-dummy missing handling."""
    import datasets as hfds

    from reranking_multimodal_retrievers_tpu.data.ops.wikipedia_ops import (
        BM25Index, PrepareWikipediaPassageAnnotations, token_set_ratio,
    )

    passages = hfds.Dataset.from_dict({
        "passage_id": ["p0", "p1", "p2", "p3"],
        "passage_content": [
            "the eiffel tower stands in paris france",   # contains 'paris'
            "paris is the capital of france",            # contains 'paris'
            "rome is the capital of italy",
            "unrelated text about cooking pasta",
        ],
    })
    rows = hfds.Dataset.from_dict({
        "question_id": ["q0", "q1"],
        "question": ["what city is the eiffel tower in", "what is xyzzy"],
        "answers": [["paris"], ["xyzzy"]],
        "gold_answer": ["paris", "xyzzy"],
        "img_caption": ["a photo of the eiffel tower", ""],
        "objects": [[{"class": "tower"}], []],
    })
    data = hfds.DatasetDict({"train": rows, "test": rows})
    index = BM25Index(list(passages["passage_content"]))
    indexed = {"index": index, "passage_ids": list(passages["passage_id"]),
               "passages": {"train_passages": passages}}

    fn = PrepareWikipediaPassageAnnotations(use_dummy_data=False,
                                            global_config={})
    fn.setup(k=4, mode="train")
    out = fn._call([data, indexed])

    # q1 ('xyzzy') has no candidates: train mode drops missing rows from
    # EVERY split (reference annotate-loop `continue` applies to all splits
    # under mode=='train')
    assert len(out["train"]) == 1 and len(out["test"]) == 1

    # test mode keeps missing rows with dummy annotations in every split
    fn_test = PrepareWikipediaPassageAnnotations(use_dummy_data=False,
                                                 global_config={})
    fn_test.setup(k=4, mode="test")
    out_test = fn_test._call(
        [hfds.DatasetDict({"train": rows, "test": rows}), indexed])
    assert len(out_test["test"]) == 2
    test_rows = {r["question_id"]: r for r in out_test["test"]}
    assert test_rows["q1"]["pos_item_ids"] == ["1"]
    assert test_rows["q1"]["_annotation_missing"]

    # q0: both paris passages are candidates; the eiffel-tower passage rates
    # higher against gold+question+caption and survives the lowest-tie drop
    q0 = test_rows["q0"]
    assert set(q0["related_item_ids"]) == {"p0", "p1"}
    assert q0["pos_item_ids"] == ["p0"]
    assert q0["pos_item_contents"][0].startswith("the eiffel tower")

    # the rater follows thefuzz token_set_ratio semantics
    assert token_set_ratio("a b c", "a b c") == 100
    assert token_set_ratio("a b c", "c b a d") > token_set_ratio("a b c", "x y z")


def test_wikipedia_answer_phrase_normalized_matching():
    """Punctuated answers ('u.s.') must match the token-normalized passage
    text — the candidate filter normalizes the answer the same way."""
    import datasets as hfds

    from reranking_multimodal_retrievers_tpu.data.ops.wikipedia_ops import (
        BM25Index, PrepareWikipediaPassageAnnotations,
    )

    passages = hfds.Dataset.from_dict({
        "passage_id": ["p0", "p1"],
        "passage_content": [
            "the u.s. capital is washington",
            "the u.s. exports pasta and olives",
        ],
    })
    rows = hfds.Dataset.from_dict({
        "question_id": ["q0"],
        "question": ["which country's capital is washington"],
        "answers": [["U.S."]],
        "gold_answer": ["U.S."],
        "img_caption": [""],
        "objects": [[]],
    })
    index = BM25Index(list(passages["passage_content"]))
    indexed = {"index": index, "passage_ids": list(passages["passage_id"]),
               "passages": {"train_passages": passages}}
    fn = PrepareWikipediaPassageAnnotations(use_dummy_data=False,
                                            global_config={})
    fn.setup(k=2, mode="train")
    out = fn._call([hfds.DatasetDict({"train": rows}), indexed])
    assert len(out["train"]) == 1
    assert "p0" in out["train"][0]["pos_item_ids"]


def test_m2kr_empty_instruction_no_stray_colon(monkeypatch, tmp_path):
    """Rows with instruction='' (e.g. the synthetic task) must keep their
    question untouched instead of gaining a stray ': ' prefix."""
    import datasets as hfds

    from reranking_multimodal_retrievers_tpu.data.ops import m2kr_ops

    rows = hfds.DatasetDict({
        "train": hfds.Dataset.from_dict({
            "question_id": ["q0", "q1"],
            "question": ["find pair a b", "what is shown"],
            "instruction": ["", "Describe the image:"],
        }),
    })
    monkeypatch.setattr(m2kr_ops, "_load_hf",
                        lambda path: rows if path == "Q" else hfds.DatasetDict())
    fn = m2kr_ops.LoadPreprocessedData(use_dummy_data=False, global_config={})
    fn.setup(data_path="Q", passage_path="P", load_instruction=True)
    out = fn._call(None)
    qs = list(out["train"]["question"])
    assert qs[0] == "find pair a b"              # untouched, no ': ' prefix
    assert qs[1] == "Describe the image: what is shown"
