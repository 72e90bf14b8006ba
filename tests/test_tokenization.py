"""Tokenizer contract tests (reference `tokenization_flmr.py:90-250`)."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.models.tokenization import (
    FLMRContextTokenizer,
    FLMRQueryTokenizer,
    punctuation_skiplist_ids,
    instruction_token_id,
    tiny_bert_tokenizer,
)


@pytest.fixture(scope="module")
def base_tok(tmp_path_factory):
    words = ["what", "is", "the", "capital", "of", "france", "paris", "question"]
    return tiny_bert_tokenizer(str(tmp_path_factory.mktemp("tok")), words)


def test_query_tokenizer_markers_and_mask_padding(base_tok):
    qt = FLMRQueryTokenizer(base_tok, query_maxlen=16)
    out = qt(["what is the capital of france"])
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (1, 16)
    assert ids[0, 0] == base_tok.cls_token_id
    assert ids[0, 1] == base_tok.convert_tokens_to_ids("[unused0]")  # [Q]
    # pads replaced with [MASK]; attention mask 0 there
    assert (ids[0][mask[0] == 0] == base_tok.mask_token_id).all()
    assert mask[0].sum() < 16
    # no pad ids remain
    assert (ids != base_tok.pad_token_id).all()


def test_query_tokenizer_attend_to_mask(base_tok):
    qt = FLMRQueryTokenizer(base_tok, query_maxlen=12, attend_to_mask_tokens=True)
    out = qt("what is paris")
    assert out["attention_mask"].sum() == 12  # all positions attended


def test_context_tokenizer_marker_and_truncation(base_tok):
    ct = FLMRContextTokenizer(base_tok, doc_maxlen=10)
    out = ct(["paris is the capital of france", "paris"])
    ids = out["input_ids"]
    assert ids.shape == (1 + 1, 10)
    assert (ids[:, 1] == base_tok.convert_tokens_to_ids("[unused1]")).all()  # [D]
    # request longer than doc_maxlen is clamped (reference `:132-134`) —
    # loudly, since a silent cap hides real signal loss (a reranker doc
    # budget larger than the tokenizer's truncates the docs it scores)
    import logging

    logger = "reranking_multimodal_retrievers_tpu.models.tokenization"
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    logging.getLogger(logger).addHandler(handler)
    try:
        out2 = ct(["paris"], max_length=512)
    finally:
        logging.getLogger(logger).removeHandler(handler)
    assert out2["input_ids"].shape[1] == 10
    assert any("doc_maxlen" in r.getMessage() for r in records), records


def test_punctuation_skiplist(base_tok):
    ids = punctuation_skiplist_ids(base_tok)
    assert len(ids) > 10
    dot = base_tok.encode(".", add_special_tokens=False)[0]
    assert dot in ids


def test_instruction_token_id(base_tok):
    tid = instruction_token_id(base_tok, ":")
    assert tid == base_tok.encode(":", add_special_tokens=False)[0]
