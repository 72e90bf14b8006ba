"""Baleen-role condenser / hop search (`third_party/ColBERT/baleen/`)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
from reranking_multimodal_retrievers_tpu.engine.condenser import (
    BaleenEngine, Condenser, CondenserConfig, HopConfig, HopSearcher,
    SentenceReader, _dedupe,
)

MASK_ID = 9
MAXLEN = 48
MAX_SENTS = 8


def _ws_tokenize(queries, passages):
    """Whitespace test tokenizer with the [MASK]-separator convention:
    hash words into a small vocab, record each ' [MASK] ' separator's
    position as a sentence anchor."""
    B = len(passages)
    ids = np.zeros((B, MAXLEN), np.int32)
    am = np.zeros((B, MAXLEN), np.int32)
    tt = np.zeros((B, MAXLEN), np.int32)
    sp = np.full((B, MAX_SENTS), -1, np.int32)
    for b, (q, p) in enumerate(zip(queries, passages)):
        toks = q.split() + ["[SEP]"] + p.split()
        sep_at = len(q.split())
        nsent = 0
        for i, t in enumerate(toks[:MAXLEN]):
            if t == "[MASK]":
                ids[b, i] = MASK_ID
                if i > sep_at and nsent < MAX_SENTS:
                    sp[b, nsent] = i
                    nsent += 1
            else:
                ids[b, i] = 10 + (hash(t) % 800)
            am[b, i] = 1
            tt[b, i] = int(i > sep_at)
    return ids, am, tt, sp


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("baleen")
    coll = tmp / "collectionX.jsonl"
    rows = [
        {"pid": 0, "title": "alpha", "text": ["fact one about cats",
                                              "irrelevant filler words here"]},
        {"pid": 1, "title": "beta", "text": ["fact two about dogs",
                                             "more filler text"]},
        {"pid": 2, "title": "gamma", "text": ["nothing useful at all"]},
    ]
    with open(coll, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = BertConfig(vocab_size=1024, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=MAXLEN)
    model = SentenceReader(cfg)
    ids, am, tt, sp = _ws_tokenize(["warm up"], ["a [MASK] b"])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(am), jnp.asarray(tt),
                        jnp.asarray(sp))["params"]
    cond = Condenser(str(coll), params, params, model, _ws_tokenize,
                     CondenserConfig(stage1_topk=4, max_sentences=MAX_SENTS,
                                     maxlen=MAXLEN))
    return cond


def test_sentence_reader_masks_padded_positions(setup):
    cond = setup
    ids, am, tt, sp = _ws_tokenize(["q"], ["alpha [MASK] s1 [MASK] s2"])
    out = np.asarray(cond._apply(cond.paramsL1, jnp.asarray(ids),
                                 jnp.asarray(am), jnp.asarray(tt),
                                 jnp.asarray(sp)))
    assert out.shape == (1, MAX_SENTS)
    assert np.isfinite(out[0, :2]).all() and np.isneginf(out[0, 2:]).all()


def test_condense_invariants(setup):
    cond = setup
    stage1, stage2, l3x = cond.condense("what about cats", [], [0, 1, 2])
    # stage1: deduped (pid, sid) facts, bounded by topk
    assert 0 < len(stage1) <= 4
    assert len(stage1) == len(set(stage1))
    assert all(k in cond.collectionY for k in stage1)
    # L3x: at least the reference's minimum facts unless stage2 was empty,
    # and never more than max_docs distinct pids
    assert len(_dedupe([pid for pid, _ in l3x])) <= cond.config.max_docs
    assert len(l3x) >= min(2, len(stage1))
    # stage2 positives are a subset of stage1
    assert set(stage2) <= set(stage1)


def test_condense_carries_backs(setup):
    cond = setup
    backs = [(1, 0)]
    stage1, _, _ = cond.condense("dogs", backs, [0, 2])
    assert stage1[0] == (1, 0)  # carried facts stay in front (f7 dedupe)


class _FakeSearcher:
    def __init__(self):
        self.calls = 0

    def search(self, Q):
        self.calls += 1
        order = [["1", "0", "2"], ["2", "0", "1"]][min(self.calls - 1, 1)]
        return [order], np.asarray([[3.0, 2.0, 1.0]])


def test_hop_searcher_per_hop_k(setup):
    hs = HopSearcher(_FakeSearcher(), HopConfig(per_hop_k=(2, 1)))
    ids0, _ = hs.search(None, hop=0)
    assert len(ids0[0]) == 2
    ids1, _ = hs.search(None, hop=1)
    assert len(ids1[0]) == 1


def test_baleen_engine_two_hops(setup):
    cond = setup
    engine = BaleenEngine(
        HopSearcher(_FakeSearcher(), HopConfig(per_hop_k=(2, 2))),
        cond,
        encode_query=lambda text, facts: None,
        num_hops=2,
    )
    out = engine.search("what about cats and dogs")
    assert set(out.keys()) == {"facts", "positive_facts", "pids"}
    assert out["pids"] == _dedupe(out["pids"])
    assert all(k in cond.collectionY for k in out["facts"])


def test_stage2_min_facts_is_respected(setup):
    """CondenserConfig.min_facts actually drives the survival floor (it used
    to be silently ignored in favor of a hardcoded 2-fact rule)."""
    import copy
    import dataclasses as dc

    base = setup
    keys = list(base.collectionY)[:4]
    for want in (1, 2, 3):
        cond = copy.copy(base)
        cond.config = dc.replace(base.config, min_facts=want)
        # all-negative joint scores, strictly decreasing: exactly min_facts
        # facts sit above min(0, nth_best - eps)
        cond._score = lambda p, q, docs: np.asarray(
            [[-0.1 * (i + 1) for i in range(len(keys))]])
        positives, l3x = cond._stage2("q", keys)
        assert positives == []  # nothing above zero
        assert len(l3x) == min(want, len(keys)), (want, l3x)
