"""Engine utility ops (reference `third_party/ColBERT/utility/`)."""

import random

import pytest

from reranking_multimodal_retrievers_tpu.engine.utility import (
    annotate_em,
    dpr_normalize,
    docs2passages,
    has_answer,
    merge_rankings,
    pick_best_run,
    sample_negatives,
    sample_triples,
    sample_triples_for_query,
    self_training_triples,
    split_queries,
    split_ranking_by_offset,
    split_ranking_by_queries,
    subsample_queries,
)


def _labeled_ranking(pos_ranks, depth):
    """(pid, rank, score, label) rows; pid == 100+rank."""
    return [(100 + r, r, float(-r), int(r in pos_ranks))
            for r in range(1, depth + 1)]


def test_sample_negatives_biased_split():
    rng = random.Random(0)
    negatives = list(range(300))
    out = sample_negatives(negatives, 10, biased=100, rng=rng)
    assert len(out) == 10
    assert sum(1 for p in out if p < 100) == 5  # half from the top-100
    # unbiased: plain sample
    out = sample_negatives(negatives, 10, biased=None, rng=rng)
    assert len(out) == 10
    # cap at population size
    assert len(sample_negatives([1, 2], 10, None, rng)) == 2


def test_sample_triples_positive_rules():
    """best-2-in-top-10 + best-1-in-top-50: ranks 3,7 fill rule one, rank 40
    satisfies rule two only while fewer than 1 positive exists -> excluded;
    each real positive pairs with min(100, #negs) negatives."""
    ranking = _labeled_ranking({3, 7, 40}, 50)
    triples = sample_triples_for_query(
        "q", ranking, positives=[(2, 10), (1, 50)], depth=50,
        rng=random.Random(0))
    pos_used = {t[1] for t in triples}
    assert pos_used == {103, 107}
    n_negs = 50 - 3
    assert len(triples) == 2 * min(100, n_negs)
    assert all(t[0] == "q" and t[2] not in (103, 107, 140) for t in triples)


def test_sample_triples_permissive_tail_negatives():
    """Permissive keeps the rule-missing positive with 5 negatives drawn
    strictly below its own rank (`triples.py:61,65-66`)."""
    ranking = _labeled_ranking({1, 30}, 40)
    triples = sample_triples_for_query(
        "q", ranking, positives=[(1, 10)], depth=40, permissive=True,
        rng=random.Random(0))
    by_pos = {}
    for _, pos, neg in triples:
        by_pos.setdefault(pos, []).append(neg)
    assert set(by_pos) == {101, 130}
    assert len(by_pos[130]) == 5
    # permissive negatives come from ranks > neg_start index into the
    # negative list, i.e. the tail after 29 non-positive ranks
    assert all(neg >= 100 + 31 for neg in by_pos[130])


def test_sample_triples_cap_and_shuffle():
    qid2ranking = {f"q{i}": _labeled_ranking({1}, 20) for i in range(4)}
    triples = sample_triples(qid2ranking, positives=[(1, 10)], depth=20,
                             max_triples=30)
    assert len(triples) == 30
    assert len({t[0] for t in triples}) > 1  # shuffled across qids


def test_self_training_triples():
    qid2ranking = {"q": [(100 + r, r) for r in range(1, 201)]}
    triples = self_training_triples(qid2ranking, npositives=1,
                                    depth_positive=3, depth_negative=200,
                                    cutoff_negative=50)
    assert triples
    for qid, pos, neg in triples:
        assert qid == "q"
        assert pos in (101, 102, 103)       # top-3 pseudo-positives
        assert neg > 150                    # rank > cutoff_negative
    with pytest.raises(AssertionError):
        self_training_triples(qid2ranking, npositives=5, depth_positive=3,
                              depth_negative=200, cutoff_negative=50)


def test_has_answer_word_span():
    answers = [dpr_normalize("Barack Obama")]
    assert has_answer(answers, "president BARACK OBAMA, said")
    assert not has_answer(answers, "obama barack reversed")
    assert not has_answer(answers, "barackobama fused")


def test_annotate_em_metrics():
    qid2ranking = {
        "q1": [(1, 1), (2, 2), (3, 3)],
        "q2": [(4, 1), (5, 2)],
    }
    collection = {1: "the answer is paris", 2: "nothing", 3: "paris again",
                  4: "rome", 5: "berlin here"}
    qid2answers = {"q1": ["Paris"], "q2": ["berlin"], "q3": ["unranked"]}
    labeled, metrics = annotate_em(qid2ranking, collection, qid2answers)
    assert [l for _, _, l in labeled["q1"]] == [1, 0, 1]
    assert [l for _, _, l in labeled["q2"]] == [0, 1]
    assert metrics["num_judged_queries"] == 3
    assert metrics["num_ranked_queries"] == 2
    # q1 hits @1, q2 misses @1: success@1 = 1/3 of judged
    assert metrics["success"][1] == pytest.approx(1 / 3)
    assert metrics["success"][5] == pytest.approx(2 / 3)
    assert metrics["counts"]["all"] == pytest.approx(3 / 3)
    # ranks must be contiguous from 1
    with pytest.raises(AssertionError):
        annotate_em({"q1": [(1, 2)]}, collection, {"q1": ["x"]})


def test_merge_rankings_resorts_by_score():
    a = {"q": [(1, 1, 0.9), (2, 2, 0.5)]}
    b = {"q": [(3, 1, 0.7)], "q2": [(4, 1, 0.1)]}
    merged = merge_rankings([a, b])
    assert merged["q"] == [(1, 1, 0.9), (3, 2, 0.7), (2, 3, 0.5)]
    assert merged["q2"] == [(4, 1, 0.1)]


def test_ranking_splits_partition():
    qid2ranking = {f"q{i}": [(i, 1, 0.0)] for i in range(7)}
    parts = split_ranking_by_offset(qid2ranking, 3)
    assert sum(len(p) for p in parts) == 7
    assert set().union(*[set(p) for p in parts]) == set(qid2ranking)

    groups = [["q0", "q1"], ["q5"]]
    by_q = split_ranking_by_queries(qid2ranking, groups)
    assert set(by_q[0]) == {"q0", "q1"} and set(by_q[1]) == {"q5"}


def test_split_ranking_by_offset_gap_unmerge():
    # reference semantics: merged qid = original + (split_index+1)*gap;
    # un-merge recovers split by qid // gap - 1 and original id by qid % gap
    gap = 1000
    merged = {
        1000 + 7: [(1, 1, 0.9)],   # train q7
        2000 + 7: [(2, 1, 0.8)],   # dev q7 (same original id, other split)
        3000 + 42: [(3, 1, 0.7)],  # test q42
    }
    train, dev, test = split_ranking_by_offset(merged, 3, gap=gap)
    assert train == {7: [(1, 1, 0.9)]}
    assert dev == {7: [(2, 1, 0.8)]}
    assert test == {42: [(3, 1, 0.7)]}


def test_merge_rankings_tolerates_trailing_fields():
    a = {"q": [(1, 1, 0.9, "label")]}
    b = {"q": [(2, 1, 0.95, "other", 5)]}
    merged = merge_rankings([a, b])
    assert merged["q"] == [(2, 1, 0.95), (1, 2, 0.9)]


def test_subsample_and_split_queries():
    qids = [f"q{i}" for i in range(20)]
    sub = subsample_queries(qids, sample=5, seed=1)
    assert len(sub) == 5 and len(set(sub)) == 5
    a, b = split_queries(qids, size_b=6, seed=2)
    assert len(a) == 14 and len(b) == 6
    assert sorted(a + b) == sorted(qids)
    assert [qids.index(x) for x in a] == sorted(qids.index(x) for x in a)


def test_pick_best_run():
    assert pick_best_run({"r1": 0.2, "r2": 0.9, "r3": 0.5}) == "r2"
    with pytest.raises(AssertionError):
        pick_best_run({"r1": "oops"})


def test_docs2passages_wraparound():
    words = [f"w{i}" for i in range(25)]
    passages = docs2passages(" ".join(words), nwords=10, overlap=0)
    assert len(passages) == 3
    assert passages[0].split() == words[:10]
    # final window wraps around so it is never short (reference quirk)
    assert passages[2].split() == words[20:] + words[:5]
    # short doc: one passage, unchanged
    assert docs2passages("a b c", nwords=10) == ["a b c"]


def test_msmarco_eval():
    from reranking_multimodal_retrievers_tpu.engine.utility import msmarco_eval

    qid2ranking = {
        "q1": [(10, 1), (11, 2), (12, 3)],   # first positive at rank 2
        "q2": [(20, 1), (21, 2)],            # first positive at rank 1
        "q3": [(30 + i, i + 1) for i in range(60)],  # positive at rank 15
    }
    qid2positives = {"q1": [11, 12], "q2": [20], "q3": [44],
                     "q4": [99]}  # judged but never ranked
    m = msmarco_eval(qid2ranking, qid2positives, recall_depths=(2, 50))
    # MRR@10: q1 1/2, q2 1/1, q3 first positive at rank 15 > 10 -> 0, q4 0
    assert m["mrr@10"] == pytest.approx((0.5 + 1.0) / 4)
    assert m["mrr@10_ranked_only"] == pytest.approx((0.5 + 1.0) / 3)
    # Recall@2: q1 got 1 of 2 positives, q2 1/1; q3 none within 2
    assert m["recall@2"] == pytest.approx((0.5 + 1.0) / 4)
    # Recall@50: q1 2/2 (ranks 2,3), q2 1/1, q3 1/1 at rank 15
    assert m["recall@50"] == pytest.approx(3.0 / 4)
    with pytest.raises(AssertionError):  # ranked qids must be judged
        msmarco_eval({"qX": [(1, 1)]}, {"q1": [1]})
