"""VQA accuracy parity: our normalizer/evaluator vs the official vqaEval the
reference vendors (`src/utils/vqaEval.py`), on a crafted sample set exercising
contractions, digit words, articles, punctuation-vs-space rules, the typo'd
period regex, and the all-humans-agree normalization skip."""

import importlib.util
import random

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.metrics.vqa_accuracy import (
    normalize_answer,
    okvqa_scores,
    vqa_accuracy,
)


def _load_reference_vqaeval():
    spec = importlib.util.spec_from_file_location(
        "ref_vqaEval", "/root/reference/src/utils/vqaEval.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.VQAEval


class _Stub:
    def __init__(self, qa):
        self.qa = qa

    def getQuesIds(self):
        return list(self.qa.keys())


CRAFTED = [
    # (prediction, human answers) — normalization edge cases
    ("y'all", ["yall"] * 4 + ["you all"] * 6),
    ("couldn't've", ["couldnt've"] * 3 + ["could not have"] * 7),
    ("2", ["two"] * 5 + ["three"] * 5),
    ("none", ["zero"] * 3 + ["0"] * 3 + ["nothing"] * 4),
    ("the big dog", ["big dog"] * 6 + ["a big dog"] * 4),
    ("u.s.a.", ["usa"] * 5 + ["u.s.a."] * 5),
    ("1,000", ["1000"] * 4 + ["one thousand"] * 6),
    ("semi-colon ; here", ["semicolon here", "semi colon here"] * 5),
    ("3.5", ["3.5"] * 8 + ["35"] * 2),
    ("same", ["same"] * 10),  # all-agree → normalization skipped
    ("the same", ["the same"] * 10),  # all-agree: article NOT stripped
    ("it's red!", ["its red"] * 4 + ["red"] * 6),
    ("somebody'd", ["somebodyd"] * 5 + ["someone"] * 5),
    ("ten", ["10"] * 3 + ["ten"] * 3 + ["9"] * 4),
    ("o'clock", ["oclock"] * 6 + ["time"] * 4),
    ("(parens)", ["parens"] * 10),
    ("a/b", ["a b", "ab"] * 5),
    ("what's up?", ["whats up"] * 7 + ["nothing"] * 3),
    ("twenty-one", ["twenty one", "21"] * 5),
    ("dog", ["dog", "Dog", "DOG", "cat", "dog", "dog", "puppy", "dog", "dog", "dog"]),
]


def _crafted_50():
    rng = random.Random(0)
    words = ["cat", "two", "the cat", "a dog", "it's", "none", "u.s.", "1,234",
             "semi-final", "yes!", "no?", "o'clock", "can't", "cant"]
    samples = list(CRAFTED)
    while len(samples) < 50:
        pred = rng.choice(words)
        answers = [rng.choice(words) for _ in range(10)]
        samples.append((pred, answers))
    return samples


def _reference_scores(samples):
    VQAEval = _load_reference_vqaeval()
    gts = {}
    res = {}
    for qid, (pred, answers) in enumerate(samples):
        gts[qid] = {
            "answers": [
                {"answer": a, "answer_id": i} for i, a in enumerate(answers)
            ],
            "question_type": "t",
            "answer_type": "t",
        }
        res[qid] = {"answer": pred}
    ev = VQAEval(_Stub(gts), _Stub(res), n=2)
    ev.evaluate()
    return ev


def test_official_parity_on_crafted_set():
    samples = _crafted_50()
    ev = _reference_scores(samples)
    ours = okvqa_scores([p for p, _ in samples], [a for _, a in samples])
    assert ours["accuracy_overall"] == pytest.approx(ev.accuracy["overall"], abs=1e-9)
    # per-question agreement too, not just the mean
    for qid, (pred, answers) in enumerate(samples):
        assert round(100 * vqa_accuracy(pred, answers), 2) == pytest.approx(
            ev.evalQA[qid], abs=1e-9
        ), (pred, answers)


def test_normalizer_quirks():
    # typo'd period regex strips periods not followed by a digit
    assert normalize_answer("u.s.a.") == "usa"
    assert normalize_answer("3.5") == "3.5"
    # article + digit mapping order: digits first, then articles dropped
    assert normalize_answer("the one dog") == "1 dog"
    # contraction table includes the reversed somebody'd entry
    assert normalize_answer("somebody'd") == "somebodyd"
    # punctuation adjacent to space is deleted, not spaced
    assert normalize_answer("semi -colon") == "semi colon"
