"""E-VQA answer evaluation.

Parity with `src/tools/evaluation_utils.py:17-50` + `src/tools/eval_evqa.py`:
the reference scores answer equivalence with the BEM model from TF-hub, which
needs network + TensorFlow-hub downloads. This environment has zero egress,
so the same interface is provided with a tiered matcher: exact match after
VQA normalization, then token-F1 ≥ threshold (the standard BEM-free fallback
used by the InfoSeek/E-VQA papers); a ``bem_fn`` hook accepts a real BEM
callable when one is available.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, List, Optional

from ..metrics.vqa_accuracy import normalize_answer


def token_f1(pred: str, gold: str) -> float:
    p = normalize_answer(pred).split()
    g = normalize_answer(gold).split()
    if not p or not g:
        return float(p == g)
    common = Counter(p) & Counter(g)
    overlap = sum(common.values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(p)
    recall = overlap / len(g)
    return 2 * precision * recall / (precision + recall)


def answers_equivalent(
    prediction: str,
    gold: str,
    question: str = "",
    f1_threshold: float = 0.6,
    bem_fn: Optional[Callable[[str, str, str], float]] = None,
) -> bool:
    if normalize_answer(prediction) == normalize_answer(gold):
        return True
    if bem_fn is not None:
        return bem_fn(prediction, gold, question) >= 0.5
    return token_f1(prediction, gold) >= f1_threshold


def evqa_scores(
    predictions: List[str],
    golds: List[str],
    questions: Optional[List[str]] = None,
    bem_fn=None,
) -> dict:
    questions = questions or [""] * len(predictions)
    correct = [
        answers_equivalent(p, g, q, bem_fn=bem_fn)
        for p, g, q in zip(predictions, golds, questions)
    ]
    return {
        "evqa_accuracy": sum(correct) / max(len(correct), 1),
        "evqa_mean_f1": sum(token_f1(p, g) for p, g in zip(predictions, golds))
        / max(len(predictions), 1),
    }
