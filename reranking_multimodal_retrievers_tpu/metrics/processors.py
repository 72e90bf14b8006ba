"""Metrics processors.

Parity with the reference ``MetricsProcessor`` mixin
(`src/metrics/metrics_processors.py:39-890`): ``compute_metrics`` dispatches
on a config list of ``{'name': <method>, ...}`` modules, each method consumes
a ``data_dict`` (typically ``batch_retrieval_result`` + ``Ks``) and updates
``log_dict['metrics']``. Metric semantics are kept identical (answer-string
containment for pseudo-relevance, positive-id hits for ground truth, reranked
*and* raw lists side-by-side for the rerank variants).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List

import numpy as np

from ..utils.config_system import ConfigDict
from .vqa_accuracy import okvqa_scores


def _pseudo_relevance_counts(passages, answers, gold_answer, K):
    found, found_gold = 0, 0
    for p in passages[:K]:
        content = p["content"].lower()
        if any(a.lower() in content for a in answers):
            found += 1
        if gold_answer and gold_answer.lower() in content:
            found_gold += 1
    return found, found_gold


def _pos_id_hits(passages, pos_ids, K):
    return [1 if p["passage_id"] in pos_ids else 0 for p in passages[:K]]


class MetricsProcessor:
    """Mixin: subclasses define ``self.config.metrics`` (list of modules)."""

    def compute_metrics(self, data_dict) -> ConfigDict:
        log_dict = ConfigDict(metrics={}, artifacts={})
        for module in self.config.metrics:
            fn = getattr(self, module["name"], None)
            if fn is None:
                raise ValueError(f"Unknown metric: {module['name']}")
            log_dict = fn(module, data_dict, log_dict)
        return log_dict

    # ------------------------------------------------------- simple QA
    def compute_accuracy(self, module, data_dict, log_dict):
        preds = data_dict["predictions"]
        golds = data_dict["answers"]
        acc = float(np.mean([p == g for p, g in zip(preds, golds)]))
        log_dict.metrics["accuracy"] = acc
        return log_dict

    def compute_exact_match(self, module, data_dict, log_dict):
        preds = data_dict["predictions"]
        answer_lists = data_dict["answers"]
        em = float(
            np.mean(
                [
                    any(p.strip().lower() == a.strip().lower() for a in answers)
                    for p, answers in zip(preds, answer_lists)
                ]
            )
        )
        log_dict.metrics["exact_match"] = em
        return log_dict

    def compute_okvqa_scores(self, module, data_dict, log_dict):
        scores = okvqa_scores(data_dict["predictions"], data_dict["answers"])
        log_dict.metrics.update(scores)
        return log_dict

    # --------------------------------------------------- retrieval (DPR)
    def compute_DPR_scores(self, module, data_dict, log_dict):
        """Pseudo-relevance recall/precision (reference `:519-580`)."""
        batch_result = data_dict["batch_retrieval_result"]
        Ks = data_dict["Ks"]
        count = len(batch_result)
        res = {k: np.zeros(len(Ks)) for k in
               ("precision", "recall", "gold_precision", "gold_recall")}
        for re_ in batch_result:
            if "answers" not in re_:
                return log_dict
            for i, K in enumerate(Ks):
                f, fg = _pseudo_relevance_counts(
                    re_["top_ranking_passages"], re_["answers"],
                    re_.get("gold_answer", ""), K,
                )
                res["recall"][i] += f > 0
                res["precision"][i] += f / K
                res["gold_recall"][i] += fg > 0
                res["gold_precision"][i] += fg / K
        for name, arr in res.items():
            for i, K in enumerate(Ks):
                log_dict.metrics[f"{name}_at_{K}"] = float(arr[i] / count)
        return log_dict

    def compute_DPR_scores_with_pos_ids(self, module, data_dict, log_dict):
        """Ground-truth positive-id recall/precision (reference `:582-633`)."""
        batch_result = data_dict["batch_retrieval_result"]
        Ks = data_dict["Ks"]
        field = module.get("field", "pos_item_ids")
        count = len(batch_result)
        res = {k: np.zeros(len(Ks)) for k in ("precision", "recall")}
        for re_ in batch_result:
            hit = _pos_id_hits(re_["top_ranking_passages"], re_[field], max(Ks))
            for i, K in enumerate(Ks):
                res["recall"][i] += sum(hit[:K]) > 0
                res["precision"][i] += sum(hit[:K]) / K
        for name, arr in res.items():
            for i, K in enumerate(Ks):
                log_dict.metrics[f"{field}_{name}_at_{K}"] = float(arr[i] / count)
        return log_dict

    # -------------------------------------------------- rerank variants
    def compute_rerank_DPR_scores(self, module, data_dict, log_dict):
        """Reranked AND raw-list pseudo-relevance metrics side-by-side
        (reference `:712-814`) — ``recall_at_5`` here is the paper's
        PRRecall@5 headline metric."""
        batch_result = data_dict["batch_retrieval_result"]
        Ks = data_dict["Ks"]
        count = len(batch_result)
        names = ("precision", "recall", "gold_precision", "gold_recall")
        res = {k: np.zeros(len(Ks)) for k in names}
        res.update({f"raw_{k}": np.zeros(len(Ks)) for k in names})
        for re_ in batch_result:
            if "answers" not in re_:
                return log_dict
            for i, K in enumerate(Ks):
                for prefix, passages in (
                    ("", re_["top_ranking_passages"]),
                    ("raw_", re_["raw_top_ranking_passages"]),
                ):
                    f, fg = _pseudo_relevance_counts(
                        passages, re_["answers"], re_.get("gold_answer", ""), K
                    )
                    res[f"{prefix}recall"][i] += f > 0
                    res[f"{prefix}precision"][i] += f / K
                    res[f"{prefix}gold_recall"][i] += fg > 0
                    res[f"{prefix}gold_precision"][i] += fg / K
        for name, arr in res.items():
            for i, K in enumerate(Ks):
                log_dict.metrics[f"{name}_at_{K}"] = float(arr[i] / count)
        return log_dict

    def compute_rerank_DPR_scores_with_pos_ids(self, module, data_dict, log_dict):
        """Reference `:816-889`."""
        batch_result = data_dict["batch_retrieval_result"]
        Ks = data_dict["Ks"]
        field = module.get("field", "pos_item_ids")
        count = len(batch_result)
        res = {k: np.zeros(len(Ks)) for k in
               ("precision", "recall", "raw_precision", "raw_recall")}
        for re_ in batch_result:
            hit = _pos_id_hits(re_["top_ranking_passages"], re_[field], max(Ks))
            raw_hit = _pos_id_hits(re_["raw_top_ranking_passages"], re_[field], max(Ks))
            for i, K in enumerate(Ks):
                res["recall"][i] += sum(hit[:K]) > 0
                res["precision"][i] += sum(hit[:K]) / K
                res["raw_recall"][i] += sum(raw_hit[:K]) > 0
                res["raw_precision"][i] += sum(raw_hit[:K]) / K
        for name, arr in res.items():
            for i, K in enumerate(Ks):
                log_dict.metrics[f"{field}_{name}_at_{K}"] = float(arr[i] / count)
        return log_dict

    def compute_retrieval_metrics(self, module, data_dict, log_dict):
        """Answer-containment recall/precision over retrieved docs
        (reference `:199-405`, core variants)."""
        batch_result = data_dict["batch_retrieval_result"]
        Ks = data_dict["Ks"]
        return self.compute_DPR_scores(module, data_dict, log_dict)

    # ------------------------------------------------------------- BLEU
    def compute_BLEU_scores(self, module, data_dict, log_dict):
        """Corpus BLEU-4 over retrieved-description pairs (reference `:635-710`)."""
        preds = data_dict["predictions"]
        refs = data_dict["references"]
        log_dict.metrics["bleu"] = corpus_bleu(preds, refs)
        return log_dict


def corpus_bleu(predictions: List[str], references: List[List[str]], max_n=4) -> float:
    """Plain corpus BLEU with uniform n-gram weights and brevity penalty."""
    clipped = np.zeros(max_n)
    totals = np.zeros(max_n)
    pred_len, ref_len = 0, 0
    for pred, refs in zip(predictions, references):
        if isinstance(refs, str):
            refs = [refs]
        p_tok = pred.lower().split()
        r_toks = [r.lower().split() for r in refs]
        pred_len += len(p_tok)
        ref_len += min((abs(len(r) - len(p_tok)), len(r)) for r in r_toks)[1]
        for n in range(1, max_n + 1):
            p_ngrams = Counter(tuple(p_tok[i : i + n]) for i in range(len(p_tok) - n + 1))
            max_ref = Counter()
            for r in r_toks:
                r_ngrams = Counter(tuple(r[i : i + n]) for i in range(len(r) - n + 1))
                for g, c in r_ngrams.items():
                    max_ref[g] = max(max_ref[g], c)
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in p_ngrams.items())
            totals[n - 1] += max(sum(p_ngrams.values()), 0)
    precisions = [
        clipped[i] / totals[i] if totals[i] > 0 else 0.0 for i in range(max_n)
    ]
    if min(precisions) == 0:
        return 0.0
    log_avg = sum(math.log(p) for p in precisions) / max_n
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return float(bp * math.exp(log_avg))
