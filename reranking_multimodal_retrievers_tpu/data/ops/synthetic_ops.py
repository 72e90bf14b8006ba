"""Deterministic synthetic M2KR-style retrieval task.

Purpose (VERDICT r1 #1): demonstrate the accuracy half of the north star —
that a trained reranker *improves* PRRecall@5 over raw retrieval order, the
qualitative shape of the reference's OK-VQA result (raw 0.23 → reranked
0.28/0.40, `plots.ipynb` cell 16) — at a statistically meaningful scale
(≥10k passages, ≥500 eval queries) without network access to the real M2KR
data.

Task design — **adjacency pairs**: the corpus vocabulary splits into "key"
words and "filler" words. Each query names an ordered key pair ``(A, B)``
(with ``index(A) < index(B)`` so a reversed occurrence is never another
query's answer); its positive passage contains ``"A B"`` adjacent, in
order. Hard distractors contain the same two key words **separated by
fillers** or **adjacent but reversed** — identical bags of tokens, so a
bag-of-token-embeddings late-interaction retriever scores them near-ties
with the positive, while a joint cross-encoder can read the adjacency
directly. Pseudo-relevance (answer-string containment,
`metrics_processors.py:712`) marks exactly the planted positive: only it
contains the substring ``"A B"``.

Output schema matches ``LoadPreprocessedData`` (M2KR): train/valid/test row
splits + ``{split}_passages`` tables (`merge_data_ops.py:200-366`), so the
standard FLMR/reranker configs consume it unchanged. A WordPiece vocab file
covering the synthetic words is written next to the cache so the offline
FLMR tokenizers see every word as a single token.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform


def _passage_text(rng, fillers: List[str], n: int) -> List[str]:
    return [fillers[i] for i in rng.integers(0, len(fillers), size=n)]


@register_transform_functor
class GenerateSyntheticM2KR(HFDatasetTransform):
    """Generate the adjacency-pair corpus + query splits (seeded)."""

    def setup(
        self,
        num_pairs: int = 1500,
        num_test: int = 500,
        num_filler_passages: int = 1000,
        hard_separated: int = 4,
        hard_reversed: int = 3,
        passage_len: int = 12,
        num_key_words: int = 120,
        num_filler_words: int = 200,
        vocab_path: str = None,
        seed: int = 0,
        **kwargs,
    ):
        self.num_pairs = num_pairs
        self.num_test = num_test
        self.num_filler_passages = num_filler_passages
        self.hard_separated = hard_separated
        self.hard_reversed = hard_reversed
        self.passage_len = passage_len
        self.num_key_words = num_key_words
        self.num_filler_words = num_filler_words
        self.vocab_path = vocab_path
        self.seed = seed
        return self

    def _call(self, data=None):
        import datasets

        if self.use_dummy_data:
            self.num_pairs = min(self.num_pairs, 24)
            self.num_test = min(self.num_test, 8)
            self.num_filler_passages = min(self.num_filler_passages, 16)

        rng = np.random.default_rng(self.seed)
        keys = [f"k{i:03d}" for i in range(self.num_key_words)]
        fillers = [f"f{i:03d}" for i in range(self.num_filler_words)]

        if self.vocab_path:
            from ...models.tokenization import write_test_vocab

            write_test_vocab(self.vocab_path, words=keys + fillers +
                             ["pair", "find"])

        # unique ordered key pairs with index(A) < index(B)
        all_pairs = [(a, b) for a in range(len(keys))
                     for b in range(a + 1, len(keys))]
        assert len(all_pairs) >= self.num_pairs, "increase num_key_words"
        chosen = rng.permutation(len(all_pairs))[: self.num_pairs]

        passage_ids, passage_contents = [], []
        rows = {k: [] for k in (
            "question_id", "question", "instruction", "img_path", "answers",
            "gold_answer", "pos_item_ids", "source_name")}

        def add_passage(words: List[str]) -> str:
            pid = f"sp{len(passage_ids)}"
            passage_ids.append(pid)
            passage_contents.append(" ".join(words))
            return pid

        L = self.passage_len
        for qi, pair_idx in enumerate(chosen):
            a_i, b_i = all_pairs[pair_idx]
            A, B = keys[a_i], keys[b_i]
            # positive: fillers with "A B" planted adjacent (in order)
            base = _passage_text(rng, fillers, L)
            at = int(rng.integers(0, L - 1))
            pos_words = base[:at] + [A, B] + base[at:]
            pos_id = add_passage(pos_words)
            # hard distractors: same tokens, A…B separated by ≥1 filler
            for _ in range(self.hard_separated):
                base = _passage_text(rng, fillers, L)
                ai = int(rng.integers(0, L // 2 - 1))
                bi = int(rng.integers(ai + 2, L))  # ≥1 filler between
                words = list(base)
                words[ai] = A
                words[bi] = B
                add_passage(words)
            # hard distractors: adjacent but reversed ("B A")
            for _ in range(self.hard_reversed):
                base = _passage_text(rng, fillers, L)
                at = int(rng.integers(0, L - 1))
                add_passage(base[:at] + [B, A] + base[at:])

            rows["question_id"].append(f"sq{qi}")
            rows["question"].append(f"find pair {A} {B}")
            rows["instruction"].append("")
            rows["img_path"].append("")
            rows["answers"].append([f"{A} {B}"])
            rows["gold_answer"].append(f"{A} {B}")
            rows["pos_item_ids"].append([pos_id])
            rows["source_name"].append("synthetic")

        for _ in range(self.num_filler_passages):
            add_passage(_passage_text(rng, fillers, L))

        passages = datasets.Dataset.from_dict({
            "passage_id": passage_ids,
            "passage_content": passage_contents,
            "source_name": ["synthetic"] * len(passage_ids),
        })
        n_train = self.num_pairs - self.num_test
        train = datasets.Dataset.from_dict(
            {k: v[:n_train] for k, v in rows.items()})
        test = datasets.Dataset.from_dict(
            {k: v[n_train:] for k, v in rows.items()})
        return datasets.DatasetDict({
            "train": train,
            "valid": test,
            "test": test,
            "train_passages": passages,
            "valid_passages": passages,
            "test_passages": passages,
        })
