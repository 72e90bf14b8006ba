"""Distillation score preparation (reference
`src/data_ops/distillation_data_ops.py:51-432`): attach teacher retrieval
scores per (question, document) for student training."""

from __future__ import annotations

import json
import os
import pickle

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform


@register_transform_functor
class PrepareDistillationScores(HFDatasetTransform):
    def setup(self, teacher_scores_path=None, docs_per_query: int = 10, **kwargs):
        self.teacher_scores_path = teacher_scores_path
        self.docs_per_query = docs_per_query
        return self

    def _call(self, data):
        scores = {}
        if self.teacher_scores_path and os.path.exists(self.teacher_scores_path):
            if self.teacher_scores_path.endswith(".json"):
                with open(self.teacher_scores_path) as f:
                    scores = json.load(f)
            else:
                with open(self.teacher_scores_path, "rb") as f:
                    scores = pickle.load(f)

        def attach(example):
            entry = scores.get(str(example["question_id"]), [])
            example["teacher_doc_ids"] = [e["passage_id"] for e in entry][: self.docs_per_query]
            example["teacher_scores"] = [e.get("score", 0.0) for e in entry][: self.docs_per_query]
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(attach, load_from_cache_file=False)
        return data
