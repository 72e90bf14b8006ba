"""Wikipedia corpus transforms + BM25 pseudo-label mining.

Reference `src/data_ops/wikipedia_data_ops.py:63-603`. The reference mines
pseudo-relevant passages with an external Elasticsearch server
(`IndexPassagesWithElasticSearch` `:228`); this environment has no ES, so the
same capability is provided by a self-contained NumPy BM25 index — same
node names, no external service.
"""

from __future__ import annotations

import logging
import math
import re
from collections import Counter
from typing import Dict, List

import numpy as np

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from .m2kr_ops import make_dummy_m2kr, _load_hf

logger = logging.getLogger(__name__)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


class BM25Index:
    """Small in-memory BM25 (k1=1.5, b=0.75)."""

    def __init__(self, docs: List[str], k1=1.5, b=0.75):
        self.k1, self.b = k1, b
        self.doc_tokens = [_tokenize(d) for d in docs]
        self.doc_lens = np.array([len(t) for t in self.doc_tokens], np.float32)
        self.avgdl = float(self.doc_lens.mean()) if len(docs) else 0.0
        self.df: Counter = Counter()
        self.tfs = []
        for toks in self.doc_tokens:
            tf = Counter(toks)
            self.tfs.append(tf)
            self.df.update(tf.keys())
        self.n = len(docs)

    def search(self, query: str, k: int = 10) -> List[int]:
        q_toks = _tokenize(query)
        scores = np.zeros(self.n, np.float32)
        for tok in q_toks:
            df = self.df.get(tok)
            if not df:
                continue
            idf = math.log(1 + (self.n - df + 0.5) / (df + 0.5))
            for i, tf in enumerate(self.tfs):
                f = tf.get(tok, 0)
                if f:
                    denom = f + self.k1 * (1 - self.b + self.b * self.doc_lens[i] / self.avgdl)
                    scores[i] += idf * f * (self.k1 + 1) / denom
        return list(np.argsort(-scores)[:k])


@register_transform_functor
class LoadWikipediaPassageData(HFDatasetTransform):
    """Reference `:63-108`."""

    def setup(self, passage_path=None, **kwargs):
        self.passage_path = passage_path
        return self

    def _call(self, data=None):
        import datasets

        if self.use_dummy_data or not self.passage_path:
            d = make_dummy_m2kr()
            return datasets.DatasetDict({f"{s}_passages": d[f"{s}_passages"]
                                         for s in ("train", "valid", "test")})
        return _load_hf(self.passage_path)


@register_transform_functor
class LoadFullWikipediaPassageData(LoadWikipediaPassageData):
    """Reference `:110-226` — full (6M) corpus variant; same mechanics."""


@register_transform_functor
class IndexPassagesWithElasticSearch(HFDatasetTransform):
    """Build a lexical index over the passages (reference `:228-310`).
    ES replaced by the in-memory BM25 above; the output carries the index
    object for downstream annotation nodes."""

    def setup(self, index_name: str = "wikipedia", **kwargs):
        self.index_name = index_name
        return self

    def _call(self, data):
        passages = None
        for key in data.keys():
            if key.endswith("_passages"):
                passages = data[key]
                break
        assert passages is not None, "no *_passages split to index"
        index = BM25Index(list(passages["passage_content"]))
        return {
            "index": index,
            "passage_ids": list(passages["passage_id"]),
            "passages": data,
        }


@register_transform_functor
class PrepareWikipediaPassageAnnotations(HFDatasetTransform):
    """Mine pseudo-positives: BM25-retrieve per question, keep passages whose
    content contains an answer (reference `:312-540`)."""

    def setup(self, k: int = 20, **kwargs):
        self.k = k
        return self

    def _call(self, inputs):
        data, indexed = inputs if isinstance(inputs, list) else (inputs, None)
        assert indexed is not None, "requires [questions, indexed_passages] inputs"
        index: BM25Index = indexed["index"]
        pids = indexed["passage_ids"]
        contents = index.doc_tokens

        def annotate(example):
            hits = index.search(example["question"], self.k)
            answers = [a.lower() for a in example.get("answers", [])]
            pos = [
                pids[i]
                for i in hits
                if any(a in " ".join(contents[i]) for a in answers)
            ]
            example["pos_item_ids"] = pos or [pids[hits[0]]] if hits else []
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(annotate, load_from_cache_file=False)
        for key in indexed["passages"].keys():
            if key.endswith("_passages"):
                data[key] = indexed["passages"][key]
        return data


@register_transform_functor
class ReduceWikipediaPassagesSize(HFDatasetTransform):
    """Shrink the corpus to positives + sampled distractors
    (reference `:542-603`)."""

    def setup(self, num_distractors: int = 1000, **kwargs):
        self.num_distractors = num_distractors
        return self

    def _call(self, data):
        import datasets

        keep_ids = set()
        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "pos_item_ids" in data[split].column_names:
                for ids in data[split]["pos_item_ids"]:
                    keep_ids.update(ids)
        for key in [k for k in data.keys() if k.endswith("_passages")]:
            table = data[key]
            pos_rows = [i for i, pid in enumerate(table["passage_id"]) if pid in keep_ids]
            n_extra = min(self.num_distractors, len(table) - len(pos_rows))
            extra = [i for i in range(len(table)) if i not in set(pos_rows)][:n_extra]
            data[key] = table.select(sorted(set(pos_rows + extra)))
        return data
