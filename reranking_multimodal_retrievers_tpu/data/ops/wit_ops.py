"""WIT corpus transforms (reference `src/data_ops/wit_data_ops.py:62-1408`)."""

from __future__ import annotations

import logging

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from .m2kr_ops import make_dummy_m2kr, _load_hf
from .wikipedia_ops import BM25Index

logger = logging.getLogger(__name__)


@register_transform_functor
class LoadWITData(HFDatasetTransform):
    """Load WIT rows (image, page title/description) — reference `:62-621`."""

    def setup(self, data_path=None, **kwargs):
        self.data_path = data_path
        return self

    def _call(self, data=None):
        if self.use_dummy_data or not self.data_path:
            return make_dummy_m2kr()
        return _load_hf(self.data_path)


@register_transform_functor
class PrepareWITDataForRetrieval(HFDatasetTransform):
    """Form (image → passage) retrieval pairs from WIT rows
    (reference `:623-822`): each image's page description becomes its
    positive passage."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        import datasets

        out = datasets.DatasetDict()
        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            table = data[split]
            if "pos_item_ids" in table.column_names:
                out[split] = table
                continue
            pids = [f"wit_{split}_{i}" for i in range(len(table))]
            contents = [
                (row.get("passage_content") or row.get("context_page_description")
                 or row.get("caption") or "")
                for row in table
            ]
            out[split] = table.add_column("pos_item_ids", [[p] for p in pids])
            out[f"{split}_passages"] = datasets.Dataset.from_dict(
                {"passage_id": pids, "passage_content": contents}
            )
        return out


@register_transform_functor
class IndexWITPassagesWithElasticSearch(HFDatasetTransform):
    """Lexical index over WIT passages (reference `:824-900`); BM25-backed
    like the Wikipedia variant."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        passages = next(data[k] for k in data.keys() if k.endswith("_passages"))
        return {
            "index": BM25Index(list(passages["passage_content"])),
            "passage_ids": list(passages["passage_id"]),
            "passages": data,
        }


@register_transform_functor
class SplitWITPassagesForLargeScaleTraining(HFDatasetTransform):
    """Shard the WIT passage pool per split for large-scale training
    (reference `:1356-1408`)."""

    def setup(self, num_shards: int = 1, shard_index: int = 0, **kwargs):
        self.num_shards = num_shards
        self.shard_index = shard_index
        return self

    def _call(self, data):
        for key in [k for k in data.keys() if k.endswith("_passages")]:
            data[key] = data[key].shard(
                num_shards=self.num_shards, index=self.shard_index
            )
        return data
