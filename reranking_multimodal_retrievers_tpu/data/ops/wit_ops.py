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
    """Load WIT TSV shards per split (reference `:62-144`): keep English rows
    (optionally main images only), add an md5-of-image-url ``image_id`` and a
    per-split ``original_data_id`` join key."""

    def setup(self, data_path=None, data_paths=None, only_main_image=False, **kwargs):
        self.data_path = data_path
        self.data_paths = data_paths or {}
        self.only_main_image = only_main_image
        return self

    def _call(self, data=None):
        import hashlib

        import datasets

        if self.use_dummy_data or not (self.data_path or self.data_paths):
            return make_dummy_m2kr()
        if self.data_path:
            return _load_hf(self.data_path)

        out = datasets.DatasetDict()
        for split, paths in self.data_paths.items():
            if split == "image_data_path":
                continue
            paths = paths if isinstance(paths, list) else [paths]
            tables = []
            for p in paths:
                ds = datasets.Dataset.from_csv(p, delimiter="\t")
                if self.only_main_image:
                    ds = ds.filter(
                        lambda x: x["language"] == "en" and bool(x["is_main_image"])
                    )
                else:
                    ds = ds.filter(lambda x: x["language"] == "en")
                tables.append(ds)
            split_ds = datasets.concatenate_datasets(tables)

            def add_image_id(batch):
                batch["image_id"] = [
                    hashlib.md5(u.encode()).hexdigest() for u in batch["image_url"]
                ]
                return batch

            split_ds = split_ds.map(add_image_id, batched=True,
                                    load_from_cache_file=False)
            split_ds = split_ds.add_column(
                "original_data_id", [f"{split}_{i}" for i in range(len(split_ds))]
            )
            out[split] = split_ds
        return out


@register_transform_functor
class TruncateWITPassages(HFDatasetTransform):
    """Split long WIT passages into word-budgeted chunks and re-id them as
    ``WIT_{i}`` (reference `:526-620`; the reference's accumulator is buggy —
    it duplicates text across chunks — this implements the documented intent:
    disjoint chunks of ≤ truncation_length words)."""

    def setup(self, truncation_length: int = 100, **kwargs):
        self.truncation_length = truncation_length
        return self

    def _call(self, data):
        import datasets

        key = "passages" if "passages" in data else next(
            k for k in data.keys() if k.endswith("_passages")
        )
        ds = data[key]
        T = self.truncation_length

        def process(batch):
            other = [k for k in batch.keys() if k != "passage_content"]
            out = {k: [] for k in batch.keys()}
            for i, text in enumerate(batch["passage_content"]):
                words = text.split()
                chunks = (
                    [" ".join(words[s : s + T]) for s in range(0, len(words), T)]
                    if len(words) > T
                    else [text]
                )
                for c in chunks:
                    out["passage_content"].append(c)
                    for k in other:
                        out[k].append(batch[k][i])
            return out

        ds = ds.map(process, batched=True, load_from_cache_file=False)
        if "passage_id" in ds.column_names:
            ds = ds.remove_columns(["passage_id"])
        ds = ds.add_column("passage_id", [f"WIT_{i}" for i in range(len(ds))])
        data[key] = ds
        logger.info("after truncation: %d passages", len(ds))
        return data


@register_transform_functor
class RemoveWITPassagesWithoutImages(HFDatasetTransform):
    """Filter the corpus to passages listed in ``available_documents``
    (reference `:924-951`)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        available = data.get("available_documents") or {}
        key = "passages" if "passages" in data else next(
            k for k in data.keys() if k.endswith("_passages")
        )
        full = data[key]
        data["full_passages"] = full
        data[key] = full.filter(
            lambda x: available.get(x["passage_id"]) is not None,
            load_from_cache_file=False,
        )
        logger.info("reduced corpus %d → %d", len(full), len(data[key]))
        return data


@register_transform_functor
class PrepareWITDataForRetrieval(HFDatasetTransform):
    """Form (image → passages) retrieval examples from WIT rows (reference
    `:623-822`): join each split with the passage table on
    ``original_data_id``, group by ``image_id`` aggregating the matched
    passage ids/contents into ``pos_item_ids``/``pos_item_contents``, set
    ``question_id = img_id``, and optionally keep only the IGLUE test triples
    in the valid split (``iglue_test_file``)."""

    def setup(self, iglue_test_file=None, **kwargs):
        self.iglue_test_file = iglue_test_file
        return self

    def _call(self, data):
        import datasets
        import pandas as pd

        if "passages" not in data or "original_data_id" not in data[
            next(s for s in data.keys() if not s.endswith("_passages") and s != "passages")
        ].column_names:
            # simplified schema (dummy / pre-paired rows): page description
            # becomes the positive passage
            out = datasets.DatasetDict()
            for split in [s for s in data.keys() if not s.endswith("_passages") and s != "passages"]:
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

        passages_df = (
            data["passages"]
            .select_columns(["original_data_id", "passage_id", "passage_content"])
            .to_pandas()
        )
        out = datasets.DatasetDict()
        for split in ("train", "valid", "test"):
            if split not in data:
                continue
            split_ds = data[split]
            if self.iglue_test_file and split == "valid" and not self.use_dummy_data:
                iglue = pd.read_json(self.iglue_test_file, lines=True)
                keep = {
                    (p, i, c): 1
                    for p, i, c in zip(
                        iglue["page_url"], iglue["image_url"],
                        iglue["caption_reference_description"],
                    )
                }
                split_ds = split_ds.filter(
                    lambda x: keep.get(
                        (x["page_url"], x["image_url"],
                         x["caption_reference_description"]), None,
                    ) is not None
                )
                logger.info("IGLUE filter kept %d valid examples", len(split_ds))

            split_df = split_ds.to_pandas().join(
                passages_df.set_index("original_data_id"),
                on="original_data_id", how="left",
            )[["original_data_id", "image_id", "passage_id", "passage_content",
               "img_id", "img_path"]]

            def agg(x):
                if x.name in ("passage_id", "passage_content", "original_data_id"):
                    return list(x.values.tolist())
                return x.values.tolist()[0]

            split_df = split_df.groupby("image_id").aggregate(agg)
            split_ds = datasets.Dataset.from_pandas(split_df)
            split_ds = split_ds.rename_column("passage_id", "pos_item_ids")
            split_ds = split_ds.rename_column("passage_content", "pos_item_contents")
            split_ds = split_ds.add_column("question_id", split_ds["img_id"])
            out[split] = split_ds
        out["passages"] = data["passages"]
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
    """Split the full passage corpus for large-scale training (reference
    `:1356-1408`): training keeps the FULL corpus; the validation/test corpus
    is reduced to exactly the passages referenced by valid+test
    ``pos_item_ids`` (so eval-time indexing stays cheap at scale)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        import datasets

        full = data.get("passages") or data.get("train_passages")
        valid_ids = []
        for split in ("valid", "test"):
            if split in data and "pos_item_ids" in data[split].column_names:
                for ids in data[split]["pos_item_ids"]:
                    valid_ids.extend(ids)
        keep = {k: 1 for k in valid_ids}
        reduced = full.filter(lambda x: keep.get(x["passage_id"]) is not None)
        logger.info(
            "passages associated with validation/test samples: %d of %d",
            len(reduced), len(full),
        )
        out = datasets.DatasetDict(
            {k: v for k, v in data.items() if not k.endswith("_passages") and k != "passages"}
        )
        out["train_passages"] = full
        out["valid_passages"] = reduced
        out["test_passages"] = reduced
        return out
