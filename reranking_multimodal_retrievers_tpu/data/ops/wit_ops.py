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
            )
            # img_id/img_path come from the image registry built by
            # PrepareImagesForWITData (LoadWITData itself never adds them);
            # fall back to image_id / None so the projection below cannot
            # KeyError on real-data runs.
            registry = data.get("images", {}) or {}
            if "img_id" not in split_df.columns:
                split_df["img_id"] = split_df["image_id"]
            if "img_path" not in split_df.columns:
                split_df["img_path"] = [
                    (registry.get(i) or {}).get("img_path")
                    for i in split_df["image_id"]
                ]
            split_df = split_df[
                ["original_data_id", "image_id", "passage_id",
                 "passage_content", "img_id", "img_path"]]

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
class LoadWITPassages(HFDatasetTransform):
    """Concatenate train+valid WIT rows into a passage corpus: assign
    ``WIT_{i}`` passage ids and render ``passage_content`` from the page /
    section / caption fields in the reference's exact field order
    (reference `:464-524`)."""

    _FIELDS = (
        ("section_title", "section title"),
        ("hierarchical_section_title", "hierarchical section title"),
        ("caption_reference_description", "caption reference description"),
        ("caption_attribution_description", "caption attribution description"),
        ("caption_alt_text_description", "caption alt text description"),
    )

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        import datasets

        parts = [data[s] for s in ("train", "valid") if s in data]
        full = datasets.concatenate_datasets(parts) if len(parts) > 1 else parts[0]
        full = full.add_column("passage_id",
                               [f"WIT_{i}" for i in range(len(full))])

        def render(item):
            content = f"title: {item.get('page_title')}"
            for col, label in self._FIELDS:
                if item.get(col) is not None:
                    content += f" {label}: {item[col]}"
            content += f" content: {item.get('context_page_description')}"
            item["passage_content"] = content
            return item

        full = full.map(render, load_from_cache_file=False)
        return datasets.DatasetDict({"passages": full})


def _validate_image(path) -> bool:
    """True iff ``path`` exists and decodes as an image."""
    import os

    if not path or not os.path.exists(path):
        return False
    try:
        from PIL import Image

        with Image.open(path) as im:
            im.verify()
        return True
    except Exception:
        return False


@register_transform_functor
class PrepareImagesForWITData(HFDatasetTransform):
    """Build the WIT image registry ``{image_id: {img_id, img_path}}`` and
    filter each split to rows whose image file is present on disk (reference
    `:146-326`; the reference's 128-thread rotating-user-agent downloader is
    an offline concern — here images are expected pre-fetched under
    ``image_data_path``, and rows without a decodable file are dropped the
    same way the reference drops failed downloads)."""

    def setup(self, image_data_path=None, validate: bool = True, **kwargs):
        self.image_data_path = image_data_path
        self.validate = validate
        return self

    def _call(self, data):
        import os

        images = {}
        for split in [s for s in data.keys()
                      if s not in ("passages",) and not s.endswith("_passages")]:
            split_ds = data[split]
            if not hasattr(split_ds, "column_names") or \
                    "image_id" not in split_ds.column_names:
                continue
            keep_rows = []
            for i, image_id in enumerate(split_ds["image_id"]):
                path = (split_ds[i].get("img_path")
                        or (os.path.join(self.image_data_path, f"{image_id}.jpg")
                            if self.image_data_path else None))
                ok = (not self.validate) or self.use_dummy_data or _validate_image(path)
                if ok:
                    keep_rows.append(i)
                    images[image_id] = {"img_id": image_id, "img_path": path}
            if len(keep_rows) != len(split_ds):
                data[split] = split_ds.select(keep_rows)
                logger.info("%s: kept %d/%d rows with valid images",
                            split, len(keep_rows), len(split_ds))
        data["images"] = images
        return data


@register_transform_functor
class PrepareImagesForWITDataFromPassages(HFDatasetTransform):
    """Same registry construction, but driven by the *passage* table
    (reference `:328-462`) — used when the passage corpus, not the question
    split, is the source of image ids."""

    def setup(self, image_data_path=None, validate: bool = True, **kwargs):
        self.image_data_path = image_data_path
        self.validate = validate
        return self

    def _call(self, data):
        import os

        key = "passages" if "passages" in data else next(
            k for k in data.keys() if k.endswith("_passages"))
        table = data[key]
        images = {}
        for row in table:
            image_id = row.get("image_id")
            if image_id is None:
                continue
            path = (row.get("img_path")
                    or (os.path.join(self.image_data_path, f"{image_id}.jpg")
                        if self.image_data_path else None))
            if (not self.validate) or self.use_dummy_data or _validate_image(path):
                images[image_id] = {"img_id": image_id, "img_path": path}
        logger.info("image registry from passages: %d entries", len(images))
        data["images"] = images
        return data


@register_transform_functor
class PrepareWITPassageAnnotations(HFDatasetTransform):
    """Mine pseudo-relevance labels for WIT questions against the lexical
    passage index (reference `:954-1182`, ES multi-match replaced by the
    in-process BM25): per question, retrieve top-k, keep hits as
    ``pos_item_ids`` (string-containment-checked against answers when answers
    exist), and accumulate every hit into ``available_documents`` for the
    corpus-reduction node."""

    def setup(self, k: int = 10, **kwargs):
        self.k = k
        return self

    def _call(self, inputs):
        data, indexed = inputs if isinstance(inputs, list) else (inputs, None)
        assert indexed is not None, "requires [questions, indexed_passages] inputs"
        index: BM25Index = indexed["index"]
        pids = indexed["passage_ids"]
        contents = index.doc_tokens
        available = {}

        def annotate(example):
            text = example.get("question") or example.get(
                "caption_reference_description") or ""
            hits = index.search(text, self.k)
            for i in hits:
                available[pids[i]] = 1
            answers = [a.lower() for a in example.get("answers", [])]
            if answers:
                pos = [pids[i] for i in hits
                       if any(a in " ".join(contents[i]) for a in answers)]
            else:
                pos = [pids[i] for i in hits[:1]]
            example["pos_item_ids"] = pos or ([pids[hits[0]]] if hits else [])
            return example

        for split in [s for s in data.keys()
                      if s not in ("passages", "images")
                      and not s.endswith("_passages")
                      and hasattr(data[s], "map")]:
            data[split] = data[split].map(annotate, load_from_cache_file=False)
        for key in indexed["passages"].keys():
            if key.endswith("_passages") or key == "passages":
                data[key] = indexed["passages"][key]
        data["available_documents"] = available
        return data


@register_transform_functor
class ReduceWITPassagesSize(HFDatasetTransform):
    """Filter the corpus to ``available_documents`` while keeping the full
    table aside (reference `:1184-1271`)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        available = data.get("available_documents") or {}
        for key in [k for k in data.keys()
                    if k == "passages" or k.endswith("_passages")]:
            if key == "full_passages":
                continue
            full = data[key]
            data["full_passages"] = full
            data[key] = full.filter(
                lambda x: available.get(x["passage_id"]) is not None,
                load_from_cache_file=False,
            )
            logger.info("reducing #docs (%s) %d → %d", key, len(full),
                        len(data[key]))
        return data


@register_transform_functor
class ReduceWITImagesSize(HFDatasetTransform):
    """Shrink the image registry to images referenced by the (reduced)
    passage table; emit ``imgId2path`` (reference `:1273-1312`)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        key = "passages" if "passages" in data else next(
            k for k in data.keys() if k.endswith("_passages"))
        table = data[key]
        images = data.get("images") or {}
        col = "image_id" if "image_id" in table.column_names else None
        available = {k: 1 for k in table[col]} if col else {}
        new_images, img_id2path = {}, {}
        for k, v in images.items():
            if available.get(v["img_id"]) is not None:
                new_images[k] = v
                img_id2path[v["img_id"]] = v["img_path"]
        logger.info("reducing #images %d → %d", len(images), len(new_images))
        return {"images": new_images, "imgId2path": img_id2path}


@register_transform_functor
class ConcatenateImageCorpus(HFDatasetTransform):
    """Merge image registries (and precomputed image-embedding datasets) from
    several corpus pipelines (reference `:1314-1354`)."""

    def setup(self, **kwargs):
        return self

    def _call(self, inputs):
        import datasets

        inputs = inputs if isinstance(inputs, list) else [inputs]
        full_images = {}
        embedding_tables = []
        for part in inputs:
            if "images" in part:
                full_images.update(part["images"])
            if "image_dataset_with_embeddings" in part:
                embedding_tables.append(part["image_dataset_with_embeddings"])
        out = {"images": full_images}
        if embedding_tables:
            out["image_dataset_with_embeddings"] = (
                datasets.concatenate_datasets(embedding_tables)
                if len(embedding_tables) > 1 else embedding_tables[0]
            )
        return out


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


@register_transform_functor
class ConvertWITImagePixels(HFDatasetTransform):
    """Decode WIT ``image_pixels`` TSV shards (``image_url``, base64 bytes,
    ``metadata_url``) into on-disk ``{md5(image_url)}.jpg`` files — the id
    convention `LoadWITData` joins against (reference
    `src/tools/convert_wit_data.py:13-64`; there the final ``save`` call is
    commented out — this implements the documented intent). Rows that fail
    to decode, or are under ``min_side`` pixels on either side, are skipped
    and counted. Returns a manifest dataset of saved ``image_id``s so the
    node composes in a DataPipeline DAG."""

    def setup(self, pixels_dir=None, images_dir=None, min_side: int = 10,
              **kwargs):
        self.pixels_dir = pixels_dir
        self.images_dir = images_dir
        self.min_side = min_side
        return self

    def _call(self, data=None):
        import base64
        import csv
        import hashlib
        import io
        import os
        import sys

        import datasets
        from PIL import Image

        # real WIT image_pixels shards carry base64 payloads far above csv's
        # default 128 KB field cap (any raw image over ~98 KB); without this
        # the reader raises _csv.Error outside the per-row skip path
        csv.field_size_limit(sys.maxsize)
        os.makedirs(self.images_dir, exist_ok=True)
        saved, skipped = [], 0
        shards = sorted(
            f for f in os.listdir(self.pixels_dir)
            if f.endswith((".csv", ".tsv"))
        )
        for shard in shards:
            with open(os.path.join(self.pixels_dir, shard), newline="") as f:
                # reference reads headerless TSV with fixed column order
                for row in csv.reader(f, delimiter="\t"):
                    if len(row) < 2:
                        skipped += 1
                        continue
                    image_url, b64_bytes = row[0], row[1]
                    try:
                        img = Image.open(
                            io.BytesIO(base64.b64decode(b64_bytes))
                        ).convert("RGB")
                    except Exception:
                        logger.warning("error decoding image %s", image_url)
                        skipped += 1
                        continue
                    if min(img.size) < self.min_side:
                        logger.warning(
                            "image too small %s %s", image_url, img.size)
                        skipped += 1
                        continue
                    image_id = hashlib.md5(image_url.encode()).hexdigest()
                    img.save(os.path.join(self.images_dir,
                                          f"{image_id}.jpg"))
                    saved.append(image_id)
        logger.info("converted %d WIT images (%d skipped)",
                    len(saved), skipped)
        return datasets.Dataset.from_dict({"image_id": saved})
