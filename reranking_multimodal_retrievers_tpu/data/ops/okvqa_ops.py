"""OK-VQA raw-data transforms (reference `src/data_ops/vqa_data_ops.py`).

These load the original OK-VQA annotation/question JSONs + Google-Search
corpus rather than the preprocessed M2KR tables; all functors synthesize
M2KR-shaped dummy data offline so pipelines run without the raw files.
"""

from __future__ import annotations

import json
import logging
import os

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from .m2kr_ops import make_dummy_m2kr

logger = logging.getLogger(__name__)


@register_transform_functor
class LoadOKVQAData(HFDatasetTransform):
    """Parse OK-VQA v1.1 question/annotation JSONs into question rows with
    answer lists and image paths (reference `vqa_data_ops.py:265-497`)."""

    def setup(self, vqa_data_path=None, image_data_path=None, **kwargs):
        self.vqa_data_path = vqa_data_path or {}
        self.image_data_path = image_data_path or {}
        return self

    def _call(self, data=None):
        import datasets
        from collections import Counter

        if self.use_dummy_data or not self.vqa_data_path:
            return make_dummy_m2kr()

        out = {}
        for split, paths in self.vqa_data_path.items():
            with open(paths["question_file"]) as f:
                questions = {q["question_id"]: q for q in json.load(f)["questions"]}
            with open(paths["annotation_file"]) as f:
                annotations = json.load(f)["annotations"]
            rows = {k: [] for k in
                    ("question_id", "question", "img_path", "answers", "gold_answer")}
            img_dir = self.image_data_path.get(split, "")
            prefix = paths.get("image_prefix", "COCO_val2014_")
            for ann in annotations:
                q = questions[ann["question_id"]]
                answers = [a["answer"] for a in ann["answers"]]
                rows["question_id"].append(str(ann["question_id"]))
                rows["question"].append(q["question"])
                rows["img_path"].append(
                    os.path.join(img_dir, f"{prefix}{ann['image_id']:012d}.jpg")
                )
                rows["answers"].append(answers)
                rows["gold_answer"].append(Counter(answers).most_common(1)[0][0])
            out[split] = datasets.Dataset.from_dict(rows)
        return datasets.DatasetDict(out)


@register_transform_functor
class LoadGoogleSearchPassageData(HFDatasetTransform):
    """Load the Google-Search passage corpus (reference `vqa_data_ops.py:690-802`)."""

    def setup(self, passage_data_path=None, use_full_split=True, **kwargs):
        self.passage_data_path = passage_data_path
        self.use_full_split = use_full_split
        return self

    def _call(self, data=None):
        import datasets
        import csv

        if self.use_dummy_data or not self.passage_data_path:
            d = make_dummy_m2kr()
            return datasets.DatasetDict(
                {"train_passages": d["train_passages"],
                 "valid_passages": d["valid_passages"],
                 "test_passages": d["test_passages"]}
            )
        rows = {"passage_id": [], "passage_content": []}
        with open(self.passage_data_path) as f:
            reader = csv.reader(f, delimiter="\t")
            for i, row in enumerate(reader):
                rows["passage_id"].append(str(row[0]))
                rows["passage_content"].append(row[1])
        table = datasets.Dataset.from_dict(rows)
        return datasets.DatasetDict(
            {f"{s}_passages": table for s in ("train", "valid", "test")}
        )


@register_transform_functor
class LoadGoogleSearchAnnotations(HFDatasetTransform):
    """Attach pseudo-relevance positives from Google-Search annotations
    (reference `vqa_data_ops.py:804-944`): per question, passages whose
    content contains an answer string become ``pos_item_ids``."""

    def setup(self, annotations_path=None, **kwargs):
        self.annotations_path = annotations_path or {}
        return self

    def _call(self, inputs):
        import datasets

        if isinstance(inputs, list):
            data, passages = inputs
        else:
            data, passages = inputs, None
        if self.use_dummy_data or passages is None:
            return data if isinstance(data, datasets.DatasetDict) else make_dummy_m2kr()

        id2content = {}
        for key in passages.keys():
            for row in passages[key]:
                id2content[row["passage_id"]] = row["passage_content"]

        def annotate(example):
            pos = [
                pid for pid, content in id2content.items()
                if any(a.lower() in content.lower() for a in example["answers"])
            ]
            example["pos_item_ids"] = pos[:10] or list(id2content.keys())[:1]
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(annotate, load_from_cache_file=False)
        for key in passages.keys():
            data[key] = passages[key]
        return data


@register_transform_functor
class CropRegionOfInterestImages(HFDatasetTransform):
    """Crop object ROIs from images and attach as extra image paths
    (reference `vqa_data_ops.py:499-688`)."""

    def setup(self, max_objects: int = 4, save_dir=None, **kwargs):
        self.max_objects = max_objects
        self.save_dir = save_dir
        return self

    def _call(self, data):
        from PIL import Image

        def crop(example):
            rois = []
            objects = (example.get("objects") or [])[: self.max_objects]
            if objects and example.get("img_path") and os.path.exists(example["img_path"]):
                img = Image.open(example["img_path"]).convert("RGB")
                w, h = img.size
                for obj in objects:
                    box = obj.get("rect") if isinstance(obj, dict) else None
                    if box:
                        x1, y1, x2, y2 = box
                        rois.append(img.crop((max(0, x1), max(0, y1), min(w, x2), min(h, y2))))
            example["ROIs"] = rois
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "objects" in data[split].column_names:
                data[split] = data[split].map(crop, load_from_cache_file=False)
        return data
