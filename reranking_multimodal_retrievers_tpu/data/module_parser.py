"""ModuleParser: declarative per-sample feature assembly.

Parity with the reference ModuleParser
(`src/data_ops/custom_datasets/module_parser.py:36-1008`): a sample's model
inputs are declared in config as ``input_modules`` / ``decoder_input_modules``
/ ``output_modules`` — lists of ``{type, option, separation_tokens, ...}``
modules. Each input parser contributes text segments and/or images; the
post-processors tokenize/process the assembled segments into fixed-shape
NumPy arrays ready for the TPU input pipeline.

Implemented parsers: QuestionInput (`:36`), InstructionInput (`:54`),
TextBasedVisionInput (`:88`), VisionInput (`:167`), KnowledgeInput (`:233`),
SimilarityOutput (`:269`), GenerationOutput (`:154`).
Post-processors: PostProcessInputTokenization (`:351`),
PostProcessFLMRQuestionInputTokenization (`:506`),
PostProcessFLMRItemInputTokenization (`:641`),
PostProcessVisionInputProcessing (`:922`), PostProcessConcatenateLabels (`:906`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


class ModuleParser:
    """Mixin over objects exposing ``self.config`` (with ``input_modules``
    etc.) and tokenizer/processor attributes set by the dataloader layer:
    ``tokenizer``, ``decoder_tokenizer``, ``image_processor``."""

    # ------------------------------------------------------ input parsers
    def QuestionInput(self, sample, module) -> Dict:
        """text sequence from the question; option 'default' or
        'add_OCR'/'add_caption' variants append those fields when present."""
        text = sample.get("question", "") or ""
        if module.get("option") == "add_OCR" and sample.get("ocr_text"):
            text = f"{text} {sample['ocr_text']}"
        if module.get("option") == "add_caption" and sample.get("caption"):
            text = f"{text} {sample['caption']}"
        sep = module.get("separation_tokens", {})
        return {"text_sequence": _wrap(text, sep)}

    def InstructionInput(self, sample, module) -> Dict:
        return {"text_sequence": _wrap(sample.get("instruction", "") or "", module.get("separation_tokens", {}))}

    def TextBasedVisionInput(self, sample, module) -> Dict:
        """Verbalized vision: caption and/or object tags as text
        (reference `:88-152`)."""
        option = module.get("option", "caption")
        parts = []
        if option in ("caption", "combine") and sample.get("caption"):
            parts.append(str(sample["caption"]))
        if option in ("object", "combine") and sample.get("objects"):
            objects = sample["objects"]
            if isinstance(objects, (list, tuple)):
                names = [o.get("class", str(o)) if isinstance(o, dict) else str(o) for o in objects]
                parts.append(" ".join(names))
            else:
                parts.append(str(objects))
        return {"text_sequence": _wrap(" ".join(parts), module.get("separation_tokens", {}))}

    def VisionInput(self, sample, module) -> Dict:
        """Image input: a PIL image loaded from ``img_path``, precomputed
        ``image_features``, or stacked ROI images (reference `:167-231`)."""
        option = module.get("option", "from_file")
        if option == "from_embeddings" and sample.get("image_features") is not None:
            return {"image_features": np.asarray(sample["image_features"], np.float32)}
        image = sample.get("image")
        if image is None and sample.get("img_path"):
            from PIL import Image

            image = Image.open(sample["img_path"]).convert("RGB")
        images = [image] if image is not None else []
        if module.get("use_ROI") and sample.get("ROIs"):
            images.extend(sample["ROIs"])
        return {"images": images}

    def KnowledgeInput(self, sample, module) -> Dict:
        return {"text_sequence": _wrap(sample.get("passage_content", "") or "", module.get("separation_tokens", {}))}

    # ----------------------------------------------------- output parsers
    def GenerationOutput(self, sample, module) -> Dict:
        return {"text_sequence": sample.get("gold_answer", "") or ""}

    def SimilarityOutput(self, sample, module) -> Dict:
        """Positive + negative passage contents for contrastive training
        (reference `:269-280`)."""
        sep = module.get("separation_tokens", {})
        contents = [_wrap(c, sep) for c in sample.get("passage_contents", [])]
        return {"text_sequences": contents}

    # ------------------------------------------------------- dispatching
    def parse_modules(self, sample, modules, type_="input") -> Dict[str, Any]:
        """Run each module's parser and concatenate text segments
        (reference `parse_modules`, `:282-349`)."""
        out: Dict[str, Any] = {"text_sequence": "", "images": [],
                               "image_features": None, "text_sequences": None}
        parts = []
        for module in modules:
            fn = getattr(self, module["type"], None)
            if fn is None:
                raise ValueError(f"Unknown module type: {module['type']}")
            res = fn(sample, module)
            if res.get("text_sequence"):
                parts.append(res["text_sequence"])
            if res.get("images"):
                out["images"].extend(res["images"])
            if res.get("image_features") is not None:
                out["image_features"] = res["image_features"]
            if res.get("text_sequences") is not None:
                out["text_sequences"] = res["text_sequences"]
        out["text_sequence"] = " ".join(p for p in parts if p).strip()
        return out

    # --------------------------------------------------- post-processors
    def PostProcessInputTokenization(self, data, module):
        enc = self.tokenizer(
            data["text_sequences"],
            padding="max_length",
            truncation=True,
            max_length=module.get("max_length", self.config.get("max_source_length", 512)),
            return_tensors="np",
        )
        return {
            "input_ids": enc["input_ids"].astype(np.int32),
            "attention_mask": enc["attention_mask"].astype(np.int32),
        }

    def PostProcessFLMRQuestionInputTokenization(self, data, module):
        """Sets query_maxlen from config then tokenizes with the FLMR query
        tokenizer ([Q] marker + [MASK] padding) — reference `:506-639`."""
        maxlen = module.get("max_length", getattr(self.tokenizer, "query_maxlen", 32))
        enc = self.tokenizer(data["text_sequences"], max_length=maxlen)
        return {
            "input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"],
        }

    def PostProcessFLMRItemInputTokenization(self, data, module):
        enc = self.decoder_tokenizer(
            data["text_sequences"],
            max_length=module.get("max_length", None),
        )
        return {
            "input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"],
        }

    def PostProcessVisionInputProcessing(self, data, module):
        """images → pixel_values via the image processor (reference `:922-1006`)."""
        images = data["images"]
        if not images:
            return {}
        pixel_values = self.image_processor(images)
        return {"pixel_values": pixel_values}

    def PostProcessConcatenateLabels(self, data, module):
        enc = self.decoder_tokenizer(
            data["text_sequences"],
            max_length=module.get("max_length", self.config.get("max_target_length", 32)),
        )
        return {"labels": enc["input_ids"]}


def _wrap(text: str, sep: Dict) -> str:
    start = sep.get("start", "")
    end = sep.get("end", "")
    return f"{start}{text}{end}" if (start or end) else text
