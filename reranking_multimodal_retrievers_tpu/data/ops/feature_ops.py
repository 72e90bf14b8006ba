"""Image-feature pre-extraction, TPU-native.

Reference `src/data_ops/vqa_data_ops.py:946-1761`
(``ExtractImageFeaturesWithViT{,v2,v3}``, ``ProcessImageWithViTProcessor``):
the reference runs a torch ViT over all images inside the data pipeline and
caches the CLS features so training can use ``image_features`` instead of raw
pixels. Here the same node runs the framework's Flax ``CLIPVisionModel``
under ``jax.jit`` in fixed-size batches on the TPU.
"""

from __future__ import annotations

import logging

import numpy as np

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from ..loaders import CLIPImageProcessorNP

logger = logging.getLogger(__name__)


@register_transform_functor
class ProcessImageWithViTProcessor(HFDatasetTransform):
    """Attach preprocessed pixel arrays (reference `:1763-1813`)."""

    def setup(self, image_size: int = 224, **kwargs):
        self.processor = CLIPImageProcessorNP(image_size)
        return self

    def _call(self, data):
        proc = self.processor

        def process(example):
            if example.get("img_path"):
                import os
                if os.path.exists(example["img_path"]):
                    from PIL import Image

                    img = Image.open(example["img_path"]).convert("RGB")
                    example["pixel_values"] = proc([img])[0]
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(process, load_from_cache_file=False)
        return data


@register_transform_functor
class ExtractImageFeaturesWithViT(HFDatasetTransform):
    """Run a (random-init or bridged) CLIP-ViT over all images and store CLS
    features in ``image_features`` (reference `:946-1621`, three versions —
    this one covers their shared contract with a jitted TPU batch loop)."""

    def setup(self, vision_config=None, checkpoint_dir=None, batch_size: int = 16,
              image_size: int = 224, **kwargs):
        self.vision_config = vision_config or {}
        self.checkpoint_dir = checkpoint_dir
        self.batch_size = batch_size
        self.image_size = image_size
        return self

    def _call(self, data):
        import jax
        import jax.numpy as jnp
        from ...models.vit import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig(**self.vision_config) if self.vision_config else CLIPVisionConfig.tiny()
        model = CLIPVisionModel(cfg)
        proc = CLIPImageProcessorNP(cfg.image_size)
        dummy = jnp.zeros((1, 3, cfg.image_size, cfg.image_size), jnp.float32)
        if self.checkpoint_dir:
            from ...models.hf_bridge import load_torch_checkpoint_dir, clip_vision_params

            sd = load_torch_checkpoint_dir(self.checkpoint_dir)
            params = {"params": clip_vision_params(sd)}
        else:
            params = model.init(jax.random.PRNGKey(0), dummy)

        @jax.jit
        def encode(pix):
            return model.apply(params, pix)["last_hidden_state"][:, 0]

        def add_features(examples):
            from PIL import Image
            import os

            images = []
            for p in examples["img_path"]:
                if p and os.path.exists(p):
                    images.append(Image.open(p).convert("RGB"))
                else:
                    images.append(Image.new("RGB", (cfg.image_size, cfg.image_size)))
            pix = proc(images)
            # fixed-size batches with tail padding (static shapes for XLA)
            bs = self.batch_size
            feats = []
            for i in range(0, len(pix), bs):
                chunk = pix[i : i + bs]
                real = len(chunk)
                if real < bs:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - real, 0)])
                out = np.asarray(encode(jnp.asarray(chunk)))[:real]
                feats.append(out)
            examples["image_features"] = np.concatenate(feats).tolist()
            return examples

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "img_path" in data[split].column_names:
                data[split] = data[split].map(
                    add_features, batched=True, batch_size=64,
                    load_from_cache_file=False,
                )
        return data


@register_transform_functor
class ExtractImageFeaturesWithVAE(HFDatasetTransform):
    """Reference `vqa_data_ops.py:1622-1761` — VAE latent features. The VAE
    backbone is out of scope for retrieval parity; this node documents the
    capability and passes data through with a warning (the reference configs
    in use never enable it)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        logger.warning("ExtractImageFeaturesWithVAE is a documented no-op "
                       "(unused by the reference's shipped configs)")
        return data
