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

    def _build_encoder(self):
        """Lazily build (and memoize) the jitted CLS-feature encoder."""
        if getattr(self, "_encoder", None) is not None:
            return self._encoder
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

        self._encoder = (encode, proc, cfg)
        return self._encoder

    def _encode_batch(self, examples):
        """Encode ``examples['img_path']`` → ``examples['image_features']``
        in fixed-size padded batches (static shapes for XLA)."""
        import os

        import jax.numpy as jnp
        from PIL import Image

        encode, proc, cfg = self._build_encoder()
        images = []
        for p in examples["img_path"]:
            if p and os.path.exists(p):
                images.append(Image.open(p).convert("RGB"))
            else:
                images.append(Image.new("RGB", (cfg.image_size, cfg.image_size)))
        pix = proc(images)
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

    def _call(self, data):
        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "img_path" in data[split].column_names:
                data[split] = data[split].map(
                    self._encode_batch, batched=True, batch_size=64,
                    load_from_cache_file=False,
                )
        return data


@register_transform_functor
class ExtractImageFeaturesWithViTv2(ExtractImageFeaturesWithViT):
    """v1 + a persistent embedding cache (reference `:1112-1311` keeps an
    ``embedding_cache`` folder so interrupted extraction passes resume):
    features already in the :class:`FeatureStore` are read back; only the
    missing images are encoded, and every fresh embedding is published to the
    store keyed by ``image_id``."""

    def setup(self, cache_folder="./embedding_cache", index_name="vit_features",
              **kwargs):
        from ..feature_store import FeatureStore

        self.store = FeatureStore(cache_folder, index_name=index_name)
        return super().setup(**kwargs)

    def _call(self, data):
        store = self.store
        fresh = {}

        def restore(examples):
            key_col = "image_id" if "image_id" in examples else "question_id"
            missing_idx, missing_paths, ids = [], [], examples[key_col]
            feats = [None] * len(examples["img_path"])
            for i, key in enumerate(ids):
                cached = store.get(str(key))
                if cached is not None:
                    feats[i] = cached.tolist()
                else:
                    missing_idx.append(i)
                    missing_paths.append(examples["img_path"][i])
            if missing_idx:
                sub = {"img_path": missing_paths}
                sub = self._encode_batch(sub)
                for j, i in enumerate(missing_idx):
                    feats[i] = sub["image_features"][j]
                    store.put(str(ids[i]), np.asarray(feats[i], np.float32))
                    fresh[str(ids[i])] = True
            examples["image_features"] = feats
            return examples

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "img_path" in data[split].column_names:
                data[split] = data[split].map(
                    restore, batched=True, batch_size=64,
                    load_from_cache_file=False,
                )
        logger.info("ViTv2: %d embeddings computed fresh, rest cache hits",
                    len(fresh))
        return data


@register_transform_functor
class ExtractImageFeaturesWithViTv3(ExtractImageFeaturesWithViT):
    """v3 publishes the features as a standalone lookup corpus (reference
    `:1313-1621` "saves tensors to ES"): every image is encoded (resuming
    from the store like v2) and the output carries an
    ``image_dataset_with_embeddings`` table keyed by ``image_id`` — the shape
    the ``ConcatenateImageCorpus`` / multimodal-docs nodes consume."""

    def setup(self, cache_folder="./embedding_cache",
              index_name="encoded_image_features", **kwargs):
        from ..feature_store import FeatureStore

        self.store = FeatureStore(cache_folder, index_name=index_name)
        return super().setup(**kwargs)

    def _call(self, data):
        data = ExtractImageFeaturesWithViTv2._call(self, data)
        ids, feats, seen = [], [], set()
        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            cols = data[split].column_names
            if "image_features" not in cols:
                continue
            key_col = "image_id" if "image_id" in cols else "question_id"
            for key, feat in zip(data[split][key_col],
                                 data[split]["image_features"]):
                if key not in seen:
                    seen.add(key)
                    ids.append(key)
                    feats.append(feat)
        import datasets

        data["image_dataset_with_embeddings"] = datasets.Dataset.from_dict(
            {"image_id": ids, "image_features": feats}
        )
        return data


class _VAEEncoder:
    """Minimal convolutional VAE encoder (stride-2 conv stack → dense
    mean/logvar heads). Stands in for the reference's pretrained VAE
    (`vqa_data_ops.py:1622-1761`); the latent *mean* is the stored feature."""

    def __init__(self, latent_dim: int, image_size: int):
        import flax.linen as nn

        class Enc(nn.Module):
            latent: int

            @nn.compact
            def __call__(self, x):  # x: [B, 3, H, W]
                x = x.transpose(0, 2, 3, 1)
                for feat in (16, 32, 64):
                    x = nn.Conv(feat, (3, 3), strides=(2, 2), name=f"conv_{feat}")(x)
                    x = nn.gelu(x)
                x = x.reshape(x.shape[0], -1)
                mean = nn.Dense(self.latent, name="mean")(x)
                logvar = nn.Dense(self.latent, name="logvar")(x)
                return mean, logvar

        self.module = Enc(latent=latent_dim)
        self.image_size = image_size

    def init_params(self, rng):
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 3, self.image_size, self.image_size), jnp.float32)
        return self.module.init(rng, dummy)


@register_transform_functor
class ExtractImageFeaturesWithVAE(HFDatasetTransform):
    """VAE latent features (reference `vqa_data_ops.py:1622-1761`): encode
    each image to a compact latent and store the posterior mean in
    ``vae_features``. Runs the conv encoder jitted in fixed-size batches;
    a bridged pretrained VAE plugs in through ``checkpoint_dir``."""

    def setup(self, latent_dim: int = 64, image_size: int = 64,
              batch_size: int = 16, **kwargs):
        self.latent_dim = latent_dim
        self.image_size = image_size
        self.batch_size = batch_size
        return self

    def _call(self, data):
        import jax
        import jax.numpy as jnp

        enc = _VAEEncoder(self.latent_dim, self.image_size)
        params = enc.init_params(jax.random.PRNGKey(0))
        proc = CLIPImageProcessorNP(self.image_size)

        @jax.jit
        def encode(pix):
            mean, _ = enc.module.apply(params, pix)
            return mean

        bs = self.batch_size

        def add_features(examples):
            import os

            from PIL import Image

            images = []
            for p in examples["img_path"]:
                if p and os.path.exists(p):
                    images.append(Image.open(p).convert("RGB"))
                else:
                    images.append(Image.new("RGB", (self.image_size,) * 2))
            pix = proc(images)
            feats = []
            for i in range(0, len(pix), bs):
                chunk = pix[i : i + bs]
                real = len(chunk)
                if real < bs:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], bs - real, 0)])
                feats.append(np.asarray(encode(jnp.asarray(chunk)))[:real])
            examples["vae_features"] = np.concatenate(feats).tolist()
            return examples

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            if "img_path" in data[split].column_names:
                data[split] = data[split].map(
                    add_features, batched=True, batch_size=64,
                    load_from_cache_file=False,
                )
        return data
