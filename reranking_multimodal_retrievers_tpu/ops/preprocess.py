"""On-device CLIP image preprocessing (resize → center-crop → normalize).

The reference preprocesses images host-side through HF processors
(`src/data_ops/common_data_ops.py:159-173`,
`src/models/custom_clip_processor.py`) — a per-image PIL loop. At serving
rates (the headline rerank path moves >1.3k candidates/s with one image per
query) a host-side Python loop becomes the input bottleneck, and
BASELINE.json's north-star names preprocessing as fused device work. This
module is the jitted equivalent: one fixed-shape XLA program per (input
resolution → target) pair that the batch rides through on the VPU, fusible
with the ViT patchify conv that follows it (`models/vit.py`).

Fidelity: `jax.image.resize(..., "bicubic")` matches PIL's BICUBIC kernel up
to boundary handling; outputs agree with the host `CLIPImageProcessorNP`
path within ~1e-2 per channel (pinned in tests/test_preprocess.py), which is
far below the bf16 round-off the ViT runs at. Exact-shortest-side semantics
(scale = target/min(h, w), then center crop) are reproduced with static
shapes: the scaled size is computed in Python from the static input shape,
so every distinct input resolution compiles once — batch your corpus by
resolution, as any production loader does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("image_size", "method"))
def preprocess_images(
    images: jax.Array,
    image_size: int = 224,
    method: str = "bicubic",
) -> jax.Array:
    """[B, H, W, 3] uint8/float (0-255 or 0-1) → [B, 3, S, S] normalized fp32.

    CLIP semantics: resize so the SHORTEST side is ``image_size`` (aspect
    preserved), center-crop to square, scale to [0, 1], normalize by the
    CLIP mean/std, and emit NCHW — the device twin of
    ``data/loaders.CLIPImageProcessorNP``.
    """
    B, H, W, C = images.shape
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    else:
        # float inputs are [0,1]-scaled already unless they look like 0-255
        x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    s = image_size
    scale = s / min(H, W)
    nh, nw = max(s, round(H * scale)), max(s, round(W * scale))
    x = jax.image.resize(x, (B, nh, nw, C), method=method)
    top, left = (nh - s) // 2, (nw - s) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (B, s, s, C))
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


class CLIPImageProcessorDevice:
    """Drop-in for ``CLIPImageProcessorNP`` that runs the whole batch as one
    XLA program on the accelerator. Accepts a [B, H, W, 3] uint8 batch (or a
    list of same-shape HWC arrays) and returns NCHW float32 pixel values —
    already device-resident, so the ViT consumes them with no extra
    host→device hop."""

    def __init__(self, image_size: int = 224, method: str = "bicubic"):
        self.image_size = image_size
        self.method = method

    def __call__(self, images) -> jax.Array:
        if isinstance(images, (list, tuple)):
            images = np.stack([np.asarray(im) for im in images])
        return preprocess_images(
            jnp.asarray(images), image_size=self.image_size,
            method=self.method)
