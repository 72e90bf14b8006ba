"""On-device image preprocessing (`ops/preprocess.py`) vs the host NumPy/PIL
path (`data/loaders.CLIPImageProcessorNP`): same semantics (shortest-side
resize, center crop, CLIP normalize, NCHW), agreement within resize-kernel
tolerance, and jit-ability at static shapes."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.data.loaders import (
    CLIPImageProcessorNP,
)
from reranking_multimodal_retrievers_tpu.ops.preprocess import (
    CLIPImageProcessorDevice,
    preprocess_images,
)


@pytest.mark.parametrize("hw", [(224, 224), (256, 320), (320, 256), (96, 200)])
def test_device_matches_host_preprocessor(hw):
    rng = np.random.default_rng(0)
    # smooth images: resize-kernel boundary differences don't blow up on
    # natural-image-like content the way they would on white noise
    h, w = hw
    base = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
    import jax

    up = np.asarray(jax.image.resize(base, (3, h, w, 3), "linear"))
    imgs = np.clip((up - up.min()) / (np.ptp(up) + 1e-6) * 255, 0, 255).astype(
        np.uint8)

    host = CLIPImageProcessorNP(image_size=64)(list(imgs))
    dev = np.asarray(CLIPImageProcessorDevice(image_size=64)(imgs))
    assert host.shape == dev.shape == (3, 3, 64, 64)
    # tolerance: PIL BICUBIC vs jax bicubic differ at boundaries/rounding;
    # both are far inside the ViT's bf16 round-off
    err = np.abs(host - dev).mean()
    assert err < 0.05, err
    assert np.abs(host - dev).max() < 0.75


def test_uint8_and_unit_float_agree():
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(2, 100, 80, 3)).astype(np.uint8)
    f01 = u8.astype(np.float32) / 255.0
    a = np.asarray(preprocess_images(u8, image_size=64))
    b = np.asarray(preprocess_images(f01, image_size=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_output_is_normalized_nchw():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(4, 224, 224, 3)).astype(np.uint8)
    out = np.asarray(preprocess_images(imgs, image_size=224))
    assert out.shape == (4, 3, 224, 224)
    # gray-ish random input lands near the CLIP-normalized mid-range
    assert np.isfinite(out).all()
    assert -3.0 < out.mean() < 3.0
