"""Batching loaders + image preprocessing, TPU-first.

Replaces the reference's ``torch.utils.data.DataLoader`` plumbing
(`src/data_ops/common_data_opts.py:177-290`) with a NumPy loader producing
fixed-shape batches: train loaders shuffle per-epoch with a seeded PRNG and
drop the ragged tail; eval loaders pad the tail batch by repeating the last
sample and report ``_real_count`` so jit programs never see a new shape
(XLA recompilation guard).
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional

import numpy as np


class CLIPImageProcessorNP:
    """CLIP-style image preprocessing in NumPy/PIL (resize shortest side,
    center crop, normalize) — the role of ``AutoImageProcessor`` /
    ``CustomCLIPImageProcessor`` (`src/models/custom_clip_processor.py`)
    without hub access. Returns NCHW float32 pixel values."""

    MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, image_size: int = 224):
        self.image_size = image_size

    def __call__(self, images) -> np.ndarray:
        from PIL import Image

        out = []
        for img in images:
            if isinstance(img, np.ndarray):
                if np.issubdtype(img.dtype, np.floating):
                    # float images are [0,1]-scaled; a bare uint8 cast
                    # would truncate every pixel to 0/1 (black frames)
                    img = np.clip(img * 255.0, 0, 255)
                img = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
            img = img.convert("RGB")
            w, h = img.size
            s = self.image_size
            scale = s / min(w, h)
            img = img.resize((max(s, round(w * scale)), max(s, round(h * scale))),
                             Image.BICUBIC)
            w, h = img.size
            left, top = (w - s) // 2, (h - s) // 2
            img = img.crop((left, top, left + s, top + s))
            arr = np.asarray(img, np.float32) / 255.0
            arr = (arr - self.MEAN) / self.STD
            out.append(arr.transpose(2, 0, 1))
        return np.stack(out)


class DataLoader:
    """Deterministic batching over a map-style dataset with a collate_fn."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        seed: int = 0,
        collate_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.seed = seed
        self.epoch = 0
        self.collate_fn = collate_fn or getattr(dataset, "collate_fn", None) or _default_collate

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        for start in range(0, end, bs):
            idx = order[start : start + bs]
            real = len(idx)
            if real < bs and self.pad_last:
                idx = np.concatenate([idx, np.repeat(idx[-1:], bs - real)])
            samples = [self.dataset[int(i)] for i in idx]
            batch = self.collate_fn(samples)
            batch["_real_count"] = real
            yield batch


def _default_collate(samples: List[dict]) -> dict:
    keys = samples[0].keys()
    out = {}
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out
