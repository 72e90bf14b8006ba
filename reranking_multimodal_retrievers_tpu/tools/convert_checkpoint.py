"""Checkpoint conversion CLI.

Parity with `tools/convert_flmr_original_checkpoint_to_pytorch.py` and the
HF-hub upload helpers: converts a torch ``FLMRModelForRetrieval`` checkpoint
directory (safetensors/bin) into this framework's orbax parameter tree, and
back-exports orbax params to a flat ``.npz`` for interop.

Usage:
  python -m reranking_multimodal_retrievers_tpu.tools.convert_checkpoint \
      --torch_dir /path/to/PreFLMR_ViT-B --out_dir ./flmr_jax \
      --config configs/okvqa_flmr.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def convert_torch_to_jax(torch_dir: str, out_dir: str, config_path: str) -> str:
    import jax
    import orbax.checkpoint as ocp

    from ..executors.flmr_executor import flmr_config_from
    from ..models.hf_bridge import flmr_params, load_torch_checkpoint_dir
    from ..utils.config_system import load_config

    config = load_config(config_path)
    flmr_config = flmr_config_from(config.get_path("model_config"))
    sd = load_torch_checkpoint_dir(torch_dir)
    params = flmr_params(sd, flmr_config)
    os.makedirs(out_dir, exist_ok=True)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(out_dir, "params")),
        jax.tree_util.tree_map(np.asarray, params),
    )
    import dataclasses

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(flmr_config), f, default=str)
    return out_dir


def export_npz(params_dir: str, out_path: str) -> str:
    import jax
    import orbax.checkpoint as ocp

    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(params_dir))
    flat = {}

    def visit(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)

    jax.tree_util.tree_map_with_path(visit, params)
    np.savez(out_path, **flat)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_dir")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--config")
    p.add_argument("--export_npz", help="orbax params dir to export as npz")
    args = p.parse_args(argv)
    if args.export_npz:
        out = export_npz(args.export_npz, args.out_dir)
    else:
        assert args.torch_dir and args.config
        out = convert_torch_to_jax(args.torch_dir, args.out_dir, args.config)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
