"""CLI entry point.

Parity with the reference `src/main.py:20-224`: ``--config`` (jsonnet/json/py)
+ ``--mode prepare_data|train|test|eval`` + dot-path ``--opts`` overrides +
``--use_dummy_data``; user modules named in the config are imported so their
registries populate.

Usage:
  python -m reranking_multimodal_retrievers_tpu.cli.main \
      --config configs/okvqa_flmr.json --mode train \
      --opts train.trainer_paras.max_epochs=1
"""

from __future__ import annotations

import argparse
import logging
import sys


def parse_sys_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native reranking-multimodal-retrievers")
    p.add_argument("--config", required=True, help="path to .json/.py/.jsonnet config")
    p.add_argument("--mode", required=True,
                   choices=["prepare_data", "train", "test", "eval"])
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--use_dummy_data", action="store_true")
    p.add_argument("--reset", action="store_true",
                   help="wipe the experiment folder before running")
    p.add_argument("--n_devices", type=int, default=None,
                   help="mesh size (defaults to all devices)")
    p.add_argument("--opts", nargs="*", default=[],
                   help="dot-path overrides: a.b.c=value")
    return p.parse_args(argv)


def build_config(args):
    from ..utils.config_system import apply_opts, import_user_modules, load_config

    config = load_config(args.config)
    apply_opts(config, args.opts)
    config.set_path("mode", args.mode)
    if args.experiment_name:
        config.set_path("meta.experiment_name", args.experiment_name)
    import_user_modules(config.get_path("meta.user_modules", []))
    return config


def _apply_platform_env():
    """Honor ``RMRT_PLATFORM`` (e.g. ``cpu``) by re-asserting it through
    ``jax.config`` before any device is created. A dedicated variable rather
    than ``JAX_PLATFORMS`` because on builds where a plugin's registration
    wins over the env var (the TPU tunnel image exports an ambient
    ``JAX_PLATFORMS`` that cannot be overridden by env alone),
    ``jax.config.update`` is the only reliable switch — and reading the
    ambient variable here would clobber an in-process choice such as the
    test suite's CPU mesh."""
    import os

    plat = os.environ.get("RMRT_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # already initialized — leave the live platform
            pass

    # Persistent XLA compilation cache: CLI runs are dominated by the first
    # jit of the train/eval programs (minutes through the TPU tunnel's remote
    # compile service); caching compiled executables on disk makes repeated
    # experiment launches near-instant to warm up. Same mechanism the test
    # suite uses (tests/conftest.py). Opt out with RMRT_COMPILE_CACHE=0.
    if os.environ.get("RMRT_COMPILE_CACHE", "1") != "0":
        import jax

        cache_dir = os.environ.get(
            "RMRT_COMPILE_CACHE_DIR",
            os.path.join("cache", "jax_compile_cache"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.2)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:  # read-only FS or pre-initialized config
            pass


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    _apply_platform_env()
    args = parse_sys_args(argv)
    config = build_config(args)

    # side-effect imports: register executors and data ops
    from .. import executors  # noqa: F401
    from ..data import ops  # noqa: F401

    if args.mode == "prepare_data":
        from ..data.pipeline import DataPipeline

        dp = DataPipeline(
            config.data_pipeline,
            use_dummy_data=args.use_dummy_data,
            global_config=config,
        )
        outputs = dp.apply_transforms()
        print(f"prepared {len(outputs)} output nodes: {list(outputs)}")
        return 0

    mesh = None
    if args.n_devices and args.n_devices > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=args.n_devices)

    from ..executors.experiment import Experiment

    exp = Experiment(config, use_dummy_data=args.use_dummy_data, mesh=mesh,
                     reset=args.reset)
    if args.mode == "train":
        exp.train()
    elif args.mode == "test":
        results = exp.test()
        print("test metrics:", dict(results.metrics))
    elif args.mode == "eval":
        results = exp.eval()
        print("eval metrics:", dict(results.metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
