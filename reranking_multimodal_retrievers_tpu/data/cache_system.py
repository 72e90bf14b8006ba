"""Disk cache for pipeline node outputs.

Parity with the reference cache system
(`runway_for_ml/utils/cache_system.py:100-186`): HF ``datasets`` objects are
saved with their native arrow format, everything else with pickle; dummy-data
runs cache under a separate subdirectory so they never pollute real caches
(`runway_for_ml/data_module/data_pipeline.py:42-43`).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any


def _is_hf_dataset(obj) -> bool:
    try:
        import datasets

        return isinstance(obj, (datasets.Dataset, datasets.DatasetDict))
    except ImportError:
        return False


def cache_data_to_disk(data: Any, name: str, cache_dir: str) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    if _is_hf_dataset(data):
        path = os.path.join(cache_dir, name + ".hf")
        data.save_to_disk(path)
        return path
    path = os.path.join(cache_dir, name + ".pkl")
    # tmp + atomic rename: a write interrupted by OOM/preemption must not
    # leave a truncated pickle that cache_exists() would treat as valid
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".pkl.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def load_data_from_disk(name: str, cache_dir: str):
    hf_path = os.path.join(cache_dir, name + ".hf")
    if os.path.isdir(hf_path):
        import datasets

        try:
            return datasets.load_from_disk(hf_path)
        except Exception:
            return datasets.DatasetDict.load_from_disk(hf_path)
    pkl_path = os.path.join(cache_dir, name + ".pkl")
    if os.path.exists(pkl_path):
        with open(pkl_path, "rb") as f:
            return pickle.load(f)
    return None


def cache_exists(name: str, cache_dir: str) -> bool:
    return os.path.isdir(os.path.join(cache_dir, name + ".hf")) or os.path.exists(
        os.path.join(cache_dir, name + ".pkl")
    )


def dummy_scoped_path(path: str) -> str:
    """Redirect a side-artifact path into the dummy cache namespace.

    Dataset cache entries are already dummy-isolated (``cache/dummy/...``,
    mirroring the reference's split at `data_pipeline.py:42-43`), but
    transforms that write SIDE artifacts to config-fixed paths (synthetic
    vocab files, key images) would otherwise clobber the real artifacts when
    a ``--use_dummy_data`` run regenerates them with dummy-sized content —
    silently invalidating every checkpoint trained against the real vocab.
    ``cache/X/y`` maps to ``cache/dummy/X/y``; any other path is placed under
    ``cache/dummy/`` verbatim (minus a leading separator).
    """
    # Normalize so every spelling of the same cache path ('cache/x',
    # './cache/x', '/abs/cwd/cache/x') redirects identically (ADVICE r3):
    # a generator and a consumer that spell the path differently must not
    # end up with two different dummy locations.
    norm = os.path.normpath(path)
    if os.path.isabs(norm):
        rel = os.path.relpath(norm, os.getcwd())
        if not rel.startswith(".."):
            norm = rel
    norm = norm.replace(os.sep, "/")
    if norm.startswith("cache/"):
        rest = norm[len("cache/"):]
        if rest.startswith("dummy/"):
            return path
        return os.path.join("cache", "dummy", rest)
    return os.path.join("cache", "dummy", norm.lstrip("/"))
