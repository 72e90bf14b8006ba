"""ctypes bindings for the native host-runtime library (native/host_ops.cpp).

Builds on first use with g++ (cached under ``native/build``); every function
has a NumPy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "host_ops.cpp"))
    build_dir = os.path.abspath(os.path.join(_NATIVE_DIR, "build"))
    lib_path = os.path.join(build_dir, "libhost_ops.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            os.makedirs(build_dir, exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread", src, "-o", lib_path]
            subprocess.run(cmd, check=True, capture_output=True)
            logger.info("built native host ops: %s", lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.segmented_maxsim.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.segmented_lookup.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.top_k_indices.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pack_bits.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.unpack_bits.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing / build failure → numpy fallback
        logger.warning("native host ops unavailable (%s); using NumPy fallback", e)
        _LIB = None
    return _LIB


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_available() -> bool:
    return _build_and_load() is not None


def segmented_maxsim_host(scores: np.ndarray, doclens: np.ndarray) -> np.ndarray:
    """Per-doc MaxSim totals over packed scores [total_tokens, L_q]."""
    scores = np.ascontiguousarray(scores, np.float32)
    doclens = np.ascontiguousarray(doclens, np.int32)
    n_docs = len(doclens)
    lib = _build_and_load()
    if lib is None:
        out = np.zeros(n_docs, np.float32)
        off = 0
        for i, l in enumerate(doclens):
            if l:
                out[i] = scores[off : off + l].max(axis=0).sum()
            off += l
        return out
    out = np.empty(n_docs, np.float32)
    lib.segmented_maxsim(
        _ptr(scores, ctypes.c_float), _ptr(doclens, ctypes.c_int32),
        n_docs, scores.shape[1], _ptr(out, ctypes.c_float),
    )
    return out


def segmented_lookup_host(src: np.ndarray, offsets: np.ndarray,
                          lengths: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int32)
    total = int(lengths.sum())
    lib = _build_and_load()
    if lib is None:
        return np.concatenate(
            [src[o : o + l] for o, l in zip(offsets, lengths)]
        ) if total else np.zeros((0, src.shape[1]), np.float32)
    out = np.empty((total, src.shape[1]), np.float32)
    lib.segmented_lookup(
        _ptr(src, ctypes.c_float), _ptr(offsets, ctypes.c_int64),
        _ptr(lengths, ctypes.c_int32), len(lengths), src.shape[1],
        _ptr(out, ctypes.c_float),
    )
    return out


def top_k_host(scores: np.ndarray, k: int) -> np.ndarray:
    scores = np.ascontiguousarray(scores, np.float32)
    k = min(k, len(scores))
    lib = _build_and_load()
    if lib is None:
        return np.argsort(-scores, kind="stable")[:k]
    out = np.empty(k, np.int64)
    lib.top_k_indices(_ptr(scores, ctypes.c_float), len(scores), k,
                      _ptr(out, ctypes.c_int64))
    return out


def pack_bits_host(bits: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(bits.astype(np.uint8))
    lib = _build_and_load()
    if lib is None:
        return np.packbits(bits)
    out = np.empty((len(bits) + 7) // 8, np.uint8)
    lib.pack_bits(_ptr(bits, ctypes.c_uint8), len(bits), _ptr(out, ctypes.c_uint8))
    return out


def unpack_bits_host(packed: np.ndarray, n: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint8)
    lib = _build_and_load()
    if lib is None:
        return np.unpackbits(packed)[:n]
    out = np.empty(n, np.uint8)
    lib.unpack_bits(_ptr(packed, ctypes.c_uint8), n, _ptr(out, ctypes.c_uint8))
    return out
