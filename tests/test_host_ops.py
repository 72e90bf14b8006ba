"""Native host-runtime ops vs NumPy oracles (and that the native lib builds)."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.ops.host_ops import (
    native_available,
    segmented_maxsim_host,
    segmented_lookup_host,
    top_k_host,
    pack_bits_host,
    unpack_bits_host,
)


def test_native_library_builds():
    assert native_available(), "g++ build of native/host_ops.cpp failed"


def test_segmented_maxsim_host():
    rng = np.random.default_rng(0)
    doclens = np.array([3, 0, 5, 2], np.int32)
    scores = rng.normal(size=(10, 7)).astype(np.float32)
    got = segmented_maxsim_host(scores, doclens)
    want = np.zeros(4, np.float32)
    off = 0
    for i, l in enumerate(doclens):
        if l:
            want[i] = scores[off : off + l].max(axis=0).sum()
        off += l
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_segmented_maxsim_host_empty_candidate_set():
    # n_docs == 0 must return an empty array, not SIGFPE in the native
    # thread-chunking division.
    got = segmented_maxsim_host(
        np.zeros((0, 7), np.float32), np.zeros((0,), np.int32))
    assert got.shape == (0,)


def test_segmented_lookup_host():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(20, 4)).astype(np.float32)
    offsets = np.array([0, 10, 5], np.int64)
    lengths = np.array([3, 2, 4], np.int32)
    got = segmented_lookup_host(src, offsets, lengths)
    want = np.concatenate([src[0:3], src[10:12], src[5:9]])
    np.testing.assert_array_equal(got, want)


def test_top_k_host():
    rng = np.random.default_rng(2)
    scores = rng.normal(size=1000).astype(np.float32)
    got = top_k_host(scores, 10)
    want = np.argsort(-scores)[:10]
    np.testing.assert_array_equal(got, want)


def test_bit_packing_roundtrip():
    rng = np.random.default_rng(3)
    bits = (rng.random(37) > 0.5).astype(np.uint8)
    packed = pack_bits_host(bits)
    assert packed.shape == (5,)
    np.testing.assert_array_equal(unpack_bits_host(packed, 37), bits)
    np.testing.assert_array_equal(packed, np.packbits(bits))
