"""Beyond-HBM streaming retrieval (`engine/streaming.py`): the slab-streamed
exact scan must agree with the in-HBM exhaustive path (`engine/search.py`)
— same scores, same doc ranking — including partial final slabs, per-token
masks, the int8 host index, and memmapped on-disk indexes."""

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.engine import (
    HostQuantizedTokenIndex,
    HostTokenIndex,
    StreamingSearcher,
    TokenIndex,
    search_exhaustive,
)


def _corpus(n=200, L=12, dim=32, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, L, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    if masked:
        lens = rng.integers(4, L + 1, size=n)
        mask = np.arange(L)[None, :] < lens[:, None]
        emb = np.where(mask[..., None], emb, 0.0)
    else:
        mask = None
    ids = [f"d{i}" for i in range(n)]
    return emb.astype(np.float16), mask, ids


def _queries(b=5, Lq=8, dim=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, Lq, dim)).astype(np.float32)


@pytest.mark.parametrize("slab_docs", [64, 80, 200, 512])
def test_streamed_matches_in_hbm_exact(slab_docs):
    emb, mask, ids = _corpus()
    Q = _queries()
    ref_index = TokenIndex.from_arrays(emb, mask, ids)
    ref_vals, ref_idx = search_exhaustive(ref_index, Q, k=10)

    host = HostTokenIndex(embeddings=emb, mask=mask, doc_ids=ids)
    s = StreamingSearcher(host, k=10, slab_docs=slab_docs, use_pallas=False)
    vals, idx = s.search(Q)
    # same ranking and (bf16-rounded either way) same scores
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=2e-2, atol=2e-2)


def test_streamed_unmasked_corpus_and_ids():
    emb, _, ids = _corpus(n=150, masked=False)
    Q = _queries(b=3)
    ref_index = TokenIndex.from_arrays(
        emb, np.ones(emb.shape[:2], bool), ids)
    ref_vals, ref_idx = search_exhaustive(ref_index, Q, k=7)

    host = HostTokenIndex(embeddings=emb, mask=None, doc_ids=ids)
    s = StreamingSearcher(host, k=7, slab_docs=64, use_pallas=False)
    got_ids, vals = s.search_ids(Q)
    want_ids = [[ids[j] for j in row] for row in ref_idx]
    assert got_ids == want_ids
    np.testing.assert_allclose(vals, ref_vals, rtol=2e-2, atol=2e-2)


def test_streamed_int8_matches_in_hbm_int8():
    from reranking_multimodal_retrievers_tpu.engine import (
        QuantizedTokenIndex,
    )

    emb, mask, ids = _corpus(n=160)
    Q = _queries(b=4)
    ref_index = QuantizedTokenIndex.from_arrays(emb, mask, ids)
    ref_vals, ref_idx = search_exhaustive(ref_index, Q, k=10)

    host = HostQuantizedTokenIndex.from_host_index(
        HostTokenIndex(embeddings=emb, mask=mask, doc_ids=ids),
        slab_docs=64)
    # identical quantization: codes/scales must match the in-HBM index
    np.testing.assert_array_equal(
        host.codes, np.asarray(ref_index.codes)[:160])
    np.testing.assert_allclose(
        host.scales, np.asarray(ref_index.scales)[:160], rtol=1e-6)

    s = StreamingSearcher(host, k=10, slab_docs=64, use_pallas=False)
    vals, idx = s.search(Q)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)


def test_streamed_from_saved_index_memmap(tmp_path):
    emb, mask, ids = _corpus(n=96)
    Q = _queries(b=2)
    ref_index = TokenIndex.from_arrays(emb, mask, ids)
    ref_vals, ref_idx = search_exhaustive(ref_index, Q, k=5)
    ref_index.save(str(tmp_path / "idx"))

    host = HostTokenIndex.load(str(tmp_path / "idx"), mmap=True)
    assert isinstance(host.embeddings, np.memmap)
    s = StreamingSearcher(host, k=5, slab_docs=40, use_pallas=False)
    vals, idx = s.search(Q)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=2e-2, atol=2e-2)


def test_k_larger_than_corpus():
    emb, mask, ids = _corpus(n=24)
    Q = _queries(b=2)
    host = HostTokenIndex(embeddings=emb, mask=mask, doc_ids=ids)
    s = StreamingSearcher(host, k=40, slab_docs=16, use_pallas=False)
    vals, idx = s.search(Q)
    assert vals.shape == (2, 40)
    # exactly num_docs real entries per row, the rest -inf/-1
    for row_v, row_i in zip(vals, idx):
        real = row_i >= 0
        assert real.sum() == 24
        assert np.all(np.isneginf(row_v[~real]))
        assert len(set(row_i[real].tolist())) == 24
