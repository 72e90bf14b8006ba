"""Engine tests: sharded exact search vs NumPy brute force, save/load,
encode_corpus — all over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.engine import (
    TokenIndex,
    Searcher,
    encode_corpus,
    search_exhaustive,
)
from reranking_multimodal_retrievers_tpu.parallel import make_mesh


def brute_force(Q, D, M, k, return_totals=False):
    scores = np.einsum("bqd,nld->bnlq", Q.astype(np.float32), D.astype(np.float32))
    scores = np.where(M[None, :, :, None].astype(bool), scores, -9999.0)
    totals = scores.max(axis=2).sum(axis=-1)  # [B, N]
    idx = np.argsort(-totals, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(totals, idx, axis=1)
    if return_totals:
        return vals, idx, totals
    return vals, idx


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    N, L_d, L_q, dim, B = 100, 12, 8, 16, 4
    D = rng.normal(size=(N, L_d, dim)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    lens = rng.integers(2, L_d + 1, size=N)
    M = (np.arange(L_d)[None] < lens[:, None])
    D *= M[:, :, None]
    Q = rng.normal(size=(B, L_q, dim)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    ids = [f"doc_{i}" for i in range(N)]
    return Q, D, M, ids


def _check_topk(got_vals, got_idx, want_vals, want_idx, totals, tol=5e-2):
    """Scores must match at EVERY rank, and every returned index must be
    the oracle's index at that rank unless the swap is explained by a
    near-tie: the oracle score of the doc we returned must be within tol
    of the oracle score at that rank (bf16 accumulation can legitimately
    reorder docs whose fp32 scores are this close — random data makes
    exact ties measure-zero, so a misaligned-shard-offset bug cannot
    hide behind this allowance)."""
    got_vals, got_idx = np.asarray(got_vals), np.asarray(got_idx)
    np.testing.assert_allclose(got_vals, want_vals, rtol=tol, atol=tol)
    for b, r in zip(*np.nonzero(got_idx != np.asarray(want_idx))):
        oracle_score_of_got = totals[b, got_idx[b, r]]
        assert abs(oracle_score_of_got - want_vals[b, r]) <= tol, (
            f"rank {r} of query {b}: returned doc {got_idx[b, r]} "
            f"(oracle score {oracle_score_of_got:.4f}) is not a near-tie "
            f"with oracle rank score {want_vals[b, r]:.4f}")


def test_search_single_device(corpus):
    Q, D, M, ids = corpus
    index = TokenIndex.from_arrays(D, M, ids, mesh=None)
    vals, idx = search_exhaustive(index, jnp.asarray(Q), k=10, chunk=32)
    want_vals, want_idx, totals = brute_force(Q, D, M, 10, return_totals=True)
    _check_topk(vals, idx, want_vals, want_idx, totals)
    # top-1 should agree exactly (no ties in random data)
    np.testing.assert_array_equal(idx[:, 0], want_idx[:, 0])


def test_search_sharded_8dev(corpus):
    Q, D, M, ids = corpus
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    index = TokenIndex.from_arrays(D, M, ids, mesh=mesh)
    assert index.num_padded_docs % 8 == 0
    vals, idx = search_exhaustive(index, jnp.asarray(Q), k=10, chunk=8)
    want_vals, want_idx, totals = brute_force(Q, D, M, 10, return_totals=True)
    _check_topk(vals, idx, want_vals, want_idx, totals)
    np.testing.assert_array_equal(idx[:, 0], want_idx[:, 0])


def test_padding_docs_never_win(corpus):
    Q, D, M, ids = corpus
    mesh = make_mesh()
    index = TokenIndex.from_arrays(D, M, ids, mesh=mesh)
    _, idx = search_exhaustive(index, jnp.asarray(Q), k=50, chunk=8)
    assert (idx < len(ids)).all()


def test_searcher_maps_ids(corpus):
    Q, D, M, ids = corpus
    index = TokenIndex.from_arrays(D, M, ids, mesh=None)
    searcher = Searcher(index, k=5, chunk=32)
    got_ids, vals = searcher.search(jnp.asarray(Q))
    want_vals, want_idx = brute_force(Q, D, M, 5)
    assert got_ids[0][0] == f"doc_{want_idx[0, 0]}"
    assert len(got_ids) == Q.shape[0] and len(got_ids[0]) == 5


def test_index_save_load_roundtrip(corpus, tmp_path):
    Q, D, M, ids = corpus
    index = TokenIndex.from_arrays(D, M, ids, mesh=None)
    index.save(str(tmp_path / "idx"))
    loaded = TokenIndex.load(str(tmp_path / "idx"))
    assert loaded.doc_ids == ids
    v1, i1 = search_exhaustive(index, jnp.asarray(Q), k=5, chunk=32)
    v2, i2 = search_exhaustive(loaded, jnp.asarray(Q), k=5, chunk=32)
    np.testing.assert_array_equal(i1[:, 0], i2[:, 0])
    np.testing.assert_allclose(v1, v2, rtol=1e-2, atol=1e-2)


def test_encode_corpus(corpus):
    Q, D, M, ids = corpus

    def fake_encoder(batch):
        return batch["emb"], batch["mask"]

    batches = [
        {"emb": jnp.asarray(D[i : i + 25]), "mask": jnp.asarray(M[i : i + 25])}
        for i in range(0, 100, 25)
    ]
    index = encode_corpus(fake_encoder, batches, ids, mesh=None)
    assert index.num_docs == 100
    vals, idx = search_exhaustive(index, jnp.asarray(Q), k=3, chunk=25)
    want_vals, want_idx = brute_force(Q, D, M, 3)
    np.testing.assert_array_equal(idx[:, 0], want_idx[:, 0])
