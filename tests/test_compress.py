"""Training-free token pooling (engine/compress.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.engine.compress import (
    pool_doc_tokens, pool_index,
)
from reranking_multimodal_retrievers_tpu.engine.index import TokenIndex
from reranking_multimodal_retrievers_tpu.engine.search import search_exhaustive


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


def _corpus(N=64, L=16, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    # each doc = a few "topic" directions repeated with noise, so pooling
    # has real cluster structure to find
    topics = _unit(rng.normal(size=(N, 4, dim)))
    emb = np.stack([
        t[rng.integers(0, 4, size=L)] + 0.1 * rng.normal(size=(L, dim))
        for t in topics
    ])
    emb = _unit(emb).astype(np.float32)
    mask = np.ones((N, L), bool)
    mask[:, L - 3:] = False  # padding tail
    return emb, mask


def test_pool_shapes_and_unit_norm():
    emb, mask = _corpus()
    pooled, pmask = pool_doc_tokens(jnp.asarray(emb), jnp.asarray(mask),
                                    factor=2, iters=4)
    assert pooled.shape == (64, 8, 32) and pmask.shape == (64, 8)
    p = np.asarray(pooled)
    norms = np.linalg.norm(p, axis=-1)
    valid = np.asarray(pmask)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-3)
    # padded-away slots are zeroed
    assert np.abs(p[~valid]).max() == 0.0
    # every pooled doc keeps at least one valid slot
    assert valid.any(axis=1).all()


def test_pooled_search_preserves_ranking():
    """The compression contract: queries planted from a specific doc's
    tokens must still retrieve that doc at the top of the pooled index."""
    emb, mask = _corpus(N=128, L=16, dim=32, seed=1)
    ids = [f"d{i}" for i in range(128)]
    full = TokenIndex.from_arrays(emb, mask, ids)
    pooled = pool_index(full, factor=2, iters=5)
    assert pooled.embeddings.shape[1] == 8

    rng = np.random.default_rng(2)
    targets = list(range(0, 32, 4))
    # query tokens = noisy copies of the target doc's valid tokens
    Q = np.stack([
        _unit(emb[t, :8] + 0.05 * rng.normal(size=(8, 32)))
        for t in targets
    ]).astype(np.float32)
    _, idx_full = search_exhaustive(full, jnp.asarray(Q), k=5)
    _, idx_pool = search_exhaustive(pooled, jnp.asarray(Q), k=5)
    # exact index puts the planted doc first; the pooled index keeps it in
    # the top-5 for the vast majority of queries
    assert all(idx_full[i][0] == t for i, t in enumerate(targets))
    hits = sum(t in idx_pool[i] for i, t in enumerate(targets))
    assert hits >= len(targets) - 1, (hits, len(targets))


def test_pool_index_batched_matches_whole():
    emb, mask = _corpus(N=32, L=8, dim=32, seed=3)
    ids = [f"d{i}" for i in range(32)]
    full = TokenIndex.from_arrays(emb, mask, ids)
    a = pool_index(full, factor=2, iters=3)
    b = pool_index(full, factor=2, iters=3, batch=8)
    np.testing.assert_allclose(
        np.asarray(a.embeddings, np.float32),
        np.asarray(b.embeddings, np.float32), atol=2e-2)


def test_pooling_composes_with_int8_index():
    """pool_index → QuantizedTokenIndex: 2× fewer tokens × int8 bytes (4×
    total memory cut vs bf16 unpooled), ranking still usable."""
    import numpy as np

    from reranking_multimodal_retrievers_tpu.engine.index import (
        QuantizedTokenIndex, TokenIndex,
    )
    from reranking_multimodal_retrievers_tpu.engine.compress import pool_index
    from reranking_multimodal_retrievers_tpu.engine.search import (
        search_exhaustive,
    )

    rng = np.random.default_rng(0)
    N, Ld, dim = 48, 8, 32
    emb = rng.normal(size=(N, Ld, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    mask = np.ones((N, Ld), bool)
    ids = [f"d{i}" for i in range(N)]
    full = TokenIndex.from_arrays(emb, mask, ids)

    pooled = pool_index(full, factor=2)
    q8 = QuantizedTokenIndex.from_token_index(pooled)
    assert q8.doc_maxlen == Ld // 2
    assert q8.codes.dtype.name == "int8"

    # self-retrieval: each doc's own tokens as the query must rank itself #1
    Q = emb[:4, :6]
    _, idx_fp = search_exhaustive(full, Q, k=3)
    _, idx_q8 = search_exhaustive(q8, Q, k=3)
    assert np.array_equal(idx_fp[:, 0], np.arange(4))
    assert np.array_equal(idx_q8[:, 0], np.arange(4))
