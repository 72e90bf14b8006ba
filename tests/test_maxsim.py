"""Unit tests for the MaxSim scoring core against NumPy oracles.

Oracle semantics follow the reference `flmr_utils.py:22-48` (masking with
−9999, max over doc tokens, sum over query tokens) and the packed kernel
`segmented_maxsim.cpp:49-97`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.ops import (
    colbert_score,
    colbert_score_reduce,
    in_batch_maxsim_scores,
    segmented_maxsim,
    top_k_scores,
)


def numpy_colbert_score(Q, D, D_mask):
    """Oracle mirroring torch `colbert_score` + `colbert_score_reduce`."""
    if Q.shape[0] == 1:
        Q = np.broadcast_to(Q, (D.shape[0], Q.shape[1], Q.shape[2]))
    scores = np.einsum("btd,bld->btl", D, Q)  # [n_docs, L_d, L_q]
    scores = np.where(D_mask[:, :, None].astype(bool), scores, -9999.0)
    return scores.max(axis=1).sum(axis=-1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_batch(rng, n_docs=5, L_d=17, L_q=9, dim=8):
    Q = rng.normal(size=(n_docs, L_q, dim)).astype(np.float32)
    D = rng.normal(size=(n_docs, L_d, dim)).astype(np.float32)
    lens = rng.integers(1, L_d + 1, size=n_docs)
    D_mask = (np.arange(L_d)[None, :] < lens[:, None]).astype(np.int32)
    D = D * D_mask[:, :, None]
    return Q, D, D_mask


def test_colbert_score_aligned(rng):
    Q, D, D_mask = make_batch(rng)
    got, _ = colbert_score(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(D_mask))
    want = numpy_colbert_score(Q, D, D_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_colbert_score_one_query_vs_all(rng):
    Q, D, D_mask = make_batch(rng)
    Q1 = Q[:1]
    got, _ = colbert_score(jnp.asarray(Q1), jnp.asarray(D), jnp.asarray(D_mask))
    want = numpy_colbert_score(Q1, D, D_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_masked_query_tokens_contribute_zero(rng):
    """Zeroed query rows must add exactly 0 (reference implicit behavior)."""
    Q, D, D_mask = make_batch(rng)
    Q_zeroed = Q.copy()
    Q_zeroed[:, -3:, :] = 0.0
    got, _ = colbert_score(jnp.asarray(Q_zeroed), jnp.asarray(D), jnp.asarray(D_mask))
    want_trunc = numpy_colbert_score(Q_zeroed[:, :-3], D, D_mask)
    np.testing.assert_allclose(np.asarray(got), want_trunc, rtol=1e-5, atol=1e-5)


def test_score_reduce_returns_masked_tensor(rng):
    Q, D, D_mask = make_batch(rng)
    raw = np.einsum("btd,bld->btl", D, Q)
    scores, masked = colbert_score_reduce(jnp.asarray(raw), jnp.asarray(D_mask))
    masked = np.asarray(masked)
    assert (masked[~D_mask.astype(bool)] == -9999.0).all()
    np.testing.assert_allclose(
        np.asarray(scores), numpy_colbert_score(Q, D, D_mask), rtol=1e-5, atol=1e-5
    )


def test_in_batch_maxsim_scores(rng):
    B_q, B_d, L_q, L_d, dim = 3, 6, 5, 11, 8
    Q = rng.normal(size=(B_q, L_q, dim)).astype(np.float32)
    D = rng.normal(size=(B_d, L_d, dim)).astype(np.float32)
    lens = rng.integers(1, L_d + 1, size=B_d)
    D_mask = (np.arange(L_d)[None, :] < lens[:, None]).astype(np.int32)
    got = np.asarray(in_batch_maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(D_mask)))
    want = np.zeros((B_q, B_d), np.float32)
    for i in range(B_q):
        want[i] = numpy_colbert_score(Q[i : i + 1], D, D_mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_segmented_maxsim_matches_padded(rng):
    """Packed reduction == padded reduction (the C++ kernel's contract)."""
    n_docs, L_q = 4, 6
    doclens = np.array([3, 1, 5, 2], np.int32)
    total = int(doclens.sum()) + 3  # trailing garbage rows must be ignored
    packed = rng.normal(size=(total, L_q)).astype(np.float32)

    got = np.asarray(
        segmented_maxsim(jnp.asarray(packed), jnp.asarray(doclens), n_docs)
    )
    want = np.zeros(n_docs, np.float32)
    off = 0
    for i, l in enumerate(doclens):
        want[i] = packed[off : off + l].max(axis=0).sum()
        off += l
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segmented_maxsim_zero_length_doc(rng):
    doclens = np.array([2, 0, 3], np.int32)
    packed = rng.normal(size=(5, 4)).astype(np.float32)
    got = np.asarray(segmented_maxsim(jnp.asarray(packed), jnp.asarray(doclens), 3))
    assert got[1] == 0.0
    np.testing.assert_allclose(got[0], packed[:2].max(axis=0).sum(), rtol=1e-5)
    np.testing.assert_allclose(got[2], packed[2:5].max(axis=0).sum(), rtol=1e-5)


def test_top_k(rng):
    scores = rng.normal(size=(100,)).astype(np.float32)
    vals, idx = top_k_scores(jnp.asarray(scores), 7)
    order = np.argsort(-scores)[:7]
    np.testing.assert_allclose(np.asarray(vals), scores[order], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), order)


def test_tiled_top_k_exact():
    import numpy as np
    import jax.numpy as jnp
    from reranking_multimodal_retrievers_tpu.ops.topk import tiled_top_k, top_k_scores

    rng = np.random.default_rng(0)
    scores = rng.normal(size=(3, 10_000)).astype(np.float32)
    want_v, want_i = top_k_scores(jnp.asarray(scores), 17)
    got_v, got_i = tiled_top_k(jnp.asarray(scores), 17, tile=1024)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # non-divisible tail
    got_v2, got_i2 = tiled_top_k(jnp.asarray(scores[:, :9_999]), 17, tile=1000)
    want_v2, want_i2 = top_k_scores(jnp.asarray(scores[:, :9_999]), 17)
    np.testing.assert_allclose(np.asarray(got_v2), np.asarray(want_v2))
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i2))


def test_flipr_score_reduce_matches_reference_semantics():
    """FLIPR interaction (`colbert/modeling/colbert.py:246-263`): top-K1 of
    the question columns + top-K2 of the expansion columns."""
    import numpy as np
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.ops.maxsim import (
        MASK_FILL_VALUE, flipr_score_reduce,
    )

    rng = np.random.default_rng(0)
    num_docs, L_d, qlen, extra = 5, 16, 8, 12
    L_q = qlen + extra
    scores = rng.normal(size=(num_docs, L_d, L_q)).astype(np.float32)
    mask = (rng.random((num_docs, L_d)) > 0.3)
    mask[:, 0] = True  # at least one valid token per doc
    got, _ = flipr_score_reduce(jnp.asarray(scores), jnp.asarray(mask),
                                query_maxlen=qlen, K2=4)
    # numpy oracle
    s = scores.copy()
    s[~mask] = MASK_FILL_VALUE
    per_tok = s.max(axis=1)
    K1 = qlen // 2
    a = np.sort(per_tok[:, :qlen], axis=-1)[:, -K1:].sum(-1)
    b = np.sort(per_tok[:, qlen:], axis=-1)[:, -4:].sum(-1)
    np.testing.assert_allclose(np.asarray(got), a + b, rtol=1e-6)


def test_flipr_no_expansion_columns():
    import numpy as np
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.ops.maxsim import flipr_score_reduce

    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
    mask = jnp.ones((3, 8), bool)
    got, _ = flipr_score_reduce(scores, mask, query_maxlen=8, K2=8)
    per_tok = np.asarray(scores).max(axis=1)
    want = np.sort(per_tok, axis=-1)[:, -4:].sum(-1)  # K1 only, K2 > rest
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
