"""Pallas fused MaxSim kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.ops.maxsim import in_batch_maxsim_scores
from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import maxsim_scores_pallas


@pytest.mark.parametrize("B,N,L_q,L_d,dim,B_blk,C_blk", [
    (4, 16, 8, 16, 32, 2, 4),
    (2, 8, 16, 8, 16, 2, 8),
])
def test_pallas_matches_reference(B, N, L_q, L_d, dim, B_blk, C_blk):
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(B, L_q, dim)).astype(np.float32)
    D = rng.normal(size=(N, L_d, dim)).astype(np.float32)
    lens = rng.integers(1, L_d + 1, size=N)
    mask = np.arange(L_d)[None] < lens[:, None]
    D = D * mask[:, :, None]

    want = np.asarray(
        in_batch_maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask))
    )
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask),
            B_blk=B_blk, C_blk=C_blk, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_all_masked_doc():
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(2, 4, 16)).astype(np.float32)
    D = rng.normal(size=(4, 8, 16)).astype(np.float32)
    mask = np.ones((4, 8), bool)
    mask[2] = False
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask),
            B_blk=2, C_blk=4, interpret=True,
        )
    )
    # the kernel masks with an ADDITIVE −9999 bias (not a where-replace), so
    # for an all-masked doc the exact value is sum_q max_t (raw - 9999) —
    # assert it exactly rather than with a loose band
    raw = np.einsum("qld,td->qtl", Q, D[2])  # [B, L_d, L_q]
    expected = (raw - 9999.0).max(axis=1).sum(axis=1)
    np.testing.assert_allclose(got[:, 2], expected, rtol=1e-5)
    # and valid docs are exact vs the XLA reference
    want = np.asarray(
        in_batch_maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask))
    )
    valid = [0, 1, 3]
    np.testing.assert_allclose(got[:, valid], want[:, valid], rtol=1e-4, atol=1e-4)
    # masked docs can never win
    assert (got[:, 2:3] < got[:, valid] - 1000).all()
