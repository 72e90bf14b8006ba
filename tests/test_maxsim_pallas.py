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
    # additive masking: all-masked docs land at ≈ −9999·L_q (± raw scores)
    np.testing.assert_allclose(got[:, 2], -9999.0 * 4, atol=50.0)
