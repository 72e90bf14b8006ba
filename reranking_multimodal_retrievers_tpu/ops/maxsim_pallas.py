"""Fused MaxSim scoring kernel (Pallas/TPU).

The hot op of both retrieval and late-interaction reranking: for query token
matrices Q and a corpus/candidate block D, compute per-(query, doc) MaxSim
totals. The XLA path (`ops.maxsim`) materializes the [B, C, L_d, L_q] token
-score tensor in HBM between the matmul and the max/sum reductions; this
kernel keeps each block's scores in VMEM and reduces in-place — one HBM read
per D tile, one [B, C] write.

Tiling: grid over (doc blocks, query blocks). Each program loads
``D[C_blk, L_d, dim]`` and ``Q[B_blk, L_q, dim]`` tiles into VMEM, runs the
MXU contraction ``[C_blk·L_d, dim] × [dim, B_blk·L_q]``, masks invalid doc
tokens with −9999 (reference semantics, `flmr_utils.py:27`), max-reduces over
doc tokens and sum-reduces over query tokens.

Used by the engine when ``use_pallas=True``; falls back to the jnp path on
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .maxsim import MASK_FILL_VALUE


def _maxsim_kernel(q_ref, d_ref, m_ref, out_ref, *, B_blk, C_blk, L_q, L_d, dim):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[...].reshape(B_blk * L_q, dim)
    d = d_ref[...].reshape(C_blk * L_d, dim)
    # [C_blk*L_d, B_blk*L_q] in fp32 on the MXU
    scores = jax.lax.dot_general(
        d, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores.reshape(C_blk, L_d, B_blk, L_q)
    # additive mask (fp32 broadcast; Mosaic cannot reshape i1 vectors)
    bias = jnp.where(m_ref[...], 0.0, MASK_FILL_VALUE)  # [C_blk, L_d]
    scores = scores + bias[:, :, None, None]
    per_tok = jnp.max(scores, axis=1)  # [C_blk, B_blk, L_q]
    totals = jnp.sum(per_tok, axis=-1)  # [C_blk, B_blk]
    # out block is (1, 1, B_blk, C_blk): trailing dims cover the full array
    # dims (TPU lowering requires trailing block dims 8/128-aligned or full)
    out_ref[0, 0, :, :] = totals.T


@functools.partial(
    jax.jit, static_argnames=("B_blk", "C_blk", "interpret")
)
def maxsim_scores_pallas(
    Q: jax.Array,
    D: jax.Array,
    mask: jax.Array,
    B_blk: int = 8,
    C_blk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """All-pairs MaxSim totals.

    Args:
      Q: [B, L_q, dim] (bf16/f32), zero rows for masked query tokens.
      D: [N, L_d, dim] padded doc embeddings.
      mask: [N, L_d] bool doc-token validity.
      B_blk/C_blk: tile sizes (B % B_blk == 0, N % C_blk == 0 required).

    Returns:
      [B, N] fp32 score matrix.
    """
    from jax.experimental import pallas as pl

    B, L_q, dim = Q.shape
    N, L_d, _ = D.shape
    assert B % B_blk == 0 and N % C_blk == 0, (B, B_blk, N, C_blk)

    kernel = functools.partial(
        _maxsim_kernel, B_blk=B_blk, C_blk=C_blk, L_q=L_q, L_d=L_d, dim=dim
    )
    grid = (N // C_blk, B // B_blk)
    out4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_blk, L_q, dim), lambda c, b: (b, 0, 0)),
            pl.BlockSpec((C_blk, L_d, dim), lambda c, b: (c, 0, 0)),
            pl.BlockSpec((C_blk, L_d), lambda c, b: (c, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, B_blk, C_blk), lambda c, b: (c, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (N // C_blk, B // B_blk, B_blk, C_blk), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * L_d * L_q * dim,
            bytes_accessed=(
                B * L_q * dim * Q.dtype.itemsize
                + N * L_d * dim * D.dtype.itemsize
                + B * N * 4
            ),
            transcendentals=0,
        ),
    )(Q, D, mask)
    # [n_c, n_b, B_blk, C_blk] → [B, N]
    return jnp.moveaxis(out4, 0, 2).reshape(B, N)
