"""Fused MaxSim scoring kernel (Pallas/TPU).

The hot op of both retrieval and late-interaction reranking: for query token
matrices Q and a corpus/candidate block D, compute per-(query, doc) MaxSim
totals. The XLA path (`ops.maxsim`) materializes the per-chunk token-score
tensor in HBM between the matmul and the max/sum reductions; this kernel
keeps each block's scores in VMEM and reduces in place — one HBM read per D
tile, one [B_blk, C_blk] write.

Mosaic-friendly structure (several lowering constraints shaped this):
- the doc-token validity mask is passed as a pre-flattened additive fp32 bias
  ``[N·L_d, 1]`` (i1 vectors cannot be reshaped, trailing singleton
  broadcasts don't lower);
- the sum over query tokens runs on the MXU as a matmul with a block-summing
  0/1 matrix instead of a 4D reshape+reduce;
- the output is written as full-block ``[..., C_blk, B_blk]`` tiles (trailing
  block dims must be 8/128-aligned or cover the whole axis).

Masking semantics: additive −9999 bias (reference `flmr_utils.py:27`) — for a
doc with at least one valid token the totals are exact; fully-masked (pure
padding) docs float at ≈ −9999·L_q and never win.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .maxsim import MASK_FILL_VALUE


def _maxsim_kernel(q_ref, d_ref, bias_ref, out_ref, *, B_blk, C_blk, L_q, L_d,
                   dim, score_dtype=jnp.float32):
    q = q_ref[...].reshape(B_blk * L_q, dim)
    d = d_ref[...].reshape(C_blk * L_d, dim)
    # [C_blk*L_d, B_blk*L_q] on the MXU (Mosaic requires a 32-bit matmul
    # accumulator, so the dot emits fp32; the cast narrows the bias/max
    # passes — the VPU work that bounds this kernel at retrieval shapes)
    scores = jax.lax.dot_general(
        d, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(score_dtype)
    if bias_ref is not None:
        scores = scores + bias_ref[...].astype(score_dtype)  # [rows, 1] mask
    scores = scores.reshape(C_blk, L_d, B_blk * L_q)
    per_tok = jnp.max(scores, axis=1)  # [C_blk, B_blk*L_q]
    # sum over each query's L_q columns via a 0/1 block-summing matmul
    # (fp32 accumulate — only the per-token maxima are ever bf16)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B_blk * L_q, B_blk), 0) // L_q
    cols = jax.lax.broadcasted_iota(jnp.int32, (B_blk * L_q, B_blk), 1)
    summer = (rows == cols).astype(score_dtype)
    totals = jax.lax.dot_general(
        per_tok, summer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C_blk, B_blk]
    out_ref[0, 0, :, :] = totals


@functools.partial(
    jax.jit, static_argnames=("B_blk", "C_blk", "interpret", "score_dtype")
)
def maxsim_scores_pallas(
    Q: jax.Array,
    D: jax.Array,
    mask: Optional[jax.Array] = None,
    B_blk: int = 8,
    C_blk: int = 8,
    interpret: bool = False,
    score_dtype=jnp.float32,
) -> jax.Array:
    """All-pairs MaxSim totals.

    Args:
      Q: [B, L_q, dim] (bf16/f32), zero rows for masked query tokens.
      D: [N, L_d, dim] padded doc embeddings.
      mask: [N, L_d] bool doc-token validity, or None for an unpadded corpus
        (every doc exactly L_d real tokens — e.g. the fixed-length serving
        index): skips the bias operand and its VPU pass over the score block.
      B_blk/C_blk: tile sizes (B % B_blk == 0, N % C_blk == 0 required).
      score_dtype: element type of the in-VMEM token-score block. The MXU
        accumulates fp32 either way and the final per-query sum is fp32;
        ``jnp.bfloat16`` halves the VPU traffic of the mask/max passes (the
        kernel's bound at retrieval shapes) at ~0.4% worst-case total error
        (96 maxima quantized to 8-bit mantissa) — max() itself is exact in
        any monotone rounding.

    Returns:
      [B, N] fp32 score matrix.
    """
    from jax.experimental import pallas as pl

    B, L_q, dim = Q.shape
    N, L_d, _ = D.shape
    assert B % B_blk == 0 and N % C_blk == 0, (B, B_blk, N, C_blk)

    # corpora past ~2^23 total doc tokens must be scanned in slabs by the
    # caller (engine/search._local_search does) — one flattened bias operand
    # that large breaks the lowering and the whole-corpus program OOMs HBM
    assert N * L_d <= (1 << 23), (
        f"maxsim_scores_pallas: {N}×{L_d} doc tokens exceed the single-call "
        "limit; scan over doc slabs (see engine/search._local_search)"
    )

    kernel = functools.partial(
        _maxsim_kernel, B_blk=B_blk, C_blk=C_blk, L_q=L_q, L_d=L_d, dim=dim,
        score_dtype=jnp.dtype(score_dtype),
    )
    grid = (N // C_blk, B // B_blk)
    in_specs = [
        pl.BlockSpec((B_blk, L_q, dim), lambda c, b: (b, 0, 0)),
        pl.BlockSpec((C_blk, L_d, dim), lambda c, b: (c, 0, 0)),
    ]
    args = [Q, D]
    if mask is not None:
        bias = jnp.where(mask, 0.0, MASK_FILL_VALUE).astype(jnp.float32)
        args.append(bias.reshape(N * L_d, 1))
        in_specs.append(pl.BlockSpec((C_blk * L_d, 1), lambda c, b: (c, 0)))
    else:
        masked_kernel = kernel
        kernel = lambda q_ref, d_ref, out_ref: masked_kernel(
            q_ref, d_ref, None, out_ref)
    out4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, C_blk, B_blk), lambda c, b: (c, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (N // C_blk, B // B_blk, C_blk, B_blk), jnp.float32
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
    )(*args)
    # [n_c, n_b, C_blk, B_blk] → [B, N]
    return jnp.transpose(out4, (1, 3, 0, 2)).reshape(B, N)


def _maxsim_kernel_int8(q_ref, qs_ref, d_ref, ds_ref, bias_ref, out_ref, *,
                        B_blk, C_blk, L_q, L_d, dim):
    q = q_ref[...].reshape(B_blk * L_q, dim)
    d = d_ref[...].reshape(C_blk * L_d, dim)
    # s8×s8→s32 on the MXU's double-rate integer path (the whole point)
    scores = jax.lax.dot_general(
        d, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [C_blk*L_d, B_blk*L_q] int32
    if bias_ref is not None:
        scores = scores + bias_ref[...]  # int32 [rows, 1] mask bias
    per_tok = jnp.max(scores.reshape(C_blk, L_d, B_blk * L_q), axis=1)
    # rescale AFTER the max: the per-QUERY-token scale is constant over doc
    # tokens, so it folds into the block-summing matmul's 0/1 matrix; the
    # per-DOC scale is constant over query tokens too, so it multiplies the
    # final [C_blk, B_blk] tile. The big [C·L_d, B·L_q] block never leaves
    # int32 — bias add + max run as integer VPU ops (no cast pass at all,
    # cheaper than the bf16 kernel's cast+bias+max).
    rows = jax.lax.broadcasted_iota(jnp.int32, (B_blk * L_q, B_blk), 0) // L_q
    cols = jax.lax.broadcasted_iota(jnp.int32, (B_blk * L_q, B_blk), 1)
    summer = jnp.where(rows == cols, qs_ref[...], 0.0)  # [B_blk*L_q, B_blk]
    totals = jax.lax.dot_general(
        per_tok.astype(jnp.float32), summer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C_blk, B_blk]
    out_ref[0, 0, :, :] = totals * ds_ref[...]


@functools.partial(
    jax.jit, static_argnames=("B_blk", "C_blk", "interpret")
)
def maxsim_scores_pallas_int8(
    Qq: jax.Array,
    q_scales: jax.Array,
    Dq: jax.Array,
    d_scales: jax.Array,
    mask: Optional[jax.Array] = None,
    B_blk: int = 8,
    C_blk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """All-pairs MaxSim totals over an int8-quantized index (W8A8 retrieval).

    Same contract as :func:`maxsim_scores_pallas` but both sides are int8 and
    the MXU accumulates int32 at its double rate. The doc side uses ONE scale
    per document (`engine/index.QuantizedTokenIndex` — tokens are
    L2-normalized so per-doc symmetric scales stay tight), which is what lets
    every rescale happen after the token-max instead of on the
    [C·L_d, B·L_q] score block.

    Args:
      Qq: [B, L_q, dim] int8 query codes (zero rows for masked tokens).
      q_scales: [B, L_q] fp32 per-query-token scales (codes·scale ≈ values).
      Dq: [N, L_d, dim] int8 doc codes.
      d_scales: [N] fp32 per-doc scales.
      mask: [N, L_d] bool doc-token validity, or None for an unpadded corpus.

    Returns:
      [B, N] fp32 score matrix ≈ the fp MaxSim of the dequantized operands.
    """
    from jax.experimental import pallas as pl

    B, L_q, dim = Qq.shape
    N, L_d, _ = Dq.shape
    assert Qq.dtype == jnp.int8 and Dq.dtype == jnp.int8, (Qq.dtype, Dq.dtype)
    assert B % B_blk == 0 and N % C_blk == 0, (B, B_blk, N, C_blk)
    assert N * L_d <= (1 << 23), (
        f"maxsim_scores_pallas_int8: {N}×{L_d} doc tokens exceed the "
        "single-call limit; scan over doc slabs (engine/search)"
    )

    kernel = functools.partial(
        _maxsim_kernel_int8, B_blk=B_blk, C_blk=C_blk, L_q=L_q, L_d=L_d,
        dim=dim,
    )
    grid = (N // C_blk, B // B_blk)
    in_specs = [
        pl.BlockSpec((B_blk, L_q, dim), lambda c, b: (b, 0, 0)),
        pl.BlockSpec((B_blk * L_q, 1), lambda c, b: (b, 0)),
        pl.BlockSpec((C_blk, L_d, dim), lambda c, b: (c, 0, 0)),
        pl.BlockSpec((C_blk, 1), lambda c, b: (c, 0)),
    ]
    args = [Qq, q_scales.astype(jnp.float32).reshape(B * L_q, 1), Dq,
            d_scales.astype(jnp.float32).reshape(N, 1)]
    if mask is not None:
        # int32 additive bias: −2²⁵ dominates any |acc| ≤ 127²·dim (≈2²¹ at
        # dim 128) without overflow, so fully-masked docs never win — the
        # integer analogue of the fp −9999 convention (`flmr_utils.py:27`)
        bias = jnp.where(mask, 0, -(1 << 25)).astype(jnp.int32)
        args.append(bias.reshape(N * L_d, 1))
        in_specs.append(pl.BlockSpec((C_blk * L_d, 1), lambda c, b: (c, 0)))
    else:
        masked_kernel = kernel
        kernel = lambda q_ref, qs_ref, d_ref, ds_ref, out_ref: masked_kernel(
            q_ref, qs_ref, d_ref, ds_ref, None, out_ref)
    out4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, C_blk, B_blk), lambda c, b: (c, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (N // C_blk, B // B_blk, C_blk, B_blk), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * L_d * L_q * dim,
            bytes_accessed=(
                B * L_q * dim + N * L_d * dim + B * N * 4
            ),
            transcendentals=0,
        ),
    )(*args)
    return jnp.transpose(out4, (1, 3, 0, 2)).reshape(B, N)


def run_maxsim_benchmark(
    B: int = 128,
    N: int = 8192,
    L_q: int = 128,
    L_d: int = 128,
    dim: int = 128,
    B_blk: int = 16,
    C_blk: int = 16,
) -> float:
    """Time the fused kernel on the current default device; returns TFLOPS.

    Timing uses a dependency-chained ``lax.scan`` slope (long − short) so the
    axon tunnel's early-ack and per-call host round-trip both cancel.
    """
    import time

    rng = jax.random.PRNGKey(0)
    kq, kd = jax.random.split(rng)
    Q = jax.random.normal(kq, (B, L_q, dim), jnp.bfloat16)
    D = jax.random.normal(kd, (N, L_d, dim), jnp.bfloat16)
    mask = jnp.ones((N, L_d), bool)

    @functools.partial(jax.jit, static_argnames="iters")
    def chain(Q, D, iters):
        def body(q, _):
            scores = maxsim_scores_pallas(q, D, mask, B_blk=B_blk, C_blk=C_blk)
            q = q + (scores.sum() * 1e-12).astype(jnp.int32).astype(q.dtype)
            return q, scores[0, 0]

        _, s = jax.lax.scan(body, Q, None, length=iters)
        return s[-1]

    n_long, n_short = 8, 2
    float(chain(Q, D, iters=n_short))  # compile
    float(chain(Q, D, iters=n_long))

    def timed(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(Q, D, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(n_long) - timed(n_short)) / (n_long - n_short)
    flops = 2 * B * N * L_d * L_q * dim
    return flops / dt / 1e12
