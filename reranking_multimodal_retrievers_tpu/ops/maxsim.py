"""Late-interaction (ColBERT-style) MaxSim scoring, TPU-native.

Semantics mirror the reference implementation
(`src/models/flmr/models/flmr/flmr_utils.py:22-48` — ``colbert_score`` /
``colbert_score_reduce`` — and the packed CPU kernel
`src/models/flmr/models/flmr/segmented_maxsim.cpp:49-97`), re-designed for
XLA: static shapes, masked einsums feeding the MXU, ``segment_max`` instead of
a pthreads kernel over packed storage.

Conventions
-----------
Q : [num_queries, L_q, dim]     query token embeddings (masked rows are zero)
D : [num_docs,    L_d, dim]     doc token embeddings (padded)
D_mask : [num_docs, L_d]        1/True for valid doc tokens

A masked *doc* token must never win the per-query-token max: its score is
replaced with ``MASK_FILL_VALUE`` (−9999, matching the reference, not −inf —
reference `flmr_utils.py:27`). A masked *query* token has a zero embedding, so
its best match scores 0 and contributes nothing to the sum — the same implicit
behavior as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_FILL_VALUE = -9999.0


def colbert_score_reduce(scores_padded: jax.Array, d_mask: jax.Array):
    """Reduce a padded token-score tensor to per-doc scores.

    Args:
      scores_padded: [num_docs, L_d, L_q] similarity of every (doc token,
        query token) pair.
      d_mask: [num_docs, L_d] (or [num_docs, L_d, 1]) validity of doc tokens.

    Returns:
      (scores, scores_masked): ``scores`` is [num_docs] — per doc, the sum
      over query tokens of the max over valid doc tokens. ``scores_masked`` is
      the [num_docs, L_d, L_q] tensor with masked doc-token rows filled, which
      downstream consumers (attention fusion) reuse, matching the reference's
      second return value.
    """
    if d_mask.ndim == 3:
        d_mask = d_mask[..., 0]
    valid = d_mask.astype(bool)[:, :, None]  # [num_docs, L_d, 1]
    scores_masked = jnp.where(valid, scores_padded, MASK_FILL_VALUE)
    per_query_token_max = jnp.max(scores_masked, axis=1)  # [num_docs, L_q]
    return jnp.sum(per_query_token_max, axis=-1), scores_masked


def flipr_score_reduce(
    scores_padded: jax.Array,
    d_mask: jax.Array,
    query_maxlen: int,
    K2: int = 8,
):
    """The FLIPR interaction (Baleen) — reference
    `third_party/ColBERT/colbert/modeling/colbert.py:246-263`: instead of
    summing every query token's best match, keep the top ``K1 =
    query_maxlen // 2`` per-token maxima over the first ``query_maxlen``
    (question) columns plus the top ``K2`` over the remaining (context/fact
    expansion) columns. Static top-k — XLA-friendly.

    Returns (scores [num_docs], scores_masked) like
    :func:`colbert_score_reduce`.
    """
    if d_mask.ndim == 3:
        d_mask = d_mask[..., 0]
    assert scores_padded.shape[-1] >= query_maxlen, (
        "flipr needs at least query_maxlen query columns",
        scores_padded.shape, query_maxlen,
    )
    valid = d_mask.astype(bool)[:, :, None]
    scores_masked = jnp.where(valid, scores_padded, MASK_FILL_VALUE)
    per_tok = jnp.max(scores_masked, axis=1)  # [num_docs, L_q]
    K1 = query_maxlen // 2
    A = jnp.sum(jax.lax.top_k(per_tok[:, :query_maxlen], K1)[0], axis=-1)
    rest = per_tok.shape[1] - query_maxlen
    # faithful reference quirk (`colbert.py:258-260`): when the expansion
    # block is shorter than K2, it contributes NOTHING (B stays 0) — the
    # reference does not fall back to top-min(K2, rest)
    if K2 <= rest:
        A = A + jnp.sum(jax.lax.top_k(per_tok[:, query_maxlen:], K2)[0], axis=-1)
    return A, scores_masked


def colbert_score(Q: jax.Array, D_padded: jax.Array, d_mask: jax.Array,
                  interaction: str = "colbert", query_maxlen: int = 32,
                  K2: int = 8):
    """MaxSim score of query matrices against (aligned) document matrices.

    Q is [1, L_q, dim] (score one query against all docs) or
    [num_docs, L_q, dim] (aligned pairs), exactly as the reference
    (`flmr_utils.py:33-48`). ``interaction`` dispatches the reduction — the
    engine settings vocabulary's ``interaction: 'colbert' | 'flipr'``
    (`colbert/infra/config/settings.py:110`, reduce at
    `colbert/modeling/colbert.py:246-263`).

    Returns (scores [num_docs], scores_masked [num_docs, L_d, L_q]).
    """
    assert Q.ndim == 3 and D_padded.ndim == 3
    assert interaction in ("colbert", "flipr"), interaction
    # D @ Q^T with fp32 accumulation on the MXU.
    scores = jax.lax.dot_general(
        D_padded,
        Q.astype(D_padded.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))) if Q.shape[0] != 1 else (((2,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if Q.shape[0] == 1:
        # dot_general without batch dims gives [num_docs, L_d, 1, L_q]
        scores = scores.reshape(D_padded.shape[0], D_padded.shape[1], Q.shape[1])
    if interaction == "flipr":
        return flipr_score_reduce(scores, d_mask, query_maxlen, K2)
    return colbert_score_reduce(scores, d_mask)


def in_batch_maxsim_scores(Q: jax.Array, D: jax.Array, d_mask: jax.Array):
    """All-pairs MaxSim score matrix for in-batch-negative training.

    Equivalent to the reference ``compute_ib_loss_new`` score construction
    (`modeling_flmr.py:1093-1105`): every query scored against every document
    in the (possibly cross-chip-gathered) batch.

    Args:
      Q: [B_q, L_q, dim]
      D: [B_d, L_d, dim]
      d_mask: [B_d, L_d]

    Returns:
      [B_q, B_d] score matrix (fp32).
    """
    if d_mask.ndim == 3:
        d_mask = d_mask[..., 0]
    # [B_q, B_d, L_d, L_q]
    scores = jnp.einsum(
        "qld,btd->qbtl",
        Q.astype(jnp.float32),
        D.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    # einsum axes: q=query, l=L_q, b=doc batch, t=L_d → result [q, b, t, l]
    valid = d_mask.astype(bool)[None, :, :, None]
    scores = jnp.where(valid, scores, MASK_FILL_VALUE)
    per_query_token_max = jnp.max(scores, axis=2)  # max over doc tokens → [q, b, l]
    return jnp.sum(per_query_token_max, axis=-1)  # [q, b]


def padded_maxsim(scores_padded: jax.Array, d_mask: jax.Array):
    """Per-doc MaxSim totals from a padded [num_docs, L_d, L_q] score tensor."""
    scores, _ = colbert_score_reduce(scores_padded, d_mask)
    return scores


def segmented_maxsim(packed_scores: jax.Array, doclens: jax.Array, num_docs: int):
    """TPU-native equivalent of the reference's packed CPU kernel.

    The reference JIT-compiles `segmented_maxsim.cpp` (pthreads) to reduce a
    packed [total_doc_tokens, L_q] score matrix with per-doc lengths into
    per-doc scores (`segmented_maxsim.cpp:49-97`). On TPU we express the same
    reduction as ``jax.ops.segment_max`` + sum, which XLA lowers to efficient
    scatter-reductions; ``num_docs`` must be static.

    Args:
      packed_scores: [total_doc_tokens, L_q]
      doclens: [num_docs] int32 token counts per document (sum ≤ total tokens;
        trailing packed rows beyond ``sum(doclens)`` are ignored).
      num_docs: static number of documents.

    Returns:
      [num_docs] per-doc scores.
    """
    total = packed_scores.shape[0]
    ends = jnp.cumsum(doclens)
    token_idx = jnp.arange(total)
    # segment id of each packed row: number of ends <= idx
    seg_ids = jnp.searchsorted(ends, token_idx, side="right")
    valid = seg_ids < num_docs
    seg_ids = jnp.where(valid, seg_ids, num_docs)  # dump overflow in a trash segment
    data = jnp.where(valid[:, None], packed_scores, MASK_FILL_VALUE)
    per_doc_max = jax.ops.segment_max(
        data, seg_ids, num_segments=num_docs + 1, indices_are_sorted=True
    )[:num_docs]
    # docs with zero length: segment_max returns -inf; zero them like an empty sum
    per_doc_max = jnp.where(doclens[:, None] > 0, per_doc_max, 0.0)
    return jnp.sum(per_doc_max, axis=-1)
