"""Two-stage compressed search — the PLAID-role approximate path.

The reference's PLAID pipeline (centroid pruning → IVF candidate generation →
residual decompression → exact MaxSim,
`third_party/ColBERT/colbert/search/index_storage.py:86-184`) exists because
GPU memory can't hold full-precision token embeddings for large corpora. The
TPU-native equivalent keeps the *two-stage* structure but replaces sparse
IVF gathers (hostile to XLA) with dense staged scoring:

  stage 1: exact MaxSim over the COMPRESSED index (centroid + int8 residual,
           decompression fused into the scoring matmul) → top-``n_candidates``
  stage 2: gather those candidates' compressed tokens, decompress at fp32,
           exact MaxSim re-score → final top-k

Stage 1 touches ~2-3.5× less HBM than the fp16 exhaustive path; stage 2 costs
O(B·n_candidates) instead of O(B·N).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.maxsim import MASK_FILL_VALUE
from .codec import CompressedTokenIndex


@functools.partial(jax.jit,
                   static_argnames=("n_candidates", "k", "chunk",
                                    "stage1_bf16"))
def _two_stage_search(Q, codes, residuals, centroids, scales, mask,
                      n_candidates: int, k: int, chunk: int,
                      stage1_bf16: bool = True):
    B = Q.shape[0]
    N, L_d = codes.shape

    def chunk_scores(carry, blk):
        c_codes, c_res, c_mask = blk  # [C, L_d], [C, L_d, dim], [C, L_d]
        D = centroids[c_codes] + c_res.astype(jnp.float32) * scales  # fused
        # stage 1 only PICKS candidates — bf16 contraction (fp32 accumulate)
        # rides the MXU's double-rate path; stage 2 re-scores the winners at
        # fp32 exactly, so the final scores/order are unaffected for any
        # candidate that stage 1 keeps (recall pinned in the bench/tests)
        if stage1_bf16:
            s = jnp.einsum("bqd,cld->bclq", Q.astype(jnp.bfloat16),
                           D.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            s = jnp.einsum("bqd,cld->bclq", Q.astype(jnp.float32), D,
                           preferred_element_type=jnp.float32)
        s = jnp.where(c_mask[None, :, :, None], s, MASK_FILL_VALUE)
        return carry, jnp.sum(jnp.max(s, axis=2), axis=-1)

    n_chunks = N // chunk
    blocks = (
        codes.reshape(n_chunks, chunk, L_d),
        residuals.reshape(n_chunks, chunk, L_d, -1),
        mask.reshape(n_chunks, chunk, L_d),
    )
    _, per_chunk = jax.lax.scan(chunk_scores, None, blocks)
    stage1 = jnp.moveaxis(per_chunk, 0, 1).reshape(B, N)

    # stage-1 scores are only used to pick candidates; stage 2 re-scores
    _, cand_ids = jax.lax.top_k(stage1, n_candidates)  # [B, n_cand]

    # stage 2: decompress candidates at fp32 and re-score exactly
    c_codes = codes[cand_ids]  # [B, n_cand, L_d]
    c_res = residuals[cand_ids]
    c_mask = mask[cand_ids]
    D = centroids[c_codes] + c_res.astype(jnp.float32) * scales
    s = jnp.einsum("bqd,bcld->bclq", Q.astype(jnp.float32), D,
                   preferred_element_type=jnp.float32)
    s = jnp.where(c_mask[:, :, :, None], s, MASK_FILL_VALUE)
    stage2 = jnp.sum(jnp.max(s, axis=2), axis=-1)  # [B, n_cand]

    vals, pos = jax.lax.top_k(stage2, k)
    ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    return vals, ids


class CompressedSearcher:
    """Search a :class:`CompressedTokenIndex` (PLAID-role two-stage)."""

    def __init__(self, index: CompressedTokenIndex, k: int = 100,
                 n_candidates: int = 1024, chunk: int = 256,
                 stage1_bf16: bool = True):
        self.index = index
        self.k = k
        N = index.codes.shape[0]
        self.n_candidates = min(n_candidates, N)
        c = min(chunk, N)
        while N % c:
            c -= 1
        self.chunk = c
        self.stage1_bf16 = stage1_bf16

    def search(self, Q) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.index
        vals, ids = _two_stage_search(
            jnp.asarray(Q), idx.codes, idx.residuals, idx.centroids,
            idx.scales, idx.mask,
            n_candidates=self.n_candidates,
            k=min(self.k, self.n_candidates),
            chunk=self.chunk,
            stage1_bf16=self.stage1_bf16,
        )
        return np.asarray(vals), np.asarray(ids)
