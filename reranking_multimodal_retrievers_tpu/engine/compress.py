"""Training-free token pooling for the HBM-resident token index.

The multi-vector compression technique of the retrieved literature
(PAPERS.md: "Visual RAG Toolkit — training-free pooling"; also ColBERTv2-era
cluster pooling): merge each document's token embeddings into ``L_d/factor``
pooled vectors by per-doc spherical k-means, shrinking the index (and the
exact-search FLOPs) by ``factor`` at a small recall cost. Complements the
int8 residual codec (`engine/codec.py`) — pooling cuts *tokens*, the codec
cuts *bytes per token*; they compose.

TPU-native: one jitted program, k-means vmapped over the whole corpus as a
batched einsum+argmax+segment-mean loop (``lax.fori_loop``), everything
static-shape. Centroids are L2-renormalized each round so pooled MaxSim
stays a dot product of unit vectors like the unpooled index.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .index import TokenIndex


@functools.partial(jax.jit, static_argnames=("factor", "iters"))
def pool_doc_tokens(emb: jax.Array, mask: jax.Array, factor: int = 2,
                    iters: int = 4):
    """Pool each doc's tokens into ``L_d // factor`` unit-norm vectors.

    Args:
      emb: [N, L_d, dim] (bf16/f32) L2-normalized token embeddings.
      mask: [N, L_d] bool token validity.
      factor: pooling factor (L_d must divide).
      iters: spherical k-means refinement rounds.

    Returns:
      (pooled [N, L_p, dim] same dtype, pooled_mask [N, L_p] bool)
    """
    N, L, dim = emb.shape
    assert L % factor == 0, f"factor {factor} must divide doc length {L}"
    L_p = L // factor
    x = emb.astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]          # [N, L, 1]
    xm = x * m

    # strided init keeps positional spread; renormalize to the sphere
    cent = x[:, ::factor, :]

    def norm(c):
        n = jnp.linalg.norm(c, axis=-1, keepdims=True)
        return c / jnp.maximum(n, 1e-6)

    cent = norm(cent)

    def round_(_, cent):
        sim = jnp.einsum("nld,npd->nlp", x, cent)     # cosine on the sphere
        sim = jnp.where(mask[..., None], sim, -jnp.inf)
        assign = jnp.argmax(sim, axis=-1)             # [N, L]
        onehot = jax.nn.one_hot(assign, L_p, dtype=jnp.float32) * m
        sums = jnp.einsum("nlp,nld->npd", onehot, xm)
        counts = jnp.sum(onehot, axis=1)[..., None]   # [N, L_p, 1]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cent)
        return norm(new)

    cent = jax.lax.fori_loop(0, iters, round_, cent)

    # final assignment for the validity of each pooled slot
    sim = jnp.einsum("nld,npd->nlp", x, cent)
    sim = jnp.where(mask[..., None], sim, -jnp.inf)
    assign = jnp.argmax(sim, axis=-1)
    onehot = jax.nn.one_hot(assign, L_p, dtype=jnp.float32) * m
    counts = jnp.sum(onehot, axis=1)                  # [N, L_p]
    pooled_mask = counts > 0
    # recompute the mean of the final assignment (cent lags one E-step)
    sums = jnp.einsum("nlp,nld->npd", onehot, xm)
    pooled = jnp.where(counts[..., None] > 0,
                       sums / jnp.maximum(counts[..., None], 1.0), 0.0)
    pooled = norm(pooled) * pooled_mask[..., None]
    return pooled.astype(emb.dtype), pooled_mask


def pool_index(index: TokenIndex, factor: int = 2, iters: int = 4,
               batch: Optional[int] = None) -> TokenIndex:
    """A pooled copy of a :class:`TokenIndex` (``factor``× fewer doc tokens).

    ``batch`` bounds the per-call working set ([batch, L, L_p] similarity
    tensors) for large corpora; defaults to the whole index."""
    emb, mask = index.embeddings, index.mask
    N = emb.shape[0]
    if batch is None or batch >= N:
        pooled, pmask = pool_doc_tokens(emb, mask, factor=factor, iters=iters)
        pooled, pmask = np.asarray(jax.device_get(pooled)), np.asarray(
            jax.device_get(pmask))
    else:
        outs, masks = [], []
        for s in range(0, N, batch):
            p, pm = pool_doc_tokens(emb[s : s + batch], mask[s : s + batch],
                                    factor=factor, iters=iters)
            outs.append(np.asarray(jax.device_get(p)))
            masks.append(np.asarray(jax.device_get(pm)))
        pooled, pmask = np.concatenate(outs), np.concatenate(masks)
    return TokenIndex.from_arrays(pooled, pmask, index.doc_ids,
                                  mesh=index.mesh)
