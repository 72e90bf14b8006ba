"""K-means in pure JAX — the FAISS replacement.

The reference trains centroids with ``faiss.Kmeans`` on a sampled token set
(`third_party/ColBERT/colbert/indexing/collection_indexer.py:455-474`). Here
Lloyd iterations run as one jitted program: cosine assignment via an MXU
matmul + ``segment_sum`` centroid updates; empty clusters re-seeded from the
data. Also provides the reference's partition-count heuristic
(`collection_indexer.py:105-124`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def num_partitions_heuristic(num_embeddings_estimate: int) -> int:
    """2^⌊log2(16·√E)⌋ (reference `collection_indexer.py:105-124`)."""
    return 2 ** int(math.floor(math.log2(16 * math.sqrt(max(num_embeddings_estimate, 1)))))


@functools.partial(jax.jit, static_argnames=("k", "n_iters"))
def kmeans(x: jax.Array, init: jax.Array, k: int, n_iters: int = 20):
    """Lloyd's algorithm on L2-normalized vectors (cosine distance).

    Args:
      x: [n, d] fp32 (rows should be L2-normalized, as late-interaction
        embeddings are).
      init: [k, d] initial centroids (e.g. a random sample of x).

    Returns:
      (centroids [k, d] L2-normalized, assignments [n] int32).
    """
    n, d = x.shape

    def step(carry, _):
        centroids = carry
        scores = jnp.einsum("nd,kd->nk", x, centroids,
                            preferred_element_type=jnp.float32)
        assign = jnp.argmax(scores, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign,
                                     num_segments=k)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # re-seed empty clusters from the data (rotated rows for determinism)
        reseed = x[jnp.arange(k) % n]
        new_c = jnp.where(counts[:, None] > 0, new_c, reseed)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        new_c = new_c / jnp.maximum(norms, 1e-12)
        return new_c, None

    centroids, _ = jax.lax.scan(step, init, None, length=n_iters)
    final_scores = jnp.einsum("nd,kd->nk", x, centroids,
                              preferred_element_type=jnp.float32)
    return centroids, jnp.argmax(final_scores, axis=1).astype(jnp.int32)


def train_centroids(sample: np.ndarray, k: int, n_iters: int = 20, seed: int = 0):
    """Host wrapper: pick random init rows, run jitted Lloyd iterations."""
    if len(sample) == 0:
        raise ValueError("train_centroids: empty sample")
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    init = sample[idx]
    if len(init) < k:  # degenerate case: tile until the [k, d] carry is full
        reps = -(-k // len(init))  # ceil
        init = np.concatenate([init] * reps)[:k]
    c, a = kmeans(jnp.asarray(sample, jnp.float32), jnp.asarray(init, jnp.float32),
                  k=k, n_iters=n_iters)
    return np.asarray(c), np.asarray(a)
