"""Top-k selection over (sharded) score vectors.

Replaces the reference's heap-based C++ candidate pruning
(`third_party/ColBERT/colbert/search/filter_pids.cpp:126-168`) with
``jax.lax.top_k``, which XLA lowers to an efficient tournament sort on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_scores(scores: jax.Array, k: int):
    """Top-k values and indices along the last axis.

    Args:
      scores: [..., num_docs]
      k: static number of results.

    Returns:
      (values [..., k], indices [..., k]).
    """
    k = min(k, scores.shape[-1])
    return jax.lax.top_k(scores, k)
