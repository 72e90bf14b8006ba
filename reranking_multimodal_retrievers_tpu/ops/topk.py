"""Top-k selection over (sharded) score vectors.

Replaces the reference's heap-based C++ candidate pruning
(`third_party/ColBERT/colbert/search/filter_pids.cpp:126-168`). Two paths:

- :func:`top_k_scores` — ``jax.lax.top_k``, which XLA lowers to a tournament
  sort; right up to a few hundred K columns.
- :func:`tiled_top_k` — two-stage selection for corpus-scale score rows:
  tile the axis into T tiles, take a per-tile top-k (T parallel small sorts
  on the VPU), then a final top-k over the T·k survivors. Exact (every true
  top-k element is its tile's top-k), with O(N log k) work instead of the
  single large sort, and a memory profile that keeps each tile's sort in
  VMEM. The same shape the PLAID engine uses for candidate pruning
  (`engine/plaid.py`), exposed as a standalone op.
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


def tiled_top_k(scores: jax.Array, k: int, tile: int = 4096):
    """Exact two-stage top-k along the last axis for very large N.

    Args:
      scores: [..., N] (N need not divide ``tile`` — the tail is padded with
        -inf, whose indices can never win).
      k: static number of results.
      tile: tile width for the first stage.

    Returns:
      (values [..., k], indices [..., k]) — indices into the ORIGINAL axis.
    """
    N = scores.shape[-1]
    k = min(k, N)
    if N <= tile:
        return jax.lax.top_k(scores, k)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        fill = jnp.full(scores.shape[:-1] + (pad,), -jnp.inf, scores.dtype)
        scores = jnp.concatenate([scores, fill], axis=-1)
    tiled = scores.reshape(scores.shape[:-1] + (n_tiles, tile))
    kk = min(k, tile)
    vals, idx = jax.lax.top_k(tiled, kk)  # [..., n_tiles, kk]
    base = (jnp.arange(n_tiles) * tile)[:, None]
    gidx = idx + base  # indices into the original axis
    flat_vals = vals.reshape(vals.shape[:-2] + (n_tiles * kk,))
    flat_idx = gidx.reshape(gidx.shape[:-2] + (n_tiles * kk,))
    fvals, fpos = jax.lax.top_k(flat_vals, k)
    findex = jnp.take_along_axis(flat_idx, fpos, axis=-1)
    return fvals, findex
