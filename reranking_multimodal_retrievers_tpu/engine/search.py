"""Exact MaxSim search over a sharded token index.

Replaces the ColBERT search stack (candidate generation + centroid pruning +
residual decompression + packed CPU kernels,
`third_party/ColBERT/colbert/search/index_storage.py:86-184`) with one SPMD
program per SURVEY.md §7:

  per shard:  scan over doc chunks → masked einsum (MXU) → per-doc scores
  per shard:  local top-k  (``jax.lax.top_k``)
  cross-shard: all_gather the (k values, global ids) pairs over ICI → final
               top-k, replicated

Wall-clock is dominated by the one big batched matmul — no Python loop over
queries (the reference searches query-by-query, `colbert/searcher.py:82-96`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.maxsim import MASK_FILL_VALUE
from ..parallel.mesh import DATA_AXIS
from .index import TokenIndex


def _chunk_scores(Q: jax.Array, D: jax.Array, M: jax.Array) -> jax.Array:
    """[B, C] MaxSim totals of every query against a chunk of docs."""
    scores = jnp.einsum(
        "bqd,cld->bclq",
        Q,
        D,
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(M[None, :, :, None], scores, MASK_FILL_VALUE)
    return jnp.sum(jnp.max(scores, axis=2), axis=-1)


def _local_search(Q, D, M, *, k: int, chunk: int, use_pallas: bool = False,
                  score_dtype=jnp.float32, unpadded: bool = False):
    """Scores all local docs and returns local top-k.

    ``use_pallas=True`` routes scoring through the fused MaxSim kernel
    (`ops/maxsim_pallas.py` — measured 192 TFLOPS = 97% of v5e bf16 peak vs
    175 for the XLA scan on the 32-query × 3200-doc rerank shape); the XLA
    chunked scan is the portable fallback.

    ``unpadded=True`` (every REAL doc exactly L_d real tokens) drops the
    per-token mask operand from the kernel, and ``score_dtype=jnp.bfloat16``
    halves the VPU bytes of its reduction passes. At the 100k×256 retrieval
    shape with a 128-query batch the kernel sits near the MXU/VPU crossover
    (~76% of the bf16 MXU roofline, measured in `bench.py`
    ``bench_retrieval``; bf16 scores buy only ~4% more there), so the real
    next lever is the int8 path (:func:`_local_search_int8`), which halves
    the MXU time AND cheapens the VPU passes. Whole-padding docs (all-False
    mask rows) are still excluded from top-k via a cheap per-doc pass, so
    the knob is safe on a padded sharded ``TokenIndex``.
    """
    n_local = D.shape[0]
    B = Q.shape[0]
    # the fused kernel needs MXU/VPU-aligned shapes: dim on full lanes,
    # 8-row tiles; anything else (tiny test configs) takes the XLA scan
    pallas_ok = (
        B % 8 == 0
        and n_local % 8 == 0
        and D.shape[2] % 128 == 0
        and D.shape[1] % 8 == 0
        and Q.shape[1] % 8 == 0
    )
    if use_pallas and pallas_ok:
        from ..ops.maxsim_pallas import maxsim_scores_pallas

        maxsim_scores_pallas = functools.partial(
            maxsim_scores_pallas, score_dtype=score_dtype)
        if unpadded:
            M_kernel = None
        else:
            M_kernel = M
        # the per-step score block is [C_blk·L_d, B_blk·L_q] in score_dtype;
        # pick the largest batch tile that keeps it within the VMEM budget
        # (larger corpora / longer docs shrink the tile instead of failing
        # to compile — observed at [100k, 256]×[32, 96] on v5e)
        budget = 6 * 1024 * 1024
        c_blk = 8
        itemsize = jnp.dtype(score_dtype).itemsize
        b_blk = next(
            (b for b in (32, 16, 8)
             if B % b == 0
             and (c_blk * D.shape[1]) * (b * Q.shape[1]) * itemsize <= budget),
            None,
        )
        L_d = D.shape[1]
        # one pallas_call handles ≤ 2^23 total doc tokens; bigger corpora
        # scan the SAME kernel over equal slabs (reshape is free — no copies)
        max_slab = max(c_blk, ((1 << 23) // L_d) // c_blk * c_blk)
        if b_blk is None:
            scores = _xla_chunk_scores(Q, D, M, n_local, chunk)
        elif n_local <= max_slab:
            scores = maxsim_scores_pallas(Q, D, M_kernel, B_blk=b_blk,
                                          C_blk=c_blk)
        else:
            slab = next(
                (s for s in range(max_slab, c_blk - 1, -c_blk)
                 if n_local % s == 0),
                None,
            )
            if slab is None:
                scores = _xla_chunk_scores(Q, D, M, n_local, chunk)
            else:
                Ds = D.reshape(n_local // slab, slab, L_d, D.shape[2])
                xs = (Ds,) if M_kernel is None else (
                    Ds, M_kernel.reshape(n_local // slab, slab, L_d))

                def body(_, dm):
                    d, m = (dm[0], None) if M_kernel is None else dm
                    return None, maxsim_scores_pallas(
                        Q, d, m, B_blk=b_blk, C_blk=c_blk
                    )

                _, per_slab = jax.lax.scan(body, None, xs)
                scores = jnp.moveaxis(per_slab, 0, 1).reshape(B, n_local)
    else:
        scores = _xla_chunk_scores(Q, D, M, n_local, chunk)
    if unpadded:
        # ``unpadded`` skips the per-TOKEN mask, but whole-padding DOCS
        # (all-False mask rows — the doc-axis padding every sharded
        # TokenIndex carries, `engine/index.py`) must still never reach
        # top-k: without this they score exactly 0 and would outrank real
        # docs with negative MaxSim totals. One [N]-bool reduce + [B, N]
        # select is negligible next to the scoring scan.
        scores = jnp.where(jnp.any(M, axis=1)[None, :], scores,
                           MASK_FILL_VALUE * Q.shape[1])
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def _xla_chunk_scores(Q, D, M, n_local, chunk):
    B = Q.shape[0]
    n_chunks = n_local // chunk
    Dc = D.reshape(n_chunks, chunk, D.shape[1], D.shape[2])
    Mc = M.reshape(n_chunks, chunk, M.shape[1])

    def body(_, dm):
        d, m = dm
        return None, _chunk_scores(Q, d, m)

    _, per_chunk = jax.lax.scan(body, None, (Dc, Mc))  # [n_chunks, B, chunk]
    return jnp.moveaxis(per_chunk, 0, 1).reshape(B, n_local)


def _xla_chunk_scores_int8(Qq, qs, Dq, ds, M, n_local, chunk):
    """Portable int8 scoring scan (CPU tests / shapes the kernel rejects).

    Same math as `ops/maxsim_pallas.maxsim_scores_pallas_int8`: s8×s8→s32
    dot, int32 mask bias + token-max, then post-max rescale by the per-doc
    and per-query-token scales.
    """
    B = Qq.shape[0]
    n_chunks = n_local // chunk
    Dc = Dq.reshape(n_chunks, chunk, Dq.shape[1], Dq.shape[2])
    Mc = M.reshape(n_chunks, chunk, M.shape[1])
    dsc = ds.reshape(n_chunks, chunk)
    qs32 = qs.astype(jnp.float32)

    def body(_, dmd):
        d, m, dscale = dmd
        acc = jnp.einsum("bqd,cld->bclq", Qq, d,
                         preferred_element_type=jnp.int32)
        acc = jnp.where(m[None, :, :, None], acc, -(1 << 25))
        per_tok = jnp.max(acc, axis=2).astype(jnp.float32)  # [B, chunk, L_q]
        totals = jnp.einsum("bcq,bq->bc", per_tok, qs32)
        return None, totals * dscale[None, :]

    _, per_chunk = jax.lax.scan(body, None, (Dc, Mc, dsc))
    return jnp.moveaxis(per_chunk, 0, 1).reshape(B, n_local)


def _local_search_int8(Qq, qs, Dq, ds, M, *, k: int, chunk: int,
                       use_pallas: bool = False, unpadded: bool = False):
    """Int8 variant of :func:`_local_search` over a QuantizedTokenIndex."""
    n_local = Dq.shape[0]
    B = Qq.shape[0]
    pallas_ok = (
        B % 8 == 0
        and n_local % 8 == 0
        and Dq.shape[2] % 128 == 0
        and Dq.shape[1] % 8 == 0
        and Qq.shape[1] % 8 == 0
    )
    if use_pallas and pallas_ok:
        from ..ops.maxsim_pallas import maxsim_scores_pallas_int8

        M_kernel = None if unpadded else M
        # the in-VMEM score block is int32 — same VMEM budget math as the
        # fp32 path in `_local_search`
        budget = 6 * 1024 * 1024
        c_blk = 8
        b_blk = next(
            (b for b in (32, 16, 8)
             if B % b == 0
             and (c_blk * Dq.shape[1]) * (b * Qq.shape[1]) * 4 <= budget),
            None,
        )
        L_d = Dq.shape[1]
        max_slab = max(c_blk, ((1 << 23) // L_d) // c_blk * c_blk)
        if b_blk is None:
            scores = _xla_chunk_scores_int8(Qq, qs, Dq, ds, M, n_local, chunk)
        elif n_local <= max_slab:
            scores = maxsim_scores_pallas_int8(Qq, qs, Dq, ds, M_kernel,
                                               B_blk=b_blk, C_blk=c_blk)
        else:
            slab = next(
                (s for s in range(max_slab, c_blk - 1, -c_blk)
                 if n_local % s == 0),
                None,
            )
            if slab is None:
                scores = _xla_chunk_scores_int8(Qq, qs, Dq, ds, M,
                                                n_local, chunk)
            else:
                Ds = Dq.reshape(n_local // slab, slab, L_d, Dq.shape[2])
                ss = ds.reshape(n_local // slab, slab)
                xs = ((Ds, ss) if M_kernel is None else
                      (Ds, ss, M_kernel.reshape(n_local // slab, slab, L_d)))

                def body(_, dm):
                    if M_kernel is None:
                        d, s = dm
                        m = None
                    else:
                        d, s, m = dm
                    return None, maxsim_scores_pallas_int8(
                        Qq, qs, d, s, m, B_blk=b_blk, C_blk=c_blk
                    )

                _, per_slab = jax.lax.scan(body, None, xs)
                scores = jnp.moveaxis(per_slab, 0, 1).reshape(B, n_local)
    else:
        scores = _xla_chunk_scores_int8(Qq, qs, Dq, ds, M, n_local, chunk)
    if unpadded:
        # exclude whole-padding docs, as in `_local_search`
        scores = jnp.where(jnp.any(M, axis=1)[None, :], scores,
                           MASK_FILL_VALUE * Qq.shape[1])
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def default_use_pallas() -> bool:
    """The fused Pallas kernel is the default scoring path on TPU backends;
    the XLA chunked scan everywhere else (CPU tests, interpret mode)."""
    from ..ops.platform import is_tpu_backend

    return is_tpu_backend()


_SEARCH_FN_CACHE: dict = {}


def make_search_fn(mesh: Optional[Mesh], n_padded_docs: int, k: int,
                   chunk: int = 256, use_pallas: Optional[bool] = None,
                   score_dtype=jnp.float32, unpadded: bool = False):
    """Build the jitted search program for a fixed index shape.

    ``unpadded``/``score_dtype`` are serving-throughput knobs for the fused
    kernel path (see :func:`_local_search`); exact fp32 masked scoring is
    the default.

    Programs are cached on their full build key: a fresh closure per call
    would miss JAX's jit cache and re-trace+compile the corpus-scan program
    (seconds) for every caller that loops, e.g. ``search_exhaustive`` over
    eval batches."""
    if use_pallas is None:
        use_pallas = default_use_pallas()
    key = (mesh, n_padded_docs, k, chunk, use_pallas,
           jnp.dtype(score_dtype).name, unpadded)
    try:
        cached = _SEARCH_FN_CACHE.get(key)
    except TypeError:  # unhashable mesh — build uncached
        cached = None
        key = None
    if cached is not None:
        return cached
    fn = _build_search_fn(mesh, n_padded_docs, k, chunk, use_pallas,
                          score_dtype, unpadded)
    if key is not None:
        _SEARCH_FN_CACHE[key] = fn
    return fn


def _build_search_fn(mesh, n_padded_docs, k, chunk, use_pallas,
                     score_dtype, unpadded):
    if use_pallas is None:
        use_pallas = default_use_pallas()
    if mesh is None:
        @jax.jit
        def search_fn(Q, D, M):
            c = min(chunk, n_padded_docs)
            while n_padded_docs % c:
                c -= 1
            return _local_search(Q, D, M, k=min(k, n_padded_docs), chunk=c,
                                 use_pallas=use_pallas,
                                 score_dtype=score_dtype, unpadded=unpadded)

        return search_fn

    n_shards = mesh.shape[DATA_AXIS]
    n_local = n_padded_docs // n_shards
    c = min(chunk, n_local)
    while n_local % c:
        c -= 1
    k_eff = min(k, n_local)

    def spmd(Q, D, M):
        vals, idx = _local_search(Q, D, M, k=k_eff, chunk=c,
                                  use_pallas=use_pallas,
                                  score_dtype=score_dtype, unpadded=unpadded)
        shard = jax.lax.axis_index(DATA_AXIS)
        gidx = idx + shard * n_local
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, tiled=False)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS, tiled=False)
        B = Q.shape[0]
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(B, n_shards * k_eff)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(B, n_shards * k_eff)
        fvals, fpos = jax.lax.top_k(all_vals, min(k, n_shards * k_eff))
        fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
        return fvals, fidx

    mapped = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_search_fn_int8(mesh: Optional[Mesh], n_padded_docs: int, k: int,
                        chunk: int = 256, use_pallas: Optional[bool] = None,
                        unpadded: bool = False):
    """Int8 analogue of :func:`make_search_fn` over a QuantizedTokenIndex.

    The returned program takes ``(Q, codes, scales, mask)`` with Q still a
    FLOAT query matrix — per-query-token quantization happens inside the
    jitted program (one cheap VPU pass over [B, L_q, dim])."""
    if use_pallas is None:
        use_pallas = default_use_pallas()
    key = ("int8", mesh, n_padded_docs, k, chunk, use_pallas, unpadded)
    try:
        cached = _SEARCH_FN_CACHE.get(key)
    except TypeError:
        cached = None
        key = None
    if cached is not None:
        return cached

    def quantize_queries(Q):
        from ..ops.quant import quantize_rows

        Qq, qscale = quantize_rows(Q)  # [B, L_q, dim] int8, [B, L_q, 1]
        return Qq, qscale[..., 0]

    if mesh is None:
        @jax.jit
        def search_fn(Q, Dq, ds, M):
            Qq, qs = quantize_queries(Q)
            c = min(chunk, n_padded_docs)
            while n_padded_docs % c:
                c -= 1
            return _local_search_int8(
                Qq, qs, Dq, ds, M, k=min(k, n_padded_docs), chunk=c,
                use_pallas=use_pallas, unpadded=unpadded)

        fn = search_fn
    else:
        n_shards = mesh.shape[DATA_AXIS]
        n_local = n_padded_docs // n_shards
        c = min(chunk, n_local)
        while n_local % c:
            c -= 1
        k_eff = min(k, n_local)

        def spmd(Q, Dq, ds, M):
            Qq, qs = quantize_queries(Q)
            vals, idx = _local_search_int8(
                Qq, qs, Dq, ds, M, k=k_eff, chunk=c,
                use_pallas=use_pallas, unpadded=unpadded)
            shard = jax.lax.axis_index(DATA_AXIS)
            gidx = idx + shard * n_local
            all_vals = jax.lax.all_gather(vals, DATA_AXIS, tiled=False)
            all_idx = jax.lax.all_gather(gidx, DATA_AXIS, tiled=False)
            B = Q.shape[0]
            all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(
                B, n_shards * k_eff)
            all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(
                B, n_shards * k_eff)
            fvals, fpos = jax.lax.top_k(all_vals, min(k, n_shards * k_eff))
            fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
            return fvals, fidx

        fn = jax.jit(shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        ))
    if key is not None:
        _SEARCH_FN_CACHE[key] = fn
    return fn


def search_exhaustive(
    index: TokenIndex,
    Q: jax.Array,
    k: int,
    chunk: int = 256,
    use_pallas: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search the index with a batch of query embeddings.

    Args:
      index: a :class:`TokenIndex` (optionally mesh-sharded).
      Q: [B, L_q, dim] query token embeddings (masked rows zeroed — the
        [MASK]-augmentation rows participate, matching the reference).
      k: number of results.

    Returns:
      (scores [B, k] fp32, doc_indices [B, k] int — positions into
      ``index.doc_ids``; padding docs never win because their mask is all
      False → score −9999·L_q).
    """
    from .index import QuantizedTokenIndex

    if isinstance(index, QuantizedTokenIndex):
        fn = make_search_fn_int8(index.mesh, index.num_padded_docs, k, chunk,
                                 use_pallas=use_pallas)
        vals, idx = fn(jnp.asarray(Q, dtype=jnp.float32), index.codes,
                       index.scales, index.mask)
    else:
        fn = make_search_fn(index.mesh, index.num_padded_docs, k, chunk,
                            use_pallas=use_pallas)
        vals, idx = fn(jnp.asarray(Q, dtype=index.embeddings.dtype),
                       index.embeddings, index.mask)
    return np.asarray(vals), np.asarray(idx)


@dataclass
class Searcher:
    """Convenience wrapper mirroring the reference's ``Searcher`` role
    (`colbert/searcher.py:24-136`): hold an index + a compiled search fn and
    map results back to doc ids."""

    index: TokenIndex  # or QuantizedTokenIndex (int8 path auto-selected)
    k: int = 100
    chunk: int = 256
    use_pallas: Optional[bool] = None  # None → on for TPU backends

    def __post_init__(self):
        from .index import QuantizedTokenIndex

        self._quantized = isinstance(self.index, QuantizedTokenIndex)
        make = make_search_fn_int8 if self._quantized else make_search_fn
        self._fn = make(
            self.index.mesh, self.index.num_padded_docs, self.k, self.chunk,
            use_pallas=self.use_pallas,
        )

    def search(self, Q: jax.Array, remove_zero_rows: bool = False):
        """Returns (doc_ids list[list[str]], scores [B, k]).

        ``remove_zero_rows`` mirrors ``remove_zero_tensors=True``
        (`colbert/searcher.py:123-131`): all-zero query rows are stripped on
        the reference's CPU path for speed; with padded static shapes they
        score 0 against everything and are harmless, so this is a no-op kept
        for API parity.
        """
        if self._quantized:
            vals, idx = self._fn(
                jnp.asarray(Q, dtype=jnp.float32),
                self.index.codes,
                self.index.scales,
                self.index.mask,
            )
        else:
            vals, idx = self._fn(
                jnp.asarray(Q, dtype=self.index.embeddings.dtype),
                self.index.embeddings,
                self.index.mask,
            )
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        n = self.index.num_docs
        ids = [
            [self.index.doc_ids[j] for j in row if j < n][: self.k]
            for row in idx
        ]
        return ids, vals
