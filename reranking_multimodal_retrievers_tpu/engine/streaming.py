"""Beyond-HBM exact retrieval: a host-RAM token index streamed in slabs.

The corpora the reference's Wikipedia ops load are *full* Wikipedia
(`/root/reference/src/data_ops/wikipedia_data_ops.py:110`
``LoadFullWikipediaPassageData`` — millions of passages). At 1M docs × 256
tokens × 128 dims that is 65 GB bf16 / 33 GB int8 — far beyond one v5e's
~16 GB HBM, which is the regime `engine/index.py` covers. The reference
handles it with a compressed IVF index + CPU candidate generation
(`colbert/search/index_storage.py:86-184`); the TPU-native answer keeps the
**exact** exhaustive MaxSim scan (the branch the reference itself treats as
ground truth, `FLMR_base_executor.py:918-991`) and streams the index from
host RAM through HBM in double-buffered slabs:

  host slab s+1 ──device_put (async DMA)──▶ HBM     ─┐ overlapped
  HBM slab s    ──fused MaxSim (MXU)──▶ per-slab top-k ─┘
  running top-k ──jitted [B,k]⊕[B,k] merge──▶ final (exact)

JAX dispatch is asynchronous: the ``device_put`` of slab ``s+1`` is issued
*before* the host blocks on slab ``s``'s merged result, so the transfer
rides the DMA engines while the MXU scores. Each slab buffer is donated to
its scoring call, so the HBM watermark stays ~2 slabs regardless of corpus
size. The pipeline is **transfer-bound by physics** — the full index crosses
the host link once per query batch — so throughput is
``link_bandwidth / index_bytes × batch`` and the levers are exactly the ones
exposed here: bigger query batches (scan cost is per-slab, not per-query),
the int8 host index (half the bytes on the same double-rate MXU path), and
scale-out (N chips stream N-way-split corpora in parallel via the sharded
in-HBM path in `engine/search.py` once aggregate HBM suffices).

Exactness: the per-slab local top-k + cross-slab merge is the same
two-stage reduction the sharded `engine/search.py` program runs over ICI,
so streamed results are bit-identical to the in-HBM exhaustive scan
(pinned by `tests/test_streaming.py` against `search_exhaustive`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .search import (
    _local_search,
    _local_search_int8,
    default_use_pallas,
)


@dataclass
class HostTokenIndex:
    """Host-RAM (or disk-memmapped) token index.

    ``embeddings`` may be fp16/bf16/fp32 — slabs are cast to bf16 on device
    (a fused VPU pass, free next to the DMA). ``mask=None`` declares every
    doc fully real (the fixed-length corpus case); tail padding to the slab
    size is handled internally either way.
    """

    embeddings: np.ndarray  # [N, L_d, dim], any float dtype, host-resident
    mask: Optional[np.ndarray]  # [N, L_d] bool, or None (= all tokens real)
    doc_ids: Optional[List[str]] = None

    @property
    def num_docs(self) -> int:
        return int(self.embeddings.shape[0])

    @property
    def doc_maxlen(self) -> int:
        return int(self.embeddings.shape[1])

    @property
    def dim(self) -> int:
        return int(self.embeddings.shape[2])

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "HostTokenIndex":
        """Open a `TokenIndex.save` directory without materializing it in
        HBM — ``mmap=True`` leaves the embeddings on disk and lets the OS
        page cache serve slab reads (the beyond-host-RAM regime)."""
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        emb = np.load(os.path.join(path, "embeddings.npy"),
                      mmap_mode="r" if mmap else None)
        packed = np.load(os.path.join(path, "mask.npy"))
        L = meta["shape"][1]
        msk = np.unpackbits(packed, axis=-1)[:, :L].astype(bool)
        return cls(embeddings=emb, mask=msk, doc_ids=meta["doc_ids"])


@dataclass
class HostQuantizedTokenIndex:
    """Int8 host index (per-doc symmetric scales — same layout as
    `engine/index.QuantizedTokenIndex`): half the host RAM *and* half the
    bytes over the host link, scored on the MXU's double-rate s8×s8→s32
    path."""

    codes: np.ndarray  # [N, L_d, dim] int8
    scales: np.ndarray  # [N] fp32
    mask: Optional[np.ndarray]  # [N, L_d] bool or None
    doc_ids: Optional[List[str]] = None

    @property
    def num_docs(self) -> int:
        return int(self.codes.shape[0])

    @property
    def doc_maxlen(self) -> int:
        return int(self.codes.shape[1])

    @property
    def dim(self) -> int:
        return int(self.codes.shape[2])

    @classmethod
    def from_host_index(cls, index: HostTokenIndex,
                        slab_docs: int = 16384) -> "HostQuantizedTokenIndex":
        """Quantize slab-by-slab (bounded peak host memory)."""
        n = index.num_docs
        codes = np.empty(index.embeddings.shape, np.int8)
        scales = np.empty((n,), np.float32)
        for s in range(0, n, slab_docs):
            e = np.asarray(index.embeddings[s:s + slab_docs], np.float32)
            if index.mask is not None:
                e = np.where(index.mask[s:s + slab_docs, :, None], e, 0.0)
            amax = np.max(np.abs(e), axis=(1, 2))
            sc = np.maximum(amax, 1e-8) / 127.0
            codes[s:s + slab_docs] = np.clip(
                np.round(e / sc[:, None, None]), -127, 127).astype(np.int8)
            scales[s:s + slab_docs] = sc
        return cls(codes=codes, scales=scales, mask=index.mask,
                   doc_ids=index.doc_ids)


def _pick_chunk(n_local: int, chunk: int) -> int:
    c = min(chunk, n_local)
    while n_local % c:
        c -= 1
    return c


class StreamingSearcher:
    """Exact top-k search over a host-resident index, streamed per batch.

    Single-device by design: the multi-chip story for beyond-HBM corpora is
    to split the corpus over chips (each shard back in the in-HBM regime,
    `engine/search.py`), not to stream to all chips through one host link.
    """

    def __init__(
        self,
        index,  # HostTokenIndex | HostQuantizedTokenIndex
        k: int = 100,
        slab_docs: int = 16384,
        chunk: int = 256,
        use_pallas: Optional[bool] = None,
        device=None,
    ):
        self.index = index
        self.k = k
        self.slab_docs = int(slab_docs)
        self.chunk = chunk
        self.use_pallas = (default_use_pallas() if use_pallas is None
                           else use_pallas)
        self.device = device or jax.devices()[0]
        self._quantized = isinstance(index, HostQuantizedTokenIndex)
        self._n_slabs = -(-index.num_docs // self.slab_docs)
        k_eff = min(k, self.slab_docs)
        c = _pick_chunk(self.slab_docs, chunk)
        use_pallas = self.use_pallas
        # slab-buffer donation keeps the HBM watermark at ~2 slabs; the CPU
        # backend ignores donation (and warns), so gate it
        donatable = self.device.platform != "cpu"

        if self._quantized:
            @jax.jit
            def _quantize_queries(Q):
                from ..ops.quant import quantize_rows

                Qq, qscale = quantize_rows(jnp.asarray(Q, jnp.float32))
                return Qq, qscale[..., 0]

            # donate the slab buffers: the HBM watermark stays ~2 slabs
            def slab_fn(Qq, qs, Dq, ds, M):
                return _local_search_int8(
                    Qq, qs, Dq, ds, M, k=k_eff, chunk=c,
                    use_pallas=use_pallas)

            self._quantize_queries = _quantize_queries
            self._slab_fn = jax.jit(
                slab_fn, donate_argnums=(2, 3, 4) if donatable else ())
        else:
            def slab_fn(Q, D, M):
                D = D.astype(jnp.bfloat16)
                return _local_search(
                    Q, D, M, k=k_eff, chunk=c, use_pallas=use_pallas)

            self._slab_fn = jax.jit(
                slab_fn, donate_argnums=(1, 2) if donatable else ())

        @jax.jit
        def merge_fn(best_v, best_i, vals, idx, offset):
            gidx = idx.astype(jnp.int64 if best_i.dtype == jnp.int64
                              else jnp.int32) + offset
            cat_v = jnp.concatenate([best_v, vals.astype(best_v.dtype)], 1)
            cat_i = jnp.concatenate([best_i, gidx], axis=1)
            mv, pos = jax.lax.top_k(cat_v, best_v.shape[1])
            return mv, jnp.take_along_axis(cat_i, pos, axis=1)

        self._merge_fn = merge_fn

    # ---------------------------------------------------------------- slabs
    def _host_slab(self, s: int):
        """Materialize slab ``s`` host-side, tail-padded to slab_docs.

        Returns the positional arrays the slab program consumes. The mask is
        always shipped (slab_docs × L_d bools ≈ 0.4% of the embedding bytes)
        — it carries per-token padding when the index has one and excludes
        tail-padding docs either way.
        """
        idx = self.index
        lo = s * self.slab_docs
        hi = min(lo + self.slab_docs, idx.num_docs)
        n = hi - lo
        pad = self.slab_docs - n

        def padded(a, fill=0):
            a = np.asarray(a)
            if pad == 0:
                return a
            out = np.full((self.slab_docs,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        if idx.mask is not None:
            m = padded(idx.mask[lo:hi], False)
        else:
            m = np.zeros((self.slab_docs, idx.doc_maxlen), bool)
            m[:n] = True
        if self._quantized:
            return (padded(idx.codes[lo:hi]),
                    padded(idx.scales[lo:hi], 0.0), m)
        return (padded(idx.embeddings[lo:hi]), m)

    def _put(self, s: int):
        return tuple(jax.device_put(a, self.device)
                     for a in self._host_slab(s))

    # --------------------------------------------------------------- search
    def search(self, Q) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k of every query against the full host corpus.

        Args:
          Q: [B, L_q, dim] float query token embeddings.
        Returns:
          (scores [B, k] fp32, doc positions [B, k] int32 — indices into
          ``index.doc_ids`` order; with k > num_docs the tail is -inf/-1).
        """
        B = int(np.asarray(Q).shape[0])
        if self._quantized:
            Qq, qs = self._quantize_queries(jnp.asarray(Q, jnp.float32))
            q_args = (Qq, qs)
        else:
            q_args = (jax.device_put(jnp.asarray(Q, jnp.bfloat16),
                                     self.device),)
        best_v = jnp.full((B, self.k), -np.inf, jnp.float32)
        best_i = jnp.full((B, self.k), -1, jnp.int32)
        pending = None
        nxt = self._put(0)
        for s in range(self._n_slabs):
            cur, nxt = nxt, (self._put(s + 1)
                             if s + 1 < self._n_slabs else None)
            vals, idx = self._slab_fn(*q_args, *cur)
            best_v, best_i = self._merge_fn(
                best_v, best_i, vals, idx,
                jnp.int32(s * self.slab_docs))
            # backpressure: block one step behind — slab s+1's DMA is
            # already in flight while the MXU scores slab s, but the host
            # never runs further ahead than one slab of lookahead
            if pending is not None:
                pending.block_until_ready()
            pending = best_v
        best_v.block_until_ready()
        vals = np.asarray(best_v)
        idx = np.asarray(best_i)
        # slab tail-padding docs score far below any real doc (all-False
        # mask → MASK_FILL_VALUE·L_q) so they can only appear after every
        # real doc; normalize them to the -inf/-1 convention
        bad = (idx < 0) | (idx >= self.index.num_docs)
        vals = np.where(bad, -np.inf, vals)
        idx = np.where(bad, -1, idx)
        return vals, idx

    def search_ids(self, Q):
        """Like :meth:`search` but maps positions to ``doc_ids``."""
        vals, idx = self.search(Q)
        ids = [[self.index.doc_ids[j] for j in row if j >= 0]
               for row in idx]
        return ids, vals
