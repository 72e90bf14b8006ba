"""Production serving layer: micro-batching over the jitted programs.

The reference has no serving story (research code: per-query Python loops,
`src/executors/Reranker_base_executor.py:785-935`). TPU serving wants the
opposite shape: ONE compiled program per (static) batch geometry, fed at high
occupancy. This module provides the host-side half of that:

- :class:`MicroBatcher` — a generic request coalescer: callers submit
  individual items and block on a Future; a background worker drains the
  queue, groups up to ``max_batch`` items (waiting at most ``max_wait_ms``
  for stragglers), pads the group to the program's static batch size, runs
  ONE device program, and distributes the per-item results. Padding rides
  free rows — XLA shapes never change, so there is exactly one compile per
  geometry.
- :class:`RerankService` — monoPreFLMR-style candidate reranking behind a
  batcher: ``rerank(input_ids, attention_mask, token_type_ids, pixel)`` for
  one query's K candidates; the worker fuses up to ``max_batch`` queries
  into a single ``[B·K, L]`` chunked forward (`engine/rerank_eval.py`).
- :class:`RetrievalService` — exact MaxSim retrieval behind a batcher:
  ``search(Q)`` for one query's token matrix; the worker batches query
  matrices into the compiled search program over the HBM-resident index.

Everything is stdlib ``threading``/``queue`` — no external server deps; an
RPC front end (gRPC/HTTP) plugs in by calling ``submit`` from its handlers.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence

import numpy as np


class MicroBatcher:
    """Coalesce single-item requests into fixed-size device batches.

    Args:
      run_batch: ``fn(items: list) -> list`` — called on the worker thread
        with 1..max_batch items; must return one result per item.
      max_batch: largest group per device call (the program's static batch).
      max_wait_ms: how long the first request of a group waits for more.
    """

    def __init__(self, run_batch: Callable[[List[Any]], List[Any]],
                 max_batch: int = 8, max_wait_ms: float = 2.0):
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # Serializes the stop-check + enqueue in submit() against close()'s
        # stop-set + drain: without it a submit racing close() could enqueue
        # after the drain and leave its Future unresolved forever.
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # observability: realized batch sizes (bounded — a long-running
        # server must not grow host memory for stats)
        from collections import deque

        self.batch_sizes = deque(maxlen=4096)

    def submit(self, item: Any) -> "Future":
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("MicroBatcher is closed")
            fut: Future = Future()
            self._q.put((item, fut))
        return fut

    def __call__(self, item: Any) -> Any:
        return self.submit(item).result()

    def close(self):
        """Stop the worker and FAIL any still-queued requests — in-flight
        RPC handlers must error out, not hang."""
        with self._submit_lock:
            self._stop.set()
        self._worker.join(timeout=5)
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("MicroBatcher closed"))

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            group = [first]
            deadline = time.perf_counter() + self.max_wait_s
            while len(group) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            items = [it for it, _ in group]
            futs = [f for _, f in group]
            self.batch_sizes.append(len(items))
            try:
                results = self.run_batch(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results for "
                        f"{len(items)} items"
                    )
                for f, r in zip(futs, results):
                    f.set_result(r)
            except Exception as e:  # fan the error out — never leave a
                for f in futs:      # caller blocked on an unresolved future
                    if not f.done():
                        f.set_exception(e)


class RerankService:
    """Candidate reranking behind a micro-batcher.

    ``rerank_fn(params, input_ids, attention_mask, token_type_ids, pixel)``
    is the compiled ``[B·K, L] -> [B, K]`` program
    (`engine.make_chunked_rerank_fn`); requests are per-query ``[K, L]``
    slices padded up to the program's ``max_batch`` queries."""

    def __init__(self, rerank_fn, params, nway: int, max_batch: int = 8,
                 max_wait_ms: float = 2.0):
        self.rerank_fn = rerank_fn
        self.params = params
        self.nway = nway
        self.max_batch = max_batch
        self.batcher = MicroBatcher(self._run, max_batch, max_wait_ms)

    def rerank(self, input_ids, attention_mask, token_type_ids=None,
               pixel_values=None) -> "Future":
        """One query's K candidates → Future of ``[K]`` logits."""
        assert input_ids.shape[0] == self.nway, (input_ids.shape, self.nway)
        return self.batcher.submit(
            (np.asarray(input_ids), np.asarray(attention_mask),
             None if token_type_ids is None else np.asarray(token_type_ids),
             None if pixel_values is None else np.asarray(pixel_values))
        )

    def _run(self, items):
        # A coalesced group may mix requests WITH and WITHOUT pixel_values.
        # Zero-filled images are NOT equivalent to "no vision prefix" (conv
        # bias + layernorm + learned query tokens make vision_prefix(zeros)
        # non-zero), so a no-pix request's score must not depend on its
        # batch companions: partition into homogeneous subgroups and run
        # each through the device program separately. token_type_ids stays
        # zero-fillable — zeros ARE its defined default.
        with_pix = [i for i, it in enumerate(items) if it[3] is not None]
        without = [i for i, it in enumerate(items) if it[3] is None]
        if with_pix and without:
            out = [None] * len(items)
            for idxs in (with_pix, without):
                res = self._run_group([items[i] for i in idxs])
                for j, i in enumerate(idxs):
                    out[i] = res[j]
            return out
        return self._run_group(items)

    def _run_group(self, items):
        import jax.numpy as jnp

        n = len(items)
        B = self.max_batch  # static geometry: always pad to the full batch
        ids = np.concatenate([it[0] for it in items])
        am = np.concatenate([it[1] for it in items])
        tt = np.concatenate([
            it[2] if it[2] is not None else np.zeros_like(it[0])
            for it in items
        ])
        pad_rows = (B - n) * self.nway
        if pad_rows:
            ids = np.concatenate([ids, np.zeros((pad_rows,) + ids.shape[1:],
                                                ids.dtype)])
            am = np.concatenate([am, np.zeros((pad_rows,) + am.shape[1:],
                                              am.dtype)])
            tt = np.concatenate([tt, np.zeros((pad_rows,) + tt.shape[1:],
                                              tt.dtype)])
        pix = None
        pix_items = [it[3] for it in items if it[3] is not None]
        if pix_items:
            # _run partitioned by pix-presence, so every item carries one
            assert len(pix_items) == len(items)
            shapes = {p.shape for p in pix_items}
            if len(shapes) > 1:
                raise ValueError(
                    f"mixed pixel_values shapes in one batch group: {shapes}")
            pix = np.stack(pix_items)
            if pad_rows:
                pix = np.concatenate(
                    [pix, np.zeros((B - n,) + pix.shape[1:], pix.dtype)])
            pix = jnp.asarray(pix)
        logits = self.rerank_fn(
            self.params, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(tt),
            pix,
        )
        logits = np.asarray(logits).reshape(B, self.nway)
        return [logits[i] for i in range(n)]

    def close(self):
        self.batcher.close()


class RetrievalService:
    """Exact-MaxSim retrieval behind a micro-batcher.

    ``search_fn(Q, D, M) -> (vals, idx)`` is the compiled search program for
    a static ``[B, L_q, dim]`` query batch (`engine.make_search_fn`). An int8
    ``QuantizedTokenIndex`` is accepted too — pass the program from
    `engine.make_search_fn_int8` (signature ``(Q, codes, scales, M)``)."""

    def __init__(self, search_fn, index, batch_queries: int = 8,
                 max_wait_ms: float = 2.0):
        from ..engine.index import QuantizedTokenIndex

        self.search_fn = search_fn
        self.index = index
        self._quantized = isinstance(index, QuantizedTokenIndex)
        self.B = batch_queries
        self.batcher = MicroBatcher(self._run, batch_queries, max_wait_ms)

    def search(self, Q) -> "Future":
        """One query's ``[L_q, dim]`` token matrix → Future of
        ``(doc_ids list, scores [k])``."""
        return self.batcher.submit(np.asarray(Q))

    def _run(self, items):
        import jax.numpy as jnp

        n = len(items)
        Q = np.stack(items)
        if n < self.B:
            Q = np.concatenate(
                [Q, np.zeros((self.B - n,) + Q.shape[1:], Q.dtype)])
        if self._quantized:
            vals, idx = self.search_fn(
                jnp.asarray(Q, dtype=jnp.float32),
                self.index.codes, self.index.scales, self.index.mask,
            )
        else:
            vals, idx = self.search_fn(
                jnp.asarray(Q, dtype=self.index.embeddings.dtype),
                self.index.embeddings, self.index.mask,
            )
        vals, idx = np.asarray(vals), np.asarray(idx)
        out = []
        for i in range(n):
            out.append((
                [self.index.doc_ids[j] for j in idx[i]
                 if j < len(self.index.doc_ids)],
                vals[i],
            ))
        return out

    def close(self):
        self.batcher.close()
