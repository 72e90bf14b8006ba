"""Chunked, sharded rerank forward — the throughput path.

The test-time rerank workload is one ``[B·K, L]`` cross-encoder forward per
eval batch (B queries × K=100 candidates × L≈512 joint tokens; reference
`src/executors/Reranker_base_executor.py:785-935` loops queries on the host
and even halves batches when the GPU OOMs, `:838-919`). Materializing the
whole expanded batch at BERT-base size needs the per-layer attention-logit
tensor ``[B·K, heads, L, L]`` in fp32 — ~6.3 GB at B·K=400 — which exhausts a
single v5e chip's HBM. This module restructures the workload TPU-first:

- the query image is ViT-encoded **once per image** and its features
  broadcast over the K candidates (the reference re-encodes per candidate);
- the expanded batch is processed as a ``lax.scan`` over fixed-size chunks,
  bounding live memory to one chunk's activations while XLA pipelines
  HBM→VMEM transfers across steps;
- with a mesh, each chunk's rows are sharded over the data axis so the scan
  body runs data-parallel over ICI with zero collectives (logits gather at
  the end).

All sizes static; one compiled program per (B, K, L, chunk) shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pick_chunk(expanded: int, chunk_size: Optional[int],
                n_shards: int) -> tuple:
    """Pick ``(chunk, pad)``: the largest divisor of ``expanded`` that is
    ≤ chunk_size and a multiple of ``n_shards`` (so each scan step shards
    evenly over the mesh). When no such divisor exists (e.g. B·K=300 rows on
    8 chips), fall back to the largest multiple of n_shards ≤ chunk_size and
    pad the batch up to a multiple of it — NEVER to one whole-batch chunk,
    which would re-create exactly the multi-GB activation blow-up this
    module exists to bound."""
    if chunk_size is None:
        chunk_size = 64
    chunk_size = max(min(chunk_size, expanded), 1)
    for c in range(chunk_size, 0, -1):
        if expanded % c == 0 and c % n_shards == 0:
            return c, 0
    c = max(chunk_size // n_shards, 1) * n_shards
    return c, (-expanded) % c


def make_chunked_rerank_fn(
    reranker,
    nway: int,
    chunk_size: Optional[int] = None,
    mesh=None,
    jit: bool = True,
):
    """Build a jitted ``fn(params, input_ids, attention_mask, token_type_ids,
    query_pixel_values) -> logits[B, K]`` for a FullContextRerankModel-style
    reranker.

    ``nway`` is the number of candidate docs per query (K). Inputs arrive
    expanded: ``input_ids`` etc. are ``[B·K, L]``; ``query_pixel_values`` is
    ``[B, 3, H, W]`` (or None for text-only rerankers).
    """
    from ..parallel.mesh import DATA_AXIS

    n_shards = 1
    if mesh is not None:
        n_shards = int(mesh.shape[DATA_AXIS])

    def fn(params, input_ids, attention_mask, token_type_ids, query_pixel_values):
        expanded, L = input_ids.shape
        chunk, pad = _pick_chunk(expanded, chunk_size, n_shards)
        n_chunks = (expanded + pad) // chunk

        def pad_rows(x, fill=0):
            if pad == 0:
                return x
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        input_ids = pad_rows(input_ids)
        # padding rows attend to their [PAD] tokens (all-ones mask) so the
        # softmax stays well-defined; their logits are sliced away below
        attention_mask = pad_rows(attention_mask, fill=1)
        token_type_ids = pad_rows(token_type_ids)

        def shard_rows(x):
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = [None] * x.ndim
            spec[0] = DATA_AXIS
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

        vis = None
        if query_pixel_values is not None:
            # ViT once per image, features broadcast over the K candidates
            vis_cls, second_last = reranker.apply(
                {"params": params}, query_pixel_values,
                method=type(reranker).encode_vision,
            )
            vis = (
                pad_rows(jnp.repeat(vis_cls, nway, axis=0)),
                pad_rows(jnp.repeat(second_last, nway, axis=0)),
            )

        def to_chunks(x):
            return x.reshape((n_chunks, chunk) + x.shape[1:])

        xs = [to_chunks(input_ids), to_chunks(attention_mask), to_chunks(token_type_ids)]
        if vis is not None:
            xs += [to_chunks(vis[0]), to_chunks(vis[1])]

        def body(_, chunk_xs):
            ids, am, tt = chunk_xs[:3]
            vf = tuple(chunk_xs[3:]) if len(chunk_xs) > 3 else None
            ids, am, tt = shard_rows(ids), shard_rows(am), shard_rows(tt)
            if vf is not None:
                vf = tuple(shard_rows(v) for v in vf)
            out = reranker.apply(
                {"params": params}, ids, am, tt, None,
                num_negative_examples=chunk - 1,
                vision_feats=vf,
            )
            return (), out.logits.reshape(chunk)

        _, logits = jax.lax.scan(body, (), tuple(xs))
        return logits.reshape(-1)[:expanded].reshape(-1, nway)

    if not jit:
        return fn
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        return jax.jit(
            fn,
            in_shardings=(replicated, None, None, None, None),
            out_shardings=replicated,
        )
    return jax.jit(fn)
