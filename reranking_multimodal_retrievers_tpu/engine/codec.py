"""Residual token codec: centroid id + int8 residual.

Role parity with the ColBERT ``ResidualCodec``
(`third_party/ColBERT/colbert/indexing/codecs/residual.py:50-278`): each doc
token stores its nearest-centroid id plus a quantized residual, cutting index
HBM ~2-3.5× vs bf16 so larger corpora stay device-resident. TPU-native
re-design: instead of nbits bucket cutoffs + bit-packing + a CUDA decompress
kernel, residuals are symmetric int8 with one per-dimension scale —
decompression is a gather + an int8 multiply that XLA fuses directly into the
scoring matmul's producer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import train_centroids


@dataclass
class CompressedTokenIndex:
    centroids: jax.Array  # [K, dim] fp32
    codes: jax.Array  # [N, L_d] int32 — centroid id per token
    residuals: jax.Array  # [N, L_d, dim] int8
    scales: jax.Array  # [dim] fp32 per-dimension residual scale
    mask: jax.Array  # [N, L_d] bool
    doc_ids: list

    @property
    def bytes_per_token(self) -> float:
        dim = self.residuals.shape[-1]
        return dim + 4  # int8 residual + int32 code

    def nbytes(self) -> int:
        return int(
            self.residuals.size
            + self.codes.size * 4
            + self.centroids.size * 4
            + self.scales.size * 4
        )


def compress(
    embeddings: np.ndarray,
    mask: np.ndarray,
    doc_ids,
    num_centroids: int = 256,
    sample_size: int = 65536,
    seed: int = 0,
    token_chunk: int = 1 << 21,
) -> CompressedTokenIndex:
    """Train centroids on a token sample, assign all tokens, quantize
    residuals (the reference's ``train`` + ``compress`` phases,
    `collection_indexer.py:264-320` + `residual.py:188-240`).

    Assignment/quantization run in ``token_chunk``-sized slabs (two passes:
    codes + running per-dim residual max, then quantize) so the transient
    [tokens, num_centroids] score block never exceeds one slab — a 100k-doc
    × 256-token corpus would otherwise materialize a 26 GB block on device.
    """
    on_device = isinstance(embeddings, jax.Array)
    msk = np.asarray(mask, bool)
    N, L, D = embeddings.shape
    NT = N * L
    flat = embeddings.reshape(-1, D)  # device reshape is free; np is a view
    valid = msk.reshape(-1)
    rng = np.random.default_rng(seed)
    pool = np.flatnonzero(valid)
    take = rng.choice(pool, size=min(sample_size, len(pool)), replace=False)
    if on_device:
        sample = np.asarray(jax.device_get(flat[jnp.asarray(take)]),
                            np.float32)
    else:
        # sample FIRST, then convert: np advanced indexing copies only the
        # sampled rows, where asarray(flat, fp32) would materialize a full
        # fp32 copy of the corpus (~13 GiB at 100k x 256 x 128) on the host
        sample = flat[take].astype(np.float32)
    centroids, _ = train_centroids(sample, k=num_centroids, seed=seed)
    cent_j = jnp.asarray(centroids)

    def chunk(a, s, e):
        # device input slices on device; host input ships one slab at a time
        return a[s:e] if on_device else jnp.asarray(
            np.asarray(a[s:e], np.float32))

    code_chunks, run_max = [], jnp.zeros((D,), jnp.float32)
    bounds = [(s, min(s + token_chunk, NT))
              for s in range(0, NT, token_chunk)]
    for s, e in bounds:
        c, m = _assign_chunk(chunk(flat, s, e), cent_j,
                             jnp.asarray(valid[s:e]))
        code_chunks.append(c)
        run_max = jnp.maximum(run_max, m)
    scales = jnp.maximum(run_max, 1e-8) / 127.0
    resid_chunks = [
        _quantize_chunk(chunk(flat, s, e), cent_j, c, scales)
        for (s, e), c in zip(bounds, code_chunks)
    ]
    codes = (code_chunks[0] if len(code_chunks) == 1
             else jnp.concatenate(code_chunks))
    residuals = (resid_chunks[0] if len(resid_chunks) == 1
                 else jnp.concatenate(resid_chunks))
    return CompressedTokenIndex(
        centroids=cent_j,
        codes=codes.reshape(N, L),
        residuals=residuals.reshape(N, L, D),
        scales=scales,
        mask=jnp.asarray(msk),
        doc_ids=list(doc_ids),
    )


@jax.jit
def _assign_chunk(flat, centroids, valid):
    """(codes, per-dim max |residual| over valid tokens) for one slab."""
    flat = flat.astype(jnp.float32)
    scores = jnp.einsum("nd,kd->nk", flat, centroids,
                        preferred_element_type=jnp.float32)
    codes = jnp.argmax(scores, axis=1).astype(jnp.int32)
    resid = flat - centroids[codes]
    resid_for_scale = jnp.where(valid[:, None], jnp.abs(resid), 0.0)
    return codes, jnp.max(resid_for_scale, axis=0)


@jax.jit
def _quantize_chunk(flat, centroids, codes, scales):
    resid = flat.astype(jnp.float32) - centroids[codes]
    return jnp.clip(jnp.round(resid / scales[None, :]),
                    -127, 127).astype(jnp.int8)


@jax.jit
def decompress(index_codes, index_residuals, centroids, scales):
    """codes [..., ] + residuals [..., dim] → fp32 embeddings (the CUDA
    ``decompress_residuals`` role, `decompress_residuals.cu:42`)."""
    return centroids[index_codes] + index_residuals.astype(jnp.float32) * scales
