"""HBM-resident token index for late-interaction retrieval.

TPU-native replacement for the whole ColBERT indexing stack
(`third_party/ColBERT/colbert/indexing/collection_indexer.py` — multi-process
launcher, FAISS k-means, residual codec, IVF build, chunked disk layout) by
the design SURVEY.md §7 prescribes: the corpora this framework targets
(OK-VQA/E-VQA/WIT passages: ≤ a few hundred thousand docs × ≤512 tokens ×
128 dims) fit directly in TPU HBM as a padded bf16 tensor sharded over the
mesh's data axis, so retrieval is *exact* MaxSim — the branch the reference
itself treats as ground truth (`FLMR_base_executor.py:918-991`) — with zero
barriers, no temp checkpoints and no approximate pruning.

Layout:
  embeddings [N_pad, L_d, dim]  bf16, L2-normalized rows, zero-padded
  mask       [N_pad, L_d]       bool  (skiplist/pad mask from the doc encoder)
  doc_ids    list[str]          host-side id table (N entries, N ≤ N_pad)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, pad_to_multiple


@dataclass
class TokenIndex:
    embeddings: jax.Array  # [N_pad, L_d, dim] bf16 (sharded over data axis)
    mask: jax.Array  # [N_pad, L_d] bool
    doc_ids: List[str]
    mesh: Optional[Mesh] = None

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def num_padded_docs(self) -> int:
        return int(self.embeddings.shape[0])

    @property
    def doc_maxlen(self) -> int:
        return int(self.embeddings.shape[1])

    @property
    def dim(self) -> int:
        return int(self.embeddings.shape[2])

    # ---------------------------------------------------------- construction
    @classmethod
    def from_arrays(
        cls,
        embeddings: np.ndarray,
        mask: np.ndarray,
        doc_ids: Sequence[str],
        mesh: Optional[Mesh] = None,
        pad_multiple: Optional[int] = None,
    ) -> "TokenIndex":
        """Pad the doc axis for even sharding and device_put over the mesh."""
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        multiple = pad_multiple or n_shards
        emb, _ = pad_to_multiple(np.asarray(embeddings), multiple)
        msk, _ = pad_to_multiple(np.asarray(mask).astype(bool), multiple)
        emb = jnp.asarray(emb, dtype=jnp.bfloat16)
        msk = jnp.asarray(msk)
        if mesh is not None:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            emb = jax.device_put(emb, sh)
            msk = jax.device_put(msk, sh)
        return cls(embeddings=emb, mask=msk, doc_ids=list(doc_ids), mesh=mesh)

    # ------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        emb = np.asarray(jax.device_get(self.embeddings)).astype(np.float16)
        msk = np.asarray(jax.device_get(self.mask))
        np.save(os.path.join(path, "embeddings.npy"), emb)
        np.save(os.path.join(path, "mask.npy"), np.packbits(msk, axis=-1))
        meta = {
            "doc_ids": self.doc_ids,
            "shape": list(self.embeddings.shape),
            # the ON-DISK dtype (fp16 has a numpy container; the in-HBM
            # index is bf16 — load() re-casts)
            "dtype": str(emb.dtype),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None) -> "TokenIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        emb = np.load(os.path.join(path, "embeddings.npy"))
        packed = np.load(os.path.join(path, "mask.npy"))
        L = meta["shape"][1]
        msk = np.unpackbits(packed, axis=-1)[:, :L].astype(bool)
        return cls.from_arrays(emb, msk, meta["doc_ids"], mesh=mesh)


@dataclass
class QuantizedTokenIndex:
    """Flat int8 token index: symmetric per-DOC scales (W8A8 exact retrieval).

    Halves the HBM footprint of :class:`TokenIndex` (dim int8 bytes + 4
    scale bytes per doc vs 2·dim bf16 bytes) and rides the MXU's double-rate
    s8×s8→s32 path in `ops/maxsim_pallas.maxsim_scores_pallas_int8`. One
    scale per *document* (not per token) is the layout that lets the kernel
    rescale after the token-max instead of on the full score block; doc
    tokens are L2-normalized, so per-doc symmetric scales stay tight. This
    is the exact-scan analogue of the reference's residual codec
    (`colbert/indexing/codecs/residual.py`) — no centroids, no IVF, and the
    scan stays exhaustive.
    """

    codes: jax.Array  # [N_pad, L_d, dim] int8 (sharded over data axis)
    scales: jax.Array  # [N_pad] fp32 per-doc symmetric scale
    mask: jax.Array  # [N_pad, L_d] bool
    doc_ids: List[str]
    mesh: Optional[Mesh] = None

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def num_padded_docs(self) -> int:
        return int(self.codes.shape[0])

    @property
    def doc_maxlen(self) -> int:
        return int(self.codes.shape[1])

    @property
    def dim(self) -> int:
        return int(self.codes.shape[2])

    @classmethod
    def from_arrays(
        cls,
        embeddings: np.ndarray,
        mask: np.ndarray,
        doc_ids: Sequence[str],
        mesh: Optional[Mesh] = None,
        pad_multiple: Optional[int] = None,
    ) -> "QuantizedTokenIndex":
        """Quantize float doc embeddings into per-doc-scaled int8 codes."""
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        multiple = pad_multiple or n_shards
        emb, _ = pad_to_multiple(
            np.asarray(embeddings, dtype=np.float32), multiple)
        msk, _ = pad_to_multiple(np.asarray(mask).astype(bool), multiple)
        emb = np.where(msk[..., None], emb, 0.0)  # padding never sets scales
        amax = np.max(np.abs(emb), axis=(1, 2))
        scales = np.maximum(amax, 1e-8).astype(np.float32) / 127.0
        codes = np.clip(
            np.round(emb / scales[:, None, None]), -127, 127
        ).astype(np.int8)
        codes_j = jnp.asarray(codes)
        scales_j = jnp.asarray(scales)
        msk_j = jnp.asarray(msk)
        if mesh is not None:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            codes_j = jax.device_put(codes_j, sh)
            scales_j = jax.device_put(scales_j, sh)
            msk_j = jax.device_put(msk_j, sh)
        return cls(codes=codes_j, scales=scales_j, mask=msk_j,
                   doc_ids=list(doc_ids), mesh=mesh)

    @classmethod
    def from_token_index(cls, index: TokenIndex) -> "QuantizedTokenIndex":
        return cls.from_arrays(
            np.asarray(jax.device_get(index.embeddings), dtype=np.float32),
            np.asarray(jax.device_get(index.mask)),
            index.doc_ids,
            mesh=index.mesh,
            pad_multiple=index.num_padded_docs,  # already padded: keep shape
        )

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "codes.npy"),
                np.asarray(jax.device_get(self.codes)))
        np.save(os.path.join(path, "scales.npy"),
                np.asarray(jax.device_get(self.scales)))
        np.save(os.path.join(path, "mask.npy"),
                np.packbits(np.asarray(jax.device_get(self.mask)), axis=-1))
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"doc_ids": self.doc_ids,
                       "shape": list(self.codes.shape)}, f)

    @classmethod
    def load(cls, path: str,
             mesh: Optional[Mesh] = None) -> "QuantizedTokenIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        codes = np.load(os.path.join(path, "codes.npy"))
        scales = np.load(os.path.join(path, "scales.npy"))
        packed = np.load(os.path.join(path, "mask.npy"))
        L = meta["shape"][1]
        msk = np.unpackbits(packed, axis=-1)[:, :L].astype(bool)
        codes_j = jnp.asarray(codes)
        scales_j = jnp.asarray(scales)
        msk_j = jnp.asarray(msk)
        if mesh is not None:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            codes_j = jax.device_put(codes_j, sh)
            scales_j = jax.device_put(scales_j, sh)
            msk_j = jax.device_put(msk_j, sh)
        return cls(codes=codes_j, scales=scales_j, mask=msk_j,
                   doc_ids=meta["doc_ids"], mesh=mesh)


def encode_corpus(
    doc_encode_fn: Callable,
    batches: Iterable[dict],
    doc_ids: Sequence[str],
    mesh: Optional[Mesh] = None,
    pad_multiple: Optional[int] = None,
) -> TokenIndex:
    """Encode a corpus into a :class:`TokenIndex`.

    ``doc_encode_fn(batch) -> (embeddings [B, L_d, dim], mask [B, L_d])`` is
    expected to be jitted (optionally pjit-sharded over the mesh); batches
    must be fixed-shape (the data layer pads the tail batch). This single
    sharded map replaces the reference's per-rank ``CollectionEncoder`` +
    ``IndexSaver`` + NCCL barriers (`collection_indexer.py:327-436`).
    """
    embs, masks = [], []
    for batch in batches:
        e, m = doc_encode_fn(batch)
        embs.append(np.asarray(jax.device_get(e)).astype(np.float16))
        masks.append(np.asarray(jax.device_get(m)).astype(bool))
    embeddings = np.concatenate(embs, axis=0)[: len(doc_ids)]
    mask = np.concatenate(masks, axis=0)[: len(doc_ids)]
    return TokenIndex.from_arrays(
        embeddings, mask, doc_ids, mesh=mesh, pad_multiple=pad_multiple
    )
