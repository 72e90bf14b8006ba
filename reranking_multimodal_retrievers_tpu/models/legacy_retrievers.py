"""Legacy retriever families.

The reference ships a superseded-but-present generation of retrievers
(SURVEY.md §2.5: `src/models/retriever/visual_colbert.py` (13 variants),
`visual_dpr.py`, `FLMR.py`, `retriever_dpr.py` (with BPR), `retriever_t5.py`).
Their capabilities collapse onto three architectures, provided here natively:

- :class:`VisualColBERT` — late-interaction retriever with an MLP-only vision
  mapping (no transformer mapping network): exactly ``FLMRModelForRetrieval``
  with ``use_transformer_mapping_network=False``, which the unified FLMR
  module already expresses — this subclass pins that configuration (the
  reference's ``VisualColBERTForPretraining*`` family).
- :class:`VisualDPR` — single-vector dense retriever: CLS pooling + optional
  vision prefix, dot-product scoring, in-batch-negative CE
  (`visual_dpr.py`, incl. the ``VisualDPRForRAG`` scoring interface).
- :class:`RetrieverDPR` — text-only DPR with the optional **BPR** binary-
  hashing loss (`retriever_dpr.py:233`): tanh-binarized embeddings + ranking
  loss, for memory-light corpora.
- :class:`RetrieverT5` — seq2seq-encoder dense retriever stand-in
  (`retriever_t5.py`): mean-pooled encoder states → projection; here the
  encoder is the framework's bidirectional stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from .bert import BertConfig, BertModel
from .vit import CLIPVisionConfig, CLIPVisionModel
from .flmr import FLMRConfig, FLMRModelForRetrieval, _softmax_ce


class VisualColBERT(FLMRModelForRetrieval):
    """Late-interaction retriever without the transformer mapping network
    (the pre-PreFLMR architecture, `visual_colbert.py`)."""

    @classmethod
    def build(cls, text_config: BertConfig, vision_config: CLIPVisionConfig,
              dim: int = 128, prefix_length: int = 32, **kw) -> "VisualColBERT":
        cfg = FLMRConfig(
            text_config=text_config,
            vision_config=vision_config,
            dim=dim,
            mapping_network_prefix_length=prefix_length,
            use_transformer_mapping_network=False,
            **kw,
        )
        return cls(cfg)


@dataclasses.dataclass(frozen=True)
class DPRConfig:
    text_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    vision_config: Optional[CLIPVisionConfig] = None
    projection_dim: int = 0  # 0 = use hidden size directly
    use_vision: bool = False
    vision_prefix_length: int = 4
    bpr: bool = False  # binary passage retrieval loss (retriever_dpr.py:233)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(text_config=BertConfig.tiny(),
                        vision_config=CLIPVisionConfig.tiny())
        defaults.update(kw)
        return cls(**defaults)


@flax.struct.dataclass
class DPROutput:
    loss: jax.Array
    scores: jax.Array  # [B_q, B_d]
    query_embeddings: jax.Array
    item_embeddings: jax.Array


class VisualDPR(nn.Module):
    """Single-vector dense retriever with optional vision conditioning
    (reference `visual_dpr.py:*`, `VisualDPRForRAG` `:1008`)."""

    config: DPRConfig

    def setup(self):
        cfg = self.config
        self.query_encoder = BertModel(cfg.text_config, name="query_encoder")
        self.item_encoder = BertModel(cfg.text_config, name="item_encoder")
        if cfg.projection_dim:
            self.query_proj = nn.Dense(cfg.projection_dim, name="query_proj")
            self.item_proj = nn.Dense(cfg.projection_dim, name="item_proj")
        if cfg.use_vision:
            self.vision_encoder = CLIPVisionModel(cfg.vision_config, name="vision_encoder")
            self.vision_projection = nn.Dense(
                cfg.text_config.hidden_size * cfg.vision_prefix_length,
                name="vision_projection",
            )

    def encode_query(self, input_ids, attention_mask, pixel_values=None):
        cls = self.query_encoder(input_ids, attention_mask)["last_hidden_state"][:, 0]
        if pixel_values is not None and self.config.use_vision:
            vis = self.vision_encoder(pixel_values)["last_hidden_state"][:, 0]
            prefix = self.vision_projection(vis).reshape(cls.shape[0], -1, cls.shape[-1])
            cls = cls + prefix.mean(axis=1)  # fuse vision into the CLS vector
        if self.config.projection_dim:
            cls = self.query_proj(cls)
        return cls

    def encode_item(self, input_ids, attention_mask):
        cls = self.item_encoder(input_ids, attention_mask)["last_hidden_state"][:, 0]
        if self.config.projection_dim:
            cls = self.item_proj(cls)
        return cls

    def __call__(self, query_input_ids, query_attention_mask,
                 item_input_ids, item_attention_mask,
                 query_pixel_values=None, num_negative_examples: int = 1):
        Q = self.encode_query(query_input_ids, query_attention_mask,
                              query_pixel_values)
        D = self.encode_item(item_input_ids, item_attention_mask)
        scores = jnp.einsum("qd,nd->qn", Q.astype(jnp.float32), D.astype(jnp.float32))
        nway = num_negative_examples + 1
        labels = jnp.arange(Q.shape[0], dtype=jnp.int32) * nway
        loss = _softmax_ce(scores, labels)
        if self.config.bpr:
            # BPR (`retriever_dpr.py:233`): hashed-embedding ranking loss on
            # tanh-binarized codes + the dense CE
            Qh = jnp.tanh(Q.astype(jnp.float32))
            Dh = jnp.tanh(D.astype(jnp.float32))
            h_scores = jnp.einsum("qd,nd->qn", Qh, Dh)
            loss = loss + _softmax_ce(h_scores, labels)
        return DPROutput(loss=loss, scores=scores, query_embeddings=Q,
                         item_embeddings=D)


class RetrieverDPR(VisualDPR):
    """Text-only DPR (reference `retriever_dpr.py`)."""

    def encode_query(self, input_ids, attention_mask, pixel_values=None):
        return super().encode_query(input_ids, attention_mask, None)


class RetrieverT5(nn.Module):
    """Encoder-pooled dense retriever (reference `retriever_t5.py`): mean-pool
    the encoder states and project."""

    config: DPRConfig

    @nn.compact
    def __call__(self, query_input_ids, query_attention_mask,
                 item_input_ids, item_attention_mask,
                 num_negative_examples: int = 1):
        cfg = self.config
        enc = BertModel(cfg.text_config, add_pooling_layer=False, name="encoder")

        def pool(ids, mask):
            h = enc(ids, mask)["last_hidden_state"]
            m = mask[:, :, None].astype(h.dtype)
            return (h * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)

        proj = nn.Dense(cfg.projection_dim or cfg.text_config.hidden_size,
                        name="projection")
        Q = proj(pool(query_input_ids, query_attention_mask))
        D = proj(pool(item_input_ids, item_attention_mask))
        scores = jnp.einsum("qd,nd->qn", Q.astype(jnp.float32), D.astype(jnp.float32))
        nway = num_negative_examples + 1
        labels = jnp.arange(Q.shape[0], dtype=jnp.int32) * nway
        return DPROutput(loss=_softmax_ce(scores, labels), scores=scores,
                         query_embeddings=Q, item_embeddings=D)
