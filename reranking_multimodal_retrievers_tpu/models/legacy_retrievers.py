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
- :class:`VisualColBERTMultipleMapping` — several vision projection MLPs over
  the same precomputed image features (e.g. one trained per feature source),
  concatenated token-wise into the query
  (`visual_colbert.py:345-461` ``VisualColBERTForRetrievalMultipleMapping``).
- :class:`VisualColBERTMAE` — vision-only late-interaction query encoder: ViT
  patch states → input linear → shallow self-attention encoder → linear to
  the interaction dim (`visual_colbert.py:1518-1645`
  ``...ShallowTransformerMappingMAE``; the MAE-finetuned ViT backbone is a
  weight-bridge concern, the architecture is the capability).
- :class:`VisualDPRForRAG` — query-side-only DPR used inside RAG training:
  pooled text embedding + sum of the vision prefix tokens
  (`visual_dpr.py:1008-1139`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from .bert import BertConfig, BertEncoder, BertModel
from .vit import CLIPVisionConfig, CLIPVisionModel
from .flmr import FLMRConfig, FLMRModelForRetrieval, _l2_normalize, _softmax_ce
from ..ops.maxsim import colbert_score


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
    # the 'separate_query_and_item_encoders' module flag (reference
    # `retriever_dpr.py:55,89`): False shares one BERT tower for both sides
    separate_query_and_item_encoders: bool = True

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
        self.item_encoder = (
            BertModel(cfg.text_config, name="item_encoder")
            if cfg.separate_query_and_item_encoders
            else self.query_encoder
        )
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


@flax.struct.dataclass
class LateInteractionOutput:
    loss: jax.Array
    scores: jax.Array  # [B, nway]
    query_embeddings: jax.Array  # [B, Lq, dim]
    item_embeddings: jax.Array  # [B*nway, Ld, dim]


def _nway_colbert_loss(Q, D, D_mask, num_negative_examples: int):
    """1-pos + N-neg contrastive MaxSim loss shared by the legacy
    late-interaction variants (same contract as `modeling_flmr.py:938-947`)."""
    nway = num_negative_examples + 1
    Q_dup = jnp.repeat(Q, nway, axis=0)
    scores, _ = colbert_score(Q_dup, D, D_mask)
    scores = scores.reshape(-1, nway)
    labels = jnp.zeros(scores.shape[0], dtype=jnp.int32)
    return _softmax_ce(scores, labels), scores


@dataclasses.dataclass(frozen=True)
class MultiMappingConfig:
    """`visual_colbert.py:356-396`: one MLP per feature source, each
    ``vision_embedding_size → (dim·prefix)/2 → dim·prefix``."""

    text_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    dim: int = 128
    vision_embedding_size: int = 768
    prefix_lengths: tuple = (4, 4)  # one vision projection per entry

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(text_config=BertConfig.tiny(), dim=16,
                        vision_embedding_size=24, prefix_lengths=(2, 3))
        defaults.update(kw)
        return cls(**defaults)


class _MappingMLP(nn.Module):
    """The reference's two-layer GELU ``MLP`` vision projection
    (`visual_colbert.py:16-27`)."""

    out_tokens: int
    dim: int

    @nn.compact
    def __call__(self, x):
        width = self.out_tokens * self.dim
        x = nn.Dense(width // 2, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(width, name="fc2")(x)
        return x.reshape(x.shape[0], -1, self.dim)


class VisualColBERTMultipleMapping(nn.Module):
    """Late-interaction retriever whose query concatenates several
    independently-trained vision mappings over the same precomputed image
    features (`visual_colbert.py:345-461`). Each projection can carry its own
    prefix length; ROI feature stacks ``[B, num_rois, vision_dim]`` are
    flattened into extra tokens exactly as the reference's reshape does."""

    config: MultiMappingConfig

    def setup(self):
        cfg = self.config
        self.text_encoder = BertModel(cfg.text_config, add_pooling_layer=False,
                                      name="text_encoder")
        self.linear = nn.Dense(cfg.dim, use_bias=False, name="linear")
        self.vision_projections = [
            _MappingMLP(out_tokens=p, dim=cfg.dim, name=f"vision_projection_{i}")
            for i, p in enumerate(cfg.prefix_lengths)
        ]

    def encode_text(self, input_ids, attention_mask):
        h = self.text_encoder(input_ids, attention_mask)["last_hidden_state"]
        h = self.linear(h)
        return h * attention_mask[:, :, None].astype(h.dtype)

    def query(self, input_ids, attention_mask, image_features):
        Q = self.encode_text(input_ids, attention_mask)
        B = image_features.shape[0]
        feats = image_features.reshape(B, -1)  # [B, (rois·)vision_dim] flattened
        vis = [proj(feats) for proj in self.vision_projections]
        Q = jnp.concatenate([Q] + vis, axis=1)
        return _l2_normalize(Q, axis=2)

    def doc(self, input_ids, attention_mask):
        D = self.encode_text(input_ids, attention_mask)
        return _l2_normalize(D, axis=2), attention_mask

    def __call__(self, query_input_ids, query_attention_mask,
                 query_image_features, item_input_ids, item_attention_mask,
                 num_negative_examples: int = 1):
        Q = self.query(query_input_ids, query_attention_mask, query_image_features)
        D, D_mask = self.doc(item_input_ids, item_attention_mask)
        loss, scores = _nway_colbert_loss(Q, D, D_mask, num_negative_examples)
        return LateInteractionOutput(loss=loss, scores=scores,
                                     query_embeddings=Q, item_embeddings=D)


@dataclasses.dataclass(frozen=True)
class MAERetrieverConfig:
    """`visual_colbert.py:1518-1645`: vision-only query tower — ViT patch
    states → input linear → 1-layer self-attention encoder → linear(dim)."""

    text_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    vision_config: CLIPVisionConfig = dataclasses.field(
        default_factory=CLIPVisionConfig)
    mapping_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    dim: int = 128

    @classmethod
    def tiny(cls, **kw):
        text = BertConfig.tiny()
        vision = CLIPVisionConfig.tiny()
        mapping = dataclasses.replace(
            BertConfig.tiny(), hidden_size=vision.hidden_size,
            num_hidden_layers=1,
        )
        defaults = dict(text_config=text, vision_config=vision,
                        mapping_config=mapping, dim=16)
        defaults.update(kw)
        return cls(**defaults)


class VisualColBERTMAE(nn.Module):
    """Vision-only late-interaction query encoder over an MAE-style ViT
    backbone (`visual_colbert.py:1615-1645`): the query embedding is purely
    the mapped patch tokens (no text concat); docs stay text-only. The
    MAE-finetuned backbone weights arrive through the HF bridge — here the
    architecture (ViT + shallow self-attn mapping) is what's reproduced."""

    config: MAERetrieverConfig

    def setup(self):
        cfg = self.config
        self.vision_encoder = CLIPVisionModel(cfg.vision_config,
                                              name="vision_encoder")
        self.vision_projection_input_linear = nn.Dense(
            cfg.vision_config.hidden_size, name="vision_projection_input_linear")
        self.vision_projection = BertEncoder(cfg.mapping_config,
                                             name="vision_projection")
        self.vision_projection_linear = nn.Dense(
            cfg.dim, name="vision_projection_linear")
        self.text_encoder = BertModel(cfg.text_config, add_pooling_layer=False,
                                      name="text_encoder")
        self.linear = nn.Dense(cfg.dim, use_bias=False, name="linear")

    def query(self, pixel_values):
        states = self.vision_encoder(pixel_values)["last_hidden_state"]
        states = self.vision_projection_input_linear(states)
        states, _ = self.vision_projection(states)
        Q = self.vision_projection_linear(states)
        return _l2_normalize(Q, axis=2)

    def doc(self, input_ids, attention_mask):
        h = self.text_encoder(input_ids, attention_mask)["last_hidden_state"]
        D = self.linear(h) * attention_mask[:, :, None].astype(h.dtype)
        return _l2_normalize(D, axis=2), attention_mask

    def __call__(self, query_pixel_values, item_input_ids, item_attention_mask,
                 num_negative_examples: int = 1):
        Q = self.query(query_pixel_values)
        D, D_mask = self.doc(item_input_ids, item_attention_mask)
        loss, scores = _nway_colbert_loss(Q, D, D_mask, num_negative_examples)
        return LateInteractionOutput(loss=loss, scores=scores,
                                     query_embeddings=Q, item_embeddings=D)


class VisualDPRForRAG(nn.Module):
    """Query-side-only visual DPR used inside RAG training
    (`visual_dpr.py:1008-1139`): pooled text embedding plus the *sum* of the
    vision prefix tokens ("mimics score addition", `:1125-1130`). Returns the
    pooled query vector the RAG marginalization consumes."""

    config: DPRConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, image_features):
        cfg = self.config
        width = cfg.projection_dim or cfg.text_config.hidden_size
        out = BertModel(cfg.text_config, name="query_encoder")(
            input_ids, attention_mask)
        pooled = out["pooler_output"] if "pooler_output" in out else \
            out["last_hidden_state"][:, 0]
        if cfg.projection_dim:
            pooled = nn.Dense(cfg.projection_dim, name="query_proj")(pooled)
        prefix = _MappingMLP(out_tokens=cfg.vision_prefix_length, dim=width,
                             name="vision_projection")(
            image_features.reshape(image_features.shape[0], -1))
        return pooled + prefix.sum(axis=1)
