"""ModPreFLMR: rerank from frozen-retriever late-interaction outputs only.

Reference `src/models/rerank/interaction_rerank_model.py:86-166` and the
MORES blocks (`src/models/rerank/mores_model.py:21-94`, after
github.com/luyug/MORES): either

- concat [query tokens ; context tokens] → linear map to BERT width →
  shallow ``CrossEncoder`` (optionally with attention fusion), or
- MORES-style blocks: cross-attention (query attends to doc) *then*
  self-attention, per layer, CLS → two heads.

This family never runs the encoders at rerank time — the executor feeds the
retriever outputs — making it the cheapest reranker (0.13 s/query on A100 in
the reference; here one batched jit program).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..bert import BertConfig, BertAttention, additive_mask
from .cross_encoder import CrossEncoder, fusion_attention_adj
from .losses import prepare_logits_labels, rerank_loss, primary_logits
from .rerank_model import RerankOutput

LATE_INTERACTION_EMBEDDING_SIZE = 128  # reference `interaction_rerank_model.py:84`


@dataclasses.dataclass(frozen=True)
class InteractionRerankConfig:
    cross_encoder: BertConfig
    interaction_type: str = "CrossEncoder"  # or "MORES"
    loss_fn: str = "BCE"
    pos_weight: Optional[float] = None
    late_interaction_dim: int = LATE_INTERACTION_EMBEDDING_SIZE

    @classmethod
    def tiny(cls, **kw):
        ce = BertConfig.tiny(max_position_embeddings=512)
        defaults = dict(cross_encoder=ce, late_interaction_dim=16)
        defaults.update(kw)
        return cls(**defaults)


class MORESLayer(nn.Module):
    """Cross-attention then self-attention then FFN (reference
    ``MORES_BertLayer``, `mores_model.py:21-57` — note cross comes FIRST)."""

    config: BertConfig

    @nn.compact
    def __call__(self, hidden, qry_mask_bias, doc, doc_mask_bias):
        cfg = self.config
        hidden = BertAttention(cfg, name="crossattention")(
            hidden, kv_states=doc, mask_bias=doc_mask_bias
        )
        hidden = BertAttention(cfg, name="attention")(
            hidden, mask_bias=qry_mask_bias
        )
        inter = nn.Dense(cfg.intermediate_size, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(out + hidden)


class MORESSym(nn.Module):
    """Reference `mores_model.py:60-94`.

    ``attention_adj`` extends the reference: `mores_model.py:74-75` raises
    ``NotImplementedError`` even though `interaction_rerank_model.py:131-156`
    builds and passes the fusion bias, so fusion×MORES is dead upstream.
    Here the ``[B, Lq+Lc, Lq+Lc]`` fusion bias (`fusion_attention_adj`:
    zero diagonal blocks, softmaxed cross blocks) is decomposed onto MORES's
    factored attention: the query→doc block ``adj[:, :Lq, Lq:]`` biases
    every layer's cross-attention pre-softmax, exactly like the CrossEncoder
    path (`attention_fusion.py:84-102`). The diagonal blocks are zero by
    construction, so self-attention takes no bias; the doc→query block
    ``adj[:, Lq:, :Lq]`` — non-zero — has NO attachment point, because doc
    rows are K/V-only in MORES and never attend to anything. Fusion×MORES
    therefore carries exactly the query-side half of the fusion signal; use
    the CrossEncoder interaction type when both directions matter."""

    config: BertConfig

    @nn.compact
    def __call__(self, qry, doc, qry_mask, cross_mask, attention_adj=None):
        Lq = qry.shape[1]
        qb = additive_mask(qry_mask)
        db = additive_mask(cross_mask)
        if attention_adj is not None:
            db = db + attention_adj[:, None, :Lq, Lq:]
        hidden = qry
        for i in range(self.config.num_hidden_layers):
            hidden = MORESLayer(self.config, name=f"layer_{i}")(hidden, qb, doc, db)
        cls = hidden[:, 0]
        return nn.Dense(1, name="classifier1")(cls), nn.Dense(1, name="classifier2")(cls)


class InteractionRerankModel(nn.Module):
    config: InteractionRerankConfig

    @nn.compact
    def __call__(
        self,
        query_late_interaction,
        context_late_interaction,
        num_negative_examples: int,
        query_mask,
        context_mask,
        preflmr_scores=None,
        fusion_multiplier: float = 1.0,
        labels=None,
    ):
        cfg = self.config
        batch_size = query_late_interaction.shape[0]
        nway = num_negative_examples + 1
        expanded = batch_size * nway
        assert context_late_interaction.shape[0] == expanded

        Lq = query_late_interaction.shape[1]
        Lc = context_late_interaction.shape[1]
        q = jnp.repeat(query_late_interaction, nway, axis=0)
        qm = jnp.repeat(query_mask, nway, axis=0)

        attention_adj = None
        if preflmr_scores is not None:
            attention_adj = fusion_attention_adj(
                preflmr_scores, query_rows=Lq, context_rows=Lc,
                fusion_multiplier=fusion_multiplier,
            )

        mapping = nn.Dense(
            cfg.cross_encoder.hidden_size, name="cross_encoder_input_mapping"
        )
        if cfg.interaction_type == "MORES":
            logits1, logits2 = MORESSym(cfg.cross_encoder, name="reranker")(
                qry=mapping(q),
                doc=mapping(context_late_interaction.astype(jnp.float32)),
                qry_mask=qm,
                cross_mask=context_mask,
                attention_adj=attention_adj,
            )
        else:
            inputs = jnp.concatenate([q, context_late_interaction], axis=1)
            inputs = mapping(inputs)
            mask = jnp.concatenate(
                [qm.astype(jnp.int32), context_mask.astype(jnp.int32)], axis=1
            )
            logits1, logits2 = CrossEncoder(cfg.cross_encoder, name="reranker")(
                inputs, attention_mask=mask, attention_adj=attention_adj
            )

        logits, lbl = prepare_logits_labels(
            cfg.loss_fn, logits1, logits2, batch_size, num_negative_examples, labels
        )
        loss = rerank_loss(cfg.loss_fn, logits, lbl, cfg.pos_weight)
        return RerankOutput(loss=loss, logits=primary_logits(cfg.loss_fn, logits))
