"""monoPreFLMR cross-encoder rerankers.

Reference `src/models/rerank/rerank_model.py:76-591`:

- :class:`RerankModel` — the "spliced" variant: query token ids are spliced
  into the context sequence (`:204-224`), encoded with the *frozen
  retriever's* context text encoder + vision encoder + transformer mapping
  network (`:333-479`), mapped from the 128-d late-interaction space into the
  cross-encoder hidden size (`:99-101,237-239`), rows reordered to
  [query, image, context] (`:256-274`), optionally biased by PreFLMR
  attention fusion (`:276-319`), and scored by a shallow 2-head BERT
  ``CrossEncoder`` (`:321-325`).
- :class:`FullContextRerankModel` — query+context re-tokenized jointly as a
  sentence pair with a length budget (`:515-591`,
  ``prepare_full_context_inputs`` `utils.py:129-167`), vision tokens
  appended, no reordering.

The retriever-backbone submodules carry the same names as in
``FLMRModelForRetrieval`` so a bridged checkpoint loads into both.

Faithfulness note: the reference computes ``loss_fn(logits, logits)`` in
``RerankModel.forward`` (`rerank_model.py:328` — labels ignored; a bug kept
there, fixed in ``FullContextRerankModel`` `:587`). We compute the correct
``loss_fn(logits, labels)``; set ``replicate_reference_loss_bug=True`` for
bit-faithful behavior.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from ..bert import BertConfig, BertModel, BertEncoder, additive_mask
from ..vit import CLIPVisionModel
from ..flmr import (
    FLMRConfig,
    VisionProjection,
    token_skiplist_mask,
    query_instruction_mask,
    _l2_normalize,
)
from .cross_encoder import CrossEncoder, fusion_attention_adj
from .losses import prepare_logits_labels, rerank_loss, primary_logits

HEAD_TOKEN_LEEWAY = 4  # reference `utils.py:72`


@dataclasses.dataclass(frozen=True)
class RerankConfig:
    flmr: FLMRConfig
    cross_encoder: BertConfig
    loss_fn: str = "BCE"
    pos_weight: Optional[float] = None
    max_query_length: int = 32
    max_decoder_source_length: int = 512
    replicate_reference_loss_bug: bool = False

    @property
    def max_context_length(self) -> int:
        # reference `rerank_model.py:520`
        return self.max_decoder_source_length - self.max_query_length - HEAD_TOKEN_LEEWAY

    @classmethod
    def tiny(cls, **kw):
        flmr = FLMRConfig.tiny()
        ce = dataclasses.replace(
            flmr.text_config, num_hidden_layers=1, max_position_embeddings=512
        )
        defaults = dict(flmr=flmr, cross_encoder=ce)
        defaults.update(kw)
        return cls(**defaults)


@flax.struct.dataclass
class RerankOutput:
    loss: jax.Array
    logits: jax.Array


class _RerankBase(nn.Module):
    """Shared frozen-retriever encoding path (reference ``RerankModel.query``,
    `rerank_model.py:333-479` — note it uses the *context* text encoder and
    always runs the transformer mapping network)."""

    config: RerankConfig

    def setup(self):
        flmr = self.config.flmr
        self.context_text_encoder = BertModel(flmr.text_config, name="context_text_encoder")
        self.context_text_encoder_linear = nn.Dense(
            flmr.dim, use_bias=False, name="context_text_encoder_linear"
        )
        self.context_vision_encoder = CLIPVisionModel(
            flmr.vision_config, name="context_vision_encoder"
        )
        self.context_vision_projection = VisionProjection(
            flmr.dim, flmr.mapping_network_prefix_length,
            name="context_vision_projection",
        )
        self.transformer_mapping_input_linear = nn.Dense(
            flmr.text_config.hidden_size, name="transformer_mapping_input_linear"
        )
        self.transformer_mapping_network = BertEncoder(
            flmr.transformer_mapping_config, name="transformer_mapping_network"
        )
        self.transformer_mapping_output_linear = nn.Dense(
            flmr.dim, name="transformer_mapping_output_linear"
        )
        self.cross_encoder_input_mapping = nn.Dense(
            self.config.cross_encoder.hidden_size, name="cross_encoder_input_mapping"
        )
        self.reranker = CrossEncoder(self.config.cross_encoder, name="reranker")

    def encode_vision(self, pixel_values):
        """Run the (frozen) ViT once per *image*: returns ``(vision_cls,
        second_last)`` — the CLS embedding and the second-to-last hidden
        layer sans CLS (`modeling_flmr.py:1292-1311`). A TPU-first split: the
        reference re-encodes the query image once per candidate document
        inside the rerank forward (`rerank_model.py:333-479` via the repeated
        pixel tensor); encoding per image and broadcasting the features over
        the K candidates removes K−1 of every K ViT forwards."""
        vis_out = self.context_vision_encoder(pixel_values)
        return vis_out["last_hidden_state"][:, 0], vis_out["hidden_states"][-2][:, 1:]

    def encode_query(
        self,
        input_ids,
        attention_mask,
        pixel_values=None,
        image_features=None,
        mask_instructions: bool = False,
        token_type_ids=None,
        vision_feats=None,
    ):
        flmr = self.config.flmr
        text_out = self.context_text_encoder(
            input_ids, attention_mask, token_type_ids=token_type_ids
        )
        text_hidden = text_out["last_hidden_state"]
        text_embeddings = self.context_text_encoder_linear(text_hidden)
        if mask_instructions:
            keep = query_instruction_mask(input_ids, flmr.instruction_token_id)
        else:
            keep = token_skiplist_mask(input_ids, ())
        text_mask = keep.astype(text_embeddings.dtype)[:, :, None]
        text_embeddings = text_embeddings * text_mask

        vision_embeddings = None
        if pixel_values is not None or image_features is not None or vision_feats is not None:
            if vision_feats is not None:
                # precomputed (vision_cls, second_last), already per-row
                vision_cls, second_last = vision_feats
                batch_size = vision_cls.shape[0]
                vis_out = "precomputed"
            elif pixel_values is not None:
                batch_size = pixel_values.shape[0]
                if pixel_values.ndim == 5:
                    pixel_values = pixel_values.reshape((-1,) + pixel_values.shape[2:])
                vis_out = self.context_vision_encoder(pixel_values)
                vision_cls = vis_out["last_hidden_state"][:, 0]
                second_last = vis_out["hidden_states"][-2][:, 1:]
            else:
                batch_size = image_features.shape[0]
                vis_out = None
                vision_cls = image_features
            vision_embeddings = self.context_vision_projection(vision_cls)
            vision_embeddings = vision_embeddings.reshape(batch_size, -1, flmr.dim)
            if vis_out is not None:
                mapped_in = self.transformer_mapping_input_linear(second_last)
                xatt = flmr.transformer_mapping_cross_attention_length
                enc_states = text_hidden[:, :xatt]
                n_roi = mapped_in.shape[0] // batch_size
                if n_roi > 1:
                    enc_states = jnp.repeat(enc_states, n_roi, axis=0)
                enc_bias = additive_mask(jnp.ones(enc_states.shape[:2], jnp.int32))
                mapped, _ = self.transformer_mapping_network(
                    mapped_in, mask_bias=None,
                    encoder_hidden_states=enc_states, encoder_mask_bias=enc_bias,
                )
                mapped = self.transformer_mapping_output_linear(mapped)
                mapped = mapped.reshape(batch_size, -1, flmr.dim)
                vision_embeddings = jnp.concatenate([vision_embeddings, mapped], axis=1)

        Q = (
            jnp.concatenate([text_embeddings, vision_embeddings], axis=1)
            if vision_embeddings is not None
            else text_embeddings
        )
        return _l2_normalize(Q), text_mask[..., 0]

    def _score(self, reranker_inputs, reranker_attention_mask, attention_adj,
               batch_size, num_negative_examples, labels, token_type_ids=None):
        logits1, logits2 = self.reranker(
            reranker_inputs,
            attention_mask=reranker_attention_mask,
            attention_adj=attention_adj,
            token_type_ids=token_type_ids,
        )
        cfg = self.config
        logits, lbl = prepare_logits_labels(
            cfg.loss_fn, logits1, logits2, batch_size, num_negative_examples, labels
        )
        if cfg.replicate_reference_loss_bug:
            loss = rerank_loss(cfg.loss_fn, logits, logits, cfg.pos_weight)
        else:
            loss = rerank_loss(cfg.loss_fn, logits, lbl, cfg.pos_weight)
        return RerankOutput(loss=loss, logits=primary_logits(cfg.loss_fn, logits))


class RerankModel(_RerankBase):
    """Spliced-query monoPreFLMR reranker (reference `rerank_model.py:171-331`)."""

    @nn.compact
    def __call__(
        self,
        query_input_ids,
        query_attention_mask,
        query_pixel_values,
        context_input_ids,
        context_attention_mask,
        num_negative_examples: int,
        preflmr_scores=None,
        fusion_multiplier: float = 1.0,
        labels=None,
        mask_instructions: Optional[bool] = None,
    ):
        cfg = self.config
        batch_size = query_input_ids.shape[0]
        nway = num_negative_examples + 1
        expanded = batch_size * nway
        assert context_input_ids.shape[0] == expanded

        q_ids = jnp.repeat(query_input_ids, nway, axis=0)
        q_mask = jnp.repeat(query_attention_mask, nway, axis=0)
        # text-only mode (no vision rows): the reference's RerankModel always
        # feeds pixels, but its text_only module zeroes the vision branch
        # (`rerank_model.py:352-358`); skipping the ViT entirely is the
        # TPU-first equivalent
        pix = (
            None if query_pixel_values is None
            else jnp.repeat(query_pixel_values, nway, axis=0)
        )

        Lq = q_ids.shape[1]
        Lc = context_input_ids.shape[1]
        # splice query into context, budgeted to the text encoder's positions
        # (`rerank_model.py:204-224`): keep context tokens [2 : Lc-Lq+2]
        joint_ids = jnp.concatenate(
            [q_ids, context_input_ids[:, 2 : Lc - Lq + 2]], axis=1
        )
        joint_mask = jnp.concatenate(
            [q_mask, context_attention_mask[:, 2 : Lc - Lq + 2]], axis=1
        )

        mask_instr = (
            cfg.flmr.mask_instruction if mask_instructions is None else mask_instructions
        )
        Q, text_mask = self.encode_query(
            joint_ids, joint_mask, pixel_values=pix, mask_instructions=mask_instr
        )
        reranker_inputs = self.cross_encoder_input_mapping(Q)

        n_rows = reranker_inputs.shape[1]
        ctx_rows = joint_ids.shape[1]  # == Lc (query spliced in place of tail)
        img_rows = n_rows - ctx_rows
        reranker_attention_mask = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((expanded, img_rows), jnp.int32)],
            axis=1,
        )

        # reorder rows to [query_text, image, context] (`:256-274`)
        def reorder(x):
            return jnp.concatenate(
                [x[:, :Lq], x[:, ctx_rows:], x[:, Lq:ctx_rows]], axis=1
            )

        reranker_inputs = reorder(reranker_inputs)
        reranker_attention_mask = reorder(
            reranker_attention_mask[:, :, None]
        )[..., 0]

        attention_adj = None
        if preflmr_scores is not None:
            truncated = preflmr_scores[:, 2 : Lc - Lq + 2, :]
            attention_adj = fusion_attention_adj(
                truncated,
                query_rows=Lq + img_rows,
                context_rows=ctx_rows - Lq,
                fusion_multiplier=fusion_multiplier,
            )

        return self._score(
            reranker_inputs, reranker_attention_mask, attention_adj,
            batch_size, num_negative_examples, labels,
        )


class FullContextRerankModel(_RerankBase):
    """Joint-retokenization monoPreFLMR reranker (reference
    `rerank_model.py:515-591`). Inputs come pre-tokenized as sentence pairs
    (host-side :func:`prepare_full_context_inputs` in
    ``models.tokenization``)."""

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        query_pixel_values,
        num_negative_examples: int,
        labels=None,
        vision_feats=None,
    ):
        cfg = self.config
        nway = num_negative_examples + 1
        expanded = input_ids.shape[0]
        batch_size = expanded // nway
        text_only = query_pixel_values is None and vision_feats is None

        pix = (
            None
            if (text_only or vision_feats is not None)
            else jnp.repeat(query_pixel_values, nway, axis=0)
        )
        Q, text_mask = self.encode_query(
            input_ids, attention_mask, pixel_values=pix,
            mask_instructions=False, token_type_ids=token_type_ids,
            vision_feats=vision_feats,
        )
        reranker_inputs = self.cross_encoder_input_mapping(Q)
        if text_only:
            reranker_attention_mask = text_mask.astype(jnp.int32)
        else:
            img_rows = reranker_inputs.shape[1] - text_mask.shape[1]
            reranker_attention_mask = jnp.concatenate(
                [text_mask.astype(jnp.int32), jnp.ones((expanded, img_rows), jnp.int32)],
                axis=1,
            )
        return self._score(
            reranker_inputs, reranker_attention_mask, None,
            batch_size, num_negative_examples, labels,
        )
