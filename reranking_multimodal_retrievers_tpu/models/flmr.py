"""FLMR / PreFLMR late-interaction multimodal retriever in Flax.

TPU-native re-design of the reference ``FLMRModelForRetrieval``
(`src/models/flmr/models/flmr/modeling_flmr.py:553-1610`):

- query side: BERT text encoder → linear to ``dim`` → token mask
  (`modeling_flmr.py:1263-1276`); CLIP-ViT CLS → 2-layer tanh MLP producing
  ``mapping_network_prefix_length`` vision tokens (`:1292-1305`); optionally a
  shallow cross-attention BertEncoder over the ViT second-to-last layer
  conditioned on the first 32 text hidden states (`:1307-1353`); concat and
  L2-normalize (`:1358-1370`).
- doc side: text-only by default with punctuation-skiplist masking
  (`:1489-1510`); vision prefix tokens *prepended* when multimodal docs
  (`:1536-1541`); L2-normalize.
- losses: CE over (1 positive + N negatives) aligned scores (`:931-942`) and
  the all-pairs in-batch-negative loss (`compute_ib_loss_new`, `:1093-1125`).

Differences by design (not omissions):
- pure functions, static shapes, no ``.to(device)`` plumbing;
- masking from token ids is vectorized (``jnp.isin`` over a static skiplist)
  instead of per-row Python loops (`modeling_flmr.py:758-782,1604-1609`);
- cross-chip in-batch negatives use ``jax.lax.all_gather`` over a named mesh
  axis inside the SPMD program instead of ``dist.all_gather`` with manual
  detach bookkeeping (`modeling_flmr.py:1127-1194`) — gradients flow through
  the collective, which subsumes the reference's local-grads-only trick;
- dropout is off (deterministic); the reference relies on HF defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from .bert import BertConfig, BertModel, BertEncoder, additive_mask
from .vit import CLIPVisionConfig, CLIPVisionModel
from ..ops.maxsim import colbert_score, in_batch_maxsim_scores


@dataclasses.dataclass(frozen=True)
class FLMRConfig:
    """Mirrors the reference `configuration_flmr.py:256-397` field-for-field
    where the field affects computation. Tokenizer-derived values (punctuation
    skiplist ids, instruction token id) are static members here because the
    model is a pure function of arrays."""

    text_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    vision_config: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    dim: int = 128
    mapping_network_prefix_length: int = 32
    use_vision_encoder: bool = True
    initializer_range: float = 0.02
    separate_query_and_context_text_encoder: bool = False
    separate_query_and_context_vision_encoder: bool = False
    query_concat_output_from_vision_encoder: bool = True
    query_concat_output_from_text_encoder: bool = True
    context_concat_output_from_vision_encoder: bool = False
    context_concat_output_from_text_encoder: bool = True
    use_transformer_mapping_network: bool = False
    transformer_mapping_num_hidden_layers: int = 1
    transformer_mapping_cross_attention_length: int = 32
    mask_punctuation: bool = True
    # static token-id sets derived from the tokenizer at config-build time
    punctuation_token_ids: Tuple[int, ...] = ()
    mask_instruction: bool = False
    instruction_token_id: int = -1

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            text_config=BertConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            dim=16,
            mapping_network_prefix_length=4,
            use_transformer_mapping_network=True,
            transformer_mapping_num_hidden_layers=1,
            punctuation_token_ids=(5, 6, 7),
        )
        defaults.update(kw)
        return cls(**defaults)

    @property
    def transformer_mapping_config(self) -> BertConfig:
        return dataclasses.replace(
            self.text_config,
            num_hidden_layers=self.transformer_mapping_num_hidden_layers,
            add_cross_attention=True,
        )


@flax.struct.dataclass
class FLMRQueryOutput:
    late_interaction_output: jax.Array  # [B, L_q(+vis), dim], L2-normalized
    query_mask: jax.Array  # [B, L_q(+vis)] int — valid (non-[MASK]-pad) rows
    pooler_output: jax.Array  # [B, dim]


@flax.struct.dataclass
class FLMRContextOutput:
    late_interaction_output: jax.Array  # [B, (vis+)L_d, dim], L2-normalized
    context_mask: jax.Array  # [B, (vis+)L_d] bool — skiplist/pad mask
    pooler_output: jax.Array  # [B, dim]


@flax.struct.dataclass
class FLMRForwardOutput:
    loss: jax.Array
    in_batch_negative_loss: Optional[jax.Array]
    scores: jax.Array  # [B, 1+num_negatives]
    scores_raw: jax.Array  # [B·nway, L_d, L_q] masked token-score matrix
    query_late_interaction_output: jax.Array
    context_late_interaction_output: jax.Array
    query_mask: jax.Array
    context_mask: jax.Array


def token_skiplist_mask(input_ids: jax.Array, skiplist: Tuple[int, ...]) -> jax.Array:
    """Reference ``mask()`` (`modeling_flmr.py:1604-1609`): True where the
    token is neither pad (id 0) nor in the skiplist."""
    keep = input_ids != 0
    if skiplist:
        keep &= ~jnp.isin(input_ids, jnp.asarray(skiplist))
    return keep


def query_instruction_mask(
    input_ids: jax.Array, instruction_token_id: int
) -> jax.Array:
    """Reference ``query_mask()`` instruction masking (`modeling_flmr.py:758-782`):
    keep positions strictly after the first instruction-end token, plus
    positions 0 and 1 ([CLS] and the [Q] marker); positions at/before the
    separator are masked. Falls back to position 1 when no separator found."""
    is_sep = (input_ids == instruction_token_id).astype(jnp.int32)
    sep_pos = jnp.argmax(is_sep, axis=1)
    sep_pos = jnp.maximum(sep_pos, 1)
    idx = jnp.arange(input_ids.shape[1])[None, :]
    keep = (idx > sep_pos[:, None]) | (idx < 2)
    return keep & (input_ids != 0)


class VisionProjection(nn.Module):
    """2-layer tanh MLP: vision CLS → prefix_length × dim tokens
    (reference ``FLMRMultiLayerPerceptron``, `modeling_flmr.py:531-546,602-614`)."""

    out_dim: int
    prefix_length: int

    @nn.compact
    def __call__(self, x):
        total = self.out_dim * self.prefix_length
        x = nn.Dense(total // 2, name="fc1")(x)
        x = nn.tanh(x)
        x = nn.Dense(total, name="fc2")(x)
        return x.reshape(x.shape[0], self.prefix_length, self.out_dim)


class FLMRModelForRetrieval(nn.Module):
    config: FLMRConfig

    def setup(self):
        cfg = self.config
        self.context_text_encoder = BertModel(cfg.text_config, name="context_text_encoder")
        self.context_text_encoder_linear = nn.Dense(
            cfg.dim, use_bias=False, name="context_text_encoder_linear"
        )
        if cfg.separate_query_and_context_text_encoder:
            self.query_text_encoder_ = BertModel(cfg.text_config, name="query_text_encoder")
            self.query_text_encoder_linear_ = nn.Dense(
                cfg.dim, use_bias=False, name="query_text_encoder_linear"
            )
        if cfg.use_vision_encoder:
            self.context_vision_encoder = CLIPVisionModel(
                cfg.vision_config, name="context_vision_encoder"
            )
            self.context_vision_projection = VisionProjection(
                cfg.dim, cfg.mapping_network_prefix_length,
                name="context_vision_projection",
            )
            if cfg.separate_query_and_context_vision_encoder:
                self.query_vision_encoder_ = CLIPVisionModel(
                    cfg.vision_config, name="query_vision_encoder"
                )
                self.query_vision_projection_ = VisionProjection(
                    cfg.dim, cfg.mapping_network_prefix_length,
                    name="query_vision_projection",
                )
            if cfg.use_transformer_mapping_network:
                self.transformer_mapping_input_linear = nn.Dense(
                    cfg.text_config.hidden_size,
                    name="transformer_mapping_input_linear",
                )
                self.transformer_mapping_network = BertEncoder(
                    cfg.transformer_mapping_config, name="transformer_mapping_network"
                )
                self.transformer_mapping_output_linear = nn.Dense(
                    cfg.dim, name="transformer_mapping_output_linear"
                )

    # --- encoder dispatch (tied vs separate, reference `modeling_flmr.py:666-691`)
    def _query_text_encoder(self, ids, mask):
        if self.config.separate_query_and_context_text_encoder:
            out = self.query_text_encoder_(ids, mask)
            return out, self.query_text_encoder_linear_
        return self.context_text_encoder(ids, mask), self.context_text_encoder_linear

    def _query_vision(self, pixel_values):
        if self.config.separate_query_and_context_vision_encoder:
            return self.query_vision_encoder_(pixel_values), self.query_vision_projection_
        return self.context_vision_encoder(pixel_values), self.context_vision_projection

    # --- public API -------------------------------------------------------
    def query(
        self,
        input_ids: Optional[jax.Array],
        attention_mask: Optional[jax.Array],
        pixel_values: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        concat_output_from_vision_encoder: Optional[bool] = None,
        concat_output_from_text_encoder: Optional[bool] = None,
    ) -> FLMRQueryOutput:
        """Reference `modeling_flmr.py:1200-1426`."""
        cfg = self.config
        if concat_output_from_vision_encoder is None:
            concat_output_from_vision_encoder = cfg.query_concat_output_from_vision_encoder
        if concat_output_from_text_encoder is None:
            concat_output_from_text_encoder = cfg.query_concat_output_from_text_encoder

        text_embeddings = None
        text_mask = None
        text_hidden = None
        if input_ids is not None:
            text_out, linear = self._query_text_encoder(input_ids, attention_mask)
            text_hidden = text_out["last_hidden_state"]
            text_embeddings = linear(text_hidden)
            if cfg.mask_instruction:
                keep = query_instruction_mask(input_ids, cfg.instruction_token_id)
            else:
                keep = token_skiplist_mask(input_ids, ())
            text_mask = keep.astype(text_embeddings.dtype)[:, :, None]
            text_embeddings = text_embeddings * text_mask

        vision_embeddings = None
        if pixel_values is not None or image_features is not None:
            if pixel_values is not None:
                batch_size = pixel_values.shape[0]
                if pixel_values.ndim == 5:  # multiple ROIs: merge into batch
                    pixel_values = pixel_values.reshape(
                        (-1,) + pixel_values.shape[2:]
                    )
                vis_out, projection = self._query_vision(pixel_values)
                vision_cls = vis_out["last_hidden_state"][:, 0]
            else:
                batch_size = image_features.shape[0]
                vis_out = None
                projection = (
                    self.query_vision_projection_
                    if cfg.separate_query_and_context_vision_encoder
                    else self.context_vision_projection
                )
                vision_cls = image_features
            vision_embeddings = projection(vision_cls)
            vision_embeddings = vision_embeddings.reshape(batch_size, -1, cfg.dim)

            if cfg.use_transformer_mapping_network and vis_out is not None:
                # second-to-last ViT layer, without the CLS token (`:1309-1311`)
                second_last = vis_out["hidden_states"][-2][:, 1:]
                mapped_in = self.transformer_mapping_input_linear(second_last)
                xatt_len = cfg.transformer_mapping_cross_attention_length
                enc_states = text_hidden[:, :xatt_len]
                # ROI inputs merged into the batch: repeat text states per ROI
                # (the reference crashes on this combination — generalized here)
                n_roi = mapped_in.shape[0] // batch_size
                if n_roi > 1:
                    enc_states = jnp.repeat(enc_states, n_roi, axis=0)
                # the reference builds an all-ones cross-attention mask (`:1320`)
                enc_bias = additive_mask(
                    jnp.ones(enc_states.shape[:2], dtype=jnp.int32)
                )
                mapped, _ = self.transformer_mapping_network(
                    mapped_in,
                    mask_bias=None,
                    encoder_hidden_states=enc_states,
                    encoder_mask_bias=enc_bias,
                )
                mapped = self.transformer_mapping_output_linear(mapped)
                mapped = mapped.reshape(batch_size, -1, cfg.dim)
                vision_embeddings = jnp.concatenate(
                    [vision_embeddings, mapped], axis=1
                )

        # no vision inputs → text-only, regardless of the config default
        # (the reference resolves these flags from the inputs, `:788-830`)
        if vision_embeddings is None:
            concat_output_from_vision_encoder = False
        if text_embeddings is None:
            concat_output_from_text_encoder = False
        if concat_output_from_vision_encoder and concat_output_from_text_encoder:
            Q = jnp.concatenate([text_embeddings, vision_embeddings], axis=1)
        elif concat_output_from_vision_encoder:
            Q = vision_embeddings
        else:
            Q = text_embeddings

        # query_mask: text rows valid iff attended AND kept by the token mask;
        # vision rows always valid (`modeling_flmr.py:1365-1370`)
        parts = []
        if concat_output_from_text_encoder and text_embeddings is not None:
            qm = (attention_mask[:, :, None] * text_mask > 0).astype(jnp.int32)[..., 0]
            parts.append(qm)
        if concat_output_from_vision_encoder and vision_embeddings is not None:
            parts.append(
                jnp.ones(vision_embeddings.shape[:2], dtype=jnp.int32)
            )
        query_mask = jnp.concatenate(parts, axis=1)

        Q = _l2_normalize(Q)
        return FLMRQueryOutput(
            late_interaction_output=Q,
            query_mask=query_mask,
            pooler_output=Q[:, 0, :],
        )

    def doc(
        self,
        input_ids: Optional[jax.Array],
        attention_mask: Optional[jax.Array],
        pixel_values: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        concat_output_from_vision_encoder: Optional[bool] = None,
        concat_output_from_text_encoder: Optional[bool] = None,
    ) -> FLMRContextOutput:
        """Reference `modeling_flmr.py:1432-1599`. Vision tokens (if any) are
        PREPENDED so valid tokens stay contiguous, matching `:1536-1541`."""
        cfg = self.config
        if concat_output_from_vision_encoder is None:
            concat_output_from_vision_encoder = cfg.context_concat_output_from_vision_encoder
        if concat_output_from_text_encoder is None:
            concat_output_from_text_encoder = cfg.context_concat_output_from_text_encoder

        text_embeddings = None
        text_mask = None
        if input_ids is not None:
            text_out = self.context_text_encoder(input_ids, attention_mask)
            text_embeddings = self.context_text_encoder_linear(
                text_out["last_hidden_state"]
            )
            skiplist = cfg.punctuation_token_ids if cfg.mask_punctuation else ()
            keep = token_skiplist_mask(input_ids, skiplist)
            text_mask = keep.astype(text_embeddings.dtype)[:, :, None]
            text_embeddings = text_embeddings * text_mask

        vision_embeddings = None
        image_mask = None
        if pixel_values is not None or image_features is not None:
            if pixel_values is not None:
                vis_out = self.context_vision_encoder(pixel_values)
                vision_cls = vis_out["last_hidden_state"][:, 0]
            else:
                vision_cls = image_features
            vision_embeddings = self.context_vision_projection(vision_cls)
            vision_embeddings = vision_embeddings.reshape(
                -1, cfg.mapping_network_prefix_length, cfg.dim
            )
            image_mask = jnp.ones(
                vision_embeddings.shape[:2], dtype=(text_mask.dtype if text_mask is not None else jnp.float32)
            )[:, :, None]

        if concat_output_from_vision_encoder and concat_output_from_text_encoder:
            D = jnp.concatenate([vision_embeddings, text_embeddings], axis=1)
            mask = jnp.concatenate([image_mask, text_mask], axis=1)
        elif concat_output_from_vision_encoder:
            D, mask = vision_embeddings, image_mask
        else:
            D, mask = text_embeddings, text_mask

        D = _l2_normalize(D)
        return FLMRContextOutput(
            late_interaction_output=D,
            context_mask=mask[..., 0].astype(bool),
            pooler_output=D[:, 0, :],
        )

    def __call__(
        self,
        query_input_ids: jax.Array,
        query_attention_mask: jax.Array,
        context_input_ids: jax.Array,
        context_attention_mask: jax.Array,
        query_pixel_values: Optional[jax.Array] = None,
        query_image_features: Optional[jax.Array] = None,
        context_pixel_values: Optional[jax.Array] = None,
        context_image_features: Optional[jax.Array] = None,
        use_in_batch_negatives: bool = True,
        num_negative_examples: int = 1,
        gather_axis_name: Optional[str] = None,
    ) -> FLMRForwardOutput:
        """Training forward (reference `modeling_flmr.py:788-1096`).

        ``context_*`` batches are ``batch_size * (1 + num_negative_examples)``
        rows, positives first in each group. When ``gather_axis_name`` is set
        (inside pjit/shard_map over a mesh axis), Q/D/D_mask are all-gathered
        across that axis before the in-batch-negative loss — the TPU
        equivalent of `gather_tensors_from_other_gpus` (`:1127-1194`).
        """
        query_out = self.query(
            query_input_ids, query_attention_mask,
            pixel_values=query_pixel_values, image_features=query_image_features,
        )
        Q = query_out.late_interaction_output
        context_out = self.doc(
            context_input_ids, context_attention_mask,
            pixel_values=context_pixel_values, image_features=context_image_features,
        )
        D = context_out.late_interaction_output
        D_mask = context_out.context_mask

        if gather_axis_name is not None:
            Q_all = jax.lax.all_gather(Q, gather_axis_name, tiled=True)
            D_all = jax.lax.all_gather(D, gather_axis_name, tiled=True)
            D_mask_all = jax.lax.all_gather(D_mask, gather_axis_name, tiled=True)
        else:
            Q_all, D_all, D_mask_all = Q, D, D_mask

        nway = num_negative_examples + 1
        Q_dup = jnp.repeat(Q, nway, axis=0)
        scores, scores_raw = colbert_score(Q_dup, D, D_mask)
        scores = scores.reshape(-1, nway)
        labels = jnp.zeros(scores.shape[0], dtype=jnp.int32)
        loss = _softmax_ce(scores, labels)

        ib_loss = None
        if use_in_batch_negatives:
            ib_scores = in_batch_maxsim_scores(Q_all, D_all, D_mask_all)
            ib_labels = jnp.arange(Q_all.shape[0], dtype=jnp.int32) * nway
            ib_loss = _softmax_ce(ib_scores, ib_labels)

        return FLMRForwardOutput(
            loss=loss,
            in_batch_negative_loss=ib_loss,
            scores=scores,
            scores_raw=scores_raw,
            query_late_interaction_output=Q,
            context_late_interaction_output=D,
            query_mask=query_out.query_mask,
            context_mask=D_mask,
        )


def _l2_normalize(x, axis=-1, eps=1e-12):
    """L2-normalize with a NaN-safe gradient at zero rows.

    Masked (all-zero) token rows are common here — padded/skiplisted doc
    tokens are zeroed before normalization — and the naive
    ``x / max(||x||, eps)`` form has a NaN *gradient* at ``x = 0`` (the chain
    rule hits ``d sqrt(0) = inf`` before ``maximum`` can mask it). Taking the
    max on the squared norm inside ``rsqrt`` keeps the forward value identical
    and makes the backward pass exactly 0 at zero rows, matching torch
    ``F.normalize``'s subgradient (reference `modeling_flmr.py:1371,1553`)."""
    x32 = x.astype(jnp.float32)
    sq = jnp.sum(x32 * x32, axis=axis, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, eps * eps))
    return (x32 * inv).astype(x.dtype)


def _softmax_ce(logits, labels):
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)
