"""monoBLIP-2 decoder rerankers, TPU-native.

The reference family (`src/models/rerank/decoder_rerank_model.py:81-247`)
scores (query, document) pairs with a vision-conditioned seq2seq LM:

- Model A (``DecoderRerankModel``): prompt ``"Query: {q} Document: {d}
  Relevant:"``; loss = seq2seq CE on the "yes"/"no" target; ranking score =
  softmax(yes,no)[yes] at the first decoder position (`:147-159`).
- Model B (``DecoderHeadRerankModel``): prompt ends with a ``<GEN>`` token;
  two bias-free linear heads over the hidden state at ``<GEN>`` (causal LM)
  or the first decoder step (T5) (`:233-247`), with the shared loss
  vocabulary.

TPU-native design: the backbone here is a compact native vision-seq2seq
transformer — CLIP-ViT CLS → MLP prefix tokens in place of BLIP-2's Q-Former,
a bidirectional encoder and a causal decoder with cross-attention — with the
reference's LoRA recipe (r=8, α=32) as first-class ``LoRADense`` adapters on
the attention projections. The scoring/loss interfaces are exactly the
reference's, so a bridged BLIP-2/Flan-T5 checkpoint can replace the backbone
without touching the executors (bridge scheduled per SURVEY.md §7 step 5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from ..bert import BertConfig, BertAttention, additive_mask, ATTN_MASK_BIAS
from ..vit import CLIPVisionConfig, CLIPVisionModel
from ..lora import LoRADense
from .losses import prepare_logits_labels, rerank_loss, primary_logits
from .rerank_model import RerankOutput

POSITIVE_LABEL = "yes"
NEGATIVE_LABEL = "no"
GENERATION_TOKEN = "<GEN>"


@dataclasses.dataclass(frozen=True)
class DecoderRerankConfig:
    text_config: BertConfig = dataclasses.field(default_factory=BertConfig)
    vision_config: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    num_decoder_layers: int = 2
    vision_prefix_length: int = 8
    lora_r: int = 8
    lora_alpha: float = 32.0
    yes_token_id: int = 0
    no_token_id: int = 1
    gen_token_id: int = 2
    decoder_start_token_id: int = 0
    loss_fn: str = "BCE"
    pos_weight: Optional[float] = None

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            text_config=BertConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            num_decoder_layers=1,
            vision_prefix_length=2,
            yes_token_id=10,
            no_token_id=11,
            gen_token_id=12,
        )
        defaults.update(kw)
        return cls(**defaults)


class _DecoderLayer(nn.Module):
    """Causal self-attention + cross-attention + FFN (post-LN residuals)."""

    config: BertConfig
    lora_r: int = 0
    lora_alpha: float = 32.0

    @nn.compact
    def __call__(self, x, causal_bias, enc_states, enc_bias):
        cfg = self.config
        x = BertAttention(cfg, name="self_attention")(x, mask_bias=causal_bias)
        x = BertAttention(cfg, name="cross_attention")(
            x, kv_states=enc_states, mask_bias=enc_bias
        )
        h = LoRADense(cfg.intermediate_size, r=self.lora_r, alpha=self.lora_alpha,
                      name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = LoRADense(cfg.hidden_size, r=self.lora_r, alpha=self.lora_alpha,
                      name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(h + x)


class VisionSeq2SeqLM(nn.Module):
    """Compact vision-conditioned encoder-decoder LM with LoRA adapters."""

    config: DecoderRerankConfig

    def setup(self):
        cfg = self.config
        tc = cfg.text_config
        self.vision_encoder = CLIPVisionModel(cfg.vision_config, name="vision_encoder")
        self.vision_projection = nn.Dense(
            tc.hidden_size * cfg.vision_prefix_length, name="vision_projection"
        )
        init = nn.initializers.normal(tc.initializer_range)
        self.embed = nn.Embed(tc.vocab_size, tc.hidden_size, embedding_init=init,
                              name="embed")
        self.pos_embed = nn.Embed(
            tc.max_position_embeddings, tc.hidden_size, embedding_init=init,
            name="pos_embed",
        )
        from ..bert import BertLayer

        self.encoder_layers = [
            BertLayer(tc, name=f"encoder_layer_{i}")
            for i in range(tc.num_hidden_layers)
        ]
        self.decoder_layers = [
            _DecoderLayer(tc, lora_r=cfg.lora_r, lora_alpha=cfg.lora_alpha,
                          name=f"decoder_layer_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=tc.layer_norm_eps, name="final_norm")
        self.lm_head = nn.Dense(tc.vocab_size, use_bias=False, name="lm_head")

    def vision_prefix(self, pixel_values):
        """[B, vision_prefix_length, H] projected vision tokens — computed
        once per image and repeated over candidates by callers that pair one
        image with K text prompts (RAG per-doc generation)."""
        cfg = self.config
        vis = self.vision_encoder(pixel_values)["last_hidden_state"][:, 0]
        return self.vision_projection(vis).reshape(
            pixel_values.shape[0], cfg.vision_prefix_length, -1
        )

    def encode(self, input_ids, attention_mask, pixel_values=None,
               vision_prefix=None):
        cfg = self.config
        x = self.embed(input_ids)
        x = x + self.pos_embed(jnp.arange(x.shape[1])[None, :])
        if vision_prefix is None and pixel_values is not None:
            vision_prefix = self.vision_prefix(pixel_values)
        if vision_prefix is not None:
            prefix = vision_prefix.astype(x.dtype)
            x = jnp.concatenate([prefix, x], axis=1)
            attention_mask = jnp.concatenate(
                [
                    jnp.ones((x.shape[0], cfg.vision_prefix_length), jnp.int32),
                    attention_mask,
                ],
                axis=1,
            )
        bias = additive_mask(attention_mask)
        for layer in self.encoder_layers:
            x = layer(x, mask_bias=bias)
        return x, attention_mask

    def decode(self, decoder_input_ids, enc_states, enc_attention_mask):
        L = decoder_input_ids.shape[1]
        x = self.embed(decoder_input_ids)
        x = x + self.pos_embed(jnp.arange(L)[None, :])
        causal = jnp.tril(jnp.ones((L, L), jnp.float32))
        causal_bias = (1.0 - causal)[None, None] * ATTN_MASK_BIAS
        enc_bias = additive_mask(enc_attention_mask)
        for layer in self.decoder_layers:
            x = layer(x, causal_bias, enc_states, enc_bias)
        x = self.final_norm(x)
        return self.lm_head(x), x  # (logits, hidden)

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 pixel_values=None):
        enc_states, enc_mask = self.encode(input_ids, attention_mask, pixel_values)
        return self.decode(decoder_input_ids, enc_states, enc_mask)


@flax.struct.dataclass
class DecoderRerankOutput:
    loss: jax.Array
    logits: jax.Array  # [expanded, 1] — p(yes) for Model A, head logits for B


class DecoderRerankModel(nn.Module):
    """Model A — yes/no probability scoring (reference `:121-159`)."""

    config: DecoderRerankConfig

    def setup(self):
        self.model = VisionSeq2SeqLM(self.config, name="model")

    def __call__(
        self,
        input_ids,
        attention_mask,
        pixel_values,
        num_negative_examples: int,
        labels=None,
    ):
        """``input_ids``: tokenized ``"Query: {q} Document: {d} Relevant:"``
        prompts, one row per (query, candidate); ``labels``: optional [B*(N+1)]
        binary relevance (default: first doc per group positive)."""
        cfg = self.config
        expanded = input_ids.shape[0]
        nway = num_negative_examples + 1
        batch_size = expanded // nway
        if labels is None:
            lbl = jnp.tile(
                jnp.zeros((nway,), jnp.int32).at[0].set(1), (batch_size,)
            )
        else:
            lbl = jnp.asarray(labels, jnp.int32).reshape(-1)
        target = jnp.where(lbl == 1, cfg.yes_token_id, cfg.no_token_id)

        pix = (
            jnp.repeat(pixel_values, nway, axis=0) if pixel_values is not None else None
        )
        dec_in = jnp.full((expanded, 1), cfg.decoder_start_token_id, jnp.int32)
        logits, _ = self.model(input_ids, attention_mask, dec_in, pixel_values=pix)
        first = logits[:, 0, :].astype(jnp.float32)

        # seq2seq CE on the yes/no target (HF `labels=` semantics)
        logz = jax.nn.logsumexp(first, axis=-1)
        gold = jnp.take_along_axis(first, target[:, None], axis=-1)[:, 0]
        loss = jnp.mean(logz - gold)

        yes = first[:, cfg.yes_token_id]
        no = first[:, cfg.no_token_id]
        p_yes = jax.nn.softmax(jnp.stack([yes, no], axis=-1), axis=-1)[:, 0:1]
        return DecoderRerankOutput(loss=loss, logits=p_yes)


class DecoderHeadRerankModel(nn.Module):
    """Model B — two heads over the ``<GEN>``/first-decoder-step hidden state
    (reference `:208-247`)."""

    config: DecoderRerankConfig

    def setup(self):
        cfg = self.config
        self.model = VisionSeq2SeqLM(cfg, name="model")
        self.classifier1 = nn.Dense(1, use_bias=False, name="classifier1")
        self.classifier2 = nn.Dense(1, use_bias=False, name="classifier2")

    def __call__(
        self,
        input_ids,
        attention_mask,
        pixel_values,
        num_negative_examples: int,
        labels=None,
    ):
        cfg = self.config
        expanded = input_ids.shape[0]
        nway = num_negative_examples + 1
        batch_size = expanded // nway
        pix = (
            jnp.repeat(pixel_values, nway, axis=0) if pixel_values is not None else None
        )
        dec_in = jnp.full((expanded, 1), cfg.decoder_start_token_id, jnp.int32)
        _, hidden = self.model(input_ids, attention_mask, dec_in, pixel_values=pix)
        rel = hidden[:, 0]  # first decoder step (T5-style branch, `:236-237`)
        logits1 = self.classifier1(rel)
        logits2 = self.classifier2(rel)
        logits, lbl = prepare_logits_labels(
            cfg.loss_fn, logits1, logits2, batch_size, num_negative_examples,
            labels,
        )
        loss = rerank_loss(cfg.loss_fn, logits, lbl, cfg.pos_weight)
        return DecoderRerankOutput(
            loss=loss, logits=primary_logits(cfg.loss_fn, logits)
        )


class Blip2DecoderRerankModel(nn.Module):
    """Model A with the real BLIP-2 backbone (vision + Q-Former + Flan-T5
    with LoRA) — the reference's best reranker
    (`decoder_rerank_model.py:81-159`; OK-VQA R@5 0.40/0.36, BASELINE.md).

    Bridge pretrained ``Salesforce/blip2-flan-t5-*`` weights via
    ``hf_bridge.blip2_params``. Scoring matches the reference exactly:
    seq2seq CE on the yes/no target and ranking by
    softmax(yes,no)[yes] at the first decoder step (`:147-159`).

    TPU-first: the vision+Q-Former prefix is computed once per *image* and
    broadcast over the candidate documents (``vision_feats``), instead of the
    reference's ``pixel_values.repeat_interleave(docs_per_query)``
    (`:145`)."""

    config: "Blip2RerankConfig"

    def setup(self):
        from ..blip2 import Blip2ForConditionalGeneration

        self.model = Blip2ForConditionalGeneration(
            self.config.blip2, name="model"
        )

    def encode_vision(self, pixel_values):
        """[B, num_query_tokens, d_model] projected Q-Former prefix."""
        from ..blip2 import Blip2ForConditionalGeneration

        return self.model.vision_prefix(pixel_values)

    def __call__(
        self,
        input_ids,
        attention_mask,
        pixel_values,
        num_negative_examples: int,
        labels=None,
        vision_feats=None,
    ):
        cfg = self.config
        expanded = input_ids.shape[0]
        nway = num_negative_examples + 1
        batch_size = expanded // nway
        if labels is None:
            lbl = jnp.tile(
                jnp.zeros((nway,), jnp.int32).at[0].set(1), (batch_size,)
            )
        else:
            lbl = jnp.asarray(labels, jnp.int32).reshape(-1)
        target = jnp.where(lbl == 1, cfg.yes_token_id, cfg.no_token_id)

        prefix = None
        if vision_feats is not None:
            prefix = vision_feats
        elif pixel_values is not None:
            prefix = jnp.repeat(
                self.model.vision_prefix(pixel_values), nway, axis=0
            )
        if cfg.blip2.use_decoder_only_language_model:
            # monoBLIP2-Opt: the last real prompt position predicts the
            # yes/no token (HF slices logits to the label window and the
            # reference reads its first row, `decoder_rerank_model.py:147-150`
            # + `modeling_blip_2.py:1445-1447`). TPU-first: gather the hidden
            # state at that position FIRST (`causal_last_hidden`) and project
            # only it through the 50k-vocab head — a [K, 1, V] matmul instead
            # of [K, L+prefix, V] (identical logits; the full-vocab
            # projection over prompt positions is the dominant avoidable
            # cost at opt-2.7b scale).
            rel = self.model.causal_last_hidden(
                input_ids, attention_mask, vision_prefix=prefix
            )
            first = self.model.language_model.lm_logits(
                rel[:, None, :])[:, 0, :].astype(jnp.float32)
        else:
            dec_in = jnp.full(
                (expanded, 1), cfg.blip2.text_config.decoder_start_token_id,
                jnp.int32,
            )
            logits, _ = self.model(
                input_ids, attention_mask, dec_in, vision_prefix=prefix
            )
            first = logits[:, 0, :].astype(jnp.float32)
        logz = jax.nn.logsumexp(first, axis=-1)
        gold = jnp.take_along_axis(first, target[:, None], axis=-1)[:, 0]
        loss = jnp.mean(logz - gold)
        yes = first[:, cfg.yes_token_id]
        no = first[:, cfg.no_token_id]
        p_yes = jax.nn.softmax(jnp.stack([yes, no], axis=-1), axis=-1)[:, 0:1]
        return DecoderRerankOutput(loss=loss, logits=p_yes)


class Blip2DecoderHeadRerankModel(nn.Module):
    """Model B with the BLIP-2 backbone (reference
    ``DecoderHeadRerankModel``, `decoder_rerank_model.py:162-247` — the
    monoBLIP2-*_pointwise configs): two bias-free linear heads over the
    hidden state at the ``<GEN>`` prompt position (decoder-only LM — the
    last real token, `:233-235`) or the first decoder step (T5, `:236-237`),
    scored through the shared rerank loss vocabulary."""

    config: "Blip2RerankConfig"

    def setup(self):
        from ..blip2 import Blip2ForConditionalGeneration

        self.model = Blip2ForConditionalGeneration(
            self.config.blip2, name="model"
        )
        self.classifier1 = nn.Dense(1, use_bias=False, name="classifier1")
        self.classifier2 = nn.Dense(1, use_bias=False, name="classifier2")

    def __call__(
        self,
        input_ids,
        attention_mask,
        pixel_values,
        num_negative_examples: int,
        labels=None,
        vision_feats=None,
    ):
        cfg = self.config
        expanded = input_ids.shape[0]
        nway = num_negative_examples + 1
        batch_size = expanded // nway
        prefix = None
        if vision_feats is not None:
            prefix = vision_feats
        elif pixel_values is not None:
            prefix = jnp.repeat(
                self.model.vision_prefix(pixel_values), nway, axis=0
            )
        if cfg.blip2.use_decoder_only_language_model:
            rel = self.model.causal_last_hidden(
                input_ids, attention_mask, vision_prefix=prefix
            )
        else:
            dec_in = jnp.full(
                (expanded, 1), cfg.blip2.text_config.decoder_start_token_id,
                jnp.int32,
            )
            _, hidden = self.model(
                input_ids, attention_mask, dec_in, vision_prefix=prefix
            )
            rel = hidden[:, 0]
        logits1 = self.classifier1(rel)
        logits2 = self.classifier2(rel)
        logits, lbl = prepare_logits_labels(
            cfg.loss_fn, logits1, logits2, batch_size, num_negative_examples,
            labels,
        )
        loss = rerank_loss(cfg.loss_fn, logits, lbl, cfg.pos_weight)
        return DecoderRerankOutput(
            loss=loss, logits=primary_logits(cfg.loss_fn, logits)
        )


@dataclasses.dataclass(frozen=True)
class Blip2RerankConfig:
    """Config for :class:`Blip2DecoderRerankModel`. ``yes/no_token_id`` come
    from the Blip2Processor tokenizer (reference `:99-100`; for the T5
    tokenizer: yes=4273, no=150)."""

    blip2: "object" = None  # models.blip2.Blip2Config
    yes_token_id: int = 4273
    no_token_id: int = 150
    loss_fn: str = "BCE"
    pos_weight: Optional[float] = None

    @classmethod
    def tiny(cls, **kw):
        from ..blip2 import Blip2Config

        defaults = dict(blip2=Blip2Config.tiny(), yes_token_id=10, no_token_id=11)
        defaults.update(kw)
        return cls(**defaults)


def prepare_decoder_rerank_inputs(
    query_text_sequences,
    context_text_sequences,
    tokenizer,
    max_query_length: int,
    max_context_length: int,
    max_decoder_source_length: int,
    docs_per_query: int,
    generation_token: bool = False,
):
    """Host-side prompt construction (reference ``prepare_decoder_inputs``,
    `utils.py:169-205`): ``"Query: {q}"`` and ``"Document: {d}"`` truncated to
    their budgets, then joined with ``" Relevant:"`` (Model A) or the
    ``<GEN>`` token (Model B)."""
    import numpy as np

    tq = [
        tokenizer.decode(
            tokenizer.encode(f"Query: {t}", add_special_tokens=False)[:max_query_length]
        )
        for t in query_text_sequences
    ]
    tc = [
        tokenizer.decode(
            tokenizer.encode(f"Document: {t}", add_special_tokens=False)[:max_context_length]
        )
        for t in context_text_sequences
    ]
    suffix = f" {GENERATION_TOKEN}" if generation_token else " Relevant:"
    prompts = [
        f"{tq[i]} {tc[i * docs_per_query + j]}{suffix}"
        for i in range(len(tq))
        for j in range(docs_per_query)
    ]
    enc = tokenizer(
        prompts,
        padding="max_length",
        truncation=True,
        max_length=max_decoder_source_length,
        return_tensors="np",
    )
    return {
        "input_ids": enc["input_ids"].astype(np.int32),
        "attention_mask": enc["attention_mask"].astype(np.int32),
    }
