"""BLIP-2 (vision encoder + Q-Former + T5 LM) in Flax, TPU-first.

The backbone of the reference's best reranker, monoBLIP-2
(``Blip2ForConditionalGeneration`` + LoRA,
`src/models/rerank/decoder_rerank_model.py:89-120`). Semantics match the HF
torch implementation so bridged ``Salesforce/blip2-flan-t5-*`` checkpoints
reproduce reference scores:

- vision: ViT with *no* pre-layernorm (unlike CLIP), fused qkv attention,
  pre-LN blocks, post-layernorm on the full sequence;
- Q-Former: learned query tokens attend to themselves (BERT-style post-LN)
  and cross-attend to the frozen image features every
  ``cross_attention_frequency`` layers; query positions use the
  ``intermediate_query``/``output_query`` FFN (the text branch of the
  Q-Former is unused by BLIP-2's conditional generation path and omitted);
- ``language_projection`` maps Q-Former outputs into the LM embedding space;
  the projected query tokens are prepended to the text embeddings
  (HF ``Blip2ForConditionalGeneration.forward``).

The LM is the framework's :class:`~.t5.T5ForConditionalGeneration` (with
first-class LoRA on q/v, matching the reference's peft wrap).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from .bert import additive_mask
from .opt import OPTConfig, OPTForCausalLM
from .t5 import T5Config, T5ForConditionalGeneration


@dataclasses.dataclass(frozen=True)
class Blip2VisionConfig:
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_hidden_layers: int = 39
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        )
        defaults.update(kw)
        return cls(**defaults)


@dataclasses.dataclass(frozen=True)
class Blip2QFormerConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    encoder_hidden_size: int = 1408  # vision hidden size
    cross_attention_frequency: int = 2
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=32, encoder_hidden_size=16,
        )
        defaults.update(kw)
        return cls(**defaults)


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    """``text_config`` selects the LM family: a :class:`~.t5.T5Config`
    (``blip2-flan-t5-*``) or an :class:`~.opt.OPTConfig` (``blip2-opt-*`` —
    the reference's best reranker backbone,
    `monoBLIP2-Opt_pointwise.jsonnet:115`)."""

    vision_config: Blip2VisionConfig = dataclasses.field(default_factory=Blip2VisionConfig)
    qformer_config: Blip2QFormerConfig = dataclasses.field(default_factory=Blip2QFormerConfig)
    text_config: T5Config = dataclasses.field(default_factory=T5Config)
    num_query_tokens: int = 32

    @property
    def use_decoder_only_language_model(self) -> bool:
        """HF ``Blip2Config.use_decoder_only_language_model`` role."""
        return isinstance(self.text_config, OPTConfig)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vision_config=Blip2VisionConfig.tiny(),
            qformer_config=Blip2QFormerConfig.tiny(),
            text_config=T5Config.tiny(),
            num_query_tokens=4,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def tiny_opt(cls, **kw):
        defaults = dict(
            vision_config=Blip2VisionConfig.tiny(),
            qformer_config=Blip2QFormerConfig.tiny(),
            text_config=OPTConfig.tiny(),
            num_query_tokens=4,
        )
        defaults.update(kw)
        return cls(**defaults)


class Blip2VisionEmbeddings(nn.Module):
    config: Blip2VisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        B = pixel_values.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embedding",
        )(jnp.transpose(pixel_values, (0, 2, 3, 1)))
        patches = patches.reshape(B, n_patches, cfg.hidden_size)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([jnp.tile(cls_tok, (B, 1, 1)), patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1, n_patches + 1, cfg.hidden_size),
        )
        return x + pos[:, : x.shape[1]]


class Blip2Attention(nn.Module):
    """Fused-qkv ViT attention (HF ``Blip2Attention``)."""

    config: Blip2VisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, L, H = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        qkv = nn.Dense(3 * H, name="qkv")(x).reshape(B, L, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(H, name="projection")(ctx.reshape(B, L, H))


class Blip2VisionModel(nn.Module):
    config: Blip2VisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        x = Blip2VisionEmbeddings(cfg, name="embeddings")(pixel_values)
        for i in range(cfg.num_hidden_layers):
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"layer_{i}_norm1")(x)
            x = x + Blip2Attention(cfg, name=f"layer_{i}_attn")(h)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"layer_{i}_norm2")(x)
            h = nn.Dense(cfg.intermediate_size, name=f"layer_{i}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden_size, name=f"layer_{i}_fc2")(h)
            x = x + h
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(x)


class _QFormerAttention(nn.Module):
    """BERT-style post-LN attention over (optionally) external kv states."""

    config: Blip2QFormerConfig
    kv_size: int = 0  # 0 → self-attention dims

    @nn.compact
    def __call__(self, x, kv=None):
        cfg = self.config
        B, Lq, H = x.shape
        kv_in = x if kv is None else kv
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(H, name="query")(x).reshape(B, Lq, nh, hd)
        k = nn.Dense(H, name="key")(kv_in).reshape(B, kv_in.shape[1], nh, hd)
        v = nn.Dense(H, name="value")(kv_in).reshape(B, kv_in.shape[1], nh, hd)
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = nn.Dense(H, name="out")(ctx.reshape(B, Lq, H))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(out + x)


class Blip2QFormer(nn.Module):
    """Query-token branch of the HF ``Blip2QFormerModel``."""

    config: Blip2QFormerConfig
    num_query_tokens: int = 32

    @nn.compact
    def __call__(self, image_embeds):
        cfg = self.config
        B = image_embeds.shape[0]
        query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.num_query_tokens, cfg.hidden_size),
        )
        x = jnp.tile(query_tokens, (B, 1, 1))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        for i in range(cfg.num_hidden_layers):
            x = _QFormerAttention(cfg, name=f"layer_{i}_attention")(x)
            if i % cfg.cross_attention_frequency == 0:
                x = _QFormerAttention(cfg, name=f"layer_{i}_crossattention")(
                    x, kv=image_embeds
                )
            h = nn.Dense(cfg.intermediate_size, name=f"layer_{i}_intermediate_query")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden_size, name=f"layer_{i}_output_query")(h)
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, name=f"layer_{i}_output_query_norm"
            )(h + x)
        return x


class Blip2ForConditionalGeneration(nn.Module):
    """Vision → Q-Former → language_projection → T5 (HF-compatible)."""

    config: Blip2Config

    def setup(self):
        cfg = self.config
        self.vision_model = Blip2VisionModel(cfg.vision_config, name="vision_model")
        self.qformer = Blip2QFormer(
            cfg.qformer_config, num_query_tokens=cfg.num_query_tokens, name="qformer"
        )
        if cfg.use_decoder_only_language_model:
            # HF projects the Q-Former output into the LM hidden size and
            # prepends it to the text embeddings; our OPT applies project_in
            # to inputs_embeds, so the Blip2+OPT path requires
            # embed_dim == hidden_size (true for blip2-opt-2.7b/6.7b)
            assert cfg.text_config.embed_dim == cfg.text_config.hidden_size, (
                "Blip2+OPT requires word_embed_proj_dim == hidden_size")
            self.language_projection = nn.Dense(
                cfg.text_config.hidden_size, name="language_projection"
            )
            self.language_model = OPTForCausalLM(
                cfg.text_config, name="language_model"
            )
        else:
            self.language_projection = nn.Dense(
                cfg.text_config.d_model, name="language_projection"
            )
            self.language_model = T5ForConditionalGeneration(
                cfg.text_config, name="language_model"
            )

    def vision_prefix(self, pixel_values):
        """[B, num_query_tokens, d_model] projected Q-Former outputs."""
        image_embeds = self.vision_model(pixel_values)
        query_out = self.qformer(image_embeds)
        return self.language_projection(query_out)

    def _prepend_vision_prefix(self, text_embeds, attention_mask,
                               pixel_values, vision_prefix):
        """[vision prefix ; text] embeds + combined mask — the ONE place the
        prefix concat lives (generation encode, causal LM, seq2seq forward
        all share it). ``vision_prefix`` short-circuits the vision+Q-Former
        path with precomputed prefix embeddings (candidate-scoring computes
        them once per image and broadcasts over candidates)."""
        if vision_prefix is None and pixel_values is not None:
            vision_prefix = self.vision_prefix(pixel_values)
        if vision_prefix is None:
            return text_embeds, attention_mask
        inputs_embeds = jnp.concatenate(
            [vision_prefix.astype(text_embeds.dtype), text_embeds], axis=1
        )
        prefix_mask = jnp.ones(vision_prefix.shape[:2], attention_mask.dtype)
        return inputs_embeds, jnp.concatenate(
            [prefix_mask, attention_mask], axis=1)

    def encode_for_generation(self, input_ids, attention_mask,
                              pixel_values=None, vision_prefix=None):
        """Encoder states + mask with the vision prefix prepended — the
        encode half of HF ``generate`` (caption mining,
        `infoseek_data_ops.py:673-770`)."""
        lm = self.language_model
        inputs_embeds, attention_mask = self._prepend_vision_prefix(
            lm.shared(input_ids), attention_mask, pixel_values, vision_prefix)
        enc = lm.encode(inputs_embeds=inputs_embeds, attention_mask=attention_mask)
        return enc, attention_mask

    def causal_lm_logits(self, input_ids, attention_mask,
                         pixel_values=None, vision_prefix=None):
        """Decoder-only (OPT) path: full-sequence logits over
        [vision prefix ; prompt] plus the combined attention mask — the HF
        ``use_decoder_only_language_model`` branch of
        ``Blip2ForConditionalGeneration.forward``
        (`modeling_blip_2.py:1437-1456`). Returns ``(logits, hidden,
        full_mask)``; position ``prefix_len + n_real - 1`` predicts the token
        after the prompt (the yes/no score position for the monoBLIP2-Opt
        reranker; the head variant reads ``hidden`` there)."""
        hidden, attention_mask = self.causal_lm_hidden(
            input_ids, attention_mask, pixel_values, vision_prefix)[1:]
        return (self.language_model.lm_logits(hidden), hidden,
                attention_mask)

    def causal_lm_hidden(self, input_ids, attention_mask,
                         pixel_values=None, vision_prefix=None):
        """Decoder-only hidden states over [vision prefix ; prompt] WITHOUT
        the vocab projection — callers that score a single position gather
        first and project only that row (``lm_logits``). Returns
        ``(None, hidden, full_mask)`` (tuple layout shared with
        :meth:`causal_lm_logits`)."""
        assert self.config.use_decoder_only_language_model
        lm = self.language_model
        inputs_embeds, attention_mask = self._prepend_vision_prefix(
            lm.embed_tokens(input_ids), attention_mask, pixel_values,
            vision_prefix)
        hidden = lm.hidden_states(inputs_embeds=inputs_embeds,
                                  attention_mask=attention_mask)
        return None, hidden, attention_mask

    def causal_last_hidden(self, input_ids, attention_mask,
                           pixel_values=None, vision_prefix=None):
        """Hidden state at each row's LAST real prompt position, [B, H].

        The canonical "which position predicts yes/no" rule for the
        decoder-only rerankers (HF slices logits to the label window and the
        reference reads its first row, `decoder_rerank_model.py:147-150` +
        `modeling_blip_2.py:1445-1447`): ``prefix_len + sum(mask) − 1``, so
        right-padded rows score at their own final token, never at a shared
        pad column. Kept here — next to the mask construction — so every
        caller (both rerank heads, bench) shares one definition."""
        _, hidden, _ = self.causal_lm_hidden(
            input_ids, attention_mask, pixel_values, vision_prefix)
        prefix_len = hidden.shape[1] - input_ids.shape[1]
        last = prefix_len + jnp.sum(
            attention_mask.astype(jnp.int32), axis=1) - 1
        return jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]

    def decode_logits(self, decoder_input_ids, enc_states, enc_attention_mask):
        """Per-position decoder logits over a fixed-length token buffer — the
        step function of a host-driven greedy decode (static shapes: the
        buffer is [B, max_len]; the caller reads position t)."""
        logits, _ = self.language_model.decode(
            decoder_input_ids, enc_states, enc_attention_mask
        )
        return logits

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 pixel_values=None, vision_prefix=None):
        enc, attention_mask = self.encode_for_generation(
            input_ids, attention_mask, pixel_values, vision_prefix)
        return self.language_model.decode(decoder_input_ids, enc,
                                          attention_mask)
