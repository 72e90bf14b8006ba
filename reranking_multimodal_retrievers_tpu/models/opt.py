"""OPT decoder-only causal LM in Flax, TPU-first.

The language backbone of the reference's single best reranker, monoBLIP2-Opt
(``Salesforce/blip2-opt-2.7b``,
`configs/Rerank/OKVQA/Seq2Seq/monoBLIP2-Opt_pointwise.jsonnet:112-116`;
OK-VQA R@5 0.40 — BASELINE.md). Semantics match HuggingFace
``OPTForCausalLM`` exactly so bridged checkpoints reproduce reference
scores:

- learned positional embeddings with the OPT **offset of 2** and positions
  derived from the attention mask (``cumsum(mask)·mask − 1``), so padded
  rows sit at −1 → embedding row 1 — HF ``OPTLearnedPositionalEmbedding``;
- pre-LN decoder blocks (``do_layer_norm_before=True`` for opt-2.7b):
  LN → self-attention → residual, LN → fc1 → ReLU → fc2 → residual; all
  projections carry biases (``enable_bias``);
- attention scaling ``head_dim**-0.5`` applied to Q (HF ``OPTAttention``);
- optional ``project_in``/``project_out`` when ``word_embed_proj_dim`` ≠
  ``hidden_size`` (opt-350m); tied ``lm_head`` = embedding matrix;
- ``final_layer_norm`` before the head (pre-LN variants).

LoRA: the reference wraps the LM with peft (r=8, α=32,
`decoder_rerank_model.py:103-114`) whose default OPT targets are ``q_proj``
and ``v_proj`` — mirrored with first-class :class:`~..lora.LoRADense`
adapters gated by ``lora_r``.

TPU notes: static shapes; causal+padding bias built once per call; score
matmuls accumulate fp32 on the MXU; the ``inputs_embeds`` entry point lets
BLIP-2 prepend its Q-Former vision prefix without re-tokenizing (HF
``Blip2ForConditionalGeneration`` decoder-only path,
``modeling_blip_2.py`` ``use_decoder_only_language_model``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.platform import head_pack_feasible, is_tpu_backend
from ..ops.quant import Int8Dense, int8_dot
from .bert import ATTN_MASK_BIAS
from .lora import LoRADense


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560           # opt-2.7b
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    ffn_dim: int = 10240
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None  # None → hidden_size
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    init_std: float = 0.02
    lora_r: int = 0
    lora_alpha: float = 32.0
    # serve self-attention through the layout-native Pallas kernel with the
    # causal mask synthesized in-register (ops/attention_pallas.py) — the
    # [B, heads, L, L] score tensors never touch HBM. Inference knob.
    use_pallas_attention: bool = False
    # run every projection/FFN/lm-head matmul W8A8 on the MXU's double-rate
    # int8 path (ops/quant.py) — serving knob for the compute-roofline-bound
    # monoBLIP2-Opt reranker; the parameter tree is unchanged (int8 is an
    # execution mode, not a storage format). Requires lora_r == 0 (merge
    # adapters first).
    quantize_int8: bool = False

    def __post_init__(self):
        if self.quantize_int8 and self.lora_r:
            raise ValueError(
                "quantize_int8 requires lora_r == 0 — merge the LoRA "
                "adapters into the base weights before quantized serving")

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=64, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=32, max_position_embeddings=64,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def opt_2_7b(cls, **kw):
        """`facebook/opt-2.7b` — the LM inside ``Salesforce/blip2-opt-2.7b``."""
        return cls(**kw)


def opt_positions(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """HF ``OPTLearnedPositionalEmbedding.forward``: positions count only
    real tokens; padded rows stay at −1, which the caller's +2 offset maps
    to embedding row 1 — exactly HF's padded-row lookup (row 0 would be a
    silent divergence for any consumer of full hidden states)."""
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask - 1


class OPTAttention(nn.Module):
    """HF ``OPTAttention``: scaled Q, biased projections, LoRA on q/v."""

    config: OPTConfig

    @nn.compact
    def __call__(self, x, mask_bias, key_mask=None):
        cfg = self.config
        B, L, H = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        dense = Int8Dense if cfg.quantize_int8 else nn.Dense

        def qv_dense(name):
            if cfg.lora_r:
                return LoRADense(H, r=cfg.lora_r, alpha=cfg.lora_alpha,
                                 name=name)
            return dense(H, name=name)

        q = qv_dense("q_proj")(x)
        k = dense(H, name="k_proj")(x)
        v = qv_dense("v_proj")(x)
        if (cfg.use_pallas_attention and key_mask is not None
                and L % 8 == 0 and head_pack_feasible(nh, hd)
                and is_tpu_backend()):
            # layout-native fused kernel with the causal mask synthesized
            # in-register (ops/attention_pallas.py): the [B, heads, L, L]
            # score tensors never touch HBM
            from ..ops.attention_pallas import fused_self_attention

            key_bias = (1.0 - key_mask.astype(jnp.float32)) * ATTN_MASK_BIAS
            ctx = fused_self_attention(
                q, k, v, mask_bias=key_bias, causal=True,
                num_heads=nh, sm_scale=hd ** -0.5,
            )
            return dense(H, name="out_proj")(ctx)
        q = (q * (hd ** -0.5)).reshape(B, L, nh, hd)
        k = k.reshape(B, L, nh, hd)
        v = v.reshape(B, L, nh, hd)
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return dense(H, name="out_proj")(ctx.reshape(B, L, H))


class OPTDecoderLayer(nn.Module):
    config: OPTConfig

    @nn.compact
    def __call__(self, x, mask_bias, key_mask=None):
        cfg = self.config
        residual = x
        h = (nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                          name="self_attn_layer_norm")(x)
             if cfg.do_layer_norm_before else x)
        h = OPTAttention(cfg, name="self_attn")(h, mask_bias,
                                               key_mask=key_mask)
        x = residual + h
        if not cfg.do_layer_norm_before:  # opt-350m post-LN variant
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="self_attn_layer_norm")(x)
        residual = x
        h = (nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                          name="final_layer_norm")(x)
             if cfg.do_layer_norm_before else x)
        dense = Int8Dense if cfg.quantize_int8 else nn.Dense
        h = dense(cfg.ffn_dim, name="fc1")(h)
        h = nn.relu(h)
        h = dense(cfg.hidden_size, name="fc2")(h)
        x = residual + h
        if not cfg.do_layer_norm_before:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="final_layer_norm")(x)
        return x


class OPTForCausalLM(nn.Module):
    """Decoder-only LM; ``__call__`` returns full-sequence logits.

    Cites: reference scoring consumes HF ``Blip2ForConditionalGeneration``
    logits for the OPT path (`decoder_rerank_model.py:147-159`); this module
    is the ``language_model`` inside the TPU-native BLIP-2
    (`models/blip2.py`).
    """

    config: OPTConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.init_std)
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                                     embedding_init=init, name="embed_tokens")
        # HF allocates max_position_embeddings + 2 rows (offset 2)
        self.embed_positions = nn.Embed(
            cfg.max_position_embeddings + 2, cfg.hidden_size,
            embedding_init=init, name="embed_positions",
        )
        if cfg.embed_dim != cfg.hidden_size:
            proj_cls = Int8Dense if cfg.quantize_int8 else nn.Dense
            self.project_in = proj_cls(cfg.hidden_size, use_bias=False,
                                       name="project_in")
            self.project_out = proj_cls(cfg.embed_dim, use_bias=False,
                                        name="project_out")
        else:
            self.project_in = None
            self.project_out = None
        self.layers = [
            OPTDecoderLayer(cfg, name=f"layer_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_layer_norm = (
            nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")
            if cfg.do_layer_norm_before else None
        )

    def causal_bias(self, attention_mask):
        """[B, 1, L, L] additive bias: causal ∧ key-not-padded."""
        L = attention_mask.shape[1]
        causal = jnp.tril(jnp.ones((L, L), jnp.float32))
        keymask = attention_mask.astype(jnp.float32)[:, None, None, :]
        allowed = causal[None, None] * keymask
        return (1.0 - allowed) * ATTN_MASK_BIAS

    def hidden_states(self, input_ids=None, attention_mask=None,
                      inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones(inputs_embeds.shape[:2], jnp.int32)
        x = inputs_embeds
        if self.project_in is not None:
            x = self.project_in(x)
        pos = self.embed_positions(opt_positions(attention_mask) + 2)
        x = x + pos.astype(x.dtype)
        bias = self.causal_bias(attention_mask)
        for layer in self.layers:
            x = layer(x, bias, key_mask=attention_mask)
        if self.final_layer_norm is not None:
            x = self.final_layer_norm(x)
        if self.project_out is not None:
            x = self.project_out(x)
        return x

    def lm_logits(self, hidden):
        """Tied head: hidden @ embedding.T (HF ``lm_head`` weight-tying)."""
        emb = self.embed_tokens.embedding
        if self.config.quantize_int8:
            # per-vocab-row weight scales (each vocab row is an output
            # channel of the tied head) + dynamic per-token activation
            # scales — the [*, d] @ [d, V] matmul rides the int8 MXU path
            return int8_dot(hidden, emb.T)
        return jnp.einsum("bld,vd->blv", hidden, emb.astype(hidden.dtype),
                          preferred_element_type=jnp.float32)

    def __call__(self, input_ids=None, attention_mask=None,
                 inputs_embeds=None):
        hidden = self.hidden_states(input_ids, attention_mask, inputs_embeds)
        return self.lm_logits(hidden), hidden
