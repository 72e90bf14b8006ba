"""T5 / Flan-T5 encoder-decoder LM in Flax, TPU-first.

The language backbone of the reference's best reranker, monoBLIP-2
(``Blip2ForConditionalGeneration`` with a Flan-T5 LM,
`src/models/rerank/decoder_rerank_model.py:89-114`; OK-VQA R@5 0.36/0.40 in
BASELINE.md). Semantics match HuggingFace ``T5ForConditionalGeneration``
exactly so bridged checkpoints reproduce reference scores:

- RMS LayerNorm (no bias, no mean subtraction), fp32 statistics;
- pre-LN blocks; NO attention-score scaling (folded into init per the T5
  paper); relative position bias computed in block 0 of each stack and
  shared by the following blocks; cross-attention has no bias;
- gated FFN (``wi_0``/``wi_1``) with ``gelu_new`` for Flan-T5, plain ReLU
  ``wi`` otherwise;
- untied ``lm_head`` for Flan-T5/v1.1; when tied, the decoder output is
  scaled by ``d_model**-0.5`` before the projection (HF behavior).

LoRA: the reference wraps the LM with peft ``LoraConfig(SEQ_2_SEQ_LM)``
(r=8, α=32, `decoder_rerank_model.py:103-114`), whose default T5 targets are
the ``q`` and ``v`` projections — mirrored here with first-class
:class:`~..lora.LoRADense` adapters gated by ``lora_r``.

TPU notes: static shapes; the score matmuls accumulate fp32 on the MXU;
``inputs_embeds`` entry points let BLIP-2 prepend its vision prefix without
re-tokenizing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.platform import is_tpu_backend
from .bert import ATTN_MASK_BIAS
from ..ops.quant import Int8Dense, int8_dot
from .lora import LoRADense


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = True  # Flan-T5 / v1.1
    dense_act_fn: str = "gelu_new"
    tie_word_embeddings: bool = False  # Flan-T5 / v1.1
    decoder_start_token_id: int = 0
    lora_r: int = 0
    lora_alpha: float = 32.0
    # serve the encoder's self-attention through the layout-native Pallas
    # kernel (ops/attention_pallas.py): scores+softmax stay in VMEM and the
    # relative-position bias streams per head group instead of broadcasting
    # to [B, heads, L, L] in HBM. Inference knob — falls back to the unfused
    # path when head geometry can't pack 128 lanes.
    use_pallas_attention: bool = False
    # stream the relative-position bias in bf16 on the fused path (halves
    # its HBM traffic; rank error within bf16 round-off — the QK scores are
    # bf16 in the serving configuration anyway)
    position_bias_bf16: bool = False
    # run projection/FFN/lm-head matmuls W8A8 on the MXU's double-rate int8
    # path (ops/quant.py) — serving knob, same scheme as
    # ``OPTConfig.quantize_int8``; the parameter tree is unchanged. The
    # single-query cross-attention reorder keeps its (already tiny) einsums
    # in bf16. Requires lora_r == 0 (merge adapters first).
    quantize_int8: bool = False

    def __post_init__(self):
        if self.quantize_int8 and self.lora_r:
            raise ValueError(
                "quantize_int8 requires lora_r == 0 — merge the LoRA "
                "adapters into the base weights before quantized serving")

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=64, d_model=16, d_kv=4, d_ff=32,
            num_layers=2, num_decoder_layers=2, num_heads=4,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def flan_t5_xl(cls, **kw):
        """`google/flan-t5-xl` — the LM inside
        ``Salesforce/blip2-flan-t5-xl`` used by the reference configs."""
        defaults = dict(
            d_model=2048, d_kv=64, d_ff=5120, num_layers=24,
            num_decoder_layers=24, num_heads=32,
        )
        defaults.update(kw)
        return cls(**defaults)


class T5LayerNorm(nn.Module):
    """RMS norm — HF ``T5LayerNorm``: fp32 variance, no mean, no bias."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (w * y.astype(x.dtype)).astype(x.dtype)


def relative_position_bucket(
    relative_position, bidirectional: bool, num_buckets: int, max_distance: int
):
    """HF ``T5Attention._relative_position_bucket`` semantics."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class _DenseKernel(nn.Module):
    """Parameter-only twin of ``nn.Dense(use_bias=False)`` — declares the
    identical ``kernel`` param (same name, shape, init) and returns it raw,
    for paths that apply the weight in a reordered contraction. A module
    initialized through either twin is apply-compatible with the other."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.linear.default_kernel_init,
            (in_features, self.features),
        )


class _LoRAKernels(nn.Module):
    """Parameter-only twin of :class:`LoRADense` (``use_bias=False``):
    declares ``base/kernel`` (+ ``lora_a``/``lora_b`` when ``r>0``) and
    returns them raw."""

    features: int
    r: int = 0

    @nn.compact
    def __call__(self, in_features: int):
        kernel = _DenseKernel(self.features, name="base")(in_features)
        if self.r > 0:
            a = self.param("lora_a", nn.initializers.normal(1e-2),
                           (in_features, self.r))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.r, self.features))
            return kernel, a, b
        return kernel, None, None


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    bidirectional: bool = True
    lora: bool = False  # peft SEQ_2_SEQ_LM targets q/v

    def _can_fuse(self, kv, key_mask) -> bool:
        """Pallas path: encoder self-attention with head geometry that packs
        ≥128 lanes per grid step (`ops/attention_pallas.py` constraint)."""
        from ..ops.platform import head_pack_feasible

        cfg = self.config
        if not (cfg.use_pallas_attention and kv is None and self.bidirectional):
            return False
        return head_pack_feasible(cfg.num_heads, cfg.d_kv)

    @nn.compact
    def __call__(self, x, kv=None, mask_bias=None, position_bias=None,
                 key_mask=None):
        cfg = self.config
        kv_in = x if kv is None else kv
        B, Lq, _ = x.shape
        Lk = kv_in.shape[1]
        nh, dk = cfg.num_heads, cfg.d_kv

        dense = Int8Dense if cfg.quantize_int8 else nn.Dense

        def proj(name, inp, use_lora):
            if use_lora and cfg.lora_r:
                return LoRADense(cfg.inner_dim, r=cfg.lora_r, alpha=cfg.lora_alpha,
                                 use_bias=False, name=name)(inp)
            return dense(cfg.inner_dim, use_bias=False, name=name)(inp)

        fuse = self._can_fuse(kv, key_mask)
        q2 = proj("q", x, self.lora)

        if kv is not None and Lq == 1:
            # single-query cross-attention (one-pass yes/no scoring,
            # `rerankers/decoder.py`): associativity reorder. The standard
            # order projects ALL Lk encoder positions through the K and V
            # kernels every layer — 2·Lk·d_model·inner FLOPs each, ~22 TFLOP
            # of the ~156 TFLOP XL 100-candidate rerank — to serve ONE query
            # row. Reordering ``(qWq)(encWk)ᵀ = ((qWq)Wkᵀ)encᵀ`` and pooling
            # the encoder states BEFORE the V projection (attention-prob
            # pooling commutes with the linear V map, LoRA term included)
            # makes the per-layer cost O(heads·d_model·Lk) instead of
            # O(inner·d_model·Lk) — d_kv× cheaper, identical logits up to
            # bf16 matmul rounding.
            D = kv_in.shape[-1]
            Wk = _DenseKernel(cfg.inner_dim, name="k")(D)
            lr = cfg.lora_r if self.lora else 0
            if lr:
                Wv, Av, Bv = _LoRAKernels(cfg.inner_dim, r=lr, name="v")(D)
            else:
                # no-LoRA twin of ``proj``'s plain nn.Dense: params must sit
                # at v/kernel (not v/base/kernel) so a model initialized at
                # decoder length 1 stays apply-compatible with Lq>1 calls
                # (e.g. greedy caption generation, `data/ops/infoseek_ops.py`)
                Wv = _DenseKernel(cfg.inner_dim, name="v")(D)
                Av = Bv = None
            if position_bias is None:
                position_bias = jnp.zeros((1, nh, 1, Lk), jnp.float32)
            q_h = q2.reshape(B, nh, dk)
            qk = jnp.einsum(
                "bnd,Dnd->bnD", q_h, Wk.astype(q2.dtype).reshape(D, nh, dk),
                preferred_element_type=jnp.float32,
            ).astype(q2.dtype)
            scores = jnp.einsum("bnD,bkD->bnk", qk, kv_in,
                                preferred_element_type=jnp.float32)
            scores = scores + position_bias[:, :, 0, :]
            probs = jax.nn.softmax(scores, axis=-1).astype(kv_in.dtype)
            pooled = jnp.einsum("bnk,bkD->bnD", probs, kv_in,
                                preferred_element_type=jnp.float32
                                ).astype(kv_in.dtype)
            ctx = jnp.einsum(
                "bnD,Dnd->bnd", pooled,
                Wv.astype(pooled.dtype).reshape(D, nh, dk),
                preferred_element_type=jnp.float32,
            )
            if Av is not None:
                lo = jnp.einsum("bnD,Dr->bnr", pooled, Av.astype(pooled.dtype))
                ctx = ctx + (cfg.lora_alpha / lr) * jnp.einsum(
                    "bnr,rnd->bnd", lo, Bv.astype(pooled.dtype).reshape(-1, nh, dk),
                    preferred_element_type=jnp.float32,
                )
            ctx2 = ctx.astype(x.dtype).reshape(B, 1, cfg.inner_dim)
            out = dense(cfg.d_model, use_bias=False, name="o")(ctx2)
            return out, position_bias

        k2 = proj("k", kv_in, False)
        v2 = proj("v", kv_in, self.lora)

        if position_bias is None:
            if self.has_relative_bias:
                rel = (
                    jnp.arange(Lk)[None, :] - jnp.arange(Lq)[:, None]
                )  # memory_pos - query_pos
                buckets = relative_position_bucket(
                    rel, self.bidirectional,
                    cfg.relative_attention_num_buckets,
                    cfg.relative_attention_max_distance,
                )
                table = nn.Embed(
                    cfg.relative_attention_num_buckets, nh,
                    name="relative_attention_bias",
                )(buckets)  # [Lq, Lk, nh]
                position_bias = jnp.transpose(table, (2, 0, 1))[None]
            else:
                position_bias = jnp.zeros((1, nh, Lq, Lk), jnp.float32)
            # unfused contract: the padding mask folds into the bias once
            # (block 0) and rides along to every later block. The fused path
            # keeps the bias mask-free — the [B, L] key mask streams into the
            # kernel separately each layer, so the [B, nh, Lq, Lk] broadcast
            # never exists.
            if mask_bias is not None and not fuse:
                position_bias = position_bias + mask_bias

        if fuse:
            from ..ops.attention_pallas import fused_self_attention

            head_bias = position_bias[0]
            if cfg.position_bias_bf16:
                head_bias = head_bias.astype(jnp.bfloat16)
            ctx2 = fused_self_attention(
                q2, k2, v2, key_mask, head_bias,
                num_heads=nh, sm_scale=1.0,  # T5 folds 1/sqrt(dk) into init
                # interpret mode keeps the flag usable (if slow) off-TPU
                interpret=not is_tpu_backend(),
            )
            out = dense(cfg.d_model, use_bias=False, name="o")(ctx2)
            return out, position_bias

        q = q2.reshape(B, Lq, nh, dk)
        k = k2.reshape(B, Lk, nh, dk)
        v = v2.reshape(B, Lk, nh, dk)
        # no 1/sqrt(dk) scaling — T5 folds it into initialization
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + position_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = dense(cfg.d_model, use_bias=False, name="o")(
            ctx.reshape(B, Lq, cfg.inner_dim)
        )
        return out, position_bias


class T5FF(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = Int8Dense if cfg.quantize_int8 else nn.Dense
        if cfg.is_gated_act:
            gate = dense(cfg.d_ff, use_bias=False, name="wi_0")(x)
            if cfg.dense_act_fn in ("gelu_new", "gelu"):
                gate = nn.gelu(gate, approximate=True)
            else:
                gate = nn.relu(gate)
            lin = dense(cfg.d_ff, use_bias=False, name="wi_1")(x)
            h = gate * lin
        else:
            h = dense(cfg.d_ff, use_bias=False, name="wi")(x)
            h = nn.relu(h)
        return dense(cfg.d_model, use_bias=False, name="wo")(h)


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool = False
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask_bias=None, position_bias=None,
                 enc_states=None, enc_mask_bias=None, key_mask=None):
        cfg = self.config
        eps = cfg.layer_norm_epsilon
        h = T5LayerNorm(eps, name="self_attn_norm")(x)
        attn, position_bias = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias,
            bidirectional=not self.is_decoder, lora=True,
            name="self_attn",
        )(h, mask_bias=mask_bias, position_bias=position_bias,
          key_mask=key_mask)
        x = x + attn
        if self.is_decoder and enc_states is not None:
            h = T5LayerNorm(eps, name="cross_attn_norm")(x)
            cross, _ = T5Attention(cfg, lora=True, name="cross_attn")(
                h, kv=enc_states,
                position_bias=(
                    enc_mask_bias
                    if enc_mask_bias is not None
                    else jnp.zeros(
                        (1, cfg.num_heads, x.shape[1], enc_states.shape[1]),
                        jnp.float32,
                    )
                ),
            )
            x = x + cross
        h = T5LayerNorm(eps, name="ff_norm")(x)
        return x + T5FF(cfg, name="ff")(h), position_bias


def _additive(attention_mask):
    return ((1.0 - attention_mask.astype(jnp.float32)) * ATTN_MASK_BIAS)[:, None, None, :]


class T5Stack(nn.Module):
    config: T5Config
    is_decoder: bool = False
    num_layers: int = 12

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None, enc_states=None,
                 enc_attention_mask=None):
        cfg = self.config
        x = inputs_embeds
        L = x.shape[1]
        mask_bias = _additive(attention_mask) if attention_mask is not None else None
        key_mask = None
        if (cfg.use_pallas_attention and not self.is_decoder
                and attention_mask is not None):
            # [B, L] additive key mask for the fused kernel
            key_mask = (1.0 - attention_mask.astype(jnp.float32)) * ATTN_MASK_BIAS
        if self.is_decoder:
            causal = jnp.tril(jnp.ones((L, L), jnp.float32))
            causal_bias = (1.0 - causal)[None, None] * ATTN_MASK_BIAS
            mask_bias = causal_bias if mask_bias is None else mask_bias + causal_bias
        enc_bias = None
        if enc_states is not None and enc_attention_mask is not None:
            enc_bias = _additive(enc_attention_mask)
        position_bias = None
        for i in range(self.num_layers):
            x, position_bias = T5Block(
                cfg, is_decoder=self.is_decoder, has_relative_bias=(i == 0),
                name=f"block_{i}",
            )(x, mask_bias=mask_bias, position_bias=position_bias,
              enc_states=enc_states, enc_mask_bias=enc_bias, key_mask=key_mask)
        return T5LayerNorm(cfg.layer_norm_epsilon, name="final_norm")(x)


class T5ForConditionalGeneration(nn.Module):
    """Encoder-decoder LM head model (HF-compatible forward)."""

    config: T5Config

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(1.0), name="shared",
        )
        self.encoder = T5Stack(cfg, is_decoder=False, num_layers=cfg.num_layers,
                               name="encoder")
        self.decoder = T5Stack(cfg, is_decoder=True,
                               num_layers=cfg.num_decoder_layers, name="decoder")
        if not cfg.tie_word_embeddings:
            head_cls = Int8Dense if cfg.quantize_int8 else nn.Dense
            self.lm_head = head_cls(cfg.vocab_size, use_bias=False,
                                    name="lm_head")

    def encode(self, input_ids=None, attention_mask=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        return self.encoder(inputs_embeds, attention_mask=attention_mask)

    def decode(self, decoder_input_ids, enc_states, enc_attention_mask=None):
        cfg = self.config
        x = self.shared(decoder_input_ids)
        hidden = self.decoder(
            x, enc_states=enc_states, enc_attention_mask=enc_attention_mask
        )
        if cfg.tie_word_embeddings:
            # HF scales by d_model**-0.5 ONLY for the tied logits projection
            # (`modeling_t5.py` T5ForConditionalGeneration.forward); the
            # returned hidden states stay unscaled so heads trained on HF
            # last_hidden_state (Blip2DecoderHeadRerankModel) see identical
            # inputs
            scaled = hidden * (cfg.d_model ** -0.5)
            if cfg.quantize_int8:
                logits = int8_dot(scaled, self.shared.embedding.T)
            else:
                logits = scaled @ self.shared.embedding.T
        else:
            logits = self.lm_head(hidden)
        return logits, hidden

    def __call__(self, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, inputs_embeds=None):
        enc = self.encode(input_ids, attention_mask, inputs_embeds)
        return self.decode(decoder_input_ids, enc, attention_mask)
