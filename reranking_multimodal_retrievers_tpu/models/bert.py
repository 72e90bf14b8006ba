"""BERT text encoder in Flax, TPU-first.

Functionally equivalent to HuggingFace ``BertModel`` (the backbone of the
reference's FLMR text encoders, `modeling_flmr.py:1616-1694`, and of the
transformer mapping network, `modeling_flmr.py:619-658`): post-LayerNorm
residual blocks, learned absolute positions, exact (erf) GELU, optional
cross-attention for decoder-style use.

Design notes (TPU):
- static shapes only; the attention mask is an additive bias computed once
- all matmuls accumulate in fp32 (``preferred_element_type``) so bf16 params
  are safe on the MXU
- hidden states are collected unconditionally (a tuple of static length) —
  XLA dead-code-eliminates unused outputs, so there is no "output_hidden_
  states" flag plumbing
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.quant import Int8Dense

ATTN_MASK_BIAS = -1e9


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    add_cross_attention: bool = False
    # fused (flash) self-attention: never materializes the [B, heads, L, L]
    # score tensor in HBM — the dominant memory traffic of the rerank
    # forward. Only taken for self-attention with a padding-style mask (no
    # attention_adj/cross-attention); numerics match the unfused path to
    # ~1e-2 in bf16. NOTE: the generic kernel's tiling loses to XLA's fused
    # softmax at head_dim 64 / seq 512 on v5e — measure before enabling.
    use_flash_attention: bool = False
    # layout-native fused self-attention (ops/attention_pallas.py): consumes
    # Q/K/V in the layer's own [B, L, heads·head_dim] layout (no transposes),
    # keeps scores in VMEM, takes the padding mask as an additive key bias.
    # 3.15× the XLA attention core at [100, 12, 512, 64] bf16 on v5e
    # (1.46 vs 4.61 ms). Same gate as flash (self-attention, padding-style
    # mask only); takes precedence over use_flash_attention.
    use_pallas_attention: bool = False
    # store attention logits in bf16 (halves the score tensor's HBM
    # write+read); the softmax itself still runs in fp32 inside the fused
    # elementwise kernel. Inference-serving precision; keep False for
    # training/parity.
    attention_scores_bf16: bool = False
    # tanh-approximate GELU instead of the exact erf GELU (HF BERT uses
    # exact). The erf transcendental over the [tokens, intermediate] FFN
    # activation is pure VPU time; the approximation trades ~1e-3 activation
    # error for it. Inference-serving knob; keep False for training/parity.
    gelu_approximate: bool = False
    # run every `_dense` matmul (q/k/v/out, FFN, pooler) W8A8 on the MXU's
    # double-rate int8 path (ops/quant.py) — serving knob, same scheme as
    # ``OPTConfig.quantize_int8``; the parameter tree is unchanged.
    # Attention score/context einsums and embeddings stay bf16.
    quantize_int8: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        """A small config for tests."""
        defaults = dict(
            vocab_size=1024,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)


def _dense(features: int, cfg: BertConfig, name: str, use_bias: bool = True):
    if cfg.quantize_int8:
        return Int8Dense(
            features,
            use_bias=use_bias,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name=name,
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
        dtype=None,
    )


def additive_mask(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] 0/1 mask → [B, 1, 1, L] additive bias (0 keep / −1e9 drop)."""
    return ((1.0 - attention_mask.astype(dtype)) * ATTN_MASK_BIAS)[:, None, None, :]


class BertAttention(nn.Module):
    """Multi-head attention + output projection + post-LN residual.

    ``segment_mask`` ([B, L] 0/1 ints) enables the fused flash path when the
    config allows it: the Pallas TPU flash-attention kernel streams K/V tiles
    through VMEM with running softmax statistics, so the per-layer
    [B, heads, L, L] score tensor — ~38 MB of HBM traffic per candidate per
    layer at BERT-base/512 — never exists. Padding is expressed as segment
    ids (valid=1, pad=0): valid tokens cannot attend padding; pad rows attend
    each other and are masked out downstream exactly as in the unfused path."""

    config: BertConfig

    @nn.compact
    def __call__(self, hidden_states, kv_states=None, mask_bias=None,
                 segment_mask=None, can_flash=False):
        cfg = self.config
        kv = hidden_states if kv_states is None else kv_states
        B, Lq, H = hidden_states.shape
        Lk = kv.shape[1]
        nh, hd = cfg.num_attention_heads, cfg.head_dim

        q3 = _dense(H, cfg, "query")(hidden_states)
        k3 = _dense(H, cfg, "key")(kv)
        v3 = _dense(H, cfg, "value")(kv)
        q = q3.reshape(B, Lq, nh, hd)
        k = k3.reshape(B, Lk, nh, hd)
        v = v3.reshape(B, Lk, nh, hd)

        # layout-native fused kernel: no transposes, padding as additive key
        # bias, scores live in VMEM (see ops/attention_pallas.py); the gate
        # shares the canonical feasibility check so it can't drift from the
        # kernel's packing search (ops/platform.py)
        from ..ops.platform import head_pack_feasible

        use_pallas = (
            cfg.use_pallas_attention and can_flash and kv_states is None
            and Lq % 8 == 0 and head_pack_feasible(nh, hd)
        )
        # the kernel's default tiles lose to XLA's fused softmax at these
        # shapes; full-sequence tiles with a batched grid win (measured
        # 3.20 → 1.81 ms at [100, 12, 512, 64] bf16 on v5e). Tile choice must
        # divide the padded length — lengths without a 128-multiple divisor
        # ≤ 512 (e.g. 544→576) stay on the unfused path, as do short
        # sequences (< 256), where padding + grid overhead exceed the win.
        Lq_pad = -(-Lq // 128) * 128
        flash_bq = next((b for b in (512, 256, 128) if Lq_pad % b == 0), None)
        use_flash = (
            cfg.use_flash_attention and can_flash and kv_states is None
            and Lq >= 256 and flash_bq is not None and not use_pallas
        )
        if use_pallas:
            import jax

            from ..ops.attention_pallas import fused_self_attention

            bias = None
            if segment_mask is not None:
                bias = (
                    1.0 - segment_mask.astype(jnp.float32)
                ) * ATTN_MASK_BIAS
            ctx = fused_self_attention(
                q3, k3, v3, bias, num_heads=nh, sm_scale=float(hd) ** -0.5,
                # interpret mode keeps the flag usable (if slow) off-TPU —
                # CPU tests and the virtual-device dryrun exercise the same
                # code path the chip runs
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
            ).astype(hidden_states.dtype)
        elif use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention,
            )

            # the kernel tiles the sequence in 128-row blocks; pad ragged
            # sequences with segment-0 rows (excluded from every real token's
            # attention) and slice the outputs back
            Lp = Lq_pad
            pad = Lp - Lq
            ids = (
                segment_mask.astype(jnp.int32)
                if segment_mask is not None
                else jnp.ones((B, Lq), jnp.int32)
            )
            qf, kf, vf = (
                x.transpose(0, 2, 1, 3) for x in (q, k, v)
            )  # [B, nh, L, hd]
            if pad:
                qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad), (0, 0)))
                kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))
                ids = jnp.pad(ids, ((0, 0), (0, pad)))
            seg = (
                SegmentIds(q=ids, kv=ids)
                if (pad or segment_mask is not None)
                else None
            )
            bq = flash_bq
            bb = next(b for b in (5, 4, 2, 1) if B % b == 0)
            block_sizes = BlockSizes(
                block_q=bq, block_k_major=bq, block_k=bq, block_b=bb,
                block_q_major_dkv=bq, block_k_major_dkv=bq,
                block_k_dkv=bq, block_q_dkv=bq,
                block_k_major_dq=bq, block_k_dq=bq, block_q_dq=bq,
            )
            ctx = flash_attention(
                qf, kf, vf, segment_ids=seg, sm_scale=float(hd) ** -0.5,
                block_sizes=block_sizes,
            )[:, :, :Lq].transpose(0, 2, 1, 3)
            ctx = ctx.astype(hidden_states.dtype)
        else:
            score_dtype = (
                jnp.bfloat16
                if (cfg.attention_scores_bf16 and q.dtype == jnp.bfloat16)
                else jnp.float32
            )
            if mask_bias is None and segment_mask is not None:
                # the caller planned on a fused path (and so passed the raw
                # mask, not a bias) but this shape fell back to unfused —
                # rebuild the additive bias so padding is still masked
                mask_bias = additive_mask(segment_mask)
            scores = jnp.einsum(
                "bqnd,bknd->bnqk", q, k, preferred_element_type=score_dtype
            ) / jnp.asarray(jnp.sqrt(hd), score_dtype)
            if mask_bias is not None:
                scores = scores + mask_bias.astype(score_dtype)
            probs = nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(v.dtype)
            ctx = jnp.einsum(
                "bnqk,bknd->bqnd", probs, v, preferred_element_type=jnp.float32
            ).astype(hidden_states.dtype)
        ctx = ctx.reshape(B, Lq, H)

        out = _dense(H, cfg, "out")(ctx)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(
            out + hidden_states
        )


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden_states, mask_bias=None, encoder_hidden_states=None,
                 encoder_mask_bias=None, segment_mask=None, can_flash=False):
        cfg = self.config
        hidden_states = BertAttention(cfg, name="attention")(
            hidden_states, mask_bias=mask_bias,
            segment_mask=segment_mask, can_flash=can_flash,
        )
        if cfg.add_cross_attention and encoder_hidden_states is not None:
            hidden_states = BertAttention(cfg, name="crossattention")(
                hidden_states,
                kv_states=encoder_hidden_states,
                mask_bias=encoder_mask_bias,
            )
        inter = _dense(cfg.intermediate_size, cfg, "intermediate")(hidden_states)
        inter = nn.gelu(inter, approximate=cfg.gelu_approximate)
        out = _dense(cfg.hidden_size, cfg, "output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(
            out + hidden_states
        )


class BertEncoder(nn.Module):
    """Stack of BERT layers. Standalone use = the reference's
    ``transformer_mapping_network`` (a bare ``BertEncoder`` with
    cross-attention, `modeling_flmr.py:656-658`): full bidirectional
    self-attention (no causal mask — the reference never builds one when
    calling BertEncoder directly) plus cross-attention to text states.
    """

    config: BertConfig

    @nn.compact
    def __call__(self, hidden_states, mask_bias=None, encoder_hidden_states=None,
                 encoder_mask_bias=None, segment_mask=None, can_flash=False):
        all_hidden = [hidden_states]
        for i in range(self.config.num_hidden_layers):
            hidden_states = BertLayer(self.config, name=f"layer_{i}")(
                hidden_states,
                mask_bias=mask_bias,
                encoder_hidden_states=encoder_hidden_states,
                encoder_mask_bias=encoder_mask_bias,
                segment_mask=segment_mask,
                can_flash=can_flash,
            )
            all_hidden.append(hidden_states)
        return hidden_states, tuple(all_hidden)


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids=None, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is not None:
            B, L = inputs_embeds.shape[:2]
        else:
            B, L = input_ids.shape
        # Static-shape guard: flax's nn.Embed gathers with jnp.take, whose
        # out-of-bounds mode FILLS WITH NaN — a sequence longer than the
        # position table would silently poison the whole model (as opposed
        # to torch's loud IndexError). Fail at trace time instead.
        if L > cfg.max_position_embeddings:
            raise ValueError(
                f"sequence length {L} exceeds max_position_embeddings "
                f"{cfg.max_position_embeddings}; for rerankers remember the "
                "appended vision tokens (mapping prefix + ViT patches) count "
                "toward the cross-encoder's position budget")
        if position_ids is None:
            position_ids = jnp.arange(L)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), dtype=jnp.int32)
        init = nn.initializers.normal(cfg.initializer_range)
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, embedding_init=init,
                name="word_embeddings",
            )(input_ids)
        # note: when called with inputs_embeds only, no word-embedding table
        # is created — cross-encoder rerankers never need one
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      embedding_init=init, name="position_embeddings")(position_ids)
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
                      name="token_type_embeddings")(token_type_ids)
        x = inputs_embeds + pe + te
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)


class BertModel(nn.Module):
    """Embeddings + encoder (+ tanh pooler, matching HF ``BertModel``).

    ``inputs_embeds`` bypasses the word-embedding lookup (the cross-encoder
    rerankers feed mapped late-interaction features through BERT embeddings,
    reference `attention_fusion.py:4` / ``AttentionFusionBertModel``), and
    ``attention_adj`` is an additive [B, L, L] attention-bias block added to
    the extended mask — the PreFLMR attention-fusion mechanism
    (`attention_fusion.py:84-102`).
    """

    config: BertConfig
    add_pooling_layer: bool = True

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None, token_type_ids=None,
                 inputs_embeds=None, attention_adj=None):
        cfg = self.config
        x = BertEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, inputs_embeds=inputs_embeds
        )
        # the fused paths apply only to plain padding masks; an attention_adj
        # bias (attention fusion) needs the materialized score tensor
        can_flash = (
            cfg.use_flash_attention or cfg.use_pallas_attention
        ) and attention_adj is None
        mask_bias = None
        if attention_mask is not None and not can_flash:
            mask_bias = additive_mask(attention_mask)
        if attention_adj is not None:
            adj = attention_adj[:, None, :, :]  # broadcast over heads
            mask_bias = adj if mask_bias is None else mask_bias + adj
        last_hidden, all_hidden = BertEncoder(cfg, name="encoder")(
            x, mask_bias=mask_bias,
            segment_mask=attention_mask if can_flash else None,
            can_flash=can_flash,
        )
        pooled = None
        if self.add_pooling_layer:
            pooled = nn.tanh(_dense(cfg.hidden_size, cfg, "pooler")(last_hidden[:, 0]))
        return {
            "last_hidden_state": last_hidden,
            "pooler_output": pooled,
            "hidden_states": all_hidden,
        }
