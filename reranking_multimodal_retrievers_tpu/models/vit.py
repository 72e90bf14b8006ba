"""CLIP vision transformer in Flax, TPU-first.

Functionally equivalent to HuggingFace ``CLIPVisionModel`` (the reference's
FLMR vision encoder, `modeling_flmr.py:1701-1757`): patch conv embedding with
a class token and learned positions, pre-LayerNorm residual blocks with
quick-GELU, and a ``post_layernorm`` applied ONLY to the pooled CLS token —
``last_hidden_state`` is returned un-normalized, which matters because FLMR
reads ``last_hidden_state[:, 0]`` (`modeling_flmr.py:1295`) and the
second-to-last hidden layer (`modeling_flmr.py:1309-1311`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
        )
        defaults.update(kw)
        return cls(**defaults)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, L, H = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(H, name="q_proj")(x).reshape(B, L, nh, hd)
        k = nn.Dense(H, name="k_proj")(x).reshape(B, L, nh, hd)
        v = nn.Dense(H, name="v_proj")(x).reshape(B, L, nh, hd)
        scores = jnp.einsum(
            "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(hd).astype(jnp.float32)
        probs = nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum(
            "bnqk,bknd->bqnd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(B, L, H)
        return nn.Dense(H, name="out_proj")(ctx)


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x + CLIPAttention(cfg, name="self_attn")(
            nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        )
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, name="fc2")(h)
        return x + h


class CLIPVisionEmbeddings(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, C, H, W] (HF convention, NCHW)."""
        cfg = self.config
        B = pixel_values.shape[0]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC for flax Conv
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            name="patch_embedding",
        )(x)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(cls[None, None, :], (B, 1, cfg.hidden_size)).astype(
            patches.dtype
        )
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_positions, cfg.hidden_size),
        )
        return x + pos[None, : x.shape[1]].astype(x.dtype)


class CLIPVisionModel(nn.Module):
    """Returns last_hidden_state (no post-LN), pooled CLS (post-LN), and the
    per-layer hidden-state tuple (index −2 = input to the last layer, as the
    reference consumes it)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        x = CLIPVisionEmbeddings(cfg, name="embeddings")(pixel_values)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm")(x)
        all_hidden = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layer_{i}")(x)
            all_hidden.append(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(
            x[:, 0]
        )
        return {
            "last_hidden_state": x,
            "pooler_output": pooled,
            "hidden_states": tuple(all_hidden),
        }
