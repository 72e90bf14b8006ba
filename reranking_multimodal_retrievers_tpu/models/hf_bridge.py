"""Checkpoint bridge: HuggingFace/PyTorch weights → Flax params.

Loads reference-format checkpoints (``LinWeizheDragon/PreFLMR_ViT-*`` — the
torch ``FLMRModelForRetrieval`` layout of `modeling_flmr.py:553-723`, plus
plain HF ``BertModel`` / ``CLIPVisionModel``) into this framework's Flax
parameter trees. The inverse of the reference's own conversion tool
(`tools/convert_flmr_original_checkpoint_to_pytorch.py`).

All inputs are flat ``{name: np.ndarray}`` dicts — obtain one with
``state_dict_from_torch`` (live torch module) or
``load_torch_checkpoint_dir`` (a saved HF directory with .bin/.safetensors).
"""

from __future__ import annotations

import os
import re
import zlib
from typing import Dict

import numpy as np


def _to_numpy(v) -> np.ndarray:
    """torch tensor → numpy; bf16 has no numpy dtype, go through float32."""
    v = v.detach().cpu() if hasattr(v, "detach") else v
    if hasattr(v, "dtype") and str(v.dtype) == "torch.bfloat16":
        v = v.float()
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def state_dict_from_torch(module) -> Dict[str, np.ndarray]:
    return {k: _to_numpy(v) for k, v in module.state_dict().items()}


def load_torch_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all weights from an HF checkpoint directory (safetensors or bin)."""
    out: Dict[str, np.ndarray] = {}
    names = sorted(os.listdir(path))
    st_files = [n for n in names if n.endswith(".safetensors")]
    bin_files = [n for n in names if n.endswith(".bin")]
    if st_files:
        # load via torch, not safetensors.numpy: bf16 checkpoints have no
        # numpy dtype and the numpy loader rejects them
        from safetensors.torch import load_file

        for n in st_files:
            sd = load_file(os.path.join(path, n))
            out.update({k: _to_numpy(v) for k, v in sd.items()})
    elif bin_files:
        import torch

        for n in bin_files:
            sd = torch.load(os.path.join(path, n), map_location="cpu", weights_only=True)
            out.update({k: _to_numpy(v) for k, v in sd.items()})
    else:
        raise FileNotFoundError(f"no .safetensors or .bin files under {path}")
    return out


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _linear(sd, torch_name):
    out = {"kernel": np.ascontiguousarray(sd[f"{torch_name}.weight"].T)}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _layernorm(sd, torch_name):
    return {"scale": sd[f"{torch_name}.weight"], "bias": sd[f"{torch_name}.bias"]}


def _embed(sd, torch_name):
    return {"embedding": sd[f"{torch_name}.weight"]}


def bert_attention_params(sd, prefix):
    """HF ``BertAttention`` (self + output) → our ``BertAttention``."""
    return {
        "query": _linear(sd, f"{prefix}.self.query"),
        "key": _linear(sd, f"{prefix}.self.key"),
        "value": _linear(sd, f"{prefix}.self.value"),
        "out": _linear(sd, f"{prefix}.output.dense"),
        "layernorm": _layernorm(sd, f"{prefix}.output.LayerNorm"),
    }


def bert_layer_params(sd, prefix, cross_attention=False):
    p = {
        "attention": bert_attention_params(sd, f"{prefix}.attention"),
        "intermediate": _linear(sd, f"{prefix}.intermediate.dense"),
        "output": _linear(sd, f"{prefix}.output.dense"),
        "layernorm": _layernorm(sd, f"{prefix}.output.LayerNorm"),
    }
    if cross_attention and f"{prefix}.crossattention.self.query.weight" in sd:
        p["crossattention"] = bert_attention_params(sd, f"{prefix}.crossattention")
    return p


def bert_encoder_params(sd, prefix="encoder", cross_attention=False):
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"{re.escape(prefix)}\.layer\.(\d+)\.", k))
        }
    )
    return {
        f"layer_{i}": bert_layer_params(sd, f"{prefix}.layer.{i}", cross_attention)
        for i in layer_ids
    }


def bert_model_params(sd: Dict[str, np.ndarray]) -> dict:
    """HF ``BertModel`` state dict → our ``BertModel`` params."""
    p = {
        "embeddings": {
            "word_embeddings": _embed(sd, "embeddings.word_embeddings"),
            "position_embeddings": _embed(sd, "embeddings.position_embeddings"),
            "token_type_embeddings": _embed(sd, "embeddings.token_type_embeddings"),
            "layernorm": _layernorm(sd, "embeddings.LayerNorm"),
        },
        "encoder": bert_encoder_params(sd, "encoder"),
    }
    if "pooler.dense.weight" in sd:
        p["pooler"] = _linear(sd, "pooler.dense")
    return p


def clip_vision_params(sd: Dict[str, np.ndarray]) -> dict:
    """HF ``CLIPVisionModel``'s inner ``vision_model`` state dict → our
    ``CLIPVisionModel`` params. Conv kernel OIHW → HWIO."""
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
        }
    )
    p = {
        "embeddings": {
            "class_embedding": sd["embeddings.class_embedding"],
            "position_embedding": sd["embeddings.position_embedding.weight"],
            "patch_embedding": {
                "kernel": np.ascontiguousarray(
                    sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
                )
            },
        },
        "pre_layrnorm": _layernorm(sd, "pre_layrnorm"),
        "post_layernorm": _layernorm(sd, "post_layernorm"),
    }
    for i in layer_ids:
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _linear(sd, f"{pre}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{pre}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{pre}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{pre}.self_attn.out_proj"),
            },
            "layer_norm1": _layernorm(sd, f"{pre}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{pre}.layer_norm2"),
            "fc1": _linear(sd, f"{pre}.mlp.fc1"),
            "fc2": _linear(sd, f"{pre}.mlp.fc2"),
        }
    return p


def _t5_linear(sd, torch_name, lora_r: int = 0):
    """T5 linears are bias-free; with LoRA the Flax module nests the frozen
    kernel under ``base`` and fresh adapters are synthesized (``lora_b`` is
    zero, so the bridged model equals the pretrained one — peft's own init)."""
    w = sd[f"{torch_name}.weight"]  # torch [out, in]
    p = {"kernel": np.ascontiguousarray(w.T)}
    if lora_r <= 0:
        return p
    # crc32, not hash(): str hash is salted per process, which would make
    # the synthesized lora_a differ on every run (irreproducible bridges)
    rng = np.random.default_rng(zlib.crc32(torch_name.encode()))
    return {
        "base": p,
        "lora_a": (rng.normal(0, 1e-2, size=(w.shape[1], lora_r))).astype(w.dtype),
        "lora_b": np.zeros((lora_r, w.shape[0]), w.dtype),
    }


def _t5_layernorm(sd, torch_name):
    return {"weight": sd[f"{torch_name}.weight"]}


def t5_attention_params(sd, prefix, lora_r: int = 0, rel_bias: bool = False):
    p = {
        "q": _t5_linear(sd, f"{prefix}.q", lora_r=lora_r),
        "k": _t5_linear(sd, f"{prefix}.k"),
        "v": _t5_linear(sd, f"{prefix}.v", lora_r=lora_r),
        "o": _t5_linear(sd, f"{prefix}.o"),
    }
    if rel_bias and f"{prefix}.relative_attention_bias.weight" in sd:
        p["relative_attention_bias"] = _embed(sd, f"{prefix}.relative_attention_bias")
    return p


def t5_ff_params(sd, prefix, gated: bool):
    if gated:
        return {
            "wi_0": _t5_linear(sd, f"{prefix}.wi_0"),
            "wi_1": _t5_linear(sd, f"{prefix}.wi_1"),
            "wo": _t5_linear(sd, f"{prefix}.wo"),
        }
    return {"wi": _t5_linear(sd, f"{prefix}.wi"), "wo": _t5_linear(sd, f"{prefix}.wo")}


def t5_stack_params(sd, prefix, num_layers, is_decoder, gated, lora_r=0):
    """HF ``T5Stack`` (``encoder.block.N.layer.M...``) → our ``T5Stack``.
    HF sublayer indices: 0=self-attn, (decoder) 1=cross-attn, last=FFN."""
    p = {}
    for i in range(num_layers):
        b = f"{prefix}.block.{i}"
        blk = {
            "self_attn": t5_attention_params(
                sd, f"{b}.layer.0.SelfAttention", lora_r=lora_r, rel_bias=(i == 0)
            ),
            "self_attn_norm": _t5_layernorm(sd, f"{b}.layer.0.layer_norm"),
        }
        ff_idx = 1
        if is_decoder:
            blk["cross_attn"] = t5_attention_params(
                sd, f"{b}.layer.1.EncDecAttention", lora_r=lora_r
            )
            blk["cross_attn_norm"] = _t5_layernorm(sd, f"{b}.layer.1.layer_norm")
            ff_idx = 2
        blk["ff"] = t5_ff_params(sd, f"{b}.layer.{ff_idx}.DenseReluDense", gated)
        blk["ff_norm"] = _t5_layernorm(sd, f"{b}.layer.{ff_idx}.layer_norm")
        p[f"block_{i}"] = blk
    p["final_norm"] = _t5_layernorm(sd, f"{prefix}.final_layer_norm")
    return p


def t5_params(sd: Dict[str, np.ndarray], config) -> dict:
    """HF ``T5ForConditionalGeneration`` state dict → our Flax params.

    ``config`` is our :class:`~.t5.T5Config`; ``config.lora_r > 0`` nests the
    q/v kernels under LoRA bases (zero-initialized adapters, so outputs match
    the pretrained torch model exactly — reference wraps with peft the same
    way, `decoder_rerank_model.py:103-114`)."""
    p = {
        "shared": _embed(sd, "shared"),
        "encoder": t5_stack_params(
            sd, "encoder", config.num_layers, False, config.is_gated_act,
            config.lora_r,
        ),
        "decoder": t5_stack_params(
            sd, "decoder", config.num_decoder_layers, True, config.is_gated_act,
            config.lora_r,
        ),
    }
    if not config.tie_word_embeddings:
        p["lm_head"] = _linear(sd, "lm_head")
    return p


def _opt_linear(sd, torch_name, lora_r: int = 0):
    """OPT linears carry biases; with LoRA the kernel+bias nest under
    ``base`` and fresh zero adapters are synthesized (peft init — bridged
    outputs equal the pretrained torch model)."""
    p = _linear(sd, torch_name)
    if lora_r <= 0:
        return p
    w = sd[f"{torch_name}.weight"]  # torch [out, in]
    # crc32, not hash(): str hash is salted per process, which would make
    # the synthesized lora_a differ on every run (irreproducible bridges)
    rng = np.random.default_rng(zlib.crc32(torch_name.encode()))
    return {
        "base": p,
        "lora_a": rng.normal(0, 1e-2, size=(w.shape[1], lora_r)).astype(w.dtype),
        "lora_b": np.zeros((lora_r, w.shape[0]), w.dtype),
    }


def opt_params(sd: Dict[str, np.ndarray], config) -> dict:
    """HF ``OPTForCausalLM`` state dict → our :class:`~.opt.OPTForCausalLM`
    params. ``config`` is our :class:`~.opt.OPTConfig`; ``lora_r > 0`` nests
    the q/v kernels under LoRA bases (peft's default OPT targets,
    `decoder_rerank_model.py:103-114`). The lm_head is tied to
    ``embed_tokens`` (HF OPT), so no separate head weights are bridged."""
    dec = _strip_prefix(sd, "model.decoder.")
    if not dec:  # already decoder-level (e.g. OPTModel.decoder)
        dec = sd
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in dec
            if (m := re.match(r"layers\.(\d+)\.", k))
        }
    )
    p = {
        "embed_tokens": _embed(dec, "embed_tokens"),
        "embed_positions": _embed(dec, "embed_positions"),
    }
    if "final_layer_norm.weight" in dec:
        p["final_layer_norm"] = _layernorm(dec, "final_layer_norm")
    if "project_in.weight" in dec:
        p["project_in"] = _linear(dec, "project_in")
        p["project_out"] = _linear(dec, "project_out")
    for i in layer_ids:
        pre = f"layers.{i}"
        p[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _opt_linear(dec, f"{pre}.self_attn.q_proj",
                                      config.lora_r),
                "k_proj": _linear(dec, f"{pre}.self_attn.k_proj"),
                "v_proj": _opt_linear(dec, f"{pre}.self_attn.v_proj",
                                      config.lora_r),
                "out_proj": _linear(dec, f"{pre}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _layernorm(dec, f"{pre}.self_attn_layer_norm"),
            "final_layer_norm": _layernorm(dec, f"{pre}.final_layer_norm"),
            "fc1": _linear(dec, f"{pre}.fc1"),
            "fc2": _linear(dec, f"{pre}.fc2"),
        }
    return p


def blip2_vision_params(sd: Dict[str, np.ndarray]) -> dict:
    """HF ``Blip2VisionModel`` state dict (``vision_model.*`` stripped) → our
    ``Blip2VisionModel`` params. Conv kernel OIHW → HWIO; class/position
    embeddings are plain [1, ...] parameters in BLIP-2 (not Embeds)."""
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
        }
    )
    p = {
        "embeddings": {
            "class_embedding": sd["embeddings.class_embedding"],
            "position_embedding": sd["embeddings.position_embedding"],
            "patch_embedding": {
                "kernel": np.ascontiguousarray(
                    sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": sd["embeddings.patch_embedding.bias"],
            },
        },
        "post_layernorm": _layernorm(sd, "post_layernorm"),
    }
    for i in layer_ids:
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}_attn"] = {
            "qkv": _linear(sd, f"{pre}.self_attn.qkv"),
            "projection": _linear(sd, f"{pre}.self_attn.projection"),
        }
        p[f"layer_{i}_norm1"] = _layernorm(sd, f"{pre}.layer_norm1")
        p[f"layer_{i}_norm2"] = _layernorm(sd, f"{pre}.layer_norm2")
        p[f"layer_{i}_fc1"] = _linear(sd, f"{pre}.mlp.fc1")
        p[f"layer_{i}_fc2"] = _linear(sd, f"{pre}.mlp.fc2")
    return p


def blip2_qformer_params(sd: Dict[str, np.ndarray], query_tokens: np.ndarray) -> dict:
    """HF ``Blip2QFormerModel`` (``qformer.*`` stripped) + top-level
    ``query_tokens`` → our ``Blip2QFormer`` params (query branch only)."""
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"encoder\.layer\.(\d+)\.", k))
        }
    )
    p = {
        "query_tokens": query_tokens,
        "layernorm": _layernorm(sd, "layernorm"),
    }
    for i in layer_ids:
        pre = f"encoder.layer.{i}"
        p[f"layer_{i}_attention"] = {
            "query": _linear(sd, f"{pre}.attention.attention.query"),
            "key": _linear(sd, f"{pre}.attention.attention.key"),
            "value": _linear(sd, f"{pre}.attention.attention.value"),
            "out": _linear(sd, f"{pre}.attention.output.dense"),
            "layernorm": _layernorm(sd, f"{pre}.attention.output.LayerNorm"),
        }
        if f"{pre}.crossattention.attention.query.weight" in sd:
            p[f"layer_{i}_crossattention"] = {
                "query": _linear(sd, f"{pre}.crossattention.attention.query"),
                "key": _linear(sd, f"{pre}.crossattention.attention.key"),
                "value": _linear(sd, f"{pre}.crossattention.attention.value"),
                "out": _linear(sd, f"{pre}.crossattention.output.dense"),
                "layernorm": _layernorm(sd, f"{pre}.crossattention.output.LayerNorm"),
            }
        p[f"layer_{i}_intermediate_query"] = _linear(sd, f"{pre}.intermediate_query.dense")
        p[f"layer_{i}_output_query"] = _linear(sd, f"{pre}.output_query.dense")
        p[f"layer_{i}_output_query_norm"] = _layernorm(sd, f"{pre}.output_query.LayerNorm")
    return p


def blip2_params(sd: Dict[str, np.ndarray], config) -> dict:
    """HF ``Blip2ForConditionalGeneration`` state dict → our Flax params.
    ``config`` is our :class:`~.blip2.Blip2Config`; the LM is a T5 (Flan-T5,
    `decoder_rerank_model.py:89-96`) or an OPT (``blip2-opt-*``, the
    reference's best reranker, `monoBLIP2-Opt_pointwise.jsonnet:115`) —
    dispatched on the text-config type."""
    from .opt import OPTConfig

    lm_sd = _strip_prefix(sd, "language_model.")
    lm_params = (
        opt_params(lm_sd, config.text_config)
        if isinstance(config.text_config, OPTConfig)
        else t5_params(lm_sd, config.text_config)
    )
    return {
        "vision_model": blip2_vision_params(_strip_prefix(sd, "vision_model.")),
        "qformer": blip2_qformer_params(
            _strip_prefix(sd, "qformer."), sd["query_tokens"][0:1]
        ),
        "language_projection": _linear(sd, "language_projection"),
        "language_model": lm_params,
    }


def vision_projection_params(sd, prefix):
    """Reference ``FLMRMultiLayerPerceptron`` (Linear,Tanh,Linear as
    ``model.0``/``model.2``) → our ``VisionProjection`` fc1/fc2."""
    return {
        "fc1": _linear(sd, f"{prefix}.model.0"),
        "fc2": _linear(sd, f"{prefix}.model.2"),
    }


def flmr_params(sd: Dict[str, np.ndarray], config) -> dict:
    """Reference ``FLMRModelForRetrieval`` state dict → our Flax params.

    Handles both tied and separate query/context encoders; when encoders are
    tied the torch checkpoint stores (or aliases) both names and we read the
    context copy, matching `modeling_flmr.py:666-691`.
    """
    p = {
        "context_text_encoder": bert_model_params(
            _strip_prefix(sd, "context_text_encoder.bert_model.")
        ),
        "context_text_encoder_linear": _linear(sd, "context_text_encoder_linear"),
    }
    if config.separate_query_and_context_text_encoder:
        p["query_text_encoder"] = bert_model_params(
            _strip_prefix(sd, "query_text_encoder.bert_model.")
        )
        p["query_text_encoder_linear"] = _linear(sd, "query_text_encoder_linear")
    if config.use_vision_encoder:
        p["context_vision_encoder"] = clip_vision_params(
            _strip_prefix(sd, "context_vision_encoder.vision_model.vision_model.")
        )
        p["context_vision_projection"] = vision_projection_params(
            sd, "context_vision_projection"
        )
        if config.separate_query_and_context_vision_encoder:
            p["query_vision_encoder"] = clip_vision_params(
                _strip_prefix(sd, "query_vision_encoder.vision_model.vision_model.")
            )
            p["query_vision_projection"] = vision_projection_params(
                sd, "query_vision_projection"
            )
        if config.use_transformer_mapping_network:
            p["transformer_mapping_input_linear"] = _linear(
                sd, "transformer_mapping_input_linear"
            )
            p["transformer_mapping_network"] = bert_encoder_params(
                sd, "transformer_mapping_network", cross_attention=True
            )
            p["transformer_mapping_output_linear"] = _linear(
                sd, "transformer_mapping_output_linear"
            )
    return p
