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
from typing import Dict

import numpy as np


def state_dict_from_torch(module) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def load_torch_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all weights from an HF checkpoint directory (safetensors or bin)."""
    out: Dict[str, np.ndarray] = {}
    names = sorted(os.listdir(path))
    st_files = [n for n in names if n.endswith(".safetensors")]
    bin_files = [n for n in names if n.endswith(".bin")]
    if st_files:
        from safetensors.numpy import load_file

        for n in st_files:
            out.update(load_file(os.path.join(path, n)))
    elif bin_files:
        import torch

        for n in bin_files:
            sd = torch.load(os.path.join(path, n), map_location="cpu", weights_only=True)
            out.update({k: v.numpy() for k, v in sd.items()})
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
