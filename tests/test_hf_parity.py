"""Numerical parity of the Flax encoders against HuggingFace torch models.

Random-init tiny torch models are converted through the HF bridge and both
sides are fed identical inputs — the strongest offline check that the Flax
re-implementations match the architectures the reference builds on
(`modeling_flmr.py:1616-1757`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from reranking_multimodal_retrievers_tpu.models import (
    BertConfig,
    BertModel,
    CLIPVisionConfig,
    CLIPVisionModel,
)
from reranking_multimodal_retrievers_tpu.models.hf_bridge import (
    bert_model_params,
    clip_vision_params,
    state_dict_from_torch,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def test_bert_parity():
    hf_cfg = transformers.BertConfig(
        vocab_size=512,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 512, size=(3, 17)).astype(np.int64)
    lens = np.array([17, 9, 12])
    mask = (np.arange(17)[None] < lens[:, None]).astype(np.int64)

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    cfg = BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    )
    model = BertModel(cfg)
    params = {"params": bert_model_params(state_dict_from_torch(hf))}
    got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    got_np = np.asarray(got["last_hidden_state"])
    # compare only attended positions (padded rows see different masks bias)
    m = mask.astype(bool)
    np.testing.assert_allclose(got_np[m], want[m], **TOL)


def test_bert_pooler_parity():
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.BertModel(hf_cfg).eval()
    ids = np.arange(1, 11).reshape(1, 10)
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).pooler_output.numpy()
    cfg = BertConfig(vocab_size=128, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32)
    got = BertModel(cfg).apply(
        {"params": bert_model_params(state_dict_from_torch(hf))},
        jnp.asarray(ids), jnp.asarray(mask),
    )["pooler_output"]
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_clip_vision_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pix), output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()
    want_second_last = out.hidden_states[-2].numpy()

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=16)
    sd = state_dict_from_torch(hf.vision_model)
    got = CLIPVisionModel(cfg).apply(
        {"params": clip_vision_params(sd)}, jnp.asarray(pix)
    )
    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]), want_last, **TOL)
    np.testing.assert_allclose(np.asarray(got["pooler_output"]), want_pooled, **TOL)
    np.testing.assert_allclose(
        np.asarray(got["hidden_states"][-2]), want_second_last, **TOL
    )


def test_bert_cross_attention_parity():
    """Bare BertEncoder with cross-attention — the transformer mapping
    network architecture (`modeling_flmr.py:619-658`)."""
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        is_decoder=True, add_cross_attention=True,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(2)
    from transformers.models.bert.modeling_bert import BertEncoder as HFBertEncoder

    hf = HFBertEncoder(hf_cfg).eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    enc = rng.normal(size=(2, 7, 32)).astype(np.float32)
    enc_mask = np.ones((2, 7), np.float32)
    # reference-style inverted mask: (1-mask)*finfo.min
    inv = torch.tensor((1.0 - enc_mask)[:, None, None, :]) * torch.finfo(torch.float32).min

    with torch.no_grad():
        want = hf(
            torch.tensor(x),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=inv,
        ).last_hidden_state.numpy()

    import re as _re
    from reranking_multimodal_retrievers_tpu.models.bert import (
        BertEncoder, additive_mask,
    )
    from reranking_multimodal_retrievers_tpu.models.hf_bridge import bert_layer_params

    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64, add_cross_attention=True,
    )
    sd = state_dict_from_torch(hf)
    # bare-encoder state dict keys start with "layer.N."
    layer_ids = sorted({int(m.group(1)) for k in sd if (m := _re.match(r"layer\.(\d+)\.", k))})
    params = {
        f"layer_{i}": bert_layer_params(sd, f"layer.{i}", cross_attention=True)
        for i in layer_ids
    }
    got, _ = BertEncoder(cfg).apply(
        {"params": params},
        jnp.asarray(x),
        mask_bias=None,
        encoder_hidden_states=jnp.asarray(enc),
        encoder_mask_bias=additive_mask(jnp.asarray(enc_mask)),
    )
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_bridge_handles_bfloat16_tensors():
    """bf16 checkpoints have no numpy dtype; the bridge must convert via
    float32 instead of raising."""
    import numpy as np
    import torch

    from reranking_multimodal_retrievers_tpu.models.hf_bridge import (
        state_dict_from_torch, _to_numpy,
    )

    t = torch.arange(6, dtype=torch.float32).reshape(2, 3).to(torch.bfloat16)
    out = _to_numpy(t)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, np.arange(6, dtype=np.float32).reshape(2, 3))

    lin = torch.nn.Linear(2, 2).to(torch.bfloat16)
    sd = state_dict_from_torch(lin)
    assert all(v.dtype == np.float32 for v in sd.values())
