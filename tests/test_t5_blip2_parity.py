"""Golden parity of the T5 / BLIP-2 backbones vs torch transformers.

The reference's monoBLIP-2 reranker wraps HF ``Blip2ForConditionalGeneration``
(`src/models/rerank/decoder_rerank_model.py:89-159`). These tests bridge
random-weight torch models through ``hf_bridge`` and assert logit parity, so a
real ``Salesforce/blip2-flan-t5-*`` checkpoint loads correctly (no network in
CI — random weights exercise every wiring path the pretrained ones would).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reranking_multimodal_retrievers_tpu.models.t5 import (
    T5Config,
    T5ForConditionalGeneration,
)
from reranking_multimodal_retrievers_tpu.models.blip2 import (
    Blip2Config,
    Blip2VisionConfig,
    Blip2QFormerConfig,
    Blip2ForConditionalGeneration,
)
from reranking_multimodal_retrievers_tpu.models.hf_bridge import (
    state_dict_from_torch,
    t5_params,
    blip2_params,
)


def _hf_t5_config(**kw):
    from transformers import T5Config as HFT5Config

    defaults = dict(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_decoder_layers=2, num_heads=4, is_gated_act=True,
        dense_act_fn="gelu_new", tie_word_embeddings=False,
        decoder_start_token_id=0, dropout_rate=0.0,
    )
    defaults.update(kw)
    return HFT5Config(**defaults)


@pytest.fixture(scope="module")
def io():
    rng = np.random.default_rng(0)
    B, Lq, Ld = 3, 11, 5
    ids = rng.integers(1, 62, size=(B, Lq))
    am = np.ones((B, Lq), np.int64)
    am[0, 8:] = 0
    dec = rng.integers(1, 62, size=(B, Ld))
    return ids, am, dec


def test_t5_flan_parity(io):
    from transformers import T5ForConditionalGeneration as HFT5

    ids, am, dec = io
    torch.manual_seed(0)
    hf = HFT5(_hf_t5_config()).eval()
    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_decoder_layers=2, num_heads=4, lora_r=4)
    params = t5_params(state_dict_from_torch(hf), cfg)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    model = T5ForConditionalGeneration(cfg)
    got, _ = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                         jnp.asarray(am, jnp.int32), jnp.asarray(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_t5_tied_ungated_parity(io):
    from transformers import T5ForConditionalGeneration as HFT5

    ids, am, dec = io
    torch.manual_seed(1)
    hf = HFT5(_hf_t5_config(is_gated_act=False, dense_act_fn="relu",
                            tie_word_embeddings=True, num_layers=1,
                            num_decoder_layers=1)).eval()
    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=1,
                   num_decoder_layers=1, num_heads=4, is_gated_act=False,
                   dense_act_fn="relu", tie_word_embeddings=True)
    params = t5_params(state_dict_from_torch(hf), cfg)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
                 decoder_input_ids=torch.tensor(dec),
                 output_hidden_states=True)
        ref = out.logits.numpy()
        ref_h = out.decoder_hidden_states[-1].numpy()
    model = T5ForConditionalGeneration(cfg)
    got, hidden = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                              jnp.asarray(am, jnp.int32),
                              jnp.asarray(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)
    # HF scales by d_model**-0.5 only inside the tied logits projection —
    # the returned hidden states must be UNSCALED (heads trained on HF
    # last_hidden_state consume them; regression: decode() used to return
    # the scaled tensor)
    np.testing.assert_allclose(np.asarray(hidden), ref_h, atol=2e-4)


def _tiny_blip2_pair():
    from transformers import Blip2Config as HFBlip2Config
    from transformers import Blip2ForConditionalGeneration as HFBlip2
    from transformers.models.blip_2.configuration_blip_2 import (
        Blip2VisionConfig as HFVC,
        Blip2QFormerConfig as HFQC,
    )

    vc = HFVC(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
              num_attention_heads=4, image_size=32, patch_size=8,
              attention_dropout=0.0, hidden_act="gelu")
    qc = HFQC(vocab_size=32, hidden_size=16, num_hidden_layers=2,
              num_attention_heads=4, intermediate_size=32,
              encoder_hidden_size=16, cross_attention_frequency=2,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf_cfg = HFBlip2Config.from_vision_qformer_text_configs(vc, qc, _hf_t5_config())
    hf_cfg.num_query_tokens = 4
    hf_cfg.image_token_index = 63
    torch.manual_seed(0)
    hf = HFBlip2(hf_cfg).eval()

    cfg = Blip2Config(
        vision_config=Blip2VisionConfig.tiny(),
        qformer_config=Blip2QFormerConfig.tiny(),
        text_config=T5Config.tiny(lora_r=4),
        num_query_tokens=4,
    )
    return hf, cfg


def test_blip2_parity(io):
    ids, am, dec = io
    hf, cfg = _tiny_blip2_pair()
    params = blip2_params(state_dict_from_torch(hf), cfg)
    B = ids.shape[0]
    rng = np.random.default_rng(3)
    pix = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)

    # newer HF prepends via <image> placeholder tokens; placeholders at the
    # front == the original prepend (reference transformers 4.x behavior)
    ids_hf = np.concatenate([np.full((B, 4), 63, np.int64), ids], axis=1)
    am_hf = np.concatenate([np.ones((B, 4), np.int64), am], axis=1)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pix), input_ids=torch.tensor(ids_hf),
                 attention_mask=torch.tensor(am_hf),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()

    model = Blip2ForConditionalGeneration(cfg)
    got, _ = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                         jnp.asarray(am, jnp.int32), jnp.asarray(dec, jnp.int32),
                         pixel_values=jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_blip2_decoder_reranker_scoring(io):
    """The yes/no scoring interface (reference `decoder_rerank_model.py:147-159`)
    on the bridged backbone: p(yes) equals the torch computation, and the
    precomputed-vision path equals the pixel path."""
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        Blip2DecoderRerankModel,
        Blip2RerankConfig,
    )

    ids, am, _ = io
    hf, blip2_cfg = _tiny_blip2_pair()
    cfg = Blip2RerankConfig(blip2=blip2_cfg, yes_token_id=10, no_token_id=11)
    params = {"model": blip2_params(state_dict_from_torch(hf), blip2_cfg)}
    model = Blip2DecoderRerankModel(cfg)

    B, nway = 1, 3
    expanded = B * nway
    rng = np.random.default_rng(7)
    e_ids = rng.integers(1, 62, size=(expanded, 9))
    e_am = np.ones((expanded, 9), np.int64)
    pix = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)

    out = model.apply({"params": params}, jnp.asarray(e_ids, jnp.int32),
                      jnp.asarray(e_am, jnp.int32), jnp.asarray(pix),
                      num_negative_examples=nway - 1)
    assert out.logits.shape == (expanded, 1)
    assert np.isfinite(float(out.loss))

    # torch oracle for p(yes)
    ids_hf = np.concatenate([np.full((expanded, 4), 63, np.int64), e_ids], axis=1)
    am_hf = np.concatenate([np.ones((expanded, 4), np.int64), e_am], axis=1)
    with torch.no_grad():
        logits = hf(
            pixel_values=torch.tensor(np.repeat(pix, nway, axis=0)),
            input_ids=torch.tensor(ids_hf), attention_mask=torch.tensor(am_hf),
            decoder_input_ids=torch.zeros((expanded, 1), dtype=torch.long),
        ).logits[:, 0, :]
        stacked = torch.stack([logits[:, 10], logits[:, 11]], dim=-1)
        ref_p_yes = torch.softmax(stacked, dim=-1)[:, 0:1].numpy()
    np.testing.assert_allclose(np.asarray(out.logits), ref_p_yes, atol=2e-4)

    # precomputed vision_feats path == pixel path
    prefix = model.apply({"params": params}, jnp.asarray(pix),
                         method=Blip2DecoderRerankModel.encode_vision)
    out2 = model.apply({"params": params}, jnp.asarray(e_ids, jnp.int32),
                       jnp.asarray(e_am, jnp.int32), None,
                       num_negative_examples=nway - 1,
                       vision_feats=jnp.repeat(prefix, nway, axis=0))
    np.testing.assert_allclose(
        np.asarray(out2.logits), np.asarray(out.logits), atol=1e-5
    )


def test_t5_single_token_decode_reorder_with_lora(io):
    """The Lq=1 cross-attention associativity reorder (`t5.py::T5Attention`,
    the one-pass yes/no scoring path) must agree with the general decode
    path from the SAME param tree — including a LoRA adapter with non-zero
    ``lora_b`` (bridged checkpoints zero it, so the bridge parity tests
    never exercise the reordered LoRA correction term)."""
    import jax

    ids, am, dec = io
    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_decoder_layers=2, num_heads=4, lora_r=4,
                   decoder_start_token_id=0)
    model = T5ForConditionalGeneration(cfg)
    B = ids.shape[0]
    dec3 = jnp.asarray(dec[:, :3], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                        jnp.asarray(am, jnp.int32), dec3)["params"]
    # randomize every LoRA param (lora_b inits to zero → correction would
    # otherwise vanish)
    cnt = [0]

    def bump(path, x):
        name = "/".join(str(p.key) for p in path)
        if "lora" in name:
            cnt[0] += 1
            return jnp.asarray(
                np.random.default_rng(cnt[0]).normal(size=x.shape), x.dtype)
        return x

    params = jax.tree_util.tree_map_with_path(bump, params)
    assert cnt[0] >= 8  # q+v adapters, 2 self/cross layers
    enc = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(am, jnp.int32),
                      method=T5ForConditionalGeneration.encode)
    run = lambda d: model.apply(
        {"params": params}, d, enc, jnp.asarray(am, jnp.int32),
        method=T5ForConditionalGeneration.decode)[0]
    full = run(dec3)            # general path (Lq=3)
    single = run(dec3[:, :1])   # reordered path (Lq=1)
    np.testing.assert_allclose(np.asarray(single)[:, 0],
                               np.asarray(full)[:, 0], atol=2e-5)
