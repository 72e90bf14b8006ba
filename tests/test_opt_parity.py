"""Golden parity of the OPT decoder-only backbone vs torch transformers.

The reference's single best reranker is monoBLIP2-Opt
(``Salesforce/blip2-opt-2.7b``,
`configs/Rerank/OKVQA/Seq2Seq/monoBLIP2-Opt_pointwise.jsonnet:112-116`,
OK-VQA R@5 0.40) scored via yes/no token probabilities
(`src/models/rerank/decoder_rerank_model.py:121-159`). These tests bridge
random-weight torch models through ``hf_bridge.opt_params`` and assert logit
parity, so a real checkpoint loads correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from reranking_multimodal_retrievers_tpu.models.opt import (
    OPTConfig,
    OPTForCausalLM,
    opt_positions,
)
from reranking_multimodal_retrievers_tpu.models.blip2 import (
    Blip2Config,
    Blip2VisionConfig,
    Blip2QFormerConfig,
    Blip2ForConditionalGeneration,
)
from reranking_multimodal_retrievers_tpu.models.hf_bridge import (
    state_dict_from_torch,
    opt_params,
    blip2_params,
)


def _hf_opt_config(**kw):
    from transformers import OPTConfig as HFOPTConfig

    defaults = dict(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=32, max_position_embeddings=64,
        word_embed_proj_dim=16, do_layer_norm_before=True,
        activation_function="relu", dropout=0.0, attention_dropout=0.0,
        layerdrop=0.0, pad_token_id=1, bos_token_id=2, eos_token_id=2,
    )
    defaults.update(kw)
    return HFOPTConfig(**defaults)


@pytest.fixture(scope="module")
def io():
    rng = np.random.default_rng(0)
    B, L = 3, 11
    ids = rng.integers(3, 62, size=(B, L))
    am = np.ones((B, L), np.int64)
    am[0, 8:] = 0  # right padding exercises the cumsum position path
    ids[0, 8:] = 1
    return ids, am


def test_opt_positions_hf_semantics():
    am = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    pos = np.asarray(opt_positions(jnp.asarray(am)))
    # HF: cumsum(mask)*mask - 1; pads sit at -1 (embedding row 1 after +2)
    np.testing.assert_array_equal(pos, [[0, 1, 2, -1, -1], [0, 1, 2, 3, 4]])


def test_opt_pre_ln_parity(io):
    """opt-2.7b geometry: pre-LN, word_embed_proj_dim == hidden_size."""
    from transformers import OPTForCausalLM as HFOPT

    ids, am = io
    torch.manual_seed(0)
    hf = HFOPT(_hf_opt_config()).eval()
    cfg = OPTConfig.tiny(lora_r=4)
    params = opt_params(state_dict_from_torch(hf), cfg)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(am)).logits.numpy()
    got, _ = OPTForCausalLM(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(am, jnp.int32))
    # padded query rows of row 0 see different garbage; compare real tokens
    mask = am.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[mask], ref[mask], atol=2e-4)


def test_opt_post_ln_projected_parity(io):
    """opt-350m style: post-LN + project_in/project_out, no final LN."""
    from transformers import OPTForCausalLM as HFOPT

    ids, am = io
    torch.manual_seed(1)
    hf = HFOPT(_hf_opt_config(word_embed_proj_dim=8,
                              do_layer_norm_before=False)).eval()
    cfg = OPTConfig.tiny(word_embed_proj_dim=8, do_layer_norm_before=False)
    params = opt_params(state_dict_from_torch(hf), cfg)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(am)).logits.numpy()
    got, _ = OPTForCausalLM(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(am, jnp.int32))
    mask = am.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[mask], ref[mask], atol=2e-4)


def _tiny_blip2_opt_pair():
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
    hf_cfg = HFBlip2Config.from_vision_qformer_text_configs(
        vc, qc, _hf_opt_config())
    hf_cfg.num_query_tokens = 4
    hf_cfg.image_token_index = 63
    torch.manual_seed(0)
    hf = HFBlip2(hf_cfg).eval()

    cfg = Blip2Config(
        vision_config=Blip2VisionConfig.tiny(),
        qformer_config=Blip2QFormerConfig.tiny(),
        text_config=OPTConfig.tiny(lora_r=4),
        num_query_tokens=4,
    )
    assert cfg.use_decoder_only_language_model
    return hf, cfg


def test_blip2_opt_full_logits_parity(io):
    ids, am = io
    hf, cfg = _tiny_blip2_opt_pair()
    params = blip2_params(state_dict_from_torch(hf), cfg)
    B = ids.shape[0]
    rng = np.random.default_rng(3)
    pix = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)

    # newer HF consumes the vision prefix via <image> placeholder tokens at
    # the front; labels=None -> FULL-sequence logits for the OPT path
    ids_hf = np.concatenate([np.full((B, 4), 63, np.int64), ids], axis=1)
    am_hf = np.concatenate([np.ones((B, 4), np.int64), am], axis=1)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pix),
                 input_ids=torch.tensor(ids_hf),
                 attention_mask=torch.tensor(am_hf)).logits.numpy()

    model = Blip2ForConditionalGeneration(cfg)
    got, _, full_mask = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(am, jnp.int32), pixel_values=jnp.asarray(pix),
        method=model.causal_lm_logits)
    assert got.shape == ref.shape
    mask = np.asarray(full_mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[mask], ref[mask], atol=3e-4)


def test_blip2_opt_reranker_scoring():
    """monoBLIP2-Opt scoring: p(yes) at the last real prompt position equals
    the HF computation (labels of length 2 -> sliced logits row 0 predicts
    the yes/no token, `modeling_blip_2.py:1445-1450` +
    `decoder_rerank_model.py:147-159`)."""
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        Blip2DecoderRerankModel,
        Blip2RerankConfig,
    )

    hf, blip2_cfg = _tiny_blip2_opt_pair()
    cfg = Blip2RerankConfig(blip2=blip2_cfg, yes_token_id=10, no_token_id=11)
    params = {"model": blip2_params(state_dict_from_torch(hf), blip2_cfg)}
    model = Blip2DecoderRerankModel(cfg)

    B, nway, L = 1, 3, 9
    expanded = B * nway
    rng = np.random.default_rng(7)
    e_ids = rng.integers(3, 62, size=(expanded, L))
    e_am = np.ones((expanded, L), np.int64)
    pix = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)

    out = model.apply({"params": params}, jnp.asarray(e_ids, jnp.int32),
                      jnp.asarray(e_am, jnp.int32), jnp.asarray(pix),
                      num_negative_examples=nway - 1)
    assert out.logits.shape == (expanded, 1)
    assert np.isfinite(float(out.loss))

    # torch oracle: full logits, read the last prompt position (the row HF's
    # label slicing exposes as sliced_logits[:, 0] for length-2 labels)
    ids_hf = np.concatenate([np.full((expanded, 4), 63, np.int64), e_ids], 1)
    am_hf = np.concatenate([np.ones((expanded, 4), np.int64), e_am], 1)
    with torch.no_grad():
        full = hf(pixel_values=torch.tensor(np.repeat(pix, nway, 0)),
                  input_ids=torch.tensor(ids_hf),
                  attention_mask=torch.tensor(am_hf)).logits.numpy()
    last = full[:, -1, :]  # all rows same length, no padding
    expect = np.exp(last[:, 10]) / (np.exp(last[:, 10]) + np.exp(last[:, 11]))
    np.testing.assert_allclose(
        np.asarray(out.logits)[:, 0], expect, atol=2e-4)

    # right padding: each row scores at its OWN last real token (correct
    # decoder-only semantics; the reference's shared position -2 of a padded
    # batch can land on pads — divergence documented in decoder.py)
    e_am2 = e_am.copy()
    e_am2[1, 6:] = 0
    out2 = model.apply({"params": params}, jnp.asarray(e_ids, jnp.int32),
                       jnp.asarray(e_am2, jnp.int32), jnp.asarray(pix),
                       num_negative_examples=nway - 1)
    am_hf2 = np.concatenate([np.ones((expanded, 4), np.int64), e_am2], 1)
    with torch.no_grad():
        full2 = hf(pixel_values=torch.tensor(np.repeat(pix, nway, 0)),
                   input_ids=torch.tensor(ids_hf),
                   attention_mask=torch.tensor(am_hf2)).logits.numpy()
    row1 = full2[1, 4 + 6 - 1, :]  # prefix 4 + last real index 5
    expect1 = np.exp(row1[10]) / (np.exp(row1[10]) + np.exp(row1[11]))
    np.testing.assert_allclose(float(out2.logits[1, 0]), expect1, atol=2e-4)


def test_opt_lora_zero_init_preserves_and_trains():
    """Bridged LoRA adapters start at zero delta (peft init); lora_b getting
    gradient means the adapter is live."""
    import jax

    cfg = OPTConfig.tiny(lora_r=4)
    ids = jnp.ones((2, 5), jnp.int32)
    am = jnp.ones((2, 5), jnp.int32)
    model = OPTForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, am)["params"]

    # zero-delta at init: every lora_b is zeros, so the adapter output is
    # INDEPENDENT of lora_a — randomizing lora_a must not change logits
    # (this is what keeps a bridged checkpoint's outputs identical to the
    # adapter-free HF model until training moves lora_b)
    bs = [np.asarray(l) for path, l in
          jax.tree_util.tree_leaves_with_path(params)
          if "lora_b" in "/".join(str(getattr(p, "key", p)) for p in path)]
    assert bs and all((b == 0).all() for b in bs)
    base_logits, _ = model.apply({"params": params}, ids, am)
    noisy = jax.tree_util.tree_map_with_path(
        lambda path, l: (l + 1.0
                         if "lora_a" in "/".join(
                             str(getattr(p, "key", p)) for p in path)
                         else l),
        params)
    noisy_logits, _ = model.apply({"params": noisy}, ids, am)
    np.testing.assert_array_equal(np.asarray(base_logits),
                                  np.asarray(noisy_logits))

    def loss(p):
        logits, _ = model.apply({"params": p}, ids, am)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    gb = g["layer_0"]["self_attn"]["q_proj"]["lora_b"]
    assert np.abs(np.asarray(gb)).sum() > 0
