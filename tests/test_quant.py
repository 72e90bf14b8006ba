"""Int8 quantized-serving path (ops/quant.py + OPTConfig.quantize_int8).

The W8A8 execution mode exists to push the compute-roofline-bound
monoBLIP2-Opt reranker past the 10x bar on the v5e's double-rate int8 MXU
(reference latency baseline: `plots.ipynb` cells 15-16, 12.64 s/query).
These tests pin (a) the quantizer's numerics against fp32 oracles, (b) the
drop-in checkpoint compatibility with ``nn.Dense``, and (c) end-to-end
rank-faithfulness of the quantized OPT scoring pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from reranking_multimodal_retrievers_tpu.ops.quant import (
    Int8Dense, int8_dot, quantize_cols, quantize_rows,
)
from reranking_multimodal_retrievers_tpu.models.opt import (
    OPTConfig, OPTForCausalLM,
)


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)) * rng.lognormal(size=(5, 1)),
                    jnp.float32)
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # symmetric int8: per-row error bounded by half a quantization step
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()


def test_quantize_cols_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 16)) * rng.lognormal(size=(1, 16)),
                    jnp.float32)
    q, s = quantize_cols(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 16)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()


def test_int8_dot_matches_fp32_oracle():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 7, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 48)), jnp.float32)
    got = np.asarray(int8_dot(x, w))
    want = np.asarray(x).reshape(-1, 96) @ np.asarray(w)
    want = want.reshape(4, 7, 48)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert got.shape == (4, 7, 48) and got.dtype == np.float32
    assert rel < 0.02, rel  # W8A8 per-row/per-col on gaussian data: ~1%


def test_int8dense_restores_dense_checkpoint():
    """Same param tree (names/shapes): a Dense checkpoint IS an Int8Dense
    checkpoint — int8 is an execution mode, not a storage format."""
    x = jnp.ones((2, 8), jnp.float32)
    p_f = nn.Dense(4).init(jax.random.PRNGKey(0), x)
    p_q = Int8Dense(4).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_f) == jax.tree_util.tree_structure(p_q)
    for a, b in zip(jax.tree_util.tree_leaves(p_f),
                    jax.tree_util.tree_leaves(p_q)):
        assert a.shape == b.shape
    # and the quantized apply over the float params tracks the float output
    y_f = nn.Dense(4).apply(p_f, x)
    y_q = Int8Dense(4).apply(p_f, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f),
                               rtol=0.05, atol=0.02)


def assert_rank_faithful(s_f, s_q, sep: float = 0.05):
    """Quantized scores must track the float scores closely, and must order
    every pair whose float-score gap exceeds a FIXED separation budget
    identically — near-ties below it are allowed to swap. The budget must be
    a constant: deriving it from the observed max |s_f − s_q| makes the sign
    check a tautology (|gap_f − gap_q| ≤ 2·max-noise always), while a fixed
    sep smaller than what the allclose tolerances admit (atol 0.02 +
    rtol 0.1·s ≈ up to 0.12) gives the rank check independent teeth: honest
    W8A8 noise measures ≤ 0.015 pointwise on these fixtures, so a
    quantization regression within allclose can still fail this."""
    np.testing.assert_allclose(s_q, s_f, rtol=0.1, atol=0.02)
    gap_f = s_f[:, None] - s_f[None, :]
    gap_q = s_q[:, None] - s_q[None, :]
    separated = np.abs(gap_f) > sep
    assert separated.any()  # the fixture must exercise real orderings
    assert (np.sign(gap_f[separated]) == np.sign(gap_q[separated])).all()


def test_quantize_int8_rejects_lora():
    with pytest.raises(ValueError, match="lora_r"):
        OPTConfig.tiny(lora_r=8, quantize_int8=True)


def test_opt_quantized_scoring_is_rank_faithful():
    """The SAME params applied through the bf16 and W8A8 paths produce
    closely matching yes/no scores and an identical candidate ranking —
    the end-to-end property quantized serving must preserve."""
    cfg_f = OPTConfig.tiny(hidden_size=32, num_attention_heads=4, ffn_dim=64)
    cfg_q = OPTConfig.tiny(hidden_size=32, num_attention_heads=4, ffn_dim=64,
                           quantize_int8=True)
    rng = np.random.default_rng(3)
    K, L = 8, 12
    ids = jnp.asarray(rng.integers(2, 64, size=(K, L)), jnp.int32)
    am = jnp.ones((K, L), jnp.int32)
    params = OPTForCausalLM(cfg_f).init(jax.random.PRNGKey(0), ids, am)

    def yes_scores(cfg):
        logits, _ = OPTForCausalLM(cfg).apply(params, ids, am)
        last = logits[:, -1, :].astype(jnp.float32)
        yes, no = last[:, 10], last[:, 11]
        return np.asarray(
            jax.nn.softmax(jnp.stack([yes, no], -1), -1)[:, 0])

    assert_rank_faithful(yes_scores(cfg_f), yes_scores(cfg_q))


def test_t5_quantized_scoring_is_rank_faithful():
    """Same property for the T5 family (monoBLIP2-FlanT5): bf16 vs W8A8
    paths over identical params score closely and rank identically."""
    from reranking_multimodal_retrievers_tpu.models.t5 import (
        T5Config, T5ForConditionalGeneration)

    kw = dict(d_model=32, d_kv=8, d_ff=64, num_heads=4, vocab_size=128)
    cfg_f = T5Config.tiny(**kw)
    cfg_q = T5Config.tiny(quantize_int8=True, **kw)
    rng = np.random.default_rng(4)
    K, L = 8, 12
    ids = jnp.asarray(rng.integers(2, 128, size=(K, L)), jnp.int32)
    am = jnp.ones((K, L), jnp.int32)
    dec = jnp.zeros((K, 1), jnp.int32)
    params = T5ForConditionalGeneration(cfg_f).init(
        jax.random.PRNGKey(0), ids, am, dec)

    def yes_scores(cfg):
        logits, _ = T5ForConditionalGeneration(cfg).apply(
            params, ids, am, dec)
        first = logits[:, 0, :].astype(jnp.float32)
        yes, no = first[:, 10], first[:, 11]
        return np.asarray(jax.nn.softmax(jnp.stack([yes, no], -1), -1)[:, 0])

    assert_rank_faithful(yes_scores(cfg_f), yes_scores(cfg_q))


def test_t5_quantize_int8_rejects_lora():
    from reranking_multimodal_retrievers_tpu.models.t5 import T5Config

    with pytest.raises(ValueError, match="lora_r"):
        T5Config.tiny(lora_r=8, quantize_int8=True)


def test_bert_cross_encoder_quantized_is_rank_faithful():
    """The headline family (FullContextRerankModel over BERT): bf16 vs W8A8
    paths over identical params stay rank-faithful end-to-end."""
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.flmr import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        FullContextRerankModel, RerankConfig)

    def build(q8):
        bert_kw = dict(quantize_int8=q8)
        flmr = FLMRConfig(
            text_config=BertConfig.tiny(**bert_kw),
            vision_config=CLIPVisionConfig.tiny(),
            dim=8, mapping_network_prefix_length=2,
            use_transformer_mapping_network=False,
        )
        return RerankConfig(
            flmr=flmr,
            cross_encoder=BertConfig.tiny(max_position_embeddings=128,
                                          **bert_kw),
            loss_fn="BCE", max_query_length=4,
            max_decoder_source_length=24,
        )

    rng = np.random.default_rng(5)
    K, L = 8, 24
    ids = jnp.asarray(rng.integers(10, 1000, size=(K, L)), jnp.int32)
    am = jnp.ones((K, L), jnp.int32)
    tt = jnp.asarray(np.repeat([[0] * 6 + [1] * (L - 6)], K, axis=0),
                     jnp.int32)
    m_f = FullContextRerankModel(build(False))
    m_q = FullContextRerankModel(build(True))
    pix = jnp.asarray(rng.normal(size=(1, 3, 28, 28)), jnp.float32)
    params = m_f.init(jax.random.PRNGKey(0), ids[:2], am[:2], tt[:2],
                      pix, num_negative_examples=1)

    def scores(m):
        out = m.apply(params, ids, am, tt, pix,
                      num_negative_examples=K - 1)
        return np.asarray(out.logits[:, 0], np.float32)

    assert_rank_faithful(scores(m_f), scores(m_q))


def test_int8_dot_straight_through_gradient():
    """quantize_int8 models must stay TRAINABLE: int8_dot's custom_vjp is
    the exact fp matmul cotangent (straight-through / QAT), not the zero
    gradient that round/clip would otherwise propagate."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, 5, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(3, 5, 8)), jnp.float32)

    def via(f):
        _, vjp = jax.vjp(f, x, w)
        return vjp(g)

    dx_q, dw_q = via(int8_dot)
    dx_f, dw_f = via(lambda a, b: jnp.einsum("bli,io->blo", a, b))
    np.testing.assert_allclose(np.asarray(dx_q), np.asarray(dx_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_q), np.asarray(dw_f),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(dw_q).sum()) > 0  # not the dead round/clip grad


def test_int8_dot_1d_input_shape():
    """Contract: x [..., in] -> [..., out], including rank-1 x."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    y = int8_dot(x, w)
    assert y.shape == (8,)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ np.asarray(w),
                               rtol=0.05, atol=0.05)


def test_int8dense_promotes_like_dense():
    """nn.Dense(dtype=None) promotes to input ∨ params; the twin must too
    (bf16 activations over fp32 params -> fp32 out on both paths)."""
    x = jnp.ones((2, 8), jnp.bfloat16)
    p = nn.Dense(4).init(jax.random.PRNGKey(0), x)  # fp32 params
    y_f = nn.Dense(4).apply(p, x)
    y_q = Int8Dense(4).apply(p, x)
    assert y_q.dtype == y_f.dtype == jnp.float32
