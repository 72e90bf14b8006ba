"""Decoder (monoBLIP-2-style) reranker tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.models.rerankers import (
    DecoderRerankModel,
    DecoderHeadRerankModel,
    DecoderRerankConfig,
    prepare_decoder_rerank_inputs,
)
from reranking_multimodal_retrievers_tpu.models.lora import LoRADense
from reranking_multimodal_retrievers_tpu.training import label_params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, nway, L = 2, 3, 24
    return dict(
        input_ids=jnp.asarray(rng.integers(20, 1000, size=(B * nway, L)), jnp.int32),
        attention_mask=jnp.ones((B * nway, L), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
    ), B, nway - 1


def test_decoder_rerank_yes_no_scoring(batch):
    b, B, n_neg = batch
    cfg = DecoderRerankConfig.tiny()
    model = DecoderRerankModel(cfg)
    out, params = model.init_with_output(
        jax.random.PRNGKey(0), **b, num_negative_examples=n_neg
    )
    assert out.logits.shape == (B * (n_neg + 1), 1)
    got = np.asarray(out.logits)
    assert ((got >= 0) & (got <= 1)).all()  # p(yes) is a probability
    assert np.isfinite(float(out.loss))


def test_decoder_head_rerank(batch):
    b, B, n_neg = batch
    cfg = DecoderRerankConfig.tiny(loss_fn="2H_BCE")
    model = DecoderHeadRerankModel(cfg)
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), **b, num_negative_examples=n_neg
    )
    assert out.logits.shape == (B * (n_neg + 1), 1)
    assert np.isfinite(float(out.loss))


def test_lora_params_exist_and_labelable(batch):
    b, B, n_neg = batch
    cfg = DecoderRerankConfig.tiny(lora_r=4)
    model = DecoderRerankModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **b, num_negative_examples=n_neg)
    flat = jax.tree_util.tree_leaves_with_path(params)
    paths = ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]
    assert any("lora_a" in p for p in paths)
    # LoRA-only finetuning: everything else frozen
    labels = label_params(
        params["params"], group_patterns=("lora_",), frozen_patterns=()
    )
    labs = set(jax.tree_util.tree_leaves(labels))
    assert labs == {"main", "mapping"} or "mapping" in labs


def test_lora_zero_init_is_identity():
    """lora_b starts at zero → adapter initially a no-op."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    base = LoRADense(16, r=0)
    with_lora = LoRADense(16, r=4)
    p0 = base.init(jax.random.PRNGKey(1), x)
    p1 = with_lora.init(jax.random.PRNGKey(1), x)
    y0 = base.apply(p0, x)
    y1 = with_lora.apply(p1, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_prepare_decoder_rerank_inputs():
    from reranking_multimodal_retrievers_tpu.models.tokenization import tiny_bert_tokenizer
    import tempfile

    tok = tiny_bert_tokenizer(
        tempfile.mkdtemp(), ["query", "document", "relevant", "paris", "france", "what"]
    )
    out = prepare_decoder_rerank_inputs(
        ["what"], ["paris", "france"], tok,
        max_query_length=6, max_context_length=8,
        max_decoder_source_length=32, docs_per_query=2,
    )
    assert out["input_ids"].shape == (2, 32)
    text = tok.decode(out["input_ids"][0], skip_special_tokens=True)
    assert "relevant" in text
