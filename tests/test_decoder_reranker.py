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

    # value oracle against the raw decoder logits: p(yes) must be the
    # yes-vs-no softmax of the FIRST decoder position, and the loss the
    # seq2seq CE on yes/no targets with the positive first in each group
    # (reference `decoder_rerank_model.py:121-159`) — catches swapped
    # yes/no ids, a wrong position read, or a flipped softmax column
    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        VisionSeq2SeqLM,
    )

    nway = n_neg + 1
    expanded = b["input_ids"].shape[0]
    vs = VisionSeq2SeqLM(cfg)
    pix_rep = jnp.repeat(b["pixel_values"], nway, axis=0)
    dec_in = jnp.full((expanded, 1), cfg.decoder_start_token_id, jnp.int32)
    logits, _ = vs.apply({"params": params["params"]["model"]},
                         b["input_ids"], b["attention_mask"], dec_in,
                         pixel_values=pix_rep)
    first = np.asarray(logits[:, 0, :], np.float32)
    yes, no = first[:, cfg.yes_token_id], first[:, cfg.no_token_id]
    p_yes = np.exp(yes) / (np.exp(yes) + np.exp(no))
    np.testing.assert_allclose(got[:, 0], p_yes, rtol=1e-5, atol=1e-6)

    lbl = np.tile(np.eye(1, nway, 0, dtype=np.int32)[0], B)
    target = np.where(lbl == 1, cfg.yes_token_id, cfg.no_token_id)
    logz = np.log(np.exp(first - first.max(1, keepdims=True)).sum(1)) + \
        first.max(1)
    gold = first[np.arange(expanded), target]
    np.testing.assert_allclose(float(out.loss), float(np.mean(logz - gold)),
                               rtol=1e-5, atol=1e-6)


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
