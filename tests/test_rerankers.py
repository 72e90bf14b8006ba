"""Reranker family tests (tiny configs): forward shapes, loss vocabulary,
attention fusion, MORES, and the full-context tokenization path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.models.rerankers import (
    RerankModel,
    FullContextRerankModel,
    RerankConfig,
    InteractionRerankModel,
    InteractionRerankConfig,
)
from reranking_multimodal_retrievers_tpu.models.rerankers.losses import (
    prepare_logits_labels,
    rerank_loss,
    default_group_labels,
)
from reranking_multimodal_retrievers_tpu.models.rerankers.cross_encoder import (
    fusion_attention_adj,
)


def test_default_group_labels():
    lbl = np.asarray(default_group_labels(2, 3))
    np.testing.assert_array_equal(lbl.ravel(), [1, 0, 0, 0, 1, 0, 0, 0])


@pytest.mark.parametrize("loss_fn", ["BCE", "2H_BCE", "negative_sampling"])
def test_loss_vocabulary(loss_fn):
    rng = np.random.default_rng(0)
    B, n_neg = 3, 2
    expanded = B * (n_neg + 1)
    l1 = jnp.asarray(rng.normal(size=(expanded, 1)), jnp.float32)
    l2 = jnp.asarray(rng.normal(size=(expanded, 1)), jnp.float32)
    logits, labels = prepare_logits_labels(loss_fn, l1, l2, B, n_neg)
    loss = rerank_loss(loss_fn, logits, labels, pos_weight=2.0 if loss_fn != "negative_sampling" else None)
    assert np.isfinite(float(loss))
    if loss_fn == "2H_BCE":
        assert logits.shape == (expanded, 2)
    elif loss_fn == "negative_sampling":
        assert logits.shape == (B, n_neg + 1)


def test_bce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 1)).astype(np.float32)
    labels = (rng.random((8, 1)) > 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([3.0]))(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    got = float(rerank_loss("BCE", jnp.asarray(logits), jnp.asarray(labels), pos_weight=3.0))
    assert got == pytest.approx(want, rel=1e-5)


def test_fusion_attention_adj_structure():
    rng = np.random.default_rng(0)
    B, Lc, Lq = 2, 5, 3
    scores = jnp.asarray(rng.normal(size=(B, Lc, Lq)), jnp.float32)
    adj = np.asarray(fusion_attention_adj(scores, Lq, Lc, fusion_multiplier=2.0))
    assert adj.shape == (B, Lq + Lc, Lq + Lc)
    np.testing.assert_allclose(adj[:, :Lq, :Lq], 0.0)
    np.testing.assert_allclose(adj[:, Lq:, Lq:], 0.0)
    # softmax rows scaled by multiplier sum to 2.0
    np.testing.assert_allclose(adj[:, :Lq, Lq:].sum(-1), 2.0, rtol=1e-5)
    np.testing.assert_allclose(adj[:, Lq:, :Lq].sum(-1), 2.0, rtol=1e-5)


@pytest.fixture(scope="module")
def rerank_batch():
    rng = np.random.default_rng(0)
    B, nway, Lq, Lc = 2, 2, 8, 32
    return dict(
        query_input_ids=jnp.asarray(rng.integers(10, 1000, size=(B, Lq)), jnp.int32),
        query_attention_mask=jnp.ones((B, Lq), jnp.int32),
        query_pixel_values=jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
        context_input_ids=jnp.asarray(rng.integers(10, 1000, size=(B * nway, Lc)), jnp.int32),
        context_attention_mask=jnp.ones((B * nway, Lc), jnp.int32),
    ), B, nway - 1


def test_rerank_model_forward(rerank_batch):
    batch, B, n_neg = rerank_batch
    cfg = RerankConfig.tiny()
    model = RerankModel(cfg)
    out, params = model.init_with_output(
        jax.random.PRNGKey(0), **batch, num_negative_examples=n_neg
    )
    assert out.logits.shape == (B * (n_neg + 1), 1)
    assert np.isfinite(float(out.loss))


def test_rerank_model_with_attention_fusion(rerank_batch):
    batch, B, n_neg = rerank_batch
    cfg = RerankConfig.tiny()
    model = RerankModel(cfg)
    rng = np.random.default_rng(3)
    Lq = batch["query_input_ids"].shape[1]
    Lc = batch["context_input_ids"].shape[1]
    # expected preflmr score block: [expanded, Lc, Lq + img_rows]
    num_patches = (cfg.flmr.vision_config.image_size // cfg.flmr.vision_config.patch_size) ** 2
    img_rows = cfg.flmr.mapping_network_prefix_length + num_patches
    scores = jnp.asarray(
        rng.normal(size=(B * (n_neg + 1), Lc, Lq + img_rows)), jnp.float32
    )
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), **batch, num_negative_examples=n_neg,
        preflmr_scores=scores, fusion_multiplier=1.5,
    )
    assert np.isfinite(float(out.loss))


def test_full_context_rerank_model():
    rng = np.random.default_rng(0)
    B, nway, L = 2, 2, 40
    cfg = RerankConfig.tiny(loss_fn="2H_BCE")
    model = FullContextRerankModel(cfg)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(10, 1000, size=(B * nway, L)), jnp.int32),
        attention_mask=jnp.ones((B * nway, L), jnp.int32),
        token_type_ids=jnp.asarray(
            np.repeat([[0] * 16 + [1] * 24], B * nway, axis=0), jnp.int32
        ),
        query_pixel_values=jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
    )
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), **batch, num_negative_examples=nway - 1
    )
    assert out.logits.shape == (B * nway, 1)
    assert np.isfinite(float(out.loss))
    # text-only path
    out2, _ = model.init_with_output(
        jax.random.PRNGKey(0), **{**batch, "query_pixel_values": None},
        num_negative_examples=nway - 1,
    )
    assert np.isfinite(float(out2.loss))


@pytest.mark.parametrize("interaction_type", ["CrossEncoder", "MORES"])
def test_interaction_rerank_model(interaction_type):
    rng = np.random.default_rng(0)
    B, nway, Lq, Lc, dim = 2, 3, 6, 10, 16
    cfg = InteractionRerankConfig.tiny(
        interaction_type=interaction_type, loss_fn="negative_sampling"
    )
    model = InteractionRerankModel(cfg)
    batch = dict(
        query_late_interaction=jnp.asarray(rng.normal(size=(B, Lq, dim)), jnp.float32),
        context_late_interaction=jnp.asarray(
            rng.normal(size=(B * nway, Lc, dim)), jnp.float32
        ),
        query_mask=jnp.ones((B, Lq), jnp.int32),
        context_mask=jnp.ones((B * nway, Lc), jnp.int32),
    )
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), **batch, num_negative_examples=nway - 1
    )
    assert out.logits.shape == (B * nway, 1)
    assert np.isfinite(float(out.loss))


@pytest.mark.parametrize("interaction_type", ["CrossEncoder", "MORES"])
def test_interaction_rerank_fusion(interaction_type):
    """PreFLMR attention fusion through both interaction families (the
    reference's MORESSym raises for the MORES case, `mores_model.py:74-75`;
    here the fusion block decomposes onto MORES's factored attention).
    Semantics checked without an oracle: a zero adj must be a no-op, and a
    −1e9 cross-block column on one doc token must equal masking that token
    out of ``context_mask`` entirely (MORES never feeds doc rows through
    attention queries, so the two are exactly equivalent)."""
    rng = np.random.default_rng(1)
    B, nway, Lq, Lc, dim = 2, 2, 6, 10, 16
    cfg = InteractionRerankConfig.tiny(interaction_type=interaction_type)
    model = InteractionRerankModel(cfg)
    batch = dict(
        query_late_interaction=jnp.asarray(rng.normal(size=(B, Lq, dim)), jnp.float32),
        context_late_interaction=jnp.asarray(
            rng.normal(size=(B * nway, Lc, dim)), jnp.float32
        ),
        query_mask=jnp.ones((B, Lq), jnp.int32),
        context_mask=jnp.ones((B * nway, Lc), jnp.int32),
    )
    scores = jnp.asarray(rng.normal(size=(B * nway, Lc, Lq)), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), **batch, num_negative_examples=nway - 1,
        preflmr_scores=scores,
    )
    run = lambda **kw: model.apply(
        params, **{**batch, **kw}, num_negative_examples=nway - 1)
    base = run()
    fused = run(preflmr_scores=scores)
    zero = run(preflmr_scores=scores, fusion_multiplier=0.0)
    np.testing.assert_allclose(
        np.asarray(zero.logits), np.asarray(base.logits), atol=1e-6)
    assert not np.allclose(np.asarray(fused.logits), np.asarray(base.logits))
    if interaction_type == "MORES":
        # block doc token 3 through the adj vs. through the context mask
        adj = jnp.zeros((B * nway, Lq + Lc, Lq + Lc), jnp.float32)
        adj = adj.at[:, :Lq, Lq + 3].set(-1e9)
        from reranking_multimodal_retrievers_tpu.models.rerankers.interaction import (
            MORESSym,
        )
        H = cfg.cross_encoder.hidden_size
        mapped_q = jnp.asarray(rng.normal(size=(B, Lq, H)), jnp.float32)
        mapped_d = jnp.asarray(rng.normal(size=(B * nway, Lc, H)), jnp.float32)
        sym = MORESSym(cfg.cross_encoder)
        qrep = jnp.repeat(mapped_q, nway, axis=0)
        sp = sym.init(jax.random.PRNGKey(1), qrep, mapped_d,
                      jnp.ones((B * nway, Lq)), jnp.ones((B * nway, Lc)))
        via_adj = sym.apply(sp, qrep, mapped_d, jnp.ones((B * nway, Lq)),
                            jnp.ones((B * nway, Lc)), attention_adj=adj)
        masked = jnp.ones((B * nway, Lc), jnp.int32).at[:, 3].set(0)
        via_mask = sym.apply(sp, qrep, mapped_d,
                             jnp.ones((B * nway, Lq)), masked)
        np.testing.assert_allclose(np.asarray(via_adj[0]),
                                   np.asarray(via_mask[0]), atol=1e-5)


def test_prepare_full_context_inputs():
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        prepare_full_context_inputs,
        tiny_bert_tokenizer,
    )
    import tempfile

    tok = tiny_bert_tokenizer(
        tempfile.mkdtemp(), ["what", "is", "paris", "france", "capital", "the", "of"]
    )
    out = prepare_full_context_inputs(
        ["what is the capital of france"],
        ["paris is the capital", "france"],
        tok,
        max_query_length=8,
        max_context_length=10,
        max_decoder_source_length=24,
        docs_per_query=2,
    )
    assert out["input_ids"].shape == (2, 24)
    # token_type_ids: 0 for query segment, 1 for context segment
    assert out["token_type_ids"][0].max() == 1
    assert out["token_type_ids"][0][0] == 0


def test_negative_sampling_honors_explicit_labels():
    """Explicit labels with the positive NOT at group index 0 must be
    converted to group indices, not silently replaced with zeros."""
    import jax.numpy as jnp

    B, n_neg = 2, 2
    logits = jnp.arange(B * (n_neg + 1), dtype=jnp.float32).reshape(-1, 1)
    # positives at positions 1 and 2 of the two groups
    labels = jnp.array([0, 1, 0, 0, 0, 1], jnp.float32)
    out_logits, out_labels = prepare_logits_labels(
        "negative_sampling", logits, logits, B, n_neg, labels)
    assert out_logits.shape == (B, n_neg + 1)
    assert out_labels.tolist() == [1, 2]
    # default (no labels): reference's positive-first convention
    _, default_labels = prepare_logits_labels(
        "negative_sampling", logits, logits, B, n_neg)
    assert default_labels.tolist() == [0, 0]


def test_warm_start_from_retriever(rerank_batch):
    """Backbone warm-start (reference recipe: rerankers splice a pretrained
    PreFLMR's encoders, `Reranker_base_executor.py:185-242`): shared FLMR
    submodules copy over, reranker-only heads keep their fresh init, and a
    shape mismatch fails loudly."""
    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        warm_start_from_retriever,
    )
    from reranking_multimodal_retrievers_tpu.models import FLMRModelForRetrieval

    batch, B, n_neg = rerank_batch
    cfg = RerankConfig.tiny()
    model = RerankModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), **batch, num_negative_examples=n_neg
    )["params"]

    retriever = FLMRModelForRetrieval(cfg.flmr)
    rbatch = dict(
        query_input_ids=batch["query_input_ids"],
        query_attention_mask=batch["query_attention_mask"],
        query_pixel_values=batch["query_pixel_values"],
        context_input_ids=batch["context_input_ids"],
        context_attention_mask=batch["context_attention_mask"],
    )
    rparams = retriever.init(jax.random.PRNGKey(7), **rbatch)["params"]

    merged, restored = warm_start_from_retriever(params, rparams)
    assert "context_text_encoder" in restored
    assert "context_vision_encoder" in restored
    assert "transformer_mapping_network" in restored
    # copied subtree == retriever values
    got = jax.tree_util.tree_leaves(merged["context_text_encoder"])
    want = jax.tree_util.tree_leaves(rparams["context_text_encoder"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # reranker-only head untouched
    assert "reranker" not in restored
    got = jax.tree_util.tree_leaves(merged["reranker"])
    orig = jax.tree_util.tree_leaves(params["reranker"])
    for g, o in zip(got, orig):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(o))

    # shape mismatch raises
    bad = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape + (1,), a.dtype), rparams
    )
    with pytest.raises(ValueError):
        warm_start_from_retriever(params, bad)
