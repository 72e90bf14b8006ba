"""K-means, codec, compressed two-stage search, legacy retrievers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.engine.kmeans import (
    train_centroids,
    num_partitions_heuristic,
)
from reranking_multimodal_retrievers_tpu.engine.codec import compress, decompress
from reranking_multimodal_retrievers_tpu.engine.plaid import CompressedSearcher


def test_num_partitions_heuristic():
    # 16*sqrt(120*N) style magnitude; exact formula: 2^floor(log2(16 sqrt E))
    assert num_partitions_heuristic(10000) == 1024
    assert num_partitions_heuristic(1) == 16


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 8)) * 0.05 + np.array([1] + [0] * 7)
    b = rng.normal(size=(100, 8)) * 0.05 + np.array([0, 1] + [0] * 6)
    x = np.concatenate([a, b]).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c, assign = train_centroids(x, k=2, n_iters=10)
    assert c.shape == (2, 8)
    # points in the same true cluster share an assignment
    assert len(set(assign[:100])) == 1
    assert len(set(assign[100:])) == 1
    assert assign[0] != assign[150]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    N, L, D = 64, 12, 32
    emb = rng.normal(size=(N, L, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    lens = rng.integers(4, L + 1, size=N)
    mask = np.arange(L)[None] < lens[:, None]
    emb *= mask[:, :, None]
    Q = rng.normal(size=(4, 8, D)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    return emb, mask, Q


def test_codec_roundtrip_accuracy(corpus):
    emb, mask, Q = corpus
    idx = compress(emb, mask, [f"d{i}" for i in range(len(emb))],
                   num_centroids=32, sample_size=512)
    rec = np.asarray(decompress(idx.codes, idx.residuals, idx.centroids, idx.scales))
    valid = mask.astype(bool)
    err = np.abs(rec[valid] - emb[valid]).max()
    assert err < 0.05, err  # int8 residual should reconstruct closely
    # compression: int8 + codes ≈ 4x smaller than fp32
    assert idx.nbytes() < emb.nbytes / 2


def test_compressed_search_matches_exact(corpus):
    emb, mask, Q = corpus
    idx = compress(emb, mask, [f"d{i}" for i in range(len(emb))],
                   num_centroids=32, sample_size=512)
    searcher = CompressedSearcher(idx, k=5, n_candidates=32, chunk=16)
    vals, ids = searcher.search(Q)
    # exact brute force
    scores = np.einsum("bqd,nld->bnlq", Q, emb)
    scores = np.where(mask[None, :, :, None], scores, -9999.0)
    exact = scores.max(axis=2).sum(axis=-1)
    exact_top1 = np.argsort(-exact, axis=1)[:, 0]
    # top-1 must agree (stage-2 rescoring uses near-exact reconstructions)
    np.testing.assert_array_equal(ids[:, 0], exact_top1)
    # deeper ranks: every returned doc's EXACT score must be close to the
    # reported (reconstructed) score, and the top-5 must overlap the exact
    # top-5 heavily — catches residual-scale bugs that keep rank 1 right
    # but mis-score ranks 2..k
    exact_top5 = np.argsort(-exact, axis=1)[:, :5]
    for b in range(Q.shape[0]):
        exact_of_returned = exact[b, ids[b]]
        np.testing.assert_allclose(np.asarray(vals[b]), exact_of_returned,
                                   rtol=0.05, atol=0.05)
        overlap = len(set(ids[b].tolist()) & set(exact_top5[b].tolist()))
        assert overlap >= 4, (b, ids[b], exact_top5[b])


def test_legacy_retrievers():
    from reranking_multimodal_retrievers_tpu.models.legacy_retrievers import (
        VisualColBERT, VisualDPR, RetrieverDPR, RetrieverT5, DPRConfig,
    )
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig

    rng = np.random.default_rng(0)
    B, nway, Lq, Ld = 2, 2, 6, 10
    qi = jnp.asarray(rng.integers(5, 500, size=(B, Lq)), jnp.int32)
    qm = jnp.ones((B, Lq), jnp.int32)
    di = jnp.asarray(rng.integers(5, 500, size=(B * nway, Ld)), jnp.int32)
    dm = jnp.ones((B * nway, Ld), jnp.int32)
    pix = jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32)

    # VisualColBERT = FLMR minus transformer mapping
    vc = VisualColBERT.build(BertConfig.tiny(), CLIPVisionConfig.tiny(),
                             dim=16, prefix_length=4)
    out, _ = vc.init_with_output(
        jax.random.PRNGKey(0),
        query_input_ids=qi, query_attention_mask=qm, query_pixel_values=pix,
        context_input_ids=di, context_attention_mask=dm,
        num_negative_examples=1,
    )
    B_, rows, _ = out.query_late_interaction_output.shape
    assert rows == Lq + 4  # no per-patch mapping tokens
    assert np.isfinite(float(out.loss))

    for cls, kwargs in [
        (VisualDPR, dict(use_vision=True)),
        (RetrieverDPR, dict(bpr=True)),
        (RetrieverT5, dict(projection_dim=16)),
    ]:
        cfg = DPRConfig.tiny(**kwargs)
        model = cls(cfg)
        call_kwargs = dict(
            query_input_ids=qi, query_attention_mask=qm,
            item_input_ids=di, item_attention_mask=dm,
            num_negative_examples=1,
        )
        if cls is VisualDPR:
            call_kwargs["query_pixel_values"] = pix
        out, _ = model.init_with_output(jax.random.PRNGKey(0), **call_kwargs)
        assert out.scores.shape == (B, B * nway)
        assert np.isfinite(float(out.loss))

def test_legacy_multiple_mapping_and_mae_and_rag():
    from reranking_multimodal_retrievers_tpu.models.legacy_retrievers import (
        VisualColBERTMultipleMapping, MultiMappingConfig,
        VisualColBERTMAE, MAERetrieverConfig,
        VisualDPRForRAG, DPRConfig,
    )

    rng = np.random.default_rng(1)
    B, nway, Lq, Ld = 2, 2, 6, 10
    qi = jnp.asarray(rng.integers(5, 500, size=(B, Lq)), jnp.int32)
    qm = jnp.ones((B, Lq), jnp.int32)
    di = jnp.asarray(rng.integers(5, 500, size=(B * nway, Ld)), jnp.int32)
    dm = jnp.ones((B * nway, Ld), jnp.int32)

    # MultipleMapping: two projections with prefix lengths (2, 3) → Lq+5 rows
    mm_cfg = MultiMappingConfig.tiny()
    feats = jnp.asarray(rng.normal(size=(B, mm_cfg.vision_embedding_size)),
                        jnp.float32)
    out, _ = VisualColBERTMultipleMapping(mm_cfg).init_with_output(
        jax.random.PRNGKey(0), qi, qm, feats, di, dm, num_negative_examples=1)
    assert out.query_embeddings.shape == (B, Lq + sum(mm_cfg.prefix_lengths), mm_cfg.dim)
    assert np.isfinite(float(out.loss))
    # rows are unit-norm after the final L2 normalization
    norms = np.linalg.norm(np.asarray(out.query_embeddings), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    # MAE: vision-only query (patch tokens only, no text rows)
    mae_cfg = MAERetrieverConfig.tiny()
    pix = jnp.asarray(
        rng.normal(size=(B, 3, mae_cfg.vision_config.image_size,
                         mae_cfg.vision_config.image_size)), jnp.float32)
    out, _ = VisualColBERTMAE(mae_cfg).init_with_output(
        jax.random.PRNGKey(0), pix, di, dm, num_negative_examples=1)
    n_patches = (mae_cfg.vision_config.image_size
                 // mae_cfg.vision_config.patch_size) ** 2
    assert out.query_embeddings.shape == (B, n_patches + 1, mae_cfg.dim)
    assert np.isfinite(float(out.loss))

    # VisualDPRForRAG: pooled query vector = text CLS + summed vision prefix
    rag_cfg = DPRConfig.tiny(vision_prefix_length=3)
    feats = jnp.asarray(
        rng.normal(size=(B, rag_cfg.vision_config.hidden_size)), jnp.float32)
    pooled, variables = VisualDPRForRAG(rag_cfg).init_with_output(
        jax.random.PRNGKey(0), qi, qm, feats)
    assert pooled.shape == (B, rag_cfg.text_config.hidden_size)
    # the vision features must influence the pooled output
    pooled2 = VisualDPRForRAG(rag_cfg).apply(variables, qi, qm, feats * 2.0)
    assert not np.allclose(np.asarray(pooled), np.asarray(pooled2))

def test_queries_collection_ranking_roundtrip(tmp_path):
    from reranking_multimodal_retrievers_tpu.engine import (
        Queries, Collection, Ranking,
    )

    q = Queries(data={1: "what color is the fox", 2: "how tall is everest"})
    q.save(str(tmp_path / "queries.tsv"))
    q2 = Queries.cast(str(tmp_path / "queries.tsv"))
    assert dict(q2) == dict(q)

    c = Collection(data=["the red fox", "mount everest is 8849m"])
    c.save(str(tmp_path / "collection.tsv"))
    c2 = Collection.cast(str(tmp_path / "collection.tsv"))
    assert list(c2) == list(c)
    assert list(c2.enumerate_batches(1))[1] == (1, ["mount everest is 8849m"])

    r = Ranking(data=[(1, "P0", 0, 9.5), (1, "P7", 1, 8.0), (2, "P3", 0, 7.7)])
    r.save(str(tmp_path / "ranking.tsv"))
    r2 = Ranking.cast(str(tmp_path / "ranking.tsv"))
    assert r2.tolist() == r.tolist()
    grouped = r2.todict()
    assert [pid for pid, *_ in grouped[1]] == ["P0", "P7"]

    # static-retrieval json shape (RerankerExecutor.init_retrieve contract)
    r.save(str(tmp_path / "static.json"))
    r3 = Ranking.cast(str(tmp_path / "static.json"))
    assert {qid for qid, *_ in r3.tolist()} == {1, 2}
    static = r.to_static_retrieval(id2content={"P0": "the red fox"})
    assert static["1"][0]["passage_id"] == "P0"
    assert static["1"][0]["content"] == "the red fox"


def test_static_retrieval_rank_only_has_no_score():
    """ADVICE r1: rankings loaded without a score column must report
    score=None, not silently surface the rank as the score."""
    from reranking_multimodal_retrievers_tpu.engine.data import Ranking

    r = Ranking(data=[(1, "P0", 0), (1, "P1", 1)])
    static = r.to_static_retrieval()
    assert static["1"][0]["score"] is None
    r2 = Ranking(data=[(1, "P0", 0, 17.5)])
    assert r2.to_static_retrieval()["1"][0]["score"] == 17.5


def test_codec_scales_ignore_padding_rows():
    """Per-dim int8 scales must come from VALID residuals only: a padded
    (zero) token's residual is -centroids[code] with unit-normalized
    magnitude, which would inflate the quantization step ~10-100x over the
    real residual spread and coarsen every genuine token."""
    rng = np.random.default_rng(7)
    dim = 16
    # two tight clusters -> tiny true residuals
    centers = rng.normal(size=(2, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    emb = np.zeros((8, 4, dim), np.float32)
    mask = np.zeros((8, 4), bool)
    for i in range(8):
        for j in range(3):  # last token of every doc is padding
            c = centers[(i + j) % 2]
            emb[i, j] = c + rng.normal(scale=1e-3, size=dim)
            mask[i, j] = True
    idx = compress(emb, mask, [f"d{i}" for i in range(8)],
                   num_centroids=2, sample_size=24)
    # scales reflect the ~1e-3 residual spread, not the O(0.1) padding
    # pseudo-residuals (|centroid| / 127 ~ 2e-3 per dim on average)
    assert float(np.max(np.asarray(idx.scales))) < 1e-3, np.max(idx.scales)
    rec = np.asarray(decompress(idx.codes, idx.residuals, idx.centroids,
                                idx.scales))
    err = np.abs(rec - emb)[mask].max()
    assert err < 5e-5, err


def test_make_search_fn_caches_programs():
    from reranking_multimodal_retrievers_tpu.engine.search import (
        make_search_fn,
    )

    a = make_search_fn(None, 64, 5, chunk=16, use_pallas=False)
    b = make_search_fn(None, 64, 5, chunk=16, use_pallas=False)
    assert a is b, "same build key must return the cached program"
    c = make_search_fn(None, 64, 7, chunk=16, use_pallas=False)
    assert c is not a


def test_token_index_meta_records_on_disk_dtype(tmp_path, corpus):
    import json as _json
    import os as _os

    from reranking_multimodal_retrievers_tpu.engine.index import TokenIndex

    emb, mask, _ = corpus
    idx = TokenIndex.from_arrays(emb, mask,
                                 [f"d{i}" for i in range(len(emb))])
    p = str(tmp_path / "idx")
    idx.save(p)
    meta = _json.load(open(_os.path.join(p, "meta.json")))
    import numpy as _np

    on_disk = _np.load(_os.path.join(p, "embeddings.npy"))
    assert meta["dtype"] == str(on_disk.dtype) == "float16"


def test_train_centroids_sample_much_smaller_than_k():
    """len(sample) < k/2 must tile the init up to k rows, not crash the
    jitted scan with a carry-shape mismatch."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    c, assign = train_centroids(x, k=16, n_iters=3)
    assert c.shape == (16, 8)
    assert assign.shape == (3,)
    import pytest

    with pytest.raises(ValueError, match="empty"):
        train_centroids(np.zeros((0, 8), np.float32), k=4)


def test_vision_seq2seq_precomputed_prefix_matches_pixels():
    """encode(vision_prefix=precomputed) must equal encode(pixel_values) —
    the RAG executor computes the prefix once per image and repeats it over
    candidate docs."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        VisionSeq2SeqLM, DecoderRerankConfig,
    )

    cfg = DecoderRerankConfig.tiny()
    model = VisionSeq2SeqLM(cfg)
    img = cfg.vision_config.image_size
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    pix = jax.random.normal(jax.random.PRNGKey(0), (2, 3, img, img))
    params = model.init(jax.random.PRNGKey(1), ids, mask,
                        jnp.ones((2, 1), jnp.int32), pix)["params"]

    direct, m1 = model.apply({"params": params}, ids, mask, pix,
                             method=VisionSeq2SeqLM.encode)
    prefix = model.apply({"params": params}, pix,
                         method=VisionSeq2SeqLM.vision_prefix)
    via_prefix, m2 = model.apply({"params": params}, ids, mask, None, prefix,
                                 method=VisionSeq2SeqLM.encode)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_prefix),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_greedy_decode_nll_alignment():
    """The generation pass and the teacher-forced scoring pass must share
    the same conditioning: re-decoding [start, g_0..g_{L-2}] must reproduce
    each generated token as the argmax at its own position, and the
    returned losses must equal the manual masked NLL."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.executors.rag_executor import (
        greedy_decode_with_nll,
    )
    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        VisionSeq2SeqLM, DecoderRerankConfig,
    )

    cfg = DecoderRerankConfig.tiny()
    model = VisionSeq2SeqLM(cfg)
    B, Ls, L = 3, 7, 6
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.text_config.vocab_size,
                                          (B, Ls)), jnp.int32)
    mask = jnp.ones((B, Ls), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask,
                        jnp.ones((B, 1), jnp.int32))["params"]
    enc_states, enc_mask = model.apply({"params": params}, ids, mask,
                                       method=VisionSeq2SeqLM.encode)

    def decode_logits(toks):
        logits, _ = model.apply({"params": params}, toks, enc_states,
                                enc_mask, method=VisionSeq2SeqLM.decode)
        return logits

    start_id, pad_id = 2, 0
    labels, losses = jax.jit(
        lambda: greedy_decode_with_nll(decode_logits, enc_states, enc_mask,
                                       start_id, pad_id, L))()
    labels, losses = np.asarray(labels), np.asarray(losses)
    assert labels.shape == (B, L)

    # scoring conditioning == generation conditioning
    dec_in = np.concatenate(
        [np.full((B, 1), start_id, np.int32), labels[:, :-1]], axis=1)
    logits = np.asarray(decode_logits(jnp.asarray(dec_in)))
    np.testing.assert_array_equal(logits.argmax(-1), labels)

    # manual masked NLL matches
    logp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    tok_ll = np.take_along_axis(np.asarray(logp), labels[..., None],
                                axis=-1)[..., 0]
    m = (labels != pad_id).astype(np.float32)
    manual = -(tok_ll * m).sum(-1) / np.maximum(m.sum(-1), 1.0)
    np.testing.assert_allclose(losses, manual, rtol=1e-5)
