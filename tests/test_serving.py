"""Serving layer: micro-batching over the jitted programs (serving/)."""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.serving import (
    MicroBatcher, RerankService, RetrievalService,
)


def test_microbatcher_groups_and_orders():
    calls = []

    def run(items):
        calls.append(len(items))
        return [x * 10 for x in items]

    mb = MicroBatcher(run, max_batch=4, max_wait_ms=50)
    futs = [mb.submit(i) for i in range(10)]
    results = [f.result(timeout=5) for f in futs]
    mb.close()
    assert results == [i * 10 for i in range(10)]
    assert sum(calls) == 10
    # coalescing actually happened: fewer device calls than items
    assert len(calls) < 10
    assert max(mb.batch_sizes) > 1


def test_microbatcher_propagates_errors():
    def run(items):
        raise RuntimeError("boom")

    mb = MicroBatcher(run, max_batch=2, max_wait_ms=1)
    f = mb.submit(1)
    with pytest.raises(RuntimeError):
        f.result(timeout=5)
    mb.close()


def test_rerank_service_pads_and_distributes():
    """A toy 'program' with a STATIC [B·K, L] shape: the service must pad
    partial groups to the full geometry and hand each caller its own [K]."""
    K, L, B = 4, 8, 4
    seen_shapes = []

    def rerank_fn(params, ids, am, tt, pix):
        seen_shapes.append(tuple(ids.shape))
        return jnp.sum(ids, axis=-1).reshape(B, K).astype(jnp.float32)

    svc = RerankService(rerank_fn, params={}, nway=K, max_batch=B,
                        max_wait_ms=30)
    reqs = []
    for q in range(6):  # 6 queries -> at least two device calls
        ids = np.full((K, L), q + 1, np.int32)
        reqs.append((q, svc.rerank(ids, np.ones((K, L), np.int32))))
    for q, fut in reqs:
        logits = fut.result(timeout=10)
        assert logits.shape == (K,)
        np.testing.assert_allclose(logits, (q + 1) * L)
    svc.close()
    # every device call saw the full static geometry
    assert set(seen_shapes) == {(B * K, L)}


def test_retrieval_service_end_to_end():
    from reranking_multimodal_retrievers_tpu.engine.index import TokenIndex
    from reranking_multimodal_retrievers_tpu.engine.search import make_search_fn

    rng = np.random.default_rng(0)
    N, Ld, dim, Lq, B = 32, 8, 32, 8, 4
    emb = rng.normal(size=(N, Ld, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    index = TokenIndex.from_arrays(emb, np.ones((N, Ld), bool),
                                   [f"d{i}" for i in range(N)])
    fn = make_search_fn(None, index.num_padded_docs, k=3)
    svc = RetrievalService(fn, index, batch_queries=B, max_wait_ms=30)

    futs = [svc.search(emb[t, :Lq]) for t in (0, 7, 21)]
    for t, fut in zip((0, 7, 21), futs):
        doc_ids, scores = fut.result(timeout=10)
        assert doc_ids[0] == f"d{t}"          # self-retrieval top-1
        assert len(doc_ids) == 3 and scores.shape == (3,)
    svc.close()


def test_concurrent_clients():
    """Many threads submitting concurrently all get their own answers."""
    def run(items):
        return [x + 1 for x in items]

    mb = MicroBatcher(run, max_batch=8, max_wait_ms=5)
    out = {}
    lock = threading.Lock()

    def client(i):
        r = mb(i)
        with lock:
            out[i] = r

    threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    mb.close()
    assert out == {i: i + 1 for i in range(32)}


def test_rerank_service_with_real_chunked_program():
    """Integration: the service drives the actual FullContextRerankModel
    chunked program (engine.make_chunked_rerank_fn) at tiny scale."""
    from reranking_multimodal_retrievers_tpu.engine import make_chunked_rerank_fn
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig
    from reranking_multimodal_retrievers_tpu.models.flmr import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        FullContextRerankModel, RerankConfig,
    )

    K, L, B = 2, 16, 2
    flmr = FLMRConfig.tiny()
    cfg = RerankConfig(
        flmr=flmr,
        cross_encoder=BertConfig.tiny(max_position_embeddings=64),
        loss_fn="BCE", max_query_length=4, max_decoder_source_length=L,
    )
    model = FullContextRerankModel(cfg)
    rng = np.random.default_rng(0)
    img = flmr.vision_config.image_size
    ids = jnp.asarray(rng.integers(3, 50, size=(B * K, L)), jnp.int32)
    am = jnp.ones((B * K, L), jnp.int32)
    tt = jnp.zeros((B * K, L), jnp.int32)
    pix = jnp.asarray(rng.normal(size=(B, 3, img, img)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids[:K], am[:K], tt[:K],
                        pix[:1], num_negative_examples=K - 1)["params"]
    fn = make_chunked_rerank_fn(model, nway=K, chunk_size=K)
    svc = RerankService(fn, params, nway=K, max_batch=B, max_wait_ms=20)
    futs = [
        svc.rerank(np.asarray(ids[q * K : (q + 1) * K]),
                   np.asarray(am[q * K : (q + 1) * K]),
                   np.asarray(tt[q * K : (q + 1) * K]),
                   np.asarray(pix[q]))
        for q in range(B)
    ]
    # oracle: the same program called directly on the full batch
    want = np.asarray(fn(params, ids, am, tt, pix)).reshape(B, K)
    for q, fut in enumerate(futs):
        got = fut.result(timeout=60)
        np.testing.assert_allclose(got, want[q], atol=1e-4, rtol=1e-4)
    svc.close()


def test_close_fails_pending_and_rejects_new():
    """Shutdown must FAIL queued requests (not hang their callers) and
    reject submissions after close."""
    import queue as _q

    release = threading.Event()

    def run(items):
        release.wait(timeout=5)
        return [x for x in items]

    mb = MicroBatcher(run, max_batch=1, max_wait_ms=1)
    f1 = mb.submit(1)          # picked up by the worker, blocked in run()
    time.sleep(0.1)
    f2 = mb.submit(2)          # still queued
    t = threading.Thread(target=mb.close)
    t.start()
    release.set()
    t.join(timeout=10)
    assert f1.result(timeout=5) == 1          # in-flight completes
    with pytest.raises(RuntimeError):
        f2.result(timeout=5)                  # queued request failed loudly
    with pytest.raises(RuntimeError):
        mb.submit(3)                          # post-close submit rejected


def test_rerank_service_mixed_optional_inputs():
    """A coalesced group mixing requests WITH and WITHOUT pixel_values must
    split into homogeneous device calls: zero-filled images are not "no
    vision prefix" (vision_prefix(zeros) != nothing), so a no-pix request's
    score must be independent of its batch companions. token_type_ids
    zero-fills in place — zeros are its defined default (ADVICE r1 +
    round-2 review)."""
    K, L, B = 2, 4, 4
    calls = []

    def rerank_fn(params, ids, am, tt, pix):
        calls.append((np.asarray(tt),
                      None if pix is None else np.asarray(pix)))
        return jnp.zeros((B * K,), jnp.float32)

    svc = RerankService(rerank_fn, params={}, nway=K, max_batch=B,
                        max_wait_ms=100)
    ids = np.ones((K, L), np.int32)
    am = np.ones((K, L), np.int32)
    tt = np.full((K, L), 7, np.int32)
    pix = np.ones((3, 8, 8), np.float32)
    # first item HAS both optionals, second has NEITHER — one coalesced
    # group, two homogeneous device calls
    f1 = svc.rerank(ids, am, token_type_ids=tt, pixel_values=pix)
    f2 = svc.rerank(ids * 2, am)
    f1.result(timeout=5), f2.result(timeout=5)
    svc.close()
    assert len(calls) == 2
    pix_calls = [c for c in calls if c[1] is not None]
    nopix_calls = [c for c in calls if c[1] is None]
    assert len(pix_calls) == 1 and len(nopix_calls) == 1
    assert pix_calls[0][0][:K].max() == 7      # item 1's tt kept
    assert pix_calls[0][1][0].max() == 1.0     # item 1's real image
    assert nopix_calls[0][0].max() == 0        # item 2: tt zero-filled

    # heterogeneous pixel SHAPES are a hard error, not silent corruption
    def rerank_fn2(params, ids, am, tt, pix):
        return jnp.zeros((B * K,), jnp.float32)

    svc2 = RerankService(rerank_fn2, params={}, nway=K, max_batch=B,
                         max_wait_ms=100)
    g1 = svc2.rerank(ids, am, pixel_values=np.ones((3, 8, 8), np.float32))
    g2 = svc2.rerank(ids, am, pixel_values=np.ones((3, 4, 4), np.float32))
    with pytest.raises(ValueError):
        g1.result(timeout=5)
    with pytest.raises(ValueError):
        g2.result(timeout=5)
    svc2.close()


def test_submit_close_race_never_leaves_unresolved_future():
    """Stress the submit()/close() TOCTOU (ADVICE r1): every submit must
    either raise 'closed' or get a resolved/failed future — no hangs."""
    for _ in range(20):
        mb = MicroBatcher(lambda items: [x for x in items], max_batch=4,
                          max_wait_ms=1)
        outcomes = []

        def client():
            try:
                f = mb.submit(1)
            except RuntimeError:
                outcomes.append("rejected")
                return
            try:
                f.result(timeout=5)
                outcomes.append("ok")
            except Exception:
                outcomes.append("failed")

        threads = [threading.Thread(target=client) for _ in range(8)]
        for t in threads:
            t.start()
        mb.close()
        for t in threads:
            t.join(timeout=10)
            assert not t.is_alive(), "client hung on unresolved future"
        assert len(outcomes) == 8


def test_retrieval_service_int8_index():
    """RetrievalService over a QuantizedTokenIndex (W8A8 retrieval path)."""
    from reranking_multimodal_retrievers_tpu.engine.index import (
        QuantizedTokenIndex,
    )
    from reranking_multimodal_retrievers_tpu.engine.search import (
        make_search_fn_int8,
    )

    rng = np.random.default_rng(1)
    N, Ld, dim, Lq, B = 32, 8, 32, 8, 4
    emb = rng.normal(size=(N, Ld, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    index = QuantizedTokenIndex.from_arrays(
        emb, np.ones((N, Ld), bool), [f"d{i}" for i in range(N)])
    fn = make_search_fn_int8(None, index.num_padded_docs, k=3)
    svc = RetrievalService(fn, index, batch_queries=B, max_wait_ms=30)

    futs = [svc.search(emb[t, :Lq]) for t in (3, 11, 30)]
    for t, fut in zip((3, 11, 30), futs):
        doc_ids, scores = fut.result(timeout=10)
        assert doc_ids[0] == f"d{t}"          # self-retrieval top-1
        assert len(doc_ids) == 3 and scores.shape == (3,)
    svc.close()
