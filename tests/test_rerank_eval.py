"""Chunked-rerank batching (`engine/rerank_eval.py`).

Regression coverage for the chunk/pad picker: when no divisor of the
expanded batch is a multiple of the mesh's data shards, the program must pad
up to a shardable chunk — never fall back to one whole-batch chunk, which
recreates the multi-GB activation blow-up the scan exists to bound.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reranking_multimodal_retrievers_tpu.engine.rerank_eval import (
    _pick_chunk,
    make_chunked_rerank_fn,
)


def test_pick_chunk_exact_divisors():
    assert _pick_chunk(400, 100, 1) == (100, 0)
    assert _pick_chunk(400, 100, 4) == (100, 0)
    assert _pick_chunk(6, None, 1) == (6, 0)


def test_pick_chunk_pads_instead_of_whole_batch():
    # B=3 queries x K=100 docs on 8 shards: no divisor of 300 is a multiple
    # of 8 — the old code returned chunk=300 (the whole batch)
    chunk, pad = _pick_chunk(300, 64, 8)
    assert chunk % 8 == 0 and chunk <= 64
    assert (300 + pad) % chunk == 0
    # tiny batch smaller than the shard count: pad up to one shardable chunk
    chunk, pad = _pick_chunk(6, 64, 8)
    assert chunk == 8 and pad == 2


def _tiny_rerank_setup(B, K, L):
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.flmr import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        FullContextRerankModel,
        RerankConfig,
    )

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
    return model, params, ids, am, tt, pix


def test_padded_chunking_matches_unpadded_on_mesh():
    """B·K=6 rows on an 8-shard mesh forces the pad path; logits must match
    the single-device unpadded program exactly (padding rows sliced away)."""
    from reranking_multimodal_retrievers_tpu.parallel.mesh import make_mesh

    B, K, L = 3, 2, 16
    model, params, ids, am, tt, pix = _tiny_rerank_setup(B, K, L)

    fn_single = make_chunked_rerank_fn(model, nway=K, chunk_size=6)
    want = np.asarray(fn_single(params, ids, am, tt, pix))

    mesh = make_mesh(n_data=8)
    fn_mesh = make_chunked_rerank_fn(model, nway=K, chunk_size=6, mesh=mesh)
    got = np.asarray(fn_mesh(params, ids, am, tt, pix))
    assert got.shape == (B, K)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
