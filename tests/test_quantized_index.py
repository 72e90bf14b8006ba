"""Int8 quantized exact retrieval (QuantizedTokenIndex + int8 MaxSim).

Covers: exact integer math vs a numpy oracle on crafted codes, ranking
faithfulness vs the fp32 exact scan on random normalized corpora, the
Pallas int8 kernel in interpret mode, the SPMD sharded program, and the
save/load roundtrip. TPU-native analogue of the reference's residual codec
tests (`colbert/indexing/codecs/residual.py`) — here the scan stays exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.engine.index import (
    QuantizedTokenIndex,
    TokenIndex,
)
from reranking_multimodal_retrievers_tpu.engine.search import (
    Searcher,
    make_search_fn_int8,
    search_exhaustive,
)
from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import (
    maxsim_scores_pallas_int8,
)


def _random_corpus(n=64, L_d=8, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, L_d, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    mask = np.ones((n, L_d), bool)
    # ragged tail: some docs shorter
    for i in range(0, n, 5):
        mask[i, L_d // 2:] = False
        emb[i, L_d // 2:] = 0.0
    return emb, mask


def _oracle_maxsim(Q, emb, mask):
    """fp64 masked MaxSim totals [B, N]."""
    scores = np.einsum("bqd,nld->bnlq", Q.astype(np.float64),
                       emb.astype(np.float64))
    scores = np.where(mask[None, :, :, None], scores, -1e9)
    return scores.max(axis=2).sum(axis=-1)


def test_quantized_search_matches_fp_ranking():
    emb, mask = _random_corpus()
    ids = [f"d{i}" for i in range(emb.shape[0])]
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(4, 6, emb.shape[2])).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)

    fp_index = TokenIndex.from_arrays(emb, mask, ids)
    q_index = QuantizedTokenIndex.from_token_index(fp_index)

    v_fp, i_fp = search_exhaustive(fp_index, Q, k=10)
    v_q, i_q = search_exhaustive(q_index, Q, k=10)

    # scores approximate the fp totals tightly (unit-norm tokens, per-doc
    # symmetric scales) and top-10 sets overlap almost completely
    for b in range(Q.shape[0]):
        overlap = len(set(i_fp[b].tolist()) & set(i_q[b].tolist())) / 10
        assert overlap >= 0.8, (b, overlap)
    oracle = _oracle_maxsim(Q, emb, mask)
    picked = np.take_along_axis(oracle, i_q, axis=1)
    np.testing.assert_allclose(v_q, picked, rtol=0.05, atol=0.05)


def test_int8_math_exact_on_crafted_codes():
    """With integer-valued embeddings whose scales are exactly 1/127·amax,
    the int8 path reproduces the fp MaxSim bit-for-bit (no rounding)."""
    rng = np.random.default_rng(2)
    N, L_d, L_q, dim = 8, 4, 3, 8
    codes = rng.integers(-5, 6, size=(N, L_d, dim)).astype(np.float32)
    codes[:, 0, 0] = 127  # every doc hits amax → per-doc scale exactly u
    u = 0.01
    emb = codes * u
    mask = np.ones((N, L_d), bool)
    ids = [str(i) for i in range(N)]
    q_index = QuantizedTokenIndex.from_arrays(emb, mask, ids)
    np.testing.assert_array_equal(
        np.asarray(q_index.codes), codes.astype(np.int8)
    )

    Qcodes = rng.integers(-5, 6, size=(2, L_q, dim)).astype(np.float32)
    Qcodes[:, :, 0] = 127  # every query TOKEN hits amax → row scale exact
    Q = Qcodes * 0.02
    v_q, i_q = search_exhaustive(q_index, Q, k=N)
    oracle = _oracle_maxsim(Q, emb, mask)
    o_sorted = np.sort(oracle, axis=1)[:, ::-1]
    np.testing.assert_allclose(v_q, o_sorted, rtol=1e-5, atol=1e-6)


def test_pallas_int8_kernel_interpret_matches_xla():
    emb, mask = _random_corpus(n=16, L_d=8, dim=128)
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(8, 8, 128)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)

    from reranking_multimodal_retrievers_tpu.ops.quant import quantize_rows

    q_index = QuantizedTokenIndex.from_arrays(
        emb, mask, [str(i) for i in range(16)])
    Qq, qscale = quantize_rows(jnp.asarray(Q))
    scores_pl = maxsim_scores_pallas_int8(
        Qq, qscale[..., 0], q_index.codes, q_index.scales,
        jnp.asarray(mask), B_blk=8, C_blk=8, interpret=True)

    acc = jnp.einsum("bqd,cld->bclq", Qq, q_index.codes,
                     preferred_element_type=jnp.int32)
    acc = jnp.where(jnp.asarray(mask)[None, :, :, None], acc, -(1 << 25))
    per_tok = jnp.max(acc, axis=2).astype(jnp.float32)
    ref = jnp.einsum("bcq,bq->bc", per_tok,
                     qscale[..., 0].astype(jnp.float32))
    ref = ref * q_index.scales[None, :]
    np.testing.assert_allclose(np.asarray(scores_pl), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pallas_int8_kernel_unpadded_interpret():
    emb, _ = _random_corpus(n=16, L_d=8, dim=128)
    mask = np.ones((16, 8), bool)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)
    rng = np.random.default_rng(4)
    Q = rng.normal(size=(8, 8, 128)).astype(np.float32)

    from reranking_multimodal_retrievers_tpu.ops.quant import quantize_rows

    q_index = QuantizedTokenIndex.from_arrays(
        emb, mask, [str(i) for i in range(16)])
    Qq, qscale = quantize_rows(jnp.asarray(Q))
    no_mask = maxsim_scores_pallas_int8(
        Qq, qscale[..., 0], q_index.codes, q_index.scales, None,
        B_blk=8, C_blk=8, interpret=True)
    with_mask = maxsim_scores_pallas_int8(
        Qq, qscale[..., 0], q_index.codes, q_index.scales,
        jnp.asarray(mask), B_blk=8, C_blk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(no_mask), np.asarray(with_mask),
                               rtol=1e-6, atol=1e-6)


def test_quantized_searcher_and_roundtrip(tmp_path):
    emb, mask = _random_corpus(n=32, L_d=6, dim=16)
    ids = [f"p{i}" for i in range(32)]
    q_index = QuantizedTokenIndex.from_arrays(emb, mask, ids)
    q_index.save(str(tmp_path / "qidx"))
    loaded = QuantizedTokenIndex.load(str(tmp_path / "qidx"))
    np.testing.assert_array_equal(np.asarray(q_index.codes),
                                  np.asarray(loaded.codes))
    np.testing.assert_array_equal(np.asarray(q_index.scales),
                                  np.asarray(loaded.scales))
    assert loaded.doc_ids == ids

    rng = np.random.default_rng(5)
    Q = rng.normal(size=(2, 4, 16)).astype(np.float32)
    s = Searcher(index=loaded, k=5)
    got_ids, scores = s.search(Q)
    assert len(got_ids) == 2 and all(len(r) == 5 for r in got_ids)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_quantized_spmd_matches_single_device():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh

    from reranking_multimodal_retrievers_tpu.parallel.mesh import DATA_AXIS

    mesh = Mesh(np.array(devs[:4]), (DATA_AXIS,))
    emb, mask = _random_corpus(n=64, L_d=8, dim=16)
    ids = [f"d{i}" for i in range(64)]
    rng = np.random.default_rng(6)
    Q = rng.normal(size=(4, 6, 16)).astype(np.float32)

    single = QuantizedTokenIndex.from_arrays(emb, mask, ids)
    sharded = QuantizedTokenIndex.from_arrays(emb, mask, ids, mesh=mesh)
    v1, i1 = search_exhaustive(single, Q, k=10)
    v2, i2 = search_exhaustive(sharded, Q, k=10)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)
