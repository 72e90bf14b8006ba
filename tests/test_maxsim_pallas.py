"""Pallas fused MaxSim kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reranking_multimodal_retrievers_tpu.ops.maxsim import in_batch_maxsim_scores
from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import maxsim_scores_pallas


@pytest.mark.parametrize("B,N,L_q,L_d,dim,B_blk,C_blk", [
    (4, 16, 8, 16, 32, 2, 4),
    (2, 8, 16, 8, 16, 2, 8),
])
def test_pallas_matches_reference(B, N, L_q, L_d, dim, B_blk, C_blk):
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(B, L_q, dim)).astype(np.float32)
    D = rng.normal(size=(N, L_d, dim)).astype(np.float32)
    lens = rng.integers(1, L_d + 1, size=N)
    mask = np.arange(L_d)[None] < lens[:, None]
    D = D * mask[:, :, None]

    want = np.asarray(
        in_batch_maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask))
    )
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask),
            B_blk=B_blk, C_blk=C_blk, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_all_masked_doc():
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(2, 4, 16)).astype(np.float32)
    D = rng.normal(size=(4, 8, 16)).astype(np.float32)
    mask = np.ones((4, 8), bool)
    mask[2] = False
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask),
            B_blk=2, C_blk=4, interpret=True,
        )
    )
    # the kernel masks with an ADDITIVE −9999 bias (not a where-replace), so
    # for an all-masked doc the exact value is sum_q max_t (raw - 9999) —
    # assert it exactly rather than with a loose band
    raw = np.einsum("qld,td->qtl", Q, D[2])  # [B, L_d, L_q]
    expected = (raw - 9999.0).max(axis=1).sum(axis=1)
    np.testing.assert_allclose(got[:, 2], expected, rtol=1e-5)
    # and valid docs are exact vs the XLA reference
    want = np.asarray(
        in_batch_maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask))
    )
    valid = [0, 1, 3]
    np.testing.assert_allclose(got[:, valid], want[:, valid], rtol=1e-4, atol=1e-4)
    # masked docs can never win
    assert (got[:, 2:3] < got[:, valid] - 1000).all()


class TestFusedSelfAttention:
    """Layout-native fused attention kernel (ops/attention_pallas.py),
    interpret mode on CPU."""

    def _mk(self, B=4, L=32, NH=4, HD=32, seed=0):
        import numpy as np
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.normal(size=(B, L, NH * HD)), jnp.float32)
        return mk(), mk(), mk(), NH, HD

    def test_matches_reference_no_mask(self):
        import numpy as np

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        q, k, v, NH, HD = self._mk()
        got = fused_self_attention(q, k, v, num_heads=NH, sm_scale=HD ** -0.5,
                                   interpret=True)
        ref = fused_self_attention_reference(q, k, v, num_heads=NH,
                                             sm_scale=HD ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_reference_with_padding_bias(self):
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        q, k, v, NH, HD = self._mk(seed=1)
        bias = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
        bias = bias.at[:, 24:].set(-1e9)
        got = fused_self_attention(q, k, v, bias, num_heads=NH,
                                   sm_scale=HD ** -0.5, interpret=True)
        ref = fused_self_attention_reference(q, k, v, bias, num_heads=NH,
                                             sm_scale=HD ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_bert_model_pallas_attention_matches_unfused(self):
        """BertModel with use_pallas_attention reproduces the unfused model
        (same params), including padding-mask handling. tiny() has
        head_dim 8 (< the kernel's 128-lane minimum), so this exercises the
        unfused fallback — in particular the padding-mask reconstruction
        when the caller planned on the fused path."""
        import dataclasses

        import jax
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.models.bert import (
            BertConfig, BertModel,
        )

        rng = np.random.default_rng(2)
        B, L = 2, 32
        ids = jnp.asarray(rng.integers(10, 1000, size=(B, L)), jnp.int32)
        am = jnp.ones((B, L), jnp.int32).at[0, 20:].set(0)
        cfg = BertConfig.tiny()
        model_ref = BertModel(cfg)
        model_pl = BertModel(dataclasses.replace(cfg, use_pallas_attention=True))
        params = model_ref.init(jax.random.PRNGKey(0), ids, am)["params"]
        ref = np.asarray(
            model_ref.apply({"params": params}, ids, am)["last_hidden_state"]
        )
        got = np.asarray(
            model_pl.apply({"params": params}, ids, am)["last_hidden_state"]
        )
        valid = np.asarray(am).astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], atol=2e-5, rtol=1e-4)

    def test_bert_model_pallas_attention_kernel_path(self):
        """head_dim 32 → 4 heads/block: the kernel path proper (interpret)."""
        import dataclasses

        import jax
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.models.bert import (
            BertConfig, BertModel,
        )

        rng = np.random.default_rng(3)
        B, L = 2, 32
        ids = jnp.asarray(rng.integers(10, 1000, size=(B, L)), jnp.int32)
        am = jnp.ones((B, L), jnp.int32).at[1, 24:].set(0)
        cfg = BertConfig.tiny(hidden_size=128, num_attention_heads=4,
                              intermediate_size=256)
        model_ref = BertModel(cfg)
        model_pl = BertModel(dataclasses.replace(cfg, use_pallas_attention=True))
        params = model_ref.init(jax.random.PRNGKey(0), ids, am)["params"]
        ref = np.asarray(
            model_ref.apply({"params": params}, ids, am)["last_hidden_state"]
        )
        got = np.asarray(
            model_pl.apply({"params": params}, ids, am)["last_hidden_state"]
        )
        valid = np.asarray(am).astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], atol=2e-5, rtol=1e-4)

    def test_long_sequence_adaptive_tile(self):
        """L > 512 engages the quadratic batch-tile downscale (the [bb, L, L]
        fp32 score block must stay under the 16 MB VMEM stack on hardware —
        regression for the L=640 interaction-reranker shape). Verified on a
        real v5e: compiles at [100, 640, 768] and matches the oracle to bf16
        round-off; here the same code path runs in interpret mode at a small
        width."""
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        rng = np.random.default_rng(2)
        B, L, NH, HD = 4, 640, 2, 64
        mk = lambda: jnp.asarray(rng.normal(size=(B, L, NH * HD)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        bias = jnp.zeros((B, L), jnp.float32).at[:, 600:].set(-1e9)
        got = fused_self_attention(q, k, v, bias, num_heads=NH,
                                   sm_scale=HD ** -0.5, interpret=True)
        ref = fused_self_attention_reference(q, k, v, bias, num_heads=NH,
                                             sm_scale=HD ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestT5FusedAttention:
    def test_head_bias_kernel_matches_oracle(self):
        """The per-head additive bias input (T5 relative-position bias) in
        every mask combination."""
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        rng = np.random.default_rng(3)
        B, L, NH, HD = 4, 128, 4, 64
        mk = lambda: jnp.asarray(rng.normal(size=(B, L, NH * HD)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        mask = jnp.zeros((B, L), jnp.float32).at[:, 100:].set(-1e9)
        hb = jnp.asarray(rng.normal(size=(NH, L, L)), jnp.float32)
        for m, h in ((None, hb), (mask, hb)):
            got = fused_self_attention(q, k, v, m, h, num_heads=NH,
                                       sm_scale=0.125, interpret=True)
            ref = fused_self_attention_reference(q, k, v, m, h, num_heads=NH,
                                                 sm_scale=0.125)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_t5_encoder_fused_parity(self):
        """T5 stack with use_pallas_attention on vs off — identical logits
        (the kernel path must preserve the mask-free position-bias contract
        and stream the [B, L] key mask separately)."""
        import dataclasses

        import numpy as np
        import jax
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.models.t5 import (
            T5Config, T5ForConditionalGeneration,
        )

        cfg0 = T5Config(vocab_size=128, d_model=128, d_kv=64, d_ff=256,
                        num_layers=2, num_decoder_layers=2, num_heads=2)
        cfg1 = dataclasses.replace(cfg0, use_pallas_attention=True)
        m0 = T5ForConditionalGeneration(cfg0)
        m1 = T5ForConditionalGeneration(cfg1)
        rng = np.random.default_rng(0)
        B, L = 2, 64
        ids = jnp.asarray(rng.integers(3, 120, size=(B, L)), jnp.int32)
        am = jnp.ones((B, L), jnp.int32).at[:, 50:].set(0)
        dec = jnp.asarray(rng.integers(3, 120, size=(B, 4)), jnp.int32)
        params = m0.init(jax.random.PRNGKey(0), ids, am, dec)["params"]
        l0, _ = m0.apply({"params": params}, ids, am, dec)
        l1, _ = m1.apply({"params": params}, ids, am, dec)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   atol=2e-4, rtol=1e-3)


class TestCausalFusedAttention:
    """Causal (decoder-only / OPT) variant of the fused attention kernel —
    the mask is synthesized in-register from iota comparisons."""

    def _mk(self, seed=0, B=4, L=64, NH=4, HD=32):
        import numpy as np
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(
            rng.normal(size=(B, L, NH * HD)), jnp.float32)
        return mk(), mk(), mk(), NH, HD

    def test_causal_matches_reference(self):
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        q, k, v, NH, HD = self._mk()
        L = q.shape[1]
        got = fused_self_attention(q, k, v, causal=True, num_heads=NH,
                                   sm_scale=HD ** -0.5, interpret=True)
        causal_bias = jnp.where(
            jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e9, 0.0)
        ref = fused_self_attention_reference(
            q, k, v, head_bias=jnp.broadcast_to(causal_bias, (NH, L, L)),
            num_heads=NH, sm_scale=HD ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_causal_with_key_padding(self):
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        q, k, v, NH, HD = self._mk(seed=1)
        B, L = q.shape[:2]
        bias = jnp.zeros((B, L), jnp.float32).at[:, 48:].set(-1e9)
        got = fused_self_attention(q, k, v, bias, causal=True, num_heads=NH,
                                   sm_scale=HD ** -0.5, interpret=True)
        causal_bias = jnp.where(
            jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e9, 0.0)
        ref = fused_self_attention_reference(
            q, k, v, bias, head_bias=jnp.broadcast_to(causal_bias, (NH, L, L)),
            num_heads=NH, sm_scale=HD ** -0.5)
        # padded-query rows (>=48) attend only to masked keys; compare the
        # real rows
        np.testing.assert_allclose(np.asarray(got)[:, :48], np.asarray(ref)[:, :48],
                                   atol=1e-5, rtol=1e-5)

    def test_opt_head_dim_80_packing(self):
        """OPT's head_dim=80 needs an 8-head pack (640 lanes) — the packing
        search must find it instead of asserting."""
        import numpy as np
        import jax.numpy as jnp

        from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
            fused_self_attention, fused_self_attention_reference,
        )

        rng = np.random.default_rng(2)
        B, L, NH, HD = 2, 16, 8, 80
        mk = lambda: jnp.asarray(rng.normal(size=(B, L, NH * HD)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        got = fused_self_attention(q, k, v, causal=True, num_heads=NH,
                                   sm_scale=HD ** -0.5, interpret=True)
        causal_bias = jnp.where(
            jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e9, 0.0)
        ref = fused_self_attention_reference(
            q, k, v, head_bias=jnp.broadcast_to(causal_bias, (NH, L, L)),
            num_heads=NH, sm_scale=HD ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_unpadded_and_bf16_variants():
    """Serving-throughput kernel knobs (`bench_retrieval` roofline work):
    mask=None must equal an all-ones mask exactly, and score_dtype=bf16 must
    track fp32 within bf16 quantization of the per-token maxima."""
    rng = np.random.default_rng(3)
    B, N, L_q, L_d, dim = 4, 16, 8, 16, 32
    Q = rng.normal(size=(B, L_q, dim)).astype(np.float32)
    D = rng.normal(size=(N, L_d, dim)).astype(np.float32)
    ones = jnp.ones((N, L_d), bool)
    full = np.asarray(maxsim_scores_pallas(
        jnp.asarray(Q), jnp.asarray(D), ones, B_blk=2, C_blk=4,
        interpret=True))
    nomask = np.asarray(maxsim_scores_pallas(
        jnp.asarray(Q), jnp.asarray(D), None, B_blk=2, C_blk=4,
        interpret=True))
    np.testing.assert_array_equal(nomask, full)

    bf16 = np.asarray(maxsim_scores_pallas(
        jnp.asarray(Q, jnp.bfloat16), jnp.asarray(D, jnp.bfloat16), None,
        B_blk=2, C_blk=4, interpret=True, score_dtype=jnp.bfloat16))
    # |max| <= ~6 sigma * sqrt(dim) here; bf16 eps ~ 2^-8 relative → per-max
    # abs error <~ 0.25, summed over L_q=8 with bf16 inputs upstream
    np.testing.assert_allclose(bf16, full, atol=2.0, rtol=0.02)
    # ranking survives: per-query argmax doc unchanged
    np.testing.assert_array_equal(bf16.argmax(axis=1), full.argmax(axis=1))


def test_search_unpadded_bf16_topk_agreement():
    """The serving knobs (unpadded mask-skip + bf16 score storage) on the
    ACTUAL pallas kernel (interpret mode), not just the XLA fallback: the
    kernel's unpadded/bf16 scores must match the exact fp32 oracle within
    bf16 tolerance, and the resulting top-k must agree."""
    import jax

    from reranking_multimodal_retrievers_tpu.engine.search import (
        _local_search,
    )
    from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import (
        maxsim_scores_pallas,
    )

    rng = np.random.default_rng(4)
    B, N, L_q, L_d, dim, k = 8, 64, 8, 16, 128, 5
    Q = jnp.asarray(rng.normal(size=(B, L_q, dim)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(N, L_d, dim)), jnp.float32)
    M = jnp.ones((N, L_d), bool)
    exact_v, exact_i = _local_search(Q, D, M, k=k, chunk=16)

    # XLA fallback path with the knobs set must stay correct
    v2, i2 = _local_search(Q, D, M, k=k, chunk=16, unpadded=True,
                           score_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(exact_i), np.asarray(i2))

    # the kernel itself (interpret mode): unpadded (mask=None) + bf16
    # score storage vs the exact fp32 oracle totals
    oracle = np.einsum("bqd,nld->bnlq", np.asarray(Q), np.asarray(D))
    oracle = oracle.max(axis=2).sum(axis=-1)  # [B, N]
    kernel = np.asarray(maxsim_scores_pallas(
        Q, D, None, B_blk=8, C_blk=8, interpret=True,
        score_dtype=jnp.bfloat16))
    np.testing.assert_allclose(kernel, oracle, rtol=3e-2, atol=0.5)
    topk_kernel = np.argsort(-kernel, axis=1)[:, :k]
    # top-1 must survive bf16 rounding; deeper ranks via score closeness
    np.testing.assert_array_equal(topk_kernel[:, 0],
                                  np.asarray(exact_i)[:, 0])


def test_search_unpadded_excludes_padding_docs():
    """`unpadded=True` skips only the per-TOKEN mask; whole-padding docs
    (all-False mask rows, the doc-axis padding a sharded TokenIndex adds)
    must still never reach top-k — even when every real doc scores negative
    (padding docs would otherwise win with their raw 0 totals)."""
    from reranking_multimodal_retrievers_tpu.engine.search import (
        _local_search,
    )

    rng = np.random.default_rng(5)
    B, N, L_q, L_d, dim, k = 8, 64, 8, 16, 128, 8
    # all-negative dot products: every real MaxSim total < 0
    Q = jnp.asarray(-np.abs(rng.normal(size=(B, L_q, dim))), jnp.float32)
    D = jnp.asarray(np.abs(rng.normal(size=(N, L_d, dim))), jnp.float32)
    M = np.ones((N, L_d), bool)
    M[N - 6:] = False  # 6 padding docs at the tail
    M = jnp.asarray(M)
    _, idx = _local_search(Q, D, M, k=k, chunk=16, unpadded=True)
    assert int(np.asarray(idx).max()) < N - 6


def test_head_pack_feasible_mirrors_kernel_search():
    """The dispatch gate must agree with the kernel's ACTUAL packing search
    — drive fused_self_attention itself (interpret mode) per geometry
    instead of comparing against a frozen copy of the algorithm. A stricter
    gate silently disables the fused path for geometries the kernel
    supports (OPT's 32 heads x head_dim 80 regressed this way); a looser
    gate dispatches into the kernel's packing assert."""
    import jax

    from reranking_multimodal_retrievers_tpu.ops.platform import (
        head_pack_feasible,
    )
    from reranking_multimodal_retrievers_tpu.ops.attention_pallas import (
        fused_self_attention, fused_self_attention_reference,
    )

    cases = [
        (12, 64),   # BERT-base
        (32, 80),   # OPT-2.7b — needs the relaxed upward search
        (7, 80),    # no pack divides 7 with 128-lane rows -> infeasible
        (12, 26),
        (1, 128),
    ]
    rng = np.random.default_rng(11)
    B, L = 1, 128
    for nh, hd in cases:
        gate = head_pack_feasible(nh, hd)
        q, k, v = (jnp.asarray(rng.normal(size=(B, L, nh * hd)) * 0.1,
                               jnp.float32) for _ in range(3))
        if gate:
            out = fused_self_attention(q, k, v, num_heads=nh,
                                       sm_scale=hd ** -0.5, interpret=True)
            want = fused_self_attention_reference(q, k, v, num_heads=nh,
                                                  sm_scale=hd ** -0.5)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                       rtol=2e-2, atol=2e-2)
        else:
            with pytest.raises(AssertionError):
                fused_self_attention(q, k, v, num_heads=nh,
                                     sm_scale=hd ** -0.5, interpret=True)
    assert head_pack_feasible(32, 80), "OPT geometry must be feasible"
    assert not head_pack_feasible(7, 80)
