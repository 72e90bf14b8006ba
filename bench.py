"""Flagship benchmark. Prints ONE JSON line (stdout); a secondary
kernel-TFLOPS line for the Pallas MaxSim kernel goes to stderr.

North star (BASELINE.json / BASELINE.md): the monoPreFLMR-B cross-encoder
rerank path — the reference reranks 100 docs in 1.40 s/query on an A100
(71.4 candidates/s). This benchmark runs the same workload at full model
size — BERT-base text encoder (12×768), ViT-B/32 vision encoder with the
transformer mapping network, dim-128 late interaction, 1-layer cross-encoder,
512-token joint sequences, 100 candidate docs per query — on the TPU and
reports candidates reranked per second per chip.

TPU-first restructuring (engine/rerank_eval.py): the query image is
ViT-encoded once per image (the reference re-encodes it per candidate), and
the [B·K, L] joint forward runs as a lax.scan over fixed-size row chunks so
the per-layer [rows, heads, L, L] attention logits never exceed one chunk —
the whole 400-row batch at once exhausts a single v5e chip's HBM.

Timing: the axon TPU tunnel acks ``block_until_ready`` before completion and
costs ~27 ms per host round-trip, so the workload runs inside a
dependency-chained ``lax.scan`` and the (long − short)/(n−1) slope cancels
both artifacts.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

A100_BASELINE_CAND_PER_SEC = 100 / 1.40  # monoPreFLMR-B, BASELINE.md


def bench_rerank_int8():
    """monoPreFLMR-B through the W8A8 int8-MXU serving path
    (`ops/quant.py`, `BertConfig.quantize_int8`) — the same headline program
    with every BERT projection/FFN matmul on the double-rate s8xs8->s32 MXU
    path. Rank-faithfulness pinned by tests/test_quant.py."""
    return bench_rerank(quantize_int8=True)


def bench_rerank_L():
    """monoPreFLMR-L: the same rerank workload with the ViT-L/14 vision
    encoder (24×1024, 257 patch tokens — PreFLMR's B→L difference is the
    vision tower; the ColBERT text encoder stays BERT-base,
    `LinWeizheDragon/PreFLMR_ViT-L` ↔
    `configs/Rerank/OKVQA/Encoder/monoPreFLMR-L_pointwise.jsonnet:5`).
    Baseline: 2.58 s/query on A100 (BASELINE.md latency table)."""
    return bench_rerank(vision_scale="L")


def bench_rerank(quantize_int8: bool = False, vision_scale: str = "B"):
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig
    from reranking_multimodal_retrievers_tpu.models.flmr import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        FullContextRerankModel,
        RerankConfig,
    )
    from reranking_multimodal_retrievers_tpu.engine import make_chunked_rerank_fn


    # queries per batch, docs per query, joint seq len (workload-defining: K
    # and L are fixed by the baseline; B amortizes fixed costs across queries
    # exactly as production batch-serving does)
    B = int(os.environ.get("BENCH_B", 8))
    K, L = 100, 512
    # rows per scan step: [CHUNK, 12, 512, 512] fp32 logits ≈ 13 MB/row
    CHUNK = int(os.environ.get("BENCH_CHUNK", 100))
    # the [rows, 12, 512, 512] attention-score tensor dominates HBM traffic;
    # bf16 score storage halves it (softmax still fp32 inside the fusion).
    # BENCH_FLASH=1 routes through the Pallas flash kernel instead — measured
    # slower than XLA's fused softmax at these shapes, kept as an option.
    flash = os.environ.get("BENCH_FLASH", "0") == "1"
    scores_bf16 = os.environ.get("BENCH_SCORES_BF16", "1") == "1"
    # tanh GELU: the erf transcendental over the FFN activations is ~17% of
    # wall-clock (933.7 vs 795.7 cand/s); rank error vs fp32-exact logits is
    # within bf16 round-off (spearman 0.9994, top-1 unchanged at K=100)
    gelu_tanh = os.environ.get("BENCH_GELU_TANH", "1") == "1"
    # layout-native Pallas attention: 3.15× the XLA attention core at these
    # shapes (no transposes, scores live in VMEM) — ops/attention_pallas.py
    pallas_attn = os.environ.get("BENCH_PALLAS_ATTN", "1") == "1"
    bert_kw = dict(use_flash_attention=flash, attention_scores_bf16=scores_bf16,
                   gelu_approximate=gelu_tanh, use_pallas_attention=pallas_attn,
                   quantize_int8=quantize_int8)
    if vision_scale == "L":
        vision_cfg = CLIPVisionConfig(  # ViT-L/14 (257 patch tokens)
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=224, patch_size=14,
        )
    else:
        vision_cfg = CLIPVisionConfig()  # ViT-B/32
    flmr = FLMRConfig(
        text_config=BertConfig(**bert_kw),  # BERT-base
        vision_config=vision_cfg,
        dim=128,
        mapping_network_prefix_length=32,
        use_transformer_mapping_network=True,
        transformer_mapping_num_hidden_layers=1,
    )
    # ViT-L/14 appends 257 patch tokens + the 32-token mapping prefix to the
    # 512-token text, so the joint sequence is ~800. The reference's L-scale
    # configs set cross_encoder_max_position_embeddings to 900 (750 is the
    # B/monoBERT value), so the A100 baseline did NOT truncate this workload
    # either — the comparison is equal per-candidate work. 1024 here just
    # sizes the table past the ~800-row joint sequence (bert.py raises past
    # the table size, unlike the reference's silent position clamp).
    cfg = RerankConfig(
        flmr=flmr,
        cross_encoder=BertConfig(
            num_hidden_layers=1,
            max_position_embeddings=1024 if vision_scale == "L" else 768,
            **bert_kw),
        loss_fn="BCE",
        max_query_length=32,
        max_decoder_source_length=L,
    )
    model = FullContextRerankModel(cfg)

    rng = np.random.default_rng(0)
    expanded = B * K
    batch = dict(
        input_ids=jnp.asarray(rng.integers(1000, 29000, size=(expanded, L)), jnp.int32),
        attention_mask=jnp.ones((expanded, L), jnp.int32),
        token_type_ids=jnp.asarray(
            np.repeat([[0] * 36 + [1] * (L - 36)], expanded, axis=0), jnp.int32
        ),
        query_pixel_values=jnp.asarray(
            rng.normal(size=(B, 3, 224, 224)), jnp.float32
        ),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2],
        batch["attention_mask"][:2],
        batch["token_type_ids"][:2],
        batch["query_pixel_values"][:1],
        num_negative_examples=1,
    )["params"]
    # production precision: bf16 params (MXU-native), fp32 accumulation inside
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    pix = batch["query_pixel_values"].astype(jnp.bfloat16)

    raw_fn = make_chunked_rerank_fn(model, nway=K, chunk_size=CHUNK, jit=False)

    @partial(jax.jit, static_argnames="iters")
    def rerank_chain(params, batch, pix, iters):
        def body(ids, _):
            logits = raw_fn(
                params, ids, batch["attention_mask"], batch["token_type_ids"], pix
            )
            # data dependency between iterations without changing the inputs:
            # the summed logits round to int32 0 at runtime, but XLA cannot
            # fold the add away
            ids = ids + (logits.sum() * 1e-12).astype(jnp.int32)
            return ids, logits[0, 0]

        _, ls = jax.lax.scan(body, batch["input_ids"], None, length=iters)
        return ls[-1]

    dt = _slope_timed(
        lambda it: rerank_chain(params, batch, pix, iters=it), n_long=4)
    return B * K / dt


def _slope_timed(chain, n_long=3, n_short=1, repeats=3):
    """(long − short)/(n−1) slope timing; forces device→host sync (the axon
    tunnel acks block_until_ready early, so only a transfer is a fence)."""
    float(chain(n_short))  # compile
    float(chain(n_long))

    def timed(iters):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_long) - timed(n_short)) / (n_long - n_short)


def bench_interaction():
    """ModPreFLMR-BERT (interaction reranker) throughput — reference reranks
    100 docs in 0.24 s/query on A100 (BASELINE.md `plots.ipynb` cell 15;
    model: 3-layer BERT-width cross-encoder over frozen late-interaction
    outputs, `configs/Rerank/OKVQA/Interaction/ModPreFLMR-BERT_pointwise.jsonnet:115`,
    `src/models/rerank/interaction_rerank_model.py:86-166`). Inputs are the
    precomputed 128-d token embeddings, as at test time where doc embeddings
    come from the index."""

    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers.interaction import (
        InteractionRerankConfig, InteractionRerankModel,
    )

    B, K, Lq, Ld, dim = 8, 100, 128, 512, 128
    bert_kw = dict(
        attention_scores_bf16=os.environ.get("BENCH_SCORES_BF16", "1") == "1",
        gelu_approximate=os.environ.get("BENCH_GELU_TANH", "1") == "1",
        use_pallas_attention=os.environ.get("BENCH_PALLAS_ATTN", "1") == "1",
    )
    cfg = InteractionRerankConfig(
        cross_encoder=BertConfig(num_hidden_layers=3,
                                 max_position_embeddings=Lq + Ld, **bert_kw),
        loss_fn="BCE",
    )
    model = InteractionRerankModel(cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, Lq, dim)), jnp.bfloat16)
    d = jnp.asarray(rng.normal(size=(K, Ld, dim)), jnp.bfloat16)
    qm = jnp.ones((1, Lq), jnp.int32)
    dm = jnp.ones((K, Ld), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), q, d, K - 1, qm, dm)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    qB = jnp.tile(q, (B, 1, 1))
    dB = jnp.tile(d, (B, 1, 1, 1))  # [B, K, Ld, dim] — one scan step per query
    qmB, dmB = jnp.tile(qm, (B, 1)), jnp.tile(dm, (B, 1, 1))

    @partial(jax.jit, static_argnames="iters")
    def chain(iters):
        def body(carry, _):
            def per_query(qc, xs):
                di, qi, dmi = xs
                out = model.apply({"params": params}, qi[None] + qc, di,
                                  K - 1, qmB[:1], dmi)
                return qc, out.logits.reshape(K)

            _, logits = jax.lax.scan(per_query, carry, (dB, qB, dmB))
            carry = carry + (logits.sum() * 1e-12).astype(jnp.bfloat16)
            return carry, logits[0, 0]

        _, ls = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=iters)
        return ls[-1]

    dt = _slope_timed(chain)
    return B * K / dt


def bench_blip2_decoder_int8():
    """monoBLIP-2 Flan-T5 through the W8A8 int8-MXU serving path
    (`ops/quant.py`, `T5Config.quantize_int8`) — same program as the bf16
    run below on the v5e's double-rate s8xs8->s32 MXU path.
    Rank-faithfulness is pinned by tests/test_quant.py and the trained
    synth-checkpoint artifacts."""
    return bench_blip2_decoder(quantize_int8=True)


def bench_blip2_decoder(quantize_int8: bool = False):
    """monoBLIP-2 Flan-T5 (decoder reranker) throughput — the reference's
    slowest but best reranker: 9.52 s/query for 100 docs on A100 (BASELINE.md;
    `src/models/rerank/decoder_rerank_model.py:81-159`, backbone
    Salesforce/blip2-flan-t5-xl). Full model scale: ViT-g vision encoder,
    BERT-base Q-Former, Flan-T5-XL text (d_model 2048, 24+24 layers). The
    vision+Q-Former prefix is computed once per image and broadcast over the
    100 candidates; the [K, 512] prompt batch runs as a lax.scan over
    fixed-size chunks. Zero-valued bf16 params (same FLOPs/bytes as bridged
    weights; throughput only).

    The single-token decode uses the cross-attention associativity reorder
    (`models/t5.py::T5Attention`, Lq=1 path): pooling encoder states before
    the K/V projections removes ~22 TFLOP of the ~156 TFLOP per-query budget
    — measured 98.8 → 112.5 cand/s (10.7x A100) on v5e."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.blip2 import (
        Blip2Config, Blip2VisionConfig, Blip2QFormerConfig,
    )
    from reranking_multimodal_retrievers_tpu.models.t5 import T5Config
    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        Blip2DecoderRerankModel, Blip2RerankConfig,
    )

    K, L = 100, 512
    CHUNK = int(os.environ.get("BENCH_BLIP2_CHUNK", "10"))
    if K % CHUNK:
        raise ValueError(f"BENCH_BLIP2_CHUNK={CHUNK} must divide K={K}")
    t5_xl = T5Config(d_model=2048, d_kv=64, d_ff=5120, num_layers=24,
                     num_decoder_layers=24, num_heads=32,
                     # fused VMEM-resident attention for the XL encoder —
                     # the [CHUNK, 32, 544, 544] fp32 score tensors (the HBM
                     # bottleneck of this family) never materialize
                     use_pallas_attention=os.environ.get(
                         "BENCH_PALLAS_ATTN", "1") == "1",
                     position_bias_bf16=os.environ.get(
                         "BENCH_POSBIAS_BF16", "1") == "1",
                     quantize_int8=quantize_int8)
    cfg = Blip2RerankConfig(
        blip2=Blip2Config(
            vision_config=Blip2VisionConfig(),
            qformer_config=Blip2QFormerConfig(),
            text_config=t5_xl,
            num_query_tokens=32,
        )
    )
    model = Blip2DecoderRerankModel(cfg)
    rng = np.random.default_rng(0)
    ids_small = jnp.asarray(rng.integers(10, 30000, size=(2, L)), jnp.int32)
    am_small = jnp.ones((2, L), jnp.int32)
    pix = jnp.asarray(rng.normal(size=(1, 3, 224, 224)), jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids_small, am_small,
                           pix.astype(jnp.float32), num_negative_examples=1)
    )["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes,
    )

    ids = jnp.asarray(rng.integers(10, 30000, size=(K, L)), jnp.int32)
    am = jnp.ones((K, L), jnp.int32)

    # two programs only: the vision+Q-Former prefix (once per image) and one
    # full 100-candidate rerank (scan over CHUNK-row slices of the XL text
    # stack). Iterations loop on the host — the ~27 ms tunnel round-trip is
    # <2% of one 100-candidate XL rerank, so no slope chain is needed; a
    # carry fed back in keeps iterations data-dependent.
    @jax.jit
    def prefix_fn(params, pix):
        return model.apply({"params": params}, pix,
                           method=Blip2DecoderRerankModel.encode_vision)

    from reranking_multimodal_retrievers_tpu.models.blip2 import (
        Blip2ForConditionalGeneration,
    )

    blip2 = Blip2ForConditionalGeneration(cfg.blip2)

    @jax.jit
    def rerank100(params, prefix, carry):
        """Scan the XL *encoder* over CHUNK-row slices (the [rows, 544]
        activations bound HBM), then decode ALL K candidates in one pass —
        the 24-layer decoder + lm_head weights stream from HBM once per
        rerank instead of once per chunk."""
        p = params["model"]
        prefix_c = jnp.tile(prefix, (CHUNK, 1, 1))

        def enc_chunk(c, xs):
            ci, cam = xs
            enc, mask = blip2.apply(
                {"params": p}, ci + c, cam,
                method=Blip2ForConditionalGeneration.encode_for_generation,
                vision_prefix=prefix_c,
            )
            return c, (enc, mask)

        _, (encs, masks) = jax.lax.scan(
            enc_chunk, carry,
            (ids.reshape(-1, CHUNK, L), am.reshape(-1, CHUNK, L)),
        )
        Lp = encs.shape[-2]
        enc_all = encs.reshape(K, Lp, -1)
        mask_all = masks.reshape(K, Lp)
        dec_in = jnp.full((K, 1), t5_xl.decoder_start_token_id, jnp.int32)
        logits = blip2.apply(
            {"params": p}, dec_in, enc_all, mask_all,
            method=Blip2ForConditionalGeneration.decode_logits,
        )
        first = logits[:, 0, :].astype(jnp.float32)
        yes = first[:, 4273]
        no = first[:, 150]
        p_yes = jax.nn.softmax(jnp.stack([yes, no], axis=-1), axis=-1)[:, 0]
        return (p_yes.sum() * 1e-12).astype(jnp.int32)

    prefix = prefix_fn(params, pix)
    carry = rerank100(params, prefix, jnp.zeros((), jnp.int32))  # compile
    int(carry)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry
        for _ in range(2):
            c = rerank100(params, prefix, c)
        int(c)  # device→host sync (block_until_ready lies on the tunnel)
        best = min(best, (time.perf_counter() - t0) / 2)
    return K / best


def bench_blip2_opt_int8():
    """monoBLIP2-Opt through the W8A8 int8-MXU serving path
    (`ops/quant.py`, `OPTConfig.quantize_int8`). The bf16 run below measures
    ~87% of the chip's bf16 peak — compute-bound — so the v5e's double-rate
    s8xs8->s32 MXU path is the remaining lever. Rank-faithfulness of the
    quantized scoring pass is pinned by tests/test_quant.py."""
    return bench_blip2_opt(quantize_int8=True)


def bench_blip2_opt(quantize_int8: bool = False):
    """monoBLIP2-Opt (decoder-only reranker) throughput — the reference's
    BEST reranker (OK-VQA R@5 0.40) and its slowest: 12.64 s/query for 100
    docs on A100 (BASELINE.md; backbone Salesforce/blip2-opt-2.7b,
    `monoBLIP2-Opt_pointwise.jsonnet:115`). Full model scale: ViT-g vision,
    BERT-base Q-Former, OPT-2.7b (hidden 2560, 32 layers). The vision prefix
    is computed once per image and broadcast over the 100 candidates; the
    [K, 512] prompt batch scans the OPT stack in fixed-size row chunks;
    hidden states are gathered at each row's final prompt position and ONLY
    those rows are projected through the 50k-vocab head (identical yes/no
    logits, `models/rerankers/decoder.py`). Zero-valued bf16 params (same
    FLOPs/bytes as bridged weights; throughput only).

    Roofline: one 100-candidate rerank is ~288 TFLOP (32 layers x 544 tokens
    x 100 rows x 157 MFLOP/token/layer of matmul + ~13 TFLOP attention), so
    the measured ~59 cand/s = ~172 effective TFLOPS ~ 87% of the v5e's ~197
    TFLOPS bf16 peak. 10x the A100 baseline (79 cand/s) would need 228
    TFLOPS — above chip peak — so ~7.5x IS speed-of-light for this family
    at bf16; the A100 reference runs the same math at ~22 TFLOPS (7% util)."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.blip2 import (
        Blip2Config, Blip2VisionConfig, Blip2QFormerConfig,
        Blip2ForConditionalGeneration,
    )
    from reranking_multimodal_retrievers_tpu.models.opt import OPTConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        Blip2DecoderRerankModel, Blip2RerankConfig,
    )

    K, L = 100, 512
    # chunk sweep on v5e: 5 → 59.7, 10 → 57.6, 20 → 56.7 cand/s
    CHUNK = int(os.environ.get("BENCH_OPT_CHUNK", "5"))
    if K % CHUNK:
        raise ValueError(f"BENCH_OPT_CHUNK={CHUNK} must divide K={K}")
    # causal Pallas attention: scores stay in VMEM, the mask is synthesized
    # in-register (ops/attention_pallas.py `causal=True`)
    opt_cfg = OPTConfig.opt_2_7b(
        use_pallas_attention=os.environ.get("BENCH_PALLAS_ATTN", "1") == "1",
        quantize_int8=quantize_int8)
    cfg = Blip2RerankConfig(
        blip2=Blip2Config(
            vision_config=Blip2VisionConfig(),
            qformer_config=Blip2QFormerConfig(),
            text_config=opt_cfg,
            num_query_tokens=32,
        )
    )
    model = Blip2DecoderRerankModel(cfg)
    rng = np.random.default_rng(0)
    ids_small = jnp.asarray(rng.integers(10, 50000, size=(2, 16)), jnp.int32)
    am_small = jnp.ones((2, 16), jnp.int32)
    pix_f32 = jnp.zeros((1, 3, 224, 224), jnp.float32)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids_small, am_small,
                           pix_f32, num_negative_examples=1)
    )["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes,
    )
    pix = pix_f32.astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(10, 50000, size=(K, L)), jnp.int32)
    am = jnp.ones((K, L), jnp.int32)

    blip2 = Blip2ForConditionalGeneration(cfg.blip2)

    @jax.jit
    def prefix_fn(params, pix):
        return model.apply({"params": params}, pix,
                           method=Blip2DecoderRerankModel.encode_vision)

    @jax.jit
    def rerank100(params, prefix, carry):
        p = params["model"]
        prefix_c = jnp.tile(prefix, (CHUNK, 1, 1))

        def chunk(c, xs):
            ci, cam = xs
            rel = blip2.apply(
                {"params": p}, ci + c, cam,
                method=Blip2ForConditionalGeneration.causal_last_hidden,
                vision_prefix=prefix_c,
            )
            return c, rel

        _, rels = jax.lax.scan(
            chunk, carry,
            (ids.reshape(-1, CHUNK, L), am.reshape(-1, CHUNK, L)),
        )
        rel_all = rels.reshape(K, 1, -1)
        logits = blip2.apply(
            {"params": p}, rel_all,
            method=lambda m, h: m.language_model.lm_logits(h),
        )[:, 0, :].astype(jnp.float32)
        yes, no = logits[:, 4763], logits[:, 117]  # OPT-BPE ids for yes/no
        p_yes = jax.nn.softmax(jnp.stack([yes, no], axis=-1), axis=-1)[:, 0]
        return (p_yes.sum() * 1e-12).astype(jnp.int32)

    prefix = prefix_fn(params, pix)
    carry = rerank100(params, prefix, jnp.zeros((), jnp.int32))
    int(carry)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry
        for _ in range(2):
            c = rerank100(params, prefix, c)
        int(c)  # device→host sync (block_until_ready lies on the tunnel)
        best = min(best, (time.perf_counter() - t0) / 2)
    return K / best


def bench_maxsim_kernel():
    """Secondary artifact: fused Pallas MaxSim TFLOPS on the real chip
    (stderr only — the driver's headline line stays the rerank metric)."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import (
        run_maxsim_benchmark,
    )

    return run_maxsim_benchmark()


def bench_retrieval():
    """Full-corpus exact retrieval throughput (queries/s/chip): top-100 exact
    MaxSim over an OKVQA-scale HBM-resident token index — the engine that
    replaces the reference's PLAID stack (IVF + residual codec + 4 native
    kernels, `colbert/search/index_storage.py:86-184`), which it runs
    *query-by-query* (`colbert/searcher.py:82-96`). No recorded reference
    latency exists for that path, so the line reports absolute QPS only.

    Corpus: 100k docs × 256 tokens × dim 128 bf16 (6.55 GB HBM), queries
    96 tokens (PreFLMR text+vision budget). The index is generated directly
    on-device (a 6.5 GB host transfer through the tunnel would dominate).

    Roofline (measured on v5e): scoring one 128-query batch is
    2·B·Lq·N·Ld·dim = 80.5 TFLOP; the measured ~540 ms/batch = ~150
    effective TFLOPS ≈ 76% of the ~197 TFLOPS bf16 peak, so the scan is
    MXU-bound — NOT HBM-bound (the 6.55 GB index streams once per 16-query
    tile, ~52 GB/batch = ~64 ms at 819 GB/s, fully overlapped) and not
    top-k-bound (lax.top_k overlaps to <1 ms net). Query batching is the
    lever that got here: at B=32 a ~63 ms fixed cost (dispatch + final
    top-k + tunnel sync) is 33% of the batch, capping QPS at 167; B=128
    amortizes it. Speed-of-light at 100% MXU would be ~313 q/s. The corpus
    is fixed-length (no padding), so ``unpadded=True`` skips the mask pass
    exactly; `_local_search(score_dtype=bfloat16)` buys ~4% more at ~0.4%
    score error (top-100 overlap vs exact: 1.000 measured) — left off here
    to keep the headline exact."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.engine.search import make_search_fn

    N = int(os.environ.get("BENCH_RETR_N", 100_000))
    Ld, Lq, dim, B, k = 256, 96, 128, int(os.environ.get("BENCH_RETR_B", 128)), 100

    @jax.jit
    def build(key):
        D = jax.random.normal(key, (N, Ld, dim), jnp.bfloat16)
        D = D / jnp.linalg.norm(D.astype(jnp.float32), axis=-1,
                                keepdims=True).astype(jnp.bfloat16)
        return D

    key = jax.random.PRNGKey(0)
    D = build(key)
    M = jnp.ones((N, Ld), bool)
    Q = jax.random.normal(jax.random.PRNGKey(1), (B, Lq, dim), jnp.bfloat16)

    search = make_search_fn(mesh=None, n_padded_docs=N, k=k, unpadded=True)

    @jax.jit
    def chain(Q, D, M):
        vals, idx = search(Q, D, M)
        # data-dependent perturbation so repeated calls can't be CSE'd
        return vals, Q + (vals.sum() * 1e-12).astype(Q.dtype)

    vals, Qn = chain(Q, D, M)
    float(vals[0, 0])  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v2, Qn = chain(Qn, D, M)
        float(v2[0, 0])  # device→host sync (tunnel-safe fence)
        best = min(best, time.perf_counter() - t0)
    return B / best


def bench_retrieval_int8():
    """Exact retrieval over an int8 QuantizedTokenIndex (same 100k×256 corpus
    and query batch as ``bench_retrieval``). The bf16 scan is MXU-bound at
    ~76% of peak; the int8 path (`ops/maxsim_pallas.maxsim_scores_pallas_int8`)
    runs the same contraction on the MXU's double-rate s8×s8→s32 path with
    every rescale folded AFTER the token-max (per-doc scales), so the big
    score block stays int32 — the VPU passes get cheaper too. Ranking
    faithfulness vs the fp32 scan is pinned by tests/test_quantized_index.py.
    Index HBM: 3.3 GB vs 6.55 GB bf16."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.engine.search import (
        make_search_fn_int8,
    )

    N = int(os.environ.get("BENCH_RETR_N", 100_000))
    Ld, Lq, dim, B, k = 256, 96, 128, int(os.environ.get("BENCH_RETR_B", 128)), 100

    @jax.jit
    def build(key):
        D = jax.random.normal(key, (N, Ld, dim), jnp.bfloat16)
        D = D / jnp.linalg.norm(D.astype(jnp.float32), axis=-1,
                                keepdims=True).astype(jnp.bfloat16)
        amax = jnp.max(jnp.abs(D.astype(jnp.float32)), axis=(1, 2))
        scales = jnp.maximum(amax, 1e-8) / 127.0
        codes = jnp.clip(
            jnp.round(D.astype(jnp.float32) / scales[:, None, None]),
            -127, 127).astype(jnp.int8)
        return codes, scales

    codes, scales = build(jax.random.PRNGKey(0))
    M = jnp.ones((N, Ld), bool)
    Q = jax.random.normal(jax.random.PRNGKey(1), (B, Lq, dim), jnp.float32)

    search = make_search_fn_int8(mesh=None, n_padded_docs=N, k=k,
                                 unpadded=True)

    @jax.jit
    def chain(Q, codes, scales, M):
        vals, idx = search(Q, codes, scales, M)
        return vals, Q + (vals.sum() * 1e-12).astype(Q.dtype)

    vals, Qn = chain(Q, codes, scales, M)
    float(vals[0, 0])  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v2, Qn = chain(Qn, codes, scales, M)
        float(v2[0, 0])
        best = min(best, time.perf_counter() - t0)
    return B / best


def bench_train_step():
    """Contrastive FLMR training throughput at full model scale (steps/s →
    examples/s) — the reference's hot training loop
    (`FLMR_base_executor.py:407-464`): BERT-base text encoder + ViT-B/32
    vision + transformer mapping network, dim-128 late interaction, frozen
    vision tower (the reference's PreFLMR recipe), AdamW, in-batch negatives
    over the global batch. Also reports XLA's own FLOP estimate / wall-clock
    as achieved TFLOPS (stderr)."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models import (
        FLMRConfig, FLMRModelForRetrieval,
    )
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig
    from reranking_multimodal_retrievers_tpu.training import (
        TrainState, make_optimizer, make_train_step,
    )

    B = int(os.environ.get("BENCH_TRAIN_B", 16))
    nway, Lq, Ld, img = 2, 32, 256, 224
    cfg = FLMRConfig(
        text_config=BertConfig(),
        vision_config=CLIPVisionConfig(),
        dim=128,
        mapping_network_prefix_length=32,
        use_transformer_mapping_network=True,
        transformer_mapping_num_hidden_layers=1,
    )
    model = FLMRModelForRetrieval(cfg)
    rng = np.random.default_rng(0)
    batch = dict(
        query_input_ids=jnp.asarray(
            rng.integers(1000, 29000, size=(B, Lq)), jnp.int32),
        query_attention_mask=jnp.ones((B, Lq), jnp.int32),
        query_pixel_values=jnp.asarray(
            rng.normal(size=(B, 3, img, img)), jnp.float32),
        context_input_ids=jnp.asarray(
            rng.integers(1000, 29000, size=(B * nway, Ld)), jnp.int32),
        context_attention_mask=jnp.ones((B * nway, Ld), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    tx, _ = make_optimizer(
        params, optimizer_name="AdamW", lr=1e-5, mapping_network_lr=1e-4,
        scheduler="linear", num_warmup_steps=10, num_training_steps=1000,
        frozen_patterns=("vision_encoder",),
        group_patterns=("vision_projection", "transformer_mapping"),
    )
    step = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx,
        loss_key="ib_loss")
    state = TrainState.create(params, tx)

    def run(iters):
        nonlocal state
        m = None
        for _ in range(iters):
            state, m = step(state, batch)
        return m["total_loss"]

    dt = _slope_timed(run, n_long=6, n_short=1, repeats=2)
    try:  # achieved TFLOPS from XLA's own cost model (fwd+bwd+adam)
        lowered = jax.jit(step).lower(state, batch)
        flops = lowered.compile().cost_analysis().get("flops", 0.0)
        if flops:
            print(json.dumps({
                "metric": "flmr_train_step_achieved_tflops",
                "value": round(flops / dt / 1e12, 1),
                "unit": "TFLOPS (XLA cost-model FLOPs / measured step time)",
            }), file=sys.stderr, flush=True)
    except Exception:
        pass
    return B / dt  # query examples (each with nway docs) per second


def bench_plaid():
    """Compressed (PLAID-role) two-stage retrieval, measured (VERDICT r2 #6):
    the `engine/plaid.py` path on the same 100k×256 corpus as
    ``bench_retrieval`` — q/s, index HBM bytes vs the bf16 exact index, and
    top-100 recall against the exact scan (the reference's
    `index_storage.py:86-184` role). Emits the HBM/recall line on stderr."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.engine.codec import compress
    from reranking_multimodal_retrievers_tpu.engine.plaid import (
        CompressedSearcher,
    )
    from reranking_multimodal_retrievers_tpu.engine.search import make_search_fn

    # 25k-doc measured point by default (VERDICT r4 next-step #1: the 100k
    # point's host-side compress + 6.55 GiB device->host pull blew the
    # driver's kill window two rounds running; the kernels are corpus-size-
    # independent, so a smaller measured point + the scaling note in the
    # unit string beats another rc=124). BENCH_PLAID_N=100000 restores the
    # original point.
    N = int(os.environ.get("BENCH_PLAID_N", 25_000))
    Ld, Lq, dim, B, k = 256, 96, 128, int(os.environ.get("BENCH_RETR_B", 32)), 100

    @jax.jit
    def build(key):
        D = jax.random.normal(key, (N, Ld, dim), jnp.bfloat16)
        return D / jnp.linalg.norm(
            D.astype(jnp.float32), axis=-1, keepdims=True).astype(jnp.bfloat16)

    D = build(jax.random.PRNGKey(0))
    M = jnp.ones((N, Ld), bool)
    Q = jnp.asarray(np.random.default_rng(1).normal(size=(B, Lq, dim)),
                    jnp.float32)

    # exact ground truth (same corpus, in HBM)
    exact = make_search_fn(mesh=None, n_padded_docs=N, k=k, unpadded=True)
    _, idx_exact = exact(Q.astype(jnp.bfloat16), D, M)
    idx_exact = np.asarray(idx_exact)

    # At >=75k docs, compress from a HOST copy: keeping the 6.55 GB bf16
    # source in HBM while the chunked codec also materializes its 3.3 GB
    # residual output (plus the per-chunk list during concat) OOMs a 16 GB
    # v5e. At the default 25k point both fit, so compress straight from the
    # device array (no single-core host round-trip).
    if N >= 75_000:
        D_host = np.asarray(jax.device_get(D), np.float32).astype(np.float16)
        D.delete()
        cidx = compress(D_host, np.ones((N, Ld), bool),
                        [str(i) for i in range(N)])
        del D_host
    else:
        cidx = compress(D, np.ones((N, Ld), bool),
                        [str(i) for i in range(N)])
        D.delete()
    bf16_bytes = N * Ld * dim * 2
    ratio = bf16_bytes / cidx.nbytes()

    searcher = CompressedSearcher(cidx, k=k, n_candidates=1024)
    vals, ids = searcher.search(Q)  # compile
    recall = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(ids, idx_exact)
    ]))
    print(json.dumps({
        "metric": "compressed_index_hbm_and_recall",
        "value": round(ratio, 2),
        "unit": (f"× HBM saving vs bf16 exact index ({cidx.nbytes()/2**30:.2f}"
                 f" vs {bf16_bytes/2**30:.2f} GiB, {N//1000}k docs); top-100"
                 f" recall vs exact = {recall:.4f} (n_candidates=1024)"),
    }), file=sys.stderr, flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v2, _ = searcher.search(Q)
        best = min(best, time.perf_counter() - t0)
    return B / best


def bench_streaming_int8():
    """Beyond-HBM exact retrieval (VERDICT r2 #3): an int8 host-RAM token
    index streamed slab-by-slab regardless of size (1.3 GiB at the default
    40k-doc point on this slow tunnel; 32.8 GiB at BENCH_STREAM_N=1000000)
    through HBM in double-buffered slabs (`engine/streaming.py`), exact cross-slab
    top-k. Transfer-bound by physics: the full index crosses the host link
    once per query batch, so q/s ≈ link_GB/s / index_GB × batch — the
    measured number exposes this host link's real bandwidth. Streamed
    results are pinned bit-identical to the in-HBM scan
    (tests/test_streaming.py + the 40k-doc real-chip check)."""
    import jax

    from reranking_multimodal_retrievers_tpu.engine.streaming import (
        HostQuantizedTokenIndex, StreamingSearcher,
    )

    # 40k-doc measured point by default (VERDICT r4 next-step #1): the path
    # is transfer-bound, so the companion GiB/s line is corpus-size-
    # independent and the 1M/32.8-GiB q/s is derived from it in the unit
    # string. The first captured run (round 5) measured THIS tunnel's
    # host->HBM link at 0.02 GiB/s — a 250k-doc (7.6 GiB) pass took 434.6 s
    # and the row 1161 s, which is why the 1M point blew the driver window
    # for four rounds; at 40k (1.3 GiB) the row fits in ~2-3 min on this
    # link while exercising the identical double-buffered slab pipeline.
    # BENCH_STREAM_N=1000000 restores the original point on real hosts
    # (PCIe ~3 orders faster than this tunnel; q/s scales linearly).
    N = int(os.environ.get("BENCH_STREAM_N", 40_000))
    Ld, Lq, dim, B, k = 256, 96, 128, int(os.environ.get("BENCH_STREAM_B", 256)), 100
    slab = 16384
    rng = np.random.default_rng(0)
    # one random slab tiled across the corpus: scoring cost is
    # value-independent and every slab still crosses the host link
    block = rng.integers(-127, 128, size=(slab, Ld, dim)).astype(np.int8)
    reps = -(-N // slab)
    codes = np.broadcast_to(block, (reps, slab, Ld, dim)).reshape(
        reps * slab, Ld, dim)[:N]
    codes = np.ascontiguousarray(codes)  # real host pages, not a view
    scales = (rng.random(N).astype(np.float32) + 0.5) / 127.0
    host = HostQuantizedTokenIndex(codes=codes, scales=scales, mask=None,
                                   doc_ids=None)
    Q = rng.normal(size=(B, Lq, dim)).astype(np.float32)
    searcher = StreamingSearcher(host, k=k, slab_docs=slab)
    searcher.search(Q[:8])  # compile both slab programs + merge
    t0 = time.perf_counter()
    vals, idx = searcher.search(Q)
    dt = time.perf_counter() - t0
    gbps = codes.nbytes / dt / 2**30
    qps_1m = gbps / (1_000_000 * Ld * dim / 2**30) * B
    print(json.dumps({
        "metric": "streaming_retrieval_host_link_gbps",
        "value": round(gbps, 2),
        "unit": (f"GiB/s sustained host->HBM during the {N//1000}k-doc"
                 f" streamed scan ({codes.nbytes/2**30:.1f} GiB int8 index,"
                 f" {dt:.1f}s/batch); size-independent (transfer-bound) =>"
                 f" derived 1M-doc/32.8-GiB q/s at this link = {qps_1m:.1f}"),
    }), file=sys.stderr, flush=True)
    return B / dt


def _enable_compile_cache():
    """Persistent XLA compilation cache for the TPU programs (VERDICT r3
    weak #1: BENCH_r03 was killed because the axon tunnel's remote compile
    service was cold and the headline alone blew the budget — the test suite
    solved the same problem with a disk cache in tests/conftest.py; this is
    the same fix, in a separate directory because the TPU executables differ
    from the CPU ones the tests produce)."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "cache",
        "jax_compile_cache_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():

    _enable_compile_cache()
    t_start = time.perf_counter()
    cand_per_sec = bench_rerank()
    # the headline line prints FIRST (stdout) so a driver timeout during the
    # optional secondary benches can never lose it
    print(
        json.dumps(
            {
                "metric": "monoPreFLMR_B_rerank_candidates_per_sec",
                "value": round(cand_per_sec, 1),
                "unit": "candidates/s/chip (full-size monoPreFLMR-B cross-encoder, 100-doc rerank, bf16)",
                "vs_baseline": round(cand_per_sec / A100_BASELINE_CAND_PER_SEC, 2),
            }
        ),
        flush=True,
    )
    print(f"[bench] headline: {time.perf_counter() - t_start:.1f}s",
          file=sys.stderr, flush=True)
    # Secondary per-family lines (stderr — the driver's headline stays the
    # monoPreFLMR-B metric). Each is optional and individually fused.
    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        # Row order (VERDICT r3 weak #1 / r4 next-step #1): rows whose
        # numbers have never been captured in any BENCH_r*.json run FIRST,
        # directly after the headline. BENCH_FULL=1 adds the re-measurement
        # group (rows already captured in r1/r2/r4); the DEFAULT run is now
        # headline + the never-captured pair only, sized to finish well
        # inside the driver's kill window even with a cold compile service
        # (two consecutive rc=124 rounds proved the 13-row sweep does not
        # fit).
        full = os.environ.get("BENCH_FULL", "0") == "1"
        plaid_n = int(os.environ.get("BENCH_PLAID_N", 25_000))
        stream_n = int(os.environ.get("BENCH_STREAM_N", 40_000))
        rows = [
            (f"compressed_retrieval_queries_per_sec_{plaid_n//1000}k_corpus",
             bench_plaid, None, 1500),
            (f"streaming_retrieval_{stream_n//1000}k_int8_queries_per_sec",
             bench_streaming_int8, None, 2100),
        ]
        if full:
            rows += [
                ("monoPreFLMR_L_rerank_candidates_per_sec",
                 bench_rerank_L, 100 / 2.58, 2700),
                ("flmr_train_examples_per_sec", bench_train_step, None, 3300),
                ("pallas_maxsim_tflops", bench_maxsim_kernel, None, 3600),
                ("exact_retrieval_queries_per_sec_100k_corpus",
                 bench_retrieval, None, 3900),
                ("exact_retrieval_int8_queries_per_sec_100k_corpus",
                 bench_retrieval_int8, None, 4200),
                ("ModPreFLMR_BERT_interaction_rerank_candidates_per_sec",
                 bench_interaction, 100 / 0.24, 4500),
                ("monoPreFLMR_B_int8_rerank_candidates_per_sec",
                 bench_rerank_int8, A100_BASELINE_CAND_PER_SEC, 4800),
                ("monoBLIP2_FlanT5XL_rerank_candidates_per_sec",
                 bench_blip2_decoder, 100 / 9.52, 5200),
                ("monoBLIP2_Opt2.7b_rerank_candidates_per_sec",
                 bench_blip2_opt, 100 / 12.64, 5600),
                ("monoBLIP2_Opt2.7b_int8_rerank_candidates_per_sec",
                 bench_blip2_opt_int8, 100 / 12.64, 6000),
                ("monoBLIP2_FlanT5XL_int8_rerank_candidates_per_sec",
                 bench_blip2_decoder_int8, 100 / 9.52, 6400),
            ]
        for name, fn, a100, budget_s in rows:
            if time.perf_counter() - t_start > budget_s:
                print(f"{name} skipped: bench time budget", file=sys.stderr)
                continue
            t_row = time.perf_counter()
            try:
                val = fn()
                line = {"metric": name, "value": round(val, 1)}
                if name == "pallas_maxsim_tflops":
                    line["unit"] = "TFLOPS (fused MaxSim kernel, bf16, single v5e chip)"
                elif name.startswith("exact_retrieval"):
                    prec = "int8" if "int8" in name else "bf16"
                    line["unit"] = ("queries/s/chip (exact top-100 MaxSim, "
                                    f"100k docs x 256 tokens, {prec} HBM "
                                    "index)")
                elif name == "flmr_train_examples_per_sec":
                    line["unit"] = ("query examples/s/chip (contrastive FLMR "
                                    "train step, BERT-base + ViT-B/32 + "
                                    "mapping network, 2-way docs x 256 tok, "
                                    "AdamW)")
                elif name.startswith("compressed_retrieval"):
                    line["unit"] = ("queries/s/chip (two-stage compressed "
                                    f"PLAID-role search, {plaid_n//1000}k "
                                    "docs x 256 tokens — HBM/recall on the "
                                    "companion stderr line; kernels are "
                                    "corpus-size-independent)")
                elif name.startswith("streaming_retrieval"):
                    line["unit"] = ("queries/s/chip (EXACT top-100 over a "
                                    f"{stream_n//1000}k-doc x 256-token int8 "
                                    "HOST-RAM index streamed through HBM — "
                                    "transfer-bound; companion line reports "
                                    "the host link GiB/s and the derived "
                                    "1M-doc q/s)")
                else:
                    prec = "int8 W8A8" if "int8" in name else "bf16"
                    line["unit"] = f"candidates/s/chip (full model scale, {prec})"
                    line["vs_baseline"] = round(val / a100, 2)
                print(json.dumps(line), file=sys.stderr, flush=True)
                print(f"[bench] {name}: {time.perf_counter() - t_row:.1f}s "
                      f"(elapsed {time.perf_counter() - t_start:.1f}s)",
                      file=sys.stderr, flush=True)
            except Exception as e:  # secondary must never sink the headline
                # clear the traceback's frame references FIRST: a row that
                # OOMs otherwise keeps its device arrays alive through the
                # exception object and every later row inherits a full HBM
                # (observed: one plaid-row ResourceExhausted cascaded into
                # 9 downstream skips)
                import traceback as _tb
                _tb.clear_frames(e.__traceback__)
                print(f"{name} skipped after "
                      f"{time.perf_counter() - t_row:.1f}s: {e}",
                      file=sys.stderr)
            finally:
                # hard-free whatever the row left on device: rows are
                # self-contained, so any surviving jax.Array is a leak.
                # INVARIANT (advisor r4): no state crosses rows — every row
                # rebuilds its own params/index/jitted fns. A future cached
                # cross-row executable whose captured constants get deleted
                # here would fail with 'Array has been deleted'; keep rows
                # self-contained or snapshot live arrays before the row and
                # delete only the delta.
                import gc
                import jax as _jax
                gc.collect()
                for _a in _jax.live_arrays():
                    _a.delete()
                gc.collect()


if __name__ == "__main__":
    main()
