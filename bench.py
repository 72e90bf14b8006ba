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
import sys
import time
from functools import partial

import numpy as np

A100_BASELINE_CAND_PER_SEC = 100 / 1.40  # monoPreFLMR-B, BASELINE.md


def bench_rerank():
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

    import os

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
                   gelu_approximate=gelu_tanh, use_pallas_attention=pallas_attn)
    flmr = FLMRConfig(
        text_config=BertConfig(**bert_kw),  # BERT-base
        vision_config=CLIPVisionConfig(),  # ViT-B/32
        dim=128,
        mapping_network_prefix_length=32,
        use_transformer_mapping_network=True,
        transformer_mapping_num_hidden_layers=1,
    )
    cfg = RerankConfig(
        flmr=flmr,
        cross_encoder=BertConfig(num_hidden_layers=1, max_position_embeddings=768,
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

    n_long, n_short = 4, 1
    float(rerank_chain(params, batch, pix, iters=n_short))  # compile
    float(rerank_chain(params, batch, pix, iters=n_long))

    def timed(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rerank_chain(params, batch, pix, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(n_long) - timed(n_short)) / (n_long - n_short)
    return B * K / dt


def bench_maxsim_kernel():
    """Secondary artifact: fused Pallas MaxSim TFLOPS on the real chip
    (stderr only — the driver's headline line stays the rerank metric)."""
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.ops.maxsim_pallas import (
        run_maxsim_benchmark,
    )

    return run_maxsim_benchmark()


def main():
    cand_per_sec = bench_rerank()
    try:
        tflops = bench_maxsim_kernel()
        print(
            json.dumps(
                {
                    "metric": "pallas_maxsim_tflops",
                    "value": round(tflops, 1),
                    "unit": "TFLOPS (fused MaxSim kernel, bf16, single v5e chip)",
                }
            ),
            file=sys.stderr,
        )
    except Exception as e:  # secondary metric must never sink the headline
        print(f"pallas maxsim bench skipped: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "monoPreFLMR_B_rerank_candidates_per_sec",
                "value": round(cand_per_sec, 1),
                "unit": "candidates/s/chip (full-size monoPreFLMR-B cross-encoder, 100-doc rerank, bf16)",
                "vs_baseline": round(cand_per_sec / A100_BASELINE_CAND_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
