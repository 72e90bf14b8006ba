"""Flagship benchmark. Prints ONE JSON line.

North star (BASELINE.json / BASELINE.md): the monoPreFLMR-B cross-encoder
rerank path — the reference reranks 100 docs in 1.40 s/query on an A100
(71.4 candidates/s). This benchmark runs the same workload at full model
size — BERT-base text encoder (12×768), ViT-B/32 vision encoder with the
transformer mapping network, dim-128 late interaction, 1-layer cross-encoder,
512-token joint sequences, 100 candidate docs per query — as ONE batched jit
program on the TPU, and reports candidates reranked per second per chip.

Timing: the axon TPU tunnel acks ``block_until_ready`` before completion and
costs ~27 ms per host round-trip, so the workload runs inside a
dependency-chained ``lax.scan`` and the (long − short)/(n−1) slope cancels
both artifacts.
"""

import json
import time
from functools import partial

import numpy as np

A100_BASELINE_CAND_PER_SEC = 100 / 1.40  # monoPreFLMR-B, BASELINE.md


def main():
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig
    from reranking_multimodal_retrievers_tpu.models.flmr import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.rerankers import (
        FullContextRerankModel,
        RerankConfig,
    )

    B, K, L = 4, 100, 512  # queries per batch, docs per query, joint seq len
    flmr = FLMRConfig(
        text_config=BertConfig(),  # BERT-base
        vision_config=CLIPVisionConfig(),  # ViT-B/32
        dim=128,
        mapping_network_prefix_length=32,
        use_transformer_mapping_network=True,
        transformer_mapping_num_hidden_layers=1,
    )
    cfg = RerankConfig(
        flmr=flmr,
        cross_encoder=BertConfig(num_hidden_layers=1, max_position_embeddings=768),
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
    params = model.init(jax.random.PRNGKey(0), **batch, num_negative_examples=K - 1)
    # production precision: bf16 params (MXU-native), fp32 accumulation inside
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    @partial(jax.jit, static_argnames="iters")
    def rerank_chain(params, batch, iters):
        def body(pix, _):
            out = model.apply(
                params, batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"], pix,
                num_negative_examples=K - 1,
            )
            logits = out.logits.reshape(B, K)
            pix = pix + (logits.mean() * 1e-8).astype(pix.dtype)
            return pix, logits[0, 0]
        _, ls = jax.lax.scan(body, batch["query_pixel_values"], None, length=iters)
        return ls[-1]

    n_long, n_short = 4, 1
    float(rerank_chain(params, batch, iters=n_short))  # compile
    float(rerank_chain(params, batch, iters=n_long))

    def timed(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rerank_chain(params, batch, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(n_long) - timed(n_short)) / (n_long - n_short)
    cand_per_sec = B * K / dt
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
