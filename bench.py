"""Flagship benchmark. Prints ONE JSON line.

Current flagship: late-interaction reranking throughput — score each query's
top-100 candidate documents with exact MaxSim (the ModPreFLMR-IB reranker
workload: OK-VQA shapes, bf16, one batched program).

Baseline (BASELINE.md): ModPreFLMR IB reranks 100 docs in 0.13 s/query on an
A100 → 769 candidates/sec. ``vs_baseline`` is the speedup over that.

Timing methodology: the axon TPU tunnel acks ``block_until_ready`` before
device completion and has a ~27 ms host round-trip, so per-dispatch timing is
meaningless. We run the workload inside a dependency-chained ``lax.scan``
(each iteration's inputs depend on the previous result — overlap impossible)
and take the slope between a long and a short chain, which cancels both the
round-trip and the fixed dispatch cost.
"""

import json
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reranking_multimodal_retrievers_tpu.ops.maxsim import colbert_score

    rng = np.random.default_rng(0)
    B, K, L_q, L_d, dim = 32, 100, 128, 256, 128  # OK-VQA rerank shapes
    Q = jnp.asarray(rng.normal(size=(B, L_q, dim)), jnp.bfloat16)
    D = jnp.asarray(rng.normal(size=(B * K, L_d, dim)), jnp.bfloat16)
    lens = rng.integers(32, L_d + 1, size=B * K)
    mask = jnp.asarray(np.arange(L_d)[None] < lens[:, None])

    @partial(jax.jit, static_argnames="iters")
    def rerank_chain(Q, D, mask, iters):
        def body(carry, _):
            scores, _ = colbert_score(jnp.repeat(carry, K, axis=0), D, mask)
            vals, _ = jax.lax.top_k(scores.reshape(B, K), 5)
            # data dependency defeating any cross-iteration overlap
            carry = (carry + (vals.mean() * 1e-8).astype(jnp.float32)).astype(
                carry.dtype
            )
            return carry, vals
        _, vs = jax.lax.scan(body, Q, None, length=iters)
        return vs[-1, 0, 0].astype(jnp.float32)

    n_long, n_short = 21, 1
    float(rerank_chain(Q, D, mask, iters=n_short))  # compile
    float(rerank_chain(Q, D, mask, iters=n_long))

    def timed(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rerank_chain(Q, D, mask, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(n_long) - timed(n_short)) / (n_long - n_short)
    cand_per_sec = B * K / dt
    baseline = 100 / 0.13  # ModPreFLMR IB on A100, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "maxsim_rerank_candidates_per_sec",
                "value": round(cand_per_sec, 1),
                "unit": "candidates/s (100-doc MaxSim rerank, OK-VQA shapes, bf16)",
                "vs_baseline": round(cand_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
