"""Int8 quantized matmuls for the MXU's double-rate integer path.

The v5e MXU runs s8×s8→s32 at ~2× its bf16 FLOP rate, which is the only
lever left for the compute-roofline-bound monoBLIP2-Opt reranker (bench.py
``bench_blip2_opt`` measures ~87% bf16 MXU utilization — 10× the A100
baseline needs more bf16 FLOPs/s than the chip has; reference latency row:
`plots.ipynb` cells 15-16, monoBLIP2-Opt 12.64 s/query).

Scheme (W8A8, the standard dynamic-per-token recipe):

- weights: symmetric per-output-channel int8 (scale = amax/127 per column),
  quantized from the checkpoint dtype on the fly — the parameter tree stays
  identical to the bf16 path, so bridged checkpoints load unchanged and XLA
  hoists the (tiny, bandwidth-trivial) weight-quantization pass out of the
  per-call critical path where it can;
- activations: symmetric per-row (per-token) dynamic int8 — robust where
  per-tensor static scales are not (OPT-family models develop activation
  outliers at ≥2.7b; dynamic per-token quantization is the SmoothQuant /
  LLM.int8() baseline that keeps them rank-faithful);
- accumulation: int32 on the MXU (``preferred_element_type``), rescaled to
  fp32 by the outer product of the two scale vectors. int32 cannot overflow
  for any contraction here: 127·127·K stays below 2³¹ up to K ≈ 133k, far
  above the largest in-dim (10240);
- gradients: straight-through (``jax.custom_vjp``) — the backward pass is
  the exact fp matmul cotangent, so a ``quantize_int8`` model is also
  *trainable* (quantization-aware training) instead of silently dead
  (``round``/``clip`` otherwise have zero gradient into every kernel).

Non-matmul ops (layernorm, softmax, residuals, attention) stay bf16: they
carry <5% of the FLOPs at opt-2.7b scale and all of the numerical risk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row int8 over the LAST axis.

    Returns ``(q, scale)`` with ``q`` int8 of ``x.shape`` and ``scale``
    fp32 of ``x.shape[:-1] + (1,)`` such that ``q * scale ≈ x``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel int8 for a ``[in, out]`` kernel.

    Returns ``(q, scale)`` with ``scale`` fp32 ``[1, out]``.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@jax.custom_vjp
def int8_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``x @ w`` through the int8 MXU path; fp32 result.

    ``x``: ``[..., in]`` (any float dtype), ``w``: ``[in, out]``. Both sides
    are quantized here (dynamic per-row / per-column); the dot accumulates
    int32 and the result is rescaled by ``row_scale ⊗ col_scale``. The
    gradient is straight-through: the exact fp cotangent of ``x @ w``.
    """
    xq, xs = quantize_rows(x)
    wq, ws = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # ws squeezed to [out] so the broadcast is rank-preserving for 1D x too
    return acc.astype(jnp.float32) * xs * ws[0]


def _int8_dot_fwd(x, w):
    return int8_dot(x, w), (x, w)


def _int8_dot_bwd(res, g):
    x, w = res
    g32 = g.astype(jnp.float32)
    dx = jax.lax.dot_general(
        g32, w.astype(jnp.float32),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
    )
    dw = jnp.einsum(
        "bi,bo->io",
        x.astype(jnp.float32).reshape(-1, x.shape[-1]),
        g32.reshape(-1, g.shape[-1]),
    )
    return dx.astype(x.dtype), dw.astype(w.dtype)


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` that runs its matmul W8A8 on the MXU.

    The parameter tree (``kernel``/``bias``, same shapes and initializers)
    is identical to ``nn.Dense``, so a checkpoint trained or bridged through
    the bf16 path restores into the quantized module unchanged — int8 is a
    serving-time execution mode, not a storage format. Output dtype follows
    ``nn.Dense(dtype=None)``'s promotion (input ∨ params), and the
    straight-through gradient keeps the module trainable (QAT).
    """

    features: int
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
        )
        out_dtype = jnp.promote_types(x.dtype, kernel.dtype)
        y = int8_dot(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(out_dtype)
