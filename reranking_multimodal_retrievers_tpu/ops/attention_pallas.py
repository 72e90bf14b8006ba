"""Fused multi-head self-attention as a Pallas TPU kernel, layout-native.

The stock Pallas flash kernel wants [B, heads, L, head_dim] and segment-id
masking; feeding it from a transformer layer costs four HBM-round-trip
transposes plus segment bookkeeping — measured to erase its 1.8× win over
XLA's fused softmax at rerank shapes ([100, 12, 512, 64] bf16 on v5e).

This kernel instead consumes Q/K/V exactly as the layer produces them —
``[B, L, heads·head_dim]`` straight from the QKV projections — and grids
over (batch-tile, head): the BlockSpec index map slices one head's
``[rows, L, head_dim]`` strip per step, so the "transpose" happens inside
the HBM→VMEM copy that the pipeline does anyway. Padding is an additive
``[B, L]`` key-side bias (0 keep / −1e9 drop), applied before the softmax —
the same convention as the unfused path (`bert.py additive_mask`), not
segment ids. Scores stay in VMEM for the whole (tile, head) step: per-layer
HBM traffic drops by the [B, heads, L, L] score+prob tensors entirely.

Numerics: QK^T in bf16 (the serving configuration — `attention_scores_bf16`),
max-subtraction + exp + sum in fp32, PV accumulated in fp32 on the MXU.
No flash-style streaming statistics are needed: one head × one batch-tile's
full [rows, L, L] score block fits VMEM at L ≤ 1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, head_bias_ref, o_ref, *,
                 sm_scale, heads_per_block, head_dim, causal=False):
    # Mosaic requires lane-dim blocks of ≥128, so each grid step carries
    # `heads_per_block` packed heads and slices them here (static lane
    # offsets — register-level, no HBM traffic)
    bias = None
    if bias_ref is not None:
        bias = bias_ref[:, 0:1, :].astype(jnp.float32)  # [bb, 1, Lk]
    causal_bias = None
    if causal:
        # synthesized in-register (iota compare) — a causal mask costs no
        # HBM traffic, unlike streaming a [heads, L, L] bias
        Lq, Lk = q_ref.shape[1], k_ref.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
        causal_bias = jnp.where(cols > rows, NEG_INF, 0.0)[None]  # [1, Lq, Lk]
    for h in range(heads_per_block):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl]  # [bb, L, hd]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb, Lq, Lk]
        s = s * sm_scale
        if bias is not None:
            # Mosaic rejects the [bb, 1, Lk] → [bb, Lq, Lk] sublane
            # broadcast past 64 sublane tiles (Lq > 512 SIGABRTs on v5e);
            # chunk the add so each broadcast stays ≤ 512 rows
            Lq = s.shape[1]
            if Lq <= 512:
                s = s + bias
            else:
                s = jnp.concatenate(
                    [s[:, r0 : r0 + 512, :] + bias
                     for r0 in range(0, Lq, 512)],
                    axis=1,
                )
        if head_bias_ref is not None:
            # per-head additive bias (T5 relative-position bias), shared
            # across the batch tile: [hpb, Lq, Lk] slice for this head group
            s = s + head_bias_ref[h][None].astype(jnp.float32)
        if causal_bias is not None:
            s = s + causal_bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb, Lq, hd]
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "sm_scale", "block_b", "causal",
                              "interpret")
)
def fused_self_attention(q, k, v, mask_bias=None, head_bias=None, *,
                         num_heads: int, sm_scale: float, block_b: int = 5,
                         causal: bool = False, interpret: bool = False):
    """Softmax(QKᵀ·scale + bias)·V over heads packed in the last dim.

    q/k/v: [B, L, num_heads·head_dim] (the projection outputs, un-reshaped).
    mask_bias: optional [B, L] additive key bias (0 keep / −1e9 drop).
    head_bias: optional [num_heads, L, L] additive per-head bias shared
        across the batch (T5 relative-position bias); each grid step streams
        only its head group's [hpb, L, L] slice into VMEM, so the unfused
        path's [B, heads, L, L] broadcast never materializes.
    causal: decoder-only masking (OPT) — synthesized inside the kernel from
        iota comparisons, so it costs no HBM traffic at all.
    Returns [B, L, num_heads·head_dim]. B must divide by a tile ≤ block_b.
    """
    B, L, HD = q.shape
    hd = HD // num_heads
    # lane-dim blocks must be 128-aligned: pack the smallest head group whose
    # packed width is a multiple of 128 (hd=64 → 2, hd=80 (OPT) → 8)
    hpb = max(1, -(-128 // hd))
    while (hpb * hd) % 128 != 0 or num_heads % hpb != 0:
        hpb += 1
        assert hpb <= num_heads, (num_heads, hd)
    # Mosaic miscompiles (SIGABRT) the [bb, 1, Lk]→[bb, Lq, Lk] mask
    # broadcast when L is not a lane multiple (observed at L=544 on v5e;
    # 512/640 fine) — pad L up to the next multiple of 128 with −1e9-masked
    # keys and slice the queries back out. XLA fuses the pads/slice; the
    # extra key columns cost <(pad/L) of the attention FLOPs only.
    if L % 128 != 0:
        Lp = -(-L // 128) * 128
        pad = [(0, 0), (0, Lp - L), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        if mask_bias is None:
            mask_bias = jnp.zeros((B, L), q.dtype)
        mask_bias = jnp.pad(mask_bias, [(0, 0), (0, Lp - L)],
                            constant_values=NEG_INF)
        if head_bias is not None:
            head_bias = jnp.pad(
                head_bias, [(0, 0), (0, Lp - L), (0, Lp - L)]
            )
        out = fused_self_attention(
            q, k, v, mask_bias, head_bias, num_heads=num_heads,
            sm_scale=sm_scale, block_b=block_b, causal=causal,
            interpret=interpret,
        )
        return out[:, :L, :]
    # the per-step VMEM stack is dominated by the [bb, L, L] fp32 score block
    # (plus its exp) and the [bb, L, hpb·hd] q/k/v/out blocks; scale the
    # batch tile down from the tuned (bb=5, L=512, 128-lane pack) point so
    # longer sequences and wide head packs (OPT: hpb·hd = 640) stay under
    # the 16 MB scoped limit instead of failing to compile
    block_b = max(1, min(block_b, int(block_b * (512 / L) ** 2
                                      * 128 / (hpb * hd))))
    bb = next(b for b in range(min(block_b, B), 0, -1) if B % b == 0)
    grid = (B // bb, num_heads // hpb)

    x_spec = pl.BlockSpec((bb, L, hpb * hd), lambda i, n: (i, 0, n))
    in_specs = [x_spec, x_spec, x_spec]
    args = [q, k, v]
    kw = dict(sm_scale=sm_scale, heads_per_block=hpb, head_dim=hd,
              causal=causal)
    have_mask = mask_bias is not None
    have_head = head_bias is not None
    if have_mask:
        # sublane-dim blocks must be 8-divisible — broadcast the [B, L] bias
        # to [B, 8, L] (tiny: fp32 bias is ~1.6 MB at rerank shapes)
        in_specs.append(pl.BlockSpec((bb, 8, L), lambda i, n: (i, 0, 0)))
        args.append(
            jnp.broadcast_to(
                mask_bias.astype(jnp.float32)[:, None, :], (B, 8, L)
            )
        )
    if have_head:
        # keep the caller's dtype (bf16 halves the per-layer HBM stream);
        # the kernel accumulates it into the fp32 scores either way
        in_specs.append(pl.BlockSpec((hpb, L, L), lambda i, n: (n, 0, 0)))
        args.append(head_bias)
    kernel = functools.partial(
        _dispatch_kernel, have_mask=have_mask, have_head=have_head, **kw
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def _dispatch_kernel(q_ref, k_ref, v_ref, *refs, have_mask, have_head, **kw):
    refs = list(refs)
    o_ref = refs.pop()
    bias_ref = refs.pop(0) if have_mask else None
    head_bias_ref = refs.pop(0) if have_head else None
    _attn_kernel(q_ref, k_ref, v_ref, bias_ref, head_bias_ref, o_ref, **kw)


def fused_self_attention_reference(q, k, v, mask_bias=None, head_bias=None, *,
                                   num_heads: int, sm_scale: float):
    """Unfused oracle for tests (matches the bert.py unfused path)."""
    B, L, HD = q.shape
    hd = HD // num_heads
    qh = q.reshape(B, L, num_heads, hd)
    kh = k.reshape(B, L, num_heads, hd)
    vh = v.reshape(B, L, num_heads, hd)
    s = jnp.einsum("bqnd,bknd->bnqk", qh, kh,
                   preferred_element_type=jnp.float32) * sm_scale
    if mask_bias is not None:
        s = s + mask_bias[:, None, None, :].astype(jnp.float32)
    if head_bias is not None:
        s = s + head_bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", p, vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(B, L, HD)
