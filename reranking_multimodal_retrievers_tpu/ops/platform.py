"""Backend probes shared by every Pallas-vs-XLA dispatch site.

One definition of "are we on a TPU backend" (real `tpu` or the tunneled
`axon` platform) instead of per-module copies — the kernels themselves run
anywhere via interpret mode, but only TPU compiles them natively.
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when device 0 is a TPU-class backend (incl. the axon tunnel)."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:  # backend init failure — stay portable
        return False
    return "tpu" in plat or "axon" in plat


def head_pack_feasible(num_heads: int, head_dim: int) -> bool:
    """Whether `ops/attention_pallas.py`'s fused kernel can tile this head
    geometry. Mirrors the kernel's own packing search exactly: starting from
    ``hpb = ceil(128 / head_dim)``, grow the head group until its packed
    width is a 128-lane multiple AND it divides ``num_heads`` (hd=64 → 2,
    hd=80 (OPT) → 8). Infeasible only when no group ≤ num_heads satisfies
    both — callers then fall back to the XLA path."""
    hpb = max(1, -(-128 // head_dim))
    while (hpb * head_dim) % 128 != 0 or num_heads % hpb != 0:
        hpb += 1
        if hpb > num_heads:
            return False
    return True
