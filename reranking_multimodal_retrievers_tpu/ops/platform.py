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
    geometry: it packs ``hpb = ceil(128 / head_dim)`` heads per grid step and
    requires ``num_heads % hpb == 0`` with full 128-lane rows (the kernel
    asserts this — callers must gate on it and fall back to the XLA path)."""
    hpb = max(1, -(-128 // head_dim))
    return num_heads % hpb == 0 and (hpb * head_dim) % 128 == 0
