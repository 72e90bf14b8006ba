"""LoRA adapters for Flax Dense layers.

Capability parity with the reference's ``peft.LoraConfig(r=8, lora_alpha=32,
lora_dropout=0.1)`` + patched ``PeftModelForSeq2SeqLM``
(`src/models/rerank/decoder_rerank_model.py:103-113`,
`src/models/custom_peft.py:27-271`). TPU-native: the low-rank update is two
extra small matmuls fused by XLA; "trainable adapter only" is expressed by
labeling ``lora_a``/``lora_b`` params into the trainable optimizer group and
freezing the rest (see ``training.optimization.label_params``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LoRADense(nn.Module):
    """Dense layer with an optional additive low-rank adapter.

    out = x @ W + b + (alpha/r) * (x @ A) @ B,  A: [in, r], B: [r, out]
    """

    features: int
    r: int = 0
    alpha: float = 32.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, name="base")(x)
        if self.r > 0:
            a = self.param(
                "lora_a",
                nn.initializers.normal(1e-2),
                (x.shape[-1], self.r),
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (self.r, self.features)
            )
            y = y + (self.alpha / self.r) * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))
        return y


LORA_PARAM_PATTERNS = ("lora_a", "lora_b")
