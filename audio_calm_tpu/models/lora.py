"""LoRA: low-rank adapters over Dense projections.

TPU-native replacement for the reference's peft LoRA (train_calm.py:458-469,
r=64, alpha=128, dropout=0.05 on q/k/v/o/gate/up/down projections). The base
weight is a frozen parameter in the "params" collection; A/B live in the same
tree under `lora_a`/`lora_b` so optimizer masking can train only LoRA leaves.

Init matches peft: A ~ kaiming-uniform(a=sqrt(5)), B = 0, scaling = alpha/r.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LoRADense(nn.Module):
    """Dense layer with optional LoRA adapter: y = xW + b + (alpha/r) * xAB."""

    features: int
    use_bias: bool = True
    rank: int = 0  # 0 disables LoRA
    alpha: float = 1.0
    lora_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        dt = self.dtype or x.dtype
        if kernel.dtype == jnp.int8:
            # weight-only int8 serving (models/quant.quantize_llm_int8): the
            # per-output-channel scale lives in the "qscale" collection so
            # the param tree keeps its layout; dequant is an elementwise
            # producer XLA fuses into the matmul's weight read — HBM traffic
            # for the frozen base halves vs bf16
            scale = self.variable(
                "qscale", "kernel_scale",
                lambda: jnp.ones((self.features,), jnp.float32),
            ).value
            w = kernel.astype(dt) * scale.astype(dt)[None, :]
        else:
            w = kernel.astype(dt)
        y = x.astype(dt) @ w
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dt)
        if self.rank > 0:
            # kaiming-uniform(a=sqrt(5)) over fan_in, like peft
            bound = float(1.0 / np.sqrt(in_features))

            def _kaiming_uniform(key, shape, dtype=jnp.float32):
                import jax

                return jax.random.uniform(key, shape, dtype, -bound, bound)

            lora_a = self.param("lora_a", _kaiming_uniform, (in_features, self.rank))
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (self.rank, self.features)
            )
            xa = x
            if self.lora_dropout > 0:
                xa = nn.Dropout(rate=self.lora_dropout, deterministic=not train)(x)
            scaling = self.alpha / self.rank
            y = y + scaling * (
                (xa.astype(dt) @ lora_a.astype(dt)) @ lora_b.astype(dt)
            )
        return y
