"""Rectified-flow matching loss with classifier-free-guidance dropout.

Functional re-design of the reference compute_flow_loss
(modeling_calm.py:393-425): t ~ U(0,1) per sample, x_t = (1-t)x0 + t*x1 with
x0 ~ N(0,I), target velocity v = x1 - x0, masked MSE on the head's predicted
velocity. At train time, with probability cfg_dropout_prob per sample, the
condition (and cross-attention context) are zeroed to learn the
unconditional field.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def compute_flow_loss(
    head_fn: Callable,
    rng: jax.Array,
    condition: jnp.ndarray,  # [B, T, C_cond]
    target: jnp.ndarray,  # [B, T, D]
    mask: jnp.ndarray,  # [B, T] True = valid
    cfg_dropout_prob: float = 0.0,
    context: Optional[jnp.ndarray] = None,
    context_mask: Optional[jnp.ndarray] = None,  # True = PAD
    x_mask: Optional[jnp.ndarray] = None,  # True = PAD (defaults to ~mask)
    train: bool = True,
) -> jnp.ndarray:
    """head_fn(condition, noisy_x, t, context, context_mask, x_mask) -> v."""
    B, T, D = target.shape
    mask = mask.astype(bool)
    if x_mask is None:
        x_mask = ~mask

    r_drop, r_t, r_x0 = jax.random.split(rng, 3)
    if train and cfg_dropout_prob > 0:
        drop = jax.random.uniform(r_drop, (B,)) < cfg_dropout_prob
        condition = jnp.where(drop[:, None, None], 0.0, condition)
        if context is not None:
            context = jnp.where(drop[:, None, None], 0.0, context)

    t = jax.random.uniform(r_t, (B,), dtype=jnp.float32)
    x0 = jax.random.normal(r_x0, target.shape, target.dtype)
    tb = t.astype(target.dtype)[:, None, None]
    xt = (1.0 - tb) * x0 + tb * target
    target_v = target - x0

    pred_v = head_fn(condition, xt, t, context, context_mask, x_mask)

    err = (pred_v.astype(jnp.float32) - target_v.astype(jnp.float32)) ** 2
    per_pos = jnp.mean(err, axis=-1)  # [B, T]
    m = mask.astype(jnp.float32)
    return jnp.sum(per_pos * m) / jnp.maximum(jnp.sum(m), 1.0)
