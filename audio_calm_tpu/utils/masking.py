"""Mask utilities.

Everything in this framework is static-shape + mask: the reference freely uses
data-dependent lengths (e.g. eval_calm.py:460 picks num_frames at runtime);
under XLA we pad to fixed maxima and mask instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] int lengths -> [B, max_len] bool mask (True = valid)."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9):
    """Mean of x over positions where mask is True.

    mask is broadcast against x. Returns 0 where the mask is empty.
    """
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(jnp.broadcast_to(mask, x.shape), axis=axis)
    return num / jnp.maximum(den, eps)
