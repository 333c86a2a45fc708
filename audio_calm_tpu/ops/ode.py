"""Euler ODE integrator for flow-matching inference.

Re-design of the reference `ode_solve_sway` (eval/eval_calm.py:140-164 —
plain uniform-step Euler despite the name). TPU-first:
  - the step loop is a `jax.lax.scan` with a static step count (jit-once)
  - classifier-free guidance runs conditional + unconditional passes FUSED
    as a single 2B-batch head call per step (the reference makes two
    sequential calls), doubling MXU utilization at small batch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def ode_solve(
    head_fn: Callable,
    condition: jnp.ndarray,  # [B, T, C]
    x_init: jnp.ndarray,  # [B, T, D]
    steps: int,
    cfg_scale: float = 1.0,
    context: Optional[jnp.ndarray] = None,
    context_mask: Optional[jnp.ndarray] = None,  # True = PAD
    x_mask: Optional[jnp.ndarray] = None,  # True = PAD
) -> jnp.ndarray:
    """Integrate dx/dt = v(x, t) from t=0 to 1 with `steps` Euler steps.

    head_fn(condition, x, t, context, context_mask, x_mask) -> v
    """
    use_cfg = (cfg_scale != 1.0) and (cfg_scale > 0)
    dt = 1.0 / steps
    B = x_init.shape[0]

    if use_cfg:
        cond2 = jnp.concatenate([condition, jnp.zeros_like(condition)], axis=0)
        ctx2 = (
            jnp.concatenate([context, jnp.zeros_like(context)], axis=0)
            if context is not None
            else None
        )
        cmask2 = (
            jnp.concatenate([context_mask, context_mask], axis=0)
            if context_mask is not None
            else None
        )
        xmask2 = (
            jnp.concatenate([x_mask, x_mask], axis=0) if x_mask is not None else None
        )

        def step(x, i):
            t = jnp.full((2 * B,), i.astype(jnp.float32) / steps)
            x2 = jnp.concatenate([x, x], axis=0)
            v2 = head_fn(cond2, x2, t, ctx2, cmask2, xmask2)
            v_cond, v_uncond = v2[:B], v2[B:]
            v = v_uncond + cfg_scale * (v_cond - v_uncond)
            return (x + v * dt).astype(x.dtype), None

    else:

        def step(x, i):
            t = jnp.full((B,), i.astype(jnp.float32) / steps)
            v = head_fn(condition, x, t, context, context_mask, x_mask)
            return (x + v * dt).astype(x.dtype), None

    x_final, _ = jax.lax.scan(step, x_init, jnp.arange(steps))
    return x_final
