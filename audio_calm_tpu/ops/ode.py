"""ODE integrators for flow-matching inference.

Re-design of the reference `ode_solve_sway` (eval/eval_calm.py:140-164 —
plain uniform-step Euler despite the "sway" name). TPU-first:
  - the step loop is a `jax.lax.scan` with a static step count (jit-once)
  - classifier-free guidance runs conditional + unconditional passes FUSED
    as a single 2B-batch head call per step (the reference makes two
    sequential calls), doubling MXU utilization at small batch.

Beyond reference parity (both default OFF):
  - time_schedule="sway": the actual sway time warp the reference only
    named — t' = t + s*(cos(pi/2 * t) - 1 + t) (F5-TTS, s<0 front-loads
    steps near t=0 where the velocity field bends most)
  - method="midpoint": 2nd-order integrator; comparable quality at half
    the steps of Euler.
For far fewer steps than any integrator can deliver, distill the head
(train/distill.py): a K-step student with guidance baked in runs euler-K
at cfg_scale=1.0 through this same solver.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_time_grid(steps: int, schedule: str = "uniform",
                   sway_coef: float = -1.0) -> jnp.ndarray:
    """-> [steps + 1] monotone time points on [0, 1]."""
    t = jnp.linspace(0.0, 1.0, steps + 1)
    if schedule == "sway":
        t = t + sway_coef * (jnp.cos(math.pi / 2.0 * t) - 1.0 + t)
    return t


def ode_solve(
    head_fn: Callable,
    condition: jnp.ndarray,  # [B, T, C]
    x_init: jnp.ndarray,  # [B, T, D]
    steps: int,
    cfg_scale: float = 1.0,
    context: Optional[jnp.ndarray] = None,
    context_mask: Optional[jnp.ndarray] = None,  # True = PAD
    x_mask: Optional[jnp.ndarray] = None,  # True = PAD
    method: str = "euler",
    time_schedule: str = "uniform",
    sway_coef: float = -1.0,
) -> jnp.ndarray:
    """Integrate dx/dt = v(x, t) from t=0 to 1 over `steps` steps.

    head_fn(condition, x, t, context, context_mask, x_mask) -> v
    Defaults (euler + uniform grid) reproduce the reference solver exactly.
    """
    use_cfg = (cfg_scale != 1.0) and (cfg_scale > 0)
    B = x_init.shape[0]
    grid = make_time_grid(steps, time_schedule, sway_coef)
    t0s = grid[:-1]
    dts = grid[1:] - grid[:-1]

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

        def velocity(x, t_scalar):
            t = jnp.full((2 * B,), t_scalar)
            x2 = jnp.concatenate([x, x], axis=0)
            v2 = head_fn(cond2, x2, t, ctx2, cmask2, xmask2)
            v_cond, v_uncond = v2[:B], v2[B:]
            return v_uncond + cfg_scale * (v_cond - v_uncond)

    else:

        def velocity(x, t_scalar):
            t = jnp.full((B,), t_scalar)
            return head_fn(condition, x, t, context, context_mask, x_mask)

    if method == "midpoint":

        def step(x, td):
            t, dt = td
            v1 = velocity(x, t)
            xm = x + v1 * (dt / 2.0)
            v2 = velocity(xm, t + dt / 2.0)
            return (x + v2 * dt).astype(x.dtype), None

    else:  # euler (reference solver)

        def step(x, td):
            t, dt = td
            v = velocity(x, t)
            return (x + v * dt).astype(x.dtype), None

    x_final, _ = jax.lax.scan(step, x_init, (t0s, dts))
    return x_final
