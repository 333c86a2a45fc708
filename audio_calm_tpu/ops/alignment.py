"""Duration -> alignment-matrix construction, fully vectorized for XLA.

Re-design of the reference build_alignment_from_durations /
distribute_remainder_vectorized (modeling_calm.py:311-388). The reference
repairs over-budget durations with a per-sample Python while-loop that
decrements the argmax token (339-352); here the repair is a batched
`lax.while_loop` of masked vector ops — same fixed point, no host loops,
jit-compatible with static shapes.

Semantics (identical to the reference):
  1. zero invalid tokens; if total > T_aud, scale proportionally (floor)
  2. clamp valid tokens to >= 1
  3. while any sample still over budget: decrement its argmax valid token
     (not below 1)
  4. distribute any non-negative remainder: the first `remain` valid tokens
     get +1
  5. expand to a binary [B, T_txt, T_aud] matrix from cumulative offsets
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distribute_remainder(
    dur: jnp.ndarray, remain: jnp.ndarray, valid_mask: jnp.ndarray
) -> jnp.ndarray:
    """+1 to the first `remain[b]` valid tokens of each row.

    Matches the reference for remain <= n_valid (its only case in practice);
    additionally loops when remain exceeds the number of valid tokens so no
    audio frame is ever left without a token (the reference would silently
    leave trailing frames unconditioned).
    """
    valid_cumsum = jnp.cumsum(valid_mask.astype(jnp.int32), axis=1)
    n_valid = jnp.sum(valid_mask.astype(jnp.int32), axis=1)

    def cond(state):
        _, rem = state
        return jnp.any((rem > 0) & (n_valid > 0))

    def body(state):
        d, rem = state
        should_add = valid_mask & (valid_cumsum <= rem[:, None])
        d = d + should_add.astype(d.dtype)
        rem = jnp.maximum(rem - n_valid, 0)
        return d, rem

    dur, _ = jax.lax.while_loop(cond, body, (dur, remain))
    return dur


def repair_overbudget(
    dur: jnp.ndarray, valid_mask: jnp.ndarray, t_aud
) -> jnp.ndarray:
    """Decrement argmax valid tokens (not below 1) until every row fits
    t_aud (static int or traced [B] budget).

    Batched equivalent of the reference deficit-repair while-loop
    (modeling_calm.py:339-352): each iteration removes
    min(deficit, argmax_dur - 1) from the longest token of each over-budget
    row; terminates when no row can shrink further or all fit.
    """
    valid = valid_mask.astype(dur.dtype)

    def cond(d):
        deficit = jnp.sum(d * valid, axis=1) - t_aud
        can_shrink = jnp.max(jnp.where(valid_mask, d, 0), axis=1) > 1
        return jnp.any((deficit > 0) & can_shrink)

    def body(d):
        deficit = jnp.sum(d * valid, axis=1) - t_aud  # [B]
        masked = jnp.where(valid_mask, d, jnp.zeros_like(d))
        max_idx = jnp.argmax(masked, axis=1)  # [B]
        max_val = jnp.take_along_axis(d, max_idx[:, None], axis=1)[:, 0]
        dec = jnp.minimum(jnp.maximum(deficit, 0), jnp.maximum(max_val - 1, 0))
        upd = max_val - dec
        d = jnp.where(
            jax.nn.one_hot(max_idx, d.shape[1], dtype=bool),
            upd[:, None],
            d,
        )
        return d

    return jax.lax.while_loop(cond, body, dur)


def build_alignment_from_durations(
    dur_int: jnp.ndarray,  # [B, T_txt] int
    valid_mask: jnp.ndarray,  # [B, T_txt] bool
    t_aud: int,
    budget: jnp.ndarray | None = None,  # [B] traced frame budget <= t_aud
    dtype=jnp.float32,
) -> jnp.ndarray:
    """-> [B, T_txt, t_aud] binary alignment.

    `t_aud` is the static grid width; `budget` (default t_aud) is the traced
    per-sample frame count to partition — at inference the length predictor
    picks it at runtime (reference eval_calm.py:460) while the grid stays
    static for XLA. Frames >= budget get no token (mask them downstream).
    """
    B = dur_int.shape[0]
    if budget is None:
        budget = jnp.full((B,), t_aud, jnp.int32)
    budget = budget.astype(jnp.int32)

    dur = (dur_int * valid_mask.astype(dur_int.dtype)).astype(jnp.int32)
    total = jnp.sum(dur, axis=1)

    # proportional shrink when over budget (floor, like reference .long())
    scale = jnp.where(
        total > budget,
        budget.astype(jnp.float32) / jnp.maximum(total, 1).astype(jnp.float32),
        1.0,
    )
    dur = jnp.floor(dur.astype(jnp.float32) * scale[:, None]).astype(jnp.int32)
    dur = jnp.where(valid_mask & (dur < 1), 1, dur)

    dur = repair_overbudget(dur, valid_mask, budget)

    remain = jnp.maximum(budget - jnp.sum(dur, axis=1), 0)
    dur = distribute_remainder(dur, remain, valid_mask)

    cum = jnp.cumsum(dur, axis=1)
    start = cum - dur
    end = jnp.minimum(cum, budget[:, None])
    frame = jnp.arange(t_aud)[None, None, :]
    align = (
        (frame >= start[:, :, None])
        & (frame < end[:, :, None])
        & valid_mask[:, :, None]
    )
    return align.astype(dtype)
