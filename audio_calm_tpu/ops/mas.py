"""Monotonic Alignment Search — on-device, as a lax.scan Viterbi.

The reference runs MAS on CPU with O(B*N*T) Python loops plus a device sync
every training step (modeling_calm.py:428-495, "使用 CPU 进行 DP"). Here the
DP is a forward `lax.scan` over audio frames carrying the [B, N] best-score
column (O(N) vector work per frame on the VPU), and the backtrace is a
reverse scan carrying the current token index — no host round trip.

Recurrence (identical to the reference, including tie-breaking):
  dp[0, 0] = lp[0, 0];  dp[n, t] = lp[n, t] + max(dp[n, t-1], dp[n-1, t-1])
  (dp[n, t] = -inf for t < n, enforced by initialization + propagation)
Backtrace from (N-1, T-1): move to token n-1 iff dp[n-1, t-1] > dp[n, t-1]
(strictly greater: ties stay, matching modeling_calm.py:489-491).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def monotonic_alignment_search(log_p: jnp.ndarray) -> jnp.ndarray:
    """log_p: [B, N_text, T_audio] -> binary alignment [B, N, T] (float32).

    Padded rows/frames should carry large negative log-probs (the caller
    masks them, as the reference does); the path still spans the full padded
    grid exactly like the reference implementation.
    """
    B, N, T = log_p.shape
    lp = log_p.astype(jnp.float32)

    init_col = jnp.full((B, N), NEG).at[:, 0].set(lp[:, 0, 0])

    def fwd(prev, lp_t):
        # lp_t: [B, N] scores at frame t
        shifted = jnp.concatenate(
            [jnp.full((B, 1), NEG), prev[:, :-1]], axis=1
        )  # dp[n-1, t-1]
        col = lp_t + jnp.maximum(prev, shifted)
        return col, col

    # columns for t = 1..T-1 ; dp has shape [T, B, N]
    _, cols = jax.lax.scan(fwd, init_col, jnp.moveaxis(lp, 2, 0)[1:])
    dp = jnp.concatenate([init_col[None], cols], axis=0)  # [T, B, N]

    # Backtrace: walk t = T-1 .. 0 carrying the current token index n [B].
    def bwd(n, t):
        onehot = jax.nn.one_hot(n, N, dtype=jnp.float32)  # align column at t
        prev_col = dp[jnp.maximum(t - 1, 0)]  # [B, N]
        stay = jnp.take_along_axis(prev_col, n[:, None], axis=1)[:, 0]
        move = jnp.take_along_axis(
            prev_col, jnp.maximum(n - 1, 0)[:, None], axis=1
        )[:, 0]
        step_down = (n > 0) & (t > 0) & (move > stay)
        return jnp.where(step_down, n - 1, n), onehot

    n0 = jnp.full((B,), N - 1, dtype=jnp.int32)
    _, align_cols = jax.lax.scan(
        bwd, n0, jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    )
    # align_cols: [T, B, N] in reverse time order
    align = jnp.moveaxis(align_cols[::-1], 0, 2)  # [B, N, T]
    return align
