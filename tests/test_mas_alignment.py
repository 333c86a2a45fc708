"""MAS + duration-alignment ops vs independent NumPy implementations of the
published recurrences (these serve as executable specs)."""

import numpy as np
import jax.numpy as jnp

from audio_calm_tpu.ops.alignment import (
    build_alignment_from_durations,
    distribute_remainder,
)
from audio_calm_tpu.ops.mas import monotonic_alignment_search


def mas_numpy(log_p: np.ndarray) -> np.ndarray:
    """Spec: Viterbi DP, dp[n,t] = lp + max(stay, move); backtrace move iff
    move > stay (ties stay)."""
    B, N, T = log_p.shape
    out = np.zeros((B, N, T), np.float32)
    for b in range(B):
        lp = log_p[b]
        dp = np.full((N, T), -np.inf, np.float64)
        dp[0, 0] = lp[0, 0]
        for t in range(1, T):
            dp[0, t] = dp[0, t - 1] + lp[0, t]
        for n in range(1, N):
            for t in range(n, T):
                dp[n, t] = max(dp[n, t - 1], dp[n - 1, t - 1]) + lp[n, t]
        n, t = N - 1, T - 1
        while n >= 0 and t >= 0:
            out[b, n, t] = 1.0
            if n == 0:
                t -= 1
            elif t == 0:
                break
            else:
                if dp[n - 1, t - 1] > dp[n, t - 1]:
                    n -= 1
                t -= 1
    return out


def test_mas_matches_numpy_spec():
    rng = np.random.default_rng(0)
    for B, N, T in [(2, 5, 12), (3, 8, 8), (1, 3, 20)]:
        lp = rng.standard_normal((B, N, T)).astype(np.float32)
        ours = np.asarray(monotonic_alignment_search(jnp.asarray(lp)))
        ref = mas_numpy(lp)
        np.testing.assert_array_equal(ours, ref)


def test_mas_monotone_and_full_coverage():
    rng = np.random.default_rng(1)
    lp = rng.standard_normal((2, 6, 30)).astype(np.float32)
    a = np.asarray(monotonic_alignment_search(jnp.asarray(lp)))
    # each frame assigned exactly one token
    np.testing.assert_array_equal(a.sum(axis=1), np.ones((2, 30)))
    # token index non-decreasing over time
    tok = a.argmax(axis=1)
    assert (np.diff(tok, axis=1) >= 0).all()
    # ends at last token
    assert (tok[:, -1] == 5).all()


def test_mas_with_padding_masks():
    """Padded rows at -1e9 behave like the reference masked_fill inputs."""
    rng = np.random.default_rng(2)
    lp = rng.standard_normal((1, 6, 16)).astype(np.float32)
    lp[:, 4:, :] = -1e9  # pad tokens
    lp[:, :, 12:] = -1e9  # pad frames
    ours = np.asarray(monotonic_alignment_search(jnp.asarray(lp)))
    ref = mas_numpy(lp)
    np.testing.assert_array_equal(ours, ref)


def test_distribute_remainder():
    dur = jnp.asarray([[1, 1, 1, 0], [2, 2, 0, 0]])
    valid = jnp.asarray([[True, True, True, False], [True, True, False, False]])
    out = np.asarray(distribute_remainder(dur, jnp.asarray([2, 1]), valid))
    np.testing.assert_array_equal(out, [[2, 2, 1, 0], [3, 2, 0, 0]])


def test_alignment_exact_partition():
    rng = np.random.default_rng(3)
    B, N, T = 3, 7, 40
    dur = jnp.asarray(rng.integers(0, 12, (B, N)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N)) < 0.8)
    valid = valid.at[:, 0].set(True)
    a = np.asarray(build_alignment_from_durations(dur, valid, T))
    # every frame covered exactly once
    np.testing.assert_array_equal(a.sum(axis=1), np.ones((B, T)))
    # invalid tokens get nothing
    assert (a[~np.asarray(valid)] == 0).all()
    # contiguity: each token's frames are a contiguous run
    for b in range(B):
        for n in range(N):
            idx = np.where(a[b, n] > 0)[0]
            if len(idx):
                assert idx[-1] - idx[0] + 1 == len(idx)


def test_alignment_overbudget_repair():
    # durations exceeding budget get proportionally scaled then repaired
    dur = jnp.asarray([[100, 50, 30]], jnp.int32)
    valid = jnp.asarray([[True, True, True]])
    a = np.asarray(build_alignment_from_durations(dur, valid, 16))
    np.testing.assert_array_equal(a.sum(axis=(1, 2)), [16])
    assert (a.sum(axis=2) >= 1).all()  # every valid token keeps >= 1 frame
