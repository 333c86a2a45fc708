"""Fused Pallas attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.models.qwen2 import sdpa
from audio_calm_tpu.ops.pallas_attention import attention_available, fused_attention


def _ref(q, k, v, key_valid=None, causal=False):
    B, T, Hq, d = q.shape
    S = k.shape[1]
    mask = jnp.ones((B, 1, T, S), bool)
    if key_valid is not None:
        mask = mask & (key_valid[:, None, None, :] > 0)
    if causal:
        row = jnp.arange(T)[:, None]
        col = jnp.arange(S)[None, :]
        mask = mask & (col <= row + (S - T))[None, None]
    return sdpa(q, k, v, mask)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_fused_attention_matches_xla(causal, gqa):
    rng = np.random.default_rng(0)
    B, T, Hq, d = 2, 16, 4, 64
    Hkv = Hq // gqa
    q = jnp.asarray(rng.standard_normal((B, T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    key_valid = jnp.asarray(np.arange(T)[None, :] < np.array([[12], [16]]), jnp.int32)

    ours = fused_attention(q, k, v, key_valid=key_valid, causal=causal,
                           interpret=True)
    ref = _ref(q, k, v, key_valid=key_valid, causal=causal)
    # rows with zero valid keys don't exist here (kv_len >= 12)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_cross(q_len=8, s_len=24):
    rng = np.random.default_rng(1)
    B, H, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, q_len, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, s_len, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, s_len, H, d)), jnp.float32)
    ours = fused_attention(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_availability_gate():
    assert attention_available((1, 384, 16, 64), (1, 384, 16, 64))
    assert attention_available((1, 97, 12, 128), (1, 97, 2, 128))
    assert attention_available((1, 96, 16, 96), (1, 96, 16, 96))  # d=96 ok
    assert not attention_available((1, 16, 4, 80), (1, 16, 4, 80))  # d%32
    assert not attention_available((1, 4096, 4, 64), (1, 4096, 4, 64))
    # full-tile VMEM limit measured on v5e: 512 ok, 1024 fails to compile
    assert attention_available((1, 512, 4, 64), (1, 512, 4, 64))
    assert not attention_available((1, 1024, 4, 64), (1, 1024, 4, 64))


def test_fused_attention_batched_matches_xla():
    """v2 (per-batch grid, heads looped in-kernel) parity."""
    from audio_calm_tpu.ops.pallas_attention import fused_attention_batched

    rng = np.random.default_rng(3)
    B, T, Hq, d = 2, 16, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, 2, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, 2, d)), jnp.float32)
    key_valid = jnp.asarray(np.arange(T)[None, :] < np.array([[12], [16]]),
                            jnp.int32)
    ours = fused_attention_batched(q, k, v, key_valid=key_valid, causal=True,
                                   interpret=True)
    ref = _ref(q, k, v, key_valid=key_valid, causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_flash_attention_grads_match_xla(causal, gqa):
    """custom_vjp backward kernel vs autodiff through the XLA reference
    (interpret mode): dq/dk/dv all match."""
    from audio_calm_tpu.ops.pallas_attention import flash_attention

    rng = np.random.default_rng(3)
    B, T, Hq, d = 2, 16, 4, 32
    Hkv = Hq // gqa
    q = jnp.asarray(rng.standard_normal((B, T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    key_valid = jnp.asarray(
        np.arange(T)[None, :] < np.array([[12], [16]]), jnp.int32
    )
    w = jnp.asarray(rng.standard_normal((B, T, Hq, d)), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, key_valid, causal, True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, key_valid=key_valid, causal=causal) * w)

    o1 = loss_flash(q, k, v)
    o2 = loss_ref(q, k, v)
    np.testing.assert_allclose(float(o1), float(o2), rtol=1e-4)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_flash_attention_grads_cross_len():
    """T != S (self-attn is square here, but keep the kernel honest)."""
    from audio_calm_tpu.ops.pallas_attention import flash_attention

    rng = np.random.default_rng(4)
    B, T, S, H, d = 1, 8, 24, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, d)), jnp.float32)

    def f(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    g1 = f(lambda q, k, v: flash_attention(q, k, v, None, False, True))
    g2 = f(lambda q, k, v: _ref(q, k, v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
