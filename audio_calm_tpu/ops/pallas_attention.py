"""Fused attention as a Pallas TPU kernel.

At this framework's sequence budget (<= ~512: audio latents <= 384, text
<= 97) an online-softmax flash decomposition is unnecessary — a full [T, S]
score tile fits VMEM (512x512 fp32 = 1 MB). The right TPU kernel is a
per-(batch, head) FUSED block: both matmuls hit the MXU back-to-back, the
score matrix and softmax never round-trip to HBM, masks are built from a
scalar length in SMEM (no [B, H, T, S] mask tensor materialized, which is
what the XLA path does).

Supports GQA (q heads grouped over fewer kv heads), key-padding via
per-batch kv lengths, and causal masking. Used by Qwen2 attention and the
DiT heads at inference; training falls back to the XLA path when attention
dropout is active.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _attn_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, causal: bool,
                 scale: float):
    q = q_ref[0, 0, :, :]  # [T, d]
    k = k_ref[0, 0, :, :]  # [S, d]
    v = v_ref[0, 0, :, :]  # [S, d]
    T, S = q.shape[0], k.shape[0]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T, S]

    mask = (valid_ref[0, 0, :] > 0)[None, :]  # [1, S] key validity
    mask = jnp.broadcast_to(mask, (T, S))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        mask = mask & (col <= row + (S - T))
    scores = jnp.where(mask, scores, NEG)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,  # [B, T, Hq, d]
    k: jnp.ndarray,  # [B, S, Hkv, d]
    v: jnp.ndarray,  # [B, S, Hkv, d]
    key_valid: Optional[jnp.ndarray] = None,  # [B, S] nonzero = valid key
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SDPA. Returns [B, T, Hq, d] in q.dtype. fp32 softmax.

    key_valid is a per-key validity bitmask (supports mid-sequence padding,
    e.g. the ASR branch's [audio | SOA | prompt] packing)."""
    B, T, Hq, d = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    if key_valid is None:
        key_valid = jnp.ones((B, S), jnp.int32)
    key_valid = key_valid.astype(jnp.int32)[:, None, :]  # [B, 1, S]

    # head-major layout so each block's trailing two dims are the FULL
    # (T|S, d) tile (Mosaic requires trailing block dims full or 8/128-
    # aligned; slicing one head out of a [.., H, d] trailing pair is not)
    q_t = q.transpose(0, 2, 1, 3)  # [B, Hq, T, d]
    k_t = k.transpose(0, 2, 1, 3)  # [B, Hkv, S, d]
    v_t = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _attn_kernel, causal=causal, scale=1.0 / (d**0.5)
    )
    grid = (B, Hq)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, d), q.dtype),
        grid=grid,
        # batch/head programs are independent -> schedulable across both
        # v5e megacores (without this the whole grid can serialize on one)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, T, d), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * T * S * d,
            bytes_accessed=(
                B * Hq * T * d * 4 + 2 * B * Hkv * S * d * 4
                + B * Hq * T * d * 4
            ),
            transcendentals=B * Hq * T * S,
        ),
    )(key_valid, q_t, k_t, v_t)
    return out.transpose(0, 2, 1, 3)


def _attn_kernel_batched(valid_ref, q_ref, k_ref, v_ref, o_ref, *,
                         causal: bool, scale: float, group: int):
    """All heads of one batch row in a single program: the per-head variant
    is launch-overhead-bound at this framework's tile sizes (19 MFLOP per
    program); looping heads in-kernel amortizes it H-fold."""
    Hq = q_ref.shape[1]
    T = q_ref.shape[2]
    S = k_ref.shape[2]

    mask = (valid_ref[0, 0, :] > 0)[None, :]
    mask = jnp.broadcast_to(mask, (T, S))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        mask = mask & (col <= row + (S - T))

    for h in range(Hq):  # static unroll; Hq <= 16 here
        q = q_ref[0, h, :, :]
        k = k_ref[0, h // group, :, :]
        v = v_ref[0, h // group, :, :]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(mask, scores, NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h, :, :] = out.astype(o_ref.dtype)


def fused_attention_batched(
    q: jnp.ndarray,  # [B, T, Hq, d]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One program per batch row, heads looped in-kernel (v2)."""
    B, T, Hq, d = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    if key_valid is None:
        key_valid = jnp.ones((B, S), jnp.int32)
    key_valid = key_valid.astype(jnp.int32)[:, None, :]

    q_t = q.transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    v_t = v.transpose(0, 2, 1, 3)
    kernel = functools.partial(
        _attn_kernel_batched, causal=causal, scale=1.0 / (d**0.5), group=group
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, d), q.dtype),
        grid=(B,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hq, T, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, S, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, S, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, T, d), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * T * S * d,
            bytes_accessed=(
                2 * B * Hq * T * d * 4 + 2 * B * Hkv * S * d * 4
            ),
            transcendentals=B * Hq * T * S,
        ),
    )(key_valid, q_t, k_t, v_t)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Trainable fused attention: custom_vjp with a full-tile Pallas backward
# ---------------------------------------------------------------------------
def _flash_bwd_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, causal: bool, scale: float,
                      group: int):
    """Backward for one (batch, kv-head) pair; the `group` query heads
    sharing this kv head are looped in-kernel so dK/dV accumulate locally.

    Full-tile recompute (no saved probabilities): at this framework's
    sequence budget the [T, S] score tile lives entirely in VMEM, so the
    backward re-runs the two forward matmuls instead of round-tripping
    P/LSE through HBM — the flash-attention trade applied at full tile.
    """
    k = k_ref[0, 0, :, :]  # [S, d]
    v = v_ref[0, 0, :, :]
    T = q_ref.shape[2]
    S = k.shape[0]

    mask = (valid_ref[0, 0, :] > 0)[None, :]
    mask = jnp.broadcast_to(mask, (T, S))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        mask = mask & (col <= row + (S - T))

    dk = jnp.zeros((S, k.shape[1]), jnp.float32)
    dv = jnp.zeros((S, v.shape[1]), jnp.float32)
    for g in range(group):  # static unroll; group <= 8 here
        q = q_ref[0, g, :, :]
        do = do_ref[0, g, :, :].astype(jnp.float32)
        o = o_ref[0, g, :, :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(mask, scores, NEG)
        p = jax.nn.softmax(scores, axis=-1)  # [T, S] fp32

        # dV += P^T dO
        dv = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; softmax jacobian via delta = rowsum(dO * O)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # [T, 1]
        ds = p * (dp - delta)  # [T, S] fp32
        dq_ref[0, g, :, :] = (
            jax.lax.dot_general(
                ds, k.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, key_valid, causal, interpret):
    out = fused_attention_batched(
        q, k, v, key_valid=key_valid, causal=causal, interpret=interpret
    )
    return out, (q, k, v, key_valid, out)


def _flash_bwd(causal, interpret, res, dout):
    q, k, v, key_valid, out = res
    B, T, Hq, d = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    if key_valid is None:
        valid = jnp.ones((B, S), jnp.int32)[:, None, :]
    else:
        valid = key_valid.astype(jnp.int32)[:, None, :]

    q_t = q.transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    v_t = v.transpose(0, 2, 1, 3)
    o_t = out.transpose(0, 2, 1, 3)
    do_t = dout.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _flash_bwd_kernel, causal=causal, scale=1.0 / (d**0.5), group=group
    )
    dq_t, dk_t, dv_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, T, d), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, d), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, d), v.dtype),
        ),
        grid=(B, Hkv),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, T, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, T, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, T, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, group, T, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * Hq * T * S * d,
            bytes_accessed=(
                4 * B * Hq * T * d * 4 + 4 * B * Hkv * S * d * 4
            ),
            transcendentals=B * Hq * T * S,
        ),
    )(valid, q_t, k_t, v_t, o_t, do_t)

    dq = dq_t.transpose(0, 2, 1, 3)
    dk = dk_t.transpose(0, 2, 1, 3)
    dv = dv_t.transpose(0, 2, 1, 3)
    import numpy as _np

    d_valid = (
        None if key_valid is None
        else _np.zeros(key_valid.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, d_valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, key_valid=None, causal=False,
                    interpret=False):
    """Differentiable fused attention (training path).

    Forward = fused_attention_batched; backward = a full-tile recompute
    Pallas kernel (one program per (batch, kv-head), query-head group looped
    in-kernel). Same [B, T, H, d] layout and GQA semantics as
    fused_attention."""
    return fused_attention_batched(
        q, k, v, key_valid=key_valid, causal=causal, interpret=interpret
    )


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def attention_available(q_shape, k_shape) -> bool:
    """Conservative gate: Pallas path for TPU-friendly geometries.

    These are FULL-TILE kernels (whole [T, S] score matrix in VMEM):
    measured on v5e, T=S=512 compiles and runs (the fwd+bwd op beats XLA
    in isolation there) while T>=1024 exceeds VMEM at compile. A tiled
    online-softmax flash would be needed past 512; the framework's
    sequence budget (<= 481) never gets there, so 512 is the gate."""
    B, T, Hq, d = q_shape
    S = k_shape[1]
    if d % 32 != 0 or d > 256:
        return False
    if T > 512 or S > 512:
        return False  # full-tile VMEM limit; XLA path handles longer
    return True
