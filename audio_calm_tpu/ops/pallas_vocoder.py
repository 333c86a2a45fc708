"""Fused HiFi-GAN vocoder compute as Pallas TPU kernels.

The HiFi-GAN generator dominates TTS serving cost: 952 GFLOP per 24.6 s
utterance, and under XLA it is bandwidth-bound end to end (25.4 GB of HBM
traffic -> ~280 GB/s effective). Two structural problems: (1) the 126 small
dilated convs of the multi-receptive-field resblocks round-trip their
intermediates (up to [393216, 32] per tensor) through HBM between every op,
and (2) below 128 channels XLA pads every intermediate to the full 128-lane
register width — 4x wasted bandwidth at the C=32 tail stage.

Kernel design (reference eval stack: SpeechBrain HiFi-GAN V1; our flax port
models/vocoder.ResBlock1 — a resblock is, per dilation d:
x += Conv_k,1(lrelu(Conv_k,d(lrelu(x))))):

- The time axis is tiled; each program consumes its tile plus a zero-padded
  halo (the stacked receptive field of the fused chain), materialized by a
  ~1.05x XLA gather (standard pipelinable blocks; manual HBM DMA requires
  128-aligned minor dims). The whole chain runs in VMEM; only the final
  tile is written. Sequence-edge zero-padding semantics are reproduced
  exactly by masking outside [0, T) before every conv.
- Below 128 channels, g = 128/C time steps are PACKED into lanes and each
  conv becomes a small set of row-shifted [Q,128]x[128,128] matmuls against
  block-Toeplitz weights — full MXU width at every stage. (The unpacked
  per-tap variant at C<=64 merely tied XLA: relayout copies for
  sublane-shifted tap slices on lane-padded intermediates ate the gains.)
- `fused_upsample_stage` goes further for the C-halving stride-2 stages
  (input and output packed-row rates coincide): ONE program runs lrelu ->
  transposed conv (3 block-Toeplitz matmuls) -> all 3 resblocks -> mean.
  For the C=128 stage the r=8 upsample stays in XLA and the kernel groups
  the 3 resblocks + mean. Weights ride in VMEM across grid steps.

conv_pre/conv_post, the two big-channel upsamples, and the C=256 stage stay
in XLA (measured at ~150 TF/s already) — `hifigan_apply_fused` stitches
both worlds over the unchanged HiFiGANGenerator parameter tree. Measured on
v5e (slope method, full V1 geometry): generator device time 34-54 ms (XLA)
-> 18.5 ms fused; waveform parity 4.9e-5. See BASELINE.md.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working budget per program (v5e: ~16 MB/core scoped limit; Mosaic
# stack-allocates the whole intermediate chain plus pipelined in/out blocks,
# so budget conservatively — measured: 10 MB OOMs at stage C=64/k=7)
_VMEM_BUDGET = 6 * 1024 * 1024


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _halo(kernel_size: int, dilations: Tuple[int, ...]) -> int:
    """Stacked left/right receptive margin of the sequential conv chain."""
    c = (kernel_size - 1) // 2
    return sum(c * d + c for d in dilations)


def _pick_tile(C: int, kernel_size: int, dilations: Tuple[int, ...],
               itemsize: int) -> int:
    """Largest time tile whose weights + live buffers fit the VMEM budget."""
    n_d = len(dilations)
    w_bytes = 2 * n_d * kernel_size * C * C * itemsize
    H = _halo(kernel_size, dilations)
    # narrow arrays still occupy full 128-lane registers/VMEM tiles
    c_eff = max(C, 128)
    cat_eff = max(kernel_size * C, 128)
    tile = 8192
    while tile > 128:
        ttp = tile + 2 * H
        # xbuf fp32 + ~2 live intermediates fp32 + im2col cat in compute dtype
        act = ttp * c_eff * 4 * 3 + ttp * cat_eff * itemsize
        if w_bytes + act <= _VMEM_BUDGET:
            break
        tile //= 2
    return tile


def _conv_valid(h: jnp.ndarray, w_flat: jnp.ndarray, bias: jnp.ndarray,
                k: int, d: int, cdt) -> jnp.ndarray:
    """VALID dilated conv as k accumulated shifted matmuls.

    h [L, C] -> [L - (k-1)*d, C]; w_flat [k*C, C] (tap-major rows).
    (An im2col lane-concat + single matmul would contract k*C at once, but
    Mosaic rejects concatenating slices with mismatched sublane offsets —
    "result/input offset mismatch on non-concat dimension".)"""
    L, C = h.shape
    lout = L - (k - 1) * d
    hc = h.astype(cdt)
    acc = jnp.broadcast_to(bias[None, :], (lout, C)).astype(jnp.float32)
    for j in range(k):
        acc = acc + jnp.dot(
            hc[j * d : j * d + lout, :],
            w_flat[j * C : (j + 1) * C, :],
            preferred_element_type=jnp.float32,
        )
    return acc


# ---------------------------------------------------------------------------
# Packed small-C kernel: g = 128 // C time steps folded into lanes
# ---------------------------------------------------------------------------
def _packed_deltas(k: int, d: int, c: int, g: int):
    """Row-shift set for a same-aligned dilated conv in packed coords.

    Unpacked: out[t] = sum_j in[t + j*d - c*d]. Packed row q, phase p:
    source position offset u = p + j*d - c*d -> row shift delta = u // g,
    source phase p_in = u % g. Returns (deltas_sorted, placements) where
    placements[delta] = [(p_in, p_out, j), ...]."""
    placements = {}
    for p_out in range(g):
        for j in range(k):
            u = p_out + j * d - c * d
            delta = u // g  # floor division (u may be negative)
            p_in = u - delta * g
            placements.setdefault(delta, []).append((p_in, p_out, j))
    return sorted(placements), placements


def _packed_weights(w: jnp.ndarray, k: int, d: int, g: int, cdt):
    """w [k, C, C] -> (deltas, [n_delta, g*C, g*C]) block-Toeplitz weights
    for the packed same-conv out_packed[q] = sum_d in_packed[q+d] @ W_d."""
    C = w.shape[1]
    c = (k - 1) // 2
    deltas, placements = _packed_deltas(k, d, c, g)
    mats = []
    for delta in deltas:
        m = jnp.zeros((g * C, g * C), w.dtype)
        for (p_in, p_out, j) in placements[delta]:
            m = jax.lax.dynamic_update_slice(
                m, w[j], (p_in * C, p_out * C)
            )
        mats.append(m)
    return deltas, jnp.stack(mats).astype(cdt)


def _packed_conv(h, mats, deltas, bias, cdt):
    """Same-aligned packed conv. h [Q, gC] -> [Q - lo - hi, gC] where
    lo = -min(deltas), hi = max(deltas); output row q' corresponds to input
    row q' + lo (same base position, lo rows consumed on the left)."""
    lo, hi = -min(deltas), max(deltas)
    qo = h.shape[0] - lo - hi
    hc = h.astype(cdt)
    acc = jnp.broadcast_to(bias[None, :], (qo, h.shape[1])).astype(jnp.float32)
    for mat, delta in zip(mats, deltas):
        acc = acc + jnp.dot(
            hc[lo + delta : lo + delta + qo, :], mat,
            preferred_element_type=jnp.float32,
        )
    return acc


def _resblock_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                     kernel_size: int, dilations: Tuple[int, ...],
                     slope: float, tile: int, seq_len: int, cdt):
    i = pl.program_id(1)
    k = kernel_size
    c = (k - 1) // 2
    H = _halo(k, dilations)

    def lrelu(v):
        return jnp.where(v >= 0, v, v * slope)

    # every conv in the reference zero-pads at the SEQUENCE edges; inside the
    # halo the chain would otherwise propagate bias/residual values past the
    # edge, so zero everything outside [0, seq_len) before each conv input
    s0 = i * tile - H  # original coord of buffer position 0

    def edge_mask(h, start):
        coords = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + start
        inside = (coords >= 0) & (coords < seq_len)
        return jnp.where(inside, h, 0.0)

    cur = x_ref[0, 0, :, :].astype(jnp.float32)  # [ttp, C]
    consumed = 0
    for i_d, d in enumerate(dilations):
        shrink = c * d + c
        h = edge_mask(lrelu(cur), s0 + consumed)
        h = _conv_valid(h, w1_ref[i_d], b1_ref[i_d], k, d, cdt)
        h = edge_mask(lrelu(h), s0 + consumed + c * d)
        h = _conv_valid(h, w2_ref[i_d], b2_ref[i_d], k, 1, cdt)
        cur = cur[shrink:-shrink, :] + h
        consumed += shrink
    o_ref[0, :, :] = cur.astype(o_ref.dtype)


def fused_resblock(
    x: jnp.ndarray,  # [B, T, C]
    w1: jnp.ndarray,  # [n_d, k, C, C] flax Conv layout per tap
    b1: jnp.ndarray,  # [n_d, C]
    w2: jnp.ndarray,  # [n_d, k, C, C]
    b2: jnp.ndarray,  # [n_d, C]
    kernel_size: int,
    dilations: Tuple[int, ...] = (1, 3, 5),
    slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One HiFi-GAN MRF resblock, fused. Matches models/vocoder.ResBlock1
    ('same' zero padding) to compute-dtype roundoff."""
    if interpret is None:
        interpret = _auto_interpret()
    B, T, C = x.shape
    if C < 128 and 128 % C == 0:
        # packed lane layout: a single-block instance of the stage kernel
        return fused_upsample_stage(
            x, None, None, [(w1, b1, w2, b2, kernel_size, tuple(dilations))],
            slope=slope, compute_dtype=compute_dtype, tile_rows=tile,
            interpret=interpret,
        )
    n_d, k = w1.shape[0], kernel_size
    H = _halo(k, dilations)
    cdt = compute_dtype
    itemsize = jnp.dtype(cdt).itemsize
    if tile is None:
        tile = _pick_tile(C, k, dilations, itemsize)
    nt = pl.cdiv(T, tile)
    t_grid = nt * tile
    ttp = tile + 2 * H

    # zero-pad: H halo each side + round T up to the tile grid, then
    # materialize the overlapping halo windows in XLA (a ~1.05x gather) so
    # the kernel consumes standard non-overlapping blocks that Mosaic can
    # pipeline — manual HBM DMA requires 128-aligned minor dims (C here can
    # be 32/64), and concat/slice relayouts choke on mismatched offsets
    xp = jnp.pad(x, ((0, 0), (H, H + (t_grid - T)), (0, 0)))
    starts = jnp.arange(nt) * tile
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (0, s, 0), (B, ttp, C))
    )(starts)  # [nt, B, ttp, C]
    windows = windows.transpose(1, 0, 2, 3)  # [B, nt, ttp, C]

    # tap-major flat weights [n_d, k*C, C] in compute dtype (halves the VMEM
    # residency for the big C=256 stage); biases stay fp32
    w1f = w1.reshape(n_d, k * C, C).astype(cdt)
    w2f = w2.reshape(n_d, k * C, C).astype(cdt)

    kernel = functools.partial(
        _resblock_kernel, kernel_size=k, dilations=tuple(dilations),
        slope=slope, tile=tile, seq_len=T, cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, t_grid, C), x.dtype),
        grid=(B, nt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, ttp, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),  # halo window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 (whole, resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_d * B * t_grid * k * C * C,
            bytes_accessed=2 * B * t_grid * C * 4
            + 2 * n_d * k * C * C * itemsize,
            transcendentals=0,
        ),
    )(windows, w1f, b1.astype(jnp.float32), w2f, b2.astype(jnp.float32))
    return out[:, :T, :]


# ---------------------------------------------------------------------------
# Full generator: XLA glue (pre/post/upsample convs) + fused resblocks
# ---------------------------------------------------------------------------
def _conv1d(x, kernel, bias, pad: int, dilation: int = 1):
    # follow the activation dtype (bf16 io halves the inter-stage HBM
    # traffic; accumulation stays f32 via preferred_element_type)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias).astype(x.dtype)


def _conv_transpose1d(x, kernel, bias, stride: int, k: int, pad: int):
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, axis=0).astype(x.dtype), window_strides=(1,),
        padding=[(k - 1 - pad, k - 1 - pad)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias).astype(x.dtype)


def _stack_resblock_weights(blk, n_d: int):
    w1 = jnp.stack([blk[f"convs1_{i}"]["conv"]["kernel"] for i in range(n_d)])
    b1 = jnp.stack([blk[f"convs1_{i}"]["conv"]["bias"] for i in range(n_d)])
    w2 = jnp.stack([blk[f"convs2_{i}"]["conv"]["kernel"] for i in range(n_d)])
    b2 = jnp.stack([blk[f"convs2_{i}"]["conv"]["bias"] for i in range(n_d)])
    return w1, b1, w2, b2


# ---------------------------------------------------------------------------
# Stage-fused kernel: r=2 upsample + all 3 MRF resblocks + mean, one program
# ---------------------------------------------------------------------------
def _packed_upsample_weights(w: jnp.ndarray, r: int, g_in: int, g_out: int,
                             cdt):
    """Transposed-conv weights [k, C_in, C_out] (torch semantics,
    p = (k-r)/2, k % r == 0) -> (deltas, [n, g_in*C_in, g_out*C_out]) for
    the row-aligned packed upsample out_packed[q] = sum_d in_packed[q+d] @
    U_d. Requires g_out == r * g_in (then input and output row rates are
    identical, which holds for the C-halving r=2 HiFi-GAN stages)."""
    k, C_in, C_out = w.shape
    assert g_out == r * g_in and k % r == 0
    p_conv = (k - r) // 2
    a = k // r
    placements = {}
    for p_out in range(g_out):
        base = (p_out + p_conv) // r
        phi = (p_out + p_conv) % r
        for j in range(a):
            v = base - j
            delta = v // g_in
            p_in = v - delta * g_in
            placements.setdefault(delta, []).append(
                (p_in, p_out, phi + j * r)
            )
    deltas = sorted(placements)
    mats = []
    for delta in deltas:
        m = jnp.zeros((g_in * C_in, g_out * C_out), w.dtype)
        for (p_in, p_out, kappa) in placements[delta]:
            m = jax.lax.dynamic_update_slice(
                m, w[kappa], (p_in * C_in, p_out * C_out)
            )
        mats.append(m)
    return deltas, jnp.stack(mats).astype(cdt)


def _stage_kernel(x_ref, w_ref, b_ref, o_ref, *, ups_spec, block_specs,
                  h_left: int, slope: float, tile_rows: int, seq_out: int,
                  g_out: int, C_out: int, cdt):
    """lrelu -> r=2 upsample -> [3 parallel resblocks] -> mean.

    x_ref [1, 1, Qp, 128]: halo window of the PACKED stage input (g_in
    phases per row); input and output rows are 1:1 (g_out = r*g_in).
    o_ref [1, tile_rows, 128] packed output (g_out phases)."""
    i = pl.program_id(1)
    s0 = i * tile_rows - h_left  # row coord of buffer row 0

    def lrelu(v):
        return jnp.where(v >= 0, v, v * slope)

    def edge_mask(h, start_rows):
        rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) + start_rows
        lanes = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        pos = rows * g_out + lanes // C_out
        inside = (pos >= 0) & (pos < seq_out)
        return jnp.where(inside, h, 0.0)

    # upsample (input windows are zero-padded and lrelu(0)=0, so no input
    # mask is needed; the bias contamination beyond the sequence edge is
    # handled by the per-conv output-coordinate masks below). ups_spec=None
    # groups bare resblocks (+ mean) over an already-upsampled input.
    if ups_spec is not None:
        deltas_u, off_u, bidx_u = ups_spec
        base = _packed_conv(
            lrelu(x_ref[0, 0, :, :].astype(jnp.float32)),
            [w_ref[off_u + n] for n in range(len(deltas_u))],
            deltas_u, b_ref[bidx_u], cdt,
        )
        base_consumed = -min(deltas_u)  # rows consumed from the left edge
    else:
        base = x_ref[0, 0, :, :].astype(jnp.float32)
        base_consumed = 0

    acc = None
    for spec in block_specs:
        cur = base
        consumed = base_consumed
        for (deltas1, off1, bidx1), (deltas2, off2, bidx2) in spec:
            lo1 = -min(deltas1)
            lo2 = -min(deltas2)
            h = edge_mask(lrelu(cur), s0 + consumed)
            h = _packed_conv(
                h, [w_ref[off1 + n] for n in range(len(deltas1))],
                deltas1, b_ref[bidx1], cdt,
            )
            h = edge_mask(lrelu(h), s0 + consumed + lo1)
            h = _packed_conv(
                h, [w_ref[off2 + n] for n in range(len(deltas2))],
                deltas2, b_ref[bidx2], cdt,
            )
            cur = cur[lo1 + lo2 : lo1 + lo2 + h.shape[0], :] + h
            consumed += lo1 + lo2
        # align this block's output to the tile start (buffer row h_left)
        off = h_left - consumed
        sl = cur[off : off + tile_rows, :]
        acc = sl if acc is None else acc + sl
    o_ref[0, :, :] = (acc / len(block_specs)).astype(o_ref.dtype)


def fused_upsample_stage(
    x: jnp.ndarray,  # [B, T_in, C_in]
    ups_kernel: Optional[jnp.ndarray],  # [k_up, C_in, C_out] or None
    ups_bias: Optional[jnp.ndarray],  # [C_out] or None
    blocks,  # list of (w1 [n_d,k,C,C], b1, w2, b2, kernel_size, dilations)
    r: int = 2,
    slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    tile_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
    return_packed: bool = False,
) -> jnp.ndarray:
    """One HiFi-GAN stage — lrelu, ConvTranspose1d(stride r), 3 MRF
    resblocks, mean — as a single Pallas program. Only valid when
    C_out = C_in/2 divides 128 and g_out = r*g_in (the V1 tail stages).
    ups_kernel=None groups the resblocks + mean over an already-upsampled
    input (C_out = C_in; used for the C=128 stage whose r=8 upsample stays
    in XLA). Returns [B, T_in * r, C_out] (r treated as 1 when no ups);
    return_packed=True instead returns the raw lane-packed
    ([B, T_out // g_out, 128], g_out) so a consumer (packed_conv_post) can
    avoid the [T, C] relayout round trip entirely."""
    if interpret is None:
        interpret = _auto_interpret()
    B, T_in, C_in = x.shape
    cdt = compute_dtype

    mats = []
    biases = []
    off = 0

    if ups_kernel is not None:
        k_up, _, C_out = ups_kernel.shape
        g_in, g_out = 128 // C_in, 128 // C_out
        T_out = T_in * r
        deltas_u, m_u = _packed_upsample_weights(
            ups_kernel, r, g_in, g_out, cdt
        )
        ups_spec = (tuple(deltas_u), off, 0)
        mats.append(m_u)
        off += len(deltas_u)
        biases.append(jnp.tile(ups_bias, g_out))
        lo_u, hi_u = -min(deltas_u), max(deltas_u)
    else:
        C_out = C_in
        g_in = g_out = 128 // C_in
        T_out = T_in
        ups_spec = None
        lo_u = hi_u = 0

    block_specs = []
    max_l = max_r = 0
    for (w1, b1, w2, b2, k, dils) in blocks:
        spec = []
        l_rows = r_rows = 0
        for i_d, d in enumerate(dils):
            d1, m1 = _packed_weights(w1[i_d], k, d, g_out, cdt)
            d2, m2 = _packed_weights(w2[i_d], k, 1, g_out, cdt)
            spec.append(((tuple(d1), off, len(biases)),
                         (tuple(d2), off + len(d1), len(biases) + 1)))
            off += len(d1) + len(d2)
            mats.extend([m1, m2])
            biases.extend([jnp.tile(b1[i_d], g_out), jnp.tile(b2[i_d], g_out)])
            l_rows += -min(d1) - min(d2)
            r_rows += max(d1) + max(d2)
        block_specs.append(spec)
        max_l = max(max_l, l_rows)
        max_r = max(max_r, r_rows)

    w_all = jnp.concatenate(mats, axis=0)
    b_all = jnp.stack(biases).astype(jnp.float32)
    h_left = lo_u + max_l
    h_right = hi_u + max_r

    if tile_rows is None:
        w_bytes = w_all.shape[0] * 128 * 128 * jnp.dtype(cdt).itemsize
        tile_rows = 4096
        while tile_rows > 128:
            qp = tile_rows + h_left + h_right
            act = qp * 128 * 4 * 4 + qp * 128 * jnp.dtype(cdt).itemsize
            if w_bytes + act <= _VMEM_BUDGET:
                break
            tile_rows //= 2

    rows = pl.cdiv(T_in, g_in)  # == T_out // g_out when T_in % g_in == 0
    nt = pl.cdiv(rows, tile_rows)
    rows_grid = nt * tile_rows
    qp = tile_rows + h_left + h_right

    xp = jnp.pad(
        x,
        ((0, 0),
         (h_left * g_in,
          (rows_grid - rows) * g_in + h_right * g_in + (rows * g_in - T_in)),
         (0, 0)),
    ).reshape(B, h_left + rows_grid + h_right, 128)
    starts = jnp.arange(nt) * tile_rows
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (0, s, 0), (B, qp, 128))
    )(starts).transpose(1, 0, 2, 3)

    kernel = functools.partial(
        _stage_kernel, ups_spec=ups_spec, block_specs=block_specs,
        h_left=h_left, slope=slope, tile_rows=tile_rows, seq_out=T_out,
        g_out=g_out, C_out=C_out, cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows_grid, 128), x.dtype),
        grid=(B, nt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, qp, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * w_all.shape[0] * B * rows_grid * 128 * 128,
            bytes_accessed=2 * B * rows_grid * 128 * 4
            + w_all.shape[0] * 128 * 128 * jnp.dtype(cdt).itemsize,
            transcendentals=0,
        ),
    )(windows, w_all, b_all)
    if return_packed:
        assert T_out % g_out == 0
        return out[:, : T_out // g_out, :], g_out
    return out.reshape(B, rows_grid * g_out, C_out)[:, :T_out, :]


def packed_conv_post(
    y_packed: jnp.ndarray,  # [B, rows, 128] lane-packed (g phases x C ch)
    g: int,
    w_post: jnp.ndarray,  # [k, C, 1]
    b_post: jnp.ndarray,  # [1]
    slope: float,
    T_out: int,
) -> jnp.ndarray:
    """lrelu -> conv_post (k taps, same pad) -> tanh, consumed DIRECTLY in
    the packed-row layout and emitted as fully-packed waveform rows
    [B, T/128, 128] -> [B, T].

    Measured motive (BASELINE.md round-3 vocoder table): the unpacked
    conv_post costs 1.54 ms because XLA reads the [T, 32] input through
    128-lane-padded tiles (~4x traffic) after a relayout of the Pallas
    stage output. Expressing it as ONE strided conv over the packed rows —
    window (128/g + halo) rows, stride 128/g, a mostly-zero
    [W, 128, 128] kernel — reads the 50 MB once, MXU-shaped.

    Output lane l of coarse row R is waveform sample s = 128 R + l, which
    needs packed rows 128R/g + (l + j - c)//g for taps j (c = (k-1)//2):
    kernel[D, p_in*C + ch, l] = w_post[j, ch] with
    D = (l + j - c)//g + pad_l."""
    B, rows, _ = y_packed.shape
    C = 128 // g
    k = w_post.shape[0]
    c_half = (k - 1) // 2
    stride = 128 // g  # packed rows per 128-sample output row
    pad_l = -((0 + 0 - c_half) // g)  # halo rows left (l=0, j=0)
    d_max = (127 + (k - 1) - c_half) // g  # (l=127, j=k-1)
    window = d_max + pad_l + 1
    assert T_out % 128 == 0 and rows == T_out // g

    # static scatter indices for the sparse big kernel
    import numpy as np_

    D_idx, in_idx, out_idx, src_j, src_c = [], [], [], [], []
    for l in range(128):
        for j in range(k):
            u = l + j - c_half
            D = u // g + pad_l
            p_in = u % g
            for ch in range(C):
                D_idx.append(D)
                in_idx.append(p_in * C + ch)
                out_idx.append(l)
                src_j.append(j)
                src_c.append(ch)
    big = jnp.zeros((window, 128, 128), w_post.dtype)
    big = big.at[
        np_.asarray(D_idx), np_.asarray(in_idx), np_.asarray(out_idx)
    ].add(w_post[np_.asarray(src_j), np_.asarray(src_c), 0])

    h = jnp.where(y_packed >= 0, y_packed, y_packed * slope)
    out_rows = T_out // 128
    # VALID conv over padded rows: row padding supplies the zero halo the
    # sequence-edge semantics require (positions < 0 / >= T_out are zero)
    pad_r = window - pad_l - stride + (stride - rows % stride) % stride
    wav = jax.lax.conv_general_dilated(
        h, big.astype(h.dtype), window_strides=(stride,),
        padding=[(pad_l, pad_r)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )[:, :out_rows, :]
    wav = jnp.tanh(wav + b_post[0])
    return wav.reshape(B, out_rows * 128)[:, :T_out]


def _xla_resblock(x, w1, b1, w2, b2, k: int, dilations, slope: float):
    """Plain-XLA MRF resblock (same math as models/vocoder.ResBlock1) for
    channel widths where XLA already runs near the MXU roofline (C=256
    measured at ~150 TF/s; the Pallas kernel loses there because the
    stacked weights force VMEM-starved tiny tiles)."""
    c = (k - 1) // 2
    for i, d in enumerate(dilations):
        h = jnp.where(x >= 0, x, x * slope)
        h = _conv1d(h, w1[i], b1[i], pad=c * d, dilation=d)
        h = jnp.where(h >= 0, h, h * slope)
        h = _conv1d(h, w2[i], b2[i], pad=c)
        x = x + h
    return x


# resblocks at/above this width run on XLA inside hifigan_apply_fused
_PALLAS_MAX_CHANNELS = 128


def hifigan_apply_fused(
    params,
    mel: jnp.ndarray,  # [B, T, n_mels]
    cfg=None,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    io_dtype=None,
) -> jnp.ndarray:
    """Generator forward over the UNCHANGED HiFiGANGenerator param tree,
    with the MRF resblocks at C <= 128 fused into Pallas kernels (packed
    into full 128-lane rows below C=128). Returns the waveform
    [B, T * total_upsample] like HiFiGANGenerator.__call__ (float32).

    Measured v5e device-time per resblock (slope method, full V1 geometry,
    BASELINE.md): C=32: 7.0-8.3 ms XLA -> 1.7-2.3 ms packed; C=64: 4.0-4.4
    -> 1.3-1.8; C=128: 2.4-3.6 -> 0.4-1.9; C=256 stays XLA (~150 TF/s
    already).

    io_dtype (e.g. jnp.bfloat16) sets the INTER-stage activation dtype:
    the generator is bandwidth-bound, so bf16 io halves the HBM traffic of
    the XLA stages and every kernel's in/out blocks (accumulation stays
    f32 inside kernels and via preferred_element_type in the XLA convs).
    None = follow mel's dtype (f32 callers keep exact round-2 parity)."""
    from audio_calm_tpu.models.vocoder import HiFiGANConfig

    cfg = cfg or HiFiGANConfig()
    p = params["params"] if "params" in params else params
    slope = cfg.lrelu_slope
    if io_dtype is not None:
        mel = mel.astype(io_dtype)

    def lrelu(v):
        return jnp.where(v >= 0, v, v * slope)

    x = _conv1d(mel, p["conv_pre"]["conv"]["kernel"],
                p["conv_pre"]["conv"]["bias"], pad=3)
    n_stages = len(cfg.upsample_rates)
    for i, (r, k_up) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        C_in = x.shape[-1]
        C_out = C_in // 2
        if (r == 2 and k_up % r == 0 and 2 * ((k_up - r) // 2) == k_up - r
                and C_in <= 128 and 128 % C_in == 0):
            # whole stage (lrelu + x2 upsample + 3 resblocks + mean) in ONE
            # program: the tail stages are where per-op HBM round trips and
            # repeated pack/unpack dominate
            blocks = [
                _stack_resblock_weights(p[f"resblocks_{i}_{j}"], len(rd))
                + (rk, tuple(rd))
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
                )
            ]
            last = i == n_stages - 1
            T_final = x.shape[1] * r
            x = fused_upsample_stage(
                x, p[f"ups_{i}"]["kernel"], p[f"ups_{i}"]["bias"], blocks,
                r=r, slope=slope, compute_dtype=compute_dtype,
                interpret=interpret,
                return_packed=last and T_final % 128 == 0,
            )
            if isinstance(x, tuple):
                # final stage stayed lane-packed: conv_post consumes the
                # packed rows directly (measured 1.54 ms -> MXU-strided
                # read of the same 50 MB; BASELINE.md round-3 table)
                y_packed, g = x
                return packed_conv_post(
                    y_packed, g, p["conv_post"]["conv"]["kernel"],
                    p["conv_post"]["conv"]["bias"], slope, T_final,
                )
            continue
        x = lrelu(x)
        x = _conv_transpose1d(
            x, p[f"ups_{i}"]["kernel"], p[f"ups_{i}"]["bias"],
            stride=r, k=k_up, pad=(k_up - r) // 2,
        )
        if C_out <= _PALLAS_MAX_CHANNELS and 128 % C_out == 0:
            # grouped kernel: 3 resblocks + mean, one program (the x2
            # upsample could not be folded in for this stage's rate)
            blocks = [
                _stack_resblock_weights(p[f"resblocks_{i}_{j}"], len(rd))
                + (rk, tuple(rd))
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
                )
            ]
            x = fused_upsample_stage(
                x, None, None, blocks, slope=slope,
                compute_dtype=compute_dtype, interpret=interpret,
            )
            continue
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
        ):
            w1, b1, w2, b2 = _stack_resblock_weights(
                p[f"resblocks_{i}_{j}"], len(rd)
            )
            if x.shape[-1] > _PALLAS_MAX_CHANNELS:
                h = _xla_resblock(x, w1, b1, w2, b2, rk, tuple(rd), slope)
            else:
                h = fused_resblock(
                    x, w1, b1, w2, b2, kernel_size=rk, dilations=tuple(rd),
                    slope=slope, compute_dtype=compute_dtype,
                    interpret=interpret,
                )
            acc = h if acc is None else acc + h
        x = acc / len(cfg.resblock_kernel_sizes)
    x = lrelu(x)
    x = _conv1d(x, p["conv_post"]["conv"]["kernel"],
                p["conv_post"]["conv"]["bias"], pad=3)
    return jnp.tanh(x.astype(jnp.float32))[..., 0]
