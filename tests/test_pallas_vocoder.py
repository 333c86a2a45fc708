"""Fused Pallas vocoder kernels vs the flax reference modules (interpret
mode on the CPU mesh). Perf rationale and TPU measurements: BASELINE.md."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.models.vocoder import (
    HiFiGANConfig,
    HiFiGANGenerator,
    ResBlock1,
)
from audio_calm_tpu.ops.pallas_vocoder import (
    _halo,
    _stack_resblock_weights,
    fused_resblock,
    hifigan_apply_fused,
)


@pytest.mark.parametrize(
    "C,k,dils,T,tile",
    [
        (16, 3, (1, 3, 5), 700, 256),   # several tiles + ragged tail
        (16, 11, (1, 3, 5), 200, 128),  # big halo (H=60) vs small tile
        (32, 7, (1, 3, 5), 96, 96),     # single tile exactly
        (16, 3, (1, 2), 130, 64),       # non-default dilation set
        (24, 3, (1, 3, 5), 130, 64),    # 128 % C != 0 -> unpacked kernel
        (64, 3, (1, 3, 5), 96, 32),     # packed g=2
    ],
)
def test_fused_resblock_matches_flax(C, k, dils, T, tile):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
    m = ResBlock1(C, k, dils)
    p = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(p, x)
    w1, b1, w2, b2 = _stack_resblock_weights(p["params"], len(dils))
    out = fused_resblock(
        x, w1, b1, w2, b2, kernel_size=k, dilations=dils,
        compute_dtype=jnp.float32, tile=tile, interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_resblock_edge_zero_padding_semantics():
    """The sequence edges must see ZEROS at every conv (torch 'same'
    padding), not halo values propagated through bias/lrelu — compare the
    first/last H frames specifically."""
    rng = np.random.default_rng(1)
    C, k, dils = 8, 3, (1, 3, 5)
    T = 64
    H = _halo(k, dils)
    x = jnp.asarray(rng.standard_normal((1, T, C)), jnp.float32)
    m = ResBlock1(C, k, dils)
    p = m.init(jax.random.PRNGKey(2), x)
    ref = np.asarray(m.apply(p, x))
    w1, b1, w2, b2 = _stack_resblock_weights(p["params"], len(dils))
    out = np.asarray(fused_resblock(
        x, w1, b1, w2, b2, kernel_size=k, dilations=dils,
        compute_dtype=jnp.float32, tile=32, interpret=True,
    ))
    np.testing.assert_allclose(out[0, :H], ref[0, :H], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[0, -H:], ref[0, -H:], rtol=1e-5, atol=1e-5)


def test_hifigan_apply_fused_matches_generator():
    cfg = HiFiGANConfig(
        upsample_initial_channel=32,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 2), (2, 6)),
    )
    gen = HiFiGANGenerator(cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 50, 80)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(4), mel)
    ref = gen.apply(params, mel)
    out = hifigan_apply_fused(params, mel, cfg, compute_dtype=jnp.float32,
                              interpret=True)
    assert out.shape == ref.shape == (2, 50 * 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # bf16 compute stays a faithful waveform (tanh-squashed)
    out_bf = hifigan_apply_fused(params, mel, cfg,
                                 compute_dtype=jnp.bfloat16, interpret=True)
    assert float(jnp.max(jnp.abs(out_bf - ref))) < 5e-3
    # bf16 INTER-STAGE io (AUDIO_CALM_VOCODER_IO=bf16): f32 output, still
    # faithful (flagship-geometry parity on chip: 0.26% rel-L2, round 5)
    out_io = hifigan_apply_fused(params, mel, cfg, io_dtype=jnp.bfloat16,
                                 interpret=True)
    assert out_io.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out_io - ref))) < 2e-2


def test_hifigan_vocoder_fused_flag_matches():
    """The HiFiGANVocoder(fused=True) wrapper (product path via
    eval.render) matches the XLA wrapper on the same params."""
    from audio_calm_tpu.models.vocoder import HiFiGANVocoder

    cfg = HiFiGANConfig(
        upsample_initial_channel=32,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 2), (2, 6)),
    )
    gen = HiFiGANGenerator(cfg)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(6), mel)["params"]
    v_x = HiFiGANVocoder(params, cfg, fused=False)
    v_f = HiFiGANVocoder(params, cfg, fused=True)
    wx, wf = np.asarray(v_x(mel)), np.asarray(v_f(mel))
    assert wx.shape == wf.shape == (1, 320)
    assert np.max(np.abs(wx - wf)) < 5e-3


def test_fused_upsample_stage_matches_flax():
    """The one-program stage (lrelu + x2 ConvTranspose + 3 MRF resblocks +
    mean) must match the module-by-module flax computation."""
    from audio_calm_tpu.models.layers import ConvTranspose1d
    from audio_calm_tpu.ops.pallas_vocoder import fused_upsample_stage

    rng = np.random.default_rng(7)
    B, T_in, C_in = 2, 70, 32
    C_out, r, k_up = 16, 2, 4
    x = jnp.asarray(rng.standard_normal((B, T_in, C_in)), jnp.float32)

    ups = ConvTranspose1d(C_out, k_up, stride=r, padding=(k_up - r) // 2)
    ups_p = ups.init(jax.random.PRNGKey(0), x)
    ref = ups.apply(ups_p, jnp.where(x >= 0, x, x * 0.1))

    blocks, acc = [], None
    for bi, (k, dils) in enumerate([(3, (1, 3, 5)), (7, (1, 3, 5)),
                                    (3, (1, 2))]):
        m = ResBlock1(C_out, k, dils)
        p = m.init(jax.random.PRNGKey(bi + 1), ref)
        h = m.apply(p, ref)
        acc = h if acc is None else acc + h
        w1, b1, w2, b2 = _stack_resblock_weights(p["params"], len(dils))
        blocks.append((w1, b1, w2, b2, k, dils))
    ref_out = acc / 3

    out = fused_upsample_stage(
        x, ups_p["params"]["kernel"], ups_p["params"]["bias"], blocks,
        r=r, compute_dtype=jnp.float32, tile_rows=16, interpret=True,
    )
    assert out.shape == ref_out.shape == (B, T_in * r, C_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


def test_hifigan_apply_fused_with_stage_fusion():
    """Full generator with C-halving r=2 stages routed through
    fused_upsample_stage matches the flax generator."""
    cfg = HiFiGANConfig(
        upsample_initial_channel=64,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 2), (2, 6)),
    )
    gen = HiFiGANGenerator(cfg)
    rng = np.random.default_rng(8)
    mel = jnp.asarray(rng.standard_normal((1, 60, 80)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(9), mel)
    ref = gen.apply(params, mel)
    out = hifigan_apply_fused(params, mel, cfg, compute_dtype=jnp.float32,
                              interpret=True)
    assert out.shape == ref.shape == (1, 240)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_post_matches_generator():
    """When the final stage is fused and T % 128 == 0, conv_post consumes
    the lane-packed stage output directly (packed_conv_post) — waveform
    must still match the flax generator exactly (round-3 tail fold)."""
    for init_ch in (64, 128):  # final C=16 (g=8) and C=32 (g=4)
        cfg = HiFiGANConfig(
            upsample_initial_channel=init_ch,
            upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4),
            resblock_kernel_sizes=(3, 5),
            resblock_dilations=((1, 2), (2, 6)),
        )
        gen = HiFiGANGenerator(cfg)
        rng = np.random.default_rng(11)
        mel = jnp.asarray(rng.standard_normal((2, 64, 80)), jnp.float32)
        params = gen.init(jax.random.PRNGKey(12), mel)
        ref = gen.apply(params, mel)
        out = hifigan_apply_fused(params, mel, cfg,
                                  compute_dtype=jnp.float32, interpret=True)
        assert out.shape == ref.shape == (2, 256), out.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_grouped_resblocks_no_upsample_matches_flax():
    """ups_kernel=None: bare [3 resblocks + mean] grouping (used for the
    C=128 stage whose r=8 upsample stays in XLA)."""
    from audio_calm_tpu.ops.pallas_vocoder import fused_upsample_stage

    rng = np.random.default_rng(10)
    B, T, C = 1, 75, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    blocks, acc = [], None
    for bi, (k, dils) in enumerate([(3, (1, 3, 5)), (5, (1, 2))]):
        m = ResBlock1(C, k, dils)
        p = m.init(jax.random.PRNGKey(20 + bi), x)
        h = m.apply(p, x)
        acc = h if acc is None else acc + h
        w1, b1, w2, b2 = _stack_resblock_weights(p["params"], len(dils))
        blocks.append((w1, b1, w2, b2, k, dils))
    ref = acc / 2
    out = fused_upsample_stage(x, None, None, blocks,
                               compute_dtype=jnp.float32, tile_rows=8,
                               interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
