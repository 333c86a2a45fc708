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
