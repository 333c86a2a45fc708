import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import VAEModelConfig
from audio_calm_tpu.models.vae import AcousticVAE, multires_stft_loss, pad_to_stride
from audio_calm_tpu.ops.ssim import ssim_loss


def tiny_cfg(**kw):
    d = dict(in_channels=80, hidden_channels=64, latent_channels=16,
             strides=[2, 2], norm_num_groups=8)
    d.update(kw)
    return VAEModelConfig(**d)


def test_vae_shapes_and_loss_finite():
    cfg = tiny_cfg()
    model = AcousticVAE(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 80)) * 3 - 6,
                      dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                        mel, train=False)
    out = model.apply(params, mel, train=False)
    assert out["z"].shape == (2, 16, 16)       # 4x time compression
    assert out["recon_mel"].shape == (2, 64, 80)
    for k in ("loss", "rec_loss", "ssim_loss", "stft_loss", "kl_loss"):
        assert np.isfinite(float(out[k])), k

    # train mode uses noise + dropout rngs
    out_t = model.apply(params, mel, train=True,
                        rngs={"noise": jax.random.PRNGKey(2),
                              "dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out_t["loss"]))


def test_vae_encode_decode_methods():
    cfg = tiny_cfg()
    model = AcousticVAE(cfg)
    mel = jnp.zeros((1, 32, 80))
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                        mel, train=False)
    mu, logvar = model.apply(params, mel, method=AcousticVAE.encode)
    assert mu.shape == (1, 8, 16) and logvar.shape == (1, 8, 16)
    recon = model.apply(params, mu, method=AcousticVAE.decode)
    assert recon.shape == (1, 32, 80)


def test_pad_to_stride():
    mel = jnp.ones((1, 61, 80))
    padded = pad_to_stride(mel, 4)
    assert padded.shape == (1, 64, 80)
    assert pad_to_stride(jnp.ones((1, 64, 80)), 4).shape == (1, 64, 80)


def test_ssim_identical_is_zero_and_matches_torch_conv2d():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 80, 64)).astype(np.float32)
    assert float(ssim_loss(jnp.asarray(a), jnp.asarray(a))) < 1e-5

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import math

    b = (a + 0.3 * rng.standard_normal(a.shape)).astype(np.float32)
    ours = float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))

    # independent torch 2-D gaussian-window SSIM
    g = torch.tensor([math.exp(-((i - 5) ** 2) / (2 * 1.5**2)) for i in range(11)])
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).view(1, 1, 11, 11)
    i1 = torch.from_numpy(a).unsqueeze(1)
    i2 = torch.from_numpy(b).unsqueeze(1)
    mu1 = F.conv2d(i1, win, padding=5)
    mu2 = F.conv2d(i2, win, padding=5)
    s1 = F.conv2d(i1 * i1, win, padding=5) - mu1**2
    s2 = F.conv2d(i2 * i2, win, padding=5) - mu2**2
    s12 = F.conv2d(i1 * i2, win, padding=5) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    ref = float(1 - smap.mean())
    assert abs(ours - ref) < 1e-4


def test_multires_stft_loss_zero_for_identical_and_positive_otherwise():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 256, 8)), dtype=jnp.float32)
    assert float(multires_stft_loss(x, x)) == 0.0
    y = x + 0.5
    assert float(multires_stft_loss(x, y)) > 0.0
    # short sequences: specs with n_fft > T are dropped (reference behavior)
    xs = x[:, :100]
    assert np.isfinite(float(multires_stft_loss(xs, xs + 0.1)))


def test_masked_encode_matches_exact_length():
    """Encoder(mask=...) makes a padded row produce the same latents as the
    exact-length encode: GroupNorm stats restrict to valid frames and
    activations re-zero before each conv (the batched serving frontend's
    contract). Valid lengths must be multiples of total_stride."""
    cfg = VAEModelConfig(hidden_channels=64, latent_channels=8,
                         norm_num_groups=8)
    vae = AcousticVAE(cfg)
    params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    stride = cfg.total_stride
    rng = np.random.default_rng(0)
    T_pad = 48
    for T in (48, 44, 24, 8):
        assert T % stride == 0
        mel = rng.standard_normal((1, T, 80)).astype(np.float32)
        mu_x, lv_x = vae.apply(params, jnp.asarray(mel),
                               method=AcousticVAE.encode)
        buf = np.zeros((1, T_pad, 80), np.float32)
        buf[:, :T] = mel
        mask = (np.arange(T_pad) < T)[None, :, None]
        mu_m, lv_m = vae.apply(params, jnp.asarray(buf), jnp.asarray(mask),
                               method=AcousticVAE.encode)
        n_lat = T // stride
        np.testing.assert_allclose(np.asarray(mu_m)[:, :n_lat],
                                   np.asarray(mu_x), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_m)[:, :n_lat],
                                   np.asarray(lv_x), rtol=1e-4, atol=1e-5)


def test_masked_decode_matches_exact_length():
    """Decoder(mask=...): decoding grid-padded latents (pad = ODE noise)
    must produce the exact-length decode on the valid frames — the
    renderer's contract (decoder GroupNorm normalizes over time, so
    unmasked padding shifts the whole utterance, differently per grid)."""
    cfg = VAEModelConfig(hidden_channels=64, latent_channels=8,
                         norm_num_groups=8)
    vae = AcousticVAE(cfg)
    params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    rng = np.random.default_rng(1)
    for n, grid in ((5, 12), (12, 12), (3, 24)):
        lat = rng.standard_normal((1, n, 8)).astype(np.float32)
        exact = np.asarray(vae.apply(params, jnp.asarray(lat),
                                     method=AcousticVAE.decode))
        buf = rng.standard_normal((1, grid, 8)).astype(np.float32)
        buf[:, :n] = lat
        mask = (np.arange(grid) < n)[None, :, None]
        out = np.asarray(vae.apply(params, jnp.asarray(buf),
                                   jnp.asarray(mask),
                                   method=AcousticVAE.decode))
        np.testing.assert_allclose(out[:, : exact.shape[1]], exact,
                                   rtol=1e-4, atol=1e-5)
