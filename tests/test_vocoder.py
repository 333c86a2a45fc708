import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import MelConfig
from audio_calm_tpu.models.vocoder import (
    GriffinLimVocoder,
    HiFiGANConfig,
    HiFiGANGenerator,
    convert_hifigan,
    fold_weight_norm,
    griffin_lim,
    _istft,
)
from audio_calm_tpu.ops.mel import MelFrontend, stft_power


TINY = HiFiGANConfig(
    in_channels=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 5),
    resblock_dilations=((1, 2), (1, 2)),
)


def test_hifigan_shapes():
    gen = HiFiGANGenerator(TINY)
    mel = jnp.zeros((2, 10, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 160)  # 10 * 4 * 4
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_fold_weight_norm():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((4, 3, 5)).astype(np.float32)
    g = rng.standard_normal((4, 1, 1)).astype(np.float32)
    w = fold_weight_norm(g, v)
    norms = np.sqrt((w**2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, np.abs(g[:, 0, 0]), rtol=1e-5)


def _build_tiny_torch_gen(cfg):
    """Tiny torch HiFi-GAN generator (independent impl of the published
    architecture); returns the eval-mode module."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    class TRes(tnn.Module):
        def __init__(self, ch, k, dil):
            super().__init__()
            self.convs1 = tnn.ModuleList(
                [weight_norm(tnn.Conv1d(ch, ch, k, dilation=d,
                                        padding=d * (k - 1) // 2)) for d in dil]
            )
            self.convs2 = tnn.ModuleList(
                [weight_norm(tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
                 for _ in dil]
            )

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                h = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
                x = x + h
            return x

    class TGen(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = cfg.upsample_initial_channel
            self.conv_pre = weight_norm(tnn.Conv1d(cfg.in_channels, ch, 7, padding=3))
            self.ups = tnn.ModuleList()
            self.resblocks = tnn.ModuleList()
            for r, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
                self.ups.append(
                    weight_norm(tnn.ConvTranspose1d(ch, ch // 2, k, r,
                                                    padding=(k - r) // 2))
                )
                ch //= 2
                for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
                    self.resblocks.append(TRes(ch, rk, rd))
            self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, padding=3))

        def forward(self, x):
            x = self.conv_pre(x)
            nk = len(cfg.resblock_kernel_sizes)
            for i, up in enumerate(self.ups):
                x = F.leaky_relu(x, 0.1)
                x = up(x)
                acc = None
                for j in range(nk):
                    h = self.resblocks[i * nk + j](x)
                    acc = h if acc is None else acc + h
                x = acc / nk
            x = F.leaky_relu(x, 0.1)
            return torch.tanh(self.conv_post(x))

    torch.manual_seed(0)
    return TGen().eval()


def test_hifigan_torch_parity():
    """Compare our generator against the torch reference after conversion."""
    torch = pytest.importorskip("torch")

    cfg = TINY
    tg = _build_tiny_torch_gen(cfg)
    mel = np.random.default_rng(0).standard_normal((1, 6, cfg.in_channels)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()

    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = {"params": convert_hifigan(sd, cfg)}
    gen = HiFiGANGenerator(cfg)
    ours = np.asarray(gen.apply(params, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_load_vocoder_torch_file(tmp_path):
    """load_vocoder on a torch .bin selects the HiFi-GAN path (not GL) and
    matches the torch generator output — the product-path wiring the
    reference gets from SpeechBrain (eval_calm.py:175-181)."""
    torch = pytest.importorskip("torch")
    from audio_calm_tpu.models.vocoder import HiFiGANVocoder, load_vocoder

    tg = _build_tiny_torch_gen(TINY)
    p = tmp_path / "generator.bin"
    torch.save(tg.state_dict(), str(p))

    voc = load_vocoder(str(p), TINY)
    assert isinstance(voc, HiFiGANVocoder)

    mel = np.random.default_rng(1).standard_normal((1, 6, TINY.in_channels)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
    ours = np.asarray(voc(jnp.asarray(mel)))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_load_vocoder_speechbrain_dir(tmp_path):
    """SpeechBrain-style savedir (generator.ckpt, wrapper-prefixed keys)."""
    torch = pytest.importorskip("torch")
    from audio_calm_tpu.models.vocoder import HiFiGANVocoder, load_vocoder

    tg = _build_tiny_torch_gen(TINY)
    sd = {"generator." + k: v for k, v in tg.state_dict().items()}
    torch.save(sd, str(tmp_path / "generator.ckpt"))

    voc = load_vocoder(str(tmp_path), TINY)
    assert isinstance(voc, HiFiGANVocoder)
    wav = np.asarray(voc(jnp.zeros((1, 5, TINY.in_channels))))
    assert wav.shape == (1, 5 * TINY.total_upsample)
    assert np.isfinite(wav).all()


def test_load_vocoder_fallback(tmp_path):
    from audio_calm_tpu.models.vocoder import load_vocoder

    assert isinstance(load_vocoder(None), GriffinLimVocoder)
    assert isinstance(
        load_vocoder(str(tmp_path / "missing.bin")), GriffinLimVocoder
    )
    assert isinstance(load_vocoder(str(tmp_path)), GriffinLimVocoder)


def test_istft_roundtrip():
    """stft -> istft reconstructs the signal (COLA with hann, hop=n_fft/4)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3
    n_fft, hop = 512, 128
    from audio_calm_tpu.ops.mel import _dft_basis, frame_signal

    xp = jnp.pad(jnp.asarray(x), ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    fr = frame_signal(xp, n_fft, hop)
    C, S = _dft_basis(n_fft, n_fft)
    re, im = fr @ jnp.asarray(C), fr @ jnp.asarray(S)
    y = _istft(re, im, n_fft, hop, 4096)
    err = np.max(np.abs(np.asarray(y)[:, 256:-256] - x[:, 256:-256]))
    assert err < 1e-3, err


def test_griffin_lim_recovers_sine():
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag = stft_power(jnp.asarray(x), 1024, 256, power=1.0)
    y = np.asarray(griffin_lim(mag, 1024, 256, n_iter=24))
    # spectral peak preserved
    Y = np.abs(np.fft.rfft(y[0] * np.hanning(len(y[0]))))
    peak = np.argmax(Y) * sr / len(y[0])
    assert abs(peak - 440) < 10, peak


def test_griffin_lim_vocoder_end_to_end():
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None]
    mel = MelFrontend(MelConfig())(jnp.asarray(x))
    voc = GriffinLimVocoder()
    wav = np.asarray(voc(mel))
    assert wav.shape[0] == 1 and wav.shape[1] > 15000
    assert np.isfinite(wav).all()
    Y = np.abs(np.fft.rfft(wav[0] * np.hanning(wav.shape[1])))
    peak = np.argmax(Y) * sr / wav.shape[1]
    assert abs(peak - 330) < 15, peak


def test_make_renderer_matches_manual_path():
    """Fused renderer == manual decode -> denorm -> vocoder -> slice."""
    import jax

    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.render import SAMPLES_PER_FRAME, make_renderer
    from audio_calm_tpu.models.vae import AcousticVAE, denormalize_mel

    cfg = VAEModelConfig(hidden_channels=16, latent_channels=4,
                         norm_num_groups=4)
    vae = AcousticVAE(cfg)
    params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    voc = GriffinLimVocoder(n_iter=4)
    render = make_renderer(vae, params, cfg, voc)

    lat = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)
    n = 10
    wav = render(lat, n)
    assert wav.shape[0] <= n * SAMPLES_PER_FRAME
    assert np.isfinite(wav).all()

    # the renderer's contract: masked decode == exact-length decode of
    # lat[:n], invalid mel zeroed (what the vocoder's conv padding reads
    # at an exact-length boundary) — build that input manually at the
    # same grid (GL's phase-init field is shape-dependent) and compare
    mel_exact = denormalize_mel(
        vae.apply(params, jnp.asarray(lat[:n])[None],
                  method=AcousticVAE.decode),
        cfg,
    )
    mel_pad = np.zeros((1, 4 * lat.shape[0], 80), np.float32)
    mel_pad[:, : 4 * n] = np.asarray(mel_exact)
    manual = np.asarray(voc(jnp.asarray(mel_pad)))[0][: n * SAMPLES_PER_FRAME]
    np.testing.assert_allclose(wav, manual[: len(wav)], atol=1e-5)


def test_make_renderer_hifigan_path():
    import jax

    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.render import SAMPLES_PER_FRAME, make_renderer
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.models.vocoder import HiFiGANVocoder

    # tiny hifigan with total upsample 16 != 1024: renderer still slices by
    # latent frames (mel 4x * hop) — use the real ratio config instead
    cfg_v = HiFiGANConfig(in_channels=80, upsample_initial_channel=16,
                          upsample_rates=(8, 8, 2, 2),
                          upsample_kernel_sizes=(16, 16, 4, 4),
                          resblock_kernel_sizes=(3,),
                          resblock_dilations=((1, 2),))
    gen = HiFiGANGenerator(cfg_v)
    p = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)))
    voc = HiFiGANVocoder(p["params"], cfg_v)

    vcfg = VAEModelConfig(hidden_channels=16, latent_channels=4,
                          norm_num_groups=4)
    vae = AcousticVAE(vcfg)
    vp = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    render = make_renderer(vae, vp, vcfg, voc)
    lat = np.zeros((8, 4), np.float32)
    wav = render(lat, 5)
    assert wav.shape == (5 * SAMPLES_PER_FRAME,)
    assert np.isfinite(wav).all()
