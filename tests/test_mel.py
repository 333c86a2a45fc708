"""Frontend parity: our STFT vs torch.stft, our filterbank vs the published
slaney formula implemented independently in torch."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_calm_tpu.config import MelConfig
from audio_calm_tpu.ops.mel import (
    MelFrontend,
    frame_signal,
    hann_window,
    mel_filterbank,
    process_audio_chunk,
    stft_power,
)

torch = pytest.importorskip("torch")


def _torch_slaney_fb(n_freqs=513, n_mels=80, sr=16000, f_min=0.0, f_max=8000.0):
    """Independent torch implementation of the slaney filterbank formula."""

    def hz2mel(f):
        f = torch.as_tensor(f, dtype=torch.float64)
        mels = f / (200.0 / 3)
        logstep = float(np.log(6.4) / 27.0)
        return torch.where(f >= 1000.0, 15.0 + torch.log(f / 1000.0) / logstep, mels)

    def mel2hz(m):
        m = torch.as_tensor(m, dtype=torch.float64)
        logstep = float(np.log(6.4) / 27.0)
        return torch.where(m >= 15.0, 1000.0 * torch.exp(logstep * (m - 15.0)), m * (200.0 / 3))

    all_freqs = torch.linspace(0, sr / 2, n_freqs, dtype=torch.float64)
    m_pts = torch.linspace(hz2mel(f_min).item(), hz2mel(f_max).item(), n_mels + 2, dtype=torch.float64)
    f_pts = mel2hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    return (fb * enorm.unsqueeze(0)).float()


def test_filterbank_matches_independent_torch_formula():
    ours = mel_filterbank(513, 80, 16000, 0.0, 8000.0)
    ref = _torch_slaney_fb().numpy()
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    ref = torch.hann_window(1024).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-6


def test_frame_signal_fast_path_equals_gather():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096)), dtype=jnp.float32)
    fast = frame_signal(x, 1024, 256)
    idx = np.arange((4096 - 1024) // 256 + 1)[:, None] * 256 + np.arange(1024)[None, :]
    ref = np.asarray(x)[:, idx]
    assert np.allclose(np.asarray(fast), ref)


def test_stft_power_matches_torch_stft():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(stft_power(jnp.asarray(wav), 1024, 256, center=True, pad_mode="reflect"))
    w = torch.hann_window(1024)
    X = torch.stft(
        torch.from_numpy(wav), 1024, 256, window=w, center=True,
        pad_mode="reflect", return_complex=True, normalized=False,
    )
    ref = (X.abs() ** 2).transpose(1, 2).numpy()  # [B, frames, bins]
    assert ours.shape == ref.shape
    denom = np.maximum(np.abs(ref), 1e-3)
    assert np.max(np.abs(ours - ref) / denom) < 1e-3


def test_log_mel_matches_torch_composition():
    """Full frontend vs torch.stft + independent slaney fb + ln clamp."""
    rng = np.random.default_rng(2)
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
           + 0.1 * rng.standard_normal(16000)).astype(np.float32)
    fe = MelFrontend(MelConfig())
    ours = np.asarray(fe(jnp.asarray(wav[None])))[0]

    w = torch.hann_window(1024)
    X = torch.stft(torch.from_numpy(wav[None]), 1024, 256, window=w, center=True,
                   pad_mode="reflect", return_complex=True, normalized=False)
    spec = (X.abs() ** 2)  # [1, bins, frames]
    fb = _torch_slaney_fb()
    mel = torch.matmul(spec.transpose(1, 2), fb)  # [1, frames, mels]
    ref = torch.log(torch.clamp(mel, min=1e-5))[0].numpy()
    assert ours.shape == ref.shape
    # BASELINE.md target: <=1e-3 mel-L1 vs the torch reference path
    assert np.mean(np.abs(ours - ref)) < 1e-3
    # value floor matches reference ln clamp (~ -11.5)
    assert ours.min() >= np.log(1e-5) - 1e-6


def test_process_audio_chunk():
    wav = jnp.asarray(np.stack([np.ones(100), -np.ones(100)]), dtype=jnp.float32)
    out = process_audio_chunk(wav)
    assert out.shape == (100,)
    loud = jnp.asarray(10.0 * np.random.default_rng(3).standard_normal(256), jnp.float32)
    out2 = process_audio_chunk(loud)
    assert abs(float(jnp.max(jnp.abs(out2))) - 0.95) < 1e-3
