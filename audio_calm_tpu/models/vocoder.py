"""Vocoders: HiFi-GAN generator (flax) + Griffin-Lim fallback.

The reference wraps SpeechBrain's `tts-hifigan-libritts-16kHz` and falls back
to pinv-mel + torchaudio GriffinLim (eval/eval_calm.py:169-208). Here the
HiFi-GAN V1 generator is implemented natively (transposed-conv upsampling +
multi-receptive-field fusion resblocks, LeakyReLU 0.1, tanh out) with a
weight-norm-folding converter for the SpeechBrain/official checkpoints, and
Griffin-Lim is a lax.fori_loop over STFT/iSTFT round trips.

Default geometry matches the 16 kHz LibriTTS checkpoint: 80 mels -> hop-256
waveform via upsample rates (8, 8, 2, 2).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_calm_tpu.models.layers import Conv1d, ConvTranspose1d
from audio_calm_tpu.ops.mel import (
    _dft_basis,
    frame_signal,
    hann_window,
    mel_filterbank,
)


@dataclass(frozen=True)
class HiFiGANConfig:
    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    lrelu_slope: float = 0.1

    @property
    def total_upsample(self) -> int:
        t = 1
        for r in self.upsample_rates:
            t *= r
        return t


def lrelu(x, slope=0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class ResBlock1(nn.Module):
    """HiFi-GAN V1 MRF resblock: per dilation d,
    x += Conv_k,1(LReLU(Conv_k,d(LReLU(x))))."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    slope: float = 0.1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            h = lrelu(x, self.slope)
            h = Conv1d(self.channels, k, padding=d * (k - 1) // 2, dilation=d,
                       dtype=self.dtype, name=f"convs1_{i}")(h)
            h = lrelu(h, self.slope)
            h = Conv1d(self.channels, k, padding=(k - 1) // 2,
                       dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """mel [B, T, 80] -> waveform [B, T * total_upsample].

    dtype: compute dtype (params stay fp32); bf16 halves the conv-stack HBM
    traffic on the longest tensors in the pipeline (the upsampled waveform
    activations) with negligible audio impact (final tanh in fp32).
    """

    cfg: HiFiGANConfig = HiFiGANConfig()
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        ch = c.upsample_initial_channel
        x = Conv1d(ch, 7, padding=3, dtype=self.dtype, name="conv_pre")(mel)
        for i, (r, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = lrelu(x, c.lrelu_slope)
            ch //= 2
            x = ConvTranspose1d(ch, k, stride=r, padding=(k - r) // 2,
                                dtype=self.dtype, name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilations)
            ):
                h = ResBlock1(ch, rk, rd, c.lrelu_slope, dtype=self.dtype,
                              name=f"resblocks_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernel_sizes)
        x = lrelu(x, c.lrelu_slope)
        x = Conv1d(1, 7, padding=3, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


# ---------------------------------------------------------------------------
# Weight-norm folding converter (torch HiFi-GAN checkpoints)
# ---------------------------------------------------------------------------
def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims but dim 0
    (torch weight_norm default)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_hifigan(sd: Dict[str, np.ndarray], cfg: HiFiGANConfig = HiFiGANConfig()):
    """torch generator state dict (weight-normed) -> flax params.

    Accepts both `ups.N` / `resblocks.M` (official + SpeechBrain) naming.
    """
    from audio_calm_tpu.models.convert import conv1d_w, conv_transpose1d_w

    def W(prefix):
        gk, vk = prefix + ".weight_g", prefix + ".weight_v"
        if gk in sd:
            return fold_weight_norm(np.asarray(sd[gk]), np.asarray(sd[vk]))
        # orig/parametrized naming
        gk2 = prefix + ".parametrizations.weight.original0"
        vk2 = prefix + ".parametrizations.weight.original1"
        if gk2 in sd:
            return fold_weight_norm(np.asarray(sd[gk2]), np.asarray(sd[vk2]))
        return np.asarray(sd[prefix + ".weight"])

    def B(prefix):
        return np.asarray(sd[prefix + ".bias"]).astype(np.float32)

    params: Dict = {
        "conv_pre": {"conv": {"kernel": conv1d_w(W("conv_pre")),
                              "bias": B("conv_pre")}},
        "conv_post": {"conv": {"kernel": conv1d_w(W("conv_post")),
                               "bias": B("conv_post")}},
    }
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = {
            "kernel": conv_transpose1d_w(W(f"ups.{i}")),
            "bias": B(f"ups.{i}"),
        }
        for j in range(n_k):
            flat = i * n_k + j
            blk: Dict = {}
            for ci in range(len(cfg.resblock_dilations[j])):
                blk[f"convs1_{ci}"] = {"conv": {
                    "kernel": conv1d_w(W(f"resblocks.{flat}.convs1.{ci}")),
                    "bias": B(f"resblocks.{flat}.convs1.{ci}"),
                }}
                blk[f"convs2_{ci}"] = {"conv": {
                    "kernel": conv1d_w(W(f"resblocks.{flat}.convs2.{ci}")),
                    "bias": B(f"resblocks.{flat}.convs2.{ci}"),
                }}
            params[f"resblocks_{i}_{j}"] = blk
    return params


class HiFiGANVocoder:
    """Host wrapper binding converted HiFi-GAN params to a jitted decode.

    log-mel [B, T, n_mels] -> waveform [B, T * total_upsample], mirroring the
    reference's primary vocoder (SpeechBrain `decode_batch`,
    eval/eval_calm.py:175-181); Griffin-Lim is only the fallback.

    fused=True (default on TPU) routes the MRF resblocks through the Pallas
    kernels in ops/pallas_vocoder — measured 45 -> 14 ms of device time for
    the resblock stack on v5e (BASELINE.md), waveform parity < 1e-3 of the
    tanh range vs the XLA path. AUDIO_CALM_VOCODER=xla opts out.

    AUDIO_CALM_VOCODER_IO=bf16 (or io_dtype=jnp.bfloat16) additionally
    halves the inter-stage activation traffic of the fused path; measured
    a ~5% generator win at B=1 (16.3 -> 15.5 ms — the fused stages are
    near the packed-matmul roofline, so bandwidth is no longer the
    binding constraint; round-5 profile) at 0.26% waveform rel-L2."""

    def __init__(self, params: Dict, cfg: HiFiGANConfig = HiFiGANConfig(),
                 dtype=None, fused: bool | None = None, io_dtype=None):
        self.cfg = cfg
        self.generator = HiFiGANGenerator(cfg, dtype=dtype)
        self.params = {"params": params}
        if fused is None:
            fused = (os.environ.get("AUDIO_CALM_VOCODER", "fused") == "fused"
                     and jax.default_backend() != "cpu")
        if io_dtype is None and os.environ.get(
                "AUDIO_CALM_VOCODER_IO", "") == "bf16":
            io_dtype = jnp.bfloat16
        self.fused = fused
        self.io_dtype = io_dtype
        self._decode = jax.jit(self.apply_fn)

    def apply_fn(self, params, log_mel: jnp.ndarray) -> jnp.ndarray:
        """Jittable generator forward (used by eval.render to fuse the
        VAE-decode -> vocoder pipeline into one program)."""
        if self.fused:
            from audio_calm_tpu.ops.pallas_vocoder import hifigan_apply_fused

            return hifigan_apply_fused(params, log_mel, self.cfg,
                                       io_dtype=self.io_dtype)
        return self.generator.apply(params, log_mel)

    def __call__(self, log_mel: jnp.ndarray) -> jnp.ndarray:
        return self._decode(self.params, log_mel)


def _strip_state_dict_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip any wrapper prefix (e.g. "generator.", "module.", "model.") so
    keys start at conv_pre/ups/resblocks/conv_post."""
    anchor = None
    for k in sd:
        i = k.find("conv_pre.")
        if i >= 0:
            anchor = k[:i]
            break
    if not anchor:
        return sd
    return {k[len(anchor):]: v for k, v in sd.items() if k.startswith(anchor)}


def load_vocoder(path: str | None = None,
                 cfg: HiFiGANConfig = HiFiGANConfig()):
    """Build the product-path vocoder: HiFi-GAN when a checkpoint exists at
    `path`, Griffin-Lim otherwise (reference eval_calm.py:169-208 ordering).

    `path` may be a torch checkpoint file (.bin/.pt/.ckpt/.safetensors) or a
    SpeechBrain-style directory containing generator.ckpt / model.ckpt.
    """
    sd = None
    if path:
        candidate = None
        if os.path.isdir(path):
            for name in ("generator.ckpt", "model.ckpt", "generator.bin",
                         "pytorch_model.bin", "model.safetensors"):
                p = os.path.join(path, name)
                if os.path.exists(p):
                    candidate = p
                    break
        elif os.path.isfile(path):
            candidate = path
        if candidate:
            from audio_calm_tpu.models.convert import load_torch_state_dict

            sd = _strip_state_dict_prefix(load_torch_state_dict(candidate))
        else:
            print(f"warning: vocoder checkpoint not found at {path}; "
                  "falling back to Griffin-Lim")
    if sd is not None:
        return HiFiGANVocoder(convert_hifigan(sd, cfg), cfg)
    return GriffinLimVocoder()


# ---------------------------------------------------------------------------
# Griffin-Lim fallback
# ---------------------------------------------------------------------------
def _istft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
           length: int) -> jnp.ndarray:
    """Inverse STFT with hann window + overlap-add (center=True layout).

    re/im: [B, frames, bins]."""
    n_bins = n_fft // 2 + 1
    # inverse rDFT as matmul: x_frame = (re @ Cs + im @ Ss)
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    scale = np.ones(n_bins)
    scale[1:-1] = 2.0  # hermitian double-count
    Cs = jnp.asarray((np.cos(ang) * scale / n_fft).T.astype(np.float32))
    Ss = jnp.asarray((-np.sin(ang) * scale / n_fft).T.astype(np.float32))
    frames = re @ Cs + im @ Ss  # [B, T, n_fft]
    win = jnp.asarray(hann_window(n_fft))
    frames = frames * win[None, None, :]

    B, T, _ = frames.shape
    out_len = n_fft + (T - 1) * hop
    # overlap-add via scatter into hop-strided positions
    idx = (np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    x = jnp.zeros((B, out_len))
    x = x.at[:, idx].add(frames.reshape(B, -1))
    wsum = jnp.zeros((out_len,))
    wsum = wsum.at[idx].add(jnp.tile(win * win, (T,)))
    x = x / jnp.maximum(wsum, 1e-8)[None, :]
    pad = n_fft // 2
    return x[:, pad : pad + length]


def griffin_lim(
    magnitude: jnp.ndarray,  # [B, frames, bins]
    n_fft: int = 1024,
    hop: int = 256,
    n_iter: int = 32,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Phase reconstruction by iterative STFT consistency."""
    B, T, n_bins = magnitude.shape
    # the consistency iteration must round-trip to exactly T frames
    length = (T - 1) * hop
    C, S = _dft_basis(n_fft, n_fft)
    Cj, Sj = jnp.asarray(C), jnp.asarray(S)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    # one phase field shared by every batch row (the init is arbitrary
    # anyway): row b's reconstruction then depends on its magnitudes only,
    # so a batched render row == the same row rendered solo
    angle = jax.random.uniform(
        rng, (1,) + magnitude.shape[1:], minval=-np.pi, maxval=np.pi
    )
    re = magnitude * jnp.cos(angle)
    im = magnitude * jnp.sin(angle)

    def body(_, carry):
        re, im = carry
        x = _istft(re, im, n_fft, hop, length)
        xp = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        fr = frame_signal(xp, n_fft, hop)
        re2 = fr @ Cj
        im2 = fr @ Sj
        mag2 = jnp.sqrt(jnp.maximum(re2**2 + im2**2, 1e-12))
        return magnitude * re2 / mag2, magnitude * im2 / mag2

    re, im = jax.lax.fori_loop(0, n_iter, body, (re, im))
    # final synthesis emits the full T*hop samples (the last hop rides the
    # final window's taper, which the centered ISTFT already covers):
    # output length == frames*hop matches the HiFi-GAN samples-per-frame
    # contract, so a render sliced to n_frames*samples_per_frame never
    # comes up short on small grids
    return _istft(re, im, n_fft, hop, T * hop)


class GriffinLimVocoder:
    """exp(log-mel) -> pinv(mel_fb) -> sqrt magnitude -> Griffin-Lim
    (reference fallback, eval_calm.py:184-208; hop matches the mel frontend
    rather than torchaudio's n_fft//2 default)."""

    def __init__(self, n_mels: int = 80, n_fft: int = 1024, hop: int = 256,
                 sample_rate: int = 16000, f_max: float = 8000.0,
                 n_iter: int = 32):
        fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, 0.0, f_max)
        self.inv_fb = jnp.asarray(np.linalg.pinv(fb))  # [n_mels, bins]
        self.n_fft, self.hop, self.n_iter = n_fft, hop, n_iter

    @functools.partial(jax.jit, static_argnums=0)
    def _decode(self, log_mel: jnp.ndarray) -> jnp.ndarray:
        energy = jnp.exp(log_mel)  # [B, T, mels]
        power = jnp.maximum(energy @ self.inv_fb, 1e-8)
        mag = jnp.sqrt(power)
        return griffin_lim(mag, self.n_fft, self.hop, self.n_iter)

    def __call__(self, log_mel: jnp.ndarray) -> jnp.ndarray:
        return self._decode(log_mel)
