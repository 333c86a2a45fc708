"""Acoustic VAE: 1-D conv encoder/decoder compressing log-mel 4x in time.

Re-design of the reference AcousticVAE (models/modeling_vae.py:144-365) for
TPU: channels-last [B, T, C] layout, static shapes (callers pre-pad T to a
multiple of total_stride), exact-erf GELU, GroupNorm eps 1e-6. The layer
geometry (kernel/stride/padding per layer) matches the reference exactly so
checkpoints are convertible:

  encoder: Conv(80->512, k3 p1) ; per stride s: Conv(512->512, k=2s, s, p=s//2)
           + ResBlock ; GN + GELU + Conv(512->2*latent, k3 p1) -> (mu, logvar)
  decoder: Conv(latent->512, k3 p1) + ResBlock ; per stride (reversed):
           ConvTranspose(512->512, k=2s, s, p=s//2) + ResBlock ;
           final Conv(512->80, k3 p1)

Loss (on globally-normalized mel, reference modeling_vae.py:339-353):
  L1 (or MSE) + ssim_weight * SSIM + stft_loss_weight * multi-res-STFT
  + kl_weight * KL
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import VAEModelConfig
from audio_calm_tpu.models.layers import Conv1d, ConvTranspose1d, GroupNorm, gelu
from audio_calm_tpu.ops.mel import stft_power
from audio_calm_tpu.ops.ssim import ssim_loss


class ResBlock(nn.Module):
    """x + [GN -> GELU -> Conv(k3 p1)] x2  (reference modeling_vae.py:125-142).

    Optional `mask` [B, T, 1] makes a padded row compute exactly what the
    unpadded tensor would: GroupNorm statistics restrict to valid frames
    and activations re-zero before each conv so boundary taps see the same
    zero padding an exact-length buffer's 'SAME' conv would."""

    channels: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, mask=None):
        h = GroupNorm(self.num_groups, name="norm1")(x, mask)
        h = gelu(h)
        if mask is not None:
            h = h * mask
        h = Conv1d(self.channels, 3, padding=1, name="conv1")(h)
        h = GroupNorm(self.num_groups, name="norm2")(h, mask)
        h = gelu(h)
        if mask is not None:
            h = h * mask
        h = Conv1d(self.channels, 3, padding=1, name="conv2")(h)
        out = x + h
        if mask is not None:
            out = out * mask
        return out


class Encoder(nn.Module):
    cfg: VAEModelConfig

    @nn.compact
    def __call__(self, x, mask=None):  # [B, T, mel], mask [B, T, 1]
        # `mask` marks valid frames (per-row length MUST be a multiple of
        # total_stride, i.e. the exact-length buffer after pad_to_stride);
        # a masked padded row then produces the same latents as encoding
        # the exact-length tensor solo — see tests/test_vae.py.
        c = self.cfg
        if mask is not None:
            mask = mask.astype(x.dtype)
            x = x * mask
        x = Conv1d(c.hidden_channels, 3, padding=1, name="conv_in")(x)
        if mask is not None:
            x = x * mask
        for i, s in enumerate(c.strides):
            x = Conv1d(
                c.hidden_channels, 2 * s, stride=s, padding=s // 2,
                name=f"down{i}_conv",
            )(x)
            if mask is not None:
                mask = mask[:, ::s]
                x = x * mask
            x = ResBlock(
                c.hidden_channels, c.norm_num_groups, name=f"down{i}_res"
            )(x, mask)
        x = GroupNorm(c.norm_num_groups, name="norm_out")(x, mask)
        x = gelu(x)
        if mask is not None:
            x = x * mask
        x = Conv1d(2 * c.latent_channels, 3, padding=1, name="conv_out")(x)
        mu, logvar = jnp.split(x, 2, axis=-1)
        return mu, logvar


class Decoder(nn.Module):
    cfg: VAEModelConfig

    @nn.compact
    def __call__(self, z, mask=None):  # [B, T', latent], mask [B, T', 1]
        # `mask` marks valid latent frames: GroupNorm statistics restrict
        # to them and activations re-zero before each conv, so decoding a
        # grid-padded row produces the same valid mel frames as decoding
        # the exact-length latents solo (the decoder GroupNorms normalize
        # over TIME, so unmasked grid padding — ODE noise or zeros —
        # audibly shifts the whole utterance; see tests/test_vae.py).
        c = self.cfg
        if mask is not None:
            mask = mask.astype(z.dtype)
            z = z * mask
        x = Conv1d(c.hidden_channels, 3, padding=1, name="conv_in")(z)
        if mask is not None:
            x = x * mask
        x = ResBlock(
            c.hidden_channels, c.norm_num_groups, name="res_in"
        )(x, mask)
        for i, s in enumerate(reversed(c.strides)):
            x = ConvTranspose1d(
                c.hidden_channels, 2 * s, stride=s, padding=s // 2,
                name=f"up{i}_conv",
            )(x)
            if mask is not None:
                mask = jnp.repeat(mask, s, axis=1)
                x = x * mask
            x = ResBlock(
                c.hidden_channels, c.norm_num_groups, name=f"up{i}_res"
            )(x, mask)
        return Conv1d(c.in_channels, 3, padding=1, name="conv_out")(x)


def multires_stft_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Multi-resolution STFT magnitude L1 over mel-bin "channels".

    x, y: [B, T, C]; each of the C mel bins is treated as a 1-D signal
    (reference modeling_vae.py:271-305; center=False, hann, mag L1,
    specs (256,64)/(128,32)/(64,16) filtered to n_fft <= T).
    """
    B, T, C = x.shape
    specs = [(n, h) for (n, h) in ((256, 64), (128, 32), (64, 16)) if n <= T]
    if not specs:
        return jnp.zeros((), x.dtype)
    xf = x.transpose(0, 2, 1).reshape(B * C, T).astype(jnp.float32)
    yf = y.transpose(0, 2, 1).reshape(B * C, T).astype(jnp.float32)
    loss = 0.0
    for n_fft, hop in specs:
        mx = stft_power(xf, n_fft, hop, center=False, power=1.0)
        my = stft_power(yf, n_fft, hop, center=False, power=1.0)
        loss = loss + jnp.mean(jnp.abs(mx - my))
    return loss / len(specs)


class AcousticVAE(nn.Module):
    """Full VAE with loss. All tensors channels-last [B, T, C].

    Callers must pre-pad T to a multiple of cfg.total_stride (static shapes);
    `pad_to_stride` below implements the reference's reflect-pad.
    """

    cfg: VAEModelConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(
        self, mel: jnp.ndarray, mask: jnp.ndarray = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.encoder(mel, mask)

    def decode(self, z: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
        return self.decoder(z, mask)

    def reparameterize(self, mu, logvar, train: bool):
        if not train:
            return mu
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
        z = mu + eps * std
        if self.cfg.latent_dropout > 0:
            rate = self.cfg.latent_dropout
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - rate, z.shape
            )
            z = jnp.where(keep, z / (1.0 - rate), 0.0)
        return z

    def __call__(self, mel: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """mel: [B, T, 80] raw log-mel; T must be a multiple of total_stride."""
        c = self.cfg
        if mel.shape[1] % c.total_stride != 0:
            raise ValueError(
                f"mel time dim {mel.shape[1]} must be a multiple of "
                f"total_stride={c.total_stride}; use vae.pad_to_stride() first"
            )
        mel_n = (mel - c.mel_mean) / c.mel_std

        mu, logvar = self.encode(mel_n)
        z = self.reparameterize(mu, logvar, train)
        recon = self.decode(z)

        if c.use_l1_loss:
            rec_loss = jnp.mean(jnp.abs(recon - mel_n))
        else:
            rec_loss = jnp.mean((recon - mel_n) ** 2)
        ssim = ssim_loss(recon.transpose(0, 2, 1), mel_n.transpose(0, 2, 1))
        stft_l = multires_stft_loss(recon, mel_n)

        mu_f = mu.astype(jnp.float32)
        lv_f = logvar.astype(jnp.float32)
        kl = jnp.mean(0.5 * (mu_f**2 + jnp.exp(lv_f) - 1.0 - lv_f))

        loss = (
            rec_loss
            + c.ssim_weight * ssim
            + c.stft_loss_weight * stft_l
            + c.kl_weight * kl
        )
        return {
            "loss": loss,
            "rec_loss": rec_loss,
            "ssim_loss": ssim,
            "stft_loss": stft_l,
            "kl_loss": kl,
            "recon_mel": recon * c.mel_std + c.mel_mean,
            "z": z,
            "mu": mu,
            "logvar": logvar,
        }


def load_vae(ckpt_path: str, cfg: VAEModelConfig = None):
    """Load a pretrained VAE -> (model, params).

    Mirrors the reference loader's two paths (preprocess/core.py:63-91):
    an orbax params directory (ours), or a torch state-dict .bin/.pt
    (reference checkpoints, converted on load). When no cfg is given, a
    `vae_config.json` sidecar next to the checkpoint (written by
    scripts/train_vae.py) supplies the geometry — the from_pretrained
    behavior of the reference.
    """
    import json
    import os

    import jax

    if cfg is None:
        for candidate in (
            os.path.join(ckpt_path, "vae_config.json"),
            os.path.join(os.path.dirname(ckpt_path.rstrip("/")),
                         "vae_config.json"),
        ):
            if os.path.exists(candidate):
                from audio_calm_tpu.config import from_dict

                with open(candidate) as f:
                    cfg = from_dict(VAEModelConfig, json.load(f))
                break
    cfg = cfg or VAEModelConfig()
    model = AcousticVAE(cfg)
    if os.path.isfile(ckpt_path) or ckpt_path.endswith((".bin", ".pt")):
        from audio_calm_tpu.models.convert import (
            convert_vae_params, load_torch_state_dict, merge_params,
        )

        sd = load_torch_state_dict(ckpt_path)
        init = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, cfg.total_stride * 2, cfg.in_channels)), train=False,
        )
        params = {
            "params": merge_params(
                init["params"], convert_vae_params(sd, tuple(cfg.strides))
            )
        }
        return model, params
    import orbax.checkpoint as ocp

    target = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, cfg.total_stride * 2, cfg.in_channels)), train=False,
        )
    )
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(ckpt_path), target=target
    )
    return model, params


def pad_to_stride(mel: jnp.ndarray, total_stride: int) -> jnp.ndarray:
    """Reflect-pad [B, T, C] time axis to a multiple of total_stride
    (reference modeling_vae.py:322-327)."""
    T = mel.shape[1]
    rem = T % total_stride
    if rem == 0:
        return mel
    return jnp.pad(mel, ((0, 0), (0, total_stride - rem), (0, 0)), mode="reflect")


def normalize_mel(mel, cfg: VAEModelConfig):
    return (mel - cfg.mel_mean) / cfg.mel_std


def denormalize_mel(mel_n, cfg: VAEModelConfig):
    return mel_n * cfg.mel_std + cfg.mel_mean
