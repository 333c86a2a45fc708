"""Structural-similarity loss on spectrograms.

Re-design of the reference SSIMLoss (models/modeling_vae.py:12-88): an 11x11
Gaussian-window (sigma=1.5) SSIM treating the mel spectrogram as a 1-channel
image. TPU-first: the 2-D Gaussian window is separable, so local statistics
are two cheap 1-D convolutions instead of one 11x11 conv2d — identical math,
~5x fewer FLOPs, and XLA fuses the elementwise SSIM map into them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, win: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Separable Gaussian blur over the last two dims of [B, H, W]."""
    k = win.shape[0]
    x = img[..., None]  # [B, H, W, 1]
    B, H, W, _ = x.shape
    # blur along H: treat W as batch
    xh = x.transpose(0, 2, 1, 3).reshape(B * W, H, 1)
    xh = jax.lax.conv_general_dilated(
        xh, win.reshape(k, 1, 1), (1,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    x = xh.reshape(B, W, H, 1).transpose(0, 2, 1, 3)
    # blur along W: treat H as batch
    xw = x.reshape(B * H, W, 1)
    xw = jax.lax.conv_general_dilated(
        xw, win.reshape(k, 1, 1), (1,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return xw.reshape(B, H, W)


def ssim_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """1 - mean(SSIM map). Inputs [B, H, W] (e.g. [B, 80, T] mel)."""
    if img1.ndim == 4:  # [B, 1, H, W] image-style
        img1, img2 = img1[:, 0], img2[:, 0]
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _blur(img1, win, pad)
    mu2 = _blur(img2, win, pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win, pad) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win, pad) - mu2_sq
    sigma12 = _blur(img1 * img2, win, pad) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return 1.0 - jnp.mean(ssim_map)
