"""Latent -> waveform rendering: VAE decode + denorm + vocoder in ONE jit.

The eval/serve scripts used to call `vae.apply(...)` / `vocoder(...)` on
host-sliced variable-length latents: through the axon tunnel that is one
dispatch per op, and every unique utterance length is a fresh XLA
compile. The renderer instead takes GRID-PADDED latents (one static shape
per inference bucket), fuses decode + mel denormalization (+ HiFi-GAN when
that is the vocoder) into a single jitted program, and slices the valid
audio on the host — mirroring how bench.py runs the same pipeline.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_calm_tpu.models.vae import AcousticVAE, denormalize_mel
from audio_calm_tpu.models.vocoder import GriffinLimVocoder, HiFiGANVocoder

# samples of 16 kHz audio per latent frame: VAE 4x time upsample * hop 256
SAMPLES_PER_FRAME = 4 * 256


def make_renderer(
    vae: AcousticVAE, vae_params, vae_cfg, vocoder
) -> Callable[[np.ndarray, int], np.ndarray]:
    """-> render(latents [T_grid, D], n_frames) -> wav float32 [n_samples].

    latents must be padded to a (bucketed) grid; one compile per grid
    shape. Works with HiFiGANVocoder (fully fused) and GriffinLimVocoder
    (decode fused, GL's own jitted program chained).
    """
    hifi = isinstance(vocoder, HiFiGANVocoder)

    @jax.jit
    def decode(latents):  # [1, T_grid, D] -> mel [1, 4*T_grid, 80]
        mel_n = vae.apply(vae_params, latents, method=AcousticVAE.decode)
        return denormalize_mel(mel_n, vae_cfg)

    if hifi:
        gen_params = vocoder.params

        @jax.jit
        def pipeline(latents):
            return vocoder.apply_fn(gen_params, decode(latents))

    def render(latents: np.ndarray, n_frames: int) -> np.ndarray:
        x = jnp.asarray(np.asarray(latents, np.float32))[None]
        if hifi:
            wav = pipeline(x)
        else:
            wav = vocoder(decode(x))
        n = int(n_frames) * SAMPLES_PER_FRAME
        return np.asarray(wav)[0][:n]

    def render_batch(latents: np.ndarray, n_frames) -> list:
        """Batched form for the serving batcher: latents [B, T_grid, D]
        (one shared grid), n_frames per item -> list of host waveforms.

        B pads to the next power of two (repeat row 0) before the device
        call, mirroring CALMInference.tts_batch: the serving batcher forms
        arbitrary group sizes, and compiling a render program per EXACT
        row count means a fresh multi-minute compile the first time a
        6-item batch shows up mid-serving (observed through the remote
        tunnel). Padded, the whole serving render matrix is bounded at
        {1,2,4,8} x grid buckets; rows are independent so padding cannot
        change an item's audio."""
        lat = np.asarray(latents, np.float32)
        B = lat.shape[0]
        Bp = 1 << (B - 1).bit_length()
        if Bp > B:
            lat = np.concatenate([lat, np.repeat(lat[:1], Bp - B, 0)])
        x = jnp.asarray(lat)
        wav = pipeline(x) if hifi else vocoder(decode(x))
        w = np.asarray(wav)
        return [w[i][: int(n) * SAMPLES_PER_FRAME]
                for i, n in enumerate(n_frames)]

    render.batch = render_batch
    return render
