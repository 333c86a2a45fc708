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
    up = vae_cfg.total_stride  # VAE time upsample: latent frame -> mel frames

    @jax.jit
    def decode(latents, ns):  # [B, T_grid, D], [B] -> mel [B, up*T_grid, 80]
        # masked decode: the decoder GroupNorms normalize over time, so
        # unmasked grid padding (ODE noise beyond n_frames) would shift
        # every valid mel frame — and differently per bucket, breaking
        # both exact-length semantics and same-seed-same-audio across
        # grids. Valid frames now equal the exact-length decode; invalid
        # mel zeroes — exactly what HiFi-GAN's conv padding reads at an
        # exact-length boundary (for the Griffin-Lim debug vocoder,
        # log-mel 0 is a nonzero magnitude, so GL keeps a small iterative
        # tail coupling; HiFi-GAN is the product path).
        T = latents.shape[1]
        mask = (jnp.arange(T)[None, :] < ns[:, None])[..., None]
        mel_n = vae.apply(vae_params, latents, mask.astype(latents.dtype),
                          method=AcousticVAE.decode)
        mel = denormalize_mel(mel_n, vae_cfg)
        mmask = (jnp.arange(up * T)[None, :] < up * ns[:, None])[..., None]
        return mel * mmask.astype(mel.dtype)

    if hifi:
        gen_params = vocoder.params

        @jax.jit
        def pipeline(latents, ns):
            return vocoder.apply_fn(gen_params, decode(latents, ns))

    def render(latents: np.ndarray, n_frames: int) -> np.ndarray:
        x = jnp.asarray(np.asarray(latents, np.float32))[None]
        ns = jnp.asarray([int(n_frames)], jnp.int32)
        if hifi:
            wav = pipeline(x, ns)
        else:
            wav = vocoder(decode(x, ns))
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
        ns_arr = np.asarray([int(n) for n in n_frames], np.int32)
        B = lat.shape[0]
        Bp = 1 << (B - 1).bit_length()
        if Bp > B:
            lat = np.concatenate([lat, np.repeat(lat[:1], Bp - B, 0)])
            ns_arr = np.concatenate([ns_arr, np.repeat(ns_arr[:1], Bp - B)])
        x = jnp.asarray(lat)
        ns = jnp.asarray(ns_arr)
        wav = pipeline(x, ns) if hifi else vocoder(decode(x, ns))
        w = np.asarray(wav)
        return [w[i][: int(n) * SAMPLES_PER_FRAME]
                for i, n in enumerate(n_frames)]

    render.batch = render_batch
    return render
