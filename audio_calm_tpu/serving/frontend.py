"""Bucketed, batched, length-exact ASR wav->latent frontend.

Serving quantizes wav lengths to the latent-grid buckets so concurrent
/asr requests coalesce into ONE static-shape (padded-B, bucket) device
program (the reference has no serving path at all; its eval encodes each
utterance at its exact length, core.py:93-112 semantics). Naive bucketing
would change the model's answer: the VAE encoder normalizes with
GroupNorm over TIME, so silence-padding a 1 s utterance to a 6 s bucket
shifts every valid latent. This frontend makes bucketing invisible:

- the host pad continues the signal by reflection (exactly what the
  exact-length STFT's center pad_mode="reflect" reads past the end), so
  every valid mel frame matches the exact-length mel bit-for-bit;
- mel frames between the valid length and the stride boundary reproduce
  pad_to_stride's reflect pad via a gather;
- the VAE encode masks GroupNorm statistics and conv paddings to the
  valid region (AcousticVAE.encode(mask=...)).

tests/test_serving_batch.py asserts batched-bucketed == solo exact-length
latents to fp32 tolerance.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_calm_tpu.config import MelConfig, VAEModelConfig
from audio_calm_tpu.models.vae import AcousticVAE, pad_to_stride
from audio_calm_tpu.ops.mel import MelFrontend


def make_asr_frontend(vae, vae_params, vae_cfg: VAEModelConfig,
                      mel_cfg: MelConfig, lat_buckets: List[int]):
    """-> (prep, batch): host-side bucketing + batched jitted encode.

    prep(wav_f32) -> (bucket, padded [bucket], n_samples)
    batch(items)  -> [latents [n_lat_i, latent_dim]] for items sharing one
                     bucket, each row equal to its solo exact-length encode.
    """
    frontend = MelFrontend(mel_cfg)
    hop = mel_cfg.hop_length
    stride = vae_cfg.total_stride
    wav_buckets = [int(b) * stride * hop for b in lat_buckets]

    def prep(wav_f32) -> Tuple[int, np.ndarray, int]:
        n = min(len(wav_f32), wav_buckets[-1])
        # pick a bucket that also fits the n_fft/2 reflect tail; a
        # truncated tail measurably perturbs the trailing latents (only
        # the max grid keeps that approximation, where clamping already
        # applies)
        r_want = min(mel_cfg.n_fft // 2, n - 1)
        bucket = next((b for b in wav_buckets if n + r_want <= b),
                      wav_buckets[-1])
        padded = np.zeros(bucket, np.float32)
        padded[:n] = np.asarray(wav_f32[:n], np.float32)
        r = min(mel_cfg.n_fft // 2, n - 1, bucket - n)
        if r > 0:
            padded[n:n + r] = padded[n - 2:n - 2 - r:-1]
        return bucket, padded, n

    @jax.jit
    def _fe_jit(wavs, ns):
        # per-row peak normalization (process_audio_chunk semantics; the
        # reflect tail only repeats in-signal values, so it never changes
        # a row's peak), mel, masked VAE encode. ns = true sample counts.
        p = jnp.max(jnp.abs(wavs), axis=1, keepdims=True)
        w = jnp.where(p > 0, wavs / (p + 1e-8) * 0.95, wavs)
        mel = pad_to_stride(frontend(w), stride)
        n_mel = ns // hop + 1
        n_valid = -(-n_mel // stride) * stride
        t = jnp.arange(mel.shape[1])[None, :]
        idx = jnp.where(t < n_mel[:, None], t, 2 * n_mel[:, None] - 2 - t)
        idx = jnp.clip(idx, 0, mel.shape[1] - 1)
        mel = jnp.take_along_axis(mel, idx[..., None], axis=1)
        mask = (t < n_valid[:, None])[..., None]
        mel = jnp.where(mask, mel, 0.0)
        mu, _ = vae.apply(vae_params, mel, mask.astype(mel.dtype),
                          method=AcousticVAE.encode)
        return mu

    def batch(items) -> List[np.ndarray]:
        wavs = np.stack([w for w, _ in items])
        ns = np.array([n for _, n in items], np.int32)
        B = wavs.shape[0]
        Bp = 1 << (B - 1).bit_length()  # bounded compile matrix
        if Bp > B:
            wavs = np.concatenate([wavs, np.repeat(wavs[:1], Bp - B, 0)])
            ns = np.concatenate([ns, np.repeat(ns[:1], Bp - B)])
        mu = np.asarray(_fe_jit(jnp.asarray(wavs), jnp.asarray(ns)))
        out = []
        for i, (_, n) in enumerate(items):
            n_mel = n // hop + 1
            n_lat = -(-n_mel // stride)
            out.append(mu[i, :n_lat])
        return out

    return prep, batch


def encode_chunks(prep, batch, chunks: List[np.ndarray]) -> List[np.ndarray]:
    """Encode variable-length wav chunks through a make_asr_frontend pair:
    group the prepped chunks by wav bucket and run ONE batched masked-VAE
    encode per bucket, preserving input order. This is the `encode`
    callable CALMInference.asr_long expects (rows are length-exact, so
    grouping never changes a chunk's latents)."""
    prepped = [prep(c) for c in chunks]
    by_bucket: dict = {}
    for i, (bucket, padded, n) in enumerate(prepped):
        by_bucket.setdefault(bucket, []).append((i, padded, n))
    out: List[np.ndarray] = [None] * len(chunks)  # type: ignore[list-item]
    for grp in by_bucket.values():
        lats = batch([(p, n) for _, p, n in grp])
        for (i, _, _), lat in zip(grp, lats):
            out[i] = lat
    return out
