#!/usr/bin/env python
"""Headline benchmark: text -> waveform TTS throughput per TPU chip.

Runs the FULL flagship pipeline — Qwen2-1.5B encode, length/duration
prediction, 50-step CFG-2.5 flow ODE (4-layer DiT, hidden 1024), acoustic
VAE decode (128ch -> 80 mel, 4x upsample), HiFi-GAN vocoding to 16 kHz —
on the real chip, and reports the realtime factor (seconds of audio
produced per wall-clock second).

Prints ONE JSON line:
  {"metric": "tts_realtime_factor", "value": N, "unit": "x_realtime",
   "vs_baseline": N / 10.0}
vs_baseline is against the BASELINE.md north-star target of 10x realtime
per chip (the reference publishes no numbers of its own — SURVEY.md §6).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from audio_calm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os

    t_aud = 384  # latent frames == 24.576 s of 16 kHz audio at hop 256 x4
    steps = 50
    cfg_scale = 2.5
    # headline is single-stream (B=1); BENCH_BATCH=N measures aggregate
    # serving throughput instead
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    sample_rate = 16000
    hop = 256
    stride = 4

    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.infer import tts_generate_latents
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.flagship import flagship_config
    from audio_calm_tpu.models.vae import AcousticVAE, denormalize_mel
    from audio_calm_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator

    from audio_calm_tpu.models.flagship import cast_floating, device_random_params

    calm = QwenCALM(flagship_config(), dtype=jnp.bfloat16)
    vae = AcousticVAE(VAEModelConfig())
    # measured: bf16 vocoder compute is SLOWER on v5e (119x vs 156x — the
    # transposed convs lower badly in bf16); keep the vocoder fp32
    voc = HiFiGANGenerator(HiFiGANConfig())

    # shapes resolve host-side (no compute); params materialize on-device in
    # ONE program as small random normals — zeros would let XLA fold the
    # matmuls away, a host init would transfer ~6 GB through the tunnel.
    # Serving-style bf16 params: compute is bf16 anyway; fp32 masters would
    # double the weight HBM traffic re-read on each of the 50 ODE steps.
    calm_params = {
        "params": cast_floating(
            device_random_params(
                jax.eval_shape(
                    lambda: init_calm_params(calm, jax.random.PRNGKey(0))
                )
            ),
            jnp.bfloat16,
        )
    }
    vae_params = device_random_params(
        jax.eval_shape(
            lambda: vae.init(
                {"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, 8, 80)), train=False,
            )
        ),
        seed=1,
    )
    voc_params = device_random_params(
        jax.eval_shape(
            lambda: voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
        ),
        seed=2,
    )

    text_ids = jnp.asarray(
        np.random.default_rng(0).integers(10, 5000, (batch, 24)), jnp.int32
    )
    attn = jnp.ones_like(text_ids)

    @functools.partial(jax.jit, static_argnames=("steps", "cfg_scale"))
    def pipeline(calm_params, vae_params, voc_params, rng, steps, cfg_scale):
        latents, num_frames = tts_generate_latents(
            calm, calm_params, text_ids, attn, rng,
            steps=steps, cfg_scale=cfg_scale, t_aud=t_aud,
            num_frames_override=t_aud,  # untrained len-pred; fixed-length bench
        )
        mel_n = vae.apply(vae_params, latents.astype(jnp.float32),
                          method=AcousticVAE.decode)
        mel = denormalize_mel(mel_n, vae.cfg)
        wav = voc.apply(voc_params, mel)
        return wav

    rng = jax.random.PRNGKey(0)
    # warmup / compile. NOTE: through the axon tunnel block_until_ready does
    # NOT reliably wait for execution — a device->host readback of the
    # result is the only trustworthy completion barrier, so every timed
    # iteration ends with np.asarray(wav).
    np.asarray(pipeline(calm_params, vae_params, voc_params, rng, steps,
                        cfg_scale))
    np.asarray(pipeline(calm_params, vae_params, voc_params,
                        jax.random.fold_in(rng, 99), steps, cfg_scale))

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        wav = np.asarray(
            pipeline(calm_params, vae_params, voc_params,
                     jax.random.fold_in(rng, i), steps, cfg_scale)
        )
    wall = (time.perf_counter() - t0) / n_iters

    audio_seconds = batch * t_aud * stride * hop / sample_rate
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "tts_realtime_factor",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
