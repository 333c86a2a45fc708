#!/usr/bin/env python
"""Gradio two-tab TTS / ASR demo.

Rebuilt against the real NAR inference pipelines (the reference
scripts/web_demo.py loads a nonexistent `model.output_head` and stubs both
task functions — SURVEY.md §7 known bugs). Requires the optional `gradio`
package.

  python scripts/web_demo.py --config configs/calm.yaml \
      --components outputs/checkpoints/omni_flow/components
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", default=None)
    p.add_argument("--byte-tokenizer", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; the web demo is optional. "
              "Use scripts/eval_calm.py for batch inference.", file=sys.stderr)
        return 1

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import CALMConfig, MelConfig, load_config
    from audio_calm_tpu.eval.infer import CALMInference
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.models.vocoder import load_vocoder
    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.train.checkpoint import COMPONENTS, soft_restart

    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    m = cfg.model
    from audio_calm_tpu.data.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(m, byte_fallback=args.byte_tokenizer)

    from audio_calm_tpu.models.flagship import (cast_floating,
                                                resolve_compute_dtype)

    dtype = resolve_compute_dtype(cfg.evaluation.compute_dtype)
    model = QwenCALM(m, dtype=dtype)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    if args.components:
        params = soft_restart(
            params, {c: args.components for c in COMPONENTS + ("lora",)}
        )
    if dtype == jnp.bfloat16:
        params = cast_floating(params, jnp.bfloat16)
    inf = CALMInference(model, {"params": params}, tokenizer,
                        audio_buckets=cfg.evaluation.audio_buckets,
                        text_buckets=cfg.evaluation.text_buckets)

    vae_cfg = VAEModelConfig(latent_channels=m.latent_dim)
    vae = AcousticVAE(vae_cfg)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    mel_cfg = MelConfig()
    vocoder = load_vocoder(cfg.evaluation.vocoder_path)
    print(f"vocoder: {type(vocoder).__name__}", file=sys.stderr)
    from audio_calm_tpu.eval.render import make_renderer

    render = make_renderer(vae, vae_params, vae_cfg, vocoder)
    rng_holder = [jax.random.PRNGKey(0)]

    def tts_fn(text, steps, cfg_scale):
        rng_holder[0], k = jax.random.split(rng_holder[0])
        # batched long-form: a multi-chunk text runs its chunks as ONE
        # batched device program per <=8 group (same audio as tts_long,
        # ~1.5x device throughput — BASELINE.md "TTS serving")
        wav = inf.tts_long_batched(text, k, render, steps=int(steps),
                                   cfg_scale=float(cfg_scale),
                                   method=cfg.evaluation.ode_method,
                                   time_schedule=cfg.evaluation.time_schedule,
                                   crossfade_ms=cfg.evaluation.crossfade_ms)
        return 16000, (np.clip(wav, -1, 1) * 32767).astype(np.int16)

    # ASR rides the bucketed masked-VAE frontend (static-shape programs,
    # one per bucket, instead of a fresh compile per upload length) and
    # asr_long, so uploads past the 24.6 s latent budget chunk at
    # low-energy points instead of silently truncating
    from audio_calm_tpu.serving.frontend import encode_chunks, make_asr_frontend

    lat_buckets = cfg.evaluation.audio_buckets or [m.max_audio_len]
    prep_a, batch_a = make_asr_frontend(vae, vae_params, vae_cfg, mel_cfg,
                                        lat_buckets)
    max_asr = lat_buckets[-1] * vae_cfg.total_stride * mel_cfg.hop_length

    def asr_fn(audio, steps):
        sr, wav = audio
        wav = np.asarray(wav, np.float32) / 32768.0
        if wav.ndim == 2:  # mono mix (frontend peak-normalizes per chunk)
            wav = wav.mean(axis=1 if wav.shape[1] <= 2 else 0)
        rng_holder[0], k = jax.random.split(rng_holder[0])
        return inf.asr_long(
            wav, k, lambda cs: encode_chunks(prep_a, batch_a, cs), max_asr,
            steps=int(steps), method=cfg.evaluation.ode_method,
            time_schedule=cfg.evaluation.time_schedule)

    with gr.Blocks(title="Audio-CALM TPU") as demo:
        gr.Markdown("# Audio-CALM (TPU) — NAR flow-matching TTS / ASR")
        with gr.Tab("TTS"):
            t_in = gr.Textbox(label="Text")
            t_steps = gr.Slider(4, 100, value=cfg.evaluation.steps, step=1,
                                label="ODE steps")
            t_cfg = gr.Slider(1.0, 5.0, value=cfg.evaluation.cfg_scale,
                              label="CFG scale")
            t_btn = gr.Button("Synthesize")
            t_out = gr.Audio(label="Audio")
            t_btn.click(tts_fn, [t_in, t_steps, t_cfg], t_out)
        with gr.Tab("ASR"):
            a_in = gr.Audio(label="Audio", sources=["upload", "microphone"])
            a_steps = gr.Slider(4, 50, value=cfg.evaluation.asr_steps,
                                step=1, label="ODE steps")
            a_btn = gr.Button("Transcribe")
            a_out = gr.Textbox(label="Transcript")
            a_btn.click(asr_fn, [a_in, a_steps], a_out)
    demo.launch(server_port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
