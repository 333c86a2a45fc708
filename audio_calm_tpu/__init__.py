"""Audio-CALM-TPU: a TPU-native continuous audio language model framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
AndyWu0719/Audio-CALM reference (continuous audio language modeling with an
acoustic VAE, a frozen Qwen2 LLM + LoRA backbone, and DiT flow-matching heads
for non-autoregressive TTS and ASR).

Layer map (bottom-up):
    ops/        -- numeric kernels: mel frontend, attention, MAS, ODE, losses
    models/     -- pure flax modules: AcousticVAE, Qwen2, CALM heads, HiFi-GAN
    parallel/   -- mesh construction + sharding rules (DP + ZeRO opt-state)
    data/       -- offline preprocessing, datasets, collators
    train/      -- optimizers, train steps, checkpointing
    eval/       -- NAR TTS/ASR inference, WER/CER metrics
    diagnostics -- sanity-check harness (the reference's scripts/ layer)
"""

__version__ = "0.1.0"
