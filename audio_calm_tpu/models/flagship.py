"""Flagship model assembly: the full Audio-CALM stack at reference scale.

Qwen2-1.5B-Instruct geometry backbone (+LoRA r=64), 128-dim acoustic VAE
(4x time compression), DiT flow heads (hidden 1024, 4 layers — the
tts_config.yaml setting), HiFi-GAN 16 kHz vocoder. Used by bench.py and
__graft_entry__.py; real deployments load converted weights on top
(models/convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from audio_calm_tpu.config import (
    CALMModelConfig,
    LoRAConfig,
    Qwen2Config,
    VAEModelConfig,
)
from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator


def flagship_config(
    num_llm_layers: Optional[int] = None,
    max_audio_len: int = 384,
    max_text_len: int = 96,
) -> CALMModelConfig:
    qwen = Qwen2Config()
    if num_llm_layers is not None:
        qwen.num_hidden_layers = num_llm_layers
    return CALMModelConfig(
        latent_dim=128,
        max_audio_len=max_audio_len,
        max_text_len=max_text_len,
        tts_flow_hidden_dim=1024,
        tts_flow_num_layers=4,
        asr_flow_hidden_dim=1024,
        asr_flow_num_layers=4,
        flow_num_heads=16,
        qwen=qwen,
        lora=LoRAConfig(rank=64, alpha=128.0, dropout=0.05),
        latent_mean=0.039775,
        latent_std=1.190864,
    )


def zeros_params_like(model_init_fn, *args, **kwargs):
    """Shape-faithful zero parameters without running the init program.

    For compile checks and throughput benchmarks the parameter VALUES are
    irrelevant (same FLOPs); materializing 1.5B zeros is near-free while a
    real random init would compile + run the full forward once.
    """
    shapes = jax.eval_shape(model_init_fn, *args, **kwargs)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )


def cast_floating(tree, dtype):
    """Cast floating leaves of a param tree (e.g. fp32 -> bf16 for serving:
    the compute path already runs bf16, so fp32 masters only add HBM reads
    on every ODE step)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def device_random_params(shapes, seed: int = 0, scale: float = 0.02):
    """Materialize a whole parameter tree of small random normals in ONE
    jitted program (a per-leaf host loop would mean hundreds of dispatches;
    zeros would invite XLA to algebraically fold the matmuls away, making
    throughput numbers fake)."""

    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)
        out = []
        for i, s in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if jnp.issubdtype(s.dtype, jnp.floating):
                out.append(
                    (scale * jax.random.normal(k, s.shape)).astype(s.dtype)
                )
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return make()


def build_flagship(
    num_llm_layers: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> Tuple[QwenCALM, Dict[str, Any], AcousticVAE, Dict, HiFiGANGenerator, Dict]:
    """-> (calm, calm_params, vae, vae_params, vocoder, vocoder_params),
    all zero-initialized at flagship scale."""
    cfg = flagship_config(num_llm_layers)
    calm = QwenCALM(cfg, dtype=dtype)

    def calm_init(rng):
        from audio_calm_tpu.models.calm import init_calm_params

        return init_calm_params(calm, rng)

    calm_params = {"params": zeros_params_like(calm_init, jax.random.PRNGKey(0))}

    vae_cfg = VAEModelConfig()
    vae = AcousticVAE(vae_cfg)

    def vae_init(rng):
        return vae.init(
            {"params": rng, "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, 80)), train=False,
        )

    vae_params = zeros_params_like(vae_init, jax.random.PRNGKey(0))

    voc = HiFiGANGenerator(HiFiGANConfig())

    def voc_init(rng):
        return voc.init(rng, jnp.zeros((1, 8, 80)))

    voc_params = zeros_params_like(voc_init, jax.random.PRNGKey(0))
    return calm, calm_params, vae, vae_params, voc, voc_params
