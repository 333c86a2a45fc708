"""Flagship model assembly: the full Audio-CALM stack at reference scale.

Qwen2-1.5B-Instruct geometry backbone (+LoRA r=64), 128-dim acoustic VAE
(4x time compression), DiT flow heads (hidden 1024, 4 layers — the
tts_config.yaml setting), HiFi-GAN 16 kHz vocoder. Used by bench.py and
__graft_entry__.py; real deployments load converted weights on top
(models/convert.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config


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


_COMPUTE_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def resolve_compute_dtype(name: str):
    """evaluation.compute_dtype -> jnp dtype. "float32" is the reference
    eval protocol (the reference casts every module to torch.float32,
    eval_calm.py:284); "bfloat16" is the TPU serving recipe."""
    try:
        return _COMPUTE_DTYPES[name]
    except KeyError:
        raise ValueError(
            "evaluation.compute_dtype must be one of "
            f"{sorted(_COMPUTE_DTYPES)}, got {name!r}"
        ) from None


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
