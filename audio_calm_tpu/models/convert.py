"""Checkpoint converters: HF/torch state dicts -> flax param trees.

Covers the three conversion surfaces named in SURVEY.md §7 "Hard parts":
  1. Qwen2 HF checkpoints (GQA packing, QKV bias, tied embeddings)
  2. torch nn.MultiheadAttention packed in_proj (DiT blocks / asr_cross_attn)
  3. reference AcousticVAE Conv1d/ConvTranspose1d stacks

All converters take a flat `{name: np.ndarray}` state dict so they work from
torch .bin (torch.load) or safetensors without importing torch here.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from audio_calm_tpu.config import Qwen2Config


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin / .pt / .safetensors file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_hf_dir_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all weight shards from a HF checkpoint directory."""
    out: Dict[str, np.ndarray] = {}
    files = sorted(os.listdir(path))
    shards = [f for f in files if f.endswith(".safetensors")]
    if not shards:
        shards = [f for f in files if f.endswith(".bin") and "optim" not in f]
    for f in shards:
        out.update(load_torch_state_dict(os.path.join(path, f)))
    return out


# ---------------------------------------------------------------------------
# Qwen2
# ---------------------------------------------------------------------------
def convert_qwen2(
    sd: Dict[str, np.ndarray], cfg: Qwen2Config
) -> Dict[str, Any]:
    """HF Qwen2 state dict -> {"embed": ..., "model": ...} flax param trees.

    HF linear weights are [out, in]; flax kernels are [in, out] (transpose).
    """

    def get(name):
        for prefix in ("model.", ""):
            if prefix + name in sd:
                return np.asarray(sd[prefix + name])
        raise KeyError(name)

    embed = {"embedding": get("embed_tokens.weight").astype(np.float32)}

    model: Dict[str, Any] = {}
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        attn = {}
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            d = {"kernel": get(p + f"self_attn.{proj}.weight").T.astype(np.float32)}
            bname = p + f"self_attn.{proj}.bias"
            if ("model." + bname) in sd or bname in sd:
                d["bias"] = get(f"layers.{i}.self_attn.{proj}.bias").astype(np.float32)
            attn[proj] = d
        mlp = {
            proj: {"kernel": get(p + f"mlp.{proj}.weight").T.astype(np.float32)}
            for proj in ("gate_proj", "up_proj", "down_proj")
        }
        model[f"layers_{i}"] = {
            "self_attn": attn,
            "mlp": mlp,
            "input_layernorm": {"scale": get(p + "input_layernorm.weight").astype(np.float32)},
            "post_attention_layernorm": {
                "scale": get(p + "post_attention_layernorm.weight").astype(np.float32)
            },
        }
    model["norm"] = {"scale": get("norm.weight").astype(np.float32)}
    return {"embed": embed, "model": model}


def merge_params(initialized: Any, converted: Any) -> Any:
    """Overlay converted leaves onto an initialized tree (keeps extra leaves
    like lora_a/lora_b that conversion does not provide)."""
    if isinstance(initialized, dict):
        out = dict(initialized)
        for k, v in (converted or {}).items():
            if k in out:
                out[k] = merge_params(out[k], v)
            else:
                out[k] = v
        return out
    if converted is None:
        return initialized
    converted = np.asarray(converted)
    assert np.shape(initialized) == converted.shape, (
        np.shape(initialized), converted.shape)
    return converted


# ---------------------------------------------------------------------------
# torch nn.MultiheadAttention (packed in_proj) -> our MultiheadAttention
# ---------------------------------------------------------------------------
def convert_torch_mha(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Dict[str, Any]:
    """torch MHA params -> {q,k,v,out}_proj {kernel,bias} (flax layout)."""
    w = np.asarray(sd[prefix + "in_proj_weight"])  # [3E, E]
    b = np.asarray(sd[prefix + "in_proj_bias"])  # [3E]
    E = w.shape[1]
    wq, wk, wv = w[:E], w[E : 2 * E], w[2 * E :]
    bq, bk, bv = b[:E], b[E : 2 * E], b[2 * E :]
    return {
        "q_proj": {"kernel": wq.T.astype(np.float32), "bias": bq.astype(np.float32)},
        "k_proj": {"kernel": wk.T.astype(np.float32), "bias": bk.astype(np.float32)},
        "v_proj": {"kernel": wv.T.astype(np.float32), "bias": bv.astype(np.float32)},
        "out_proj": {
            "kernel": np.asarray(sd[prefix + "out_proj.weight"]).T.astype(np.float32),
            "bias": np.asarray(sd[prefix + "out_proj.bias"]).astype(np.float32),
        },
    }


# ---------------------------------------------------------------------------
# Conv helpers (reference AcousticVAE / projector)
# ---------------------------------------------------------------------------
def conv1d_w(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight [out, in, k] -> flax [k, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0))).astype(np.float32)


def conv_transpose1d_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d weight [in, out, k] -> our [k, in, out]
    (our module flips the spatial axis at call time)."""
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))).astype(np.float32)
