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
# peft LoRA adapters (reference train_calm.py:458-485, eval_calm.py:249-252)
# ---------------------------------------------------------------------------
def convert_peft_adapter(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """peft `adapter_model.bin`/`.safetensors` state dict -> partial llm tree
    holding lora_a/lora_b leaves.

    peft keys look like
      base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight
    (older saves may carry an extra `.default.` adapter name). peft stores
    A as [r, in] and B as [out, r] (torch Linear layout); our LoRADense uses
    lora_a [in, r], lora_b [r, out], so both transpose. The alpha/r scaling
    is applied at runtime by both implementations, so weights convert 1:1.
    """
    out: Dict[str, Any] = {}
    for key, value in sd.items():
        k = key.replace(".default.", ".")
        if ".lora_A." in k:
            leaf = "lora_a"
        elif ".lora_B." in k:
            leaf = "lora_b"
        else:
            continue  # non-LoRA entries (e.g. modules_to_save) not supported
        # isolate "...layers.{i}.{self_attn|mlp}.{proj}..."
        parts = k.split(".")
        try:
            li = parts.index("layers")
        except ValueError:
            raise KeyError(f"cannot locate layer index in peft key {key!r}")
        layer, module, proj = parts[li + 1], parts[li + 2], parts[li + 3]
        w = np.asarray(value).T.astype(np.float32)
        out.setdefault(f"layers_{layer}", {}).setdefault(module, {}).setdefault(
            proj, {}
        )[leaf] = w
    if not out:
        raise ValueError("no lora_A/lora_B tensors found in adapter state dict")
    return out


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


def _lin(sd, name):
    """torch Linear -> flax Dense params."""
    return {
        "kernel": np.asarray(sd[name + ".weight"]).T.astype(np.float32),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }


def _conv(sd, name):
    return {"conv": {
        "kernel": conv1d_w(np.asarray(sd[name + ".weight"])),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }}


def _gn(sd, name):
    return {"gn": {
        "scale": np.asarray(sd[name + ".weight"]).astype(np.float32),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }}


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[name + ".weight"]).astype(np.float32),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }


# ---------------------------------------------------------------------------
# Reference component .bins -> flax component subtrees
# ---------------------------------------------------------------------------
def convert_flow_head(sd: Dict[str, np.ndarray], num_layers: int,
                      has_context: bool) -> Dict[str, Any]:
    """reference TransformerFlowHead state dict (tts_flow_head.bin /
    asr_flow_head.bin, modeling_calm.py:174-309) -> our flax tree."""
    out: Dict[str, Any] = {
        "time_mlp": {"fc1": _lin(sd, "time_mlp.1"),
                     "fc2": _lin(sd, "time_mlp.3")},
        "in_proj": _lin(sd, "in_proj"),
        "out_proj": _lin(sd, "out_proj"),
        "final_adaLN": {"emb": _lin(sd, "final_adaLN.emb.1")},
    }
    if has_context and "context_proj.weight" in sd:
        out["context_proj"] = _lin(sd, "context_proj")
    for i in range(num_layers):
        p = f"blocks.{i}."
        blk: Dict[str, Any] = {
            "adaLN1": {"emb": _lin(sd, p + "adaLN1.emb.1")},
            "adaLN2": {"emb": _lin(sd, p + "adaLN2.emb.1")},
            "attn": convert_torch_mha(sd, p + "attn."),
            "mlp_fc1": _lin(sd, p + "mlp.0"),
            "mlp_fc2": _lin(sd, p + "mlp.2"),
        }
        if (p + "ctx_attn.in_proj_weight") in sd:
            blk["adaLN_ctx"] = {"emb": _lin(sd, p + "adaLN_ctx.emb.1")}
            blk["ctx_attn"] = convert_torch_mha(sd, p + "ctx_attn.")
            blk["ctx_gate"] = np.asarray(sd[p + "ctx_gate"]).astype(np.float32)
        out[f"blocks_{i}"] = blk
    return out


def convert_legacy_flow_head(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference legacy dilated-ResNet FlowMatchingHead state dict
    (modeling_calm.py:100-168, pre-DiT checkpoints) -> our flax tree
    (calm_heads.FlowMatchingHead).

    torch layout: time_mlp.{1,3} Linear, in_proj Conv1d(k3),
    layers.{i}.conv.{1,3} Conv1d (k3 dilated, k1), out_proj.0 GroupNorm,
    out_proj.2 Conv1d(k3, zero-init).
    """

    def conv(name):
        return {
            "kernel": conv1d_w(np.asarray(sd[name + ".weight"])),
            "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
        }

    num_layers = 0
    while f"layers.{num_layers}.conv.1.weight" in sd:
        num_layers += 1
    out: Dict[str, Any] = {
        "time_fc1": _lin(sd, "time_mlp.1"),
        "time_fc2": _lin(sd, "time_mlp.3"),
        "in_proj": conv("in_proj"),
        "out_norm": {
            "scale": np.asarray(sd["out_proj.0.weight"]).astype(np.float32),
            "bias": np.asarray(sd["out_proj.0.bias"]).astype(np.float32),
        },
        "out_proj": conv("out_proj.2"),
    }
    for i in range(num_layers):
        out[f"res{i}_conv1"] = conv(f"layers.{i}.conv.1")
        out[f"res{i}_conv2"] = conv(f"layers.{i}.conv.3")
    return out


def is_legacy_flow_head(sd: Dict[str, np.ndarray]) -> bool:
    """Distinguish a pre-DiT ResNet head .bin from a DiT head .bin."""
    return "layers.0.conv.1.weight" in sd


def convert_input_projector(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference AudioInputProjector (input_proj.bin,
    modeling_calm.py:33-95) -> our flax tree."""
    out: Dict[str, Any] = {
        "conv1": _conv(sd, "conv_block.0.conv"),
        "conv2": _conv(sd, "conv_block.2.conv"),
        "post_norm": _ln(sd, "post_norm"),
    }
    for i in range(2):
        out[f"block{i}_ln"] = _ln(sd, f"blocks.{i}.0")
        out[f"block{i}_fc1"] = _lin(sd, f"blocks.{i}.1")
        out[f"block{i}_fc2"] = _lin(sd, f"blocks.{i}.3")
    return out


def convert_predictor(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference len/dur predictor MLP (Sequential Linear-GELU-Linear)."""
    return {"fc1": _lin(sd, "0"), "fc2": _lin(sd, "2")}


def convert_vae_params(
    sd: Dict[str, np.ndarray], strides=(2, 2)
) -> Dict[str, Any]:
    """reference AcousticVAE state dict -> our flax tree
    (layer indices per modeling_vae.py:163-230)."""

    def res(prefix):
        return {
            "norm1": _gn(sd, prefix + ".conv.0"),
            "conv1": _conv(sd, prefix + ".conv.2"),
            "norm2": _gn(sd, prefix + ".conv.3"),
            "conv2": _conv(sd, prefix + ".conv.5"),
        }

    n = len(strides)
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.0")}
    for i in range(n):
        enc[f"down{i}_conv"] = _conv(sd, f"encoder.{i + 1}.0")
        enc[f"down{i}_res"] = res(f"encoder.{i + 1}.1")
    enc["norm_out"] = _gn(sd, f"encoder.{n + 1}")
    enc["conv_out"] = _conv(sd, f"encoder.{n + 3}")

    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder_net.0.0"),
        "res_in": res("decoder_net.0.1"),
        "conv_out": _conv(sd, "final_proj"),
    }
    for i in range(n):
        dec[f"up{i}_conv"] = {
            "kernel": conv_transpose1d_w(
                np.asarray(sd[f"decoder_net.{i + 1}.0.weight"])
            ),
            "bias": np.asarray(sd[f"decoder_net.{i + 1}.0.bias"]).astype(
                np.float32
            ),
        }
        dec[f"up{i}_res"] = res(f"decoder_net.{i + 1}.1")
    return {"encoder": enc, "decoder": dec}
