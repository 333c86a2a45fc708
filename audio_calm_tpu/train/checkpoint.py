"""Checkpointing: orbax manager + component-sharded export.

Mirrors the reference's two-level scheme (SURVEY.md §5):
  1. step checkpoints with save_total_limit / best-metric retention
     (HF Trainer equivalent) -> orbax CheckpointManager over
     {step, trainable, opt_state}
  2. component-sharded export: each logical component (input_proj,
     tts_flow_head, asr_flow_head, soa_embed, tts_len_predictor,
     tts_dur_predictor, asr_query_embed, asr_cross_attn, lora) saved as its
     own item, enabling the cross-stage "soft restart"
     (reference train_calm.py:374-398).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax.traverse_util import flatten_dict, unflatten_dict

COMPONENTS = (
    "input_proj",
    "tts_flow_head",
    "asr_flow_head",
    "soa_embed",
    "tts_len_predictor",
    "tts_dur_predictor",
    "asr_query_embed",
    "asr_cross_attn",
)


def make_manager(
    directory: str,
    save_total_limit: int = 2,
    best_metric: Optional[str] = "loss",
) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=save_total_limit,
        best_fn=(lambda m: m[best_metric]) if best_metric else None,
        best_mode="min",
        create=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(
    manager: ocp.CheckpointManager,
    step: int,
    trainable_flat: Dict,
    opt_state: Any,
    metrics: Optional[Dict[str, float]] = None,
) -> None:
    payload = {
        "trainable": unflatten_dict(trainable_flat),
        "opt_state": opt_state,
    }
    manager.save(
        step, args=ocp.args.StandardSave(payload), metrics=metrics or {}
    )


def restore_train_state(
    manager: ocp.CheckpointManager,
    trainable_flat: Dict,
    opt_state: Any,
    step: Optional[int] = None,
):
    """Restore (trainable_flat, opt_state) using the given trees as targets."""
    step = step if step is not None else manager.latest_step()
    target = {
        "trainable": unflatten_dict(trainable_flat),
        "opt_state": opt_state,
    }
    restored = manager.restore(step, args=ocp.args.StandardRestore(target))
    return flatten_dict(restored["trainable"]), restored["opt_state"], step


# ---------------------------------------------------------------------------
# Component-sharded export / soft restart
# ---------------------------------------------------------------------------
def _param_subtree(params: Dict, component: str):
    if component == "lora":
        flat = flatten_dict(params)
        sub = {k: v for k, v in flat.items()
               if k[-1] in ("lora_a", "lora_b")}
        return unflatten_dict(sub) if sub else None
    node = params.get(component)
    if node is None:
        return None
    if component == "soa_embed":
        return {"value": node}  # bare array -> wrap for orbax
    return node


def save_components(params: Dict, directory: str) -> None:
    """Write each component as `<dir>/<name>/` orbax item + manifest."""
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    saved = []
    for comp in COMPONENTS + ("lora",):
        sub = _param_subtree(params, comp)
        if sub is None:
            continue
        ckptr.save(
            os.path.join(os.path.abspath(directory), comp),
            jax.tree_util.tree_map(np.asarray, sub),
            force=True,
        )
        saved.append(comp)
    ckptr.wait_until_finished()
    with open(os.path.join(directory, "components.json"), "w") as f:
        json.dump({"components": saved}, f)


def load_component(directory: str, component: str, target) -> Any:
    """Load one component item; `target` provides structure/shapes."""
    ckptr = ocp.StandardCheckpointer()
    if component == "soa_embed":
        out = ckptr.restore(
            os.path.join(os.path.abspath(directory), component),
            target={"value": np.asarray(target)},
        )
        return out["value"]
    return ckptr.restore(
        os.path.join(os.path.abspath(directory), component),
        target=jax.tree_util.tree_map(np.asarray, target),
    )


def load_torch_component(path: str, component: str, model_cfg=None) -> Any:
    """Convert a reference torch component .bin into our flax subtree
    (reference save layout: modeling_calm.py:911-936)."""
    from audio_calm_tpu.models import convert as C

    sd = C.load_torch_state_dict(path)
    if component in ("tts_flow_head", "asr_flow_head"):
        if C.is_legacy_flow_head(sd):
            # pre-DiT dilated-ResNet head (modeling_calm.py:100-168)
            return C.convert_legacy_flow_head(sd)
        num_layers = 0
        while any(k.startswith(f"blocks.{num_layers}.") for k in sd):
            num_layers += 1
        has_ctx = "context_proj.weight" in sd
        return C.convert_flow_head(sd, num_layers, has_ctx)
    if component == "input_proj":
        return C.convert_input_projector(sd)
    if component in ("tts_len_predictor", "tts_dur_predictor"):
        return C.convert_predictor(sd)
    if component == "asr_cross_attn":
        return C.convert_torch_mha(sd)
    if component == "asr_query_embed":
        return {"embedding": np.asarray(sd["weight"]).astype(np.float32)}
    if component == "soa_embed":
        return np.asarray(sd["weight"]).astype(np.float32).reshape(1, 1, -1)
    if component == "vae":
        return C.convert_vae_params(sd)
    if component == "lora":
        # peft adapter_model.bin/.safetensors (reference train_calm.py:471-485,
        # eval_calm.py:249-252); returns a partial llm subtree
        return C.convert_peft_adapter(sd)
    raise ValueError(f"unknown torch component {component}")


def _find_torch_component_file(directory: str, component: str) -> Optional[str]:
    """Reference checkpoint layout: `<dir>/<comp>.bin` (train_calm.py:336-358)
    plus peft's `adapter_model.bin|.safetensors` for LoRA."""
    names = [f"{component}.bin", f"{component}.pt", f"{component}.safetensors"]
    if component == "lora":
        names = ["adapter_model.bin", "adapter_model.safetensors"] + names
    for n in names:
        p = os.path.join(directory, n)
        if os.path.isfile(p):
            return p
    return None


def soft_restart(params: Dict, paths: Dict[str, Optional[str]]) -> Dict:
    """Overlay pretrained components onto params (stage-2 warm start).

    paths: {component: path or None}. A path may be an orbax components
    directory (ours), a reference torch `.bin` file, or a reference
    checkpoint directory containing `<comp>.bin` / `adapter_model.bin`
    (all converted on load). Returns updated params dict.
    """
    from audio_calm_tpu.models.convert import merge_params

    params = dict(params)
    for comp, path in paths.items():
        if not path:
            continue
        if os.path.isdir(path):
            torch_file = _find_torch_component_file(path, comp)
            # prefer our orbax item when both exist
            if torch_file and not os.path.isdir(os.path.join(path, comp)):
                path = torch_file
        if os.path.isfile(path) and path.endswith((".bin", ".pt", ".safetensors")):
            if comp == "lora":
                # adapter leaves live inside the llm tree, not a top-level node
                params["llm"] = merge_params(
                    params["llm"], load_torch_component(path, "lora")
                )
            else:
                params[comp] = merge_params(
                    params[comp], load_torch_component(path, comp)
                )
            continue
        if not os.path.isdir(os.path.join(path, comp)):
            continue  # nothing stored for this component
        if comp == "lora":
            flat = flatten_dict(params)
            target = {
                k: v for k, v in flat.items() if k[-1] in ("lora_a", "lora_b")
            }
            loaded = flatten_dict(
                load_component(path, "lora", unflatten_dict(target))
            )
            flat.update(loaded)
            params = unflatten_dict(flat)
        else:
            params[comp] = load_component(path, comp, params[comp])
    return params
