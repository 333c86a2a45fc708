"""Weight-only int8 quantization for the frozen LLM backbone (serving).

The B=1 TTS encode and the ASR encode are weight-bandwidth-bound: every
call re-reads the 1.5B frozen Qwen2 parameters from HBM. Storing the seven
projection kernels per block as int8 (+ one fp32 scale per output channel)
halves that traffic vs bf16; activations, LoRA adapters, norms, biases and
the embedding table stay in their original dtypes. Symmetric per-channel
absmax quantization — the standard weight-only recipe (no reference
counterpart; the reference serves fp16/bf16 torch modules,
eval/eval_calm.py:214-300).

Opt-in: AUDIO_CALM_LLM_WEIGHTS=int8 in serve.py / eval_calm.py / bench.py,
or call quantize_llm_int8 directly and pass the returned "qscale"
collection to model.apply. Accuracy bound is regression-tested
(tests/test_quant.py); measured end-to-end deltas live in BASELINE.md.

The whole transform runs as ONE jitted program so on-device param trees
quantize in place (a per-leaf host loop would mean hundreds of dispatches
through the axon tunnel).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the frozen base projections worth quantizing (LoRA a/b stay fp32)
_PROJ_NAMES = frozenset(
    ["q_proj", "k_proj", "v_proj", "o_proj",
     "gate_proj", "up_proj", "down_proj"]
)


def _quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] float -> (int8 [in, out], fp32 scale [out]); symmetric
    per-output-channel absmax."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_llm_int8(params: Dict) -> Tuple[Dict, Dict]:
    """params (a CALM or Qwen2 param tree containing an "llm" subtree, or
    an llm subtree itself) -> (params with int8 projection kernels,
    "qscale" collection tree mirroring the module paths).

    Usage:
        params, qscale = quantize_llm_int8(params)
        model.apply({"params": params, "qscale": qscale}, ...)
    """
    root = params.get("llm", params)

    @jax.jit
    def _transform(tree):
        def walk(t):
            new, scales = {}, {}
            for k, v in t.items():
                if isinstance(v, dict):
                    if k in _PROJ_NAMES and "kernel" in v:
                        q, s = _quantize_kernel(jnp.asarray(v["kernel"]))
                        new[k] = {**v, "kernel": q}
                        scales[k] = {"kernel_scale": s}
                    else:
                        sub_new, sub_scales = walk(v)
                        new[k] = sub_new
                        if sub_scales:
                            scales[k] = sub_scales
                else:
                    new[k] = v
            return new, scales

        return walk(tree)

    new_llm, llm_scales = _transform(root)
    if "llm" in params:
        return {**params, "llm": new_llm}, {"llm": llm_scales}
    return new_llm, llm_scales


def quantized_bytes_saved(params: Dict) -> int:
    """HBM bytes the int8 kernels save vs fp32 storage (diagnostic)."""
    root = params.get("llm", params)
    saved = 0

    def walk(tree):
        nonlocal saved
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in _PROJ_NAMES and "kernel" in v:
                    n = int(np.prod(v["kernel"].shape))
                    saved += 3 * n  # fp32 -> int8 (+scale, negligible)
                else:
                    walk(v)

    walk(root)
    return saved


def maybe_quantize_from_env(variables: Dict) -> Dict:
    """Apply AUDIO_CALM_LLM_WEIGHTS=int8 to a {"params": ...} variables
    dict; returns variables (with a "qscale" collection added) unchanged
    when the env var is unset."""
    import os

    if os.environ.get("AUDIO_CALM_LLM_WEIGHTS", "") != "int8":
        return variables
    params, qscale = quantize_llm_int8(variables["params"])
    print("LLM weights quantized to int8 "
          f"({quantized_bytes_saved(variables['params']) / 1e9:.2f} GB "
          "HBM saved vs fp32)")
    return {**variables, "params": params, "qscale": qscale}
