"""Multi-chip inference placement (TP params + DP batch rows).

The reference serves from exactly one GPU (its eval path is a single
process with no tensor parallelism anywhere — SURVEY §2.6). TPU-native
serving scales two ways on one pod slice, both purely declaratively:

  - tensor parallel ("model" axis): the Megatron split of the transformer
    kernels (parallel.tp rules — col-parallel up-projections,
    row-parallel down-projections) divides the weight HBM traffic of the
    weight-bandwidth-bound B=1 LLM encode across chips, with GSPMD
    inserting one all-reduce per sublayer over ICI;
  - data parallel ("data" axis): batched serving groups
    (CALMInference.tts_batch / asr_batch) shard their rows, multiplying
    aggregate throughput.

Placement is sharding annotation only: params are device_put ONCE onto
NamedShardings, batched inputs shard their leading dim, and the SAME
jitted programs the single-chip path runs compile SPMD over the mesh —
no separate multi-chip code path to keep correct.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_calm_tpu.parallel.tp import tp_shardings


def inference_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Sharding pytree for a full inference param dict (any collections:
    "params", int8 "quant" scales, ...). Transformer kernels follow the
    Megatron TP rules over the "model" axis; everything else (DiT heads,
    VAE, vocoder, norms, LoRA) replicates. Collections are flattened
    independently so the path-suffix rules see the same paths training
    does."""
    out = {}
    for coll, tree in params.items():
        if not isinstance(tree, dict):
            out[coll] = NamedSharding(mesh, P())
            continue
        flat = flatten_dict(tree)
        sh = tp_shardings(flat, mesh)
        out[coll] = unflatten_dict(sh)
    return out


def shard_inference_params(params: Dict, mesh: Mesh) -> Dict:
    """Place an inference param dict onto the mesh (one device_put for the
    whole tree; per-leaf dispatch through the TPU tunnel is minutes)."""
    return jax.device_put(params, inference_param_shardings(params, mesh))


def shard_batch_rows(arrays, mesh: Optional[Mesh]):
    """Shard the leading (batch) dim of each array over the "data" axis
    when it divides evenly; replicate otherwise (e.g. solo B=1 requests on
    a dp mesh — correct, just not row-parallel). No-op without a mesh."""
    if mesh is None:
        return arrays
    n = mesh.shape.get("data", 1)

    def put(x):
        spec = P("data") if x.ndim >= 1 and x.shape[0] % n == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, arrays)
