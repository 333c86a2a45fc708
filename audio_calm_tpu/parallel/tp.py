"""Tensor-parallel sharding rules (Megatron-style, declarative).

The reference has no TP (SURVEY §2.6) — single-chip replicas suffice at
1.5B — but production serving/training wants the option. TPU-native TP is
purely declarative: annotate parameter shardings over the mesh "model" axis
and let GSPMD insert the all-reduces.

Rules (column-parallel up-projections, row-parallel down-projections, so
each transformer block needs one all-reduce per sublayer):
  attention q/k/v kernels  [in, out]  -> shard out   (heads split)
  attention o kernel       [in, out]  -> shard in
  MLP gate/up kernels                 -> shard out
  MLP down kernel                     -> shard in
  embedding table          [vocab, d] -> shard vocab
  LoRA a [in, r] / b [r, out]         -> replicate (r is small)
  everything else                     -> replicate
"""

from __future__ import annotations

from typing import Dict, Tuple

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
ROW_PARALLEL = ("o_proj", "down_proj")


def param_partition_spec(path: Tuple[str, ...]) -> P:
    """Flattened param path -> PartitionSpec over the 'model' axis."""
    leaf = path[-1]
    if leaf in ("lora_a", "lora_b"):
        return P()
    parent = path[-2] if len(path) >= 2 else ""
    if leaf == "kernel" and parent in COL_PARALLEL:
        return P(None, "model")
    if leaf == "bias" and parent in COL_PARALLEL:
        return P("model")
    if leaf == "kernel" and parent in ROW_PARALLEL:
        return P("model", None)
    if leaf == "embedding" and path[0] == "embed":
        return P("model", None)  # vocab-sharded embedding
    return P()


def tp_shardings(flat_params: Dict, mesh: Mesh) -> Dict:
    """{path: array} -> {path: NamedSharding}; falls back to replicated when
    the annotated dim is not divisible by the model-axis size."""
    n = mesh.shape.get("model", 1)
    out = {}
    for path, value in flat_params.items():
        spec = param_partition_spec(path)
        if n > 1 and spec != P():
            axis = list(spec).index("model")
            if value.shape[axis] % n != 0:
                spec = P()
        else:
            spec = spec if n > 1 else P()
        out[path] = NamedSharding(mesh, spec)
    return out
