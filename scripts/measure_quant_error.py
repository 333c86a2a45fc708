#!/usr/bin/env python
"""Measure weight-only int8 error at flagship geometry (BASELINE evidence).

Replaces the round-3 extrapolation ("1.27% on a hidden-64 toy, ~5x lower
expected at 1536 fan-in") with direct numbers: relative hidden-state error
of the quantized Qwen2 stack at the REAL width/depth, random weights (the
quant-noise statistics depend on fan-in and depth, not on training).

    python scripts/measure_quant_error.py [--layers 28]

Prints one JSON line. CPU-friendly (~1.5B params, a few minutes on the
1-core host); --layers sizes down the depth sweep.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--seq", type=int, default=32)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args(argv)

    import jax

    # always host-side: the quant-noise statistic needs no TPU
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import LoRAConfig, Qwen2Config
    from audio_calm_tpu.models.quant import _quantize_kernel

    cfg = Qwen2Config()
    rng = np.random.default_rng(0)

    # --- single projection at flagship fan-in (the clean statistic) ------
    def proj_err(fan_in, fan_out, n=4):
        errs = []
        for i in range(n):
            w = rng.standard_normal((fan_in, fan_out)).astype(np.float32)
            w *= 0.02  # init-scale irrelevant for relative error; kept real
            x = rng.standard_normal((args.batch * args.seq, fan_in)).astype(
                np.float32)
            q, s = _quantize_kernel(jnp.asarray(w))
            y = x @ w
            yq = x @ (np.asarray(q, np.float32) * np.asarray(s)[None, :])
            errs.append(float(np.linalg.norm(yq - y) / np.linalg.norm(y)))
        return sum(errs) / len(errs)

    e64 = proj_err(64, 64)
    e1536 = proj_err(cfg.hidden_size, cfg.hidden_size)
    e_mlp = proj_err(cfg.intermediate_size, cfg.hidden_size)

    # --- full stack at flagship geometry --------------------------------
    from audio_calm_tpu.models.qwen2 import Qwen2Model
    from audio_calm_tpu.models.quant import quantize_llm_int8

    cfg.num_hidden_layers = args.layers
    model = Qwen2Model(cfg, lora=LoRAConfig(rank=64, alpha=128, dropout=0.0))
    x = jnp.asarray(
        rng.standard_normal((args.batch, args.seq, cfg.hidden_size)),
        jnp.float32)
    print(f"init {args.layers}-layer flagship-width stack...",
          file=sys.stderr, flush=True)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    qparams, qscale = quantize_llm_int8(params)
    out = model.apply({"params": qparams, "qscale": qscale}, x)
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(
        jnp.float32)) / jnp.linalg.norm(ref.astype(jnp.float32)))

    print(json.dumps({
        "proj_rel_err_fan64": round(e64, 5),
        "proj_rel_err_fan1536": round(e1536, 5),
        "proj_rel_err_fan8960_mlp_down": round(e_mlp, 5),
        "stack_rel_err": round(rel, 5),
        "layers": args.layers, "hidden": cfg.hidden_size,
        "seq": args.seq, "batch": args.batch,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
