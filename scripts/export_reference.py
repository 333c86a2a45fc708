#!/usr/bin/env python
"""Export a trained checkpoint into the reference's torch layout.

  python scripts/export_reference.py --config configs/tts.yaml \
      --components outputs/checkpoints/run/components --out ref_ckpt/ [--cpu]

Writes the 8 component `.bin`s (+ `adapter_model.bin` when LoRA leaves are
present) exactly as the reference saves them (modeling_calm.py:911-936),
so this framework's checkpoints load in the reference codebase — the
inverse direction of soft_restart's torch-.bin support.
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", required=True,
                   help="orbax components dir (train_calm output)")
    p.add_argument("--out", required=True, help="destination directory")
    p.add_argument("--vae", default=None,
                   help="optional orbax VAE params dir to export as vae.bin")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from audio_calm_tpu.config import CALMConfig, load_config
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.convert_export import save_reference_checkpoint
    from audio_calm_tpu.train.checkpoint import COMPONENTS, soft_restart

    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    model = QwenCALM(cfg.model, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    params = soft_restart(
        params, {c: args.components for c in COMPONENTS + ("lora",)}
    )

    vae_params = None
    if args.vae:
        from audio_calm_tpu.models.vae import load_vae

        _, loaded = load_vae(args.vae)
        vae_params = loaded["params"] if "params" in loaded else loaded

    files = save_reference_checkpoint(params, args.out, vae_params=vae_params)
    for f in files:
        print(f"wrote {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
