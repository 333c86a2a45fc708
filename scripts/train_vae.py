#!/usr/bin/env python
"""Train the acoustic VAE (reference train/train_vae.py equivalent).

  python scripts/train_vae.py --config configs/vae.yaml \
      [--override training.learning_rate=1e-4 ...] [--cpu]
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/vae.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap steps (overrides epochs)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize from env "
                        "(JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID); "
                        "all processes must share training.output_dir "
                        "(orbax coordinates checkpoint writes)")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend (8 virtual devices)")
    args = p.parse_args(argv)

    import jax

    if args.distributed:
        from audio_calm_tpu.parallel.mesh import init_distributed_from_env

        init_distributed_from_env()  # JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from audio_calm_tpu.config import VAEConfig, load_config
    from audio_calm_tpu.data.collator import mel_batch_iterator
    from audio_calm_tpu.data.datasets import MelDataset
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.loop import run_training
    from audio_calm_tpu.train.optim import (
        make_optimizer, partition_params, vae_param_label,
    )
    from audio_calm_tpu.train.steps import (
        init_train_state, make_vae_step, shard_step,
    )

    cfg = load_config(args.config, cls=VAEConfig, overrides=args.override)
    t = cfg.training

    train_ds = MelDataset(cfg.data.data_dir, cfg.data.train_subsets,
                          cfg.data.crop_size, training=True)
    if len(train_ds) == 0:
        print(f"no training data under {cfg.data.data_dir}", file=sys.stderr)
        return 1
    print(f"train files: {len(train_ds)}")

    mesh = make_mesh()
    global_bs = t.per_device_train_batch_size * mesh.shape["data"]
    steps_per_epoch = max(len(train_ds) // global_bs, 1)
    total_steps = args.max_steps or int(steps_per_epoch * t.num_train_epochs)

    model = AcousticVAE(cfg.model)
    params = model.init(
        {"params": jax.random.PRNGKey(t.seed),
         "noise": jax.random.PRNGKey(t.seed + 1)},
        jnp.zeros((1, cfg.data.crop_size, cfg.model.in_channels)),
        train=False,
    )["params"]
    trainable, _ = partition_params(params, vae_param_label)
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(trainable))
    print(f"params: {n_params/1e6:.2f}M | total steps: {total_steps} "
          f"| global batch: {global_bs} | mesh: {dict(mesh.shape)}")

    tx = make_optimizer(cfg.training, trainable, vae_param_label, total_steps)
    state = init_train_state(trainable, tx)
    raw_step = make_vae_step(model, tx)
    step, state, _ = shard_step(raw_step, mesh, state)

    # FLOPs probe at train start (reference train_calm.py:521-567 thop
    # probe); the VAE step has no scan so its own lowering counts exactly
    from audio_calm_tpu.utils.profiling import device_peak_flops, lowered_flops

    sd = jax.ShapeDtypeStruct
    step_fl = lowered_flops(
        raw_step,
        jax.tree.map(lambda a: sd(a.shape, a.dtype), state),
        {"mel": sd((global_bs, cfg.data.crop_size, cfg.model.in_channels),
                   jnp.float32)},
        sd((2,), jnp.uint32),
    )
    peak = device_peak_flops()
    print(f"vae step: {step_fl / 1e9:.2f} GFLOPs"
          + (f" ({step_fl / peak * 1e3:.2f} ms at peak)" if peak else ""))
    state_step_flops = lambda b: step_fl  # noqa: E731

    eval_fn = None
    if cfg.data.eval_data_dir:
        eval_ds = MelDataset(cfg.data.eval_data_dir, cfg.data.eval_subsets,
                             cfg.data.crop_size, training=False)
        if len(eval_ds):
            from audio_calm_tpu.train.optim import merge_partitions

            @jax.jit
            def eval_loss(trainable, mel):
                p = merge_partitions(trainable, {})
                out = model.apply({"params": p}, mel, train=False)
                return out["loss"]

            eval_bs = min(t.per_device_eval_batch_size, len(eval_ds))
            n_proc_eval = jax.process_count()
            if n_proc_eval > 1:
                # global arrays shard over the full data axis
                n_data = mesh.shape["data"]
                eval_bs = max(eval_bs - eval_bs % n_data, n_data)

            def eval_fn(state):
                losses = []
                for b in mel_batch_iterator(
                    eval_ds, eval_bs, training=False, epochs=1,
                    process_index=jax.process_index(),
                    process_count=n_proc_eval,
                ):
                    if n_proc_eval > 1:
                        from audio_calm_tpu.parallel.mesh import (
                            shard_host_batch,
                        )

                        mel = shard_host_batch(b, mesh)["mel"]
                    else:
                        mel = jnp.asarray(b["mel"])
                    losses.append(float(eval_loss(state.trainable, mel)))
                    if len(losses) >= 16:
                        break
                if not losses:
                    return {}
                return {"loss": sum(losses) / len(losses)}

    from audio_calm_tpu.data.prefetch import prefetch

    n_proc = jax.process_count()

    def batches(start_step: int):
        # seed folded with the resume step: no epoch-head replay on resume
        return prefetch(mel_batch_iterator(
            train_ds, global_bs, training=True,
            seed=t.seed + 1_000_003 * start_step,
            process_index=jax.process_index(), process_count=n_proc,
        ))

    batch_filter = None
    if n_proc > 1:
        from audio_calm_tpu.parallel.mesh import shard_host_batch

        batch_filter = lambda b: shard_host_batch(b, mesh)  # noqa: E731

    state = run_training(step, state, batches, t, total_steps,
                         jax.random.PRNGKey(t.seed), eval_fn=eval_fn,
                         batch_filter=batch_filter,
                         step_flops=state_step_flops)

    # export final params in the {"params": ...} layout every consumer of
    # --vae_ckpt expects (process_dataset latent extraction, eval_vae,
    # models.vae.load_vae)
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    from audio_calm_tpu.train.optim import merge_partitions

    final = {"params": merge_partitions(state.trainable, {})}
    ckptr = ocp.StandardCheckpointer()
    out = os.path.abspath(os.path.join(t.output_dir, "params"))
    ckptr.save(out, jax.tree_util.tree_map(np.asarray, final), force=True)
    ckptr.wait_until_finished()
    # geometry sidecar so load_vae / process_dataset reconstruct the model
    import dataclasses
    import json

    with open(os.path.join(t.output_dir, "vae_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg.model), f, indent=1)
    print(f"saved final VAE params to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
