"""Training-throughput bench: reproduce BASELINE.md's train-step numbers.

Runs the flagship (or a sized-down) CALM/VAE train step on synthetic
batches at a given recipe and prints one JSON line per measured geometry:

    python scripts/bench_train.py --task asr --batch 16 --microbatch 8 \
        --buckets 96,192,288,384

Timing: each step ends with a loss readback (the axon tunnel ignores
block_until_ready — BASELINE.md "Axon tunnel tax"); the reported min-step
therefore includes the ~26 ms per-dispatch tunnel floor that a production
host does not pay. FLOPs come from a scan-free microbatch=1 twin of the
step (XLA counts a lax.scan body once — utils/profiling.lowered_flops).

The reference's counterpart is the thop probe + steps/sec logs of
train_calm.py:521-567; here the whole measurement is a reproducible CLI.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=("tts", "asr", "vae"), default="asr")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--microbatch", type=int, default=8)
    p.add_argument("--buckets", default="384",
                   help="comma-separated audio grid lengths to measure")
    p.add_argument("--steps", type=int, default=6,
                   help="timed steps per geometry (min is reported)")
    p.add_argument("--llm-layers", type=int, default=None,
                   help="size down the Qwen2 backbone (default: flagship 28)")
    p.add_argument("--frozen-dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--text-pad", type=int, default=None,
                   help="LLM prompt width (asr: data.asr_text_pad recipe; "
                        "default max_text_len)")
    p.add_argument("--crop", type=int, default=256,
                   help="vae task: mel crop frames")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 1)
        except RuntimeError:
            # backend already initialized (e.g. under pytest, whose conftest
            # already forced the CPU platform) — keep its device setup
            pass

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import TrainingConfig
    from audio_calm_tpu.utils.cache import enable_compilation_cache
    from audio_calm_tpu.utils.profiling import (device_peak_flops,
                                                lowered_flops)

    enable_compilation_cache()
    B, K = args.batch, args.microbatch
    t_cfg = TrainingConfig(per_device_train_batch_size=B,
                           microbatch_steps=K,
                           frozen_weights_dtype=args.frozen_dtype)
    peak = device_peak_flops()

    if args.task == "vae":
        from audio_calm_tpu.config import VAEModelConfig
        from audio_calm_tpu.models.vae import AcousticVAE
        from audio_calm_tpu.train.steps import (init_train_state,
                                                make_vae_step)
        from audio_calm_tpu.train.optim import (make_optimizer,
                                                partition_params,
                                                vae_param_label)

        vae = AcousticVAE(VAEModelConfig())
        rng = jax.random.PRNGKey(0)
        mel = jnp.zeros((1, args.crop, 80))
        params = vae.init({"params": rng, "noise": rng}, mel, train=True)
        flat, _ = partition_params(params["params"], vae_param_label)
        tx = make_optimizer(t_cfg, flat, vae_param_label, 1000)
        state = init_train_state(flat, tx)
        step = jax.jit(make_vae_step(vae, tx))
        npr = np.random.default_rng(0)
        batch = {"mel": jnp.asarray(
            npr.normal(size=(B, args.crop, 80)).astype(np.float32))}
        state, out = step(state, batch, rng)
        np.asarray(out["loss"])
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, out = step(state, batch, rng)
            np.asarray(out["loss"])
            times.append(time.time() - t0)
        tmin = min(times)
        print(json.dumps({
            "task": "vae", "batch": B, "crop": args.crop,
            "step_min_s": round(tmin, 4),
            "samples_per_s": round(B / tmin, 1),
        }))
        return 0

    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.flagship import cast_floating, flagship_config
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.optim import (calm_param_label, make_optimizer,
                                            partition_params)
    from audio_calm_tpu.train.steps import (init_train_state, make_calm_step,
                                            shard_step)

    m = flagship_config(num_llm_layers=args.llm_layers)
    model = QwenCALM(m, dtype=jnp.bfloat16)
    print("init params...", file=sys.stderr, flush=True)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    label = lambda k: calm_param_label(k, task_mode=args.task)
    trainable, frozen = partition_params(params, label)
    del params  # keep only trainable/frozen refs (see train_calm.py)
    if args.frozen_dtype == "bfloat16":
        fp32_frozen, frozen = frozen, cast_floating(frozen, jnp.bfloat16)
        for leaf in fp32_frozen.values():
            if hasattr(leaf, "delete"):
                leaf.delete()
        del fp32_frozen
    tx = make_optimizer(t_cfg, trainable, label, 1000)
    state = init_train_state(trainable, tx)
    mesh = make_mesh()
    step, state, frozen = shard_step(
        make_calm_step(model, tx, args.task, microbatch=K), mesh, state,
        frozen)
    probe = make_calm_step(model, tx, args.task, microbatch=1)

    sd = jax.ShapeDtypeStruct
    state_sd = jax.tree.map(lambda a: sd(a.shape, a.dtype), state)
    frozen_sd = jax.tree.map(lambda a: sd(a.shape, a.dtype), frozen)

    rng = jax.random.PRNGKey(1)
    t_txt = args.text_pad or m.max_text_len
    for t_aud in [int(x) for x in args.buckets.split(",")]:
        npr = np.random.default_rng(t_aud)
        batch = {
            "text_ids": jnp.asarray(
                npr.integers(1, 1000, (B, t_txt)), jnp.int32),
            "attention_mask": jnp.ones((B, t_txt), jnp.int32),
            "latents": jnp.asarray(
                npr.normal(size=(B, t_aud, m.latent_dim)).astype(np.float32)),
            "audio_mask": jnp.ones((B, t_aud), jnp.int32),
        }
        if args.task == "asr":
            batch["labels"] = jnp.asarray(
                npr.integers(1, 1000, (B, m.max_text_len)), jnp.int32)
        batch_sd = jax.tree.map(
            lambda a: sd(a.shape, a.dtype), batch)
        flops = lowered_flops(probe, state_sd, frozen_sd, batch_sd,
                              sd((2,), jnp.uint32))
        print(f"compile t_aud={t_aud} ...", file=sys.stderr, flush=True)
        # shard_step donates the state buffers: thread the returned state
        # through every call (reusing a donated input is an Execute error)
        t0 = time.time()
        state, out = step(state, frozen, batch, rng)
        loss = float(np.asarray(out["loss"]))
        print(f"  compiled+ran in {time.time()-t0:.1f}s loss={loss:.4f}",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, out = step(state, frozen, batch, rng)
            np.asarray(out["loss"])
            times.append(time.time() - t0)
        tmin = min(times)
        rec = {
            "task": args.task, "batch": B, "microbatch": K, "t_aud": t_aud,
            "text_pad": t_txt,
            "step_min_s": round(tmin, 4),
            "step_mean_s": round(sum(times) / len(times), 4),
            "samples_per_s": round(B / tmin, 1),
        }
        if flops:
            rec["step_tflops"] = round(flops / 1e12, 2)
            if peak:
                rec["mfu_pct"] = round(100 * flops / tmin / peak, 1)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
