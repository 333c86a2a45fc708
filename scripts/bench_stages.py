#!/usr/bin/env python
"""Per-stage device-time profile of the TTS serving pipeline.

    python scripts/bench_stages.py [--steps 4] [--method euler] [--cfg 1.0]
        [--batch 1] [--t-aud 384] [--iters 5] [--chain 6]

Answers "where does the euler-4 (distilled-protocol) pipeline spend its
51.5 ms?" (VERDICT r4 item 2): the flow ODE is nearly free at 4 evals, so
the render tail (VAE decode + vocoder) sets the ceiling — this script
measures each stage separately so optimization effort lands where the
time is. Stages mirror eval/infer.tts_generate_latents + eval/render
(reference decode path: eval/eval_calm.py:449-535 + vocoder :190-208):

  encode     Qwen2 LLM encode + length predictor   (tts_encode)
  condition  durations -> MAS-grid alignment -> per-frame condition
  ode        the flow ODE (steps x method x cfg head evals)
  vae_decode masked AcousticVAE decode + mel denorm
  vocoder    HiFi-GAN generator (fused Pallas by default)

Methodology: the axon tunnel costs ~26 ms PER DISPATCH, so single-dispatch
timing measures the tunnel, not the op. Each stage is timed with the
K-chained in-jit slope method (BASELINE.md "Timing methodology"): one jit
program runs the stage `chain` times with a 1e-20-scaled data dependency
between iterations (so XLA cannot parallelize or elide them), another runs
it once; slope = (t_chain - t_1) / (chain - 1) is pure device time. Each
program's completion barrier is a scalar checksum readback (~bytes).

Prints one JSON line per stage to stdout plus a summary with the stage sum
and the independently-measured fused full-pipeline time.
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--method", default="euler", choices=("euler", "midpoint"))
    p.add_argument("--cfg", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--t-aud", type=int, default=384)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--vocoder", default="fused", choices=("fused", "xla"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.infer import tts_condition, tts_encode
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.flagship import (
        cast_floating, device_random_params, flagship_config,
    )
    from audio_calm_tpu.models.vae import AcousticVAE, denormalize_mel
    from audio_calm_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator
    from audio_calm_tpu.ops.ode import ode_solve

    calm = QwenCALM(flagship_config(), dtype=jnp.bfloat16)
    vae = AcousticVAE(VAEModelConfig())
    voc = HiFiGANGenerator(HiFiGANConfig())
    if args.vocoder == "fused":
        from audio_calm_tpu.ops.pallas_vocoder import hifigan_apply_fused

        voc_apply = hifigan_apply_fused
    else:
        voc_apply = voc.apply

    calm_params = {
        "params": cast_floating(
            device_random_params(jax.eval_shape(
                lambda: init_calm_params(calm, jax.random.PRNGKey(0)))),
            jnp.bfloat16,
        )
    }
    vae_params = device_random_params(
        jax.eval_shape(lambda: vae.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, 80)), train=False)),
        seed=1,
    )
    voc_params = device_random_params(
        jax.eval_shape(
            lambda: voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))),
        seed=2,
    )

    B, T = args.batch, args.t_aud
    D = calm.cfg.qwen.hidden_size
    rng0 = np.random.default_rng(0)
    text_ids = jnp.asarray(rng0.integers(10, 5000, (B, 24)), jnp.int32)
    attn = jnp.ones_like(text_ids)
    num_frames = jnp.full((B,), T, jnp.int32)

    def checksum(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) * 1e-20) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    def slope_time(name, fn, feed, primary, params, iters, chain):
        """fn(params, primary) -> out; feed(primary, cs_scalar) -> primary'.
        `params` passes through jit as an ARGUMENT (closing over a 3 GB
        tree bakes it into the HLO as constants). Returns min-wall slope
        device seconds per fn call."""

        def make(k):
            @jax.jit
            def g(pp, prim):
                cs = jnp.float32(0)
                for _ in range(k):
                    out = fn(pp, prim)
                    cs = checksum(out)
                    prim = feed(prim, cs)
                return cs

            return g

        def retry(thunk, attempts=3):
            """The axon remote-compile helper occasionally drops a response
            mid-body; the compile usually landed in the persistent cache,
            so a straight retry recovers the sweep."""
            for i in range(attempts):
                try:
                    return thunk()
                except Exception as e:
                    if i == attempts - 1 or "INTERNAL" not in str(e):
                        raise
                    print(f"  transient compile error, retrying: {e}",
                          flush=True)
                    time.sleep(20)

        g1, gk = make(1), make(chain)
        retry(lambda: np.asarray(g1(params, primary)))  # compile + warm
        retry(lambda: np.asarray(gk(params, primary)))

        def best(g):
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                np.asarray(g(params, primary))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        t1, tk = best(g1), best(gk)
        per = (tk - t1) / (chain - 1)
        rec = {"stage": name, "ms": round(per * 1e3, 3),
               "t1_wall_ms": round(t1 * 1e3, 1),
               "tK_wall_ms": round(tk * 1e3, 1), "chain": chain}
        print(json.dumps(rec), flush=True)
        return per

    # ---- stage inputs (realistic intermediates, fixed seeds) -------------
    # run the real encode once to get representative ctx/cond tensors
    enc = jax.jit(lambda p, i, a: tts_encode(calm, p, i, a))
    cond_vec, text_ctx, text_pad, _ = enc(calm_params, text_ids, attn)
    cond_fn = jax.jit(lambda p, cv, tc, tp: tts_condition(
        calm, p, cv, tc, tp, num_frames, T))
    condition, frame_valid, _ = cond_fn(calm_params, cond_vec, text_ctx,
                                        text_pad)
    x_init = jax.random.normal(jax.random.PRNGKey(7),
                               (B, T, calm.cfg.latent_dim), condition.dtype)
    latents = jax.random.normal(jax.random.PRNGKey(8),
                                (B, T, calm.cfg.latent_dim), jnp.float32)
    dec_mask = (jnp.arange(T)[None, :] < T)[..., None].astype(jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(9),
                            (B, T * vae.cfg.total_stride, 80), jnp.float32)

    stages = {}

    # encode: int ids chain via a data-dependent (runtime-zero) offset
    stages["encode"] = slope_time(
        "encode",
        lambda pp, ids: tts_encode(calm, pp, ids, attn),
        lambda ids, cs: ids + jnp.round(cs).astype(jnp.int32),
        text_ids, calm_params, args.iters, args.chain)

    stages["condition"] = slope_time(
        "condition",
        lambda pp, tc: tts_condition(calm, pp, cond_vec, tc, text_pad,
                                     num_frames, T),
        lambda tc, cs: tc + cs.astype(tc.dtype),
        text_ctx, calm_params, args.iters, args.chain)

    def ode_stage(pp, x0):
        def head_fn(c, x, t, ctx, cmask, xmask):
            return calm.apply(pp, c, x, t, ctx, cmask, xmask,
                              method=QwenCALM.tts_flow_fn)

        return ode_solve(head_fn, condition, x0, args.steps, args.cfg,
                         context=text_ctx, context_mask=text_pad,
                         x_mask=~frame_valid, method=args.method)

    stages["ode"] = slope_time(
        "ode", ode_stage,
        lambda x0, cs: x0 + cs.astype(x0.dtype),
        x_init, calm_params, args.iters, args.chain)

    stages["vae_decode"] = slope_time(
        "vae_decode",
        lambda pp, la: denormalize_mel(
            vae.apply(pp, la, dec_mask, method=AcousticVAE.decode),
            vae.cfg),
        lambda la, cs: la + cs.astype(la.dtype),
        latents, vae_params, args.iters, args.chain)

    stages["vocoder"] = slope_time(
        "vocoder",
        lambda pp, m: voc_apply(pp, m),
        lambda m, cs: m + cs.astype(m.dtype),
        mel, voc_params, args.iters, args.chain)

    total = sum(stages.values())
    # latent frames -> samples: total_stride mel frames per latent x 256 hop
    audio_s = B * T * vae.cfg.total_stride * 256 / 16000
    print(json.dumps({
        "stage": "TOTAL(sum)", "ms": round(total * 1e3, 3),
        "config": {"steps": args.steps, "method": args.method,
                   "cfg": args.cfg, "batch": B, "t_aud": T,
                   "vocoder": args.vocoder},
        "audio_seconds": round(audio_s, 2),
        "rtf_device_stage_sum": round(audio_s / total, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
