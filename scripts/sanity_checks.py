#!/usr/bin/env python
"""Sanity-check harness (reference scripts/run_sanity_checks.py).

  python scripts/sanity_checks.py --config configs/tts.yaml \
      [--components DIR] [--latent-audit data/latents/dev] [--cpu]

Checks: (1) latent-store audit (NaN/Inf/moments); (2) flow learning vs the
pred_v=0 baseline of 2.0; (3) length/duration predictor relative error with
MAS-derived ground truth.
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", default=None)
    p.add_argument("--latent-audit", default=None)
    p.add_argument("--vae-upper-bound", default=None,
                   help="latent dir: decode stored GT latents -> wav "
                        "(invariant 1, run_sanity_checks.py:17-63)")
    p.add_argument("--vae-ckpt", default=None, help="orbax VAE params dir")
    p.add_argument("--vocoder", default=None,
                   help="HiFi-GAN checkpoint (file or SpeechBrain dir); "
                        "default Griffin-Lim")
    p.add_argument("--out-dir", default="outputs/sanity")
    p.add_argument("--max-batches", type=int, default=4)
    p.add_argument("--byte-tokenizer", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.diagnostics.sanity import (
        audit_latents, check_flow_learning, predictor_error_stats,
    )

    ok = True

    if args.latent_audit:
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(args.latent_audit)
            for f in fs
            if f.endswith((".npz", ".npy", ".pt"))
        ]
        audit = audit_latents(files)
        print(f"[latent audit] {audit.verdict}: {audit.n_files} files, "
              f"mean={audit.mean:.4f} std={audit.std:.4f} "
              f"range=[{audit.vmin:.2f},{audit.vmax:.2f}] "
              f"nan={audit.n_nan} inf={audit.n_inf}")
        if audit.advice:
            print(f"  advice: {audit.advice}")
        ok &= audit.verdict != "FAIL"

    if args.vae_upper_bound:
        # invariant 1: decode ground-truth latents to audio; if this sounds
        # bad, nothing downstream can work
        import wave as wavelib

        from audio_calm_tpu.config import VAEModelConfig
        from audio_calm_tpu.data.datasets import load_array
        from audio_calm_tpu.models.vae import AcousticVAE, denormalize_mel
        from audio_calm_tpu.models.vocoder import load_vocoder

        files_probe = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(args.vae_upper_bound)
            for f in fs
            if f.endswith((".npz", ".npy", ".pt"))
        ]
        if not files_probe:
            print("[vae upper bound] no latents found")
            return 1
        from audio_calm_tpu.data.datasets import load_array as _la

        lat_dim = _la(files_probe[0]).shape[1]
        vae_cfg = VAEModelConfig(latent_channels=lat_dim)
        vae = AcousticVAE(vae_cfg)
        if args.vae_ckpt:
            import orbax.checkpoint as ocp

            target = jax.eval_shape(
                lambda: vae.init(
                    {"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 8, 80)), train=False,
                )
            )
            vparams = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.vae_ckpt), target=target
            )
        else:
            print("[vae upper bound] WARNING: random-init VAE")
            vparams = vae.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, 8, 80)), train=False,
            )
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(args.vae_upper_bound)
            for f in fs
            if f.endswith((".npz", ".npy", ".pt"))
        ][:10]
        voc = load_vocoder(args.vocoder)
        print(f"[vae upper bound] vocoder: {type(voc).__name__}")
        os.makedirs(args.out_dir, exist_ok=True)
        for i, fp in enumerate(files):
            lat = load_array(fp)[None]
            mel = denormalize_mel(
                vae.apply(vparams, jnp.asarray(lat), method=AcousticVAE.decode),
                vae_cfg,
            )
            wav = np.asarray(voc(mel))[0]
            x16 = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
            with wavelib.open(
                os.path.join(args.out_dir, f"upper_bound_{i}.wav"), "wb"
            ) as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(x16.tobytes())
        print(f"[vae upper bound] decoded {len(files)} latents -> "
              f"{args.out_dir} (listen to judge the ceiling)")

    from audio_calm_tpu.config import CALMConfig, load_config
    from audio_calm_tpu.data.collator import calm_batch_iterator
    from audio_calm_tpu.data.datasets import CalmDataset
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.train.checkpoint import COMPONENTS, soft_restart

    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    m, d = cfg.model, cfg.data

    from audio_calm_tpu.data.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(m, byte_fallback=args.byte_tokenizer)

    tts = d.datasets.get("tts")
    if not tts or not tts.latent_dir or not os.path.isdir(tts.latent_dir):
        print("[flow check] skipped: no tts latent dir")
        return 0 if ok else 1
    ds = CalmDataset(
        tokenizer, tts_latent_dir=tts.latent_dir, tts_subsets=tts.subsets,
        max_text_len=d.max_text_len, max_audio_len=d.max_audio_len,
        task_mode="tts", latent_dim=m.latent_dim,
    )
    model = QwenCALM(m, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    if args.components:
        params = soft_restart(
            params, {c: args.components for c in COMPONENTS + ("lora",)}
        )

    batches = []
    it = calm_batch_iterator(ds, 2, tokenizer.pad_token_id or 0, m.latent_dim,
                             task_prob_tts=1.0, training=False, seed=0,
                             epochs=1)
    for b in it:
        batches.append({k: jnp.asarray(v) for k, v in b.items() if k != "task"})
        if len(batches) >= args.max_batches:
            break
    if not batches:
        print("[flow check] skipped: no batches")
        return 0 if ok else 1

    res = check_flow_learning(model, {"params": params}, batches,
                              jax.random.PRNGKey(0))
    print(f"[flow check] {res['verdict']}: loss_tts={res['loss_tts']:.4f} "
          f"(pred_v=0 baseline={res['baseline']})")
    ok &= res["verdict"] != "FAIL"

    # len predictor relative error over the same batches
    preds, gts = [], []
    for i, b in enumerate(batches):
        cond_vec, text_ctx, text_pad = model.apply(
            {"params": params}, b["text_ids"], b["attention_mask"], False,
            method=QwenCALM.encode_text_for_tts,
        )
        lp = model.apply({"params": params}, text_ctx, text_pad,
                         method=QwenCALM.predict_length)
        preds.append(np.asarray(lp))
        gts.append(np.asarray(b["audio_mask"].sum(axis=1)))
    stats = predictor_error_stats(np.concatenate(preds), np.concatenate(gts))
    print(f"[len predictor] rel err mean={stats['mean']:.3f} "
          f"p50={stats['p50']:.3f} p90={stats['p90']:.3f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
