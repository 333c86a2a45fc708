#!/usr/bin/env python
"""End-to-end demonstration: train the FULL stack from scratch on synthetic
tone "words", then synthesize each word and verify its pitch.

  python scripts/e2e_demo.py [--steps-vae 400] [--steps-calm 600] [--cpu]

Pipeline exercised: MelFrontend -> AcousticVAE training (DP mesh) -> latent
extraction -> QwenCALM TTS training (frozen tiny LLM + LoRA, MAS duration
targets, flow matching) -> length/duration prediction -> CFG flow ODE ->
VAE decode -> dominant-pitch check (and optional Griffin-Lim wavs).

Expected output: 3/3 words synthesize with the correct dominant mel band
(runs ~4 min on the CPU mesh; exact-match on the tone corpus).
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps-vae", type=int, default=400)
    p.add_argument("--steps-calm", type=int, default=600)
    p.add_argument("--write-wavs", default=None, help="dir for generated wavs")
    p.add_argument("--vocoder", default=None,
                   help="HiFi-GAN checkpoint path (default Griffin-Lim)")
    p.add_argument("--distill-steps", type=int, default=0,
                   help="stage-3 few-step distillation steps (0 = off)")
    p.add_argument("--distill-k", type=int, default=4,
                   help="student ODE step count for --distill-steps")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    matches, total, distilled = run_demo(
        args.steps_vae, args.steps_calm, args.write_wavs,
        vocoder_path=args.vocoder, distill_steps=args.distill_steps,
        distill_k=args.distill_k,
    )
    print(f"pitch match: {matches}/{total}")
    ok = matches == total
    if distilled is not None:
        print(f"distilled-{args.distill_k} pitch match: {distilled}/{total}")
        ok = ok and distilled == total
    return 0 if ok else 1


def run_demo(steps_vae: int, steps_calm: int, wav_dir=None, seed: int = 0,
             vocoder_path=None, distill_steps: int = 0, distill_k: int = 4):
    """-> (matched_words, total_words, distilled_matched_or_None).

    Importable for tests. distill_steps > 0 adds a stage-3 few-step
    distillation (train/distill.py) and re-checks every word's pitch with
    the K-eval guidance-baked student (steps=distill_k, cfg 1.0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import (
        CALMModelConfig, LoRAConfig, MelConfig, Qwen2Config, TrainingConfig,
        VAEModelConfig,
    )
    from audio_calm_tpu.data.tokenizer import ByteTokenizer
    from audio_calm_tpu.eval.infer import tts_generate_latents
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.vae import AcousticVAE, pad_to_stride
    from audio_calm_tpu.ops.mel import MelFrontend
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.optim import (
        calm_param_label, make_optimizer, merge_partitions, partition_params,
        vae_param_label,
    )
    from audio_calm_tpu.train.steps import (
        init_train_state, make_calm_step, make_vae_step, shard_step,
    )

    t00 = time.time()
    SR = 16000
    WORDS = {"A": 300.0, "B": 600.0, "C": 1200.0}
    rng = np.random.default_rng(seed)

    def utter(words):
        segs = [
            0.35 * np.sin(2 * np.pi * WORDS[w] * np.arange(int(0.4 * SR)) / SR)
            for w in words
        ]
        return np.concatenate(segs).astype(np.float32)

    keys = list(WORDS)
    corpus = []
    for _ in range(48):
        ws = [keys[rng.integers(0, 3)] for _ in range(rng.integers(1, 4))]
        corpus.append((" ".join(ws), utter(ws)))

    fe = MelFrontend(MelConfig())
    mels = [np.asarray(fe(jnp.asarray(w[None])))[0] for _, w in corpus]
    mel_mean = float(np.mean([m.mean() for m in mels]))
    mel_std = float(np.mean([m.std() for m in mels]))

    # ---- stage 1: VAE training
    vcfg = VAEModelConfig(
        hidden_channels=64, latent_channels=8, norm_num_groups=8,
        ssim_weight=0.3, stft_loss_weight=0.0, kl_weight=1e-4,
        mel_mean=mel_mean, mel_std=mel_std, latent_dropout=0.0,
    )
    vae = AcousticVAE(vcfg)
    crop = 24
    vp = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, crop, 80)), train=False,
    )["params"]
    tr, _ = partition_params(vp, vae_param_label)
    tx = make_optimizer(
        TrainingConfig(learning_rate=2e-3, warmup_ratio=0.05), tr,
        vae_param_label, steps_vae,
    )
    st = init_train_state(tr, tx)
    mesh = make_mesh()
    step, st, _ = shard_step(make_vae_step(vae, tx), mesh, st)

    def vae_batch(bs=16):
        idx = rng.integers(0, len(mels), bs)
        out = np.zeros((bs, crop, 80), np.float32)
        for j, i in enumerate(idx):
            m = mels[i]
            t0 = rng.integers(0, max(m.shape[0] - crop, 1))
            seg = m[t0 : t0 + crop]
            out[j, : len(seg)] = seg
        return {"mel": jnp.asarray(out)}

    for i in range(steps_vae):
        st, mt = step(st, vae_batch(), jax.random.PRNGKey(5))
    print(f"[e2e] vae loss {float(mt['loss']):.4f} ({time.time()-t00:.0f}s)")
    vae_params = {"params": merge_partitions(st.trainable, {})}

    def encode(mel):
        m = (jnp.asarray(mel[None]) - mel_mean) / mel_std
        m = pad_to_stride(m, 4)
        mu, _ = vae.apply(vae_params, m, method=AcousticVAE.encode)
        return np.asarray(mu[0])

    latents = [encode(m) for m in mels]
    lat_all = np.concatenate(latents, 0)
    lmean, lstd = float(lat_all.mean()), float(lat_all.std())

    # ---- stage 2: CALM TTS training
    tok = ByteTokenizer()
    T_TXT, T_AUD = 8, 48
    ccfg = CALMModelConfig(
        latent_dim=8, max_audio_len=T_AUD, max_text_len=T_TXT,
        tts_flow_hidden_dim=96, tts_flow_num_layers=2,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config(
            vocab_size=260, hidden_size=96, intermediate_size=192,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=24, rope_theta=10000.0,
        ),
        lora=LoRAConfig(rank=4, alpha=8, dropout=0.0), cfg_dropout_prob=0.1,
        latent_mean=lmean, latent_std=lstd,
    )
    calm = QwenCALM(ccfg, dtype=jnp.float32)
    cp = init_calm_params(calm, jax.random.PRNGKey(0))
    label = lambda k: calm_param_label(k, task_mode="tts")
    ctr, cfr = partition_params(cp, label)
    ctx = make_optimizer(
        TrainingConfig(learning_rate=2e-3, warmup_ratio=0.05,
                       head_lr_mult=3.0, soa_lr_mult=3.0),
        ctr, label, steps_calm,
    )
    cst = init_train_state(ctr, ctx)
    cstep, cst, cfr = shard_step(make_calm_step(calm, ctx, "tts"), mesh, cst, cfr)
    enc_cache = [np.asarray(tok.encode(t), np.int32)[:T_TXT] for t, _ in corpus]

    def calm_batch(bs=16):
        idx = rng.integers(0, len(corpus), bs)
        ti = np.zeros((bs, T_TXT), np.int32)
        am = np.zeros((bs, T_TXT), np.int32)
        la = np.zeros((bs, T_AUD, 8), np.float32)
        aum = np.zeros((bs, T_AUD), np.int32)
        for j, i in enumerate(idx):
            ids = enc_cache[i]
            ti[j, : len(ids)] = ids
            am[j, : len(ids)] = 1
            ln = latents[i][:T_AUD]
            la[j, : len(ln)] = ln
            aum[j, : len(ln)] = 1
        return {
            k: jnp.asarray(v)
            for k, v in dict(text_ids=ti, attention_mask=am, latents=la,
                             audio_mask=aum).items()
        }

    for i in range(steps_calm):
        cst, mt = cstep(cst, cfr, calm_batch(), jax.random.PRNGKey(9))
    print(f"[e2e] calm tts loss {float(mt['loss_tts']):.3f} "
          f"({time.time()-t00:.0f}s)")
    calm_params = {"params": merge_partitions(cst.trainable, cfr)}

    # ---- synthesize each word; check the dominant mel band
    def check_words(params_dict, steps, cfg_scale, tag=""):
        matched = 0
        for w in WORDS:
            ids = np.asarray(tok.encode(w), np.int32)[None]
            lat, nf = tts_generate_latents(
                calm, params_dict, jnp.asarray(ids),
                jnp.ones_like(jnp.asarray(ids)), jax.random.PRNGKey(3),
                steps=steps, cfg_scale=cfg_scale, t_aud=T_AUD,
            )
            n = max(4, int(nf[0]) // 4 * 4)
            mel_n = vae.apply(vae_params, lat[:, :n].astype(jnp.float32),
                              method=AcousticVAE.decode)
            mel_dn = np.asarray(mel_n)[0] * mel_std + mel_mean
            band = int(np.argmax(mel_dn.mean(axis=0)))
            ref_band = int(np.argmax(
                np.asarray(fe(jnp.asarray(utter([w])[None])))[0].mean(0)))
            ok = abs(band - ref_band) <= 4
            matched += ok
            print(f"[e2e] {tag}word {w}: gen band {band} vs ref {ref_band} "
                  f"-> {'OK' if ok else 'MISS'}")
            if wav_dir:
                import os
                import wave as wavelib

                from audio_calm_tpu.models.vocoder import load_vocoder

                os.makedirs(wav_dir, exist_ok=True)
                voc = load_vocoder(vocoder_path)
                wav = np.asarray(voc(jnp.asarray(mel_dn[None])))[0]
                x16 = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
                name = f"{tag.strip('[] ')}_{w}.wav" if tag else f"{w}.wav"
                with wavelib.open(os.path.join(wav_dir, name), "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(16000)
                    f.writeframes(x16.tobytes())
        return matched

    matches = check_words(calm_params, steps=32, cfg_scale=2.0)
    if not distill_steps:
        return matches, len(WORDS), None

    # ---- stage 3 (optional): few-step distillation, verified on AUDIO —
    # the K-eval guidance-baked student must still hit every word's pitch
    from audio_calm_tpu.train.distill import (
        distill_param_label, make_distill_step, split_for_distill,
    )

    dtr, dfr = split_for_distill(calm_params["params"], "tts")
    dtx = make_optimizer(
        TrainingConfig(learning_rate=1e-3, warmup_ratio=0.05,
                       weight_decay=0.0),
        dtr, lambda k: distill_param_label(k, "tts"), distill_steps,
    )
    dst = init_train_state(dtr, dtx)
    dstep, dst, dfr = shard_step(
        make_distill_step(calm, dtx, "tts", student_steps=distill_k,
                          cfg_scale=2.0, teacher_substeps=8, t_grid=T_AUD),
        mesh, dst, dfr,
    )
    for i in range(distill_steps):
        b = calm_batch()
        dst, dmt = dstep(
            dst, dfr, {k: b[k] for k in ("text_ids", "attention_mask")},
            jax.random.PRNGKey(77),
        )
    print(f"[e2e] distill loss {float(dmt['loss_distill']):.4f} "
          f"({time.time()-t00:.0f}s)")
    student_params = {"params": merge_partitions(
        dst.trainable,
        {k: v for k, v in dfr.items() if k[0] != "tts_flow_head"})}
    student_matches = check_words(
        student_params, steps=distill_k, cfg_scale=1.0,
        tag=f"[distilled-{distill_k}] ")
    return matches, len(WORDS), student_matches


if __name__ == "__main__":
    sys.exit(main())
