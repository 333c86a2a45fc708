#!/usr/bin/env python
"""VAE reconstruction evaluation (reference eval/eval_vae.py, fixed).

Reconstructs mels through the VAE, reports MSE/L1 + latent-health stats
(KL / mu / var), and writes original/reconstruction wav pairs via
Griffin-Lim. Uses GLOBAL mel normalization consistently with training (the
reference eval normalized per-utterance — a bug noted in SURVEY.md §7).

  python scripts/eval_vae.py --config configs/vae.yaml \
      --ckpt <orbax params dir> [--max-samples 10] [--cpu]
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/vae.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--ckpt", default=None, help="orbax VAE params dir")
    p.add_argument("--max-samples", type=int, default=10)
    p.add_argument("--out-dir", default="outputs/vae_eval")
    p.add_argument("--write-wavs", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import VAEConfig, load_config
    from audio_calm_tpu.data.datasets import MelDataset
    from audio_calm_tpu.models.vae import AcousticVAE, pad_to_stride

    cfg = load_config(args.config, cls=VAEConfig, overrides=args.override)
    model = AcousticVAE(cfg.model)

    ds = MelDataset(cfg.data.eval_data_dir or cfg.data.data_dir,
                    cfg.data.eval_subsets or cfg.data.train_subsets,
                    crop_size=cfg.data.crop_size, training=False,
                    max_samples=args.max_samples)
    if len(ds) == 0:
        print("no eval data", file=sys.stderr)
        return 1

    if args.ckpt:
        import orbax.checkpoint as ocp

        target = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, 8, cfg.model.in_channels)), train=False,
            )
        )
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt), target=target
        )
    else:
        print("warning: random-init VAE (pass --ckpt for a real eval)")
        params = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, cfg.model.in_channels)), train=False,
        )

    mses, l1s, kls, mu_stds, var_means = [], [], [], [], []
    recons = []
    for i in range(min(len(ds), args.max_samples)):
        mel = jnp.asarray(ds.get(i))[None]
        mel = pad_to_stride(mel, cfg.model.total_stride)
        out = model.apply(params, mel, train=False)
        recon = np.asarray(out["recon_mel"])[0]
        orig = np.asarray(mel)[0]
        mses.append(float(np.mean((recon - orig) ** 2)))
        l1s.append(float(np.mean(np.abs(recon - orig))))
        kls.append(float(out["kl_loss"]))
        mu_stds.append(float(jnp.std(out["mu"])))
        var_means.append(float(jnp.mean(jnp.exp(out["logvar"]))))
        recons.append((orig, recon))

    print(f"samples: {len(mses)}")
    print(f"recon MSE: {np.mean(mses):.5f}  L1: {np.mean(l1s):.5f}")
    print(f"latent health: kl_mean={np.mean(kls):.5f} "
          f"mu_std={np.mean(mu_stds):.4f} var_mean={np.mean(var_means):.4f}")

    if args.write_wavs:
        from audio_calm_tpu.models.vocoder import GriffinLimVocoder

        voc = GriffinLimVocoder()
        os.makedirs(args.out_dir, exist_ok=True)
        import wave as wavelib

        def write(path, x):
            x16 = (np.clip(x, -1, 1) * 32767).astype(np.int16)
            with wavelib.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(x16.tobytes())

        for i, (orig, recon) in enumerate(recons[:5]):
            write(os.path.join(args.out_dir, f"{i}_orig.wav"),
                  np.asarray(voc(jnp.asarray(orig[None])))[0])
            write(os.path.join(args.out_dir, f"{i}_recon.wav"),
                  np.asarray(voc(jnp.asarray(recon[None])))[0])
        print(f"wrote wav pairs to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
