#!/usr/bin/env python
"""Offline corpus preprocessing CLI (reference preprocess/process_dataset.py).

  # mel extraction
  python scripts/process_dataset.py --input_dir raw/LibriTTS_R/dev-clean \
      --output_dir data/mels/dev/LibriTTS_R/dev-clean --dataset libritts \
      --mel_only

  # VAE latent extraction (needs a trained VAE checkpoint)
  python scripts/process_dataset.py --input_dir raw/LibriSpeech/dev-clean \
      --output_dir data/latents/dev/LibriSpeech/dev-clean \
      --dataset librispeech --vae_ckpt outputs/checkpoints/vae/.../default

  # corpus statistics
  python scripts/process_dataset.py --stats data/mels/dev --stats_key mel
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir")
    p.add_argument("--output_dir")
    p.add_argument("--dataset", choices=["librispeech", "libritts", "commonvoice"],
                   default="librispeech")
    p.add_argument("--cv_tsv", help="CommonVoice split tsv")
    p.add_argument("--mel_only", action="store_true")
    p.add_argument("--vae_ckpt", help="orbax VAE params dir for latents")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--no_skip_existing", action="store_true")
    p.add_argument("--stats", help="compute mean/std over stored arrays in dir")
    p.add_argument("--stats_key", default="mel", choices=["mel", "latent"])
    p.add_argument("--per_dim", action="store_true")
    p.add_argument("--num_shards", type=int, default=1,
                   help="split the corpus across N independent jobs "
                        "(reference scales via workers x GPUs, "
                        "process_dataset.py:256-277; here one process per "
                        "chip/host, each taking files[shard_id::num_shards])")
    p.add_argument("--shard_id", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if not (0 <= args.shard_id < args.num_shards):
        p.error("--shard_id must be in [0, num_shards)")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.stats:
        import os

        from audio_calm_tpu.data.preprocess import compute_stats

        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(args.stats)
            for f in fs
            if f.endswith((".npz", ".npy", ".pt"))
        ]
        mean, std = compute_stats(files, key_priority=(args.stats_key,),
                                  per_dim=args.per_dim)
        print(f"files: {len(files)}")
        print(f"mean: {mean.tolist() if args.per_dim else float(mean)}")
        print(f"std:  {std.tolist() if args.per_dim else float(std)}")
        return 0

    if not args.input_dir or not args.output_dir:
        p.error("--input_dir and --output_dir required (or use --stats)")

    import jax.numpy as jnp

    from audio_calm_tpu.data.preprocess import (
        TEXT_RESOLVERS, CorpusProcessor, commonvoice_map, scan_audio_files,
    )

    vae_apply = None
    total_stride = 4
    if args.vae_ckpt and not args.mel_only:
        from audio_calm_tpu.models.vae import AcousticVAE, load_vae

        # geometry from the vae_config.json sidecar (or defaults)
        vae, params = load_vae(args.vae_ckpt)
        vae_cfg = vae.cfg
        total_stride = vae_cfg.total_stride
        mel_mean, mel_std = vae_cfg.mel_mean, vae_cfg.mel_std

        def vae_apply(mel):
            # DELIBERATE DEVIATION: the reference extracts latents from RAW
            # log-mel (process_dataset.py:161 calls vae.encode directly)
            # although its VAE was trained on globally-normalized mel
            # (modeling_vae.py:317-330) — an internal inconsistency (see
            # also check_pt.py's ad-hoc ln->log10 fixup). We feed the
            # encoder the same normalized distribution it was trained on;
            # latent stats are recomputed per store (--stats latent).
            mu, _ = vae.apply(
                params, (mel - mel_mean) / mel_std, method=AcousticVAE.encode
            )
            return mu

    resolver = None
    cv_map = None
    if args.dataset == "commonvoice":
        if not args.cv_tsv:
            p.error("--cv_tsv required for commonvoice")
        cv_map = commonvoice_map(args.cv_tsv)
    else:
        resolver = TEXT_RESOLVERS[args.dataset]

    files = scan_audio_files(args.input_dir)
    print(f"found {len(files)} audio files")
    if args.num_shards > 1:
        files = files[args.shard_id :: args.num_shards]
        print(f"shard {args.shard_id}/{args.num_shards}: {len(files)} files")
    proc = CorpusProcessor(
        vae_apply=vae_apply, total_stride=total_stride,
        batch_size=args.batch_size,
    )

    done = [0]

    def progress(n):
        if n % 100 == 0:
            print(f"  processed {n}/{len(files)}", flush=True)

    stats = proc.process_corpus(
        files, args.output_dir, args.input_dir,
        text_resolver=resolver, cv_text_map=cv_map,
        skip_existing=not args.no_skip_existing, progress=progress,
    )
    print(f"done: {stats.processed} processed, {stats.skipped} skipped, "
          f"{stats.failed} failed")
    for f in stats.failures[:10]:
        print(f"  FAIL {f}", file=sys.stderr)
    return 0 if stats.failed == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
