#!/usr/bin/env python
"""Build a JSONL manifest over the latent/mel store
(reference preprocess/build_manifest.py — its output was unconsumed there;
here eval/demo tooling can read it as `{id, audio, text}` lines).

  python scripts/build_manifest.py --latent_dir data/latents/dev/LibriSpeech \
      --subsets dev-clean --out manifest.jsonl
"""

import argparse
import json
import sys

from audio_calm_tpu.data.datasets import scan_corpus


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--latent_dir", required=True)
    p.add_argument("--subsets", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    items = scan_corpus(args.latent_dir, args.subsets, "any")
    with open(args.out, "w", encoding="utf-8") as f:
        for i, it in enumerate(items):
            f.write(json.dumps(
                {"id": i, "audio": it["file_path"], "text": it["text"]},
                ensure_ascii=False,
            ) + "\n")
    print(f"wrote {len(items)} entries to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
