#!/usr/bin/env python
"""One-shot ingest: write `.npz` sidecars for a reference `.pt` latent store.

The reference's preprocessor stores one torch payload per utterance
(`{"latent": (D, T)}` — /root/reference/preprocess/process_dataset.py:153-168).
Those files have no cheap header, so multi-host sequence packing cannot
derive its shared metadata plan from them and silently falls back to plain
batches (collator.calm_batch_iterator gate) — losing the measured
+121%/+187% packed-throughput wins exactly on reference-format corpora.

This converter walks a store and writes a canonical `.npz`
(`{"latent"/"mel": (T, D) float32}`, the layout data/preprocess.py emits)
NEXT TO each `.pt`. datasets.scan_corpus prefers `.npz` over `.pt`
(ARRAY_EXTS order), so converted corpora transparently regain header-only
metadata (packing, multi-host plans) and faster loads — no config change,
and the original `.pt` files stay valid for the reference tooling unless
`--delete-pt` is passed. Layout semantics are exactly `datasets.load_array`
(including the (D, T)-transpose disambiguation via --dim; see
datasets._is_dt_layout for the corruption the naive heuristic causes).

    python scripts/convert_store.py --root data/latents/train/LibriSpeech \
        --dim 128

Resume-safe: files with an existing `.npz` sidecar are skipped. Corrupt
`.pt` files are counted and left alone (their owner process zero-stubs
them at train time, same as before).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np


def convert_file(path: str, expected_dim=None, keys=("latent", "mel")):
    """-> (npz_path, key) or raises. Canonicalizes layout to [T, D]."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from audio_calm_tpu.data.datasets import _is_dt_layout

    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    key = "latent"
    if isinstance(payload, dict):
        key = next((k for k in keys if k in payload), None)
        if key is None:
            raise ValueError(f"no {keys} key in {path}")
        payload = payload[key]
    arr = np.asarray(payload.float().numpy(), np.float32)
    if arr.ndim == 2 and _is_dt_layout(arr.shape, expected_dim):
        arr = arr.T
    out = path[: -len(".pt")] + ".npz"
    # atomic publish: a kill/crash/disk-full mid-savez must never leave a
    # truncated .npz at the final path (scan_corpus would prefer it over
    # the still-valid .pt and a rerun would skip it)
    tmp = out + ".tmp"
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **{key: arr})
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out, key


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True,
                   help="store root (searched recursively for *.pt)")
    p.add_argument("--dim", type=int, default=None,
                   help="configured latent/mel channel dim — decides the "
                        "(D,T)-vs-(T,D) layout EXACTLY (without it the "
                        "reference channel-count heuristic applies)")
    p.add_argument("--delete-pt", action="store_true",
                   help="remove each .pt after a successful conversion")
    p.add_argument("--force", action="store_true",
                   help="overwrite existing .npz sidecars")
    args = p.parse_args(argv)

    files = sorted(glob(os.path.join(args.root, "**", "*.pt"),
                        recursive=True))
    done = skipped = failed = 0
    for f in files:
        out = f[: -len(".pt")] + ".npz"
        if os.path.exists(out) and not args.force:
            # validate the sidecar's zip directory before trusting it —
            # a pre-fix truncated write must be repaired, not skipped
            try:
                with np.load(out, allow_pickle=False) as z:
                    ok = len(z.files) > 0
            except Exception:
                ok = False
            if ok:
                skipped += 1
                continue
            print(f"warning: {out}: corrupt sidecar, reconverting",
                  file=sys.stderr)
        try:
            convert_file(f, expected_dim=args.dim)
        except Exception as ex:
            print(f"warning: {f}: {ex}", file=sys.stderr)
            failed += 1
            continue
        done += 1
        if args.delete_pt:
            os.remove(f)
    print(json.dumps({"root": args.root, "converted": done,
                      "skipped": skipped, "failed": failed,
                      "total_pt": len(files)}))
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
