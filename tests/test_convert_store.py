"""scripts/convert_store.py: .pt -> .npz ingest (multi-host packing on
reference-format corpora — VERDICT r3 item 5).

The reference stores torch payloads ({"latent": (D, T)},
ref: preprocess/process_dataset.py:153-168) which have no cheap header, so
CalmDataset.meta can't plan multi-host packing over them. The converter
writes canonical (T, D) .npz sidecars that scan_corpus then prefers."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from audio_calm_tpu.data.collator import calm_batch_iterator
from audio_calm_tpu.data.datasets import CalmDataset, load_array

import convert_store

LATENT_DIM = 8


class _ByteTok:
    pad_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [(ord(c) % 60) + 1 for c in text]


def _pt_store(root, n=24, seed=0, corrupt=()):
    """Reference-layout store: {"latent": (D, T)} torch payloads."""
    import torch

    d = os.path.join(root, "dev", "1")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        fid = f"1-{i:04d}"
        path = os.path.join(d, fid + ".pt")
        if i in corrupt:
            with open(path, "wb") as f:
                f.write(b"not a torch file")
        else:
            T = int(rng.integers(4, 17))
            lat = rng.standard_normal((T, LATENT_DIM)).astype(np.float32)
            torch.save({"latent": torch.from_numpy(lat.T)}, path)
        lines.append(f"{fid} sample number {i} {'pad ' * (i % 4)}")
    with open(os.path.join(d, "1.trans.txt"), "w") as f:
        f.write("\n".join(lines))
    return root


def _dataset(root, task_mode):
    return CalmDataset(
        _ByteTok(), asr_latent_dir=root, asr_subsets="dev",
        tts_latent_dir=root, tts_subsets="dev",
        max_text_len=16, max_audio_len=24, task_mode=task_mode,
        latent_dim=LATENT_DIM)


def test_convert_store_roundtrip_and_meta(tmp_path, capsys):
    """Converted sidecars load bit-identical to the .pt originals (incl.
    the (D,T) transpose), corrupt files are counted not fatal, a rerun
    skips existing sidecars, and the dataset regains header metadata."""
    root = _pt_store(str(tmp_path), corrupt=(5,))

    ds_pt = _dataset(root, "mix")
    assert not ds_pt.supports_meta("asr")  # .pt: no cheap header

    rc = convert_store.main(["--root", root, "--dim", str(LATENT_DIM)])
    assert rc == 1  # the corrupt file is a counted failure
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["converted"] == 23 and out["failed"] == 1

    for i in (0, 7, 23):
        pt = os.path.join(root, "dev", "1", f"1-{i:04d}.pt")
        npz = pt[:-3] + ".npz"
        assert os.path.exists(npz)
        np.testing.assert_array_equal(
            load_array(npz, expected_dim=LATENT_DIM),
            load_array(pt, expected_dim=LATENT_DIM))
        arr = np.load(npz)["latent"]
        assert arr.shape[1] == LATENT_DIM  # canonical (T, D)

    ds = _dataset(root, "mix")
    assert ds.supports_meta("asr") and ds.supports_meta("tts")
    # the corrupt item has no sidecar -> scan falls back to its .pt,
    # whose load fails -> meta None (stub cost in the plan, as before)
    bad = next(i for i, it in enumerate(ds.asr_items)
               if "1-0005" in it["file_path"])
    assert ds.meta("asr", bad) is None

    # rerun: everything with a sidecar is skipped
    rc = convert_store.main(["--root", root, "--dim", str(LATENT_DIM)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] == 23 and out["converted"] == 0


def test_convert_square_ambiguous_layout(tmp_path):
    """A [T, D] store with T == a known channel count (the reference
    heuristic's corruption case) converts correctly when --dim is given."""
    import torch

    d = os.path.join(str(tmp_path), "dev", "1")
    os.makedirs(d)
    rng = np.random.default_rng(1)
    # reference layout (D=8, T=128): dim 0 is NOT a channel count from
    # CHANNEL_DIMS but equals expected_dim -> exact disambiguation
    lat = rng.standard_normal((128, 8)).astype(np.float32)  # (T, D)
    torch.save({"latent": torch.from_numpy(lat.T)},
               os.path.join(d, "a.pt"))
    convert_store.convert_file(os.path.join(d, "a.pt"), expected_dim=8)
    np.testing.assert_array_equal(np.load(os.path.join(d, "a.npz"))["latent"],
                                  lat)


@pytest.mark.parametrize("task", ["tts", "asr"])
def test_converted_pt_corpus_packs_multihost(tmp_path, task):
    """VERDICT r3 item 5 'done' condition: a reference-format .pt corpus,
    once converted, keeps sequence packing ON at process_count=2 and the
    two rank iterators' rows concatenate to the single-process packed
    batches exactly."""
    root = _pt_store(str(tmp_path))
    convert_store.main(["--root", root, "--dim", str(LATENT_DIM)])

    kw = dict(batch_size=4, pad_token_id=0, latent_dim=LATENT_DIM,
              training=False, seed=3, epochs=1,
              audio_buckets=[8, 16, 24], length_group_window=2)
    kw.update(
        dict(task_prob_tts=1.0, tts_pack_rows=4, tts_pack_len=40,
             tts_pack_segments=2) if task == "tts" else
        dict(task_prob_tts=0.0, asr_pack_rows=4, asr_pack_len=200,
             asr_pack_segments=2))
    single = list(calm_batch_iterator(_dataset(root, task), **kw))
    ranks = [list(calm_batch_iterator(
        _dataset(root, task), **kw,
        process_index=r, process_count=2)) for r in (0, 1)]
    assert len(single) == len(ranks[0]) == len(ranks[1]) > 0
    for bs, b0, b1 in zip(single, ranks[0], ranks[1]):
        assert bs["task"] == b0["task"] == b1["task"] == f"{task}_packed"
        assert b0["n_samples"] + b1["n_samples"] == bs["n_samples"] > 0
        for k in bs:
            if k in ("task", "n_samples"):
                continue
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), bs[k], err_msg=k)


def test_unconverted_pt_corpus_warns_on_multihost_fallback(tmp_path):
    """The silent degradation is now loud: packing over a raw .pt corpus
    at process_count>1 falls back to plain batches WITH a warning that
    names the converter."""
    root = _pt_store(str(tmp_path))
    kw = dict(batch_size=4, pad_token_id=0, latent_dim=LATENT_DIM,
              training=False, seed=3, epochs=1, task_prob_tts=0.0,
              asr_pack_rows=4, asr_pack_len=200, asr_pack_segments=2)
    with pytest.warns(UserWarning, match="convert_store"):
        batches = list(calm_batch_iterator(
            _dataset(root, "asr"), **kw, process_index=0, process_count=2))
    assert batches and all(b["task"] == "asr" for b in batches)
