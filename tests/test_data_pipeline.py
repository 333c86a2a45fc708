import os
import wave

import numpy as np
import pytest

from audio_calm_tpu.data.collator import (
    calm_batch_iterator,
    collate_calm,
    mel_batch_iterator,
    spec_augment,
)
from audio_calm_tpu.data.datasets import CalmDataset, MelDataset, load_array
from audio_calm_tpu.data.preprocess import (
    CorpusProcessor,
    compute_stats,
    librispeech_text,
    libritts_text,
    load_audio,
    peak_normalize,
    resample_linear,
    scan_audio_files,
)


class StubTok:
    eos_token_id = 9

    def encode(self, text, add_special_tokens=False):
        return [(ord(c) % 50) + 1 for c in text][:64]


def _write_wav(path, n=8000, sr=16000, freq=440):
    t = np.arange(n) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture()
def corpus(tmp_path):
    """LibriSpeech-style corpus: spk-chap dirs with flac->wav + trans.txt."""
    root = tmp_path / "raw" / "dev-clean" / "1" / "2"
    root.mkdir(parents=True)
    texts = {}
    for i in range(5):
        fid = f"1-2-{i:04d}"
        _write_wav(str(root / f"{fid}.wav"), n=4000 + 2000 * i)
        texts[fid] = f"sample text number {i}"
    with open(root / "1-2.trans.txt", "w") as f:
        for fid, t in texts.items():
            f.write(f"{fid} {t}\n")
    return tmp_path


def test_load_audio_and_resample(corpus):
    p = str(corpus / "raw" / "dev-clean" / "1" / "2" / "1-2-0000.wav")
    x, sr = load_audio(p)
    assert sr == 16000 and x.shape == (4000,) and x.dtype == np.float32
    y = resample_linear(x, 16000, 8000)
    assert abs(len(y) - 2000) <= 1
    assert abs(peak_normalize(x).max() - 0.95) < 0.01


def test_text_resolvers(corpus, tmp_path):
    p = str(corpus / "raw" / "dev-clean" / "1" / "2" / "1-2-0003.wav")
    assert librispeech_text(p) == "sample text number 3"
    # libritts style
    d = tmp_path / "ltts"
    d.mkdir()
    _write_wav(str(d / "a.wav"))
    (d / "a.normalized.txt").write_text("hello norm")
    assert libritts_text(str(d / "a.wav")) == "hello norm"


def test_corpus_processor_mel_only(corpus, tmp_path):
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    files = scan_audio_files(in_root)
    assert len(files) == 5
    proc = CorpusProcessor(batch_size=2)
    stats = proc.process_corpus(
        files, out_root, in_root, text_resolver=librispeech_text
    )
    assert stats.processed == 5 and stats.failed == 0
    outs = scan = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".npz")
    ]
    assert len(outs) == 5
    mel = load_array(outs[0], key_priority=("mel",))
    assert mel.shape[1] == 80
    assert mel.min() >= np.log(1e-5) - 1e-5
    # transcripts accumulated
    trans = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".trans.txt")
    ]
    assert len(trans) == 1
    assert len(open(trans[0]).readlines()) == 5

    # resume: second run skips everything
    stats2 = proc.process_corpus(
        files, out_root, in_root, text_resolver=librispeech_text
    )
    assert stats2.skipped == 5 and stats2.processed == 0


def test_corpus_processor_with_vae(corpus, tmp_path):
    """Latent extraction path: mel -> (mock) VAE encoder downsampling 4x."""
    import jax.numpy as jnp

    def fake_vae(mel):  # [B, T, 80] -> [B, T//4, 16]
        B, T, _ = mel.shape
        return mel[:, ::4, :16]

    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "latents")
    proc = CorpusProcessor(vae_apply=fake_vae, total_stride=4, batch_size=3)
    stats = proc.process_corpus(
        scan_audio_files(in_root), out_root, in_root,
        text_resolver=librispeech_text,
    )
    assert stats.processed == 5
    outs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".npz")
    ]
    lat = load_array(outs[0], key_priority=("latent",))
    assert lat.shape[1] == 16


def test_calm_dataset_and_iterator(corpus, tmp_path):
    # build mel store first
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    proc = CorpusProcessor(batch_size=4)
    proc.process_corpus(
        scan_audio_files(in_root), out_root, in_root,
        text_resolver=librispeech_text,
    )
    tok = StubTok()
    ds = CalmDataset(
        tok,
        asr_latent_dir=out_root, asr_subsets="dev-clean",
        tts_latent_dir=out_root, tts_subsets="dev-clean",
        max_text_len=32, max_audio_len=64, task_mode="mix",
    )
    assert len(ds.tts_items) == 5 and len(ds.asr_items) == 5
    ex = ds.get("tts", 0)
    assert ex.audio.shape[1] == 80
    assert (ex.labels == -100).all()
    ex2 = ds.get("asr", 0)
    assert (ex2.labels >= 0).any()

    batches = list(
        calm_batch_iterator(
            ds, batch_size=2, pad_token_id=0, latent_dim=80,
            task_prob_tts=0.5, training=True, seed=0, epochs=1,
        )
    )
    assert len(batches) >= 2
    for b in batches:
        assert b["latents"].shape == (2, 64, 80)
        assert b["text_ids"].shape == (2, 32)
        assert b["task"] in ("tts", "asr")
        assert b["audio_mask"].sum() > 0


def test_mel_dataset_crops(corpus, tmp_path):
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    CorpusProcessor(batch_size=4).process_corpus(
        scan_audio_files(in_root), out_root, in_root
    )
    ds = MelDataset(out_root, "dev-clean", crop_size=20, training=True)
    assert len(ds) == 5
    rng = np.random.default_rng(0)
    crop = ds.get(0, rng)
    assert crop.shape == (20, 80)
    batches = list(mel_batch_iterator(ds, 2, training=False, epochs=1))
    assert batches and batches[0]["mel"].shape == (2, 20, 80)


def test_spec_augment_masks_one_span():
    rng = np.random.default_rng(0)
    a = np.ones((50, 8), np.float32)
    out = spec_augment(a, rng)
    zero_rows = np.where((out == 0).all(axis=1))[0]
    assert 5 <= len(zero_rows) <= 10
    assert np.array_equal(zero_rows, np.arange(zero_rows[0], zero_rows[-1] + 1))
    # untouched input
    assert (a == 1).all()


def test_compute_stats(corpus, tmp_path):
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    CorpusProcessor(batch_size=4).process_corpus(
        scan_audio_files(in_root), out_root, in_root
    )
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".npz")
    ]
    mean, std = compute_stats(files)
    assert np.isfinite(mean) and np.isfinite(std) and std > 0
    mean_d, std_d = compute_stats(files, per_dim=True)
    assert mean_d.shape == (80,)


def test_prefetch_preserves_order_and_propagates_errors():
    from audio_calm_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(20)), buffer_size=3)) == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_bucketed_batches(corpus, tmp_path):
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    CorpusProcessor(batch_size=4).process_corpus(
        scan_audio_files(in_root), out_root, in_root,
        text_resolver=librispeech_text,
    )
    ds = CalmDataset(
        StubTok(), tts_latent_dir=out_root, tts_subsets="dev-clean",
        max_text_len=32, max_audio_len=64, task_mode="tts",
    )
    shapes = set()
    for b in calm_batch_iterator(
        ds, batch_size=1, pad_token_id=0, latent_dim=80, task_prob_tts=1.0,
        training=False, seed=0, epochs=1, audio_buckets=[24, 48, 64],
    ):
        shapes.add(b["latents"].shape[1])
        # mask never exceeds the bucket
        assert b["audio_mask"].shape[1] == b["latents"].shape[1]
    # corpus has 1-3s files (~16-48 mel frames): multiple buckets used
    assert len(shapes) >= 2 and shapes <= {24, 48, 64}


def test_sharded_corpus_processing_merges_transcripts(corpus, tmp_path):
    """Two independent shard jobs (files[i::2]) into the same output store:
    npz union complete, .trans.txt merged (not clobbered) — the multi-job
    scale-out path (process_dataset --num_shards)."""
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels_sharded")
    files = scan_audio_files(in_root)
    proc = CorpusProcessor(batch_size=2)
    for shard in (0, 1):
        st = proc.process_corpus(
            files[shard::2], out_root, in_root, text_resolver=librispeech_text
        )
        assert st.failed == 0
    outs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".npz")
    ]
    assert len(outs) == 5
    trans = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_root)
        for f in fs
        if f.endswith(".trans.txt")
    ]
    assert len(trans) == 1
    lines = open(trans[0]).read().splitlines()
    assert len(lines) == 5, lines
    assert sorted(line.split(" ", 1)[0] for line in lines) == sorted(
        f"1-2-{i:04d}" for i in range(5)
    )


class _LenDataset:
    """In-memory CalmDataset stand-in with controlled audio lengths (and
    optional corrupt indices that .get returns None for)."""

    def __init__(self, tts_lens=(), asr_lens=(), max_text_len=16,
                 max_audio_len=64, corrupt=()):
        self.max_text_len = max_text_len
        self.max_audio_len = max_audio_len
        self.tts_items = list(tts_lens)
        self.asr_items = list(asr_lens)
        self.corrupt = set(corrupt)

    def get(self, mode, idx):
        if (mode, idx) in self.corrupt:
            return None
        L = (self.tts_items if mode == "tts" else self.asr_items)[idx]
        from audio_calm_tpu.data.datasets import CalmExample

        return CalmExample(
            input_ids=np.asarray([idx + 1], np.int32),
            labels=np.asarray([-100 if mode == "tts" else idx], np.int32),
            audio=np.full((L, 4), idx + 1, np.float32),
            mode=mode,
        )


def test_length_grouped_batches_concentrate_buckets():
    """length_group_window sorts windows by audio length so batches land in
    the smallest fitting bucket: padded-frame total drops vs the random
    order, every example is still seen exactly once per epoch, and the
    run is seed-deterministic."""
    rng = np.random.default_rng(3)
    lens = [int(x) for x in rng.integers(4, 65, size=64)]
    buckets = [16, 32, 48, 64]

    def run(window):
        ds = _LenDataset(tts_lens=lens)
        seen, padded = [], 0
        for b in calm_batch_iterator(
            ds, batch_size=4, pad_token_id=0, latent_dim=4,
            task_prob_tts=1.0, training=False, seed=0, epochs=1,
            audio_buckets=buckets, length_group_window=window,
        ):
            seen.extend(int(i) for i in b["text_ids"][:, 0] - 1)
            padded += b["latents"].shape[0] * b["latents"].shape[1]
        return seen, padded

    seen_r, padded_random = run(0)
    seen_g, padded_grouped = run(4)
    # exact one-epoch coverage either way
    assert sorted(seen_r) == sorted(seen_g) == list(range(64))
    # grouping is a strict padded-compute win on mixed lengths
    assert padded_grouped < padded_random, (padded_grouped, padded_random)
    # per-batch rows actually fit their bucket
    seen_g2, padded_g2 = run(4)
    assert seen_g2 == seen_g and padded_g2 == padded_grouped  # deterministic


def test_length_grouped_carries_corrupt_raggedness():
    """Corrupt rows are skipped; the <batch_size window leftover carries
    into the next window instead of being dropped, so only the final
    ragged tail of the epoch is lost (same contract as ungrouped)."""
    lens = list(range(4, 44))  # 40 items
    corrupt = {("tts", 5), ("tts", 17), ("tts", 30)}
    ds = _LenDataset(tts_lens=lens, corrupt=corrupt)
    seen = []
    for b in calm_batch_iterator(
        ds, batch_size=4, pad_token_id=0, latent_dim=4, task_prob_tts=1.0,
        training=False, seed=1, epochs=1, audio_buckets=[16, 32, 48, 64],
        length_group_window=3,
    ):
        assert b["latents"].shape[0] == 4
        seen.extend(int(i) for i in b["text_ids"][:, 0] - 1)
    valid = 40 - len(corrupt)  # 37 -> 9 full batches, 1-row tail dropped
    assert len(seen) == (valid // 4) * 4
    assert len(set(seen)) == len(seen)
    assert not {i for _, i in corrupt} & set(seen)


def test_length_grouped_keeps_task_stream():
    """Grouping reorders rows WITHIN a task; the per-batch Bernoulli task
    sequence is identical to the ungrouped iterator for the same seed."""
    def tasks(window):
        ds = _LenDataset(tts_lens=[8] * 24, asr_lens=[8] * 24)
        return [b["task"] for b in calm_batch_iterator(
            ds, batch_size=4, pad_token_id=0, latent_dim=4,
            task_prob_tts=0.5, training=False, seed=7, epochs=1,
            length_group_window=window,
        )]

    assert tasks(2) == tasks(0)


def test_asr_text_pad_narrows_prompt_only(corpus, tmp_path):
    """asr_text_pad narrows the ASR LLM prompt width (constant ~20-token
    prompt; the reference pads it to max_text_len inside the 481-token
    sequence) while labels keep max_text_len (they size the flow-head
    query grid). TTS batches are untouched, and the width never drops
    below the prompt itself."""
    in_root = str(corpus / "raw")
    out_root = str(tmp_path / "mels")
    CorpusProcessor(batch_size=4).process_corpus(
        scan_audio_files(in_root), out_root, in_root,
        text_resolver=librispeech_text,
    )
    ds = CalmDataset(
        StubTok(), asr_latent_dir=out_root, asr_subsets="dev-clean",
        tts_latent_dir=out_root, tts_subsets="dev-clean",
        max_text_len=64, max_audio_len=64, task_mode="mix",
    )
    P = len(ds.asr_prompt_ids)
    for b in calm_batch_iterator(
        ds, batch_size=2, pad_token_id=0, latent_dim=80, task_prob_tts=0.5,
        training=False, seed=0, epochs=1, asr_text_pad=32,
    ):
        if b["task"] == "asr":
            assert b["text_ids"].shape[1] == max(32, P)
            assert b["attention_mask"].shape == b["text_ids"].shape
            assert b["labels"].shape[1] == 64  # flow grid keeps max_text_len
            # prompt fully present
            assert (b["text_ids"][:, :P] == ds.asr_prompt_ids).all()
        else:
            assert b["text_ids"].shape[1] == 64

    # a pad narrower than the prompt is clamped up, never truncating
    b = next(iter(calm_batch_iterator(
        ds, batch_size=2, pad_token_id=0, latent_dim=80, task_prob_tts=0.0,
        training=False, seed=0, epochs=1, asr_text_pad=4,
    )))
    assert b["text_ids"].shape[1] == max(4, P) >= P


def test_training_iterator_raises_when_dataset_smaller_than_batch():
    """A training run (epochs=None) whose dataset can't fill one global
    batch must raise, not busy-spin forever re-drawing empty epochs (this
    hung a real train_calm.py run: 6 items, global batch 8, 100% CPU)."""
    import pytest

    ds = _LenDataset(asr_lens=[8] * 6)
    it = calm_batch_iterator(
        ds, batch_size=8, pad_token_id=0, latent_dim=4, task_prob_tts=0.5,
        training=True, seed=0, epochs=None,
    )
    with pytest.raises(ValueError, match="no full batch"):
        next(it)

    # grouped path spins the same way without the guard
    it = calm_batch_iterator(
        ds, batch_size=8, pad_token_id=0, latent_dim=4, task_prob_tts=0.5,
        training=True, seed=0, epochs=None, length_group_window=4,
    )
    with pytest.raises(ValueError, match="no full batch"):
        next(it)

    # eval (training=False) still terminates quietly after one empty epoch
    assert list(calm_batch_iterator(
        ds, batch_size=8, pad_token_id=0, latent_dim=4, task_prob_tts=0.5,
        training=False, seed=0, epochs=1,
    )) == []


def test_mel_training_iterator_raises_when_dataset_smaller_than_batch():
    import pytest

    class _TinyMels:
        crop_size = 16

        def __len__(self):
            return 3

        def get(self, idx, rng=None):
            return np.zeros((16, 80), np.float32)

    it = mel_batch_iterator(_TinyMels(), batch_size=8, training=True,
                            seed=0, epochs=None)
    with pytest.raises(ValueError, match="no full batch"):
        next(it)
    assert list(mel_batch_iterator(_TinyMels(), batch_size=8,
                                   training=False, seed=0, epochs=1)) == []


def test_layout_heuristic_ambiguous_frame_counts(tmp_path):
    """A [T, D] store whose frame count is a known channel count
    (64/80/128/192) must NOT be transposed.

    The reference transposes whenever dim 0 is in the channel set
    (train_calm.py:143-144), corrupting e.g. a 192-frame utterance of
    128-dim latents into 128 frames of 192-dim garbage — found by a real
    flagship burn-in (the fold corpus is full of 192-frame utterances) and
    deliberately not replicated. expected_dim decides exactly; the
    no-dim fallback treats the ambiguous both-in-set case as [T, D]."""
    from audio_calm_tpu.data.datasets import array_frames

    td = tmp_path / "amb"
    td.mkdir()
    # canonical [T=192, D=128] store
    p_td = str(td / "a.npy")
    np.save(p_td, np.arange(192 * 128, dtype=np.float32).reshape(192, 128))
    # true reference-style (D=128, T=192) store
    p_dt = str(td / "b.npy")
    np.save(p_dt, np.arange(128 * 192, dtype=np.float32).reshape(128, 192))

    assert load_array(p_td, expected_dim=128).shape == (192, 128)
    assert load_array(p_dt, expected_dim=128).shape == (192, 128)
    assert load_array(p_td).shape == (192, 128)  # ambiguous -> [T, D]
    # header reads must agree with the loads, dim given or not
    assert array_frames(p_td, expected_dim=128) == 192
    assert array_frames(p_dt, expected_dim=128) == 192
    assert array_frames(p_td) == 192
    # unambiguous (D, T) stores still transpose without expected_dim
    p_mel = str(td / "c.npy")
    np.save(p_mel, np.zeros((80, 300), np.float32))
    assert load_array(p_mel).shape == (300, 80)
    assert array_frames(p_mel) == 300


def test_calm_dataset_ambiguous_frame_count_roundtrip(tmp_path):
    """CalmDataset(latent_dim=...) loads a 192-frame/128-dim utterance with
    the right orientation end to end (burn-in regression)."""
    base = tmp_path / "c" / "dev-clean" / "0" / "0"
    base.mkdir(parents=True)
    np.save(str(base / "u0.npy"),
            np.random.default_rng(0).normal(size=(192, 128))
            .astype(np.float32))
    (base / "0.trans.txt").write_text("u0 hello world\n")
    ds = CalmDataset(
        StubTok(), asr_latent_dir=str(tmp_path / "c"), asr_subsets="dev-clean",
        max_text_len=32, max_audio_len=384, task_mode="asr", latent_dim=128,
    )
    ex = ds.get("asr", 0)
    assert ex.audio.shape == (192, 128)
    assert ds.meta("asr", 0)[1] == 192
