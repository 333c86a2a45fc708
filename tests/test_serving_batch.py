"""Serving-layer dynamic batching: the RequestBatcher coalescing logic and
the batched TTS path it drives (CALMInference.tts_batch + render.batch).

The reference has no serving component at all (web_demo.py is a broken
gradio stub, SURVEY section 7); these cover the TPU-serving design:
concurrent requests -> one bucketed static-shape batch program, with
per-request noise keys so batch composition never changes a request's
audio.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_calm_tpu.config import (CALMModelConfig, LoRAConfig, Qwen2Config)
from audio_calm_tpu.data.tokenizer import ByteTokenizer
from audio_calm_tpu.eval.infer import CALMInference
from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.serving import RequestBatcher


# ---------------------------------------------------------------------------
# RequestBatcher (pure host logic, no device)
# ---------------------------------------------------------------------------
def _collecting_batcher(max_batch=8, window_ms=250.0, fail_key=None,
                        wrong_len_key=None):
    calls = []

    def run(key, items):
        calls.append((key, list(items)))
        if key == fail_key:
            raise RuntimeError("boom")
        if key == wrong_len_key:
            return items[:-1]
        return [f"{key}:{it}" for it in items]

    return RequestBatcher(run, max_batch=max_batch, window_ms=window_ms), calls


def test_batcher_coalesces_within_window():
    b, calls = _collecting_batcher()
    futs = [b.submit("k", i) for i in range(4)]
    assert [f.result(timeout=10) for f in futs] == [
        "k:0", "k:1", "k:2", "k:3"]
    b.close()
    assert len(calls) == 1 and len(calls[0][1]) == 4


def test_batcher_respects_max_batch():
    b, calls = _collecting_batcher(max_batch=2)
    futs = [b.submit("k", i) for i in range(5)]
    assert [f.result(timeout=10) for f in futs] == [f"k:{i}" for i in range(5)]
    b.close()
    assert [len(items) for _, items in calls] == [2, 2, 1]


def test_batcher_never_mixes_group_keys():
    b, calls = _collecting_batcher()
    futs = [b.submit(k, i) for i, k in enumerate("abab")]
    assert [f.result(timeout=10) for f in futs] == [
        "a:0", "b:1", "a:2", "b:3"]
    b.close()
    assert sorted((k, len(it)) for k, it in calls) == [("a", 2), ("b", 2)]


def test_batcher_error_fans_out_to_group_only():
    b, _ = _collecting_batcher(fail_key="bad")
    bad = [b.submit("bad", i) for i in range(2)]
    good = b.submit("good", 7)
    for f in bad:
        with pytest.raises(RuntimeError, match="boom"):
            f.result(timeout=10)
    assert good.result(timeout=10) == "good:7"
    b.close()


def test_batcher_length_mismatch_fails_group():
    b, _ = _collecting_batcher(wrong_len_key="short")
    f = b.submit("short", 1)
    with pytest.raises(RuntimeError, match="results"):
        f.result(timeout=10)
    b.close()


def test_batcher_degenerates_to_serial_queue():
    b, calls = _collecting_batcher(max_batch=1, window_ms=0.0)
    futs = [b.submit("k", i) for i in range(3)]
    assert [f.result(timeout=10) for f in futs] == ["k:0", "k:1", "k:2"]
    b.close()
    assert [len(items) for _, items in calls] == [1, 1, 1]


def test_batcher_concurrent_submitters():
    b, calls = _collecting_batcher(window_ms=400.0)
    results = {}
    barrier = threading.Barrier(4)

    def client(i):
        barrier.wait()
        results[i] = b.submit("k", i).result(timeout=20)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: f"k:{i}" for i in range(4)}
    b.close()
    # all four arrived within the window -> one device call
    assert len(calls) == 1


def test_batcher_close_rejects_new_work():
    b, _ = _collecting_batcher()
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("k", 1)


def test_batcher_priority_lane_caps_and_preempts():
    """The TTFA lane (VERDICT r4 weak #4): a priority item submitted into
    a deep bulk backlog must run in a SMALL batch ahead of the queued bulk
    work, not coalesce into a near-full batch behind it."""
    import time as _t

    release = threading.Event()
    calls = []

    def run(key, items):
        # first bulk group blocks to simulate a busy device; everything
        # else returns immediately
        calls.append((key, list(items)))
        if len(calls) == 1:
            release.wait(timeout=10)
        return [f"{key}:{it}" for it in items]

    b = RequestBatcher(run, max_batch=8, window_ms=5.0,
                       priority_max_batch=2)
    # one bulk group enters the device and blocks
    first = b.submit("k", "warm")
    _t.sleep(0.05)
    # backlog: 6 bulk items queued behind the blocked call
    bulk = [b.submit("k", f"b{i}") for i in range(6)]
    # now three priority items arrive (three streams' chunk 0)
    prio = [b.submit("k", f"p{i}", priority=True) for i in range(3)]
    release.set()
    assert first.result(timeout=10) == "k:warm"
    for i, f in enumerate(prio):
        assert f.result(timeout=10) == f"k:p{i}"
    for i, f in enumerate(bulk):
        assert f.result(timeout=10) == f"k:b{i}"
    b.close()
    sizes = [(items[0][0], len(items)) for _, items in calls]
    # call order after the blocked warmup: priority groups first (capped
    # at 2), then the bulk backlog
    assert sizes[0] == ("w", 1)
    assert sizes[1] == ("p", 2) and sizes[2] == ("p", 1), sizes
    assert all(kind == "b" for kind, _ in sizes[3:]), sizes


def test_batcher_priority_interrupts_open_window():
    """A priority arrival during an open bulk coalescing window is served
    before that bulk group closes."""
    order = []

    def run(key, items):
        order.append(list(items))
        return list(items)

    b = RequestBatcher(run, max_batch=8, window_ms=300.0)
    bulk = b.submit("k", "bulk")
    time.sleep(0.05)  # bulk window is open, waiting for more items
    prio = b.submit("k", "prio", priority=True)
    assert prio.result(timeout=10) == "prio"
    assert bulk.result(timeout=10) == "bulk"
    b.close()
    assert order[0] == ["prio"], order


# ---------------------------------------------------------------------------
# Batched TTS inference (tiny model)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_inf():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=32,
        max_text_len=12,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=1,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=1,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    # full param set (TTS + ASR branches) like serve.py's engine build
    from audio_calm_tpu.models.calm import init_calm_params

    params = {"params": init_calm_params(model, jax.random.PRNGKey(0))}
    return CALMInference(model, params, ByteTokenizer(),
                         audio_buckets=[16, 32], text_buckets=[64, 96])


def test_tts_batch_matches_solo_rows(tiny_inf):
    """Each batched row must equal the solo synthesis from the same key:
    per-item grid-invariant noise + masked batch compute means batch
    composition cannot change a request's audio."""
    inf = tiny_inf
    texts = ["hello world", "good day to you", "cats"]
    keys = [jax.random.PRNGKey(s) for s in (11, 22, 33)]
    lat_b, n_b, t_grid = inf.tts_batch(texts, keys, steps=2, cfg_scale=1.5)
    assert lat_b.shape[0] == 3 and lat_b.shape[1] == t_grid
    solo_grids = []
    for i, (text, key) in enumerate(zip(texts, keys)):
        lat_s, n_s = inf.tts(text, key, steps=2, cfg_scale=1.5,
                             pad_to_grid=True)
        solo_grids.append(lat_s.shape[0])
        assert n_s == n_b[i]
        np.testing.assert_allclose(
            lat_b[i, : n_b[i]], lat_s[: n_s], rtol=1e-4, atol=1e-4,
            err_msg=f"row {i} diverged from its solo synthesis",
        )
    # the batch shares ONE grid: the bucket fitting the longest item
    assert t_grid == max(solo_grids)


def test_tts_batch_pads_to_power_of_two(tiny_inf):
    texts = ["one", "two", "three"]
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    lat, ns, _ = tiny_inf.tts_batch(texts, keys, steps=2, cfg_scale=1.5)
    # results sliced back to the true batch; all finite
    assert lat.shape[0] == 3 and len(ns) == 3
    assert np.isfinite(lat).all()


def test_noise_is_grid_invariant(tiny_inf):
    """The ODE init noise prefix must not depend on the picked bucket —
    this is what makes (text, seed) fully determine the audio."""
    inf = tiny_inf
    k = jnp.asarray(jax.random.PRNGKey(5))[None]
    d = inf.model.cfg.latent_dim
    small = np.asarray(inf._noise_jit(k, 16, d, jnp.float32))
    big = np.asarray(inf._noise_jit(k, 32, d, jnp.float32))
    np.testing.assert_array_equal(small[0], big[0, :16])


def test_render_batch_matches_solo(tiny_inf):
    """render.batch rows == solo render calls on the same latents."""
    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.render import SAMPLES_PER_FRAME, make_renderer
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.models.vocoder import GriffinLimVocoder

    vae_cfg = VAEModelConfig(latent_channels=8)
    vae = AcousticVAE(vae_cfg)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    render = make_renderer(vae, vae_params, vae_cfg,
                           GriffinLimVocoder(n_iter=2))
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 16, 8)).astype(np.float32)
    n_frames = [10, 16]
    wavs = render.batch(lat, n_frames)
    # GL's ISTFT may come up a window short of the full grid; the contract
    # is row i == the solo render of the same latents (same slicing rule)
    assert len(wavs[0]) <= 10 * SAMPLES_PER_FRAME
    for i, n in enumerate(n_frames):
        solo = render(lat[i], n)
        assert wavs[i].shape == solo.shape
        np.testing.assert_allclose(wavs[i], solo, rtol=1e-5, atol=1e-5)


def test_asr_batch_matches_solo_rows(tiny_inf):
    """Each batched ASR row must decode to exactly the transcript the solo
    asr() call produces from the same key: per-item noise at the fixed
    (num_queries, hidden) grid + masked batch compute means batch
    composition cannot change a request's transcript."""
    inf = tiny_inf
    rng = np.random.default_rng(3)
    lats = [rng.standard_normal((t, 8)).astype(np.float32)
            for t in (10, 16, 7)]
    keys = [jax.random.PRNGKey(s) for s in (5, 6, 7)]
    batch = inf.asr_batch(lats, keys, steps=3, cfg_scale=1.0)
    assert len(batch) == 3
    for i, (lat, key) in enumerate(zip(lats, keys)):
        solo = inf.asr(lat, key, steps=3, cfg_scale=1.0)
        assert batch[i] == solo, f"row {i}: {batch[i]!r} != {solo!r}"


def test_asr_batch_solver_plumbing(tiny_inf):
    """asr_batch honors method/time_schedule (the shipped midpoint-10
    default path) and pads odd batch sizes to a power of two."""
    inf = tiny_inf
    rng = np.random.default_rng(4)
    lats = [rng.standard_normal((12, 8)).astype(np.float32)
            for _ in range(3)]
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    out = inf.asr_batch(lats, keys, steps=2, method="midpoint")
    assert len(out) == 3 and all(isinstance(t, str) for t in out)
    solo = inf.asr(lats[0], keys[0], steps=2, method="midpoint")
    assert out[0] == solo


def test_serving_stats_snapshot():
    """ServingStats: counters, error separation, percentile reservoirs,
    and the batch-size histogram/mean — pure unit, no server."""
    from audio_calm_tpu.serving import ServingStats

    s = ServingStats(max_samples=16)
    for i in range(10):
        s.record_request("tts", 0.1 * (i + 1))
    s.record_request("tts", 0.0, error=True)
    s.record_group("tts", 4, 0.2)
    s.record_group("tts", 2, 0.1)
    s.record_group("asr", 1, 0.05)
    snap = s.snapshot()
    assert snap["requests"] == {"tts": 10}
    assert snap["errors"] == {"tts": 1}
    lat = snap["request_latency_s"]["tts"]
    assert lat["count"] == 10
    assert lat["p50"] == pytest.approx(0.5, abs=0.11)
    assert lat["p99"] == pytest.approx(1.0, abs=0.01)
    assert lat["mean"] == pytest.approx(0.55, abs=1e-6)
    b = snap["batches"]["tts"]
    assert b["sizes"] == {"2": 1, "4": 1}
    assert b["calls"] == 2 and b["mean_batch"] == 3.0
    assert snap["batches"]["asr"]["mean_batch"] == 1.0
    # reservoir is bounded: 100 more samples keep only the last 16
    for i in range(100):
        s.record_request("asr", float(i))
    assert s.snapshot()["request_latency_s"]["asr"]["count"] == 16


def test_serving_stats_thread_safety():
    """Concurrent recorders from many threads lose no counts."""
    from audio_calm_tpu.serving import ServingStats

    s = ServingStats()
    n_threads, per = 8, 200

    def worker(k):
        for i in range(per):
            s.record_request(f"kind{k % 2}", 0.01)
            s.record_group("tts", 1 + (i % 4), 0.01)

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    snap = s.snapshot()
    assert sum(snap["requests"].values()) == n_threads * per
    assert snap["batches"]["tts"]["calls"] == n_threads * per


# ---------------------------------------------------------------------------
# Bucketed batched ASR frontend (serving/frontend.py): bucketing must be
# invisible — the VAE encoder GroupNorm-normalizes over TIME, so naive
# silence-padding to a bucket would shift every valid latent
# ---------------------------------------------------------------------------
def _exact_frontend(vae, vae_params, vae_cfg, mel_cfg, wav):
    """The pre-batching serve.py path: peak-normalize the exact wav,
    exact-length mel, pad_to_stride, unmasked encode."""
    from audio_calm_tpu.models.vae import AcousticVAE, pad_to_stride
    from audio_calm_tpu.ops.mel import MelFrontend

    w = np.asarray(wav, np.float32)
    p = np.max(np.abs(w))
    if p > 0:
        w = w / (p + 1e-8) * 0.95
    mel = pad_to_stride(MelFrontend(mel_cfg)(jnp.asarray(w[None])),
                        vae_cfg.total_stride)
    mu, _ = vae.apply(vae_params, mel, method=AcousticVAE.encode)
    n_mel = len(w) // mel_cfg.hop_length + 1
    n_lat = -(-n_mel // vae_cfg.total_stride)
    return np.asarray(mu[0, :n_lat])


def test_asr_frontend_bucketed_matches_exact():
    """Batched bucketed frontend rows == solo exact-length encodes.

    Covers: short utterance far below its bucket (worst case for the
    old zero-pad GroupNorm pollution), exact bucket fit, over-max clamp,
    and mixed lengths in one batch."""
    from audio_calm_tpu.config import MelConfig, VAEModelConfig
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.serving.frontend import make_asr_frontend

    vae_cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                             norm_num_groups=8)
    vae = AcousticVAE(vae_cfg)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    mel_cfg = MelConfig()
    lat_buckets = [8, 16]
    spf = vae_cfg.total_stride * mel_cfg.hop_length  # samples per latent
    prep, batch = make_asr_frontend(vae, vae_params, vae_cfg, mel_cfg,
                                    lat_buckets)

    rng = np.random.default_rng(7)
    lens = [2500,               # deep inside the 8-latent bucket
            8 * spf - 1024,     # near-full first bucket (reflect tail fits)
            8 * spf - 200,      # reflect tail would truncate -> next bucket
            8 * spf,            # exact fit also bumps (tail needs room)
            12000,              # second bucket
            20 * spf]           # over the max grid -> clamped to 16*spf
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3 for n in lens]

    prepped = [prep(w) for w in wavs]
    by_bucket = {}
    for (bucket, padded, n), w in zip(prepped, wavs):
        by_bucket.setdefault(bucket, []).append(((padded, n), w))
    assert sorted(by_bucket) == [8 * spf, 16 * spf]

    for bucket, pairs in by_bucket.items():
        out = batch([it for it, _ in pairs])
        for lat, ((_, n), w) in zip(out, pairs):
            exact = _exact_frontend(vae, vae_params, vae_cfg, mel_cfg,
                                    w[:n])
            assert lat.shape == exact.shape
            np.testing.assert_allclose(lat, exact, rtol=2e-4, atol=2e-5)


def test_split_wav_for_asr_cuts_at_silence():
    """Chunks are <= max, concatenate back exactly, and the cut prefers
    the silent band inside the search window over word interiors."""
    from audio_calm_tpu.eval.infer import split_wav_for_asr

    rng = np.random.default_rng(0)
    sr = 16000
    wav = (rng.standard_normal(3 * sr) * 0.5).astype(np.float32)
    wav[14000:15000] = 0.0  # a pause just before the 1 s boundary
    chunks = split_wav_for_asr(wav, max_samples=sr, search_samples=4000,
                               frame=400)
    assert all(len(c) <= sr for c in chunks) and len(chunks) >= 3
    np.testing.assert_array_equal(np.concatenate(chunks), wav)
    assert 14000 <= len(chunks[0]) <= 15000  # first cut in the silence
    # inputs inside the budget degenerate to one chunk
    assert len(split_wav_for_asr(wav[:100], sr)) == 1


def test_asr_long_matches_per_chunk_solo(tiny_inf):
    """asr_long == joining solo asr() per chunk under the documented key
    contract (fold_in(rng, i); rng itself for a single chunk), whatever
    the decode grouping — transcripts are a function of (audio, rng)."""
    from audio_calm_tpu.config import MelConfig, VAEModelConfig
    from audio_calm_tpu.eval.infer import split_wav_for_asr
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.serving.frontend import (encode_chunks,
                                                 make_asr_frontend)

    inf = tiny_inf
    vae_cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                             norm_num_groups=8)
    vae = AcousticVAE(vae_cfg)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    mel_cfg = MelConfig()
    spf = vae_cfg.total_stride * mel_cfg.hop_length
    prep, batch = make_asr_frontend(vae, vae_params, vae_cfg, mel_cfg,
                                    [16, 32])
    max_wav = 32 * spf

    def encode(chunks):
        return encode_chunks(prep, batch, chunks)

    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(int(2.6 * max_wav)) * 0.3).astype(np.float32)
    key = jax.random.PRNGKey(21)
    joined = inf.asr_long(wav, key, encode, max_wav, steps=2)

    chunks = [c for c in split_wav_for_asr(
        wav, max_wav, search_samples=24000) if len(c)]
    assert len(chunks) >= 3
    lats = encode(chunks)
    texts = [inf.asr(lat, jax.random.fold_in(key, i), steps=2)
             for i, lat in enumerate(lats)]
    assert joined == " ".join(t.strip() for t in texts if t.strip())

    # decode-grouping invariance (chunks split across device batches)
    assert joined == inf.asr_long(wav, key, encode, max_wav, steps=2,
                                  max_decode_batch=2)

    # a wav inside the budget decodes exactly like the solo asr(rng)
    short = wav[: max_wav - 2048]
    lat = encode([short])[0]
    assert (inf.asr_long(short, key, encode, max_wav, steps=2)
            == inf.asr(lat, key, steps=2))


def test_serving_stats_record_latency_counts_no_request():
    """record_latency feeds percentiles only — synthetic kinds (stream
    TTFA) must never inflate the request counters."""
    from audio_calm_tpu.serving import ServingStats

    st = ServingStats()
    st.record_request("tts_stream", 1.0)
    st.record_latency("tts_stream_first_chunk", 0.25)
    snap = st.snapshot()
    assert snap["requests"] == {"tts_stream": 1}
    assert snap["request_latency_s"]["tts_stream_first_chunk"]["count"] == 1


def test_render_is_grid_and_pad_invariant():
    """render(latents, n) must give the same audio whatever grid the
    latents were padded to and whatever the padding contains (ODE noise):
    the masked VAE decode pins the valid mel to the exact-length decode,
    so (text, seed) -> audio is bucket-independent. The vocoder boundary
    effect is confined to its receptive field at the utterance tail."""
    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.eval.render import SAMPLES_PER_FRAME, make_renderer
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.models.vocoder import (HiFiGANConfig,
                                               HiFiGANGenerator,
                                               HiFiGANVocoder)

    vae_cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                             norm_num_groups=8)
    vae = AcousticVAE(vae_cfg)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )
    voc_cfg = HiFiGANConfig(upsample_initial_channel=32)
    gen = HiFiGANGenerator(voc_cfg)
    gen_params = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 80)))
    vocoder = HiFiGANVocoder(gen_params["params"]
                             if "params" in gen_params else gen_params,
                             cfg=voc_cfg, fused=False)
    render = make_renderer(vae, vae_params, vae_cfg, vocoder)

    rng = np.random.default_rng(9)
    n = 10
    lat = rng.standard_normal((n, 8)).astype(np.float32)
    wavs = {}
    for grid in (16, 32):
        buf = rng.standard_normal((grid, 8)).astype(np.float32)  # noise pad
        buf[:n] = lat
        wavs[grid] = render(buf, n)
    assert wavs[16].shape == wavs[32].shape == (n * SAMPLES_PER_FRAME,)
    np.testing.assert_allclose(wavs[16], wavs[32], rtol=1e-4, atol=1e-5)
