"""Streaming ASR: incremental low-energy splitting + transcribe-as-you-go.

The reference truncates ASR audio at the 384-latent-frame budget
(eval_calm.py; calm_config.yaml max_speech_token_num) and has no streaming
at all; these cover the streaming long-form design:
split_wav_for_asr_stream must equal the offline splitter chunk for chunk
(so streamed and whole-file transcription are the same program), and
CALMInference.asr_stream must reproduce asr_long's transcript while
emitting each chunk's text before the upload finishes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_calm_tpu.config import (CALMModelConfig, LoRAConfig, MelConfig,
                                   Qwen2Config, VAEModelConfig)
from audio_calm_tpu.data.tokenizer import ByteTokenizer
from audio_calm_tpu.eval.infer import (CALMInference, split_wav_for_asr,
                                       split_wav_for_asr_stream)
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.serving.frontend import encode_chunks, make_asr_frontend


def _random_pieces(rng, wav):
    """Partition a wav into irregular pieces (some empty, some 1-sample)."""
    pieces, pos = [], 0
    while pos < len(wav):
        n = int(rng.choice([0, 1, 37, 400, 1000, 5000, 16000]))
        pieces.append(wav[pos: pos + n])
        pos += n
    if rng.integers(2):
        pieces.append(wav[len(wav):])  # trailing empty piece
    return pieces


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_split_stream_equals_offline_fuzz(seed):
    rng = np.random.default_rng(seed)
    max_s = int(rng.integers(2000, 20000))
    search = int(rng.integers(400, max_s))
    n = int(rng.integers(0, 5 * max_s))
    wav = (rng.standard_normal(n) * 0.5).astype(np.float32)
    for _ in range(3):  # silence pockets so cuts have real minima
        if n > 1200:
            at = int(rng.integers(0, n - 1200))
            wav[at: at + 1200] = 0.0

    offline = split_wav_for_asr(wav, max_s, search_samples=search)
    pieces = _random_pieces(rng, wav)
    streamed = list(split_wav_for_asr_stream(iter(pieces), max_s,
                                             search_samples=search))
    assert len(streamed) == len(offline)
    for a, b in zip(streamed, offline):
        np.testing.assert_array_equal(a, b)

    tagged = list(split_wav_for_asr_stream(iter(pieces), max_s,
                                           search_samples=search,
                                           tagged=True))
    assert [t for _, t in tagged] == [False] * (len(offline) - 1) + [True]
    # every cut-produced (non-final) chunk is non-empty, and so is the
    # remainder behind it — the invariant asr_stream's immediate decode
    # of non-final chunks relies on
    for c, fin in tagged[:-1]:
        assert len(c) > 0
    if len(tagged) > 1:
        assert len(tagged[-1][0]) > 0


def test_split_stream_emits_before_eos():
    """A cut fires while the upload is still in flight: the first chunk
    appears before the piece iterator is exhausted."""
    sr = 16000
    wav = (np.random.default_rng(5).standard_normal(4 * sr) * 0.5
           ).astype(np.float32)
    pieces = [wav[i: i + 4000] for i in range(0, len(wav), 4000)]
    consumed = {"n": 0}

    def feed():
        for p in pieces:
            consumed["n"] += 1
            yield p

    gen = split_wav_for_asr_stream(feed(), sr, search_samples=4000)
    first = next(gen)
    assert consumed["n"] < len(pieces)
    rest = list(gen)
    np.testing.assert_array_equal(np.concatenate([first] + rest), wav)


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
    params = {"params": init_calm_params(model, jax.random.PRNGKey(0))}
    return CALMInference(model, params, ByteTokenizer(),
                         audio_buckets=[16, 32], text_buckets=[64, 96])


def test_asr_stream_matches_asr_long(tiny_inf):
    """" ".join(asr_stream(pieces)) == asr_long(concat(pieces)) — same
    cuts, same per-chunk keys — and the first transcript is yielded
    before the audio iterator is exhausted."""
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
        # per-chunk encode in BOTH paths so streamed and offline decode
        # identical latents (the frontend's grouped-vs-solo ~6e-7 masked
        # batching tolerance is covered by test_serving_batch)
        return [encode_chunks(prep, batch, [c])[0] for c in chunks]

    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(int(2.6 * max_wav)) * 0.3).astype(np.float32)
    key = jax.random.PRNGKey(21)
    joined = inf.asr_long(wav, key, encode, max_wav, steps=2)

    pieces = _random_pieces(rng, wav)
    consumed = {"n": 0}

    def feed():
        for p in pieces:
            consumed["n"] += 1
            yield p

    consumed_at_yield = []
    texts = []
    for t in inf.asr_stream(feed(), key, encode, max_wav, steps=2,
                            search_ms=1500.0):
        consumed_at_yield.append(consumed["n"])
        texts.append(t)
    assert " ".join(t for t in texts if t) == joined
    assert len(texts) >= 3
    # streaming property: the first transcript landed mid-upload
    assert consumed_at_yield[0] < len(pieces)

    # a stream inside the budget == asr_long == solo asr(rng itself)
    short = wav[: max_wav - 2048]
    solo = inf.asr_long(short, key, encode, max_wav, steps=2)
    stream = list(inf.asr_stream(iter([short[:5000], short[5000:]]), key,
                                 encode, max_wav, steps=2))
    assert " ".join(t for t in stream if t) == solo
    assert len(stream) == 1


# ---------------------------------------------------------------------------
# WavStreamParser (incremental WAV decode for streaming uploads)
# ---------------------------------------------------------------------------
def _wav_bytes(x, sr=16000, channels=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.asarray(x) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _feed_in_slices(parser, data, rng):
    out, pos = [], 0
    while pos < len(data):
        n = int(rng.choice([1, 3, 7, 44, 100, 4096]))
        out.append(parser.feed(data[pos: pos + n]))
        pos += n
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def test_wav_stream_parser_roundtrip():
    from audio_calm_tpu.serving.wav_stream import WavStreamParser

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(12345) * 0.4).clip(-1, 1).astype(np.float32)
    data = _wav_bytes(x)
    got = _feed_in_slices(WavStreamParser(), data, rng)
    want = (np.round(x * 32767).astype(np.int16).astype(np.float32)
            / 32768.0)
    # wave writes exactly the int16 payload; truncation vs round differs,
    # so compare against the actual stored int16s
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        stored = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_array_equal(got, stored.astype(np.float32) / 32768.0)
    assert got.shape == x.shape and np.abs(got - want).max() <= 1 / 32768.0


def test_wav_stream_parser_unbounded_header_and_junk_chunk():
    """Live-encoder streams: 0xFFFFFFFF sizes, extra chunks before data."""
    import struct as st

    from audio_calm_tpu.serving.wav_stream import WavStreamParser

    rng = np.random.default_rng(4)
    pcm = (rng.standard_normal(5000) * 8000).astype(np.int16)
    hdr = (b"RIFF" + st.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
           + st.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
           + b"JUNK" + st.pack("<I", 5) + b"abcde\x00"  # odd size + pad
           + b"data" + st.pack("<I", 0xFFFFFFFF))
    p = WavStreamParser()
    got = _feed_in_slices(p, hdr + pcm.tobytes(), rng)
    assert p.in_data
    np.testing.assert_array_equal(got, pcm.astype(np.float32) / 32768.0)


def test_wav_stream_parser_stereo_mean_and_bounded_data():
    from audio_calm_tpu.serving.wav_stream import WavStreamParser

    rng = np.random.default_rng(5)
    x = rng.standard_normal((777, 2)).clip(-1, 1) * 0.3
    data = _wav_bytes(x.reshape(-1), channels=2) + b"LIST0000trailing"
    got = _feed_in_slices(WavStreamParser(), data, rng)
    want = ((x * 32767).astype(np.int16).astype(np.float32) / 32768.0
            ).mean(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wav_stream_parser_rejects_bad_streams():
    from audio_calm_tpu.serving.wav_stream import WavStreamParser

    with pytest.raises(ValueError, match="RIFF"):
        WavStreamParser().feed(b"\x00" * 64)
    # wrong rate
    with pytest.raises(ValueError, match="16000 Hz"):
        WavStreamParser().feed(_wav_bytes(np.zeros(10), sr=22050))
    # float WAV (format 3)
    import struct as st

    bad = (b"RIFF" + st.pack("<I", 100) + b"WAVEfmt "
           + st.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32))
    with pytest.raises(ValueError, match="PCM"):
        WavStreamParser().feed(bad)
    # 8-bit
    bad8 = (b"RIFF" + st.pack("<I", 100) + b"WAVEfmt "
            + st.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8))
    with pytest.raises(ValueError, match="16-bit"):
        WavStreamParser().feed(bad8)
    # data before fmt
    nofmt = b"RIFF" + st.pack("<I", 100) + b"WAVEdata" + st.pack("<I", 4)
    with pytest.raises(ValueError, match="before fmt"):
        WavStreamParser().feed(nofmt + b"\x00" * 4)
