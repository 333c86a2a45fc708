"""C extension vs pure-Python fallbacks."""

import io
import wave

import numpy as np
import pytest

native = pytest.importorskip("audio_calm_native")


def _wav_bytes(x16: np.ndarray, sr=16000, channels=1, width=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(x16.tobytes())
    return buf.getvalue()


def test_decode_wav_matches_stdlib():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(5000) * 8000).astype(np.int16)
    raw, sr, n = native.decode_wav(_wav_bytes(x), -1.0)
    out = np.frombuffer(raw, np.float32)
    assert sr == 16000 and n == 5000
    np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_decode_wav_stereo_mix_and_normalize():
    l = (np.ones(100) * 16000).astype(np.int16)
    r = (np.ones(100) * -8000).astype(np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = l, r
    raw, sr, n = native.decode_wav(_wav_bytes(inter, channels=2), 0.95)
    out = np.frombuffer(raw, np.float32)
    assert n == 100
    # mono mix then peak-normalized to 0.95
    assert abs(abs(out).max() - 0.95) < 1e-3


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_wav(b"not a wav file at all" * 10)


def test_edit_distance_i32():
    import array

    a = array.array("i", [1, 2, 3, 4]).tobytes()
    b = array.array("i", [1, 3, 4, 5]).tobytes()
    assert native.edit_distance_i32(a, b) == 2
    assert native.edit_distance_i32(a, a) == 0
    assert native.edit_distance_i32(a, b"") == 4


def test_python_wrapper_consistency():
    from audio_calm_tpu.eval.metrics import edit_distance

    # wrapper (C-backed) must agree with the classic example
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance("a b c".split(), "a x c".split()) == 1


def test_load_audio_uses_native(tmp_path):
    from audio_calm_tpu.data.preprocess import load_audio

    x = (np.sin(np.arange(3000) / 50) * 20000).astype(np.int16)
    p = tmp_path / "t.wav"
    p.write_bytes(_wav_bytes(x))
    out, sr = load_audio(str(p))
    np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=1e-6)
