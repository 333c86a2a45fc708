"""HTTP serving integration: spawn scripts/serve.py as a real subprocess
(CPU, tiny model, byte tokenizer), then drive /health, /tts (long-form
chunked path), and /asr over actual HTTP."""

import json
import io
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

TINY_YAML = """
model:
  latent_dim: 8
  max_audio_len: 32
  max_text_len: 96
  tts_flow_hidden_dim: 32
  tts_flow_num_layers: 1
  asr_flow_hidden_dim: 32
  asr_flow_num_layers: 1
  flow_num_heads: 4
  qwen:
    vocab_size: 512
    hidden_size: 64
    intermediate_size: 128
    num_hidden_layers: 2
    num_attention_heads: 4
    num_key_value_heads: 2
    head_dim: 16
    rope_theta: 10000.0
evaluation:
  audio_buckets: [16, 32]
  text_buckets: [64, 96]
  # the shipped serving recipe (configs/calm.yaml): exercises serve.py's
  # bf16 cast path; batch-invariance is bitwise under bf16 too (verified —
  # rows are independent, so batch composition can't change a row's math)
  compute_dtype: bfloat16
"""

@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    cfg = root / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # log to a FILE: an unread subprocess.PIPE fills at ~64 KB and then
    # blocks the server mid-request on its own log writes
    log = open(root / "serve.log", "wb")
    proc = subprocess.Popen(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py"),
         "--config", str(cfg), "--cpu", "--byte-tokenizer",
         "--port", "0"],  # ephemeral port: no collision with stale servers
        stdout=log, stderr=subprocess.STDOUT, env=env,
    )
    # generous deadline: under full-suite load on the 1-core host, engine
    # build + first /health can take minutes (it passed at 240 s in
    # isolation but flaked in-suite)
    deadline = time.time() + 600
    last = None
    port = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = (root / "serve.log").read_bytes().decode(errors="replace")
            raise RuntimeError(f"serve.py exited rc={proc.returncode}:\n{out}")
        if port is None:
            import re

            m = re.search(rb"serving on :(\d+)",
                          (root / "serve.log").read_bytes())
            if not m:
                time.sleep(1)
                continue
            port = int(m.group(1))
        base = f"http://localhost:{port}"
        try:
            with urllib.request.urlopen(base + "/health", timeout=2) as r:
                if json.load(r)["status"] == "ok":
                    break
        except (urllib.error.URLError, OSError) as ex:
            last = ex
            time.sleep(2)
    else:
        proc.kill()
        raise RuntimeError(f"server never became healthy: {last}")
    yield base
    proc.terminate()
    proc.wait(timeout=30)


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=10) as r:
        assert json.load(r) == {"status": "ok"}


def test_tts_roundtrip_long_text(server):
    # long enough to exceed one chunk with the byte tokenizer
    text = ("The quick brown fox jumps over the lazy dog. " * 2
            + "Pack my box with five dozen jugs! The end.")
    req = urllib.request.Request(
        server + "/tts",
        data=json.dumps({"text": text, "steps": 2, "cfg_scale": 1.5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        n = w.getnframes()
    # > one max grid (32 frames * 1024 samples) proves multi-chunk synthesis
    assert n > 32 * 1024

    # missing text -> 400
    bad = urllib.request.Request(
        server + "/tts", data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400


def test_tts_long_form_chunks_coalesce_and_are_deterministic(server):
    """Multi-chunk /tts rides the request batcher: the chunks of one long
    request coalesce into batched device calls (visible in /stats as a
    tts batch of size >= 2), and a seeded long-form request is
    bit-deterministic across repeats."""
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        before = json.load(r)["batches"].get("tts", {})
    multi_before = sum(
        n for s, n in before.get("sizes", {}).items() if int(s) >= 2)

    text = ("The quick brown fox jumps over the lazy dog. " * 2
            + "Pack my box with five dozen jugs! The end.")
    p = {"text": text, "steps": 2, "cfg_scale": 1.5, "seed": 31}
    a, b = _tts_post(server, p), _tts_post(server, p)
    assert a == b and len(a) > 44

    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        after = json.load(r)["batches"].get("tts", {})
    multi_after = sum(
        n for s, n in after.get("sizes", {}).items() if int(s) >= 2)
    assert multi_after > multi_before, (
        "long-form chunks did not coalesce into a multi-row tts batch")


def test_asr_accepts_wav(server):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())
    req = urllib.request.Request(server + "/asr", data=buf.getvalue(),
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.load(r)
    assert "text" in out and isinstance(out["text"], str)


def test_asr_long_wav_chunked(server):
    """A wav past the 32-latent budget (32*1024 samples) takes the chunked
    long-form path: 200, multiple chunks, and a seeded request is
    deterministic (chunk keys fold_in the seed, batch-invariant)."""
    sr = 16000
    n = 3 * 32 * 1024  # 3x the biggest wav bucket (~6.1 s)
    rng = np.random.default_rng(5)
    pcm = (np.clip(rng.standard_normal(n) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    body = buf.getvalue()

    def post():
        req = urllib.request.Request(server + "/asr?seed=7", data=body,
                                     headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.load(r)

    out1, out2 = post(), post()
    assert out1["chunks"] >= 2 and isinstance(out1["text"], str)
    assert out1 == out2


def test_tts_streaming_chunked(server):
    """stream:true -> chunked transfer; audio arrives in multiple chunks
    (header first), and the total PCM length matches the non-streamed
    response for the same text (length prediction is text-deterministic)."""
    import http.client

    text = ("The quick brown fox jumps over the lazy dog. " * 2
            + "Pack my box with five dozen jugs! The end.")
    payload = json.dumps({"text": text, "steps": 2, "cfg_scale": 1.5,
                          "stream": True})
    port = int(server.rsplit(":", 1)[1])
    conn = http.client.HTTPConnection("localhost", port, timeout=600)
    conn.request("POST", "/tts", body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers["Transfer-Encoding"] == "chunked"
    assert resp.headers["Content-Type"] == "audio/wav"
    # http.client decodes the chunked framing; read incrementally
    pieces = []
    while True:
        b = resp.read(65536)
        if not b:
            break
        pieces.append(b)
    conn.close()
    data = b"".join(pieces)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    n_stream = (len(data) - 44) // 2

    # non-streamed reference for the same text
    req = urllib.request.Request(
        server + "/tts",
        data=json.dumps({"text": text, "steps": 2,
                         "cfg_scale": 1.5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        ref = r.read()
    with wave.open(io.BytesIO(ref)) as w:
        n_ref = w.getnframes()
    assert n_stream == n_ref > 32 * 1024


def _tts_post(server, payload, timeout=600):
    req = urllib.request.Request(
        server + "/tts", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def _pcm(wav_data):
    with wave.open(io.BytesIO(wav_data)) as w:
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0


def test_tts_seed_is_deterministic(server):
    """An explicit "seed" pins the ODE noise: same request twice -> same
    audio (short text goes through the batched serving path)."""
    p = {"text": "hello there", "steps": 2, "cfg_scale": 1.5, "seed": 123}
    a, b = _tts_post(server, p), _tts_post(server, p)
    assert a == b and len(a) > 44
    # a different seed actually changes the audio
    c = _tts_post(server, dict(p, seed=124))
    assert c != a


def test_tts_concurrent_requests_batch_safely(server):
    """Concurrent short /tts requests (which the server may coalesce into
    one batched device program) must each return the same audio as the
    identical request served alone — batch composition cannot change a
    seeded request's output."""
    import threading as th

    solo = _pcm(_tts_post(server, {"text": "hello there", "steps": 2,
                                   "cfg_scale": 1.5, "seed": 123}))
    texts = [("hello there", 123), ("good day", 7), ("cats and dogs", 9)]
    out = {}
    barrier = th.Barrier(len(texts))

    def client(text, seed):
        barrier.wait()
        out[(text, seed)] = _tts_post(
            server, {"text": text, "steps": 2, "cfg_scale": 1.5,
                     "seed": seed})

    threads = [th.Thread(target=client, args=t) for t in texts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(out) == 3
    got = _pcm(out[("hello there", 123)])
    assert got.shape == solo.shape
    # identical up to int16 quantization of float-batching jitter; the
    # final ~Griffin-Lim window is excluded (phase iteration near the
    # grid-padding boundary differs when the batch picked a bigger grid)
    body = max(1, len(got) - 4096)
    assert np.abs(got[:body] - solo[:body]).max() <= 2 / 32768.0


def _asr_post(server, freq, seed=None):
    """POST a 1 s sine-tone WAV to /asr (optionally seeded) -> transcript."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())
    url = server + "/asr" + (f"?seed={seed}" if seed is not None else "")
    req = urllib.request.Request(url, data=buf.getvalue(),
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.load(r)["text"]


def test_asr_concurrent_requests_batch_safely(server):
    """Concurrent /asr requests (which the server may coalesce into one
    batched flow program) must each return exactly the transcript the
    identical seeded request gets when served alone."""
    import threading as th

    freqs = (220, 440, 660)
    solos = {f: _asr_post(server, f, seed=f) for f in freqs}
    out = {}
    barrier = th.Barrier(len(freqs))

    def client(f):
        barrier.wait()
        out[f] = _asr_post(server, f, seed=f)

    threads = [th.Thread(target=client, args=(f,)) for f in freqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert out == solos


def _wav_body(pcm16, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def test_asr_streaming_upload_matches_buffered(server):
    """A chunked Transfer-Encoding /asr upload streams NDJSON transcripts:
    one line per decode chunk in order, then a done line whose joined text
    equals the buffered /asr of the same wav for the same seed (chunk keys
    fold_in the seed identically on both paths)."""
    import http.client

    n = 3 * 32 * 1024  # 3x the biggest wav bucket -> >= 2 cuts
    rng = np.random.default_rng(5)
    pcm = (np.clip(rng.standard_normal(n) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    body = _wav_body(pcm)

    req = urllib.request.Request(server + "/asr?seed=7", data=body,
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=600) as r:
        ref = json.load(r)

    port = int(server.rsplit(":", 1)[1])
    conn = http.client.HTTPConnection("localhost", port, timeout=600)
    conn.request(
        "POST", "/asr?seed=7",
        body=(body[off:off + 9973] for off in range(0, len(body), 9973)),
        encode_chunked=True,
        headers={"Content-Type": "audio/wav",
                 "Transfer-Encoding": "chunked"},
    )
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(l) for l in resp.read().decode().splitlines()]
    conn.close()
    done = lines[-1]
    assert done["done"] is True
    assert done["chunks"] == ref["chunks"] >= 2
    chunk_lines = lines[:-1]
    assert [l["chunk"] for l in chunk_lines] == list(range(done["chunks"]))
    assert " ".join(t for t in (l["text"] for l in chunk_lines)
                    if t) == done["text"]
    assert done["text"] == ref["text"]


def test_asr_stream_flag_single_chunk_matches_buffered(server):
    """?stream=1 on a plain Content-Length body also streams; a wav inside
    the latent budget is one chunk decoded with the base key, so its text
    equals the buffered /asr for the same seed."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    pcm = (0.3 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    body = _wav_body(pcm)
    req = urllib.request.Request(server + "/asr?seed=3", data=body,
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=600) as r:
        ref = json.load(r)["text"]
    req = urllib.request.Request(server + "/asr?stream=1&seed=3", data=body,
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert lines[-1] == {"done": True, "text": ref, "chunks": 1}
    assert lines[0] == {"chunk": 0, "text": ref}


def test_asr_streaming_emits_mid_upload(server):
    """The point of streaming ASR: a transcript line reaches the client
    BEFORE the upload ends. Raw-socket chunked upload: send one decode
    window of audio, then trickle silence until the first NDJSON line
    arrives — only then terminate the upload."""
    import socket

    win = 32 * 1024  # biggest wav bucket in samples
    rng = np.random.default_rng(11)
    pcm = (np.clip(rng.standard_normal(win + 8192) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    body = _wav_body(pcm)
    port = int(server.rsplit(":", 1)[1])
    s = socket.create_connection(("localhost", port), timeout=600)

    def send_chunk(data):
        s.sendall(f"{len(data):x}\r\n".encode() + data + b"\r\n")

    s.sendall(b"POST /asr?seed=2 HTTP/1.1\r\nHost: localhost\r\n"
              b"Transfer-Encoding: chunked\r\n"
              b"Content-Type: audio/wav\r\n\r\n")
    send_chunk(body)  # > one window of audio -> the first cut fires now
    # the server flushes completed transcripts when the next body piece
    # arrives: trickle 0.1 s silence pieces until the first line lands
    s.settimeout(0.25)
    silence = np.zeros(1600, np.int16).tobytes()
    got = b""
    deadline = time.time() + 300
    while b'"text"' not in got and time.time() < deadline:
        send_chunk(silence)
        try:
            got += s.recv(65536)
        except socket.timeout:
            pass
    assert b'"text"' in got, "no transcript arrived before the upload ended"
    s.sendall(b"0\r\n\r\n")  # NOW end the upload
    s.settimeout(600)
    while b'"done"' not in got:
        d = s.recv(65536)
        assert d, "connection closed before the done line"
        got += d
    s.close()
    assert got.startswith(b"HTTP/1.1 200")


def test_asr_stream_rejects_bad_input(server):
    """Pre-stream failures are clean 400s: a non-WAV body, and a rate the
    strict live-capture parser refuses (buffered /asr resamples instead)."""
    for body in (b"definitely not a RIFF stream",
                 _wav_body(np.zeros(8000, np.int16), sr=8000)):
        req = urllib.request.Request(server + "/asr?stream=1", data=body,
                                     headers={"Content-Type": "audio/wav"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as ex:
            assert ex.code == 400


def test_stats_endpoint(server):
    """GET /stats reflects the traffic the earlier tests generated:
    request counts per route, latency percentiles, and coalesced-batch
    histograms whose item totals match the request counts."""
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        s = json.load(r)
    assert s["uptime_s"] > 0
    # the earlier tests drove /tts (solo + batched), streaming, and /asr
    assert s["requests"].get("tts", 0) >= 1
    assert s["requests"].get("asr", 0) >= 1
    assert s["requests"].get("tts_stream", 0) >= 1
    # TTFA reservoir exists for streaming
    assert "tts_stream_first_chunk" in s["request_latency_s"]
    for kind in ("tts", "asr"):
        lat = s["request_latency_s"][kind]
        assert lat["count"] == s["requests"][kind]
        assert 0 < lat["p50"] <= lat["p99"]
    # batched device calls: every request contributes at least one item
    # to the size histogram, and long-form requests (multi-chunk audio)
    # contribute one item PER chunk — so the item total is >= the request
    # count, strictly greater once test_asr_long_wav_chunked has run
    asr_batches = s["batches"]["asr"]
    items = sum(int(k) * v for k, v in asr_batches["sizes"].items())
    assert items >= s["requests"]["asr"]
    assert asr_batches["mean_batch"] >= 1.0


def test_tts_ode_params_quantize_to_ladder(server):
    """Client steps/cfg_scale are XLA compile keys: novel values quantize
    to the fixed ladder (steps=3 -> 2 or 4; scale rounds to 0.25) and the
    effective values come back in X-ODE-Steps / X-CFG-Scale headers, so a
    parameter sweep can't force unbounded multi-minute compiles."""
    req = urllib.request.Request(
        server + "/tts",
        data=json.dumps({"text": "hi", "steps": 3,
                         "cfg_scale": 1.49, "seed": 5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["X-ODE-Steps"] in ("2", "4")
        assert r.headers["X-CFG-Scale"] == "1.5"
        r.read()


def test_tts_rejects_non_numeric_params(server):
    """Bad client input is a 400, not a 500 + error tick in /stats."""
    for payload in ({"text": "hi", "seed": "abc"},
                    {"text": "hi", "steps": "lots"}):
        req = urllib.request.Request(
            server + "/tts", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as ex:
            assert ex.code == 400


def test_request_guards(server):
    """Oversized bodies are refused before buffering (413); oversized
    text is a 400 — one request can't monopolize the device or memory."""
    req = urllib.request.Request(
        server + "/tts", data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(100 * 1024 * 1024)},
    )
    # urllib sends our forged Content-Length; the server must refuse
    # based on the header alone. It may also just drop the connection
    # while we fail to stream the promised bytes — both are acceptable.
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected rejection"
    except urllib.error.HTTPError as ex:
        assert ex.code == 413
    except (urllib.error.URLError, ConnectionError, TimeoutError):
        pass

    big = json.dumps({"text": "a" * 30_000}).encode()
    req = urllib.request.Request(server + "/tts", data=big,
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as ex:
        assert ex.code == 400


def test_early_error_closes_partial_body_connection(server):
    """An error response sent before the request body was consumed must
    not leave the connection open: a keep-alive client would see its own
    unread body bytes parsed as the next request line (desync). The 411
    for chunked non-/asr posts is the easiest such path to drive."""
    import socket

    port = int(server.rsplit(":", 1)[1])
    s = socket.create_connection(("localhost", port), timeout=60)
    body = b'{"text": "hello"}'
    s.sendall(b"POST /tts HTTP/1.1\r\nHost: localhost\r\n"
              b"Transfer-Encoding: chunked\r\n"
              b"Content-Type: application/json\r\n\r\n"
              + f"{len(body):x}\r\n".encode() + body + b"\r\n0\r\n\r\n")
    got = b""
    while b"\r\n\r\n" not in got:
        d = s.recv(65536)
        assert d, "no response"
        got += d
    assert got.startswith(b"HTTP/1.1 411"), got[:40]
    # drain the (small) JSON body, then expect EOF — NOT a 400/405 from
    # the server misreading our chunked body as a second request
    s.settimeout(10)
    try:
        while True:
            d = s.recv(65536)
            if not d:
                break
            got += d
    except socket.timeout:
        assert False, "connection stayed open after early error"
    s.close()
    assert got.count(b"HTTP/1.1") == 1, got
