#!/usr/bin/env python
"""Minimal production-style HTTP inference server (stdlib only).

Endpoints:
  GET  /health              -> {"status": "ok"}
  POST /tts  {"text": ..., "steps"?, "cfg_scale"?, "seed"?, "stream"?}
                                                     -> audio/wav bytes
  POST /asr  (body: WAV bytes)                       -> {"text": ...}
  POST /asr?stream=1  (or a chunked Transfer-Encoding upload)
       -> NDJSON stream: {"chunk": i, "text": ...} per decode chunk as
          soon as its transcript exists (mid-upload for long audio),
          then {"done": true, "text": <joined>, "chunks": N}

The reference ships only a (broken) gradio demo; this is the headless
serving path: one process, jit-compiled once per static shape, requests
served from the warm cache. Concurrent short /tts requests — and,
separately, concurrent /asr requests — coalesce into ONE batched device
program (--max-batch / --batch-window-ms; BASELINE.md measured B=8
aggregate at ~1.5x the single-stream per-chip throughput, 378x vs 249x
device-side on the same solver). Long-form requests (multi-chunk /tts
text, /asr audio past the latent budget) submit each chunk to the SAME
batcher groups, so a long request's chunks coalesce with each other and
with concurrent traffic. "seed" pins a request's noise so its
audio is reproducible and independent of batch composition; /asr rows
likewise draw per-request noise, so batching never changes a transcript.

  python scripts/serve.py --config configs/calm.yaml \
      --components <dir> [--port 8080] [--byte-tokenizer] [--cpu]
"""

import argparse
import io
import json
import sys
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit


class PayloadTooLarge(ValueError):
    """Request exceeds a size/duration cap — reported as HTTP 413 on every
    /asr path (buffered and streaming) for a consistent limit contract."""


def build_engine(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.dp * args.tp > 1:
            jax.config.update("jax_num_cpu_devices",
                              max(8, args.dp * args.tp))

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import CALMConfig, MelConfig, VAEModelConfig, load_config
    from audio_calm_tpu.eval.infer import CALMInference
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.models.vocoder import load_vocoder
    from audio_calm_tpu.train.checkpoint import COMPONENTS, soft_restart
    from audio_calm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    m = cfg.model
    from audio_calm_tpu.data.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(m, byte_fallback=args.byte_tokenizer)

    # evaluation.compute_dtype: float32 = reference eval protocol;
    # bfloat16 = the TPU serving recipe (MXU compute + bf16 param storage,
    # the configuration BASELINE.md's serving numbers measure). Checkpoints
    # load at their stored precision first, then cast.
    from audio_calm_tpu.models.flagship import (cast_floating,
                                                resolve_compute_dtype)

    dtype = resolve_compute_dtype(cfg.evaluation.compute_dtype)
    model = QwenCALM(m, dtype=dtype)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    if args.components:
        params = soft_restart(
            params, {c: args.components for c in COMPONENTS + ("lora",)}
        )
    if dtype == jnp.bfloat16:
        params = cast_floating(params, jnp.bfloat16)
    from audio_calm_tpu.models.quant import maybe_quantize_from_env

    mesh = None
    if args.dp * args.tp > 1:
        # multi-chip serving: TP splits the weight-bandwidth-bound LLM
        # encode over ICI, DP shards batched request groups
        # (parallel/infer_shard.py); same jitted programs, compiled SPMD
        from audio_calm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.dp, model=args.tp,
                         devices=jax.devices()[: args.dp * args.tp])
        print(f"[serve] mesh {dict(mesh.shape)}", file=sys.stderr)

    inf = CALMInference(model,
                        maybe_quantize_from_env({"params": params}),
                        tokenizer,
                        audio_buckets=cfg.evaluation.audio_buckets,
                        text_buckets=cfg.evaluation.text_buckets,
                        mesh=mesh)

    vae_cfg = VAEModelConfig(latent_channels=m.latent_dim)
    if m.vae_path:
        from audio_calm_tpu.models.vae import load_vae

        vae, vae_params = load_vae(m.vae_path, vae_cfg)
    else:
        vae = AcousticVAE(vae_cfg)
        vae_params = vae.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, 80)), train=False,
        )
    vocoder = load_vocoder(cfg.evaluation.vocoder_path)
    print(f"[serve] vocoder: {type(vocoder).__name__}", file=sys.stderr)
    from audio_calm_tpu.eval.render import make_renderer

    render = make_renderer(vae, vae_params, vae_cfg, vocoder)
    mel_cfg = MelConfig()
    rng_state = [jax.random.PRNGKey(cfg.evaluation.seed)]
    rng_lock = threading.Lock()

    def next_key(seed=None):
        """Per-request PRNG key: an explicit seed makes the request's audio
        reproducible (and batch-composition-independent — see
        CALMInference.tts_batch); otherwise split the server stream."""
        if seed is not None:
            return jax.random.PRNGKey(int(seed))
        with rng_lock:
            rng_state[0], k = jax.random.split(rng_state[0])
            return k


    # ASR frontend buckets: wav lengths quantize to the latent-grid
    # buckets so concurrent /asr frontends coalesce into ONE batched
    # (padded-B, bucket) program instead of a solo device round-trip per
    # request; reflect-tail padding + masked VAE encode keep each row's
    # latents equal to a solo exact-length encode (serving/frontend.py).
    # Measured without batching (BASELINE.md "HTTP serving load"): the
    # per-request frontend serialized under the device lock capped /asr
    # at mean batch 2.8 and p50 2.9 s under 8-client load.
    from audio_calm_tpu.serving.frontend import make_asr_frontend

    lat_buckets = cfg.evaluation.audio_buckets or [m.max_audio_len]
    prep_asr, asr_frontend_batch = make_asr_frontend(
        vae, vae_params, vae_cfg, mel_cfg, lat_buckets)
    # wavs longer than the biggest bucket route through the chunked
    # long-form /asr path (split at low-energy points, decode per chunk)
    max_asr_samples = lat_buckets[-1] * vae_cfg.total_stride * mel_cfg.hop_length

    def split_tts(text):
        return inf.split_chunks(text)

    def tts_chunk_keys(key, n):
        # sequential splits of the request key — the derivation
        # tts_long_stream uses, so batched, streamed, and library
        # synthesis of the same (text, seed) produce identical audio
        return inf.chunk_keys(key, n)

    def run_group(group_key, items):
        """Batcher device call. group_key routes the task:
        ("tts", steps, cfg_scale) with items [(text, key)] -> one batched
        synthesize + one batched render; ("fe", wav_bucket) with items
        [(wav_padded, n_samples)] -> one batched mel+VAE encode;
        ("asr", steps) with items [(latents, key)] -> one batched flow
        decode."""
        if group_key[0] == "fe":
            return asr_frontend_batch(items)
        if group_key[0] == "asr":
            _, steps = group_key
            return inf.asr_batch(
                [l for l, _ in items], [k for _, k in items], steps=steps,
                cfg_scale=cfg.evaluation.asr_cfg_scale,
                method=cfg.evaluation.ode_method,
                time_schedule=cfg.evaluation.time_schedule,
            )
        _, steps, cfg_scale = group_key
        texts = [t for t, _ in items]
        keys = [k for _, k in items]
        latents, n_frames, _grid = inf.tts_batch(
            texts, keys, steps=steps, cfg_scale=cfg_scale,
            method=cfg.evaluation.ode_method,
            time_schedule=cfg.evaluation.time_schedule,
        )
        wavs = render.batch(latents, n_frames)
        return [np.clip(w, -1, 1) for w in wavs]

    return (prep_asr, next_key, split_tts, tts_chunk_keys, run_group,
            cfg, max_asr_samples)


def streaming_wav_header(sr=16000):
    """44-byte PCM16 mono WAV header with unknown-length sentinels
    (0xFFFFFFFF RIFF/data sizes — the streaming convention players accept
    on chunked responses)."""
    import struct

    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))


def wav_bytes(x, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("int16").tobytes())
    return buf.getvalue()


def parse_wav(data):
    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            x = x.reshape(-1, w.getnchannels()).mean(axis=1)
    from audio_calm_tpu.data.preprocess import resample_linear

    return resample_linear(x, sr, 16000)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", default=None)
    p.add_argument("--byte-tokenizer", action="store_true")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--max-batch", type=int, default=8,
                   help="coalesce up to N concurrent /tts requests into one "
                        "batched device program (1 = no batching)")
    p.add_argument("--batch-window-ms", type=float, default=10.0,
                   help="how long an open batch waits for more requests")
    p.add_argument("--first-chunk-batch", type=int, default=0,
                   help="batch cap for the streaming first-chunk priority "
                        "lane (TTFA); 0 = min(4, max-batch)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel chips: batched request groups shard "
                        "their rows over this many devices")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel chips: Megatron-split the LLM "
                        "encode over this many devices (dp*tp <= devices)")
    args = p.parse_args(argv)

    (prep_asr, next_key, split_tts, tts_chunk_keys, run_group,
     cfg, max_asr_samples) = build_engine(args)
    e = cfg.evaluation
    # threaded server so /health and slow clients don't block each other;
    # device work itself is serialized (one chip, one engine) inside
    # run_group_locked — handlers never touch the device directly, they
    # submit work to the batcher
    device_lock = threading.Lock()

    from audio_calm_tpu.serving import RequestBatcher, ServingStats

    stats = ServingStats()

    def run_group_locked(group_key, items):
        with device_lock:
            n = len(items)
            if n > 1:
                print(f"[serve] {group_key[0]} batch size={n} "
                      f"key={group_key}", file=sys.stderr)
            t0 = time.monotonic()
            out = run_group(group_key, items)
            stats.record_group(group_key[0], n, time.monotonic() - t0)
            return out

    batcher = RequestBatcher(run_group_locked,
                             max_batch=max(1, args.max_batch),
                             window_ms=args.batch_window_ms,
                             priority_max_batch=args.first_chunk_batch)

    # /tts steps+cfg_scale are jit compile keys (static args of the ODE
    # program): quantize client values to a fixed ladder and cap the number
    # of distinct pairs, so a parameter sweep can't force an unbounded
    # series of multi-minute XLA compiles under the device lock (each novel
    # pair can also spawn {1,2,4,8}-row batch variants). Effective values
    # go back in X-ODE-Steps / X-CFG-Scale response headers.
    ODE_STEPS = (2, 4, 8, 12, 16, 25, 32, 50)
    MAX_ODE_KEYS = 8
    ode_keys_seen = set()
    ode_keys_lock = threading.Lock()

    def clamp_ode(steps, scale):
        steps = min(ODE_STEPS, key=lambda s: abs(s - int(steps)))
        scale = max(0.0, min(4.0, round(float(scale) * 4) / 4))
        if (steps, scale) == (e.steps, e.cfg_scale):
            return steps, scale
        with ode_keys_lock:
            if ((steps, scale) not in ode_keys_seen
                    and len(ode_keys_seen) >= MAX_ODE_KEYS):
                return e.steps, e.cfg_scale
            ode_keys_seen.add((steps, scale))
        return steps, scale

    class Handler(BaseHTTPRequestHandler):
        # chunked Transfer-Encoding (streaming /tts) requires HTTP/1.1;
        # every non-streamed response sets Content-Length so keep-alive
        # semantics stay correct
        protocol_version = "HTTP/1.1"
        # socket timeout for every blocking read/write on the connection
        # (BaseHTTPRequestHandler.setup applies it): a client that stalls
        # mid-upload — a streaming /asr body is read incrementally for
        # potentially minutes — times out and aborts its handler thread
        # instead of leaking it forever. 10 min covers the longest legal
        # upload (MAX_ASR_SAMPLES) at live-capture rate.
        timeout = 600

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}", file=sys.stderr)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"status": "ok"})
            if self.path == "/stats":
                # serving telemetry: request/error counts, client-latency
                # percentiles, coalesced-batch-size histograms (the "is
                # batching working" number) — see serving/stats.py
                return self._json(200, stats.snapshot())
            return self._json(404, {"error": "unknown path"})

        # production guards: a Content-Length beyond any legitimate request
        # is refused before the body buffers in memory; /tts text and /asr
        # audio duration are capped so one request can't monopolize the
        # device for minutes (long-form /asr chunks up to MAX_ASR_SAMPLES)
        MAX_BODY_BYTES = 64 * 1024 * 1024
        MAX_TTS_CHARS = 20_000
        MAX_ASR_SAMPLES = 600 * 16000  # 10 min of 16 kHz audio

        def _json_close(self, code, obj):
            """Error response on a connection whose request body was not
            fully consumed: a keep-alive client would otherwise see its
            own unread body bytes parsed as the next request line
            (connection desync) — close instead of draining an
            arbitrarily large body."""
            self.close_connection = True
            return self._json(code, obj)

        def do_POST(self):
            route = self.path.split("?", 1)[0]
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            chunked = "chunked" in te
            q = parse_qs(urlsplit(self.path).query)
            want_stream = q.get("stream", ["0"])[0] not in ("", "0", "false")
            try:
                if route == "/asr" and (chunked or want_stream):
                    # streaming transcription: decode the body as it
                    # arrives, emit NDJSON transcripts mid-upload
                    return self._post_asr_stream(chunked)
                if chunked:
                    return self._json_close(411, {
                        "error": "chunked upload is only supported on "
                                 "streaming /asr"})
                n = int(self.headers.get("Content-Length", 0))
                if n > self.MAX_BODY_BYTES:
                    return self._json_close(413, {"error": "body too large"})
                body = self.rfile.read(n)
                if route == "/tts":
                    return self._post_tts(body)
                if route == "/asr":
                    return self._post_asr(body)
                return self._json(404, {"error": "unknown path"})
            except Exception as ex:  # surface, don't crash the server
                stats.record_request(route.lstrip("/"), 0.0, error=True)
                return self._json(500, {"error": str(ex)})

        def _post_tts(self, body):
            req = json.loads(body or b"{}")
            text = req.get("text", "")
            if not text:
                return self._json(400, {"error": "missing 'text'"})
            if len(text) > self.MAX_TTS_CHARS:
                return self._json(
                    400, {"error": f"text exceeds {self.MAX_TTS_CHARS} chars"})
            try:
                steps = int(req.get("steps", e.steps))
                scale = float(req.get("cfg_scale", e.cfg_scale))
                seed = req.get("seed")
                if seed is not None:
                    seed = int(seed)
            except (TypeError, ValueError):
                return self._json(
                    400, {"error": "steps/cfg_scale/seed must be numeric"})
            steps, scale = clamp_ode(steps, scale)
            key = next_key(seed)
            t0 = time.monotonic()
            if req.get("stream"):
                # chunked streaming: audio goes out as each text
                # chunk is synthesized -> time-to-first-audio is one
                # chunk, not the whole utterance. WAV header carries
                # the unknown-length sentinel (0xFFFFFFFF sizes),
                # the streaming-WAV convention.
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.send_header("X-ODE-Steps", str(steps))
                self.send_header("X-CFG-Scale", str(scale))
                self.end_headers()

                def emit(chunk: bytes):
                    self.wfile.write(
                        f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n"
                    )

                try:
                    emit(streaming_wav_header())
                    # Streaming rides the request batcher too: chunk 0
                    # goes out ALONE (TTFA stays one small device call,
                    # plus the batch window), and once its audio is on
                    # the wire the REMAINING chunks submit together —
                    # they coalesce with each other and with concurrent
                    # traffic while the client is already playing
                    # chunk 0 (playback consumes audio far slower than
                    # the device makes it). Device work serializes in
                    # run_group_locked; socket writes happen out here
                    # where a slow client can't block anyone.
                    import numpy as np

                    from audio_calm_tpu.eval.infer import crossfade_stream

                    chunks = split_tts(text)
                    keys = tts_chunk_keys(key, len(chunks))

                    def chunk_wavs():
                        # chunk 0 rides the PRIORITY lane: it preempts
                        # the bulk queue and caps its batch (default 4),
                        # so TTFA under 8-way load is a small device
                        # call, not a seat in a mean-7.8 batch
                        # (measured 4.99 s p50 -> see BASELINE round 5)
                        yield batcher.submit(("tts", steps, scale),
                                             (chunks[0], keys[0]),
                                             priority=True).result()
                        futs = [batcher.submit(("tts", steps, scale),
                                               (c, k))
                                for c, k in zip(chunks[1:], keys[1:])]
                        for f in futs:
                            yield f.result()

                    first = True
                    for piece in crossfade_stream(
                            chunk_wavs(),
                            crossfade_ms=e.crossfade_ms):
                        if first:
                            # TTFA: the latency clients actually feel —
                            # latency-only so it never counts as a request
                            stats.record_latency(
                                "tts_stream_first_chunk",
                                time.monotonic() - t0)
                            first = False
                        piece = np.clip(piece, -1, 1)
                        emit((piece * 32767).astype("<i2").tobytes())
                    self.wfile.write(b"0\r\n\r\n")
                    stats.record_request("tts_stream",
                                         time.monotonic() - t0)
                except Exception as ex:
                    # headers are already out: abort the connection
                    # (missing chunked terminator = client sees a
                    # truncated stream) instead of corrupting the
                    # framing with a second response
                    print(f"[serve] stream aborted: {ex}",
                          file=sys.stderr)
                    stats.record_request("tts_stream", 0.0, error=True)
                    self.close_connection = True
                return
            chunks = split_tts(text)
            if len(chunks) == 1:
                # concurrent short requests coalesce into one
                # batched device program (group = same ODE
                # settings); the Future resolves off the worker
                wav = batcher.submit(("tts", steps, scale),
                                     (text, key)).result()
            else:
                # long-form: every chunk rides the SAME ("tts", steps,
                # scale) batcher group as short requests, so a long
                # text's chunks coalesce with each other AND with
                # concurrent traffic (the /asr long path's design).
                # Chunk keys are the sequential splits tts_long_stream
                # derives, so the audio equals the streaming path (and
                # CALMInference.tts_long) for the same seed.
                import numpy as np

                from audio_calm_tpu.eval.infer import crossfade_concat

                futs = [batcher.submit(("tts", steps, scale), (c, k))
                        for c, k in zip(chunks,
                                        tts_chunk_keys(key, len(chunks)))]
                wav = np.clip(crossfade_concat(
                    [f.result() for f in futs],
                    crossfade_ms=e.crossfade_ms), -1, 1)
            data = wav_bytes(wav)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("X-ODE-Steps", str(steps))
            self.send_header("X-CFG-Scale", str(scale))
            self.end_headers()
            self.wfile.write(data)
            # recorded only after the body went out: a mid-write client
            # disconnect lands in the error path alone, never both
            stats.record_request("tts", time.monotonic() - t0)

        def _post_asr(self, body):
            t0 = time.monotonic()
            try:
                x = parse_wav(body)
            except Exception:
                return self._json(400, {"error": "body must be WAV"})
            # optional ?seed=N pins this request's flow noise (same
            # contract as the /tts "seed" field)
            q = parse_qs(urlsplit(self.path).query)
            seed = q.get("seed", [None])[0]
            if seed is not None:
                try:
                    seed = int(seed)
                except ValueError:
                    return self._json(400, {"error": "seed must be an int"})
            if len(x) > self.MAX_ASR_SAMPLES:
                return self._json(413, {
                    "error": f"audio exceeds "
                             f"{self.MAX_ASR_SAMPLES // 16000} s"})
            if len(x) > max_asr_samples:
                return self._post_asr_long(x, seed, t0)
            # BOTH stages coalesce with concurrent /asr requests:
            # the wav->VAE frontend batches per wav bucket, the flow
            # decode batches per steps group (each its own batched
            # static-shape program)
            bucket, padded, n = prep_asr(x)
            lat = batcher.submit(("fe", bucket), (padded, n)).result()
            text = batcher.submit(("asr", e.asr_steps),
                                  (lat, next_key(seed))).result()
            self._json(200, {"text": text})
            # after the write: a disconnect counts as error OR success
            stats.record_request("asr", time.monotonic() - t0)

        def _post_asr_long(self, x, seed, t0):
            """Long-form /asr: wavs past the biggest bucket split at
            low-energy points; every chunk's frontend and decode goes
            through the SAME batcher groups as short requests (so chunks
            coalesce with each other AND with concurrent traffic). Chunk
            keys fold_in(base, i) match CALMInference.asr_long, so the
            transcript equals the library call with PRNGKey(seed)."""
            import jax

            from audio_calm_tpu.eval.infer import split_wav_for_asr

            chunks = [c for c in split_wav_for_asr(
                x, max_asr_samples, search_samples=16000 * 3 // 2,
            ) if len(c)]
            base = next_key(seed)
            keys = [jax.random.fold_in(base, i) for i in range(len(chunks))]
            fe = [batcher.submit(("fe", b), (p, n))
                  for b, p, n in map(prep_asr, chunks)]
            dec = [batcher.submit(("asr", e.asr_steps), (f.result(), k))
                   for f, k in zip(fe, keys)]
            texts = [d.result().strip() for d in dec]
            self._json(200, {"text": " ".join(t for t in texts if t),
                             "chunks": len(chunks)})
            stats.record_request("asr", time.monotonic() - t0)

        def _post_asr_stream(self, chunked):
            """Streaming /asr: transcribe-as-you-upload. The body (chunked
            Transfer-Encoding, or a Content-Length body read in pieces
            with ?stream=1) decodes incrementally (WavStreamParser: strict
            16 kHz PCM16 — the live-capture contract; other rates use the
            buffered endpoint), low-energy cuts fire the moment a decode
            window's audio has arrived (split_wav_for_asr_stream == the
            offline splitter chunk-for-chunk), and each chunk's frontend +
            flow decode rides the SAME batcher groups as buffered /asr —
            so streamed chunks coalesce with concurrent traffic, and the
            first transcript lands after ~one latent-budget window of
            audio instead of after the full upload. NDJSON out: one
            {"chunk": i, "text": ...} line per decode chunk, then
            {"done": true, "text": <joined>, "chunks": N}.

            Key contract == CALMInference.asr_stream / asr_long: chunk i
            of many decodes with fold_in(base, i); a single-chunk stream
            decodes with base itself — so the joined transcript equals the
            buffered /asr of the whole wav for the same seed.

            Emission granularity: completed transcripts flush when the
            next body piece arrives (and all flush at end-of-stream) — a
            live-rate uploader sees lines mid-upload; a paused uploader's
            pending lines wait for its next piece.
            """
            import jax

            from audio_calm_tpu.eval.infer import split_wav_for_asr_stream
            from audio_calm_tpu.serving.wav_stream import WavStreamParser

            t0 = time.monotonic()
            q = parse_qs(urlsplit(self.path).query)
            seed = q.get("seed", [None])[0]
            if seed is not None:
                try:
                    seed = int(seed)
                except ValueError:
                    # body not read yet -> close (keep-alive desync guard)
                    return self._json_close(
                        400, {"error": "seed must be an int"})
            base = next_key(seed)
            parser = WavStreamParser()
            state = {"sent": False, "ttft": None}

            def emit(obj):
                if not state["sent"]:
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    state["sent"] = True
                line = (json.dumps(obj) + "\n").encode()
                self.wfile.write(
                    f"{len(line):x}\r\n".encode() + line + b"\r\n")

            def body_bytes():
                """Yield raw upload bytes as they arrive."""
                if not chunked:
                    n = int(self.headers.get("Content-Length", 0))
                    if n > self.MAX_BODY_BYTES:
                        raise PayloadTooLarge("body too large")
                    while n > 0:
                        d = self.rfile.read(min(n, 1 << 16))
                        if not d:
                            raise ValueError("truncated body")
                        n -= len(d)
                        yield d
                    return
                total = 0
                while True:
                    size_line = self.rfile.readline(66)
                    if not size_line or not size_line.endswith(b"\n"):
                        raise ValueError("malformed chunked body")
                    size = int(size_line.split(b";")[0].strip() or b"0",
                               16)
                    if size == 0:
                        # trailers (if any) end at the blank line
                        while self.rfile.readline(1026) not in (
                                b"\r\n", b"\n", b""):
                            pass
                        return
                    total += size
                    if total > self.MAX_BODY_BYTES:
                        raise PayloadTooLarge("body too large")
                    left = size
                    while left:
                        d = self.rfile.read(min(left, 1 << 16))
                        if not d:
                            raise ValueError("truncated chunked body")
                        left -= len(d)
                        yield d
                    self.rfile.read(2)  # chunk-terminating CRLF

            n_samples = [0]

            def pieces():
                for raw in body_bytes():
                    # flush any completed transcripts on EVERY arriving
                    # body piece (cuts are rare; emission must not wait
                    # for the next cut — see the mid-upload test)
                    pump(block=False)
                    x = parser.feed(raw)
                    if len(x):
                        n_samples[0] += len(x)
                        if n_samples[0] > self.MAX_ASR_SAMPLES:
                            raise PayloadTooLarge(
                                f"audio exceeds "
                                f"{self.MAX_ASR_SAMPLES // 16000} s")
                        yield x

            # in-flight pipeline: [chunk_i, fe_future, key, decode_future]
            # rows; emission stays in chunk order. Device work is inside
            # batcher futures, so reading the upload overlaps both stages.
            pending = []
            texts = []

            def pump(block):
                # submit the decode for EVERY chunk whose frontend is done
                # (not just the head): in-flight chunks of a fast upload
                # coalesce in the ("asr", steps) batcher group like the
                # buffered long path; emission stays FIFO from the head
                for ent in pending:
                    if ent[3] is None and ent[1].done():
                        ent[3] = batcher.submit(
                            ("asr", e.asr_steps), (ent[1].result(), ent[2]))
                while pending:
                    ent = pending[0]
                    if ent[3] is None:
                        if not block:
                            return
                        ent[3] = batcher.submit(
                            ("asr", e.asr_steps), (ent[1].result(), ent[2]))
                    if not (block or ent[3].done()):
                        return
                    text = ent[3].result().strip()
                    if state["ttft"] is None:
                        state["ttft"] = time.monotonic() - t0
                    texts.append(text)
                    emit({"chunk": ent[0], "text": text})
                    pending.pop(0)

            i = 0
            try:
                for chunk, is_final in split_wav_for_asr_stream(
                        pieces(), max_asr_samples,
                        search_samples=16000 * 3 // 2, tagged=True):
                    if len(chunk):
                        key = (base if (is_final and i == 0)
                               else jax.random.fold_in(base, i))
                        b, p, n = prep_asr(chunk)
                        pending.append(
                            [i, batcher.submit(("fe", b), (p, n)), key,
                             None])
                        i += 1
                    pump(block=False)
                if i == 0 and not parser.in_data:
                    raise ValueError("body must be WAV")
                pump(block=True)
                emit({"done": True,
                      "text": " ".join(t for t in texts if t),
                      "chunks": i})
                self.wfile.write(b"0\r\n\r\n")
            except Exception as ex:
                if not state["sent"]:
                    stats.record_request("asr_stream", 0.0, error=True)
                    # 413 for the size caps (same contract as buffered
                    # /asr); close either way — the body is part-read
                    code = 413 if isinstance(ex, PayloadTooLarge) else 400
                    return self._json_close(code, {"error": str(ex)})
                # headers are out: abort the connection (missing chunked
                # terminator = client sees a truncated stream) instead of
                # corrupting the framing with a second response
                print(f"[serve] asr stream aborted: {ex}", file=sys.stderr)
                stats.record_request("asr_stream", 0.0, error=True)
                self.close_connection = True
                return
            if state["ttft"] is not None:
                # time-to-first-transcript: the streaming-ASR latency
                # clients feel — latency-only, never counts as a request
                stats.record_latency("asr_stream_first_text",
                                     state["ttft"])
            stats.record_request("asr_stream", time.monotonic() - t0)

    # --port 0 binds an ephemeral port; the "serving on :<port>" line is the
    # contract test harnesses parse to find it
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    port = srv.server_address[1]
    print(f"serving on :{port} (tts steps={e.steps} cfg={e.cfg_scale})",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    sys.exit(main())
