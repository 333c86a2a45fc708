#!/usr/bin/env python
"""Serving load benchmark: drive scripts/serve.py over real HTTP with
concurrent clients and report what users actually see.

The in-process bench (bench.py) measures device economics; this measures
the PRODUCT boundary: HTTP parsing, request coalescing (RequestBatcher),
the device lock, WAV encoding, and socket writes. Reported (one JSON line
on stdout; per-phase detail on stderr):

  - req_per_s            completed /tts requests per wall second
  - rtf_aggregate        seconds of audio produced per wall second across
                         all clients (the serving throughput number)
  - latency p50/p95/p99  client-observed seconds per request
  - mean_batch           mean coalesced batch size (from GET /stats) —
                         "is dynamic batching actually engaging"

No reference counterpart: the reference ships no server (SURVEY.md §7 —
its web_demo is a broken gradio stub).

Usage (spawns its own server unless --base is given):
  python scripts/bench_serve.py --config configs/calm.yaml --byte-tokenizer \
      [--cpu] [--clients 8] [--requests 3] [--max-batch 8] \
      [--override evaluation.compute_dtype=float32 ...]
  python scripts/bench_serve.py --base http://localhost:8080  # reuse server
"""

import argparse
import io
import json
import os
import re
import subprocess
import sys
import threading
import time
import urllib.request
import wave


def percentile(sorted_xs, q):
    i = min(len(sorted_xs) - 1, max(0, int(round(q * (len(sorted_xs) - 1)))))
    return sorted_xs[i]


def spawn_server(args):
    """Launch serve.py as a subprocess; return (base_url, proc, logpath)."""
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "serve.py"),
           "--config", args.config, "--port", "0",
           "--max-batch", str(args.max_batch),
           "--batch-window-ms", str(args.batch_window_ms)]
    if args.byte_tokenizer:
        cmd.append("--byte-tokenizer")
    if args.cpu:
        cmd.append("--cpu")
    if args.components:
        cmd += ["--components", args.components]
    for ov in args.override:
        cmd += ["--override", ov]
    logpath = os.path.join("/tmp", f"bench_serve_{os.getpid()}.log")
    log = open(logpath, "wb")
    t_spawn = time.monotonic()
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            start_new_session=True)
    deadline = time.monotonic() + args.startup_timeout
    port = None
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            sys.stderr.write(open(logpath).read())
            raise RuntimeError(f"serve.py exited rc={proc.returncode}")
        if port is None:
            m = re.search(rb"serving on :(\d+)", open(logpath, "rb").read())
            if m:
                port = int(m.group(1))
            else:
                time.sleep(2)
                continue
        try:
            with urllib.request.urlopen(
                f"http://localhost:{port}/health", timeout=5
            ) as r:
                if json.load(r)["status"] == "ok":
                    print(json.dumps({
                        "label": "server_cold_start",
                        "seconds": round(time.monotonic() - t_spawn, 1),
                    }), file=sys.stderr, flush=True)
                    return f"http://localhost:{port}", proc, logpath
        except Exception:
            time.sleep(2)
    proc.kill()
    raise RuntimeError(f"server not healthy in {args.startup_timeout}s "
                       f"(log: {logpath})")


def post_tts(base, text, seed, steps=None, timeout=1800):
    body = {"text": text, "seed": seed}
    if steps is not None:
        body["steps"] = steps
    req = urllib.request.Request(
        base + "/tts", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.monotonic()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        data = r.read()
    dt = time.monotonic() - t0
    with wave.open(io.BytesIO(data)) as w:
        audio_s = w.getnframes() / w.getframerate()
    return dt, audio_s


def post_tts_stream(base, text, seed, steps=None, timeout=1800):
    """POST stream:true and read the chunked WAV as it arrives.
    -> (ttfa_s, total_s, audio_s): TTFA = first PCM byte after the 44-byte
    streaming header (the latency a listening client actually feels)."""
    import http.client
    from urllib.parse import urlsplit

    u = urlsplit(base)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=timeout)
    body = {"text": text, "seed": seed, "stream": True}
    if steps is not None:
        body["steps"] = steps
    t0 = time.monotonic()
    conn.request("POST", "/tts", json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    ttfa = None
    n_bytes = 0
    while True:
        piece = r.read1(65536)  # read1: return what's arrived, don't block
        if not piece:           # for a full buffer (read() would hide TTFA)
            break
        n_bytes += len(piece)
        if ttfa is None and n_bytes > 44:
            ttfa = time.monotonic() - t0
    total = time.monotonic() - t0
    conn.close()
    audio_s = max(0, n_bytes - 44) / 2 / 16000
    return ttfa, total, audio_s


def make_asr_wav(seconds=10.0, sr=16000):
    """Deterministic sine+noise test utterance as WAV bytes."""
    import numpy as np

    t = np.arange(int(seconds * sr), dtype=np.float32) / sr
    x = 0.25 * np.sin(2 * np.pi * 440.0 * t)
    x += 0.05 * np.random.default_rng(0).standard_normal(x.shape
                                                         ).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue(), seconds


def post_asr(base, wav_data, audio_s, seed, timeout=1800):
    req = urllib.request.Request(
        f"{base}/asr?seed={seed}", data=wav_data,
        headers={"Content-Type": "audio/wav"})
    t0 = time.monotonic()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        json.load(r)
    return time.monotonic() - t0, audio_s


def post_asr_stream(base, wav_data, audio_s, seed, timeout=1800):
    """Chunked upload to streaming /asr, reading the NDJSON transcript
    stream as it arrives. -> (ttft_s, audio_s): TTFT = first transcript
    line (for a multi-chunk wav this lands while later chunks are still
    decoding — the latency a live-captioning client feels)."""
    import http.client
    from urllib.parse import urlsplit

    u = urlsplit(base)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=timeout)
    t0 = time.monotonic()
    conn.request(
        "POST", f"/asr?seed={seed}",
        body=(wav_data[i:i + 65536]
              for i in range(0, len(wav_data), 65536)),
        encode_chunked=True,
        headers={"Content-Type": "audio/wav",
                 "Transfer-Encoding": "chunked"})
    r = conn.getresponse()
    ttft = None
    saw = b""
    while True:
        piece = r.read1(65536)  # read1: what's arrived, don't block full
        if not piece:
            break
        saw += piece
        if ttft is None and b"\n" in saw:
            ttft = time.monotonic() - t0
    conn.close()
    if b'"done"' not in saw:
        raise RuntimeError("asr stream ended without a done line")
    return ttft, audio_s


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base", default=None,
                   help="reuse a running server instead of spawning one")
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", default=None)
    p.add_argument("--byte-tokenizer", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--clients", default="8",
                   help="concurrent clients; a comma list (e.g. 1,4,8,16) "
                        "sweeps counts against ONE warm server")
    p.add_argument("--requests", type=int, default=3,
                   help="timed requests per client")
    p.add_argument("--rounds", type=int, default=3,
                   help="identical timed rounds; best (min-wall) reported")
    p.add_argument("--task",
                   choices=("tts", "asr", "stream", "asr-stream"),
                   default="tts",
                   help="stream: chunked /tts (latency = time-to-first-"
                        "audio); asr-stream: chunked-upload /asr "
                        "(latency = time-to-first-transcript; default "
                        "--audio-seconds 60 -> a multi-chunk wav)")
    p.add_argument("--audio-seconds", type=float, default=None,
                   help="--task asr / asr-stream: uploaded utterance "
                        "length (default 10; asr-stream defaults to 60)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=10.0)
    p.add_argument("--steps", type=int, default=None,
                   help="override ODE steps per request (default: config)")
    p.add_argument("--text", default="The quick brown fox jumps over the "
                   "lazy dog near the riverbank at dawn.",
                   help="short text (single-chunk -> goes through the "
                   "batcher)")
    p.add_argument("--startup-timeout", type=float, default=3600,
                   help="first flagship compile through a remote tunnel "
                   "can take 10-15 min/program")
    args = p.parse_args(argv)
    args.clients = [int(c) for c in str(args.clients).split(",")]

    proc = None
    base = args.base
    if base is None:
        base, proc, logpath = spawn_server(args)

    def log2(obj):
        print(json.dumps(obj), file=sys.stderr, flush=True)

    if args.task == "asr":
        wav_data, wav_s = make_asr_wav(args.audio_seconds or 10.0)

        def do_req(seed):
            return post_asr(base, wav_data, wav_s, seed)
    elif args.task == "asr-stream":
        # per-task default resolved only when the flag is unset, so an
        # explicit --audio-seconds 10 is honored
        wav_data, wav_s = make_asr_wav(args.audio_seconds or 60.0)

        def do_req(seed):
            return post_asr_stream(base, wav_data, wav_s, seed)
    elif args.task == "stream":
        stream_text = (args.text + " ") * 6  # force multi-chunk synthesis

        def do_req(seed):
            ttfa, _total, audio_s = post_tts_stream(
                base, stream_text, seed, steps=args.steps)
            # "latency" for a stream is TTFA — what a listener feels; the
            # round wall still spans full streams, so rtf_aggregate stays
            # an end-to-end throughput number
            return ttfa, audio_s
    else:
        def do_req(seed):
            return post_tts(base, args.text, seed, steps=args.steps)

    try:
        # ---- warmup: compile every program the timed phase can hit.
        # tts_batch / asr_batch / the serving frontend / render.batch all
        # pad rows to the next power of two, so volleying each
        # power-of-two concurrency up to the max client count compiles
        # the whole bounded program matrix; a first-compile mid-phase
        # (minutes through a remote tunnel) would wreck the numbers.
        max_clients = max(args.clients)
        sizes = [1]
        while sizes[-1] < max_clients:
            sizes.append(min(sizes[-1] * 2, max_clients))
        for size in sizes:
            t0 = time.monotonic()
            errs = []
            barrier = threading.Barrier(size)

            def warm(i):
                barrier.wait()
                try:
                    do_req(seed=i)
                except Exception as ex:  # a warmup miss only costs a
                    errs.append(str(ex))  # compile inside the timed phase
            ths = [threading.Thread(target=warm, args=(i,))
                   for i in range(size)]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            log2({"label": f"warmup_batch{size}_s",
                  "seconds": round(time.monotonic() - t0, 1),
                  "errors": errs})

        # ---- timed phases: per client count, clients * requests all
        # concurrent. Run `--rounds` identical rounds (same seeds -> same
        # predicted lengths -> same bucket grids) and report the BEST
        # round: which (batch-size, grid) programs exist depends on how
        # stragglers coalesced, so an early round can still pay a
        # first-compile; steady state is the serving number, consistent
        # with bench.py's min-of-N.
        def timed_round(n_clients):
            lat, audio, lock = [], [], threading.Lock()
            barrier = threading.Barrier(n_clients)

            def client(cid):
                barrier.wait()
                for r in range(args.requests):
                    dt, a_s = do_req(seed=1000 + cid * 97 + r)
                    with lock:
                        lat.append(dt)
                        audio.append(a_s)

            ths = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
            t0 = time.monotonic()
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            return time.monotonic() - t0, lat, audio

        def get_stats():
            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                return json.load(r)

        # device batch groups record under their run_group kind, not the
        # client task name: streamed /tts chunks batch as "tts", streamed
        # /asr decodes as "asr"
        hist_kind = {"stream": "tts", "asr-stream": "asr"}.get(
            args.task, args.task)

        def task_hist(stats):
            return stats["batches"].get(hist_kind, {}).get("sizes", {})

        for n_clients in args.clients:
            best = None
            for rnd in range(args.rounds):
                # /stats is cumulative -> per-ROUND histogram delta, so
                # the reported mean_batch describes the same round the
                # latency/rtf numbers come from (not warm-up rounds)
                pre_hist = task_hist(get_stats())
                wall, lat, audio = timed_round(n_clients)
                delta = {k: v - pre_hist.get(k, 0)
                         for k, v in task_hist(get_stats()).items()
                         if v - pre_hist.get(k, 0) > 0}
                log2({"label": f"clients{n_clients}_round{rnd}",
                      "wall_s": round(wall, 3),
                      "rtf_aggregate": round(sum(audio) / wall, 1)})
                if best is None or wall < best[0]:
                    best = (wall, lat, audio, delta)
            wall, lat, audio, delta = best

            log2({"label": "server_stats", **get_stats()})
            calls = sum(delta.values())
            items = sum(int(k) * v for k, v in delta.items())
            tb = {"mean_batch": items / calls if calls else 0.0}

            s = sorted(lat)
            out = {
                "metric": f"serving_{args.task}_throughput",
                "clients": n_clients,
                "requests": len(lat),
                "wall_s": round(wall, 3),
                "req_per_s": round(len(lat) / wall, 2),
                "rtf_aggregate": round(sum(audio) / wall, 1),
                "audio_s_per_req": round(sum(audio) / len(audio), 2),
                "latency_p50_s": round(percentile(s, 0.5), 3),
                "latency_p95_s": round(percentile(s, 0.95), 3),
                "latency_p99_s": round(percentile(s, 0.99), 3),
                "mean_batch": round(tb.get("mean_batch", 0.0), 2),
            }
            if args.task == "stream":
                out["latency_is_ttfa"] = True
            if args.task == "asr-stream":
                out["latency_is_ttft"] = True
            print(json.dumps(out), flush=True)
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    sys.exit(main())
