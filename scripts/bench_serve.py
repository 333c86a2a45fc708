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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base", default=None,
                   help="reuse a running server instead of spawning one")
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--components", default=None)
    p.add_argument("--byte-tokenizer", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=3,
                   help="timed requests per client")
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

    proc = None
    base = args.base
    if base is None:
        base, proc, logpath = spawn_server(args)

    def log2(obj):
        print(json.dumps(obj), file=sys.stderr, flush=True)

    try:
        # ---- warmup: compile every program the timed phase will hit.
        # One solo request (B=1 padded program + render), then one
        # full-concurrency volley (B=clients padded program). Through a
        # remote tunnel each first-compile is minutes; keep them out of
        # the timed phase.
        t0 = time.monotonic()
        post_tts(base, args.text, seed=0, steps=args.steps)
        log2({"label": "warmup_solo_s",
              "seconds": round(time.monotonic() - t0, 1)})
        t0 = time.monotonic()
        errs = []
        ths = []
        barrier = threading.Barrier(args.clients)

        def warm(i):
            barrier.wait()
            try:
                post_tts(base, args.text, seed=i, steps=args.steps)
            except Exception as ex:  # collected; a warmup miss only costs
                errs.append(str(ex))  # a compile inside the timed phase
        for i in range(args.clients):
            th = threading.Thread(target=warm, args=(i,))
            th.start()
            ths.append(th)
        for th in ths:
            th.join()
        log2({"label": "warmup_batch_s",
              "seconds": round(time.monotonic() - t0, 1),
              "errors": errs})

        # ---- timed phase: clients * requests, all concurrent
        lat, audio, lock = [], [], threading.Lock()
        barrier = threading.Barrier(args.clients)

        def client(cid):
            barrier.wait()
            for r in range(args.requests):
                dt, a_s = post_tts(base, args.text,
                                   seed=1000 + cid * 97 + r,
                                   steps=args.steps)
                with lock:
                    lat.append(dt)
                    audio.append(a_s)

        ths = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
        t0 = time.monotonic()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        wall = time.monotonic() - t0

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.load(r)
        log2({"label": "server_stats", **stats})

        s = sorted(lat)
        tb = stats["batches"].get("tts", {})
        out = {
            "metric": "serving_tts_throughput",
            "clients": args.clients,
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
