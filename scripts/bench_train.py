"""Training-throughput bench: reproduce BASELINE.md's train-step numbers.

Runs the flagship (or a sized-down) CALM/VAE train step on synthetic
batches at a given recipe and prints one JSON line per measured geometry:

    python scripts/bench_train.py --task asr --batch 16 --microbatch 8 \
        --buckets 96,192,288,384

Timing: each step ends with a loss readback (the axon tunnel ignores
block_until_ready — BASELINE.md "Axon tunnel tax"); the reported min-step
therefore includes the ~26 ms per-dispatch tunnel floor that a production
host does not pay. FLOPs come from a scan-free microbatch=1 twin of the
step (XLA counts a lax.scan body once — utils/profiling.lowered_flops).

Two extras make BASELINE.md's throughput folds reproducible from this CLI
instead of ad hoc scripts:

* `--fold librispeech|libritts` draws a synthetic utterance-length corpus
  (lognormal durations, parameters printed in the JSON) and folds the
  measured per-bucket step times over the REAL iterator semantics
  (length_group_window sorting, bucket choice) into one samples/s number.
* `--pack ROWS,LEN,SEGS` measures the packed-ASR step
  (collator.pack_asr_window layout -> QwenCALM.forward_asr_packed) and,
  with --fold, replays the iterator's FFD window packing over the corpus
  to report true utterances/s (rows are not samples).

The reference's counterpart is the thop probe + steps/sec logs of
train_calm.py:521-567; here the whole measurement is a reproducible CLI.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=("tts", "asr", "vae", "mix"),
                   default="asr")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--microbatch", type=int, default=8)
    p.add_argument("--buckets", default="384",
                   help="comma-separated audio grid lengths to measure")
    p.add_argument("--steps", type=int, default=6,
                   help="timed steps per geometry (min is reported)")
    p.add_argument("--llm-layers", type=int, default=None,
                   help="size down the Qwen2 backbone (default: flagship 28)")
    p.add_argument("--frozen-dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--remat", default="full",
                   choices=("full", "dots", "none"),
                   help="backbone remat policy (model.remat_policy); 'none' "
                        "skips the backward recompute pass at the cost of "
                        "storing per-layer activations")
    p.add_argument("--text-pad", type=int, default=None,
                   help="LLM prompt width (asr: data.asr_text_pad recipe; "
                        "default max_text_len)")
    p.add_argument("--crop", type=int, default=256,
                   help="vae task: mel crop frames")
    p.add_argument("--pack", default=None, metavar="ROWS,LEN,SEGS",
                   help="asr sequence packing recipe, e.g. 16,512,4 "
                        "(data.asr_pack_rows/len/segments); --task mix "
                        "defaults to the shipped 16,512,4")
    p.add_argument("--pack-tts", default=None, metavar="ROWS,LEN,SEGS",
                   help="--task mix: tts packing recipe (default: the "
                        "shipped 16,256,8)")
    p.add_argument("--microbatch-tts", type=int, default=None,
                   help="--task mix: tts scan depth (default 2 = "
                        "training.tts_microbatch_steps recipe)")
    p.add_argument("--fold2", default=None, metavar="TOK0,PER_S,PROMPT",
                   help="--task mix: replay both folds under a SECOND "
                        "text-token model (e.g. the byte tokenizer's "
                        "58,3.3,76) reusing the measured step times — "
                        "step time is shape-static, so only the packing "
                        "plan changes")
    p.add_argument("--prompt-len", type=int, default=20,
                   help="packed mode: constant ASR prompt length in tokens")
    p.add_argument("--tok-model", default="13,3.3", metavar="TOK0,PER_S",
                   help="packed-TTS fold text-token model: prompt tokens = "
                        "TOK0 + PER_S * seconds (default: Qwen BPE ChatML "
                        "~13 + 3.3/s; a ByteTokenizer corpus measures ~58 + "
                        "bytes/s — make_synth_corpus.py prints its model)")
    p.add_argument("--fold", choices=("librispeech", "libritts"),
                   default=None,
                   help="fold measured step times over a synthetic "
                        "utterance-length corpus (librispeech: mean 12.8 s; "
                        "libritts: mean 5.9 s)")
    p.add_argument("--fold-n", type=int, default=20000,
                   help="corpus size for --fold")
    p.add_argument("--fold-sigma", type=float, default=0.6,
                   help="lognormal sigma for --fold durations")
    p.add_argument("--group-window", type=int, default=16,
                   help="length_group_window for the bucketed --fold "
                        "(0 = random batch order)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="smoke mode: shrink the model to toy width so the "
                        "measurement PATHS run on a 1-core CPU host "
                        "(numbers are meaningless; use for CI/refactor "
                        "checks only)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 1)
        except RuntimeError:
            # backend already initialized (e.g. under pytest, whose conftest
            # already forced the CPU platform) — keep its device setup
            pass

    import jax.numpy as jnp
    import numpy as np

    # --- fold corpus: synthetic utterance lengths (latent frames) --------
    # 384 latent frames = 24.576 s audio (BASELINE.md) -> 15.625 frames/s
    FPS = 384 / 24.576
    FOLD_MEAN_S = {"librispeech": 12.8, "libritts": 5.9}

    def fold_lengths(family=None):
        mean_s = FOLD_MEAN_S[family or args.fold]
        sig = args.fold_sigma
        # lognormal with E[dur] = mean_s before clipping
        mu = float(np.log(mean_s) - 0.5 * sig * sig)
        npr = np.random.default_rng(12345)
        dur = np.exp(npr.normal(mu, sig, args.fold_n))
        return np.clip(np.round(dur * FPS).astype(int), 8, 384)

    def fold_bucketed(lengths, B, window, buckets):
        """Replay the iterator's length-group window + bucket choice
        (collator.calm_batch_iterator) over `lengths`; returns
        ({bucket: n_batches}, n_samples)."""
        counts, n_samples, carry, i = {}, 0, [], 0
        lens = list(lengths)
        while True:
            if window > 0:
                pool, carry = carry, []
                want = B * window
                while len(pool) < want and i < len(lens):
                    pool.append(lens[i])
                    i += 1
                pool.sort()
                n_full = len(pool) - len(pool) % B
                batches = [pool[j:j + B] for j in range(0, n_full, B)]
                carry = pool[n_full:]
                if not batches:
                    break
            else:
                if i + B > len(lens):
                    break
                batches, i = [lens[i:i + B]], i + B
            for b in batches:
                t = next((k for k in buckets if k >= max(b)), buckets[-1])
                counts[t] = counts.get(t, 0) + 1
                n_samples += B
        return counts, n_samples

    def fold_packed(lengths, rows, row_len, segs, P, seg_frames):
        """Replay the iterator's FFD window packing (collator
        pack_asr_window decisions, lengths only); returns
        (n_steps, n_utterances, tokens_used)."""
        i, carry = 0, []
        lens = list(lengths)
        steps = utts = tok = 0
        while carry or i < len(lens):
            pool, carry = carry, []
            want = rows * segs
            while len(pool) < want and i < len(lens):
                pool.append(lens[i])
                i += 1
            if not pool:
                break
            caps, cnt, left = [row_len] * rows, [0] * rows, []
            for n in sorted(pool, reverse=True):
                cost = min(n, seg_frames) + 1 + P
                for r in range(rows):
                    if cnt[r] < segs and caps[r] >= cost:
                        caps[r] -= cost
                        cnt[r] += 1
                        break
                else:
                    left.append(n)
            steps += 1
            utts += len(pool) - len(left)
            tok += rows * row_len - sum(caps)
            carry = left
        return steps, utts, tok

    from audio_calm_tpu.config import TrainingConfig
    from audio_calm_tpu.utils.cache import enable_compilation_cache
    from audio_calm_tpu.utils.profiling import (device_peak_flops,
                                                lowered_flops)

    enable_compilation_cache()
    B, K = args.batch, args.microbatch
    t_cfg = TrainingConfig(per_device_train_batch_size=B,
                           microbatch_steps=K,
                           frozen_weights_dtype=args.frozen_dtype)
    peak = device_peak_flops()

    if args.task == "vae":
        from audio_calm_tpu.config import VAEModelConfig
        from audio_calm_tpu.models.vae import AcousticVAE
        from audio_calm_tpu.train.steps import (init_train_state,
                                                make_vae_step)
        from audio_calm_tpu.train.optim import (make_optimizer,
                                                partition_params,
                                                vae_param_label)

        vae = AcousticVAE(VAEModelConfig())
        rng = jax.random.PRNGKey(0)
        mel = jnp.zeros((1, args.crop, 80))
        params = vae.init({"params": rng, "noise": rng}, mel, train=True)
        flat, _ = partition_params(params["params"], vae_param_label)
        tx = make_optimizer(t_cfg, flat, vae_param_label, 1000)
        state = init_train_state(flat, tx)
        step = jax.jit(make_vae_step(vae, tx))
        npr = np.random.default_rng(0)
        batch = {"mel": jnp.asarray(
            npr.normal(size=(B, args.crop, 80)).astype(np.float32))}
        state, out = step(state, batch, rng)
        np.asarray(out["loss"])
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, out = step(state, batch, rng)
            np.asarray(out["loss"])
            times.append(time.time() - t0)
        tmin = min(times)
        print(json.dumps({
            "task": "vae", "batch": B, "crop": args.crop,
            "step_min_s": round(tmin, 4),
            "samples_per_s": round(B / tmin, 1),
        }))
        return 0

    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.flagship import cast_floating, flagship_config
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.optim import (calm_param_label, make_optimizer,
                                            partition_params)
    from audio_calm_tpu.train.steps import (init_train_state, make_calm_step,
                                            shard_step)

    pack = None
    pack_tts = None
    K_tts = args.microbatch_tts or 2
    if args.task == "mix":
        # the shipped calm.yaml mixed recipe: both streams packed, each
        # at its own measured-optimal scan depth
        pack = tuple(int(x) for x in (args.pack or "16,512,4").split(","))
        pack_tts = tuple(
            int(x) for x in (args.pack_tts or "16,256,8").split(","))
        if len(pack) != 3 or len(pack_tts) != 3:
            p.error("--pack/--pack-tts want ROWS,LEN,SEGS")
        if pack[0] % K or pack_tts[0] % K_tts:
            p.error("pack rows must divide by their task's microbatch")
    elif args.pack:
        if args.task == "vae":
            p.error("--pack requires --task asr or tts")
        pack = tuple(int(x) for x in args.pack.split(","))
        if len(pack) != 3:
            p.error("--pack wants ROWS,LEN,SEGS")
        if pack[0] % K:
            p.error(f"--pack rows {pack[0]} must be divisible by "
                    f"--microbatch {K}")

    m = flagship_config(num_llm_layers=args.llm_layers)
    m.remat_policy = args.remat
    if args.tiny:
        q = m.qwen
        q.hidden_size, q.intermediate_size = 64, 128
        q.num_attention_heads, q.num_key_value_heads = 4, 2
        q.head_dim, q.vocab_size = 16, 512
        q.num_hidden_layers = args.llm_layers or 2
        m.tts_flow_hidden_dim = m.asr_flow_hidden_dim = 64
        m.flow_num_heads = 2
    model = QwenCALM(m, dtype=jnp.bfloat16)
    print("init params...", file=sys.stderr, flush=True)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    label = lambda k: calm_param_label(k, task_mode=args.task)
    trainable, frozen = partition_params(params, label)
    del params  # keep only trainable/frozen refs (see train_calm.py)
    if args.frozen_dtype == "bfloat16":
        fp32_frozen, frozen = frozen, cast_floating(frozen, jnp.bfloat16)
        for leaf in fp32_frozen.values():
            if hasattr(leaf, "delete"):
                leaf.delete()
        del fp32_frozen
    tx = make_optimizer(t_cfg, trainable, label, 1000)
    state = init_train_state(trainable, tx)
    mesh = make_mesh()
    def build_steps(step_task, k):
        """jitted step at scan depth k (re-places state/frozen) + the
        scan-free FLOPs probe twin."""
        nonlocal state, frozen
        fn, state, frozen = shard_step(
            make_calm_step(model, tx, step_task, microbatch=k), mesh,
            state, frozen)
        return fn, make_calm_step(model, tx, step_task, microbatch=1)

    if args.task != "mix":
        step, probe = build_steps(
            f"{args.task}_packed" if pack else args.task, K)

    sd = jax.ShapeDtypeStruct
    state_sd = jax.tree.map(lambda a: sd(a.shape, a.dtype), state)
    frozen_sd = jax.tree.map(lambda a: sd(a.shape, a.dtype), frozen)

    rng = jax.random.PRNGKey(1)

    measured_timing = {}

    def retry_transient(fn, attempts=3):
        """The axon remote-compile helper occasionally drops a response
        mid-body ('response body closed before all bytes were read');
        the compile itself usually landed in the persistent cache, so a
        straight retry recovers a multi-bucket sweep instead of losing it."""
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:  # jax wraps it as JaxRuntimeError
                if i == attempts - 1 or "INTERNAL" not in str(e):
                    raise
                print(f"  transient compile/dispatch error, retrying "
                      f"({i + 1}/{attempts - 1}): {e}",
                      file=sys.stderr, flush=True)
                time.sleep(20)

    def measure_tts_packed(step, probe, pack, k_used, fold_family=None,
                           tok_model=None, reuse_timing=False):
        # Packed TTS: texts FFD-pack into LLM rows (token budget), the
        # audio/DiT side stays per-slot on the bucketed grid — so the
        # measurement is per audio bucket like the solo bucketed table,
        # with the fold replaying the collator's group-sort + bucket +
        # text-FFD decisions (collator.calm_batch_iterator tts branch).
        # reuse_timing replays the fold under a different token model with
        # the tmins already measured this run (step time is shape-static,
        # content-independent) — see --fold2.
        from audio_calm_tpu.data.collator import pack_tts_window
        from audio_calm_tpu.data.datasets import CalmExample

        nonlocal state
        rows, row_len, segs = pack
        # text-token model for synthetic corpora (--tok-model): the ChatML
        # TTS prompt wrapper (datasets.TTS_PROMPT_TEMPLATE) is ~13 Qwen BPE
        # tokens; read speech carries ~2.5 words/s x ~1.3 BPE tokens/word
        TOK0, TOK_PER_S = (float(x)
                           for x in (tok_model or args.tok_model).split(","))

        def tok_of(frames):
            return int(np.clip(np.round(TOK0 + frames / FPS * TOK_PER_S),
                               TOK0 + 1, m.max_text_len))

        buckets = sorted(int(x) for x in args.buckets.split(","))

        def fold_packed_tts(frames):
            """Replay the collator's packed-TTS decisions (window sort ->
            row-set groups -> bucket per group -> text FFD, leftovers
            carried into the next window pool)."""
            gsize = rows * segs
            window = args.group_window
            i, carry, pendings = 0, [], []
            steps_by: dict = {}
            utts = tok_used = n_groups = frames_used = frames_cap = 0
            lens = list(frames)
            while True:
                if not pendings:
                    want = gsize * max(window, 1)
                    pool, carry = carry, []
                    while len(pool) < want and i < len(lens):
                        pool.append(lens[i])
                        i += 1
                    if not pool:
                        break
                    if window > 0:
                        pool.sort()
                    pendings = [pool[j:j + gsize]
                                for j in range(0, len(pool), gsize)]
                group = pendings.pop(0)
                t_aud = next((b for b in buckets if b >= max(group)),
                             buckets[-1])
                caps, cnt, left = [row_len] * rows, [0] * rows, []
                for n in sorted(group, key=lambda x: -tok_of(x)):
                    cost = tok_of(n) + 1
                    for r in range(rows):
                        if cnt[r] < segs and caps[r] >= cost:
                            caps[r] -= cost
                            cnt[r] += 1
                            break
                    else:
                        left.append(n)
                steps_by[t_aud] = steps_by.get(t_aud, 0) + 1
                n_groups += 1
                utts += len(group) - len(left)
                tok_used += rows * row_len - sum(caps)
                frames_used += (sum(min(n, t_aud) for n in group)
                                - sum(min(n, t_aud) for n in left))
                frames_cap += rows * segs * t_aud
                carry.extend(left)
            return steps_by, utts, tok_used, n_groups, frames_used, frames_cap

        if reuse_timing:
            tmin_by = measured_timing["tts"]
            buckets_to_time = ()
        else:
            tmin_by = measured_timing["tts"] = {}
            buckets_to_time = buckets
        for t_aud in buckets_to_time:
            npr = np.random.default_rng(t_aud)
            pool = [
                CalmExample(
                    input_ids=np.ones((tok_of(n),), np.int32),
                    labels=np.zeros((0,), np.int32),
                    audio=npr.normal(size=(int(n), m.latent_dim)).astype(
                        np.float32),
                    mode="tts",
                )
                for n in npr.integers(max(t_aud // 2, 8), t_aud + 1,
                                      rows * segs)
            ]
            batch_np, _left = pack_tts_window(
                pool, rows, row_len, segs, t_aud, m.latent_dim,
                m.max_text_len)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            sd_of = lambda a: sd(a.shape, a.dtype)
            flops = lowered_flops(probe, state_sd, frozen_sd,
                                  jax.tree.map(sd_of, batch),
                                  sd((2,), jnp.uint32))
            print(f"compile tts pack rows={rows} len={row_len} segs={segs} "
                  f"t_aud={t_aud} ...", file=sys.stderr, flush=True)
            t0 = time.time()
            state, out = retry_transient(
                lambda: step(state, frozen, batch, rng))
            loss = float(np.asarray(out["loss"]))
            print(f"  compiled+ran in {time.time() - t0:.1f}s "
                  f"loss={loss:.4f}", file=sys.stderr, flush=True)
            times = []
            for _ in range(args.steps):
                t0 = time.time()
                state, out = step(state, frozen, batch, rng)
                np.asarray(out["loss"])
                times.append(time.time() - t0)
            tmin = min(times)
            tmin_by[t_aud] = tmin
            rec = {
                "task": "tts_packed", "rows": rows, "row_len": row_len,
                "segments": segs, "microbatch": k_used, "t_aud": t_aud,
                "remat": args.remat,
                "step_min_s": round(tmin, 4),
                "step_mean_s": round(sum(times) / len(times), 4),
            }
            if flops:
                rec["step_tflops"] = round(flops / 1e12, 2)
                if peak:
                    rec["mfu_pct"] = round(100 * flops / tmin / peak, 1)
            print(json.dumps(rec), flush=True)
        fold_fam = fold_family or args.fold
        if not fold_fam:
            return None
        (steps_by, utts, tok, n_groups, fr_used,
         fr_cap) = fold_packed_tts(fold_lengths(fold_fam))
        total_t = sum(n * tmin_by[b] for b, n in steps_by.items())
        rec = {
            "task": "tts_packed", "rows": rows, "row_len": row_len,
            "segments": segs, "microbatch": k_used,
            "fold": fold_fam, "fold_sigma": args.fold_sigma,
            "group_window": args.group_window,
            "tok_model": f"{TOK0}+{TOK_PER_S}/s",
            "fold_bucket_steps": {str(k): v
                                  for k, v in sorted(steps_by.items())},
            "fold_utts_per_step": round(utts / n_groups, 2),
            "fold_token_occupancy_pct": round(
                100 * tok / (n_groups * rows * row_len), 1),
            "fold_frame_occupancy_pct": round(
                100 * fr_used / max(fr_cap, 1), 1),
            "fold_samples_per_s": round(utts / total_t, 2),
            "fold_total_s": round(total_t, 2), "fold_utts": utts,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_asr_packed(step, probe, pack, k_used, fold_family=None,
                           prompt_len=None, reuse_timing=False):
        from audio_calm_tpu.data.collator import pack_asr_window
        from audio_calm_tpu.data.datasets import CalmExample

        nonlocal state
        rows, row_len, segs = pack
        P = prompt_len if prompt_len is not None else args.prompt_len
        seg_frames = m.max_audio_len
        fold_fam = fold_family or args.fold
        if reuse_timing:
            tmin, flops = measured_timing["asr"]
        else:
            lens = (fold_lengths(fold_fam) if fold_fam
                    else np.full(rows * segs, seg_frames))
            npr = np.random.default_rng(7)
            pool = [
                CalmExample(
                    input_ids=np.zeros((1,), np.int32),
                    labels=np.asarray(
                        npr.integers(1, 1000, (m.max_text_len,)), np.int32),
                    audio=npr.normal(size=(n, m.latent_dim)).astype(
                        np.float32),
                    mode="asr",
                )
                for n in lens[: rows * segs]
            ]
            prompt_ids = np.arange(1, P + 1, dtype=np.int32)
            batch_np, _left = pack_asr_window(
                pool, prompt_ids, rows, row_len, segs, seg_frames,
                m.latent_dim, m.max_text_len)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            sd_of = lambda a: sd(a.shape, a.dtype)
            flops = lowered_flops(probe, state_sd, frozen_sd,
                                  jax.tree.map(sd_of, batch),
                                  sd((2,), jnp.uint32))
            print(f"compile packed rows={rows} len={row_len} segs={segs} ...",
                  file=sys.stderr, flush=True)
            t0 = time.time()
            state, out = retry_transient(
                lambda: step(state, frozen, batch, rng))
            loss = float(np.asarray(out["loss"]))
            print(f"  compiled+ran in {time.time() - t0:.1f}s "
                  f"loss={loss:.4f}", file=sys.stderr, flush=True)
            times = []
            for _ in range(args.steps):
                t0 = time.time()
                state, out = step(state, frozen, batch, rng)
                np.asarray(out["loss"])
                times.append(time.time() - t0)
            tmin = min(times)
            measured_timing["asr"] = (tmin, flops)
        rec = {
            "task": "asr_packed", "rows": rows, "row_len": row_len,
            "segments": segs, "microbatch": k_used, "prompt_len": P,
            "remat": args.remat,
            "step_min_s": round(tmin, 4),
        }
        if not reuse_timing:
            rec["step_mean_s"] = round(sum(times) / len(times), 4)
        if flops:
            rec["step_tflops"] = round(flops / 1e12, 2)
            if peak:
                rec["mfu_pct"] = round(100 * flops / tmin / peak, 1)
        if fold_fam:
            n_steps, n_utts, tok = fold_packed(
                fold_lengths(fold_fam), rows, row_len, segs, P, seg_frames)
            rec.update({
                "fold": fold_fam, "fold_sigma": args.fold_sigma,
                "fold_utts_per_step": round(n_utts / n_steps, 2),
                "fold_token_occupancy_pct": round(
                    100 * tok / (n_steps * rows * row_len), 1),
                "fold_samples_per_s": round(
                    n_utts / (n_steps * tmin), 2),
                "fold_total_s": round(n_steps * tmin, 2),
                "fold_utts": n_utts,
            })
        print(json.dumps(rec), flush=True)
        return rec

    if pack and args.task == "tts":
        measure_tts_packed(step, probe, pack, K)
        return 0
    if pack and args.task == "asr":
        measure_asr_packed(step, probe, pack, K)
        return 0
    if args.task == "mix":
        # the shipped calm.yaml recipe benched WHOLE: both packed program
        # sets resident in one process (heads + both optimizers' state,
        # the real HBM picture), each task at its own scan depth, folded
        # over its own corpus family (ASR: LibriSpeech-like, TTS:
        # LibriTTS-like — equal utterance counts per task; task_prob only
        # shuffles interleaving order, epochs consume both corpora)
        step_a, probe_a = build_steps("asr_packed", K)
        rec_a = measure_asr_packed(step_a, probe_a, pack, K,
                                   fold_family="librispeech")
        step_t, probe_t = build_steps("tts_packed", K_tts)
        rec_t = measure_tts_packed(step_t, probe_t, pack_tts, K_tts,
                                   fold_family="libritts")

        def mix_line(ra, rt, tok_tag):
            total = ra["fold_total_s"] + rt["fold_total_s"]
            utts = ra["fold_utts"] + rt["fold_utts"]
            print(json.dumps({
                "task": "mix", "asr_pack": list(pack),
                "tts_pack": list(pack_tts),
                "microbatch_asr": K, "microbatch_tts": K_tts,
                "tok_model": tok_tag,
                "fold_n_per_task": args.fold_n,
                "asr_samples_per_s": ra["fold_samples_per_s"],
                "tts_samples_per_s": rt["fold_samples_per_s"],
                "mix_samples_per_s": round(utts / total, 2),
                "mix_time_share_asr_pct": round(
                    100 * ra["fold_total_s"] / total, 1),
            }), flush=True)

        mix_line(rec_a, rec_t,
                 f"{args.tok_model}+prompt{args.prompt_len}")
        if args.fold2:
            t0_, rate_, pl_ = args.fold2.split(",")
            rec_a2 = measure_asr_packed(
                None, None, pack, K, fold_family="librispeech",
                prompt_len=int(pl_), reuse_timing=True)
            rec_t2 = measure_tts_packed(
                None, None, pack_tts, K_tts, fold_family="libritts",
                tok_model=f"{t0_},{rate_}", reuse_timing=True)
            mix_line(rec_a2, rec_t2, f"{t0_},{rate_}+prompt{pl_}")
        return 0

    t_txt = args.text_pad or m.max_text_len
    fold_rows = []
    for t_aud in [int(x) for x in args.buckets.split(",")]:
        npr = np.random.default_rng(t_aud)
        batch = {
            "text_ids": jnp.asarray(
                npr.integers(1, 1000, (B, t_txt)), jnp.int32),
            "attention_mask": jnp.ones((B, t_txt), jnp.int32),
            "latents": jnp.asarray(
                npr.normal(size=(B, t_aud, m.latent_dim)).astype(np.float32)),
            "audio_mask": jnp.ones((B, t_aud), jnp.int32),
        }
        if args.task == "asr":
            batch["labels"] = jnp.asarray(
                npr.integers(1, 1000, (B, m.max_text_len)), jnp.int32)
        batch_sd = jax.tree.map(
            lambda a: sd(a.shape, a.dtype), batch)
        flops = lowered_flops(probe, state_sd, frozen_sd, batch_sd,
                              sd((2,), jnp.uint32))
        print(f"compile t_aud={t_aud} ...", file=sys.stderr, flush=True)
        # shard_step donates the state buffers: thread the returned state
        # through every call (reusing a donated input is an Execute error)
        t0 = time.time()
        state, out = step(state, frozen, batch, rng)
        loss = float(np.asarray(out["loss"]))
        print(f"  compiled+ran in {time.time()-t0:.1f}s loss={loss:.4f}",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, out = step(state, frozen, batch, rng)
            np.asarray(out["loss"])
            times.append(time.time() - t0)
        tmin = min(times)
        rec = {
            "task": args.task, "batch": B, "microbatch": K, "t_aud": t_aud,
            "text_pad": t_txt, "remat": args.remat,
            "step_min_s": round(tmin, 4),
            "step_mean_s": round(sum(times) / len(times), 4),
            "samples_per_s": round(B / tmin, 1),
        }
        if flops:
            rec["step_tflops"] = round(flops / 1e12, 2)
            if peak:
                rec["mfu_pct"] = round(100 * flops / tmin / peak, 1)
        print(json.dumps(rec), flush=True)
        fold_rows.append((t_aud, tmin))

    if args.fold:
        buckets = [b for b, _ in fold_rows]
        tmin_by = dict(fold_rows)
        counts, n_samples = fold_bucketed(
            fold_lengths(), B, args.group_window, buckets)
        total_t = sum(n * tmin_by[b] for b, n in counts.items())
        print(json.dumps({
            "task": args.task, "batch": B, "microbatch": K,
            "fold": args.fold, "fold_sigma": args.fold_sigma,
            "group_window": args.group_window,
            "fold_bucket_batches": {str(k): v
                                    for k, v in sorted(counts.items())},
            "fold_samples_per_s": round(n_samples / total_t, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
