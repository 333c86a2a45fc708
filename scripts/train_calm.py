#!/usr/bin/env python
"""Train QwenCALM (reference train/train_calm.py equivalent).

  python scripts/train_calm.py --config configs/tts.yaml \
      [--override training.learning_rate=1e-4 ...] [--cpu]

Loads the Qwen2 backbone from HF weights at model.qwen_path if present
(otherwise random init — useful for pipeline smoke tests), applies the
component soft restart, and trains with task-homogeneous batches.
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/calm.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize from env "
                        "(JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID); "
                        "all processes must share training.output_dir "
                        "(orbax coordinates checkpoint writes)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--byte-tokenizer", action="store_true",
                   help="use the byte fallback tokenizer (smoke tests)")
    args = p.parse_args(argv)

    import jax

    if args.distributed:
        from audio_calm_tpu.parallel.mesh import init_distributed_from_env

        init_distributed_from_env()  # JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    import numpy as np

    from audio_calm_tpu.config import CALMConfig, load_config
    from audio_calm_tpu.data.collator import calm_batch_iterator
    from audio_calm_tpu.data.datasets import CalmDataset
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.convert import (
        convert_qwen2, load_hf_dir_state_dict, merge_params,
    )
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.checkpoint import save_components, soft_restart
    from audio_calm_tpu.train.loop import run_training
    from audio_calm_tpu.train.optim import (
        calm_param_label, make_optimizer, partition_params,
    )
    from audio_calm_tpu.train.steps import (
        init_train_state, make_calm_step, shard_step,
    )

    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    t, d, m = cfg.training, cfg.data, cfg.model

    # tokenizer
    from audio_calm_tpu.data.tokenizer import load_tokenizer

    try:
        tokenizer = load_tokenizer(m, byte_fallback=args.byte_tokenizer)
    except Exception as e:
        print(f"error: tokenizer load failed ({e}); set "
              "model.tokenizer_path to a .tiktoken rank file or pass "
              "--byte-tokenizer for a tokenizer-less smoke run",
              file=sys.stderr)
        return 1

    asr = d.datasets.get("asr")
    tts = d.datasets.get("tts")
    ds = CalmDataset(
        tokenizer,
        asr_latent_dir=asr.latent_dir if asr else None,
        asr_subsets=asr.subsets if asr else None,
        tts_latent_dir=tts.latent_dir if tts else None,
        tts_subsets=tts.subsets if tts else None,
        max_text_len=d.max_text_len,
        max_audio_len=d.max_audio_len,
        task_mode=d.task_mode,
        latent_dim=m.latent_dim,
    )
    n_items = len(ds)
    if n_items == 0:
        print("no training data found", file=sys.stderr)
        return 1
    print(f"dataset: {len(ds.tts_items)} tts + {len(ds.asr_items)} asr items")

    model = QwenCALM(m, dtype=jnp.bfloat16 if t.bf16 else jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(t.seed))

    # load Qwen2 backbone weights when available
    if m.qwen_path and os.path.isdir(m.qwen_path):
        try:
            sd = load_hf_dir_state_dict(m.qwen_path)
            conv = convert_qwen2(sd, m.qwen)
            params["embed"] = merge_params(params["embed"], conv["embed"])
            params["llm"] = merge_params(params["llm"], conv["model"])
            print("loaded Qwen2 backbone weights")
        except Exception as e:
            print(f"warning: Qwen2 weight load failed: {e}; random init")

    # soft restart (stage-2 warm start)
    params = soft_restart(params, {
        "input_proj": m.pretrained_projector_path,
        "tts_flow_head": m.pretrained_tts_head_path,
        "tts_len_predictor": m.pretrained_tts_len_pred_path,
        "asr_flow_head": m.pretrained_asr_head_path,
        "asr_query_embed": m.pretrained_asr_query_path,
        "lora": m.pretrained_lora_path,
    })

    mesh = make_mesh()
    global_bs = t.per_device_train_batch_size * mesh.shape["data"]
    steps_per_epoch = max(n_items // global_bs, 1)
    total_steps = args.max_steps or int(steps_per_epoch * t.num_train_epochs)

    n_proc = jax.process_count()

    # sequence packing replaces the bucketed programs. Multi-host it stays
    # on when every process can derive the shared pack plan from metadata
    # (header-readable store) and rows shard evenly — this mirrors the
    # collator's own gate exactly, so the step program set matches the
    # batches the iterator will emit
    def _pack_on(task, rows):
        if rows <= 0:
            return False
        if n_proc == 1:
            return True
        on = rows % n_proc == 0 and ds.supports_meta(task)
        if not on:
            print(f"WARNING: multi-host {task} packing disabled "
                  f"(no header-readable store metadata or rows%{n_proc}!=0)"
                  " — plain batches lose the packed-throughput wins; for "
                  ".pt corpora run scripts/convert_store.py once",
                  file=sys.stderr)
        return on

    pack_asr = _pack_on("asr", d.asr_pack_rows)
    pack_tts = _pack_on("tts", d.tts_pack_rows)
    # per-task scan depth: tts/asr are separate jit programs (BASELINE.md
    # "Microbatch depth under packed TTS": the ASR-driven k=8 costs TTS
    # +9.6% at t_aud=96 vs its own optimum k=2)
    k_of = {
        "tts": t.tts_microbatch_steps or t.microbatch_steps,
        "asr": t.asr_microbatch_steps or t.microbatch_steps,
    }
    for name, rows, on in (("asr", d.asr_pack_rows, pack_asr),
                           ("tts", d.tts_pack_rows, pack_tts)):
        need = mesh.shape["data"] * max(k_of[name], 1)
        if on and rows % need:
            raise ValueError(
                f"data.{name}_pack_rows={rows} must be divisible "
                f"by data devices x microbatch_steps = {need}"
            )

    # a packed step consumes ~rows x fill x row_len/mean_cost utterances,
    # not global_bs: size the LR schedule from a sampled-cost estimate and
    # make the STOP exact by bounding the iterator at num_train_epochs
    # passes (run_training stops on iterator exhaustion; the step cap gets
    # 25% headroom so estimate error never truncates the last epoch)
    epochs_arg = None
    loop_cap = total_steps
    if not args.max_steps and (pack_asr or pack_tts):
        from audio_calm_tpu.data.collator import (
            estimate_packed_steps_per_epoch,
        )

        spe = 0
        for task in ("tts", "asr"):
            if d.task_mode not in (task, "mix"):
                continue
            n_task = len(ds.tts_items if task == "tts" else ds.asr_items)
            if n_task == 0:
                continue
            packed_on = pack_tts if task == "tts" else pack_asr
            if packed_on:
                rows, rl, segs = (
                    (d.tts_pack_rows, d.tts_pack_len, d.tts_pack_segments)
                    if task == "tts"
                    else (d.asr_pack_rows, d.asr_pack_len,
                          d.asr_pack_segments)
                )
                # measured FFD fill factors (BASELINE.md): ASR rows pack
                # to 97% token occupancy, TTS to 87% (length-sorted
                # groups strand near-equal residuals in every row)
                spe += estimate_packed_steps_per_epoch(
                    ds, task, rows, rl, segs,
                    fill=0.87 if task == "tts" else 0.95)
            else:
                spe += max(n_task // global_bs, 1)
        total_steps = max(int(np.ceil(spe * t.num_train_epochs)), 1)
        epochs_arg = max(int(np.ceil(t.num_train_epochs)), 1)
        loop_cap = int(np.ceil(total_steps * 1.25))
        print(f"packing: ~{spe} steps/epoch (sampled-cost estimate) -> "
              f"LR schedule over {total_steps} steps; stop after "
              f"{epochs_arg} exact epochs (cap {loop_cap})")

    label = lambda k: calm_param_label(
        k, task_mode=d.task_mode, freeze_projector=m.freeze_projector
    )
    trainable, frozen = partition_params(params, label)
    # drop the assembled tree: trainable/frozen hold the live references,
    # and keeping `params` alive would pin the fp32 frozen masters in HBM
    # for the whole run after the bf16 cast below (~6.2 GB on the flagship)
    del params
    if t.frozen_weights_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"unknown frozen_weights_dtype {t.frozen_weights_dtype!r}")
    if t.frozen_weights_dtype == "bfloat16":
        from audio_calm_tpu.models.flagship import cast_floating

        fp32_frozen, frozen = frozen, cast_floating(frozen, jnp.bfloat16)
        # free the fp32 copies NOW (jax buffers release on refcount zero;
        # without this the cast only ADDS 3.1 GB instead of halving)
        for leaf in fp32_frozen.values():
            if hasattr(leaf, "delete"):
                leaf.delete()
        del fp32_frozen
        print("frozen params stored bf16 (halves frozen-base HBM)")
    n_train = sum(v.size for v in trainable.values())
    n_froz = sum(v.size for v in frozen.values())
    print(f"trainable: {n_train/1e6:.2f}M | frozen: {n_froz/1e6:.2f}M | "
          f"steps: {total_steps} | global batch: {global_bs} | "
          f"mesh: {dict(mesh.shape)}")

    tx = make_optimizer(t, trainable, label, total_steps)
    state = init_train_state(trainable, tx)

    steps = {}
    for task in ("tts", "asr"):
        if d.task_mode in (task, "mix"):
            step_task = task
            if task == "asr" and pack_asr:
                step_task = "asr_packed"
            elif task == "tts" and pack_tts:
                step_task = "tts_packed"
            fn, state, frozen = shard_step(
                make_calm_step(model, tx, step_task,
                               microbatch=k_of[task]),
                mesh, state, frozen,
            )
            steps[step_task] = fn

    def step_selector(batch):
        return steps[batch["task"]]

    # FLOPs probe (reference train_calm.py:521-567 thop probe, made exact):
    # lower a scan-free microbatch=1 twin of each task step — XLA counts a
    # lax.scan body once, so the k-microbatch step itself undercounts — and
    # feed per-batch FLOPs to the loop for achieved-MFU logging. Lowering
    # never compiles or executes, so the full-batch geometry can't OOM.
    from audio_calm_tpu.utils.profiling import device_peak_flops, lowered_flops

    state_sd = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    frozen_sd = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), frozen)
    rng_sd = jax.ShapeDtypeStruct((2,), jnp.uint32)
    probe_steps = {task: make_calm_step(model, tx, task, microbatch=1)
                   for task in steps}
    _flops_cache = {}

    def _device_arrays(batch):
        out = {k: v for k, v in batch.items()
               if k not in ("task", "n_samples")}
        if batch["task"] == "tts":
            out.pop("labels", None)
        return out

    def step_flops(batch):
        task = batch["task"]
        arrs = _device_arrays(batch)
        key = (task,) + tuple(
            sorted((k, tuple(np.shape(v))) for k, v in arrs.items()))
        if key not in _flops_cache:
            sd = {k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
                  for k, v in arrs.items()}
            _flops_cache[key] = lowered_flops(
                probe_steps[task], state_sd, frozen_sd, sd, rng_sd)
        return _flops_cache[key]

    def _fake_max_batch(task):
        B, L, t_aud = global_bs, d.max_text_len, d.max_audio_len
        if task == "asr_packed":
            R, T, S = d.asr_pack_rows, d.asr_pack_len, d.asr_pack_segments
            i32, f32 = np.int32, np.float32
            return dict(
                task=task,
                latents=np.zeros((R, S, t_aud, m.latent_dim), f32),
                latent_mask=np.zeros((R, S, t_aud), i32),
                labels=np.zeros((R, S, L), i32),
                tok_ids=np.zeros((R, T), i32),
                kind=np.zeros((R, T), i32),
                gather_idx=np.zeros((R, T), i32),
                segment_ids=np.zeros((R, T), i32),
                position_ids=np.zeros((R, T), i32),
                ctx_idx=np.zeros((R, S, t_aud), i32),
            )
        if task == "tts_packed":
            R, T, S = d.tts_pack_rows, d.tts_pack_len, d.tts_pack_segments
            i32, f32 = np.int32, np.float32
            return dict(
                task=task,
                latents=np.zeros((R, S, t_aud, m.latent_dim), f32),
                audio_mask=np.zeros((R, S, t_aud), i32),
                text_mask=np.ones((R, S, L), i32),
                tok_ids=np.zeros((R, T), i32),
                kind=np.zeros((R, T), i32),
                segment_ids=np.zeros((R, T), i32),
                position_ids=np.zeros((R, T), i32),
                ctx_idx=np.zeros((R, S, L), i32),
                soa_idx=np.zeros((R, S), i32),
            )
        return dict(
            task=task,
            text_ids=np.zeros((B, L), np.int32),
            attention_mask=np.zeros((B, L), np.int32),
            latents=np.zeros((B, t_aud, m.latent_dim), np.float32),
            audio_mask=np.zeros((B, t_aud), np.int32),
            labels=np.zeros((B, L), np.int32),
        )

    peak = device_peak_flops()
    for task in steps:
        fl = step_flops(_fake_max_batch(task))
        line = (f"{task} step: {fl / 1e12:.2f} TFLOPs at max grid"
                if fl >= 1e11 else
                f"{task} step: {fl / 1e9:.2f} GFLOPs at max grid")
        if peak:
            line += (f" ({fl / peak * 1e3:.1f} ms at {peak / 1e12:.0f}"
                     " TFLOP/s peak)")
        print(line)

    def batch_filter(batch):
        out = _device_arrays(batch)
        if n_proc > 1:
            # per-process shards -> global arrays on the data axis
            from audio_calm_tpu.parallel.mesh import shard_host_batch

            return shard_host_batch(out, mesh)
        return {k: jnp.asarray(v) for k, v in out.items()}

    # periodic eval over the held-out latent store (reference eval_steps)
    eval_fn = None
    eval_dirs = {
        task: dd.eval_latent_dir
        for task, dd in d.datasets.items()
        if dd and dd.eval_latent_dir
    }
    if eval_dirs:
        from audio_calm_tpu.train.steps import make_calm_eval_step

        eval_ds = CalmDataset(
            tokenizer,
            asr_latent_dir=eval_dirs.get("asr"),
            asr_subsets=d.eval_subsets,
            tts_latent_dir=eval_dirs.get("tts"),
            tts_subsets=d.eval_subsets,
            max_text_len=d.max_text_len,
            max_audio_len=d.max_audio_len,
            task_mode=d.task_mode,
            latent_dim=m.latent_dim,
        )
        if len(eval_ds):
            # eval always runs the unpacked forward (batches come from the
            # plain iterator below), so map *_packed -> solo task
            eval_steps = {
                task: jax.jit(make_calm_eval_step(model, task))
                for task in {s.removesuffix("_packed") for s in steps}
            }

            def eval_fn(state):
                losses = []
                eval_bs = min(global_bs, 8 * n_proc)
                it = calm_batch_iterator(
                    eval_ds, eval_bs, tokenizer.pad_token_id or 0,
                    m.latent_dim, task_prob_tts=d.task_prob_tts,
                    training=False, seed=0, epochs=1,
                    asr_text_pad=d.asr_text_pad,
                    process_index=jax.process_index(), process_count=n_proc,
                )
                for i, b in enumerate(it):
                    if i >= 8:
                        break
                    task = b["task"]
                    fb = batch_filter(b)
                    out = eval_steps[task](
                        state.trainable, frozen, fb, jax.random.PRNGKey(i)
                    )
                    losses.append(float(out["loss"]))
                return {"loss": sum(losses) / len(losses)} if losses else {}

    from audio_calm_tpu.data.prefetch import prefetch

    def batches(start_step: int):
        # fold the resume step into the sampler seed so a resumed run does
        # not replay the epoch head (VERDICT: reference HF default skips
        # consumed batches; our samplers are infinite, so reseed instead)
        return prefetch(calm_batch_iterator(
            ds, global_bs, tokenizer.pad_token_id or 0, m.latent_dim,
            task_prob_tts=d.task_prob_tts, training=True,
            seed=t.seed + 1_000_003 * start_step,
            # packed runs stop on exact epoch exhaustion (the step count
            # per epoch is data-dependent); a resumed run gets up to
            # epochs_arg more passes, still bounded by the step cap
            epochs=epochs_arg,
            audio_buckets=d.audio_buckets,
            length_group_window=d.length_group_window,
            asr_text_pad=d.asr_text_pad,
            asr_pack_rows=d.asr_pack_rows if pack_asr else 0,
            asr_pack_len=d.asr_pack_len,
            asr_pack_segments=d.asr_pack_segments,
            tts_pack_rows=d.tts_pack_rows if pack_tts else 0,
            tts_pack_len=d.tts_pack_len,
            tts_pack_segments=d.tts_pack_segments,
            process_index=jax.process_index(), process_count=n_proc,
        ))

    state = run_training(
        None, state, batches, t, loop_cap, jax.random.PRNGKey(t.seed),
        frozen=frozen, step_selector=step_selector, batch_filter=batch_filter,
        eval_fn=eval_fn, step_flops=step_flops,
    )

    # component-sharded export for eval / soft restart
    from audio_calm_tpu.train.optim import merge_partitions

    final = merge_partitions(state.trainable, frozen)
    save_components(final, os.path.join(t.output_dir, "components"))
    print(f"saved components to {t.output_dir}/components")
    return 0


if __name__ == "__main__":
    sys.exit(main())
