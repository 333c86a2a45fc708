#!/usr/bin/env python
"""Distill a trained CALM flow head into a few-step student.

  python scripts/distill_calm.py --config configs/tts.yaml \
      --components outputs/checkpoints/tts/components \
      [--task tts] [--student-steps 4] [--teacher-substeps 8] \
      [--cfg-scale 2.5] [--max-steps 2000] [--cpu]

Beyond reference (the reference always pays 50 Euler steps x 2 CFG passes
per synthesis, eval/eval_calm.py:140-164). The student is the SAME head
architecture trained so K conditional Euler steps reproduce the teacher's
classifier-free-GUIDED trajectory (train/distill.py): serve the result with

  evaluation.ode_method: euler
  evaluation.steps: K          # --student-steps
  evaluation.cfg_scale: 1.0    # guidance is baked into the student

TTS distillation is data-free w.r.t. audio: it consumes only the text
prompts of the configured dataset (plus fresh noise); ASR distillation
uses the audio latents. The distilled components save in the standard
layout, so eval_calm/serve/web_demo and the reference exporters work
unchanged.
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/tts.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--task", choices=("tts", "asr"), default="tts")
    p.add_argument("--student-steps", type=int, default=4)
    p.add_argument("--teacher-substeps", type=int, default=8)
    p.add_argument("--cfg-scale", type=float, default=None,
                   help="teacher guidance scale to bake in (default: the "
                        "config's evaluation cfg scale for the task)")
    p.add_argument("--components", default=None,
                   help="trained component dir (orbax layout from "
                        "train_calm.py); default: model.pretrained_* paths")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--perturb-teacher", type=float, default=None,
                   metavar="SIGMA",
                   help="add N(0, SIGMA) to every float leaf of the task "
                        "head before distilling — for WEIGHTLESS harness "
                        "runs only: an untrained DiT head is degenerate "
                        "(zero-init out_proj + AdaLN gates -> near-zero "
                        "field) and distills trivially to 0 loss")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--byte-tokenizer", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.distributed:
        from audio_calm_tpu.parallel.mesh import init_distributed_from_env

        init_distributed_from_env()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from audio_calm_tpu.config import CALMConfig, load_config
    from audio_calm_tpu.data.collator import calm_batch_iterator
    from audio_calm_tpu.data.datasets import CalmDataset
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
    from audio_calm_tpu.models.convert import (
        convert_qwen2, load_hf_dir_state_dict, merge_params,
    )
    from audio_calm_tpu.parallel.mesh import make_mesh
    from audio_calm_tpu.train.checkpoint import (
        COMPONENTS, save_components, soft_restart,
    )
    from audio_calm_tpu.train.distill import (
        distill_param_label, make_distill_step, split_for_distill,
    )
    from audio_calm_tpu.train.loop import run_training
    from audio_calm_tpu.train.optim import make_optimizer, merge_partitions
    from audio_calm_tpu.train.steps import init_train_state, shard_step

    cfg = load_config(args.config, cls=CALMConfig, overrides=args.override)
    t, d, m, e = cfg.training, cfg.data, cfg.model, cfg.evaluation
    task = args.task
    cfg_scale = args.cfg_scale if args.cfg_scale is not None else (
        e.cfg_scale if task == "tts" else e.asr_cfg_scale
    )

    from audio_calm_tpu.data.tokenizer import load_tokenizer

    try:
        tokenizer = load_tokenizer(m, byte_fallback=args.byte_tokenizer)
    except Exception as exc:
        print(f"error: tokenizer load failed ({exc}); set "
              "model.tokenizer_path to a .tiktoken rank file or pass "
              "--byte-tokenizer for a tokenizer-less smoke run",
              file=sys.stderr)
        return 1

    asr = d.datasets.get("asr")
    tts = d.datasets.get("tts")
    ds = CalmDataset(
        tokenizer,
        asr_latent_dir=(asr.latent_dir if asr and task == "asr" else None),
        asr_subsets=asr.subsets if asr else None,
        tts_latent_dir=(tts.latent_dir if tts and task == "tts" else None),
        tts_subsets=tts.subsets if tts else None,
        max_text_len=d.max_text_len,
        max_audio_len=d.max_audio_len,
        task_mode=task,
        latent_dim=m.latent_dim,
    )
    if len(ds) == 0:
        print("no data found for the distillation task", file=sys.stderr)
        return 1

    model = QwenCALM(m, dtype=jnp.bfloat16 if t.bf16 else jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(t.seed))
    if m.qwen_path and os.path.isdir(m.qwen_path):
        try:
            sd = load_hf_dir_state_dict(m.qwen_path)
            conv = convert_qwen2(sd, m.qwen)
            params["embed"] = merge_params(params["embed"], conv["embed"])
            params["llm"] = merge_params(params["llm"], conv["model"])
            print("loaded Qwen2 backbone weights")
        except Exception as exc:
            print(f"warning: Qwen2 weight load failed: {exc}; random init")

    # the TEACHER must be a trained model: load its components
    if args.components and os.path.isdir(args.components):
        params = soft_restart(
            params, {c: args.components for c in COMPONENTS + ("lora",)}
        )
        print(f"loaded teacher components from {args.components}")
    else:
        params = soft_restart(params, {
            "input_proj": m.pretrained_projector_path,
            "tts_flow_head": m.pretrained_tts_head_path,
            "tts_len_predictor": m.pretrained_tts_len_pred_path,
            "asr_flow_head": m.pretrained_asr_head_path,
            "asr_query_embed": m.pretrained_asr_query_path,
            "lora": m.pretrained_lora_path,
        })

    if args.perturb_teacher:
        import numpy as np

        head = f"{task}_flow_head"
        npr = np.random.default_rng(0)

        def _noise(tree):
            if isinstance(tree, dict):
                return {k: _noise(v) for k, v in tree.items()}
            arr = np.asarray(tree)
            if not np.issubdtype(arr.dtype, np.floating):
                return tree
            return jnp.asarray(
                arr + npr.normal(0, args.perturb_teacher,
                                 arr.shape).astype(arr.dtype))

        params[head] = _noise(params[head])
        print(f"teacher {head} perturbed with sigma="
              f"{args.perturb_teacher} (weightless-harness mode)")

    # isolate the distill run under its own output root: its train state
    # (head-only) is structurally different from a train_calm run's, so
    # sharing training.output_dir would make checkpoint resume/restore
    # read incompatible trees
    import dataclasses

    out_root = os.path.join(t.output_dir, f"distill_{task}")
    t = dataclasses.replace(t, output_dir=out_root,
                            run_name=f"{t.run_name}_distill_{task}")

    mesh = make_mesh()
    global_bs = t.per_device_train_batch_size * mesh.shape["data"]
    total_steps = args.max_steps or (
        t.max_steps if t.max_steps > 0 else 2000
    )

    trainable, frozen_wt = split_for_distill(params, task)
    label = lambda k: distill_param_label(k, task)
    n_train = sum(v.size for v in trainable.values())
    print(f"distilling {task} head ({n_train/1e6:.2f}M params) to "
          f"{args.student_steps} steps, teacher cfg={cfg_scale} x "
          f"{args.teacher_substeps} substeps | steps: {total_steps} | "
          f"global batch: {global_bs} | mesh: {dict(mesh.shape)}")

    tx = make_optimizer(t, trainable, label, total_steps)
    state = init_train_state(trainable, tx)
    step, state, frozen_wt = shard_step(
        make_distill_step(
            model, tx, task, student_steps=args.student_steps,
            cfg_scale=cfg_scale, teacher_substeps=args.teacher_substeps,
        ),
        mesh, state, frozen_wt,
    )

    n_proc = jax.process_count()
    keep = (("text_ids", "attention_mask") if task == "tts"
            else ("text_ids", "attention_mask", "latents", "audio_mask"))

    def batch_filter(batch):
        out = {k: batch[k] for k in keep}
        if n_proc > 1:
            from audio_calm_tpu.parallel.mesh import shard_host_batch

            return shard_host_batch(out, mesh)
        return {k: jnp.asarray(v) for k, v in out.items()}

    from audio_calm_tpu.data.prefetch import prefetch

    def batches(start_step: int):
        return prefetch(calm_batch_iterator(
            ds, global_bs, tokenizer.pad_token_id or 0, m.latent_dim,
            task_prob_tts=1.0 if task == "tts" else 0.0, training=True,
            seed=t.seed + 1_000_003 * start_step,
            process_index=jax.process_index(), process_count=n_proc,
        ))

    state = run_training(
        step, state, batches, t, total_steps, jax.random.PRNGKey(t.seed),
        frozen=frozen_wt, batch_filter=batch_filter,
    )

    # the student head shadows the teacher in the merge -> standard layout
    final = merge_partitions(state.trainable, frozen_wt)

    # measured before/after on one held-out batch (same methodology as
    # BASELINE.md "Few-step distillation" / tests/test_distill.py)
    if n_proc == 1:
        import json

        from audio_calm_tpu.train.distill import quality_probe

        raw = next(iter(calm_batch_iterator(
            ds, min(global_bs, 4), tokenizer.pad_token_id or 0, m.latent_dim,
            task_prob_tts=1.0 if task == "tts" else 0.0, training=False,
            seed=t.seed + 1, epochs=1,
        )))
        pb = {k: jnp.asarray(raw[k]) for k in keep}
        teacher_tree = merge_partitions({}, frozen_wt)
        probe = quality_probe(model, teacher_tree, final, pb, task,
                              args.student_steps, cfg_scale)
        print(f"quality probe (teacher-dense reference): "
              f"{json.dumps(probe)}")

    out_dir = os.path.join(out_root, "components")
    save_components(final, out_dir)
    print(f"saved distilled components to {out_dir}")
    print(f"serve with: evaluation.ode_method=euler "
          f"evaluation.steps={args.student_steps} evaluation.cfg_scale=1.0"
          if task == "tts" else
          f"serve with: evaluation.ode_method=euler "
          f"evaluation.asr_steps={args.student_steps} "
          f"evaluation.asr_cfg_scale=1.0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
