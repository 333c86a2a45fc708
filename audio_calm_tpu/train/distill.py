"""Few-step ODE distillation: K conditional Euler steps replace the
reference's 50-step x 2-pass CFG integration.

Beyond reference (the reference always integrates the guided field with 50
Euler steps and two head passes per step, eval/eval_calm.py:140-164,
507-520); BASELINE.md names "fewer ODE steps via distillation" as the
remaining algorithmic serving lever after midpoint-12.

Design — on-policy trajectory distillation:
  - The student is the SAME flow-head architecture (no new parameters), so
    checkpoints, converters, export and every serving path work unchanged;
    only the weights move. A distilled head is served with
    `ode_method: euler`, `steps: K`, `cfg_scale: 1.0`.
  - Two compressions at once:
      step count  : 50 (reference) -> K (4-8) velocity evaluations
      CFG baking  : the student's CONDITIONAL field learns the teacher's
                    classifier-free-GUIDED field, so inference drops the 2x
                    unconditional batch entirely (cfg_scale=1.0)
  - x_t comes from the student's OWN K-step rollout (stop-gradient), not
    from the forward marginal: the student is supervised exactly at the
    states it will visit at inference (DAgger-style), which is what lets
    K=4 work in one round instead of progressive halving.
  - The teacher target for interval [t, t+1/K] is its guided field
    integrated with `teacher_substeps` fine Euler steps; the student's
    velocity at t regresses the interval-mean velocity
    (x_teacher(t+1/K) - x_t) * K.
  - Conditioning runs the INFERENCE path (predicted length + durations ->
    alignment -> condition; eval/infer.tts_condition), again so train-time
    states match serving exactly. TTS distillation is therefore DATA-FREE:
    it needs only text prompts and noise.

Plumbing: the teacher is literally the frozen copy of the head — callers
build `frozen_with_teacher = {**frozen, **trainable}` (the student copy in
`trainable` shadows it inside merge_partitions), so `shard_step`, the
training loop, checkpointing and TP shardings all work unchanged.

Measured evidence: tests/test_distill.py distills a tiny trained TTS flow
and verifies the 4-eval student beats the 4-step guided teacher by a wide
margin (table in BASELINE.md "Few-step distillation").
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.train.optim import merge_partitions
from audio_calm_tpu.train.steps import TrainState


def distill_param_label(path: Tuple[str, ...], task: str = "tts") -> str:
    """Only the task's flow head trains during distillation; everything
    else (LLM, LoRA, projector, predictors, the OTHER head) is frozen —
    the conditioning pipeline must stay bit-identical to the teacher's."""
    head = "tts_flow_head" if task == "tts" else "asr_flow_head"
    return "head" if path[0] == head else "frozen"


def split_for_distill(full_params, task: str = "tts"):
    """full trained params -> (student_trainable, frozen_with_teacher).

    student_trainable is a DETACHED copy of the head (shard_step donates
    the train state, so the student must not alias the caller's tree or
    the teacher); frozen_with_teacher keeps the original head params at
    their natural paths as the teacher."""
    from audio_calm_tpu.train.optim import partition_params

    trainable, frozen = partition_params(
        full_params, lambda k: distill_param_label(k, task)
    )
    student = {k: jnp.array(v) for k, v in trainable.items()}
    return student, {**frozen, **trainable}


def quality_probe(model, teacher_full, student_full, batch, task: str,
                  student_steps: int, cfg_scale: float,
                  dense_steps: int = 128) -> dict:
    """Post-distillation quality probe on one batch (host-side).

    TTS -> {"rel_err_student", "rel_err_teacher_coarse"}: endpoint rel-L2
    vs the teacher's dense guided solution over valid frames (the coarse
    row is the UNdistilled teacher at the student's step count — the
    honest before/after). ASR -> token agreement vs the dense decode.
    Used by scripts/distill_calm.py to print a measured before/after;
    the methodology matches tests/test_distill.py / BASELINE.md.
    """
    import numpy as np

    tp = {"params": teacher_full}
    sp = {"params": student_full}
    if task == "tts":
        from audio_calm_tpu.eval.infer import tts_generate_latents

        def endpoint(p, steps, cfg):
            lat, n = jax.jit(
                lambda pr, ti, am, k: tts_generate_latents(
                    model, pr, ti, am, k, steps=steps, cfg_scale=cfg,
                    t_aud=model.cfg.max_audio_len),
            )(p, batch["text_ids"], batch["attention_mask"],
              jax.random.PRNGKey(7))
            return np.asarray(lat), np.asarray(n)

        ref, n = endpoint(tp, dense_steps, cfg_scale)
        coarse, _ = endpoint(tp, student_steps, cfg_scale)
        stu, _ = endpoint(sp, student_steps, 1.0)
        valid = (np.arange(ref.shape[1])[None, :] < n[:, None])[:, :, None]

        def rel(x):
            return float(np.linalg.norm((x - ref) * valid)
                         / max(np.linalg.norm(ref * valid), 1e-12))

        return {"rel_err_student": rel(stu),
                "rel_err_teacher_coarse": rel(coarse)}

    from audio_calm_tpu.eval.infer import asr_generate_ids

    def decode(p, steps, cfg):
        ids, q = jax.jit(
            lambda pr, la, am, ti, tm, k: asr_generate_ids(
                model, pr, la, am, ti, tm, k, steps=steps, cfg_scale=cfg,
                num_queries=model.cfg.max_text_len),
        )(p, batch["latents"], batch["audio_mask"],
          batch["text_ids"], batch["attention_mask"], jax.random.PRNGKey(7))
        return np.asarray(ids), np.asarray(q)

    ref_ids, q = decode(tp, dense_steps, cfg_scale)
    valid = np.arange(ref_ids.shape[1])[None, :] < q[:, None]

    def agree(p, steps, cfg):
        ids, _ = decode(p, steps, cfg)
        return float((ids == ref_ids)[valid].mean())

    return {"token_agreement_student": agree(sp, student_steps, 1.0),
            "token_agreement_teacher_coarse": agree(tp, student_steps,
                                                    cfg_scale)}


def make_distill_step(
    model: QwenCALM,
    tx,
    task: str = "tts",
    student_steps: int = 4,
    cfg_scale: float = 2.5,
    teacher_substeps: int = 8,
    t_grid: Optional[int] = None,
    remat: bool = True,
) -> Callable:
    """Returns step(state, frozen_with_teacher, batch, rng) -> (state, metrics).

    frozen_with_teacher MUST contain the pre-distillation head params at
    their natural paths (build it as {**frozen, **initial_trainable}); the
    student copy in state.trainable shadows them for the student graph.

    batch: {"text_ids", "attention_mask"} (+ {"latents", "audio_mask"} for
    task="asr"). t_grid pins the flow grid (default max_audio_len for TTS /
    max_text_len queries for ASR).
    cfg_scale is the TEACHER's guidance scale being baked in (use the
    serving value, e.g. 2.5); 1.0 distills the plain conditional field
    (the ASR protocol, reference eval_calm.py:358-359).
    """
    assert task in ("tts", "asr")
    K = int(student_steps)
    M = int(teacher_substeps)
    h = 1.0 / K
    use_cfg = (cfg_scale != 1.0) and (cfg_scale > 0)
    head_method = QwenCALM.tts_flow_fn if task == "tts" else QwenCALM.asr_flow_fn

    def loss_fn(trainable, frozen_wt, batch, rng):
        teacher = {"params": merge_partitions({}, frozen_wt)}

        # ---- conditioning (teacher == student outside the head; no grads) ----
        if task == "tts":
            from audio_calm_tpu.eval.infer import tts_condition

            cond_vec, text_ctx, text_pad = model.apply(
                teacher, batch["text_ids"], batch["attention_mask"], False,
                method=QwenCALM.encode_text_for_tts,
            )
            num_frames = model.apply(
                teacher, text_ctx, text_pad, method=QwenCALM.predict_length
            ).astype(jnp.int32)
            t_aud = t_grid or model.cfg.max_audio_len
            condition, frame_valid, _ = tts_condition(
                model, teacher, cond_vec, text_ctx, text_pad, num_frames, t_aud
            )
            ctx, cmask = text_ctx, text_pad
            x_dim = model.cfg.latent_dim
            valid = frame_valid
        else:
            num_q = t_grid or model.cfg.max_text_len
            condition = model.apply(
                teacher, batch["latents"], batch["audio_mask"],
                batch["text_ids"], batch["attention_mask"], num_q,
                method=QwenCALM.asr_encode_audio,
            )
            t_valid = jnp.sum(batch["audio_mask"].astype(jnp.int32), axis=1)
            q_len = jnp.clip(t_valid // 4, 10, model.cfg.max_text_len)
            valid = jnp.arange(num_q)[None, :] < q_len[:, None]
            condition = condition * valid[:, :, None].astype(condition.dtype)
            ctx, cmask = None, None
            x_dim = model.cfg.qwen.hidden_size

        B, T = valid.shape
        xmask = ~valid

        # ---- velocity fields ----
        if use_cfg:
            cond2 = jnp.concatenate(
                [condition, jnp.zeros_like(condition)], axis=0)
            ctx2 = (jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
                    if ctx is not None else None)
            cmask2 = (jnp.concatenate([cmask, cmask], axis=0)
                      if cmask is not None else None)
            xmask2 = jnp.concatenate([xmask, xmask], axis=0)

            def v_teacher(x, t_scalar):
                t = jnp.full((2 * B,), t_scalar)
                x2 = jnp.concatenate([x, x], axis=0)
                v2 = model.apply(teacher, cond2, x2, t, ctx2, cmask2, xmask2,
                                 method=head_method)
                return v2[B:] + cfg_scale * (v2[:B] - v2[B:])
        else:

            def v_teacher(x, t_scalar):
                t = jnp.full((B,), t_scalar)
                return model.apply(teacher, condition, x, t, ctx, cmask,
                                   xmask, method=head_method)

        # differentiated path: the student head eval is rematerialized so
        # the K-interval scan does NOT save K copies of the DiT attention
        # activations for backward (B=16/T=384/K=4 measured 21.7 GB of HLO
        # temps without this — over a 16 GB chip; with remat the backward
        # recomputes one interval at a time). Params pass explicitly so
        # jax.checkpoint sees the differentiated inputs.
        def _v_student(tr, x, t_scalar):
            stu = {"params": merge_partitions(tr, frozen_wt)}
            t = jnp.full((B,), t_scalar)
            return model.apply(stu, condition, x, t, ctx, cmask, xmask,
                               method=head_method)

        if remat:
            _v_student = jax.checkpoint(_v_student)

        def v_student(x, t_scalar):
            return _v_student(trainable, x, t_scalar)

        def fine_solve(x, t0):
            hm = h / M

            def sub(xc, j):
                v = v_teacher(xc, t0 + j.astype(jnp.float32) * hm)
                return (xc + v * hm).astype(xc.dtype), None

            xe, _ = jax.lax.scan(sub, x, jnp.arange(M))
            return xe

        # ---- on-policy rollout + per-interval regression ----
        rng_x = jax.random.fold_in(rng, 0)
        x0 = jax.random.normal(rng_x, (B, T, x_dim), condition.dtype)
        mf = valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mf), 1.0)

        def body(carry, i):
            x, acc = carry
            t0 = i.astype(jnp.float32) * h
            v_pred = v_student(x, t0)
            x_end = jax.lax.stop_gradient(fine_solve(x, t0))
            v_star = (x_end - x) / h
            err = (v_pred.astype(jnp.float32) - v_star.astype(jnp.float32)) ** 2
            l = jnp.sum(jnp.mean(err, axis=-1) * mf) / denom
            # the student advances on its OWN prediction (stop-grad): the
            # next interval is supervised at the state inference will visit
            x_next = (x + jax.lax.stop_gradient(v_pred) * h).astype(x.dtype)
            return (x_next, acc + l), None

        (_, loss_sum), _ = jax.lax.scan(
            body, (x0, jnp.zeros((), jnp.float32)), jnp.arange(K)
        )
        loss = loss_sum / K
        return loss, {"loss": loss, "loss_distill": loss}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, frozen_wt, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, out), grads = grad_fn(state.trainable, frozen_wt, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(out)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, trainable=trainable,
                       opt_state=opt_state),
            metrics,
        )

    return step
