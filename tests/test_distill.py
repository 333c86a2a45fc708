"""Few-step ODE distillation (train/distill.py) — quality evidence.

Protocol mirrors test_ode_quality: train a tiny TTS flow WITH CFG dropout
(so the guided field is real), then distill a K=4 student whose CONDITIONAL
field learns the teacher's cfg-2.0 guided field on its own rollout states.
Quality metric: latent endpoint error vs the teacher's euler-400 guided
solution over VALID frames (the inference conditioning path picks the
frame count).

The claims under test (train/distill.py header):
  - the 4-eval student (euler-4, cfg=1.0 -> 4 head passes, B batch) beats
    the 4-step guided teacher (euler-4, cfg=2.0 -> 8 head passes, 2B batch)
    by a wide margin: distillation genuinely learns the flow map, not just
    the field
  - checkpoint compatibility: the distilled head exports/loads through the
    standard component layout unchanged

The measured table lives in BASELINE.md ("Few-step distillation").
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_calm_tpu.config import (
    CALMModelConfig, LoRAConfig, Qwen2Config, TrainingConfig,
)
from audio_calm_tpu.eval.infer import tts_generate_latents
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.parallel.mesh import make_mesh
from audio_calm_tpu.train.distill import (
    distill_param_label, make_distill_step, split_for_distill,
)
from audio_calm_tpu.train.optim import (
    calm_param_label, make_optimizer, merge_partitions, partition_params,
)
from audio_calm_tpu.train.steps import (
    init_train_state, make_calm_step, shard_step,
)

CFG_SCALE = 2.0


@pytest.fixture(scope="module")
def trained_tts():
    """Tiny TTS flow overfit with CFG dropout (same recipe as
    test_ode_quality.trained_tts) -> (model, full_params_dict, batch)."""
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=64, tts_flow_num_layers=2,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=64),
        lora=LoRAConfig(rank=4, alpha=8, dropout=0.0),
        cfg_dropout_prob=0.1,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    label = lambda k: calm_param_label(k, task_mode="tts")
    trainable, frozen = partition_params(params, label)
    tcfg = TrainingConfig(learning_rate=3e-3, warmup_ratio=0.05)
    tx = make_optimizer(tcfg, trainable, label, total_steps=250)
    state = init_train_state(trainable, tx)
    step, state, frozen = shard_step(
        make_calm_step(model, tx, "tts"), make_mesh(), state, frozen
    )
    rng = np.random.default_rng(0)
    batch = dict(
        text_ids=jnp.asarray(rng.integers(0, 64, (8, 6))),
        attention_mask=jnp.ones((8, 6), jnp.int32),
        latents=jnp.asarray(rng.standard_normal((8, 16, 8)), jnp.float32),
        audio_mask=jnp.ones((8, 16), jnp.int32),
    )
    for i in range(250):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(i))
    assert float(m["loss_tts"]) < 1.6
    full = merge_partitions(state.trainable, frozen)
    return model, full, batch


@pytest.fixture(scope="module")
def distilled_tts(trained_tts):
    """Distill the trained head into a 4-eval student -> (student_full,
    loss_history)."""
    model, full, batch = trained_tts
    label = lambda k: distill_param_label(k, "tts")
    # student = detached copy of the head; the teacher (the original head
    # params) rides in frozen_wt, shadowed by the student in merge
    trainable, frozen_wt = split_for_distill(full, "tts")
    assert set(k[0] for k in trainable) == {"tts_flow_head"}
    tcfg = TrainingConfig(learning_rate=2e-3, warmup_ratio=0.05,
                          weight_decay=0.0)
    tx = make_optimizer(tcfg, trainable, label, total_steps=400)
    state = init_train_state(trainable, tx)
    step, state, frozen_wt = shard_step(
        make_distill_step(model, tx, "tts", student_steps=4,
                          cfg_scale=CFG_SCALE, teacher_substeps=8, t_grid=16),
        make_mesh(), state, frozen_wt,
    )
    losses = []
    dbatch = {k: batch[k] for k in ("text_ids", "attention_mask")}
    for i in range(400):
        state, m = step(state, frozen_wt, dbatch, jax.random.PRNGKey(1000 + i))
        losses.append(float(m["loss_distill"]))
    # drop the teacher: the student head shadows it in the merge, but keep
    # the returned tree teacher-free for clarity
    student_full = merge_partitions(
        {k: np.asarray(v) for k, v in state.trainable.items()},
        {k: v for k, v in frozen_wt.items() if k[0] != "tts_flow_head"})
    return student_full, losses


def _endpoint(model, full, batch, steps, cfg_scale, key=7):
    gen = jax.jit(
        functools.partial(tts_generate_latents, model),
        static_argnames=("steps", "cfg_scale", "t_aud", "method",
                         "time_schedule"),
    )
    latents, n = gen(
        {"params": full}, batch["text_ids"][:2], batch["attention_mask"][:2],
        jax.random.PRNGKey(key), steps=steps, cfg_scale=cfg_scale, t_aud=16,
        method="euler", time_schedule="uniform",
    )
    return np.asarray(latents), np.asarray(n)


def _rel_err(x, ref, n):
    valid = np.arange(ref.shape[1])[None, :] < n[:, None]
    m = valid[:, :, None]
    return float(np.linalg.norm((x - ref) * m) / np.linalg.norm(ref * m))


def test_distill_loss_learns(distilled_tts):
    _, losses = distilled_tts
    head, tail = np.mean(losses[:10]), np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert tail < head * 0.5, (head, tail)


def test_distilled_student_beats_coarse_teacher(trained_tts, distilled_tts):
    """The headline claim: 4 conditional evals (student) reproduce the
    guided dense solution far better than 4 guided Euler steps of the
    teacher (which cost 2x the head passes)."""
    model, teacher_full, batch = trained_tts
    student_full, _ = distilled_tts

    ref, n = _endpoint(model, teacher_full, batch, 400, CFG_SCALE)
    teacher4, n4 = _endpoint(model, teacher_full, batch, 4, CFG_SCALE)
    teacher2, _ = _endpoint(model, teacher_full, batch, 2, CFG_SCALE)
    student4, ns = _endpoint(model, student_full, batch, 4, 1.0)
    # same conditioning pipeline -> same predicted frame counts
    assert (n == n4).all() and (n == ns).all()

    err_teacher4 = _rel_err(teacher4, ref, n)
    err_teacher2 = _rel_err(teacher2, ref, n)
    err_student4 = _rel_err(student4, ref, n)
    print(f"\nendpoint rel err vs euler-400 guided: "
          f"teacher euler-4 cfg={CFG_SCALE} (8 evals): {err_teacher4:.5f} | "
          f"teacher euler-2 cfg={CFG_SCALE} (4 evals): {err_teacher2:.5f} | "
          f"student euler-4 cfg=1.0 (4 evals): {err_student4:.5f}")
    # at EQUAL head-eval budget (4), the student must crush the guided
    # teacher (measured 0.048 vs 0.259 at 1200 distill steps; 0.063 vs
    # 0.259 at this test's 400 — BASELINE.md "Few-step distillation")
    assert err_student4 < err_teacher2 * 0.35, (err_student4, err_teacher2)
    # at HALF the budget it still beats euler-4 (measured ratio 0.69 at
    # 400 steps, 0.53 at 1200)
    assert err_student4 < err_teacher4 * 0.85, (err_student4, err_teacher4)
    # and lands in a usable absolute regime on this toy
    assert err_student4 < 0.08, err_student4


def test_distilled_head_exports_standard_components(distilled_tts, tmp_path):
    """The student is architecture-identical: it round-trips through the
    standard component layout (train/checkpoint.save_components)."""
    from audio_calm_tpu.train.checkpoint import load_component, save_components

    student_full, _ = distilled_tts
    save_components(student_full, str(tmp_path / "components"))
    ref_head = student_full["tts_flow_head"]
    got_head = load_component(str(tmp_path / "components"), "tts_flow_head",
                              ref_head)
    r = jax.tree_util.tree_leaves(ref_head)
    g = jax.tree_util.tree_leaves(got_head)
    assert len(r) == len(g)
    for a, b in zip(r, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_asr_distill_step_runs():
    """ASR distillation (cfg=1.0 teacher: pure step-count compression)
    compiles and reduces its loss on a tiny untrained model."""
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=64, asr_flow_num_layers=2, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=64),
        lora=LoRAConfig(rank=4, alpha=8, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    # the DiT out_proj/gates are zero-init (reference parity,
    # modeling_calm.py:269-270): an untrained head is the ZERO field and
    # distillation would be trivially 0-loss — perturb the zero leaves so
    # the teacher field is nonzero and curved
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    key = jax.random.PRNGKey(42)
    for k in sorted(flat):
        if k[0] == "asr_flow_head" and not np.any(np.asarray(flat[k])):
            key, sub = jax.random.split(key)
            flat[k] = 0.1 * jax.random.normal(sub, flat[k].shape,
                                              flat[k].dtype)
    params = unflatten_dict(flat)
    label = lambda k: distill_param_label(k, "asr")
    trainable, frozen_wt = split_for_distill(params, "asr")
    assert set(k[0] for k in trainable) == {"asr_flow_head"}
    tcfg = TrainingConfig(learning_rate=1e-3, weight_decay=0.0)
    tx = make_optimizer(tcfg, trainable, label, total_steps=30)
    state = init_train_state(trainable, tx)
    step, state, frozen_wt = shard_step(
        make_distill_step(model, tx, "asr", student_steps=2,
                          cfg_scale=1.0, teacher_substeps=4, t_grid=8),
        make_mesh(), state, frozen_wt,
    )
    rng = np.random.default_rng(3)
    batch = dict(
        text_ids=jnp.asarray(rng.integers(0, 64, (8, 6))),
        attention_mask=jnp.ones((8, 6), jnp.int32),
        latents=jnp.asarray(rng.standard_normal((8, 16, 8)), jnp.float32),
        audio_mask=jnp.ones((8, 16), jnp.int32),
    )
    losses = []
    for i in range(30):
        state, m = step(state, frozen_wt, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss_distill"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
