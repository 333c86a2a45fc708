"""Training steps: DP mesh, ZeRO opt-state sharding, freezing, 5-group LRs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from audio_calm_tpu.config import (
    CALMModelConfig,
    LoRAConfig,
    Qwen2Config,
    TrainingConfig,
    VAEModelConfig,
)
from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.parallel.mesh import make_mesh, zero_sharding
from audio_calm_tpu.train.optim import (
    calm_param_label,
    make_optimizer,
    partition_params,
    vae_param_label,
)
from audio_calm_tpu.train.steps import (
    init_train_state,
    make_calm_step,
    make_vae_step,
    shard_step,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_vae_training_loss_decreases():
    cfg = VAEModelConfig(
        hidden_channels=32, latent_channels=8, norm_num_groups=4,
        ssim_weight=0.0, stft_loss_weight=0.0,
    )
    model = AcousticVAE(cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 80)) * 3.8 - 6.5,
        jnp.float32,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        mel, train=False,
    )["params"]
    tcfg = TrainingConfig(learning_rate=3e-3, warmup_ratio=0.0,
                          gradient_accumulation_steps=1, max_grad_norm=1.0)
    trainable, frozen = partition_params(params, vae_param_label)
    assert not frozen
    tx = make_optimizer(tcfg, trainable, vae_param_label, total_steps=100)
    state = init_train_state(trainable, tx)

    mesh = make_mesh()
    step, state, _ = shard_step(make_vae_step(model, tx), mesh, state)
    batch = {"mel": mel}
    rng = jax.random.PRNGKey(42)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


@pytest.fixture(scope="module")
def calm_setup():
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    B = 8
    rng = np.random.default_rng(0)
    batch = dict(
        text_ids=jnp.asarray(rng.integers(0, 128, (B, 6))),
        attention_mask=jnp.ones((B, 6), jnp.int32),
        latents=jnp.asarray(rng.standard_normal((B, 16, 8)), jnp.float32),
        audio_mask=jnp.ones((B, 16), jnp.int32),
        labels=jnp.asarray(rng.integers(0, 128, (B, 8))),
    )
    rngs = {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1)}
    p_tts = model.init(
        rngs, batch["text_ids"], batch["attention_mask"], batch["latents"],
        batch["audio_mask"], train=False, method=QwenCALM.forward_tts,
    )["params"]
    p_asr = model.init(
        rngs, batch["text_ids"], batch["attention_mask"], batch["latents"],
        batch["audio_mask"], batch["labels"], train=False,
        method=QwenCALM.forward_asr,
    )["params"]
    # numpy leaves: the steps donate their state buffers, and module-scoped
    # jax arrays could alias them (device_put is a no-op for an array that
    # already matches the target sharding) — later tests would then see
    # deleted buffers
    params = jax.tree_util.tree_map(np.asarray, {**p_asr, **p_tts})
    return model, params, batch


def test_calm_labels_and_freezing(calm_setup):
    model, params, _ = calm_setup
    flat = flatten_dict(params)
    labels = {k: calm_param_label(k) for k in flat}
    # llm base frozen, lora trainable
    assert labels[("llm", "layers_0", "self_attn", "q_proj", "kernel")] == "frozen"
    assert labels[("llm", "layers_0", "self_attn", "q_proj", "lora_a")] == "decay"
    assert labels[("embed", "embedding")] == "frozen"
    assert labels[("soa_embed",)] == "soa"
    assert any(v == "proj" for k, v in labels.items() if k[0] == "input_proj")
    assert all(
        v == "head" for k, v in labels.items() if k[0] == "tts_flow_head"
    )
    # task-mode freezing
    lbl_tts = calm_param_label(("asr_flow_head", "in_proj", "kernel"), task_mode="tts")
    assert lbl_tts == "frozen"
    lbl_asr = calm_param_label(("tts_flow_head", "in_proj", "kernel"), task_mode="asr")
    assert lbl_asr == "frozen"


def test_calm_tts_step_updates_only_trainable(calm_setup):
    model, params, batch = calm_setup
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    label = lambda k: calm_param_label(k, task_mode="tts")
    trainable, frozen = partition_params(params, label)
    tx = make_optimizer(tcfg, trainable, label, total_steps=50)
    state = init_train_state(trainable, tx)
    mesh = make_mesh()
    step, state, frozen = shard_step(make_calm_step(model, tx, "tts"), mesh, state, frozen)

    tts_batch = {k: v for k, v in batch.items() if k != "labels"}
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), state.trainable)
    # warmup-cosine lr is 0 at step 0; take a few steps so updates land
    for _ in range(3):
        state, metrics = step(state, frozen, tts_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # every trainable group got an update somewhere
    after = state.trainable
    changed = [
        k for k in before
        if not np.allclose(before[k], np.asarray(after[k]))
    ]
    assert any(k[0] == "tts_flow_head" for k in changed)
    assert any(k == ("soa_embed",) for k in changed)
    # asr head was excluded from trainable entirely
    assert not any(k[0] == "asr_flow_head" for k in after)


def test_calm_asr_step_runs(calm_setup):
    model, params, batch = calm_setup
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0,
                          gradient_accumulation_steps=2)
    label = lambda k: calm_param_label(k, task_mode="asr")
    trainable, frozen = partition_params(params, label)
    tx = make_optimizer(tcfg, trainable, label, total_steps=50)
    state = init_train_state(trainable, tx)
    mesh = make_mesh()
    step, state, frozen = shard_step(make_calm_step(model, tx, "asr"), mesh, state, frozen)
    s1, m1 = step(state, frozen, batch, jax.random.PRNGKey(0))
    s2, m2 = step(s1, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # grad accumulation: params unchanged after 1 microstep, changed after 2
    # (MultiSteps applies on the 2nd)
    assert int(s2.step) == 2


def test_zero_sharding_spec():
    mesh = make_mesh()
    tree = {
        "big": jnp.zeros((64, 1024)),  # 64 % 8 == 0 -> sharded
        "odd": jnp.zeros((7, 5000)),  # 5000 % 8 == 0 -> sharded dim 1
        "tiny": jnp.zeros((4,)),  # too small -> replicated
    }
    specs = zero_sharding(mesh, tree)
    assert "data" in str(specs["big"].spec)
    assert specs["tiny"].spec == jax.sharding.PartitionSpec()


def test_calm_microbatched_step_matches_envelope(calm_setup):
    """In-step microbatching (VERDICT r1 item 4): k=2 runs the same one
    optimizer update per step, produces finite loss/grad_norm close to the
    full-batch step, and trains (loss decreases over repeated steps)."""
    model, params, batch = calm_setup
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    label = lambda k: calm_param_label(k, task_mode="tts")
    trainable, frozen = partition_params(params, label)
    tts_batch = {k: v for k, v in batch.items() if k != "labels"}
    mesh = make_mesh()

    losses = {}
    for k in (1, 2, 4):
        # fresh buffers per run: shard_step donates the state on each step
        tr = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                    trainable)
        fz0 = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                     frozen)
        tx = make_optimizer(tcfg, tr, label, total_steps=50)
        state = init_train_state(tr, tx)
        step, state, fz = shard_step(
            make_calm_step(model, tx, "tts", microbatch=k), mesh, state, fz0
        )
        before = {kk: np.asarray(v) for kk, v in state.trainable.items()}
        first = last = None
        for i in range(6):
            state, m = step(state, fz, tts_batch, jax.random.PRNGKey(0))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert np.isfinite(last) and np.isfinite(float(m["grad_norm"]))
        assert int(state.step) == 6
        # params actually moved (one optimizer update per step regardless of k)
        changed = [kk for kk in before
                   if not np.allclose(before[kk], np.asarray(state.trainable[kk]))]
        assert any(kk[0] == "tts_flow_head" for kk in changed), k
        # flow loss stays near the analytic init baseline of 2.0 (noisy
        # per-step draws; strict monotonic decrease needs many more steps)
        assert 0.5 < last < 4.0, (k, last)
        losses[k] = first
    # same data, different per-slice rng folds: first-step losses agree
    # at the flow-matching-noise level (E[loss]≈2 at init)
    assert abs(losses[1] - losses[2]) < 0.6, losses
    assert abs(losses[1] - losses[4]) < 0.6, losses


def test_bf16_frozen_storage_trains(calm_setup):
    """training.frozen_weights_dtype=bfloat16: the never-updated base stores
    bf16 (the single-chip memory lever, BASELINE.md round 3); the step must
    run, train, and track the fp32-frozen loss closely (compute is bf16 on
    the flagship either way; this tiny model computes fp32, so the delta
    here IS the storage-precision effect)."""
    from audio_calm_tpu.models.flagship import cast_floating

    model, params, batch = calm_setup
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    label = lambda k: calm_param_label(k, task_mode="tts")
    trainable, frozen = partition_params(params, label)
    tts_batch = {k: v for k, v in batch.items() if k != "labels"}
    mesh = make_mesh()

    losses = {}
    for name, fz_in in (
        ("fp32", frozen),
        ("bf16", cast_floating(frozen, jnp.bfloat16)),
    ):
        tr = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                    trainable)
        fz0 = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                     fz_in)
        tx = make_optimizer(tcfg, tr, label, total_steps=50)
        state = init_train_state(tr, tx)
        step, state, fz = shard_step(
            make_calm_step(model, tx, "tts"), mesh, state, fz0)
        for i in range(3):
            state, m = step(state, fz, tts_batch, jax.random.PRNGKey(0))
        losses[name] = float(m["loss"])
        assert np.isfinite(losses[name])
    assert abs(losses["bf16"] - losses["fp32"]) < 0.05, losses
    """model.remat_policy ('full' | 'dots' | 'none') is a pure speed/memory
    trade: losses and grads must match across policies."""
    import dataclasses

    from audio_calm_tpu.models.calm import QwenCALM

    model, params, batch = calm_setup
    tts_batch = {k: v for k, v in batch.items() if k != "labels"}

    def loss_for(policy):
        m = QwenCALM(dataclasses.replace(model.cfg, remat_policy=policy),
                     dtype=jnp.float32)

        def f(p):
            out = m.apply(
                {"params": p}, tts_batch["text_ids"],
                tts_batch["attention_mask"], tts_batch["latents"],
                tts_batch["audio_mask"], train=False,
                rngs={"flow": jax.random.PRNGKey(0)},
                method=QwenCALM.forward_tts,
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(f)(params)
        return float(loss), grads

    l_full, g_full = loss_for("full")
    for policy in ("dots", "none"):
        l_p, g_p = loss_for(policy)
        assert abs(l_p - l_full) < 1e-5
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_full, g_p,
        )
