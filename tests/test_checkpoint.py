import numpy as np
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from audio_calm_tpu.config import (
    CALMModelConfig, LoRAConfig, Qwen2Config, TrainingConfig, VAEModelConfig,
)
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.train.checkpoint import (
    load_component,
    make_manager,
    restore_train_state,
    save_components,
    save_train_state,
    soft_restart,
)
from audio_calm_tpu.train.optim import (
    make_optimizer,
    partition_params,
    vae_param_label,
)
from audio_calm_tpu.train.steps import init_train_state


def _vae_state():
    cfg = VAEModelConfig(hidden_channels=32, latent_channels=8, norm_num_groups=4)
    model = AcousticVAE(cfg)
    mel = jnp.zeros((1, 16, 80))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        mel, train=False,
    )["params"]
    trainable, _ = partition_params(params, vae_param_label)
    tx = make_optimizer(TrainingConfig(), trainable, vae_param_label, 100)
    return init_train_state(trainable, tx), tx


def test_manager_save_restore_roundtrip(tmp_path):
    state, tx = _vae_state()
    mgr = make_manager(str(tmp_path / "ckpt"), save_total_limit=2)
    save_train_state(mgr, 10, state.trainable, state.opt_state, {"loss": 1.0})
    mgr.wait_until_finished()

    # restore into zeroed targets
    zeros_t = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
    zeros_o = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
        state.opt_state,
    )
    rt, ro, step = restore_train_state(mgr, zeros_t, zeros_o)
    assert step == 10
    for k in state.trainable:
        np.testing.assert_array_equal(np.asarray(rt[k]),
                                      np.asarray(state.trainable[k]))


def test_manager_retention(tmp_path):
    state, _ = _vae_state()
    mgr = make_manager(str(tmp_path / "ckpt"), save_total_limit=2,
                       best_metric=None)
    for s in (1, 2, 3):
        save_train_state(mgr, s, state.trainable, state.opt_state)
    mgr.wait_until_finished()
    assert set(mgr.all_steps()) == {2, 3}


def test_component_export_and_soft_restart(tmp_path):
    from audio_calm_tpu.models.calm import QwenCALM, init_calm_params

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    d = str(tmp_path / "components")
    save_components(params, d)

    # load one component back
    loaded = load_component(d, "tts_flow_head", params["tts_flow_head"])
    flat_a = flatten_dict(loaded)
    flat_b = flatten_dict(params["tts_flow_head"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))

    # soft restart into freshly-initialized params
    params2 = init_calm_params(model, jax.random.PRNGKey(7))
    before = np.asarray(flatten_dict(params2["tts_flow_head"])[("in_proj", "kernel")])
    restarted = soft_restart(
        params2, {"tts_flow_head": d, "input_proj": d, "lora": d}
    )
    after = np.asarray(
        flatten_dict(restarted["tts_flow_head"])[("in_proj", "kernel")]
    )
    ref = np.asarray(flatten_dict(params["tts_flow_head"])[("in_proj", "kernel")])
    assert not np.allclose(before, ref)
    np.testing.assert_array_equal(after, ref)
    # untouched components keep their fresh values
    np.testing.assert_array_equal(
        np.asarray(restarted["asr_query_embed"]["embedding"]),
        np.asarray(params2["asr_query_embed"]["embedding"]),
    )


def test_best_checkpoint_retention_and_load_best(tmp_path):
    """VERDICT r1 item 5: train with degrading eval loss; the BEST (not last)
    checkpoint must survive retention and be restored into the returned
    state (reference metric_for_best_model/load_best_model_at_end,
    calm_config.yaml:130-137)."""
    import optax

    from audio_calm_tpu.train.loop import run_training
    from audio_calm_tpu.train.steps import TrainState

    out = str(tmp_path / "run")
    tcfg = TrainingConfig(
        output_dir=out, logging_steps=1, save_steps=1, eval_steps=1,
        save_total_limit=2, load_best_model_at_end=True,
        metric_for_best_model="loss",
    )
    trainable = {("w",): jnp.zeros((), jnp.float32)}
    tx = optax.sgd(1.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=tx.init(trainable))

    def step_fn(state, batch, rng):
        w = state.trainable[("w",)] + 1.0
        return (
            TrainState(step=state.step + 1, trainable={("w",): w},
                       opt_state=state.opt_state),
            {"loss": w},
        )

    # eval loss dips at step 2, then degrades
    scripted = iter([3.0, 1.0, 2.0])

    def eval_fn(state):
        return {"loss": next(scripted)}

    batches = iter(lambda: {"x": 0}, None)
    final = run_training(step_fn, state, batches, tcfg, 3,
                         jax.random.PRNGKey(0), eval_fn=eval_fn)
    # last step had w=3; best checkpoint (eval loss 1.0) was step 2 -> w=2
    assert float(final.trainable[("w",)]) == 2.0

    mgr = make_manager(out, 2, best_metric="loss")
    assert mgr.best_step() == 2
    # retention kept 2 checkpoints, best among them is step 2 (step 1 evicted)
    assert 1 not in mgr.all_steps()


def test_resume_reseeds_batch_factory(tmp_path):
    """VERDICT r1 item 7: a resumed run must not replay the epoch head —
    callable `batches` receives the restored step for seed folding."""
    import optax

    from audio_calm_tpu.train.loop import run_training
    from audio_calm_tpu.train.steps import TrainState

    out = str(tmp_path / "run")
    trainable = {("w",): jnp.zeros((), jnp.float32)}
    tx = optax.sgd(1.0)

    def step_fn(state, batch, rng):
        return (
            TrainState(step=state.step + 1, trainable=state.trainable,
                       opt_state=state.opt_state),
            {"loss": jnp.zeros(())},
        )

    calls = []

    def factory(start_step):
        calls.append(start_step)
        return iter(lambda: {"x": 0}, None)

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32),
                          trainable=dict(trainable),
                          opt_state=tx.init(trainable))

    cfg1 = TrainingConfig(output_dir=out, logging_steps=100, save_steps=2,
                          eval_steps=100, load_best_model_at_end=False)
    run_training(step_fn, fresh_state(), factory, cfg1, 4, jax.random.PRNGKey(0))
    cfg2 = TrainingConfig(output_dir=out, logging_steps=100, save_steps=2,
                          eval_steps=100, load_best_model_at_end=False,
                          resume_from_checkpoint=out)
    run_training(step_fn, fresh_state(), factory, cfg2, 6, jax.random.PRNGKey(0))
    assert calls == [0, 4], calls

    # the seed fold actually changes the batch stream
    from audio_calm_tpu.data.collator import calm_batch_iterator
    from audio_calm_tpu.data.datasets import CalmDataset
    from audio_calm_tpu.data.tokenizer import ByteTokenizer

    root = tmp_path / "corpus" / "dev" / "s"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        np.savez(root / f"u{i}.npz",
                 latent=rng.standard_normal((8, 8)).astype(np.float32))
        lines.append(f"u{i} sample text {i}")
    (root / "s.trans.txt").write_text("\n".join(lines) + "\n")
    ds = CalmDataset(ByteTokenizer(), tts_latent_dir=str(tmp_path / "corpus"),
                     tts_subsets="dev", max_text_len=24, max_audio_len=8,
                     task_mode="tts")
    b0 = next(calm_batch_iterator(ds, 4, 0, 8, task_prob_tts=1.0, seed=0))
    b1 = next(calm_batch_iterator(ds, 4, 0, 8, task_prob_tts=1.0,
                                  seed=0 + 1_000_003 * 4))
    assert not np.array_equal(b0["latents"], b1["latents"])
