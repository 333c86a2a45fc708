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
