"""Tensor parallelism: param shardings + dp x tp training-step equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audio_calm_tpu.config import (
    CALMModelConfig, LoRAConfig, Qwen2Config, TrainingConfig,
)
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.parallel.mesh import make_mesh
from audio_calm_tpu.parallel.tp import param_partition_spec, tp_shardings
from audio_calm_tpu.train.optim import (
    calm_param_label, make_optimizer, partition_params,
)
from audio_calm_tpu.train.steps import init_train_state, make_calm_step, shard_step


def test_partition_specs():
    assert param_partition_spec(
        ("llm", "layers_0", "self_attn", "q_proj", "kernel")
    ) == P(None, "model")
    assert param_partition_spec(
        ("llm", "layers_0", "self_attn", "o_proj", "kernel")
    ) == P("model", None)
    assert param_partition_spec(
        ("llm", "layers_0", "mlp", "down_proj", "kernel")
    ) == P("model", None)
    assert param_partition_spec(("embed", "embedding")) == P("model", None)
    assert param_partition_spec(
        ("llm", "layers_0", "self_attn", "q_proj", "lora_a")
    ) == P()
    assert param_partition_spec(("soa_embed",)) == P()


def _setup(mesh):
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    label = lambda k: calm_param_label(k, task_mode="tts")
    trainable, frozen = partition_params(params, label)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx = make_optimizer(tcfg, trainable, label, total_steps=10)
    state = init_train_state(trainable, tx)
    step, state, frozen = shard_step(
        make_calm_step(model, tx, "tts"), mesh, state, frozen
    )
    rng = np.random.default_rng(0)
    B = 8
    batch = dict(
        text_ids=jnp.asarray(rng.integers(0, 128, (B, 6))),
        attention_mask=jnp.ones((B, 6), jnp.int32),
        latents=jnp.asarray(rng.standard_normal((B, 16, 8)), jnp.float32),
        audio_mask=jnp.ones((B, 16), jnp.int32),
    )
    return step, state, frozen, batch


def test_dp_tp_equivalence_and_sharded_placement():
    mesh_dp = make_mesh(data=8, model=1)
    mesh_tp = make_mesh(data=4, model=2)

    step_a, state_a, frozen_a, batch = _setup(mesh_dp)
    step_b, state_b, frozen_b, _ = _setup(mesh_tp)

    # frozen llm kernels are actually sharded over the model axis
    k = ("llm", "layers_0", "self_attn", "q_proj", "kernel")
    assert "model" in str(frozen_b[k].sharding.spec)
    assert frozen_a[k].sharding.spec == P()

    sa, ma = step_a(state_a, frozen_a, batch, jax.random.PRNGKey(0))
    sb, mb = step_b(state_b, frozen_b, batch, jax.random.PRNGKey(0))
    # identical math under different meshes
    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-4
    )


def test_tp_shardings_fallback_on_indivisible():
    mesh = make_mesh(data=4, model=2)
    flat = {
        ("llm", "l", "mlp", "gate_proj", "kernel"): jnp.zeros((8, 10)),  # 10%2==0
        ("llm", "l", "mlp", "down_proj", "kernel"): jnp.zeros((7, 8)),  # 7%2!=0
    }
    sh = tp_shardings(flat, mesh)
    assert "model" in str(sh[("llm", "l", "mlp", "gate_proj", "kernel")].spec)
    assert sh[("llm", "l", "mlp", "down_proj", "kernel")].spec == P()
