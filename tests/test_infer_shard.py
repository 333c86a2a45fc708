"""Multi-chip inference placement (parallel/infer_shard.py).

The reference serves single-GPU only (SURVEY §2.6: no TP anywhere);
these cover the TPU serving scale-out: TP-sharded transformer kernels +
DP-sharded batched request rows must produce the same audio/transcripts
as the single-device engine — placement is annotation, not a second code
path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.data.tokenizer import ByteTokenizer
from audio_calm_tpu.eval.infer import CALMInference
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.parallel.infer_shard import (
    inference_param_shardings, shard_batch_rows, shard_inference_params,
)
from audio_calm_tpu.parallel.mesh import make_mesh


def _tiny_model():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=32,
        max_text_len=12,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=1,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=1,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = {"params": init_calm_params(model, jax.random.PRNGKey(0))}
    return model, params


@pytest.fixture(scope="module")
def engines():
    model, params = _tiny_model()
    kw = dict(audio_buckets=[16, 32], text_buckets=[64, 96])
    solo = CALMInference(model, params, ByteTokenizer(), **kw)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = CALMInference(model, params, ByteTokenizer(), mesh=mesh,
                            **kw)
    return solo, sharded, mesh


def test_param_shardings_follow_tp_rules(engines):
    """Projection kernels (LLM and the transformer-shaped DiT heads alike
    — the suffix rules are module-agnostic, same as training) must be
    TP-sharded on the placed params; norms/embeddings-of-state replicate."""
    _, sharded, mesh = engines
    from flax.traverse_util import flatten_dict

    placed = flatten_dict(sharded.params["params"])
    tp_seen = repl_seen = False
    for path, leaf in placed.items():
        spec = leaf.sharding.spec
        if path[-2:] == ("q_proj", "kernel"):
            assert spec == P(None, "model"), path
            tp_seen = True
        if path[-1] == "scale":  # RMSNorm / LayerNorm scales replicate
            assert spec == P(), path
            repl_seen = True
    assert tp_seen and repl_seen


def test_shard_batch_rows_divisibility(engines):
    _, _, mesh = engines
    a, b = shard_batch_rows(
        (jnp.zeros((4, 3)), jnp.zeros((3, 3))), mesh)
    assert a.sharding.spec == P("data")
    assert b.sharding.spec == P()  # 3 rows don't divide dp=2 -> replicate
    assert shard_batch_rows((a,), None) == (a,)


def test_tts_batch_matches_single_device(engines):
    solo, sharded, _ = engines
    texts = ["hello world", "good day to you", "cats", "dogs bark"]
    keys = [jax.random.PRNGKey(s) for s in (1, 2, 3, 4)]
    lat_solo, n_solo, grid_solo = solo.tts_batch(
        texts, keys, steps=2, cfg_scale=1.5)
    lat_sh, n_sh, grid_sh = sharded.tts_batch(
        texts, keys, steps=2, cfg_scale=1.5)
    assert n_solo == n_sh and grid_solo == grid_sh
    np.testing.assert_allclose(lat_sh, lat_solo, rtol=2e-4, atol=2e-4)


def test_solo_tts_runs_on_mesh(engines):
    """B=1 requests (rows replicate over dp) still run SPMD on the mesh
    and match the single-device output — the serving solo path."""
    solo, sharded, _ = engines
    k = jax.random.PRNGKey(7)
    a, n_a = solo.tts("hello there", k, steps=2, cfg_scale=1.5)
    b, n_b = sharded.tts("hello there", k, steps=2, cfg_scale=1.5)
    assert n_a == n_b
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def test_asr_batch_matches_single_device(engines):
    solo, sharded, _ = engines
    rng = np.random.default_rng(0)
    lats = [rng.standard_normal((t, 8)).astype(np.float32)
            for t in (10, 16, 7, 12)]
    keys = [jax.random.PRNGKey(s) for s in (5, 6, 7, 8)]
    assert (sharded.asr_batch(lats, keys, steps=2)
            == solo.asr_batch(lats, keys, steps=2))


def test_quantized_params_shard(engines):
    """int8 weight-only variables place without error (int8 kernels follow
    the same path rules; the qscale collection replicates or shards with
    its kernel)."""
    from audio_calm_tpu.models.quant import quantize_llm_int8

    _, _, mesh = engines
    model, params = _tiny_model()
    p, qscale = quantize_llm_int8(params["params"])
    placed = shard_inference_params({"params": p, "qscale": qscale}, mesh)
    leaves = jax.tree_util.tree_leaves(placed)
    assert all(hasattr(x, "sharding") for x in leaves)
    assert any(x.dtype == jnp.int8 for x in leaves)
