"""End-to-end NAR inference pipelines on a tiny random-init model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.eval.infer import (
    CALMInference,
    asr_generate_ids,
    truncate_at_eos,
    tts_generate_latents,
)
from audio_calm_tpu.eval.metrics import cer, edit_distance, normalize_text, wer
from audio_calm_tpu.models.calm import QwenCALM


@pytest.fixture(scope="module")
def tiny():
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
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 8)), jnp.float32
    )
    amask = jnp.ones((1, 16), jnp.int32)
    labels = jnp.asarray([[4, 6, 8, -100]])
    rngs = {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1)}
    p1 = model.init(rngs, text_ids, mask, latents, amask, train=False,
                    method=QwenCALM.forward_tts)
    p2 = model.init(rngs, text_ids, mask, latents, amask, labels, train=False,
                    method=QwenCALM.forward_asr)
    # merge: p2 contains asr-only components, p1 tts-only; same seeds -> same
    # shared params
    merged = jax.tree_util.tree_map(
        lambda x: x, {**p2["params"], **p1["params"]}
    )
    return model, {"params": merged}


def test_tts_generate(tiny):
    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    latents, num_frames = tts_generate_latents(
        model, params, text_ids, mask, jax.random.PRNGKey(0),
        steps=4, cfg_scale=2.5, t_aud=32,
    )
    n = int(num_frames[0])
    assert latents.shape == (1, 32, 8)
    assert 8 <= n <= 32  # min(10, 2*4)..min(32, 12*4)
    assert np.isfinite(np.asarray(latents)).all()


def test_tts_cfg_one_no_fusion_path(tiny):
    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9]])
    mask = jnp.ones_like(text_ids)
    latents, _ = tts_generate_latents(
        model, params, text_ids, mask, jax.random.PRNGKey(0),
        steps=2, cfg_scale=1.0, t_aud=32,
    )
    assert np.isfinite(np.asarray(latents)).all()


def test_asr_generate(tiny):
    model, params = tiny
    latents = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 8)), jnp.float32
    )
    amask = jnp.asarray((np.arange(32) < 24).astype(np.int32))[None]
    prompt = jnp.asarray([[2, 4, 6]])
    ids, q_len = asr_generate_ids(
        model, params, latents, amask, prompt, jnp.ones_like(prompt),
        jax.random.PRNGKey(0), steps=4, cfg_scale=1.0, num_queries=12,
    )
    assert ids.shape == (1, 12)
    assert int(q_len[0]) == 10  # clip(24//4, 10, 12)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 256).all()


def test_truncate_at_eos():
    ids = np.array([5, 9, 151643, 7])
    assert truncate_at_eos(ids, 4) == [5, 9]
    assert truncate_at_eos(ids, 2) == [5, 9]
    assert truncate_at_eos(np.array([1, 2, 3]), 3, extra_eos={2}) == [1]


def test_metrics():
    assert edit_distance("kitten", "sitting") == 3
    assert normalize_text("Hello, World!") == "hello world"
    refs = ["the cat sat", "hello world"]
    assert wer(refs, refs) == 0.0
    assert cer(refs, refs) == 0.0
    assert wer(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert wer(["a b"], [""]) == 1.0


def test_tts_two_phase_matches_fused(tiny):
    """tts_encode + tts_decode at the max grid == the fused one-shot path
    (same rng, same grid -> identical latents)."""
    from audio_calm_tpu.eval.infer import tts_decode, tts_encode

    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    rng = jax.random.PRNGKey(7)
    fused, nf = tts_generate_latents(
        model, params, text_ids, mask, rng, steps=3, cfg_scale=2.0, t_aud=32
    )
    cv, ctx, pad, n = tts_encode(model, params, text_ids, mask)
    two = tts_decode(model, params, cv, ctx, pad, n, rng,
                     steps=3, cfg_scale=2.0, t_aud=32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                               rtol=1e-5, atol=1e-5)
    assert int(jnp.minimum(n, 32)[0]) == int(nf[0])


def test_bucketed_inference_picks_small_grid(tiny):
    """CALMInference with audio_buckets runs the ODE on the smallest grid
    that fits the predicted length (VERDICT r1 item 3)."""
    from audio_calm_tpu.data.tokenizer import ByteTokenizer

    model, params = tiny
    inf = CALMInference(model, params, ByteTokenizer(),
                        audio_buckets=[8, 16, 32])
    assert inf.pick_bucket(5) == 8
    assert inf.pick_bucket(9) == 16
    assert inf.pick_bucket(17) == 32
    assert inf.pick_bucket(999) == 32  # clamped to max_audio_len

    lat, n = inf.tts("hey", jax.random.PRNGKey(0), steps=2, cfg_scale=1.5)
    assert lat.shape == (n, 8) and n <= 32
    assert np.isfinite(lat).all()
    # decode jit compiled for exactly one bucket grid
    assert inf._tts_decode_jit._cache_size() == 1
