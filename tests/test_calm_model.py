import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.models.calm import QwenCALM, init_soa_value


@pytest.fixture(scope="module")
def model_and_params():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=32,
        max_text_len=12,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=2,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=2,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        latent_mean=0.04,
        latent_std=1.19,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    B, T_txt, T_aud = 2, 6, 16
    batch = dict(
        text_ids=jnp.asarray(np.random.default_rng(0).integers(0, 256, (B, T_txt))),
        attention_mask=jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]]),
        latents=jnp.asarray(
            np.random.default_rng(1).standard_normal((B, T_aud, 8)), jnp.float32
        ),
        audio_mask=jnp.asarray(
            (np.arange(T_aud)[None, :] < np.array([[12], [16]])).astype(np.int32)
        ),
    )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "flow": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = model.init(
        rngs,
        batch["text_ids"],
        batch["attention_mask"],
        batch["latents"],
        batch["audio_mask"],
        train=False,
        method=QwenCALM.forward_tts,
    )
    return model, params, batch


def test_tts_forward_zero_init_flow_loss_near_two(model_and_params):
    """Zero-init out_proj => pred_v = 0 => flow loss ~= E||x1-x0||^2.

    With normalized unit-ish targets this is the reference sanity baseline
    of ~2.0 (scripts/run_sanity_checks.py:100)."""
    model, params, batch = model_and_params
    out = model.apply(
        params,
        batch["text_ids"],
        batch["attention_mask"],
        batch["latents"],
        batch["audio_mask"],
        train=False,
        method=QwenCALM.forward_tts,
        rngs={"flow": jax.random.PRNGKey(5)},
    )
    for k in ("loss", "loss_tts", "loss_len", "loss_dur"):
        assert np.isfinite(float(out[k])), k
    assert 1.2 < float(out["loss_tts"]) < 3.0


def test_asr_forward_finite(model_and_params):
    model, params, batch = model_and_params
    labels = np.random.default_rng(2).integers(0, 256, (2, 8))
    labels[0, 5:] = -100
    # init for asr branch params (cross attn, asr head) happens via same tree
    rngs = {
        "params": jax.random.PRNGKey(0),
        "flow": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    model2 = model
    params2 = model2.init(
        rngs,
        batch["text_ids"],
        batch["attention_mask"],
        batch["latents"],
        batch["audio_mask"],
        jnp.asarray(labels),
        train=False,
        method=QwenCALM.forward_asr,
    )
    out = model2.apply(
        params2,
        batch["text_ids"],
        batch["attention_mask"],
        batch["latents"],
        batch["audio_mask"],
        jnp.asarray(labels),
        train=False,
        method=QwenCALM.forward_asr,
        rngs={"flow": jax.random.PRNGKey(5)},
    )
    assert np.isfinite(float(out["loss"]))
    # zero-init head baseline: E||x1-x0||^2 with x1 ~ 0.02-scale embeddings
    # is ~= E||x0||^2 = 1.0
    assert 0.5 < float(out["loss_asr"]) < 3.5


def test_search_nearest_tokens(model_and_params):
    model, params, _ = model_and_params
    table = params["params"]["embed"]["embedding"]
    probe = jnp.stack([table[5], table[42], table[200]])[None]  # [1, 3, D]
    ids = model.apply(params, probe, method=QwenCALM.search_nearest_tokens)
    np.testing.assert_array_equal(np.asarray(ids)[0], [5, 42, 200])


def test_init_soa_value(model_and_params):
    _, params, _ = model_and_params
    table = params["params"]["embed"]["embedding"]
    soa = init_soa_value(table)
    assert soa.shape == (1, 1, table.shape[1])
    # vocab 256 < 2000: slice clips, mean over rows 1000:2000 -> empty guard
    # (tiny test vocab); just check finite for real-sized table
    big = jnp.asarray(np.random.default_rng(3).standard_normal((2048, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(init_soa_value(big))[0, 0],
        np.asarray(big[1000:2000]).mean(0),
        rtol=1e-5,
    )


def test_component_names_match_reference_layout(model_and_params):
    from audio_calm_tpu.models.calm import init_calm_params

    model, _, _ = model_and_params
    full = init_calm_params(model, jax.random.PRNGKey(0))
    top = set(full.keys())
    expected = {
        "embed", "llm", "input_proj", "soa_embed", "asr_cross_attn",
        "asr_query_embed", "tts_flow_head", "asr_flow_head",
        "tts_len_predictor", "tts_dur_predictor",
    }
    assert expected <= top, expected - top


def test_asr_loss_invariant_to_prompt_pad_width(model_and_params):
    """The asr_text_pad contract: ASR loss is BIT-EXACT under the LLM
    prompt pad width (pad prompt tokens are attention-masked out and the
    audio context is hidden[:, :T_aud]). Guards data.asr_text_pad
    shipping different numerics than the reference's max_text_len pad."""
    model, _, batch = model_and_params
    rng = np.random.default_rng(5)
    B = batch["text_ids"].shape[0]
    prompt = rng.integers(1, 256, 7)
    labels = np.full((B, 12), -100, np.int32)
    labels[0, :6] = rng.integers(1, 256, 6)
    labels[1, :4] = rng.integers(1, 256, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["text_ids"], batch["attention_mask"], batch["latents"],
        batch["audio_mask"], jnp.asarray(labels), train=False,
        method=QwenCALM.forward_asr,
    )

    def run(width):
        ids = np.zeros((B, width), np.int32)
        mask = np.zeros((B, width), np.int32)
        ids[:, :7] = prompt
        mask[:, :7] = 1
        out = model.apply(
            params, jnp.asarray(ids), jnp.asarray(mask),
            batch["latents"], batch["audio_mask"], jnp.asarray(labels),
            train=False, rngs={"flow": jax.random.PRNGKey(3)},
            method=QwenCALM.forward_asr,
        )
        return float(out["loss"])

    assert run(8) == run(12)
