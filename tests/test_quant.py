"""Weight-only int8 LLM serving (models/quant.py, VERDICT r2 item 5)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import (
    CALMModelConfig, LoRAConfig, Qwen2Config,
)
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.models.qwen2 import Qwen2Model
from audio_calm_tpu.models.quant import (
    quantize_llm_int8, quantized_bytes_saved,
)


def _tiny_qwen():
    cfg = Qwen2Config.tiny(vocab_size=128)
    model = Qwen2Model(cfg, lora=LoRAConfig(rank=2, alpha=4, dropout=0.0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 10, cfg.hidden_size)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_int8_hidden_state_error_bound():
    model, params, x = _tiny_qwen()
    ref = model.apply({"params": params}, x)
    qparams, qscale = quantize_llm_int8(params)
    out = model.apply({"params": qparams, "qscale": qscale}, x)
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) -
                                ref.astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    # weight-only per-channel int8 on this hidden-64 toy: measured 1.27%.
    # NOTE the round-3 "averages down ~1/sqrt(fan_in)" expectation was
    # measured FALSE (scripts/measure_quant_error.py): per-projection
    # relative error is ~flat in fan-in (0.6% at 64, 0.8% at 1536 —
    # signal and quant noise both scale ~sqrt(fan_in)), and the 28-layer
    # flagship stack accumulates to ~3.4% on random weights. BASELINE.md
    # "int8" carries the numbers; int8 stays opt-in accordingly.
    assert rel < 2e-2, rel
    # kernels really are int8 on every projection; scales mirror the paths
    k = qparams["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert k.dtype == jnp.int8
    s = qscale["layers_0"]["self_attn"]["q_proj"]["kernel_scale"]
    assert s.shape == (k.shape[1],)
    # LoRA adapters and norms untouched
    assert (qparams["layers_0"]["self_attn"]["q_proj"]["lora_a"].dtype
            == jnp.float32)
    assert (qparams["layers_0"]["input_layernorm"]["scale"].dtype
            == jnp.float32)
    assert quantized_bytes_saved(params) > 0


def test_int8_roundtrip_exact_for_small_ints():
    """A kernel whose entries are exact multiples of absmax/127 survives
    quantization losslessly (scale math is right, not just 'close')."""
    from audio_calm_tpu.models.quant import _quantize_kernel

    rng = np.random.default_rng(1)
    ints = rng.integers(-127, 128, (16, 8))
    ints[0, :] = 127  # pin each column's absmax to exactly 127 units
    w = (ints.astype(np.float32) / 127.0
         * rng.uniform(0.5, 2.0, (1, 8)).astype(np.float32))
    q, s = jax.jit(_quantize_kernel)(jnp.asarray(w))
    back = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    np.testing.assert_allclose(back, w, rtol=0, atol=1e-6)


def test_int8_through_full_calm_inference():
    """The qscale collection must flow through every serving apply path
    (encode -> length -> durations -> ODE; the CALMInference wrapper)."""
    from audio_calm_tpu.eval.infer import CALMInference

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(0))
    qparams, qscale = quantize_llm_int8(params)
    assert (qparams["llm"]["layers_0"]["mlp"]["down_proj"]["kernel"].dtype
            == jnp.int8)

    class Tok:
        pad_token_id = 0

        def encode(self, t, add_special_tokens=False):
            return [(ord(c) % 120) + 1 for c in t][:32]

    inf_ref = CALMInference(model, {"params": params}, Tok())
    inf_q = CALMInference(model, {"params": qparams, "qscale": qscale},
                          Tok())
    lat_ref, n_ref = inf_ref.tts("hello", jax.random.PRNGKey(0), steps=4,
                                 cfg_scale=1.5)
    lat_q, n_q = inf_q.tts("hello", jax.random.PRNGKey(0), steps=4,
                           cfg_scale=1.5)
    assert lat_q.shape == lat_ref.shape and np.isfinite(lat_q).all()
    # the quantized path tracks the fp32 path closely end to end
    denom = np.linalg.norm(lat_ref) or 1.0
    assert np.linalg.norm(lat_q - lat_ref) / denom < 0.1


def test_maybe_quantize_from_env(monkeypatch):
    from audio_calm_tpu.models.quant import maybe_quantize_from_env

    _, params, _ = _tiny_qwen()
    variables = {"params": {"llm": params}}
    monkeypatch.delenv("AUDIO_CALM_LLM_WEIGHTS", raising=False)
    assert maybe_quantize_from_env(variables) is variables
    monkeypatch.setenv("AUDIO_CALM_LLM_WEIGHTS", "int8")
    out = maybe_quantize_from_env(variables)
    assert "qscale" in out
    assert (out["params"]["llm"]["layers_0"]["mlp"]["up_proj"]["kernel"]
            .dtype == jnp.int8)
