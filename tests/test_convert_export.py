"""Reverse converters: our params -> reference torch layout -> back == id.

Proves bidirectional checkpoint interchange: a model trained here exports
into the reference's component-.bin / peft-adapter layout and reloads
losslessly through the forward converters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.models.calm import QwenCALM, init_calm_params
from audio_calm_tpu.models import convert as C
from audio_calm_tpu.models import convert_export as E


@pytest.fixture(scope="module")
def calm_params():
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=2,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = init_calm_params(model, jax.random.PRNGKey(3))
    # nonzero LoRA B so the adapter round trip is meaningful
    rng = np.random.default_rng(0)
    flat = flatten_dict(params)
    flat = {
        k: (rng.standard_normal(v.shape).astype(np.float32) * 0.05
            if k[-1] == "lora_b" else np.asarray(v))
        for k, v in flat.items()
    }
    from flax.traverse_util import unflatten_dict

    return unflatten_dict(flat)


def _assert_trees_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=1e-6, err_msg=f"{path}/{k}",
            )


def test_flow_head_export_roundtrip(calm_params):
    tree = calm_params["tts_flow_head"]
    sd = E.export_flow_head(tree)
    back = C.convert_flow_head(sd, num_layers=2,
                               has_context="context_proj.weight" in sd)
    _assert_trees_equal(tree, back)


def test_input_projector_export_roundtrip(calm_params):
    tree = calm_params["input_proj"]
    back = C.convert_input_projector(E.export_input_projector(tree))
    _assert_trees_equal(tree, back)


def test_predictor_and_mha_export_roundtrip(calm_params):
    for name in ("tts_len_predictor", "tts_dur_predictor"):
        tree = calm_params[name]
        _assert_trees_equal(tree, C.convert_predictor(E.export_predictor(tree)))
    mha = calm_params["asr_cross_attn"]
    sd = {}
    E.export_mha(mha, "", sd)
    _assert_trees_equal(mha, C.convert_torch_mha(sd))


def test_peft_adapter_export_roundtrip(calm_params):
    sd = E.export_peft_adapter(calm_params["llm"])
    assert sd, "no lora leaves exported"
    back = C.convert_peft_adapter(sd)
    flat = flatten_dict(calm_params["llm"])
    for k, v in flatten_dict(back).items():
        np.testing.assert_allclose(np.asarray(flat[k]), v, atol=1e-6,
                                   err_msg=str(k))


def test_legacy_flow_head_export_roundtrip():
    from audio_calm_tpu.models.calm_heads import FlowMatchingHead

    head = FlowMatchingHead(input_dim=6, output_dim=4, hidden_dim=16,
                            num_layers=2, time_dim=8)
    tree = head.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 6)), jnp.zeros((1, 5, 4)),
        jnp.zeros((1,)),
    )["params"]
    back = C.convert_legacy_flow_head(E.export_legacy_flow_head(tree))
    _assert_trees_equal(tree, back)


def test_vae_export_roundtrip():
    from audio_calm_tpu.config import VAEModelConfig
    from audio_calm_tpu.models.vae import AcousticVAE

    cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                         norm_num_groups=4)
    vae = AcousticVAE(cfg)
    tree = vae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 80)), train=False,
    )["params"]
    back = C.convert_vae_params(E.export_vae(tree))
    _assert_trees_equal(tree, back)


def test_save_reference_checkpoint_reloads_via_soft_restart(
    calm_params, tmp_path
):
    """End-to-end: write reference-layout .bins with torch.save, reload the
    directory through soft_restart onto a fresh init — leaves match."""
    pytest.importorskip("torch")
    from audio_calm_tpu.train.checkpoint import COMPONENTS, soft_restart

    files = E.save_reference_checkpoint(calm_params, str(tmp_path))
    names = {f.split("/")[-1] for f in files}
    assert "tts_flow_head.bin" in names and "adapter_model.bin" in names

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=8,
        tts_flow_hidden_dim=32, tts_flow_num_layers=2,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=128),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    fresh = init_calm_params(model, jax.random.PRNGKey(99))
    restored = soft_restart(
        fresh, {c: str(tmp_path) for c in COMPONENTS + ("lora",)}
    )
    for comp in ("input_proj", "tts_flow_head", "asr_flow_head",
                 "tts_len_predictor", "tts_dur_predictor", "asr_cross_attn"):
        _assert_trees_equal(calm_params[comp], restored[comp], comp)
    np.testing.assert_allclose(np.asarray(calm_params["soa_embed"]),
                               np.asarray(restored["soa_embed"]), atol=1e-6)
    a = flatten_dict(calm_params["llm"])
    b = flatten_dict(restored["llm"])
    for k in a:
        if k[-1] in ("lora_a", "lora_b"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=str(k))
