"""Qwen2 backbone: shape/mask behavior + exact parity vs HF transformers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import LoRAConfig, Qwen2Config
from audio_calm_tpu.models.convert import convert_qwen2, merge_params
from audio_calm_tpu.models.qwen2 import Qwen2Embed, Qwen2Model

CFG = Qwen2Config.tiny()


def _init(lora=None, gc=False):
    model = Qwen2Model(CFG, lora=lora, gradient_checkpointing=gc, dtype=jnp.float32)
    x = jnp.zeros((2, 8, CFG.hidden_size))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_shapes_and_padding_invariance():
    model, params = _init()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, CFG.hidden_size)), jnp.float32)
    out = model.apply(params, x)
    assert out.shape == (1, 6, CFG.hidden_size)

    # causal + pad masking: appending padded junk must not change valid rows
    junk = jnp.asarray(rng.standard_normal((1, 3, CFG.hidden_size)), jnp.float32)
    x_pad = jnp.concatenate([x, junk], axis=1)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    out_pad = model.apply(params, x_pad, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :6]), np.asarray(out), rtol=2e-4, atol=2e-4
    )


def test_causality():
    model, params = _init()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, CFG.hidden_size)), jnp.float32)
    out1 = model.apply(params, x)
    x2 = x.at[:, 5:].set(0.0)  # change future positions
    out2 = model.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), rtol=1e-5, atol=1e-5
    )


def test_lora_zero_init_is_identity_and_trains():
    lora = LoRAConfig(rank=4, alpha=8, dropout=0.0)
    model_base, params_base = _init()
    model_lora = Qwen2Model(CFG, lora=lora, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 8, CFG.hidden_size)), jnp.float32
    )
    params_lora = model_lora.init(jax.random.PRNGKey(0), x)
    # overlay base weights -> outputs must match exactly (B = 0 at init)
    merged = merge_params(params_lora["params"], params_base["params"])
    out_b = model_base.apply(params_base, x)
    out_l = model_lora.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_l), atol=1e-6)
    # lora leaves exist
    flat = jax.tree_util.tree_leaves_with_path(params_lora["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("lora_a" in n for n in names)


def test_gradient_checkpointing_same_output():
    model, params = _init()
    model_gc, _ = _init(gc=True)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 8, CFG.hidden_size)), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)),
        np.asarray(model_gc.apply(params, x)),
        atol=1e-6,
    )


def test_remat_policy_typo_raises():
    """A misspelled remat_policy must fail loudly, not silently fall back
    to full remat (ADVICE r2)."""
    model = Qwen2Model(CFG, gradient_checkpointing=True, remat_policy="dot",
                       dtype=jnp.float32)
    x = jnp.zeros((1, 4, CFG.hidden_size))
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(0), x)


def test_parity_vs_hf_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.Qwen2Config(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        head_dim=CFG.head_dim,
        rope_theta=CFG.rope_theta,
        rms_norm_eps=CFG.rms_norm_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2Model(hf_cfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    converted = convert_qwen2(sd, CFG)
    model = Qwen2Model(CFG, dtype=jnp.float32)
    embed = Qwen2Embed(CFG)

    ids = np.array([[3, 7, 11, 2, 9, 4]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0]], dtype=np.int64)

    eparams = embed.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    eparams = {"params": merge_params(eparams["params"], converted["embed"])}
    x = embed.apply(eparams, jnp.asarray(ids))

    mparams = model.init(jax.random.PRNGKey(0), x)
    mparams = {"params": merge_params(mparams["params"], converted["model"])}
    ours = np.asarray(model.apply(mparams, x, attention_mask=jnp.asarray(mask)))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    valid = np.asarray(mask, bool)[0]
    diff = np.max(np.abs(ours[0, valid] - ref[0, valid]))
    assert diff < 2e-4, diff


def test_peft_adapter_conversion_parity(tmp_path):
    """Round-trip a real peft LoRA adapter (reference train_calm.py:458-485):
    HF Qwen2 + peft -> adapter_model.bin -> convert_peft_adapter ->
    our LoRA'd Qwen2 hidden states match torch to <1e-5-ish fp32 tolerance."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    peft = pytest.importorskip("peft")

    from audio_calm_tpu.models.convert import convert_peft_adapter
    from audio_calm_tpu.train.checkpoint import soft_restart

    hf_cfg = transformers.Qwen2Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads, head_dim=CFG.head_dim,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_norm_eps,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval().float()
    base_sd = {k: v.numpy() for k, v in hf.model.state_dict().items()}

    lcfg = peft.LoraConfig(
        r=4, lora_alpha=8,
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"],
        lora_dropout=0.0, bias="none", task_type=peft.TaskType.CAUSAL_LM,
    )
    pm = peft.get_peft_model(hf, lcfg).eval()
    # randomize B (peft zero-inits it; a zero adapter would test nothing)
    with torch.no_grad():
        for name, p in pm.named_parameters():
            if "lora_B" in name:
                p.copy_(torch.randn_like(p) * 0.05)

    adapter_sd = peft.get_peft_model_state_dict(pm)
    torch.save(adapter_sd, str(tmp_path / "adapter_model.bin"))

    ids = np.array([[3, 7, 11, 2, 9, 4]], dtype=np.int64)
    with torch.no_grad():
        ref = pm(
            input_ids=torch.from_numpy(ids), output_hidden_states=True
        ).hidden_states[-1].numpy()

    # ours: base conversion + soft_restart from the peft adapter file
    converted = convert_qwen2(base_sd, CFG)
    lora = LoRAConfig(rank=4, alpha=8, dropout=0.0)
    model = Qwen2Model(CFG, lora=lora, dtype=jnp.float32)
    embed = Qwen2Embed(CFG)
    ep = embed.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    ep = {"params": merge_params(ep["params"], converted["embed"])}
    x = embed.apply(ep, jnp.asarray(ids))
    mp = model.init(jax.random.PRNGKey(0), x)["params"]
    mp = merge_params(mp, converted["model"])
    # wrap in the CALM-style top-level layout that soft_restart expects
    tree = soft_restart({"llm": mp}, {"lora": str(tmp_path)})
    ours = np.asarray(model.apply({"params": tree["llm"]}, x))

    assert np.max(np.abs(ours - ref)) < 2e-4, np.max(np.abs(ours - ref))

    # structural check: every targeted projection got both leaves
    conv = convert_peft_adapter({k: v.numpy() for k, v in adapter_sd.items()})
    for li in range(CFG.num_hidden_layers):
        for mod, projs in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                           ("mlp", ("gate_proj", "up_proj", "down_proj"))):
            for proj in projs:
                leaf = conv[f"layers_{li}"][mod][proj]
                assert set(leaf) == {"lora_a", "lora_b"}


def test_parity_vs_hf_gqa_ratio_6():
    """Flagship uses 12 q heads over 2 kv heads (ratio 6); verify the GQA
    broadcast at that ratio against HF."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = Qwen2Config(
        vocab_size=256, hidden_size=96, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=12, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0,
    )
    hf_cfg = transformers.Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.Qwen2Model(hf_cfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    converted = convert_qwen2(sd, cfg)

    model = Qwen2Model(cfg, dtype=jnp.float32)
    embed = Qwen2Embed(cfg)
    ids = np.array([[5, 9, 3, 7]], dtype=np.int64)
    ep = embed.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    ep = {"params": merge_params(ep["params"], converted["embed"])}
    x = embed.apply(ep, jnp.asarray(ids))
    mp = model.init(jax.random.PRNGKey(0), x)
    mp = {"params": merge_params(mp["params"], converted["model"])}
    ours = np.asarray(model.apply(mp, x))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    assert np.max(np.abs(ours - ref)) < 2e-4
