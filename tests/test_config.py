import pytest

from audio_calm_tpu.config import (
    CALMConfig,
    VAEConfig,
    VAEModelConfig,
    from_dict,
    load_config,
)


def test_defaults_match_reference_constants():
    cfg = CALMConfig()
    assert cfg.model.latent_dim == 128
    assert cfg.model.mel_mean == pytest.approx(-6.589515)
    assert cfg.model.mel_std == pytest.approx(3.860679)
    assert cfg.mel.n_fft == 1024 and cfg.mel.hop_length == 256
    assert cfg.data.max_audio_len == 384 and cfg.data.max_text_len == 96
    v = VAEModelConfig()
    assert v.total_stride == 4


def test_unknown_key_raises():
    # The reference silently dropped unknown VAE yaml keys; we must not.
    with pytest.raises(KeyError):
        from_dict(VAEModelConfig, {"ssim_wieght": 0.5})


def test_yaml_roundtrip_and_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
model:
  ssim_weight: 0.5
  use_l1_loss: true
  strides: [2, 2]
training:
  learning_rate: 5e-4
  per_device_train_batch_size: 256
"""
    )
    cfg = load_config(str(p), cls=VAEConfig, overrides=["training.learning_rate=1e-3"])
    assert cfg.model.ssim_weight == 0.5
    assert cfg.model.use_l1_loss is True
    assert cfg.training.learning_rate == pytest.approx(1e-3)
    assert cfg.training.per_device_train_batch_size == 256


def test_nested_dataclass_coercion(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
model:
  latent_mean: [0.1, 0.2]
  lora:
    rank: 16
data:
  datasets:
    asr:
      latent_dir: /tmp/x
      subsets: "dev-clean"
"""
    )
    cfg = load_config(str(p), cls=CALMConfig)
    assert cfg.model.lora.rank == 16
    assert cfg.data.datasets["asr"].latent_dir == "/tmp/x"
    assert cfg.model.latent_mean == [0.1, 0.2]


def test_null_rejected_for_non_optional_scalars(tmp_path):
    """`=null` on a non-Optional int/float/str/bool field must raise with
    the field path, not smuggle None through (a None in e.g.
    data.length_group_window surfaced as a TypeError deep inside the batch
    iterator). Optional fields still accept null."""
    p = tmp_path / "cfg.yaml"
    p.write_text("{}\n")
    with pytest.raises(ValueError, match="length_group_window.*null"):
        load_config(str(p), cls=CALMConfig,
                    overrides=["data.length_group_window=null"])
    with pytest.raises(ValueError, match="microbatch_steps"):
        load_config(str(p), cls=CALMConfig,
                    overrides=["training.microbatch_steps=null"])
    # Optional fields keep accepting null
    cfg = load_config(str(p), cls=CALMConfig,
                      overrides=["model.qwen_path=null",
                                 "data.audio_buckets=null"])
    assert cfg.model.qwen_path is None
    assert cfg.data.audio_buckets is None
