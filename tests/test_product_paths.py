"""Product-path wiring tests: the scripts must reach HiFi-GAN when
`evaluation.vocoder_path` is set (reference eval_calm.py:169-208 makes
SpeechBrain HiFi-GAN the primary vocoder; Griffin-Lim is only a fallback)."""

import os
import sys
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from audio_calm_tpu.models.vocoder import HiFiGANConfig  # noqa: E402

TINY_YAML = """
model:
  latent_dim: 8
  max_audio_len: 32
  max_text_len: 16
  tts_flow_hidden_dim: 32
  tts_flow_num_layers: 1
  asr_flow_hidden_dim: 32
  asr_flow_num_layers: 1
  flow_num_heads: 4
  qwen:
    vocab_size: 512
    hidden_size: 64
    intermediate_size: 128
    num_hidden_layers: 2
    num_attention_heads: 4
    num_key_value_heads: 2
    head_dim: 16
    rope_theta: 10000.0
evaluation:
  task: tts
  steps: 2
  cfg_scale: 1.5
  max_samples: 1
  output_dir: {out}
  vocoder_path: {voc}
  datasets:
    tts:
      latent_dir: {corpus}
      subsets: dev
"""


def test_eval_calm_uses_hifigan_when_configured(tmp_path, capsys):
    from test_vocoder import _build_tiny_torch_gen

    # full V1 geometry: what load_vocoder's default config expects
    gen = _build_tiny_torch_gen(HiFiGANConfig())
    voc_bin = tmp_path / "hifigan.bin"
    torch.save(gen.state_dict(), str(voc_bin))
    del gen

    corpus = tmp_path / "corpus" / "dev" / "spk"
    os.makedirs(corpus)
    np.savez(corpus / "utt1.npz",
             latent=np.zeros((16, 8), np.float32))
    (corpus / "spk.trans.txt").write_text("utt1 hello world\n")

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML.format(
        out=tmp_path / "evalout", voc=voc_bin, corpus=tmp_path / "corpus"
    ))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import eval_calm

    rc = eval_calm.main(["--config", str(cfg_path), "--cpu", "--byte-tokenizer"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "vocoder: HiFiGANVocoder" in out

    wav_path = tmp_path / "evalout" / "tts_wavs" / "tts_0000.wav"
    with wave.open(str(wav_path)) as w:
        n = w.getnframes()
    # HiFi-GAN output length = latent_frames * 4 (VAE) * 256 (total upsample);
    # Griffin-Lim's iSTFT path would give (frames-1)*256 instead
    assert n > 0 and n % 1024 == 0, n


def test_bench_train_cli_smoke(capsys):
    """scripts/bench_train.py: one JSON line per measured geometry with the
    throughput fields (the reproducible form of BASELINE.md's train-step
    tables; reference counterpart is the thop probe of train_calm.py:521)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import bench_train

    rc = bench_train.main([
        "--task", "vae", "--cpu", "--batch", "2", "--crop", "32",
        "--steps", "1",
    ])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 1
    r = lines[0]
    assert r["task"] == "vae" and r["crop"] == 32
    assert r["step_min_s"] > 0 and r["samples_per_s"] > 0
