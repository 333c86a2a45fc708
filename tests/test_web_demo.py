"""Drive scripts/web_demo.py end-to-end through a stubbed gradio module.

The reference web demo is broken (loads a nonexistent `model.output_head`,
stub task fns — SURVEY.md §7); ours is rebuilt on the real NAR pipelines but
gradio is not installed in CI. This stub records the callbacks that
`gr.Button.click` registers and invokes them directly, so the demo's actual
TTS and ASR paths (CALMInference + renderer + mel->VAE->flow->nearest-token)
are exercised without the UI dependency.
"""

import os
import sys
import types

import numpy as np
import pytest

TINY_YAML = """
model:
  latent_dim: 8
  max_audio_len: 32
  # must exceed the ~57-token ChatML prompt overhead so a short text stays a
  # single tts_long chunk (the byte tokenizer spends one id per character)
  max_text_len: 96
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
  audio_buckets: [16, 32]
"""


class _Widget:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _make_fake_gradio(registry):
    gr = types.ModuleType("gradio")

    class Button(_Widget):
        def click(self, fn, inputs, outputs):
            registry["clicks"].append(fn)

    class Blocks(_Widget):
        def launch(self, **kw):
            registry["launched"] = kw

    for name in ("Markdown", "Tab", "Textbox", "Slider", "Audio"):
        setattr(gr, name, _Widget)
    gr.Button = Button
    gr.Blocks = Blocks
    return gr


def test_web_demo_tts_and_asr_paths(tmp_path, monkeypatch):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)

    registry = {"clicks": [], "launched": None}
    monkeypatch.setitem(sys.modules, "gradio", _make_fake_gradio(registry))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import web_demo

    rc = web_demo.main(["--config", str(cfg_path), "--cpu", "--byte-tokenizer"])
    assert rc == 0
    assert registry["launched"] is not None
    assert len(registry["clicks"]) == 2
    tts_fn, asr_fn = registry["clicks"]

    sr, wav = tts_fn("hello world", steps=2, cfg_scale=1.5)
    assert sr == 16000
    assert wav.dtype == np.int16
    # bucketed grid: n latent frames -> 4n mel frames -> 4n*256 samples via
    # HiFi-GAN or (4n-1)*256 via the Griffin-Lim fallback's iSTFT
    assert wav.shape[0] >= 1024
    assert wav.shape[0] % 1024 in (0, 1024 - 256)

    # round-trip the synthesized audio through the ASR tab
    text = asr_fn((16000, wav), steps=2)
    assert isinstance(text, str)

    # an upload past the 32-latent budget (32*1024 samples) takes the
    # asr_long chunked path instead of silently truncating
    rng = np.random.default_rng(2)
    long_wav = (np.clip(rng.standard_normal(3 * 32 * 1024) * 0.2, -1, 1)
                * 32767).astype(np.int16)
    long_text = asr_fn((16000, long_wav), steps=2)
    assert isinstance(long_text, str)


def test_web_demo_without_gradio_is_graceful(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", None)  # forces ImportError
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import web_demo

    assert web_demo.main(["--config", "configs/calm.yaml"]) == 1
