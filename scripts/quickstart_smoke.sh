#!/usr/bin/env bash
# Full-pipeline smoke: every stage through the shipped CLIs on a synthetic
# corpus (no external data/weights). ~5 min on the CPU mesh.
#
#   scripts/quickstart_smoke.sh [workdir]
set -euo pipefail
ROOT=${1:-$(mktemp -d /tmp/acalm_smoke.XXXX)}
echo "== workdir: $ROOT"

# tiny geometry shared by all CALM stages
TINY_MODEL=(
  --override model.qwen_path=null
  --override model.latent_dim=8
  --override data.max_text_len=32 --override data.max_audio_len=48
  --override 'model.qwen={vocab_size: 512, hidden_size: 64, intermediate_size: 128, num_hidden_layers: 2, num_attention_heads: 4, num_key_value_heads: 2, head_dim: 16}'
  --override model.tts_flow_hidden_dim=32 --override model.tts_flow_num_layers=1
  --override model.asr_flow_hidden_dim=32 --override model.asr_flow_num_layers=1
  --override model.flow_num_heads=4 --override 'model.lora={rank: 2, alpha: 4}'
)

echo "== 0. synthetic corpus"
python - "$ROOT" <<'EOF'
import sys, os, wave
import numpy as np
root = sys.argv[1]
raw = os.path.join(root, "raw/dev-clean/1/2"); os.makedirs(raw, exist_ok=True)
sr = 16000; lines = []
for i in range(12):
    fid = f"1-2-{i:04d}"
    t = np.arange(5000 + 700 * i) / sr
    x = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t) * 32767).astype(np.int16)
    with wave.open(os.path.join(raw, fid + ".wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(x.tobytes())
    lines.append(f"{fid} tone number {i}")
open(os.path.join(raw, "1-2.trans.txt"), "w").write("\n".join(lines))
EOF

echo "== 1. mel extraction"
python scripts/process_dataset.py --cpu --input_dir "$ROOT/raw" \
  --output_dir "$ROOT/mels" --dataset librispeech --mel_only

echo "== 2. mel stats"
python scripts/process_dataset.py --stats "$ROOT/mels" --stats_key mel --cpu

echo "== 3. VAE training"
python scripts/train_vae.py --config configs/vae.yaml --cpu --max-steps 30 \
  --override data.data_dir="$ROOT/mels" --override data.train_subsets=dev-clean \
  --override data.eval_data_dir=null --override data.crop_size=24 \
  --override training.per_device_train_batch_size=1 \
  --override model.hidden_channels=32 --override model.norm_num_groups=4 \
  --override model.latent_channels=8 --override training.logging_steps=10 \
  --override training.save_steps=30 --override training.output_dir="$ROOT/vae"

echo "== 4. latent extraction with the trained VAE"
python scripts/process_dataset.py --cpu --input_dir "$ROOT/raw" \
  --output_dir "$ROOT/latents" --dataset librispeech \
  --vae_ckpt "$ROOT/vae/params"

echo "== 5. latent stats + audit"
python scripts/process_dataset.py --stats "$ROOT/latents" --stats_key latent --cpu

echo "== 6. CALM TTS training"
python scripts/train_calm.py --config configs/tts.yaml --cpu --max-steps 6 \
  --byte-tokenizer "${TINY_MODEL[@]}" \
  --override "data.datasets.tts.latent_dir=$ROOT/latents" \
  --override data.datasets.tts.subsets=dev-clean \
  --override training.per_device_train_batch_size=1 \
  --override training.bf16=false --override training.logging_steps=2 \
  --override training.save_steps=6 --override training.output_dir="$ROOT/calm"

echo "== 6b. few-step distillation of the trained TTS head"
python scripts/distill_calm.py --config configs/tts.yaml --cpu --max-steps 4 \
  --byte-tokenizer "${TINY_MODEL[@]}" \
  --task tts --student-steps 2 --teacher-substeps 2 \
  --components "$ROOT/calm/components" \
  --override "data.datasets.tts.latent_dir=$ROOT/latents" \
  --override data.datasets.tts.subsets=dev-clean \
  --override training.per_device_train_batch_size=1 \
  --override training.bf16=false --override training.logging_steps=2 \
  --override training.save_steps=4 --override training.output_dir="$ROOT/calm"
test -d "$ROOT/calm/distill_tts/components"

echo "== 7. sanity checks"
python scripts/sanity_checks.py --config configs/tts.yaml --cpu --byte-tokenizer \
  --latent-audit "$ROOT/latents" --components "$ROOT/calm/components" \
  "${TINY_MODEL[@]}" \
  --override "data.datasets.tts.latent_dir=$ROOT/latents" \
  --override data.datasets.tts.subsets=dev-clean || true

echo "== 8. TTS evaluation (writes wavs)"
python scripts/eval_calm.py --config configs/tts.yaml --cpu --byte-tokenizer \
  --components "$ROOT/calm/components" "${TINY_MODEL[@]}" \
  --override model.vae_path="$ROOT/vae/params" \
  --override "evaluation.datasets.tts.latent_dir=$ROOT/latents" \
  --override evaluation.datasets.tts.subsets=dev-clean \
  --override evaluation.task=tts --override evaluation.max_samples=2 \
  --override evaluation.steps=4 --override evaluation.eval_asr_model=null \
  --override evaluation.output_dir="$ROOT/eval"

ls -la "$ROOT/eval/tts_wavs"
echo "== quickstart smoke PASSED ($ROOT)"
