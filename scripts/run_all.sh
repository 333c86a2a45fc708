#!/usr/bin/env bash
# End-to-end corpus orchestration (reference preprocess/run_all.sh, without
# its embedded credentials): download -> extract -> mel store -> latent store
# -> manifests, with .done-marker idempotency per stage.
#
# Usage: scripts/run_all.sh <data_root> [vae_ckpt_dir]
set -euo pipefail

ROOT=${1:?usage: run_all.sh <data_root> [vae_ckpt]}
VAE_CKPT=${2:-}
RAW=$ROOT/raw
MELS=$ROOT/mels
LATENTS=$ROOT/latents
mkdir -p "$RAW" "$MELS" "$LATENTS"

done_marker() { echo "$ROOT/.done_$1"; }
run_stage() {
  local name=$1; shift
  local marker; marker=$(done_marker "$name")
  if [[ -f $marker ]]; then
    echo "[skip] $name (done)"
    return 0
  fi
  echo "[run ] $name"
  "$@"
  touch "$marker"
}

fetch() {
  local url=$1 out=$2
  if command -v aria2c >/dev/null; then
    aria2c -x8 -c -d "$(dirname "$out")" -o "$(basename "$out")" "$url"
  else
    wget -c -O "$out" "$url"
  fi
}

download_librispeech() {
  for split in dev-clean test-clean train-clean-100; do
    local tgz=$RAW/$split.tar.gz
    [[ -f $tgz ]] || fetch "https://www.openslr.org/resources/12/$split.tar.gz" "$tgz"
    tar -xzf "$tgz" -C "$RAW"
  done
}

download_libritts_r() {
  for split in dev_clean train_clean_100; do
    local tgz=$RAW/libritts_r_$split.tar.gz
    [[ -f $tgz ]] || fetch "https://www.openslr.org/resources/141/${split}.tar.gz" "$tgz"
    tar -xzf "$tgz" -C "$RAW"
  done
}

process_mels() {
  local src=$1 dst=$2 dataset=$3
  python scripts/process_dataset.py --input_dir "$src" --output_dir "$dst" \
    --dataset "$dataset" --mel_only
}

process_latents() {
  local src=$1 dst=$2 dataset=$3
  [[ -n $VAE_CKPT ]] || { echo "latents need a VAE ckpt arg"; return 1; }
  python scripts/process_dataset.py --input_dir "$src" --output_dir "$dst" \
    --dataset "$dataset" --vae_ckpt "$VAE_CKPT"
}

run_stage dl_librispeech download_librispeech
run_stage dl_libritts download_libritts_r
run_stage mels_libritts process_mels "$RAW/LibriTTS_R" "$MELS/LibriTTS_R" libritts
run_stage stats python scripts/process_dataset.py --stats "$MELS/LibriTTS_R" --stats_key mel
if [[ -n $VAE_CKPT ]]; then
  run_stage lat_libritts process_latents "$RAW/LibriTTS_R" "$LATENTS/LibriTTS_R" libritts
  run_stage lat_librispeech process_latents "$RAW/LibriSpeech" "$LATENTS/LibriSpeech" librispeech
fi
echo "all stages complete"
