#!/bin/bash
# Download the published NeRFMatch pretrained checkpoints (per-scene NeRFs +
# matcher ckpts) into pretrained/.  They are PyTorch-Lightning checkpoints;
# this framework loads them through the torch->JAX bridge
# (nerfmatch_tpu/train/checkpoint.py) — see README "Pipeline".
set -e
cd "$(dirname "$0")"

fetch() {
  local id="$1" out="$2"
  if [ -e "${out%.tar*}" ]; then echo "skip $out"; return; fi
  if command -v gdown >/dev/null; then
    gdown "$id" -O "$out"
  else
    echo "gdown unavailable; fetch $out manually (drive id $id)" >&2
    return 1
  fi
  tar -xzf "$out" && rm -f "$out"
}

fetch 1Y2gJeDVeOLk9yNbPKFnnjPzu7poXgD03 nerf.tar.gz || true
fetch 1PJTGz-TTDwhGpyQw9ZVTQBlzg3ru1zJt nerfmatch.tar.gz || true

echo "done."
