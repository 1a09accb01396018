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

# ImageNet ConvFormer weights for from-scratch matcher training
# (model.pretrained: true; the reference pulls these via
# timm.create_model(..., pretrained=True) — modules/__init__.py:94-107).
# Saved as raw state dicts so the trainer's _init_imagenet_backbone can
# load them without timm installed.
timm_fetch() {
  local name="$1"
  [ -e "${name}.pth" ] && { echo "skip ${name}.pth"; return; }
  python - "$name" <<'PY' || echo "timm fetch $name failed (no egress / no timm?)" >&2
import sys, torch
name = sys.argv[1]
try:
    import timm
    m = timm.create_model(name, pretrained=True)
    torch.save(m.state_dict(), f"{name}.pth")
except ImportError:
    # No timm: pull straight from the HF hub layout.
    url = f"https://huggingface.co/timm/{name}/resolve/main/pytorch_model.bin"
    torch.hub.load_state_dict_from_url(url, model_dir=".", file_name=f"{name}.pth")
PY
}
timm_fetch convformer_b36.sail_in1k_384 || true
timm_fetch convformer_b36.sail_in1k || true

echo "done."
