#!/bin/bash
# Download NeRFMatch data artifacts (annotations, retrieval pairs, SAM masks)
# into data/.  Mirrors the reference's data/download_data.sh contract: after
# running, the layout expected by configs/ exists:
#   data/annotations/7scenes_jsons/{raw,sfm}/transforms_<scene>_<split>.json
#   data/annotations/cambridge_jsons/transforms_<scene>_<split>.json
#   data/pairs/{7scenes,cambridge}/<scene>/pairs-*.txt
#   data/mask_preprocessed/cambridge/...
#
# The upstream artifacts are hosted on Google Drive (see the reference repo's
# README); gdown ids below are the published ones.  Annotations can instead be
# regenerated locally from the raw datasets:
#   python -c "from nerfmatch_tpu.data import generate_7scenes_annotations as g; g('data/7scenes', 'data/annotations/7scenes_jsons/raw')"
#   python -c "from nerfmatch_tpu.data import convert_7scenes_pgt_annotations as g; g('pgt/sfm/7scenes', 'data/annotations/7scenes_jsons/sfm')"
#   python -c "from nerfmatch_tpu.data import generate_cambridge_annotations as g; g('data/cambridge', 'data/annotations/cambridge_jsons')"
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

# Retrieval pairs + annotations + masks (ids from the reference release).
fetch 1-gOqAA0-sdiUZmQLRYlGprQdk7ttldfE pairs.tar.gz || true
fetch 1iHwsGwKXZWHxF_o9OMZUnGYKCopO-cKS annotations.tar.gz || true
fetch 1lGgLcA6kZPJcOOrtMFhUml2KpOYio2MO mask_preprocessed.tar.gz || true

echo "done."
