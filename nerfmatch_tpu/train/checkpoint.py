"""Checkpoint bridge + native checkpointing.

Two jobs:

1. **torch -> JAX conversion** for the reference's PyTorch-Lightning
   checkpoints (NeRF renderer + coarse/c2f matchers, incl. the timm
   ConvFormer backbone).  Implements the key surgeries of the reference's
   loaders (strip ``model.`` prefix — ``nerf_evaluator.py:136-140``;
   ``backbone`` -> ``backbone.model`` remap — ``nerfmatch_c2f_trainer.py:
   45-74``; appearance-vocab inference from embedding shapes —
   ``nerf_evaluator.py:73-84``).  Conversion is *template-driven*: we walk
   our freshly-initialized param pytree, derive each leaf's torch key, fetch
   and transpose — so structural mismatches fail loudly with the missing key
   path instead of silently (strict=False) as in the reference.

2. **Native checkpoints**: save/restore (params, opt_state, config, step)
   with orbax — config-in-checkpoint like the reference's
   ``save_hyperparameters``.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from ..config import dict2namespace, namespace2dict


# ---------------------------------------------------------------------------
# torch checkpoint loading (host)
# ---------------------------------------------------------------------------

def load_torch_state_dict(ckpt_path, strip_model_prefix: bool = True):
    """Load a Lightning ckpt -> (state_dict {key: np.ndarray}, hyper_params)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in state.items():
        if strip_model_prefix and k.startswith("model."):
            k = k[len("model."):]
        out[k] = v.detach().cpu().numpy()
    hparams = ckpt.get("hyper_parameters", None)
    return out, hparams


# ---------------------------------------------------------------------------
# Path -> torch-key mapping
# ---------------------------------------------------------------------------

def _is_conv_weight(path, leaf):
    return leaf.ndim == 4


def _torch_key_for_path(path):
    """Map a pytree path (tuple of str/int) to the torch state-dict key."""
    parts = []
    i = 0
    p = list(path)
    while i < len(p):
        seg = p[i]
        if seg == "stages" and i + 1 < len(p) and isinstance(p[i + 1], int):
            # timm FeatureListNet flattens stages.<k> -> stages_<k>.
            parts.append(f"stages_{p[i + 1]}")
            i += 2
            continue
        if seg in ("pt_sa", "im_sa", "fine_sa") and i + 1 < len(p) \
                and isinstance(p[i + 1], int):
            # SelfAttentionBlock wraps layers in nn.Sequential "layers".
            parts.append(seg)
            parts.append("layers")
            parts.append(str(p[i + 1]))
            i += 2
            continue
        if seg == "feedforward" and i + 1 < len(p) and p[i + 1] in ("fc1", "fc2"):
            # FeedForwardNetwork.layers = Sequential(Linear, act, Linear).
            parts.append("feedforward")
            parts.append("layers")
            parts.append("0" if p[i + 1] == "fc1" else "2")
            i += 2
            continue
        if seg == "proj_out" :
            # MultiHeadAttention.proj_out = Sequential(Linear).
            parts.append("proj_out")
            parts.append("0")
            i += 1
            continue
        if seg == "fpn":
            # FPN convs live directly on MetaFormer_MS (NOT under .model):
            # backbone.layer2_outconv.* (modules/__init__.py:44-70).
            i += 1
            continue
        if seg == "layer1_outconv2" and i + 1 < len(p):
            # nn.Sequential(conv, bn, leaky_relu, conv) -> indices 0/1/3.
            parts.append("layer1_outconv2")
            parts.append({"conv1": "0", "bn": "1", "conv2": "3"}[p[i + 1]])
            i += 2
            continue
        if seg == "scale" and parts and parts[-1].startswith("attention"):
            # LSA learned temperature lives on attention.attend.scale.
            parts.append("attend")
            parts.append("scale")
            i += 1
            continue
        parts.append(str(seg))
        i += 1
    return ".".join(parts)


def _transform_leaf(torch_val, our_leaf, path):
    """Orient a torch tensor into our layout (transpose linears, OIHW->HWIO)."""
    v = np.asarray(torch_val)
    if v.ndim == 4 and our_leaf.ndim == 4:
        return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    if v.ndim == 2 and our_leaf.ndim == 2 and path[-1] == "weight":
        # Embedding tables (nn.Embedding, e.g. embedding_a) are (vocab,
        # dim) in BOTH layouts — only nn.Linear weights transpose.
        if any("embedding" in str(p) for p in path):
            return v
        return v.T
    return v.reshape(np.shape(our_leaf))


def convert_torch_params(template, state_dict, prefix: str = "",
                         backbone_extra: str = ""):
    """Fill ``template`` (a freshly-initialized param pytree) from a torch
    state dict.

    prefix: prepended to every torch key (e.g. "" after model-strip).
    backbone_extra: inserted after "backbone." (the c2f MetaFormer_MS wraps
    timm in ``.model`` so its keys are ``backbone.model.*``).
    Returns (params, missing_keys) — missing leaves keep template values.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    missing = []
    new_leaves = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else k.idx for k in keypath
        )
        tkey = _torch_key_for_path(path)
        # FPN leaves live on the MS wrapper itself, never under .model.
        if backbone_extra and tkey.startswith("backbone.") \
                and (len(path) < 2 or path[1] != "fpn"):
            tkey = "backbone." + backbone_extra + tkey[len("backbone."):]
        tkey = prefix + tkey
        if tkey in state_dict:
            new_leaves.append(
                np.asarray(_transform_leaf(state_dict[tkey], leaf, path),
                           np.float32))
        else:
            missing.append(tkey)
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), missing


def export_torch_state_dict(params, prefix: str = "model.",
                            backbone_extra: str = ""):
    """Inverse of :func:`convert_torch_params`: emit a reference-format
    torch state dict {key: np.ndarray} from our param pytree.

    Layouts are re-oriented back (HWIO -> OIHW conv weights, our (in,
    out) linears -> torch (out, in); embedding tables stay (vocab, dim)),
    and keys are generated by the same ``_torch_key_for_path`` mapping
    the importer uses, so ``convert_torch_params(template,
    export_torch_state_dict(params, prefix=""))`` round-trips exactly.
    Use ``prefix='model.'`` (default) for Lightning-style checkpoints and
    ``backbone_extra='model.'`` for the c2f MetaFormer_MS wrapper, i.e.
    the exact inverses of the importer's arguments.  Lets checkpoints
    trained here be consumed by the reference's torch tooling, and
    synthesizes reference-format artifacts for the parity protocol
    (scripts/run_real_parity.sh --synthetic)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else k.idx for k in keypath)
        tkey = _torch_key_for_path(path)
        if backbone_extra and tkey.startswith("backbone.") \
                and (len(path) < 2 or path[1] != "fpn"):
            tkey = "backbone." + backbone_extra + tkey[len("backbone."):]
        v = np.asarray(leaf, np.float32)
        if v.ndim == 4:
            v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        elif v.ndim == 2 and path[-1] == "weight" \
                and not any("embedding" in str(p) for p in path):
            v = v.T
        out[prefix + tkey] = v
    return out


def convert_timm_backbone(template, timm_state_dict):
    """Import a *raw* timm MetaFormer checkpoint (keys ``stages.1.blocks...``
    with dots) into a backbone param template.

    The matcher ckpts store timm's FeatureListNet flattening
    (``stages_1...``), which :func:`convert_torch_params` handles natively;
    this remaps raw-timm dotted stage keys to that convention first, and
    prefixes ``backbone.`` to align with the template path.
    """
    import re

    remapped = {}
    for k, v in timm_state_dict.items():
        k = re.sub(r"^stages\.(\d+)\.", r"stages_\1.", k)
        remapped["backbone." + k] = v
    return convert_torch_params({"backbone": template}, remapped)


def infer_appearance_vocab(state_dict):
    """Appearance-embedding vocab size from the ckpt shapes
    (``nerf_evaluator.py:73-84``)."""
    for k, v in state_dict.items():
        if k.endswith("embedding_a.weight"):
            return int(np.shape(v)[0])
    return None


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir, step: int, params, opt_state=None, config=None,
                    extra: dict | None = None, keep: int = 3,
                    name: str = "ckpt"):
    """Save params (+opt state) with config-in-checkpoint."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"{name}_{step}"
    with ocp.StandardCheckpointer() as saver:
        saver.save(path / "params", jax.device_get(params), force=True)
        if opt_state is not None:
            # Orbax-native: structure-checked restore (a pickled leaf list
            # would silently depend on leaf ordering across optax versions).
            saver.save(path / "opt_state", jax.device_get(opt_state),
                       force=True)
    meta = {"step": step}
    if extra:
        meta.update(extra)
    if config is not None:
        meta["config"] = namespace2dict(config) if not isinstance(config, dict) \
            else config
    (path / "meta.json").write_text(json.dumps(meta, default=float))
    # Prune old checkpoints (keep latest ``keep`` by step).  Match the
    # EXACT name stem: a bare "best_*" glob would also claim (and delete)
    # "best_tmed_*" checkpoints.
    for old in _named_checkpoints(ckpt_dir, name)[:-keep]:
        import shutil
        shutil.rmtree(old)
    return path


def _named_checkpoints(ckpt_dir, name: str):
    """Checkpoint dirs named exactly ``{name}_{step}``, sorted by step."""
    import re

    pat = re.compile(rf"^{re.escape(name)}_(\d+)$")
    return sorted((p for p in Path(ckpt_dir).glob(f"{name}_*")
                   if p.is_dir() and pat.match(p.name)),
                  key=lambda p: int(p.name.rsplit("_", 1)[1]))


def load_checkpoint(path, params_template, opt_state_template=None):
    """Restore a native checkpoint saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as saver:
        params = saver.restore(path / "params", jax.device_get(params_template))
    meta = json.loads((path / "meta.json").read_text())
    config = dict2namespace(meta["config"]) if "config" in meta else None
    opt_state = None
    if opt_state_template is not None:
        if (path / "opt_state").exists():
            with ocp.StandardCheckpointer() as saver:
                restored = saver.restore(
                    path / "opt_state", jax.device_get(opt_state_template))
            # StandardCheckpointer returns plain containers; rebuild the
            # optax state classes from the template's treedef.
            treedef = jax.tree_util.tree_structure(opt_state_template)
            opt_state = jax.tree_util.tree_unflatten(
                treedef, jax.tree_util.tree_leaves(restored))
        elif (path / "opt_state.npy").exists():  # pre-round-2 checkpoints
            leaves = np.load(path / "opt_state.npy", allow_pickle=True)
            treedef = jax.tree_util.tree_structure(opt_state_template)
            opt_state = jax.tree_util.tree_unflatten(treedef, list(leaves))
    return params, opt_state, meta.get("step", 0), config


def latest_checkpoint(ckpt_dir, name: str = "ckpt"):
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    ckpts = _named_checkpoints(ckpt_dir, name)
    return ckpts[-1] if ckpts else None


def load_native_params(path):
    """Raw params pytree from a native checkpoint dir (no template needed —
    StandardCheckpointer restores the saved dict/list structure as-is)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as saver:
        return saver.restore(Path(path).absolute() / "params")


def graft_params(dst, src):
    """Copy every ``src`` leaf into ``dst`` where the same path exists with
    a matching shape (the native-checkpoint analogue of the reference's
    strict=False cross-stage surgery, ``nerfmatch_c2f_trainer.py:45-74`` —
    e.g. warm-starting the C2F matcher from a trained coarse run).

    Returns ``(new_dst, grafted_paths, missing_paths)``; ``missing`` lists
    dst paths absent from src (stay at init) — src-only paths are ignored.
    """
    grafted, missing = [], []

    def rec(d, s, path):
        if isinstance(d, dict):
            if not isinstance(s, dict):
                missing.append(path)
                return d
            return {k: (rec(v, s[k], path + (k,)) if k in s
                        else (missing.append(path + (k,)) or v))
                    for k, v in d.items()}
        if isinstance(d, (list, tuple)):
            if not isinstance(s, (list, tuple)):
                missing.append(path)
                return d
            out = [rec(v, s[i], path + (i,)) if i < len(s)
                   else (missing.append(path + (i,)) or v)
                   for i, v in enumerate(d)]
            return type(d)(out)
        if hasattr(d, "shape") and hasattr(s, "shape") \
                and tuple(d.shape) == tuple(np.shape(s)):
            grafted.append(path)
            return jax.numpy.asarray(s, d.dtype)
        missing.append(path)
        return d

    return rec(dst, src, ()), grafted, missing
