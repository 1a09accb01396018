"""NeRF MLP as a parameter pytree + pure apply function.

Equivalent capability to the reference's ``nerfmatch/nerf/models/nerf.py``:
8x256 MLP with an input skip at layer 4, optional viewdir branch
(feature/alpha heads + 1x128 view layer + sigmoid RGB), optional appearance
embedding concat, the layer-``stop_layer`` *feature tap* used as the NeRF
point descriptor (``nerf.py:99-104,132-143``), and the optional
scene-coordinate-regression head (``out_3d_pnt``, :68-92).

Parameter names/shapes mirror the torch ``state_dict`` layout (weights stored
transposed, (in, out)) so the checkpoint bridge in
:mod:`nerfmatch_tpu.train.checkpoint` is a mechanical transpose.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    layer_num: int = 8
    hid_dim: int = 256
    xyz_dim: int = 3
    dirs_dim: int = 3
    app_dim: int = 0
    output_dim: int = 4
    skips: tuple = (4,)
    use_viewdirs: bool = False
    out_3d_pnt: object = False  # False | True | "short" | "begin" | "viewdir"
    out_add_ch: int = 0
    stop_layer: int = -1
    num_pts: int = 128

    @classmethod
    def from_namespace(cls, ns, **overrides):
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in vars(ns).items() if k in fields}
        kw.update(overrides)
        if "skips" in kw and isinstance(kw["skips"], list):
            kw["skips"] = tuple(kw["skips"])
        return cls(**kw)


# Shared NN primitives (same torch-default init stream: kw/kb split +
# U(-1/sqrt(in), 1/sqrt(in)) — values identical to the previous in-module
# copies).  models/layers.py is import-safe here: nerf/__init__ loads
# embedding before model, so the models -> nerf.embedding edge resolves.
from ..models.layers import init_linear as _init_linear, linear


def init_nerf_params(key, cfg: NerfConfig):
    params = {}
    keys = jax.random.split(key, cfg.layer_num + 8)

    pts_linears = []
    in_dim = cfg.xyz_dim
    for i in range(cfg.layer_num):
        pts_linears.append(_init_linear(keys[i], in_dim, cfg.hid_dim))
        # The skip concat happens *after* layer i when i in skips, so layer
        # i+1 consumes hid+xyz.
        in_dim = cfg.hid_dim + cfg.xyz_dim if i in cfg.skips else cfg.hid_dim
    params["pts_linears"] = pts_linears

    k = cfg.layer_num
    if cfg.use_viewdirs:
        params["feature_linear"] = _init_linear(keys[k], cfg.hid_dim, cfg.hid_dim)
        params["alpha_linear"] = _init_linear(keys[k + 1], cfg.hid_dim, 1)
        params["views_linears"] = [
            _init_linear(
                keys[k + 2], cfg.dirs_dim + cfg.hid_dim + cfg.app_dim, cfg.hid_dim // 2
            )
        ]
        params["rgb_linear"] = _init_linear(keys[k + 3], cfg.hid_dim // 2,
                                            cfg.output_dim - 1)
    else:
        params["output_linear"] = _init_linear(keys[k], cfg.hid_dim, cfg.output_dim)

    if cfg.out_3d_pnt:
        mode = cfg.out_3d_pnt if isinstance(cfg.out_3d_pnt, str) else "default"
        if "viewdir" in mode:
            dims = [cfg.hid_dim // 2, cfg.hid_dim // 2, cfg.out_add_ch]
        elif mode == "short":
            dims = [cfg.hid_dim, cfg.out_add_ch]
        else:  # "begin" / default
            dims = [cfg.hid_dim, cfg.hid_dim // 2, cfg.out_add_ch]
        params["pnt_block"] = [
            _init_linear(keys[k + 4 + i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1)
        ]
    return params


def _effective_stop_layer(cfg: NerfConfig) -> int:
    if cfg.stop_layer >= 0:
        return cfg.stop_layer
    if cfg.out_3d_pnt and isinstance(cfg.out_3d_pnt, str) and "begin" in cfg.out_3d_pnt:
        return 4
    return -1


def nerf_apply(params, cfg: NerfConfig, x, val: bool = False,
               compute_dtype=None):
    """Evaluate the MLP on encoded inputs ``x``: (..., xyz+dirs+app dims).

    Returns ``(outputs, point_feature)`` where outputs is (..., output_dim
    [+ out_add_ch]) and point_feature is the stop-layer activation (the NeRF
    descriptor) — the final hidden state when no stop layer is configured.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): cast inputs + weights for the
    matmul-heavy trunk (TPU MXU fast path); outputs are returned in f32.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)
    input_pts = x[..., : cfg.xyz_dim]
    input_views = x[..., cfg.xyz_dim : cfg.xyz_dim + cfg.dirs_dim]
    input_app = x[..., cfg.xyz_dim + cfg.dirs_dim :]

    stop_layer = _effective_stop_layer(cfg)
    h = input_pts
    stop_feat = None
    for i in range(cfg.layer_num):
        h = jax.nn.relu(linear(params["pts_linears"][i], h))
        if i == stop_layer:
            stop_feat = h
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    pt_feat = h

    if cfg.use_viewdirs:
        alpha = linear(params["alpha_linear"], h)
        feature = linear(params["feature_linear"], h)
        h_rgb = jnp.concatenate([feature, input_views, input_app], axis=-1)
        for lyr in params["views_linears"]:
            h_rgb = jax.nn.relu(linear(lyr, h_rgb))
        rgb = jax.nn.sigmoid(linear(params["rgb_linear"], h_rgb))
        outputs = jnp.concatenate([rgb, alpha], axis=-1)
    else:
        h_rgb = None
        outputs = linear(params["output_linear"], h)

    mode = cfg.out_3d_pnt if isinstance(cfg.out_3d_pnt, str) else (
        "default" if cfg.out_3d_pnt else None)
    if mode is not None and not val:
        if "viewdir" in mode:
            p = h_rgb
        elif "begin" in mode:
            p = stop_feat
        else:
            p = h
        for i, lyr in enumerate(params["pnt_block"]):
            p = linear(lyr, p)
            if i < len(params["pnt_block"]) - 1:
                p = jax.nn.relu(p)
        outputs = jnp.concatenate([outputs, p], axis=-1)

    # Pick the descriptor feature (reference: nerf.py:132-143).
    if cfg.stop_layer >= 0:
        out_feat = stop_feat
    elif mode is not None and "viewdir" in (mode or ""):
        out_feat = h_rgb
    elif mode is not None and "begin" in (mode or ""):
        out_feat = stop_feat
    else:
        out_feat = pt_feat
    if compute_dtype is not None:
        outputs = outputs.astype(jnp.float32)
        out_feat = out_feat.astype(jnp.float32)
    return outputs, out_feat
