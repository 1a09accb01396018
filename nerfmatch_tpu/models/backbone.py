"""ConvFormer (MetaFormer w/ SepConv mixers) image backbone in pure JAX.

From-scratch implementation of the backbone surface the reference imports
from timm (``nerfmatch/modules/__init__.py:94-113``): ConvFormer-B36
``features_only`` with out_indices [0, 1] — i.e. only stages 0 and 1
(depths 3 + 12, dims 128 + 256) are ever instantiated, since the matcher
consumes the 1/8 (and 1/2) feature maps.  Two variants:

* ``init_backbone``: single-scale, stem stride 4 -> stage-1 output at 1/8
  (matches ``timm.create_model(..., out_indices=[idx])``);
* ``init_backbone_8_2``: the reference's ``MetaFormer_MS`` stem-stride
  surgery (stem conv stride 2 pad 3; stage-1 downsample stride 4,
  ``modules/__init__.py:34-36``) -> (1/8 coarse, 1/2 fine) feature pair.

Architecture follows the MetaFormer baselines paper (arXiv:2210.13452):
pre-norm blocks ``x + SepConv(LN(x))`` / ``x + MLP(LN(x))`` with StarReLU,
bias-free LayerNorm, SepConv = pw-expand(2x) -> StarReLU -> dw 7x7 -> pw.
Stages 0/1 of ConvFormer use neither layer-scale nor res-scale.  Everything
is NHWC/HWIO (TPU-native layouts); a timm-checkpoint converter lives in
``train/checkpoint.py``.

A ``tiny`` variant (depths 1+1, dims 16+32) exists for tests.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv, init_linear, linear

_LN_EPS = 1e-6

SUPPORTED = {
    # name: (depths, dims)
    "convformer": ((3, 12), (128, 256)),
    "convformer384": ((3, 12), (128, 256)),
    "caformer": ((3, 12), (128, 256)),      # stages 0-1 of CAFormer are also SepConv
    "caformer384": ((3, 12), (128, 256)),
    "tiny": ((1, 1), (16, 32)),
}


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    depths: tuple
    dims: tuple
    stem_stride: int = 4
    stem_pad: int = 2
    stage1_stride: int = 2
    mlp_ratio: int = 4
    sep_expansion: int = 2
    use_fpn: bool = False

    @property
    def feat_dim(self):
        return self.dims[-1]


def make_config(name: str, two_scale: bool = False) -> BackboneConfig:
    use_fpn = "_fpn" in name
    base = name.replace("_fpn", "")
    for key in SUPPORTED:
        if base.startswith(key):
            base = key
            break
    depths, dims = SUPPORTED[base]
    if two_scale:
        # Stem-stride surgery: 1/2 after stem, 1/8 after stage-1 downsample.
        return BackboneConfig(depths, dims, stem_stride=2, stem_pad=3,
                              stage1_stride=4, use_fpn=use_fpn)
    return BackboneConfig(depths, dims)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _init_star_relu():
    return {"scale": jnp.asarray(1.0 / jnp.sqrt(1.25), jnp.float32),
            "bias": jnp.asarray(-0.5 / jnp.sqrt(1.25), jnp.float32)}


def _star_relu(p, x):
    return p["scale"] * jax.nn.relu(x) ** 2 + p["bias"]


def _init_ln_no_bias(dim):
    return {"weight": jnp.ones((dim,), jnp.float32)}


def _ln_no_bias(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * p["weight"]


def _init_sep_conv(key, dim, expansion):
    mid = dim * expansion
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pwconv1": init_linear(k1, dim, mid),
        "act1": _init_star_relu(),
        "dwconv": init_conv(k2, 7, 7, mid, mid, groups=mid),
        "pwconv2": init_linear(k3, mid, dim),
    }


_FUSED_SEPCONV = [True]


@contextlib.contextmanager
def fused_sepconv_scope(enabled: bool = True):
    """Trace-time gate for the hybrid StarReLU+dw7x7 token-mixer core
    (XLA forward, Pallas backward — see ``ops/pallas/sepconv_kernel``).

    Default ON: ``dw_star_available`` already excludes non-TPU backends
    and odd shapes; the forward is the same XLA composition as the
    unfused path, and the Pallas backward is exact f32 (bit-exact vs a
    HIGHEST-precision grouped conv — XLA's own dw wgrad runs one-pass
    bf16).  The scope exists to force the plain-autodiff path for A/B
    probes and oracle tests."""
    _FUSED_SEPCONV.append(enabled)
    try:
        yield
    finally:
        _FUSED_SEPCONV.pop()


def _sep_conv(p, x):
    """x: (N, H, W, C) channels-last throughout (dwconv is HWIO grouped)."""
    h = linear(p["pwconv1"], x)
    dw_w = p["dwconv"]["weight"]
    if _FUSED_SEPCONV[-1]:
        from ..ops.pallas.sepconv_kernel import dw_star, dw_star_available
        if dw_star_available(h, dw_w):
            # StarReLU + 7x7 depthwise with a Pallas custom VJP — XLA's
            # autodiff lowers each stage-0 dw wgrad to a ~3.3 ms mega-
            # reduction fusion at the production step (scripts/
            # trunk_bwd_probe.py, prof_step trace in PARITY).
            h = dw_star(h, dw_w[:, :, 0, :], p["dwconv"]["bias"],
                        p["act1"]["scale"], p["act1"]["bias"])
            return linear(p["pwconv2"], h)
    h = _star_relu(p["act1"], h)
    h = conv2d(p["dwconv"], h, stride=1, padding=3, groups=h.shape[-1])
    return linear(p["pwconv2"], h)


def _init_block(key, dim, cfg: BackboneConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": _init_ln_no_bias(dim),
        "token_mixer": _init_sep_conv(k1, dim, cfg.sep_expansion),
        "norm2": _init_ln_no_bias(dim),
        "mlp": {
            "fc1": init_linear(k2, dim, dim * cfg.mlp_ratio),
            "act": _init_star_relu(),
            "fc2": init_linear(k3, dim * cfg.mlp_ratio, dim),
        },
    }


def _block(p, x):
    x = x + _sep_conv(p["token_mixer"], _ln_no_bias(p["norm1"], x))
    h = _ln_no_bias(p["norm2"], x)
    h = linear(p["mlp"]["fc2"], _star_relu(p["mlp"]["act"], linear(p["mlp"]["fc1"], h)))
    return x + h


# ---------------------------------------------------------------------------
# Full backbone
# ---------------------------------------------------------------------------

def init_metaformer(key, cfg: BackboneConfig, in_ch: int = 3):
    n_stages = len(cfg.depths)
    keys = jax.random.split(key, 1 + n_stages + sum(cfg.depths))
    params = {
        "stem": {
            "conv": init_conv(keys[0], 7, 7, in_ch, cfg.dims[0]),
            "norm": _init_ln_no_bias(cfg.dims[0]),
        },
        "stages": [],
    }
    ki = 1 + n_stages
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        stage = {"blocks": []}
        if s > 0:
            stage["downsample"] = {
                "norm": _init_ln_no_bias(cfg.dims[s - 1]),
                "conv": init_conv(keys[s], 3, 3, cfg.dims[s - 1], dim),
            }
        for _ in range(depth):
            stage["blocks"].append(_init_block(keys[ki], dim, cfg))
            ki += 1
        params["stages"].append(stage)
    return params


def metaformer_apply(params, cfg: BackboneConfig, x_nhwc):
    """Returns per-stage feature maps [(N, H/s0, W/s0, C0), (N, H/s1, W/s1, C1)]."""
    x = conv2d(params["stem"]["conv"], x_nhwc, stride=cfg.stem_stride,
               padding=cfg.stem_pad)
    x = _ln_no_bias(params["stem"]["norm"], x)
    feats = []
    for s, stage in enumerate(params["stages"]):
        if s > 0:
            x = _ln_no_bias(stage["downsample"]["norm"], x)
            x = conv2d(stage["downsample"]["conv"], x,
                       stride=cfg.stage1_stride if s == 1 else 2, padding=1)
        for blk in stage["blocks"]:
            x = _block(blk, x)
        feats.append(x)
    return feats


# ---------------------------------------------------------------------------
# Reference-shaped entry points
# ---------------------------------------------------------------------------

def init_backbone(key, name: str, downsample: int = 8):
    """Single-scale backbone; returns (params, cfg).  ``downsample`` must map
    to stage 1 (1/8) as in the reference's ``init_backbone``."""
    assert downsample == 8, "only the 1/8 single-scale path is used"
    cfg = make_config(name, two_scale=False)
    return init_metaformer(key, cfg), cfg


def backbone_apply(params, cfg: BackboneConfig, img_nhwc):
    """(N, H, W, 3) -> 1/8 feature map (N, H/8, W/8, C)."""
    return metaformer_apply(params, cfg, img_nhwc)[-1]


def _init_conv_kaiming(key, kh, kw, cin, cout, bias=False):
    key, k_w = jax.random.split(key)
    p = init_conv(key, kh, kw, cin, cout, bias=bias)
    std = jnp.sqrt(2.0 / (kh * kw * cout))
    p["weight"] = jax.random.normal(k_w, p["weight"].shape) * std
    return p


_BN_EPS = 1e-5  # torch nn.BatchNorm2d default


def _init_bn(dim):
    """BatchNorm2d state (reference FPN, ``modules/__init__.py:60``):
    affine weight/bias + running stats, all stored as param leaves so the
    checkpoint bridge fills them from ``running_mean``/``running_var``."""
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
            "running_mean": jnp.zeros((dim,)), "running_var": jnp.ones((dim,))}


def _bn_apply(p, x, train: bool = False):
    """NHWC BatchNorm. Eval normalizes with running stats; train uses batch
    stats (biased var, as torch does for normalization).  Running-stat
    momentum updates are host-side bookkeeping the (functional) train step
    does not perform — no reference config trains an FPN variant."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p["running_mean"], p["running_var"]
    inv = jax.lax.rsqrt(var + _BN_EPS) * p["weight"]
    return (x - mean) * inv + p["bias"]


def init_fpn(key, block_dims):
    """FPN merging 1/8 features into the 1/2 map (reference MetaFormer_MS
    ``init_fpn``, modules/__init__.py:42-77)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "layer2_outconv": _init_conv_kaiming(k1, 1, 1, block_dims[1], block_dims[1]),
        "layer1_outconv": _init_conv_kaiming(k2, 1, 1, block_dims[0], block_dims[1]),
        "layer1_outconv2": {
            "conv1": _init_conv_kaiming(k3, 3, 3, block_dims[1], block_dims[1]),
            "bn": _init_bn(block_dims[1]),
            "conv2": _init_conv_kaiming(k4, 3, 3, block_dims[1], block_dims[0]),
        },
    }


def _bilinear_upsample(x, factor):
    """Bilinear upsample with align_corners=True (the reference FPN's
    ``F.interpolate(..., align_corners=True)``, modules/__init__.py:86-88 —
    jax.image.resize implements only the half-pixel convention)."""
    n, h, w, c = x.shape
    H, W = h * factor, w * factor

    def axis_weights(size_in, size_out):
        pos = jnp.linspace(0.0, size_in - 1.0, size_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size_in - 1)
        hi = jnp.minimum(lo + 1, size_in - 1)
        frac = pos - lo
        return lo, hi, frac

    y0, y1, fy = axis_weights(h, H)
    x0, x1, fx = axis_weights(w, W)
    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    rows = top * (1.0 - fy)[None, :, None, None] + bot * fy[None, :, None, None]
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    return left * (1.0 - fx)[None, None, :, None] + right * fx[None, None, :, None]


def fpn_apply(params, x2_coarse, x1_fine, train: bool = False):
    """x2 (1/8), x1 (1/2) -> [coarse_out (1/8), fine_out (1/2)]."""
    x2_out = conv2d(params["layer2_outconv"], x2_coarse, padding=0)
    x2_up = _bilinear_upsample(x2_out, 4)
    x1_out = conv2d(params["layer1_outconv"], x1_fine, padding=0)
    h = x1_out + x2_up
    p = params["layer1_outconv2"]
    h = conv2d(p["conv1"], h, padding=1)
    h = _bn_apply(p["bn"], h, train=train)
    h = jax.nn.leaky_relu(h, 0.01)
    h = conv2d(p["conv2"], h, padding=1)
    return x2_out, h


def init_backbone_8_2(key, name: str):
    """Two-scale (1/8, 1/2) backbone with the MS stem surgery."""
    cfg = make_config(name, two_scale=True)
    k1, k2 = jax.random.split(key)
    params = init_metaformer(k1, cfg)
    if cfg.use_fpn:
        params["fpn"] = init_fpn(k2, list(cfg.dims))
    return params, cfg


def backbone_8_2_apply(params, cfg: BackboneConfig, img_nhwc):
    """(N, H, W, 3) -> (coarse 1/8 (N,H/8,W/8,C1), fine 1/2 (N,H/2,W/2,C0))."""
    f_fine, f_coarse = metaformer_apply(params, cfg, img_nhwc)
    if cfg.use_fpn and "fpn" in params:
        f_coarse, f_fine = fpn_apply(params["fpn"], f_coarse, f_fine)
    return f_coarse, f_fine
