"""NN primitives as param pytrees + pure apply fns (torch-layout names).

Weights are stored as (in, out) — transposed from torch Linear — and conv
kernels as (kh, kw, in, out) HWIO; the checkpoint bridge handles the
transposes.  Initializers replicate torch defaults so fresh training matches
the reference's initial conditions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Linear / LayerNorm / MLP
# ---------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, bias: bool = True):
    """torch.nn.Linear default init (Kaiming-uniform fan_in, U bias)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    p = {"weight": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return p


def init_linear_kaiming(key, in_dim: int, out_dim: int, bias: bool = True):
    """Kaiming-normal fan_out (relu) init used by LoFTR's FinePreprocess."""
    kw, kb = jax.random.split(key)
    std = jnp.sqrt(2.0 / out_dim)
    p = {"weight": jax.random.normal(kw, (in_dim, out_dim), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(params, x):
    y = x @ params["weight"]
    if "bias" in params:
        y = y + params["bias"]
    return y


def init_layernorm(dim: int):
    return {"weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * params["weight"] + params["bias"]


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),  # torch nn.GELU (erf)
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.01),
    "sigmoid": jax.nn.sigmoid,
    "star_relu": lambda x: 0.8944 * jax.nn.relu(x) ** 2 - 0.4472,  # MetaFormer StarReLU
}


def init_mlp(key, layer_dims, bias: bool = True):
    """Plain MLP matching the reference's ``modules.attention.MLP``."""
    keys = jax.random.split(key, len(layer_dims) - 1)
    return [init_linear(k, layer_dims[i], layer_dims[i + 1], bias=bias)
            for i, k in enumerate(keys)]


def mlp_apply(params, x, relu: bool = False, sigmoid: bool = False,
              last_relu: bool = False):
    n = len(params)
    for i, p in enumerate(params):
        x = linear(p, x)
        if relu and i != n - 1:
            x = jax.nn.relu(x)
    if sigmoid:
        x = jax.nn.sigmoid(x)
    if last_relu:
        x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Conv2D (NHWC / HWIO — TPU-preferred layouts)
# ---------------------------------------------------------------------------

def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int, bias: bool = True,
              groups: int = 1):
    kkey, bkey = jax.random.split(key)
    fan_in = kh * kw * in_ch // groups
    bound = 1.0 / jnp.sqrt(fan_in)
    p = {"weight": jax.random.uniform(
        kkey, (kh, kw, in_ch // groups, out_ch), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(bkey, (out_ch,), jnp.float32, -bound, bound)
    return p


def conv2d(params, x, stride=1, padding="SAME", groups: int = 1):
    """NHWC conv; padding may be 'SAME'/'VALID' or an int (symmetric)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, params["weight"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"]
    return y
