"""LoFTR-style 2D sinusoidal position encoding (capability match for
``third_party/loftr/position_encoding.py:8-50``, temp_bug_fix variant).

Computed as a pure function of (d_model, H, W) in NHWC layout; XLA
constant-folds it under jit, so no buffer state is needed.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_encoding_2d(d_model: int, h: int, w: int) -> jnp.ndarray:
    """(h, w, d_model) encoding; channel groups of 4 carry
    [sin(x f), cos(x f), sin(y f), cos(y f)] with 1-indexed positions."""
    y_pos = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]  # (h, 1)
    x_pos = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]  # (1, w)
    n_freq = d_model // 4
    div_term = jnp.exp(
        jnp.arange(0, d_model // 2, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / (d_model // 2))
    )  # (n_freq,)

    xv = x_pos[..., None] * div_term  # (1, w, F)
    yv = y_pos[..., None] * div_term  # (h, 1, F)
    sin_x = jnp.broadcast_to(jnp.sin(xv), (h, w, n_freq))
    cos_x = jnp.broadcast_to(jnp.cos(xv), (h, w, n_freq))
    sin_y = jnp.broadcast_to(jnp.sin(yv), (h, w, n_freq))
    cos_y = jnp.broadcast_to(jnp.cos(yv), (h, w, n_freq))
    # Interleave into channel slots [0::4]=sin_x [1::4]=cos_x [2::4]=sin_y [3::4]=cos_y.
    pe = jnp.stack([sin_x, cos_x, sin_y, cos_y], axis=-1)  # (h, w, F, 4)
    return pe.reshape(h, w, n_freq * 4)


def add_sine_pe(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """Add the sine PE to an (N, H, W, C) feature map."""
    n, h, w, c = x_nhwc.shape
    return x_nhwc + sine_position_encoding_2d(c, h, w)[None]
