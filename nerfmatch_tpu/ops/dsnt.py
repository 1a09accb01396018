"""Differentiable spatial-to-numerical transform (soft-argmax) helpers.

Pure-JAX replacements for the kornia calls in the reference's fine matcher
(``third_party/loftr/fine_matching.py:103-117``): ``create_meshgrid`` and
``dsnt.spatial_expectation2d`` over a softmax heatmap, plus the std of the
heatmap used as match uncertainty.
"""

from __future__ import annotations

import jax.numpy as jnp


def create_meshgrid(h: int, w: int, normalized: bool = True) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) coords; normalized to [-1, 1] per axis."""
    if normalized:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


def spatial_expectation2d(heatmap, normalized: bool = True) -> jnp.ndarray:
    """Expected (x, y) coordinate under a (..., H, W) probability map."""
    h, w = heatmap.shape[-2:]
    grid = create_meshgrid(h, w, normalized).reshape(-1, 2)
    flat = heatmap.reshape(*heatmap.shape[:-2], -1)
    return flat @ grid


def heatmap_expectation_with_std(heatmap):
    """(coords (..., 2), std (...,)) of a (..., H, W) probability map.

    std = sum_axes sqrt(E[g^2] - E[g]^2), clamped for stability — matching
    the reference's uncertainty measure (``fine_matching.py:111-117``).
    """
    h, w = heatmap.shape[-2:]
    grid = create_meshgrid(h, w, True).reshape(-1, 2)
    flat = heatmap.reshape(*heatmap.shape[:-2], -1)
    coords = flat @ grid
    var = flat @ (grid**2) - coords**2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, min=1e-10)), axis=-1)
    return coords, std
