"""Volume rendering: alpha compositing of radiance (and feature) fields.

Functional equivalent of ``volume_render_radiance_field``
(``nerfmatch/nerf/render_utils.py:176-230``) plus the t<->s reparametrization
helpers (:618-645).  All ops are vectorized jnp; the exclusive cumprod uses
``jnp.cumprod`` on a shifted concat exactly like the reference so weights are
bit-comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def volume_render(radiance_field, z_vals, rays_d, noise_std: float = 0.0,
                  white_bg: bool = True, mip: bool = True, input_dim: int = 4,
                  key=None, out_last: bool = False):
    """Alpha-composite per-sample radiance into per-ray maps.

    radiance_field: (R, S, C) with rgb in [:input_dim-1], raw density at
    [input_dim-1], optional extra channels after (``out_last``).
    z_vals: (R, S+1) fenceposts for mip rays, (R, S) for classic rays.

    Returns dict(rgb, disp, acc, weights, depth[, last]).
    """
    rgb = radiance_field[..., : input_dim - 1]
    raw_density = radiance_field[..., input_dim - 1]
    if noise_std > 0.0:
        assert key is not None
        raw_density = raw_density + jax.random.normal(
            key, raw_density.shape, raw_density.dtype) * noise_std
    density = jax.nn.relu(raw_density)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if mip:
        z_mids = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    else:
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        z_mids = z_vals
    dists = dists * jnp.linalg.norm(rays_d, axis=-1)[..., None]
    alpha = 1.0 - jnp.exp(-density * dists)

    # Exclusive cumprod of transmittance, tf-style.
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_mids, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    out = dict(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights,
               depth=depth_map)
    if out_last:
        last_feat = radiance_field[..., input_dim:]
        out["last"] = jnp.sum(
            jax.lax.stop_gradient(weights)[..., None] * last_feat, axis=-2
        )
    return out


def composite_features(weights, feats, comb: str = "lin"):
    """Composite per-sample features along the ray.

    comb='lin': weighted sum (``renderer.py:263-265``); 'max': take the
    feature at the argmax-weight (surface) sample (``renderer.py:257-260``).
    """
    if comb == "max":
        max_ids = jnp.argmax(weights, axis=-1)
        return jnp.take_along_axis(feats, max_ids[..., None, None], axis=-2)[..., 0, :]
    return jnp.sum(weights[..., None] * feats, axis=-2)


# --------------------------------------------------------------------------
# t <-> s reparametrization (mip-NeRF 360 distortion-loss space)
# --------------------------------------------------------------------------

def _g(x, eps: float = 1e-6):
    return 1.0 / (x + eps)


def t_to_s(t_vals, near, far):
    return (_g(t_vals) - _g(near)) / (_g(far) - _g(near))


def s_to_t(s_vals, near, far):
    return _g(s_vals * _g(far) + (1.0 - s_vals) * _g(near))


def contract(x):
    """mip-NeRF 360 scene contraction (eq. 10 of arXiv:2111.12077)."""
    x_mag_sq = jnp.maximum(1e-10, jnp.sum(x**2, axis=-1, keepdims=True))
    z = jnp.where(
        x_mag_sq <= 1.0, x, ((2.0 * jnp.sqrt(x_mag_sq) - 1.0) / x_mag_sq) * x
    )
    return z
