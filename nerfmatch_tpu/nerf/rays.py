"""Ray generation and packing.

Functional port of ``nerfmatch/nerf/render_utils.py:16-104`` (pixel-grid ray
dirs, c2w transform, the 12-dim ray packing
``[o(3), d(3), near, far, viewdir(3), radii(1)]`` and strided ds-grid ray
subsampling).  Everything is pure jnp and jit-safe (the dynamic far-plane
sphere solve returns nan on miss instead of raising).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scene import rays_intersect_sphere

# Ray layout offsets (12-dim mip packing).
RAY_O = slice(0, 3)
RAY_D = slice(3, 6)
RAY_NEAR = 6
RAY_FAR = 7
RAY_VIEWDIR = slice(8, 11)
RAY_RADII = 11


def get_ray_dirs(H: int, W: int, K, flipped_yz: bool = False, return_xys: bool = False):
    """Per-pixel ray directions in camera coords from intrinsics K: (H, W, 3)."""
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    xys = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).astype(jnp.float32)
    dirs = jnp.matmul(xys, jnp.linalg.inv(K).T,
                      precision=jax.lax.Precision.HIGHEST)
    if flipped_yz:
        dirs = dirs * jnp.array([1.0, -1.0, -1.0])
    if return_xys:
        return dirs, xys
    return dirs


def get_rays_c2w(dirs, c2w):
    """Rotate camera-frame dirs into world frame; returns (o, d, unit viewdirs)."""
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d, viewdirs


def prepare_rays_data(rays_o, rays_d, viewdirs=None, near=0.0, far=1.0,
                      flatten: bool = True, comp_radii: bool = False):
    """Pack rays as ``[o, d, near, far (, viewdir) (, radii)]``.

    With ``comp_radii`` the mip cone base radius is derived from the distance
    between vertically neighboring pixel dirs (rays must be an (H, W, .) grid),
    scaled by 2/sqrt(12) as in mip-NeRF.
    """
    if not isinstance(near, jnp.ndarray) or jnp.ndim(near) == 0:
        near = jnp.full_like(rays_d[..., :1], near)
    if not isinstance(far, jnp.ndarray) or jnp.ndim(far) == 0:
        far = jnp.full_like(rays_d[..., :1], far)

    rays = jnp.concatenate([rays_o, rays_d, near, far], axis=-1)
    if viewdirs is not None:
        rays = jnp.concatenate([rays, viewdirs], axis=-1)
    if comp_radii:
        dx = jnp.sqrt(jnp.sum((rays_d[:-1, :, :] - rays_d[1:, :, :]) ** 2, -1))
        dx = jnp.concatenate([dx, dx[-2:-1, :]], axis=0)
        radii = dx[..., None] * 2.0 / jnp.sqrt(12.0)
        rays = jnp.concatenate([rays, radii], axis=-1)
    if flatten:
        rays = rays.reshape(-1, rays.shape[-1])
    return rays


def sample_nerf_rays(H: int, W: int, K, c2w, ds: int = 8, embed_type: str = "mip",
                     near: float = 0.01):
    """Rays at the centers of a ds-strided pixel grid with a dynamic far plane
    at the unit sphere (fallback far=1 where the solve fails)."""
    directions = get_ray_dirs(H, W, K)
    rays_o, _, viewdirs = get_rays_c2w(directions, c2w)
    rays_d = viewdirs

    far = rays_intersect_sphere(rays_o.reshape(-1, 3), viewdirs.reshape(-1, 3), r=1.0)
    far = jnp.where(jnp.isfinite(far), far, 1.0).reshape(H, W, 1)

    rays = prepare_rays_data(rays_o, rays_d, viewdirs, near, far,
                             flatten=False, comp_radii=(embed_type == "mip"))
    c = rays.shape[-1]
    rays = rays[ds // 2 :: ds, ds // 2 :: ds]
    return rays.reshape(-1, c)
