"""Scene normalization: frustum-union bounding sphere -> unit-sphere transform.

Functional port of the reference's ``nerfmatch/nerf/scene_utils.py`` (frustum
bounds :14-56, world->nscene similarity :59-80, json-driven "fst" snorm
:83-98, ray/sphere intersection :101-120), written in numpy for the host-side
setup path and jnp for the in-graph ray far-plane solve.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

# Homogeneous (h, w, depth)-fraction image-corner skeleton: camera center plus
# the four far-plane corners of the image frustum.
_CORNERS_HWD = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.float64
)


def frustum_world_bounds(HWs, Ks, cam2worlds, max_depth, format: str = "bbox"):
    """Bounds of the union of camera frustums.

    HWs (N,2) height/width, Ks (N,3,3), cam2worlds (N,4,4), max_depth scalar.
    format='bbox' -> (2,3) min/max corners; 'sphere' -> (center (3,), radius).
    """
    HWs = np.asarray(HWs, dtype=np.float64)
    Ks = np.asarray(Ks, dtype=np.float64)
    c2ws = np.asarray(cam2worlds, dtype=np.float64)
    n = len(HWs)
    k = len(_CORNERS_HWD)

    # Corner pixels in (h, w, 1) order scaled by image size and depth fraction.
    hw1 = np.concatenate([HWs, np.ones((n, 1))], axis=1)  # (n, 3)
    skel = hw1[:, None, :] * _CORNERS_HWD[None]  # (n, k, 3)

    # K rows are (x, y, 1); swap to (y, x, 1) ordering to match the hw skeleton.
    Ks_inv = np.linalg.inv(Ks[:, [1, 0, 2]])
    corners_cam = np.einsum("nij,nkj->nki", Ks_inv, skel) * max_depth
    corners_cam_h = np.concatenate([corners_cam, np.ones((n, k, 1))], axis=-1)
    corners_world = np.einsum("nij,nkj->nki", c2ws, corners_cam_h).reshape(-1, 4)[:, :3]

    if format == "bbox":
        return np.stack([corners_world.min(0), corners_world.max(0)])
    if format == "sphere":
        center = corners_world.mean(0)
        radius = np.linalg.norm(corners_world - center, axis=1).max()
        return center, radius
    raise ValueError(f"Unknown bounds format: {format}")


def compute_world2nscene(HWs, Ks, cam2worlds, max_depth, rescale_factor: float = 1.0):
    """4x4 similarity mapping world coords into the unit sphere enclosing all
    camera frustums ("fst" scene normalization)."""
    assert rescale_factor >= 1.0, "rescale_factor < 1 would push cameras outside the unit sphere"
    center, radius = frustum_world_bounds(HWs, Ks, cam2worlds, max_depth, "sphere")
    radius = radius * rescale_factor
    T = np.eye(4)
    T[:3, :3] /= radius
    T[:3, 3] = -center / radius
    return T.astype(np.float32)


def compute_scene_normalization_fst(transform_json, max_frustum_depth: float = 10,
                                    rescale_factor: float = 1.0):
    """Scene normalization from a ``transforms_*.json`` annotation file."""
    with open(transform_json, "r") as f:
        meta = json.load(f)
    frames = meta["frames"]
    c2ws = np.stack([np.asarray(f["transform_matrix"], dtype=np.float64) for f in frames])
    Ks = np.stack([np.asarray(f["intrinsics"], dtype=np.float64) for f in frames])
    HWs = np.stack([[f["height"], f["width"]] for f in frames]).astype(np.float64)
    return compute_world2nscene(HWs, Ks, c2ws, max_frustum_depth, rescale_factor)


def rays_intersect_sphere(rays_o, rays_d, r: float = 1.0):
    """Forward intersection distance t with the sphere ||o + t d|| = r.

    jnp, jit-safe: returns nan where the ray misses the sphere (callers check
    finiteness on host, matching the reference's assert at
    ``scene_utils.py:117-119``).
    """
    odotd = jnp.sum(rays_o * rays_d, axis=-1)
    d_norm_sq = jnp.sum(rays_d**2, axis=-1)
    o_norm_sq = jnp.sum(rays_o**2, axis=-1)
    det = odotd**2 + (r**2 - o_norm_sq) * d_norm_sq
    # Double-where keeps gradients finite where the ray misses the sphere
    # (sqrt' at negative inputs would propagate NaN through jnp.where).
    det_safe = jnp.where(det >= 0, det, 1.0)
    t = (jnp.sqrt(det_safe) - odotd) / d_norm_sq
    # t <= 0 means the sphere is behind the ray (camera outside, looking
    # away): no FORWARD intersection — callers' far-plane fallback must
    # engage rather than receive a negative far.
    return jnp.where((det >= 0) & (t > 0), t, jnp.nan)
