"""Pure-JAX geometry core (poses, projection, pixel grids, matching).

Covers the math surface of the reference's ``nerfmatch/utils/geometry.py``
(K construction :58, pose pack/unpack :63-73, homogeneous lifts :139-157,
3D->2D projection :119-136, pixel grids :88-104, depth unprojection :107-116,
scene un-normalization :76-85, quaternion->R :31-50, mutual NN matching
:160-180) as pure ``jnp`` functions usable under ``jit``/``vmap``.  Pose
*solving* (PnP+RANSAC) lives in :mod:`nerfmatch_tpu.pose` on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_numpy(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Intrinsics / poses
# ---------------------------------------------------------------------------

def get_K(focal_x, focal_y, w, h) -> jnp.ndarray:
    """Pinhole K with the principal point at the image center."""
    return jnp.array(
        [[focal_x, 0.0, 0.5 * w], [0.0, focal_y, 0.5 * h], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def get_Rt(pose):
    """Split a 4x4 pose into (R, t)."""
    return pose[..., :3, :3], pose[..., :3, 3]


def get_pose(R, t) -> jnp.ndarray:
    """Pack (R, t) into a 4x4 homogeneous pose."""
    R = jnp.asarray(R)
    t = jnp.asarray(t).reshape(*R.shape[:-2], 3)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(pose) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 pose (R^T, -R^T t)."""
    R, t = get_Rt(pose)
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t,
                       precision=jax.lax.Precision.HIGHEST)
    return get_pose(Rinv, tinv)


def qvec2rotmat(qvec) -> np.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix (host-side numpy)."""
    w, x, y, z = np.asarray(qvec, dtype=np.float64)
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z) (host-side numpy)."""
    R = np.asarray(R, dtype=np.float64)
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
                 R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    q = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def skew(v) -> jnp.ndarray:
    v = jnp.asarray(v)
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec) -> jnp.ndarray:
    """Axis-angle -> rotation matrix.

    Differentiable at the zero rotation (iNeRF's init): uses a smoothed norm
    ``sqrt(|r|^2 + eps)`` instead of ``jnp.linalg.norm``, whose gradient is
    NaN at 0.
    """
    rvec = jnp.asarray(rvec)
    theta = jnp.sqrt(jnp.sum(rvec**2, axis=-1, keepdims=True) + 1e-24)
    axis = rvec / theta
    K = skew(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.eye(3, dtype=rvec.dtype)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return eye + s * K + (1.0 - c) * KK


def rotation_angle_deg(R) -> jnp.ndarray:
    """Geodesic angle of a rotation matrix in degrees."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def pose_err(gt_pose, est_pose):
    """(rotation deg, translation norm) error between two c2w poses.

    Matches the reference metric (``utils/metrics.py:359-369``): the angle of
    R_est R_gt^T and the camera-center distance.
    """
    gt_pose = jnp.asarray(gt_pose)
    est_pose = jnp.asarray(est_pose)
    t_err = jnp.linalg.norm(gt_pose[..., :3, 3] - est_pose[..., :3, 3], axis=-1)
    rel = jnp.matmul(est_pose[..., :3, :3],
                     jnp.swapaxes(gt_pose[..., :3, :3], -1, -2),
                     precision=jax.lax.Precision.HIGHEST)
    return rotation_angle_deg(rel), t_err


# ---------------------------------------------------------------------------
# Projection / grids
# ---------------------------------------------------------------------------

def to_homogeneous(x, axis: int = -1) -> jnp.ndarray:
    ones = jnp.ones_like(jnp.take(x, jnp.array([0]), axis=axis))
    return jnp.concatenate([x, ones], axis=axis)


def unnormalize_pts(pts_normed, unnorm_mat) -> jnp.ndarray:
    """Map scene-normalized points back to world coords via a 4x4 similarity.

    pts_normed: (..., N, 3); unnorm_mat: (..., 4, 4).
    """
    pts_h = to_homogeneous(pts_normed)
    out = jnp.einsum("...ij,...nj->...ni", unnorm_mat, pts_h,
                     precision=jax.lax.Precision.HIGHEST)
    return out[..., :3]


def get_pixel_coords_grid(w: int, h: int, ds: int = 1, center_shift: bool = True,
                          homo: bool = False) -> jnp.ndarray:
    """(h//ds, w//ds, 2|3) pixel coordinates of the ds-grid cell corners
    (optionally shifted to cell centers), xy order."""
    xs, ys = jnp.meshgrid(jnp.arange(w // ds), jnp.arange(h // ds), indexing="xy")
    pts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * ds
    if center_shift:
        pts = pts + ds / 2.0
    if homo:
        pts = to_homogeneous(pts)
    return pts


def project_points3d(K, R, t, pts3d, ret_depth: bool = False):
    """Project world points into pixels with w2c extrinsics (R, t).

    pts3d: (..., N, 3) -> (..., N, 2) pixel coords (+ optional depth).
    """
    hp = jax.lax.Precision.HIGHEST
    if jnp.ndim(t) >= 2:
        pts_cam = jnp.einsum("...ij,...nj->...ni", R, pts3d, precision=hp) \
            + t.reshape(*t.shape[:-1], 1, 3)
    else:
        pts_cam = jnp.einsum("ij,nj->ni", R, pts3d, precision=hp) + t.reshape(-1)
    depth = pts_cam[..., 2]
    pix = jnp.einsum("...ij,...nj->...ni", K, pts_cam / depth[..., None], precision=hp)
    if ret_depth:
        return pix[..., :2], depth
    return pix[..., :2]


def compute_point3d_from_depth(c2w, K, depth, ds: int = 1) -> jnp.ndarray:
    """Unproject a (H, W) depth map to world points, subsampled at ds-cell
    centers; returns (3, H//ds, W//ds)."""
    H, W = depth.shape
    xys = get_pixel_coords_grid(W, H, homo=True).reshape(-1, 3)
    hp = jax.lax.Precision.HIGHEST
    cam = jnp.matmul(jnp.linalg.inv(K), xys.T, precision=hp) * depth.reshape(-1)
    cam_h = to_homogeneous(cam, axis=0)
    world = jnp.matmul(c2w, cam_h, precision=hp)[:3].reshape(3, H, W)
    return world[:, ds // 2 :: ds, ds // 2 :: ds]


# ---------------------------------------------------------------------------
# Descriptor matching
# ---------------------------------------------------------------------------

def mutual_nn_matching(desc1, desc2, threshold: float | None = None, eps: float = 1e-9):
    """Cosine-similarity mutual nearest-neighbor matching (fixed shapes).

    Returns (matches (N1, 2) int32, scores (N1,), valid (N1,) bool): row i is
    the candidate match (i, nn12[i]); ``valid`` marks mutual (and above
    threshold) pairs.  The reference returns a ragged match list
    (``geometry.py:160-180``); here invalid rows are masked instead so the op
    stays jit-compatible.
    """
    d1 = desc1 / (jnp.linalg.norm(desc1, axis=1, keepdims=True) + eps)
    d2 = desc2 / (jnp.linalg.norm(desc2, axis=1, keepdims=True) + eps)
    sim = d1 @ d2.T
    nn12 = jnp.argmax(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)
    ids1 = jnp.arange(sim.shape[0])
    valid = ids1 == nn21[nn12]
    scores = jnp.max(sim, axis=1)
    if threshold is not None:
        valid = valid & (scores > threshold)
    matches = jnp.stack([ids1, nn12], axis=1)
    return matches, scores, valid
