import jax.numpy as jnp
import numpy as np
import pytest

from nerfmatch_tpu.utils import geometry as geo


def random_pose(rng):
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.linalg.det(q))
    t = rng.normal(size=3)
    return np.asarray(geo.get_pose(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32)))


def test_pose_pack_invert():
    rng = np.random.default_rng(0)
    pose = random_pose(rng)
    inv = np.asarray(geo.invert_pose(jnp.asarray(pose)))
    assert np.allclose(inv @ pose, np.eye(4), atol=1e-5)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    q *= np.sign(q[0])
    R = geo.qvec2rotmat(q)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    q2 = geo.rotmat2qvec(R)
    assert np.allclose(q, q2, atol=1e-8)


def test_rodrigues_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    rvec = rng.normal(size=3)
    R_ours = np.asarray(geo.rodrigues(jnp.asarray(rvec, jnp.float32)))
    R_cv = cv2.Rodrigues(rvec)[0]
    assert np.allclose(R_ours, R_cv, atol=1e-3)


def test_rotation_angle():
    theta = 0.3
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    ang = float(geo.rotation_angle_deg(jnp.asarray(R, jnp.float32)))
    assert np.isclose(ang, np.degrees(theta), atol=1e-4)


def test_project_unproject_consistency():
    rng = np.random.default_rng(3)
    K = np.asarray(geo.get_K(500.0, 500.0, 640, 480))
    c2w = random_pose(rng)
    w2c = np.asarray(geo.invert_pose(jnp.asarray(c2w)))
    # Points in front of the camera.
    pts_cam = rng.uniform([-1, -1, 2], [1, 1, 5], size=(100, 3))
    pts_world = (c2w[:3, :3] @ pts_cam.T).T + c2w[:3, 3]
    pix, depth = geo.project_points3d(
        jnp.asarray(K, jnp.float32), jnp.asarray(w2c[:3, :3], jnp.float32),
        jnp.asarray(w2c[:3, 3], jnp.float32), jnp.asarray(pts_world, jnp.float32),
        ret_depth=True,
    )
    assert np.allclose(np.asarray(depth), pts_cam[:, 2], atol=1e-3)
    # Manual projection.
    proj = (K @ (pts_cam / pts_cam[:, 2:]).T).T[:, :2]
    assert np.allclose(np.asarray(pix), proj, atol=1e-2)


def test_unproject_depth_roundtrip():
    rng = np.random.default_rng(4)
    K = np.asarray(geo.get_K(100.0, 100.0, 32, 24))
    c2w = random_pose(rng)
    depth = rng.uniform(2, 5, size=(24, 32))
    pts = geo.compute_point3d_from_depth(
        jnp.asarray(c2w, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(depth, jnp.float32), ds=1,
    )
    # Reproject.
    w2c = np.asarray(geo.invert_pose(jnp.asarray(c2w)))
    pts_flat = np.asarray(pts).reshape(3, -1).T
    pix = np.asarray(
        geo.project_points3d(
            jnp.asarray(K, jnp.float32), jnp.asarray(w2c[:3, :3], jnp.float32),
            jnp.asarray(w2c[:3, 3], jnp.float32), jnp.asarray(pts_flat, jnp.float32))
    )
    grid = np.asarray(geo.get_pixel_coords_grid(32, 24)).reshape(-1, 2)
    assert np.allclose(pix, grid, atol=1e-2)


def test_unnormalize_pts():
    T = np.eye(4)
    T[:3, :3] *= 2.0
    T[:3, 3] = [1, 2, 3]
    pts = np.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]])
    out = np.asarray(geo.unnormalize_pts(jnp.asarray(pts, jnp.float32),
                                         jnp.asarray(T[None], jnp.float32)))
    assert np.allclose(out[0, 0], [1, 2, 3])
    assert np.allclose(out[0, 1], [3, 4, 5])


def test_mutual_nn_matching():
    d1 = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    # d2 rows 0..3 match d1 rows 0..3; plus noise rows.
    d2 = jnp.asarray(np.concatenate([np.eye(4, 8), 0.1 * np.ones((2, 8))]).astype(np.float32))
    matches, scores, valid = geo.mutual_nn_matching(d1, d2)
    m = np.asarray(matches)[np.asarray(valid)]
    assert set(map(tuple, m.tolist())) == {(0, 0), (1, 1), (2, 2), (3, 3)}


def test_pose_err():
    rng = np.random.default_rng(5)
    pose = random_pose(rng)
    r_err, t_err = geo.pose_err(jnp.asarray(pose), jnp.asarray(pose))
    assert float(r_err) < 1e-3 and float(t_err) < 1e-6
