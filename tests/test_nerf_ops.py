"""Golden tests for NeRF math ops: analytic values + statistical invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfmatch_tpu.nerf import embedding as emb
from nerfmatch_tpu.nerf import sampling as samp
from nerfmatch_tpu.nerf import compositing as comp
from nerfmatch_tpu.nerf import rays as raylib
from nerfmatch_tpu.nerf import scene as scenelib


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def test_fourier_embedding_layout():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    F = 4
    out = np.asarray(emb.fourier_embedding(x, F))
    assert out.shape == (1, emb.fourier_embedding_dim(3, F))
    # Layout: [x, sin(1*x), cos(1*x), sin(2*x), cos(2*x), ...]
    assert np.allclose(out[0, :3], [0.5, -0.25, 1.0])
    xv = np.array([0.5, -0.25, 1.0])
    for k in range(F):
        f = 2.0**k
        base = 3 + k * 6
        assert np.allclose(out[0, base : base + 3], np.sin(f * xv), atol=1e-6)
        assert np.allclose(out[0, base + 3 : base + 6], np.cos(f * xv), atol=1e-6)


def test_pe_embedding_layout():
    x = jnp.asarray([[0.3, 0.7, -0.2]])
    F = 3
    out = np.asarray(emb.pe_embedding(x, F))
    assert out.shape == (1, 2 * 3 * F + 3)
    xv = np.array([0.3, 0.7, -0.2])
    # Freq-major sines then cosines, then raw x.
    scaled = np.concatenate([(2.0**k) * xv for k in range(F)])
    assert np.allclose(out[0, : 3 * F], np.sin(scaled), atol=1e-6)
    assert np.allclose(out[0, 3 * F : 6 * F], np.sin(scaled + np.pi / 2), atol=1e-6)
    assert np.allclose(out[0, 6 * F :], xv)


def test_ipe_zero_variance_reduces_to_pe():
    x = jnp.asarray([[0.3, 0.7, -0.2]])
    var = jnp.zeros_like(x)
    F = 5
    mean_enc, var_enc = emb.ipe_embedding(x, var, F)
    pe = emb.pe_embedding(x, F)[..., : 2 * 3 * F]  # strip raw-x tail
    assert np.allclose(np.asarray(mean_enc), np.asarray(pe), atol=1e-6)
    # var of sin under zero-variance Gaussian is 0.
    assert np.all(np.asarray(var_enc) < 1e-6)


def test_ipe_matches_monte_carlo():
    """E[sin(f x)] under N(mu, sigma^2) == exp(-f^2 s^2/2) sin(f mu)."""
    rng = np.random.default_rng(0)
    mu, sig2 = 0.4, 0.09
    F = 3
    mean_enc, _ = emb.ipe_embedding(
        jnp.asarray([[mu, 0.0, 0.0]]), jnp.asarray([[sig2, 0.0, 0.0]]), F
    )
    xs = rng.normal(mu, np.sqrt(sig2), size=200_000)
    for k in range(F):
        f = 2.0**k
        mc = np.sin(f * xs).mean()
        # channel k*3 + 0 is sin(f * x0), freq-major.
        assert np.isclose(float(mean_enc[0, k * 3]), mc, atol=5e-3)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def test_sample_pts_init_linear():
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]])
    near, far = jnp.full((2, 1), 1.0), jnp.full((2, 1), 5.0)
    pts, z = samp.sample_pts_init(o, d, near, far, num_pts=5)
    assert np.allclose(np.asarray(z[0]), [1, 2, 3, 4, 5])
    assert np.allclose(np.asarray(pts[0, :, 2]), [1, 2, 3, 4, 5])


def test_sample_pdf_uniform_weights():
    """Uniform weights -> deterministic samples are uniform over the bins."""
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32))[None].repeat(3, 0)
    weights = jnp.ones((3, 8))
    s = np.asarray(samp.sample_pdf(bins, weights, 17, det=True))
    assert np.allclose(s, np.linspace(0, 1, 17), atol=1e-5)


def test_sample_pdf_concentrated():
    """All weight in one bin -> all samples land in that bin."""
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32))[None]
    w = np.full((1, 8), 1e-8, np.float32)
    w[0, 3] = 1.0
    s = np.asarray(samp.sample_pdf(bins, jnp.asarray(w), 64, det=True))
    inside = (s >= 3 / 8 - 1e-4) & (s <= 4 / 8 + 1e-4)
    assert inside.mean() > 0.95


def test_sample_pdf_distribution():
    """Random-draw samples follow the target pdf."""
    key = jax.random.PRNGKey(0)
    bins = jnp.asarray(np.linspace(0, 1, 3, dtype=np.float32))[None]  # 2 bins
    w = jnp.asarray([[1.0, 3.0]])  # 25% / 75%
    s = np.asarray(samp.sample_pdf(bins, w, 4000, det=False, key=key))
    frac_hi = (s > 0.5).mean()
    assert abs(frac_hi - 0.75) < 0.03


def test_sorted_piecewise_constant_pdf_uniform():
    bins = jnp.asarray(np.linspace(2, 6, 9, dtype=np.float32))[None]
    w = jnp.ones((1, 8))
    s = np.asarray(samp.sorted_piecewise_constant_pdf(bins, w, 16, randomized=False))
    assert s.shape == (1, 16)
    assert np.all(np.diff(s[0]) >= -1e-6)
    assert s[0, 0] >= 2 - 1e-5 and s[0, -1] <= 6 + 1e-5
    # Uniform pdf -> nearly evenly spaced.
    assert np.allclose(np.diff(s[0]), np.diff(s[0]).mean(), atol=1e-3)


def test_sorted_piecewise_constant_pdf_zero_weights_safe():
    bins = jnp.asarray(np.linspace(0, 1, 5, dtype=np.float32))[None]
    w = jnp.zeros((1, 4))
    s = np.asarray(samp.sorted_piecewise_constant_pdf(bins, w, 8, randomized=False))
    assert np.all(np.isfinite(s))


def test_conical_frustum_gaussian_monte_carlo():
    """Stable moment-matched Gaussian ~= MC moments of points in the frustum."""
    rng = np.random.default_rng(1)
    d = np.array([0.0, 0.0, 1.0])
    t0, t1, r_base = 2.0, 2.5, 0.05
    n = 400_000
    # Sample t with pdf ∝ t^2 (cone cross-section area grows as t^2).
    u = rng.uniform(size=n)
    t = (t0**3 + u * (t1**3 - t0**3)) ** (1 / 3)
    # Uniform in disk of radius r_base * t.
    rad = np.sqrt(rng.uniform(size=n)) * r_base * t
    ang = rng.uniform(0, 2 * np.pi, size=n)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang), t], axis=-1)

    mean, cov = samp.conical_frustum_to_gaussian(
        jnp.asarray(d, jnp.float32), jnp.asarray([t0]), jnp.asarray([t1]),
        jnp.asarray([r_base]), diag=True,
    )
    mc_mean = pts.mean(0)
    mc_var = pts.var(0)
    assert np.allclose(np.asarray(mean)[0], mc_mean, atol=2e-3)
    assert np.allclose(np.asarray(cov)[0], mc_var, rtol=0.05, atol=1e-6)


def test_resample_shapes_and_stopgrad():
    key = jax.random.PRNGKey(0)
    R, S = 4, 16
    o = jnp.zeros((R, 3))
    d = jnp.asarray(np.tile([0, 0, 1.0], (R, 1)), jnp.float32)
    radii = jnp.full((R, 1), 0.01)
    t_vals, _ = samp.sample_gaussians_along_rays(
        o, d, radii, S, jnp.full((R, 1), 0.1), jnp.full((R, 1), 2.0), randomized=False)
    assert t_vals.shape == (R, S + 1)
    weights = jnp.ones((R, S))
    new_t, (mean, var) = samp.resample_gaussians_along_rays(
        o, d, radii, t_vals, weights, randomized=False)
    assert new_t.shape == (R, S + 1)
    assert mean.shape == (R, S, 3) and var.shape == (R, S, 3)


# ---------------------------------------------------------------------------
# Compositing
# ---------------------------------------------------------------------------

def test_volume_render_single_opaque_sample():
    """One extremely dense sample -> output is that sample's rgb and depth."""
    R, S = 2, 8
    z = jnp.asarray(np.tile(np.linspace(1, 3, S + 1, dtype=np.float32), (R, 1)))
    rf = np.zeros((R, S, 4), np.float32)
    rf[:, 4, :3] = [0.2, 0.5, 0.9]
    rf[:, 4, 3] = 1e6  # huge density
    out = comp.volume_render(jnp.asarray(rf), z, jnp.asarray([[0, 0, 1.0]] * R),
                             white_bg=False, mip=True)
    z_mid = 0.5 * (np.asarray(z)[0, 4] + np.asarray(z)[0, 5])
    assert np.allclose(np.asarray(out["rgb"]), [0.2, 0.5, 0.9], atol=1e-4)
    assert np.allclose(np.asarray(out["depth"]), z_mid, atol=1e-4)
    assert np.allclose(np.asarray(out["acc"]), 1.0, atol=1e-4)


def test_volume_render_empty_space_white_bg():
    R, S = 1, 8
    z = jnp.asarray(np.tile(np.linspace(1, 3, S + 1, dtype=np.float32), (R, 1)))
    rf = np.zeros((R, S, 4), np.float32)
    rf[..., 3] = -100.0  # relu(density) == 0
    out = comp.volume_render(jnp.asarray(rf), z, jnp.asarray([[0, 0, 1.0]]),
                             white_bg=True, mip=True)
    assert np.allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(out["acc"]), 0.0, atol=1e-5)


def test_volume_render_analytic_uniform_density():
    """Constant density sigma: transmittance exp(-sigma * (t - t0))."""
    sigma = 0.7
    R, S = 1, 2048
    z = jnp.asarray(np.tile(np.linspace(0, 4, S + 1, dtype=np.float32), (R, 1)))
    rf = np.zeros((R, S, 4), np.float32)
    rf[..., :3] = 1.0
    rf[..., 3] = sigma
    out = comp.volume_render(jnp.asarray(rf), z, jnp.asarray([[0, 0, 1.0]]),
                             white_bg=False, mip=True)
    acc_expected = 1 - np.exp(-sigma * 4.0)
    assert np.isclose(float(out["acc"][0]), acc_expected, atol=1e-3)
    # Expected depth of exponential distribution truncated at 4.
    ts = np.linspace(0, 4, 100001)
    pdf = sigma * np.exp(-sigma * ts)
    depth_expected = np.trapezoid(ts * pdf, ts)
    assert np.isclose(float(out["depth"][0]), depth_expected, atol=2e-3)


def test_composite_features_modes():
    weights = jnp.asarray([[0.1, 0.7, 0.2]])
    feats = jnp.asarray([[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]])
    lin = np.asarray(comp.composite_features(weights, feats, "lin"))
    assert np.allclose(lin, [[0.3, 0.9]], atol=1e-6)
    mx = np.asarray(comp.composite_features(weights, feats, "max"))
    assert np.allclose(mx, [[0.0, 1.0]])


def test_t_to_s_roundtrip():
    t = jnp.asarray(np.linspace(0.5, 3.0, 10, dtype=np.float32))
    s = comp.t_to_s(t, t.min(), t.max())
    t2 = comp.s_to_t(s, t.min(), t.max())
    assert np.allclose(np.asarray(t2), np.asarray(t), atol=1e-3)
    assert float(s[0]) < 1e-5 and abs(float(s[-1]) - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# Rays / scene
# ---------------------------------------------------------------------------

def test_ray_dirs_center_pixel():
    K = jnp.asarray([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    dirs = np.asarray(raylib.get_ray_dirs(24, 32, K))
    assert dirs.shape == (24, 32, 3)
    # Pixel at the principal point looks straight down +z.
    assert np.allclose(dirs[12, 16], [0, 0, 1], atol=1e-5)


def test_rays_c2w_identity():
    K = jnp.asarray([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    dirs = raylib.get_ray_dirs(24, 32, K)
    c2w = jnp.eye(4)
    o, d, v = raylib.get_rays_c2w(dirs, c2w)
    assert np.allclose(np.asarray(o), 0.0)
    assert np.allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)


def test_prepare_rays_packing():
    H, W = 8, 8
    K = jnp.asarray([[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]])
    dirs = raylib.get_ray_dirs(H, W, K)
    o, d, v = raylib.get_rays_c2w(dirs, jnp.eye(4))
    rays = raylib.prepare_rays_data(o, v, v, 0.1, 2.0, comp_radii=True)
    assert rays.shape == (H * W, 12)
    assert np.allclose(np.asarray(rays[:, 6]), 0.1)
    assert np.allclose(np.asarray(rays[:, 7]), 2.0)
    assert np.all(np.asarray(rays[:, 11]) > 0)


def test_rays_intersect_sphere():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t = np.asarray(scenelib.rays_intersect_sphere(o, d, r=1.0))
    assert np.allclose(t, [1.0, 1.5], atol=1e-5)


def test_sample_nerf_rays_grid():
    H = W = 64
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    c2w = jnp.eye(4).at[2, 3].set(-0.5)  # camera inside unit sphere
    rays = np.asarray(raylib.sample_nerf_rays(H, W, K, c2w, ds=8))
    assert rays.shape == (64, 12)
    assert np.all(np.isfinite(rays))
    assert np.all(rays[:, 7] > 0)  # far planes solved

    # Camera OUTSIDE the unit sphere looking away: the sphere solve misses
    # and the reference's far=1 fallback must keep every ray finite
    # (render_utils.py:63-68).
    c2w_out = jnp.eye(4).at[2, 3].set(3.0)  # looking +z, sphere behind
    rays_out = np.asarray(raylib.sample_nerf_rays(H, W, K, c2w_out, ds=8))
    assert np.all(np.isfinite(rays_out))
    assert np.all(rays_out[:, 7] == 1.0)


def test_scene_normalization_bounds_cameras():
    """All frustum corners land inside the unit sphere after normalization."""
    rng = np.random.default_rng(0)
    n = 6
    HWs = np.tile([48.0, 64.0], (n, 1))
    Ks = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1.0]]), (n, 1, 1))
    c2ws = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.linalg.det(q))
        pose = np.eye(4)
        pose[:3, :3] = q
        pose[:3, 3] = rng.uniform(-2, 2, 3)
        c2ws.append(pose)
    c2ws = np.stack(c2ws)
    T = scenelib.compute_world2nscene(HWs, Ks, c2ws, max_depth=3.0)
    centers = (T @ np.concatenate([c2ws[:, :3, 3], np.ones((n, 1))], 1).T).T[:, :3]
    assert np.all(np.linalg.norm(centers, axis=1) <= 1.0 + 1e-6)
