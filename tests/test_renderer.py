"""NeRF MLP + renderer integration tests (shapes, determinism, gradients)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfmatch_tpu.config import dict2namespace
from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params, nerf_apply
from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.nerf.rays import sample_nerf_rays


def small_render_config(**over):
    cfg = {
        "data": {"img_wh": [64, 64]},
        "render": {
            "chunksize": 4096,
            "use_viewdirs": True,
            "use_disp": False,
            "perturb": True,
            "white_bg": False,
            "noise_std": 1.0,
        },
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {
            "method": "NeRF", "layer_num": 3, "hid_dim": 32, "output_dim": 4,
            "skips": [1], "num_pts": 8,
        },
        "fine_nerf": {
            "method": "NeRF", "layer_num": 3, "hid_dim": 32, "output_dim": 4,
            "skips": [1], "num_pts": 8,
        },
        "loss": {"ray_reg_weight": 0.01},
    }
    cfg.update(over)
    return dict2namespace(cfg)


def make_rays(n=16):
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    c2w = jnp.eye(4).at[2, 3].set(-0.5)
    rays = sample_nerf_rays(64, 64, K, c2w, ds=8)
    return rays[:n]


def test_nerf_mlp_shapes_and_feature_tap():
    cfg = NerfConfig(layer_num=8, hid_dim=256, xyz_dim=90, dirs_dim=27,
                     use_viewdirs=True, stop_layer=3)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 90 + 27))
    out, feat = nerf_apply(params, cfg, x)
    assert out.shape == (32, 4)
    assert feat.shape == (32, 256)
    # rgb sigmoid-bounded
    assert np.all(np.asarray(out[:, :3]) >= 0) and np.all(np.asarray(out[:, :3]) <= 1)


def test_nerf_mlp_skip_connection_uses_input():
    """Skip at layer 4: changing input xyz must change post-skip activations
    even if early-layer weights were zeroed."""
    cfg = NerfConfig(layer_num=6, hid_dim=16, xyz_dim=8, dirs_dim=0,
                     use_viewdirs=False, skips=(2,))
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    # Layer 3 (post-skip) consumes hid+xyz input.
    assert params["pts_linears"][3]["weight"].shape[0] == 16 + 8
    x1 = jnp.ones((4, 8))
    x2 = 2 * jnp.ones((4, 8))
    o1, _ = nerf_apply(params, cfg, x1)
    o2, _ = nerf_apply(params, cfg, x2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_renderer_forward_shapes():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(16)
    preds = renderer.render_rays(params, rays, key=jax.random.PRNGKey(1), train=True)
    assert preds["rgb_coarse"].shape == (16, 3)
    assert preds["rgb_fine"].shape == (16, 3)
    assert preds["depth_fine"].shape == (16,)
    assert preds["weights_fine"].shape == (16, 8)
    assert preds["s_fine"].shape == (16, 9)
    assert np.all(np.isfinite(np.asarray(preds["rgb_fine"])))


def test_renderer_validation_mode_features():
    renderer = NerfRenderer(small_render_config(), stop_layer=1)
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(16)
    preds = renderer.render_rays(params, rays, train=False, ret_pfeat=True)
    assert preds["feat_fine"].shape == (16, 32)  # hid_dim features
    assert preds["pts_fine"].shape == (16, 3)
    # Composited points must lie within the scene sphere (weights sum <= 1).
    assert np.all(np.linalg.norm(np.asarray(preds["pts_fine"]), axis=-1) < 1.5)


def test_renderer_deterministic_eval():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(8)
    p1 = renderer.render_rays(params, rays, train=False)
    p2 = renderer.render_rays(params, rays, train=False)
    assert np.array_equal(np.asarray(p1["rgb_fine"]), np.asarray(p2["rgb_fine"]))


def test_renderer_gradients_flow():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(8)
    target = jnp.ones((8, 3)) * 0.5

    def loss_fn(p):
        preds = renderer.render_rays(p, rays, key=jax.random.PRNGKey(2), train=True)
        return jnp.mean((preds["rgb_fine"] - target) ** 2) + \
            jnp.mean((preds["rgb_coarse"] - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    g = np.asarray(grads["nerf_fine"]["pts_linears"][0]["weight"])
    assert np.any(g != 0)
    gc = np.asarray(grads["nerf_coarse"]["pts_linears"][0]["weight"])
    assert np.any(gc != 0)


def test_renderer_predict_chunked_consistent():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(40)  # not a multiple of the chunk
    full = renderer.render_rays(params, rays, train=False)
    chunked = renderer.predict(params, rays, chunk_rays=16)
    assert np.allclose(np.asarray(full["rgb_fine"]), chunked["rgb_fine"], atol=1e-5)


def test_renderer_jit_compiles():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = make_rays(8)
    fn = renderer.render_fn()
    out = fn(params, rays, key=jax.random.PRNGKey(0), train=True)
    assert out["rgb_fine"].shape == (8, 3)


def test_render_novel_view():
    renderer = NerfRenderer(small_render_config())
    params = renderer.init_params(jax.random.PRNGKey(0))
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[2, 3] = -0.5
    unnorm = np.eye(4) * 2.0
    unnorm[3, 3] = 1.0
    # World pose = unnorm @ normalized pose.
    c2w_world = unnorm @ c2w
    outs = renderer.render_novel_view(params, (64, 64), K, c2w_world, unnorm, downsample=8)
    assert outs["im_pred"].shape == (8, 8, 3)
    assert outs["pt3d"].shape == (64, 3)
    assert outs["pt_feat"].shape == (64, 32)


def test_single_model_renderer():
    """single_model: the fine MLP serves both hierarchy stages."""
    cfg = small_render_config()
    cfg.render.single_model = True
    delattr(cfg, "coarse_nerf")
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    assert "nerf_coarse" not in params
    preds = renderer.render_rays(params, make_rays(8), train=False)
    assert preds["rgb_coarse"].shape == (8, 3)
    assert preds["rgb_fine"].shape == (8, 3)


def test_out_scr_heads():
    """Scene-coordinate-regression heads produce scr_* outputs in training."""
    cfg = small_render_config()
    cfg.data.out_scr = True
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    assert "pnt_block" in params["nerf_fine"]
    preds = renderer.render_rays(params, make_rays(8),
                                 key=jax.random.PRNGKey(1), train=True,
                                 validation=False)
    assert "scr_fine" in preds
    assert preds["scr_fine"].shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(preds["scr_fine"])))


def test_fused_predict_scan_grouping_matches_single():
    """Scan-grouped fused_predict == per-chunk dispatch, incl. the padded
    tail chunk (the group path must not change any output value)."""
    from nerfmatch_tpu.config import dict2namespace

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, stop_layer=3)
    renderer.fused_interpret = True  # CPU: run the Pallas kernels interpreted
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    n = 300  # pads to 384 = 3 chunks of 128: one scan group of 2 + 1 single
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1).astype(np.float32)

    grouped = renderer.fused_predict(params, rays, chunk_rays=128,
                                     scan_chunks=2)
    single = renderer.fused_predict(params, rays, chunk_rays=128,
                                    scan_chunks=1)
    assert set(grouped) == set(single)
    for k in single:
        a, b = np.asarray(grouped[k]), np.asarray(single[k])
        assert a.shape == b.shape, k
        # Same kernels, but the scan program compiles (and so fuses/rounds)
        # separately from the per-chunk program: ulp-level f32 drift only.
        assert np.abs(a - b).max() < 1e-4, (k, np.abs(a - b).max())


def test_fused_predict_scan_grouping_with_appearance():
    """Scan-grouped fused_predict threads per-ray appearance ids correctly
    (the rid stack must stay aligned with its ray chunks)."""
    from nerfmatch_tpu.config import dict2namespace

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip",
                      "appearance_embed": True},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, num_frames=5, stop_layer=3)
    renderer.fused_interpret = True
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(12)
    n = 256  # exactly one scan group of 2 x 128, no tail
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1).astype(np.float32)
    ray_id = rng.integers(0, 5, n).astype(np.int32)

    grouped = renderer.fused_predict(params, rays, chunk_rays=128,
                                     scan_chunks=2, ray_id=ray_id)
    single = renderer.fused_predict(params, rays, chunk_rays=128,
                                    scan_chunks=1, ray_id=ray_id)
    for k in single:
        a, b = np.asarray(grouped[k]), np.asarray(single[k])
        assert a.shape == b.shape, k
        assert np.abs(a - b).max() < 1e-4, (k, np.abs(a - b).max())
