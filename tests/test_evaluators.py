"""Evaluator tests: scene-point caching, localization modes, iNeRF."""

import json
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmatch_tpu.config import dict2namespace
from tests._synthetic import build_scene, W, H, DS, FEAT_DIM


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("eval_scene"),
                       correlated_feats=True)


def small_nerf_cfg(scene, split="test"):
    return dict2namespace({
        "data": {
            "dataset": "NerfBaseDataset",
            "data_dir": str(scene["root"]),
            "scene": "toy",
            "img_wh": [W, H],
            "ray_type": "mip",
            "max_frustum_depth": 1,
            "rescale_factor": 1.0,
            "snorm_type": "fst",
            "downsample": DS,
        },
        "coarse_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                        "output_dim": 4, "skips": [1], "num_pts": 8},
        "fine_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                      "output_dim": 4, "skips": [1], "num_pts": 8},
        "embedding": {"xyz_num_freqs": 8, "dirs_num_freqs": 4, "type": "mip"},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "loss": {},
        "exp": {"seed": 0, "batch_size": 512, "max_epochs": 1,
                "check_epochs": 1, "num_workers": 0, "odir": "/tmp/x"},
        "split": split,
        "downsample": DS,
        "ckpt": "eval",
    })


def test_cache_scene_pts_schema(scene, tmp_path):
    """The scene-point cache must satisfy the load_frame_3d contract."""
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.data.loading import load_frame_3d

    cfg = small_nerf_cfg(scene)
    renderer = NerfRenderer(cfg, stop_layer=1)
    params = renderer.init_params(jax.random.PRNGKey(0))
    ev = NerfEvaluator(cfg, renderer, params)
    out_dir = ev.cache_scene_pts(cache_dir=tmp_path, debug=True)
    files = sorted(out_dir.glob("*.npy"))
    assert len(files) >= 1
    # Consume through the matcher-side loader.
    frame = scene["frames"][0]
    pt3d, feat, mask, unnorm = load_frame_3d(frame, str(out_dir))
    n = (W // DS) * (H // DS)
    assert pt3d.shape == (n, 3)
    assert feat.shape == (n, 32)  # hid_dim features at stop layer
    assert unnorm.shape == (4, 4)
    assert np.all(np.isfinite(pt3d))


def test_nerf_eval_data_loader(scene, tmp_path):
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer

    cfg = small_nerf_cfg(scene)
    cfg.data.downsample = 1  # full-res images for PSNR path
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    ev = NerfEvaluator(cfg, renderer, params)
    res = ev.eval_data_loader(cache_dir=tmp_path, debug=True)
    assert len(res["psnr"]) >= 1
    assert (tmp_path / "debug" / "rgb").exists()


def match_eval_cfg(scene):
    return dict2namespace({
        "data": {
            "dataset": "NeRFMatchPair",
            "data_dir": str(scene["root"]),
            "scenes": ["toy"],
            "scene": "toy",
            "scene_dir": str(scene["cache_dir"]),
            "train_pair_txt": str(scene["root"] / "pairs.txt"),
            "test_pair_txt": str(scene["root"] / "pairs.txt"),
            "pair_topk": 2,
            "img_wh": [W, H],
            "model_ds": DS,
            "imagenet_norm": False,
            "balanced_pair": False,
        },
        "model": {
            "backbone": "tiny", "pretrained": False, "cfeat_dim": 32,
            "pt_dim": FEAT_DIM, "im_pe": True, "im_sa": 0, "im_sa_type": None,
            "pt_sa": 0, "pt_sa_type": None, "pt_pe": False,
            "coarse_layers": 0, "temp_type": "mul",
        },
        "exp": {"seed": 0},
        "split": "test",
        "ckpt": "eval",
    })


def test_match_oracle_localizes(scene):
    """Oracle GT matches through the evaluator's PnP path must localize."""
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="train", val_num=4)
    batch = _collate([ds[0]])
    c2w_est, r_err, t_err, n = ev.eval_match_pose(
        batch, match_oracle=True, rthres=6.0, solver="colmap")
    assert c2w_est is not None
    assert r_err < 5.0 and t_err < 0.3, (r_err, t_err)


def test_trained_matcher_localizes(scene):
    """REAL matches end-to-end: overfit the tiny coarse matcher on a synthetic
    pair, then localize with ``match_oracle=False`` — the full
    ``_extract_matches_host`` -> ``dense_to_match_lists`` -> PnP path
    (reference ``nerfmatch_evaluator.py:150-230``) must recover the pose."""
    import optax
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.utils.metrics import compute_matching_loss

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="train", val_num=4)
    batch = _collate([ds[0]])

    img = jnp.asarray(batch["image"])
    pt_feat = jnp.asarray(batch["pt_feat"])
    pt3d = jnp.asarray(batch["pt3d"])
    im_mask = jnp.asarray(np.asarray(batch["im_mask"], np.float32))
    pt_mask = jnp.asarray(np.asarray(batch["pt_mask"], np.float32))
    conf_gt = jnp.asarray(np.asarray(batch["conf_gt"], np.float32))

    model, params = ev.model, ev.params
    opt = optax.adam(4e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = model.forward_match(p, img, pt_feat, pt3d,
                                      im_mask=im_mask, pt_mask=pt_mask)
            return compute_matching_loss(out["conf_matrix"], conf_gt,
                                         clamp=True)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(800):
        params, state, loss = step(params, state)
    ev.params = params

    c2w_est, r_err, t_err, n = ev.eval_match_pose(
        batch, match_oracle=False, mutual=True, rthres=6.0, solver="colmap")
    assert c2w_est is not None
    assert n >= 8, f"too few real matches: {n}"
    # The synthetic pair has 14 grid cells with GT (64 points collide into
    # 14 tokens), so the coarse matcher is quantization-limited: the oracle
    # (64 point-level matches) gets ~3.6deg/0.12; one-match-per-token lands
    # ~8deg/0.3.  Thresholds bound that regime.
    assert r_err < 10.0 and t_err < 0.4, (r_err, t_err, n, float(loss))


def test_eval_bs_batched_queries_match_single(scene):
    """--eval_bs: a B=2 collated batch through ``eval_batch`` must reproduce
    the two per-query results — same device program (batched over queries),
    per-item host PnP (reference protocol is strictly bs=1:
    ``nerfmatch_evaluator.py`` DataLoader(batch_size=1))."""
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="test", val_num=4)
    assert len(ds) >= 2
    singles = [ev.eval_batch(_collate([ds[i]]), mutual=True, rthres=6.0,
                             solver="colmap") for i in range(2)]
    batched = ev.eval_batch(_collate([ds[0], ds[1]]), mutual=True,
                            rthres=6.0, solver="colmap")
    for b in range(2):
        assert batched["num_matches"][b] == singles[b]["num_matches"][0]
        for k in ("R_err", "t_err"):
            sv, bv = singles[b][k][0], batched[k][b]
            if np.isinf(sv):
                assert np.isinf(bv), (k, b)
            else:
                assert bv == pytest.approx(sv, rel=1e-3, abs=1e-5), (k, b)


class _StubNovelViewRenderer:
    """Deterministic stand-in for the NeRF re-render: outputs are a pure
    function of the pose estimate, so the per-query and batched --iters
    paths must feed bit-identical inputs to the matcher to agree."""

    unnorm_scene = np.eye(4, dtype=np.float32)

    def __init__(self, base_pt3d, base_feat, extra_pts: int = 0):
        self.base_pt3d = np.asarray(base_pt3d, np.float32)
        self.base_feat = np.asarray(base_feat, np.float32)
        self.extra = extra_pts

    def render_novel_view(self, params, img_hw, K, c2w, unnorm_scene,
                          downsample=8):
        h = np.float32(np.sum(np.asarray(c2w, np.float64)) % 1.0)
        pt3d, feat = self.base_pt3d, self.base_feat
        if self.extra:
            pt3d = np.concatenate([pt3d, pt3d[: self.extra]])
            feat = np.concatenate([feat, feat[: self.extra]])
        return dict(im_pred=None, pt3d=pt3d + 1e-4 * h,
                    pt_feat=feat + 1e-4 * h)

    def render_novel_views(self, params, img_hw, Ks, c2ws, unnorm_scenes,
                           downsample=8):
        outs = [self.render_novel_view(params, img_hw, Ks[b], c2ws[b],
                                       unnorm_scenes[b], downsample)
                for b in range(len(c2ws))]
        return {k: (np.stack([o[k] for o in outs])
                    if outs[0][k] is not None else None)
                for k in outs[0]}


@pytest.mark.parametrize("extra_pts", [0, 3])
def test_eval_bs_iters2_matches_single(scene, extra_pts):
    """--eval_bs + --iters 2: the batched re-render protocol must reproduce
    the per-query loop bit-for-bit — live queries re-match against the
    re-rendered points, PnP-failed queries keep/zero theirs, and a changed
    point budget (extra_pts>0) reshapes cleanly."""
    import optax
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.utils.metrics import compute_matching_loss

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="test", val_num=4)
    items = [ds[0], ds[1]]
    # Kill query 1's points: its PnP fails at iter 0, exercising the
    # dead-query branch of the batched loop.
    items[1]["pt_mask"] = np.zeros_like(items[1]["pt_mask"])

    # Overfit the tiny matcher so PnP succeeds (real matches, same recipe
    # as test_trained_matcher_localizes; conf_gt only exists off-test).
    b0 = _collate([NeRFMatchPair(cfg.data, split="train", val_num=4)[0]])
    img = jnp.asarray(b0["image"])
    pt_feat = jnp.asarray(b0["pt_feat"])
    pt3d = jnp.asarray(b0["pt3d"])
    conf_gt = jnp.asarray(np.asarray(b0["conf_gt"], np.float32))
    model, params = ev.model, ev.params
    opt = optax.adam(4e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = model.forward_match(p, img, pt_feat, pt3d)
            return compute_matching_loss(out["conf_matrix"], conf_gt,
                                         clamp=True)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(600):
        params, state, _ = step(params, state)
    ev.params = params

    stub = _StubNovelViewRenderer(items[0]["pt3d"], items[0]["pt_feat"],
                                  extra_pts=extra_pts)
    kw = dict(mutual=True, rthres=6.0, solver="colmap", iters=2,
              renderer=stub, renderer_params={})
    singles = [ev.eval_batch(_collate([items[i]]), **kw) for i in range(2)]
    batched = ev.eval_batch(_collate(items), **kw)
    assert np.isfinite(singles[0]["t_err"][0]), \
        "test premise broken: query 0 should localize at iter 0"
    for b in range(2):
        assert batched["num_matches"][b] == singles[b]["num_matches"][0]
        for k in ("R_err", "t_err"):
            sv, bv = singles[b][k][0], batched[k][b]
            if np.isinf(sv):
                assert np.isinf(bv), (k, b)
            else:
                assert bv == pytest.approx(sv, rel=1e-3, abs=1e-5), (k, b)


def test_retrieval_only_mode(scene):
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="test", val_num=4)
    batch = _collate([ds[0]])
    m = ev.eval_batch(batch, retrieval_only=True)
    # Retrieval pose = neighboring frame; small but nonzero error.
    assert np.isfinite(m["R_err"][0])
    assert m["R_err"][0] > 0


def test_eval_multi_scenes_with_cache(scene, tmp_path):
    """Full multi-scene driver: runs, caches, reuses cache."""
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    avg, per_scene = ev.eval_multi_scenes(
        split="val", rthres=6.0, solver="colmap", match_oracle=True,
        cache_dir=tmp_path, debug=True)
    assert avg is not None
    assert "t_med" in avg
    caches = list(tmp_path.glob("*.npy"))
    assert len(caches) == 1
    # Second run hits the cache (no new files, same results).
    avg2, _ = ev.eval_multi_scenes(
        split="val", rthres=6.0, solver="colmap", match_oracle=True,
        cache_dir=tmp_path, debug=True)
    assert avg2["t_med"] == pytest.approx(avg["t_med"])


def test_eval_multi_scenes_iters_requires_nerf_path(scene, tmp_path):
    """--iters>1 re-renders through the NeRF: a missing --nerf_path must
    fail loudly up front, not as FileNotFoundError('None') mid-eval
    (bug found running scripts/run_real_parity.sh --synthetic)."""
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    with pytest.raises(ValueError, match="--nerf_path"):
        ev.eval_multi_scenes(split="val", iters=2, match_oracle=True,
                             cache_dir=tmp_path, debug=True)


def test_parse_nerf_stop_layer_reference_tag():
    """The scene cache encodes its feature tap in the path (reference
    model_eval/README.md:56 `.../inter_layer3/#scene/.../ds8lin`); a
    tagless dir parses as -1, which the --iters path warns about —
    re-rendering a different tap than the cache collapses matches."""
    from nerfmatch_tpu.eval.match_evaluator import parse_nerf_stop_layer

    ref = "outputs/scene_dirs/7scenes/sfm/inter_layer3/chess/mip/last_15ep/ds8lin"
    assert parse_nerf_stop_layer(ref) == 3
    assert parse_nerf_stop_layer("/tmp/x/scene_pts/toy/ds8lin") == -1


def test_inerf_refinement_improves_pose(tmp_path):
    """Train a tiny NeRF on an emissive ball, perturb the pose, iNeRF back."""
    import optax
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.nerf.rays import get_ray_dirs, get_rays_c2w, \
        prepare_rays_data
    from nerfmatch_tpu.nerf.scene import rays_intersect_sphere
    from nerfmatch_tpu.eval.inerf import inerf_refinement
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from tests._synthetic import look_at

    cfg = small_nerf_cfg_for_inerf()
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))

    IM = 32

    def gt_color(rays):
        o, d = rays[:, :3], rays[:, 3:6]
        tmid = -jnp.sum(o * d, -1) / jnp.sum(d * d, -1)
        closest = jnp.linalg.norm(o + tmid[:, None] * d, axis=-1)
        hit = (closest < 0.25) & (tmid > 0)
        return jnp.where(hit[:, None], jnp.asarray([[0.9, 0.2, 0.1]]),
                         jnp.ones((1, 3)))  # white bg to match inerf render

    K = jnp.asarray([[30.0, 0, IM / 2], [0, 30.0, IM / 2], [0, 0, 1]])
    all_rays, all_rgb = [], []
    for ang in np.linspace(0, 2 * np.pi, 10, endpoint=False):
        c2w = jnp.asarray(look_at([0.7 * np.cos(ang), 0.1, 0.7 * np.sin(ang)]),
                          jnp.float32)
        dirs = get_ray_dirs(IM, IM, K)
        o, d, v = get_rays_c2w(dirs, c2w)
        far = rays_intersect_sphere(o.reshape(-1, 3), v.reshape(-1, 3))
        far = jnp.where(jnp.isfinite(far), far, 1.0).reshape(IM, IM, 1)
        rays = prepare_rays_data(o, v, v, 0.01, far, flatten=False,
                                 comp_radii=True).reshape(-1, 12)
        all_rays.append(np.asarray(rays))
        all_rgb.append(np.asarray(gt_color(rays)))
    all_rays = np.concatenate(all_rays)
    all_rgb = np.concatenate(all_rgb)

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def train_step(params, state, rays, rgb, key):
        def loss_fn(p):
            preds = renderer.render_rays(p, rays, key=key, train=True)
            return (jnp.mean((preds["rgb_fine"] - rgb) ** 2)
                    + 0.5 * jnp.mean((preds["rgb_coarse"] - rgb) ** 2))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for i in range(150):
        idx = rng.integers(0, len(all_rays), 512)
        key, k = jax.random.split(key)
        params, state, loss = train_step(params, state,
                                         jnp.asarray(all_rays[idx]),
                                         jnp.asarray(all_rgb[idx]), k)

    # Ground-truth pose + perturbed init.
    c2w_gt = look_at([0.7, 0.1, 0.0])
    from scipy.spatial.transform import Rotation as Rot
    pert = np.eye(4)
    pert[:3, :3] = Rot.from_rotvec([0.0, 0.06, 0.02]).as_matrix()
    pert[:3, 3] = [0.03, -0.02, 0.01]
    c2w_init = c2w_gt @ pert

    # Query image = GT render colors from analytic scene.
    dirs = get_ray_dirs(IM, IM, K)
    o, d, v = get_rays_c2w(dirs, jnp.asarray(c2w_gt, jnp.float32))
    far = rays_intersect_sphere(o.reshape(-1, 3), v.reshape(-1, 3))
    far = jnp.where(jnp.isfinite(far), far, 1.0).reshape(IM, IM, 1)
    rays_q = prepare_rays_data(o, v, v, 0.01, far, flatten=False,
                               comp_radii=True).reshape(-1, 12)
    img = np.asarray(gt_color(rays_q)).reshape(IM, IM, 3)

    ev = _dummy_match_evaluator()
    batch = {
        "image": img[None],
        "K": np.asarray(K)[None],
        "c2w": np.asarray(c2w_gt, np.float32)[None],
    }
    inerf_conf = dict2namespace({"lrate": 0.01, "num_optim": 8, "ds": 2,
                                 "eval_pose": True, "lrdecay": True})
    from nerfmatch_tpu.utils.geometry import pose_err as pe
    r0, t0 = map(float, pe(jnp.asarray(c2w_gt, jnp.float32),
                           jnp.asarray(c2w_init, jnp.float32)))
    c2w_ref, r_err, t_err = inerf_refinement(
        ev, batch, renderer, params, np.eye(4), c2w_init, inerf_conf)
    assert t_err < t0, (t0, t_err)
    assert r_err < r0 + 0.5


def small_nerf_cfg_for_inerf():
    return dict2namespace({
        "data": {"img_wh": [32, 32]},
        "coarse_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                        "output_dim": 4, "skips": [1], "num_pts": 16},
        "fine_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                      "output_dim": 4, "skips": [1], "num_pts": 16},
        "embedding": {"xyz_num_freqs": 8, "dirs_num_freqs": 4, "type": "mip"},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": True, "white_bg": True, "noise_std": 0.0},
        "loss": {},
        "exp": {"seed": 0},
    })


def _dummy_match_evaluator(pt_dim=FEAT_DIM):
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator

    cfg = dict2namespace({
        "model": {"backbone": "tiny", "pretrained": False, "cfeat_dim": 32,
                  "pt_dim": pt_dim, "im_pe": False, "im_sa": 0,
                  "im_sa_type": None, "pt_sa": 0, "pt_sa_type": None,
                  "pt_pe": False, "coarse_layers": 0, "temp_type": "mul"},
        "data": {},
        "exp": {"seed": 0},
        "ckpt": "eval",
    })
    return NeRFMatchEvaluator(cfg)


def test_inerf_with_match_loss_smoke(tmp_path):
    """iNeRF with the matcher loss term runs and returns finite results."""
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.eval.inerf import inerf_refinement
    from tests._synthetic import look_at

    cfg = small_nerf_cfg_for_inerf()
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    # Matcher pt_dim must equal the NeRF feature dim (hid 32), as in prod.
    ev = _dummy_match_evaluator(pt_dim=32)

    IM = 32
    c2w_gt = look_at([0.7, 0.1, 0.0])
    img = np.random.default_rng(0).uniform(0, 1, (IM, IM, 3)).astype(np.float32)
    batch = {
        "image": img[None],
        "K": np.array([[30.0, 0, IM / 2], [0, 30.0, IM / 2], [0, 0, 1]])[None],
        "c2w": np.asarray(c2w_gt, np.float32)[None],
        "im_mask": np.ones((1, 16), np.float32),
        "pt_mask": np.ones((1, 256), np.float32),
        "pt2d": np.zeros((1, 16, 2), np.float32),
    }
    inerf_conf = dict2namespace({"lrate": 0.01, "num_optim": 2, "ds": 8,
                                 "eval_pose": True, "use_match_loss": True})
    c2w_ref, r_err, t_err = inerf_refinement(
        ev, batch, renderer, params, np.eye(4), c2w_gt, inerf_conf)
    assert np.all(np.isfinite(np.asarray(c2w_ref)))


def test_eval_match_masks_and_zero_matches(scene):
    """eval_match honors masks (parity with forward_match) and an all-masked
    point set flows through the pose path as a graceful failure."""
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate

    cfg = match_eval_cfg(scene)
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="train", val_num=4)
    batch = _collate([ds[0]])

    img = jnp.asarray(batch["image"])
    pt_feat = jnp.asarray(batch["pt_feat"])
    pt3d = jnp.asarray(batch["pt3d"])
    im_mask = jnp.asarray(np.asarray(batch["im_mask"], np.float32))
    pt_mask = jnp.asarray(np.asarray(batch["pt_mask"], np.float32))

    ref = jax.jit(lambda p: ev.model.forward_match(
        p, img, pt_feat, pt3d, im_mask=im_mask, pt_mask=pt_mask,
        mutual=True))(ev.params)
    got = ev.model.eval_match(ev.params, img, pt_feat, pt3d,
                              im_mask=im_mask, pt_mask=pt_mask, mutual=True)
    assert np.array_equal(np.asarray(ref["valid"]), np.asarray(got["valid"]))
    assert np.array_equal(np.asarray(ref["j_ids"]), np.asarray(got["j_ids"]))

    # All points masked out -> no valid matches -> pose failure, no crash.
    batch_z = dict(batch)
    batch_z["pt_mask"] = np.zeros_like(np.asarray(batch["pt_mask"]))
    c2w_est, r_err, t_err, n = ev.eval_match_pose(
        batch_z, match_oracle=False, mutual=True, rthres=6.0, solver="colmap")
    assert n == 0
    assert c2w_est is None
    assert not np.isfinite(r_err) and not np.isfinite(t_err)


def test_cache_scene_pts_fused_route_and_feat_comb_swap(scene, tmp_path):
    """cache_scene_pts through the FUSED predict path (128-sample config,
    interpret on CPU), lin then max: the cfg swap must invalidate the
    cached jitted programs (stale-jit regression) and both modes must
    satisfy the load_frame_3d contract."""
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.data.loading import load_frame_3d

    cfg = small_nerf_cfg(scene)
    cfg.coarse_nerf.num_pts = 128
    cfg.fine_nerf.num_pts = 128
    renderer = NerfRenderer(cfg, stop_layer=1)
    renderer.fused_interpret = True
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))
    # Interior density so max-compositing has a surface to select.
    for mk in ("nerf_coarse", "nerf_fine"):
        params[mk]["alpha_linear"]["bias"] = (
            params[mk]["alpha_linear"]["bias"] + 2.0)
    ev = NerfEvaluator(cfg, renderer, params)

    out_lin = ev.cache_scene_pts(cache_dir=tmp_path / "lin", debug=True)
    assert renderer.cfg.feat_comb == "lin"
    out_max = ev.cache_scene_pts(feat_comb="max",
                                 cache_dir=tmp_path / "max", debug=True)
    assert renderer.cfg.feat_comb == "max"

    frame = scene["frames"][0]
    n = (W // DS) * (H // DS)
    feats = {}
    for tag, out_dir in (("lin", out_lin), ("max", out_max)):
        pt3d, feat, mask, unnorm = load_frame_3d(frame, str(out_dir))
        assert pt3d.shape == (n, 3)
        assert np.all(np.isfinite(pt3d)) and np.all(np.isfinite(feat))
        feats[tag] = feat
    # The swap must actually change the compositing (stale-jit bug check).
    assert np.abs(feats["lin"] - feats["max"]).max() > 1e-6


def test_cache_serving_int8_default_resolution(scene, tmp_path, monkeypatch):
    """The localization-serving int8 default (SERVING_INT8_DEFAULT)
    resolves correctly: an explicit render.trunk_int8 (incl. 'none')
    always wins; an absent key takes the serving default; a config the
    fused path cannot serve is forced back to 'none' (int8 trunks are a
    fused-kernel feature); and reconstruction eval (predict without the
    cache path) never picks up the serving default."""
    import nerfmatch_tpu.nerf.renderer as renderer_mod
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer, serving_int8_mode

    monkeypatch.setattr(renderer_mod, "SERVING_INT8_DEFAULT", "both")

    # -- unit: resolution precedence --
    cfg = small_nerf_cfg(scene)
    assert serving_int8_mode(cfg) == "both"          # absent -> default
    cfg.render.trunk_int8 = "none"
    assert serving_int8_mode(cfg) == "none"          # explicit none wins
    cfg.render.trunk_int8 = "coarse"
    assert serving_int8_mode(cfg) == "coarse"        # explicit mode wins

    # -- non-fused config (8 samples): the cache must force 'none' --
    cfg = small_nerf_cfg(scene)
    renderer = NerfRenderer(cfg, stop_layer=1)
    assert not renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))
    ev = NerfEvaluator(cfg, renderer, params)
    ev.cache_scene_pts(cache_dir=tmp_path / "xla", debug=True)
    assert renderer.cfg.trunk_int8 == "none"

    # -- fused-served config, absent key: the cache serves the default --
    cfg = small_nerf_cfg(scene)
    cfg.coarse_nerf.num_pts = 128
    cfg.fine_nerf.num_pts = 128
    renderer = NerfRenderer(cfg, stop_layer=1)
    renderer.fused_interpret = True
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))
    for mk in ("nerf_coarse", "nerf_fine"):
        params[mk]["alpha_linear"]["bias"] = (
            params[mk]["alpha_linear"]["bias"] + 2.0)
    ev = NerfEvaluator(cfg, renderer, params)
    ev.cache_scene_pts(cache_dir=tmp_path / "i8", debug=True)
    assert renderer.cfg.trunk_int8 == "both"
    assert renderer.act_scales is not None  # lazily calibrated

    # -- same config, explicit 'none': stays f32 --
    cfg2 = small_nerf_cfg(scene)
    cfg2.coarse_nerf.num_pts = 128
    cfg2.fine_nerf.num_pts = 128
    cfg2.render.trunk_int8 = "none"
    renderer2 = NerfRenderer(cfg2, stop_layer=1)
    renderer2.fused_interpret = True
    params2 = renderer2.init_params(jax.random.PRNGKey(0))
    ev2 = NerfEvaluator(cfg2, renderer2, params2)
    ev2.cache_scene_pts(cache_dir=tmp_path / "f32", debug=True)
    assert renderer2.cfg.trunk_int8 == "none"
