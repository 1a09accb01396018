"""Parallelism semantics: mesh-size invariance and sharding plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmatch_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_params,
    data_sharding,
)
from tests._synthetic import build_scene, W, H
from tests.test_trainers import nerf_train_config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("par_scene"),
                       correlated_feats=True)


def run_steps(cfg, mesh, n_steps=3, fused=False):
    from nerfmatch_tpu.train.nerf_trainer import NerfTrainer
    from nerfmatch_tpu.data import init_data_loader

    ds = init_data_loader(cfg.data, 0, 1, split="train").dataset
    trainer = NerfTrainer(cfg, num_frames=1, mesh=mesh)
    params, opt_state = trainer.init_state(0)
    if fused:
        trainer.renderer.fused_interpret = True  # CPU: kernels interpreted
    step = trainer.train_step_fn(use_fused=True if fused else None)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    losses = []
    for i, batch in enumerate(ds.ray_batches(512, rng)):
        if i >= n_steps:
            break
        key, k = jax.random.split(key)
        sb = shard_batch(batch, mesh)
        params, opt_state, m = step(params, opt_state, sb["rays"], sb["rgbs"],
                                    sb["ts"].astype(jnp.int32), k)
        losses.append(float(m["loss"]))
    return losses, params


def test_mesh_size_invariance(scene, tmp_path):
    """The SPMD train step gives identical losses on a 1-way and an 8-way
    data-parallel mesh (same global batch, same RNG)."""
    cfg = nerf_train_config(scene, tmp_path)
    ref_losses, ref_params = run_steps(cfg, make_mesh(data=1, devices=jax.devices()[:1]))
    for n in [8]:
        losses, params = run_steps(cfg, make_mesh(data=n))
        assert np.allclose(losses, ref_losses, rtol=2e-4), (n, losses, ref_losses)
    # Params converge to the same values too.
    p1 = np.asarray(ref_params["nerf_fine"]["pts_linears"][0]["weight"])
    p8 = np.asarray(params["nerf_fine"]["pts_linears"][0]["weight"])
    assert np.allclose(p1, p8, atol=2e-5)


@pytest.mark.parametrize("app", [False, True])
def test_fused_train_step_sharded_matches_single(scene, tmp_path, app):
    """The fused custom-VJP train step on an 8-way DP mesh must match the
    single-device fused step.  GSPMD cannot partition a pallas_call, so
    ``train_step_fn`` builds the multi-device fused step with shard_map
    (grads pmean'd inside) — this is the production multi-chip NeRF
    training path (XLA-path invariance alone would not catch a broken
    fused wrapper).  Deterministic sampling (perturb off) so 1-way and
    8-way agree to fp reduction order.  ``app`` additionally covers the
    extras-cotangent appearance-embedding grads (Cambridge) under
    shard_map."""
    cfg = nerf_train_config(scene, tmp_path)
    cfg.render.perturb = False
    cfg.render.noise_std = 0.0
    cfg.embedding.appearance_embed = app
    ref_losses, ref_params = run_steps(
        cfg, make_mesh(data=1, devices=jax.devices()[:1]), n_steps=2,
        fused=True)
    losses, params = run_steps(cfg, make_mesh(data=8), n_steps=2, fused=True)
    assert np.allclose(losses, ref_losses, rtol=2e-5), (losses, ref_losses)
    # Adam normalizes by sqrt(v)+eps: where a grad element is ~0, the fp
    # reduction order of the pmean'd bf16 kernel grads can flip its sign
    # and move that element by up to ~2*lr — judge the params by
    # distribution, not pointwise (measured: max 8e-4, mean 1.4e-5).
    p1 = np.asarray(ref_params["nerf_fine"]["pts_linears"][0]["weight"])
    p8 = np.asarray(params["nerf_fine"]["pts_linears"][0]["weight"])
    d = np.abs(p1 - p8)
    lr = cfg.optim.lr
    assert d.max() < 2 * lr and d.mean() < 1e-4, (d.max(), d.mean())


def test_tp_sharded_forward_matches_replicated():
    """Model-axis TP sharding of MLP hiddens does not change outputs."""
    from __graft_entry__ import _nerf_config, _example_rays, _tp_sharding_rule
    from nerfmatch_tpu.nerf.renderer import NerfRenderer

    cfg = _nerf_config(num_pts=8, hid_dim=32, layer_num=3)
    cfg.coarse_nerf.skips = [1]
    cfg.fine_nerf.skips = [1]
    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = _example_rays(64)

    ref = renderer.render_rays(params, rays, train=False)

    mesh = make_mesh(data=4, model=2)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [jax.device_put(leaf, _tp_sharding_rule(mesh, path, leaf))
              for path, leaf in flat]
    params_tp = jax.tree_util.tree_unflatten(treedef, placed)
    rays_tp = jax.device_put(rays, data_sharding(mesh, 2))
    out = jax.jit(lambda p, r: renderer.render_rays(p, r, train=False))(
        params_tp, rays_tp)
    assert np.allclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=1e-5)


def test_shard_batch_layout():
    mesh = make_mesh(data=8)
    batch = {"rays": np.zeros((64, 12), np.float32),
             "name": ["a"], "scalar": 3}
    sb = shard_batch(batch, mesh)
    assert sb["rays"].sharding.spec[0] == "data"
    assert sb["name"] == ["a"]


def test_sharded_point_match_equals_dense():
    """Point-axis-sharded dual-softmax + mutual extraction (SURVEY §5
    net-new design) matches the single-device ops bit-for-bit on the
    8-device mesh, including masks and thresholds."""
    from nerfmatch_tpu.ops.matching import dual_softmax, extract_mutual_matches
    from nerfmatch_tpu.parallel.point_sharding import sharded_point_match

    B, M, N, D = 2, 24, 64, 16
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32)
    pt = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    im_mask = jnp.asarray(rng.uniform(size=(B, M)) > 0.2, jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2, jnp.float32)
    temp = jnp.asarray(10.0)

    # Two variants span both axes (mutual on/off, temp mul/div, threshold
    # on/off) — each extra variant re-traces the shard_map program (~6 s).
    for mutual, thr, ttype in [(True, 0.0, "mul"), (False, 1e-4, "div")]:
        conf, _, _ = dual_softmax(im, pt, temp, im_mask, pt_mask,
                                  temp_type=ttype)
        ref = extract_mutual_matches(conf, mutual=mutual, threshold=thr)
        mesh = make_mesh(data=8)
        out = sharded_point_match(mesh, im, pt, temp, im_mask, pt_mask,
                                  temp_type=ttype, mutual=mutual,
                                  threshold=thr)
        assert np.array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))
        v = np.asarray(ref["valid"])
        assert np.array_equal(np.asarray(out["j_ids"])[v],
                              np.asarray(ref["j_ids"])[v])
        assert np.allclose(np.asarray(out["mconf"]), np.asarray(ref["mconf"]),
                           atol=1e-6)


def test_sharded_fused_render_matches_single():
    """The fused Pallas render pipeline under shard_map (rays sharded over
    the 8-device data axis) matches the unsharded program."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
    from nerfmatch_tpu.parallel.render_sharding import make_sharded_render

    cfg = dict2namespace({
        "data": {"img_wh": [32, 32]},
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
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    n = 8 * 8  # 8 rays per device, one ray tile each
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)

    mesh = make_mesh(data=8)
    srender, pack = make_sharded_render(mesh, renderer, interpret=True,
                                        ray_tile=8)
    wc, wf = pack(params)
    got = srender(wc, wf, rays)

    render1, _ = make_fused_hierarchical(renderer, interpret=True, ray_tile=8)
    ref = render1(wc, wf, rays)
    for k in ("rgb_fine", "depth_fine", "feat_fine", "pts_fine"):
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert np.abs(a - b).max() < 1e-5, (k, np.abs(a - b).max())


def test_shard_map_matcher_step_matches_plain():
    """The shard_map-built coarse matcher train step (multi-device mesh,
    pmean'd grads) matches the plain jit step on the same global batch."""
    import optax
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.train.matcher_trainer import CoarseTrainStep

    cfg = CoarseMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        im_pe=True, im_sa=0, im_sa_type=None, pt_sa=0, pt_sa_type=None,
        pt_pe=False, coarse_layers=0)
    model = NeRFMatcherCoarse(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)

    rng = np.random.default_rng(0)
    bs, hw, n = 8, 32, 16
    m = (hw // 8) ** 2
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, n, 3)), jnp.float32)
    ones_m = jnp.ones((bs, m), jnp.float32)
    ones_n = jnp.ones((bs, n), jnp.float32)
    conf_gt = np.zeros((bs, m, n), np.float32)
    conf_gt[:, np.arange(m), rng.integers(0, n, m)] = 1.0
    conf_gt = jnp.asarray(conf_gt)
    key = jax.random.PRNGKey(3)

    plain = CoarseTrainStep(model, opt)
    mesh = make_mesh(data=8)
    sharded = CoarseTrainStep(model, opt, mesh=mesh)

    os0 = opt.init(params)
    args = (params, os0, img, pt_feat, pt3d, ones_m, ones_n, conf_gt, key)
    p1, _, m1 = plain.step(*args)
    sb = {k: jax.device_put(v, data_sharding(mesh, v.ndim))
          for k, v in zip(("image", "pt_feat", "pt3d", "im", "pt", "gt"),
                          (img, pt_feat, pt3d, ones_m, ones_n, conf_gt))}
    p2, _, m2 = sharded.step(params, os0, sb["image"], sb["pt_feat"],
                             sb["pt3d"], sb["im"], sb["pt"], sb["gt"], key)
    assert np.allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    w1 = np.asarray(jax.tree_util.tree_leaves(p1)[0])
    w2 = np.asarray(jax.tree_util.tree_leaves(p2)[0])
    assert np.allclose(w1, w2, atol=1e-6)


def test_point_sharded_eval_match_equals_dense():
    """eval_match_point_sharded == eval_match on a merged (single-pair,
    big-N) point cloud — the production Cambridge multi-pair layout —
    including the fixed-length top-k lists the evaluator consumes."""
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)

    cfg = CoarseMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        im_pe=True, im_sa=1, im_sa_type="share", pt_sa=1, pt_sa_type="full",
        pt_pe=True, coarse_layers=1, fused_attention_train=False)
    model = NeRFMatcherCoarse(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    bs, hw, n = 1, 32, 64  # n divisible by the 8-device mesh
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, n, 3)), jnp.float32)
    m = (hw // 8) ** 2
    im_mask = jnp.asarray(rng.uniform(size=(bs, m)) > 0.1, jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(bs, n)) > 0.1, jnp.float32)

    ref = model.eval_match(params, img, pt_feat, pt3d, im_mask=im_mask,
                           pt_mask=pt_mask, mutual=True, top_k=32)
    mesh = make_mesh(data=8)
    got = model.eval_match_point_sharded(
        params, mesh, img, pt_feat, pt3d, im_mask=im_mask, pt_mask=pt_mask,
        mutual=True, top_k=32)

    assert np.array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    v = np.asarray(ref["valid"])
    assert np.array_equal(np.asarray(got["j_ids"])[v],
                          np.asarray(ref["j_ids"])[v])
    assert np.allclose(np.asarray(got["mconf"]), np.asarray(ref["mconf"]),
                       atol=1e-6)
    lv = np.asarray(ref["lists"]["valid"])
    for k in ("i_ids", "j_ids", "valid"):
        assert np.array_equal(np.asarray(got["lists"][k])[lv],
                              np.asarray(ref["lists"][k])[lv]), k


def test_point_sharded_ms_eval_match_equals_dense():
    """The c2f (NeRFMatcherMS) point-sharded eval: coarse dual-softmax
    sharded over the point axis AND the fine subpixel stage sharded over
    the match axis (make_sharded_fine_stage) — must match the dense
    eval_match including expec_f and the top-k lists.  The point cloud is
    Cambridge-shaped: a merged top-k=10 retrieval cloud (10x the
    per-frame points)."""
    from nerfmatch_tpu.models.matcher_c2f import (
        C2FMatcherConfig, NeRFMatcherMS)

    cfg = C2FMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        ffeat_dim=16, im_pe=True, im_sa=1, im_sa_type="share", pt_sa=1,
        pt_sa_type="full", pt_pe=True, coarse_layers=1, fine_sa=1,
        fsa_type="full", win_sz=5, cat_c_feat=True,
        fused_attention_train=False)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(4)
    bs, hw, n = 1, 32, 64 * 10  # merged K=10 cloud, divisible by the mesh
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, n, 3)), jnp.float32)
    m = (hw // 8) ** 2
    im_mask = jnp.asarray(rng.uniform(size=(bs, m)) > 0.1, jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(bs, n)) > 0.1, jnp.float32)

    ref = model.eval_match(params, img, pt_feat, pt3d, im_mask=im_mask,
                           pt_mask=pt_mask, mutual=True, top_k=32)
    mesh = make_mesh(data=8)
    got = model.eval_match_point_sharded(
        params, mesh, img, pt_feat, pt3d, im_mask=im_mask, pt_mask=pt_mask,
        mutual=True, top_k=32)

    assert np.array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    v = np.asarray(ref["valid"])
    assert np.array_equal(np.asarray(got["j_ids"])[v],
                          np.asarray(ref["j_ids"])[v])
    assert np.allclose(np.asarray(got["mconf"]), np.asarray(ref["mconf"]),
                       atol=1e-6)
    # expec_f depends on j_ids; compare on valid tokens (same layout:
    # identity (b, i) list -> (B*M, 3)).
    e_ref = np.asarray(ref["expec_f"]).reshape(bs, m, 3)
    e_got = np.asarray(got["expec_f"]).reshape(bs, m, 3)
    assert np.allclose(e_got[v], e_ref[v], atol=1e-5)
    lv = np.asarray(ref["lists"]["valid"])
    for k in ("i_ids", "j_ids", "valid"):
        assert np.array_equal(np.asarray(got["lists"][k])[lv],
                              np.asarray(ref["lists"][k])[lv]), k


def test_point_sharded_ms_eval_match_production_geometry():
    """Same sharded-vs-dense equality at the PRODUCTION token geometry:
    a 480x480 image -> M=3600 coarse tokens (model_ds 8, the reference
    eval grid), N=36000 points (pair_topk=10 merged Cambridge retrieval
    cloud), win_sz=5, top_k=2048 match lists — the shapes
    `--point_shard` serves (fine stage 3600 -> 450 matches/device).
    Feature widths are reduced (the sharding logic — splits, collectives,
    gather indices — depends on M/N/win/top_k, not channel width);
    production-dim equality is covered by
    scripts/fine_shard_production_probe.py (cfeat/pt 256, same asserts)."""
    from nerfmatch_tpu.models.matcher_c2f import (
        C2FMatcherConfig, NeRFMatcherMS)

    cfg = C2FMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        ffeat_dim=16, im_pe=True, im_sa=1, im_sa_type="share", pt_sa=0,
        pt_sa_type="full", pt_pe=True, coarse_layers=1, fine_sa=1,
        fsa_type="full", win_sz=5, cat_c_feat=True,
        fused_attention_train=False)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    bs, hw, topk_pairs = 1, 480, 10
    m = (hw // 8) ** 2
    n = m * topk_pairs
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, n, 3)), jnp.float32)
    im_mask = jnp.asarray(rng.uniform(size=(bs, m)) > 0.05, jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(bs, n)) > 0.05, jnp.float32)
    kw = dict(im_mask=im_mask, pt_mask=pt_mask, mutual=True, top_k=2048)

    ref = model.eval_match(params, img, pt_feat, pt3d, **kw)
    mesh = make_mesh(data=8)
    got = model.eval_match_point_sharded(params, mesh, img, pt_feat, pt3d,
                                         **kw)

    v = np.asarray(ref["valid"])
    assert v.sum() > 100  # the geometry must produce a real match set
    assert np.array_equal(np.asarray(got["valid"]), v)
    assert np.array_equal(np.asarray(got["j_ids"])[v],
                          np.asarray(ref["j_ids"])[v])
    assert np.allclose(np.asarray(got["mconf"]), np.asarray(ref["mconf"]),
                       atol=1e-6)
    e_ref = np.asarray(ref["expec_f"]).reshape(bs, m, 3)
    e_got = np.asarray(got["expec_f"]).reshape(bs, m, 3)
    assert np.allclose(e_got[v], e_ref[v], atol=1e-5)
    lv = np.asarray(ref["lists"]["valid"])
    for k in ("i_ids", "j_ids", "valid"):
        assert np.array_equal(np.asarray(got["lists"][k])[lv],
                              np.asarray(ref["lists"][k])[lv]), k


def test_pair_sharded_multi_pair_equals_lax_map():
    """forward_multi_pair with pair_mesh == the lax.map path, including the
    fine expec_f, with K=5 pairs padded onto the 8-device mesh."""
    from nerfmatch_tpu.models.matcher_c2f import (
        C2FMatcherConfig, NeRFMatcherMS)

    cfg = C2FMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        ffeat_dim=16, im_pe=True, im_sa=1, im_sa_type="share", pt_sa=1,
        pt_sa_type="full", pt_pe=True, coarse_layers=1, fine_sa=1,
        fsa_type="full", win_sz=5, cat_c_feat=True,
        fused_attention_train=False)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    bs, hw, K, n = 1, 32, 5, 24
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, K, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, K, n, 3)), jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(bs, K, n)) > 0.1, jnp.float32)

    ref = model.eval_match(params, img, pt_feat, pt3d, pt_mask=pt_mask,
                           mutual=True, top_k=16)
    mesh = make_mesh(data=8)
    got = model.eval_match(params, img, pt_feat, pt3d, pt_mask=pt_mask,
                           mutual=True, top_k=16, pair_mesh=mesh)

    assert np.array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    v = np.asarray(ref["valid"])
    assert np.array_equal(np.asarray(got["j_ids"])[v],
                          np.asarray(ref["j_ids"])[v])
    assert np.allclose(np.asarray(got["mconf"]), np.asarray(ref["mconf"]),
                       atol=1e-6)
    assert np.allclose(np.asarray(got["expec_f"]), np.asarray(ref["expec_f"]),
                       atol=1e-5)
    for k in ("i_ids", "j_ids", "valid"):
        assert np.array_equal(np.asarray(got["lists"][k]),
                              np.asarray(ref["lists"][k])), k
