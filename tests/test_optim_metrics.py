"""Optimizer factory, LR schedules, and loss/metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import math

from nerfmatch_tpu.config import dict2namespace
from nerfmatch_tpu.utils.optim import (
    init_optimizer,
    make_lr_schedule,
    get_lr,
    set_lr,
    config_adaptive_lr,
)
from nerfmatch_tpu.utils import metrics as M


def opt_cfg(**over):
    d = dict(optimizer="adam", lr=1e-3, weight_decay=0.0, lr_scheduler="cosine",
             max_epochs=10)
    d.update(over)
    return dict2namespace(d)


def test_optimizers_step():
    for name in ["sgd", "adam", "adamw", "rmsprop", "radam", "ranger"]:
        cfg = opt_cfg(optimizer=name, momentum=0.9, weight_decay=0.01)
        opt = init_optimizer(cfg)
        params = {"w": jnp.ones((4,))}
        state = opt.init(params)
        grads = {"w": jnp.full((4,), 0.5)}
        upd, state = opt.update(grads, state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        assert np.all(np.asarray(new["w"]) < 1.0)


def test_ranger_lookahead_sync():
    """Ranger = RAdam + Lookahead(k=6, alpha=0.5): the slow weights pull the
    fast weights back every 6th step, so a quadratic still converges and the
    6th step differs from plain radam."""
    import optax

    cfg_r = opt_cfg(optimizer="ranger", lr=0.1, weight_decay=0.0)
    cfg_a = opt_cfg(optimizer="radam", lr=0.1, weight_decay=0.0)
    traj = {}
    for tag, cfg in [("ranger", cfg_r), ("radam", cfg_a)]:
        opt = init_optimizer(cfg)
        params = {"w": jnp.asarray([4.0])}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            upd, state = opt.update(grads, state, params)
            return optax.apply_updates(params, upd), state

        vals = []
        for _ in range(12):
            params, state = step(params, state)
            vals.append(float(params["w"][0]))
        traj[tag] = vals
    # identical for the first 5 steps, diverging at the first sync (step 6)
    assert np.allclose(traj["ranger"][:5], traj["radam"][:5], atol=1e-6)
    assert abs(traj["ranger"][5] - traj["radam"][5]) > 1e-4
    assert abs(traj["ranger"][-1]) < 4.0  # converging


def test_lr_injection():
    opt = init_optimizer(opt_cfg())
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    assert math.isclose(get_lr(state), 1e-3, rel_tol=1e-6)
    state = set_lr(state, 5e-4)
    assert math.isclose(get_lr(state), 5e-4, rel_tol=1e-6)


def test_cosine_schedule():
    sched = make_lr_schedule(opt_cfg(max_epochs=10))
    assert math.isclose(sched(0), 1e-3, rel_tol=1e-6)
    assert sched(5) < 1e-3
    assert sched(10) < 1e-7 + 1e-8 * 2


def test_steplr_schedule():
    cfg = opt_cfg(lr_scheduler="steplr", decay_per_step=3, decay_gamma=0.1,
                  max_epochs=10)
    sched = make_lr_schedule(cfg)
    assert math.isclose(sched(0), 1e-3)
    assert math.isclose(sched(3), 1e-4)
    assert math.isclose(sched(6), 1e-5)


def test_poly_and_chained():
    cfg = opt_cfg(lr_scheduler="poly", poly_exp=2.0, max_epochs=10)
    s = make_lr_schedule(cfg)
    assert math.isclose(s(5), 1e-3 * 0.25)
    cfg = opt_cfg(lr_scheduler="chained", max_epochs=100)
    s = make_lr_schedule(cfg)
    assert s(0) < s(50)  # warmup rising
    assert s(99) < s(49)  # decayed


def test_adaptive_lr():
    # exp.batch_size is the GLOBAL batch in this port (sharded across the
    # mesh), so it is the true batch regardless of device count — the
    # reference multiplies by gpu_num only because ITS batch_size is
    # per-rank.
    cfg = dict2namespace({
        "gpu_num": 8,
        "exp": {"batch_size": 24},
        "optim": {"clr": 8e-4, "cbs": 16},
    })
    lr, batch = config_adaptive_lr(cfg)
    assert batch == 24
    assert math.isclose(lr, 8e-4 * 24 / 16)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_psnr():
    assert math.isclose(float(M.mse2psnr(jnp.asarray(0.01))), 20.0, rel_tol=1e-5)


def test_distortion_loss_prefers_compact_weights():
    """Distortion loss is lower when weight mass is concentrated."""
    t = jnp.asarray(np.linspace(0, 1, 17, dtype=np.float32))[None]
    w_spread = jnp.ones((1, 16)) / 16
    w_compact = jnp.zeros((1, 16)).at[0, 8].set(1.0)
    assert float(M.distortion_loss(t, w_compact)) < float(M.distortion_loss(t, w_spread))


def test_matching_loss_direction():
    gt = np.zeros((1, 4, 4), np.float32)
    np.fill_diagonal(gt[0], 1)
    good = jnp.asarray(gt * 0.9 + 0.01)
    bad = jnp.asarray((1 - gt) * 0.5 + gt * 0.1)
    l_good = float(M.compute_matching_loss(good, jnp.asarray(gt)))
    l_bad = float(M.compute_matching_loss(bad, jnp.asarray(gt)))
    assert l_good < l_bad


def test_feat_l2():
    im = jnp.asarray(np.eye(4, 8, dtype=np.float32))[None]
    pt = jnp.asarray(np.eye(4, 8, dtype=np.float32))[None] * 3
    gt = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    val = float(M.compute_feat_l2(im, pt, gt))
    assert math.isclose(val, 2.0, rel_tol=1e-4)  # |1*e_i - 3*e_i| = 2


def test_fine_losses_masked():
    expec = jnp.asarray([[0.1, 0.1, 0.5], [0.9, 0.9, 0.5]])
    gt = jnp.asarray([[0.0, 0.0], [5.0, 5.0]])  # second is outside window
    loss = float(M.compute_fine_loss_l2_std(expec, gt))
    assert np.isfinite(loss) and loss > 0
    # Global variant with explicit mask.
    mpt_f = jnp.asarray([[1.0, 1.0], [2.0, 2.0]])
    mpt_gt = jnp.asarray([[1.5, 1.0], [0.0, 0.0]])
    mask = jnp.asarray([True, False])
    loss2 = float(M.compute_fine_match_loss_l2_std(
        mpt_f, mpt_gt, jnp.asarray([0.5, 0.5]), mask))
    assert np.isfinite(loss2)


def test_nerf_metrics_assembly():
    preds = {
        "rgb_coarse": jnp.full((8, 3), 0.4),
        "rgb_fine": jnp.full((8, 3), 0.45),
        "s_fine": jnp.asarray(np.tile(np.linspace(0, 1, 9, np.float32), (8, 1))),
        "weights_fine": jnp.ones((8, 8)) / 8,
    }
    gt = jnp.full((8, 3), 0.5)
    cfg = dict2namespace({"ray_reg_weight": 0.01})
    m = M.compute_nerf_metrics(preds, gt, validation_mode=False, cnfg_loss=cfg)
    assert float(m["loss"]) > 0
    assert float(m["rgb_fine_psnr"]) > float(m["rgb_coarse_psnr"])


def test_pose_metrics_host_roundtrip():
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.linalg.det(q))
    t = np.array([0.1, -0.2, 1.0])
    pts3d = rng.uniform([-1, -1, 3], [1, 1, 6], size=(50, 3))
    pcam = pts3d @ q.T + t
    pix = (K @ (pcam / pcam[:, 2:]).T).T[:, :2]
    w2c = np.eye(4)
    w2c[:3, :3] = q
    w2c[:3, 3] = t
    c2w = np.linalg.inv(w2c)
    out = M.compute_pose_metrics_host(
        [{"pt2d": pix, "pt3d": pts3d, "K": K, "c2w_gt": c2w}], rthres=2.0)
    assert out["R_err"][0] < 0.05
    assert out["t_err"][0] < 1e-3


def test_summaries():
    statis = {"R_err": [0.5, 1.5, 20.0], "t_err": [0.004, 0.02, 0.5]}
    s = M.summarize_pose_statis(statis, t_scale=100, print_out=False)
    assert math.isclose(s["t_med"], 2.0)
    assert math.isclose(s["recall"], 100 / 3, rel_tol=1e-6)
    avg = M.average_pose_metrics([s, s], print_out=False)
    assert math.isclose(avg["t_med"], s["t_med"])


def test_auc_monotone():
    errs = np.array([0.5, 1.5, 3.0, 8.0])
    auc = M.cal_error_auc(errs, [1, 2, 5, 10])
    assert np.all(np.diff(auc) >= 0)
    assert 0 <= auc[0] <= 100


def test_distortion_loss_matches_pairwise_form():
    """The O(S) prefix-sum inter term equals the naive pairwise double sum
    (value and gradient) for sorted sample midpoints."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t = jnp.asarray(np.sort(rng.uniform(0, 1, (4, 17)), axis=-1), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (4, 16)), jnp.float32)

    def naive(t, w):
        ut = (t[..., 1:] + t[..., :-1]) / 2
        dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
        inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
        intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
        return inter + intra

    a = np.asarray(M.lossfun_distortion(t, w))
    b = np.asarray(naive(t, w))
    assert np.allclose(a, b, rtol=1e-5, atol=1e-6), np.abs(a - b).max()

    ga = np.asarray(jax.grad(lambda w: jnp.sum(M.lossfun_distortion(t, w)))(w))
    gb = np.asarray(jax.grad(lambda w: jnp.sum(naive(t, w)))(w))
    assert np.allclose(ga, gb, rtol=1e-4, atol=1e-5), np.abs(ga - gb).max()
