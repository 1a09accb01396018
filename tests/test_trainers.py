"""End-to-end trainer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from nerfmatch_tpu.config import dict2namespace
from tests._synthetic import build_scene, W, H, DS, N_PTS, FEAT_DIM


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("trainer_scene"),
                       correlated_feats=True)


def nerf_train_config(scene, odir):
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
        },
        "optim": {
            "optimizer": "adam", "lr": 2e-3, "weight_decay": 0.0,
            "lr_scheduler": "cosine",
        },
        "coarse_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                        "output_dim": 4, "skips": [1], "num_pts": 8},
        "fine_nerf": {"method": "NeRF", "layer_num": 3, "hid_dim": 32,
                      "output_dim": 4, "skips": [1], "num_pts": 8},
        "embedding": {"xyz_num_freqs": 8, "dirs_num_freqs": 4, "type": "mip"},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": True, "white_bg": False, "noise_std": 0.0},
        "loss": {"ray_reg_weight": 0.01},
        "exp": {"seed": 1, "odir": str(odir), "prefix": "t", "num_workers": 0,
                "max_epochs": 2, "check_epochs": 1, "batch_size": 512,
                "gpus": 1,  # 1-device mesh: SPMD compile on the CPU test
                            # host is the suite's wall-clock hog; the 8-way
                            # DP path is covered by tests/test_parallel.py
                "debug": True, "log_num_max": 1, "log_step": 5},
    })


def test_nerf_train_loop_and_resume(scene, tmp_path):
    from nerfmatch_tpu.train import nerf_trainer

    cfg = nerf_train_config(scene, tmp_path)
    out_cfg, params = nerf_trainer.train(cfg)
    # Checkpoints exist.
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint
    run_dir = nerf_trainer.init_config_odir(out_cfg)
    last = latest_checkpoint(run_dir / "checkpoints", name="last")
    assert last is not None and last.name == "last_2"
    # Resume: continues at epoch 2 (no-op since max_epochs reached).
    cfg2 = nerf_train_config(scene, tmp_path)
    out2, params2 = nerf_trainer.train(cfg2)
    p = np.asarray(params2["nerf_fine"]["pts_linears"][0]["weight"])
    assert np.all(np.isfinite(p))


def test_nerf_training_reduces_loss(scene, tmp_path):
    """Non-debug check: the sharded train step actually learns."""
    import jax
    from nerfmatch_tpu.train.nerf_trainer import NerfTrainer
    from nerfmatch_tpu.parallel.mesh import make_mesh, shard_batch
    from nerfmatch_tpu.data import init_data_loader

    cfg = nerf_train_config(scene, tmp_path)
    ds = init_data_loader(cfg.data, 0, 1, split="train").dataset
    mesh = make_mesh()  # 8 CPU devices
    trainer = NerfTrainer(cfg, num_frames=1, mesh=mesh)
    params, opt_state = trainer.init_state(0)
    step = trainer.train_step_fn()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    losses = []
    import jax.numpy as jnp
    for i, batch in enumerate(ds.ray_batches(512, rng)):
        if i >= 30:
            break
        key, k = jax.random.split(key)
        sb = shard_batch(batch, mesh)
        params, opt_state, m = step(params, opt_state, sb["rays"], sb["rgbs"],
                                    sb["ts"].astype(jnp.int32), k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def matcher_config(scene, odir, coarse=True):
    model = {
        "backbone": "tiny", "pretrained": False, "cfeat_dim": 32,
        "pt_dim": FEAT_DIM, "im_pe": True, "im_sa": 0, "im_sa_type": None,
        "pt_sa": 0, "pt_sa_type": None, "pt_pe": False, "coarse_layers": 0,
        "temp_type": "mul", "rthres": 6,
    }
    if not coarse:
        model.update({"ffeat_dim": 16, "fine_sa": 1, "fsa_type": "full",
                      "win_sz": 5, "cat_c_feat": True, "fine_loss": "match",
                      "coarse_percent": 0.3, "coarse_dthres": 20})
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
        "model": model,
        "optim": {"optimizer": "adam", "adapt_lr": True, "clr": 1e-3,
                  "cbs": 4, "weight_decay": 0.0, "lr_scheduler": "cosine",
                  "coarse_only_epochs": 1 if not coarse else 0},
        "exp": {"seed": 2, "odir": str(odir), "prefix": "t", "num_workers": 0,
                "max_epochs": 1, "check_epochs": 1, "batch_size": 2,
                "gpus": 1,  # see nerf_train_config
                "debug": True},
    })


def test_coarse_matcher_train_loop(scene, tmp_path):
    from nerfmatch_tpu.train.matcher_trainer import train_coarse

    cfg = matcher_config(scene, tmp_path, coarse=True)
    out_cfg, params = train_coarse(cfg)
    assert np.isfinite(np.asarray(params["temperature"]))
    # Adaptive LR rule applied: clr * (gpu_num * bs) / cbs.
    assert out_cfg.optim.lr == pytest.approx(
        1e-3 * out_cfg.gpu_num * 2 / 4)


def test_c2f_matcher_train_loop(scene, tmp_path):
    from nerfmatch_tpu.train.matcher_trainer import train_c2f

    cfg = matcher_config(scene, tmp_path, coarse=False)
    out_cfg, params = train_c2f(cfg)
    w = np.asarray(params["pt_ffeat_proj"][0]["weight"])
    assert np.all(np.isfinite(w))


def _synthetic_timm_npz(backbone_params, path, shift=1.0):
    """Raw-timm-format state dict (dotted ``stages.1.`` keys, torch layouts)
    holding ``leaf + shift`` for every backbone leaf, saved as .npz."""
    import jax
    from nerfmatch_tpu.train.checkpoint import _torch_key_for_path

    state = {}
    flat, _ = jax.tree_util.tree_flatten_with_path({"backbone": backbone_params})
    for keypath, leaf in flat:
        p = tuple(k.key if hasattr(k, "key") else k.idx for k in keypath)
        tkey = _torch_key_for_path(p)[len("backbone."):]
        import re
        tkey = re.sub(r"^stages_(\d+)\.", r"stages.\1.", tkey)
        v = np.asarray(leaf, np.float32) + shift
        if v.ndim == 4:
            v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        elif v.ndim == 2 and p[-1] == "weight":
            v = v.T
        state[tkey] = v
    np.savez(path, **state)
    return state


def _capture_trainer_logs():
    import contextlib
    import logging

    from nerfmatch_tpu.train import matcher_trainer as mt

    @contextlib.contextmanager
    def cm(records):
        h = logging.Handler()
        h.emit = lambda r: records.append(r.getMessage())
        mt.logger.addHandler(h)
        try:
            yield
        finally:
            mt.logger.removeHandler(h)
    return cm


def test_imagenet_backbone_init_roundtrip(tmp_path):
    """A synthetic raw-timm state dict flows through the trainer's
    ImageNet-init path and lands in the backbone params."""
    import jax
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.train.matcher_trainer import _init_imagenet_backbone

    model = NeRFMatcherCoarse(CoarseMatcherConfig(
        backbone="tiny", cfeat_dim=32, pt_dim=FEAT_DIM))
    params = model.init_params(jax.random.PRNGKey(0))
    npz = tmp_path / "timm_tiny.npz"
    _synthetic_timm_npz(params["backbone"], npz, shift=1.0)

    conf = dict2namespace({"backbone": "tiny", "pretrained": True,
                           "timm_ckpt": str(npz)})
    new = _init_imagenet_backbone(model, dict(params), conf)
    # Every backbone leaf took the checkpoint value (init + 1)...
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params["backbone"]),
            jax.tree_util.tree_leaves_with_path(new["backbone"])):
        assert ka == kb
        assert np.allclose(np.asarray(b), np.asarray(a) + 1.0, atol=1e-6), ka
    # ...and non-backbone leaves are untouched.
    assert new["temperature"] is params["temperature"]


def test_imagenet_backbone_init_missing_and_scratch(tmp_path):
    import jax
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.train.matcher_trainer import _init_imagenet_backbone

    model = NeRFMatcherCoarse(CoarseMatcherConfig(
        backbone="tiny", cfeat_dim=32, pt_dim=FEAT_DIM))
    params = model.init_params(jax.random.PRNGKey(0))

    # Configured-but-missing fails loudly.
    conf = dict2namespace({"backbone": "tiny", "pretrained": True,
                           "timm_ckpt": str(tmp_path / "nope.pth")})
    with pytest.raises(FileNotFoundError):
        _init_imagenet_backbone(model, params, conf)

    # pretrained=true with no weights available: loud from-scratch warning,
    # params unchanged.
    records = []
    with _capture_trainer_logs()(records):
        out = _init_imagenet_backbone(
            model, params,
            dict2namespace({"backbone": "tiny", "pretrained": True}))
    assert any("FROM SCRATCH" in m for m in records), records
    assert out is params

    # A warm-start checkpoint suppresses the timm init entirely.
    records2 = []
    with _capture_trainer_logs()(records2):
        out2 = _init_imagenet_backbone(
            model, params,
            dict2namespace({"backbone": "tiny", "pretrained": True,
                            "coarse_ckpt": "x.ckpt",
                            "timm_ckpt": str(tmp_path / "nope.pth")}))
    assert out2 is params and not records2


def test_train_coarse_uses_imagenet_init(scene, tmp_path):
    """train() itself invokes the ImageNet init: a distinctive stem-bias
    value from the timm ckpt survives one debug epoch of training."""
    import jax
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.train.matcher_trainer import train_coarse

    cfg = matcher_config(scene, tmp_path, coarse=True)
    tmpl = NeRFMatcherCoarse(
        CoarseMatcherConfig.from_namespace(cfg.model)).init_params(
            jax.random.PRNGKey(cfg.exp.seed))
    npz = tmp_path / "timm_tiny.npz"
    _synthetic_timm_npz(tmpl["backbone"], npz, shift=3.0)
    cfg.model.pretrained = True
    cfg.model.timm_ckpt = str(npz)
    _, params = train_coarse(cfg)
    bias = np.asarray(params["backbone"]["stem"]["conv"]["bias"])
    init = np.asarray(tmpl["backbone"]["stem"]["conv"]["bias"])
    # Started from init+3, nudged by a few small grad steps — nowhere near
    # the from-scratch init values.
    assert np.all(np.abs(bias - (init + 3.0)) < 0.5), bias


def test_eval_batch_pose_shapes(scene):
    """Host PnP val path produces per-sample errors."""
    import jax
    from nerfmatch_tpu.models.matcher_coarse import NeRFMatcherCoarse, \
        CoarseMatcherConfig
    from nerfmatch_tpu.train.matcher_trainer import eval_batch_pose, _model_inputs
    from nerfmatch_tpu.data import NeRFMatchPair

    cfg = matcher_config(scene, scene["root"], coarse=True)
    ds = NeRFMatchPair(cfg.data, split="val", val_num=4)
    model = NeRFMatcherCoarse(CoarseMatcherConfig.from_namespace(cfg.model))
    params = model.init_params(jax.random.PRNGKey(0))
    from nerfmatch_tpu.data.loaders import _collate
    batch = _collate([ds[0]])
    out = eval_batch_pose(model, params, _model_inputs(batch), rthres=6)
    assert len(out["R_err"]) == 1
    assert np.isfinite(out["R_err"][0]) or np.isinf(out["R_err"][0])


def test_nerf_pair_validation_metrics(scene, tmp_path):
    """Retrieval-pair val samples produce depth/match pose metrics."""
    import jax
    from nerfmatch_tpu.train.nerf_trainer import NerfTrainer
    from nerfmatch_tpu.data import init_data_loader

    cfg = nerf_train_config(scene, tmp_path)
    cfg.data.train_pair_txt = str(scene["root"] / "pairs.txt")
    loader = init_data_loader(cfg.data, 0, split="val")
    sample = next(iter(loader))
    sample = {k: (v[0] if isinstance(v, (np.ndarray, list)) else v)
              for k, v in sample.items()}
    assert np.asarray(sample["c2w"]).size == 32  # stacked pair
    trainer = NerfTrainer(cfg, num_frames=1)
    params, _ = trainer.init_state(0)
    m = trainer.validate_pair(params, sample, ds=8)
    for k in ["R_err_depth", "t_err_depth", "R_err_match", "t_err_match",
              "match_score", "num_matches"]:
        assert k in m
    # Untrained NeRF -> errors can be inf but must be well-formed numbers.
    assert isinstance(m["num_matches"], int)


def test_nerf_train_step_with_loss_mask(scene, tmp_path):
    """use_sem_mask path: per-ray mask weights the MSE (zero mask -> the
    masked rays contribute nothing)."""
    import jax
    import jax.numpy as jnp
    from nerfmatch_tpu.train.nerf_trainer import NerfTrainer
    from nerfmatch_tpu.parallel.mesh import make_mesh, shard_batch
    from nerfmatch_tpu.data import init_data_loader

    cfg = nerf_train_config(scene, tmp_path)
    ds = init_data_loader(cfg.data, 0, 1, split="train").dataset
    mesh = make_mesh()
    trainer = NerfTrainer(cfg, num_frames=1, mesh=mesh)
    params, opt_state = trainer.init_state(0)
    step = trainer.train_step_fn()
    batch = next(iter(ds.ray_batches(512, np.random.default_rng(0))))
    sb = shard_batch(batch, mesh)
    k = jax.random.PRNGKey(0)

    ones = jnp.ones((512, 1), jnp.float32)
    _, _, m1 = step(params, opt_state, sb["rays"], sb["rgbs"],
                    sb["ts"].astype(jnp.int32), k, ones)
    _, _, m0 = step(params, opt_state, sb["rays"], sb["rgbs"],
                    sb["ts"].astype(jnp.int32), k)
    # All-ones mask == no mask.
    assert np.allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    # Half mask strictly shrinks the (mean-reduced) rgb losses.
    half = ones.at[:256].set(0.0)
    _, _, mh = step(params, opt_state, sb["rays"], sb["rgbs"],
                    sb["ts"].astype(jnp.int32), k, half)
    assert float(mh["rgb_fine_mse"]) < float(m0["rgb_fine_mse"])


def test_div_temperature_frozen_through_train_step():
    """The trainer bodies must route through model.temperature() — a raw
    params['temperature'] would let Adam drift the frozen div/LoFTR value
    (reference requires_grad=False)."""
    import jax
    import jax.numpy as jnp
    import optax
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.train.matcher_trainer import CoarseTrainStep

    cfg = CoarseMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
        im_pe=True, im_sa=0, im_sa_type=None, pt_sa=0, pt_sa_type=None,
        pt_pe=False, coarse_layers=0, temp_type="div")
    model = NeRFMatcherCoarse(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    step = CoarseTrainStep(model, opt)

    rng = np.random.default_rng(1)
    bs, hw, n = 2, 32, 16
    m = (hw // 8) ** 2
    img = jnp.asarray(rng.uniform(0, 1, (bs, hw, hw, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, n, 16)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, n, 3)), jnp.float32)
    conf_gt = np.zeros((bs, m, n), np.float32)
    conf_gt[:, np.arange(m), rng.integers(0, n, m)] = 1.0

    p2, _, _ = step.step(params, opt.init(params), img, pt_feat, pt3d,
                         jnp.ones((bs, m)), jnp.ones((bs, n)),
                         jnp.asarray(conf_gt), jax.random.PRNGKey(5))
    assert float(p2["temperature"]) == float(params["temperature"])
    assert float(p2["temperature"]) == pytest.approx(0.1)
    # Other params did move.
    w0 = jax.tree_util.tree_leaves(params["backbone"])[0]
    w1 = jax.tree_util.tree_leaves(p2["backbone"])[0]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
