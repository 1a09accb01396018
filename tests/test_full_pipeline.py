"""Full-workflow integration: NeRF train -> scene-point cache -> matcher
train -> localization benchmark, all through the public CLI/API surface."""

import numpy as np
import pytest

from nerfmatch_tpu.config import dict2namespace, namespace2dict
from tests._synthetic import build_scene, W, H, DS, FEAT_DIM
from tests.test_trainers import nerf_train_config, matcher_config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("pipe_scene"),
                       correlated_feats=True)


def test_full_pipeline(scene, tmp_path):
    # ---- Stage 1: train the NeRF (debug epochs) -> native checkpoint.
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint

    cfg = nerf_train_config(scene, tmp_path / "nerf")
    out_cfg, _ = nerf_trainer.train(cfg)
    run_dir = nerf_trainer.init_config_odir(out_cfg)
    ckpt = latest_checkpoint(run_dir / "checkpoints", name="last")
    assert ckpt is not None

    # ---- Stage 2: eval CLI loads the ckpt and writes the scene-point cache.
    from nerfmatch_tpu.eval.nerf_evaluator import load_nerf_from_ckpt

    args = dict2namespace({
        "split": "test", "stop_layer": 1, "img_wh": None,
        "downsample": DS,
    })
    evaluator = load_nerf_from_ckpt(ckpt, args)
    cache_out = tmp_path / "scene_out"
    scene_dir = evaluator.cache_scene_pts(cache_dir=cache_out, debug=True)
    produced = sorted(scene_dir.glob("*.npy"))
    assert len(produced) >= 1

    # ---- Stage 3: matcher consumes NeRF-rendered features end-to-end.
    # (Use the full synthetic cache for enough pairs; the stage-2 cache is
    # schema-checked above and in test_evaluators.)
    from nerfmatch_tpu.train.matcher_trainer import train_coarse
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint as latest2

    mcfg = matcher_config(scene, tmp_path / "matcher", coarse=True)
    out_mcfg, _ = train_coarse(mcfg)
    from nerfmatch_tpu.train.matcher_trainer import init_config_odir
    mrun = init_config_odir(out_mcfg, coarse=True)
    mckpt = latest2(mrun / "checkpoints", name="last")
    assert mckpt is not None

    # ---- Stage 4: localization benchmark from the matcher checkpoint.
    from nerfmatch_tpu.eval.match_evaluator import load_nerfmatch_from_ckpt

    ev = load_nerfmatch_from_ckpt(mckpt)
    avg, per_scene = ev.eval_multi_scenes(
        split="val", rthres=6.0, solver="colmap", match_oracle=True,
        cache_dir=tmp_path / "bench", debug=True)
    assert avg is not None and np.isfinite(avg["t_med"])


def test_cli_parsers():
    """CLI flag surfaces parse their reference-documented invocations."""
    from nerfmatch_tpu.cli.train_nerf import build_parser as p1
    from nerfmatch_tpu.cli.train_nerfmatch import build_parser as p2
    from nerfmatch_tpu.cli.eval_nerf import build_parser as p3
    from nerfmatch_tpu.cli.benchmark_nerfmatch import build_parser as p4

    a = p1().parse_args(["--config", "c.yaml", "--scene", "chess", "--debug"])
    assert a.scene == "chess" and a.debug

    a = p2().parse_args(["--config", "c.yaml", "--update_conf",
                         "--coarse_ckpt", "x.ckpt", "--pair_topk", "30"])
    assert a.update_conf and a.pair_topk == 30

    a = p3().parse_args(["--ckpt", "m.ckpt", "--cache_scene_pts",
                         "--stop_layer", "3", "--downsample", "8"])
    assert a.cache_scene_pts and a.stop_layer == 3

    a = p4().parse_args(["--ckpts", "m.ckpt", "--solver", "colmap",
                         "--rthres", "5", "--mutual", "--iters", "2",
                         "--inerf", "--inerf_optim", "3", "--eval_bs", "4"])
    assert a.mutual and a.iters == 2 and a.inerf and a.eval_bs == 4

    a = p1().parse_args(["--config", "c.yaml", "--detect_anomaly"])
    assert a.detect_anomaly
    a = p2().parse_args(["--config", "c.yaml", "--detect_anomaly"])
    assert a.detect_anomaly


def test_debug_nans_flags_nan_step():
    """The --detect_anomaly backend (jax_debug_nans) must raise at a
    NaN-producing jitted step — the reference's pl.Trainer
    detect_anomaly=True equivalent (nerfmatch_coarse_trainer.py:680)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_debug_nans", True)
    try:
        @jax.jit
        def bad(x):
            return jnp.log(x - 1.0)  # NaN for x < 1

        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.zeros((4,))))
    finally:
        jax.config.update("jax_debug_nans", False)
