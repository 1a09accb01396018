"""On-chip verification of the batched --iters 2 protocol (round 4).

Two claims checked on the REAL TPU (the CPU suite covers orchestration
with a stub renderer; these need the fused kernels):

1. ``render_novel_views`` (one scan-grouped dispatch over B poses) is
   BIT-IDENTICAL to B sequential ``render_novel_view`` calls — same
   per-pose ray building/padding, and the scan body compiles to the same
   kernels as the single-chunk program.
2. ``eval_batch(eval_bs>1, iters=2)`` feeds the matcher bit-identical
   inputs to the per-query loop when the re-render runs on the real
   fused renderer.  PnP is pinned to a deterministic pure function of
   its inputs (hash -> pose), so any divergence in the re-rendered
   points/features shows up as a result mismatch.

Run: python scripts/verify_iters2_tpu.py   (serialize with other chip users)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from nerfmatch_tpu.nerf.renderer import NerfRenderer  # noqa: E402
from __graft_entry__ import _nerf_config  # noqa: E402

from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm


def check_novel_views_bitparity(renderer, params):
    from tests._synthetic import look_at

    K = np.array([[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]], np.float32)
    un = np.eye(4, dtype=np.float32) * np.float32(1.4)
    un[3, 3] = 1.0
    poses = [np.asarray(look_at([0.8 * np.cos(a), 0.2, 0.8 * np.sin(a)]),
                        np.float32) for a in (0.3, 1.7, 4.1)]
    singles = [renderer.render_novel_view(params, (96, 96), K, p, un,
                                          downsample=8) for p in poses]
    batched = renderer.render_novel_views(params, (96, 96), [K] * 3, poses,
                                          [un] * 3, downsample=8)
    for k in ("pt3d", "pt_feat", "im_pred"):
        for b in range(3):
            a = np.asarray(singles[b][k])
            v = np.asarray(batched[k][b]).reshape(a.shape)
            md = float(np.abs(a - v).max())
            assert md == 0.0, (k, b, md)
    print("[1] render_novel_views == per-pose render_novel_view "
          "(bit-identical, 3 poses x pt3d/pt_feat/rgb)")


def check_eval_batch_iters2(renderer, params):
    import tempfile

    from tests._synthetic import DS, H, W, build_scene, look_at

    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator

    tmp = Path(tempfile.mkdtemp(prefix="verify_iters2_"))
    scene = build_scene(tmp, correlated_feats=True)
    # The re-render produces the renderer's tapped feature dim; production
    # caches are built from the same NeRF, so pin pt_dim to it and swap
    # the synthetic 16-d cache features for deterministic ones of that dim.
    feat_dim = renderer.fine_cfg.hid_dim
    cfg = dict2namespace({
        "model": {"backbone": "tiny", "pretrained": False, "cfeat_dim": 32,
                  "pt_dim": feat_dim, "im_pe": False, "im_sa": 0,
                  "im_sa_type": None, "pt_sa": 0, "pt_sa_type": None,
                  "pt_pe": False, "coarse_layers": 0, "temp_type": "mul"},
        "data": {"dataset": "NeRFMatchPair", "data_dir": str(scene["root"]),
                 "scene": "toy", "scenes": ["toy"],
                 "scene_dir": str(scene["cache_dir"]),
                 "train_pair_txt": str(scene["root"] / "pairs.txt"),
                 "test_pair_txt": str(scene["root"] / "pairs.txt"),
                 "pair_topk": 2, "img_wh": [W, H],
                 "model_ds": DS, "imagenet_norm": False,
                 "balanced_pair": False},
        "exp": {"seed": 0}, "ckpt": "eval",
    })
    ev = NeRFMatchEvaluator(cfg)
    ds = NeRFMatchPair(cfg.data, split="test", val_num=4)
    items = [ds[0], ds[1]]
    rng = np.random.default_rng(3)
    for it in items:
        it["pt_feat"] = rng.normal(
            size=(it["pt_feat"].shape[0], feat_dim)).astype(np.float32)

    # Deterministic PnP stand-in: pose + "errors" are pure functions of the
    # correspondence bytes, so bit-equal matcher inputs <=> equal results.
    def fake_solve(pt2d, pt3d, K, c2w_gt, solver, rthres, center_subpixel):
        h = float((np.abs(pt2d).sum() + np.abs(pt3d).sum()) % 7.0)
        c2w = np.asarray(look_at([0.8, 0.2 + 0.01 * h, 0.1]), np.float64)
        return c2w, h, h / 10.0, len(pt2d)

    ev._solve_pose = fake_solve
    kw = dict(mutual=True, rthres=6.0, solver="colmap", iters=2,
              renderer=renderer, renderer_params=params)
    singles = [ev.eval_batch(_collate([items[i]]), **kw) for i in range(2)]
    batched = ev.eval_batch(_collate(items), **kw)
    for b in range(2):
        assert batched["num_matches"][b] == singles[b]["num_matches"][0], b
        for k in ("R_err", "t_err"):
            assert batched[k][b] == singles[b][k][0], (k, b)
    print("[2] eval_batch(eval_bs=2, iters=2) == per-query loop with the "
          "REAL fused re-render (hash-pinned PnP)")


def main():
    print(f"backend: {jax.default_backend()} devices={jax.devices()}")
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    try:
        from scripts.train_bench_scene import load_params

        params = load_params(renderer)
        print("using trained room-scene weights")
    except Exception as e:  # random init keeps the check valid (bit parity)
        print(f"trained weights unavailable ({e}); random init")
        params = renderer.init_params(jax.random.PRNGKey(0))
    t0 = time.time()
    check_novel_views_bitparity(renderer, params)
    check_eval_batch_iters2(renderer, params)
    print(f"ALL CHECKS PASSED in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
