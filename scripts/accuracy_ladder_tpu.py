"""Accuracy-regime ladder: show pose error is NeRF-bound, not matcher-bound.

VERDICT r4 item 8: the round-3 on-TPU full pipeline (10-epoch NeRF, val
PSNR 25.6) localized at median 4.27 deg / 0.138 units with every
refinement protocol plateauing together — the claim being that the
residual error is NeRF-reconstruction bias (pt3d), exactly like the real
system (reference accuracy rides NeRF quality; cf.
``model_eval/README.md:29-43`` caching protocol and the paper's
NeRF-quality ablations).  This script PROVES the trend on-chip: train the
same enclosed scene LONGER (default 30 epochs — the in-repo room ckpt
shows 28.9 dB is reachable), re-run the full ladder (coarse single-shot,
C2F fine, --iters 2, iters2+iNeRF), and print the quality->accuracy
table.  Pose medians must improve with PSNR for the NeRF-bound story to
hold.

Reference points recorded in PARITY (round 3, 10 epochs, PSNR 25.6):
  single R=4.27deg t=0.138 | c2f-fine R=4.78 t=0.174 |
  iters2 R=4.13 t=0.167   | iters2+inerf R=4.24 t=0.148

Run: E2E_NERF_EPOCHS=30 python scripts/accuracy_ladder_tpu.py
(env also honored: E2E_ROOT, E2E_MATCH_EPOCHS)
"""

from __future__ import annotations

import os
import sys
import time
from argparse import Namespace
from pathlib import Path

import numpy as np

os.environ["E2E_ENCLOSED"] = "1"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.e2e_full_pipeline_tpu import (  # noqa: E402
    DS, build_scene, matcher_cfg, nerf_config)

ROUND3_BASELINE = {  # 10-epoch NeRF, val PSNR 25.6 (PARITY round-3 e2e)
    "psnr": 25.6,
    "single": (4.27, 0.138), "c2f-fine": (4.78, 0.174),
    "iters2": (4.13, 0.167), "iters2+inerf": (4.24, 0.148),
}


def main():
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint
    from nerfmatch_tpu.train.matcher_trainer import (init_config_odir,
                                                     train_c2f, train_coarse)

    epochs = int(os.environ.get("E2E_NERF_EPOCHS", 30))
    m_epochs = int(os.environ.get("E2E_MATCH_EPOCHS", 40))
    root = Path(os.environ.get("E2E_ROOT", f"/tmp/e2e_ladder{epochs}"))
    root.mkdir(parents=True, exist_ok=True)
    build_scene(root)
    t_all = time.time()

    # ---- stage 1: the longer NeRF fit ----
    t0 = time.time()
    ncfg = nerf_config(root, root / "out_nerf", epochs=epochs)
    ncfg.data.max_frustum_depth = 6
    out_cfg, params = nerf_trainer.train(ncfg)
    print(f"[1] NeRF({epochs}ep) trained in {time.time()-t0:.0f}s",
          flush=True)

    # val PSNR of the trained model (held-out views, full-res render)
    ecfg = nerf_config(root, root / "out_nerf")
    ecfg.data.max_frustum_depth = 6
    ecfg.split = "val"
    ecfg.ckpt = "eval"
    renderer_full = NerfRenderer(ecfg)
    ev_n = NerfEvaluator(ecfg, renderer_full, params)
    res = ev_n.eval_data_loader(cache_dir=root / "val_render")
    psnr = float(np.mean(res["psnr"]))
    print(f"    held-out val PSNR: {psnr:.2f} dB "
          f"(round-3 reference point: {ROUND3_BASELINE['psnr']})",
          flush=True)

    # ---- stage 2: ds=8 feature cache ----
    t0 = time.time()
    ccfg = nerf_config(root, root / "out_nerf")
    ccfg.data.max_frustum_depth = 6
    ccfg.split = "test"
    ccfg.downsample = DS
    ccfg.data.downsample = DS
    ccfg.ckpt = "eval"
    # Pin the f32/bf16 serving path: this ladder isolates the NeRF-quality
    # variable against the round-3 reference points, which were measured
    # before SERVING_INT8_DEFAULT flipped to 'coarse' (int8 drift is
    # gate-verified sub-noise, but the comparison stays single-variable).
    ccfg.render.trunk_int8 = "none"
    renderer = NerfRenderer(ccfg, stop_layer=3)
    ev = NerfEvaluator(ccfg, renderer, params)
    cache_dir = ev.cache_scene_pts(cache_dir=root / "scene_cache")
    print(f"[2] cached in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 3: coarse + c2f matchers on the better features ----
    t0 = time.time()
    mcfg = matcher_cfg(root, cache_dir, root / "out_match", epochs=m_epochs)
    out_mcfg, mparams = train_coarse(mcfg)
    coarse_best = latest_checkpoint(
        init_config_odir(out_mcfg, coarse=True) / "checkpoints", name="best")
    c2cfg = matcher_cfg(root, cache_dir, root / "out_match_c2f",
                        epochs=m_epochs, c2f=True)
    c2cfg.model.coarse_ckpt = str(coarse_best)
    _, cparams = train_c2f(c2cfg)
    print(f"[3] matchers trained in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 4: the refinement ladder ----
    mev = NeRFMatchEvaluator(matcher_cfg(root, cache_dir,
                                         root / "out_match"), params=mparams)
    mev_c2f = NeRFMatchEvaluator(
        matcher_cfg(root, cache_dir, root / "out_match_c2f", c2f=True),
        params=cparams)
    ds = NeRFMatchPair(matcher_cfg(root, cache_dir,
                                   root / "out_match").data, split="test")
    inerf_conf = Namespace(num_optim=3, lrate=2e-3, lrdecay=0.6,
                           eval_pose=True, ds=DS, use_match_loss=False)
    protos = [("single", dict(iters=1), mev),
              ("c2f-fine", dict(iters=1), mev_c2f),
              ("iters2", dict(iters=2), mev),
              ("iters2+inerf", dict(iters=2, inerf_conf=inerf_conf), mev)]
    print(f"\n== ladder at val PSNR {psnr:.2f} dB ({epochs} epochs) ==")
    print(f"{'protocol':>14} | this run R/t | round-3 @25.6dB R/t | matches")
    results = {}
    for name, kw, use_ev in protos:
        r_errs, t_errs, ns = [], [], []
        for i in range(len(ds)):
            out = use_ev.eval_batch(
                _collate([ds[i]]), renderer=renderer, renderer_params=params,
                mutual=True, rthres=6.0, solver="colmap", **kw)
            r_errs.append(out["R_err"][0])
            t_errs.append(out["t_err"][0])
            ns.append(out["num_matches"][0])
        r, t = float(np.median(r_errs)), float(np.median(t_errs))
        results[name] = (r, t, int(np.median(ns)))
        r0, t0_ = ROUND3_BASELINE[name]
        print(f"{name:>14} | {r:5.2f}/{t:.3f} | {r0:5.2f}/{t0_:.3f} | "
              f"{int(np.median(ns))}", flush=True)

    import json
    Path(f"/tmp/accuracy_ladder_{epochs}ep.json").write_text(json.dumps(
        {"epochs": epochs, "psnr": psnr,
         "ladder": {k: dict(r_med=v[0], t_med=v[1], matches=v[2])
                    for k, v in results.items()},
         "round3_baseline": ROUND3_BASELINE,
         "wall_s": time.time() - t_all}, indent=1))
    print(f"\ntotal {time.time()-t_all:.0f}s; json -> "
          f"/tmp/accuracy_ladder_{epochs}ep.json")
    better = sum(results[k][0] < ROUND3_BASELINE[k][0] for k in results)
    print(f"pose-median improvements vs round-3 @25.6dB: {better}/4 "
          f"protocols (NeRF-bound story holds iff PSNR rose and medians "
          f"fell)")


if __name__ == "__main__":
    main()
