"""Early-ray-termination END-TO-END quality gate on the TPU.

Round-3 verdict asked for pose-level evidence before early termination
(``RenderConfig.early_term_eps``) can be the benchmarked default: the
per-output <eps bound (tests/test_pallas_render.py) and the measured
render deltas (scripts/earlyterm_quality.py) say the FEATURES barely
move, but the claim that matters is that LOCALIZATION doesn't.

This runs the full production pipeline on an ENCLOSED indoor scene
(every ray terminates on geometry — the 7-Scenes depth profile,
reference data/setup_7scenes.py; E2E_ENCLOSED=1 variant of the e2e
scene):

1. train a production-dim mip NeRF once (nerf_trainer.train),
2. for eps in {0, 1e-4}: cache scene-point features via the fused eval
   path (NerfEvaluator.cache_scene_pts) — timing the cache stage, which
   is exactly the workload bench.py measures,
3. train the coarse matcher ONCE on the eps=0 cache (training never uses
   early termination),
4. localize every held-out query under both protocols (single-shot and
   the production --iters 2 re-render loop) with the eps-matched cache +
   renderer,
5. print per-protocol medians, recall, the max per-query error delta,
   and the cache-stage speedup.

PASS criterion (recorded in PARITY.md): median R/t and recall identical
to the eps=0 run within per-query deltas << the pose noise floor.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/earlyterm_e2e_gate.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ["E2E_ENCLOSED"] = "1"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.e2e_full_pipeline_tpu import (  # noqa: E402
    DS, build_scene, matcher_cfg, nerf_config)

EPS_GRID = (0.0, 1e-4)
R_THRES, T_THRES = 5.0, 0.05  # recall thresholds (deg, scene units)


def main():
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.matcher_trainer import train_coarse

    root = Path(os.environ.get("E2E_ROOT", "/tmp/e2e_earlyterm"))
    root.mkdir(parents=True, exist_ok=True)
    build_scene(root)

    # ---- stage 1: one NeRF for all eps settings ----
    t0 = time.time()
    ncfg = nerf_config(root, root / "out_nerf",
                       epochs=int(os.environ.get("E2E_NERF_EPOCHS", 10)))
    # Enclosed scene: the shell (r=3.2) must sit inside the fst
    # normalization sphere -> frustum depth covering camera->far shell.
    ncfg.data.max_frustum_depth = 6
    _, params = nerf_trainer.train(ncfg)
    print(f"[1] NeRF trained in {time.time() - t0:.0f}s", flush=True)

    # ---- stage 2: feature caches per eps (the cache_scene_pts workload) --
    renderers, caches, cache_times = {}, {}, {}
    for eps in EPS_GRID:
        ecfg = nerf_config(root, root / "out_nerf")
        ecfg.data.max_frustum_depth = 6
        ecfg.split = "test"
        ecfg.downsample = DS
        ecfg.data.downsample = DS
        ecfg.ckpt = "eval"
        ecfg.render.early_term_eps = eps
        renderers[eps] = NerfRenderer(ecfg, stop_layer=3)
        ev = NerfEvaluator(ecfg, renderers[eps], params)
        t0 = time.time()
        caches[eps] = ev.cache_scene_pts(cache_dir=root / f"cache_eps{eps:g}")
        cache_times[eps] = time.time() - t0
        print(f"[2] eps={eps:g}: cached in {cache_times[eps]:.1f}s",
              flush=True)

    # ---- stage 3: one matcher, trained on the eps=0 cache ----
    t0 = time.time()
    mcfg = matcher_cfg(root, caches[0.0], root / "out_match")
    _, mparams = train_coarse(mcfg)
    print(f"[3] matcher trained in {time.time() - t0:.0f}s", flush=True)

    # ---- stage 4: localization per eps x protocol ----
    results = {}
    for eps in EPS_GRID:
        ev_cfg = matcher_cfg(root, caches[eps], root / "out_match")
        mev = NeRFMatchEvaluator(ev_cfg, params=mparams)
        ds = NeRFMatchPair(ev_cfg.data, split="test")
        for proto, kw in [("single", dict(iters=1)), ("iters2", dict(iters=2))]:
            r_errs, t_errs, ns = [], [], []
            for i in range(len(ds)):
                out = mev.eval_batch(
                    _collate([ds[i]]), renderer=renderers[eps],
                    renderer_params=params, mutual=True, rthres=6.0,
                    solver="colmap", **kw)
                r_errs.append(out["R_err"][0])
                t_errs.append(out["t_err"][0])
                ns.append(out["num_matches"][0])
            r, t = np.asarray(r_errs), np.asarray(t_errs)
            results[eps, proto] = (r, t, np.asarray(ns))
            rec = float(np.mean((r < R_THRES) & (t < T_THRES)))
            print(f"  eps={eps:g} [{proto:>7}] median R={np.median(r):.3f}deg "
                  f"t={np.median(t):.4f} recall@({R_THRES}deg,{T_THRES})="
                  f"{rec:.2f} matches={int(np.median(ns))}", flush=True)

    # ---- verdict ----
    print("== early-termination gate summary ==")
    print(f"cache stage: eps=0 {cache_times[0.0]:.1f}s -> eps=1e-4 "
          f"{cache_times[1e-4]:.1f}s "
          f"({cache_times[0.0] / cache_times[1e-4]:.2f}x)")
    ok = True
    for proto in ("single", "iters2"):
        r0, t0_, _ = results[0.0, proto]
        r1, t1, _ = results[1e-4, proto]
        dr, dt = np.abs(r1 - r0).max(), np.abs(t1 - t0_).max()
        rec0 = float(np.mean((r0 < R_THRES) & (t0_ < T_THRES)))
        rec1 = float(np.mean((r1 < R_THRES) & (t1 < T_THRES)))
        same_rec = rec0 == rec1
        print(f"[{proto:>7}] max per-query |dR|={dr:.4f}deg |dt|={dt:.5f}  "
              f"recall {rec0:.2f} -> {rec1:.2f}  medians "
              f"{np.median(r0):.3f}/{np.median(t0_):.4f} -> "
              f"{np.median(r1):.3f}/{np.median(t1):.4f}")
        ok &= same_rec and dr < 0.5 and dt < 0.01
    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
