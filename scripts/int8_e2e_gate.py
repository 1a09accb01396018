"""int8-trunk serving mode END-TO-END quality gate on the TPU.

Same design as scripts/earlyterm_e2e_gate.py (which justified the
early-termination default): the kernel-level deltas of the int8 serving
trunks are measured (coarse-only ~1.2e-3 mean rgb vs f32, both ~3.4e-3 —
quant.py, scripts/int8_quality_probe.py), but the claim that matters for
making int8 the cache-serving default is that LOCALIZATION doesn't move.

Pipeline on the enclosed indoor scene (the 7-Scenes depth profile):

1. train a production-dim mip NeRF once,
2. for mode in {none, coarse, both}: cache scene-point features via the
   fused eval path with ``render.trunk_int8=mode`` (early_term_eps stays
   the production default 1e-4), timing the cache stage,
3. train the coarse matcher ONCE on the mode=none cache,
4. localize every held-out query (single-shot and --iters 2) with the
   mode-matched cache + renderer,
5. print per-mode medians, recall, per-query drift, cache speedups.

PASS criterion: recall identical to mode=none and median R/t drift below
the pose noise floor (0.05 deg / 2 mm-equivalent scene units) under both
protocols.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/int8_e2e_gate.py
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

MODES = ("none", "coarse", "both")
R_THRES, T_THRES = 5.0, 0.05  # recall thresholds (deg, scene units)


def main():
    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.matcher_trainer import train_coarse

    root = Path(os.environ.get("E2E_ROOT", "/tmp/e2e_int8"))
    root.mkdir(parents=True, exist_ok=True)
    build_scene(root)

    # ---- stage 1: one NeRF for all serving modes ----
    t0 = time.time()
    ncfg = nerf_config(root, root / "out_nerf",
                       epochs=int(os.environ.get("E2E_NERF_EPOCHS", 10)))
    ncfg.data.max_frustum_depth = 6
    _, params = nerf_trainer.train(ncfg)
    print(f"[1] NeRF trained in {time.time() - t0:.0f}s", flush=True)

    # ---- stage 2: feature caches per serving mode ----
    renderers, caches, cache_times = {}, {}, {}
    for mode in MODES:
        ecfg = nerf_config(root, root / "out_nerf")
        ecfg.data.max_frustum_depth = 6
        ecfg.split = "test"
        ecfg.downsample = DS
        ecfg.data.downsample = DS
        ecfg.ckpt = "eval"
        ecfg.render.trunk_int8 = mode
        renderers[mode] = NerfRenderer(ecfg, stop_layer=3)
        ev = NerfEvaluator(ecfg, renderers[mode], params)
        t0 = time.time()
        caches[mode] = ev.cache_scene_pts(cache_dir=root / f"cache_{mode}")
        cache_times[mode] = time.time() - t0
        print(f"[2] trunk_int8={mode}: cached in {cache_times[mode]:.1f}s",
              flush=True)

    # ---- stage 3: one matcher, trained on the f32 cache ----
    t0 = time.time()
    mcfg = matcher_cfg(root, caches["none"], root / "out_match")
    _, mparams = train_coarse(mcfg)
    print(f"[3] matcher trained in {time.time() - t0:.0f}s", flush=True)

    # ---- stage 4: localization per mode x protocol ----
    results = {}
    for mode in MODES:
        ev_cfg = matcher_cfg(root, caches[mode], root / "out_match")
        mev = NeRFMatchEvaluator(ev_cfg, params=mparams)
        ds = NeRFMatchPair(ev_cfg.data, split="test")
        for proto, kw in [("single", dict(iters=1)),
                          ("iters2", dict(iters=2))]:
            r_errs, t_errs, ns = [], [], []
            for i in range(len(ds)):
                out = mev.eval_batch(
                    _collate([ds[i]]), renderer=renderers[mode],
                    renderer_params=params, mutual=True, rthres=6.0,
                    solver="colmap", **kw)
                r_errs.append(out["R_err"][0])
                t_errs.append(out["t_err"][0])
                ns.append(out["num_matches"][0])
            r, t = np.asarray(r_errs), np.asarray(t_errs)
            results[mode, proto] = (r, t, np.asarray(ns))
            rec = float(np.mean((r < R_THRES) & (t < T_THRES)))
            print(f"  {mode:>6} [{proto:>7}] median R={np.median(r):.3f}deg "
                  f"t={np.median(t):.4f} recall@({R_THRES}deg,{T_THRES})="
                  f"{rec:.2f} matches={int(np.median(ns))}", flush=True)

    # ---- verdict ----
    print("== int8 serving gate summary ==")
    for mode in ("coarse", "both"):
        print(f"cache stage: none {cache_times['none']:.1f}s -> {mode} "
              f"{cache_times[mode]:.1f}s "
              f"({cache_times['none'] / cache_times[mode]:.2f}x)")
    ok = True
    for mode in ("coarse", "both"):
        for proto in ("single", "iters2"):
            r0, t0_, _ = results["none", proto]
            r1, t1, _ = results[mode, proto]
            dr, dt = np.abs(r1 - r0).max(), np.abs(t1 - t0_).max()
            rec0 = float(np.mean((r0 < R_THRES) & (t0_ < T_THRES)))
            rec1 = float(np.mean((r1 < R_THRES) & (t1 < T_THRES)))
            dmr = abs(np.median(r1) - np.median(r0))
            dmt = abs(np.median(t1) - np.median(t0_))
            print(f"[{mode:>6}|{proto:>7}] max per-query |dR|={dr:.4f}deg "
                  f"|dt|={dt:.5f}  recall {rec0:.2f} -> {rec1:.2f}  medians "
                  f"{np.median(r0):.3f}/{np.median(t0_):.4f} -> "
                  f"{np.median(r1):.3f}/{np.median(t1):.4f}")
            ok &= (rec0 == rec1) and dmr < 0.05 and dmt < 0.002
    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
