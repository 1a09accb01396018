"""int8-trunk serving mode END-TO-END quality gate on the TPU.

Same design as scripts/earlyterm_e2e_gate.py (which justified the
early-termination default): the kernel-level deltas of the int8 serving
trunks are measured (coarse-only ~1.2e-3 mean rgb vs f32, both ~3.4e-3 —
quant.py, scripts/int8_quality_probe.py), but the claim that matters for
making int8 the cache-serving default is that LOCALIZATION doesn't move.

Pipeline on the enclosed indoor scene (the 7-Scenes depth profile):

1. train a production-dim mip NeRF once (E2E_NERF_EPOCHS, default 30 —
   the first gate run at 10 epochs produced a pose pipeline too chaotic
   to measure serving drift: baseline medians 7.9 deg with --iters 2
   WORSE than single-shot, and sub-1e-3 feature deltas cascading into
   degrees of drift in RANDOM directions — int8 mode=coarse IMPROVED the
   medians.  A drift gate needs a stable baseline first),
2. for mode in {none, xla, coarse, both}: cache scene-point features
   with ``render.trunk_int8=mode`` (early_term_eps stays the production
   default 1e-4), timing the cache stage COLD and WARM (the warm second
   pass is the serving steady state; the cold pass buys compiles +
   calibration).  The extra ``xla`` arm renders the cache through the
   non-fused XLA path — its drift vs mode=none measures how much pose
   noise the QUALITY-APPROVED fused-bf16 path already carries (the
   ~8e-4 fused-vs-XLA feature delta), i.e. the pipeline's accepted
   noise floor,
3. train the coarse matcher ONCE on the mode=none cache,
4. localize every held-out query (single-shot and --iters 2) with the
   mode-matched cache + renderer,
5. print per-mode medians, recall, per-query drift, cache speedups.

PASS criterion per int8 mode x protocol: recall identical to mode=none
AND median R/t drift within max(absolute floor: 0.05 deg / 0.002 units,
2x the xla arm's median drift) — int8 serving must not cost more pose
accuracy than the already-accepted fused-vs-XLA delta.

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

# Candidate int8 modes under test; the "none" baseline + "xla" noise-floor
# arms always run.  Override with E2E_INT8_MODES=posttap (comma list) to
# gate a single new mode without re-running the already-gated ones.
CANDIDATES = tuple(
    m for m in os.environ.get("E2E_INT8_MODES", "coarse,both").split(",")
    if m)
MODES = ("none", "xla") + CANDIDATES
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
    epochs = int(os.environ.get("E2E_NERF_EPOCHS", 30))
    ncfg = nerf_config(root, root / "out_nerf", epochs=epochs)
    ncfg.data.max_frustum_depth = 6
    _, params = nerf_trainer.train(ncfg)
    print(f"[1] NeRF({epochs}ep) trained in {time.time() - t0:.0f}s",
          flush=True)

    class _XlaRenderer(NerfRenderer):
        # noise-floor arm: force the non-fused XLA eval path
        fused_eval_supported = False

    # ---- stage 2: feature caches per serving mode ----
    renderers, caches, cache_times = {}, {}, {}
    for mode in MODES:
        ecfg = nerf_config(root, root / "out_nerf")
        ecfg.data.max_frustum_depth = 6
        ecfg.split = "test"
        ecfg.downsample = DS
        ecfg.data.downsample = DS
        ecfg.ckpt = "eval"
        cls = NerfRenderer
        if mode == "xla":
            ecfg.render.trunk_int8 = "none"
            cls = _XlaRenderer
        else:
            ecfg.render.trunk_int8 = mode
        renderers[mode] = cls(ecfg, stop_layer=3)
        ev = NerfEvaluator(ecfg, renderers[mode], params)
        t0 = time.time()
        caches[mode] = ev.cache_scene_pts(cache_dir=root / f"cache_{mode}")
        t_cold = time.time() - t0
        t0 = time.time()
        ev.cache_scene_pts(cache_dir=root / f"cache_{mode}")
        cache_times[mode] = time.time() - t0
        print(f"[2] trunk_int8={mode}: cached in {t_cold:.1f}s cold / "
              f"{cache_times[mode]:.1f}s warm (serving steady state)",
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
    for mode in ("xla",) + CANDIDATES:
        print(f"cache stage (warm): none {cache_times['none']:.1f}s -> "
              f"{mode} {cache_times[mode]:.1f}s "
              f"({cache_times['none'] / cache_times[mode]:.2f}x)")

    def drift(mode, proto):
        r0, t0_, _ = results["none", proto]
        r1, t1, _ = results[mode, proto]
        rec0 = float(np.mean((r0 < R_THRES) & (t0_ < T_THRES)))
        rec1 = float(np.mean((r1 < R_THRES) & (t1 < T_THRES)))
        return (abs(np.median(r1) - np.median(r0)),
                abs(np.median(t1) - np.median(t0_)),
                np.abs(r1 - r0).max(), np.abs(t1 - t0_).max(), rec0, rec1)

    # The xla arm's drift = the pose noise the pipeline ALREADY accepts
    # from the quality-approved fused-bf16 path (~8e-4 feature delta).
    floor = {}
    for proto in ("single", "iters2"):
        dmr, dmt, dr, dt, _, _ = drift("xla", proto)
        floor[proto] = (dmr, dmt)
        print(f"[   xla|{proto:>7}] accepted-noise floor: median "
              f"|dR|={dmr:.4f}deg |dt|={dmt:.5f} (per-query max "
              f"{dr:.4f}/{dt:.5f})")
    ok = True
    for mode in CANDIDATES:
        for proto in ("single", "iters2"):
            dmr, dmt, dr, dt, rec0, rec1 = drift(mode, proto)
            lim_r = max(0.05, 2 * floor[proto][0])
            lim_t = max(0.002, 2 * floor[proto][1])
            ok_i = (rec0 == rec1) and dmr <= lim_r and dmt <= lim_t
            r0 = results["none", proto][0]
            r1 = results[mode, proto][0]
            print(f"[{mode:>6}|{proto:>7}] median |dR|={dmr:.4f}deg "
                  f"(limit {lim_r:.4f}) |dt|={dmt:.5f} (limit {lim_t:.5f}) "
                  f"per-query max {dr:.4f}/{dt:.5f}  recall {rec0:.2f} -> "
                  f"{rec1:.2f}  medians {np.median(r0):.3f} -> "
                  f"{np.median(r1):.3f}  {'ok' if ok_i else 'FAIL'}")
            ok &= ok_i
    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
