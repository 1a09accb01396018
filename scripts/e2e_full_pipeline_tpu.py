"""FULL-PIPELINE e2e on the TPU: train NeRF -> cache features -> train
matcher -> localize, all through the production code paths.

This is BASELINE config 5's shape (reference ``model_train/README.md`` +
``model_eval/README.md``) executed end-to-end on one chip with a synthetic
but fully view-consistent scene: a normal-colored ball rendered analytically
through the repo's own camera/ray conventions (so images, annotations, and
projections are consistent by construction).  Production pieces exercised:

* ``nerf_trainer.train`` (fused custom-VJP train step, production 8x256
  mip NeRF, scene normalization, checkpointing, val renders),
* ``NerfEvaluator.cache_scene_pts`` (ds=8 layer-3 feature caches, §3.2
  npy schema),
* ``matcher_trainer.train_coarse`` (focal loss, adaptive LR, Pallas
  attention),
* ``NeRFMatchEvaluator.eval_batch`` (real matches -> top-k lists -> C++
  PnP) over held-out query views.

Prints a summary block recorded in PARITY.md.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/e2e_full_pipeline_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from PIL import Image

from nerfmatch_tpu.config import dict2namespace
from nerfmatch_tpu.utils.cache import enable_compile_cache

# Compiles dominate this pipeline's wall-clock on the 1-core host (the
# fused train step alone is ~15 min cold); the persistent cache makes
# reruns and the sibling gate/ladder scripts start warm.
enable_compile_cache()

W = H = 128
DS = 8
FOCAL = 160.0
CAM_R = 2.0
BALL_R = 0.7
SHELL_R = 3.2   # E2E_ENCLOSED=1: enclosing shell -> indoor room scene
N_TRAIN, N_TEST = 24, 6

# E2E_ENCLOSED=1 encloses the ball in a textured shell so EVERY camera ray
# terminates on geometry — the 7-Scenes-like depth profile (reference
# data/setup_7scenes.py scenes are all interiors) that the early-ray-
# termination quality gate (scripts/earlyterm_e2e_gate.py) must exercise.
ENCLOSED = bool(int(os.environ.get("E2E_ENCLOSED", "0")))


def look_at(eye):
    eye = np.asarray(eye, float)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return c2w


def ball_image(K, c2w):
    """Analytic ball image through the repo's ray conventions (numpy host
    helpers — the jnp variants would dispatch 30 tiny programs to the
    chip through the tunnel just to build the scene)."""
    from nerfmatch_tpu.data.nerf_dataset import ray_dirs_np, rays_c2w_np

    dirs = ray_dirs_np(H, W, np.asarray(K, np.float64))
    o, d, vdirs = rays_c2w_np(dirs, np.asarray(c2w, np.float64)[:3])
    o = np.broadcast_to(o, vdirs.shape).reshape(-1, 3)
    dn = np.asarray(vdirs).reshape(-1, 3)
    b = np.sum(o * dn, axis=-1)
    c = np.sum(o * o, axis=-1) - BALL_R**2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    p = o + t[:, None] * dn
    normal = p / BALL_R
    if ENCLOSED:
        # Indoor room: non-ball rays terminate on the enclosing shell
        # (inward normal modulated by a positional pattern — textured so
        # the matcher can localize against wall points too).
        t_sh = -b + np.sqrt(np.maximum(
            b * b - (np.sum(o * o, -1) - SHELL_R**2), 0.0))
        q = o + t_sh[:, None] * dn
        n_in = -q / SHELL_R
        mod = 0.6 + 0.4 * np.sin(2.5 * q[:, 0:1]) * np.cos(2.5 * q[:, 2:3])
        bg = np.clip((0.5 * n_in + 0.5) * mod, 0, 1)
    else:
        bg = 0.02
    # Bands of the normal direction give high-frequency texture so the
    # matcher has something to latch onto.
    rgb = np.where(hit[:, None],
                   0.35 + 0.3 * normal + 0.25 * np.sin(6.0 * p),
                   bg)
    return np.clip(rgb, 0, 1).reshape(H, W, 3), hit.reshape(H, W)


def build_scene(root: Path, app_seqs: int = 0):
    """``app_seqs`` > 0: Cambridge-style variant — train views split over
    that many sequence dirs, each with its own exposure scale, so only a
    per-sequence appearance embedding can fit all of them (reference
    Cambridge protocol: appearance vocab = sequences,
    ``nerfbase.py`` seq parsing).  Queries reuse seq 0's exposure."""
    root = Path(root)
    data_dir = root / "toy"
    K = [[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]]
    n_seq = max(app_seqs, 1)
    rng = np.random.default_rng(7)
    exposures = (1.0 if n_seq == 1
                 else rng.uniform(0.75, 1.25, n_seq).round(3))
    for s in range(n_seq):
        (data_dir / f"seq-{s + 1:02d}").mkdir(parents=True, exist_ok=True)

    def frames_for(angles, tag, seq_of=lambda i: 0):
        frames = []
        for i, ang in enumerate(angles):
            eye = [CAM_R * np.cos(ang), 0.6 * np.sin(2 * ang),
                   CAM_R * np.sin(ang)]
            c2w = look_at(eye)
            s = seq_of(i)
            fname = f"seq-{s + 1:02d}/frame-{tag}{i:03d}.color.png"
            img, hit = ball_image(np.asarray(K), c2w)
            expo = exposures if n_seq == 1 else exposures[s]
            img = np.clip(img * expo, 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                data_dir / fname)
            frames.append(dict(file_path=fname, intrinsics=K, height=H,
                               width=W, transform_matrix=c2w.tolist(),
                               ball_frac=float(hit.mean())))
        return frames

    tr_ang = np.linspace(0, 2 * np.pi, N_TRAIN, endpoint=False)
    te_ang = tr_ang[:N_TEST] + (tr_ang[1] - tr_ang[0]) * 0.43
    # Round-robin sequence assignment: every sequence spans the circle, so
    # each exposure is seen from all sides (fst normalization unaffected).
    train_frames = frames_for(tr_ang, "t", seq_of=lambda i: i % n_seq)
    test_frames = frames_for(te_ang, "q")
    if n_seq > 1:
        print(f"scene: {n_seq} sequences, exposures {list(exposures)}")
    print(f"scene: ball covers "
          f"{np.mean([f['ball_frac'] for f in train_frames]):.0%} of a view")
    for f in train_frames + test_frames:
        f.pop("ball_frac")

    # test json carries ALL frames: the cache stage renders every view
    # per-image through the dataset's test-split mode (reference
    # cache_scene_pts renders train+test views), while matcher queries are
    # driven by the pair txts, not by json enumeration.
    for split, fr in [("train", train_frames), ("val", test_frames),
                      ("test", train_frames + test_frames)]:
        (data_dir / f"transforms_{split}.json").write_text(
            json.dumps({"frames": fr}))

    # Train pairs: adjacent training views; test pairs: query -> 2 nearest
    # training views (by angle).
    lines = []
    for i in range(N_TRAIN):
        for di in (1, 2):
            lines.append(f"{train_frames[i]['file_path']} "
                         f"{train_frames[(i + di) % N_TRAIN]['file_path']}")
    (root / "pairs_train.txt").write_text("\n".join(lines))
    lines = []
    for i in range(N_TEST):
        for di in (0, 1):
            lines.append(f"{test_frames[i]['file_path']} "
                         f"{train_frames[(i + di) % N_TRAIN]['file_path']}")
    (root / "pairs_test.txt").write_text("\n".join(lines))
    return root


def nerf_config(root, odir, epochs=10, app=False):
    return dict2namespace({
        "data": {"dataset": "NerfBaseDataset", "data_dir": str(root),
                 "scene": "toy", "img_wh": [W, H], "ray_type": "mip",
                 "max_frustum_depth": 1, "rescale_factor": 1.0,
                 "snorm_type": "fst"},
        "optim": {"optimizer": "adam", "lr": 2e-3, "weight_decay": 0.0,
                  "lr_scheduler": "cosine"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4,
                      "type": "mip", "appearance_embed": app},
        "render": {"chunksize": 16384, "use_viewdirs": True,
                   "use_disp": False, "perturb": True, "white_bg": False,
                   "noise_std": 1.0, "use_fused_train": True,
                   # pinned f32 serving: these scripts' pose/PSNR numbers
                   # are compared ACROSS rounds (PARITY e2e/ladder tables),
                   # so the int8 serving default must not drift them; the
                   # int8 gate overrides this per arm.
                   "trunk_int8": "none"},
        "loss": {"ray_reg_weight": 0.01},
        "exp": {"seed": 1, "odir": str(odir), "prefix": "e2e",
                "num_workers": 2, "max_epochs": epochs, "check_epochs": 2,
                "batch_size": 9216, "gpus": 1, "log_num_max": 1,
                "log_step": 20},
    })


def matcher_cfg(root, cache_dir, odir, epochs=40, c2f=False,
                multipair=False):
    return dict2namespace({
        "data": {"dataset": ("NeRFMatchMultiPair" if multipair
                             else "NeRFMatchPair"), "data_dir": str(root),
                 "scenes": ["toy"], "scene": "toy",
                 "scene_dir": str(cache_dir),
                 "train_pair_txt": str(Path(root) / "pairs_train.txt"),
                 "test_pair_txt": str(Path(root) / "pairs_test.txt"),
                 "pair_topk": 2, "img_wh": [W, H], "model_ds": DS,
                 "imagenet_norm": False, "balanced_pair": False},
        "model": {"backbone": "tiny", "pretrained": False, "cfeat_dim": 64,
                  "pt_dim": 256, "im_pe": True, "im_sa": 1,
                  "im_sa_type": "share", "pt_sa": 1, "pt_sa_type": "full",
                  "pt_pe": True, "coarse_layers": 1, "temp_type": "mul",
                  "rthres": 6,
                  # Fine stage (C2F): 5x5 windows of the 1/2-scale map +
                  # dsnt subpixel regression — the reference's answer to
                  # the ds=8 grid quantization that floors the coarse-only
                  # pose error.
                  **({"ffeat_dim": 32, "fine_sa": 1, "fsa_type": "full",
                      "win_sz": 5, "cat_c_feat": True,
                      "fine_loss": "match", "coarse_percent": 0.3,
                      "coarse_dthres": 20} if c2f else {})},
        "optim": {"optimizer": "adam", "adapt_lr": True, "clr": 2e-3,
                  "cbs": 4, "weight_decay": 0.0, "lr_scheduler": "cosine"},
        "exp": {"seed": 2, "odir": str(odir), "prefix": "e2e",
                "num_workers": 2, "max_epochs": epochs, "check_epochs": 1,
                "batch_size": 2, "gpus": 1},
        "split": "test",
        "ckpt": "eval",
    })


def main(root=None):
    import jax

    from nerfmatch_tpu.data import NeRFMatchPair
    from nerfmatch_tpu.data.loaders import _collate
    from nerfmatch_tpu.eval.match_evaluator import NeRFMatchEvaluator
    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.matcher_trainer import train_coarse

    import os

    # E2E_CAMBRIDGE=1: the config-4/5 family — per-sequence exposure
    # jitter absorbed by appearance embeddings (fused extras_grad train
    # path) + top-k multi-pair retrieval eval.
    cambridge = bool(int(os.environ.get("E2E_CAMBRIDGE", "0")))
    root = Path(root or ("/tmp/e2e_sphere_cam" if cambridge
                         else "/tmp/e2e_sphere"))
    root.mkdir(parents=True, exist_ok=True)
    t_all = time.time()
    build_scene(root, app_seqs=4 if cambridge else 0)

    # ---- stage 1: NeRF training (production dims, fused train path) ----
    t0 = time.time()
    ncfg = nerf_config(root, root / "out_nerf",
                       epochs=int(os.environ.get("E2E_NERF_EPOCHS", 10)),
                       app=cambridge)
    out_cfg, params = nerf_trainer.train(ncfg)
    t_nerf = time.time() - t0
    print(f"[1] NeRF trained in {t_nerf:.0f}s")
    if cambridge:
        emb = np.asarray(params["embedding_a"]["weight"])
        spread = np.abs(emb - emb.mean(0)).max()
        print(f"    appearance vocab {emb.shape[0]}, row spread {spread:.3f}")

    # ---- stage 2: scene-point feature cache (ds=8, layer-3, lin) ----
    t0 = time.time()
    ecfg = nerf_config(root, root / "out_nerf", app=cambridge)
    ecfg.split = "test"
    ecfg.downsample = DS
    ecfg.data.downsample = DS
    ecfg.ckpt = "eval"
    renderer = NerfRenderer(ecfg, stop_layer=3)
    ev = NerfEvaluator(ecfg, renderer, params)
    cache_dir = ev.cache_scene_pts(cache_dir=root / "scene_cache")
    t_cache = time.time() - t0
    print(f"[2] cached scene points in {t_cache:.0f}s -> {cache_dir}")

    # ---- stage 3: matcher training on the cached NeRF features ----
    from nerfmatch_tpu.train.matcher_trainer import train_c2f

    t0 = time.time()
    mcfg = matcher_cfg(root, cache_dir, root / "out_match")
    out_mcfg, mparams = train_coarse(mcfg)
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint
    from nerfmatch_tpu.train.matcher_trainer import init_config_odir

    coarse_best = latest_checkpoint(
        init_config_odir(out_mcfg, coarse=True) / "checkpoints",
        name="best")
    ccfg = matcher_cfg(root, cache_dir, root / "out_match_c2f", c2f=True)
    # Reference protocol: C2F warm-starts from the trained coarse matcher
    # (init_pretrained_coarse_matcher) — here via the native-ckpt graft.
    ccfg.model.coarse_ckpt = str(coarse_best)
    _, cparams = train_c2f(ccfg)
    t_match = time.time() - t0
    print(f"[3] matchers trained in {t_match:.0f}s (coarse + c2f)")

    # ---- stage 4: localization over held-out queries, three protocols:
    # single-shot, iters=2 (re-render at the estimate + re-match), and
    # iters=2 + iNeRF gradient refinement — the reference's full
    # refinement ladder (model_eval/README.md) on real on-chip features.
    from argparse import Namespace

    mev_c2f = NeRFMatchEvaluator(
        matcher_cfg(root, cache_dir, root / "out_match_c2f", c2f=True),
        params=cparams)
    ev_cfg = matcher_cfg(root, cache_dir, root / "out_match")
    mev = NeRFMatchEvaluator(ev_cfg, params=mparams)
    ds = NeRFMatchPair(ev_cfg.data, split="test")
    inerf_conf = Namespace(num_optim=3, lrate=2e-3, lrdecay=0.6,
                           eval_pose=True, ds=DS, use_match_loss=False)
    protos = [("single", dict(iters=1)),
              ("c2f-fine", dict(iters=1, _ev=mev_c2f)),
              ("iters2", dict(iters=2)),
              ("iters2+inerf", dict(iters=2, inerf_conf=inerf_conf))]
    if cambridge:
        # Cambridge protocol: top-k refs merged per query (multi-pair).
        from nerfmatch_tpu.data import NeRFMatchMultiPair

        multi_ds = NeRFMatchMultiPair(
            matcher_cfg(root, cache_dir, root / "out_match",
                        multipair=True).data, split="test")
        protos = [("single", dict(iters=1)),
                  ("c2f-fine", dict(iters=1, _ev=mev_c2f)),
                  ("multipair", dict(iters=1, _ds=multi_ds))]
    meds = {}
    for name, kw in protos:
        r_errs, t_errs, ns = [], [], []
        use_ev = kw.pop("_ev", mev)
        use_ds = kw.pop("_ds", ds)
        for i in range(len(use_ds)):
            batch = _collate([use_ds[i]])
            out = use_ev.eval_batch(batch, renderer=renderer,
                                    renderer_params=params, mutual=True,
                                    rthres=6.0, solver="colmap", **kw)
            r_errs.append(out["R_err"][0])
            t_errs.append(out["t_err"][0])
            ns.append(out["num_matches"][0])
        meds[name] = (float(np.median(r_errs)), float(np.median(t_errs)))
        print(f"  [{name:>13}] median R={meds[name][0]:.2f}deg "
              f"t={meds[name][1]:.3f} matches={int(np.median(ns))}")
    r_med, t_med = meds["single"]
    print("== e2e summary ==")
    print(f"nerf {t_nerf:.0f}s | cache {t_cache:.0f}s | matcher "
          f"{t_match:.0f}s | total {time.time()-t_all:.0f}s")
    print(f"median pose error over {len(ds)} queries (scene units, cam "
          f"radius {CAM_R}): "
          + " | ".join(f"{k}: R={v[0]:.2f}deg t={v[1]:.3f}"
                       for k, v in meds.items()))
    assert np.isfinite(r_med) and r_med < 10.0, r_med
    print("E2E FULL PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
