"""Synthesize reference-format parity artifacts for the BASELINE protocol.

Real-weight parity (BASELINE.md configs 1-3) is blocked on this host by
missing egress — the checkpoints/annotations can't be downloaded.  What
CAN be proven here is that the ENTIRE protocol *executes*: this script
manufactures every artifact `scripts/run_real_parity.sh` consumes, in
the exact reference formats, so the shell protocol runs END TO END with
only the downloaded bytes swapped for synthetic ones:

  * a 7-Scenes-layout scene (frames + transforms_<scene>_<split>.json
    annotations + retrieval pair txts) — the enclosed toy scene,
  * a torch-Lightning NeRF checkpoint (reference state-dict key names
    via `export_torch_state_dict`, `hyper_parameters` config-in-ckpt)
    from an ACTUALLY TRAINED NeRF (30 epochs, ~30 dB val PSNR),
  * torch-Lightning matcher checkpoints for the Mini (coarse) and Full
    (c2f) models trained on the NeRF's ds=8 feature cache, laid out as
    `<ckpt_dir>/<scene>/synth_{mini,full}.ckpt` the way the benchmark
    CLI globs them.

Everything resumes: rerunning reuses trained checkpoints.

Run: python scripts/make_synthetic_parity_artifacts.py   (TPU)
Env: PARITY_SYNTH_ROOT (default /tmp/parity_synth), E2E_NERF_EPOCHS,
     E2E_MATCH_EPOCHS.
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


def save_lightning_ckpt(path, state_np, hparams_ns, step):
    import torch

    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({
        "state_dict": {k: torch.from_numpy(np.array(v))
                       for k, v in state_np.items()},
        "hyper_parameters": dict(vars(hparams_ns)),
        "epoch": step, "global_step": step,
    }, path)
    print(f"  wrote {path}", flush=True)


def main():
    import jax

    from nerfmatch_tpu.eval.nerf_evaluator import NerfEvaluator
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train import nerf_trainer
    from nerfmatch_tpu.train.checkpoint import export_torch_state_dict
    from nerfmatch_tpu.train.checkpoint import latest_checkpoint
    from nerfmatch_tpu.train.matcher_trainer import (init_config_odir,
                                                     train_c2f, train_coarse)

    root = Path(os.environ.get("PARITY_SYNTH_ROOT", "/tmp/parity_synth"))
    root.mkdir(parents=True, exist_ok=True)
    n_ep = int(os.environ.get("E2E_NERF_EPOCHS", 30))
    m_ep = int(os.environ.get("E2E_MATCH_EPOCHS", 40))
    t_all = time.time()
    build_scene(root)

    # ---- 1. train the NeRF (resume-aware) + export the Lightning ckpt
    ncfg = nerf_config(root, root / "out_nerf", epochs=n_ep)
    ncfg.data.max_frustum_depth = 6
    out_ncfg, params = nerf_trainer.train(ncfg)
    nerf_ckpt = root / "pretrained" / "nerf" / "toy" / "synth_last.ckpt"
    # hparams = the training config (config-in-ckpt, the reference
    # convention load_renderer_params re-inflates via Namespace(**h)).
    save_lightning_ckpt(nerf_ckpt,
                        export_torch_state_dict(params, prefix="model."),
                        out_ncfg, n_ep)

    # ---- 2. ds=8 feature cache for matcher training
    ccfg = nerf_config(root, root / "out_nerf")
    ccfg.data.max_frustum_depth = 6
    ccfg.split = "test"
    ccfg.downsample = DS
    ccfg.data.downsample = DS
    ccfg.ckpt = "eval"
    renderer = NerfRenderer(ccfg, stop_layer=3)
    ev = NerfEvaluator(ccfg, renderer, params)
    cache_dir = ev.cache_scene_pts(cache_dir=root / "scene_cache")

    # ---- 3. Mini (coarse) + Full (c2f) matchers -> Lightning ckpts
    ckdir = root / "pretrained" / "nerfmatch" / "7scenes_synth" / "toy"
    mcfg = matcher_cfg(root, cache_dir, root / "out_match", epochs=m_ep)
    out_mcfg, mparams = train_coarse(mcfg)
    save_lightning_ckpt(ckdir / "synth_mini.ckpt",
                        export_torch_state_dict(mparams, prefix="model."),
                        out_mcfg, m_ep)

    coarse_best = latest_checkpoint(
        init_config_odir(out_mcfg, coarse=True) / "checkpoints", name="best")
    c2cfg = matcher_cfg(root, cache_dir, root / "out_match_c2f",
                        epochs=m_ep, c2f=True)
    c2cfg.model.coarse_ckpt = str(coarse_best)
    out_ccfg, cparams = train_c2f(c2cfg)
    # The reference's Full model wraps timm in MetaFormer_MS: keys are
    # backbone.model.* (the importer's backbone_extra inverse).
    save_lightning_ckpt(ckdir / "synth_full.ckpt",
                        export_torch_state_dict(cparams, prefix="model.",
                                                backbone_extra="model."),
                        out_ccfg, m_ep)

    print(f"artifacts ready under {root} ({time.time() - t_all:.0f}s)")
    print(f"NERF_CKPT={nerf_ckpt}")
    print(f"MATCH_CKPT_DIR={ckdir.parent}")
    print(f"SCENE_CACHE={cache_dir}")


if __name__ == "__main__":
    main()
