"""Production-config stage decomposition: time the ACTUAL coarse/fine
Pallas stages (make_fused_render specs, from_rays, split-2, blocked) and
their spec-level ablations on the trained bench scene.

Unlike kernel_probe.py (simplified stage clones) and buildup_probe.py
(tile-16 single-block additive build-up), this times the production
kernels themselves, so the numbers decompose the same 22 ms that bench.py
measures:

  coarse        — production coarse spec (no heads), sb=4, tile=32
  fine          — production fine spec (rgb+feat heads), sb=4, tile=32
  resample      — the inverse-CDF z resampler
  full          — make_fused_hierarchical render (sum check)
  coarse_sb{1,2,8} / coarse_t{16,64} — block/tile ablations
  fine_sb1 / fine_t16 / fine_t64     — same for the fine stage

Run on the TPU:  python scripts/stage_probe.py [variant ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerfmatch_tpu.nerf.renderer import NerfRenderer  # noqa: E402
from nerfmatch_tpu.ops.pallas.render_kernel import (  # noqa: E402
    FusedRenderSpec, eval_feat_layer, make_fused_hierarchical,
    make_fused_render, reparam_unit_dir)
from nerfmatch_tpu.ops.pallas.render_train import (  # noqa: E402
    pack_mlp_weights_traced)
from nerfmatch_tpu.ops.pallas.resample_kernel import (  # noqa: E402
    resample_z_pallas)
from __graft_entry__ import _nerf_config  # noqa: E402
from scripts.train_bench_scene import camera_rays, load_params  # noqa: E402

from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm

BATCH = 9216
ITERS = 30


def timeit(fn, args, iters=ITERS, rounds=3):
    out = fn(*args)
    np.asarray(out)  # real fetch (kernel_probe methodology)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(variants):
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    cfg, fine_cfg = renderer.cfg, renderer.fine_cfg
    S = fine_cfg.num_pts

    rays = jnp.asarray(camera_rays(0.13, h=96, w=96, focal=120.0))
    rays_u, _ = reparam_unit_dir(rays)
    near, far = rays_u[:, 6:7], rays_u[:, 7:8]
    t = jnp.linspace(0.0, 1.0, S + 1)
    z_vals = near * (1.0 - t) + far * t

    def base_spec(tile, sb, eps):
        return FusedRenderSpec(
            num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
            layer_num=fine_cfg.layer_num, samples=S, ray_tile=tile,
            feat_layer=eval_feat_layer(fine_cfg), white_bg=cfg.white_bg,
            from_rays=True, dirs_freqs=cfg.dirs_num_freqs,
            sample_blocks=sb, early_term_eps=eps,
            feat_max=(cfg.feat_comb == "max"))

    # Fine-stage z: run the real coarse+resample once to get a realistic
    # surface-concentrated z distribution.
    render0, pack0 = make_fused_hierarchical(renderer)
    wc0, wf0 = pack0(params)
    spec_c0 = dataclasses.replace(base_spec(32, 4, 0.0),
                                  ret_feat=False, ret_rgb=False)
    coarse0 = jax.jit(lambda r, z: make_fused_render(spec_c0)(
        pack_mlp_weights_traced(
            params["nerf_fine" if cfg.single_model else "nerf_coarse"],
            spec_c0), r, z))
    cw = coarse0(rays_u, z_vals)
    z_fine = np.asarray(resample_z_pallas(z_vals, cw["weights"]))
    z_fine = jnp.asarray(z_fine)

    act_scales = None

    def get_scales():
        nonlocal act_scales
        if act_scales is None:
            from nerfmatch_tpu.ops.pallas.quant import calibrate_act_scales

            act_scales = calibrate_act_scales(renderer, params,
                                              np.asarray(rays[:1024]))
        return act_scales

    for v in variants:
        parts = v.split("_")
        stage = parts[0]
        tile, sb, eps, i8 = 32, 4, 0.0, False
        ablate = []
        _ABL = {"noipe": "ipe", "nomom": "moments", "noreq": "requant",
                "nologt": "logt", "nowsum": "wsum", "nosplit2": "split2"}
        csb = None
        ci8 = False
        for p in parts[1:]:
            if p in _ABL:
                ablate.append(_ABL[p])
            elif p == "noall":
                ablate.extend(_ABL.values())
            elif p.startswith("csb"):
                csb = int(p[3:])      # full: coarse-stage block count
            elif p.startswith("sb"):
                sb = int(p[2:])
            elif p == "i8":
                i8 = True
            elif p == "ci8":
                ci8 = True            # full: int8 coarse trunk only
            elif p.startswith("t"):
                tile = int(p[1:])
            elif p.startswith("eps"):
                eps = float(p[3:])
        if stage == "full":
            mode = "both" if i8 else ("coarse" if ci8 else "none")
            render, pack = make_fused_hierarchical(
                renderer, ray_tile=tile, sample_blocks=sb,
                coarse_sample_blocks=csb, early_term_eps=eps,
                trunk_int8=mode,
                act_scales=(get_scales() if mode != "none" else None))
            wc, wf = pack(params)
            fn = jax.jit(lambda r: sum(
                jnp.sum(o) for o in render(wc, wf, r).values()))
            dt = timeit(fn, (rays,))
        elif stage == "resample":
            fn = jax.jit(lambda z, w: jnp.sum(resample_z_pallas(z, w)))
            dt = timeit(fn, (z_vals, cw["weights"]))
        else:
            spec = base_spec(tile, sb, eps)
            if ablate:
                spec = dataclasses.replace(spec, ablate=",".join(ablate))
            if stage == "coarse":
                spec = dataclasses.replace(spec, ret_feat=False,
                                           ret_rgb=False)
                z_in = z_vals
                key = "nerf_fine" if cfg.single_model else "nerf_coarse"
                skey = "coarse"
            else:
                z_in = z_fine
                key = "nerf_fine"
                skey = "fine"
            if i8:
                from nerfmatch_tpu.ops.pallas.quant import \
                    pack_mlp_weights_int8

                spec = dataclasses.replace(spec, trunk_int8=True)
                fused = make_fused_render(spec)
                w = pack_mlp_weights_int8(params[key], spec,
                                          get_scales()[skey])
            else:
                fused = make_fused_render(spec)
                w = pack_mlp_weights_traced(params[key], spec)
            fn = jax.jit(lambda r, z: sum(
                jnp.sum(o) for o in fused(w, r, z).values()))
            dt = timeit(fn, (rays_u, z_in))
        print(f"{v:>16}: {dt*1e3:8.2f} ms  {BATCH/dt:10.0f} rays/s",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "coarse", "coarse_sb1", "coarse_sb2", "coarse_sb8",
        "coarse_t16", "coarse_t64", "coarse_eps1e-4",
        "fine", "fine_sb1", "fine_t16", "fine_t64", "fine_eps1e-4",
        "resample", "full", "full_eps1e-4"])
    # round-4 int8/sb8 hunt:
    #   python scripts/stage_probe.py coarse_sb8_eps1e-4 coarse_sb16 \
    #     coarse_i8 coarse_i8_sb8 coarse_i8_sb8_eps1e-4 fine_i8 \
    #     fine_sb8 fine_i8_sb8 fine_i8_eps1e-4 full_i8 full_i8_eps1e-4
