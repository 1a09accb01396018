"""Measure the early-termination headroom of the trained bench scene.

For each stage (coarse: trunk-only, fine: full head chain) compute the
per-ray sample index where transmittance crosses ``eps`` and translate it
into the fraction of 16-ray x Sb-sample trunk blocks the blocked kernel
(``render_kernel.py: blocked_body``) could skip — in camera-raster ray
order (what the kernel sees today) and with rays sorted by saturation
depth (the upper bound a coherence re-ordering between the coarse and
fine stages could unlock).

Run on the TPU: python scripts/earlyterm_headroom_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm
from nerfmatch_tpu.ops.pallas.render_kernel import (
    FusedRenderSpec, make_fused_render)
from nerfmatch_tpu.ops.pallas.resample_kernel import resample_z_pallas
from __graft_entry__ import _nerf_config
from scripts.train_bench_scene import camera_rays, load_params

EPS = 1e-4


def sat_index(weights):
    """First sample index where transmittance < EPS (S if never)."""
    trans = 1.0 - np.cumsum(weights, axis=-1)
    sat = trans < EPS
    idx = np.where(sat.any(-1), sat.argmax(-1), weights.shape[-1])
    return idx


def tile_skip_fraction(idx, ray_tile=16, sample_blocks=4, S=128):
    """Fraction of trunk blocks skipped: block j runs iff any ray in the
    tile is alive entering it (kernel checks max log-T > log eps before
    every block except the first)."""
    Sb = S // sample_blocks
    tiles = idx.reshape(-1, ray_tile)
    tile_sat = tiles.max(-1)          # all saturated once the max ray is
    # block j (1-indexed from 1..SB-1 skippable) skipped iff tile_sat <= j*Sb
    skipped = 0
    total = len(tiles) * sample_blocks
    for j in range(1, sample_blocks):
        skipped += int((tile_sat <= j * Sb).sum())
    return skipped / total


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    rays = jnp.asarray(camera_rays(0.13, h=96, w=96, focal=120.0))

    cfg, fine_cfg = renderer.cfg, renderer.fine_cfg
    S = fine_cfg.num_pts
    spec = FusedRenderSpec(
        num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
        layer_num=fine_cfg.layer_num, samples=S, ray_tile=16,
        feat_layer=3, white_bg=cfg.white_bg, from_rays=True,
        dirs_freqs=cfg.dirs_num_freqs, app_dim=0, sample_blocks=4)
    import dataclasses as dc
    fused_fine = make_fused_render(spec)
    fused_coarse = make_fused_render(dc.replace(spec, ret_feat=False,
                                                ret_rgb=False))
    from nerfmatch_tpu.ops.pallas.render_train import pack_mlp_weights_traced
    wc = pack_mlp_weights_traced(params["nerf_coarse"], spec)
    wf = pack_mlp_weights_traced(params["nerf_fine"], spec)

    near, far = rays[:, 6:7], rays[:, 7:8]
    t = jnp.linspace(0.0, 1.0, S + 1)
    z_vals = near * (1.0 - t) + far * t
    coarse = fused_coarse(wc, rays, z_vals)
    z_f = resample_z_pallas(z_vals, coarse["weights"])
    fine = fused_fine(wf, rays, z_f)

    w_c = np.asarray(coarse["weights"])
    w_f = np.asarray(fine["weights"])
    acc_f = np.asarray(fine["acc"])

    from scripts.train_bench_scene import gt_colors
    gt, _ = gt_colors(np.asarray(rays))
    mse = float(np.mean((np.asarray(fine["rgb"]) - gt) ** 2))
    print(f"held-out PSNR: {-10.0 * np.log10(mse):.2f} dB")
    print(f"rays: {len(w_c)}  acc_fine: mean {acc_f.mean():.3f}  "
          f"frac acc>0.999: {(acc_f > 0.999).mean():.1%}  "
          f"frac acc<0.5 (miss): {(acc_f < 0.5).mean():.1%}")

    for name, w in [("coarse", w_c), ("fine", w_f)]:
        idx = sat_index(w)
        print(f"\n[{name}] saturation index @eps={EPS}: "
              f"p10={np.percentile(idx, 10):.0f} "
              f"p50={np.percentile(idx, 50):.0f} "
              f"p90={np.percentile(idx, 90):.0f} "
              f"never={np.mean(idx == S):.1%}")
        for sb in (4, 8):
            raster = tile_skip_fraction(idx, 16, sb, S)
            sorted_f = tile_skip_fraction(np.sort(idx), 16, sb, S)
            print(f"  blocks={sb}: trunk-skip raster={raster:.1%} "
                  f"sorted={sorted_f:.1%}")

    # FLOP-weighted ceiling: coarse trunk 524k MACs/sample vs fine
    # trunk+heads 639k (bench.py roofline): what fraction of total MLP
    # FLOPs would the raster / sorted skips remove?
    for sb in (4, 8):
        fc = tile_skip_fraction(sat_index(w_c), 16, sb, S)
        ff_r = tile_skip_fraction(sat_index(w_f), 16, sb, S)
        ff_s = tile_skip_fraction(np.sort(sat_index(w_f)), 16, sb, S)
        tot = 524 + 639
        print(f"\nblocks={sb}: FLOP reduction raster="
              f"{(524 * fc + 639 * ff_r) / tot:.1%}  "
              f"coarse-raster+fine-sorted={(524 * fc + 639 * ff_s) / tot:.1%}")


if __name__ == "__main__":
    main()
