"""Reconcile early-termination's bench-vs-cache discrepancy (VERDICT r4
weak #3 / item 3).

BENCH_r04 measured eps=1e-4 a net -0.4% on the headline bench (full-image
96x96 ray grids of the room scene) while the e2e gate's cache stage pays
1.86x SLOWER at eps=0 — two enclosed-indoor workloads, opposite outcomes.
The structural difference is the RAY GRID: the bench renders every pixel
of a camera (adjacent rays in a 16-ray kernel tile are neighbors, ~1/8 deg
apart), while the production cache stage renders ds=8-STRIDED grids of
full-res images (reference ``nerf_evaluator.py:308-402`` -> our
``cache_scene_pts``; adjacent rays sit 8 px apart, so a tile spans 128 px
of image and crosses depth discontinuities more often) — plus, at the
gate's 128x128 scene, a cache dispatch is 256 rays vs the bench's 9216.

This probe measures BOTH workloads on the SAME scene (the in-repo trained
room checkpoint), same 9216-ray dispatch size, same trained weights:

  A "bench/full-grid":   8 held-out 96x96 cameras, every pixel
                         (focal 120 -> radii 1/(120*sqrt(3)))
  B "cache/ds8-strided": the same 8 cameras imaged at 768x768 focal 960
                         (identical FOV), rays at the ds//2::ds strided
                         pixels = 96x96 rays with FULL-RES radii
                         (production sample_nerf_rays semantics)

and reports, per workload: trunk-block skip yield at eps=1e-4 (coarse +
fine stages, FLOP-weighted), and measured ms/chunk at eps=0 vs eps=1e-4
(fused scan-grouped path, checksum fetch, min-of-rounds — bench.py
methodology).  The output is the one-table justification for the per-
workload default that bench.py/PARITY cite.

Run on the TPU: python scripts/earlyterm_workload_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfmatch_tpu.nerf.renderer import NerfRenderer  # noqa: E402
from nerfmatch_tpu.ops.pallas.render_kernel import (  # noqa: E402
    make_fused_hierarchical)
from __graft_entry__ import _nerf_config  # noqa: E402
from scripts.earlyterm_headroom_probe import (  # noqa: E402
    sat_index, tile_skip_fraction)
from scripts.train_bench_scene import camera_rays, load_params  # noqa: E402

from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm

EPS = 1e-4
SCAN_G = 8
BATCH = 9216
# bench.py roofline: coarse trunk 524k MACs/sample, fine trunk+heads 639k.
C_MACS, F_MACS = 524e3, 639e3


def strided_camera_rays(ang, ds=8, h=768, w=768, focal=960.0):
    """Production cache-grid rays: full-res camera, ds//2::ds strides.

    Radii stay the FULL-RES pixel pitch (reference render_utils.py
    prepare_rays_data computes radii from neighboring full-res pixels;
    sample_nerf_rays then strides the grid) — so cones are 8x narrower
    than the bench camera's while ray centers sit 8 px apart."""
    rays = camera_rays(ang, h=h, w=w, focal=focal)
    grid = rays.reshape(h, w, 12)
    return np.ascontiguousarray(
        grid[ds // 2::ds, ds // 2::ds].reshape(-1, 12))


def measure(renderer, params, rays, eps, iters=10, rounds=3):
    render, pack = make_fused_hierarchical(renderer, early_term_eps=eps)
    wc, wf = pack(params)

    @jax.jit
    def step(r):
        def body(c, rr):
            out = render(wc, wf, rr)
            return c + sum(jnp.sum(v) for v in out.values()), None

        return jax.lax.scan(body, 0.0, r)[0]

    np.asarray(step(rays))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(rays)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters / SCAN_G)
    return best * 1e3  # ms per 9216-ray chunk


def skip_yield(renderer, params, rays_flat):
    """FLOP-weighted trunk-skip fraction at EPS from the stage weights
    (the quantity the kernel's per-block pl.when gate realizes) — the
    earlyterm_headroom_probe measurement, per workload."""
    import dataclasses as dc

    from nerfmatch_tpu.ops.pallas.render_kernel import (FusedRenderSpec,
                                                        make_fused_render)
    from nerfmatch_tpu.ops.pallas.render_train import pack_mlp_weights_traced
    from nerfmatch_tpu.ops.pallas.resample_kernel import resample_z_pallas

    cfg, fine_cfg = renderer.cfg, renderer.fine_cfg
    S = fine_cfg.num_pts
    spec = FusedRenderSpec(
        num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
        layer_num=fine_cfg.layer_num, samples=S, ray_tile=16,
        feat_layer=3, white_bg=cfg.white_bg, from_rays=True,
        dirs_freqs=cfg.dirs_num_freqs, app_dim=0, sample_blocks=4)
    fused_fine = make_fused_render(spec)
    fused_coarse = make_fused_render(dc.replace(spec, ret_feat=False,
                                                ret_rgb=False))
    wc = pack_mlp_weights_traced(params["nerf_coarse"], spec)
    wf = pack_mlp_weights_traced(params["nerf_fine"], spec)
    rays = jnp.asarray(rays_flat)
    near, far = rays[:, 6:7], rays[:, 7:8]
    t = jnp.linspace(0.0, 1.0, S + 1)
    z_vals = near * (1.0 - t) + far * t
    coarse = fused_coarse(wc, rays, z_vals)
    fine = fused_fine(wf, rays, resample_z_pallas(z_vals, coarse["weights"]))
    fc = tile_skip_fraction(sat_index(np.asarray(coarse["weights"])), 16, 4, S)
    ff = tile_skip_fraction(sat_index(np.asarray(fine["weights"])), 16, 4, S)
    wsum = C_MACS + F_MACS
    return fc, ff, (fc * C_MACS + ff * F_MACS) / wsum


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    angles = [0.13 + 0.31 * k for k in range(SCAN_G)]

    workloads = {
        "bench/full-grid": np.stack(
            [camera_rays(a, h=96, w=96, focal=120.0) for a in angles]),
        "cache/ds8-strided": np.stack(
            [strided_camera_rays(a) for a in angles]),
    }
    print(f"{'workload':>18} | skip c/f (flopw) | eps=0 ms | eps={EPS:g} ms"
          f" | speedup")
    rows = []
    for name, rays_np in workloads.items():
        assert rays_np.shape == (SCAN_G, BATCH, 12), rays_np.shape
        rays = jnp.asarray(rays_np)
        fc, ff, fw = skip_yield(renderer, params, rays_np[0])
        t0 = measure(renderer, params, rays, 0.0)
        t1 = measure(renderer, params, rays, EPS)
        rows.append((name, fc, ff, fw, t0, t1))
        print(f"{name:>18} | {fc:.2f}/{ff:.2f} ({fw:.2f}) | {t0:8.2f} | "
              f"{t1:8.2f} | {t0 / t1:.3f}x", flush=True)

    import json
    Path("/tmp/earlyterm_workload.json").write_text(json.dumps(
        [dict(workload=n, skip_coarse=c, skip_fine=f, skip_flopw=w,
              eps0_ms=a, eps_ms=b) for n, c, f, w, a, b in rows], indent=1))
    print("# written /tmp/earlyterm_workload.json")


if __name__ == "__main__":
    main()
