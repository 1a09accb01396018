"""Sweep the fused-render schedule knobs on the trained ROOM bench scene.

Early termination's win scales with tile-level saturation coherence: a
block is skipped only once EVERY ray in the tile is opaque, so smaller
ray tiles / more sample blocks skip more — but shrink the trunk matmuls
(MXU efficiency).  This times the real bench workload (8 cameras x 9216
rays, scan-grouped) across (ray_tile, sample_blocks, eps) to pick the
production default.

Run on the TPU: python scripts/earlyterm_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
from __graft_entry__ import _nerf_config
from scripts.train_bench_scene import camera_rays, load_params

BATCH, SCAN_G = 9216, 8


def time_config(renderer, params, rays, ray_tile, sample_blocks, eps):
    render, pack = make_fused_hierarchical(
        renderer, ray_tile=ray_tile, sample_blocks=sample_blocks,
        early_term_eps=eps)
    wc, wf = pack(params)

    @jax.jit
    def step(rays):
        def body(c, r):
            out = render(wc, wf, r)
            return c + sum(jnp.sum(v) for v in out.values()), None

        return jax.lax.scan(body, 0.0, rays)[0]

    ref = np.asarray(step(rays))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            out = step(rays)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / 8 / SCAN_G)
    return BATCH / best, float(ref)


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    rays = jnp.stack([
        jnp.asarray(camera_rays(0.13 + 0.31 * k, h=96, w=96, focal=120.0))
        for k in range(SCAN_G)])

    for tile in (32, 16):
        for sb in (4, 8):
            for eps in (0.0, 1e-4):
                rps, chk = time_config(renderer, params, rays, tile, sb, eps)
                print(f"tile={tile:2d} sb={sb} eps={eps:g}: "
                      f"{rps/1e3:7.1f}k rays/s  (checksum {chk:.4f})",
                      flush=True)


if __name__ == "__main__":
    main()
