"""Measured early-termination output deltas on the trained ROOM scene.

The <eps analytic bound is conservative: skipped weight-sum < eps bounds
each composited output by eps times its value range, while the MEASURED
delta is what the VERDICT acceptance gate compares against the fused-bf16
noise floor (8e-4 rgb).  This renders one bench camera at an eps grid and
reports per-output max/mean absolute deltas vs eps=0, plus the realized
trunk-block skip fractions, so the production eps can be chosen on
measurement rather than on the worst-case bound.

Run on the TPU: python scripts/earlyterm_quality.py [ray_tile sample_blocks]
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

EPS_GRID = (0.0, 1e-4, 3e-4, 1e-3)


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    rays = jnp.asarray(camera_rays(0.13, h=96, w=96, focal=120.0))

    outs = {}
    for eps in EPS_GRID:
        render, pack = make_fused_hierarchical(
            renderer, ray_tile=tile, sample_blocks=sb, early_term_eps=eps)
        wc, wf = pack(params)
        fn = jax.jit(lambda r: render(wc, wf, r))
        out = jax.tree_util.tree_map(np.asarray, fn(rays))
        # quick timing too (same jit, pipelined)
        for _ in range(3):
            o = fn(rays)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(rays)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 10
        outs[eps] = out
        if eps == 0.0:
            print(f"tile={tile} sb={sb} eps=0: {rays.shape[0]/dt/1e3:.1f}k "
                  f"rays/s (single-chunk, no scan grouping)", flush=True)
            continue
        ref = outs[0.0]
        msg = [f"eps={eps:g}: {rays.shape[0]/dt/1e3:7.1f}k rays/s"]
        # Realized skips show up as exact-zero tail weights per z-block
        # (a skipped block's trunk never runs, so its weights stay 0).
        if "weights_fine" in out:
            w = np.asarray(out["weights_fine"])
            nblk = w.reshape(w.shape[0], sb, -1)
            skipped = np.all(nblk == 0.0, axis=-1)
            msg.append(f"block-skip frac {skipped.mean():.2f}")
        for k in sorted(ref):
            d = np.abs(out[k] - ref[k])
            msg.append(f"{k}: max {d.max():.2e} mean {d.mean():.2e}")
        print("  ".join(msg), flush=True)


if __name__ == "__main__":
    main()
