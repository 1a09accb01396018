"""Split-2 precision probe: bf16 noise of the fused render path on-chip.

Runs the production hierarchical fused render (trained bench scene, held-out
camera, 9216 rays) and saves every output.  Modes:

  cpu <tag>   — interpret mode on forced-CPU (f32 dots) -> the exact
                reference; saved to .probe_split2_<tag>.npz
  tpu <tag>   — real chip; saved likewise, then compared against every
                other .probe_split2_*.npz present, plus a pipelined
                checksum timing of the full path (bench.py methodology).

Usage (serialize — one axon client at a time):
  git stash && python scripts/split2_probe.py tpu old && git stash pop
  python scripts/split2_probe.py cpu ref
  python scripts/split2_probe.py tpu new
"""

from __future__ import annotations

import glob
import os
import sys
import time

import numpy as np

mode, tag = sys.argv[1], sys.argv[2]

import jax  # noqa: E402

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from nerfmatch_tpu.nerf.renderer import NerfRenderer  # noqa: E402
from nerfmatch_tpu.ops.pallas.render_kernel import (  # noqa: E402
    make_fused_hierarchical)
from __graft_entry__ import _nerf_config  # noqa: E402
from scripts.train_bench_scene import camera_rays, load_params  # noqa: E402

OUT = "/root/repo/.probe_split2_{}.npz"


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    rays = jnp.asarray(camera_rays(0.13, h=96, w=96, focal=120.0))

    render, pack = make_fused_hierarchical(renderer,
                                           interpret=(mode == "cpu"))
    wc, wf = pack(params)

    out = jax.jit(lambda r: render(wc, wf, r))(rays)
    out = {k: np.asarray(v) for k, v in out.items()}
    np.savez(OUT.format(tag), **out)
    print(f"saved {OUT.format(tag)}")

    for other in sorted(glob.glob(OUT.format("*"))):
        otag = other.split("_split2_")[1][:-4]
        if otag == tag:
            continue
        ref = np.load(other)
        print(f"--- {tag} vs {otag}")
        for k in out:
            a, b = out[k], ref[k]
            scale = max(1e-6, float(np.abs(b).max()))
            err = float(np.abs(a - b).max())
            print(f"  {k:14s} max_abs={err:.3e}  rel={err / scale:.3e}")

    if mode != "tpu":
        return

    @jax.jit
    def step(r):
        o = render(wc, wf, r)
        return sum(jnp.sum(v) for v in o.values())

    np.asarray(step(rays))
    iters, best = 30, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = step(rays)
        np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"full path: {best * 1e3:.2f} ms/batch "
          f"({rays.shape[0] / best:,.0f} rays/s)")


if __name__ == "__main__":
    main()
