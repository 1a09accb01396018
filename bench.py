"""Headline benchmark: mip-NeRF feature-render throughput (rays/sec).

Measures the production render path from the BASELINE protocol (config 1):
hierarchical mip render, 128 coarse + 128 fine samples/ray, 8x256 MLP with
viewdirs + layer-3 feature tap and along-ray feature compositing — i.e. the
``cache_scene_pts`` hot loop — on the attached TPU chip, using the fused
Pallas kernel path (``ops/pallas/render_kernel.py``).

Timing is amortized over pipelined dispatches with a single device fetch at
the end (the axon PJRT backend dispatches asynchronously; per-call host
fetches would add ~25 ms tunnel RTT to every iteration).

vs_baseline compares against an estimated PyTorch reference throughput on an
A100 for the same forward render.  The reference repo publishes no in-tree
number (SURVEY §6); this constant is the documented stand-in until a measured
A100 torch baseline replaces it.  Roofline context (measured on this chip,
scripts/mm_roofline.py + scripts/kernel_probe.py, min-of-3 pipelined):

* per-ray work: 2 stages x 128 samples x ~0.64 M MACs (8x256 MLP + skip +
  feature/views/rgb heads) = ~328 MFLOP/ray;
* v5e bf16 peak 197 TFLOP/s -> speed-of-light 600k rays/s; an 8-deep
  (2048, 256)x(256, 256) matmul chain in Pallas measures 78% MFU on this
  chip -> practical ceiling ~470k rays/s; the fused kernel currently runs
  ~53% MFU end-to-end (encode + composite VPU work on top of the chain);
* the A100 divisor: TF32 peak 156 TFLOP/s; public torch mip-NeRF evals run
  ~15-25% MFU (chunked MLP, unfused encode/compositing, framework overhead)
  -> 75-125k rays/s; REF_RAYS_PER_SEC = 100k is the midpoint.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
from __graft_entry__ import _example_rays, _nerf_config

REF_RAYS_PER_SEC = 100_000.0  # estimated PyTorch A100 forward render


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))

    batch = 9216  # reference train/eval ray batch (configs/nerf/*.yaml)
    rays = _example_rays(batch)

    render, pack = make_fused_hierarchical(renderer)
    wc, wf = pack(params)
    fn = jax.jit(lambda rays: render(wc, wf, rays))

    # Warmup / compile (+ host fetch to force full execution).
    out = fn(rays)
    np.asarray(out["rgb_fine"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(rays)
    np.asarray(out["rgb_fine"])
    dt = (time.perf_counter() - t0) / iters

    rays_per_sec = batch / dt
    print(json.dumps({
        "metric": "nerf_feature_render_throughput",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
