"""On-chip probe for the opt-in int8 render trunk (quant.py).

Times the fused hierarchical render at bench shapes (9216 rays, 8-chunk
scan grouping, checksum fetch) for trunk_int8 in {none, coarse, posttap,
both} x eps in {0, 1e-4} and reports quality deltas vs the f32 XLA path on
the trained bench scene, plus each int8 mode's composited-descriptor drift
vs the gate-approved "coarse" render.

Measured 2026-08-20 (v5e, trained room scene):

    eps=0      none 18.89 ms 487.8k | coarse 17.76 518.9k |
               posttap 16.87 546.3k | both 17.12 538.2k
    eps=1e-4   none 18.75 ms 491.6k | coarse 18.25 504.9k |
               posttap 17.61 523.3k | both 17.49 526.9k
    feat-vs-coarse mean |delta|: posttap 4.6e-05, both 5.6e-04 (12x) —
    posttap's per-sample descriptor taps are exact-bf16; only the
    compositing weights carry int8 error.  posttap even BEATS "both" at
    eps=0: the bf16 prefix overlaps the VPU epilogue better than the
    extra qenc/skip int8 traffic saves.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm
from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
from nerfmatch_tpu.ops.pallas.quant import calibrate_act_scales
from __graft_entry__ import _nerf_config
from scripts.train_bench_scene import camera_rays, load_params

BATCH = 9216
SCAN_G = 8


def time_render(render, wc, wf, rays_stack):
    @jax.jit
    def step(rs):
        def body(c, r):
            out = render(wc, wf, r)
            return c + sum(jnp.sum(v) for v in out.values()), None
        return jax.lax.scan(body, 0.0, rs)[0]

    np.asarray(step(rays_stack))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = step(rays_stack)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / 10 / SCAN_G)
    return best


def main():
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = load_params(renderer)
    rays_stack = jnp.stack([
        jnp.asarray(camera_rays(0.13 + 0.31 * k, h=96, w=96, focal=120.0))
        for k in range(SCAN_G)])
    rays0 = rays_stack[0]
    scales = calibrate_act_scales(renderer, params, rays0)

    ref = jax.jit(lambda r: renderer.render_rays(
        params, r, ret_pfeat=True, validation=True))(rays0)

    # eps sweep mirrors the two bench arms (eps=0 / the serving default
    # 1e-4 with its adaptive ray tile); "posttap" quantizes the fine trunk
    # only after the descriptor tap (see render_kernel.FusedRenderSpec).
    feat_c = {}
    for eps in (0.0, 1e-4):
        for mode in ("none", "coarse", "posttap", "both"):
            kw = dict(early_term_eps=eps)
            if mode != "none":
                kw.update(trunk_int8=mode, act_scales=scales)
            render, pack = make_fused_hierarchical(renderer, **kw)
            wc, wf = pack(params)
            dt = time_render(render, wc, wf, rays_stack)
            out = jax.jit(lambda r: render(wc, wf, r))(rays0)
            d_rgb = np.abs(np.asarray(out["rgb_fine"])
                           - np.asarray(ref["rgb_fine"]))
            ray_max = d_rgb.reshape(BATCH, -1).max(axis=1)
            feat = np.asarray(out["feat_fine"])
            if mode == "coarse":
                feat_c[eps] = feat
            dfc = (np.abs(feat - feat_c[eps]).mean()
                   if eps in feat_c else float("nan"))
            print(f"eps={eps:g} {mode:8s}: {dt*1e3:6.2f} ms/chunk  "
                  f"{BATCH/dt/1e3:6.1f}k rays/s  "
                  f"rgb max {d_rgb.max():.2e} mean {d_rgb.mean():.2e} "
                  f"rays>1e-2 {(ray_max > 1e-2).sum()}  "
                  f"feat-vs-coarse {dfc:.2e}", flush=True)


if __name__ == "__main__":
    main()
