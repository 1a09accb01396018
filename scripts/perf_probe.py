"""Perf probe: time fused-render variants on the attached TPU chip.

Times (pipelined, single final fetch — see .claude/skills/verify/SKILL.md):
  full       — current production hierarchical path (coarse+resample+fine)
  coarse1    — one fused stage only (no resample, no fine)
  resample   — inverse-CDF resample alone
  tileNN     — full path at alternative ray tiles

Usage: python scripts/perf_probe.py [variants...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.nerf.sampling import resample_z_from_weights
from nerfmatch_tpu.ops.pallas.render_kernel import (
    make_fused_hierarchical, make_fused_render, prepare_ray_inputs,
    FusedRenderSpec, _pad_axis)
from nerfmatch_tpu.nerf.embedding import pe_embedding
from __graft_entry__ import _example_rays, _nerf_config

BATCH = 9216
ITERS = 30


def timeit(fn, args, fetch, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main(variants):
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))
    rays = _example_rays(BATCH)

    results = {}
    for v in variants:
        if v == "full" or v.startswith("tile"):
            tile = int(v[4:]) if v.startswith("tile") else 16
            render, pack = make_fused_hierarchical(renderer, ray_tile=tile)
            wc, wf = pack(params)
            fn = jax.jit(lambda rays: render(wc, wf, rays))
            dt = timeit(fn, (rays,), lambda o: o["rgb_fine"])
            results[v] = (dt, BATCH / dt)
        elif v == "coarse1":
            cfg = renderer.cfg
            spec = FusedRenderSpec(
                num_freqs=cfg.xyz_num_freqs,
                hid_dim=renderer.fine_cfg.hid_dim,
                layer_num=renderer.fine_cfg.layer_num, samples=128,
                ray_tile=16, feat_layer=3, white_bg=cfg.white_bg)
            fused = make_fused_render(spec)
            from nerfmatch_tpu.ops.pallas.render_train import (
                pack_mlp_weights_traced)
            w = pack_mlp_weights_traced(params["nerf_coarse"], spec)

            def one(rays):
                near, far = rays[:, 6:7], rays[:, 7:8]
                o8, d8 = prepare_ray_inputs(rays)
                dirs_pe = pe_embedding(rays[:, 8:11], cfg.dirs_num_freqs)
                extras = _pad_axis(dirs_pe, spec.extra_dim, 1)
                t = jnp.linspace(0.0, 1.0, 129)
                z = near * (1.0 - t) + far * t
                return fused(w, o8, d8, z, extras)

            fn = jax.jit(one)
            dt = timeit(fn, (rays,), lambda o: o["rgb"])
            results[v] = (dt, BATCH / dt)
        elif v == "resample":
            near, far = rays[:, 6:7], rays[:, 7:8]
            t = jnp.linspace(0.0, 1.0, 129)
            z = near * (1.0 - t) + far * t
            wts = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 128))
            fn = jax.jit(resample_z_from_weights)
            dt = timeit(fn, (z, wts), lambda o: o)
            results[v] = (dt, BATCH / dt)
        else:
            print(f"unknown variant {v}", file=sys.stderr)
            continue
        dt, rps = results[v]
        print(f"{v:>10}: {dt*1e3:8.2f} ms  {rps:10.0f} rays/s", flush=True)

    return results


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "coarse1", "resample", "tile32"])
