"""Measure --eval_bs: queries-per-dispatch batching of the matcher eval.

The localization eval protocol is per-query (reference
``benchmark_nerfmatch.py`` DataLoader(batch_size=1)); the inference
programs here are batched over queries end-to-end, so ``--eval_bs N``
collates N queries into one device program.  This probe times
``eval_match`` at production shapes (480x480 image, 3600 points,
ConvFormer-B36 c2f) for B in {1, 2, 4} and prints per-pair ms.

Timing per the axon-tunnel rules (.claude/skills/verify/SKILL.md):
pipelined independent dispatches, one small device fetch to sync.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS


def main():
    cfg = C2FMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share",
        pt_sa=3, pt_pe=True, post_pt_pe=True, coarse_layers=1,
        cformer_type="crs", fine_sa=1, win_sz=5)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    H = W = 480
    N = 3600
    rng = np.random.default_rng(0)
    for B in (1, 2, 4):
        img = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
        pt_feat = jnp.asarray(rng.normal(size=(B, N, 256)), jnp.float32)
        pt3d = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3, jnp.float32)

        out = model.eval_match(params, img, pt_feat, pt3d, mutual=True,
                               top_k=2048)
        np.asarray(out["lists"]["j_ids"])  # sync warmup/compile

        iters, rounds = 20, 3
        dt = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = model.eval_match(params, img, pt_feat, pt3d,
                                       mutual=True, top_k=2048)
            np.asarray(out["lists"]["j_ids"])
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(f"eval_bs={B}: {dt * 1e3:7.2f} ms/dispatch  "
              f"{dt * 1e3 / B:6.2f} ms/pair  {B / dt:6.1f} pairs/s")


if __name__ == "__main__":
    main()
