"""Decompose c2f matcher eval time (480x480, 3600 pts, production dims).

  backbone  — extract_im_feat_ms only
  ptpath    — extract_pt_feat only
  coarse    — backbone+pt + coarse former + dual softmax + extract
  fine      — full forward_match (adds dense fine stage)
  finegather— gather_fine_windows alone (dense 3600 windows)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
from nerfmatch_tpu.ops.matching import dual_softmax, extract_mutual_matches

H = W = 480
N = 3600


def timeit(fn, args, fetch, iters=20, rounds=3):
    best = float("inf")
    out = fn(*args)
    np.asarray(fetch(out))
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(variants):
    cfg = C2FMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share",
        pt_sa=3, pt_pe=True, post_pt_pe=True, coarse_layers=1,
        cformer_type="crs", fine_sa=1, win_sz=5)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(1, N, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(1, N, 3)) * 0.3, jnp.float32)

    for v in variants:
        if v == "backbone":
            fn = jax.jit(lambda p, im: model.extract_im_feat_ms(p, im))
            dt = timeit(fn, (params, img), lambda o: o[0])
        elif v == "ptpath":
            fn = jax.jit(lambda p, f, x: model.extract_pt_feat(p, f, x))
            dt = timeit(fn, (params, pt_feat, pt3d), lambda o: o)
        elif v == "coarse":
            def coarse_fn(p, im, f, x):
                im_c, _ = model.extract_im_feat_ms(p, im)
                pt_c = model.extract_pt_feat(p, f, x)
                im_c, pt_c = model.apply_coarse_former(p, im_c, pt_c)
                conf, _, _ = dual_softmax(im_c, pt_c, p["temperature"],
                                          temp_type=cfg.temp_type)
                return extract_mutual_matches(conf, mutual=True)
            fn = jax.jit(coarse_fn)
            dt = timeit(fn, (params, img, pt_feat, pt3d), lambda o: o["j_ids"])
        elif v == "fine":
            fn = jax.jit(lambda p, im, f, x: model.forward_match(
                p, im, f, x, mutual=True)["expec_f"])
            dt = timeit(fn, (params, img, pt_feat, pt3d), lambda o: o)
        elif v == "finegather":
            im_c, fmap_f = model.extract_im_feat_ms(params, img)
            B, M = im_c.shape[:2]
            b_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
            i_ids = jnp.tile(jnp.arange(M, dtype=jnp.int32), B)
            cw = W // 8
            fn = jax.jit(lambda p, ff, ic: model.gather_fine_windows(
                p, ff, ic, b_ids, i_ids, cw))
            dt = timeit(fn, (params, fmap_f, im_c), lambda o: o)
        else:
            print("unknown", v)
            continue
        print(f"{v:>10}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["backbone", "ptpath", "coarse", "fine", "finegather"])
