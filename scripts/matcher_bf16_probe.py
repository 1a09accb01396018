"""Matcher eval compute_dtype probe: f32 vs bf16 backbone+attention.

Times the two eval programs (conv trunk | matching) and the full
``eval_match`` for both dtypes, then counts match flips between them on a
correlated workload (point features = the f32 image tokens + noise, so the
expected matches are meaningful, not argmax coin-flips).

Run on the chip (one axon client at a time):
  python scripts/matcher_bf16_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nerfmatch_tpu.models.matcher_coarse import (  # noqa: E402
    CoarseMatcherConfig, NeRFMatcherCoarse)


def timeit(fn, *args, sync, iters=20, rounds=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    base = dict(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share", pt_sa=3,
        pt_pe=True, post_pt_pe=True, coarse_layers=1, cformer_type="crs")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 480, 480, 3)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(1, 3600, 3)) * 0.3, jnp.float32)

    models, params = {}, None
    for dt in ("float32", "bfloat16"):
        models[dt] = NeRFMatcherCoarse(
            CoarseMatcherConfig(**base, compute_dtype=dt))
        if params is None:
            params = models[dt].init_params(jax.random.PRNGKey(0))

    # Correlated points: f32 image tokens + noise -> meaningful matches.
    toks = jax.jit(models["float32"].extract_im_feat)(params, img)
    sel = rng.choice(3600, 3600, replace=False)
    pt_feat = jnp.asarray(
        np.asarray(toks)[0][sel] + rng.normal(size=(3600, 256)) * 0.05,
        jnp.float32)[None]

    outs = {}
    for dt, model in models.items():
        conv = jax.jit(model.im_backbone)
        t_conv = timeit(conv, params, img,
                        sync=lambda o: np.asarray(o).ravel()[:4])
        t_full = timeit(
            lambda: model.eval_match(params, img, pt_feat, pt3d,
                                     mutual=True, top_k=2048),
            sync=lambda o: np.asarray(o["j_ids"]).ravel()[:4])
        outs[dt] = model.eval_match(params, img, pt_feat, pt3d,
                                    mutual=True, top_k=2048)
        print(f"{dt:9s} conv={t_conv * 1e3:6.2f} ms  "
              f"full={t_full * 1e3:6.2f} ms  ({1 / t_full:6.1f} pairs/s)")

    a, b = outs["float32"], outs["bfloat16"]
    va = np.asarray(a["valid"])[0].astype(bool)
    vb = np.asarray(b["valid"])[0].astype(bool)
    ja, jb = np.asarray(a["j_ids"])[0], np.asarray(b["j_ids"])[0]
    both = va & vb
    same = (ja[both] == jb[both]).mean() if both.any() else float("nan")
    print(f"matches: f32 n={va.sum()}  bf16 n={vb.sum()}  "
          f"valid-agree={(va == vb).mean():.4f}  "
          f"same-target(among both)={same:.4f}")


if __name__ == "__main__":
    main()
