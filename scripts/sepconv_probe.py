"""On-chip parity + timing for the fused StarReLU+dw7x7 kernel vs XLA.

Shapes are the ConvFormer-B36 two-scale trunk's token-mixer mids at the
production 480x480/bs-2 workload (trunk_bwd_probe.py context):
stage0 3 blocks at (2, 240, 240, 256), stage1 12 blocks at (2, 60, 60, 512).

Run on the TPU: python scripts/sepconv_probe.py [--rb 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfmatch_tpu.ops.pallas.sepconv_kernel import (  # noqa: E402
    _dw_star_fwd, dw_star, dw_star_reference)

SHAPES = [(2, 240, 240, 256), (2, 60, 60, 512)]


def timeit(fn, args, iters=20, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def scal(tree):
    return sum(jnp.mean(l).astype(jnp.float32)
               for l in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rb", type=int, default=8)
    ap.add_argument("--variant", default="row")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    for (B, H, W, C) in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(7, 7, C)) * 0.2, jnp.float32)
        cb = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        s = jnp.float32(0.8944)
        b = jnp.float32(-0.4472)
        g = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

        # parity on chip
        ref = jax.jit(dw_star_reference)(x, w, cb, s, b)
        got = _dw_star_fwd(x, w, cb, s, b)
        d = float(jnp.abs(ref - got).max())

        fwd_p = jax.jit(lambda *a: scal(_dw_star_fwd(*a)))
        fwd_x = jax.jit(lambda *a: scal(dw_star_reference(*a)))
        vjp_p = jax.jit(lambda x, w, cb, s, b, g: scal(jax.grad(
            lambda *q: jnp.vdot(dw_star(*q), g), argnums=(0, 1, 2, 3, 4))(
                x, w, cb, s, b)))
        vjp_x = jax.jit(lambda x, w, cb, s, b, g: scal(jax.grad(
            lambda *q: jnp.vdot(dw_star_reference(*q), g),
            argnums=(0, 1, 2, 3, 4))(x, w, cb, s, b)))

        # grad parity on chip
        gp = vjp_p(x, w, cb, s, b, g)
        gx = vjp_x(x, w, cb, s, b, g)
        gd = float(jnp.abs(gp - gx))

        t = {
            "fwd_pallas": timeit(fwd_p, (x, w, cb, s, b)),
            "fwd_xla": timeit(fwd_x, (x, w, cb, s, b)),
            "fvjp_pallas": timeit(vjp_p, (x, w, cb, s, b, g)),
            "fvjp_xla": timeit(vjp_x, (x, w, cb, s, b, g)),
        }
        print(f"({B},{H},{W},{C}) fwd|d|={d:.2e} "
              f"grad-scal|d|={gd:.2e} " +
              "  ".join(f"{k} {v:6.2f}" for k, v in t.items()), flush=True)


if __name__ == "__main__":
    main()
