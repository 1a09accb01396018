"""Matmul roofline probe: what bf16 MFU is achievable at the MLP shapes?

  xla_giant   — XLA: 8-layer chain of (1179648, 256) @ (256, 256)
  xla_tile    — XLA: same chain at the kernel's per-step M=2048
  pl_chain    — pallas: 8-layer chain, R=16 grid (kernel-like, no encode)
  pl_bf16acc  — same, accumulating in bf16
  pl_wide     — pallas: M=16384 per grid step (tile 128 rays)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm

M_TOT = 1179648  # 9216 rays x 128 samples
HID = 256
LAYERS = 8
FLOPS = 2.0 * M_TOT * HID * HID * LAYERS


def timeit(fn, args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
    return (time.perf_counter() - t0) / iters


def report(name, dt):
    print(f"{name:>11}: {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOP/s "
          f"({FLOPS/dt/197e12*100:4.1f}% MFU)", flush=True)


def make_pallas(rows_per_step, acc_dtype):
    names = [f"w{i}" for i in range(LAYERS)]

    def kernel(x_ref, *refs):
        ws = refs[:LAYERS]
        o_ref = refs[LAYERS]
        h = x_ref[...]
        for i in range(LAYERS):
            h = jnp.dot(h, ws[i][...], preferred_element_type=acc_dtype)
            if acc_dtype == jnp.float32:
                h = h.astype(jnp.bfloat16)
        o_ref[...] = h.astype(jnp.float32)

    weights = [jnp.full((HID, HID), 0.01, jnp.bfloat16) for _ in range(LAYERS)]

    def run(x):
        grid = (M_TOT // rows_per_step,)
        in_specs = [pl.BlockSpec((rows_per_step, HID), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] + \
            [pl.BlockSpec((HID, HID), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * LAYERS
        out_specs = pl.BlockSpec((rows_per_step, HID), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((M_TOT, HID), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, *weights)

    return run


def main(variants):
    x = jnp.full((M_TOT, HID), 0.5, jnp.bfloat16)
    ws = [jnp.full((HID, HID), 0.01, jnp.bfloat16) for _ in range(LAYERS)]

    for v in variants:
        if v == "xla_giant":
            def chain(x, *ws):
                h = x
                for w in ws:
                    h = jnp.dot(h, w,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                return h
            dt = timeit(jax.jit(chain), (x, *ws))
        elif v == "xla_tile":
            def chain_t(x, *ws):
                xt = x.reshape(-1, 2048, HID)
                def body(h_in):
                    h = h_in
                    for w in ws:
                        h = jnp.dot(h, w, preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)
                    return h
                return jax.lax.map(body, xt)
            dt = timeit(jax.jit(chain_t), (x, *ws))
        elif v == "pl_chain":
            dt = timeit(jax.jit(make_pallas(2048, jnp.float32)), (x,))
        elif v == "pl_bf16acc":
            dt = timeit(jax.jit(make_pallas(2048, jnp.bfloat16)), (x,))
        elif v == "pl_wide":
            dt = timeit(jax.jit(make_pallas(16384, jnp.float32)), (x,))
        else:
            print("unknown", v)
            continue
        report(v, dt)


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["xla_giant", "xla_tile", "pl_chain", "pl_bf16acc", "pl_wide"])
