"""int8 matmul-chain probe: does v5e int8 MXU (2x bf16 peak) survive the
quantization overhead at the render kernel's MLP shapes?

Chain = 8 layers of (M, 256) @ (256, 256) + relu, M = 1024 rows/grid-step
(ray_tile 32 x 32-sample blocks), 9216 rays x 128 samples total.

  pl_bf16        — bf16 weights/acts, f32 accumulate (current kernel trunk)
  pl_int8_dyn    — int8 weights (static), acts quantized per-ROW dynamically
                   in-kernel (abs-max lane reduce + scale + round)
  pl_int8_static — int8 weights, acts quantized with a STATIC per-layer
                   scale (one multiply + round; the scale would be
                   calibrated at pack time from the checkpoint)
  pl_int8_raw    — int8 chain with NO requantization cost (upper bound:
                   relu on int32, immediate int8 cast)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TOT = 1179648  # 9216 rays x 128 samples
HID = 256
LAYERS = 8
ROWS = 1024
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
    print(f"{name:>15}: {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOP/s "
          f"({FLOPS/dt/197e12*100:5.1f}% of bf16 peak)", flush=True)


def make_bf16():
    def kernel(x_ref, *refs):
        ws, o_ref = refs[:LAYERS], refs[LAYERS]
        h = x_ref[...]
        for i in range(LAYERS):
            h = jnp.dot(h, ws[i][...], preferred_element_type=jnp.float32)
            h = jax.nn.relu(h).astype(jnp.bfloat16)
        o_ref[...] = h.astype(jnp.float32)

    weights = [jnp.full((HID, HID), 0.01, jnp.bfloat16)
               for _ in range(LAYERS)]
    return _build(kernel, weights, jnp.bfloat16)


def make_int8(mode):
    def kernel(x_ref, *refs):
        ws, o_ref = refs[:LAYERS], refs[LAYERS]
        h = x_ref[...]  # int8 in
        for i in range(LAYERS):
            acc = jnp.dot(h, ws[i][...], preferred_element_type=jnp.int32)
            if mode == "raw":
                # no dequant: relu in int32, shift back to int8 range
                h = jnp.clip(acc >> 7, 0, 127).astype(jnp.int8)
            else:
                f = acc.astype(jnp.float32) * (0.01 / 127.0 / 127.0)
                f = jax.nn.relu(f)
                if mode == "dyn":
                    s = jnp.max(jnp.abs(f), axis=-1, keepdims=True) + 1e-12
                    q = f * (127.0 / s)
                else:  # static
                    q = f * (127.0 / 4.0)
                h = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
        o_ref[...] = h.astype(jnp.float32)

    weights = [jnp.full((HID, HID), 3, jnp.int8) for _ in range(LAYERS)]
    return _build(kernel, weights, jnp.int8)


def _build(kernel, weights, in_dtype):
    def run(x):
        grid = (M_TOT // ROWS,)
        in_specs = [pl.BlockSpec((ROWS, HID), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] + \
            [pl.BlockSpec((HID, HID), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * LAYERS
        out_specs = pl.BlockSpec((ROWS, HID), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((M_TOT, HID), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, *weights)

    return run, in_dtype


def main(variants):
    for v in variants:
        if v == "pl_bf16":
            run, dt_in = make_bf16()
        elif v == "pl_int8_dyn":
            run, dt_in = make_int8("dyn")
        elif v == "pl_int8_static":
            run, dt_in = make_int8("static")
        elif v == "pl_int8_raw":
            run, dt_in = make_int8("raw")
        else:
            print("unknown", v)
            continue
        if dt_in == jnp.int8:
            x = jnp.full((M_TOT, HID), 2, jnp.int8)
        else:
            x = jnp.full((M_TOT, HID), 0.5, dt_in)
        try:
            dt = timeit(jax.jit(run), (x,))
        except Exception as e:  # noqa: BLE001 — probe: report and continue
            print(f"{v:>15}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        report(v, dt)


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["pl_bf16", "pl_int8_raw", "pl_int8_static", "pl_int8_dyn"])
