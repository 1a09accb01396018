"""Bisect why the int8 trunk is slower INSIDE the render kernel than in
the bare-chain roofline (5.05 ms there, ~15 ms effective in-kernel).

Variants (all 9216x128 samples, M=1024 rows/grid-step, 8 layers):
  int8_pure    — bare int8 chain, int8 input from HBM (the roofline case)
  int8_f32in   — input arrives f32 (M, 128) and is quantized in-kernel
                 (layer 0 K=128 int8 dot, rest 256)
  int8_skip    — + reuse xq at layer 5 (two dots: K=128 + K=256)
  int8_mixed   — + one bf16 f32-acc matmul before the chain and one after
                 (encode/head neighbors: does MXU mode mixing serialize?)
  bf16_f32in   — bf16 comparator with the same f32 input/epilogue
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TOT = 1179648
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


def build(variant):
    int8 = variant.startswith("int8")
    f32in = "f32in" in variant or "skip" in variant or "mixed" in variant
    skip = "skip" in variant or "mixed" in variant
    mixed = "mixed" in variant
    if variant == "int8_pure":
        f32in = False

    n_w = LAYERS

    def kernel(x_ref, enc_w_ref, head_w_ref, *refs):
        ws = refs[:n_w]
        o_ref = refs[n_w]
        x = x_ref[...]
        if mixed:
            # encode-like bf16 matmul neighbor (result feeds quantization)
            x = jnp.dot(x.astype(jnp.bfloat16), enc_w_ref[...],
                        preferred_element_type=jnp.float32)[:, :128]
        if int8:
            if f32in:
                xq = jnp.clip(jnp.round(x * 127.0), -127, 127
                              ).astype(jnp.int8)
            else:
                xq = x
            h = jnp.dot(xq, ws[0][...],
                        preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * 0.01
            h = jax.nn.relu(h)
            for i in range(1, LAYERS):
                hq = jnp.clip(jnp.round(h * 31.75), 0, 127).astype(jnp.int8)
                acc = jnp.dot(hq, ws[i][...],
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * 0.01
                if skip and i == 5:
                    acc = acc + jnp.dot(
                        xq, ws[0][...], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * 0.01
                h = jax.nn.relu(acc)
        else:
            h = x.astype(jnp.bfloat16)
            for i in range(LAYERS):
                h = jax.nn.relu(jnp.dot(h, ws[i][...],
                                        preferred_element_type=jnp.float32)
                                ).astype(jnp.bfloat16)
            h = h.astype(jnp.float32)
        if mixed:
            h = jnp.dot(h.astype(jnp.bfloat16), head_w_ref[...],
                        preferred_element_type=jnp.float32)
        o_ref[...] = h.astype(jnp.float32)

    if int8:
        w0_k = 128 if f32in else HID
        weights = [jnp.full((w0_k, HID), 3, jnp.int8)] + [
            jnp.full((HID, HID), 3, jnp.int8) for _ in range(LAYERS - 1)]
    else:
        weights = [jnp.full((128 if f32in else HID, HID), 0.01,
                            jnp.bfloat16)] + [
            jnp.full((HID, HID), 0.01, jnp.bfloat16)
            for _ in range(LAYERS - 1)]
    enc_w = jnp.full((128 if f32in else HID, HID), 0.01, jnp.bfloat16)
    head_w = jnp.full((HID, HID), 0.01, jnp.bfloat16)

    in_dim = 128 if f32in else HID
    if int8 and not f32in:
        x = jnp.full((M_TOT, in_dim), 2, jnp.int8)
    else:
        x = jnp.full((M_TOT, in_dim), 0.5, jnp.float32)

    def run(x):
        grid = (M_TOT // ROWS,)
        in_specs = [pl.BlockSpec((ROWS, in_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(enc_w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(head_w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)] + \
            [pl.BlockSpec(w.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for w in weights]
        out_specs = pl.BlockSpec((ROWS, HID), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((M_TOT, HID), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, enc_w, head_w, *weights)

    return run, x


def main(variants):
    for v in variants:
        try:
            run, x = build(v)
            dt = timeit(jax.jit(run), (x,))
            print(f"{v:>12}: {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{v:>12}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["int8_pure", "int8_f32in", "int8_skip",
                          "int8_mixed", "bf16_f32in"])
