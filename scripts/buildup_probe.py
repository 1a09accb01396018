"""Build-up probe: start from the 78%-MFU pure matmul chain and add kernel
pieces until it slows — additive localization of the non-chain cost.

  c0  — 8-layer chain only (pl_chain equivalent, xb fed from HBM)
  c1  — + skip matmul at layer 4 + heads (wf, alpha-reduce, wvh, wrgb)
  c2  — + in-kernel encode (row matmuls, E expand, polysin, exp)
  c3  — + composite (alpha/logt/tri-matmul/weighted sums) == full kernel
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from nerfmatch_tpu.ops.pallas.render_kernel import (  # noqa: E402
    make_spread_matrices, FusedRenderSpec, _fast_sin)

S, HID, LAYERS, R = 128, 256, 8, 16
T = R * S
BATCH = 9216


def make(level):
    spec = FusedRenderSpec(ray_tile=R)
    Sp, Sq, phase = make_spread_matrices(spec)
    tri = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1).T
    E = jnp.asarray(np.repeat(np.eye(R, dtype=np.float32), S, axis=0))
    consts = {"_Sp": Sp, "_Sq": Sq, "_ph": phase, "_tri": tri, "_E": E,
              "_xyz": jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)}
    weights = {
        "w0": jnp.zeros((128, HID), jnp.bfloat16),
        "w4s": jnp.zeros((128, HID), jnp.bfloat16),
        "wf": jnp.full((HID, HID), 0.01, jnp.bfloat16),
        "wa": jnp.ones((HID,), jnp.float32),
        "wvh": jnp.full((HID, 128), 0.01, jnp.bfloat16),
        "wvx": jnp.full((128, 128), 0.01, jnp.bfloat16),
        "wrgb": jnp.full((128, 128), 0.01, jnp.bfloat16),
        **consts,
    }
    for i in range(1, LAYERS):
        weights[f"w{i}"] = jnp.full((HID, HID), 0.01, jnp.bfloat16)
    names = sorted(weights)

    def kernel(xb_ref, o_ref, d_ref, z_ref, tmvr_ref, extras_ref, *refs):
        w = dict(zip(names, refs[:len(names)]))
        out_ref, w_out_ref = refs[len(names):]

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        if level >= 2:
            o8, d8 = o_ref[...], d_ref[...]
            xyz = w["_xyz"][...]
            oS = rowmm(o8 * xyz, w["_Sp"][...])
            dS = rowmm(d8, w["_Sp"][...])
            dQ = rowmm(d8 * d8, w["_Sq"][...])
            nQ = rowmm(xyz - d8 * d8, w["_Sq"][...])
            Em = w["_E"][...]
            oS_T, dS_T, dQ_T, nQ_T = (rowmm(Em, x) for x in (oS, dS, dQ, nQ))
            tm = tmvr_ref[...]
            pre = oS_T + tm[:, 0:1] * dS_T + w["_ph"][...]
            vs = tm[:, 1:2] * dQ_T + tm[:, 2:3] * nQ_T
            xb = (jnp.exp(-0.5 * vs) * _fast_sin(pre)).astype(jnp.bfloat16)
        else:
            xb = xb_ref[...]

        h = mm(xb, w["w0"][...])
        for i in range(1, LAYERS):
            acc = mm(h, w[f"w{i}"][...])
            if level >= 1 and i == 4:
                acc = acc + mm(xb, w["w4s"][...])
            h = acc

        if level >= 1:
            feature = mm(h, w["wf"][...])
            sigma_raw = jnp.sum(h.reshape(R, S, HID)
                                * w["wa"][...][None, None, :], axis=-1)
            hv = mm(feature, w["wvh"][...])
            hv = hv.reshape(R, S, -1) + rowmm(
                extras_ref[...].astype(jnp.bfloat16), w["wvx"][...])[:, None, :]
            rgb = mm(hv.reshape(T, -1), w["wrgb"][...]).reshape(R, S, -1)
        else:
            rgb = h.reshape(R, S, -1)[:, :, :128]
            sigma_raw = h.reshape(R, S, HID)[:, :, 0] * 0.001

        if level >= 3:
            z = z_ref[...]
            t0, t1 = z[:, :-1], z[:, 1:]
            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * (t1 - t0))
            log_t = jnp.log(1.0 - alpha + 1e-10)
            csum = rowmm(log_t, w["_tri"][...])
            wgt = alpha * jnp.exp(csum)
            out_ref[...] = jnp.sum(wgt[:, :, None] * rgb, axis=1)
            w_out_ref[...] = wgt
        else:
            out_ref[...] = jnp.sum(rgb, axis=1) + sigma_raw[:, 0:1] * 0.0
            w_out_ref[...] = sigma_raw

    def run(xb, o8, d8, z, tmvr, extras):
        N = z.shape[0]
        grid = (N // R,)

        def cs(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [cs(weights[k]) for k in names]
        out_specs = [
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, S), jnp.float32),
        ]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xb, o8, d8, z, tmvr, extras, *[weights[k] for k in names])

    return run


def timeit(fn, args, iters=30, rounds=3):
    best = float("inf")
    out = fn(*args)
    np.asarray(out[0][:8])
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[0][:8])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(levels):
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(BATCH * S, 128)), jnp.bfloat16)
    o8 = jnp.asarray(rng.normal(size=(BATCH, 8)), jnp.float32)
    d8 = jnp.asarray(rng.normal(size=(BATCH, 8)), jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 1.5, (BATCH, S + 1)),
                             jnp.float32), axis=1)
    tmvr = jnp.asarray(rng.uniform(0.1, 1.0, (BATCH * S, 8)), jnp.float32)
    extras = jnp.asarray(rng.normal(size=(BATCH, 128)), jnp.float32)
    for lv in levels:
        fn = jax.jit(make(int(lv)))
        dt = timeit(fn, (xb, o8, d8, z, tmvr, extras))
        print(f"c{lv}: {dt*1e3:8.2f} ms  {BATCH/dt:9.0f} rays/s(1stage)",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["0", "1", "2", "3"])
