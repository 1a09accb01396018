"""Diagnostic kernel variants: localize non-MXU time in the fused render.

Variants of ONE fused stage (9216 rays x 128 samples, 8x256 MLP):
  base      — the production kernel (same math as render_kernel.py)
  notrig    — IPE sin/exp replaced by a multiply (measures transcendentals)
  nobias    — MLP epilogues reduced to relu only (measures VPU bias cost)
  norelu    — pure matmul chain, heads kept (measures all epilogue VPU work)
  mlponly   — matmul chain only, trivial composite (upper bound)
  bigtile   — base at ray_tile 32
  dispatch  — trivial jitted add (per-call floor through the tunnel)
  batch4x   — base with 36864 rays (amortization check)

Throwaway diagnostics; production kernel lives in ops/pallas/render_kernel.py.
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
    FusedRenderSpec, make_spread_matrices, _pad_axis)
from nerfmatch_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()  # persistent XLA cache: reruns start warm

S = 128
HID = 256
LAYERS = 8
ITERS = 30


def make_stage(variant: str, ray_tile: int = 16):
    spec = FusedRenderSpec(ray_tile=ray_tile)
    R = ray_tile
    T = R * S
    Sp, Sq, phase = make_spread_matrices(spec)
    tri = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1).T
    expand = jnp.asarray(np.repeat(np.eye(R, dtype=np.float32), S, axis=0))

    names = []

    def kernel(*refs):
        n_in = 5 + len(names)
        o_ref, d_ref, z_ref, tmvr_ref, extras_ref = refs[:5]
        w = dict(zip(names, refs[5:n_in]))
        rgb_ref, w_out_ref = refs[n_in:]

        o8, d8, z = o_ref[...], d_ref[...], z_ref[...]

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        xyz = w["_xyz"][...]
        oS = rowmm(o8 * xyz, w["_Sp"][...])
        dS = rowmm(d8, w["_Sp"][...])
        dQ = rowmm(d8 * d8, w["_Sq"][...])
        nQ = rowmm(xyz - d8 * d8, w["_Sq"][...])
        E = w["_E"][...]
        oS_T, dS_T, dQ_T, nQ_T = (rowmm(E, x) for x in (oS, dS, dQ, nQ))
        tm = tmvr_ref[...]
        pre = oS_T + tm[:, 0:1] * dS_T + w["_ph"][...]
        vs = tm[:, 1:2] * dQ_T + tm[:, 2:3] * nQ_T
        if variant == "split2":
            def encode(sl):
                oS = rowmm(o8[sl] * xyz, w["_Sp"][...])
                dS = rowmm(d8[sl], w["_Sp"][...])
                dQ = rowmm(d8[sl] * d8[sl], w["_Sq"][...])
                nQ = rowmm(xyz - d8[sl] * d8[sl], w["_Sq"][...])
                E2 = w["_E"][...][: T // 2, : R // 2]
                oS_T, dS_T, dQ_T, nQ_T = (rowmm(E2, t) for t in (oS, dS, dQ, nQ))
                tm2 = tmvr_ref[...][sl.start * S if sl.start else 0:
                                    (sl.stop) * S]
                pre = oS_T + tm2[:, 0:1] * dS_T + w["_ph"][...]
                vs = tm2[:, 1:2] * dQ_T + tm2[:, 2:3] * nQ_T
                return (jnp.exp(-0.5 * vs) * jnp.sin(pre)).astype(jnp.bfloat16)

            def mmb(a, b):
                return jnp.dot(a.astype(jnp.bfloat16), b,
                               preferred_element_type=jnp.float32)

            xb1 = encode(slice(0, R // 2))
            h1 = jax.nn.relu(mmb(xb1, w["w0"][...]) + w["b0"][...])
            xb2 = encode(slice(R // 2, R))
            h2 = jax.nn.relu(mmb(xb2, w["w0"][...]) + w["b0"][...])
            hs = [h1, h2]
            xbs = [xb1, xb2]
            for k in range(1, LAYERS):
                for j in range(2):
                    acc = mmb(hs[j], w[f"w{k}"][...])
                    if k == 4:
                        acc = acc + mmb(xbs[j], w[f"w{k}s"][...])
                    hs[j] = jax.nn.relu(acc + w[f"b{k}"][...])
            h_all = jnp.concatenate(hs, axis=0)
            feature = mmb(h_all, w["wf"][...])
            sigma_raw = jnp.sum(h_all.reshape(R, S, HID)
                                * w["wa"][...][None, None, :], axis=-1)
            hv = mmb(feature, w["wvh"][...])
            hv = jax.nn.relu(
                hv.reshape(R, S, -1)
                + rowmm(extras_ref[...].astype(jnp.bfloat16),
                        w["wvx"][...])[:, None, :])
            rgb = jax.nn.sigmoid(
                mmb(hv.reshape(T, -1), w["wrgb"][...])).reshape(R, S, -1)
            t0, t1 = z[:, :-1], z[:, 1:]
            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * (t1 - t0))
            log_t = jnp.log(1.0 - alpha + 1e-10)
            csum = rowmm(log_t, w["_tri"][...])
            weights = alpha * jnp.exp(csum)
            rgb_ref[...] = jnp.sum(weights[:, :, None] * rgb, axis=1)
            w_out_ref[...] = weights
            return
        if variant == "polysin":
            r = pre * (1.0 / (2.0 * np.pi))
            r = r - jnp.round(r)
            r2 = r * r
            sn = r * (6.283088463 + r2 * (-41.33324754 + r2 * (81.40008977
                      + r2 * (-74.67588387 + r2 * 33.16809461))))
            xb = (jnp.exp(-0.5 * vs) * sn).astype(jnp.bfloat16)
        elif variant == "nosin":
            xb = jnp.exp(-0.5 * vs).astype(jnp.bfloat16)
        elif variant == "noexp":
            xb = jnp.sin(pre).astype(jnp.bfloat16)
        elif variant == "noenc":
            xb = tmvr_ref[...][:, 0:1].astype(jnp.bfloat16) * w["w0"][...][0:1, :][:, :128].reshape(1, -1)[:, :128] if False else jnp.zeros((T, 128), jnp.bfloat16) + tmvr_ref[...][:, 0:1].astype(jnp.bfloat16)
        elif variant == "notrig":
            xb = (pre * vs).astype(jnp.bfloat16)
        else:
            xb = (jnp.exp(-0.5 * vs) * jnp.sin(pre)).astype(jnp.bfloat16)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        if variant == "i8":
            # sequential int8 serving trunk (render_kernel trunk_int8
            # structure) — the pipe_i8 comparator
            def i8mm(a, b):
                return jnp.dot(a, b, preferred_element_type=jnp.int32
                               ).astype(jnp.float32)

            def sat8(y):
                return jnp.clip(y, -127, 127).astype(jnp.int8)

            xq = sat8(jnp.round(xb.astype(jnp.float32) * w["qenc"][...]))
            hq = xq
            for k in range(LAYERS - 1):
                acc = i8mm(hq if k else xq, w[f"w{k}q"][...])
                if k == 4:
                    acc = acc + i8mm(xq, w["w4sq"][...])
                hq = sat8(jnp.maximum(acc * w[f"c{k}"][...]
                                      + w[f"B{k}"][...], 0.5))
            h = jax.nn.relu(
                i8mm(hq, w[f"w{LAYERS - 1}q"][...]) * w["slast"][...]
                + w[f"b{LAYERS - 1}"][...])
        elif variant in ("ileave", "ileave_i8"):
            # 2-way layer-interleave: split the tile's rows in half and
            # alternate the two independent chains in program order, so
            # chain A's bias+relu (VPU) can overlap chain B's dot (MXU)
            # if Mosaic schedules across the chains.  Tests whether the
            # per-layer epilogue bubbles (the 78% chain MFU) are hideable.
            half = T // 2
            xa, xc = xb[:half], xb[half:]

            def layer(hh, xx, i):
                acc = mm(hh, w[f"w{i}"][...])
                if i == 4:
                    acc = acc + mm(xx, w[f"w{i}s"][...])
                return jax.nn.relu(acc + w[f"b{i}"][...])

            ha = jax.nn.relu(mm(xa, w["w0"][...]) + w["b0"][...])
            hb = jax.nn.relu(mm(xc, w["w0"][...]) + w["b0"][...])
            for i in range(1, LAYERS):
                ha = layer(ha, xa, i)
                hb = layer(hb, xc, i)
            h = jnp.concatenate([ha, hb], axis=0)
        else:
            h = mm(xb, w["w0"][...])
            if variant not in ("norelu", "mlponly"):
                h = h + w["b0"][...] if variant != "nobias" else h
                h = jax.nn.relu(h)
            for i in range(1, LAYERS):
                acc = mm(h, w[f"w{i}"][...])
                if i == 4:
                    acc = acc + mm(xb, w[f"w{i}s"][...])
                if variant not in ("norelu", "mlponly"):
                    if variant != "nobias":
                        acc = acc + w[f"b{i}"][...]
                    acc = jax.nn.relu(acc)
                h = acc

        if variant == "lite":
            sigma_raw = jnp.sum(h.reshape(R, S, HID) * w["wa"][...][None, None, :],
                                axis=-1)
            t0, t1 = z[:, :-1], z[:, 1:]
            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * (t1 - t0))
            log_t = jnp.log(1.0 - alpha + 1e-10)
            csum = rowmm(log_t, w["_tri"][...])
            weights = alpha * jnp.exp(csum)
            rgb_ref[...] = weights
            w_out_ref[...] = weights
            return
        feature = mm(h, w["wf"][...])
        if variant == "sigmamm":
            sigma_raw = mm(h, w["wa_col"][...])[:, 0].reshape(R, S)
        elif variant == "nosigma":
            sigma_raw = z_ref[...][:, :-1]
        else:
            sigma_raw = jnp.sum(h.reshape(R, S, HID) * w["wa"][...][None, None, :],
                                axis=-1)
        hv = mm(feature, w["wvh"][...])
        if variant != "mlponly":
            hv = jax.nn.relu(
                hv.reshape(R, S, -1)
                + rowmm(extras_ref[...].astype(jnp.bfloat16), w["wvx"][...])[:, None, :])
            rgb = jax.nn.sigmoid(
                mm(hv.reshape(T, -1), w["wrgb"][...])).reshape(R, S, -1)
        else:
            rgb = mm(hv, w["wrgb"][...]).reshape(R, S, -1)

        t0, t1 = z[:, :-1], z[:, 1:]
        if variant == "mlponly":
            weights = sigma_raw
        else:
            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * (t1 - t0))
            log_t = jnp.log(1.0 - alpha + 1e-10)
            csum = rowmm(log_t, w["_tri"][...])
            weights = alpha * jnp.exp(csum)
        if variant == "norgbsum":
            rgb_ref[...] = rgb[:, 0, :]
        else:
            rgb_ref[...] = jnp.sum(weights[:, :, None] * rgb, axis=1)
        w_out_ref[...] = weights

    weights = {
        "_Sp": Sp, "_xyz": jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32), "_Sq": Sq, "_ph": phase, "_tri": tri, "_E": expand,
        "w0": jnp.zeros((128, HID), jnp.bfloat16),
        "wf": jnp.ones((HID, HID), jnp.bfloat16) * 0.01,
        "wa": jnp.ones((HID,), jnp.float32),
        "wa_col": jnp.concatenate([jnp.ones((HID, 1), jnp.bfloat16),
                                   jnp.zeros((HID, 127), jnp.bfloat16)], 1),
        "wvh": jnp.ones((HID, 128), jnp.bfloat16) * 0.01,
        "wvx": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "wrgb": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "w4s": jnp.zeros((128, HID), jnp.bfloat16),
    }
    for i in range(LAYERS):
        weights[f"b{i}"] = jnp.zeros((HID,), jnp.float32)
        if i:
            weights[f"w{i}"] = jnp.ones((HID, HID), jnp.bfloat16) * 0.01
    if variant == "i8":
        weights["qenc"] = jnp.full((1, 128), 64.0, jnp.float32)
        weights["slast"] = jnp.full((1, HID), 1e-4, jnp.float32)
        weights["w4sq"] = jnp.ones((128, HID), jnp.int8)
        for k in range(LAYERS):
            weights[f"w{k}q"] = jnp.ones(
                (128 if k == 0 else HID, HID), jnp.int8)
            if k < LAYERS - 1:
                weights[f"c{k}"] = jnp.full((1, HID), 1e-4, jnp.float32)
                weights[f"B{k}"] = jnp.full((1, HID), 0.5, jnp.float32)
    names.extend(sorted(weights))

    def run(o8, d8, z, tmvr, extras):
        N = z.shape[0]
        grid = (N // R,)

        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R * S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(weights[k]) for k in names]
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
        )(o8, d8, z, tmvr, extras, *[weights[k] for k in names])

    return run


def make_pipe(ray_tile: int = 16, int8: bool = False):
    """Software-pipelined stage: encode (VPU trig) of tile i runs in the same
    grid step as the MLP (MXU) of tile i-1, through a double-buffered VMEM
    scratch — independent chains the scheduler can overlap.

    ``int8``: run the trunk as the quantized serving chain (qenc/requant/
    saturating-cast structure of render_kernel's trunk_int8 branch) — the
    VERDICT r3 re-measure: with the MXU chain at ~0.63x, is the VPU
    epilogue now worth pipelining?"""
    spec = FusedRenderSpec(ray_tile=ray_tile)
    R = ray_tile
    T = R * S
    Sp, Sq, phase_v = make_spread_matrices(spec)
    tri = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1).T
    expand = jnp.asarray(np.repeat(np.eye(R, dtype=np.float32), S, axis=0))

    names = []

    def kernel(*refs):
        n_in = 5 + len(names)
        o_ref, d_ref, z_ref, tmvr_ref, extras_ref = refs[:5]
        w = dict(zip(names, refs[5:n_in]))
        rgb_ref, w_out_ref, xb_scr = refs[n_in:]

        i = pl.program_id(0)
        n = pl.num_programs(0)
        ph = jax.lax.rem(i, 2)

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        @pl.when(i < n - 1)
        def _encode():
            o8, d8 = o_ref[...], d_ref[...]
            xyz = w["_xyz"][...]
            oS = rowmm(o8 * xyz, w["_Sp"][...])
            dS = rowmm(d8, w["_Sp"][...])
            dQ = rowmm(d8 * d8, w["_Sq"][...])
            nQ = rowmm(xyz - d8 * d8, w["_Sq"][...])
            E = w["_E"][...]
            oS_T, dS_T, dQ_T, nQ_T = (rowmm(E, x) for x in (oS, dS, dQ, nQ))
            tm = tmvr_ref[...]
            pre = oS_T + tm[:, 0:1] * dS_T + w["_ph"][...]
            vs = tm[:, 1:2] * dQ_T + tm[:, 2:3] * nQ_T
            xb_scr[ph] = (jnp.exp(-0.5 * vs) * jnp.sin(pre)).astype(jnp.bfloat16)

        @pl.when(i > 0)
        def _mlp():
            xb = xb_scr[1 - ph]
            z = z_ref[...]

            def mm(a, b):
                return jnp.dot(a.astype(jnp.bfloat16), b,
                               preferred_element_type=jnp.float32)

            if int8:
                def i8mm(a, b):
                    return jnp.dot(a, b, preferred_element_type=jnp.int32
                                   ).astype(jnp.float32)

                def sat8(y):
                    return jnp.clip(y, -127, 127).astype(jnp.int8)

                xq = sat8(jnp.round(xb.astype(jnp.float32)
                                    * w["qenc"][...]))
                hq = xq
                for k in range(LAYERS - 1):
                    acc = i8mm(hq if k else xq, w[f"w{k}q"][...])
                    if k == 4:
                        acc = acc + i8mm(xq, w["w4sq"][...])
                    hq = sat8(jnp.maximum(acc * w[f"c{k}"][...]
                                          + w[f"B{k}"][...], 0.5))
                h = jax.nn.relu(
                    i8mm(hq, w[f"w{LAYERS - 1}q"][...]) * w["slast"][...]
                    + w[f"b{LAYERS - 1}"][...])
            else:
                h = jax.nn.relu(mm(xb, w["w0"][...]) + w["b0"][...])
                for k in range(1, LAYERS):
                    acc = mm(h, w[f"w{k}"][...])
                    if k == 4:
                        acc = acc + mm(xb, w[f"w{k}s"][...])
                    h = jax.nn.relu(acc + w[f"b{k}"][...])
            feature = mm(h, w["wf"][...])
            sigma_raw = mm(h, w["wa_col"][...])[:, 0].reshape(R, S)
            hv = mm(feature, w["wvh"][...])
            hv = jax.nn.relu(
                hv.reshape(R, S, -1)
                + rowmm(extras_ref[...].astype(jnp.bfloat16),
                        w["wvx"][...])[:, None, :])
            rgb = jax.nn.sigmoid(
                mm(hv.reshape(T, -1), w["wrgb"][...])).reshape(R, S, -1)

            t0, t1 = z[:, :-1], z[:, 1:]
            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * (t1 - t0))
            log_t = jnp.log(1.0 - alpha + 1e-10)
            csum = rowmm(log_t, w["_tri"][...])
            weights = alpha * jnp.exp(csum)
            rgb_ref[...] = jnp.sum(weights[:, :, None] * rgb, axis=1)
            w_out_ref[...] = weights

    weights = {
        "_Sp": Sp, "_Sq": Sq, "_ph": phase_v, "_tri": tri, "_E": expand,
        "_xyz": jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32),
        "w0": jnp.zeros((128, HID), jnp.bfloat16),
        "wf": jnp.ones((HID, HID), jnp.bfloat16) * 0.01,
        "wa_col": jnp.concatenate([jnp.ones((HID, 1), jnp.bfloat16),
                                   jnp.zeros((HID, 127), jnp.bfloat16)], 1),
        "wvh": jnp.ones((HID, 128), jnp.bfloat16) * 0.01,
        "wvx": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "wrgb": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "w4s": jnp.zeros((128, HID), jnp.bfloat16),
    }
    for k in range(LAYERS):
        weights[f"b{k}"] = jnp.zeros((HID,), jnp.float32)
        if k:
            weights[f"w{k}"] = jnp.ones((HID, HID), jnp.bfloat16) * 0.01
    if int8:
        # synthetic quantized trunk (values keep hq in-range; timing only)
        weights["qenc"] = jnp.full((1, 128), 64.0, jnp.float32)
        weights["slast"] = jnp.full((1, HID), 1e-4, jnp.float32)
        weights["w4sq"] = jnp.ones((128, HID), jnp.int8)
        for k in range(LAYERS):
            weights[f"w{k}q"] = jnp.ones(
                (128 if k == 0 else HID, HID), jnp.int8)
            if k < LAYERS - 1:
                weights[f"c{k}"] = jnp.full((1, HID), 1e-4, jnp.float32)
                weights[f"B{k}"] = jnp.full((1, HID), 0.5, jnp.float32)
    names.extend(sorted(weights))

    def run(o8, d8, z, tmvr, extras):
        N = z.shape[0]
        nblk = N // R
        grid = (nblk + 1,)

        def enc_map(i):
            return (jnp.minimum(i, nblk - 1), 0)

        def mlp_map(i):
            return (jnp.maximum(i - 1, 0), 0)

        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((R, 8), enc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), enc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S + 1), mlp_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((R * S, 8), enc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), mlp_map, memory_space=pltpu.VMEM),
        ] + [const_spec(weights[k]) for k in names]
        out_specs = [
            pl.BlockSpec((R, 128), mlp_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), mlp_map, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, S), jnp.float32),
        ]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2, R * S, 128), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(o8, d8, z, tmvr, extras, *[weights[k] for k in names])

    return run


def inputs(batch):
    rng = np.random.default_rng(0)
    o8 = jnp.asarray(rng.normal(size=(batch, 8)), jnp.float32)
    d8 = jnp.asarray(rng.normal(size=(batch, 8)), jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 1.5, (batch, S + 1)),
                             jnp.float32), axis=1)
    tmvr = jnp.asarray(rng.uniform(0.1, 1.0, (batch * S, 8)), jnp.float32)
    extras = jnp.asarray(rng.normal(size=(batch, 128)), jnp.float32)
    return o8, d8, z, tmvr, extras


def timeit(fn, args, iters=ITERS, rounds=3):
    best = float("inf")
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(variants):
    for v in variants:
        if v.startswith("blockskip") or v == "blocknoskip":
            # blockskipNN -> dynamic skip with NN% of tiles saturated;
            # blocknoskip -> same blocked structure, no skip (overhead).
            frac = (int(v[len("blockskip"):] or 0) / 100.0
                    if v != "blocknoskip" else 0.0)
            raw = make_blockskip(dynamic=(v != "blocknoskip"))
            fn = jax.jit(lambda *a, _r=raw: sum(jnp.sum(o) for o in _r(*a)))
            dt = timeit(fn, blockskip_inputs(9216, frac))
            print(f"{v:>12}: {dt*1e3:8.2f} ms  {9216/dt:10.0f} rays/s(1stage)",
                  flush=True)
            continue
        if v == "dispatch":
            x = jnp.zeros((128, 128))
            fn = jax.jit(lambda x: x + 1.0)
            dt = timeit(fn, (x,), iters=100)
            print(f"{v:>9}: {dt*1e3:8.3f} ms", flush=True)
            continue
        batch = 36864 if v == "batch4x" else 9216
        tile = 32 if v == "bigtile" else 16
        kv = "base" if v in ("bigtile", "batch4x") else v
        raw = (make_pipe(ray_tile=tile, int8=kv.endswith("_i8"))
               if kv.startswith("pipe")
               else make_stage(kv, ray_tile=tile))
        # Checksum fetch: returning the (N,128)+(N,S) outputs ships ~9 MB
        # per call through the ~30 MB/s tunnel and dominates the timing.
        fn = jax.jit(lambda *a: sum(jnp.sum(o) for o in raw(*a)))
        dt = timeit(fn, inputs(batch))
        rps = batch / dt
        print(f"{v:>9}: {dt*1e3:8.2f} ms  {rps:10.0f} rays/s(1stage)",
              flush=True)




def make_blockskip(ray_tile: int = 16, n_blocks: int = 4, eps: float = 1e-4,
                   dynamic: bool = True):
    """Early-termination prototype: the sample axis is processed in
    ``n_blocks`` z-ordered blocks; once every ray in the tile is saturated
    (accumulated transmittance < eps), remaining blocks' trunk is skipped
    under a data-dependent ``pl.when``.  ``dynamic=False`` builds the same
    blocked structure without the skip (overhead baseline)."""
    spec = FusedRenderSpec(ray_tile=ray_tile)
    R = ray_tile
    Sb = S // n_blocks
    Tb = R * Sb
    Sp, Sq, phase = make_spread_matrices(spec)
    tri_b = jnp.tril(jnp.ones((Sb, Sb), jnp.float32), k=-1).T
    expand_b = jnp.asarray(np.repeat(np.eye(R, dtype=np.float32), Sb, axis=0))

    names = []

    def kernel(*refs):
        n_in = 5 + len(names)
        o_ref, d_ref, z_ref, tmvr_ref, extras_ref = refs[:5]
        w = dict(zip(names, refs[5:n_in]))
        rgb_ref, w_out_ref, rgb_scr, logt_scr = refs[n_in:]

        o8, d8 = o_ref[...], d_ref[...]

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        xyz = w["_xyz"][...]
        oS = rowmm(o8 * xyz, w["_Sp"][...])
        dS = rowmm(d8, w["_Sp"][...])
        dQ = rowmm(d8 * d8, w["_Sq"][...])
        nQ = rowmm(xyz - d8 * d8, w["_Sq"][...])
        E = w["_E"][...]
        oS_T, dS_T, dQ_T, nQ_T = (rowmm(E, x) for x in (oS, dS, dQ, nQ))

        rgb_scr[...] = jnp.zeros_like(rgb_scr)
        logt_scr[...] = jnp.zeros_like(logt_scr)

        z = z_ref[...]
        for j in range(n_blocks):
            # Block slice of the (pre-permuted block-major) sample inputs.
            tm = tmvr_ref[j * Tb : (j + 1) * Tb, :]
            zb = z[:, j * Sb : (j + 1) * Sb + 1]
            t0b, t1b = zb[:, :-1], zb[:, 1:]

            def block_body(j=j, tm=tm, t0b=t0b, t1b=t1b):
                # The E-expansion is per-ray broadcast over the block's
                # Sb samples -> identical for every block; only tm varies.
                pre = oS_T + tm[:, 0:1] * dS_T + w["_ph"][...]
                vs = tm[:, 1:2] * dQ_T + tm[:, 2:3] * nQ_T
                xb = (jnp.exp(-0.5 * vs) * jnp.sin(pre)).astype(jnp.bfloat16)
                h = jax.nn.relu(mm(xb, w["w0"][...]) + w["b0"][...])
                for k in range(1, LAYERS):
                    acc = mm(h, w[f"w{k}"][...])
                    if k == 4:
                        acc = acc + mm(xb, w[f"w{k}s"][...])
                    h = jax.nn.relu(acc + w[f"b{k}"][...])
                feature = mm(h, w["wf"][...])
                sigma_raw = mm(h, w["wa_col"][...])[:, 0].reshape(R, Sb)
                hv = mm(feature, w["wvh"][...])
                hv = jax.nn.relu(
                    hv.reshape(R, Sb, -1)
                    + rowmm(extras_ref[...].astype(jnp.bfloat16),
                            w["wvx"][...])[:, None, :])
                rgb = jax.nn.sigmoid(
                    mm(hv.reshape(Tb, -1), w["wrgb"][...])).reshape(R, Sb, -1)

                sigma = jax.nn.relu(sigma_raw)
                alpha = 1.0 - jnp.exp(-sigma * (t1b - t0b))
                log_t = jnp.log(1.0 - alpha + 1e-10)
                prev = logt_scr[:, 0:1]
                csum = rowmm(log_t, w["_trib"][...]) + prev
                weights = alpha * jnp.exp(csum)
                w_out_ref[:, j * Sb : (j + 1) * Sb] = weights
                rgb_scr[...] += jnp.sum(weights[:, :, None] * rgb, axis=1)
                logt_scr[...] = (prev
                                 + jnp.sum(log_t, axis=1, keepdims=True)
                                 ) * jnp.ones((R, 128), jnp.float32)

            if j == 0 or not dynamic:
                block_body()
            else:
                w_out_ref[:, j * Sb : (j + 1) * Sb] = jnp.zeros(
                    (R, Sb), jnp.float32)
                alive = jnp.max(logt_scr[:, 0]) > np.log(eps)
                pl.when(alive)(block_body)

        rgb_ref[...] = rgb_scr[...]

    weights = {
        "_Sp": Sp, "_Sq": Sq, "_ph": phase, "_trib": tri_b, "_E": expand_b,
        "_xyz": jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32),
        "w0": jnp.ones((128, HID), jnp.bfloat16) * 0.01,
        "wf": jnp.ones((HID, HID), jnp.bfloat16) * 0.01,
        "wa_col": jnp.concatenate([jnp.ones((HID, 1), jnp.bfloat16),
                                   jnp.zeros((HID, 127), jnp.bfloat16)], 1),
        "wvh": jnp.ones((HID, 128), jnp.bfloat16) * 0.01,
        "wvx": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "wrgb": jnp.ones((128, 128), jnp.bfloat16) * 0.01,
        "w4s": jnp.zeros((128, HID), jnp.bfloat16),
    }
    for k in range(LAYERS):
        weights[f"b{k}"] = jnp.zeros((HID,), jnp.float32)
        if k:
            weights[f"w{k}"] = jnp.ones((HID, HID), jnp.bfloat16) * 0.01
    names.extend(sorted(weights))

    def run(o8, d8, z, tmvr, extras):
        N = z.shape[0]
        grid = (N // R,)

        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R * S, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(weights[k]) for k in names]
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
            scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32),
                            pltpu.VMEM((R, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(o8, d8, z, tmvr, extras, *[weights[k] for k in names])

    return run


def blockskip_inputs(batch, saturate_frac: float, ray_tile: int = 16):
    """Inputs where ``saturate_frac`` of ray TILES saturate in block 0
    (huge z steps -> alpha ~= 1 per sample)."""
    rng = np.random.default_rng(0)
    o8 = jnp.asarray(rng.normal(size=(batch, 8)), jnp.float32)
    d8 = jnp.asarray(rng.normal(size=(batch, 8)), jnp.float32)
    z = np.sort(rng.uniform(0.1, 1.5, (batch, S + 1)).astype(np.float32), 1)
    n_tiles = batch // ray_tile
    sat = rng.uniform(size=n_tiles) < saturate_frac
    # Saturating tiles: huge z steps -> alpha ~= 1 every sample.  Others:
    # microscopic steps -> alpha ~= 0 (the dummy-weight sigma is large
    # enough that unit-scale z already saturates everything).
    scale = np.where(np.repeat(sat, ray_tile), 400.0, 1e-4)[:, None]
    z = jnp.asarray(z * scale)
    tmvr = jnp.asarray(rng.uniform(0.1, 1.0, (batch * S, 8)), jnp.float32)
    extras = jnp.asarray(rng.normal(size=(batch, 128)), jnp.float32)
    return o8, d8, z, tmvr, extras


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["dispatch", "base", "notrig", "nobias", "norelu", "mlponly",
          "bigtile", "batch4x"])
