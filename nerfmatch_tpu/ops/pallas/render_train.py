"""Fused mip-NeRF TRAIN kernel: forward + custom-VJP backward.

Training spends its time in the same cast->IPE->MLP->composite loop as eval
(see :mod:`.render_kernel`) plus its backward.  This module provides a
``jax.custom_vjp`` render producing exactly what the NeRF loss consumes —
``rgb_map`` and the per-sample ``weights`` (distortion regularizer / fine
resampling) — with a hand-written Pallas backward that:

* recomputes all activations in-VMEM (nothing is stashed between fwd/bwd);
* backpropagates the compositing chain analytically, including the
  exclusive-cumsum transmittance (whose backward is *another* triangular
  matmul: ``g_logt = g_csum @ L``);
* accumulates weight gradients across grid steps in VMEM-resident output
  blocks (zero-initialized at grid step 0);
* returns zero cotangents for the ray/z/noise inputs (data, not params).

Density noise (``noise_std``, reference ``render_utils.py:188-194``) enters
as a per-sample additive input computed in XLA, so the randomized training
semantics are preserved.  Gradients are validated against ``jax.grad`` of
the XLA reference path in interpret mode (tests/test_pallas_train.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import FusedRenderSpec, make_spread_matrices, _pad_axis, \
    _fast_sin, _fast_exp, eval_feat_layer

_F32_EPS = float(np.finfo(np.float32).eps)


def pack_mlp_weights_traced(params, spec: FusedRenderSpec):
    """Differentiable (jnp-only) variant of ``pack_mlp_weights`` so the
    packing step sits inside the training graph and grads flow back to the
    original param pytree via autodiff of pad/cast/reshape."""
    enc = 2 * 3 * spec.num_freqs
    hid = spec.hid_dim
    w = {}
    pts = params["pts_linears"]
    w["w0"] = _pad_axis(pts[0]["weight"], 128, 0).astype(jnp.bfloat16)
    w["b0"] = pts[0]["bias"]
    for i in range(1, spec.layer_num):
        wi = pts[i]["weight"]
        if wi.shape[0] == hid + enc:
            w[f"w{i}s"] = _pad_axis(wi[:enc], 128, 0).astype(jnp.bfloat16)
            w[f"w{i}"] = wi[enc:].astype(jnp.bfloat16)
        else:
            w[f"w{i}"] = wi.astype(jnp.bfloat16)
        w[f"b{i}"] = pts[i]["bias"]
    w["wa"] = params["alpha_linear"]["weight"].reshape(-1)
    w["ba"] = params["alpha_linear"]["bias"].reshape(1, 1)
    w["wf"] = params["feature_linear"]["weight"].astype(jnp.bfloat16)
    w["bf"] = params["feature_linear"]["bias"]
    wv = params["views_linears"][0]["weight"]
    w["wvh"] = wv[: hid].astype(jnp.bfloat16)
    w["wvx"] = _pad_axis(wv[hid:], spec.extra_dim, 0).astype(jnp.bfloat16)
    w["bv"] = params["views_linears"][0]["bias"]
    w["wrgb"] = _pad_axis(params["rgb_linear"]["weight"], 128, 1).astype(jnp.bfloat16)
    w["brgb"] = _pad_axis(params["rgb_linear"]["bias"], 128, 0)
    return w


def make_fused_train_render(spec: FusedRenderSpec, interpret: bool = False,
                            extras_grad: bool = False):
    """Build the fused TRAIN forward with a custom Pallas VJP.

    Default: ``fused_train(weights, o8, d8, z_vals, extras, noise)``.
    ``spec.from_rays``: ``fused_train(weights, rays (N, 12), z_vals, noise)``
    — ray spreads, viewdir-PE extras and the Gaussian moments are derived
    in-kernel (z stays an input: training uses jittered fenceposts).
    Returns (rgb (N, 3), weights (N, S)).

    ``extras_grad`` (classic mode only): the backward additionally emits the
    cotangent of the per-ray ``extras`` input, so appearance-embedding rows
    riding in ``extras`` (reference ``renderer.py:104-107``) receive
    gradients — XLA autodiff then routes them through the concat + table
    gather back to ``params["embedding_a"]``.
    """
    assert not (extras_grad and spec.from_rays), \
        "extras_grad requires the classic input mode (extras is an input)"
    # The train kernel has no z-blocked schedule; a blocked spec (mirroring
    # the eval kernel's sample_blocks) would die with a cryptic KeyError
    # deep in tracing instead of here.
    assert spec.sample_blocks == 1, \
        "fused TRAIN kernel is unblocked; use sample_blocks=1"
    from .render_kernel import make_ray_matrices

    S = spec.samples
    R = spec.ray_tile
    hid = spec.hid_dim
    T = R * S
    L = spec.layer_num
    Sp, Sq, phase = make_spread_matrices(spec)
    tri_T = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1).T  # logt @ tri_T = csum
    tri = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1)      # g_csum @ tri = g_logt
    xyz_mask = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    consts = {"_phase": phase, "_triT": tri_T, "_tri": tri}
    if spec.from_rays:
        consts.update(make_ray_matrices(spec))
    else:
        consts.update({"_Sp": Sp, "_Sq": Sq, "_xyz": xyz_mask})

    weight_keys = ["w0", "b0"] + sum(
        [[f"w{i}", f"b{i}"] for i in range(1, L)], []) + \
        [f"w{i}s" for i in range(1, L) if (i - 1) in spec.skips] + \
        ["wa", "ba", "wf", "bf", "wvh", "wvx", "bv", "wrgb", "brgb"]

    # ------------------------------------------------------------------
    # Shared forward recompute (returns intermediates needed by bwd)
    # ------------------------------------------------------------------

    def _forward_core(wr, z, noise):
        """Inputs via ``wr``: either (o8, d8, extras, _tmvr) [classic] or
        (rays) [from_rays — everything derived in-kernel]."""
        t0, t1 = z[:, :-1], z[:, 1:]
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        denom = jnp.maximum(_F32_EPS, 3.0 * mu**2 + hw**2)
        t_mean = mu + (2.0 * mu * hw**2) / denom

        def rmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        E = wr["_E"]
        if spec.from_rays:
            rays = wr["rays"]
            oS = rmm(rays, wr["_SpO"])
            dS = rmm(rays, wr["_SpV"])
            dQ = rmm(rays * rays, wr["_SqV"])
            E_oS = rmm(E, oS)
            E_dS = rmm(E, dS)
            E_dQ = rmm(E, dQ)
            E_nQ = wr["_sqrow"] - E_dQ           # E one-hot: E@sqrow = sqrow
            r2_T = rmm(E, rays[:, 11:12] ** 2)
            z_all = rmm(E, z)
            t0c = jnp.sum(z_all * wr["_M0"], axis=-1, keepdims=True)
            t1c = jnp.sum(z_all * wr["_M1"], axis=-1, keepdims=True)
            mu_c = (t0c + t1c) / 2.0
            hw_c = (t1c - t0c) / 2.0
            den_c = jnp.maximum(_F32_EPS, 3.0 * mu_c**2 + hw_c**2)
            t_col = mu_c + (2.0 * mu_c * hw_c**2) / den_c
            tv_col = hw_c**2 / 3.0 - (4.0 / 15.0) * (
                hw_c**4 * (12.0 * mu_c**2 - hw_c**2)) / den_c**2
            rv_col = r2_T * (mu_c**2 / 4.0 + (5.0 / 12.0) * hw_c**2
                             - (4.0 / 15.0) * hw_c**4 / den_c)
            if spec.var_scale != 1.0:  # mip_var_scale
                tv_col = spec.var_scale * tv_col
                rv_col = spec.var_scale * rv_col
            extras = (_fast_sin(rmm(rays, wr["_Pd"]) + wr["_phd"])
                      * wr["_trg"] + rmm(rays, wr["_SelRaw"]))
        else:
            xyz = wr["_xyz"]
            o8, d8, extras = wr["o8"], wr["d8"], wr["extras"]
            oS = rmm(o8 * xyz, wr["_Sp"])
            dS = rmm(d8, wr["_Sp"])
            d_sq = d8 * d8
            dQ = rmm(d_sq, wr["_Sq"])
            nQ = rmm(xyz - d_sq, wr["_Sq"])
            E_oS = rmm(E, oS)
            E_dS = rmm(E, dS)
            E_dQ = rmm(E, dQ)
            E_nQ = rmm(E, nQ)
            t_col = wr["_tmvr"][:, 0:1]
            tv_col = wr["_tmvr"][:, 1:2]
            rv_col = wr["_tmvr"][:, 2:3]

        pre = E_oS + t_col * E_dS + wr["_phase"]
        vs = tv_col * E_dQ + rv_col * E_nQ
        # _fast_sin/_fast_exp: bf16-accurate polynomials (render_kernel.py) —
        # safe here because the backward never differentiates the encode
        # (weight grads only; xb is rematerialized with the same polys).
        xb = (_fast_exp(-0.5 * vs) * _fast_sin(pre)).astype(jnp.bfloat16)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        # Residual activations are stored bf16: the backward only needs them
        # as relu masks and as (already bf16-cast) matmul operands, and f32
        # copies blow the VMEM budget.
        hs = []
        h = jax.nn.relu(mm(xb, wr["w0"]) + wr["b0"])
        hs.append(h.astype(jnp.bfloat16))
        for i in range(1, L):
            acc_h = mm(h, wr[f"w{i}"])
            if f"w{i}s" in wr:
                acc_h = acc_h + mm(xb, wr[f"w{i}s"])
            h = jax.nn.relu(acc_h + wr[f"b{i}"])
            hs.append(h.astype(jnp.bfloat16))

        feature = (mm(h, wr["wf"]) + wr["bf"]).astype(jnp.bfloat16)
        sigma_raw = jnp.sum(h.reshape(R, S, hid)
                            * wr["wa"][None, None, :], axis=-1) \
            + wr["ba"][0, 0] + noise
        hv_t = mm(feature, wr["wvh"])
        xt = jnp.dot(extras.astype(jnp.bfloat16), wr["wvx"],
                     preferred_element_type=jnp.float32)
        hv = jax.nn.relu(hv_t.reshape(R, S, -1) + xt[:, None, :]
                         + wr["bv"]).astype(jnp.bfloat16)
        rgb_t = mm(hv.reshape(T, -1), wr["wrgb"]) + wr["brgb"]
        rgb = jax.nn.sigmoid(rgb_t)  # (T, 128)

        dists = t1 - t0
        sigma = jax.nn.relu(sigma_raw)
        alpha = 1.0 - jnp.exp(-sigma * dists)
        log_t = jnp.log(1.0 - alpha + 1e-10)
        csum = jnp.dot(log_t, wr["_triT"], preferred_element_type=jnp.float32)
        weights = alpha * jnp.exp(csum)
        return dict(xb=xb, hs=hs, feature=feature, sigma_raw=sigma_raw,
                    hv=hv, rgb=rgb, dists=dists, sigma=sigma, alpha=alpha,
                    csum=csum, weights=weights, t_mean=t_mean, extras=extras)

    # ------------------------------------------------------------------
    # Forward kernel
    # ------------------------------------------------------------------

    data_names = (["rays", "z", "noise", "_E"] if spec.from_rays else
                  ["o8", "d8", "z", "extras", "noise", "_tmvr", "_E"])

    def fwd_kernel(*refs):
        names = data_names + weight_keys + list(consts.keys())
        n_in = len(names)
        wr = {k: refs[i][...] for i, k in enumerate(names)}
        rgb_ref, w_ref = refs[n_in:]
        f = _forward_core(wr, wr["z"], wr["noise"])
        rgb3 = f["rgb"].reshape(R, S, -1)
        rgb_map = jnp.sum(f["weights"][:, :, None] * rgb3, axis=1)
        if spec.white_bg:
            rgb_map = rgb_map + (1.0 - jnp.sum(f["weights"], axis=-1,
                                               keepdims=True))
        rgb_ref[...] = rgb_map
        w_ref[...] = f["weights"]

    # ------------------------------------------------------------------
    # Backward kernel
    # ------------------------------------------------------------------

    def bwd_kernel(*refs):
        names = data_names + ["g_rgb", "g_w"] + weight_keys + \
            list(consts.keys())
        n_in = len(names)
        wr = {k: refs[i][...] for i, k in enumerate(names)}
        grad_refs = dict(zip(weight_keys, refs[n_in:]))
        g_ext_ref = refs[n_in + len(weight_keys)] if extras_grad else None
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            for k in weight_keys:
                grad_refs[k][...] = jnp.zeros_like(grad_refs[k])

        f = _forward_core(wr, wr["z"], wr["noise"])
        g_rgb = wr["g_rgb"]            # (R, 128) cols 0:3 live
        g_w_in = wr["g_w"]             # (R, S)
        weights = f["weights"]
        rgb3 = f["rgb"].reshape(R, S, -1)

        # ---- composite backward ----
        g_w = g_w_in + jnp.sum(g_rgb[:, None, :] * rgb3, axis=-1)   # (R,S)
        if spec.white_bg:
            g_w = g_w - jnp.sum(g_rgb[:, :3] * 1.0, axis=-1, keepdims=True)
        g_rgb_s = g_rgb[:, None, :] * weights[:, :, None]           # (R,S,128)

        g_alpha = g_w * jnp.exp(f["csum"])
        g_csum = g_w * weights
        g_logt = jnp.dot(g_csum, wr["_tri"], preferred_element_type=jnp.float32)
        g_alpha = g_alpha - g_logt / (1.0 - f["alpha"] + 1e-10)
        g_sigma = g_alpha * (1.0 - f["alpha"]) * f["dists"]
        g_sigma_raw = jnp.where(f["sigma_raw"] > 0, g_sigma, 0.0)   # (R,S)

        def mmT(a, b):  # a (T,X) f32, b bf16/f32 -> f32
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        def ctr(a, b):
            """a^T @ b without materializing the transpose: contract rows
            via dot_general (Mosaic-friendly; .T on big operands relayouts)."""
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- rgb head backward ----
        g_rgb_t = (g_rgb_s * rgb3 * (1.0 - rgb3)).reshape(T, -1)    # (T,128)
        hvf = f["hv"].reshape(T, -1)
        grad_refs["wrgb"][...] += ctr(hvf, g_rgb_t)
        grad_refs["brgb"][...] += jnp.sum(g_rgb_t, axis=0)
        g_hv = jax.lax.dot_general(
            g_rgb_t.astype(jnp.bfloat16), wr["wrgb"].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (T, hv)
        g_hv = jnp.where(hvf.astype(jnp.float32) > 0,
                         g_hv[:, : hvf.shape[1]], 0.0)
        g_hv = g_hv.astype(jnp.float32)
        g_hv3 = g_hv.reshape(R, S, -1)
        grad_refs["bv"][...] += jnp.sum(g_hv3, axis=(0, 1))
        grad_refs["wvx"][...] += ctr(f["extras"], jnp.sum(g_hv3, axis=1))
        if extras_grad:
            # d loss / d extras: extras enters once per ray via
            # xt = extras @ wvx broadcast over samples.  Both stages are
            # matmuls: the per-sample cotangent times wvx^T, then the
            # per-ray sample-sum as E^T @ . (reduce outputs written to or
            # consumed by matmuls trip a Mosaic relayout error on v5e).
            g_ext_full = jnp.dot(
                g_hv.astype(jnp.bfloat16),
                wr["wvx"].astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)          # (T, extra)
            g_ext_ref[...] = ctr(wr["_E"], g_ext_full)       # (R, extra)
        g_feature = jax.lax.dot_general(
            g_hv.astype(jnp.bfloat16), wr["wvh"].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (T, hid)
        grad_refs["wvh"][...] += ctr(f["feature"], g_hv)

        # ---- feature / sigma heads into the trunk ----
        grad_refs["wf"][...] += ctr(f["hs"][L - 1], g_feature)
        grad_refs["bf"][...] += jnp.sum(g_feature, axis=0)
        g_h = jax.lax.dot_general(
            g_feature.astype(jnp.bfloat16), wr["wf"].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (T, hid)
        g_h = g_h + (g_sigma_raw[:, :, None]
                     * wr["wa"][None, None, :]).reshape(T, hid)
        grad_refs["wa"][...] += jnp.sum(
            f["hs"][L - 1].reshape(R, S, hid) * g_sigma_raw[:, :, None],
            axis=(0, 1))
        grad_refs["ba"][...] += jnp.sum(g_sigma_raw).reshape(1, 1)

        # ---- trunk backward ----
        for i in range(L - 1, 0, -1):
            g_pre = jnp.where(f["hs"][i].astype(jnp.float32) > 0,
                              g_h, 0.0)                             # (T, hid)
            grad_refs[f"b{i}"][...] += jnp.sum(g_pre, axis=0)
            grad_refs[f"w{i}"][...] += ctr(f["hs"][i - 1], g_pre)
            if f"w{i}s" in wr:
                grad_refs[f"w{i}s"][...] += ctr(f["xb"], g_pre)
            g_h = jax.lax.dot_general(
                g_pre.astype(jnp.bfloat16), wr[f"w{i}"].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        g_pre0 = jnp.where(f["hs"][0].astype(jnp.float32) > 0, g_h, 0.0)
        grad_refs["b0"][...] += jnp.sum(g_pre0, axis=0)
        grad_refs["w0"][...] += ctr(f["xb"], g_pre0)

    # ------------------------------------------------------------------
    # pallas_call plumbing
    # ------------------------------------------------------------------

    def _tmvr(o8, z_vals):
        from .render_kernel import frustum_moments_tmvr
        return frustum_moments_tmvr(z_vals, o8[:, 3:4], spec.var_scale)

    expand = jnp.asarray(np.repeat(np.eye(R, dtype=np.float32), S, axis=0))

    def _specs(weights, with_grads):
        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        if spec.from_rays:
            base = [
                pl.BlockSpec((R, 12), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                const_spec(expand),
            ]
        else:
            base = [
                pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, spec.extra_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                const_spec(expand),
            ]
        if with_grads:
            base += [
                pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ]
        base += [const_spec(weights[k]) for k in weight_keys]
        base += [const_spec(consts[k]) for k in consts]
        return base

    def _operands(data):
        if spec.from_rays:
            rays, z_vals, noise = data
            return [rays, z_vals, noise, expand]
        o8, d8, z_vals, extras, noise = data
        return [o8, d8, z_vals, extras, noise, _tmvr(o8, z_vals), expand]

    def _fwd_impl(weights, *data):
        N = data[1].shape[0] if spec.from_rays else data[2].shape[0]
        assert N % R == 0, f"ray count {N} % tile {R} != 0"
        grid = (N // R,)
        out_specs = [
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, S), jnp.float32),
        ]
        rgb_p, w = pl.pallas_call(
            fwd_kernel, grid=grid, in_specs=_specs(weights, False),
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*_operands(data),
          *[weights[k] for k in weight_keys], *[consts[k] for k in consts])
        return rgb_p[:, :3], w

    def _bwd_impl(weights, data, g_rgb3, g_w):
        N = data[1].shape[0] if spec.from_rays else data[2].shape[0]
        assert N % R == 0, f"ray count {N} % tile {R} != 0"
        grid = (N // R,)
        g_rgb = _pad_axis(g_rgb3, 128, 1)

        def acc_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        out_specs = [acc_spec(jnp.zeros(weights[k].shape, jnp.float32))
                     for k in weight_keys]
        out_shape = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
                     for k in weight_keys]
        if extras_grad:
            # Per-ray extras cotangent: written per grid step, not
            # accumulated across steps like the weight grads.
            out_specs.append(pl.BlockSpec((R, spec.extra_dim),
                                          lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((N, spec.extra_dim), jnp.float32))
        # The backward's residual+grad working set sits within ~1 MB of the
        # default 16 MB scoped-vmem limit (XLA scheduling can tip it over);
        # raise the limit — v5e has 128 MB of physical VMEM.
        grads = pl.pallas_call(
            bwd_kernel, grid=grid, in_specs=_specs(weights, True),
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*_operands(data), g_rgb, g_w,
          *[weights[k] for k in weight_keys], *[consts[k] for k in consts])
        g = {k: v.astype(weights[k].dtype) for k, v in zip(weight_keys, grads)}
        g_extras = grads[len(weight_keys)] if extras_grad else None
        return g, g_extras

    @jax.custom_vjp
    def fused_train(weights, *data):
        return _fwd_impl(weights, *data)

    def fwd(weights, *data):
        return _fwd_impl(weights, *data), (weights, data)

    def bwd(res, cot):
        weights, data = res
        g_rgb3, g_w = cot
        g_weights, g_extras = _bwd_impl(weights, data, g_rgb3, g_w)
        g_data = [jnp.zeros_like(x) for x in data]
        if extras_grad:
            g_data[3] = g_extras  # (o8, d8, z, EXTRAS, noise)
        return (g_weights, *g_data)

    fused_train.defvjp(fwd, bwd)
    return fused_train


def make_fused_train_hierarchical(renderer, interpret: bool = False,
                                  ray_tile: int = 8):
    """Fused two-stage TRAINING forward (randomized sampling + density noise
    in XLA, MLP+composite in the custom-VJP kernel).

    Returns ``train_render(params, rays, key) -> dict(rgb_coarse, rgb_fine,
    weights_fine, s_fine)`` mirroring the training outputs of
    ``NerfRenderer.render_rays(train=True)``.
    """
    from ...nerf.compositing import t_to_s
    from .resample_kernel import resample_z_pallas

    cfg = renderer.cfg
    fine_cfg = renderer.fine_cfg
    S = fine_cfg.num_pts
    # Classic input mode: the from_rays variant derives moments/extras
    # in-kernel but measures ~4 ms/step SLOWER in training (the moment
    # recompute runs in both the forward and the backward's remat, while
    # the XLA-staged tmvr is computed once per program) — kept available
    # via spec.from_rays and parity-tested, not used here.
    spec = FusedRenderSpec(
        num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
        layer_num=fine_cfg.layer_num, skips=tuple(fine_cfg.skips),
        samples=S, ray_tile=ray_tile,
        feat_layer=eval_feat_layer(fine_cfg), white_bg=cfg.white_bg,
        var_scale=(cfg.mip_var_scale if cfg.mip_var_scale > 0 else 1.0))
    # One spec drives BOTH stages: the coarse model must share the MLP
    # layout (the train kernel's weight list is spec-static, unlike the
    # eval kernel's packed-dict-driven names).
    ccfg = fine_cfg if cfg.single_model else renderer.coarse_cfg
    assert (ccfg.hid_dim, ccfg.layer_num, tuple(ccfg.skips)) == \
        (fine_cfg.hid_dim, fine_cfg.layer_num, tuple(fine_cfg.skips)), \
        "fused train requires coarse/fine NeRFs with identical MLP layouts"
    use_app = bool(cfg.appearance_embedding)
    assert renderer.dirs_emb_dim + 16 * use_app <= spec.extra_dim
    fused = make_fused_train_render(spec, interpret=interpret,
                                    extras_grad=use_app)
    coarse_key = "nerf_fine" if cfg.single_model else "nerf_coarse"

    def train_render(params, rays, key, ray_id=None):
        from ...nerf.embedding import pe_embedding
        from .render_kernel import prepare_ray_inputs, reparam_unit_dir
        # Unit-direction reparameterization: exact for non-unit rays_d
        # configs (norm_ray_dir=False), identity for the default.
        rays, _ = reparam_unit_dir(rays)
        near, far = rays[:, 6:7], rays[:, 7:8]
        o8, d8 = prepare_ray_inputs(rays)
        dirs_pe = pe_embedding(rays[:, 8:11], cfg.dirs_num_freqs)
        if use_app:
            # Per-ray appearance rows ride in extras after the viewdir PE
            # (views-branch weight rows are [dirs | app], model.py:145);
            # extras_grad on the kernel feeds the table via this gather.
            if ray_id is None:
                ray_id = jnp.ones((rays.shape[0],), jnp.int32)
            app_emb = params["embedding_a"]["weight"][ray_id]
            extras = _pad_axis(
                jnp.concatenate([dirs_pe, app_emb], axis=-1),
                spec.extra_dim, 1)
        else:
            extras = _pad_axis(dirs_pe, spec.extra_dim, 1)
        N = rays.shape[0]

        k_strat, k_res, k_n1, k_n2 = jax.random.split(key, 4)
        # Stratified fenceposts, jittered when cfg.perturb (reference
        # randomized training scheme; perturb=0 must stay deterministic).
        t = jnp.linspace(0.0, 1.0, S + 1)
        z = near * (1.0 - t) + far * t
        if cfg.perturb:
            mids = 0.5 * (z[:, 1:] + z[:, :-1])
            upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
            lower = jnp.concatenate([z[:, :1], mids], axis=-1)
            z = lower + (upper - lower) * jax.random.uniform(k_strat,
                                                             (N, S + 1))

        noise_c = (jax.random.normal(k_n1, (N, S)) * cfg.noise_std
                   if cfg.noise_std > 0 else jnp.zeros((N, S)))
        noise_f = (jax.random.normal(k_n2, (N, S)) * cfg.noise_std
                   if cfg.noise_std > 0 else jnp.zeros((N, S)))

        wc = pack_mlp_weights_traced(params[coarse_key], spec)
        rgb_c, weights_c = fused(wc, o8, d8, z, extras, noise_c)

        z_f = resample_z_pallas(
            z, jax.lax.stop_gradient(weights_c),
            randomized=bool(cfg.perturb), key=k_res, interpret=interpret)
        wf = pack_mlp_weights_traced(params["nerf_fine"], spec)
        rgb_f, weights_f = fused(wf, o8, d8, z_f, extras, noise_f)

        s_fine = t_to_s(z_f, jnp.min(z_f), jnp.max(z_f))
        return {"rgb_coarse": rgb_c, "rgb_fine": rgb_f,
                "weights_fine": weights_f, "s_fine": s_fine}

    return train_render
