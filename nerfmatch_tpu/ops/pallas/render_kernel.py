"""Fused mip-NeRF render kernel: IPE encode -> 8x256 MLP -> alpha composite.

The reference's hot loop (``renderer.py:153-173`` chunked MLP eval +
``render_utils.py:176-230`` compositing) as ONE Pallas kernel per ray tile.
TPU-shaped design decisions:

* inputs are the raw sample Gaussians, padded to (T, 8) — ~16x less HBM
  traffic than materializing the 90-dim encode (and 75x less than the f32
  activations the XLA path streams between fused ops);
* the integrated positional encoding is computed in-kernel as
  ``exp(-0.5 var @ Sq) * sin(mean @ Sp + phase)`` where Sp/Sq are constant
  (8, 128) "spread" matrices replicating each coordinate across frequencies —
  pure MXU + VPU, no lane-crossing reshapes;
* the MLP trunk runs in bf16 on the MXU with all weights resident in VMEM
  across grid steps; activations never touch HBM;
* compositing happens in-kernel: the exclusive transmittance cumprod is a
  log-space cumsum done as a strictly-lower-triangular ones matmul
  (lane-axis scans are slow on TPU; a 128x128 matmul is one MXU pass);
* only per-ray outputs (rgb, depth, acc, per-sample weights for the
  hierarchical resample, composited feature/points) are written back.

Layout contract: sample count S == 128 (the production config) so (T, C) ->
(T/S, S, C) reshapes are free (lane dim preserved).  The pure-XLA path
(`NerfRenderer.render_rays`) remains the semantic reference; tests diff the
kernel against it (CPU interpret mode + on-device).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class FusedRenderSpec:
    num_freqs: int = 15          # IPE frequencies (enc dim = 2*3*F = 90)
    hid_dim: int = 256
    layer_num: int = 8
    skips: tuple = (4,)
    extra_dim: int = 128         # per-ray extras (dirs PE [+ app]) padded
    samples: int = 128
    ray_tile: int = 16
    feat_layer: int = 3          # stop-layer feature tap
    white_bg: bool = False


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def make_spread_matrices(spec: FusedRenderSpec):
    """(Sp, Sq, phase): mean3 @ Sp (+phase) and var3 @ Sq produce the
    freq-major IPE pre-activation layout [sin-block 3F | cos-block 3F] pad 128.
    Column j < 3F maps to scales[j//3] * coord[j%3]; cos block repeats with
    +pi/2 phase; Sq uses scales^2 duplicated for both blocks."""
    F = spec.num_freqs
    enc = 2 * 3 * F
    Sp = np.zeros((8, 128), np.float32)
    Sq = np.zeros((8, 128), np.float32)
    phase = np.zeros((128,), np.float32)
    for j in range(3 * F):
        c, f = j % 3, j // 3
        Sp[c, j] = 2.0**f
        Sp[c, j + 3 * F] = 2.0**f
        Sq[c, j] = 4.0**f
        Sq[c, j + 3 * F] = 4.0**f
        phase[j + 3 * F] = np.pi / 2
    # Mask column vector: 1 for real enc dims, 0 for padding.
    mask = np.zeros((128,), np.float32)
    mask[:enc] = 1.0
    return (jnp.asarray(Sp), jnp.asarray(Sq), jnp.asarray(phase),
            jnp.asarray(mask))


def pack_mlp_weights(params, spec: FusedRenderSpec, extra_dim_real: int):
    """NeRF MLP params -> padded bf16 kernel weights.

    First-layer rows (and skip-layer encode rows) follow the in-kernel
    encode layout: identical to :func:`ipe_embedding`'s freq-major
    [sines | cosines] ordering, zero-padded to 128.
    """
    enc = 2 * 3 * spec.num_freqs
    hid = spec.hid_dim
    w = {}
    pts = params["pts_linears"]
    w["w0"] = _pad_axis(pts[0]["weight"], 128, 0).astype(jnp.bfloat16)
    w["b0"] = np.asarray(pts[0]["bias"], np.float32)
    for i in range(1, spec.layer_num):
        wi = np.asarray(pts[i]["weight"])
        if wi.shape[0] == hid + enc:
            w[f"w{i}s"] = _pad_axis(jnp.asarray(wi[:enc]), 128, 0).astype(jnp.bfloat16)
            w[f"w{i}"] = jnp.asarray(wi[enc:]).astype(jnp.bfloat16)
        else:
            w[f"w{i}"] = jnp.asarray(wi).astype(jnp.bfloat16)
        w[f"b{i}"] = np.asarray(pts[i]["bias"], np.float32)

    w["wa"] = jnp.asarray(params["alpha_linear"]["weight"]).reshape(-1).astype(jnp.float32)
    w["ba"] = float(np.asarray(params["alpha_linear"]["bias"])[0])
    w["wf"] = jnp.asarray(params["feature_linear"]["weight"]).astype(jnp.bfloat16)
    w["bf"] = np.asarray(params["feature_linear"]["bias"], np.float32)
    wv = np.asarray(params["views_linears"][0]["weight"])
    w["wvh"] = jnp.asarray(wv[:hid]).astype(jnp.bfloat16)
    w["wvx"] = _pad_axis(jnp.asarray(wv[hid:]), spec.extra_dim, 0).astype(jnp.bfloat16)
    w["bv"] = np.asarray(params["views_linears"][0]["bias"], np.float32)
    w["wrgb"] = _pad_axis(params["rgb_linear"]["weight"], 128, 1).astype(jnp.bfloat16)
    w["brgb"] = _pad_axis(np.asarray(params["rgb_linear"]["bias"], np.float32), 128, 0)
    assert extra_dim_real <= spec.extra_dim
    w["ba"] = jnp.asarray([[w["ba"]]], jnp.float32)
    return {k: jnp.asarray(v) for k, v in w.items()}


def make_fused_render(spec: FusedRenderSpec, interpret: bool = False):
    """Build the fused render callable.

    fused(weights, mean8 (N*S, 8), var8 (N*S, 8), z_vals (N, S+1),
          extras (N, extra_dim)) ->
      dict(rgb (N, 3), depth (N,), acc (N,), weights (N, S),
           feat (N, hid), pts (N, 3)).
    """
    S = spec.samples
    R = spec.ray_tile
    hid = spec.hid_dim
    T = R * S
    Sp, Sq, phase, enc_mask = make_spread_matrices(spec)
    # Exclusive prefix sum as a matmul: csum[r, s] = sum_{k<s} log_t[r, k]
    # == (log_t @ L^T)[r, s] with L strictly lower triangular.
    tri_excl = jnp.tril(jnp.ones((S, S), jnp.float32), k=-1).T
    consts = {"_Sp": Sp, "_Sq": Sq, "_phase": phase, "_mask": enc_mask,
              "_tri": tri_excl}

    weight_names: list = []

    def kernel(*refs):
        n_in = 4 + len(weight_names)
        mean_ref, var_ref, z_ref, extras_ref = refs[:4]
        wrefs = dict(zip(weight_names, refs[4:n_in]))
        rgb_ref, depth_ref, acc_ref, w_out_ref, feat_ref, pts_ref = refs[n_in:]

        mean8 = mean_ref[...]                     # (T, 8)
        var8 = var_ref[...]

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        pre = jnp.dot(mean8, wrefs["_Sp"][...],
                      preferred_element_type=jnp.float32) + wrefs["_phase"][...]
        damp = jnp.exp(-0.5 * jnp.dot(var8, wrefs["_Sq"][...],
                                      preferred_element_type=jnp.float32))
        x = (damp * jnp.sin(pre)) * wrefs["_mask"][...]  # (T, 128) f32
        xb = x.astype(jnp.bfloat16)

        h = jax.nn.relu(mm(xb, wrefs["w0"][...]) + wrefs["b0"][...])
        feat_tap = h
        for i in range(1, spec.layer_num):
            acc_h = mm(h, wrefs[f"w{i}"][...])
            if f"w{i}s" in wrefs:
                acc_h = acc_h + mm(xb, wrefs[f"w{i}s"][...])
            h = jax.nn.relu(acc_h + wrefs[f"b{i}"][...])
            if i == spec.feat_layer:
                feat_tap = h

        # Heads.
        feature = mm(h, wrefs["wf"][...]) + wrefs["bf"][...]     # (T, hid)
        h_tap3 = h.reshape(R, S, hid)            # free: lane dim preserved
        # Density head as an elementwise mul + lane reduce (rank-1 weight).
        sigma_raw = jnp.sum(h_tap3 * wrefs["wa"][...][None, None, :],
                            axis=-1) + wrefs["ba"][0, 0]          # (R, S)

        # View branch in flat (T, C) space: Mosaic only lowers rank-2 dots,
        # and (T, C) <-> (R, S, C) reshapes are free (lane dim preserved).
        extras = extras_ref[...]                 # (R, E)
        hv_t = mm(feature, wrefs["wvh"][...])    # (T, hid//2 pad)
        hv = jax.nn.relu(
            hv_t.reshape(R, S, -1)
            + jnp.dot(extras.astype(jnp.bfloat16), wrefs["wvx"][...],
                      preferred_element_type=jnp.float32)[:, None, :]
            + wrefs["bv"][...])
        rgb_t = mm(hv.reshape(T, -1), wrefs["wrgb"][...]) + wrefs["brgb"][...]
        rgb = jax.nn.sigmoid(rgb_t).reshape(R, S, -1)  # cols 0:3 real

        # Compositing.
        z = z_ref[...]                           # (R, S+1)
        dists = z[:, 1:] - z[:, :-1]
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        sigma = jax.nn.relu(sigma_raw)
        alpha = 1.0 - jnp.exp(-sigma * dists)
        log_t = jnp.log(1.0 - alpha + 1e-10)
        csum = jnp.dot(log_t, wrefs["_tri"][...],
                       preferred_element_type=jnp.float32)
        weights = alpha * jnp.exp(csum)          # (R, S)

        rgb_map = jnp.sum(weights[:, :, None] * rgb, axis=1)
        depth = jnp.sum(weights * z_mid, axis=-1, keepdims=True)
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        if spec.white_bg:
            rgb_map = rgb_map + (1.0 - acc)

        feat3 = feat_tap.reshape(R, S, hid)
        feat_map = jnp.sum(weights[:, :, None] * feat3, axis=1)
        # Composited sample positions from the raw means (cols 0:3 of mean8).
        mean3 = mean8.reshape(R, S, 8)
        pts_map = jnp.sum(weights[:, :, None] * mean3, axis=1)

        rgb_ref[...] = rgb_map                   # (R, 128); cols 0:3 real
        depth_ref[...] = depth
        acc_ref[...] = acc
        w_out_ref[...] = weights
        feat_ref[...] = feat_map
        pts_ref[...] = pts_map                   # (R, 8); cols 0:3 real

    def fused(weights_packed: dict, mean8, var8, z_vals, extras):
        weights_packed = {**weights_packed, **consts}
        weight_names.clear()
        weight_names.extend(sorted(weights_packed.keys()))
        N = z_vals.shape[0]
        assert N % R == 0, f"ray count {N} % tile {R} != 0"
        assert mean8.shape == (N * S, 8)
        grid = (N // R,)

        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, spec.extra_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(weights_packed[k]) for k in weight_names]
        out_specs = [
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, hid), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, S), jnp.float32),
            jax.ShapeDtypeStruct((N, hid), jnp.float32),
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
        ]
        outs = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(mean8, var8, z_vals, extras,
          *[weights_packed[k] for k in weight_names])
        rgb_p, depth, acc, w, feat, pts_p = outs
        return dict(rgb=rgb_p[:, :3], depth=depth[:, 0], acc=acc[:, 0],
                    weights=w, feat=feat, pts=pts_p[:, :3])

    return fused


def prepare_fused_inputs(mean, var, viewdirs_pe, app=None):
    """(N, S, 3) gaussians + (N, Ddir) encoded dirs -> kernel input layout."""
    N, S, _ = mean.shape
    mean8 = _pad_axis(mean.reshape(N * S, 3), 8, 1)
    var8 = _pad_axis(var.reshape(N * S, 3), 8, 1)
    extras = viewdirs_pe if app is None else jnp.concatenate(
        [viewdirs_pe, app], axis=-1)
    return mean8, var8, extras


def make_fused_hierarchical(renderer, interpret: bool = False,
                            ray_tile: int = 16):
    """Fused two-stage (coarse->resample->fine) eval render.

    Mirrors ``NerfRenderer.render_rays(train=False, ret_pfeat=True,
    validation=True)`` with both MLP+composite stages in the fused kernel and
    the mip Gaussian (re)sampling in XLA.  Returns
    ``render(params_coarse_packed, params_fine_packed, rays) -> preds`` plus a
    ``pack(params)`` helper.
    """
    from ...nerf.sampling import sample_gaussians_along_rays, \
        resample_gaussians_along_rays
    from ...nerf.embedding import pe_embedding

    cfg = renderer.cfg
    fine_cfg = renderer.fine_cfg
    S = fine_cfg.num_pts
    spec = FusedRenderSpec(
        num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
        layer_num=fine_cfg.layer_num, samples=S, ray_tile=ray_tile,
        feat_layer=fine_cfg.stop_layer if fine_cfg.stop_layer >= 0 else 3,
        white_bg=cfg.white_bg)
    fused = make_fused_render(spec, interpret=interpret)

    def pack(params):
        coarse_key = "nerf_fine" if cfg.single_model else "nerf_coarse"
        return (pack_mlp_weights(params[coarse_key], spec,
                                 extra_dim_real=renderer.dirs_emb_dim),
                pack_mlp_weights(params["nerf_fine"], spec,
                                 extra_dim_real=renderer.dirs_emb_dim))

    def render(w_coarse, w_fine, rays):
        o, d = rays[:, :3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        radii = rays[:, 11:12]
        viewdirs = rays[:, 8:11]
        dirs_pe = pe_embedding(viewdirs, cfg.dirs_num_freqs)
        extras = _pad_axis(dirs_pe, spec.extra_dim, 1)

        z_vals, (mean, var) = sample_gaussians_along_rays(
            o, d, radii, S, near, far, randomized=False)
        m8, v8, _ = prepare_fused_inputs(mean, var, dirs_pe)
        coarse = fused(w_coarse, m8, v8, z_vals, extras)

        z_vals_f, (mean_f, var_f) = resample_gaussians_along_rays(
            o, d, radii, z_vals, coarse["weights"], randomized=False)
        m8f, v8f, _ = prepare_fused_inputs(mean_f, var_f, dirs_pe)
        fine = fused(w_fine, m8f, v8f, z_vals_f, extras)

        return {
            "rgb_coarse": coarse["rgb"], "depth_coarse": coarse["depth"],
            "rgb_fine": fine["rgb"], "depth_fine": fine["depth"],
            "acc_fine": fine["acc"], "feat_fine": fine["feat"],
            "pts_fine": fine["pts"], "weights_fine": fine["weights"],
        }

    return render, pack
