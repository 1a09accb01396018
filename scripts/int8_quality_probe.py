"""Semantic-quality probe for int8 quantization of the render MLP trunks.

The int8 roofline (scripts/int8_roofline.py) shows a static-scale int8
trunk chain runs 1.58x the bf16 chain on v5e.  The coarse stage's ONLY
output is the resampling weights (its rgb head is already skipped), so
quantization error there perturbs the fine stage's sample PLACEMENT, not
its values — this probe measures the resulting delta on the FINAL fine
outputs (rgb/depth/feat/pts) against the f32 XLA reference, on the trained
bench scene, next to the existing fused-bf16 noise floor.

Quantization simulated exactly (f32 HIGHEST matmuls of integer values are
exact below 2^24): weights per-OUTPUT-COLUMN symmetric int8; activations
static per-layer symmetric scales calibrated as the batch abs-max (the IPE
input is bounded in [-1, 1] -> fixed scale 1).

  python scripts/int8_quality_probe.py [--fine]   # --fine: also quantize
                                                  # the fine trunk (damage
                                                  # reference point)
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.nerf.sampling import sample_along_rays
from nerfmatch_tpu.nerf.compositing import volume_render, composite_features
from nerfmatch_tpu.nerf.embedding import ipe_embedding
from __graft_entry__ import _nerf_config

HI = jax.lax.Precision.HIGHEST


def trunk_layers(params, cfg, enc, quant=False, scales=None):
    """Trunk forward; returns (h_final, per-layer post-relu abs-max list).

    ``quant``: simulate int8 per-column weights + static act scales
    (``scales[i]`` = input act scale of layer i; layer 0 input is IPE,
    bounded [-1, 1] -> scale 1).
    """
    E = cfg.xyz_dim
    acts = []

    def fq_mm(x, s_x, w, lo=None):
        # Per-CHANNEL static act scales s_x (vector over in-dim), absorbed
        # into the weight before per-column weight quantization — free at
        # runtime (the requant multiply is a row broadcast either way).
        # ``lo``: static per-channel range minimum (zero-point centering:
        # relu outputs live in [0, a]; mapping [lo, hi] onto the full
        # signed range recovers the 8th bit; the zero-point correction is
        # a CONSTANT column offset that folds into the bias).
        if lo is None:
            lo = jnp.zeros_like(s_x)   # relu activations
        hi = s_x
        mid = (hi + lo) / 2.0
        half = jnp.maximum((hi - lo) / 2.0, 1e-9)
        w_eff = w * (half / 127.0)[:, None]
        sw = jnp.max(jnp.abs(w_eff), axis=0, keepdims=True) / 127.0 + 1e-12
        wq = jnp.round(w_eff / sw)
        xq = jnp.clip(jnp.round((x - mid) * (127.0 / half)), -127, 127)
        zp_corr = jnp.dot(mid[None, :], w, precision=HI)  # folds into bias
        return jnp.dot(xq, wq, precision=HI) * sw + zp_corr

    h = enc
    enc_scale = jnp.maximum(jnp.max(jnp.abs(enc), axis=0), 1e-6)
    for i in range(cfg.layer_num):
        w = params["pts_linears"][i]["weight"]
        b = params["pts_linears"][i]["bias"]
        if quant:
            if w.shape[0] == E + cfg.hid_dim:  # post-skip layer
                acc = fq_mm(h[..., :E], enc_scale, w[:E],
                            lo=-enc_scale) + fq_mm(
                    h[..., E:], scales[i - 1], w[E:])
            elif i == 0:
                acc = fq_mm(h, enc_scale, w, lo=-enc_scale)
            else:
                acc = fq_mm(h, scales[i - 1], w)
        else:
            acc = jnp.dot(h, w, precision=HI)
        h = jax.nn.relu(acc + b)
        acts.append(jnp.maximum(jnp.max(jnp.abs(h), axis=0), 1e-6))
        if i in cfg.skips:
            h = jnp.concatenate([enc, h], axis=-1)
    return h, acts


def coarse_weights(renderer, params, rays, quant=False, scales=None):
    cfg = renderer.coarse_cfg
    (mean, var), z_vals = sample_along_rays(
        rays, num_pts=cfg.num_pts, embed_type="mip", model_type="coarse",
        randomized=False, scale_var=renderer.cfg.mip_var_scale)
    enc = ipe_embedding(mean, var, renderer.cfg.xyz_num_freqs)[0]
    R, S = enc.shape[:2]
    h, acts = trunk_layers(params["nerf_coarse"], cfg,
                           enc.reshape(R * S, -1), quant, scales)
    sigma = (jnp.dot(h, params["nerf_coarse"]["alpha_linear"]["weight"],
                     precision=HI)
             + params["nerf_coarse"]["alpha_linear"]["bias"]).reshape(R, S)
    rf = jnp.concatenate(
        [jnp.zeros((R, S, 3)), sigma[..., None]], axis=-1)
    rendered = volume_render(rf, z_vals, rays[:, 3:6],
                             white_bg=renderer.cfg.white_bg, mip=True)
    return z_vals, rendered["weights"], acts


def fine_stage(renderer, params, rays, z_vals, weights,
               quant=False, scales=None):
    cfg = renderer.fine_cfg
    (mean, var), z_f = sample_along_rays(
        rays, num_pts=cfg.num_pts, z_vals=z_vals, weights=weights,
        embed_type="mip", model_type="fine", randomized=False,
        scale_var=renderer.cfg.mip_var_scale)
    if not quant:
        raw, feats = renderer._forward_nerf(
            params["nerf_fine"], cfg, mean, var, rays[:, 8:11], None, True)
    else:
        # quantized trunk + f32 heads (sigma/feature/views/rgb)
        enc = ipe_embedding(mean, var, renderer.cfg.xyz_num_freqs)[0]
        R, S = enc.shape[:2]
        h, _ = trunk_layers(params["nerf_fine"], cfg,
                            enc.reshape(R * S, -1), True, scales)
        p = params["nerf_fine"]
        sigma = jnp.dot(h, p["alpha_linear"]["weight"], precision=HI) \
            + p["alpha_linear"]["bias"]
        feature = jnp.dot(h, p["feature_linear"]["weight"], precision=HI) \
            + p["feature_linear"]["bias"]
        from nerfmatch_tpu.nerf.embedding import pe_embedding
        dirs_emb = pe_embedding(rays[:, 8:11], renderer.cfg.dirs_num_freqs)
        dirs_T = jnp.broadcast_to(dirs_emb[:, None, :],
                                  (R, S, dirs_emb.shape[-1])).reshape(R * S, -1)
        h_rgb = jnp.concatenate([feature, dirs_T], axis=-1)
        for lyr in p["views_linears"]:
            h_rgb = jax.nn.relu(jnp.dot(h_rgb, lyr["weight"], precision=HI)
                                + lyr["bias"])
        rgb = jax.nn.sigmoid(jnp.dot(h_rgb, p["rgb_linear"]["weight"],
                                     precision=HI) + p["rgb_linear"]["bias"])
        raw = jnp.concatenate([rgb, sigma], axis=-1).reshape(R, S, -1)
        # stop-layer feature tap: re-walk the quant trunk to layer 3
        stop = 3
        hh = enc.reshape(R * S, -1)
        enc_scale = jnp.maximum(jnp.max(jnp.abs(hh), axis=0), 1e-6)
        for i in range(stop + 1):
            w = p["pts_linears"][i]["weight"]
            s = enc_scale if i == 0 else scales[i - 1]
            w_eff = w * (s / 127.0)[:, None]
            sw = jnp.max(jnp.abs(w_eff), axis=0, keepdims=True) / 127.0 + 1e-12
            wq = jnp.round(w_eff / sw)
            xq = jnp.clip(jnp.round(hh * (127.0 / s)), -127, 127)
            hh = jax.nn.relu(jnp.dot(xq, wq, precision=HI) * sw
                             + p["pts_linears"][i]["bias"])
        feats = hh.reshape(R, S, -1)
    rendered = volume_render(raw[..., :4], z_f, rays[:, 3:6],
                             white_bg=renderer.cfg.white_bg, mip=True)
    w = rendered["weights"]
    return {
        "rgb": rendered["rgb"], "depth": rendered["depth"],
        "feat": composite_features(w, feats if feats.ndim == 3
                                   else feats.reshape(*w.shape, -1),
                                   renderer.cfg.feat_comb),
        "pts": composite_features(w, mean, renderer.cfg.feat_comb),
    }


def deltas(a, b):
    out = {}
    for k in a:
        d = np.abs(np.asarray(a[k]) - np.asarray(b[k]))
        ray_max = d.reshape(d.shape[0], -1).max(axis=1)
        out[k] = (float(d.max()), float(d.mean()),
                  int((ray_max > 1e-2).sum()))
    return out


def main():
    quant_fine = "--fine" in sys.argv
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    from scripts.train_bench_scene import camera_rays, load_params
    params = load_params(renderer)
    rays = jnp.asarray(camera_rays(0.13, h=96, w=96, focal=120.0))

    def _full(renderer, params, rays, q):
        # calibration pass (f32) for act scales
        _, _, acts_c = coarse_weights(renderer, params, rays)
        scales_c = [jnp.maximum(a, 1e-6) for a in acts_c]
        z, w, _ = coarse_weights(renderer, params, rays,
                                 quant=q, scales=scales_c)
        if quant_fine and q:
            zf, wf, _ = coarse_weights(renderer, params, rays)
            # calibrate fine scales with an f32 fine trunk pass
            cfgf = renderer.fine_cfg
            (mean, var), _zf2 = sample_along_rays(
                rays, num_pts=cfgf.num_pts, z_vals=zf, weights=wf,
                embed_type="mip", model_type="fine", randomized=False,
                scale_var=renderer.cfg.mip_var_scale)
            enc = ipe_embedding(mean, var, renderer.cfg.xyz_num_freqs)[0]
            R, S = enc.shape[:2]
            _, acts_fine = trunk_layers(params["nerf_fine"], cfgf,
                                        enc.reshape(R * S, -1))
            scales_f = [jnp.maximum(a, 1e-6) for a in acts_fine]
            return fine_stage(renderer, params, rays, z, w,
                              quant=True, scales=scales_f)
        return fine_stage(renderer, params, rays, z, w)

    ref = jax.jit(lambda: _full(renderer, params, rays, False))()
    ref = {k: np.asarray(v) for k, v in ref.items()}
    qnt = jax.jit(lambda: _full(renderer, params, rays, True))()
    qnt = {k: np.asarray(v) for k, v in qnt.items()}

    tag = "int8 coarse+fine" if quant_fine else "int8 coarse-only"
    print(f"== {tag} vs f32 XLA (trained bench scene, 9216 rays) ==")
    for k, (mx, mn, nt) in deltas(qnt, ref).items():
        print(f"  {k:6s}: max {mx:.3e}  mean {mn:.3e}  rays>1e-2 {nt}")

    # fused bf16 noise floor on the same rays (only on a real TPU backend)
    if jax.default_backend() not in ("cpu",):
        from nerfmatch_tpu.ops.pallas.render_kernel import (
            make_fused_hierarchical)
        render, pack = make_fused_hierarchical(renderer)
        wc, wfp = pack(params)
        fused = jax.jit(lambda r: render(wc, wfp, r))(rays)
        fused_m = {"rgb": fused["rgb_fine"], "depth": fused["depth_fine"],
                   "feat": fused["feat_fine"], "pts": fused["pts_fine"]}
        fused_m = {k: np.asarray(v) for k, v in fused_m.items()}
        print("== fused bf16 kernel vs f32 XLA (existing noise floor) ==")
        for k, (mx, mn, nt) in deltas(fused_m, ref).items():
            print(f"  {k:6s}: max {mx:.3e}  mean {mn:.3e}  rays>1e-2 {nt}")


if __name__ == "__main__":
    main()
