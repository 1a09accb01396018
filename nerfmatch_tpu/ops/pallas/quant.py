"""Static int8 quantization of the fused render trunk (opt-in serving mode).

The v5e MXU executes int8 x int8 -> int32 at 2x the bf16 MAC rate; a
static-scale int8 version of the render MLP chain measures 5.05 ms vs
7.96 ms bf16 (scripts/int8_roofline.py).  The scheme keeps ALL quantization
overhead off the hot path:

* weights: per-OUTPUT-COLUMN symmetric int8, with the (static, per-channel)
  input-activation scales pre-absorbed into the weight before quantization
  (the SmoothQuant-style fold) — dequantization is ONE (1, hid) f32 row
  broadcast per layer;
* activations: one multiply + round + clip + int8 cast per layer against a
  static per-channel requant row; no reductions on the hot path (dynamic
  per-row abs-max quantization measures SLOWER than bf16: 8.93 ms);
* scales are calibrated ONCE per scene from per-channel activation abs-max
  over a calibration ray batch (:func:`calibrate_act_scales`);
* the sigma/rgb heads and everything downstream stay bf16/f32 — only the
  8-layer trunk (85-90% of the MACs) quantizes;
* ``spec.trunk_int8_from > 0`` ("posttap" serving mode) keeps layers below
  it in the bf16 packing and enters the q-domain with one boundary requant
  row (``qh``): the fine stage's per-sample descriptor taps stay exact-bf16
  and int8 error reaches the composited feat/pts only through the
  compositing weights (measured mean descriptor drift vs the "coarse"
  render: 4.6e-5, 12x below full-fine-trunk "both").

Measured semantic quality on the trained bench scene
(scripts/int8_bench_probe.py, 9216 rays, vs the f32 XLA reference):
coarse-trunk-only mean rgb delta 1.2e-3 (existing fused-bf16 noise floor
7.9e-4; 241 vs ~134 rays off by >1e-2), both-stage 3.4e-3.  Above the bf16
noise floor, therefore an OPT-IN serving mode (``trunk_int8`` on
``make_fused_hierarchical``), never the benchmark default.  End-to-end
the production-shape render is VPU/schedule-bound, so the chain win does
not move the bench number (409.9k vs 398.1k rays/s); the mode pays only
where the MLP chain dominates (wider/deeper trunks).

Reference parity note: the reference has no quantized path (torch fp32,
``renderer.py:153-173``); this is net-new TPU capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .render_kernel import FusedRenderSpec, _pad_axis

_EPS = 1e-6


def _colq(w_eff):
    """Per-output-column symmetric int8 quantization of an (in, out) f32
    matrix; returns (int8 weight, (1, out) f32 dequant row)."""
    sw = jnp.max(jnp.abs(w_eff), axis=0, keepdims=True) / 127.0 + 1e-12
    return jnp.round(w_eff / sw).astype(jnp.int8), sw


def pack_mlp_weights_int8(params, spec: FusedRenderSpec, scales):
    """NeRF MLP params -> fused-kernel weights with an int8 trunk.

    ``scales``: {"enc": (enc_dim,) per-channel IPE abs-max,
    "acts": [(hid,)] * (layer_num - 1) per-channel post-relu abs-max}
    from :func:`calibrate_act_scales`.  Heads keep the bf16 packing.
    jnp-only (traceable), mirroring ``pack_mlp_weights_traced``.
    """
    from .render_train import pack_mlp_weights_traced

    w = pack_mlp_weights_traced(params, spec)
    enc = 2 * 3 * spec.num_freqs
    hid = spec.hid_dim
    pts = params["pts_linears"]

    enc_s = jnp.maximum(jnp.asarray(scales["enc"], jnp.float32), _EPS)
    assert enc_s.shape == (enc,), enc_s.shape
    # Padded IPE lanes are exactly 0 in-kernel; scale 1 keeps qenc finite.
    enc_s128 = jnp.concatenate(
        [enc_s, jnp.ones((128 - enc,), jnp.float32)])
    acts = [jnp.maximum(jnp.asarray(a, jnp.float32), _EPS)
            for a in scales["acts"]]
    assert len(acts) >= spec.layer_num - 1

    # The trunk runs in the QUANTIZED domain: layer i's epilogue produces
    # the next layer's int8 input directly — y = acc * (s_i * q_i) +
    # (b_i * q_i + 0.5), int8 = sat_cast(clip(max(y, 0.5), -127, 127)) —
    # where q_i = 127 / act_scale_i is the NEXT quantization and the +0.5
    # turns the truncating f32->int8 cast into round-to-nearest for the
    # non-negative relu outputs (max(y, 0.5) IS the relu: real h < 0 <=>
    # y < 0.5).  One fused scale row per layer instead of separate
    # dequant + requant passes; layers whose real-unit activations are
    # read (feat tap, final layer) additionally carry the plain dequant
    # row ``s{i}``.
    L = spec.layer_num
    q_rows = [(127.0 / a)[None, :] for a in acts]      # requant rows
    iq_rows = [(a / 127.0)[None, :] for a in acts]     # inverse (real units)
    last = L - 1
    tap = spec.feat_layer if spec.ret_feat else None
    start = spec.trunk_int8_from  # posttap: layers < start keep the bf16
    assert 0 <= start <= last, (start, L)  # packing (and their b{i} rows)

    def trunk_w(i):
        """Quantize layer i's weight; returns {suffix: (int8 w, deq row)}."""
        wi = pts[i]["weight"]
        a_in = enc_s if i == 0 else acts[i - 1]
        out = {}
        if wi.shape[0] == hid + enc:  # post-skip layer: [enc | hid] rows
            qs, sws = _colq(wi[:enc] * (enc_s / 127.0)[:, None])
            out["s"] = (_pad_axis(qs, 128, 0), sws)
            q, sw = _colq(wi[enc:] * (acts[i - 1] / 127.0)[:, None])
        else:
            q, sw = _colq(wi * (a_in / 127.0)[:, None])
            if i == 0:
                q = _pad_axis(q, 128, 0)
        out[""] = (q, sw)
        return out

    w["qenc"] = (127.0 / enc_s128)[None, :]
    if start > 0:
        # posttap boundary: one requant row turns the bf16 prefix's
        # real-unit activation into the first int8 layer's input.
        w["qh"] = q_rows[start - 1]
        assert tap is None or tap < start, (tap, start)
    for i in range(start, L):
        for suf, (q, sw) in trunk_w(i).items():
            w[f"w{i}{suf}q"] = q
            if i == last:
                w[f"s{i}{suf}"] = sw   # real units: y = acc*s (+b, relu)
            else:
                w[f"c{i}{suf}"] = sw * q_rows[i]   # q-domain fused scale
        if i < last:
            # q-domain bias: b*q + 0.5 turns the truncating f32->int8 cast
            # into round-to-nearest for the (non-negative) relu outputs.
            w[f"B{i}"] = pts[i]["bias"][None, :] * q_rows[i] + 0.5
            del w[f"b{i}"]  # the real-unit bias is dead in the q-domain
        if tap is not None and tap == i and i < last:
            w[f"iq{i}"] = iq_rows[i]   # real-unit recovery for the tap
        if i == 0:
            del w["w0"]
        else:
            del w[f"w{i}"]
            w.pop(f"w{i}s", None)
    return w


def calibrate_act_scales(renderer, params, rays):
    """Per-channel activation abs-max for both trunks on a calibration
    ray batch, via the (deterministic) XLA eval path.

    Returns ``{"coarse": {"enc": (E,), "acts": [(hid,) ...]},
    "fine": {...}}`` as concrete f32 arrays.  The fine-stage calibration
    samples with the f32 coarse weights, so the scales describe exactly
    the activation ranges the quantized pipeline encounters (up to the
    quantization perturbation itself).
    """
    from ..pallas.render_kernel import reparam_unit_dir
    from ...nerf.sampling import sample_along_rays
    from ...nerf.embedding import ipe_embedding
    from ...nerf.compositing import volume_render

    cfg = renderer.cfg

    def trunk_acts(p, mcfg, enc2d):
        h = enc2d
        acts = []
        for i in range(mcfg.layer_num):
            h = jax.nn.relu(
                jnp.dot(h, p["pts_linears"][i]["weight"],
                        precision=jax.lax.Precision.HIGHEST)
                + p["pts_linears"][i]["bias"])
            acts.append(jnp.maximum(jnp.max(jnp.abs(h), axis=0), _EPS))
            if i in mcfg.skips:
                h = jnp.concatenate([enc2d, h], axis=-1)
        sigma = (jnp.dot(h, p["alpha_linear"]["weight"],
                         precision=jax.lax.Precision.HIGHEST)
                 + p["alpha_linear"]["bias"])
        return acts, sigma

    @jax.jit
    def run(rays):
        out = {}
        coarse_key = "nerf_fine" if cfg.single_model else "nerf_coarse"
        ccfg = renderer.coarse_cfg or renderer.fine_cfg
        (mean, var), z_vals = sample_along_rays(
            rays, num_pts=ccfg.num_pts, embed_type="mip",
            model_type="coarse", randomized=False,
            scale_var=cfg.mip_var_scale)
        enc = ipe_embedding(mean, var, cfg.xyz_num_freqs)[0]
        R, S = enc.shape[:2]
        acts, sigma = trunk_acts(params[coarse_key], ccfg,
                                 enc.reshape(R * S, -1))
        out["coarse"] = {
            "enc": jnp.maximum(jnp.max(jnp.abs(enc.reshape(R * S, -1)),
                                       axis=0), _EPS),
            "acts": acts,
        }
        rf = jnp.concatenate(
            [jnp.zeros((R, S, 3)), sigma.reshape(R, S, 1)], axis=-1)
        weights = volume_render(rf, z_vals, rays[:, 3:6],
                                white_bg=cfg.white_bg, mip=True)["weights"]
        (mean_f, var_f), _ = sample_along_rays(
            rays, num_pts=renderer.fine_cfg.num_pts, z_vals=z_vals,
            weights=weights, embed_type="mip", model_type="fine",
            randomized=False, scale_var=cfg.mip_var_scale)
        enc_f = ipe_embedding(mean_f, var_f, cfg.xyz_num_freqs)[0]
        acts_f, _ = trunk_acts(params["nerf_fine"], renderer.fine_cfg,
                               enc_f.reshape(R * S, -1))
        out["fine"] = {
            "enc": jnp.maximum(jnp.max(jnp.abs(enc_f.reshape(R * S, -1)),
                                       axis=0), _EPS),
            "acts": acts_f,
        }
        return out

    # The fused kernels march the unit-dir reparameterization; calibrate
    # in the same parameterization so near/far (hence IPE ranges) match.
    rays = reparam_unit_dir(jnp.asarray(rays))[0]
    return jax.tree_util.tree_map(jnp.asarray, run(rays))
