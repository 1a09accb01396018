"""Fused mip-NeRF render kernel: Gaussian cast -> IPE -> 8x256 MLP -> composite.

The reference's hot loop (``renderer.py:153-173`` chunked MLP eval +
``render_utils.py:176-230`` compositing) plus the conical-frustum Gaussian
cast (``render_utils.py:326-402``) as ONE Pallas kernel per ray tile.
TPU-shaped design decisions:

* the only per-sample HBM input is ``z_vals`` (N, S+1); rays enter as packed
  (N, 12) rows (``from_rays`` mode — viewdir-PE extras and the per-sample
  Gaussian moments are derived in-kernel via periodic one-hot lane masks
  over the E-expanded fenceposts).  The Gaussian cast and the integrated
  positional encoding are fused via the linearity of the spread transform:
  ``mean @ Sp = o @ Sp + t_mean * (d @ Sp)`` and
  ``var @ Sq = t_var * (d^2 @ Sq) + r_var * ((1 - d^2) @ Sq)``
  — so the kernel computes per-ray row vectors with a handful of (12, 128)
  matmuls and broadcasts them over samples; the (N, S, 3) mean/cov tensors
  of the XLA path (lane-hostile 3-wide layouts) never exist;
* the MLP trunk runs in bf16 on the MXU with all weights resident in VMEM
  across grid steps; activations never touch HBM;
* compositing happens in-kernel: the exclusive transmittance cumprod is a
  log-space cumsum executed as one strictly-lower-triangular matmul
  (lane-axis scans are slow on TPU); composited points come from
  ``o * acc + d * sum(w * t_mean)``;
* only per-ray outputs (rgb, depth, acc, per-sample weights for the
  hierarchical resample, composited feature/points) are written back.

Layout contract: sample count S == 128 (the production config) so (T, C) <->
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

_F32_EPS = float(np.finfo(np.float32).eps)

# Odd minimax polynomial for sin(2*pi*r), r in [-0.5, 0.5] (|err| < 1.8e-5 —
# far below the bf16 cast that immediately follows).  The VPU's builtin sine
# costs ~2.7 ms per 9216x128-sample stage (~16% of the kernel); the
# range-reduce + 4-FMA polynomial is nearly free next to the matmuls.
_SIN_C = (6.283088463027395, -41.33324754221887, 81.40008976706686,
          -74.67588386951022, 33.16809461334938)
_INV_2PI = 1.0 / (2.0 * np.pi)


def _fast_sin(x):
    """sin(x) for f32 x via cycle range reduction + odd poly (bf16-accurate)."""
    r = x * _INV_2PI
    r = r - jnp.round(r)
    r2 = r * r
    c1, c3, c5, c7, c9 = _SIN_C
    return r * (c1 + r2 * (c3 + r2 * (c5 + r2 * (c7 + r2 * c9))))


# Degree-4 minimax polynomial for 2^r on [-0.5, 0.5] (|rel err| < 9e-6 —
# below the bf16 cast that follows).  The VPU builtin exp costs ~2.5 ms per
# 9216x128-sample stage; exponent assembly by integer bitcast + 4 FMAs is
# nearly free next to the matmuls.
_EXP2_C = (0.9999992877392923, 0.6931227314278201, 0.24024740182319385,
           0.05591115485298019, 0.009567840713994339)
_LOG2E = float(np.log2(np.e))


def _fast_exp(x):
    """exp(x) for x <= 0 via exp2 split: 2^k * poly(r), k=round(x*log2e)."""
    y = jnp.maximum(x * _LOG2E, -126.0)
    k = jnp.round(y)
    r = y - k
    c0, c1, c2, c3, c4 = _EXP2_C
    p = c0 + r * (c1 + r * (c2 + r * (c3 + r * c4)))
    scale = jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32)
    return scale * p


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
    ret_feat: bool = True        # emit composited feat/pts (fine stage only
                                 # consumes them; the coarse pass skips the
                                 # (R, S, hid) weighted reductions + outputs)
    ret_rgb: bool = True         # emit rgb (skipping it drops the whole
                                 # feature->views->rgb head chain — the eval
                                 # coarse pass only feeds weights to the
                                 # resampler, ~18% of its MACs)
    from_rays: bool = False      # take packed (N, 12) rays + z and derive
                                 # o/d spreads, viewdir PE extras and the
                                 # Gaussian moments IN-kernel (no XLA prep,
                                 # no (N*S, 8) tmvr HBM staging)
    dirs_freqs: int = 4          # viewdir PE freqs (from_rays mode)
    app_dim: int = 0             # appearance-embedding dim (from_rays mode)
    sample_blocks: int = 1       # process the sample axis in z-ordered
                                 # blocks (from_rays only); >1 alone is a
                                 # scheduling win (~5% on v5e), and enables:
    early_term_eps: float = 0.0  # >0: once EVERY ray in the tile has
                                 # transmittance < eps, remaining blocks'
                                 # trunk is skipped under a data-dependent
                                 # pl.when (skipped samples' true weights
                                 # are < eps; outputs get exact zeros).
    var_scale: float = 1.0       # mip_var_scale: scales the Gaussian
                                 # t/r variances post-cast (reference
                                 # render_utils.py:311 `scale_var * var`);
                                 # folded into the moment-extraction
                                 # constants at trace time — zero runtime
                                 # cost.
    feat_max: bool = False       # feat_comb='max': composite feat/pts by
                                 # taking the argmax-weight (surface)
                                 # sample instead of the weighted sum
                                 # (reference renderer.py:257-260).
                                 # First-occurrence argmax, matching
                                 # jnp.argmax; blocked schedule carries
                                 # the running best across sample blocks.
    trunk_int8: bool = False     # OPT-IN serving mode: run the MLP trunk
                                 # as int8 x int8 -> int32 MXU dots (2x
                                 # bf16 MACs/cycle on v5e) with static
                                 # per-channel activation scales absorbed
                                 # into per-column weight quantization
                                 # (ops/pallas/quant.py).  Measured
                                 # quality (scripts/int8_quality_probe.py,
                                 # trained bench scene): coarse-only mean
                                 # rgb delta 1.2e-3 vs f32 (bf16 floor
                                 # 7.9e-4); both-stage 3.9e-3 — above the
                                 # bf16 noise floor, hence NOT the
                                 # benchmark default.  Heads stay bf16/f32.
    trunk_int8_from: int = 0     # first trunk layer run int8 (earlier
                                 # layers stay bf16).  0 = whole trunk.
                                 # The fine stage's "posttap" serving mode
                                 # sets feat_layer+1: per-sample descriptor
                                 # taps come out of the exact bf16 prefix
                                 # and only the sigma/rgb suffix quantizes,
                                 # so int8 error reaches feat/pts solely
                                 # through the compositing weights — one
                                 # drift channel instead of "both"'s two.
    ablate: str = ""             # DIAGNOSTIC ONLY (scripts/stage_probe.py):
                                 # comma-joined pieces to stub out of the
                                 # blocked body so their cost can be timed
                                 # in the PRODUCTION kernel (outputs become
                                 # meaningless).  Pieces: "ipe" (sin/exp ->
                                 # multiply), "moments" (constant t/tv/rv
                                 # cols), "requant" (int8 epilogue -> plain
                                 # relu-less cast), "composite" (skip the
                                 # weights/feat/rgb accumulation epilogue),
                                 # "split2" (exact dots -> plain bf16).
                                 # Empty (default) = the real kernel.


def _split2cat(x, axis):
    """Split-2 operand prep: concat([hi, lo], axis) with hi = bf16-rounded
    x and lo the residual.  Paired with a K-doubled exact partner matrix
    ([E | E], [[Sp], [Sp]], [[tri], [tri]], ...), a single DEFAULT
    (one-bf16-pass) matmul then computes E @ hi + E @ lo — f32-accurate
    (measured 7.5e-6 max relative vs 3.8e-3 for a plain DEFAULT pass on a
    (1024, 32) @ (32, 128) expansion) at zero extra MXU cost, because the
    doubled contraction (K 32 -> 64 or 12 -> 24) still fits one 128-wide
    MXU pass.  Requires the partner matrix to be exactly
    bf16-representable (one-hots, 0/1 triangles, power-of-two spreads).
    Mosaic's only alternatives: DEFAULT (4e-3 relative — visible phase
    noise at mid IPE frequencies) or HIGHEST (6-pass, measured +3.8 ms
    per 9216-ray batch over these dots)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, x - hi], axis=axis)


def _mm_f32x2(a, b, split_b=False):
    """One-MXU-pass f32-accurate dot against a K-doubled exact partner.

    ``split_b=False``: ``a`` is the inexact operand (hi/lo split in-kernel
    via ``_split2cat``); ``b`` must be the PRE-DOUBLED partner ``[[P], [P]]``
    (the ``*2``-suffixed consts).  ``split_b=True``: ``b`` is inexact and
    ``a`` must be the pre-doubled partner ``[P | P]`` (``_E2``).  Partners
    are doubled at trace time rather than concatenated in-kernel so Mosaic
    never has to relayout a concat feeding an MXU operand."""
    if split_b:
        return jnp.dot(a, _split2cat(b, 0),
                       preferred_element_type=jnp.float32)
    return jnp.dot(_split2cat(a, 1), b, preferred_element_type=jnp.float32)


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def make_spread_matrices(spec: FusedRenderSpec):
    """(Sp, Sq, phase): coordinate-spread matrices producing the freq-major
    IPE pre-activation layout [sin-block 3F | cos-block 3F] padded to 128.
    Column j < 3F maps to ``scales[j//3] * coord[j%3]``; the cos block repeats
    with +pi/2 phase; Sq uses scales^2."""
    F = spec.num_freqs
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
    return jnp.asarray(Sp), jnp.asarray(Sq), jnp.asarray(phase)


def pack_mlp_weights(params, spec: FusedRenderSpec, extra_dim_real: int):
    """NeRF MLP params -> padded bf16 kernel weights (layout matches the
    in-kernel encode: freq-major [sines | cosines] zero-padded to 128)."""
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

    w["wa"] = jnp.asarray(params["alpha_linear"]["weight"]).reshape(-1)
    w["ba"] = jnp.asarray(
        [[float(np.asarray(params["alpha_linear"]["bias"])[0])]], jnp.float32)
    w["wf"] = jnp.asarray(params["feature_linear"]["weight"]).astype(jnp.bfloat16)
    w["bf"] = np.asarray(params["feature_linear"]["bias"], np.float32)
    wv = np.asarray(params["views_linears"][0]["weight"])
    w["wvh"] = jnp.asarray(wv[:hid]).astype(jnp.bfloat16)
    w["wvx"] = _pad_axis(jnp.asarray(wv[hid:]), spec.extra_dim, 0).astype(jnp.bfloat16)
    w["bv"] = np.asarray(params["views_linears"][0]["bias"], np.float32)
    w["wrgb"] = _pad_axis(params["rgb_linear"]["weight"], 128, 1).astype(jnp.bfloat16)
    w["brgb"] = _pad_axis(np.asarray(params["rgb_linear"]["bias"], np.float32), 128, 0)
    assert extra_dim_real <= spec.extra_dim
    return {k: jnp.asarray(v) for k, v in w.items()}


def make_ray_matrices(spec: FusedRenderSpec):
    """Constants for ``from_rays`` mode: selector/spread matrices mapping the
    packed 12-dim ray rows [o(3) d(3) near far viewdir(3) radius] straight to
    kernel operands, the viewdir-PE encode (matching ``pe_embedding``:
    [sin 3Fd | cos 3Fd | d | app]), and the periodic one-hot masks that pull
    per-sample z fenceposts out of the E-expanded (T, S+1) layout."""
    F = spec.num_freqs
    Fd = spec.dirs_freqs
    S = spec.samples
    T = spec.ray_tile * S
    SpO = np.zeros((12, 128), np.float32)
    SpV = np.zeros((12, 128), np.float32)
    SqV = np.zeros((12, 128), np.float32)
    for j in range(3 * F):
        c, f = j % 3, j // 3
        SpO[c, j] = SpO[c, j + 3 * F] = 2.0**f
        SpV[8 + c, j] = SpV[8 + c, j + 3 * F] = 2.0**f
        SqV[8 + c, j] = SqV[8 + c, j + 3 * F] = 4.0**f
    sqrow = SqV.sum(axis=0, keepdims=True)    # == xyz @ Sq (E-invariant)
    Pd = np.zeros((12, 128), np.float32)
    phase_d = np.zeros((1, 128), np.float32)
    trig = np.zeros((1, 128), np.float32)
    SelRaw = np.zeros((12, 128), np.float32)
    for j in range(3 * Fd):
        c, f = j % 3, j // 3
        Pd[8 + c, j] = Pd[8 + c, j + 3 * Fd] = 2.0**f
        phase_d[0, j + 3 * Fd] = np.pi / 2
        trig[0, j] = trig[0, j + 3 * Fd] = 1.0
    for c in range(3):
        SelRaw[8 + c, 2 * 3 * Fd + c] = 1.0
    SelO8 = np.zeros((12, 8), np.float32)
    SelV8 = np.zeros((12, 8), np.float32)
    for c in range(3):
        SelO8[c, c] = 1.0
        SelV8[8 + c, c] = 1.0
    # Block-sized fencepost masks: with sample_blocks == 1 this is the
    # original (T, S+1) layout; blocked kernels pull each block's z slice
    # through the same masks at (Tb, Sb+1).
    Sb = S // spec.sample_blocks
    Tb = spec.ray_tile * Sb
    M0 = np.zeros((Tb, Sb + 1), np.float32)
    M1 = np.zeros((Tb, Sb + 1), np.float32)
    for t in range(Tb):
        M0[t, t % Sb] = 1.0
        M1[t, t % Sb + 1] = 1.0
    # Moment-extraction masks (blocked path): the Gaussian cone moments
    # (t_mean | t_var | r_var) are computed at the cheap (R, Sb) layout
    # (a (R, Sb) op touches R*Sb/1024 vregs vs Tb/8 for ANY (Tb, 1)- or
    # (Tb, 128)-shaped op — Mosaic lays (Tb, 1) as one lane of a full
    # vreg row, so narrow columns cost full-width), packed to (R, 3*Sb),
    # E-expanded by one matmul, and pulled into (Tb, 1) columns with one
    # masked lane-reduce per moment.
    Mt = np.zeros((Tb, 3 * Sb), np.float32)
    Mv = np.zeros((Tb, 3 * Sb), np.float32)
    Mr = np.zeros((Tb, 3 * Sb), np.float32)
    for t in range(Tb):
        Mt[t, t % Sb] = 1.0
        # var_scale (mip_var_scale) folds into the variance lane masks —
        # they apply as a VPU elementwise product AFTER the split-2 matmul,
        # so any f32 scale is exact here.
        Mv[t, Sb + t % Sb] = spec.var_scale
        Mr[t, 2 * Sb + t % Sb] = spec.var_scale
    j = jnp.asarray
    out = {"_SpO": j(SpO), "_SpV": j(SpV), "_SqV": j(SqV), "_sqrow": j(sqrow),
           "_Pd": j(Pd), "_phd": j(phase_d), "_trg": j(trig),
           "_SelRaw": j(SelRaw), "_SelO8": j(SelO8), "_SelV8": j(SelV8)}
    # Ship each layout's masks only to the kernel that reads them: _M0/_M1
    # drive the unblocked (and train) fencepost pulls; _Mt/_Mv/_Mr the
    # blocked moment extraction.  At SB=1 the unused trio would be
    # 3 x (T, 3*S) f32 of dead VMEM operands DMA'd every grid step.
    if spec.sample_blocks > 1:
        out.update({"_Mt": j(Mt), "_Mv": j(Mv), "_Mr": j(Mr)})
    else:
        out.update({"_M0": j(M0), "_M1": j(M1)})
    if spec.sample_blocks > 1:
        # K-doubled exact partners for the split-2 dots (_mm_f32x2): the
        # inexact operand is hi/lo split in-kernel; its partner is doubled
        # HERE so Mosaic never concats an MXU operand.  All of these are
        # exactly bf16-representable (one-hots / power-of-two spreads).
        dbl = lambda M: j(np.concatenate([M, M], axis=0))
        out.update({"_SpO2": dbl(SpO), "_SpV2": dbl(SpV), "_Pd2": dbl(Pd),
                    "_SelRaw2": dbl(SelRaw), "_SelO82": dbl(SelO8),
                    "_SelV82": dbl(SelV8)})
    if spec.app_dim:
        SelApp = np.zeros((spec.app_dim, 128), np.float32)
        off = 2 * 3 * Fd + 3
        for i in range(spec.app_dim):
            SelApp[i, off + i] = 1.0
        out["_SelApp"] = j(SelApp)
        if spec.sample_blocks > 1:
            out["_SelApp2"] = j(np.concatenate([SelApp, SelApp], axis=0))
    return out


def make_fused_render(spec: FusedRenderSpec, interpret: bool = False):
    """Build the fused render callable.

    Default mode:
      fused(weights, o8 (N, 8) [o(3) | radius | pad], d8 (N, 8) [unit d(3)],
            z_vals (N, S+1), extras (N, extra_dim))
    ``from_rays`` mode (everything derived in-kernel; no XLA prep):
      fused(weights, rays (N, 12), z_vals (N, S+1)[, app (N, app_dim)])
    Both return dict(rgb (N, 3), depth (N,), acc (N,), weights (N, S),
    feat (N, hid), pts (N, 3)) filtered by ret_rgb/ret_feat.
    """
    S = spec.samples
    R = spec.ray_tile
    hid = spec.hid_dim
    T = R * S
    SB = spec.sample_blocks
    assert S % SB == 0, f"samples {S} % sample_blocks {SB} != 0"
    assert SB == 1 or spec.from_rays, \
        "sample_blocks > 1 is implemented for from_rays mode only"
    assert not spec.trunk_int8 or (spec.from_rays and SB > 1), \
        "trunk_int8 is implemented for the blocked from_rays path only"
    Sb = S // SB
    Tb = R * Sb
    Sp, Sq, phase = make_spread_matrices(spec)
    # Exclusive prefix sum as a matmul: csum[r, s] = sum_{k<s} log_t[r, k]
    # == (log_t @ L^T)[r, s] with L strictly lower triangular.  Block-sized:
    # later blocks add the carried log-transmittance of earlier blocks.
    tri_excl = jnp.tril(jnp.ones((Sb, Sb), jnp.float32), k=-1).T
    xyz_mask = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    # Ray->sample expansion: E[t, r] = 1 iff t // Sb == r.  Expanding per-ray
    # row vectors to T-major via matmul sidesteps Mosaic's unsupported
    # lane<->sublane relayouts ((R,S)[:, :, None]-style broadcasts).
    expand = (np.repeat(np.eye(R, dtype=np.float32), Sb, axis=0))
    consts = {"_phase": phase, "_tri": tri_excl, "_E": jnp.asarray(expand)}
    if SB > 1:
        # K-doubled exact partners for the split-2 dots (_mm_f32x2).
        consts["_E2"] = jnp.asarray(np.concatenate([expand, expand], axis=1))
        consts["_tri2"] = jnp.concatenate([tri_excl, tri_excl], axis=0)
    if spec.from_rays:
        consts.update(make_ray_matrices(spec))
        n_fixed = 2 + (1 if spec.app_dim else 0)
    else:
        consts.update({"_Sp": Sp, "_Sq": Sq, "_xyz": xyz_mask})
        n_fixed = 5

    weight_names: list = []

    # Blocked-path scratch: [0] logt carry (col 0 exact, col 1 the cheap
    # early-term bound), [1] ONE feat accumulator when ret_feat: tw (lin)
    # or the max/t_best carry (feat_max) — mutually exclusive; then the
    # deferred-composite double buffers: sigma (cols 2*Sb), pre-sigmoid
    # rgb_t (Tb, 16) when ret_rgb, feat_tap (Tb, 2*hid) when ret_feat.
    if SB > 1:
        assert 2 * Sb <= 128, f"deferred sigma buffer needs 2*Sb <= 128 ({Sb})"
        _scratch_shapes = [("logt", (R, 128), jnp.float32)]
        if spec.ret_feat:
            _scratch_shapes.append(("twmx", (R, 128), jnp.float32))
        _scratch_shapes.append(("sig", (R, 128), jnp.float32))
        if spec.ret_rgb:
            _scratch_shapes.append(("rgbt", (T // SB, 16), jnp.float32))
        if spec.ret_feat:
            _scratch_shapes.append(("feat", (T // SB, 2 * hid), jnp.float32))
    else:
        _scratch_shapes = []
    n_scratch = len(_scratch_shapes)

    def blocked_body(wrefs, refs, rgb_ref, depth_ref, acc_ref, w_out_ref,
                     feat_ref, pts_ref, scratch_refs):
        """Sample-blocked from_rays stage: z-ordered blocks of Sb samples
        with a carried log-transmittance; with ``early_term_eps`` the trunk
        of fully-saturated blocks is skipped under a data-dependent
        ``pl.when`` (their true weights are < eps; exact zeros are written).
        The out refs double as cross-block accumulators."""
        scr = dict(zip((nm for nm, _, _ in _scratch_shapes), scratch_refs))
        logt_scr = scr["logt"]
        tw_scr = scr["twmx"] if (spec.ret_feat
                                 and not spec.feat_max) else None
        # feat_max carry: col 0 = running max weight, col 1 = its t_mean.
        mx_scr = scr["twmx"] if (spec.ret_feat and spec.feat_max) else None
        sig_scr = scr["sig"]
        rgbt_scr = scr.get("rgbt")
        feat_scr = scr.get("feat")

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        abl = set(filter(None, spec.ablate.split(",")))
        if "split2" in abl:
            # diagnostic: plain one-pass bf16 dots against the UNDOUBLED
            # half of the partner (timing the split-2 exactness cost).
            def mmx2(a, b, split_b=False):
                if split_b:
                    return jnp.dot(a[:, : b.shape[0]], b,
                                   preferred_element_type=jnp.float32)
                return jnp.dot(a, b[: a.shape[1]],
                               preferred_element_type=jnp.float32)
        else:
            mmx2 = _mm_f32x2

        rays = refs[0][...]                       # (R, 12)
        z = refs[1][...]                          # (R, S+1)
        app = refs[2][...] if spec.app_dim else None

        # Per-ray spreads + E-expansion: shared by every block (all
        # per-sample variation enters through the z fenceposts).  The
        # sin-phase chain (oS, dS and their expansions) uses the split-2
        # dot: a DEFAULT bf16 pass would put 4e-3 relative noise on
        # phases that sin() evaluates at mid IPE frequencies (~1 rad at
        # f=8).  Variance rows (dQ) keep DEFAULT — 4e-3 relative on a
        # damping exponent is harmless.
        E = wrefs["_E"][...]                      # (Tb, R)
        E2 = wrefs["_E2"][...]                    # (Tb, 2R) = [E | E]
        oS = mmx2(rays, wrefs["_SpO2"][...])
        dS = mmx2(rays, wrefs["_SpV2"][...])
        dQ = rowmm(rays * rays, wrefs["_SqV"][...])
        r2 = rays[:, 11:12] ** 2
        oS_T = mmx2(E2, oS, split_b=True)    # (Tb, 128)
        dS_T = mmx2(E2, dS, split_b=True)
        dQ_T = rowmm(E, dQ)
        nQ_T = wrefs["_sqrow"][...] - dQ_T
        if spec.ret_rgb:
            extras = (_fast_sin(mmx2(rays, wrefs["_Pd2"][...])
                                + wrefs["_phd"][...]) * wrefs["_trg"][...]
                      + mmx2(rays, wrefs["_SelRaw2"][...]))
            if spec.app_dim:
                extras = extras + mmx2(app, wrefs["_SelApp2"][...])
            xt = jnp.dot(extras.astype(jnp.bfloat16), wrefs["wvx"][...],
                         preferred_element_type=jnp.float32)  # (R, hv)

        logt_scr[...] = jnp.zeros_like(logt_scr)
        if tw_scr is not None:
            tw_scr[...] = jnp.zeros_like(tw_scr)
        if mx_scr is not None:
            # -1 < any weight: block 0's in-block first-max always wins the
            # first comparison, so an all-zero-weight ray selects sample 0
            # exactly like jnp.argmax.
            mx_scr[...] = jnp.full_like(mx_scr, -1.0)
        depth_ref[...] = jnp.zeros_like(depth_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if rgb_ref is not None:
            rgb_ref[...] = jnp.zeros_like(rgb_ref)
        if feat_ref is not None:
            feat_ref[...] = jnp.zeros_like(feat_ref)

        # ---- tile-level cone moments (hoisted) ----
        # Full-lane (R, S) math ONCE per tile instead of 4 latency-bound
        # (R, Sb) passes: the t_mean/tv/rv chains are deep serial division
        # chains whose per-block form stalled in-order issue (measured via
        # spec.ablate: "moments" alone was worth ~2 ms/stage).
        t0a, t1a = z[:, :-1], z[:, 1:]            # (R, S)
        mu_a = (t0a + t1a) / 2.0
        hw_a = (t1a - t0a) / 2.0
        dists_a = t1a - t0a
        den_a = jnp.maximum(_F32_EPS, 3.0 * mu_a**2 + hw_a**2)
        t_mean_a = mu_a + (2.0 * mu_a * hw_a**2) / den_a
        if "moments" not in abl:
            tv_a = hw_a**2 / 3.0 - (4.0 / 15.0) * (
                hw_a**4 * (12.0 * mu_a**2 - hw_a**2)) / den_a**2
            rv_a = r2 * (mu_a**2 / 4.0 + (5.0 / 12.0) * hw_a**2
                         - (4.0 / 15.0) * hw_a**4 / den_a)

        # Deferred-composite software pipeline: block j's compositing
        # (log/exp transmittance, weighted reductions — serial VPU chains)
        # is emitted AFTER block j+1's encode/trunk in program order, so
        # its latency hides behind the next block's MXU occupancy instead
        # of stalling it (in-order issue).  work(j) parks sigma / rgb_t /
        # feat_tap in double-buffered VMEM scratch (parity j%2); the
        # early-termination check uses a cheap rigorous carry bound kept
        # in logt_scr[:, 1] (see work()) so skip decisions stay as fresh
        # as the sequential schedule's.
        if spec.early_term_eps > 0:
            # Per-sample upper bound on log(exp(-sd) + 1e-10):
            #   -min(sd, C) >= true - 1e-10*e^C   with C = -log(eps)+0.1,
            # so carry_quick >= carry_true - S*1e-10*e^C = carry_true - m.
            # Skipping only when carry_quick < log(eps) - m then implies
            # carry_true < log(eps): the <eps weight bound still holds.
            _qc = float(-np.log(spec.early_term_eps) + 0.1)
            _m = float(2 * S * 1e-10 * np.exp(_qc) + 1e-6)
            _qthresh = float(np.log(spec.early_term_eps) - _m)

        def work(j):
            bj = j % 2
            sl = slice(j * Sb, (j + 1) * Sb)
            # Per-block moment columns: one E-expand matmul + one masked
            # lane-reduce per moment to reach the (Tb, 1) columns the IPE
            # pre-activations broadcast over.  t_mean feeds the sin phase
            # -> split-2 expansion (exact for one-hot E).
            if "moments" in abl:   # diagnostic: constant moment cols
                t_col = dQ_T[:, :1] * 0.0 + 0.5
                tv_col = t_col * 0.02
                rv_col = t_col * 0.01
            else:
                pack3 = jnp.concatenate(
                    [t_mean_a[:, sl], tv_a[:, sl], rv_a[:, sl]], axis=1)
                X3 = mmx2(E2, pack3, split_b=True)   # (Tb, 3*Sb)
                t_col = jnp.sum(X3 * wrefs["_Mt"][...], axis=-1,
                                keepdims=True)
                tv_col = jnp.sum(X3 * wrefs["_Mv"][...], axis=-1,
                                 keepdims=True)
                rv_col = jnp.sum(X3 * wrefs["_Mr"][...], axis=-1,
                                 keepdims=True)

            pre = oS_T + t_col * dS_T + wrefs["_phase"][...]
            vs = tv_col * dQ_T + rv_col * nQ_T
            if "ipe" in abl:       # diagnostic: no transcendentals
                xb_f = pre * vs
            else:
                xb_f = _fast_exp(-0.5 * vs) * _fast_sin(pre)

            if spec.trunk_int8:
                # int8 serving trunk (ops/pallas/quant.py): the whole
                # chain runs in the QUANTIZED domain — layer i's
                # epilogue is y = acc*c + B (ONE fused scale row:
                # dequant, relu threshold and the next layer's requant
                # all pre-folded, with +0.5 in B so the truncating
                # f32->int8 cast rounds to nearest), max(y, 0.5) IS
                # the relu, and clip(-127,127)+cast pattern-matches
                # Mosaic's saturating cast (an asymmetric 0 bound
                # measures 2x slower: 11.4 vs 5.7 ms/chain).  Real
                # units reappear only at the feat tap and final layer.
                def i8mm(a, b):
                    return jnp.dot(a, b,
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.float32)

                def sat8(y):
                    return jnp.clip(y, -127, 127).astype(jnp.int8)

                last = spec.layer_num - 1
                start = spec.trunk_int8_from
                feat_tap = None
                if start > 0:
                    # posttap: exact-bf16 prefix through the feat tap,
                    # then requantize once (qh = 127/act_scale[start-1])
                    # and continue in the q-domain.  xq is only needed
                    # if an int8 layer re-injects the skip concat.
                    xb = xb_f.astype(jnp.bfloat16)
                    h = jax.nn.relu(mm(xb, wrefs["w0"][...])
                                    + wrefs["b0"][...])
                    feat_tap = h
                    for i in range(1, start):
                        acc_h = mm(h, wrefs[f"w{i}"][...])
                        if f"w{i}s" in wrefs:
                            acc_h = acc_h + mm(xb, wrefs[f"w{i}s"][...])
                        h = jax.nn.relu(acc_h + wrefs[f"b{i}"][...])
                        if i == spec.feat_layer:
                            feat_tap = h
                    hq = sat8(jnp.round(h * wrefs["qh"][...]))
                    xq = (sat8(jnp.round(xb_f * wrefs["qenc"][...]))
                          if any(f"w{i}sq" in wrefs
                                 for i in range(start, spec.layer_num))
                          else None)
                else:
                    xq = sat8(jnp.round(xb_f * wrefs["qenc"][...]))
                    hq = None
                for i in range(start, spec.layer_num):
                    acc_h = i8mm(xq if i == 0 else hq,
                                 wrefs[f"w{i}q"][...])
                    if i == last:
                        h = acc_h * wrefs[f"s{i}"][...]
                        if f"w{i}sq" in wrefs:
                            h = h + (i8mm(xq, wrefs[f"w{i}sq"][...])
                                     * wrefs[f"s{i}s"][...])
                        h = jax.nn.relu(h + wrefs[f"b{i}"][...])
                        if feat_tap is None:
                            feat_tap = h
                    elif "requant" in abl:  # diagnostic: no epilogue
                        if i == spec.feat_layer and spec.ret_feat:
                            feat_tap = acc_h
                        hq = sat8(acc_h)
                    else:
                        y = acc_h * wrefs[f"c{i}"][...]
                        if f"w{i}sq" in wrefs:
                            y = y + (i8mm(xq, wrefs[f"w{i}sq"][...])
                                     * wrefs[f"c{i}s"][...])
                        y = jnp.maximum(y + wrefs[f"B{i}"][...], 0.5)
                        if i == spec.feat_layer and spec.ret_feat:
                            feat_tap = (y - 0.5) * wrefs[f"iq{i}"][...]
                        hq = sat8(y)
            else:
                xb = xb_f.astype(jnp.bfloat16)
                h = jax.nn.relu(mm(xb, wrefs["w0"][...])
                                + wrefs["b0"][...])
                feat_tap = h
                for i in range(1, spec.layer_num):
                    acc_h = mm(h, wrefs[f"w{i}"][...])
                    if f"w{i}s" in wrefs:
                        acc_h = acc_h + mm(xb, wrefs[f"w{i}s"][...])
                    h = jax.nn.relu(acc_h + wrefs[f"b{i}"][...])
                    if i == spec.feat_layer:
                        feat_tap = h

            h3 = h.reshape(R, Sb, hid)
            sigma_raw = jnp.sum(h3 * wrefs["wa"][...][None, None, :],
                                axis=-1) + wrefs["ba"][0, 0]   # (R, Sb)
            sig_scr[:, bj * Sb : (bj + 1) * Sb] = sigma_raw
            if spec.ret_rgb:
                feature = mm(h, wrefs["wf"][...]) + wrefs["bf"][...]
                hv = jax.nn.relu(
                    mm(feature, wrefs["wvh"][...]).reshape(R, Sb, -1)
                    + xt[:, None, :] + wrefs["bv"][...])
                rgb_t = (mm(hv.reshape(Tb, -1),
                            wrefs["wrgb"][...])[:, :8]
                         + wrefs["brgb"][...][:8])
                rgbt_scr[:, bj * 8 : (bj + 1) * 8] = rgb_t
            if feat_scr is not None:
                feat_scr[:, bj * hid : (bj + 1) * hid] = feat_tap
            if spec.early_term_eps > 0:
                sd = jax.nn.relu(sigma_raw) * dists_a[:, sl]
                logt_scr[:, 1:2] = logt_scr[:, 1:2] + jnp.sum(
                    -jnp.minimum(sd, _qc), axis=-1, keepdims=True)

        def composite(j):
            bj = j % 2
            sl = slice(j * Sb, (j + 1) * Sb)
            sigma_raw = sig_scr[:, bj * Sb : (bj + 1) * Sb]
            mu = mu_a[:, sl]
            t_mean = t_mean_a[:, sl]
            if spec.ret_rgb:
                rgb = jax.nn.sigmoid(
                    rgbt_scr[:, bj * 8 : (bj + 1) * 8]).reshape(R, Sb, -1)
            if feat_scr is not None:
                feat_tap = feat_scr[:, bj * hid : (bj + 1) * hid]

            sigma = jax.nn.relu(sigma_raw)
            alpha = 1.0 - jnp.exp(-sigma * dists_a[:, sl])
            if "logt" in abl:      # diagnostic: no transmittance chain
                log_t = alpha * -1e-3
                weights = alpha
            else:
                log_t = jnp.log(1.0 - alpha + 1e-10)
                prev = logt_scr[:, 0:1]
                # Split-2: a DEFAULT bf16 pass truncates
                # log-transmittance sums (O(10) magnitudes) to ~4e-2
                # absolute -> 4% noise on every weight's exponent.
                csum = mmx2(log_t, wrefs["_tri2"][...]) + prev
                weights = alpha * jnp.exp(csum)       # (R, Sb)

            if "wsum" in abl:      # diagnostic: liveness-only writes
                w_out_ref[:, j * Sb : (j + 1) * Sb] = weights
                depth_ref[...] += weights[:, :1]
                acc_ref[...] += alpha[:, :1]
                if rgb_ref is not None:
                    rgb_ref[...] += rgb[:, 0]
                if feat_ref is not None:
                    feat_ref[...] += feat_tap.reshape(R, Sb, hid)[:, 0]
                    if tw_scr is not None:
                        tw_scr[...] = tw_scr[...] + weights[:, :1]
                    if mx_scr is not None:
                        mx_scr[:, 0:1] = weights[:, :1]
                logt_scr[:, 0:1] = logt_scr[:, 0:1] + log_t[:, :1]
                return

            w_out_ref[:, j * Sb : (j + 1) * Sb] = weights
            depth_ref[...] += jnp.sum(weights * mu, axis=-1,
                                      keepdims=True)
            acc_ref[...] += jnp.sum(weights, axis=-1, keepdims=True)
            if rgb_ref is not None:
                rgb_ref[...] += jnp.sum(weights[:, :, None] * rgb,
                                        axis=1)
            if feat_ref is not None:
                feat3 = feat_tap.reshape(R, Sb, hid)
                if spec.feat_max:
                    # First-occurrence in-block argmax: exclusive
                    # cumsum of the max mask via the 0/1 triangle
                    # matmul (exact in one bf16 pass — integer counts).
                    blk_max = jnp.max(weights, axis=-1, keepdims=True)
                    mf = (weights == blk_max).astype(jnp.float32)
                    seen = jnp.dot(mf, wrefs["_tri"][...],
                                   preferred_element_type=jnp.float32)
                    first = mf * (seen == 0.0)       # (R, Sb) one-hot
                    feat_blk = jnp.sum(first[:, :, None] * feat3,
                                       axis=1)
                    t_blk = jnp.sum(first * t_mean, axis=-1,
                                    keepdims=True)
                    upd = blk_max > mx_scr[:, 0:1]
                    feat_ref[...] = jnp.where(upd, feat_blk,
                                              feat_ref[...])
                    mx_scr[:, 0:1] = jnp.where(upd, blk_max,
                                               mx_scr[:, 0:1])
                    mx_scr[:, 1:2] = jnp.where(upd, t_blk,
                                               mx_scr[:, 1:2])
                else:
                    feat_ref[...] += jnp.sum(weights[:, :, None] * feat3,
                                             axis=1)
                    tw_scr[...] = tw_scr[...] + jnp.sum(
                        weights * t_mean, axis=-1, keepdims=True)
            logt_scr[:, 0:1] = logt_scr[:, 0:1] + jnp.sum(
                log_t, axis=-1, keepdims=True)

        for j in range(SB):
            # Blocks 0 AND 1 always run: that writes BOTH parity buffers
            # before any skip is possible, so a skipped block's deferred
            # composite always reads finite (earlier-block) values that
            # its exact-zero weights then cancel — never uninitialized
            # scratch (0 * uninit would be NaN).
            if j <= 1 or spec.early_term_eps <= 0:
                work(j)
            else:
                # Stale-proof a potential skip: zeroed sigma makes the
                # (always-run) deferred composite produce EXACT zero
                # alpha/weights for this block, so parked rgb/feat
                # garbage contributes nothing and w_out gets exact 0s.
                sig_scr[:, (j % 2) * Sb : (j % 2 + 1) * Sb] = jnp.zeros(
                    (R, Sb), jnp.float32)
                alive = jnp.max(logt_scr[:, 1]) > _qthresh
                pl.when(alive)(lambda j=j: work(j))
            if j > 0:
                composite(j - 1)
        composite(SB - 1)

        acc = acc_ref[...]
        if rgb_ref is not None and spec.white_bg:
            rgb_ref[...] += 1.0 - acc
        if feat_ref is not None:
            # Split-2 selection: composited 3D points feed localization;
            # a DEFAULT pass would round ray origins to bf16 (4e-3 rel).
            # lin: sum_s w (o + t d) = o*acc + d*sum(w t); max: o + d*t_best.
            if spec.feat_max:
                pts_ref[...] = (mmx2(rays, wrefs["_SelO82"][...])
                                + mmx2(rays, wrefs["_SelV82"][...])
                                * mx_scr[:, 1:2])
            else:
                pts_ref[...] = (mmx2(rays, wrefs["_SelO82"][...]) * acc
                                + mmx2(rays, wrefs["_SelV82"][...])
                                * tw_scr[:, 0:1])

    def kernel(*refs):
        n_in = n_fixed + len(weight_names)
        wrefs = dict(zip(weight_names, refs[n_fixed:n_in]))
        out_refs = list(refs[n_in:])
        if n_scratch:
            scratch_refs = out_refs[-n_scratch:]
            out_refs = out_refs[:-n_scratch]
        rgb_ref = out_refs.pop(0) if spec.ret_rgb else None
        depth_ref, acc_ref, w_out_ref = out_refs[:3]
        feat_ref, pts_ref = out_refs[3:] if spec.ret_feat else (None, None)
        if SB > 1:
            blocked_body(wrefs, refs, rgb_ref, depth_ref, acc_ref,
                         w_out_ref, feat_ref, pts_ref, scratch_refs)
            return

        def rowmm(a, B):
            return jnp.dot(a, B, preferred_element_type=jnp.float32)

        E = wrefs["_E"][...]                      # (T, R)
        if spec.from_rays:
            rays = refs[0][...]                   # (R, 12)
            z = refs[1][...]                      # (R, S+1)
            app = refs[2][...] if spec.app_dim else None
        else:
            o8 = refs[0][...]                     # (R, 8): o | radius | 0...
            d8 = refs[1][...]                     # (R, 8): unit d | 0...
            z = refs[2][...]                      # (R, S+1)
            tm = refs[3][...]                     # (T, 8): t_mean|t_var|r_var

        # ---- conical-frustum Gaussian moments at (R, S) (compositing) ----
        t0, t1 = z[:, :-1], z[:, 1:]
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        denom = jnp.maximum(_F32_EPS, 3.0 * mu**2 + hw**2)
        t_mean = mu + (2.0 * mu * hw**2) / denom

        # ---- fused cast + IPE via linearity of the spread transform ----
        if spec.from_rays:
            oS = rowmm(rays, wrefs["_SpO"][...])  # (R, 128)
            dS = rowmm(rays, wrefs["_SpV"][...])
            dQ = rowmm(rays * rays, wrefs["_SqV"][...])
            r2 = rays[:, 11:12] ** 2              # (R, 1)
            oS_T = rowmm(E, oS)                   # (T, 128)
            dS_T = rowmm(E, dS)
            dQ_T = rowmm(E, dQ)
            nQ_T = wrefs["_sqrow"][...] - dQ_T    # E is one-hot: E@sqrow=sqrow
            r2_T = rowmm(E, r2)                   # (T, 1)
            # Per-sample moments in T-major: pull z fenceposts through the
            # E expansion with periodic one-hot lane masks, then the (T, 1)
            # column broadcasts over 128 lanes natively.
            z_all = rowmm(E, z)                   # (T, S+1)
            t0c = jnp.sum(z_all * wrefs["_M0"][...], axis=-1, keepdims=True)
            t1c = jnp.sum(z_all * wrefs["_M1"][...], axis=-1, keepdims=True)
            mu_c = (t0c + t1c) / 2.0
            hw_c = (t1c - t0c) / 2.0
            den_c = jnp.maximum(_F32_EPS, 3.0 * mu_c**2 + hw_c**2)
            t_col = mu_c + (2.0 * mu_c * hw_c**2) / den_c
            tv_col = hw_c**2 / 3.0 - (4.0 / 15.0) * (
                hw_c**4 * (12.0 * mu_c**2 - hw_c**2)) / den_c**2
            rv_col = r2_T * (mu_c**2 / 4.0 + (5.0 / 12.0) * hw_c**2
                             - (4.0 / 15.0) * hw_c**4 / den_c)
            if spec.var_scale != 1.0:
                tv_col = spec.var_scale * tv_col
                rv_col = spec.var_scale * rv_col
        else:
            xyz = wrefs["_xyz"][...]
            oS = rowmm(o8 * xyz, wrefs["_Sp"][...])   # (R, 128)
            dS = rowmm(d8, wrefs["_Sp"][...])
            d_sq = d8 * d8
            dQ = rowmm(d_sq, wrefs["_Sq"][...])
            nQ = rowmm(xyz - d_sq, wrefs["_Sq"][...])
            oS_T = rowmm(E, oS)                   # (T, 128)
            dS_T = rowmm(E, dS)
            dQ_T = rowmm(E, dQ)
            nQ_T = rowmm(E, nQ)
            t_col = tm[:, 0:1]
            tv_col = tm[:, 1:2]
            rv_col = tm[:, 2:3]

        pre = oS_T + t_col * dS_T + wrefs["_phase"][...]   # (T, 128)
        vs = tv_col * dQ_T + rv_col * nQ_T
        xb = (_fast_exp(-0.5 * vs) * _fast_sin(pre)).astype(jnp.bfloat16)

        def mm(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)

        h = jax.nn.relu(mm(xb, wrefs["w0"][...]) + wrefs["b0"][...])
        feat_tap = h
        for i in range(1, spec.layer_num):
            acc_h = mm(h, wrefs[f"w{i}"][...])
            if f"w{i}s" in wrefs:
                acc_h = acc_h + mm(xb, wrefs[f"w{i}s"][...])
            h = jax.nn.relu(acc_h + wrefs[f"b{i}"][...])
            if i == spec.feat_layer:
                feat_tap = h

        # ---- heads (rank-2 dots only; (T,C)<->(R,S,C) reshapes are free) ----
        h_tap3 = h.reshape(R, S, hid)
        sigma_raw = jnp.sum(h_tap3 * wrefs["wa"][...][None, None, :],
                            axis=-1) + wrefs["ba"][0, 0]           # (R, S)

        if spec.ret_rgb:
            feature = mm(h, wrefs["wf"][...]) + wrefs["bf"][...]  # (T, hid)
            if spec.from_rays:
                # viewdir PE extras built in-kernel: sin/cos slots via the
                # Pd spread + phase, raw d / app via selector matmuls.
                extras = (_fast_sin(rowmm(rays, wrefs["_Pd"][...])
                                    + wrefs["_phd"][...]) * wrefs["_trg"][...]
                          + rowmm(rays, wrefs["_SelRaw"][...]))
                if spec.app_dim:
                    extras = extras + rowmm(app, wrefs["_SelApp"][...])
            else:
                extras = refs[4][...]             # (R, E)
            hv_t = mm(feature, wrefs["wvh"][...])  # (T, hid//2)
            hv = jax.nn.relu(
                hv_t.reshape(R, S, -1)
                + jnp.dot(extras.astype(jnp.bfloat16), wrefs["wvx"][...],
                          preferred_element_type=jnp.float32)[:, None, :]
                + wrefs["bv"][...])
            # Slice to 8 lanes before sigmoid/composite: only cols 0:3 are
            # real and the (T, 128) sigmoid + (R, S, 128) weighted sum would
            # spend 94% of their VPU work on padding.
            rgb_t = (mm(hv.reshape(T, -1), wrefs["wrgb"][...])[:, :8]
                     + wrefs["brgb"][...][:8])
            rgb = jax.nn.sigmoid(rgb_t).reshape(R, S, -1)  # cols 0:3 real

        # ---- compositing ----
        dists = t1 - t0
        z_mid = mu
        sigma = jax.nn.relu(sigma_raw)
        alpha = 1.0 - jnp.exp(-sigma * dists)
        log_t = jnp.log(1.0 - alpha + 1e-10)
        csum = jnp.dot(log_t, wrefs["_tri"][...],
                       preferred_element_type=jnp.float32)
        weights = alpha * jnp.exp(csum)           # (R, S)

        depth = jnp.sum(weights * z_mid, axis=-1, keepdims=True)
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        if spec.ret_rgb:
            rgb_map = jnp.sum(weights[:, :, None] * rgb, axis=1)
            if spec.white_bg:
                rgb_map = rgb_map + (1.0 - acc)
            rgb_ref[...] = rgb_map                # (R, 128); cols 0:3 real
        depth_ref[...] = depth
        acc_ref[...] = acc
        w_out_ref[...] = weights
        if spec.ret_feat:
            feat3 = feat_tap.reshape(R, S, hid)
            if spec.feat_max:
                # argmax-weight (surface) sample, first occurrence (matches
                # jnp.argmax / reference renderer.py:257-260).
                w_max = jnp.max(weights, axis=-1, keepdims=True)
                mf = (weights == w_max).astype(jnp.float32)
                seen = jnp.dot(mf, wrefs["_tri"][...],
                               preferred_element_type=jnp.float32)
                first = mf * (seen == 0.0)            # (R, S) one-hot
                feat_map = jnp.sum(first[:, :, None] * feat3, axis=1)
                t_best = jnp.sum(first * t_mean, axis=-1, keepdims=True)
                if spec.from_rays:
                    pts_map = (rowmm(rays, wrefs["_SelO8"][...])
                               + rowmm(rays, wrefs["_SelV8"][...]) * t_best)
                else:
                    pts_map = (o8 + d8 * t_best) * xyz
            else:
                feat_map = jnp.sum(weights[:, :, None] * feat3, axis=1)
                # Composited points:
                # sum_s w (o + t_mean d) = o*acc + d*sum(w t_mean).
                tw = jnp.sum(weights * t_mean, axis=-1, keepdims=True)
                if spec.from_rays:
                    pts_map = (rowmm(rays, wrefs["_SelO8"][...]) * acc
                               + rowmm(rays, wrefs["_SelV8"][...]) * tw)
                else:
                    pts_map = (o8 * acc + d8 * tw) * xyz  # (R, 8); 0:3 real
            feat_ref[...] = feat_map
            pts_ref[...] = pts_map

    def fused(weights_packed: dict, *data):
        weights_packed = {**weights_packed, **consts}
        weight_names.clear()
        weight_names.extend(sorted(weights_packed.keys()))

        def const_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        if spec.from_rays:
            if spec.app_dim:
                rays, z_vals, app = data
            else:
                rays, z_vals = data
            N = z_vals.shape[0]
            operands = [rays, z_vals] + ([app] if spec.app_dim else [])
            in_specs = [
                pl.BlockSpec((R, 12), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + ([pl.BlockSpec((R, spec.app_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 if spec.app_dim else [])
        else:
            o8, d8, z_vals, extras = data
            N = z_vals.shape[0]
            # Per-sample Gaussian scalars in T-major layout (XLA side: cheap
            # (N, S) math + one reshape).
            tmvr = frustum_moments_tmvr(z_vals, o8[:, 3:4], spec.var_scale)
            operands = [o8, d8, z_vals, tmvr, extras]
            in_specs = [
                pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, spec.extra_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
        assert N % R == 0, f"ray count {N} % tile {R} != 0"
        grid = (N // R,)
        in_specs += [const_spec(weights_packed[k]) for k in weight_names]
        out_specs = ([
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] if spec.ret_rgb else []) + [
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = ([
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
        ] if spec.ret_rgb else []) + [
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, S), jnp.float32),
        ]
        if spec.ret_feat:
            out_specs += [
                pl.BlockSpec((R, hid), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((N, hid), jnp.float32),
                jax.ShapeDtypeStruct((N, 8), jnp.float32),
            ]
        scratch_shapes = [pltpu.VMEM(shape, dt)
                          for _, shape, dt in _scratch_shapes]
        outs = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
            scratch_shapes=scratch_shapes,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*operands, *[weights_packed[k] for k in weight_names])
        outs = list(outs)
        out = {}
        if spec.ret_rgb:
            out["rgb"] = outs.pop(0)[:, :3]
        depth, acc, w = outs[:3]
        out.update(depth=depth[:, 0], acc=acc[:, 0], weights=w)
        if spec.ret_feat:
            out["feat"] = outs[3]
            out["pts"] = outs[4][:, :3]
        return out

    return fused


def frustum_moments_tmvr(z_vals, radius, var_scale: float = 1.0):
    """XLA-side conical-frustum Gaussian scalars, packed (N*S, 8).

    The cheap (non-catastrophic-cancellation) closed forms shared by the
    eval staging and the train kernel's ``_tmvr``; the resampling-facing
    stable branch lives in ``nerf/sampling.py: conical_frustum_to_gaussian``
    on purpose (different numerics).  z_vals (N, S+1) fenceposts; radius
    (N, 1); returns [t_mean | t_var | r_var | 0...] rows.
    """
    N, S = z_vals.shape[0], z_vals.shape[1] - 1
    t0, t1 = z_vals[:, :-1], z_vals[:, 1:]
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    den = jnp.maximum(_F32_EPS, 3.0 * mu**2 + hw**2)
    t_mean = mu + (2.0 * mu * hw**2) / den
    t_var = hw**2 / 3.0 - (4.0 / 15.0) * (
        hw**4 * (12.0 * mu**2 - hw**2)) / den**2
    r_var = radius**2 * (mu**2 / 4.0 + (5.0 / 12.0) * hw**2
                         - (4.0 / 15.0) * hw**4 / den)
    if var_scale != 1.0:  # mip_var_scale (reference render_utils.py:311)
        t_var = var_scale * t_var
        r_var = var_scale * r_var
    tmvr = jnp.stack([t_mean, t_var, r_var], axis=-1).reshape(N * S, 3)
    return _pad_axis(tmvr, 8, 1)


def eval_feat_layer(fine_cfg) -> int:
    """Effective descriptor-tap layer for the fused kernels.

    Mirrors the reference tap rules (``models/nerf.py:99-143`` /
    ``model.py:_effective_stop_layer`` + the descriptor pick at
    ``model.py:170-177``): an explicit ``stop_layer >= 0`` wins; otherwise
    ``out_3d_pnt`` containing ``"begin"`` taps layer 4, and the default is
    the FINAL hidden layer (``pt_feat``), not a fixed layer index.
    ``"viewdir"`` descriptors (``h_rgb``) are not trunk activations — the
    kernel cannot tap them; ``fused_eval_supported`` gates those out.
    """
    sl = fine_cfg.stop_layer
    if sl < 0 and isinstance(fine_cfg.out_3d_pnt, str) \
            and "begin" in fine_cfg.out_3d_pnt:
        sl = 4
    return sl if sl >= 0 else fine_cfg.layer_num - 1


def reparam_unit_dir(rays):
    """Rescale packed rays to the unit-direction parameterization.

    The fused kernels march along the unit viewdir (cols 8:11) with
    unscaled segment lengths, while the XLA path parameterizes by the
    packed (possibly non-unit) ``rays_d`` (cols 3:6) and multiplies optical
    depths by ``||rays_d||`` (``compositing.py:43``, reference
    ``render_utils.py``).  Both march the same LINE (``prepare_rays_data``
    packs ``viewdirs = rays_d/||rays_d||``), so scaling near/far
    (``rays_d``-multiples) by ``||rays_d||`` and the cone growth rate
    ``radii`` (world radius per unit ``rays_d``) by ``1/||rays_d||`` makes
    the kernels' world-space Gaussians, optical depths, and composited
    points match the XLA path exactly — the conical-frustum moments are
    homogeneous (degree 1 in t for t_mean, degree 2 for t_var, and
    ``radii^2 * t^2``-homogeneous for r_var) under this rescaling.

    With the default ``norm_ray_dir=True`` datasets ``||rays_d|| == 1`` and
    this is an identity up to f32 rounding of the norm.

    Returns ``(rays', nrm)`` where kernel depths are ``nrm`` times the
    XLA-path depths (divide by ``nrm[:, 0]`` to convert back).
    """
    nrm = jnp.sqrt(jnp.sum(rays[:, 3:6] ** 2, axis=-1, keepdims=True))
    nrm = jnp.maximum(nrm, 1e-12)
    # Snap already-unit dirs to exactly 1: keeps the default
    # (norm_ray_dir=True) path bit-identical instead of perturbing
    # near/far by the norm's f32 rounding.
    nrm = jnp.where(jnp.abs(nrm - 1.0) < 1e-5, 1.0, nrm)
    rays = jnp.concatenate(
        [rays[:, :6], rays[:, 6:8] * nrm, rays[:, 8:11],
         rays[:, 11:12] / nrm], axis=-1)
    return rays, nrm


def prepare_ray_inputs(rays):
    """(N, 12) packed rays -> (o8 [o|radius|0...], d8 [unit d|0...])."""
    n = rays.shape[0]
    o = rays[:, 0:3]
    d = rays[:, 8:11]  # viewdirs (unit)
    radii = rays[:, 11:12]
    o8 = jnp.concatenate([o, radii, jnp.zeros((n, 4))], axis=-1)
    d8 = _pad_axis(d, 8, 1)
    return o8, d8


def make_fused_hierarchical(renderer, interpret: bool = False,
                            ray_tile: int | None = None,
                            coarse_rgb: bool = False,
                            sample_blocks: int = 4,
                            coarse_sample_blocks: int | None = None,
                            early_term_eps: float = 0.0,
                            trunk_int8: str = "none",
                            act_scales=None):
    """Fused two-stage (coarse->resample->fine) eval render.

    ``sample_blocks``: both stages process the sample axis in z-ordered
    blocks — a ~5% scheduling win on v5e with outputs identical to the
    unblocked kernel (2e-9 measured on chip).

    ``ray_tile=None`` (default) resolves ADAPTIVELY: 16 when
    ``early_term_eps > 0``, else 32.  At eps=0, tile 32 puts each trunk
    matmul at M = 32*32 = 1024 rows — the measured v5e sweet spot
    (23.5 ms vs 24.6 at M=512 and 26.9 at M=1536 for the 9216-ray bench
    batch).  With early termination ON the tradeoff flips: a block is
    skipped only when ALL rays of a tile are opaque, so halving the
    tile raises the realized skip yield by more than the smaller
    matmul loses (round-5 one-process sweeps, scripts/stage_probe.py,
    trained room scene, single-chunk: bf16 t32/eps 19.84 ms vs
    t16/eps **19.11**; int8-coarse t32/eps 19.07 vs t16/eps **18.59**;
    at eps=0 tile 32 stays best in both precisions: bf16 19.42 vs
    20.31, int8 18.28 vs 19.13).  Outputs are bit-identical across
    ray_tile at fixed sample_blocks, since the z-block reduction order
    is unchanged — the adaptive default is purely a schedule choice.

    ``trunk_int8`` in {"none", "coarse", "both", "posttap"}: opt-in int8
    serving mode ("posttap" quantizes the coarse trunk fully and the fine
    trunk only AFTER the descriptor tap — per-sample taps stay exact-bf16
    and int8 error reaches feat/pts only through the compositing weights,
    removing the per-sample descriptor drift "both" carries)
    — run the named stages' MLP trunks as int8 MXU dots (2x bf16 MACs/
    cycle).  Requires ``act_scales`` from
    :func:`nerfmatch_tpu.ops.pallas.quant.calibrate_act_scales` (static
    per-channel scales, calibrated once per scene).  "coarse" quantizes
    only the stage whose sole output is the resampling weights.  Measured
    (scripts/int8_bench_probe.py, trained bench scene, 9216 rays): the
    standalone MLP chain speeds up 1.58x (7.96 -> 5.05 ms), but the full
    fused render does NOT (409.9k "none" vs 398.1k rays/s "both") — the
    kernel's critical path is VPU/schedule-bound, so the freed MXU cycles
    hide behind it.  Quality vs f32: coarse mean rgb 1.2e-3 / both
    3.4e-3, vs the 7.9e-4 fused-bf16 noise floor.  Both measurements keep
    this opt-in and never the benchmark default; it only pays for
    MLP-heavier configs (wider/deeper trunks) where the chain dominates.

    ``early_term_eps`` > 0 additionally skips the trunk of blocks where
    every ray in the tile is already opaque (transmittance < eps).
    Skipped samples' true weights are < eps, so every composited output
    differs from the eps=0 render by < eps (below the ~8e-4 bf16 noise
    floor at 1e-4).  Measured v5e tradeoff: 1.7x (608k rays/s) on
    hard-saturating geometry, ~-3% on a soft-trained scene and -11% on
    fully-transparent ones (the per-block condition checks).  This
    FACTORY defaults to 0 (off) — the kernel stays semantics-neutral —
    but the production EVAL path turns it on:
    ``RenderConfig.early_term_eps`` defaults to 1e-4, quality-gated
    end-to-end on an enclosed indoor scene
    (``scripts/earlyterm_e2e_gate.py``: identical matches and pose
    errors vs eps=0 through the full localization pipeline, 1.86x faster
    scene caching).  Localization scenes are interiors where every ray
    terminates; soft/transparent scenes should set
    ``render.early_term_eps: 0``.  Finer granularity (8 blocks /
    ray_tile 8) measures strictly worse: the smaller matmuls lose more
    MXU efficiency than the extra skips gain.

    Mirrors ``NerfRenderer.render_rays(train=False, ret_pfeat=True,
    validation=True)``: both Gaussian-cast+MLP+composite stages run in the
    fused kernel; the inverse-CDF z resampling runs in a dedicated Pallas
    lookup kernel (``resample_kernel.py``).
    Returns (render(w_coarse, w_fine, rays[, app_emb]) -> preds,
    pack(params)).  ``app_emb`` (N, 16) appearance embeddings ride in the
    per-ray extras alongside the viewdir PE (Cambridge path).

    By default the coarse pass computes only what feeds the resampler
    (weights/depth) and skips its rgb head chain; pass ``coarse_rgb=True``
    to also get ``rgb_coarse`` (needed only for coarse PSNR panels).
    """
    from .resample_kernel import resample_z_pallas

    cfg = renderer.cfg
    fine_cfg = renderer.fine_cfg
    S = fine_cfg.num_pts
    app_dim = 16 if cfg.appearance_embedding else 0
    if ray_tile is None:  # adaptive schedule default (docstring table)
        ray_tile = 16 if early_term_eps > 0 else 32
    assert trunk_int8 in ("none", "coarse", "both", "posttap"), trunk_int8
    int8_c = trunk_int8 in ("coarse", "both", "posttap")
    # "posttap" = coarse fully int8 (as in "coarse") + the fine trunk int8
    # from feat_layer+1 on: the matching descriptors come out of the exact
    # bf16 prefix, only the sigma/rgb suffix quantizes.  Degenerates to
    # plain "coarse" when the tap sits on the last layer.
    _tap = eval_feat_layer(fine_cfg)
    int8_f_from = _tap + 1 if trunk_int8 == "posttap" else 0
    int8_f = (trunk_int8 == "both"
              or (trunk_int8 == "posttap"
                  and int8_f_from <= fine_cfg.layer_num - 1))
    assert not int8_c or act_scales is not None, \
        "trunk_int8 requires act_scales (quant.calibrate_act_scales)"
    spec = FusedRenderSpec(
        num_freqs=cfg.xyz_num_freqs, hid_dim=fine_cfg.hid_dim,
        layer_num=fine_cfg.layer_num, samples=S, ray_tile=ray_tile,
        feat_layer=eval_feat_layer(fine_cfg),
        white_bg=cfg.white_bg, from_rays=True,
        dirs_freqs=cfg.dirs_num_freqs, app_dim=app_dim,
        sample_blocks=sample_blocks, early_term_eps=early_term_eps,
        var_scale=(cfg.mip_var_scale if cfg.mip_var_scale > 0 else 1.0),
        feat_max=(cfg.feat_comb == "max"), trunk_int8=int8_f,
        trunk_int8_from=(int8_f_from if int8_f else 0))
    fused = make_fused_render(spec, interpret=interpret)
    # Coarse pass: only depth/weights feed the fine stage — skip the
    # composited feat/pts reductions and (by default) the rgb head chain.
    import dataclasses as _dc
    # Per-stage block counts: the coarse stage (no head chain) measures
    # fastest at 8 z-blocks with int8/early-term (scripts/stage_probe.py)
    # while the fine stage stays best at 4.  Changing the coarse block
    # count reorders its f32 log-transmittance partial sums, which
    # perturbs the resampled z at silhouette edges — measured on the
    # trained bench scene: mean |delta| ~1e-7, pointwise max ~8e-4 on
    # weights (resample chaos, same class as blocked-vs-unblocked).
    coarse_spec = _dc.replace(spec, ret_feat=False, ret_rgb=coarse_rgb,
                              trunk_int8=int8_c, trunk_int8_from=0,
                              sample_blocks=(coarse_sample_blocks
                                             or sample_blocks))
    fused_coarse = make_fused_render(coarse_spec, interpret=interpret)

    assert renderer.dirs_emb_dim + app_dim <= spec.extra_dim

    def pack(params):
        # Traced (jnp-only) packing so callers may pack inside jit — one
        # dispatch per chunk instead of dozens of eager ops (which cost
        # seconds per call over a remote-device link).
        from .render_train import pack_mlp_weights_traced

        coarse_key = "nerf_fine" if cfg.single_model else "nerf_coarse"
        if int8_c:
            from .quant import pack_mlp_weights_int8

            wc = pack_mlp_weights_int8(params[coarse_key], coarse_spec,
                                       act_scales["coarse"])
        else:
            wc = pack_mlp_weights_traced(params[coarse_key], coarse_spec)
        if int8_f:
            from .quant import pack_mlp_weights_int8

            wf = pack_mlp_weights_int8(params["nerf_fine"], spec,
                                       act_scales["fine"])
        else:
            wf = pack_mlp_weights_traced(params["nerf_fine"], spec)
        return wc, wf

    def render(w_coarse, w_fine, rays, app_emb=None):
        # Exact unit-direction reparameterization (non-unit rays_d configs
        # march the same line; depths convert back below).
        rays, nrm = reparam_unit_dir(rays)
        near, far = rays[:, 6:7], rays[:, 7:8]
        t = jnp.linspace(0.0, 1.0, S + 1)
        z_vals = near * (1.0 - t) + far * t
        app = (app_emb,) if app_dim else ()
        coarse = fused_coarse(w_coarse, rays, z_vals, *app)

        z_vals_f = resample_z_pallas(z_vals, coarse["weights"],
                                     interpret=interpret)
        fine = fused(w_fine, rays, z_vals_f, *app)

        inv = 1.0 / nrm[:, 0]
        preds = {
            "depth_coarse": coarse["depth"] * inv,
            "rgb_fine": fine["rgb"], "depth_fine": fine["depth"] * inv,
            "acc_fine": fine["acc"], "feat_fine": fine["feat"],
            "pts_fine": fine["pts"], "weights_fine": fine["weights"],
        }
        if coarse_rgb:
            preds["rgb_coarse"] = coarse["rgb"]
        return preds

    return render, pack
