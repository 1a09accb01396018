"""Fused StarReLU + KxK depthwise conv Pallas kernel (fwd + custom VJP).

The ConvFormer token mixer (reference `timm` SepConv;
`/root/reference/nerfmatch/modules/__init__.py:94-107` imports the
pretrained ConvFormer whose blocks are pw -> StarReLU -> dw7x7 -> pw) is
the matcher train step's hottest region on TPU: at bs=2/480x480 the XLA
`conv_general_dilated(feature_group_count=C)` lowering plus the StarReLU
activation traffic measure ~44 ms of the 113 ms step
(scripts/trunk_bwd_probe.py: dwconv 7.0 ms fwd / 33.5 ms fwd+bwd,
StarReLU backward ~10.5 ms) — a 49-tap per-channel filter maps to
neither the MXU (channel-diagonal matmuls) nor a single fused VPU pass.

Design (v2 — the first cut padded x/g in HBM and accumulated whole-tile,
which re-read the accumulator from VMEM 49x and erased the win):

* NO HBM padding: each grid step reads three CLAMPED row-blocks (i-1, i,
  i+1) of the raw array and assembles a zero-ringed, StarReLU-activated
  (Th + K - 1, W + K - 1, C) tile in VMEM scratch (the activation of a
  zero-padded element must be 0, not StarReLU's bias, so padding must
  happen after activation anyway).
* Row-wise taps: each output row's 49-term FMA chain stays in vector
  registers and is written once (the whole-tile form costs 49 x 2
  accumulator round-trips through VMEM per grid step).
* Backward recomputes the activation from the saved PRE-activation input
  (no extra residuals vs the unfused path): dgrad correlates g with the
  flipped kernel and carries the StarReLU scalar grads (ds, db) through
  the row loop; wgrad accumulates dx-major (K, C) row partials and
  transposes to tap-major outside.  The conv-bias grad (plain sum over
  g) stays in XLA.  All accumulation is f32 and sequential ->
  deterministic; the kernel is bit-exact vs a HIGHEST-precision XLA
  grouped conv (the default f32 conv it replaces runs one-pass bf16).

Requires H % row_block == 0 (row_block a divisor of H in [K-1, 32]) and
C % 128 == 0 — production trunk maps are (240|60) x (240|60) with C in
{256, 512}; `dw_star_available` gates everything else back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=96 * 1024 * 1024,
)


def _row_block(H: int, K: int) -> int | None:
    """Largest divisor of H in [K-1, 32] (halo must fit one block)."""
    for th in range(min(H, 32), K - 2, -1):
        if H % th == 0 and th >= K - 1:
            return th
    return None


def _in_specs(W: int, C: int, th: int, nb: int):
    """Three clamped row-block streams of one (B, H, W, C) array."""
    return [
        pl.BlockSpec((1, th, W, C),
                     lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0)),
        pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0)),
        pl.BlockSpec((1, th, W, C),
                     lambda bi, i: (bi, jnp.minimum(i + 1, nb - 1), 0, 0)),
    ]


def _assemble(scr, xm, xc, xp, i, nb, th, pad, W, act):
    """Fill scratch (th + 2*pad, W + 2*pad, C) with act(x) rows
    [i*th - pad, i*th + th + pad), zero ring outside the valid map.
    ``act`` maps a loaded block to its activated values."""
    zcol = jnp.zeros((th + 2 * pad, pad, scr.shape[2]), jnp.float32)
    scr[:, :pad] = zcol
    scr[:, pad + W:] = zcol
    top = act(xm[0, th - pad:])
    scr[:pad, pad:pad + W] = jnp.where(i > 0, top, 0.0)
    scr[pad:pad + th, pad:pad + W] = act(xc[0])
    bot = act(xp[0, :pad])
    scr[pad + th:, pad:pad + W] = jnp.where(i < nb - 1, bot, 0.0)


def _row_taps(rows, w2, W, K):
    """sum_tap w2[tap] * rows[dy, dx:dx+W] for one output row; the
    49-term chain lives in vector registers."""
    acc = None
    for dx in range(K):
        sh = jax.lax.slice(rows, (0, dx, 0), (K, dx + W, rows.shape[2]))
        for dy in range(K):
            term = w2[dy * K + dx] * jax.lax.slice(
                sh, (dy, 0, 0), (dy + 1, W, sh.shape[2]))
            acc = term if acc is None else acc + term
    return acc  # (1, W, C)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_star_fwd(x, w, cbias, s, b, interpret: bool = False):
    """y = dwconv(star_relu(x; s, b), w) + cbias, SAME zero padding."""
    B, H, W, C = x.shape
    K = w.shape[0]
    pad = K // 2
    th = _row_block(H, K)
    nb = H // th
    w2 = w.reshape(K * K, C)
    sb = jnp.stack([s, b]).reshape(1, 2).astype(jnp.float32)

    def kernel(sref, xm, xc, xp, w2r, cbr, yref, scr):
        i = pl.program_id(1)
        sv, bv = sref[0, 0], sref[0, 1]

        def act(v):
            r = jnp.maximum(v, 0.0)
            return sv * r * r + bv

        _assemble(scr, xm, xc, xp, i, nb, th, pad, W, act)
        w2v = w2r[:]
        cb = cbr[0]

        def body(r, carry):
            rows = scr[pl.ds(r, K)]
            yref[0, pl.ds(r, 1)] = _row_taps(rows, w2v, W, K) + cb
            return carry

        jax.lax.fori_loop(0, th, body, 0)

    y = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  *_in_specs(W, C, th, nb),
                  pl.BlockSpec((K * K, C), lambda bi, i: (0, 0)),
                  pl.BlockSpec((1, C), lambda bi, i: (0, 0))],
        out_specs=pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((th + 2 * pad, W + 2 * pad, C),
                                   jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER,
    )(sb, x, x, x, w2, cbias.reshape(1, C))
    return y


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_star_dgrad(x, w, s, g, interpret: bool = False):
    """(dx, ds, db) from upstream g (correlation with the flipped
    kernel); the StarReLU scalar partials ride the row loop's carry and
    accumulate into a revisited (1, 128) block."""
    B, H, W, C = x.shape
    K = w.shape[0]
    pad = K // 2
    th = _row_block(H, K)
    nb = H // th
    w2f = w[::-1, ::-1].reshape(K * K, C)
    sb = jnp.stack([s, jnp.zeros_like(s)]).reshape(1, 2).astype(jnp.float32)

    def kernel(sref, gm, gc, gp, xc, w2r, dxref, dsbref, scr):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        _assemble(scr, gm, gc, gp, i, nb, th, pad, W, lambda v: v)
        w2v = w2r[:]
        sv = sref[0, 0]

        def body(r, carry):
            ds_acc, db_acc = carry
            rows = scr[pl.ds(r, K)]
            dact = _row_taps(rows, w2v, W, K)
            xr = xc[0, pl.ds(r, 1)]
            rr = jnp.maximum(xr, 0.0)
            dxref[0, pl.ds(r, 1)] = (2.0 * sv) * rr * dact
            return (ds_acc + jnp.sum(dact * rr * rr, dtype=jnp.float32),
                    db_acc + jnp.sum(dact, dtype=jnp.float32))

        ds, db = jax.lax.fori_loop(
            0, th, body, (jnp.float32(0), jnp.float32(0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        part = (jnp.where(lane == 0, ds, 0.0)
                + jnp.where(lane == 1, db, 0.0))

        @pl.when((bi == 0) & (i == 0))
        def _():
            dsbref[:] = part

        @pl.when((bi > 0) | (i > 0))
        def _():
            dsbref[:] += part

    dx, dsb = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  *_in_specs(W, C, th, nb),
                  pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0)),
                  pl.BlockSpec((K * K, C), lambda bi, i: (0, 0))],
        out_specs=[
            pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 128), lambda bi, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((th + 2 * pad, W + 2 * pad, C),
                                   jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER,
    )(sb, g, g, g, x, w2f)
    return dx, dsb[0, 0], dsb[0, 1]


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def _dw_star_wgrad(x, s, b, g, K: int = 7, interpret: bool = False):
    """dw[dy, dx, c] = <g, act shifted by (dy, dx)>.

    Row partials accumulate dx-major — a (K, C) contiguous block per
    column offset — in the loop carry, then land in a revisited
    (K*K, C) output; the tap-major (K, K, C) transpose happens outside."""
    B, H, W, C = x.shape
    pad = K // 2
    th = _row_block(H, K)
    nb = H // th
    sb = jnp.stack([s, b]).reshape(1, 2).astype(jnp.float32)

    def kernel(sref, xm, xc, xp, gc, dwref, scr):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        sv, bv = sref[0, 0], sref[0, 1]

        def act(v):
            r = jnp.maximum(v, 0.0)
            return sv * r * r + bv

        _assemble(scr, xm, xc, xp, i, nb, th, pad, W, act)

        def body(r, carry):
            rows = scr[pl.ds(r, K)]           # (K, W + 2*pad, C)
            grow = gc[0, pl.ds(r, 1)]         # (1, W, C)
            out = []
            for dx in range(K):
                sh = jax.lax.slice(rows, (0, dx, 0),
                                   (K, dx + W, rows.shape[2]))
                out.append(carry[dx]
                           + jnp.sum(grow * sh, axis=1, dtype=jnp.float32))
            return tuple(out)

        zero = tuple(jnp.zeros((K, C), jnp.float32) for _ in range(K))
        parts = jax.lax.fori_loop(0, th, body, zero)
        part = jnp.concatenate(parts, axis=0)  # (K*K, C) dx-major

        @pl.when((bi == 0) & (i == 0))
        def _():
            dwref[:] = part

        @pl.when((bi > 0) | (i > 0))
        def _():
            dwref[:] += part

    dw2 = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  *_in_specs(W, C, th, nb),
                  pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0))],
        out_specs=pl.BlockSpec((K * K, C), lambda bi, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * K, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((th + 2 * pad, W + 2 * pad, C),
                                   jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER,
    )(sb, x, x, x, g)
    # dx-major (dx, dy, c) -> tap-major (dy, dx, c)
    return dw2.reshape(K, K, C).transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def dw_star(x, w, cbias, s, b):
    """star_relu + depthwise conv: XLA forward, Pallas backward.

    x: (B, H, W, C) pre-activation; w: (K, K, C) depthwise taps;
    cbias: (C,); s, b: StarReLU scalars.  Semantics of
    ``conv2d(dw, star_relu(x), padding=K//2, groups=C)`` in
    ``models/backbone._sep_conv``.

    HYBRID by design (profiled at the production 480x480/bs-2 step):
    the forward XLA conv fuses the activation into its input and costs
    ~0.25 ms/block in-situ — the Pallas forward kernel cannot beat that
    once its operand materialization is counted.  The BACKWARD is where
    XLA falls over: each stage-0 dw wgrad lowers to a 3.3 ms mega-
    reduction fusion (f32[7,7,1,256] out), ~10 ms/step for three blocks,
    plus the StarReLU recompute/activation traffic.  The Pallas dgrad/
    wgrad kernels replace exactly that, recomputing the activation from
    the saved PRE-activation tile in VMEM.  Gradients are exact f32
    (bit-exact vs a HIGHEST-precision oracle; f32 FMA order differs)."""
    return dw_star_reference(x, w, cbias, s, b)


def _vjp_fwd(x, w, cbias, s, b):
    return dw_star_reference(x, w, cbias, s, b), (x, w, s, b)


def _vjp_bwd(res, g):
    x, w, s, b = res
    dx, ds, db = _dw_star_dgrad(x, w, s, g)
    dw = _dw_star_wgrad(x, s, b, g, K=w.shape[0])
    dcb = jnp.sum(g, axis=(0, 1, 2), dtype=jnp.float32)
    return dx, dw, dcb, ds, db


dw_star.defvjp(_vjp_fwd, _vjp_bwd)


def dw_star_available(x, w) -> bool:
    """TPU-like backend, lane-aligned channels, a workable row block."""
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm", "metal"):
        return False
    B, H, W, C = x.shape
    K = w.shape[0]
    return (C % 128 == 0 and W >= K
            and _row_block(H, K) is not None)


def dw_star_reference(x, w, cbias, s, b):
    """Unfused XLA oracle (star_relu -> grouped conv) for parity tests."""
    r = jnp.maximum(x, 0.0)
    act = s * r * r + b
    y = jax.lax.conv_general_dilated(
        act, w.reshape(w.shape[0], w.shape[1], 1, w.shape[2]),
        window_strides=(1, 1),
        padding=[(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return y + cbias
