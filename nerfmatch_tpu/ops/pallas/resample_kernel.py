"""Pallas inverse-CDF resample: the hierarchical z resampling in VMEM.

Semantically identical to ``nerf/sampling.py: resample_z_from_weights``
(the mip-NeRF weight-blurred piecewise-constant PDF inversion, reference
``render_utils.py:453-615``), but the interval lookup — a (rays, B, S)
broadcast-compare with four masked reductions — runs as one Pallas kernel
with rays in the LANE axis, so the O(B*S) per-ray tensors live entirely in
VMEM.  The XLA formulation materializes ~600 MB of (N, 129, 129) HBM
intermediates per 9216-ray batch and measures 7.2 ms on a v5e chip; this
kernel does the same math in ~1 ms.

Layout: the cheap O(S) prep (weight blur, pdf, cdf cumsum, u draw) stays in
XLA on the natural (N, S) layout; bins/cdf/u are transposed to (S+1, N)
(rays -> lanes) so the in-kernel compare can put the cdf index on the
sublane axis of a 3D slab — the (rays-in-sublanes) layout would need a
lane<->sublane relayout Mosaic does not support.  Padded cdf rows are +big
(outside every mask prefix) and padded bins rows +big (identity for the
min reduction), making the pad rows inert.

The result is stop-gradient by contract (as in the reference), so no VJP
is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_EPS = float(np.finfo(np.float32).eps)
_BIG = 1e10


def _lookup_kernel(bins_ref, cdf_ref, u_ref, out_ref):
    bins_t = bins_ref[...]                       # (Bp, L)
    cdf_t = cdf_ref[...]                         # (Bp, L)
    u = u_ref[...]                               # (Sp, L)

    # mask[s, b, l] = cdf[b, l] <= u[s, l] — a prefix in b (cdf sorted).
    mask = cdf_t[None, :, :] <= u[:, None, :]    # (Sp, Bp, L)
    cdf_g0 = jnp.max(jnp.where(mask, cdf_t[None], -_BIG), axis=1)
    cdf_g1 = jnp.min(jnp.where(mask, _BIG, cdf_t[None]), axis=1)
    bins_g0 = jnp.max(jnp.where(mask, bins_t[None], -_BIG), axis=1)
    bins_g1 = jnp.min(jnp.where(mask, _BIG, bins_t[None]), axis=1)

    # Edge clamps (cdf[0] == 0, cdf[-1] == 1; bins row 0 is the near plane).
    cdf_g0 = jnp.maximum(cdf_g0, 0.0)
    cdf_g1 = jnp.minimum(cdf_g1, 1.0)
    bins_g0 = jnp.maximum(bins_g0, bins_t[0:1, :])

    d = cdf_g1 - cdf_g0
    # g0 <= u < g1 guarantees d > 0 on real rows; guard pad rows anyway.
    t = jnp.clip(jnp.where(d > 0, (u - cdf_g0) / jnp.where(d > 0, d, 1.0),
                           0.0), 0.0, 1.0)
    out_ref[...] = bins_g0 + t * (bins_g1 - bins_g0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resample_lookup(bins, cdf, u, interpret: bool = False):
    """bins/cdf (N, B) sorted, u (N, S) in [0, 1) -> samples (N, S)."""
    n, b_real = bins.shape
    s_real = u.shape[-1]
    lanes = 128
    bp = -(-b_real // 8) * 8
    sp = -(-s_real // 8) * 8
    n_pad = (-n) % lanes

    def pad_t(x, rows, fill):
        x_t = jnp.pad(x, ((0, n_pad), (0, rows - x.shape[-1])),
                      constant_values=fill).T
        return x_t

    bins_t = pad_t(bins, bp, _BIG)
    cdf_t = pad_t(cdf, bp, _BIG)
    u_t = pad_t(u, sp, 0.0)
    npad = n + n_pad

    out_t = pl.pallas_call(
        _lookup_kernel,
        grid=(npad // lanes,),
        in_specs=[
            pl.BlockSpec((bp, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sp, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp, npad), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(bins_t, cdf_t, u_t)
    return out_t[:s_real, :n].T


def resample_z_pallas(t_vals, weights, randomized: bool = False, key=None,
                      resample_padding: float = 0.01,
                      interpret: bool = False):
    """Drop-in for ``resample_z_from_weights`` (always stop-gradient)."""
    t_vals = jax.lax.stop_gradient(t_vals)
    weights = jax.lax.stop_gradient(weights)

    # Weight blur (mip-NeRF dilation) — O(S) lane math, stays in XLA.
    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    w = weights_blur + resample_padding

    # pdf/cdf prep, bit-matching sorted_piecewise_constant_pdf.
    eps = 1e-5
    weight_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    w = w + padding / w.shape[-1]
    weight_sum = weight_sum + padding
    pdf = w / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])],
        axis=-1)                                     # (N, S+1)

    num_samples = t_vals.shape[-1]
    if randomized:
        assert key is not None
        s = 1.0 / num_samples
        base = jnp.arange(num_samples, dtype=cdf.dtype) * s
        u = base + jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype,
            minval=0.0, maxval=s - _F32_EPS)
        u = jnp.minimum(u, 1.0 - _F32_EPS)
    else:
        u = jnp.linspace(0.0, 1.0 - _F32_EPS, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

    return _resample_lookup(t_vals, cdf, u, interpret=interpret)
