"""Ray sampling: stratified init, inverse-CDF hierarchical resampling, and the
mip-NeRF conical-frustum Gaussian casting/resampling.

Covers the math of ``nerfmatch/nerf/render_utils.py:107-173, 233-323,
326-450, 453-615`` with TPU-first formulations:

* the PDF inversions use a broadcast-comparison searchsorted (dense VPU
  compare+reduce) instead of the reference's masked max/min with an internal
  1000-row Python chunk loop — no dynamic shapes, no host loop, fuses under
  jit;
* randomized variants take explicit ``jax.random`` keys;
* ``sorted_piecewise_constant_pdf``'s randomized draw follows the standard
  mip-NeRF jittered-uniform scheme (the reference's torch port at
  ``render_utils.py:479-486`` double-adds the stratified offsets, a port bug;
  the deterministic path is bit-matching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rays import RAY_FAR, RAY_NEAR, RAY_RADII

_F32_EPS = jnp.finfo(jnp.float32).eps


def _searchsorted_right(cdf, u):
    """Batched ``searchsorted(..., side='right')`` as a broadcast comparison
    count: index = #{k : cdf[k] <= u}.  One (N, B, S) compare + reduce —
    dense VPU work instead of the per-row gather loops a vmapped
    ``jnp.searchsorted`` lowers to on TPU.
    """
    return jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2)


# ---------------------------------------------------------------------------
# Classic NeRF sampling
# ---------------------------------------------------------------------------

def sample_pts_init(rays_o, rays_d, near, far, num_pts: int = 64,
                    use_disp: bool = False, perturb: bool = False, key=None):
    """Stratified z-init between near/far (linear in depth or disparity)."""
    t_vals = jnp.linspace(0.0, 1.0, num_pts, dtype=rays_o.dtype)
    if use_disp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, (rays_o.shape[0], num_pts))

    if perturb:
        assert key is not None, "perturbed sampling needs a PRNG key"
        mids = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return pts, z_vals


def sample_pdf(bins, weights, num_samples: int, det: bool = False, key=None,
               eps: float = 1e-5):
    """Classic NeRF hierarchical sampling: invert the piecewise-constant CDF
    over ``bins`` (N+1 per CDF entry convention below) weighted by ``weights``.

    bins: (..., B); weights: (..., B-1).  Matches torch ``searchsorted``
    right=True semantics of the reference (``render_utils.py:233-264``).
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., B)

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
    else:
        assert key is not None
        u = jax.random.uniform(key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype)

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def sample_pts_fine(rays_o, rays_d, z_vals, weights, num_pts: int = 64,
                    perturb: bool = False, key=None):
    """Resample by the coarse weights and merge+sort with the coarse z_vals."""
    z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(z_mids, weights[..., 1:-1], num_pts,
                           det=(not perturb), key=key)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return pts, z_vals


# ---------------------------------------------------------------------------
# mip-NeRF Gaussian casting
# ---------------------------------------------------------------------------

def lift_gaussian(d, t_mean, t_var, r_var, diag: bool = True):
    """Lift a 1D Gaussian along ray direction ``d`` into 3D (mean, cov)."""
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))
    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1], dtype=d.dtype)
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag: bool = True,
                                stable: bool = True):
    """Moment-matched Gaussian of a conical frustum along axis ``d`` between
    distances t0..t1 (mip-NeRF eq. 7, numerically-stable form)."""
    if stable:
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        denom = jnp.maximum(_F32_EPS, 3.0 * mu**2 + hw**2)
        t_mean = mu + (2.0 * mu * hw**2) / denom
        t_var = hw**2 / 3.0 - (4.0 / 15.0) * ((hw**4 * (12.0 * mu**2 - hw**2)) / denom**2)
        r_var = base_radius**2 * (mu**2 / 4.0 + (5.0 / 12.0) * hw**2
                                  - (4.0 / 15.0) * hw**4 / denom)
    else:
        t_mean = (3.0 * (t1**4 - t0**4)) / (4.0 * (t1**3 - t0**3))
        r_var = base_radius**2 * (3.0 / 20.0 * (t1**5 - t0**5) / (t1**3 - t0**3))
        t_mosq = 3.0 / 5.0 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(t_vals, origins, directions, radii, ray_shape: str = "cone",
              diag: bool = True):
    """Cast cone-shaped rays: fencepost t_vals (..., S+1) -> S Gaussians."""
    t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
    if ray_shape != "cone":
        raise NotImplementedError(f"ray_shape={ray_shape}")
    means, covs = conical_frustum_to_gaussian(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs


def sample_gaussians_along_rays(origins, directions, radii, num_samples: int,
                                near, far, randomized: bool = False, key=None,
                                lindisp: bool = False, ray_shape: str = "cone",
                                diag: bool = True):
    """mip-NeRF stratified sampling -> (t_vals (..., S+1), (means, covs))."""
    batch = origins.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=origins.dtype)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        assert key is not None
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, (batch, num_samples + 1), dtype=origins.dtype)
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, (batch, num_samples + 1))
    means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape, diag)
    return t_vals, (means, covs)


def sorted_piecewise_constant_pdf(bins, weights, num_samples: int,
                                  randomized: bool = False, key=None):
    """Invert a piecewise-constant PDF over sorted ``bins``.

    bins: (..., B); weights: (..., B-1) -> samples (..., num_samples).
    Deterministic path spans [0, 1-eps] to bit-match the reference/jax
    convention; randomized path uses jittered uniforms.
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # (..., B)

    if randomized:
        assert key is not None
        s = 1.0 / num_samples
        base = jnp.arange(num_samples, dtype=cdf.dtype) * s
        u = base + jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype,
            minval=0.0, maxval=s - _F32_EPS,
        )
        u = jnp.minimum(u, 1.0 - _F32_EPS)
    else:
        u = jnp.linspace(0.0, 1.0 - _F32_EPS, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

    # Gather-free interval lookup: mask[n, k, s] = (cdf[k] <= u[s]) is a
    # prefix in k (cdf sorted), so the interval endpoints are masked
    # max/min reductions — dense VPU work instead of take_along_axis
    # gathers, which dominate this op's runtime on TPU.
    mask = cdf[..., :, None] <= u[..., None, :]          # (N, B, S)
    big = jnp.float32(1e10)
    cdf_g0 = jnp.max(jnp.where(mask, cdf[..., :, None], -big), axis=-2)
    cdf_g1 = jnp.min(jnp.where(mask, big, cdf[..., :, None]), axis=-2)
    bins_g0 = jnp.max(jnp.where(mask, bins[..., :, None], -big), axis=-2)
    bins_g1 = jnp.min(jnp.where(mask, big, bins[..., :, None]), axis=-2)
    # Clamp the degenerate edges (u below cdf[0] / above cdf[-1]).
    cdf_g0 = jnp.maximum(cdf_g0, cdf[..., :1])
    cdf_g1 = jnp.minimum(cdf_g1, cdf[..., -1:])
    bins_g0 = jnp.maximum(bins_g0, bins[..., :1])
    bins_g1 = jnp.minimum(bins_g1, bins[..., -1:])

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)


def resample_z_from_weights(t_vals, weights, randomized: bool = False,
                            key=None, stop_grad: bool = True,
                            resample_padding: float = 0.01):
    """mip-NeRF weight-blurred z resampling only (no Gaussian cast) — the
    fused Pallas path re-derives the Gaussians in-kernel from z."""
    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1
    )
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    weights_r = weights_blur + resample_padding

    new_t_vals = sorted_piecewise_constant_pdf(
        t_vals, weights_r, t_vals.shape[-1], randomized=randomized, key=key
    )
    if stop_grad:
        new_t_vals = jax.lax.stop_gradient(new_t_vals)
    return new_t_vals


def resample_gaussians_along_rays(origins, directions, radii, t_vals, weights,
                                  randomized: bool = False, key=None,
                                  stop_grad: bool = True,
                                  resample_padding: float = 0.01,
                                  ray_shape: str = "cone", diag: bool = True):
    """mip-NeRF weight-blurred PDF resampling (same sample count as t_vals)."""
    new_t_vals = resample_z_from_weights(
        t_vals, weights, randomized=randomized, key=key, stop_grad=stop_grad,
        resample_padding=resample_padding)
    means, covs = cast_rays(new_t_vals, origins, directions, radii, ray_shape, diag)
    return new_t_vals, (means, covs)


# ---------------------------------------------------------------------------
# Dispatcher (mirrors the reference's sample_smth_along_rays :267-323)
# ---------------------------------------------------------------------------

def sample_along_rays(rays, num_pts: int = 64, z_vals=None, weights=None,
                      use_disp: bool = False, perturb: bool = False,
                      embed_type: str = "normal", model_type: str = "coarse",
                      randomized: bool = True, resample_padding: float = 0.01,
                      scale_var: float = -1.0, key=None):
    """Unified sampling entry: classic stratified/hierarchical or mip Gaussian.

    Returns (pts, z_vals) where pts is (..., S, 3) for classic rays or a
    ``(means, vars)`` tuple for mip rays.
    """
    rays_o, rays_d = rays[..., 0:3], rays[..., 3:6]
    if embed_type == "mip":
        near, far = rays[..., RAY_NEAR : RAY_NEAR + 1], rays[..., RAY_FAR : RAY_FAR + 1]
        radii = rays[..., RAY_RADII : RAY_RADII + 1]
        if model_type == "coarse":
            z_vals, (mean, var) = sample_gaussians_along_rays(
                rays_o, rays_d, radii, num_pts, near, far,
                randomized=randomized, key=key, lindisp=False,
            )
        else:
            z_vals, (mean, var) = resample_gaussians_along_rays(
                rays_o, rays_d, radii, z_vals, weights,
                randomized=randomized, key=key, stop_grad=True,
                resample_padding=resample_padding,
            )
        if scale_var > 0:
            var = scale_var * var
        return (mean, var), z_vals

    near, far = rays[..., RAY_NEAR : RAY_NEAR + 1], rays[..., RAY_FAR : RAY_FAR + 1]
    if z_vals is None:
        return sample_pts_init(rays_o, rays_d, near, far, num_pts=num_pts,
                               use_disp=use_disp, perturb=perturb, key=key)
    return sample_pts_fine(rays_o, rays_d, z_vals, weights, num_pts=num_pts,
                           perturb=perturb, key=key)
