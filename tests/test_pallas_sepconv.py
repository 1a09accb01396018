"""Fused StarReLU + depthwise-conv kernel (ops/pallas/sepconv_kernel).

Interpret-mode parity vs the XLA oracle on CPU (the attention-kernel test
pattern): forward, dgrad (dx, ds, db), wgrad, and the assembled custom-VJP
cotangents.  The hybrid op's forward IS the oracle composition, so the
tests focus on the Pallas backward kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfmatch_tpu.ops.pallas.sepconv_kernel import (
    _dw_star_dgrad, _dw_star_fwd, _dw_star_wgrad, _row_block,
    dw_star_available, dw_star_reference)

SHAPES = [
    (2, 19, 13, 128, 7),   # th = H (single block), ragged W
    (1, 8, 8, 256, 3),     # K = 3
    (2, 30, 16, 128, 7),   # th = 15, two row blocks + batch
]


def _inputs(B, H, W, C, K, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, K, C)) * 0.2, jnp.float32)
    cb = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    s = jnp.float32(0.8944)
    b = jnp.float32(-0.4472)
    return x, w, cb, s, b


@pytest.mark.parametrize("shape", SHAPES)
def test_fwd_matches_oracle(shape):
    B, H, W, C, K = shape
    x, w, cb, s, b = _inputs(*shape)
    ref = dw_star_reference(x, w, cb, s, b)
    got = _dw_star_fwd(x, w, cb, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_backward_matches_autodiff(shape):
    B, H, W, C, K = shape
    x, w, cb, s, b = _inputs(*shape)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

    def loss(x, w, cb, s, b):
        return jnp.vdot(dw_star_reference(x, w, cb, s, b), g)

    dx_r, dw_r, dcb_r, ds_r, db_r = jax.grad(
        loss, argnums=(0, 1, 2, 3, 4))(x, w, cb, s, b)

    dx, ds, db = _dw_star_dgrad(x, w, s, g, interpret=True)
    dwv = _dw_star_wgrad(x, s, b, g, K=K, interpret=True)
    dcb = jnp.sum(g, axis=(0, 1, 2))

    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dwv), np.asarray(dw_r),
                               atol=np.abs(dw_r).max() * 1e-5)
    np.testing.assert_allclose(np.asarray(dcb), np.asarray(dcb_r),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ds), float(ds_r),
                               rtol=2e-5)
    np.testing.assert_allclose(float(db), float(db_r),
                               rtol=2e-5)


def test_row_block_and_availability():
    # th must divide H, fit the halo, and stay <= 32
    assert _row_block(240, 7) == 30
    assert _row_block(60, 7) == 30
    assert _row_block(19, 7) == 19
    assert _row_block(8, 7) == 8
    assert _row_block(7, 7) == 7
    assert _row_block(5, 7) is None          # halo doesn't fit
    # CPU backend always refuses (the model falls back to XLA ops)
    x = jnp.zeros((1, 60, 60, 256))
    w = jnp.zeros((7, 7, 256))
    assert not dw_star_available(x, w)


def test_sep_conv_cpu_fallback_unchanged():
    """On CPU the model's _sep_conv must keep the plain XLA path (and the
    fused scope must be harmless)."""
    from nerfmatch_tpu.models import backbone as bb
    rng = np.random.default_rng(3)
    p = bb._init_sep_conv(jax.random.PRNGKey(0), 32, 2)
    x = jnp.asarray(rng.normal(size=(1, 9, 9, 32)), jnp.float32)
    base = bb._sep_conv(p, x)
    with bb.fused_sepconv_scope(True):
        fused_scope = bb._sep_conv(p, x)
    with bb.fused_sepconv_scope(False):
        off = bb._sep_conv(p, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fused_scope))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))
