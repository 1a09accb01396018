"""Fused train kernel: forward parity + gradient check vs jax.grad of the
XLA reference path (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params, nerf_apply
from nerfmatch_tpu.nerf.embedding import ipe_embedding, pe_embedding
from nerfmatch_tpu.nerf.compositing import volume_render
from nerfmatch_tpu.nerf.sampling import sample_gaussians_along_rays
from nerfmatch_tpu.ops.pallas.render_kernel import FusedRenderSpec
from nerfmatch_tpu.ops.pallas.render_train import (
    make_fused_train_render,
    pack_mlp_weights_traced,
)

F = 15
HID = 256
S = 128
N_RAYS = 8  # one ray tile; interpret cost scales with N_RAYS*S
DIRS_DIM = 2 * 3 * 4 + 3


@pytest.fixture(scope="module")
def setup():
    cfg = NerfConfig(layer_num=8, hid_dim=HID, xyz_dim=2 * 3 * F,
                     dirs_dim=DIRS_DIM, use_viewdirs=True, skips=(4,),
                     stop_layer=3)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, (N_RAYS, 3)), jnp.float32)
    d = rng.normal(size=(N_RAYS, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    radii = jnp.full((N_RAYS, 1), 0.002)
    z_vals, (mean, var) = sample_gaussians_along_rays(
        o, d, radii, S, jnp.full((N_RAYS, 1), 0.05),
        jnp.full((N_RAYS, 1), 1.4), randomized=False)
    dirs_pe = pe_embedding(d, 4)
    o8 = jnp.concatenate([o, radii, jnp.zeros((N_RAYS, 4))], axis=-1)
    d8 = jnp.pad(d, ((0, 0), (0, 5)))
    extras = jnp.pad(dirs_pe, ((0, 0), (0, 128 - dirs_pe.shape[1])))
    noise = jnp.asarray(rng.normal(size=(N_RAYS, S)) * 0.1, jnp.float32)
    return cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8, extras, noise


def xla_loss(params, cfg, mean, var, z_vals, d, dirs_pe, noise, target):
    """Reference-path loss: mse(rgb) + sum(weights^2) (exercises both
    cotangents)."""
    enc, _ = ipe_embedding(mean, var, F)
    dirs_b = jnp.broadcast_to(dirs_pe[:, None, :], (N_RAYS, S, DIRS_DIM))
    inputs = jnp.concatenate([enc, dirs_b], axis=-1)
    raw, _ = nerf_apply(params, cfg, inputs, val=True)
    # Inject the density noise exactly like the kernel (pre-relu additive).
    raw = raw.at[..., 3].add(noise)
    out = volume_render(raw[..., :4], z_vals, d, mip=True, white_bg=False)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + 0.1 * jnp.mean(out["weights"] ** 2))


def kernel_loss(params, spec, fused, o8, d8, z_vals, extras, noise, target):
    w = pack_mlp_weights_traced(params, spec)
    rgb, weights = fused(w, o8, d8, z_vals, extras, noise)
    return (jnp.mean((rgb - target) ** 2)
            + 0.1 * jnp.mean(weights ** 2))


def test_fused_train_forward_and_grads(setup):
    cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8, extras, noise = setup
    spec = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                           samples=S, ray_tile=N_RAYS, feat_layer=3)
    fused = make_fused_train_render(spec, interpret=True)
    target = jnp.full((N_RAYS, 3), 0.4)

    # Forward parity.
    w = pack_mlp_weights_traced(params, spec)
    rgb, weights = fused(w, o8, d8, z_vals, extras, noise)
    enc, _ = ipe_embedding(mean, var, F)
    dirs_b = jnp.broadcast_to(dirs_pe[:, None, :], (N_RAYS, S, DIRS_DIM))
    raw, _ = nerf_apply(params, cfg,
                        jnp.concatenate([enc, dirs_b], -1), val=True)
    raw = raw.at[..., 3].add(noise)
    ref = volume_render(raw[..., :4], z_vals, d, mip=True, white_bg=False)
    assert np.allclose(np.asarray(rgb), np.asarray(ref["rgb"]), atol=2e-2)
    assert np.allclose(np.asarray(weights), np.asarray(ref["weights"]),
                       atol=2e-2)

    # Gradient check: bf16 trunk -> compare directions/magnitudes loosely.
    g_ref = jax.grad(lambda p: xla_loss(p, cfg, mean, var, z_vals, d,
                                        dirs_pe, noise, target))(params)
    g_ker = jax.grad(lambda p: kernel_loss(p, spec, fused, o8, d8, z_vals,
                                           extras, noise, target))(params)

    checked = 0
    for path, ref_leaf in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
        ker_leaf = g_ker
        for k in path:
            ker_leaf = ker_leaf[getattr(k, "key", getattr(k, "idx", None))]
        a = np.asarray(ref_leaf).ravel()
        b = np.asarray(ker_leaf).ravel()
        if np.linalg.norm(a) < 1e-7:
            continue
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        ratio = np.linalg.norm(b) / (np.linalg.norm(a) + 1e-12)
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", ""))) for k in path)
        assert cos > 0.98, (name, cos)
        assert 0.8 < ratio < 1.25, (name, ratio)
        checked += 1
    assert checked >= 20  # every weight/bias leaf got a real gradient
