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


def test_fused_train_hierarchical_from_rays_interpret():
    """The from_rays two-stage train render (interpret): finite outputs,
    gradients flow to both models, and a few adam steps reduce the loss."""
    import optax
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_train import \
        make_fused_train_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [32, 32]},
        # noise_std > 0: at random init relu(sigma) is 0 everywhere (fully
        # transparent) and no gradient flows; the density noise (the
        # reference's randomized training scheme) breaks the dead-relu.
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": True, "white_bg": False, "noise_std": 1.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))
    train_render = make_fused_train_hierarchical(renderer, interpret=True)

    rng = np.random.default_rng(0)
    n = 8
    o = rng.uniform(-0.3, 0.3, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.5), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

    def loss_fn(p, key):
        out = train_render(p, rays, key)
        return (jnp.mean((out["rgb_fine"] - tgt) ** 2)
                + 0.5 * jnp.mean((out["rgb_coarse"] - tgt) ** 2))

    opt = optax.adam(1e-2)
    os_ = opt.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(4):
        key, k = jax.random.split(key)
        loss, g = jax.value_and_grad(loss_fn)(params, k)
        losses.append(float(loss))
        for mk in ("nerf_coarse", "nerf_fine"):
            gn = sum(float(jnp.sum(jnp.abs(x)))
                     for x in jax.tree_util.tree_leaves(g[mk]))
            assert np.isfinite(gn) and gn > 0, (mk, gn)
        up, os_ = opt.update(g, os_)
        params = optax.apply_updates(params, up)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_fused_train_from_rays_matches_classic(setup):
    """from_rays train kernel == classic (o8/d8/extras/tmvr) bit-for-bit."""
    import dataclasses
    from nerfmatch_tpu.ops.pallas.render_train import pack_mlp_weights_traced

    cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8, extras, noise = setup
    spec_r = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                             samples=S, ray_tile=N_RAYS, feat_layer=3,
                             from_rays=True, dirs_freqs=4)
    spec_c = dataclasses.replace(spec_r, from_rays=False)
    fused_r = make_fused_train_render(spec_r, interpret=True)
    fused_c = make_fused_train_render(spec_c, interpret=True)
    w = pack_mlp_weights_traced(params, spec_r)

    o = o8[:, :3]
    dd = d8[:, :3]
    radii = o8[:, 3:4]
    rays = jnp.concatenate(
        [o, dd, jnp.full((N_RAYS, 1), 0.05), jnp.full((N_RAYS, 1), 1.4),
         dd, radii], axis=-1)
    # Positive density noise: at random init relu(sigma) can be dead.
    noise_p = jnp.abs(noise) + 1.0

    rgb_r, wt_r = fused_r(w, rays, z_vals, noise_p)
    rgb_c, wt_c = fused_c(w, o8, d8, z_vals, extras, noise_p)
    assert np.abs(np.asarray(rgb_r) - np.asarray(rgb_c)).max() < 1e-6
    assert np.abs(np.asarray(wt_r) - np.asarray(wt_c)).max() < 1e-6


def test_fused_train_extras_grad_appearance(setup):
    """extras_grad: appearance rows riding in extras get gradients that
    match jax.grad of the XLA path (table gather -> concat -> views branch)."""
    _, _, z_vals, mean, var, d, dirs_pe, o8, d8, _, noise = setup
    APP, VOCAB = 16, 4
    cfg = NerfConfig(layer_num=8, hid_dim=HID, xyz_dim=2 * 3 * F,
                     dirs_dim=DIRS_DIM, app_dim=APP, use_viewdirs=True,
                     skips=(4,), stop_layer=3)
    from nerfmatch_tpu.nerf.model import init_nerf_params as _init
    params = _init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(VOCAB, APP)) * 0.1, jnp.float32)
    ray_id = jnp.arange(N_RAYS) % VOCAB
    spec = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                           samples=S, ray_tile=N_RAYS, feat_layer=3)
    fused = make_fused_train_render(spec, interpret=True, extras_grad=True)
    target = jnp.full((N_RAYS, 3), 0.4)

    def xla_loss_app(p):
        prm, tab = p
        enc, _ = ipe_embedding(mean, var, F)
        dirs_b = jnp.broadcast_to(dirs_pe[:, None, :], (N_RAYS, S, DIRS_DIM))
        app_b = jnp.broadcast_to(tab[ray_id][:, None, :], (N_RAYS, S, APP))
        raw, _ = nerf_apply(prm, cfg,
                            jnp.concatenate([enc, dirs_b, app_b], -1),
                            val=True)
        raw = raw.at[..., 3].add(noise)
        out = volume_render(raw[..., :4], z_vals, d, mip=True, white_bg=False)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 0.1 * jnp.mean(out["weights"] ** 2))

    def ker_loss_app(p):
        prm, tab = p
        w = pack_mlp_weights_traced(prm, spec)
        ex = jnp.pad(jnp.concatenate([dirs_pe, tab[ray_id]], -1),
                     ((0, 0), (0, 128 - DIRS_DIM - APP)))
        rgb, weights = fused(w, o8, d8, z_vals, ex, noise)
        return (jnp.mean((rgb - target) ** 2)
                + 0.1 * jnp.mean(weights ** 2))

    # Forward parity with app rows present.
    l_ref = float(xla_loss_app((params, table)))
    l_ker = float(ker_loss_app((params, table)))
    assert abs(l_ref - l_ker) < 2e-2 * max(1.0, abs(l_ref))

    g_ref = jax.grad(xla_loss_app)((params, table))[1]
    g_ker = jax.grad(ker_loss_app)((params, table))[1]
    a, b = np.asarray(g_ref).ravel(), np.asarray(g_ker).ravel()
    assert np.linalg.norm(a) > 1e-7  # the table actually matters
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    ratio = np.linalg.norm(b) / (np.linalg.norm(a) + 1e-12)
    assert cos > 0.98, cos
    assert 0.8 < ratio < 1.25, ratio


def test_fused_train_hierarchical_appearance_interpret():
    """Two-stage fused train with appearance embeddings: the embedding_a
    table receives gradient and a few adam steps reduce the loss (the
    nerf_trainer gate removal relies on this path)."""
    import optax
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_train import \
        make_fused_train_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [32, 32]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": True, "white_bg": False, "noise_std": 1.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip",
                      "appearance_embed": True},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, num_frames=4, stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))
    train_render = make_fused_train_hierarchical(renderer, interpret=True)

    rng = np.random.default_rng(0)
    n = 8
    o = rng.uniform(-0.3, 0.3, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.5), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)
    ray_id = jnp.arange(n, dtype=jnp.int32) % 4
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

    def loss_fn(p, key):
        out = train_render(p, rays, key, ray_id=ray_id)
        return (jnp.mean((out["rgb_fine"] - tgt) ** 2)
                + 0.5 * jnp.mean((out["rgb_coarse"] - tgt) ** 2))

    opt = optax.adam(1e-2)
    os_ = opt.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(3):
        key, k = jax.random.split(key)
        loss, g = jax.value_and_grad(loss_fn)(params, k)
        losses.append(float(loss))
        ga = float(jnp.sum(jnp.abs(g["embedding_a"]["weight"])))
        assert np.isfinite(ga) and ga > 0, ga
        up, os_ = opt.update(g, os_)
        params = optax.apply_updates(params, up)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_fused_train_var_scale_threads_through():
    """mip_var_scale reaches the train kernels' staged moments: scaled and
    unscaled runs on identical params/keys must differ, and grads stay
    finite (the eval-path parity test pins the scaled math against XLA)."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_train import \
        make_fused_train_hierarchical

    def build(scale):
        cfg = dict2namespace({
            "data": {"img_wh": [32, 32]},
            "render": {"chunksize": 4096, "use_viewdirs": True,
                       "use_disp": False, "perturb": True,
                       "white_bg": False, "noise_std": 0.0},
            "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4,
                          "type": "mip", "mip_var_scale": scale},
            "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                            "output_dim": 4, "skips": [4], "num_pts": 128},
            "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                          "output_dim": 4, "skips": [4], "num_pts": 128},
            "loss": {},
        })
        return NerfRenderer(cfg, stop_layer=3)

    r2 = build(2.0)
    r2.fused_interpret = True  # CPU: gate in interpret mode
    assert r2.fused_eval_supported
    params = r2.init_params(jax.random.PRNGKey(0))
    # Push density up so rays are not fully transparent at init.
    for mk in ("nerf_coarse", "nerf_fine"):
        params[mk]["alpha_linear"]["bias"] = (
            params[mk]["alpha_linear"]["bias"] + 3.0)

    rng = np.random.default_rng(5)
    n = 8
    o = rng.uniform(-0.3, 0.3, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.5), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)
    key = jax.random.PRNGKey(3)

    out2 = make_fused_train_hierarchical(r2, interpret=True)(
        params, rays, key)
    out1 = make_fused_train_hierarchical(build(-1.0), interpret=True)(
        params, rays, key)
    diff = np.abs(np.asarray(out2["rgb_fine"])
                  - np.asarray(out1["rgb_fine"])).max()
    assert diff > 1e-5, diff

    def loss_fn(p):
        out = make_fused_train_hierarchical(r2, interpret=True)(p, rays, key)
        return jnp.mean(out["rgb_fine"] ** 2)

    g = jax.grad(loss_fn)(params)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g["nerf_fine"]))
    assert np.isfinite(gn) and gn > 0


def test_fused_train_nonunit_dirs_matches_xla():
    """Classic fused train staging under non-unit rays_d (norm_ray_dir=False
    rays) must match render_rays(train=True): ``reparam_unit_dir`` rescales
    near/far/radii so the unit-viewdir kernel march reproduces the XLA
    rays_d parameterization exactly (deterministic: perturb off, noise 0)."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_train import \
        make_fused_train_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [32, 32]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))
    train_render = make_fused_train_hierarchical(renderer, interpret=True)

    rng = np.random.default_rng(7)
    n = 8
    o = rng.uniform(-0.3, 0.3, (n, 3))
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    d = v * rng.uniform(0.8, 1.35, (n, 1))   # pixel-grid-style norms
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.1), v,
         np.full((n, 1), 0.002)], -1), jnp.float32)

    out = train_render(params, rays, jax.random.PRNGKey(3))
    ref = renderer.render_rays(params, rays, key=jax.random.PRNGKey(3),
                               train=True)
    for k in ("rgb_coarse", "rgb_fine"):
        err = np.abs(np.asarray(out[k]) - np.asarray(ref[k])).max()
        assert err < 2e-2, (k, err)
