"""Fused Pallas render kernel vs the pure-XLA reference path (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params, nerf_apply
from nerfmatch_tpu.nerf.embedding import ipe_embedding, pe_embedding
from nerfmatch_tpu.nerf.compositing import volume_render, composite_features
from nerfmatch_tpu.nerf.sampling import sample_gaussians_along_rays
from nerfmatch_tpu.ops.pallas.render_kernel import (
    FusedRenderSpec,
    make_fused_render,
    make_spread_matrices,
    pack_mlp_weights,
    prepare_ray_inputs,
)

F = 15
HID = 256
S = 128
N_RAYS = 32
DIRS_DIM = 2 * 3 * 4 + 3  # mip PE with 4 freqs


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
    near = jnp.full((N_RAYS, 1), 0.05)
    far = jnp.full((N_RAYS, 1), 1.4)
    z_vals, (mean, var) = sample_gaussians_along_rays(
        o, d, radii, S, near, far, randomized=False)
    dirs_pe = pe_embedding(d, 4)
    o8 = jnp.concatenate([o, radii, jnp.zeros((N_RAYS, 4))], axis=-1)
    d8 = jnp.pad(d, ((0, 0), (0, 5)))
    return cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8


def test_spread_matrices_match_ipe(setup):
    """mean @ Sp (+phase) reproduces the reference IPE encode layout."""
    cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8 = setup
    spec = FusedRenderSpec(num_freqs=F)
    Sp, Sq, phase = make_spread_matrices(spec)

    m = mean.reshape(-1, 3)
    v = var.reshape(-1, 3)
    m8 = jnp.pad(m, ((0, 0), (0, 5)))
    v8 = jnp.pad(v, ((0, 0), (0, 5)))
    pre = m8 @ Sp + phase
    damp = jnp.exp(-0.5 * (v8 @ Sq))
    enc_kernel = damp * jnp.sin(pre)

    enc_ref, _ = ipe_embedding(m, v, F)
    assert np.allclose(np.asarray(enc_kernel[:, : 2 * 3 * F]),
                       np.asarray(enc_ref), atol=2e-5)
    # Padded cols: sin(0)=0 since Sp rows 3.. are zero and phase 0 there.
    assert np.allclose(np.asarray(enc_kernel[:, 2 * 3 * F :]), 0.0)


def test_fused_kernel_matches_xla(setup):
    cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8 = setup

    # --- XLA reference path
    enc, _ = ipe_embedding(mean, var, F)
    dirs_b = jnp.broadcast_to(dirs_pe[:, None, :], (N_RAYS, S, DIRS_DIM))
    inputs = jnp.concatenate([enc, dirs_b], axis=-1)
    raw, feats = nerf_apply(params, cfg, inputs, val=True)
    ref = volume_render(raw[..., :4], z_vals, d, mip=True, white_bg=False)
    ref_feat = composite_features(ref["weights"], feats, "lin")
    ref_pts = composite_features(ref["weights"], mean, "lin")

    # --- fused kernel (interpret mode on CPU)
    spec = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                           extra_dim=128, samples=S, ray_tile=N_RAYS,
                           feat_layer=3, white_bg=False)
    fused = make_fused_render(spec, interpret=True)
    w = pack_mlp_weights(params, spec, extra_dim_real=DIRS_DIM)
    extras = jnp.pad(dirs_pe, ((0, 0), (0, 128 - dirs_pe.shape[1])))
    out = fused(w, o8, d8, z_vals, extras)

    # bf16 trunk -> tolerances are relative-coarse but must track closely.
    assert np.allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                       atol=2e-2), np.abs(np.asarray(out["rgb"]) -
                                          np.asarray(ref["rgb"])).max()
    assert np.allclose(np.asarray(out["depth"]), np.asarray(ref["depth"]),
                       atol=2e-2)
    assert np.allclose(np.asarray(out["acc"]), np.asarray(ref["acc"]),
                       atol=2e-2)
    w_err = np.abs(np.asarray(out["weights"]) - np.asarray(ref["weights"]))
    assert w_err.max() < 2e-2, w_err.max()
    f_rel = (np.abs(np.asarray(out["feat"]) - np.asarray(ref_feat)).max()
             / (np.abs(np.asarray(ref_feat)).max() + 1e-9))
    assert f_rel < 5e-2, f_rel
    assert np.allclose(np.asarray(out["pts"]), np.asarray(ref_pts), atol=2e-2)


def test_fused_kernel_multi_tile(setup):
    """Grid over multiple ray tiles stitches outputs correctly."""
    cfg, params, z_vals, mean, var, d, dirs_pe, o8, d8 = setup
    spec = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                           samples=S, ray_tile=8, feat_layer=3)
    fused = make_fused_render(spec, interpret=True)
    w = pack_mlp_weights(params, spec, extra_dim_real=DIRS_DIM)
    extras = jnp.pad(dirs_pe, ((0, 0), (0, 128 - dirs_pe.shape[1])))
    out2 = fused(w, o8, d8, z_vals, extras)

    spec1 = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                            samples=S, ray_tile=N_RAYS, feat_layer=3)
    fused1 = make_fused_render(spec1, interpret=True)
    out1 = fused1(w, o8, d8, z_vals, extras)
    assert np.allclose(np.asarray(out1["rgb"]), np.asarray(out2["rgb"]),
                       atol=1e-5)
    assert np.allclose(np.asarray(out1["feat"]), np.asarray(out2["feat"]),
                       atol=1e-4)


def test_fused_hierarchical_matches_renderer():
    """Full two-stage fused pipeline vs NerfRenderer.render_rays (interpret)."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
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
    renderer.fused_interpret = True  # CPU: gate + kernels in interpret mode
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    o = rng.uniform(-0.2, 0.2, (8, 3))
    d = rng.normal(size=(8, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((8, 1), 0.05), np.full((8, 1), 1.4), d,
         np.full((8, 1), 0.002)], -1).astype(np.float32)

    ref = renderer.render_rays(params, jnp.asarray(rays), train=False,
                               ret_pfeat=True, validation=True)

    render, pack = make_fused_hierarchical(renderer, interpret=True,
                                           ray_tile=8)
    wc, wf = pack(params)
    out = render(wc, wf, jnp.asarray(rays))

    assert np.allclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=2e-2)
    assert np.allclose(np.asarray(out["depth_fine"]),
                       np.asarray(ref["depth_fine"]), atol=2e-2)
    f_rel = (np.abs(np.asarray(out["feat_fine"]) -
                    np.asarray(ref["feat_fine"])).max()
             / (np.abs(np.asarray(ref["feat_fine"])).max() + 1e-9))
    assert f_rel < 0.1, f_rel
    assert np.allclose(np.asarray(out["pts_fine"]),
                       np.asarray(ref["pts_fine"]), atol=2e-2)


def test_fused_hierarchical_nonunit_dirs_final_tap():
    """Non-unit rays_d (norm_ray_dir=False rays) + default stop_layer=-1.

    Two former silent divergences: the fused kernels march the unit
    viewdir (``reparam_unit_dir`` must rescale near/far/radii so the
    world-space Gaussians and optical depths match the XLA path, which
    parameterizes by rays_d and scales dists by ||rays_d||), and the
    ``stop_layer=-1`` descriptor must tap the FINAL hidden layer
    (reference models/nerf.py:138: ``out_feats = pt_feat``), not layer 3.
    """
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import (
        make_fused_hierarchical, eval_feat_layer)

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg)  # stop_layer defaults to -1
    renderer.fused_interpret = True
    assert renderer.fused_eval_supported
    assert eval_feat_layer(renderer.fine_cfg) == 7
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    o = rng.uniform(-0.2, 0.2, (8, 3))
    v = rng.normal(size=(8, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    # Pixel-grid-style rays_d: same line, norms 0.8-1.35; far in
    # rays_d-multiples, radii = world growth per unit rays_d.
    scale = rng.uniform(0.8, 1.35, (8, 1))
    d = v * scale
    rays = np.concatenate(
        [o, d, np.full((8, 1), 0.05), np.full((8, 1), 1.1), v,
         np.full((8, 1), 0.002)], -1).astype(np.float32)

    ref = renderer.render_rays(params, jnp.asarray(rays), train=False,
                               ret_pfeat=True, validation=True)

    render, pack = make_fused_hierarchical(renderer, interpret=True,
                                           ray_tile=8)
    wc, wf = pack(params)
    out = render(wc, wf, jnp.asarray(rays))

    assert np.allclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=2e-2)
    # depth converts back to rays_d-multiples.
    assert np.allclose(np.asarray(out["depth_fine"]),
                       np.asarray(ref["depth_fine"]), atol=2e-2)
    assert np.allclose(np.asarray(out["pts_fine"]),
                       np.asarray(ref["pts_fine"]), atol=2e-2)
    f_rel = (np.abs(np.asarray(out["feat_fine"]) -
                    np.asarray(ref["feat_fine"])).max()
             / (np.abs(np.asarray(ref["feat_fine"])).max() + 1e-9))
    assert f_rel < 0.1, f_rel


def test_fused_hierarchical_with_appearance():
    """Appearance embeddings through the fused extras match the XLA path."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": True, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip",
                      "appearance_embed": True},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, num_frames=5, stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(4)
    o = rng.uniform(-0.2, 0.2, (8, 3))
    d = rng.normal(size=(8, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((8, 1), 0.05), np.full((8, 1), 1.4), d,
         np.full((8, 1), 0.002)], -1), jnp.float32)
    ray_id = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)

    ref = renderer.render_rays(params, rays, ray_id=ray_id, train=False,
                               ret_pfeat=True, validation=True)

    render, pack = make_fused_hierarchical(renderer, interpret=True,
                                           ray_tile=8)
    wc, wf = pack(params)
    app = params["embedding_a"]["weight"][ray_id]
    out = render(wc, wf, rays, app)
    assert np.allclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=3e-2)


def test_resample_kernel_matches_xla():
    """Pallas inverse-CDF lookup vs resample_z_from_weights (det + random)."""
    from nerfmatch_tpu.nerf.sampling import resample_z_from_weights
    from nerfmatch_tpu.ops.pallas.resample_kernel import resample_z_pallas

    key = jax.random.PRNGKey(0)
    n, s = 200, 128  # non-multiple of 128 exercises the lane padding
    z = jnp.sort(jax.random.uniform(key, (n, s + 1), minval=0.1, maxval=4.0),
                 axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (n, s)) ** 4

    ref = resample_z_from_weights(z, w)
    got = resample_z_pallas(z, w, interpret=True)
    assert np.max(np.abs(np.asarray(ref) - np.asarray(got))) < 1e-5
    # Sorted output (valid fenceposts for the fine Gaussian cast).
    g = np.asarray(got)
    assert (np.diff(g, axis=-1) >= 0).all()

    k2 = jax.random.PRNGKey(7)
    ref_r = resample_z_from_weights(z, w, randomized=True, key=k2)
    got_r = resample_z_pallas(z, w, randomized=True, key=k2, interpret=True)
    assert np.max(np.abs(np.asarray(ref_r) - np.asarray(got_r))) < 1e-5


def test_fast_exp_accuracy():
    """exp2-split polynomial matches exp to bf16 accuracy on the IPE range."""
    from nerfmatch_tpu.ops.pallas.render_kernel import _fast_exp

    x = -jnp.concatenate([jnp.linspace(0.0, 90.0, 20001),
                          jnp.logspace(-6, 1.5, 2001)])
    got = np.asarray(_fast_exp(x))
    ref = np.asarray(jnp.exp(x))
    rel = np.abs(got - ref) / np.maximum(ref, 1e-37)
    assert rel.max() < 1e-4, rel.max()


def test_from_rays_mode_matches_classic_inputs():
    """from_rays (in-kernel prep + moments) == the o8/d8/extras/tmvr mode."""
    spec_old = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                               samples=S, ray_tile=8, feat_layer=3)
    import dataclasses
    spec_new = dataclasses.replace(spec_old, from_rays=True, dirs_freqs=4)

    cfg = NerfConfig(layer_num=8, hid_dim=HID, xyz_dim=2 * 3 * F,
                     dirs_dim=DIRS_DIM, use_viewdirs=True, skips=(4,),
                     stop_layer=3)
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    w = pack_mlp_weights(params, spec_old, extra_dim_real=DIRS_DIM)

    rng = np.random.default_rng(9)
    o = rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((8, 1), 0.05, np.float32)
    far = np.full((8, 1), 1.4, np.float32)
    radii = np.full((8, 1), 0.002, np.float32)
    rays = jnp.asarray(np.concatenate([o, d, near, far, d, radii], -1))
    t = jnp.linspace(0.0, 1.0, S + 1)
    z = jnp.asarray(near) * (1.0 - t) + jnp.asarray(far) * t

    o8 = jnp.asarray(np.concatenate([o, radii, np.zeros((8, 4), np.float32)], -1))
    d8 = jnp.pad(jnp.asarray(d), ((0, 0), (0, 5)))
    extras = jnp.pad(pe_embedding(jnp.asarray(d), 4),
                     ((0, 0), (0, 128 - DIRS_DIM)))

    old = make_fused_render(spec_old, interpret=True)(w, o8, d8, z, extras)
    new = make_fused_render(spec_new, interpret=True)(w, rays, z)

    for k in ("rgb", "depth", "acc", "weights", "feat", "pts"):
        a, b = np.asarray(old[k]), np.asarray(new[k])
        scale = np.abs(a).max() + 1e-9
        # extras use the polynomial sine in from_rays mode vs jnp.sin in
        # the XLA-prepped path -> bf16-level differences only.
        assert np.abs(a - b).max() / scale < 2e-3, (k, np.abs(a - b).max())


def test_blocked_early_term_parity():
    """Sample-blocked kernel: (a) eps=0 blocked == unblocked to fp tolerance;
    (b) eps=1e-4 skipping on an opaque scene changes outputs by < the bf16
    noise floor (8e-4 rgb) while tail weights become exact zeros."""
    import dataclasses
    from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params
    from nerfmatch_tpu.ops.pallas.render_kernel import (
        FusedRenderSpec, make_fused_render)
    from nerfmatch_tpu.ops.pallas.render_train import pack_mlp_weights_traced

    F, HID, S, R = 15, 256, 128, 8
    cfg = NerfConfig(layer_num=8, hid_dim=HID, xyz_dim=2 * 3 * F,
                     dirs_dim=2 * 3 * 4 + 3, use_viewdirs=True, skips=(4,),
                     stop_layer=3)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    # Opaque scene: a large positive alpha bias saturates rays early.
    params["alpha_linear"]["bias"] = (
        params["alpha_linear"]["bias"] + 60.0)

    rng = np.random.default_rng(4)
    n = 16
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)
    t = jnp.linspace(0.0, 1.0, S + 1)
    z = rays[:, 6:7] * (1.0 - t) + rays[:, 7:8] * t

    base_spec = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                                samples=S, ray_tile=R, feat_layer=3,
                                from_rays=True, dirs_freqs=4)
    w = pack_mlp_weights_traced(params, base_spec)

    ref = make_fused_render(base_spec, interpret=True)(w, rays, z)
    blk = make_fused_render(
        dataclasses.replace(base_spec, sample_blocks=4),
        interpret=True)(w, rays, z)
    et = make_fused_render(
        dataclasses.replace(base_spec, sample_blocks=4,
                            early_term_eps=1e-4),
        interpret=True)(w, rays, z)

    for k in ("rgb", "depth", "acc", "weights", "feat", "pts"):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        assert np.abs(a - b).max() < 1e-5, (k, np.abs(a - b).max())
        c = np.asarray(et[k])
        assert np.abs(a - c).max() < 8e-4, (k, np.abs(a - c).max())

    # The opaque scene must actually exercise the skip: saturated tail
    # weights are exact zeros in the early-terminated render.
    wt = np.asarray(et["weights"])
    assert (wt[:, 96:] == 0.0).all()
    assert not (np.asarray(ref["weights"])[:, 96:] == 0.0).all()


def test_fused_hierarchical_var_scale_and_disp_config():
    """mip_var_scale scales IPE variances inside the kernel (folded into
    the moment-extraction constants) and use_disp no longer gates the
    fused route (the mip sampler ignores it, reference
    render_utils.py:283-295): both configs must route fused AND match the
    XLA path."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": True,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip",
                      "mip_var_scale": 2.0},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    })
    renderer = NerfRenderer(cfg, stop_layer=3)
    renderer.fused_interpret = True  # CPU: gate + kernels in interpret mode
    assert renderer.cfg.mip_var_scale == 2.0 and renderer.cfg.use_disp
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    o = rng.uniform(-0.2, 0.2, (8, 3))
    d = rng.normal(size=(8, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((8, 1), 0.05), np.full((8, 1), 1.4), d,
         np.full((8, 1), 0.002)], -1), jnp.float32)

    ref = renderer.render_rays(params, rays, train=False,
                               ret_pfeat=True, validation=True)
    render, pack = make_fused_hierarchical(renderer, interpret=True,
                                           ray_tile=8)
    wc, wf = pack(params)
    out = render(wc, wf, rays)
    assert np.allclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=2e-2)
    assert np.allclose(np.asarray(out["depth_fine"]),
                       np.asarray(ref["depth_fine"]), atol=2e-2)

    # The scale must actually matter: a var_scale=1 kernel on the same
    # weights disagrees (guards against the scale silently dropping out).
    r1 = NerfRenderer(dict2namespace({**cfg.__dict__}), stop_layer=3)
    r1.cfg = renderer.cfg.__class__(
        **{**renderer.cfg.__dict__, "mip_var_scale": -1.0})
    render1, pack1 = make_fused_hierarchical(r1, interpret=True, ray_tile=8)
    out1 = render1(*pack1(params), rays)
    assert np.abs(np.asarray(out1["rgb_fine"])
                  - np.asarray(out["rgb_fine"])).max() > 1e-4


def test_fused_hierarchical_feat_comb_max():
    """feat_comb='max' (argmax-weight surface sample, reference
    renderer.py:257-260) through the fused kernels: parity vs the XLA
    path, and blocked-carry == unblocked argmax."""
    import dataclasses
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
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
    # feat_comb is an evaluator-set attribute (cache_scene_pts), not YAML.
    renderer.cfg = renderer.cfg.__class__(
        **{**renderer.cfg.__dict__, "feat_comb": "max"})
    renderer.fused_interpret = True  # CPU: gate + kernels in interpret mode
    assert renderer.cfg.feat_comb == "max"
    assert renderer.fused_eval_supported
    params = renderer.init_params(jax.random.PRNGKey(0))
    # Raise density so weights have a clear interior surface peak.
    for mk in ("nerf_coarse", "nerf_fine"):
        params[mk]["alpha_linear"]["bias"] = (
            params[mk]["alpha_linear"]["bias"] + 2.0)

    rng = np.random.default_rng(9)
    n = 16
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)

    ref = renderer.render_rays(params, rays, train=False,
                               ret_pfeat=True, validation=True)
    blocked = make_fused_hierarchical(renderer, interpret=True, ray_tile=8)
    unblocked = make_fused_hierarchical(renderer, interpret=True, ray_tile=8,
                                        sample_blocks=1)
    wc, wf = blocked[1](params)
    out_b = blocked[0](wc, wf, rays)
    out_u = unblocked[0](wc, wf, rays)

    # Blocked carry == unblocked full argmax (identical weights in-kernel).
    for k in ("feat_fine", "pts_fine"):
        e = np.abs(np.asarray(out_b[k]) - np.asarray(out_u[k])).max()
        assert e < 1e-5, (k, e)

    # vs XLA: the selected features carry the kernel's bf16-trunk noise
    # (~5e-4, same as the lin-mode parity bound)...
    f_err = np.abs(np.asarray(out_b["feat_fine"])
                   - np.asarray(ref["feat_fine"])).max()
    assert f_err < 5e-3, f_err
    # ...while pts go through the f32 split-2 selection, so a per-ray pts
    # error ~z-spacing (1e-2) would flag an argmax flip: require the vast
    # majority of rays to select the same surface sample.
    pts_err = np.abs(np.asarray(out_b["pts_fine"])
                     - np.asarray(ref["pts_fine"])).max(-1)
    assert (pts_err < 2e-3).mean() >= 0.9, pts_err
    assert np.allclose(np.asarray(out_b["pts_fine"]),
                       np.asarray(ref["pts_fine"]), atol=2e-2)
    # rgb/depth keep the standard compositing
    assert np.allclose(np.asarray(out_b["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=2e-2)


def test_blocked_feat_max_with_early_termination():
    """feat_max's argmax carry must survive skipped (saturated) blocks: on
    an opaque scene the surface sample sits in an early block, so skipping
    the tail must not change the selected feature."""
    import dataclasses
    from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params
    from nerfmatch_tpu.ops.pallas.render_kernel import (
        FusedRenderSpec, make_fused_render)
    from nerfmatch_tpu.ops.pallas.render_train import pack_mlp_weights_traced

    F, HID, S, R = 15, 256, 128, 8
    cfg = NerfConfig(layer_num=8, hid_dim=HID, xyz_dim=2 * 3 * F,
                     dirs_dim=2 * 3 * 4 + 3, use_viewdirs=True, skips=(4,),
                     stop_layer=3)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    params["alpha_linear"]["bias"] = params["alpha_linear"]["bias"] + 60.0

    rng = np.random.default_rng(13)
    n = 16
    o = rng.uniform(-0.2, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05), np.full((n, 1), 1.4), d,
         np.full((n, 1), 0.002)], -1), jnp.float32)
    t = jnp.linspace(0.0, 1.0, S + 1)
    z = rays[:, 6:7] * (1.0 - t) + rays[:, 7:8] * t

    base = FusedRenderSpec(num_freqs=F, hid_dim=HID, layer_num=8,
                           samples=S, ray_tile=R, feat_layer=3,
                           from_rays=True, dirs_freqs=4, feat_max=True,
                           sample_blocks=4)
    w = pack_mlp_weights_traced(params, base)
    ref = make_fused_render(base, interpret=True)(w, rays, z)
    et = make_fused_render(
        dataclasses.replace(base, early_term_eps=1e-4),
        interpret=True)(w, rays, z)

    # Saturated tail is actually skipped...
    assert (np.asarray(et["weights"])[:, 96:] == 0.0).all()
    # ...and the selected surface feature/point is unchanged (the argmax
    # winner lives in an executed block on an opaque scene).
    for k in ("feat", "pts"):
        e = np.abs(np.asarray(ref[k]) - np.asarray(et[k])).max()
        assert e < 1e-6, (k, e)


def test_fused_hierarchical_int8_trunk():
    """Opt-in int8 serving trunk (quant.py) vs the f32 XLA renderer.

    The trunk runs entirely in the quantized domain (one fused scale row
    per layer; +0.5-bias round-to-nearest through the truncating f32->int8
    cast), so this checks the whole scheme: static calibration, the
    SmoothQuant-style scale fold, skip-layer split quantization, the
    real-unit feat-tap recovery, and the heads staying f32/bf16.
    Tolerances are the int8 quality budget, not the bf16 floor (see
    quant.py header for the measured on-chip deltas).
    """
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
    from nerfmatch_tpu.ops.pallas.quant import calibrate_act_scales

    cfg = dict2namespace({
        "data": {"img_wh": [64, 64]},
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
    renderer.fused_interpret = True
    params = renderer.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    o = rng.uniform(-0.2, 0.2, (8, 3))
    d = rng.normal(size=(8, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((8, 1), 0.05), np.full((8, 1), 1.4), d,
         np.full((8, 1), 0.002)], -1).astype(np.float32)

    ref = renderer.render_rays(params, jnp.asarray(rays), train=False,
                               ret_pfeat=True, validation=True)
    scales = calibrate_act_scales(renderer, params, jnp.asarray(rays))

    render, pack = make_fused_hierarchical(
        renderer, interpret=True, ray_tile=8, trunk_int8="both",
        act_scales=scales)
    wc, wf = pack(params)
    out = render(wc, wf, jnp.asarray(rays))

    d_rgb = np.abs(np.asarray(out["rgb_fine"]) - np.asarray(ref["rgb_fine"]))
    assert d_rgb.mean() < 1e-2 and d_rgb.max() < 8e-2, \
        (d_rgb.mean(), d_rgb.max())
    assert np.allclose(np.asarray(out["depth_fine"]),
                       np.asarray(ref["depth_fine"]), atol=8e-2)
    f_rel = (np.abs(np.asarray(out["feat_fine"]) -
                    np.asarray(ref["feat_fine"])).max()
             / (np.abs(np.asarray(ref["feat_fine"])).max() + 1e-9))
    assert f_rel < 0.15, f_rel

    # coarse-only mode quantizes just the resampling-weights stage.
    render_c, pack_c = make_fused_hierarchical(
        renderer, interpret=True, ray_tile=8, trunk_int8="coarse",
        act_scales=scales)
    wc2, wf2 = pack_c(params)
    out_c = render_c(wc2, wf2, jnp.asarray(rays))
    d_rgb_c = np.abs(np.asarray(out_c["rgb_fine"])
                     - np.asarray(ref["rgb_fine"]))
    assert d_rgb_c.mean() <= d_rgb.mean() + 1e-3

    # "posttap": coarse fully int8 + fine trunk int8 AFTER the descriptor
    # tap.  Its coarse packing equals "coarse" mode's, so the resampled z
    # and the per-sample bf16 taps are identical — int8 error reaches
    # feat/pts only through the compositing weights.  Checked as: (a)
    # posttap stays within the int8 budget vs f32, and (b) its descriptors
    # sit strictly closer to the gate-approved "coarse" render than
    # "both"'s do (the per-sample descriptor drift channel is removed).
    render_p, pack_p = make_fused_hierarchical(
        renderer, interpret=True, ray_tile=8, trunk_int8="posttap",
        act_scales=scales)
    wcp, wfp = pack_p(params)
    out_p = render_p(wcp, wfp, jnp.asarray(rays))
    d_rgb_p = np.abs(np.asarray(out_p["rgb_fine"])
                     - np.asarray(ref["rgb_fine"]))
    assert d_rgb_p.mean() < 1e-2 and d_rgb_p.max() < 8e-2, \
        (d_rgb_p.mean(), d_rgb_p.max())
    assert np.allclose(np.asarray(out_p["depth_fine"]),
                       np.asarray(ref["depth_fine"]), atol=8e-2)
    fc = np.asarray(out_c["feat_fine"])
    d_p = np.abs(np.asarray(out_p["feat_fine"]) - fc).mean()
    d_b = np.abs(np.asarray(out["feat_fine"]) - fc).mean()
    assert d_p < d_b, (d_p, d_b)
    pc = np.asarray(out_c["pts_fine"])
    dp_p = np.abs(np.asarray(out_p["pts_fine"]) - pc).mean()
    dp_b = np.abs(np.asarray(out["pts_fine"]) - pc).mean()
    assert dp_p < dp_b, (dp_p, dp_b)


def test_renderer_int8_serving_mode():
    """cfg render.trunk_int8 routes predict() through the quantized fused
    path with LAZY per-scene calibration (renderer.calibrate_int8), and a
    missing calibration fails loudly on the direct program accessor."""
    from nerfmatch_tpu.config import dict2namespace
    from nerfmatch_tpu.nerf.renderer import NerfRenderer

    base = {
        "data": {"img_wh": [64, 64]},
        "render": {"chunksize": 4096, "use_viewdirs": True, "use_disp": False,
                   "perturb": False, "white_bg": False, "noise_std": 0.0},
        "embedding": {"xyz_num_freqs": 15, "dirs_num_freqs": 4, "type": "mip"},
        "coarse_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                        "output_dim": 4, "skips": [4], "num_pts": 128},
        "fine_nerf": {"method": "NeRF", "layer_num": 8, "hid_dim": 256,
                      "output_dim": 4, "skips": [4], "num_pts": 128},
        "loss": {},
    }
    import copy
    cfg8 = copy.deepcopy(base)
    cfg8["render"]["trunk_int8"] = "both"
    r_f32 = NerfRenderer(dict2namespace(base), stop_layer=3)
    r_i8 = NerfRenderer(dict2namespace(cfg8), stop_layer=3)
    r_f32.fused_interpret = r_i8.fused_interpret = True
    params = r_f32.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(12)
    o = rng.uniform(-0.2, 0.2, (128, 3))
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((128, 1), 0.05), np.full((128, 1), 1.4), d,
         np.full((128, 1), 0.002)], -1).astype(np.float32)

    # Uncalibrated direct program access fails loudly.
    with pytest.raises(RuntimeError, match="calibrate_int8"):
        r_i8._fused_eval  # noqa: B018

    ref = r_f32.predict(params, jnp.asarray(rays), ret_pfeat=True)
    out = r_i8.predict(params, jnp.asarray(rays), ret_pfeat=True)
    assert r_i8.act_scales is not None  # lazy calibration happened
    d_rgb = np.abs(out["rgb_fine"] - ref["rgb_fine"])
    assert d_rgb.mean() < 1e-2 and d_rgb.max() < 8e-2, \
        (d_rgb.mean(), d_rgb.max())
    f_rel = (np.abs(out["feat_fine"] - ref["feat_fine"]).max()
             / (np.abs(ref["feat_fine"]).max() + 1e-9))
    assert f_rel < 0.15, f_rel
