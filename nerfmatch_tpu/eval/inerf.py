"""iNeRF gradient-based pose refinement.

Capability match for ``NeRFMatchEvaluator.inerf_refinement``
(``nerfmatch/nerfmatch_evaluator.py:288-500``): Adam on the camera pose,
mip render of a ds-grid (60x60 at 480/8) differentiable through the ray
origins/directions (z samples are stop-gradded, as in the reference's
``rays.detach()`` sampling + ``t_mean`` re-composition :358-384), photometric
MSE against the downsampled query (+ optional matcher loss), cosine LR decay,
and per-step evaluation either directly on the pose or by re-matching the
refined render + PnP.

TPU redesign: the pose is parametrized as an se(3) delta (rvec, tvec) on the
normalized init pose — a rigid update instead of the reference's raw-4x4
Adam drift — and the whole optimization step is ONE jitted program (render +
loss + grad + Adam update), cached per (renderer, image geometry).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..nerf.compositing import volume_render
from ..nerf.sampling import sample_along_rays
from ..nerf.scene import rays_intersect_sphere
from ..utils.geometry import pose_err, rodrigues, unnormalize_pts

_F32_EPS = float(np.finfo(np.float32).eps)
_STEP_CACHE = {}


def _apply_delta(pose, delta):
    """Right-compose an se(3)-style delta (rvec, tvec) onto a 4x4 pose."""
    R = rodrigues(delta[:3])
    upd = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(delta[3:])
    return pose @ upd


def _gen_rays_from_pose(pose, K_inv, H, W, ds, near=0.01):
    """Differentiable ds-grid ray generation (mirrors evaluator ``gen_rays``,
    reference :232-286)."""
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    xys = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).astype(jnp.float32)
    dirs = xys @ K_inv.T
    o = jnp.broadcast_to(pose[:3, 3], (H, W, 3))
    d = jnp.einsum("ij,hwj->hwi", pose[:3, :3], dirs)
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    far = rays_intersect_sphere(o.reshape(-1, 3), v.reshape(-1, 3), r=1.0)
    far = jnp.where(jnp.isfinite(far), far, 1.0).reshape(H, W, 1)

    dx = jnp.sqrt(jnp.sum((v[:-1] - v[1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[-2:-1]], 0)
    radii = dx[..., None] * 2.0 / jnp.sqrt(12.0)

    rays = jnp.concatenate(
        [o, v, jnp.full_like(o[..., :1], near), far, v, radii], axis=-1)
    rays = rays[ds // 2 :: ds, ds // 2 :: ds].reshape(-1, 12)
    return rays


def _make_step(renderer, H, W, ds, num_optim, lrate, lrdecay, use_match_loss,
               matcher=None):
    """Build the jitted iNeRF optimization step for a fixed geometry."""

    def render_fine(renderer_params, pose):
        rays = _gen_rays_from_pose(pose, renderer_params["_K_inv"], H, W, ds)
        rays_sg = jax.lax.stop_gradient(rays)
        o, viewdirs = rays[:, :3], rays[:, 8:11]

        # Coarse pass (no grads) for the resampling weights.
        (mean_c, var_c), z_vals = sample_along_rays(
            rays_sg, num_pts=renderer.fine_cfg.num_pts, embed_type="mip",
            model_type="coarse", randomized=False, scale_var=1.0)
        raw_c, _ = renderer._forward_nerf(
            jax.lax.stop_gradient(renderer_params["params"])[
                "nerf_coarse" if not renderer.cfg.single_model else "nerf_fine"],
            renderer.coarse_cfg or renderer.fine_cfg, mean_c, var_c,
            rays_sg[:, 8:11], _app(renderer, renderer_params, rays_sg), True)
        rc = volume_render(raw_c[..., :4], z_vals, rays_sg[:, 3:6],
                           white_bg=True, mip=True)

        # Fine resample (z fixed, positions differentiable via o/viewdirs).
        (_, var_f), z_vals_f = sample_along_rays(
            rays_sg, num_pts=renderer.fine_cfg.num_pts, z_vals=z_vals,
            weights=rc["weights"], embed_type="mip", model_type="fine",
            randomized=False, scale_var=1.0)
        mu = (z_vals_f[..., :-1] + z_vals_f[..., 1:]) / 2
        hw = (z_vals_f[..., :-1] - z_vals_f[..., 1:]) / 2
        t_mean = mu + (2 * mu * hw**2) / jnp.maximum(_F32_EPS,
                                                     3 * mu**2 + hw**2)
        pts = o[:, None, :] + t_mean[..., None] * viewdirs[:, None, :]

        inputs = renderer.encode_xyz(pts, var_f)
        S = pts.shape[1]
        de = renderer.encode_dirs(viewdirs)
        inputs = jnp.concatenate(
            [inputs, jnp.broadcast_to(de[:, None, :], (de.shape[0], S, de.shape[-1]))],
            axis=-1)
        app = _app(renderer, renderer_params, rays)
        if app is not None:
            inputs = jnp.concatenate(
                [inputs, jnp.broadcast_to(app[:, None, :], (app.shape[0], S,
                                                            app.shape[-1]))],
                axis=-1)
        from ..nerf.model import nerf_apply

        raw, feats = nerf_apply(renderer_params["params"]["nerf_fine"],
                                renderer.fine_cfg, inputs, val=True)
        rf = volume_render(raw[..., :4], z_vals_f, rays[:, 3:6],
                           white_bg=True, mip=True)
        pts_comp = jnp.sum(rf["weights"][..., None] * pts, axis=-2)
        feat_comp = jnp.sum(rf["weights"][..., None] * feats, axis=-2)
        return rf["rgb"], pts_comp, feat_comp

    def loss_fn(delta, init_pose, renderer_params, img_ds, match_ctx):
        pose = _apply_delta(init_pose, delta)
        rgb, pts, feats = render_fine(renderer_params, pose)
        loss = jnp.mean((rgb - img_ds) ** 2)
        if use_match_loss and matcher is not None:
            from ..ops.matching import dual_softmax
            from ..utils.metrics import compute_matching_loss

            pt3d = unnormalize_pts(pts[None], match_ctx["unnorm"][None])
            im_cf = match_ctx["im_cfeat"]
            pt_cf = matcher.extract_pt_feat(match_ctx["mparams"], feats[None],
                                            pt3d)
            im_cf2, pt_cf2 = matcher.apply_coarse_former(
                match_ctx["mparams"], im_cf, pt_cf)
            conf, _, _ = dual_softmax(
                im_cf2, pt_cf2, match_ctx["mparams"]["temperature"],
                temp_type=matcher.cfg.temp_type)
            # Identity GT like the reference (nerfmatch_evaluator.py:446:
            # eye over the rendered-point count): valid only when the
            # image-token count equals the rendered grid (inerf_ds == the
            # backbone stride 8) — the reference has the same constraint
            # (its (1,N,N) eye fails to broadcast against (1,M,N) too);
            # assert so the failure names the knob instead of an XLA
            # shape error deep in the jit.
            assert conf.shape[1] == conf.shape[2], (
                "use_match_loss requires inerf_ds == model stride 8 "
                f"(image tokens {conf.shape[1]} vs rendered {conf.shape[2]})")
            eye = jnp.eye(conf.shape[1])[None]
            loss = loss + compute_matching_loss(conf, eye)
        return loss, (rgb, pts, feats)

    opt = optax.adam(lrate)

    @jax.jit
    def step(delta, opt_state, step_i, init_pose, renderer_params, img_ds,
             match_ctx):
        if lrdecay:
            lr = lrate * (1 + jnp.cos(jnp.pi * step_i / num_optim)) / 2
        else:
            lr = lrate
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            delta, init_pose, renderer_params, img_ds, match_ctx)
        updates, opt_state = opt.update(grads, opt_state)
        updates = jax.tree_util.tree_map(lambda u: u * (lr / lrate), updates)
        delta = optax.apply_updates(delta, updates)
        return delta, opt_state, loss, aux

    return step, opt


def _app(renderer, renderer_params, rays):
    if not renderer.cfg.appearance_embedding:
        return None
    # Reference quirk reproduced on purpose: iNeRF renders every query
    # with appearance index 1 regardless of the query's sequence
    # (nerfmatch_evaluator.py:393, ``torch.zeros(...) + 1``) — not the
    # per-frame ts the evaluator uses elsewhere.
    ray_id = jnp.ones((rays.shape[0],), jnp.int32)
    return renderer_params["params"]["embedding_a"]["weight"][ray_id]


def inerf_refinement(evaluator, batch, renderer, renderer_params,
                     unnorm_scene, c2w_est, inerf_conf, mutual: bool = True,
                     match_thres: float = 0.0, solver: str = "colmap",
                     rthres: float = 1.0, cache_iters: bool = False,
                     iter_t_errs=None, iter_R_errs=None, debug: bool = False,
                     overlay_ims=None):
    """Refine ``c2w_est`` (world frame); returns (c2w_est, R_err, t_err)."""
    lrate = float(getattr(inerf_conf, "lrate", 0.001))
    lrdecay = bool(getattr(inerf_conf, "lrdecay", False))
    num_optim = int(getattr(inerf_conf, "num_optim", 5))
    eval_pose = bool(getattr(inerf_conf, "eval_pose", False))
    use_match_loss = bool(getattr(inerf_conf, "use_match_loss", False))
    ds = int(getattr(inerf_conf, "ds", 8))

    img = np.asarray(batch["image"])[0]
    H, W = img.shape[:2]
    img_ds = jnp.asarray(img[ds // 2 :: ds, ds // 2 :: ds].reshape(-1, 3))
    K = np.asarray(batch["K"])[0]
    c2w_gt = np.asarray(batch["c2w"])[0]

    scene_norm = np.linalg.inv(np.asarray(unnorm_scene, np.float64))
    init_pose = jnp.asarray(scene_norm @ np.asarray(c2w_est, np.float64),
                            jnp.float32)

    cache_key = (id(renderer), H, W, ds, num_optim, lrate, lrdecay,
                 use_match_loss)
    if cache_key not in _STEP_CACHE:
        if len(_STEP_CACHE) >= 4:
            # Bound the cache: multi-scene eval builds a renderer per
            # scene, and each entry pins its compiled programs + captured
            # renderer for the process lifetime.
            _STEP_CACHE.clear()
        _STEP_CACHE[cache_key] = _make_step(
            renderer, H, W, ds, num_optim, lrate, lrdecay, use_match_loss,
            matcher=evaluator.model if use_match_loss else None)
    step, opt = _STEP_CACHE[cache_key]

    rparams = {"params": renderer_params,
               "_K_inv": jnp.asarray(np.linalg.inv(K), jnp.float32)}
    match_ctx = {"unnorm": jnp.asarray(unnorm_scene, jnp.float32)}
    if use_match_loss:
        match_ctx["mparams"] = evaluator.params
        match_ctx["im_cfeat"] = evaluator.model.extract_im_feat(
            evaluator.params, jnp.asarray(batch["image"])) \
            if evaluator.coarse_only else evaluator.model.extract_im_feat_ms(
                evaluator.params, jnp.asarray(batch["image"]))[0]

    delta = jnp.zeros(6)
    opt_state = opt.init(delta)
    R_err = t_err = float("inf")
    import time as _time

    for j in range(num_optim):
        tj = _time.perf_counter()
        delta, opt_state, loss, (rgb, pts, feats) = step(
            delta, opt_state, jnp.asarray(j, jnp.float32), init_pose,
            rparams, img_ds, match_ctx)
        evaluator.timer["inerf_step_time"].append(_time.perf_counter() - tj)

        if overlay_ims is not None:
            # Blend the refined render over the downsampled query for the
            # failure-case GIF (reference :457-461).
            gh, gw = len(range(ds // 2, H, ds)), len(range(ds // 2, W, ds))
            rendered = np.clip(np.asarray(rgb).reshape(gh, gw, 3), 0, 1)
            query = np.asarray(img_ds).reshape(gh, gw, 3)
            overlay_ims.append(
                (255 * np.clip(0.7 * rendered + 0.3 * query, 0, 1)).astype("uint8"))

        if debug or cache_iters or j == num_optim - 1:
            pose_n = np.asarray(_apply_delta(init_pose, delta))
            c2w_cur = np.asarray(unnorm_scene, np.float64) @ pose_n
            if eval_pose:
                R_err, t_err = map(float, pose_err(
                    jnp.asarray(c2w_gt, jnp.float32),
                    jnp.asarray(c2w_cur, jnp.float32)))
                c2w_est = c2w_cur
            else:
                # Re-match the refined render + PnP.
                pt3d = np.asarray(unnormalize_pts(
                    jnp.asarray(pts)[None], jnp.asarray(unnorm_scene,
                                                        jnp.float32)[None]))[0]
                b = dict(batch)
                b["pt3d"] = pt3d[None]
                b["pt_feat"] = np.asarray(feats)[None]
                b["pt_mask"] = np.ones(pt3d.shape[:1], np.float32)[None]
                c2w_new, R_err, t_err, _ = evaluator.eval_match_pose(
                    b, mutual=mutual, match_thres=match_thres, solver=solver,
                    rthres=rthres)
                if c2w_new is not None:
                    c2w_est = c2w_new
            if cache_iters and 0 < j < num_optim - 1:
                iter_t_errs.append(t_err)
                iter_R_errs.append(R_err)
            if debug:
                print(f"  inerf step={j} loss={float(loss):.4f} "
                      f"t={t_err * 100:.3f}cm R={R_err:.3f}")

    return c2w_est, R_err, t_err
