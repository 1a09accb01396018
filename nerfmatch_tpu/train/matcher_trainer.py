"""Matcher training runtimes (coarse "Mini" + coarse-to-fine "Full").

Capability match for ``NeRFMatchCoarseTrainer``/``train``
(``nerfmatch_coarse_trainer.py:391-701``) and ``NeRFMatchMSTrainer``
(``nerfmatch_c2f_trainer.py:554-880``):

* focal matching loss on the dual-softmax conf matrix; feature-l2 metric;
* c2f adds the fine loss ('match' global-pixel l2/std or 'exp' local LoFTR
  expectation) with the ``coarse_only_epochs`` curriculum and fixed-budget
  GT-padded coarse matches during training;
* batch-size-adaptive LR ``clr * (devices * bs) / cbs``;
* val-epoch pose metrics (host PnP over predicted matches) -> median t/R;
  checkpoints on best val loss and best median translation (+ last, resume).

TPU-first: the train step is one jitted SPMD program over the mesh (batch
sharded on ``data``); pose-metric PnP runs host-side on val only — the
reference solves PnP inside every training step (``§3.3``), a per-step
device->host sync we deliberately drop from the hot path.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import namespace2dict
from ..data import init_data_loader
from ..models.attention import fused_attention_scope
from ..models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
from ..models.matcher_coarse import CoarseMatcherConfig, NeRFMatcherCoarse
from ..ops.matching import dense_to_match_lists, dual_softmax, \
    extract_mutual_matches, pad_matches_with_gt
from ..parallel.mesh import all_gather_host, make_mesh, replicate_params, \
    shard_batch
from ..utils import get_logger
from ..utils.metrics import (
    compute_feat_l2,
    compute_fine_loss_l2_std,
    compute_fine_match_loss_l2_std,
    compute_matching_loss,
    compute_pose_metrics_host,
)
from ..utils.optim import config_adaptive_lr, get_lr, init_optimizer, \
    make_lr_schedule, set_lr
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .logging import MetricsLogger

logger = get_logger(level="INFO", name="matcher_trainer")


# ---------------------------------------------------------------------------
# Forward + loss (pure)
# ---------------------------------------------------------------------------

def coarse_losses(conf, conf_gt, im_n, pt_n, clamp: bool):
    coarse_loss = compute_matching_loss(conf, conf_gt, clamp=clamp)
    feat_l2 = compute_feat_l2(im_n, pt_n, conf_gt)
    return coarse_loss, feat_l2


def _build_step(body, mesh, n_sharded: int):
    """jit the step body; on a multi-device mesh wrap it in shard_map with
    the first ``n_sharded`` batch args split over ``data`` (params/opt_state
    and trailing scalars/keys replicated, grads pmean'd inside ``body``)."""
    import functools

    from jax.sharding import PartitionSpec as P

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(body)
    # body signature: (params, opt_state, <n_sharded batch args>,
    # <trailing replicated args: keys/flags>, axis=); params/opt_state and
    # the trailing args are replicated, the batch args split over 'data'.
    n_extra = body.__code__.co_argcount - 3 - n_sharded  # 3 = params,
    #                                                      opt_state, axis
    in_specs = (P(), P()) + (P("data"),) * n_sharded + (P(),) * n_extra
    inner = functools.partial(body, axis="data")
    return jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False))


class CoarseTrainStep:
    """Jitted coarse matcher train step.

    ``fused_attention``: trace the loss under ``fused_attention_scope``
    (defaults to the model config flag).  With a multi-device ``mesh`` the
    step is built with ``shard_map`` (per-device loss + pmean of
    grads/metrics) so the fused Pallas attention sees per-device local
    shapes — plain jit sharding propagation cannot partition a pallas_call."""

    def __init__(self, model: NeRFMatcherCoarse, opt,
                 fused_attention: bool | None = None, mesh=None):
        self.model = model
        self.opt = opt
        if fused_attention is None:
            fused_attention = bool(getattr(model.cfg,
                                           "fused_attention_train", True))
        attn_bf16 = bool(getattr(model.cfg, "attn_bf16", False))

        def body(params, opt_state, image, pt_feat, pt3d, im_mask, pt_mask,
                 conf_gt, key, axis=None):
            if axis is not None:
                # Per-shard random draws (pt_ftype='rand' features) must
                # differ across devices — the replicated key would
                # correlate them (same hazard as nerf_trainer's jitter).
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))

            def loss_fn(p):
                im_cfeat = self.model.extract_im_feat(p, image)
                pt_cfeat = self.model.extract_pt_feat(p, pt_feat, pt3d, key=key)
                im_cfeat, pt_cfeat = self.model.apply_coarse_former(
                    p, im_cfeat, pt_cfeat)
                conf, im_n, pt_n = dual_softmax(
                    im_cfeat, pt_cfeat, self.model.temperature(p), im_mask,
                    pt_mask, temp_type=self.model.cfg.temp_type)
                coarse_loss, feat_l2 = coarse_losses(conf, conf_gt, im_n, pt_n,
                                                     clamp=False)
                metrics = {"coarse_loss": coarse_loss, "feat_l2": feat_l2,
                           "loss": coarse_loss}
                return coarse_loss, metrics
            with fused_attention_scope(fused_attention, bf16=attn_bf16):
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
                metrics = jax.lax.pmean(metrics, axis)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self.step = _build_step(body, mesh, n_sharded=6)

        @jax.jit
        def val_forward(params, image, pt_feat, pt3d, im_mask, pt_mask,
                        conf_gt):
            out = self.model.forward_match(params, image, pt_feat, pt3d,
                                           im_mask, pt_mask, ret_feats=True)
            coarse_loss, feat_l2 = coarse_losses(
                out["conf_matrix"], conf_gt, out.pop("im_cfeat"),
                out.pop("pt_cfeat"), clamp=False)
            metrics = {"coarse_loss": coarse_loss, "feat_l2": feat_l2,
                       "loss": coarse_loss}
            small = {k: out[k] for k in ("j_ids", "mconf", "valid")}
            return metrics, small

        self.val_forward = val_forward


class C2FTrainStep:
    """Jitted c2f matcher train step with GT-padded fine supervision.

    ``fused_attention``: see ``CoarseTrainStep``."""

    def __init__(self, model: NeRFMatcherMS, opt,
                 fused_attention: bool | None = None, mesh=None):
        self.model = model
        self.opt = opt
        cfg = model.cfg
        if fused_attention is None:
            fused_attention = bool(getattr(cfg, "fused_attention_train",
                                           True))
        attn_bf16 = bool(getattr(cfg, "attn_bf16", False))

        def body(params, opt_state, image, pt_feat, pt3d, im_mask, pt_mask,
                 conf_gt, pt2d, pt2d_proj, key, coarse_only, axis=None):
            if axis is not None:
                # Decorrelate per-shard draws (GT-pad sampling, rand
                # features); the replicated key would make every device
                # pick the same pad slots each step.
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            k_rand, k_pad = jax.random.split(key)

            def loss_fn(p):
                im_cfeat, fmap_f = self.model.extract_im_feat_ms(p, image)
                pt_cfeat = self.model.extract_pt_feat(p, pt_feat, pt3d,
                                                      key=k_rand)
                im_cfeat, pt_cfeat = self.model.apply_coarse_former(
                    p, im_cfeat, pt_cfeat)
                conf, im_n, pt_n = dual_softmax(
                    im_cfeat, pt_cfeat, self.model.temperature(p), im_mask,
                    pt_mask, temp_type=cfg.temp_type)
                coarse_loss, feat_l2 = coarse_losses(conf, conf_gt, im_n, pt_n,
                                                     clamp=True)

                # Fixed-budget GT-padded match list for fine supervision.
                matches = extract_mutual_matches(conf, mutual=False,
                                                 threshold=0.0)
                mlist = pad_matches_with_gt(
                    k_pad, matches, conf_gt,
                    coarse_percent=cfg.coarse_percent, train_percent=0.3)
                b_ids, i_ids, j_ids = mlist["b_ids"], mlist["i_ids"], mlist["j_ids"]
                expec_f = self.model.forward_fine(
                    p, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids, j_ids)

                mpt2d_c = pt2d[b_ids, i_ids]
                mpt2d_f = self.model.fine_coords(expec_f, mpt2d_c)
                mpt2d_f_gt = pt2d_proj[b_ids, j_ids]

                coarse_dist = jnp.linalg.norm(mpt2d_f_gt - mpt2d_c, axis=-1)
                coarse_pos = coarse_dist < cfg.coarse_dthres
                if cfg.fine_loss == "match":
                    fine_loss = compute_fine_match_loss_l2_std(
                        mpt2d_f, mpt2d_f_gt, expec_f[:, 2], mask=coarse_pos,
                        valid=mlist["valid"])
                else:
                    # Reference formula verbatim (c2f_trainer.py:545):
                    # floors, while fine_coords scales by win_sz/2*fine_ds
                    # (:465) — they agree at the production win_sz=5,
                    # fine_ds=2 and diverge only at odd products (the
                    # reference has the identical quirk).
                    radius = cfg.fine_ds * cfg.win_sz // 2
                    expec_gt = (mpt2d_f_gt - mpt2d_c) / radius
                    fine_loss = compute_fine_loss_l2_std(
                        expec_f, expec_gt, valid=mlist["valid"])

                loss = jnp.where(coarse_only, coarse_loss,
                                 coarse_loss + fine_loss)
                metrics = {
                    "coarse_loss": coarse_loss,
                    "fine_loss": fine_loss,
                    "feat_l2": feat_l2,
                    "coarse_dist": jnp.mean(coarse_dist),
                    "coarse_pos_ratio": jnp.mean(coarse_pos * 1.0) * 100,
                    "loss": loss,
                }
                return loss, metrics

            with fused_attention_scope(fused_attention, bf16=attn_bf16):
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
                metrics = jax.lax.pmean(metrics, axis)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self.step = _build_step(body, mesh, n_sharded=8)

        @jax.jit
        def val_forward(params, image, pt_feat, pt3d, im_mask, pt_mask,
                        conf_gt, pt2d, pt2d_proj, coarse_only):
            """Val loss over *predicted* matches (reference training=False
            semantics, ``nerfmatch_c2f_trainer.py:490-551``): coarse focal
            loss + fine loss on the dense per-token match list, masked by the
            mutual-match validity; zero-match batches fall back to coarse."""
            out = self.model.forward_match(params, image, pt_feat, pt3d,
                                           im_mask, pt_mask, ret_feats=True)
            coarse_loss, feat_l2 = coarse_losses(
                out["conf_matrix"], conf_gt, out.pop("im_cfeat"),
                out.pop("pt_cfeat"), clamp=True)

            b_ids = out["fine_b_ids"]
            i_ids = out["fine_i_ids"]
            j_ids = out["fine_j_ids"]
            valid = out["valid"].reshape(-1)
            expec_f = out["expec_f"]
            mpt2d_c = pt2d[b_ids, i_ids]
            mpt2d_f = self.model.fine_coords(expec_f, mpt2d_c)
            mpt2d_f_gt = pt2d_proj[b_ids, j_ids]

            coarse_dist = jnp.linalg.norm(mpt2d_f_gt - mpt2d_c, axis=-1)
            coarse_pos = (coarse_dist < cfg.coarse_dthres) & valid
            if cfg.fine_loss == "match":
                fine_loss = compute_fine_match_loss_l2_std(
                    mpt2d_f, mpt2d_f_gt, expec_f[:, 2], mask=coarse_pos,
                    valid=valid)
            else:
                # Same reference floor-division quirk as the train body.
                radius = cfg.fine_ds * cfg.win_sz // 2
                expec_gt = (mpt2d_f_gt - mpt2d_c) / radius
                fine_loss = compute_fine_loss_l2_std(
                    expec_f, expec_gt, training=False, valid=valid)

            n_valid = jnp.sum(valid)
            loss = jnp.where(coarse_only | (n_valid == 0), coarse_loss,
                             coarse_loss + fine_loss)
            denom = jnp.maximum(n_valid, 1)
            metrics = {
                "coarse_loss": coarse_loss,
                "fine_loss": fine_loss,
                "feat_l2": feat_l2,
                "coarse_dist": jnp.sum(
                    jnp.where(valid, coarse_dist, 0.0)) / denom,
                "coarse_pos_ratio": jnp.sum(coarse_pos * 1.0) / denom * 100,
                "loss": loss,
            }
            small = {k: out[k] for k in ("j_ids", "mconf", "valid", "expec_f")}
            return metrics, small

        self.val_forward = val_forward


# ---------------------------------------------------------------------------
# Validation (host PnP)
# ---------------------------------------------------------------------------

def eval_batch_pose(model, params, batch, rthres: float = 1.0,
                    max_matches: int = 1024, solver: str = "native",
                    out=None):
    """Forward a val batch (or reuse ``out`` from a prior forward) + host PnP
    -> per-sample pose metrics dict."""
    if out is None:
        out = model.forward_match(
            params, jnp.asarray(batch["image"]), jnp.asarray(batch["pt_feat"]),
            jnp.asarray(batch["pt3d"]), jnp.asarray(batch["im_mask"]),
            jnp.asarray(batch["pt_mask"]))
    lists = dense_to_match_lists(
        {"j_ids": out["j_ids"], "mconf": out["mconf"], "valid": out["valid"]},
        max_matches)
    lists = jax.device_get(lists)
    loss_inputs = []
    B = batch["image"].shape[0]
    use_fine = "expec_f" in out
    if use_fine:
        expec_f = np.asarray(out["expec_f"])
        M = out["j_ids"].shape[1]
    for b in range(B):
        valid = lists["valid"][b]
        i_ids = lists["i_ids"][b][valid]
        j_ids = lists["j_ids"][b][valid]
        pt2d = np.asarray(batch["pt2d"][b])[i_ids]
        if use_fine:
            # Fine refinement of selected matches (dense mode: one per token).
            ef = expec_f.reshape(B, M, 3)[b][i_ids]
            pt2d = np.asarray(
                model.fine_coords(jnp.asarray(ef), jnp.asarray(pt2d)))
        pt3d = np.asarray(batch["pt3d"][b])[j_ids]
        loss_inputs.append({
            "pt2d": pt2d, "pt3d": pt3d,
            "K": np.asarray(batch["K"][b]),
            "c2w_gt": np.asarray(batch["c2w"][b]),
        })
    return compute_pose_metrics_host(loss_inputs, rthres=rthres, solver=solver)


# ---------------------------------------------------------------------------
# Train drivers
# ---------------------------------------------------------------------------

def init_config_odir(config, coarse: bool):
    data = config.data
    scene = data.scenes[0] if hasattr(data, "scenes") and len(data.scenes) == 1 \
        else getattr(data, "scene", "all")
    data_tag = f"{data.dataset}_{scene}_wh{data.img_wh[0]}-{data.img_wh[1]}"
    mconf = config.model
    model_tag = f"{mconf.backbone}" + ("_pre" if mconf.pretrained else "")
    model_tag += f"_cf{getattr(mconf, 'coarse_layers', 0)}d{mconf.cfeat_dim}"
    if not coarse:
        model_tag += f"_f{getattr(mconf, 'ffeat_dim', 128)}w{getattr(mconf, 'win_sz', 5)}"
    exp = config.exp
    config.optim.max_epochs = exp.max_epochs
    prefix = "debug" if getattr(exp, "debug", False) else getattr(exp, "prefix", "")
    batch_tag = (f"g{config.gpu_num}clr{config.optim.clr}cbs{config.optim.cbs}"
                 if getattr(config.optim, "adapt_lr", True)
                 else f"lr{config.optim.lr}b{exp.batch_size}")
    exp.name = "/".join(x for x in
                        [prefix, data_tag, model_tag,
                         f"{batch_tag}_ep{exp.max_epochs}"] if x)
    exp.resume_version = getattr(exp, "resume_version", "version_0")
    return Path(str(exp.odir)) / exp.name / exp.resume_version


def _train_matcher(config, coarse: bool):
    exp = config.exp
    debug = bool(getattr(exp, "debug", False))
    np.random.seed(exp.seed)
    # Propagate the experiment seed to the datasets (epoch-resample RNG).
    if not getattr(config.data, "seed", None):
        config.data.seed = exp.seed
    # The data axis must divide the global batch; shrink it if needed.
    # ``exp.gpus`` caps the mesh (the reference's --gpus knob).
    import math
    n_dev = len(jax.devices())
    gpus = int(getattr(exp, "gpus", 0) or 0) or n_dev
    mesh = make_mesh(data=math.gcd(min(gpus, n_dev), int(exp.batch_size)))
    config.gpu_num = int(mesh.devices.size)

    # Batch-size-adaptive LR.
    if getattr(config.optim, "adapt_lr", True):
        true_lr, _ = config_adaptive_lr(config)
        config.optim.lr = true_lr
    else:
        config.optim.lr = config.optim.clr

    run_dir = init_config_odir(config, coarse)
    run_dir.mkdir(parents=True, exist_ok=True)
    mlog = MetricsLogger(run_dir)
    mlog.log_text("config", str(namespace2dict(config)))
    logger.info(f"Run dir: {run_dir}")

    if coarse:
        model = NeRFMatcherCoarse(CoarseMatcherConfig.from_namespace(config.model))
    else:
        model = NeRFMatcherMS(C2FMatcherConfig.from_namespace(config.model))
    params = model.init_params(jax.random.PRNGKey(exp.seed))
    params = _init_imagenet_backbone(model, params, config.model)
    if getattr(config.model, "coarse_ckpt", None) or \
            getattr(config.model, "c2f_ckpt", None) or \
            getattr(config.model, "finetune", None):
        params = _load_pretrained(model, params, config.model)
    params = replicate_params(params, mesh)

    # The div/LoFTR temperature is frozen (requires_grad=False in the
    # reference): exclude it from weight decay like torch excludes
    # grad-less params (its gradient is already stopped in the model).
    decay_mask = None
    if getattr(config.model, "temp_type", "mul") == "div":
        def decay_mask(p):
            m = jax.tree_util.tree_map(lambda _: True, p)
            m["temperature"] = False
            return m
    opt = init_optimizer(config.optim, decay_mask=decay_mask)
    opt_state = opt.init(params)
    lr_sched = make_lr_schedule(config.optim)

    fused_ok = bool(getattr(config.model, "fused_attention_train", True))
    stepper = (CoarseTrainStep(model, opt, fused_attention=fused_ok,
                               mesh=mesh) if coarse
               else C2FTrainStep(model, opt, fused_attention=fused_ok,
                                 mesh=mesh))

    train_loader = init_data_loader(config.data, exp.num_workers,
                                    exp.batch_size, split="train")
    val_loader = init_data_loader(config.data, exp.num_workers, split="val",
                                  debug=debug)

    start_epoch = 0
    best_loss, best_tmed = np.inf, np.inf
    last = latest_checkpoint(run_dir / "checkpoints", name="last")
    if last is not None:
        import json

        params, opt_state, start_epoch, _ = load_checkpoint(last, params, opt_state)
        # Restore the best-so-far scores too (the reference's Lightning
        # ModelCheckpoint keeps them): a reset-to-inf resume would let the
        # first post-resume val epoch overwrite a genuinely-better "best"
        # checkpoint.
        meta = json.loads((Path(last) / "meta.json").read_text())
        best_loss = float(meta.get("best_loss", np.inf))
        best_tmed = float(meta.get("best_tmed", np.inf))
        logger.info(f"Resumed from {last} at epoch {start_epoch} "
                    f"(best_loss={best_loss:.4g} best_tmed={best_tmed:.4g})")

    key = jax.random.PRNGKey(exp.seed)
    rthres = getattr(config.model, "rthres", 1)
    coarse_only_epochs = int(getattr(config.optim, "coarse_only_epochs", 0) or 0)
    max_steps = 5 if debug else None

    for epoch in range(start_epoch, exp.max_epochs):
        if lr_sched is not None:
            opt_state = set_lr(opt_state, lr_sched(epoch))
        coarse_only = jnp.asarray(epoch < coarse_only_epochs)
        agg = []
        for i, batch in enumerate(train_loader):
            if max_steps and i >= max_steps:
                break
            key, k = jax.random.split(key)
            sb = shard_batch(_model_inputs(batch), mesh)
            args = [params, opt_state, sb["image"], sb["pt_feat"], sb["pt3d"],
                    sb["im_mask"], sb["pt_mask"], sb["conf_gt"]]
            if not coarse:
                args += [sb["pt2d"], sb["pt2d_proj"], k, coarse_only]
            else:
                args += [k]
            params, opt_state, metrics = stepper.step(*args)
            # Device-side scalar; a per-step float() would sync every step
            # and drain the async dispatch pipeline.
            agg.append(metrics["loss"])
            if i % 50 == 0:
                mlog.log_scalars(epoch * 100000 + i,
                                 {k_: float(v) for k_, v in metrics.items()},
                                 prefix="train/neum_")
        agg = [float(v) for v in jax.device_get(agg)]
        logger.info(f"epoch {epoch}: loss={np.mean(agg):.4f} "
                    f"lr={get_lr(opt_state):.2e}")

        # Validation: matching losses (jitted, reference training=False
        # semantics) + host-PnP pose metrics from the same forward.
        if (epoch + 1) % getattr(exp, "check_epochs", 1) == 0:
            # Multi-host: params are replicated over the GLOBAL mesh, so
            # val inputs must be too (every process loads the identical
            # unpartitioned val split) — a process-local jnp.asarray would
            # fail jit's device check against the global params.
            vput = (jnp.asarray if jax.process_count() == 1
                    else (lambda x: replicate_params(jnp.asarray(x), mesh)))
            val_agg, r_errs, t_errs = {}, [], []
            for vi, batch in enumerate(val_loader):
                if debug and vi >= 2:
                    break
                vb = _model_inputs(batch)
                vargs = [params, vput(vb["image"]),
                         vput(vb["pt_feat"]), vput(vb["pt3d"]),
                         vput(vb["im_mask"]), vput(vb["pt_mask"]),
                         vput(vb["conf_gt"])]
                if not coarse:
                    # coarse_only needs the same global replication as
                    # every other val input (it is a process-local array).
                    vargs += [vput(vb["pt2d"]),
                              vput(vb["pt2d_proj"]), vput(coarse_only)]
                vm, out = stepper.val_forward(*vargs)
                for k_, v in vm.items():
                    val_agg.setdefault(k_, []).append(float(v))
                pose_m = eval_batch_pose(model, params, vb, rthres=rthres,
                                         out=out)
                r_errs += pose_m["R_err"]
                t_errs += pose_m["t_err"]
            # Multi-process: gather val outputs before reductions (the
            # reference's all_gather_object, coarse_trainer.py:448-456).
            r_errs = all_gather_host(r_errs)
            t_errs = all_gather_host(t_errs)
            val_agg = {k_: all_gather_host(v) for k_, v in val_agg.items()}
            t_arr = np.asarray(t_errs, np.float64)
            r_arr = np.asarray(r_errs, np.float64)
            tmed = float(np.median(t_arr)) if len(t_arr) else np.inf
            val_m = {
                "tmed": tmed,
                "Rmed": float(np.median(r_arr)) if len(r_arr) else np.inf,
                "tmean": float(np.mean(t_arr[~np.isinf(t_arr)])) if len(t_arr) else np.inf,
            }
            mlog.log_scalars(epoch, val_m, prefix="hp/neum_")
            val_losses = {k_: _finite_mean(v) for k_, v in val_agg.items()}
            mlog.log_scalars(epoch, val_losses, prefix="val/neum_")
            logger.info(f"epoch {epoch}: val {val_m} "
                        f"loss={val_losses.get('loss', np.inf):.4f}")

            # Reference ckpt criteria: top-1 on val/neum_loss (+ best_tmed).
            val_loss = val_losses.get("loss", np.inf)
            if val_loss < best_loss:
                best_loss = val_loss
                save_checkpoint(run_dir / "checkpoints", epoch + 1, params,
                                opt_state, config, name="best", keep=1)
            if tmed < best_tmed:
                best_tmed = tmed
                save_checkpoint(run_dir / "checkpoints", epoch + 1, params,
                                opt_state, config, name="best_tmed", keep=1)
        save_checkpoint(run_dir / "checkpoints", epoch + 1, params, opt_state,
                        config, name="last", keep=1,
                        extra={"best_loss": float(best_loss),
                               "best_tmed": float(best_tmed)})
    mlog.close()
    return config, params


def _finite_mean(values):
    """Mean ignoring inf/nan entries (reference log_step semantics,
    ``nerfmatch_coarse_trainer.py:419-426``); inf when nothing is finite."""
    arr = np.asarray(values, np.float64)
    ok = np.isfinite(arr)
    return float(arr[ok].mean()) if ok.any() else float("inf")


def _model_inputs(batch):
    """Select + cast model-facing arrays from a collated sample batch."""
    out = {}
    for k in ["image", "pt_feat", "pt3d", "im_mask", "pt_mask", "conf_gt",
              "pt2d", "pt2d_proj", "K", "c2w"]:
        if k in batch:
            v = np.asarray(batch[k])
            if v.dtype == bool:
                v = v.astype(np.float32)
            out[k] = v
    return out


# Local filenames for the ImageNet convformer weights the reference pulls
# via timm (``modules/__init__.py:16-17`` SUPPORTED table).
TIMM_CKPT_NAMES = {
    "convformer": "convformer_b36.sail_in1k.pth",
    "convformer384": "convformer_b36.sail_in1k_384.pth",
}
_REPO_ROOT = Path(__file__).resolve().parents[2]


def _load_timm_state(ckpt):
    """Raw timm state dict from a .pth (torch.save) or .npz archive."""
    ckpt = Path(ckpt)
    if ckpt.suffix == ".npz":
        with np.load(ckpt) as z:
            return {k: z[k] for k in z.files}
    import torch

    # weights_only=True: a raw timm state dict is plain tensors; never
    # unpickle arbitrary code from an externally downloaded .pth.
    state = torch.load(ckpt, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):  # hub wrappers
        if isinstance(state, dict) and key in state \
                and isinstance(state[key], dict):
            state = state[key]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in state.items()}


def _init_imagenet_backbone(model, params, model_conf):
    """ImageNet-pretrained ConvFormer init for from-scratch matcher training.

    The reference always constructs its backbone with
    ``timm.create_model(..., pretrained=True)``
    (``modules/__init__.py:94-107``), so matcher training starts from
    ImageNet weights; its stem surgery changes only strides/padding
    (``modules/__init__.py:35-37``), never weight shapes, so raw timm
    weights drop straight into the surgically-strided template here too.

    This host has no network egress, so the weights come from a local
    file: ``model.timm_ckpt`` (raw timm state dict, .pth or .npz),
    defaulting to ``pretrained/<timm name>.pth`` for the convformer
    aliases.  A configured-but-missing path fails loudly; an absent
    default logs a prominent from-scratch warning (a quality-affecting
    difference vs the reference).  Skipped when a full-model warm start
    (coarse_ckpt/c2f_ckpt/finetune) is configured — those checkpoints
    carry trained backbone weights that would overwrite this init anyway.
    """
    if not getattr(model_conf, "pretrained", False):
        logger.info("model.pretrained=false: backbone trains from scratch")
        return params
    if any(getattr(model_conf, k, None)
           for k in ("coarse_ckpt", "c2f_ckpt", "finetune")):
        return params  # the warm-start checkpoint supplies the backbone
    from .checkpoint import convert_timm_backbone

    ckpt = getattr(model_conf, "timm_ckpt", None)
    if ckpt is None:
        name = TIMM_CKPT_NAMES.get(getattr(model_conf, "backbone", ""))
        default = (_REPO_ROOT / "pretrained" / name) if name else None
        if default is not None and default.exists():
            ckpt = default
        else:
            logger.warning(
                "model.pretrained=true but no ImageNet weights available "
                f"(set model.timm_ckpt, or place {default or 'a timm ckpt'})"
                " — the ConvFormer backbone trains FROM SCRATCH; expect "
                "lower matcher quality than the reference, which always "
                "starts from ImageNet (modules/__init__.py:94-107).")
            return params
    elif not Path(ckpt).exists():
        # Configured-but-missing must fail, not silently burn the whole
        # training budget on a random backbone.
        raise FileNotFoundError(
            f"configured model.timm_ckpt does not exist: {ckpt}")
    state = _load_timm_state(ckpt)
    new, missing = convert_timm_backbone(params["backbone"], state)
    n_total = len(jax.tree_util.tree_leaves(params["backbone"]))
    n_loaded = n_total - len(missing)
    if n_loaded == 0:
        raise ValueError(
            f"timm checkpoint {ckpt} matched 0/{n_total} backbone leaves — "
            "wrong architecture for model.backbone="
            f"{getattr(model_conf, 'backbone', '?')}?")
    params = dict(params)
    params["backbone"] = new["backbone"]
    logger.info(f"ImageNet init: {n_loaded}/{n_total} backbone leaves from "
                f"{ckpt}; {len(missing)} (FPN/surgery extras) stay at init")
    return params


def _load_pretrained(model, params, model_conf):
    """Warm-start from reference torch ckpts or native ckpts (key surgery of
    ``nerfmatch_c2f_trainer.py:45-74``)."""
    from .checkpoint import convert_torch_params, load_torch_state_dict

    from ..models.matcher_c2f import NeRFMatcherMS

    c2f_ckpt = getattr(model_conf, "c2f_ckpt", None)
    finetune = getattr(model_conf, "finetune", None)
    coarse_ckpt = getattr(model_conf, "coarse_ckpt", None)
    ckpt = c2f_ckpt or finetune or coarse_ckpt
    if not ckpt:
        return params
    if not Path(ckpt).exists():
        # A configured-but-missing warm start must fail, not silently
        # train from random init for the whole budget.
        raise FileNotFoundError(
            f"configured pretrained checkpoint does not exist: {ckpt}")
    if Path(ckpt).is_dir():
        # Native orbax checkpoint (this framework's own trainers): graft
        # every same-path same-shape leaf — e.g. warm-starting C2F from a
        # trained coarse run (the reference's strict=False surgery).
        from .checkpoint import graft_params, load_native_params

        new_params, grafted, missing = graft_params(
            params, load_native_params(ckpt))
        logger.info(f"Grafted {len(grafted)} leaves from native {ckpt}; "
                    f"{len(missing)} stay at init")
        return new_params
    state, _ = load_torch_state_dict(ckpt)
    # MS-saved ckpts nest timm under backbone.model (MetaFormer_MS wrapper);
    # coarse-saved ckpts store backbone.* directly — the reference's
    # "backbone"->"backbone.model" remap (nerfmatch_c2f_trainer.py:45-59)
    # in template-driven form.
    is_ms_ckpt = (ckpt == c2f_ckpt
                  or (ckpt == finetune and isinstance(model, NeRFMatcherMS)))
    extra = "model." if is_ms_ckpt else ""
    new_params, missing = convert_torch_params(params, state,
                                               backbone_extra=extra)
    logger.info(f"Loaded pretrained {ckpt}; {len(missing)} leaves missing")
    return new_params


def train_coarse(config):
    return _train_matcher(config, coarse=True)


def train_c2f(config):
    return _train_matcher(config, coarse=False)
