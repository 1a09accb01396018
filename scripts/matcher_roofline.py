"""Decompose the c2f matcher TRAIN step (bench_matcher.py's 112.5 ms) the
way the render path was decomposed (VERDICT r3 weak #6): measure each
stage with kernel/graph variants, state the floor, and attribute the gap.

Variants (all pipelined independent dispatches, device-scalar checksum,
min over rounds — the bench_matcher methodology):

  full_adam     complete step: loss fwd + bwd + adam         (= the 112.5)
  full_noopt    same with a zero optimizer transform          -> adam glue
  fwd_only      loss forward only                             -> bwd = fb - fwd
  fwd_bwd       value_and_grad, no optimizer
  bb_fwd        ConvFormer-B36 two-scale trunk forward
  bb_fwd_bwd    trunk forward+backward (grad of a scalar)     -> conv dgrad+wgrad
  nobb_fwd_bwd  loss fwd+bwd from PRECOMPUTED fmaps           -> attn+match+fine
  noattn_fb     fwd_bwd with all attention ablated (im_sa=0,
                pt_sa=0, coarse_layers=0, fine_sa=0)          -> attention share

plus XLA's own cost model (compiled.cost_analysis flops) -> MXU-peak floor.

The loss body mirrors matcher_trainer.C2FTrainStep (measurement harness —
keep in sync when the trainer loss changes).

Run on the TPU: python scripts/matcher_roofline.py [--bs 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from nerfmatch_tpu.models.attention import fused_attention_scope  # noqa: E402
from nerfmatch_tpu.models.matcher_c2f import (  # noqa: E402
    C2FMatcherConfig, NeRFMatcherMS)
from nerfmatch_tpu.ops.matching import (  # noqa: E402
    dual_softmax, extract_mutual_matches, pad_matches_with_gt)
from nerfmatch_tpu.train.matcher_trainer import coarse_losses  # noqa: E402
from nerfmatch_tpu.utils.metrics import (  # noqa: E402
    compute_fine_match_loss_l2_std)

H = W = 480
N = 3600


def model_config(ablate_attn=False):
    kw = dict(backbone="convformer384", pretrained=False, cfeat_dim=256,
              ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3,
              im_sa_type="share", pt_sa=3, pt_pe=True, post_pt_pe=True,
              coarse_layers=1, cformer_type="crs", fine_sa=1, win_sz=5)
    if ablate_attn:
        kw.update(im_sa=0, im_sa_type=None, pt_sa=0, pt_sa_type=None,
                  coarse_layers=0, fine_sa=0)
    return C2FMatcherConfig(**kw)


def make_inputs(bs):
    rng = np.random.default_rng(1)
    M = (W // 8) * (H // 8)
    conf_gt = np.zeros((bs, M, N), np.float32)
    conf_gt[:, np.arange(M), rng.integers(0, N, M)] = 1.0
    return dict(
        img=jnp.asarray(rng.uniform(0, 1, (bs, H, W, 3)), jnp.float32),
        pt_feat=jnp.asarray(rng.normal(size=(bs, N, 256)), jnp.float32),
        pt3d=jnp.asarray(rng.normal(size=(bs, N, 3)) * 0.3, jnp.float32),
        im_mask=jnp.ones((bs, M), jnp.float32),
        pt_mask=jnp.ones((bs, N), jnp.float32),
        conf_gt=jnp.asarray(conf_gt),
        pt2d=jnp.asarray(rng.uniform(0, W, (bs, M, 2)), jnp.float32),
        pt2d_proj=jnp.asarray(rng.uniform(0, W, (bs, N, 2)), jnp.float32),
        key=jax.random.PRNGKey(0),
    )


def make_loss(model, inp, from_fmap=False):
    """Mirrors matcher_trainer.C2FTrainStep.body's loss_fn."""
    cfg = model.cfg

    def loss_fn(p, fmaps=None):
        k_rand, k_pad = jax.random.split(inp["key"])
        if from_fmap:
            im_cfeat, fmap_f = model.im_feat_from_fmap(p, fmaps)
        else:
            im_cfeat, fmap_f = model.extract_im_feat_ms(p, inp["img"])
        pt_cfeat = model.extract_pt_feat(p, inp["pt_feat"], inp["pt3d"],
                                         key=k_rand)
        im_cfeat, pt_cfeat = model.apply_coarse_former(p, im_cfeat, pt_cfeat)
        conf, im_n, pt_n = dual_softmax(
            im_cfeat, pt_cfeat, model.temperature(p), inp["im_mask"],
            inp["pt_mask"], temp_type=cfg.temp_type)
        coarse_loss, _ = coarse_losses(conf, inp["conf_gt"], im_n, pt_n,
                                       clamp=True)
        matches = extract_mutual_matches(conf, mutual=False, threshold=0.0)
        mlist = pad_matches_with_gt(k_pad, matches, inp["conf_gt"],
                                    coarse_percent=cfg.coarse_percent,
                                    train_percent=0.3)
        b_ids, i_ids, j_ids = mlist["b_ids"], mlist["i_ids"], mlist["j_ids"]
        expec_f = model.forward_fine(p, fmap_f, im_cfeat, pt_cfeat,
                                     b_ids, i_ids, j_ids)
        mpt2d_c = inp["pt2d"][b_ids, i_ids]
        mpt2d_f = model.fine_coords(expec_f, mpt2d_c)
        mpt2d_f_gt = inp["pt2d_proj"][b_ids, j_ids]
        coarse_pos = jnp.linalg.norm(mpt2d_f_gt - mpt2d_c, axis=-1) \
            < cfg.coarse_dthres
        fine_loss = compute_fine_match_loss_l2_std(
            mpt2d_f, mpt2d_f_gt, expec_f[:, 2], mask=coarse_pos,
            valid=mlist["valid"])
        return coarse_loss + fine_loss

    return loss_fn


def timeit(fn, args, iters=10, rounds=3):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def scalarize(tree, seed=0.0):
    acc = jnp.asarray(seed, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            acc = acc + jnp.mean(leaf).astype(jnp.float32)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    args = ap.parse_args()
    bs = args.bs

    model = NeRFMatcherMS(model_config())
    params = model.init_params(jax.random.PRNGKey(0))
    inp = make_inputs(bs)
    loss = make_loss(model, inp)
    loss_fm = make_loss(model, inp, from_fmap=True)

    res = {}

    # -- full step variants -------------------------------------------
    def step_with(opt):
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            with fused_attention_scope(True):
                l, g = jax.value_and_grad(lambda q: loss(q))(p)
            up, s = opt.update(g, s, p)
            return scalarize((optax.apply_updates(p, up), s), l)

        return step, opt_state

    for name, opt in [("full_adam", optax.adam(1e-4)),
                      ("full_noopt", optax.set_to_zero())]:
        fn, st = step_with(opt)
        res[name] = timeit(fn, (params, st))
        print(f"{name:>13}: {res[name]:7.1f} ms", flush=True)

    # -- forward / fwd+bwd --------------------------------------------
    @jax.jit
    def fwd(p):
        with fused_attention_scope(True):
            return loss(p)

    @jax.jit
    def fwd_bwd(p):
        with fused_attention_scope(True):
            l, g = jax.value_and_grad(lambda q: loss(q))(p)
        return scalarize(g, l)

    res["fwd_only"] = timeit(fwd, (params,))
    print(f"{'fwd_only':>13}: {res['fwd_only']:7.1f} ms", flush=True)
    res["fwd_bwd"] = timeit(fwd_bwd, (params,))
    print(f"{'fwd_bwd':>13}: {res['fwd_bwd']:7.1f} ms", flush=True)

    # -- backbone trunk ------------------------------------------------
    @jax.jit
    def bb_fwd(p):
        fc, ff = model.im_backbone(p, inp["img"])
        return jnp.sum(fc) + jnp.sum(ff)

    @jax.jit
    def bb_fwd_bwd(p):
        l, g = jax.value_and_grad(
            lambda q: bb_fwd_inner(q))(p)
        return scalarize(g, l)

    def bb_fwd_inner(p):
        fc, ff = model.im_backbone(p, inp["img"])
        return jnp.sum(fc) + jnp.sum(ff)

    res["bb_fwd"] = timeit(bb_fwd, (params,))
    print(f"{'bb_fwd':>13}: {res['bb_fwd']:7.1f} ms", flush=True)
    res["bb_fwd_bwd"] = timeit(bb_fwd_bwd, (params,))
    print(f"{'bb_fwd_bwd':>13}: {res['bb_fwd_bwd']:7.1f} ms", flush=True)

    # -- everything after the trunk -----------------------------------
    fmaps = jax.jit(lambda p: model.im_backbone(p, inp["img"]))(params)
    fmaps = jax.tree_util.tree_map(jax.lax.stop_gradient, fmaps)

    @jax.jit
    def nobb_fwd_bwd(p, fm):
        with fused_attention_scope(True):
            l, g = jax.value_and_grad(lambda q: loss_fm(q, fm))(p)
        return scalarize(g, l)

    res["nobb_fwd_bwd"] = timeit(nobb_fwd_bwd, (params, fmaps))
    print(f"{'nobb_fwd_bwd':>13}: {res['nobb_fwd_bwd']:7.1f} ms", flush=True)

    # -- attention ablation ---------------------------------------------
    model_na = NeRFMatcherMS(model_config(ablate_attn=True))
    params_na = model_na.init_params(jax.random.PRNGKey(0))
    loss_na = make_loss(model_na, inp)

    @jax.jit
    def noattn_fb(p):
        l, g = jax.value_and_grad(lambda q: loss_na(q))(p)
        return scalarize(g, l)

    res["noattn_fb"] = timeit(noattn_fb, (params_na,))
    print(f"{'noattn_fb':>13}: {res['noattn_fb']:7.1f} ms", flush=True)

    # -- XLA cost model floor -------------------------------------------
    try:
        fn, st = step_with(optax.adam(1e-4))
        ca = fn.lower(params, st).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        res["xla_flops"] = float(ca.get("flops", float("nan")))
    except Exception as e:  # cost model availability varies by backend
        print(f"# cost_analysis unavailable: {e}")
        res["xla_flops"] = float("nan")

    # -- derived shares --------------------------------------------------
    d = {
        "adam_glue": res["full_adam"] - res["full_noopt"],
        "backward": res["fwd_bwd"] - res["fwd_only"],
        "conv_fwd": res["bb_fwd"],
        "conv_bwd": res["bb_fwd_bwd"] - res["bb_fwd"],
        "post_trunk_fb": res["nobb_fwd_bwd"],
        "attention_fb": res["fwd_bwd"] - res["noattn_fb"],
        "overlap_residual": res["fwd_bwd"]
        - (res["bb_fwd_bwd"] + res["nobb_fwd_bwd"]),
    }
    if np.isfinite(res["xla_flops"]):
        # v5e bf16 peak 197 TFLOP/s; f32 ops (the conv trunk default)
        # run the MXU at ~1/4 bf16 -> report both bounds.
        d["mxu_floor_bf16_ms"] = res["xla_flops"] / 197e12 * 1e3
        d["mxu_floor_f32_ms"] = res["xla_flops"] / (197e12 / 4) * 1e3
    print(json.dumps({"bs": bs, "measured_ms": res, "derived_ms": d},
                     indent=1, default=float))


if __name__ == "__main__":
    main()
