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
from nerfmatch_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()  # persistent XLA cache: reruns start warm

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


def make_loss(model, from_fmap=False):
    """Mirrors matcher_trainer.C2FTrainStep.body's loss_fn.

    ``inp`` is an ARGUMENT, never a closure capture: a captured device
    array is baked into the jaxpr as a constant, and the (bs, 3600, 3600)
    conf_gt literal alone is 104 MB of HLO that the axon remote-compile
    POST then ships per program — measured >30 min per compile vs ~3 min
    with inputs passed as arguments."""
    cfg = model.cfg

    def loss_fn(p, inp, fmaps=None):
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


ALL_VARIANTS = ("full_adam", "full_noopt", "fwd_only", "fwd_bwd", "bb_fwd",
                "bb_fwd_bwd", "nobb_fwd_bwd", "noattn_fb", "cost")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variants to run (resumable across "
                         "processes; results land in /tmp/matcher_roofline_"
                         "bs{N}.json)")
    args = ap.parse_args()
    bs = args.bs
    want = set(args.only or ALL_VARIANTS)

    model = NeRFMatcherMS(model_config())
    params = model.init_params(jax.random.PRNGKey(0))
    inp = make_inputs(bs)
    loss = make_loss(model)
    loss_fm = make_loss(model, from_fmap=True)

    # Resumable result store: each variant is one compile through the slow
    # remote-compile tunnel, so partial runs must not lose finished numbers.
    store = Path(f"/tmp/matcher_roofline_bs{bs}.json")
    res = json.loads(store.read_text()) if store.exists() else {}

    def record(name, val):
        res[name] = val
        store.write_text(json.dumps(res, indent=1, default=float))
        print(f"{name:>13}: {val:7.1f}", flush=True)

    # -- full step variants -------------------------------------------
    def step_with(opt):
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, i):
            with fused_attention_scope(True):
                l, g = jax.value_and_grad(lambda q: loss(q, i))(p)
            up, s = opt.update(g, s, p)
            return scalarize((optax.apply_updates(p, up), s), l)

        return step, opt_state

    for name, opt in [("full_adam", optax.adam(1e-4)),
                      ("full_noopt", optax.set_to_zero())]:
        if name not in want:
            continue
        fn, st = step_with(opt)
        record(name, timeit(fn, (params, st, inp)))

    # -- forward / fwd+bwd --------------------------------------------
    @jax.jit
    def fwd(p, i):
        with fused_attention_scope(True):
            return loss(p, i)

    @jax.jit
    def fwd_bwd(p, i):
        with fused_attention_scope(True):
            l, g = jax.value_and_grad(lambda q: loss(q, i))(p)
        return scalarize(g, l)

    if "fwd_only" in want:
        record("fwd_only", timeit(fwd, (params, inp)))
    if "fwd_bwd" in want:
        record("fwd_bwd", timeit(fwd_bwd, (params, inp)))

    # -- backbone trunk ------------------------------------------------
    def bb_fwd_inner(p, img):
        fc, ff = model.im_backbone(p, img)
        return jnp.sum(fc) + jnp.sum(ff)

    @jax.jit
    def bb_fwd(p, img):
        return bb_fwd_inner(p, img)

    @jax.jit
    def bb_fwd_bwd(p, img):
        l, g = jax.value_and_grad(lambda q: bb_fwd_inner(q, img))(p)
        return scalarize(g, l)

    if "bb_fwd" in want:
        record("bb_fwd", timeit(bb_fwd, (params, inp["img"])))
    if "bb_fwd_bwd" in want:
        record("bb_fwd_bwd", timeit(bb_fwd_bwd, (params, inp["img"])))

    # -- everything after the trunk -----------------------------------
    if "nobb_fwd_bwd" in want:
        fmaps = jax.jit(model.im_backbone)(params, inp["img"])
        fmaps = jax.tree_util.tree_map(jax.lax.stop_gradient, fmaps)

        @jax.jit
        def nobb_fwd_bwd(p, i, fm):
            with fused_attention_scope(True):
                l, g = jax.value_and_grad(lambda q: loss_fm(q, i, fm))(p)
            return scalarize(g, l)

        record("nobb_fwd_bwd", timeit(nobb_fwd_bwd, (params, inp, fmaps)))

    # -- attention ablation ---------------------------------------------
    if "noattn_fb" in want:
        model_na = NeRFMatcherMS(model_config(ablate_attn=True))
        params_na = model_na.init_params(jax.random.PRNGKey(0))
        loss_na = make_loss(model_na)

        @jax.jit
        def noattn_fb(p, i):
            l, g = jax.value_and_grad(lambda q: loss_na(q, i))(p)
            return scalarize(g, l)

        record("noattn_fb", timeit(noattn_fb, (params_na, inp)))

    # -- XLA cost model floor -------------------------------------------
    if "cost" in want:
        try:
            fn, st = step_with(optax.adam(1e-4))
            ca = fn.lower(params, st, inp).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            res["xla_flops"] = float(ca.get("flops", float("nan")))
        except Exception as e:  # cost model availability varies by backend
            print(f"# cost_analysis unavailable: {e}")
            res["xla_flops"] = float("nan")
        store.write_text(json.dumps(res, indent=1, default=float))

    # -- derived shares --------------------------------------------------
    d = {}
    have = {k for k, v in res.items() if isinstance(v, (int, float))}

    def derive(name, pos, neg=()):
        if set(pos) | set(neg) <= have:
            d[name] = sum(res[k] for k in pos) - sum(res[k] for k in neg)

    derive("adam_glue", ["full_adam"], ["full_noopt"])
    derive("backward", ["fwd_bwd"], ["fwd_only"])
    derive("conv_fwd", ["bb_fwd"])
    derive("conv_bwd", ["bb_fwd_bwd"], ["bb_fwd"])
    derive("post_trunk_fb", ["nobb_fwd_bwd"])
    derive("attention_fb", ["fwd_bwd"], ["noattn_fb"])
    derive("overlap_residual", ["fwd_bwd"], ["bb_fwd_bwd", "nobb_fwd_bwd"])
    if np.isfinite(res.get("xla_flops", float("nan"))):
        # v5e bf16 peak 197 TFLOP/s; f32 ops (the conv trunk default)
        # run the MXU at ~1/4 bf16 -> report both bounds.
        d["mxu_floor_bf16_ms"] = res["xla_flops"] / 197e12 * 1e3
        d["mxu_floor_f32_ms"] = res["xla_flops"] / (197e12 / 4) * 1e3
    print(json.dumps({"bs": bs, "measured_ms": res, "derived_ms": d},
                     indent=1, default=float))


if __name__ == "__main__":
    main()
