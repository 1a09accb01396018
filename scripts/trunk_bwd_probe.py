"""Pinpoint the ConvFormer trunk's backward-pass cost (matcher_roofline.py
measured conv fwd 13.8 ms vs fwd+bwd 60.2 ms at bs=2/480x480 — bwd is 3.4x
fwd where dgrad+wgrad FLOPs say ~2x).

Times fwd and fwd+bwd for trunk variants (all inputs passed as jit ARGS —
closure-captured device arrays become HLO constants and stall the axon
remote-compile POST for tens of minutes):

  full        two-scale trunk as shipped (stem s2 + stage0 @1/2 + stage1 @1/8)
  no_dw       7x7 depthwise convs ablated (identity) -> dwconv share
  dw3         3x3 depthwise (center crop of the kernel) -> kernel-size scaling
  no_ln       LayerNorms ablated -> LN bwd share (reductions over big maps)
  no_act      StarReLU -> identity -> activation bwd share
  stem        stem conv+LN only
  stage0      stage-0 blocks only (240x240x128, from a precomputed stem out)
  stage1      downsample + stage-1 blocks only (60x60x256)
  bf16        full trunk with params+input cast to bf16

Run on the TPU: python scripts/trunk_bwd_probe.py [--bs 2] [--only ...]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfmatch_tpu.models import backbone as bb  # noqa: E402
from nerfmatch_tpu.models.layers import conv2d, linear  # noqa: E402

H = W = 480


def sep_conv(p, x, dw="full"):
    h = linear(p["pwconv1"], x)
    h = bb._star_relu(p["act1"], h)
    if dw == "full":
        h = conv2d(p["dwconv"], h, stride=1, padding=3, groups=h.shape[-1])
    elif dw == "dw3":
        w3 = {"weight": p["dwconv"]["weight"][2:5, 2:5],
              "bias": p["dwconv"]["bias"]}
        h = conv2d(w3, h, stride=1, padding=1, groups=h.shape[-1])
    # dw == "none": identity
    return linear(p["pwconv2"], h)


def block(p, x, dw="full", ln=True, act=True):
    norm = (lambda q, v: bb._ln_no_bias(q, v)) if ln else (lambda q, v: v)
    sr = (lambda q, v: bb._star_relu(q, v)) if act else (lambda q, v: v)
    h = norm(p["norm1"], x)
    h = linear(p["token_mixer"]["pwconv1"], h)
    h = sr(p["token_mixer"]["act1"], h)
    if dw == "full":
        h = conv2d(p["token_mixer"]["dwconv"], h, stride=1, padding=3,
                   groups=h.shape[-1])
    elif dw == "dw3":
        w3 = {"weight": p["token_mixer"]["dwconv"]["weight"][2:5, 2:5],
              "bias": p["token_mixer"]["dwconv"]["bias"]}
        h = conv2d(w3, h, stride=1, padding=1, groups=h.shape[-1])
    h = linear(p["token_mixer"]["pwconv2"], h)
    x = x + h
    h = norm(p["norm2"], x)
    h = linear(p["mlp"]["fc2"], sr(p["mlp"]["act"],
                                   linear(p["mlp"]["fc1"], h)))
    return x + h


def trunk(params, cfg, x, dw="full", ln=True, act=True, stages=(0, 1)):
    norm = (lambda q, v: bb._ln_no_bias(q, v)) if ln else (lambda q, v: v)
    if -1 not in stages:  # -1 = skip stem (x is already the stem output)
        x = conv2d(params["stem"]["conv"], x, stride=cfg.stem_stride,
                   padding=cfg.stem_pad)
        x = norm(params["stem"]["norm"], x)
    outs = []
    for s in stages:
        if s < 0:
            continue
        stage = params["stages"][s]
        if s > 0:
            x = norm(stage["downsample"]["norm"], x)
            x = conv2d(stage["downsample"]["conv"], x,
                       stride=cfg.stage1_stride if s == 1 else 2, padding=1)
        for blk in stage["blocks"]:
            x = block(blk, x, dw=dw, ln=ln, act=act)
        outs.append(x)
    return outs


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
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    bs = args.bs

    cfg = bb.make_config("convformer384", two_scale=True)
    params = bb.init_metaformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (bs, H, W, 3)), jnp.float32)

    def scal(tree):
        return functools.reduce(
            lambda a, l: a + jnp.mean(l).astype(jnp.float32),
            jax.tree_util.tree_leaves(tree), jnp.float32(0))

    def fb_pair(apply):
        fwd = jax.jit(lambda p, x: scal(apply(p, x)))
        fb = jax.jit(lambda p, x: scal(
            jax.value_and_grad(lambda q: scal(apply(q, x)))(p)))
        return fwd, fb

    variants = {
        "full": dict(),
        "no_dw": dict(dw="none"),
        "dw3": dict(dw="dw3"),
        "no_ln": dict(ln=False),
        "no_act": dict(act=False),
        "stem": dict(stages=()),
        "stage0": dict(stages=(-1, 0)),
        "stage1": dict(stages=(-1, 1)),
    }
    want = set(args.only or (*variants, "bf16"))

    store = Path(f"/tmp/trunk_bwd_probe_bs{bs}.json")
    res = json.loads(store.read_text()) if store.exists() else {}

    def stem_apply(p, v):
        x = conv2d(p["stem"]["conv"], v, stride=cfg.stem_stride,
                   padding=cfg.stem_pad)
        return [bb._ln_no_bias(p["stem"]["norm"], x)]

    stem_out = None
    for name, kw in variants.items():
        if name not in want:
            continue
        x = img
        if kw.get("stages") and -1 in kw["stages"]:
            # stage-only variants take the stem output as their input
            # (stage-1's real input is stage-0's output — same shape/dtype,
            # representative for timing).
            if stem_out is None:
                stem_out = jax.block_until_ready(
                    jax.jit(stem_apply)(params, img)[0])
            x = stem_out

        if kw.get("stages") == ():
            apply = stem_apply
        else:
            def apply(p, v, _kw=kw):
                return trunk(p, cfg, v, **_kw)
        fwd, fb = fb_pair(apply)
        res[f"{name}_fwd"] = timeit(fwd, (params, x))
        res[f"{name}_fb"] = timeit(fb, (params, x))
        store.write_text(json.dumps(res, indent=1))
        print(f"{name:>8}: fwd {res[name + '_fwd']:7.1f}  "
              f"fb {res[name + '_fb']:7.1f}", flush=True)

    if "bf16" in want:
        p16 = jax.tree_util.tree_map(lambda l: l.astype(jnp.bfloat16), params)

        def apply16(p, v):
            return trunk(p, cfg, v.astype(jnp.bfloat16))

        fwd, fb = fb_pair(apply16)
        res["bf16_fwd"] = timeit(fwd, (p16, img))
        res["bf16_fb"] = timeit(fb, (p16, img))
        store.write_text(json.dumps(res, indent=1))
        print(f"{'bf16':>8}: fwd {res['bf16_fwd']:7.1f}  "
              f"fb {res['bf16_fb']:7.1f}", flush=True)

    print(json.dumps({"bs": bs, "ms": res}, indent=1))


if __name__ == "__main__":
    main()
