"""Secondary benchmark: c2f matcher eval + train throughput.

Production shapes from the BASELINE protocol: 480x480 query image ->
ConvFormer-B36 two-scale features, 3600 image tokens vs 3600 NeRF points,
dual-softmax + mutual extraction + fine subpixel refinement; the train step
additionally runs the focal+fine losses, grads and adam at batch size 2
(configs/nerfmatch/nerfmatch_7scenes_sfm_c2f.yaml).  Prints one JSON line
per metric (same schema as bench.py) — kept separate so the driver's
headline metric stays rays/sec.

Timing is pipelined with INDEPENDENT dispatches (fixed inputs, no step->step
dependency) and a single device fetch — a dependent chain through the axon
tunnel stalls ~0.9 s/step in the client even when device time is ~100 ms,
which real PJRT hosts pipeline away.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm

REF_PAIRS_PER_SEC = 10.0  # reference "Avg match time" scale on V100 (~100ms)


def main():
    cfg = C2FMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share",
        pt_sa=3, pt_pe=True, post_pt_pe=True, coarse_layers=1,
        cformer_type="crs", fine_sa=1, win_sz=5)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    H = W = 480
    N = 3600
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(1, N, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(1, N, 3)) * 0.3, jnp.float32)

    def match(params, img, pt_feat, pt3d):
        # The production eval entry: two jitted programs (convs | fused-
        # attention matching) — see NeRFMatcherCoarse.eval_match.  Its
        # outputs are the ~100 kB match lists only (no dense conf matrix).
        return model.eval_match(params, img, pt_feat, pt3d, mutual=True)

    out = match(params, img, pt_feat, pt3d)
    np.asarray(out["j_ids"])  # sync (axon async dispatch)

    # Amortized pipelined timing; single fetch at the end; min of rounds.
    iters, rounds = 20, 3
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = match(params, img, pt_feat, pt3d)
        np.asarray(out["j_ids"])
        dt = min(dt, (time.perf_counter() - t0) / iters)

    pairs_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "c2f_match_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 3),
    }), flush=True)

    bench_train_step(model, params)
    bench_coarse_model()


def bench_coarse_model():
    """BASELINE config 2: the coarse-only 'Mini' matcher at eval shapes."""
    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)

    cfg = CoarseMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share", pt_sa=3,
        pt_pe=True, post_pt_pe=True, coarse_layers=1, cformer_type="crs")
    model = NeRFMatcherCoarse(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 480, 480, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(1, 3600, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(1, 3600, 3)) * 0.3, jnp.float32)

    def match(params, img, pt_feat, pt3d):
        return model.eval_match(params, img, pt_feat, pt3d, mutual=True,
                                top_k=2048)

    out = match(params, img, pt_feat, pt3d)
    np.asarray(out["j_ids"])
    iters, rounds = 20, 3
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = match(params, img, pt_feat, pt3d)
        np.asarray(out["j_ids"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    print(json.dumps({
        "metric": "coarse_match_throughput",
        "value": round(1.0 / dt, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(1.0 / dt / REF_PAIRS_PER_SEC, 3),
    }), flush=True)


def bench_train_step(model, params, bs: int = 2):
    """Pipelined c2f train-step timing at the production batch size."""
    import optax
    from nerfmatch_tpu.train.matcher_trainer import C2FTrainStep

    H = W = 480
    N = 3600
    M = (W // 8) * (H // 8)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (bs, H, W, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, N, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, N, 3)) * 0.3, jnp.float32)
    im_mask = jnp.ones((bs, M), jnp.float32)
    pt_mask = jnp.ones((bs, N), jnp.float32)
    conf_gt = np.zeros((bs, M, N), np.float32)
    idx = rng.integers(0, N, M)
    conf_gt[:, np.arange(M), idx] = 1.0
    conf_gt = jnp.asarray(conf_gt)
    pt2d = jnp.asarray(rng.uniform(0, W, (bs, M, 2)), jnp.float32)
    pt2d_proj = jnp.asarray(rng.uniform(0, W, (bs, N, 2)), jnp.float32)
    key = jax.random.PRNGKey(0)
    coarse_only = jnp.asarray(False)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    stepper = C2FTrainStep(model, opt)

    args = (params, opt_state, img, pt_feat, pt3d, im_mask, pt_mask, conf_gt,
            pt2d, pt2d_proj, key, coarse_only)

    @jax.jit
    def step_cs(*a):
        new_params, new_os, metrics = stepper.step(*a)
        # Reduce the updated params/opt-state to one scalar on device: the
        # full pytree is tens of MB, and returning it would measure the
        # ~30 MB/s tunnel instead of the chip.
        leaves = jax.tree_util.tree_leaves((new_params, new_os))
        acc = metrics["loss"]
        for leaf in leaves:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                acc = acc + jnp.mean(leaf).astype(jnp.float32)
        return acc

    out = step_cs(*args)
    np.asarray(out)  # sync

    iters, rounds = 10, 3
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_cs(*args)
        np.asarray(out)
        dt = min(dt, (time.perf_counter() - t0) / iters)

    pairs_per_sec = bs / dt
    # Reference trains 10k pairs/epoch on 8xA100 in wall-clock dominated by
    # the step; a measured torch step is unavailable in-tree — scale vs the
    # same 10 pairs/s stand-in as eval (one step processes bs pairs).
    print(json.dumps({
        "metric": "c2f_train_step_time",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step(bs2)",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
