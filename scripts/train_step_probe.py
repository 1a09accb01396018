"""Decompose the fused NeRF train step: where do 96 - 49 ms go?

Variants (production shapes: 9216 rays, 128+128, 8x256, fused train kernel):
  grad_mse   — value_and_grad of MSE-only loss (round-1: ~49 ms)
  grad_full  — value_and_grad of the shipped loss (MSE+coarse+distortion)
  grad_aux   — grad_full + full metrics aux returned
  adam       — grad_aux + plain optax.adam update
  inject     — grad_aux + the shipped inject_hyperparams(adam) update
  full       — the shipped NerfTrainer.train_step_fn
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nerfmatch_tpu.train.nerf_trainer import NerfTrainer
from nerfmatch_tpu.utils.metrics import compute_nerf_metrics
from nerfmatch_tpu.ops.pallas.render_train import make_fused_train_hierarchical
from __graft_entry__ import _example_rays, _nerf_config

BATCH = 9216


def timeit(fn, args, fetch, iters=20, rounds=3):
    best = float("inf")
    out = fn(*args)
    np.asarray(fetch(out))
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(variants):
    import argparse

    cfg = _nerf_config()
    cfg.render.use_fused_train = True
    cfg.exp = argparse.Namespace(seed=0, batch_size=BATCH, max_epochs=1,
                                 check_epochs=1, num_workers=0, odir="/tmp/x")
    cfg.optim = argparse.Namespace(optimizer="adam", lr=5e-4,
                                   weight_decay=0.0, lr_scheduler=None,
                                   max_epochs=15)
    trainer = NerfTrainer(cfg)
    params, opt_state = trainer.init_state(0)
    renderer = trainer.renderer
    fused = make_fused_train_hierarchical(renderer)
    rays = _example_rays(BATCH)
    rgbs = jnp.zeros((BATCH, 3))
    ts = jnp.zeros((BATCH,), jnp.int32)
    key = jax.random.PRNGKey(1)
    cnfg_loss = trainer.cnfg_loss

    def make_grad(loss_kind, with_aux):
        def loss_fn(p):
            preds = fused(p, rays, key)
            if loss_kind == "mse":
                loss = jnp.mean((preds["rgb_fine"] - rgbs) ** 2) \
                    + jnp.mean((preds["rgb_coarse"] - rgbs) ** 2)
                return loss, {"loss": loss}
            metrics = compute_nerf_metrics(preds, rgbs, cnfg_loss=cnfg_loss)
            if not with_aux:
                return metrics["loss"], {"loss": metrics["loss"]}
            return metrics["loss"], metrics

        @jax.jit
        def g(params):
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, m
        return g

    for v in variants:
        if v == "grad_mse":
            fn = make_grad("mse", False)
            dt = timeit(fn, (params,), lambda o: o[1]["loss"])
        elif v == "grad_full":
            fn = make_grad("full", False)
            dt = timeit(fn, (params,), lambda o: o[1]["loss"])
        elif v == "grad_aux":
            fn = make_grad("full", True)
            dt = timeit(fn, (params,), lambda o: o[1]["loss"])
        elif v in ("adam", "inject"):
            opt = optax.adam(5e-4) if v == "adam" else trainer.opt
            ostate = opt.init(params)

            def loss_fn(p):
                preds = fused(p, rays, key)
                metrics = compute_nerf_metrics(preds, rgbs,
                                               cnfg_loss=cnfg_loss)
                return metrics["loss"], metrics

            @jax.jit
            def fn(params, ostate):
                (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                upd, ostate = opt.update(grads, ostate, params)
                return optax.apply_updates(params, upd), ostate, m
            dt = timeit(fn, (params, ostate), lambda o: o[2]["loss"])
        elif v == "full":
            step = trainer.train_step_fn()
            dt = timeit(step, (params, opt_state, rays, rgbs, ts, key),
                        lambda o: o[2]["loss"])
        else:
            print("unknown", v)
            continue
        print(f"{v:>9}: {dt*1e3:8.2f} ms  {BATCH/dt:9.0f} rays/s",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["grad_mse", "grad_full", "grad_aux", "adam", "inject", "full"])
