"""Optimizer / LR-schedule factory on optax.

Covers the reference's optimizer surface (``nerfmatch/utils/optim.py``):
sgd/adam/adamw/rmsprop/radam/ranger optimizers; steplr (multistep), cosine
(CosineAnnealingLR semantics), poly, chained (linear-warmup + multistep) and
gradual-warmup-wrapped schedules.  Schedules here are *epoch-indexed pure
functions* ``f(epoch) -> lr`` combined with ``optax.inject_hyperparams`` so
the trainer sets the LR once per epoch (matching the reference's per-epoch
scheduler stepping) without rebuilding the jitted update.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper keeping the slow weights inside the optimizer state
    (optax's ``contrib.lookahead`` instead restructures the param pytree,
    which would leak into every train step).  Requires ``params`` at update
    time.  Ranger == RAdam + Lookahead(k=6, alpha=0.5) (reference
    ``utils/optim.py:53``)."""

    def init(params):
        return {"inner": inner.init(params), "slow": params,
                "step": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        assert params is not None, "lookahead requires params at update time"
        upd, inner_state = inner.update(updates, state["inner"], params)
        step = state["step"] + 1
        sync = (step % sync_period) == 0
        fast = optax.apply_updates(params, upd)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + slow_step_size * (f - s), s),
            state["slow"], fast)
        new_fast = jax.tree_util.tree_map(
            lambda f, s: jnp.where(sync, s, f), fast, new_slow)
        final = jax.tree_util.tree_map(lambda nf, p: nf - p, new_fast, params)
        return final, {"inner": inner_state, "slow": new_slow, "step": step}

    return optax.GradientTransformation(init, update)


def init_optimizer(config, lr: float | None = None, decay_mask=None):
    """Build an optax optimizer wrapped in ``inject_hyperparams`` so
    ``learning_rate`` is a mutable hyperparam in the optimizer state.

    ``decay_mask``: optional optax-style mask (pytree/callable) selecting
    which leaves receive weight decay — torch skips frozen
    (``requires_grad=False``) params entirely, so callers with such leaves
    (the matchers' div temperature) must exclude them for parity."""
    name = config.optimizer
    eps = float(getattr(config, "eps", 1e-8))
    wd = float(getattr(config, "weight_decay", 0.0))
    lr = float(lr if lr is not None else config.lr)

    def base(learning_rate):
        if name == "sgd":
            opt = optax.sgd(learning_rate, momentum=getattr(config, "momentum", 0.9))
        elif name == "adam":
            opt = optax.adam(learning_rate, eps=eps)
        elif name == "adamw":
            return optax.adamw(learning_rate, eps=eps, weight_decay=wd,
                               mask=decay_mask)
        elif name == "rmsprop":
            opt = optax.rmsprop(learning_rate, eps=eps)
        elif name == "radam":
            opt = optax.radam(learning_rate, eps=eps)
        elif name == "ranger":
            opt = lookahead(optax.radam(learning_rate, eps=eps))
        else:
            raise ValueError(f"optimizer not recognized: {name}")
        if wd > 0 and name != "adamw":
            # torch couples weight decay into the gradient (L2) for these.
            opt = optax.chain(optax.add_decayed_weights(wd, mask=decay_mask),
                              opt)
        return opt

    # Strong-typed f32 scalar: a Python float here (or in set_lr) traces as
    # weak_type=True, while the state a train step RETURNS carries a strong
    # f32 — so the second step would recompile the whole program.
    return optax.inject_hyperparams(base)(
        learning_rate=jnp.asarray(lr, jnp.float32))


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


# ---------------------------------------------------------------------------
# Epoch-indexed schedules
# ---------------------------------------------------------------------------

def make_lr_schedule(config, base_lr: float | None = None):
    """Return ``f(epoch) -> lr`` for the configured scheduler (or None)."""
    name = getattr(config, "lr_scheduler", None)
    if name is None:
        return None
    base_lr = float(base_lr if base_lr is not None else config.lr)
    max_epochs = int(getattr(config, "max_epochs", 1))

    if name == "steplr":
        if getattr(config, "decay_per_step", None) and config.decay_per_step > 0:
            step = int(config.decay_per_step)
            milestones = list(range(step, max_epochs, step))
        else:
            milestones = list(config.decay_step)
        gamma = float(config.decay_gamma)

        def sched(epoch):
            return base_lr * gamma ** sum(1 for m in milestones if epoch >= m)

    elif name == "cosine":
        eta_min = 1e-8

        def sched(epoch):
            return eta_min + (base_lr - eta_min) * (
                1 + math.cos(math.pi * epoch / max_epochs)) / 2

    elif name == "poly":
        exp = float(getattr(config, "poly_exp", 1.0))

        def sched(epoch):
            return base_lr * (1 - epoch / max_epochs) ** exp

    elif name == "chained":
        milestones = [max_epochs // 2, max_epochs * 3 // 4, max_epochs * 9 // 10]

        def sched(epoch):
            warm = min(0.01 + (1 - 0.01) * epoch / 100, 1.0)
            decay = 0.33 ** sum(1 for m in milestones if epoch >= m)
            return base_lr * warm * decay

    else:
        raise ValueError(f"scheduler not recognized: {name}")

    warmup = int(getattr(config, "warmup_epochs", 0) or 0)
    if warmup > 0 and config.optimizer not in ("radam", "ranger"):
        mult = float(getattr(config, "warmup_multiplier", 1.0))
        inner = sched

        def sched(epoch):  # noqa: F811 — gradual warmup wrapper
            if epoch <= warmup:
                return base_lr * ((mult - 1.0) * epoch / warmup + 1.0)
            return mult * inner(epoch - warmup) / 1.0

    return sched


def config_adaptive_lr(config):
    """Batch-size-adaptive LR: ``clr * true_batch / cbs`` (reference
    ``nerfmatch_coarse_trainer.py:495-500``).

    The reference computes ``true_batch = gpu_num * batch_size`` because
    its ``batch_size`` is PER-RANK (Lightning DDP dataloaders).  In this
    port ``exp.batch_size`` is already the GLOBAL batch (``DataLoader`` /
    ``shard_batch`` split it across the mesh), so it IS the true batch —
    multiplying by the device count again would scale the LR by the mesh
    size."""
    true_batch = config.exp.batch_size
    true_lr = config.optim.clr * true_batch / config.optim.cbs
    return true_lr, true_batch
