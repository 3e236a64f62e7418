"""Train state: optimizer, LR schedule, and the TrainState pytree.

Mirrors the reference training setup (``lib/train/optimizer.py`` +
``lib/utils/optimizer/lr_scheduler.py:66-75``): Adam with eps=1e-15 and an
exponential schedule ``lr * gamma**(epoch / decay_epochs)`` stepped per
epoch.  The reference's param-group split on ``'data' in name`` matches no
parameter and both groups share the same lr by default (SURVEY.md Q6), so a
single group is exact; ``mlp_weight_decay != 1`` is honored by scaling the
lr of non-embedding params via an optax mask.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: jax.Array          # int32 scalar
    params: Any
    opt_state: Any
    # bf16 shadow of the hash-table leaves, refreshed INSIDE the train step
    # so XLA fuses the master->bf16 convert into the Adam update sweep (a
    # standalone per-step cast of the ~1.1 GB of f32 tables cost ~3 ms,
    # docs/PERF.md round 3).  None = cast in the forward (eval paths, or
    # grid_compute_dtype float32).
    grid_bf16: Any = None


def make_lr_schedule(base_lr: float, gamma: float, decay_epochs: int,
                     ep_iter: int):
    """Per-step schedule equal to the reference's per-epoch exponential decay."""
    def schedule(step):
        epoch = step // max(ep_iter, 1)
        return base_lr * gamma ** (epoch / decay_epochs)
    return schedule


def make_warmup_multi_step(base_lr: float, milestones, gamma: float,
                           warmup_factor: float, warmup_iters: int,
                           warmup_method: str, ep_iter: int):
    """Per-step twin of the reference's WarmupMultiStepLR
    (``lib/utils/optimizer/lr_scheduler.py:7-50``): an epoch-granular
    multi-step decay (gamma per passed milestone) with a constant or linear
    warmup over the first ``warmup_iters`` epochs."""
    import jax.numpy as jnp
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.int32)

    def schedule(step):
        epoch = step // max(ep_iter, 1)
        if warmup_method == "constant":
            warm = jnp.where(epoch < warmup_iters, warmup_factor, 1.0)
        else:  # linear
            alpha = epoch / max(warmup_iters, 1)
            warm = jnp.where(epoch < warmup_iters,
                             warmup_factor * (1.0 - alpha) + alpha, 1.0)
        n = jnp.sum(ms <= epoch)         # bisect_right(milestones, epoch)
        return base_lr * warm * gamma ** n

    return schedule


def make_optimizer(cfg):
    sched_cfg = cfg.train.scheduler
    sched_type = sched_cfg.get("type", "exponential")
    if sched_type == "exponential":
        schedule = make_lr_schedule(cfg.train.lr, sched_cfg.gamma,
                                    sched_cfg.decay_epochs, cfg.ep_iter)
    elif sched_type == "warmup_multi_step":
        schedule = make_warmup_multi_step(
            cfg.train.lr, sched_cfg.milestones, sched_cfg.gamma,
            sched_cfg.get("warmup_factor", 1.0 / 3),
            sched_cfg.get("warmup_iters", 5),
            sched_cfg.get("warmup_method", "linear"), cfg.ep_iter)
    else:  # multi_step
        boundaries = {int(m) * cfg.ep_iter: float(sched_cfg.gamma)
                      for m in sched_cfg.milestones}
        schedule = optax.piecewise_constant_schedule(cfg.train.lr, boundaries)

    # opt-in bf16 FIRST moment (optax mu_dtype; the second moment stays f32
    # so eps=1e-15 keeps working): the Adam sweep over the ~286M table
    # entries is HBM-bound (~11 ms/step, docs/PERF.md) and mu is a quarter
    # of its traffic.  Off by default for exact reference parity.
    mom_dtype = {"bfloat16": jax.numpy.bfloat16}.get(
        cfg.train.get("moment_dtype", "float32"))

    optim = cfg.train.get("optim", "adam")
    if optim == "adam":
        opt = optax.adam(schedule, eps=cfg.train.eps, mu_dtype=mom_dtype)
    elif optim == "radam":
        opt = optax.radam(schedule, eps=cfg.train.eps)
    elif optim == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    if cfg.train.weight_decay:
        opt = optax.chain(optax.add_decayed_weights(cfg.train.weight_decay), opt)

    mlp_scale = cfg.get("mlp_weight_decay", 1.0)
    if mlp_scale != 1.0:
        # reference intent: embedding tables get lr, MLPs get lr * scale
        def mask_fn(params):
            return jax.tree.map_with_path(
                lambda path, _: not any(getattr(k, "key", None) == "embed"
                                        for k in path), params)
        opt = optax.chain(opt, optax.masked(optax.scale(mlp_scale), mask_fn))
    return opt, schedule


def create_train_state(params, opt, mspec=None) -> TrainState:
    import jax.numpy as jnp
    shadow = None
    if mspec is not None:
        from ..models import inb
        shadow = inb.grid_shadow(mspec, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params), grid_bf16=shadow)
