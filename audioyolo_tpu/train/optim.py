"""Optimizer / LR-schedule factories resolved by name from the config.

The reference builds ``torch.optim.<name>`` / ``torch.optim.lr_scheduler.<name>``
reflectively (``train.py:83-97``); here the same config names map onto optax
transforms with matching semantics:

- ``Adam`` with ``weight_decay`` is torch-Adam (L2 added to the gradient
  before the moment updates), not AdamW;
- schedules are *epoch-indexed* (the reference steps the scheduler once per
  epoch, ``train.py:183-184``), so factories take ``steps_per_epoch`` and
  convert the optax step count.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import optax


def make_lr_schedule(cfg: Dict[str, Any], base_lr: float, steps_per_epoch: int) -> Callable[[int], float]:
    """Epoch-stepped schedule from an ``lr_scheduler_config`` dict."""
    name = cfg.get("name", "ConstantLR")

    # Schedules are evaluated inside the jitted train step on a traced step
    # counter, so everything below is jnp-traceable.
    import jax.numpy as jnp

    def epochwise(fn):
        def schedule(step):
            return fn((step // max(steps_per_epoch, 1)).astype(jnp.float32)
                      if hasattr(step, "astype")
                      else float(step // max(steps_per_epoch, 1)))

        return schedule

    if name == "CosineAnnealingWarmRestarts":
        t0 = int(cfg.get("T_0", 200))
        t_mult = int(cfg.get("T_mult", 1))
        eta_min = float(cfg.get("eta_min", 0.0))

        def f(e):
            if t_mult == 1:
                t_i, t_cur = float(t0), e % t0
            else:
                # completed-cycle count n satisfies
                # t0*(t_mult^n - 1)/(t_mult-1) <= epoch
                n = jnp.floor(
                    jnp.log(jnp.maximum(e / t0 * (t_mult - 1) + 1, 1.0)) / math.log(t_mult)
                )
                start = t0 * (t_mult**n - 1) / (t_mult - 1)
                t_i = t0 * t_mult**n
                t_cur = e - start
            return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * t_cur / t_i)) / 2

        return epochwise(f)

    if name == "CosineAnnealingLR":
        t_max = int(cfg.get("T_max", 200))
        eta_min = float(cfg.get("eta_min", 0.0))
        return epochwise(
            lambda e: eta_min
            + (base_lr - eta_min) * (1 + jnp.cos(math.pi * jnp.minimum(e, t_max) / t_max)) / 2
        )

    if name == "StepLR":
        step_size = int(cfg.get("step_size", 30))
        gamma = float(cfg.get("gamma", 0.1))
        return epochwise(lambda e: base_lr * gamma ** jnp.floor(e / step_size))

    if name == "ExponentialLR":
        gamma = float(cfg.get("gamma", 0.95))
        return epochwise(lambda e: base_lr * gamma**e)

    if name == "MultiStepLR":
        milestones = sorted(int(m) for m in cfg.get("milestones", [30, 80]))
        gamma = float(cfg.get("gamma", 0.1))
        ms = jnp.asarray(milestones, jnp.float32)
        return epochwise(lambda e: base_lr * gamma ** jnp.sum(e >= ms))

    if name == "LinearLR":
        start = float(cfg.get("start_factor", 1.0 / 3.0))
        end = float(cfg.get("end_factor", 1.0))
        total = int(cfg.get("total_iters", 5))
        return epochwise(
            lambda e: base_lr
            * (start + (end - start) * jnp.minimum(e, total) / total)
        )

    if name == "PolynomialLR":
        total = int(cfg.get("total_iters", 5))
        power = float(cfg.get("power", 1.0))
        return epochwise(
            lambda e: base_lr * (1.0 - jnp.minimum(e, total) / total) ** power
        )

    if name == "OneCycleLR":
        # epoch-indexed (the reference steps its scheduler once per epoch);
        # torch's exact closed form (two-phase cosine, torch
        # lr_scheduler.OneCycleLR._annealing_cos): phase boundary at
        # pct_start*total_steps - 1, anneal initial->max->initial/final_div.
        total = int(cfg.get("total_steps") or cfg.get("epochs", 200))
        max_lr = float(cfg.get("max_lr", base_lr))
        pct_start = float(cfg.get("pct_start", 0.3))
        div = float(cfg.get("div_factor", 25.0))
        final_div = float(cfg.get("final_div_factor", 1e4))
        initial = max_lr / div
        final = initial / final_div
        step_up = max(float(pct_start * total) - 1.0, 1e-9)
        step_down = max(float(total - 1) - step_up, 1e-9)

        def anneal(start, end, pct):
            return end + (start - end) / 2.0 * (1 + jnp.cos(math.pi * jnp.clip(pct, 0.0, 1.0)))

        def f(e):
            lr_up = anneal(initial, max_lr, e / step_up)
            lr_down = anneal(max_lr, final, (e - step_up) / step_down)
            return jnp.where(e <= step_up, lr_up, lr_down)

        return epochwise(f)

    if name in ("ConstantLR", None):
        return lambda step: base_lr

    raise ValueError(
        f"unsupported lr scheduler '{name}'; supported: "
        "CosineAnnealingWarmRestarts, CosineAnnealingLR, StepLR, MultiStepLR, "
        "ExponentialLR, LinearLR, PolynomialLR, OneCycleLR, ConstantLR "
        "(ReduceLROnPlateau needs metric feedback and is not expressible as a "
        "step schedule — use CosineAnnealingLR or StepLR instead)"
    )


def make_optimizer(
    optimizer_cfg: Dict[str, Any],
    lr_scheduler_cfg: Dict[str, Any] | None = None,
    steps_per_epoch: int = 1,
    use_lr_scheduler: bool = True,
) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    name = cfg.pop("name", "Adam")
    lr = float(cfg.pop("lr", 1e-3))
    wd = float(cfg.pop("weight_decay", 0.0))

    if use_lr_scheduler and lr_scheduler_cfg:
        schedule: Any = make_lr_schedule(dict(lr_scheduler_cfg), lr, steps_per_epoch)
    else:
        schedule = lr

    if name == "Adam":
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch-Adam L2 position
        parts += [
            optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps),
            optax.scale_by_learning_rate(schedule),
        ]
        return optax.chain(*parts)

    if name == "AdamW":
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        return optax.adamw(schedule, b1=float(b1), b2=float(b2), eps=eps, weight_decay=wd)

    if name == "SGD":
        momentum = float(cfg.pop("momentum", 0.0))
        nesterov = bool(cfg.pop("nesterov", False))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        parts.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*parts)

    if name == "RMSprop":
        alpha = float(cfg.pop("alpha", 0.99))
        eps = float(cfg.pop("eps", 1e-8))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts += [optax.scale_by_rms(decay=alpha, eps=eps), optax.scale_by_learning_rate(schedule)]
        return optax.chain(*parts)

    # the remaining torch.optim names map onto optax transforms directly;
    # weight_decay stays in the torch-L2 position (added to the gradient
    # before the accumulator update), matching torch.optim semantics
    def _l2_chain(*transforms):
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(*parts, *transforms, optax.scale_by_learning_rate(schedule))

    if name == "Adagrad":
        eps = float(cfg.pop("eps", 1e-10))
        iav = float(cfg.pop("initial_accumulator_value", 0.0))
        return _l2_chain(optax.scale_by_rss(initial_accumulator_value=iav, eps=eps))

    if name == "Adadelta":
        rho = float(cfg.pop("rho", 0.9))
        eps = float(cfg.pop("eps", 1e-6))
        return _l2_chain(optax.scale_by_adadelta(rho=rho, eps=eps))

    if name == "Adamax":
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        return _l2_chain(optax.scale_by_adamax(b1=float(b1), b2=float(b2), eps=eps))

    if name == "NAdam":
        # documented deviation: optax's nesterov-Adam is the Dozat
        # formulation; torch.optim.NAdam additionally schedules the momentum
        # coefficient by 0.96^t (momentum_decay). Trajectories agree to ~1e-3
        # over typical horizons (tests/test_optim.py bounds it).
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        return _l2_chain(optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps, nesterov=True))

    if name == "RAdam":
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        return _l2_chain(optax.scale_by_radam(b1=float(b1), b2=float(b2), eps=eps))

    raise ValueError(
        f"unsupported optimizer '{name}'; supported: Adam, AdamW, SGD, RMSprop, "
        "Adagrad, Adadelta, Adamax, NAdam, RAdam"
    )
