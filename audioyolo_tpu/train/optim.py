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
from typing import Any, Callable, Dict, NamedTuple

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
        "step schedule — make_optimizer handles it through an injected "
        "learning-rate hyperparameter driven by the ReduceLROnPlateau "
        "controller between epochs)"
    )


class ReduceLROnPlateau:
    """Host-side metric-driven LR controller, torch-exact semantics
    (``torch.optim.lr_scheduler.ReduceLROnPlateau``).

    The reference resolves this name reflectively (``train.py:94``) but then
    calls ``scheduler.step()`` with no metric (``train.py:183-184``), which
    would raise in torch — so any working semantics here are net-new. We run
    it the way torch documents it: once per epoch on the eval loss, between
    jitted steps. The resulting scalar is written into the optimizer state's
    injected ``learning_rate`` hyperparameter (:func:`set_opt_learning_rate`)
    — same shape/dtype leaf, so no recompilation.
    """

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0, eps: float = 1e-8):
        if factor >= 1.0:
            raise ValueError("ReduceLROnPlateau factor must be < 1.0")
        if mode not in ("min", "max") or threshold_mode not in ("rel", "abs"):
            raise ValueError(f"bad mode={mode!r} / threshold_mode={threshold_mode!r}")
        self.lr = float(base_lr)
        self.mode, self.factor, self.patience = mode, float(factor), int(patience)
        self.threshold, self.threshold_mode = float(threshold), threshold_mode
        self.cooldown, self.min_lr, self.eps = int(cooldown), float(min_lr), float(eps)
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    @classmethod
    def from_config(cls, cfg: Dict[str, Any], base_lr: float) -> "ReduceLROnPlateau":
        keys = ("mode", "factor", "patience", "threshold", "threshold_mode",
                "cooldown", "min_lr", "eps")
        return cls(base_lr, **{k: cfg[k] for k in keys if k in cfg})

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def state_dict(self) -> Dict[str, float]:
        """Resume support (torch scheduler ``state_dict`` analogue): the
        trainer persists this next to the checkpoint so plateau counters
        survive a restart."""
        return {
            "lr": self.lr, "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: Dict[str, float]) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])

    def step(self, metric: float) -> float:
        """Feed one epoch's metric; returns the (possibly reduced) LR."""
        current = float(metric)
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr


def set_opt_learning_rate(opt_state, lr: float):
    """Rewrite the injected ``learning_rate`` hyperparameter leaf of an
    optimizer state built with plateau scheduling. Host-side pytree surgery:
    the replacement leaf keeps shape/dtype, so the already-compiled train
    step is reused as-is."""
    import jax
    import jax.numpy as jnp

    found = 0

    def visit(path, leaf):
        nonlocal found
        if any(getattr(k, "key", None) == "learning_rate" for k in path):
            found += 1
            return jnp.asarray(lr, jnp.asarray(leaf).dtype)
        return leaf

    new_state = jax.tree_util.tree_map_with_path(visit, opt_state)
    if found != 1:
        raise ValueError(
            f"expected exactly one injected learning_rate leaf, found {found} — "
            "was the optimizer built with a ReduceLROnPlateau lr_scheduler_config?"
        )
    return new_state


# ---- torch.optim trajectories without optax equivalents -------------------


class _CountState(NamedTuple):
    count: Any


class _RpropState(NamedTuple):
    prev_grad: Any
    step_size: Any


def _scale_by_asgd(schedule, lambd: float, alpha: float, t0: float):
    """torch.optim.ASGD's parameter trajectory (``_single_tensor_asgd``):
    ``p <- p*(1 - lambd*eta_t) - eta_t*g`` with
    ``eta_t = lr/(1 + lambd*lr*(t-1))**alpha`` (eta is recomputed from the
    *current* group lr at the end of each step, so a schedule enters one step
    late, exactly as in torch). The polyak average ``ax`` that torch also
    maintains never feeds back into the trajectory (torch reads it only via
    ``t0``-gated averaging the reference never uses), so it is not carried.
    Incoming updates are the (optionally L2-decayed) gradients; this must be
    the FINAL element of the chain (it applies the learning rate itself)."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return _CountState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        c = state.count  # completed updates so far; this is update t = c+1
        lr = schedule(jnp.maximum(c - 1, 0)) if callable(schedule) else schedule
        eta = lr / (1.0 + lambd * lr * c.astype(jnp.float32)) ** alpha
        new = jax.tree.map(
            lambda g, p: (-eta * g - (lambd * eta) * p).astype(g.dtype),
            updates, params,
        )
        return new, _CountState(count=c + 1)

    return optax.GradientTransformation(init, update)


def _scale_by_rprop(lr: float, eta_minus: float, eta_plus: float,
                    step_min: float, step_max: float):
    """torch.optim.Rprop (``_single_tensor_rprop``): sign-based step-size
    adaptation. Per element: grow the step by ``eta_plus`` when the gradient
    keeps its sign, shrink by ``eta_minus`` (and skip the update, zeroing the
    carried gradient) when it flips. ``lr`` only seeds the initial step size
    — torch ignores later group-lr changes, so external schedules are
    intentionally not consulted. Must be the final element of the chain."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return _RpropState(
            prev_grad=jax.tree.map(jnp.zeros_like, params),
            step_size=jax.tree.map(lambda p: jnp.full_like(p, lr), params),
        )

    def update(updates, state, params=None):
        del params

        def per_leaf(g, prev, step):
            sign = jnp.sign(g * prev)
            mult = jnp.where(sign > 0, eta_plus, jnp.where(sign < 0, eta_minus, 1.0))
            new_step = jnp.clip(step * mult, step_min, step_max)
            g_eff = jnp.where(sign < 0, 0.0, g)
            return (-jnp.sign(g_eff) * new_step).astype(g.dtype), g_eff, new_step

        flat = jax.tree.map(per_leaf, updates, state.prev_grad, state.step_size)
        u = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        prev = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        step = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
        return u, _RpropState(prev_grad=prev, step_size=step)

    return optax.GradientTransformation(init, update)


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

    plateau = bool(
        use_lr_scheduler and lr_scheduler_cfg
        and lr_scheduler_cfg.get("name") == "ReduceLROnPlateau"
    )
    if plateau:
        # metric feedback can't be a step schedule: the LR lives in the
        # optimizer state as an injected hyperparameter and the host-side
        # ReduceLROnPlateau controller rewrites it between epochs
        # (TrainerPipeline.set_learning_rate / set_opt_learning_rate)
        schedule: Any = lr
    elif use_lr_scheduler and lr_scheduler_cfg:
        schedule = make_lr_schedule(dict(lr_scheduler_cfg), lr, steps_per_epoch)
    else:
        schedule = lr

    def scale_lr():
        if plateau:
            return optax.inject_hyperparams(optax.scale_by_learning_rate)(
                learning_rate=lr
            )
        return optax.scale_by_learning_rate(schedule)

    if name == "Adam":
        b1, b2 = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch-Adam L2 position
        parts += [
            optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps),
            scale_lr(),
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
        parts.append(scale_lr())
        return optax.chain(*parts)

    if name == "RMSprop":
        alpha = float(cfg.pop("alpha", 0.99))
        eps = float(cfg.pop("eps", 1e-8))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts += [optax.scale_by_rms(decay=alpha, eps=eps), scale_lr()]
        return optax.chain(*parts)

    # the remaining torch.optim names map onto optax transforms directly;
    # weight_decay stays in the torch-L2 position (added to the gradient
    # before the accumulator update), matching torch.optim semantics
    def _l2_chain(*transforms):
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(*parts, *transforms, scale_lr())

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

    # ASGD / Rprop apply the learning rate themselves (eta decay / adaptive
    # per-element step sizes), so they terminate their own chains and do not
    # compose with the plateau-injected scale_lr() element
    if name in ("ASGD", "Rprop") and plateau:
        raise ValueError(
            f"ReduceLROnPlateau is not supported with {name}: {name} owns its "
            "learning rate internally (torch ignores/folds group-lr changes "
            "there too) — pick a gradient-scaled optimizer or a step schedule"
        )

    if name == "ASGD":
        lambd = float(cfg.pop("lambd", 1e-4))
        alpha = float(cfg.pop("alpha", 0.75))
        t0 = float(cfg.pop("t0", 1e6))
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(*parts, _scale_by_asgd(schedule, lambd, alpha, t0))

    if name == "Rprop":
        em, ep = cfg.pop("etas", (0.5, 1.2))
        smin, smax = cfg.pop("step_sizes", (1e-6, 50.0))
        # torch.optim.Rprop has no weight_decay parameter; reject rather than
        # silently invent semantics the oracle can't confirm
        if wd:
            raise ValueError("Rprop does not take weight_decay (torch has none)")
        return _scale_by_rprop(lr, float(em), float(ep), float(smin), float(smax))

    # LBFGS and SparseAdam are deliberately refused: both would crash the
    # reference's own loop too (LBFGS needs a closure its trainer never
    # passes, SparseAdam rejects the dense gradients this model produces —
    # /root/reference/train.py:183-184), so there is no working behavior to
    # match.
    raise ValueError(
        f"unsupported optimizer '{name}'; supported: Adam, AdamW, SGD, RMSprop, "
        "Adagrad, Adadelta, Adamax, NAdam, RAdam, ASGD, Rprop"
    )
