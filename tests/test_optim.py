"""Optimizer / LR-schedule factories vs torch.optim oracles.

The reference resolves optimizers and schedulers by name from the config
(``train.py:83-97``); each supported name must track the torch implementation
it mirrors. 5-step trajectories on a small quadratic are compared directly
against torch.optim (CPU torch is the independent oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audioyolo_tpu.train.optim import make_lr_schedule, make_optimizer


def _run_optax(opt_cfg, steps, w0, grad_fn):
    tx = make_optimizer(opt_cfg, None, 1)
    w = jnp.asarray(w0)
    state = tx.init(w)
    traj = []
    for _ in range(steps):
        g = jnp.asarray(grad_fn(np.asarray(w)))
        updates, state = tx.update(g, state, w)
        w = w + updates
        traj.append(np.asarray(w).copy())
    return np.stack(traj)


def _run_torch(name, kwargs, steps, w0, grad_fn):
    w = torch.tensor(w0, requires_grad=True)
    opt = getattr(torch.optim, name)([w], **kwargs)
    traj = []
    for _ in range(steps):
        opt.zero_grad()
        w.grad = torch.tensor(grad_fn(w.detach().numpy()))
        opt.step()
        traj.append(w.detach().numpy().copy())
    return np.stack(traj)


W0 = np.array([1.5, -0.7, 0.3, 2.0], np.float32)
GRAD = lambda w: (w + 0.1 * np.sin(w)).astype(np.float32)  # smooth, nonlinear


CASES = [
    ("Adam", {"lr": 0.05, "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01}),
    ("AdamW", {"lr": 0.05, "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01}),
    ("SGD", {"lr": 0.05, "momentum": 0.9, "nesterov": True, "weight_decay": 0.01}),
    ("RMSprop", {"lr": 0.05, "alpha": 0.99, "eps": 1e-8, "weight_decay": 0.01}),
    ("Adagrad", {"lr": 0.05, "eps": 1e-10, "weight_decay": 0.01}),
    ("Adadelta", {"lr": 0.5, "rho": 0.9, "eps": 1e-6, "weight_decay": 0.01}),
    ("Adamax", {"lr": 0.05, "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01}),
    ("RAdam", {"lr": 0.05, "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01}),
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[c[0] for c in CASES])
def test_optimizer_matches_torch(name, kwargs):
    ours = _run_optax({"name": name, **kwargs}, 5, W0, GRAD)
    theirs = _run_torch(name, kwargs, 5, W0, GRAD)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_nadam_decreases_quadratic():
    # optax NAdam is the Dozat Nesterov-Adam formulation, NOT torch's NAdam
    # (which adds a 0.96^t momentum-decay schedule) — documented deviation;
    # assert it optimizes rather than matching torch step-for-step.
    traj = _run_optax({"name": "NAdam", "lr": 0.05}, 20, W0, GRAD)
    assert np.abs(traj[-1]).sum() < np.abs(W0).sum()


def test_unknown_optimizer_and_scheduler_error_clearly():
    with pytest.raises(ValueError, match="supported"):
        make_optimizer({"name": "LBFGS", "lr": 1.0}, None, 1)
    with pytest.raises(ValueError, match="supported"):
        make_lr_schedule({"name": "ReduceLROnPlateau"}, 1e-3, 1)


SCHED_CASES = [
    ("StepLR", {"step_size": 3, "gamma": 0.5}),
    ("MultiStepLR", {"milestones": [2, 5, 7], "gamma": 0.1}),
    ("ExponentialLR", {"gamma": 0.9}),
    ("CosineAnnealingLR", {"T_max": 10, "eta_min": 1e-5}),
    ("CosineAnnealingWarmRestarts", {"T_0": 4, "T_mult": 1, "eta_min": 1e-5}),
    ("CosineAnnealingWarmRestarts", {"T_0": 3, "T_mult": 2, "eta_min": 0.0}),
    ("LinearLR", {"start_factor": 0.25, "end_factor": 1.0, "total_iters": 4}),
    ("PolynomialLR", {"total_iters": 8, "power": 2.0}),
    ("OneCycleLR", {"max_lr": 0.5, "total_steps": 10}),
    ("OneCycleLR", {"max_lr": 0.3, "total_steps": 12, "pct_start": 0.5,
                    "div_factor": 10.0, "final_div_factor": 100.0}),
]


@pytest.mark.parametrize("name,kwargs", SCHED_CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(SCHED_CASES)])
def test_lr_schedule_matches_torch(name, kwargs):
    base_lr = 0.1
    sched = make_lr_schedule({"name": name, **kwargs}, base_lr, steps_per_epoch=1)
    w = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([w], lr=base_lr)
    tsched = getattr(torch.optim.lr_scheduler, name)(opt, **kwargs)
    for epoch in range(10):
        ours = float(sched(jnp.asarray(epoch)))
        theirs = opt.param_groups[0]["lr"]
        assert ours == pytest.approx(theirs, rel=1e-5, abs=1e-8), f"epoch {epoch}"
        opt.step()
        tsched.step()


def test_schedule_is_epoch_stepped():
    # steps_per_epoch converts the optax step counter to the reference's
    # once-per-epoch scheduler stepping (train.py:183-184)
    sched = make_lr_schedule({"name": "StepLR", "step_size": 1, "gamma": 0.5}, 1.0, 4)
    assert float(sched(jnp.asarray(0))) == 1.0
    assert float(sched(jnp.asarray(3))) == 1.0  # still epoch 0
    assert float(sched(jnp.asarray(4))) == 0.5  # epoch 1


ASGD_RPROP_CASES = [
    ("ASGD", {"lr": 0.05, "lambd": 1e-4, "alpha": 0.75, "t0": 1e6, "weight_decay": 0.01}),
    ("ASGD", {"lr": 0.5, "lambd": 0.05, "alpha": 0.75, "t0": 1e6}),  # eta decay visible
    ("Rprop", {"lr": 0.01, "etas": (0.5, 1.2), "step_sizes": (1e-6, 50.0)}),
    ("Rprop", {"lr": 0.1, "etas": (0.4, 1.5), "step_sizes": (1e-4, 1.0)}),
]


@pytest.mark.parametrize("name,kwargs", ASGD_RPROP_CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(ASGD_RPROP_CASES)])
def test_asgd_rprop_match_torch(name, kwargs):
    # 12 steps: long enough for Rprop sign flips and visible ASGD eta decay
    ours = _run_optax({"name": name, **kwargs}, 12, W0, GRAD)
    theirs = _run_torch(name, kwargs, 12, W0, GRAD)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_rprop_rejects_weight_decay():
    with pytest.raises(ValueError, match="weight_decay"):
        make_optimizer({"name": "Rprop", "lr": 0.01, "weight_decay": 0.1}, None, 1)


PLATEAU_CASES = [
    {"mode": "min", "factor": 0.5, "patience": 2, "threshold": 1e-4,
     "threshold_mode": "rel", "cooldown": 0, "min_lr": 0.0},
    {"mode": "min", "factor": 0.1, "patience": 1, "threshold": 0.05,
     "threshold_mode": "abs", "cooldown": 2, "min_lr": 1e-4},
    {"mode": "max", "factor": 0.5, "patience": 0, "threshold": 1e-2,
     "threshold_mode": "rel", "cooldown": 1, "min_lr": 0.0},
]


@pytest.mark.parametrize("kwargs", PLATEAU_CASES,
                         ids=["min-rel", "min-abs-cooldown", "max-rel"])
def test_reduce_lr_on_plateau_matches_torch(kwargs):
    """LR trajectory over a noisy plateauing metric must track
    torch.optim.lr_scheduler.ReduceLROnPlateau decision-for-decision."""
    from audioyolo_tpu.train.optim import ReduceLROnPlateau

    rng = np.random.default_rng(7)
    base = 3.0 - 2.0 * (1 - np.exp(-np.arange(40) / 5.0))  # decays then flat
    metrics = base + rng.normal(0, 0.02, size=40)
    if kwargs["mode"] == "max":
        metrics = -metrics

    w = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([w], lr=0.1)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kwargs)
    ours = ReduceLROnPlateau(0.1, **kwargs)
    for m in metrics:
        sched.step(float(m))
        got = ours.step(float(m))
        assert got == pytest.approx(opt.param_groups[0]["lr"], rel=1e-12), m


def test_plateau_injected_lr_drives_updates():
    """make_optimizer with a ReduceLROnPlateau scheduler config must expose a
    rewritable learning_rate leaf in the optimizer state that actually scales
    the next update."""
    from audioyolo_tpu.train.optim import set_opt_learning_rate

    tx = make_optimizer(
        {"name": "SGD", "lr": 0.5},
        {"name": "ReduceLROnPlateau", "factor": 0.5, "patience": 0}, 1,
    )
    w = jnp.asarray(W0)
    state = tx.init(w)
    u1, state = tx.update(jnp.ones_like(w), state, w)
    np.testing.assert_allclose(np.asarray(u1), -0.5, rtol=1e-6)
    state = set_opt_learning_rate(state, 0.05)
    u2, state = tx.update(jnp.ones_like(w), state, w)
    np.testing.assert_allclose(np.asarray(u2), -0.05, rtol=1e-6)


def test_plateau_state_dict_roundtrip():
    from audioyolo_tpu.train.optim import ReduceLROnPlateau

    a = ReduceLROnPlateau(0.1, patience=1)
    for m in (1.0, 1.0, 1.0):
        a.step(m)
    b = ReduceLROnPlateau(0.1, patience=1)
    b.load_state_dict(a.state_dict())
    for m in (1.0, 1.0, 1.0, 1.0):
        assert a.step(m) == b.step(m)
