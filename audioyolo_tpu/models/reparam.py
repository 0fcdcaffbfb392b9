"""Structural re-parameterization as a functional pytree fold.

Semantics of reference ``RepVGGBlock.reparameterize`` /
``toggle_inference_mode`` (``modules/_common.py:97-145``): the 3x3+BN, 1x1+BN
and identity-BN branches of every RepVGG block are merged into one biased 3x3
conv. The reference mutates modules in place; here the fold is a pure function
``(params, batch_stats) -> deploy_params`` consumed by a ``deploy=True`` model,
which suits JAX (weights are data, folding happens once at load time, and the
compiled inference graph only ever contains the single-conv form).

The fold itself runs in host numpy: it is weight-load-time work, and doing it
op-by-op on a (possibly remote) accelerator wastes minutes of dispatch for a
few MB of arithmetic.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

BN_EPS = 1e-5


def _merge_conv_bn(kernel, bn: Dict[str, Any], stats: Dict[str, Any]):
    """Fold BN (scale/bias + running mean/var) into a conv kernel (HWIO).

    Returns (kernel', bias'): y = conv(x, k)*g/std - mu*g/std + b.
    """
    gamma = np.asarray(bn["scale"])
    beta = np.asarray(bn["bias"])
    mu = np.asarray(stats["mean"])
    var = np.asarray(stats["var"])
    std = np.sqrt(var + BN_EPS)
    k = np.asarray(kernel) * (gamma / std)[None, None, None, :]
    b = beta - mu * gamma / std
    return k, b


def _fold_block(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    """Fold one RepVGG block subtree into ``{"reparam": {"conv": {...}}}``."""
    k3, b3 = _merge_conv_bn(
        params["conv3x3"]["conv"]["conv"]["kernel"],
        params["conv3x3"]["norm"],
        stats["conv3x3"]["norm"],
    )
    k1, b1 = _merge_conv_bn(
        params["conv1x1"]["conv"]["conv"]["kernel"],
        params["conv1x1"]["norm"],
        stats["conv1x1"]["norm"],
    )
    # Pad the 1x1 kernel into the center tap of a 3x3 kernel.
    k1 = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k = k3 + k1
    b = b3 + b1
    if "identity" in params:
        in_ch = k3.shape[2]
        eye = np.eye(in_ch, dtype=k3.dtype)[None, None, :, :]  # dirac 1x1, HWIO
        ki, bi = _merge_conv_bn(eye, params["identity"], stats["identity"])
        k = k + np.pad(ki, ((1, 1), (1, 1), (0, 0), (0, 0)))
        b = b + bi
    return {"reparam": {"conv": {"kernel": k, "bias": b}}}


def _is_repvgg_subtree(p: Any) -> bool:
    return (
        isinstance(p, dict)
        and "conv3x3" in p
        and "conv1x1" in p
        and isinstance(p.get("conv3x3"), dict)
        and "norm" in p["conv3x3"]
    )


def _walk(params: Any, stats: Any):
    if not isinstance(params, dict):
        return params
    if _is_repvgg_subtree(params):
        return _fold_block(params, stats)
    return {
        key: _walk(val, (stats or {}).get(key) if isinstance(stats, dict) else None)
        for key, val in params.items()
    }


def fold_repvgg(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every RepVGG block in a trained variables dict.

    Input: ``{"params": ..., "batch_stats": ...}`` from a ``deploy=False``
    model. Output: variables for the ``deploy=True`` model — RepVGG subtrees
    replaced by single fused convs; all other params and batch stats kept (the
    remaining ConvNorm BNs still need their running stats at inference).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    new_params = _walk(params, stats)
    new_stats = _prune_folded_stats(new_params, stats)
    out = dict(variables)
    out["params"] = new_params
    if new_stats:
        out["batch_stats"] = new_stats
    return out


def _is_stat_leaf(d: Any) -> bool:
    return isinstance(d, dict) and set(d.keys()) <= {"mean", "var"} and "mean" in d


def _prune_folded_stats(params: Any, stats: Any):
    """Keep only batch_stats entries whose module still exists post-fold.

    The stats tree mirrors the module tree, bottoming out at
    ``{"mean", "var"}`` leaves owned by BatchNorm modules; a leaf survives iff
    its module path still exists in the folded params tree (folded blocks have
    their BN stats baked into the fused conv and are dropped).
    """
    if _is_stat_leaf(stats) or not isinstance(stats, dict):
        return stats
    pruned = {}
    for key, val in stats.items():
        if isinstance(params, dict) and key in params:
            sub = _prune_folded_stats(params[key], val)
            if sub:
                pruned[key] = sub
    return pruned
