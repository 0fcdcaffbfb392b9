"""Layer numerics vs torch oracles: BatchNorm semantics, conv padding,
bilinear resize, max pool, and RepVGG train/deploy equivalence."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audioyolo_tpu.models.layers import (
    BatchNorm,
    Conv2d,
    RepVGGBlock,
    max_pool_same,
    resize_w_bilinear,
)
from audioyolo_tpu.models.reparam import fold_repvgg


def test_batchnorm_train_matches_torch(rng):
    x = rng.standard_normal((4, 5, 6, 3)).astype(np.float32)  # NHWC
    bn = BatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    out, mutated = bn.apply(
        vars_, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tout = tbn(tx).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), tout, rtol=1e-4, atol=1e-5)
    # running stats: torch uses unbiased var with momentum=0.1
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6
    )


def test_batchnorm_eval_uses_running_stats(rng):
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    bn = BatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=True)
    vars_ = jax.tree.map(lambda v: v, vars_)
    stats = {"mean": jnp.asarray([1.0, -1.0]), "var": jnp.asarray([4.0, 0.25])}
    out = bn.apply(
        {"params": vars_["params"], "batch_stats": stats},
        jnp.asarray(x),
        use_running_average=True,
    )
    ref = (x - np.array([1.0, -1.0])) / np.sqrt(np.array([4.0, 0.25]) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv_same_padding_matches_torch(rng):
    x = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    conv = Conv2d(4, (3, 7), strides=(1, 2), padding=(1, 3))
    vars_ = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(conv.apply(vars_, jnp.asarray(x)))

    k = np.asarray(vars_["params"]["conv"]["kernel"])  # HWIO
    b = np.asarray(vars_["params"]["conv"]["bias"])
    tk = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)))  # OIHW
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tout = F.conv2d(tx, tk, torch.from_numpy(b), stride=(1, 2), padding=(1, 3))
    np.testing.assert_allclose(out, tout.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_s2d_conv_matches_plain_and_torch(rng):
    """The space-to-depth stride-2 conv (layers.s2d_conv2d, used for the
    channel-starved ResNet stem) must be exact: same params tree as the plain
    conv, same output (fp32 reassociation tolerance), torch-verified."""
    from audioyolo_tpu.models.layers import s2d_conv2d

    cases = [
        # (H, W, k, ci, co, pad, fold) — first two are the actual stem shapes
        (32, 96, 7, 2, 8, 3, (True, True)),
        (16, 48, 7, 8, 8, 3, (True, True)),
        (16, 48, 7, 8, 8, 3, (False, True)),
        (16, 48, 7, 8, 8, 3, (True, False)),
        (8, 24, 3, 5, 7, 1, (True, True)),
        (8, 24, 1, 5, 7, 0, (True, True)),
        (12, 20, 5, 3, 4, 2, (True, True)),
    ]
    for H, W, k, ci, co, pad, fold in cases:
        x = rng.standard_normal((2, H, W, ci)).astype(np.float32)
        plain = Conv2d(co, k, 2, pad, use_bias=False)
        folded = Conv2d(co, k, 2, pad, use_bias=False, s2d=fold)
        vp = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
        vf = folded.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # identical parameter trees (paths, shapes, values)
        np.testing.assert_array_equal(
            np.asarray(vp["params"]["conv"]["kernel"]),
            np.asarray(vf["params"]["conv"]["kernel"]),
        )
        out_p = np.asarray(plain.apply(vp, jnp.asarray(x)))
        out_f = np.asarray(folded.apply(vp, jnp.asarray(x)))
        np.testing.assert_allclose(out_f, out_p, rtol=1e-4, atol=1e-4,
                                   err_msg=str((H, W, k, ci, co, pad, fold)))
        # torch oracle
        tk = torch.from_numpy(
            np.transpose(np.asarray(vp["params"]["conv"]["kernel"]), (3, 2, 0, 1)))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = F.conv2d(tx, tk, None, stride=2, padding=pad)
        np.testing.assert_allclose(
            out_f, tout.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
        # direct functional form agrees too
        kern = jnp.asarray(vp["params"]["conv"]["kernel"])
        out_fn = np.asarray(s2d_conv2d(jnp.asarray(x), kern, (pad, pad), fold))
        np.testing.assert_allclose(out_fn, out_p, rtol=1e-4, atol=1e-4)


def test_s2d_conv_fallback_on_odd_extents(rng):
    """Odd spatial extents / non-2 strides silently fall back to the plain
    conv (same params), so the s2d option is always safe to request."""
    x = rng.standard_normal((2, 9, 15, 3)).astype(np.float32)
    plain = Conv2d(4, 3, 2, 1, use_bias=False)
    folded = Conv2d(4, 3, 2, 1, use_bias=False, s2d=(True, True))
    vp = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(plain.apply(vp, jnp.asarray(x))),
        np.asarray(folded.apply(vp, jnp.asarray(x))),
    )
    # stride-1 conv: s2d ignored entirely
    s1p = Conv2d(4, 3, 1, 1, use_bias=False)
    s1f = Conv2d(4, 3, 1, 1, use_bias=False, s2d=(True, True))
    v1 = s1p.init(jax.random.PRNGKey(1), jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(s1p.apply(v1, jnp.asarray(x))),
        np.asarray(s1f.apply(v1, jnp.asarray(x))),
    )


def test_s2d_stem_modes_equivalent(rng):
    """ResNetBackbone's tpu_config.s2d_stem modes (off / on / full, plus
    legacy bools) are numerically equivalent with identical param trees —
    the fold is a pure layout reformulation (models/backbone.py)."""
    from audioyolo_tpu.models.backbone import ResNetBackbone

    x = jnp.asarray(rng.standard_normal((2, 32, 64, 2)).astype(np.float32))
    ref = None
    for mode in ("off", "on", "full", True, False):
        m = ResNetBackbone(block="BasicBlock", block_layers=(1, 1, 1, 1),
                           s2d_stem=mode)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs = [np.asarray(o) for o in m.apply(v, x, train=False)]
        if ref is None:
            ref = outs
        else:
            for a, b in zip(ref, outs):
                np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                           err_msg=f"mode={mode}")


def test_resize_w_matches_torch_bilinear(rng):
    x = rng.standard_normal((2, 3, 10, 4)).astype(np.float32)  # NHWC
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for out_w in (20, 5, 7, 13):
        ours = np.asarray(resize_w_bilinear(jnp.asarray(x), out_w))
        ref = F.interpolate(tx, size=(3, out_w), mode="bilinear", align_corners=False)
        np.testing.assert_allclose(
            ours, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5, err_msg=f"out_w={out_w}"
        )


def test_max_pool_same_matches_torch(rng):
    x = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
    ours = np.asarray(max_pool_same(jnp.asarray(x), 5))
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.max_pool2d(tx, kernel_size=5, stride=1, padding=2)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


def _randomize_stats(vars_, rng):
    """Give BN running stats non-trivial values so the fold is actually tested."""

    def visit(path, leaf):
        name = "/".join(str(p.key) for p in path)
        if name.endswith("mean"):
            return jnp.asarray(rng.standard_normal(leaf.shape).astype(np.float32))
        if name.endswith("var"):
            return jnp.asarray(
                (0.5 + rng.random(leaf.shape)).astype(np.float32)
            )
        return leaf

    return jax.tree_util.tree_map_with_path(visit, vars_)


def test_repvgg_fold_equivalence(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 12)).astype(np.float32))
    block = RepVGGBlock(features=12)  # stride 1, in==out -> all 3 branches
    vars_ = block.init(jax.random.PRNGKey(1), x, train=False)
    vars_ = _randomize_stats(vars_, rng)

    y_train_form = block.apply(vars_, x, train=False)
    folded = fold_repvgg(vars_)
    deploy = RepVGGBlock(features=12, deploy=True)
    y_deploy = deploy.apply({"params": folded["params"]}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_train_form), np.asarray(y_deploy), rtol=1e-4, atol=1e-4
    )


def test_repvgg_fold_equivalence_strided(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)).astype(np.float32))
    block = RepVGGBlock(features=10, strides=(1, 2))  # no identity branch
    vars_ = block.init(jax.random.PRNGKey(2), x, train=False)
    vars_ = _randomize_stats(vars_, rng)
    y_ref = block.apply(vars_, x, train=False)
    folded = fold_repvgg(vars_)
    y_dep = RepVGGBlock(features=10, strides=(1, 2), deploy=True).apply(
        {"params": folded["params"]}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_dep), rtol=1e-4, atol=1e-4)


def test_batchnorm_offset_heavy_variance_accuracy():
    """Round-5 review finding: the one-pass E[x^2]-E[x]^2 variance cancels
    catastrophically in fp32 when a channel's mean^2 dwarfs its variance
    (var clamps to 0 and normalization explodes). The compensated form
    shifts by the running mean, whose distance to the batch mean is bounded
    by the per-step drift rate in real training — with tracked stats the
    variance must match a float64 reference even at mean/std ~ 10,000."""
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from audioyolo_tpu.models.layers import BatchNorm

    rng = np.random.default_rng(5)
    c = 6
    means = np.array([0.0, 1.0, -3.0, 500.0, -800.0, 250.0], np.float32)
    stds = np.array([1.0, 0.5, 2.0, 0.05, 0.08, 0.02], np.float32)
    x = (means + stds * rng.standard_normal((4, 8, 16, c))).astype(np.float32)

    bn = BatchNorm()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    v = unfreeze(v) if hasattr(v, "unfreeze") else dict(v)
    # tracked running stats: within one drift step of the batch statistics
    bs = dict(v["batch_stats"])
    bs["mean"] = jnp.asarray(means + 0.1 * stds)
    bs["var"] = jnp.asarray(stds**2)
    v["batch_stats"] = bs
    y, _ = bn.apply(v, jnp.asarray(x), use_running_average=False,
                    mutable=["batch_stats"])

    x64 = x.astype(np.float64)
    m64 = x64.mean(axis=(0, 1, 2))
    v64 = ((x64 - m64) ** 2).mean(axis=(0, 1, 2))
    ref = (x64 - m64) / np.sqrt(v64 + 1e-5)
    np.testing.assert_allclose(np.asarray(y), ref, atol=5e-2)
    # the naive form clamps var to ~0 here and the output explodes to
    # O(std/sqrt(eps)) ~ 1e1-1e2x the true normalized values — the atol
    # above fails loudly on that failure mode
