"""Multi-scale fusion neck (YOLOv6-flavoured; reference
``modules/_common.py:218-265``).

Top-down path: ``p4 = CSPSPPF(f4)``, ``p3 = RepBlock(BiC(f3, f2, p4))``,
``p2 = RepBlock(BiC(f2, f1, p3))``; bottom-up PAN:
``n3 = RepBlock(cat(p3, down(n2)))``, ``n4 = RepBlock(cat(p4, down(n3)))``.
Feature-pyramid heights are mean-pooled to 1 up front when they differ, and the
three outputs are pooled/squeezed to per-cell sequences ``(B, grid, out_ch)``
with grids T/8, T/16, T/32 (120/60/30 for the shipped config).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BiCModule, CSPSPPFModule, ConvNorm, RepBlock

Dtype = Any


def _pool_h(x: jax.Array) -> jax.Array:
    """adaptive_avg_pool2d(output=(1, W)) == mean over the H axis (NHWC)."""
    return jnp.mean(x, axis=1, keepdims=True)


class MultiScaleFmapModule(nn.Module):
    out_channels: int
    c_h: int = 128
    deploy: bool = False
    branch_act: bool = False  # reference-exact per-branch RepVGG activation
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        fmap1: jax.Array,
        fmap2: jax.Array,
        fmap3: jax.Array,
        fmap4: jax.Array,
        train: bool,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # The reference guards with a chained `!=` that effectively tests
        # fmap1.H != fmap2.H (modules/_common.py:248) — i.e. "pool when the
        # pyramid heights differ" (ResNet backbone). We implement the intent.
        if not (fmap1.shape[1] == fmap2.shape[1] == fmap3.shape[1] == fmap4.shape[1]):
            fmap1, fmap2, fmap3, fmap4 = map(_pool_h, (fmap1, fmap2, fmap3, fmap4))

        kw = dict(dtype=self.dtype)
        p4 = CSPSPPFModule(self.c_h, name="cspsppf", **kw)(fmap4, train)
        p3 = BiCModule(self.c_h, name="bic3", **kw)(fmap3, fmap2, p4, train)
        p3 = RepBlock(self.c_h, deploy=self.deploy, branch_act=self.branch_act, name="rep_block3_1", **kw)(p3, train)
        p2 = BiCModule(self.c_h, name="bic2", **kw)(fmap2, fmap1, p3, train)
        p2 = RepBlock(self.out_channels, deploy=self.deploy, branch_act=self.branch_act, name="rep_block2_1", **kw)(p2, train)

        n2 = p2
        d2 = ConvNorm(self.c_h, 3, strides=(1, 2), name="conv2_downsample", **kw)(n2, train)
        n3 = RepBlock(self.out_channels, deploy=self.deploy, branch_act=self.branch_act, name="rep_block3_2", **kw)(
            jnp.concatenate([p3, d2], axis=-1), train
        )
        d3 = ConvNorm(self.c_h, 3, strides=(1, 2), name="conv3_downsample", **kw)(n3, train)
        n4 = RepBlock(self.out_channels, deploy=self.deploy, branch_act=self.branch_act, name="rep_block4_1", **kw)(
            jnp.concatenate([p4, d3], axis=-1), train
        )

        # (B, 1, W, C) -> (B, W, C) per-cell prediction sequences.
        n2 = jnp.squeeze(_pool_h(n2), axis=1)
        n3 = jnp.squeeze(_pool_h(n3), axis=1)
        n4 = jnp.squeeze(_pool_h(n4), axis=1)
        return n2, n3, n4
