"""Shared building blocks (NHWC, flax.linen).

Functional re-expressions of the reference's ``modules/_common.py`` blocks:
ConvNorm (ConvBorINorm, :7-48), RepVGGBlock (:51-145) with the structural
re-parameterization done as a *pytree fold* (see reparam.py) instead of module
surgery, RepBlock (:148-158), BiCModule (:161-185), CSPSPPFModule (:188-215).

Design notes (TPU-first):
- NHWC layouts; convolutions via flax/lax so XLA tiles them onto the MXU.
- BatchNorm is hand-rolled to carry exact PyTorch semantics (biased variance
  for normalization, unbiased for the running estimate, momentum = weight of
  the new batch) so imported reference checkpoints behave identically.
- bilinear W-axis resize is implemented directly (half-pixel centers, no
  antialiasing) to match ``nn.Upsample(mode="bilinear")`` exactly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

conv_kernel_init = nn.initializers.glorot_uniform()  # torch xavier_uniform_


def tape(x: jax.Array) -> jax.Array:
    """Mark a tensor as a saved autodiff residual for the trainer's
    selective-remat policy (``TrainerPipeline(remat=True)``).

    Every conv output (and the frontend feature image) is named; under
    ``jax.checkpoint_policies.save_only_these_names`` only these tensors are
    kept for the backward pass — the convs themselves are never recomputed,
    while every BatchNorm/activation intermediate (fp32 even in a bf16-body
    step, see BatchNorm) is rematerialized from the nearest saved conv
    output. That shrinks the training tape from mostly-fp32 to pure compute
    dtype at the cost of re-running cheap elementwise chains in backward —
    the right trade for a memory-bound step (docs/PERFORMANCE.md round 5).
    Outside a remat context this is the identity."""
    return checkpoint_name(x, "ayt_tape")


def conv_bias_init(key, shape, dtype=jnp.float32):
    # Reference fills every conv bias with 0.01 (modules/_architecture.py:165-169).
    return jnp.full(shape, 0.01, dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


class BatchNorm(nn.Module):
    """BatchNorm2d with PyTorch numerics.

    - normalization uses the biased batch variance;
    - running stats are EMAs with ``momentum`` as the *new-sample* weight and
      an unbiased variance estimate (torch convention, momentum=0.1);
    - statistics are accumulated in float32 regardless of compute dtype.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            # One-pass statistics: both moments from a single fused read of
            # x, where the two-pass mean-then-centered-square form forces
            # two sequential sweeps (measured ~2 ms/step of convert_reduce
            # fusions at B=128 on v5e — docs/PERFORMANCE.md round 5).
            # Computed in the COMPENSATED form, shifted by the running mean
            # c: var = E[(x-c)^2] - (E[x]-c)^2. The naive E[x^2]-E[x]^2
            # cancels catastrophically in fp32 when a channel's mean^2
            # dwarfs its variance (mean ~500, std ~0.05 loses ALL variance
            # bits); with the shift the cancellation term is
            # (batch_mean - running_mean)^2 / var, which collapses as soon
            # as the running stats track the data (and is exactly the
            # naive form only at step 0, where conv outputs on
            # standardized features are near zero-mean anyway). stop-
            # gradient: c is a constant shift, the algebra is exact.
            c = jax.lax.stop_gradient(ra_mean.value)
            xs = xf - c
            m1 = jnp.mean(xs, axis=axes)
            mean = c + m1
            var = jnp.maximum(jnp.mean(xs * xs, axis=axes) - m1 * m1, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (xf - mean) * inv + bias
        return y.astype(self.dtype or x.dtype)


def _fold_axis_params(k: int, p: int) -> Tuple[int, int, int, int]:
    """Stride-2 conv along one axis (kernel k, symmetric zero pad p) re-expressed
    on a 2x space-to-depth folded grid: returns (folded kernel size, front zero
    taps, m_min, m_max) where output q reads folded rows q+m, m in [m_min, m_max].

    Derivation: input index r = 2q - p + t (t in [0, k)) rewritten r = 2(q+m)+d
    with d in {0, 1}; the folded tap (m, d) carries weight w[t], t = 2m + d + p.
    """
    m_min = -((p + 1) // 2)
    m_max = (k - 1 - p) // 2
    k2 = m_max - m_min + 1
    front = -(2 * m_min + p)  # zero taps prepended so t=0 lands at slot `front`
    return k2, front, m_min, m_max


def s2d_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    padding: Tuple[int, int],
    fold: Tuple[bool, bool] = (True, True),
    precision=None,
) -> jax.Array:
    """Exact stride-(2,2) NHWC conv computed as a space-to-depth folded conv.

    Folding a 2x spatial block into channels turns a channel-starved conv
    (e.g. the stem's 7x7/s2 over the C=2 spectral image, measured 17 TF/s on
    v5e — 128-lane MXU fed 2 lanes) into a stride-1 conv with 4x the input
    channels and a [k//2+1]^2 kernel: identical arithmetic, ~4x the lane
    utilization. Weights are rearranged in-graph (a few KB — free) so the
    parameter tree keeps the reference 7x7 layout (``modules/_backbone.py:
    131-141``) and checkpoints/EMA/optimizer state are unaffected.
    """
    B, H, W, C = x.shape
    kh, kw, ci, co = kernel.shape
    ph, pw = padding
    fh, fw = fold
    h_out = (H + 2 * ph - kh) // 2 + 1
    w_out = (W + 2 * pw - kw) // 2 + 1
    if fh and fw:
        xf = (x.reshape(B, H // 2, 2, W // 2, 2, C)
              .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C))
    elif fw:
        xf = x.reshape(B, H, W // 2, 2 * C)
    elif fh:
        xf = (x.reshape(B, H // 2, 2, W, C)
              .transpose(0, 1, 3, 2, 4).reshape(B, H // 2, W, 2 * C))
    else:
        xf = x
    wf = kernel
    if fh:
        k2h, fr, mmin_h, mmax_h = _fold_axis_params(kh, ph)
        wf = jnp.pad(wf, ((fr, 2 * k2h - fr - kh), (0, 0), (0, 0), (0, 0)))
        wf = wf.reshape(k2h, 2, kw, ci, co)
        pad_h, sh = (-mmin_h, h_out - H // 2 + mmax_h), 1
    else:
        wf = wf.reshape(kh, 1, kw, ci, co)
        k2h, pad_h, sh = kh, (ph, ph), 2
    if fw:
        k2w, fr, mmin_w, mmax_w = _fold_axis_params(kw, pw)
        wf = jnp.pad(wf, ((0, 0), (0, 0), (fr, 2 * k2w - fr - kw), (0, 0), (0, 0)))
        wf = wf.reshape(k2h, wf.shape[1], k2w, 2, ci, co)
        pad_w, sw = (-mmin_w, w_out - W // 2 + mmax_w), 1
    else:
        wf = wf.reshape(k2h, wf.shape[1], kw, 1, ci, co)
        k2w, pad_w, sw = kw, (pw, pw), 2
    wf = wf.transpose(0, 2, 1, 3, 4, 5).reshape(k2h, k2w, -1, co)
    return jax.lax.conv_general_dilated(
        xf, wf, window_strides=(sh, sw), padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


class _ConvParams(nn.Module):
    """Bare conv parameters with ``nn.Conv``-identical paths/shapes/inits, for
    conv formulations ``nn.Conv`` cannot express (see :func:`s2d_conv2d`)."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        kernel = self.param(
            "kernel", conv_kernel_init,
            (*self.kernel_size, self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", conv_bias_init, (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def _int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    s_x: jax.Array,
    strides: Tuple[int, int],
    pad: Tuple[int, int],
) -> jax.Array:
    """Symmetric int8 conv: ``y = conv(q(x), q(w)) * (s_x * s_w) + b``.

    Zero point is 0, so the symmetric zero padding is exact in the quantized
    domain. Weights use per-output-channel scales (absmax/127); activations
    use the calibrated static per-tensor scale ``s_x``. Accumulation is
    int32 on the MXU; the requant multiply and bias add fuse into the
    epilogue. Output dtype follows the incoming activation dtype."""
    out_dt = x.dtype
    # Kernel rows/cols that only ever see zero padding contribute nothing:
    # for a size-1 spatial dim with symmetric pad p and kernel 2p+1, only
    # the middle slice touches data — slice it out (exact). This is also
    # the WORKAROUND for a real backend bug isolated in round 5: the TPU
    # lowering of int8 x int8 -> int32 convs miscomputes (100% mismatch vs
    # CPU) when an H=1 input meets a 3x3 kernel with H-padding at small
    # non-lane-aligned channel counts (e.g. C_in=15, the neck's prediction
    # width) — the exact shape of the neck's conv{2,3}_downsample, which is
    # where the round-4 int8-body TPU gate failure entered
    # (tools/bisect_int8_body.py; docs/PERFORMANCE.md round 5).
    kh_, kw_ = kernel.shape[0], kernel.shape[1]
    ph_, pw_ = pad
    if x.shape[1] == 1 and kh_ == 2 * ph_ + 1 and kh_ > 1:
        kernel, ph_ = kernel[ph_ : ph_ + 1], 0
    if x.shape[2] == 1 and kw_ == 2 * pw_ + 1 and kw_ > 1:
        kernel, pw_ = kernel[:, pw_ : pw_ + 1], 0
    pad = (ph_, pw_)
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf / s_x), -127.0, 127.0).astype(jnp.int8)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0  # (C_out,)
    wq = jnp.clip(jnp.round(kernel / s_w), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias
    return y.astype(out_dt)


class Conv2d(nn.Module):
    """Torch-flavoured conv wrapper: explicit symmetric padding, HWIO kernels.

    ``s2d=(fold_h, fold_w)`` opts a stride-(2,2) conv into the exact
    space-to-depth formulation (:func:`s2d_conv2d`); parameters are identical
    either way. Silently falls back to the plain conv when preconditions
    (stride 2, odd kernel with pad <= k//2, even folded extents) don't hold.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    s2d: Optional[Tuple[bool, bool]] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ph, pw = _pair(self.padding)
        kh, kw = _pair(self.kernel_size)

        # --- int8 post-training quantization hooks (models/quant.py) -------
        # Calibration: when a "quant_stats" collection is mutable (only the
        # calibration pass does this), record this conv's input absolute max.
        # sow() is a no-op otherwise, and the unused max() is dead-code
        # eliminated from ordinary jitted programs.
        if self.is_mutable_collection("quant_stats"):
            self.sow(
                "quant_stats", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        # Execution: a calibrated "quant" collection entry at this conv's
        # path (s_x = input absmax / 127) switches it to int8 x int8 -> int32
        # (v5e MXU int8 peak is 2x bf16). Per-output-channel symmetric weight
        # scales are derived from the fp32 params at trace time (params are
        # untouched — the same checkpoint serves float and int8). Absent the
        # collection this is inert.
        if self.has_variable("quant", "s_x"):
            s_x = self.get_variable("quant", "s_x")
            kernel, bias = _ConvParams(
                self.features, (kh, kw), x.shape[-1], self.use_bias,
                name="conv")()
            return tape(_int8_conv(
                x, kernel, bias, s_x, _pair(self.strides), (ph, pw)))

        # H=1 inputs (the whole neck: pyramid heights are pooled to 1 —
        # models/neck.py): with symmetric pad p and kernel 2p+1, only the
        # middle kernel row ever touches data, so slice it in-graph — the
        # dropped rows multiply zeros (exact: adding 0.0 terms never changes
        # an fp sum), and the conv's MACs fall 3x in forward AND backward.
        # Params keep the reference (kh, kw) layout (checkpoints, EMA,
        # optimizer state unaffected). Same geometry the int8 path slices
        # below — there it is also the workaround for a backend bug.
        if x.shape[1] == 1 and kh == 2 * ph + 1 and kh > 1:
            kernel, bias = _ConvParams(
                self.features, (kh, kw), x.shape[-1], self.use_bias,
                name="conv")()
            dt = self.dtype or x.dtype
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel[ph : ph + 1].astype(dt),
                _pair(self.strides), [(0, 0), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(dt)
            return tape(y)

        fold = self.s2d
        if fold is not None:
            fh, fw = fold
            ok = _pair(self.strides) == (2, 2)
            if fh and (x.shape[1] % 2 or kh % 2 == 0 or ph > kh // 2):
                fh = False
            if fw and (x.shape[2] % 2 or kw % 2 == 0 or pw > kw // 2):
                fw = False
            if ok and (fh or fw):
                kernel, bias = _ConvParams(
                    self.features, (kh, kw), x.shape[-1], self.use_bias,
                    name="conv")()
                dt = self.dtype or x.dtype
                y = s2d_conv2d(x.astype(dt), kernel.astype(dt), (ph, pw),
                               (fh, fw))
                if bias is not None:
                    y = y + bias.astype(dt)
                return tape(y)
        return tape(nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=[(ph, ph), (pw, pw)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_kernel_init,
            bias_init=conv_bias_init,
            name="conv",
        )(x))


class ConvNorm(nn.Module):
    """conv -> norm -> optional activation (reference ConvBorINorm,
    ``modules/_common.py:7-48``; same-padding inferred from kernel size)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    use_bias: bool = True
    act: Optional[Callable[[jax.Array], jax.Array]] = leaky_relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        padding = self.padding
        if padding is None:
            padding = (kh // 2, kw // 2)
        x = Conv2d(
            self.features, (kh, kw), self.strides, padding,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="norm")(x, use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x


class RepVGGBlock(nn.Module):
    """Train-time 3-branch block: 3x3conv+BN, 1x1conv+BN, identity-BN, summed
    then LeakyReLU(0.2) (reference ``modules/_common.py:51-95``).

    ``deploy=True`` declares the folded single-conv form; use
    :func:`audioyolo_tpu.models.reparam.fold_repvgg` to convert a trained
    params tree into deploy params. Folding at weight-load time keeps inference
    a single 3x3 conv per block — one MXU pass, no branch concat traffic.

    ``branch_act=True`` reproduces the reference's train-form forward exactly:
    its conv3x3/conv1x1 branches are full ``ConvBorINorm`` modules whose
    default LeakyReLU(0.2) fires PER BRANCH before the sum
    (``modules/_common.py:68-73,90``) — and its CLI never folds, so genuine
    reference checkpoints are evaluated in that form. The default (False) is
    the standard fold-exact RepVGG formulation (sum of linear branches), which
    ``fold_repvgg`` collapses losslessly; with ``branch_act=True`` folding is
    NOT numerically equivalent (the reference's own ``toggle_inference_mode``
    silently changes outputs the same way).
    """

    features: int
    strides: Union[int, Tuple[int, int]] = 1
    deploy: bool = False
    branch_act: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.deploy:
            y = Conv2d(
                self.features, (3, 3), self.strides, 1,
                use_bias=True, dtype=self.dtype, name="reparam",
            )(x)
            return leaky_relu(y)

        in_ch = x.shape[-1]
        s = _pair(self.strides)
        y3 = ConvNorm(
            self.features, (3, 3), s, padding=1, use_bias=False, act=None,
            dtype=self.dtype, name="conv3x3",
        )(x, train)
        y1 = ConvNorm(
            self.features, (1, 1), s, padding=0, use_bias=False, act=None,
            dtype=self.dtype, name="conv1x1",
        )(x, train)
        if self.branch_act:
            y3, y1 = leaky_relu(y3), leaky_relu(y1)
        y = y3 + y1
        if s == (1, 1) and in_ch == self.features:
            y = y + BatchNorm(dtype=self.dtype, name="identity")(
                x, use_running_average=not train
            )
        return leaky_relu(y)


class RepBlock(nn.Module):
    """n chained RepVGG blocks (reference ``modules/_common.py:148-158``)."""

    features: int
    n: int = 2
    deploy: bool = False
    branch_act: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        kw = dict(deploy=self.deploy, branch_act=self.branch_act, dtype=self.dtype)
        x = RepVGGBlock(self.features, name="conv1", **kw)(x, train)
        for i in range(self.n - 1):
            x = RepVGGBlock(self.features, name=f"block{i}", **kw)(x, train)
        return x


def resize_w_bilinear(x: jax.Array, out_w: int) -> jax.Array:
    """Bilinear resize along the W axis of an NHWC tensor.

    Half-pixel source mapping with the source coordinate clamped at 0 and no
    antialiasing — exactly ``nn.Upsample(mode="bilinear",
    align_corners=False)`` restricted to one axis (the neck only ever rescales
    time; reference ``modules/_common.py:173-174``).
    """
    in_w = x.shape[-2]
    if in_w == out_w:
        return x
    scale = in_w / out_w
    src = jnp.maximum((jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale - 0.5, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = (src - i0.astype(jnp.float32)).astype(x.dtype)
    i0 = jnp.clip(i0, 0, in_w - 1)
    i1 = jnp.clip(i0 + 1, 0, in_w - 1)
    g0 = jnp.take(x, i0, axis=-2)
    g1 = jnp.take(x, i1, axis=-2)
    return g0 * (1.0 - frac)[:, None] + g1 * frac[:, None]


def max_pool_same(x: jax.Array, k: int = 5) -> jax.Array:
    """k x k max pool, stride 1, same padding (SPPF pool,
    reference ``modules/_common.py:199``)."""
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class BiCModule(nn.Module):
    """Bi-directional Concat fusion (YOLOv6-style; reference
    ``modules/_common.py:161-185``): lateral 1x1 on the current and shallower
    maps, x2 / x0.5 bilinear time-rescale, concat, 1x1 out."""

    features: int
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, c1: jax.Array, c0: jax.Array, p2: jax.Array, train: bool) -> jax.Array:
        c_h = int(self.features * self.e)
        c1 = ConvNorm(c_h, 1, dtype=self.dtype, name="conv_c1")(c1, train)
        c0 = ConvNorm(c_h, 1, dtype=self.dtype, name="conv_c0")(c0, train)
        c0 = resize_w_bilinear(c0, c0.shape[-2] // 2)
        p2 = resize_w_bilinear(p2, p2.shape[-2] * 2)
        y = jnp.concatenate([c1, c0, p2], axis=-1)
        return ConvNorm(self.features, 1, dtype=self.dtype, name="conv_out")(y, train)


class CSPSPPFModule(nn.Module):
    """CSP split + chained 5x5 SPPF pools on the deepest map (reference
    ``modules/_common.py:188-215``)."""

    features: int
    e: float = 0.5
    pool_k: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c_h = int(self.features * self.e)
        x1 = ConvNorm(c_h, 1, dtype=self.dtype, name="conv1")(x, train)
        x1 = ConvNorm(c_h, 3, dtype=self.dtype, name="conv3")(x1, train)
        x1 = ConvNorm(c_h, 1, dtype=self.dtype, name="conv4")(x1, train)
        y1 = ConvNorm(c_h, 1, dtype=self.dtype, name="conv2")(x, train)
        p1 = max_pool_same(x1, self.pool_k)
        p2 = max_pool_same(p1, self.pool_k)
        p3 = max_pool_same(p2, self.pool_k)
        z = jnp.concatenate([x1, p1, p2, p3], axis=-1)
        z = ConvNorm(c_h, 1, dtype=self.dtype, name="conv5")(z, train)
        z = ConvNorm(c_h, 3, dtype=self.dtype, name="conv6")(z, train)
        z = jnp.concatenate([z, y1], axis=-1)
        return ConvNorm(self.features, 1, dtype=self.dtype, name="conv7")(z, train)
