"""Int8 PTQ (models/quant.py + layers._int8_conv): calibration, selection,
numerics, and inertness when no quant collection is supplied."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioyolo_tpu.config import Config
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.models.quant import (
    DEFAULT_EXCLUDE,
    calibrate_quant,
    quantized_paths,
)

from synth import synth_clip


@pytest.fixture(scope="module")
def tiny():
    from conftest import TINY_CFG

    cfg = Config(copy.deepcopy(TINY_CFG))
    model = AudioDetectionModel.from_config(cfg, num_classes=2)
    dur = float(cfg.sample_duration)
    x = np.stack([
        synth_clip(8000, dur, [(0.5, 1.5, "tone"), (2.0, 3.0, "beep")], seed=i)
        for i in range(2)
    ])[:, None, :].astype(np.float32)
    v = jax.jit(lambda r, a: model.init(r, a, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x[:1]
    )
    return cfg, model, v, x


def test_int8_close_to_float(tiny):
    """Full-body quantization (no exclusions) keeps decoded predictions
    within ~1% of float range — the absmax symmetric scheme is sane."""
    cfg, model, v, x = tiny
    col = calibrate_quant(model, v, [x], exclude=())
    y_f = np.asarray(model.apply(v, x, train=False, combine_scales=True))
    y_q = np.asarray(
        model.apply({**v, "quant": col}, x, train=False, combine_scales=True)
    )
    scale = np.abs(y_f).max()
    assert np.abs(y_f - y_q).max() < 0.02 * scale


def test_default_exclusions(tiny):
    """The stem conv and the three prediction-emitting RepBlocks stay float
    under DEFAULT_EXCLUDE; body convs are quantized."""
    cfg, model, v, x = tiny
    col = calibrate_quant(model, v, [x])
    paths = quantized_paths(col)
    assert paths, "nothing quantized"
    joined = ["/".join([p]) for p in paths]
    for p in joined:
        for pat in DEFAULT_EXCLUDE:
            assert pat not in p + "/", f"{p} should have been excluded ({pat})"
    assert any("feature_extractor/" in p for p in joined)
    assert any("multiscale_module/" in p for p in joined)


def test_no_collection_is_inert(tiny):
    """The quant hooks must not perturb outputs: a calibration apply (sow
    active, quant_stats mutable) returns bit-identical predictions to the
    plain apply, and the plain apply mutates/declares no quant state."""
    cfg, model, v, x = tiny
    y_plain = np.asarray(model.apply(v, x, train=False, combine_scales=True))
    y_calib, mutated = model.apply(
        v, x, train=False, combine_scales=True, mutable=["quant_stats"]
    )
    np.testing.assert_array_equal(y_plain, np.asarray(y_calib))
    assert "quant_stats" in mutated and mutated["quant_stats"]
    # plain apply declares nothing mutable -> identical repeated output
    np.testing.assert_array_equal(
        y_plain, np.asarray(model.apply(v, x, train=False, combine_scales=True))
    )


def test_calibration_is_max_over_batches(tiny):
    """Scales come from the max over all calibration batches, not the last."""
    cfg, model, v, x = tiny
    big = x * 4.0
    col_small_then_big = calibrate_quant(model, v, [x, big], exclude=())
    col_big_then_small = calibrate_quant(model, v, [big, x], exclude=())
    a = jax.tree.leaves(col_small_then_big)
    b = jax.tree.leaves(col_big_then_small)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb))


def test_quantized_deploy_event_parity(tiny):
    """Quantized deploy model under the DEFAULT_EXCLUDE selection: decoded
    boxes stay close enough that thresholded detections match float on
    synthetic clips (the demo-scale mAP check lives in docs/PERFORMANCE.md)."""
    from audioyolo_tpu.infer.decode import make_inference_fn, unpack_detections

    cfg, model, v, x = tiny
    col = calibrate_quant(model, v, [x])
    qv = {**v, "quant": col}
    f_live = make_inference_fn(model, v, 0.1, 0.05, keep_k=16, packed=True)
    q_live = make_inference_fn(model, qv, 0.1, 0.05, keep_k=16, packed=True)
    df = unpack_detections(np.asarray(f_live(x)))
    dq = unpack_detections(np.asarray(q_live(x)))
    # untrained net: near-tied scores can reorder NMS survivors, so compare
    # the per-clip survivor sets (sorted centers), not slot-for-slot
    assert abs(int(df["valid"].sum()) - int(dq["valid"].sum())) <= 2
    for i in range(x.shape[0]):
        cf = np.sort(df["center"][i][df["valid"][i]])
        cq = np.sort(dq["center"][i][dq["valid"][i]])
        n = min(len(cf), len(cq))
        assert n > 0
        assert np.abs(cf[:n] - cq[:n]).max() < 0.05


def test_load_calib_batch_resamples_and_downmixes(tiny, tmp_path):
    """Calibration windows must be at the model rate and mono: a stereo
    half-rate file yields full-length windows whose absmax matches the
    source amplitude (not channel-concatenated 2x-speed garbage)."""
    from audioyolo_tpu.data.wavio import write_wav

    cfg, model, v, x = tiny
    sr_model = int(cfg.sample_rate)
    sr_file = sr_model // 2
    t = np.arange(int(3.0 * sr_file)) / sr_file
    wave = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    stereo = np.stack([wave, -wave * 0.8])  # distinct channels
    p = str(tmp_path / "half_stereo.wav")
    write_wav(p, stereo, sr_file)

    import inference as inf

    batch = inf.load_calib_batch([p], cfg, n_clips=1)
    assert batch.shape == (1, 1, int(cfg.clip_samples))
    # mono downmix of (w, -0.8w) = 0.1w -> absmax ~0.05, not ~0.5
    amax = float(np.abs(batch).max())
    assert 0.03 < amax < 0.07, amax


def test_int8_under_mesh_sharding(tiny):
    """Quantized variables flow through make_inference_fn(mesh=...): the
    8-device batch-sharded int8 program matches the unsharded int8 one."""
    from audioyolo_tpu.infer.decode import make_inference_fn
    from audioyolo_tpu.parallel import make_mesh

    cfg, model, v, x = tiny
    col = calibrate_quant(model, v, [x], exclude=())
    qv = {**v, "quant": col}
    big = np.concatenate([x] * 4)  # 8 clips over 8 devices

    f1 = make_inference_fn(model, qv, 0.1, 0.05, keep_k=16)
    f8 = make_inference_fn(model, qv, 0.1, 0.05, keep_k=16, mesh=make_mesh(8))
    d1 = {k: np.asarray(val) for k, val in f1(big).items()}
    d8 = {k: np.asarray(val) for k, val in f8(big).items()}
    assert (d1["valid"] == d8["valid"]).all()
    np.testing.assert_allclose(d1["center"], d8["center"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(d1["confidence"], d8["confidence"], rtol=2e-4, atol=1e-5)


def test_int8_conv_h1_middle_row_slice_exact():
    """The H=1 kernel-slice workaround (layers._int8_conv) must be exact:
    an H=1 input with symmetric pad p and kernel 2p+1 must produce
    BIT-IDENTICAL output to explicitly calling the conv with the middle
    kernel row and zero H-padding (the dropped rows only ever multiply
    zero padding). The explicit (1,3) shape is the formulation verified
    exact TPU-vs-CPU in the round-5 backend-bug repro — this pins the
    internal rewrite onto it (tools/bisect_int8_body.py,
    docs/PERFORMANCE.md round 5). A float-conv proximity check guards
    against the failure mode the bug caused (uncorrelated output)."""
    from audioyolo_tpu.models.layers import _int8_conv

    rng = np.random.default_rng(7)
    B, W, Cin, Cout = 2, 24, 15, 8
    x = rng.uniform(-1, 1, (B, 1, W, Cin)).astype(np.float32)
    k = rng.uniform(-0.5, 0.5, (3, 3, Cin, Cout)).astype(np.float32)
    bias = rng.uniform(-0.1, 0.1, (Cout,)).astype(np.float32)
    s_x = np.float32(np.abs(x).max() / 127.0)

    y = np.asarray(_int8_conv(jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
                              jnp.asarray(s_x), (1, 2), (1, 1)))
    assert y.shape == (B, 1, W // 2, Cout)

    # explicit middle-row slice, no H padding — must be bit-identical on
    # EVERY channel: _int8_conv slices the kernel BEFORE computing the
    # per-channel weight scales, so both calls quantize the identical
    # middle-row kernel (dropped rows never influence s_w)
    k_mid = k[1:2].copy()
    y_mid = np.asarray(_int8_conv(jnp.asarray(x), jnp.asarray(k_mid),
                                  jnp.asarray(bias), jnp.asarray(s_x),
                                  (1, 2), (0, 1)))
    np.testing.assert_array_equal(y, y_mid)

    # proximity to the float conv: the backend bug produced UNCORRELATED
    # output; int8 quantization noise is bounded
    yf = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    err = np.abs(y - np.asarray(yf))
    assert err.max() < 0.05, err.max()
