"""Checkpoint-importer tests: the flax->torch name translation must emit the
reference's exact key set (hand-checked against torchvision/reference naming),
and a synthesized torch state dict must import and run."""

import numpy as np
import pytest

import jax

from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.models.import_torch import (
    _flatten,
    flax_path_to_torch_key,
    import_torch_state_dict,
)


def _template(cfg, num_classes=2):
    model = AudioDetectionModel.from_config(cfg, num_classes=num_classes)
    import jax.numpy as jnp

    return model, jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 1, cfg.clip_samples), jnp.float32),
            train=False,
        )
    )


def _torch_keys(template):
    keys = {}
    for coll in ("params", "batch_stats"):
        for path, leaf in _flatten(template.get(coll, {})).items():
            key, tfm = flax_path_to_torch_key(coll, path)
            keys[key] = (coll, path, tuple(leaf.shape), tfm)
    return keys


# Hand-written expectations from the reference/torchvision naming conventions
# (modules/_backbone.py:119-152, modules/_common.py, torchvision ResNet).
RESNET_EXPECTED = [
    "sm_anchors",
    "md_anchors",
    "lg_anchors",
    "feature_extractor.conv1.weight",
    "feature_extractor.conv2.weight",
    "feature_extractor.bn1.weight",
    "feature_extractor.bn1.running_var",
    "feature_extractor.layer1.0.conv1.weight",
    "feature_extractor.layer1.0.bn2.running_mean",
    "feature_extractor.layer2.0.downsample.0.weight",
    "feature_extractor.layer2.0.downsample.1.bias",
    "feature_extractor.layer4.0.conv2.weight",
    "multiscale_module.cspsppf.conv_1_3_4.0.conv.weight",
    "multiscale_module.cspsppf.conv_1_3_4.2.norm.weight",
    "multiscale_module.cspsppf.conv2.conv.bias",
    "multiscale_module.cspsppf.conv7.norm.running_mean",
    "multiscale_module.bic2.conv_c1.conv.weight",
    "multiscale_module.bic3.conv_out.norm.bias",
    "multiscale_module.rep_block2_1.conv1.conv3x3.conv.weight",
    "multiscale_module.rep_block2_1.conv1.conv3x3.norm.running_var",
    "multiscale_module.rep_block2_1.conv1.conv1x1.conv.weight",
    # identity BN exists only when in==out and stride 1 (128->128 blocks):
    "multiscale_module.rep_block3_1.conv1.identity.weight",
    "multiscale_module.rep_block3_1.conv1.identity.running_mean",
    "multiscale_module.rep_block3_2.blocks.0.conv3x3.conv.weight",
    "multiscale_module.conv2_downsample.conv.weight",
    "multiscale_module.conv3_downsample.norm.weight",
]

CUSTOM_EXPECTED = [
    "feature_extractor.first_conv.0.weight",
    "feature_extractor.first_conv.0.bias",
    "feature_extractor.first_conv.1.weight",
    "feature_extractor.entry_block.module_dict.layer0._layer.0.weight",
    "feature_extractor.entry_block.module_dict.layer0._layer.1.running_mean",
    "feature_extractor.entry_block.module_dict.layer0._layer.3.weight",
    "feature_extractor.entry_block.module_dict.layer0._layer.4.bias",
    "feature_extractor.entry_block.module_dict.layer0._res_layer.weight",
    "feature_extractor.block1.module_dict.layer0._layer.0.weight",
    "feature_extractor.block4.module_dict.layer0._res_layer.bias",
]


def test_resnet_translation_covers_expected_keys(tiny_cfg):
    _, template = _template(tiny_cfg)
    keys = _torch_keys(template)
    for expect in RESNET_EXPECTED:
        assert expect in keys, f"missing translated key: {expect}"


def test_custom_translation_covers_expected_keys(tiny_cfg):
    from audioyolo_tpu.config import Config

    raw = tiny_cfg.to_dict()
    raw["backbone"] = "custom"
    raw["block_layers"] = [1, 1, 1, 1]
    _, template = _template(Config(raw))
    keys = _torch_keys(template)
    for expect in CUSTOM_EXPECTED:
        assert expect in keys, f"missing translated key: {expect}"


def test_import_roundtrip_and_conv_transpose(tiny_cfg, rng):
    model, template = _template(tiny_cfg)
    keys = _torch_keys(template)

    # synthesize a torch-style state dict with the translated names
    torch_state = {}
    for key, (coll, path, shape, tfm) in keys.items():
        if path[-1] == "kernel":  # flax HWIO shape -> torch OIHW on disk
            h, w, i, o = shape
            torch_state[key] = rng.standard_normal((o, i, h, w)).astype(np.float32)
        else:
            torch_state[key] = rng.standard_normal(shape).astype(np.float32)
    torch_state["taper_window"] = np.zeros(10, np.float32)  # skipped buffer

    variables = import_torch_state_dict(torch_state, template)

    # spot-check the OIHW->HWIO transpose on a known conv
    k = variables["params"]["feature_extractor"]["conv1"]["conv"]["kernel"]
    src = torch_state["feature_extractor.conv1.weight"]
    np.testing.assert_array_equal(np.asarray(k), np.transpose(src, (2, 3, 1, 0)))

    # BN split: weight -> scale, running stats -> batch_stats
    np.testing.assert_array_equal(
        variables["params"]["feature_extractor"]["bn1"]["scale"],
        torch_state["feature_extractor.bn1.weight"],
    )
    np.testing.assert_array_equal(
        variables["batch_stats"]["feature_extractor"]["bn1"]["var"],
        torch_state["feature_extractor.bn1.running_var"],
    )

    # imported variables must drive a real forward
    import jax.numpy as jnp

    out = model.apply(variables, jnp.zeros((1, 1, tiny_cfg.clip_samples)), train=False,
                      combine_scales=True)
    assert out.shape[1] == tiny_cfg.total_proposals


def test_import_missing_key_raises(tiny_cfg):
    _, template = _template(tiny_cfg)
    with pytest.raises(KeyError):
        import_torch_state_dict({"sm_anchors": np.zeros(3, np.float32)}, template)


def test_import_unconsumed_key_raises(tiny_cfg, rng):
    model, template = _template(tiny_cfg)
    keys = _torch_keys(template)
    torch_state = {}
    for key, (coll, path, shape, tfm) in keys.items():
        if path[-1] == "kernel":
            h, w, i, o = shape
            torch_state[key] = rng.standard_normal((o, i, h, w)).astype(np.float32)
        else:
            torch_state[key] = rng.standard_normal(shape).astype(np.float32)
    torch_state["totally.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        import_torch_state_dict(torch_state, template)

def test_bottleneck_backbone_forward(tiny_cfg, rng):
    """Bottleneck ResNet variant (resnet_config.block) produces the same
    proposal geometry with 4x channel widths."""
    from audioyolo_tpu.config import Config

    raw = tiny_cfg.to_dict()
    raw["resnet_config"] = {"block": "Bottleneck"}
    raw["block_layers"] = [1, 1, 1, 1]
    cfg = Config(raw)
    import jax, jax.numpy as jnp
    from audioyolo_tpu.models import AudioDetectionModel

    model = AudioDetectionModel.from_config(cfg, num_classes=2)
    x = jnp.zeros((1, 1, cfg.clip_samples))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False, combine_scales=True)
    assert out.shape == (1, cfg.total_proposals, 5)
    assert v["params"]["feature_extractor"]["layer4_0"]["conv3"]["conv"]["kernel"].shape[-1] == 2048
