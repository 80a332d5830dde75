"""Round-trip tests for the torch checkpoint converter.

Bijectivity layer: flax params -> torch-layout state_dict -> flax params
must be the identity, and the torch-layout keys must follow the reference's
positional naming scheme (`all_modules.{i}.<submodule>.<param>`,
sgmse/backbones/ncsnpp.py:273). Ground-truth parity against the ACTUAL
reference torch model (forward goldens, _step losses, Lightning/EMA ckpt)
lives in tests/test_reference_parity.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from storm_tpu.backbones.ncsnpp import NCSNpp
from storm_tpu.compat import (
    convert_backbone_state_dict,
    convert_lightning_checkpoint,
    flax_to_torch_backbone,
)


def _tiny_params():
    model = NCSNpp.from_kwargs(input_channels=4, nf=16, ch_mult=(1, 2),
                               image_size=64)
    x = jnp.zeros((1, 2, 64, 32, 2))
    t = jnp.ones((1,))
    vs = model.init(jax.random.PRNGKey(0), x, t)
    return model, jax.tree.map(np.asarray, vs["params"])


def _trees_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_allclose(
                a[k], b[k], err_msg=path + "/" + k, atol=0
            )


def test_roundtrip_identity():
    _, params = _tiny_params()
    sd = flax_to_torch_backbone(params, prefix="dnn.")
    back = convert_backbone_state_dict(sd, prefix="dnn.")
    _trees_equal(params, back)


def test_torch_layout_key_names():
    _, params = _tiny_params()
    sd = flax_to_torch_backbone(params)
    keys = set(sd)
    # positional module scheme
    assert "all_modules.0.W" in keys  # GaussianFourierProjection
    assert "all_modules.1.weight" in keys and "all_modules.1.bias" in keys
    assert "output_layer.weight" in keys
    # resblock internals carry reference submodule names
    assert any(".GroupNorm_0.weight" in k for k in keys)
    assert any(".Conv_0.weight" in k for k in keys)
    assert any(".Dense_0.weight" in k for k in keys)
    assert any(".NIN_0.W" in k for k in keys)
    # layouts: conv weights are OIHW in torch-layout
    w = sd["all_modules.3.weight"] if "all_modules.3.weight" in sd else None
    conv_keys = [k for k in keys if k.endswith("Conv_0.weight")]
    assert all(sd[k].ndim == 4 for k in conv_keys)


def test_lightning_checkpoint_with_ema():
    """EMA shadow params are positional over trainable params; frozen GFP W
    is excluded (requires_grad=False in the reference)."""
    _, params = _tiny_params()
    sd = flax_to_torch_backbone(params, prefix="dnn.")
    trainable = [k for k in sd if not (k.endswith(".W") and "NIN" not in k)]
    # shadow = params * 2 to distinguish from raw
    shadow = [sd[k] * 2.0 for k in trainable]
    ckpt = {"state_dict": sd, "ema": {"shadow_params": shadow,
                                      "decay": 0.999, "num_updates": 10}}
    p, ema = convert_lightning_checkpoint(ckpt, prefix="dnn.")
    _trees_equal(params, p)
    # every trainable leaf doubled in the EMA tree; GFP W unchanged
    np.testing.assert_allclose(ema["m0"]["W"], params["m0"]["W"])
    np.testing.assert_allclose(ema["m1"]["kernel"], params["m1"]["kernel"] * 2)


def test_converted_params_run_forward():
    model, params = _tiny_params()
    sd = flax_to_torch_backbone(params, prefix="dnn.")
    back = convert_backbone_state_dict(sd, prefix="dnn.")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 64, 32, 2)),
                    jnp.float32)
    t = jnp.full((1,), 0.5)
    out1 = model.apply({"params": params}, x, t)
    out2 = model.apply({"params": jax.tree.map(jnp.asarray, back)}, x, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)
