"""int8 quantized serving path (ops/conv.py:conv3d_zcat_int8 +
inference/quantize.py).

The reference has no quantized inference; this is a TPU-native serving
addition (MXU int8 runs ~2x bf16). Correctness contract:
  * the int8 conv arithmetic is EXACT when inputs/weights are exactly
    representable on the int8 grid;
  * calibration builds one act_scale per DoubleConv 3x3x3 conv;
  * the quantized model tracks the bf16 model closely on smooth inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
    UNet3D)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.quantize import (
    calibrate_int8, quant_scales_from_stats)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv3d_zcat_int8)


def test_int8_conv_exact_on_grid(rng):
    """Integer-grid inputs and weights -> int8 conv equals f32 conv."""
    act_scale = jnp.float32(0.25)
    x = (rng.integers(-100, 100, size=(1, 5, 6, 7, 8))
         .astype(np.float32) * 0.25)
    # per-channel weight scales become max|w|/127; use integers*s/127
    wint = rng.integers(-127, 128, size=(3, 3, 3, 8, 4)).astype(np.float32)
    wint[..., :] [0, 0, 0, 0, :] = 127.0      # pin the per-channel max
    w = wint / 127.0 * 0.5
    got = conv3d_zcat_int8(jnp.asarray(x), jnp.asarray(w), act_scale)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_int8_conv_bias_and_dtype(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    out = conv3d_zcat_int8(x, w, jnp.float32(4.0 / 127), b)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 4, 4, 4, 4)


def _tiny_model_and_input(rng, feats=(8, 16)):
    model = UNet3D(out_channels=4, features=feats, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    vars_ = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    return model, x, vars_


def test_calibrate_builds_one_scale_per_dc_conv(rng):
    model, x, vars_ = _tiny_model_and_input(rng)
    qvars = calibrate_int8(model, vars_, [x[0]])
    leaves = jax.tree_util.tree_leaves(qvars["quant"])
    # 2 encoder + bottleneck + 2 decoder DoubleConvs x 2 convs each
    assert len(leaves) == 10
    assert all(float(s) > 0 for s in leaves)
    # head conv / gates are NOT quantized
    flat = jax.tree_util.tree_flatten_with_path(qvars["quant"])[0]
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("head" in p or "att" in p for p in paths)


def test_quant_scales_from_stats_rename():
    stats = {"down0": {"conv1": {"absmax": jnp.float32(12.7)}}}
    q = quant_scales_from_stats(stats)
    np.testing.assert_allclose(
        float(q["down0"]["conv1"]["act_scale"]), 0.1, rtol=1e-5)


@pytest.mark.slow
def test_int8_model_tracks_bf16(rng):
    model, x, vars_ = _tiny_model_and_input(rng)
    ref = model.apply(vars_, x, train=False)["logits"]
    qvars = calibrate_int8(model, vars_, [x[0]])
    qmodel = model.clone(quant_mode="int8")
    out = qmodel.apply(qvars, x, train=False)["logits"]
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))
    assert rel < 0.15, rel
    assert agree > 0.9, agree


def test_quant_mode_off_is_default_and_unchanged(rng):
    model, x, vars_ = _tiny_model_and_input(rng)
    assert model.quant_mode == "off"
    a = model.apply(vars_, x, train=False)["logits"]
    b = model.clone(quant_mode="off").apply(vars_, x, train=False)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibrate_requires_samples(rng):
    model, x, vars_ = _tiny_model_and_input(rng)
    with pytest.raises(ValueError):
        calibrate_int8(model, vars_, [])


@pytest.mark.parametrize("form,acc", [("qfirst", ""), ("qlast", ""),
                                      ("ksplit", ""), ("qlast", "bf16")])
def test_int8_conv_forms_agree(rng, form, acc, monkeypatch):
    """All int8 formulations compute the same quantized conv."""
    monkeypatch.setenv("SEG3D_INT8_FORM", form)
    if acc:
        monkeypatch.setenv("SEG3D_INT8_ACC", acc)
    x = jnp.asarray(rng.normal(size=(1, 4, 5, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)).astype(np.float32))
    s = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
    got = conv3d_zcat_int8(x, w, s)
    monkeypatch.setenv("SEG3D_INT8_FORM", "qfirst")
    monkeypatch.delenv("SEG3D_INT8_ACC", raising=False)
    want = conv3d_zcat_int8(x, w, s)
    tol = 2e-2 if acc == "bf16" else 1e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol * float(jnp.max(jnp.abs(want))))


def test_calibration_with_s2d_eval_enabled():
    """s2d_eval must not break int8 calibration: calib forwards force
    the normal conv path (the s2d branch has no absmax sow), so every
    block gets an act_scale and the int8 model applies cleanly."""
    import numpy as np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.quantize import (
        calibrate_int8)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
        UNet3D)

    model = UNet3D(out_channels=4, features=(8, 16), dtype=jnp.float32,
                   remat=False, s2d_eval=True)
    x = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    rng = np.random.default_rng(0)
    vols = [rng.normal(size=(16, 16, 16, 4)).astype(np.float32)]
    qvars = calibrate_int8(model, variables, vols)
    q = model.clone(quant_mode="int8")
    out = q.apply(qvars, x, train=False)["logits"]
    assert out.shape == (1, 16, 16, 16, 4)
    assert np.isfinite(np.asarray(out, np.float32)).all()
