"""Model tests: shapes, deep-supervision contract, dtype policy, grads,
and op-level parity (GroupNorm / pooling / resize vs torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    models, ops)

FEATS = (8, 16)          # 2-level net for fast CPU tests
SHAPE = (1, 16, 16, 16, 2)   # B, D, H, W, C


@pytest.fixture(scope="module")
def unet_vars():
    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.float32)
    x = jnp.zeros(SHAPE, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_unet_eval_shapes(unet_vars):
    model, variables = unet_vars
    x = jnp.ones(SHAPE, jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (1, 16, 16, 16, 4)
    assert out["deep"] == []        # eval mode: no deep outputs


def test_unet_train_deep_outputs(unet_vars):
    model, variables = unet_vars
    x = jnp.ones(SHAPE, jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    # deep heads exist for features[:-1] levels (reference main.py:137-140)
    assert len(out["deep"]) == len(FEATS) - 1
    for d in out["deep"]:
        assert d.shape == (1, 16, 16, 16, 4)   # upsampled to full res
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_unet_bf16_compute_fp32_out():
    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.bfloat16)
    x = jnp.ones(SHAPE, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["logits"].dtype == jnp.float32
    # params stay fp32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


@pytest.mark.slow
def test_unet_gradients_finite(unet_vars):
    model, variables = unet_vars
    x = jnp.ones(SHAPE, jnp.float32)
    tgt = jnp.zeros(SHAPE[:-1], jnp.int32)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(out["logits"] ** 2) + sum(
            jnp.mean(d ** 2) for d in out["deep"])

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_unet_remat_matches():
    x = jnp.linspace(0, 1, int(np.prod(SHAPE)),
                     dtype=jnp.float32).reshape(SHAPE)
    m1 = models.UNet3D(out_channels=4, features=FEATS, dtype=jnp.float32,
                       remat=False)
    m2 = models.UNet3D(out_channels=4, features=FEATS, dtype=jnp.float32,
                       remat=True)
    v = m1.init(jax.random.PRNGKey(0), x, train=False)
    o1 = m1.apply(v, x, train=False)["logits"]
    o2 = m2.apply(v, x, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)


def test_classifier_shapes():
    model = models.BrainTumorClassifier(num_classes=4, dtype=jnp.float32)
    x = jnp.ones((2, 16, 16, 16, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 4)
    assert logits.dtype == jnp.float32


# ---- op-level parity vs torch ------------------------------------------


def test_group_norm_matches_torch(rng):
    x = rng.normal(size=(2, 4, 4, 4, 16)).astype(np.float32)
    gamma = rng.normal(size=16).astype(np.float32)
    beta = rng.normal(size=16).astype(np.float32)
    got = np.asarray(ops.group_norm(jnp.asarray(x), jnp.asarray(gamma),
                                    jnp.asarray(beta), num_groups=8))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    gn = torch.nn.GroupNorm(8, 16, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
        want = gn(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_max_pool_matches_torch(rng):
    x = rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32)
    got = np.asarray(ops.max_pool3d(jnp.asarray(x), 2))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    want = F.max_pool3d(xt, 2).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trilinear_resize_matches_torch(rng):
    """align_corners=False parity (reference main.py:165-170)."""
    x = rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    got = np.asarray(ops.resize_trilinear(jnp.asarray(x), (8, 8, 8)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(xt, size=(8, 8, 8), mode="trilinear",
                         align_corners=False)
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.normal(size=(1, 8, 8, 8, 5)).astype(np.float32)
    got = np.asarray(ops.adaptive_avg_pool(jnp.asarray(x), (4, 4, 4)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    want = F.adaptive_avg_pool3d(xt, (4, 4, 4)).permute(
        0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    # non-divisible path
    got2 = np.asarray(ops.adaptive_avg_pool(jnp.asarray(x), (3, 3, 3)))
    want2 = F.adaptive_avg_pool3d(xt, (3, 3, 3)).permute(
        0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got2, want2, atol=1e-5)


def test_percentile_clip_zscore_matches_numpy(rng):
    x = rng.normal(size=(16, 16, 16)).astype(np.float32) * 50 + 10
    got = np.asarray(ops.percentile_clip(jnp.asarray(x), 1.0, 99.0,
                                         exact=True))
    want = np.clip(x, np.percentile(x, 1), np.percentile(x, 99))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
    z = np.asarray(ops.zscore_normalize(jnp.asarray(x)))
    wz = (x - x.mean()) / (x.std() + 1e-8)
    np.testing.assert_allclose(z, wz, atol=1e-3)


# ---- fast conv formulations vs native lowering ------------------------


def test_conv3d_zcat_matches_lax(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import conv3d_zcat
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))
    got = conv3d_zcat(x, w)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv_transpose_k2s2_matches_flax(rng):
    import flax.linen as nn
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        conv_transpose3d_k2s2)
    x = jnp.asarray(rng.normal(size=(1, 4, 5, 3, 6)).astype(np.float32))
    m = nn.ConvTranspose(10, (2, 2, 2), strides=(2, 2, 2))
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    got = conv_transpose3d_k2s2(x, v["params"]["kernel"],
                                v["params"]["bias"])
    assert got.shape == (1, 8, 10, 6, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_unet_fast_matches_native(rng):
    """fast=True (zcat conv2d + matmul upsample) must equal fast=False
    (native lax conv3d) with the SAME parameters."""
    import jax.numpy as jnp
    x = jnp.asarray(
        rng.normal(size=(1, 16, 16, 16, 2)).astype(np.float32))
    m_native = models.UNet3D(out_channels=4, features=FEATS,
                             dtype=jnp.float32, fast=False)
    m_fast = models.UNet3D(out_channels=4, features=FEATS,
                           dtype=jnp.float32, fast=True)
    v = m_native.init(jax.random.PRNGKey(0), x, train=False)
    out_native = m_native.apply(v, x, train=False)["logits"]
    out_fast = m_fast.apply(v, x, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(out_fast),
                               np.asarray(out_native),
                               atol=2e-3, rtol=2e-3)


def test_percentile_bisect_matches_numpy(rng):
    x = (rng.normal(size=(32, 32, 32)) * 40 + 7).astype(np.float32)
    got = np.asarray(ops.percentile_bisect(jnp.asarray(x), (1.0, 99.0)))
    want = np.percentile(x, [1.0, 99.0])
    span = x.max() - x.min()
    # bisection finds a value with the right rank — within a hair of
    # the interpolated numpy definition
    np.testing.assert_allclose(got, want, atol=span * 1e-3)
    # clip chain equivalence at tolerance
    c_fast = np.asarray(ops.percentile_clip(jnp.asarray(x)))
    c_exact = np.asarray(ops.percentile_clip(jnp.asarray(x), exact=True))
    np.testing.assert_allclose(c_fast, c_exact, atol=span * 1e-3)


def test_conv3d_ksplit_matches_lax(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        conv3d_ksplit)
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    got = conv3d_ksplit(x, w, b)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dn) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_ksplit_grad_matches_zcat(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        conv3d_ksplit, conv3d_zcat)
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32))
    gk = jax.grad(lambda w: jnp.sum(conv3d_ksplit(x, w) ** 2))(w)
    gz = jax.grad(lambda w: jnp.sum(conv3d_zcat(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gz),
                               atol=1e-3, rtol=1e-3)


def test_conv3d_zsum_matches_lax(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        conv3d_zsum)
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    got = conv3d_zsum(x, w, b)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dn) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_zsum_grad_matches_zcat(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        conv3d_zsum, conv3d_zcat)
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32))
    gzs = jax.grad(lambda w: jnp.sum(conv3d_zsum(x, w) ** 2))(w)
    gz = jax.grad(lambda w: jnp.sum(conv3d_zcat(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gzs), np.asarray(gz),
                               atol=1e-3, rtol=1e-3)


def test_form_override_matches_default(rng, monkeypatch):
    """SEG3D_FORM_OVERRIDE reroutes a block's convs to an equivalent
    formulation without changing numerics."""
    import importlib
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops import conv as convmod
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    model = UNet3D(out_channels=4, features=(8, 16), dtype=jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    base = model.apply(v, x, train=False)["logits"]
    monkeypatch.setattr(convmod, "_FORM_OVERRIDES",
                        [("dec1", "ksplit"), ("down0", "zsum")])
    got = model.apply(v, x, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_percentile_vector_q_with_axis():
    """ops.stats.percentile with a vector q AND an axis matches
    np.percentile (used to crash: dynamic_index_in_dim needs scalars)."""
    import numpy as np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.stats import (
        percentile)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 40)).astype(np.float32)
    got = np.asarray(percentile(jnp.asarray(x), (1.0, 99.0), axis=1))
    want = np.percentile(x, (1.0, 99.0), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
