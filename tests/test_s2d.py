"""Exactness of the space-to-depth conv formulation (ops/s2d.py).

Every op must be bit-compatible (up to float associativity) with its
normal-layout counterpart under the layout isomorphism
x_s2d = space_to_depth_hw(x)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops import s2d
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv1x1, conv3d_zcat, conv_transpose3d_k2s2)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import group_norm
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pool import (
    global_avg_pool, max_pool3d)

KEY = jax.random.PRNGKey(0)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_s2d_roundtrip():
    x = _rand(KEY, (2, 5, 8, 10, 3))
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space_hw(s2d.space_to_depth_hw(x))),
        np.asarray(x))


def test_s2d_phase_order():
    """p-major channel order: ch = (ph*2+pw)*C + c."""
    x = _rand(KEY, (1, 2, 4, 4, 3))
    y = s2d.space_to_depth_hw(x)
    for ph in range(2):
        for pw in range(2):
            np.testing.assert_array_equal(
                np.asarray(y[..., (ph * 2 + pw) * 3:(ph * 2 + pw + 1) * 3]),
                np.asarray(x[:, :, ph::2, pw::2, :]))


@pytest.mark.parametrize("ci,co", [(4, 32), (32, 32), (64, 32), (32, 16)])
def test_conv3d_s2d_matches_zcat(ci, co):
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = _rand(k1, (1, 6, 8, 10, ci))
    w = _rand(k2, (3, 3, 3, ci, co)) * 0.1
    b = _rand(k3, (co,))
    ref = s2d.space_to_depth_hw(conv3d_zcat(x, w, b))
    out = s2d.conv3d_s2d(s2d.space_to_depth_hw(x), w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_s2d_grad_matches():
    """The packed kernel is a linear gather of w, so gradients flow;
    check dL/dw parity with the zcat formulation."""
    k1, k2 = jax.random.split(KEY)
    x = _rand(k1, (1, 4, 6, 6, 8))
    w = _rand(k2, (3, 3, 3, 8, 16)) * 0.1

    g_ref = jax.grad(lambda w: jnp.sum(conv3d_zcat(x, w) ** 2))(w)
    g_s2d = jax.grad(lambda w: jnp.sum(
        s2d.conv3d_s2d(s2d.space_to_depth_hw(x), w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_s2d_matches():
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = _rand(k1, (2, 4, 6, 8, 12))
    w = _rand(k2, (1, 1, 1, 12, 7))
    b = _rand(k3, (7,))
    ref = s2d.space_to_depth_hw(conv1x1(x, w, b))
    out = s2d.conv1x1_s2d(s2d.space_to_depth_hw(x), w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("groups", [1, 4, 8])
def test_group_norm_s2d_matches(groups):
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = _rand(k1, (2, 4, 6, 8, 16))
    gamma = _rand(k2, (16,))
    beta = _rand(k3, (16,))
    ref = s2d.space_to_depth_hw(group_norm(x, gamma, beta, groups))
    out = s2d.group_norm_s2d(s2d.space_to_depth_hw(x), gamma, beta, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_max_pool_from_s2d_matches():
    x = _rand(KEY, (2, 6, 8, 10, 5))
    ref = max_pool3d(x, 2)
    out = s2d.max_pool3d_from_s2d(s2d.space_to_depth_hw(x))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_global_avg_pool_s2d_matches():
    x = _rand(KEY, (2, 4, 6, 8, 5))
    np.testing.assert_allclose(
        np.asarray(s2d.global_avg_pool_s2d(s2d.space_to_depth_hw(x))),
        np.asarray(global_avg_pool(x)), rtol=1e-6, atol=1e-6)


def test_concat_s2d_matches():
    k1, k2 = jax.random.split(KEY)
    a = _rand(k1, (1, 3, 4, 6, 5))
    b = _rand(k2, (1, 3, 4, 6, 7))
    ref = s2d.space_to_depth_hw(jnp.concatenate([a, b], axis=-1))
    out = s2d.concat_s2d(s2d.space_to_depth_hw(a),
                         s2d.space_to_depth_hw(b))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unet_s2d_eval_matches_normal():
    """UNet3D(s2d_eval=True) is numerically the normal forward with the
    SAME parameters (f32 so only float associativity differs)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D

    kw = dict(out_channels=3, features=(8, 16, 32), dtype=jnp.float32)
    m0 = UNet3D(**kw)
    m1 = UNet3D(**kw, s2d_eval=True)
    x = _rand(KEY, (1, 8, 16, 24, 4))
    v0 = m0.init(jax.random.PRNGKey(1), x, train=False)
    v1 = m1.init(jax.random.PRNGKey(1), x, train=False)
    # identical parameter trees (same names, shapes, values)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v0, v1)
    y0 = m0.apply(v0, x, train=False)["logits"]
    y1 = m1.apply(v0, x, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)


def test_unet_s2d_train_matches_normal():
    """s2d_train: train-mode forward (logits + deep heads + BN stats)
    and parameter gradients match the normal path."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D

    kw = dict(out_channels=3, features=(8, 16, 32), dtype=jnp.float32,
              dropout_rate=0.0)
    m0 = UNet3D(**kw)
    m1 = UNet3D(**kw, s2d_train=True)
    x = _rand(KEY, (2, 8, 16, 24, 4))
    v = m0.init(jax.random.PRNGKey(1), x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(2)}

    def loss(params, model):
        out, upd = model.apply(
            {**v, "params": params}, x, train=True, rngs=rngs,
            mutable=["batch_stats"])
        l = jnp.mean(out["logits"] ** 2)
        l += sum(jnp.mean(d.astype(jnp.float32) ** 2) for d in out["deep"])
        return l, (out, upd)

    (l0, (o0, u0)), g0 = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m0)
    (l1, (o1, u1)), g1 = jax.value_and_grad(loss, has_aux=True)(
        v["params"], m1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o1["logits"]),
                               np.asarray(o0["logits"]),
                               rtol=2e-4, atol=2e-4)
    for d0, d1 in zip(o0["deep"], o1["deep"]):
        assert d0.shape == d1.shape
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=2e-4, atol=2e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5), u0, u1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4), g0, g1)


def test_unet_s2d_eval_odd_dims_fall_back():
    """Odd spatial dims silently use the normal path (s2d needs even
    H, W and an exactly-doubling level-0 decoder)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D

    m = UNet3D(out_channels=3, features=(8, 16, 32), dtype=jnp.float32,
               s2d_eval=True)
    x = _rand(KEY, (1, 9, 17, 24, 4))
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    out = m.apply(v, x, train=False)["logits"]
    assert out.shape == (1, 9, 17, 24, 3)


def test_conv_transpose_s2d_out_matches():
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = _rand(k1, (1, 3, 4, 5, 6))
    w = _rand(k2, (2, 2, 2, 6, 4)) * 0.2
    b = _rand(k3, (4,))
    ref = s2d.space_to_depth_hw(conv_transpose3d_k2s2(x, w, b))
    out = s2d.conv_transpose3d_k2s2_s2d_out(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_indices_cache_is_trace_safe():
    """The _pack_indices lru_cache must hold trace-independent (numpy)
    values: if the first call happens under one jit trace (e.g. the
    bench's jit(model.init)), a cached jnp constant would be a leaked
    DynamicJaxprTracer and every later trace that packs the same
    (ci, co) kernel would die with UnexpectedTracerError."""
    ci, co = 5, 7
    s2d._pack_indices.cache_clear()
    w = _rand(KEY, (3, 3, 3, ci, co))

    # populate the cache inside a trace ...
    jax.make_jaxpr(s2d.pack_w_s2d)(w)
    idx, valid = s2d._pack_indices(ci, co)
    assert isinstance(idx, np.ndarray) and isinstance(valid, np.ndarray)

    # ... then use it from a different jit trace: must not leak
    out = jax.jit(s2d.pack_w_s2d)(w)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(s2d.pack_w_s2d(w)),
                               rtol=1e-6, atol=1e-6)
