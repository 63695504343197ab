"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import (
    group_norm)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas import (
    fused_group_norm)


@pytest.mark.parametrize("shape,groups", [
    ((2, 4, 4, 4, 16), 8),
    ((1, 5, 3, 7, 32), 4),      # ragged M -> masked tail tile
    ((1, 8, 8, 8, 8), 1),
])
def test_fused_gn_matches_reference_op(rng, shape, groups):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    got = fused_group_norm(x, gamma, beta, groups, tile_m=16,
                           interpret=True)
    want = group_norm(x, gamma, beta, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_gn_relu_residual(rng):
    shape = (1, 4, 4, 4, 16)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    res = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gamma = jnp.ones(16)
    beta = jnp.zeros(16)
    got = fused_group_norm(x, gamma, beta, 8, residual=res, relu=True,
                           tile_m=16, interpret=True)
    want = jnp.maximum(group_norm(x, gamma, beta, 8), 0.0) + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_gn_bf16_io(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 16))).astype(
        jnp.bfloat16)
    got = fused_group_norm(x, jnp.ones(16), jnp.zeros(16), 8,
                           relu=True, tile_m=32, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = jnp.maximum(group_norm(x, jnp.ones(16), jnp.zeros(16), 8),
                       0.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


# --------------------------------------------------------------------
# width-tiled block-Toeplitz conv3d (ops/pallas/conv3d.py)
# --------------------------------------------------------------------

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    conv3d_zcat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas.conv3d import (  # noqa: E402
    build_wbig, make_plan, wtile_conv3d)


@pytest.mark.parametrize("ci,co,D,H,W", [
    (32, 32, 4, 8, 16),     # Tw=4, multi-block
    (64, 32, 3, 8, 8),      # Tw=4, ws=256 (decoder L0 input)
    (32, 64, 3, 8, 8),      # N=256
    (64, 64, 3, 8, 8),      # Tw=2, pad 4/3
    (128, 128, 2, 8, 4),    # Tw=1, pad-free
    (32, 32, 2, 7, 12),     # H not a multiple of 8 -> internal pad
])
def test_wtile_conv3d_matches_zcat(rng, ci, co, D, H, W):
    x = jnp.asarray(rng.normal(size=(1, D, H, W, ci)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * 0.1)
    plan = make_plan(ci, co, W, H, max_col_bytes=256 * 1024)
    assert plan is not None
    got = np.asarray(wtile_conv3d(x, w, plan, True), np.float32)
    want = np.asarray(conv3d_zcat(x, w), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_wtile_conv3d_grad_matches_zcat(rng):
    """custom VJP: dx (kernel or zcat fallback) and dw (XLA) must agree
    with autodiff through conv3d_zcat."""
    ci, co, D, H, W = 32, 32, 3, 8, 8
    x = jnp.asarray(rng.normal(size=(1, D, H, W, ci)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * 0.1)
    plan = make_plan(ci, co, W, H, max_col_bytes=256 * 1024)

    def loss_w(x, w):
        return jnp.sum(wtile_conv3d(x, w, plan, True) ** 2)

    def loss_z(x, w):
        return jnp.sum(conv3d_zcat(x, w) ** 2)

    gx, gw = jax.grad(loss_w, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_z, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=2e-2, rtol=2e-2)


def test_make_plan_rejects_ineligible():
    assert make_plan(4, 32, 160, 240) is None      # ci % 32 != 0
    assert make_plan(32, 32, 3, 16) is None        # W % Tw != 0
    p = make_plan(32, 32, 160, 240)
    assert p is not None and p.Tw == 4 and p.N == 128 and p.K == 1728


def test_build_wbig_structure():
    """Every original tap appears exactly once per (output pos, K row)
    pattern: contracting a one-hot input reproduces w."""
    ci, co = 32, 32
    plan = make_plan(ci, co, 8, 8, max_col_bytes=256 * 1024)
    w = jnp.arange(3 * 3 * 3 * ci * co, dtype=jnp.float32).reshape(
        3, 3, 3, ci, co)
    wbig = build_wbig(w, plan)
    assert wbig.shape == (plan.K, plan.N)
    # each tap is used exactly once per output position in the
    # supertile (B/A/C together), so total mass is Tw * sum|w|
    per_tap = np.asarray(jnp.sum(jnp.abs(wbig))) / np.asarray(
        jnp.sum(jnp.abs(w)))
    assert abs(per_tap - plan.Tw) < 1e-3
