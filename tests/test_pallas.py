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
