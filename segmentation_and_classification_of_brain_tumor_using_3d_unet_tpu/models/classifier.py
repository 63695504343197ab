"""3D CNN tumor-grade classifier — TPU-native.

Parity with the reference ``BrainTumorClassifier`` (``main.py:301-328``):
3 conv blocks (4->32->64->128, 3x3x3, ReLU, MaxPool(2) after the first two),
AdaptiveAvgPool to 4^3, then FC 8192 -> 512 -> Dropout(0.5) -> num_classes.
NDHWC, bf16 compute.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pool import max_pool3d
from ..ops.resize import adaptive_avg_pool

KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BrainTumorClassifier(nn.Module):
    num_classes: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda f, name: nn.Conv(
            f, (3, 3, 3), padding="SAME", kernel_init=KAIMING,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = x.astype(self.dtype)
        x = nn.relu(conv(32, "conv1")(x))
        x = max_pool3d(x, 2)
        x = nn.relu(conv(64, "conv2")(x))
        x = max_pool3d(x, 2)
        x = nn.relu(conv(128, "conv3")(x))
        x = adaptive_avg_pool(x, (4, 4, 4))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="fc2")(x)
        return logits.astype(jnp.float32)
