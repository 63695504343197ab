"""Joint segmentation + tumor-grade classification (BASELINE.json
config 4: 'Joint segmentation + tumor-grade classification head with
combined Dice+CE+focal loss').

The reference keeps its segmentation net and grade classifier as two
disconnected models (``main.py:102-328``) — the classifier is never even
trained. Here a grade head shares the U-Net encoder: global-average-
pooled bottleneck features -> MLP -> grade logits, trained jointly with
``loss = seg_loss + cls_weight * CE(grade)``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pool import global_avg_pool
from .unet3d import UNet3D


class UNet3DWithClassifier(nn.Module):
    """UNet3D trunk + grade head off the bottleneck."""

    out_channels: int = 4
    num_grades: int = 4
    features: Sequence[int] = (32, 64, 128, 256, 512)
    dropout_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    fast: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, Any]:
        out = UNet3D(
            out_channels=self.out_channels, features=self.features,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            param_dtype=self.param_dtype, remat=self.remat,
            fast=self.fast, name="unet")(x, train=train)

        h = global_avg_pool(out["bottleneck"], keepdims=False)  # (B, C)
        # Predicted-burden features: tumor grade is a burden property
        # (grade_from_volume's clinical volume ladder), and the model's
        # own segmentation posterior already estimates burden — read it.
        # log-scale because the ladder thresholds (0.1/1/5%) are
        # log-spaced: one linear layer on log-burden can realise the
        # ladder exactly once the seg head is decent. stop_gradient
        # keeps noisy early grade-CE gradients out of the decoder (the
        # trunk still receives grade gradient through the GAP branch).
        logits_sg = jax.lax.stop_gradient(out["logits"]).astype(
            jnp.float32)
        probs = jax.nn.softmax(logits_sg, axis=-1)
        burden = jnp.mean(probs[..., 1:], axis=(1, 2, 3))   # (B, C-1)
        # decision burden: foreground fraction of the model's own
        # argmax mask — the EXACT quantity grade_from_volume ladders
        # on the GT mask, so with good segmentation one threshold
        # feature decides the grade
        hard = jnp.mean((jnp.argmax(logits_sg, -1) > 0).astype(
            jnp.float32), axis=(1, 2, 3))[:, None]          # (B, 1)
        burden_feats = jnp.log(
            jnp.concatenate([burden, hard], axis=-1) + 1e-6
        ).astype(h.dtype)
        h = jnp.concatenate([h, burden_feats], axis=-1)
        h = nn.relu(nn.Dense(256, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="grade_fc1")(h))
        h = nn.Dropout(0.3, deterministic=not train)(h)
        grade = nn.Dense(self.num_grades, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="grade_out")(h)
        out["grade_logits"] = grade.astype(jnp.float32)
        return out


def joint_loss(out: Dict[str, Any], seg_targets, grade_targets,
               seg_loss_fn, cls_weight: float = 0.3):
    """seg loss (incl. deep supervision) + weighted grade CE."""
    seg_loss = seg_loss_fn(out, seg_targets)
    logp = jax.nn.log_softmax(out["grade_logits"], axis=-1)
    # dense one-hot pick for consistency with losses.py (TPU gathers
    # are slow; at (B, 4) it only matters for uniformity)
    oh = jax.nn.one_hot(grade_targets, logp.shape[-1], dtype=logp.dtype)
    ce = -jnp.mean(jnp.sum(logp * oh, axis=-1))
    return seg_loss + cls_weight * ce, {"seg_loss": seg_loss,
                                        "grade_ce": ce}


def grade_from_volume(tumor_voxels, total_voxels) -> jax.Array:
    """Synthetic grade label from tumor burden, mirroring the clinical
    volume ladder (serve/reports.py): 0 none/benign .. 3 high-grade."""
    frac = tumor_voxels / jnp.maximum(total_voxels, 1)
    return (
        (frac > 0.001).astype(jnp.int32)
        + (frac > 0.01).astype(jnp.int32)
        + (frac > 0.05).astype(jnp.int32)
    )
