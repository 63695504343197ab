"""Segmentation metrics — on-device where possible.

Parity targets:
  * ``SegmentationMetrics`` binary metrics (threshold 0.5, smooth=1e-6):
    dice / IoU / sensitivity / specificity
    (reference ``utils/metrics.py:11-60``).
  * Trainer per-class hard Dice: argmax, classes 1..3, eps=1e-8, mean
    (reference ``training.py:351-364``).
  * Hausdorff distance: the reference trainer uses a *random stub*
    (``training.py:366-369``); ``utils/metrics.py:62-83`` has a real
    coordinate-cloud scipy version. Here it is implemented properly via
    exact Euclidean distance transforms (plus HD95, the standard BraTS
    variant), with an optional on-device path.
  * Composite BraTS regions WT/TC/ET (reference ``config.py:183-187``).

All jnp functions are jit-able and return 0-d arrays; ``compute_all_metrics``
mirrors the reference dict contract (``utils/metrics.py:85-96``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import BRATS_REGIONS

Array = jax.Array
ArrayLike = Union[Array, np.ndarray]


def _binarize(pred: ArrayLike, threshold: float = 0.5) -> Array:
    return (jnp.asarray(pred) > threshold).astype(jnp.float32)


def dice_coefficient(pred: ArrayLike, target: ArrayLike,
                     smooth: float = 1e-6) -> Array:
    """Binary Dice at threshold 0.5 (reference ``utils/metrics.py:14-24``)."""
    p, t = _binarize(pred), _binarize(target)
    inter = jnp.sum(p * t)
    return (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def iou_score(pred: ArrayLike, target: ArrayLike,
              smooth: float = 1e-6) -> Array:
    p, t = _binarize(pred), _binarize(target)
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter
    return (inter + smooth) / (union + smooth)


def sensitivity(pred: ArrayLike, target: ArrayLike,
                smooth: float = 1e-6) -> Array:
    p, t = _binarize(pred), _binarize(target)
    tp = jnp.sum(p * t)
    fn = jnp.sum((1.0 - p) * t)
    return (tp + smooth) / (tp + fn + smooth)


def specificity(pred: ArrayLike, target: ArrayLike,
                smooth: float = 1e-6) -> Array:
    p, t = _binarize(pred), _binarize(target)
    tn = jnp.sum((1.0 - p) * (1.0 - t))
    fp = jnp.sum(p * (1.0 - t))
    return (tn + smooth) / (tn + fp + smooth)


def per_class_dice(pred_labels: ArrayLike, target_labels: ArrayLike,
                   num_classes: int = 4, eps: float = 1e-8) -> Array:
    """Hard Dice per class id (index 0 = background). Vectorized one-hot
    formulation of the reference loop (``training.py:351-364``)."""
    pred_labels = jnp.asarray(pred_labels)
    target_labels = jnp.asarray(target_labels)
    p = jax.nn.one_hot(pred_labels.reshape(-1), num_classes,
                       dtype=jnp.float32)
    t = jax.nn.one_hot(target_labels.reshape(-1), num_classes,
                       dtype=jnp.float32)
    inter = jnp.sum(p * t, axis=0)
    return (2.0 * inter) / (jnp.sum(p, axis=0) + jnp.sum(t, axis=0) + eps)


def mean_foreground_dice(logits_or_labels: ArrayLike,
                         target_labels: ArrayLike,
                         num_classes: int = 4) -> Array:
    """Trainer metric: mean hard Dice over classes 1..num_classes-1.

    Accepts logits (channels-last, argmaxed here) or integer labels.
    """
    x = jnp.asarray(logits_or_labels)
    if x.ndim == jnp.asarray(target_labels).ndim + 1:
        x = jnp.argmax(x, axis=-1)
    d = per_class_dice(x, target_labels, num_classes)
    return jnp.mean(d[1:])


def region_dice(pred_labels: ArrayLike, target_labels: ArrayLike,
                regions: Mapping[str, Sequence[int]] = BRATS_REGIONS
                ) -> Dict[str, Array]:
    """Composite WT/TC/ET Dice (remapped labels; enhancing = 3)."""
    pred_labels = jnp.asarray(pred_labels)
    target_labels = jnp.asarray(target_labels)
    out = {}
    for name, ids in regions.items():
        ids_arr = jnp.asarray(ids)
        p = jnp.isin(pred_labels, ids_arr).astype(jnp.float32)
        t = jnp.isin(target_labels, ids_arr).astype(jnp.float32)
        out[name] = dice_coefficient(p, t)
    return out


# ---------------------------------------------------------------------------
# Hausdorff distance — real implementation replacing the reference stub
# (``training.py:369``). Exact EDT on host; HD95 included (BraTS standard).
# ---------------------------------------------------------------------------

def _edt(mask: np.ndarray, spacing: Sequence[float]) -> np.ndarray:
    """Exact Euclidean distance-to-mask transform (host, scipy)."""
    from scipy import ndimage
    if not mask.any():
        return np.full(mask.shape, np.inf, np.float32)
    return ndimage.distance_transform_edt(~mask, sampling=spacing)


def hausdorff_distance(pred: ArrayLike, target: ArrayLike,
                       spacing: Sequence[float] = (1.0, 1.0, 1.0),
                       percentile: float = 100.0) -> float:
    """Symmetric (percentile-)Hausdorff between binary masks.

    percentile=100 reproduces the classic max-of-directed definition of
    ``utils/metrics.py:62-83``; percentile=95 gives BraTS HD95. Returns
    ``inf`` when either mask is empty (reference behaviour).
    """
    p = np.asarray(pred) > 0.5
    t = np.asarray(target) > 0.5
    if not p.any() or not t.any():
        return float("inf")
    if len(tuple(spacing)) != p.ndim:
        spacing = (1.0,) * p.ndim   # e.g. batched masks: isotropic default
    d_t = _edt(t, spacing)[p]      # distances from pred surface to target
    d_p = _edt(p, spacing)[t]
    if percentile >= 100.0:
        return float(max(d_t.max(), d_p.max()))
    return float(max(np.percentile(d_t, percentile),
                     np.percentile(d_p, percentile)))


def hausdorff_distance_95(pred: ArrayLike, target: ArrayLike,
                          spacing: Sequence[float] = (1.0, 1.0, 1.0)
                          ) -> float:
    return hausdorff_distance(pred, target, spacing, percentile=95.0)


def compute_all_metrics(pred: ArrayLike, target: ArrayLike
                        ) -> Dict[str, float]:
    """Dict contract of reference ``utils/metrics.py:85-96``."""
    return {
        "dice": float(dice_coefficient(pred, target)),
        "iou": float(iou_score(pred, target)),
        "sensitivity": float(sensitivity(pred, target)),
        "specificity": float(specificity(pred, target)),
        "hausdorff": hausdorff_distance(pred, target),
    }


class LossMetrics:
    """Sigmoid-based binary loss variants (the reference's third loss
    stack, ``utils/metrics.py:98-126``). logits/targets are channels-last
    (B, D, H, W, C)."""

    @staticmethod
    def dice_loss(logits, targets, smooth: float = 1e-6):
        p = jax.nn.sigmoid(jnp.asarray(logits, jnp.float32))
        t = jnp.asarray(targets, jnp.float32)
        axes = tuple(range(1, p.ndim - 1))
        inter = jnp.sum(p * t, axis=axes)
        union = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
        dice = (2.0 * inter + smooth) / (union + smooth)
        return 1.0 - jnp.mean(dice)

    @staticmethod
    def focal_loss(logits, targets, alpha: float = 0.25,
                   gamma: float = 2.0):
        from .losses import focal_loss as _fl
        return _fl(logits, targets, alpha, gamma)

    @staticmethod
    def combined_loss(logits, targets, dice_weight: float = 0.5,
                      focal_weight: float = 0.5,
                      focal_targets=None):
        """dice_weight * sigmoid-dice + focal_weight * focal
        (reference ``utils/metrics.py:121-126``). ``focal_targets``
        (integer labels) defaults to argmax of the one-hot targets."""
        d = LossMetrics.dice_loss(logits, targets)
        ft = focal_targets if focal_targets is not None else jnp.argmax(
            jnp.asarray(targets), axis=-1)
        f = LossMetrics.focal_loss(logits, ft)
        return dice_weight * d + focal_weight * f


class SegmentationMetrics:
    """Static-method facade matching reference ``utils/metrics.py:11-96``."""

    dice_coefficient = staticmethod(
        lambda pred, target, smooth=1e-6:
        float(dice_coefficient(pred, target, smooth)))
    iou_score = staticmethod(
        lambda pred, target, smooth=1e-6:
        float(iou_score(pred, target, smooth)))
    sensitivity = staticmethod(
        lambda pred, target, smooth=1e-6:
        float(sensitivity(pred, target, smooth)))
    specificity = staticmethod(
        lambda pred, target, smooth=1e-6:
        float(specificity(pred, target, smooth)))
    hausdorff_distance = staticmethod(hausdorff_distance)
    compute_all_metrics = staticmethod(compute_all_metrics)
