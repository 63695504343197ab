"""Segmentation loss library — pure jit-able JAX functions.

Behavioral parity with BOTH reference loss stacks (they are duplicated
there):

  * trainer losses (``/root/reference/training.py:517-566``):
    ``DiceLoss`` (smooth=1e-6), ``FocalLoss`` (alpha=1, gamma=2),
    ``CombinedLoss`` = 0.5*dice + 0.3*CE + 0.2*focal.
  * advanced losses (``/root/reference/losses.py:7-126``):
    ``CombinedLoss3D`` = 0.5*dice + 0.3*focal(0.25, 2) + 0.2*boundary
    (returns ``(loss, parts)``), ``TverskyLoss3D`` (0.7/0.3, smooth=1e-5),
    ``DeepSupervisionLoss3D`` (weights [1.0, 0.8, 0.6, 0.4]).

Layout: logits are channels-last ``(B, D, H, W, C)``; targets are integer
``(B, D, H, W)``. All reductions accumulate in fp32.

The reference never actually wires deep supervision (its trainer criterion
cannot consume the model's train-mode tuple — SURVEY.md section 2.2); here
``deep_supervision_loss`` implements the *intended* semantics and is wired
into the trainer.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ops.resize import resize_nearest

Array = jax.Array
SPATIAL = (1, 2, 3)   # D, H, W for (B, D, H, W, C)


def _one_hot(targets: Array, num_classes: int) -> Array:
    return jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)


def softmax_dice_loss(logits: Array, targets: Array,
                      smooth: float = 1e-6) -> Array:
    """Multi-class soft Dice: per-(batch, class) dice over spatial dims,
    1 - mean (reference ``training.py:543-552``)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _one_hot(targets, logits.shape[-1])
    inter = jnp.sum(probs * onehot, axis=SPATIAL)
    union = jnp.sum(probs, axis=SPATIAL) + jnp.sum(onehot, axis=SPATIAL)
    dice = (2.0 * inter + smooth) / (union + smooth)
    return 1.0 - jnp.mean(dice)


def cross_entropy_loss(logits: Array, targets: Array) -> Array:
    """Mean softmax cross-entropy (``nn.CrossEntropyLoss`` default).

    The target pick runs as a dense one-hot contraction, not
    ``take_along_axis`` — TPU lowers full-resolution gathers (and their
    scatter transpose in the backward) pathologically slowly."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(logp * _one_hot(targets, logits.shape[-1]), axis=-1)
    return jnp.mean(nll)


def focal_loss(logits: Array, targets: Array, alpha: float = 1.0,
               gamma: float = 2.0) -> Array:
    """``alpha * (1 - pt)^gamma * CE`` (reference ``training.py:554-566``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(logp * _one_hot(targets, logits.shape[-1]), axis=-1)
    pt = jnp.exp(-ce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * ce)


def combined_loss(logits: Array, targets: Array,
                  weights: Sequence[float] = (0.5, 0.3, 0.2),
                  focal_alpha: float = 1.0, focal_gamma: float = 2.0
                  ) -> Array:
    """Trainer criterion: w0*dice + w1*CE + w2*focal
    (reference ``training.py:517-534``).

    Single-pass formulation: one log_softmax feeds all three terms
    (dice probs = exp(logp), CE = -logp[target], focal reuses CE), so
    the full-resolution tensor is normalized once instead of three
    times — the deep-supervision stack pays this loss 5x per step.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.exp(logp)
    onehot = _one_hot(targets, logits.shape[-1])

    inter = jnp.sum(probs * onehot, axis=SPATIAL)
    union = jnp.sum(probs, axis=SPATIAL) + jnp.sum(onehot, axis=SPATIAL)
    dice = 1.0 - jnp.mean((2.0 * inter + 1e-6) / (union + 1e-6))

    # dense pick via the one-hot already needed for dice (gather-free)
    ce_map = -jnp.sum(logp * onehot, axis=-1)
    ce = jnp.mean(ce_map)
    pt = jnp.exp(-ce_map)
    focal = jnp.mean(focal_alpha * (1.0 - pt) ** focal_gamma * ce_map)

    return weights[0] * dice + weights[1] * ce + weights[2] * focal


def boundary_loss(logits: Array, targets: Array) -> Array:
    """MSE between forward-difference gradient magnitudes of softmax(pred)
    and one-hot(target) (reference ``losses.py:37-61``)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _one_hot(targets, logits.shape[-1])

    def grad_mag(t: Array) -> Array:
        total = jnp.zeros_like(t)
        for ax in SPATIAL:
            d = jnp.abs(jnp.diff(t, axis=ax))
            pad = [(0, 0)] * t.ndim
            pad[ax] = (0, 1)
            total = total + jnp.pad(d, pad)
        return total

    return jnp.mean(jnp.square(grad_mag(probs) - grad_mag(onehot)))


def combined_loss3d(logits: Array, targets: Array, alpha: float = 0.5,
                    beta: float = 0.3, gamma: float = 0.2,
                    smooth: float = 1e-5
                    ) -> Tuple[Array, Dict[str, Array]]:
    """Advanced loss: alpha*dice + beta*focal(0.25,2) + gamma*boundary,
    returning ``(total, parts)`` (reference ``losses.py:7-75``)."""
    dice = softmax_dice_loss(logits, targets, smooth)
    focal = focal_loss(logits, targets, alpha=0.25, gamma=2.0)
    boundary = boundary_loss(logits, targets)
    total = alpha * dice + beta * focal + gamma * boundary
    return total, {"dice_loss": dice, "focal_loss": focal,
                   "boundary_loss": boundary, "total_loss": total}


def tversky_loss(logits: Array, targets: Array, alpha: float = 0.7,
                 beta: float = 0.3, smooth: float = 1e-5) -> Array:
    """Tversky index loss; alpha weights FP, beta weights FN
    (reference ``losses.py:77-97``)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _one_hot(targets, logits.shape[-1])
    tp = jnp.sum(probs * onehot, axis=SPATIAL)
    fp = jnp.sum(probs * (1.0 - onehot), axis=SPATIAL)
    fn = jnp.sum((1.0 - probs) * onehot, axis=SPATIAL)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1.0 - jnp.mean(tv)


def deep_supervision_loss(logits: Array, deep_logits: Sequence[Array],
                          targets: Array,
                          weights: Sequence[float] = (1.0, 0.8, 0.6, 0.4),
                          loss_fn: Callable[[Array, Array], Array]
                          = combined_loss) -> Array:
    """Weighted multi-scale loss (reference ``losses.py:99-126``).

    Main output gets ``weights[0]``; deep head ``i`` gets ``weights[i+1]``.
    Our deep heads are already trilinearly upsampled to full resolution
    inside the model (matching reference ``main.py:163-171``), so targets
    need no resizing; a nearest-resize is applied only if a deep output's
    spatial shape differs from the target's.
    """
    total = weights[0] * loss_fn(logits, targets)
    for i, d in enumerate(deep_logits):
        if i + 1 >= len(weights):
            break
        t = targets
        if d.shape[1:-1] != targets.shape[1:]:
            t = resize_nearest(
                targets[..., None].astype(jnp.int32), d.shape[1:-1]
            )[..., 0]
        total = total + weights[i + 1] * loss_fn(d, t)
    return total


# ---------------------------------------------------------------------------
# Class-style API parity shims (SURVEY.md section 2.11 public surface).
# Stateless and hashable; safe to close over under jit.
# ---------------------------------------------------------------------------

class DiceLoss:
    def __init__(self, smooth: float = 1e-6):
        self.smooth = smooth

    def __call__(self, logits, targets):
        return softmax_dice_loss(logits, targets, self.smooth)


class FocalLoss:
    def __init__(self, alpha: float = 1.0, gamma: float = 2.0):
        self.alpha, self.gamma = alpha, gamma

    def __call__(self, logits, targets):
        return focal_loss(logits, targets, self.alpha, self.gamma)


class CombinedLoss:
    def __init__(self, weights: Sequence[float] = (0.5, 0.3, 0.2)):
        self.weights = tuple(weights)

    def __call__(self, logits, targets):
        return combined_loss(logits, targets, self.weights)


class CombinedLoss3D:
    def __init__(self, alpha=0.5, beta=0.3, gamma=0.2, smooth=1e-5):
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self.smooth = smooth

    def __call__(self, logits, targets):
        return combined_loss3d(logits, targets, self.alpha, self.beta,
                               self.gamma, self.smooth)


class TverskyLoss3D:
    def __init__(self, alpha=0.7, beta=0.3, smooth=1e-5):
        self.alpha, self.beta, self.smooth = alpha, beta, smooth

    def __call__(self, logits, targets):
        return tversky_loss(logits, targets, self.alpha, self.beta,
                            self.smooth)


class DeepSupervisionLoss3D:
    def __init__(self, weights: Sequence[float] = (1.0, 0.8, 0.6, 0.4),
                 loss_fn: Callable = None):
        self.weights = tuple(weights)
        inner = loss_fn or CombinedLoss3D()
        # CombinedLoss3D returns (loss, parts); unwrap for the weighted sum.
        self._fn = (lambda lg, tg: inner(lg, tg)[0]) if isinstance(
            inner, CombinedLoss3D) else inner

    def __call__(self, predictions, targets):
        if isinstance(predictions, dict):
            return deep_supervision_loss(
                predictions["logits"], predictions.get("deep", []),
                targets, self.weights, self._fn)
        if isinstance(predictions, tuple):
            return deep_supervision_loss(
                predictions[0], predictions[1], targets, self.weights,
                self._fn)
        return self._fn(predictions, targets)
