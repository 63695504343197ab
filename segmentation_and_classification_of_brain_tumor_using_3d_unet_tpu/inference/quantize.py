"""Post-training int8 quantization for serving (inference-only).

The reference has no quantized path (everything is fp32/AMP,
``/root/reference/training.py:292-299``); this is a TPU-native serving
addition: the MXU runs int8 at ~2x the bf16 rate, and the DoubleConv
3x3x3 convs — the bulk of inference FLOPs — quantize safely because
every conv is followed by GroupNorm (scale errors wash out in the
normalization statistics).

Scheme (ops/conv.py:conv3d_zcat_int8):
  * weights: symmetric per-output-channel int8, quantized on the fly
    from the unchanged f32 params (no checkpoint conversion);
  * activations: symmetric per-tensor int8 with STATIC per-layer scales
    calibrated here, so the quantize pass is elementwise and XLA fuses
    it into the producer GN/ReLU epilogue.

Usage::

    qvars = calibrate_int8(model, variables, [vol1, vol2, ...])
    qmodel = model.clone(quant_mode="int8")
    out = qmodel.apply(qvars, x, train=False)

Accuracy: tests/test_quant.py measures logit agreement and argmax
agreement vs the bf16 path; benchmarks/convergence_check.py --int8
reports the end-to-end val-Dice delta on a trained model.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp

__all__ = ["calibrate_int8", "quant_scales_from_stats"]


def _rename(tree: Any) -> Any:
    """quant_stats/{...}/absmax -> quant/{...}/act_scale."""
    if isinstance(tree, dict):
        return {("act_scale" if k == "absmax" else k): _rename(v)
                for k, v in tree.items()}
    return tree


def quant_scales_from_stats(stats: Dict, margin: float = 1.0) -> Dict:
    """Map per-layer max|activation| to int8 scales (absmax*margin/127).

    ``margin`` > 1 WIDENS the representable range beyond the observed
    absmax (coarser resolution, headroom against unseen outliers, no
    clipping); ``margin`` < 1 narrows it — finer resolution at the cost
    of clipping the top of the range (stats are plain maxima, so this
    approximates a quantile cut).
    """
    scaled = jax.tree_util.tree_map(
        lambda a: jnp.maximum(a * margin, 1e-6) / 127.0, stats)
    return _rename(scaled)


def calibrate_int8(model, variables: Dict,
                   sample_volumes: Iterable[jax.Array],
                   margin: float = 1.0) -> Dict:
    """Run calibration forwards and return variables for the int8 model.

    model: the bf16 flax model (``quant_mode`` attribute ignored — a
    "calib" clone is constructed here). variables: its trained
    variables. sample_volumes: iterable of (D, H, W, C) or (B, D, H, W,
    C) arrays spanning the expected input distribution (after the same
    preprocessing inference uses).

    Returns ``variables`` extended with the "quant" collection of
    per-conv ``act_scale`` leaves, for use with
    ``model.clone(quant_mode="int8")``.
    """
    calib = model.clone(quant_mode="calib")
    stats = None
    apply = jax.jit(
        lambda v, x: calib.apply(v, x, train=False,
                                 mutable=["quant_stats"])[1])
    for vol in sample_volumes:
        x = jnp.asarray(vol)
        if x.ndim == 4:
            x = x[None]
        out = apply(variables, x)["quant_stats"]
        stats = out if stats is None else jax.tree_util.tree_map(
            jnp.maximum, stats, out)
    if stats is None:
        raise ValueError("calibrate_int8 needs at least one sample volume")
    quant = quant_scales_from_stats(stats, margin)
    return {**variables, "quant": quant}
