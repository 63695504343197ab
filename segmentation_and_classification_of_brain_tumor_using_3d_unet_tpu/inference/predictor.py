"""High-level inference: segmentation + tumor-grade classification.

Parity with the reference helpers that its Flask app defines but never
wires to a route (``main.py:356-425`` — SURVEY.md behavioral caveat):
here they are real, jitted, and used by the serving layer.

Two segmentation paths:
  * ``whole_volume``: zoom to model size, forward once — the reference's
    semantics (``main.py:382-398``);
  * ``sliding_window``: Gaussian-blended full-resolution inference (the
    north-star addition).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLASS_NAMES, Config
from ..data.preprocess import preprocess_image as _pre_chain
from ..models import BrainTumorClassifier, UNet3D
from ..ops.resize import resize_trilinear
from . import cropping
from .sliding_window import make_sw_predictor

logger = logging.getLogger(__name__)

Array = jax.Array


class Predictor:
    """Owns a UNet3D + classifier and their weights."""

    def __init__(self, config: Optional[Config] = None,
                 seg_model: Optional[UNet3D] = None,
                 cls_model: Optional[BrainTumorClassifier] = None,
                 seg_variables=None, cls_variables=None,
                 seed: int = 0):
        self.config = config or Config()
        mc = self.config.model
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else (
            jnp.float32)
        self.seg_model = seg_model or UNet3D(
            out_channels=mc.out_channels, features=mc.features,
            dropout_rate=mc.dropout_rate, dtype=dtype, remat=mc.remat,
            s2d_eval=getattr(mc, "s2d_eval", False),
            ps2d_eval=getattr(mc, "ps2d_eval", False),
            ps2d_levels=getattr(mc, "ps2d_levels", 1))
        self.cls_model = cls_model or BrainTumorClassifier(
            num_classes=4, dtype=dtype)

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        size = self.config.data.image_size
        jinit_seg = jax.jit(self.seg_model.init,
                            static_argnames=("train",))
        jinit_cls = jax.jit(self.cls_model.init,
                            static_argnames=("train",))
        if seg_variables is None:
            seg_variables = jinit_seg(
                k1, jnp.zeros((1, *size, mc.in_channels)), train=False)
        if cls_variables is None:
            cls_variables = jinit_cls(
                k2, jnp.zeros((1, *size, 4)), train=False)
        self.seg_variables = seg_variables
        self.cls_variables = cls_variables

        ic = self.config.inference
        self._sw = make_sw_predictor(
            self.seg_model, self.seg_variables, roi_size=ic.roi_size,
            overlap=ic.overlap, sw_batch_size=ic.sw_batch_size,
            blend_mode=ic.blend_mode, sigma_scale=ic.gaussian_sigma_scale)
        self._whole = jax.jit(self._whole_volume_logits)
        self._whole_tta = jax.jit(self._whole_volume_tta_probs)
        self._classify = jax.jit(self._classify_logits)
        if (getattr(ic, "window_parallel", False)
                and jax.device_count() > 1):
            from ..parallel import create_mesh
            self.enable_window_parallel(create_mesh())

    def enable_window_parallel(self, mesh) -> None:
        """Route sliding-window segmentation (``sliding_window`` and
        ``cropped`` modes) through the window-parallel multichip
        engine (``parallel.infer.sliding_window_inference_mp``): the
        window grid splits over the mesh's data axis and one psum
        merges the Gaussian accumulators — single-volume latency
        scales with chips. Weight swaps (checkpoint adoption) keep
        working through the same ``set_variables`` contract."""
        from ..parallel.infer import sliding_window_inference_mp
        ic = self.config.inference
        state = {"variables": self.seg_variables}
        model = self.seg_model

        def apply_fn(vars_, patches):
            out = model.apply(vars_, patches, train=False)
            return out["logits"] if isinstance(out, dict) else out

        def predict(volume):
            return sliding_window_inference_mp(
                state["variables"], volume, apply_fn, mesh,
                roi_size=tuple(ic.roi_size), overlap=ic.overlap,
                sw_batch_size=ic.sw_batch_size,
                blend_mode=ic.blend_mode,
                sigma_scale=ic.gaussian_sigma_scale,
                out_channels=getattr(model, "out_channels", 4))

        predict.set_variables = (
            lambda v: state.__setitem__("variables", v))
        self._sw = predict

    # -------------------- segmentation --------------------

    def _whole_volume_logits(self, variables, volume: Array) -> Array:
        """Reference semantics: resize -> single forward -> logits at the
        input resolution (``main.py:386-395``).

        ``variables`` is an explicit argument (not a closure capture) so
        the weights lower to runtime parameters, not HLO constants — a
        weights-sized compile payload trips request-size limits on
        remote-compile attaches (observed: HTTP 413 on axon)."""
        size = self.config.data.image_size
        x = resize_trilinear(volume[None], size)
        out = self.seg_model.apply(variables, x, train=False)
        logits = out["logits"]
        return resize_trilinear(logits, volume.shape[:3])[0]

    _FLIP_COMBOS = ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
                    (0, 1, 2))

    def _whole_volume_tta_probs(self, variables, volume: Array) -> Array:
        """Whole-volume mirror TTA as ONE jitted program: the 8 flipped
        copies are built on device and batched through a single B=8
        forward (full MXU batch instead of 8 host round-trips), then
        un-flipped and averaged. Returns (D, H, W, C) probabilities."""
        size = self.config.data.image_size
        axmap = tuple(tuple(a + 1 for a in ax) for ax in
                      self._FLIP_COMBOS)   # batch dim offset
        vols = jnp.concatenate(
            [jnp.flip(volume[None], ax) if ax else volume[None]
             for ax in axmap], axis=0)
        x = resize_trilinear(vols, size)
        out = self.seg_model.apply(variables, x, train=False)
        logits = resize_trilinear(out["logits"], volume.shape[:3])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        back = [jnp.flip(probs[i:i + 1], ax) if ax else probs[i:i + 1]
                for i, ax in enumerate(axmap)]
        return jnp.mean(jnp.concatenate(back, axis=0), axis=0)

    def _canon(self, volume: np.ndarray) -> np.ndarray:
        """(D,H,W[,C]) host array -> (D,H,W,in_channels) float32.

        Partial modality sets (the CLI accepts 2-3 of the 4 BraTS
        files) tile the AVAILABLE channels cyclically — every real
        modality is used, none silently discarded — with a warning;
        single-channel input reproduces the reference's stack-x4
        (``main.py:409``). Extra channels truncate."""
        vol = np.asarray(volume, np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        want_c = self.config.model.in_channels
        c = vol.shape[-1]
        if c != want_c:
            if c > 1:
                logger.warning(
                    "input has %d of %d expected modalities; tiling "
                    "the available channels (quality may degrade)",
                    c, want_c)
            reps = -(-want_c // c)
            vol = np.concatenate([vol] * reps, axis=-1)[..., :want_c]
        return vol

    def _segment_logits(self, vol: np.ndarray, mode: str
                        ) -> Tuple[Array, Optional[Tuple]]:
        """Route one canonical volume to a segmentation path. Returns
        (logits, crop_plan) — crop_plan is (offsets, full_shape) when the
        logits cover only the foreground window, else None."""
        if mode == "cropped":
            ic = self.config.inference
            offs, bucket = cropping.plan_crop(
                vol, multiple=16, min_size=min(ic.roi_size),
                ladder=getattr(ic, "crop_bucket_ladder", None))
            crop = cropping.extract_crop(vol, offs, bucket)
            return self._sw(jnp.asarray(crop)), (offs, vol.shape[:3])
        if mode == "sliding_window":
            return self._sw(jnp.asarray(vol)), None
        return self._whole(self.seg_variables, jnp.asarray(vol)), None

    def _probs_full(self, vol: np.ndarray, mode: str) -> np.ndarray:
        """Canonical volume -> full-resolution class probabilities
        (D, H, W, C) float32 (crop-mode windows pasted back; outside
        the window is exact-zero air: background with certainty)."""
        logits, plan = self._segment_logits(vol, mode)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1), np.float32)
        if plan is not None:
            offs, full = plan
            sl = tuple(slice(o, min(o + c, f)) for o, c, f in
                       zip(offs, probs.shape[:3], full))
            pasted = cropping.paste_full(probs, offs, full, fill=0.0)
            outside = np.ones(tuple(full), bool)
            outside[sl] = False
            pasted[..., 0][outside] = 1.0
            probs = pasted
        return probs

    def segment_tumor(self, volume: np.ndarray,
                      mode: str = "sliding_window",
                      tta: bool = False) -> np.ndarray:
        """Volume (D,H,W) or (D,H,W,C) -> int8 label map at input res.

        Modes: ``sliding_window`` (full-res Gaussian blend),
        ``cropped`` (nonzero-bbox crop, then sliding window — nnU-Net's
        production pipeline; requires skull-stripped zero background),
        ``whole_volume`` (reference semantics, ``main.py:382-398``).
        ``tta`` averages probabilities over the 8 mirror flips.
        """
        if tta:
            return self.segment_with_confidence(volume, mode, tta=True)[0]
        vol = self._canon(volume)
        logits, plan = self._segment_logits(vol, mode)
        labels = np.asarray(jnp.argmax(logits, axis=-1), np.int8)
        if plan is not None:
            labels = cropping.paste_full(labels, plan[0], plan[1], fill=0)
        return labels

    def segment_with_confidence(self, volume: np.ndarray,
                                mode: str = "sliding_window",
                                tta: bool = False
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """(labels int8, per-voxel max-softmax confidence float32).

        In ``cropped`` mode, voxels outside the foreground window are
        background with confidence 1.0 (they are exactly-zero air by
        construction). ``tta`` enables mirror test-time augmentation:
        probabilities averaged over all 8 D/H/W flip combinations
        (nnU-Net practice; ~8x inference cost, flip-equivariant
        output). Flipped volumes keep the input shape, so every flip
        reuses the already-compiled program. No reference counterpart
        (the reference has no TTA)."""
        vol = self._canon(volume)
        if tta:
            if mode == "whole_volume":
                # one jitted B=8 program, flips built on device
                probs = np.asarray(self._whole_tta(
                    self.seg_variables, jnp.asarray(vol)), np.float32)
            else:
                acc: Optional[np.ndarray] = None
                for axes in self._FLIP_COMBOS:
                    v = (np.ascontiguousarray(np.flip(vol, axis=axes))
                         if axes else vol)
                    p = self._probs_full(v, mode)
                    if axes:
                        p = np.flip(p, axis=axes)
                    acc = p if acc is None else acc + p
                probs = acc / 8.0
            return (np.argmax(probs, axis=-1).astype(np.int8),
                    np.max(probs, axis=-1).astype(np.float32))
        logits, plan = self._segment_logits(vol, mode)
        probs = jax.nn.softmax(logits, axis=-1)
        labels = np.asarray(jnp.argmax(probs, axis=-1), np.int8)
        conf = np.asarray(jnp.max(probs, axis=-1), np.float32)
        if plan is not None:
            labels = cropping.paste_full(labels, plan[0], plan[1], fill=0)
            conf = cropping.paste_full(conf, plan[0], plan[1], fill=1.0)
        return labels, conf

    # -------------------- classification --------------------

    def _classify_logits(self, variables, volume: Array) -> Array:
        size = self.config.data.image_size
        x = resize_trilinear(volume[None], size)
        return self.cls_model.apply(variables, x, train=False)

    def classify_tumor(self, volume: np.ndarray,
                       segmentation: Optional[np.ndarray] = None
                       ) -> Tuple[str, float]:
        """(type_name, confidence). Mirrors the reference contract
        (``main.py:400-425``): no-tumor segmentations short-circuit to
        'No Tumor Detected'; single-modality volumes are stacked x4."""
        if segmentation is not None and not (np.asarray(segmentation) > 0
                                             ).any():
            return "No Tumor Detected", 0.95
        # same cyclic-tiling policy as _canon: use every real modality
        vol = jnp.asarray(self._canon(np.asarray(volume)), jnp.float32)
        if vol.shape[-1] != 4:
            reps = -(-4 // vol.shape[-1])
            vol = jnp.concatenate([vol] * reps, axis=-1)[..., :4]
        logits = self._classify(self.cls_variables, vol)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        idx = int(np.argmax(probs))
        return CLASS_NAMES[idx], float(probs[idx])

    # -------------------- grade head (joint checkpoints) --------------------

    joint_variables = None

    def load_joint_grade(self, joint_params, joint_batch_stats,
                         num_grades: int = 4) -> None:
        """Enable trained tumor-grade prediction from a joint
        (``UNet3DWithClassifier``) checkpoint: trunk + grade head run as
        one jitted forward at model resolution. Requires the
        checkpoint's batch_stats (trainer checkpoints always carry
        them)."""
        from ..models.joint import UNet3DWithClassifier
        mc = self.config.model
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else (
            jnp.float32)
        self._joint_model = UNet3DWithClassifier(
            out_channels=mc.out_channels, num_grades=num_grades,
            features=mc.features, dropout_rate=mc.dropout_rate,
            dtype=dtype, remat=mc.remat)
        self.joint_variables = {"params": joint_params,
                                "batch_stats": joint_batch_stats}
        self._grade = jax.jit(self._grade_logits)

    def _grade_logits(self, variables, volume: Array) -> Array:
        size = self.config.data.image_size
        x = resize_trilinear(volume[None], size)
        return self._joint_model.apply(variables, x,
                                       train=False)["grade_logits"]

    def classify_grade(self, volume: np.ndarray
                       ) -> Optional[Tuple[int, float]]:
        """(grade 0..3, softmax confidence) from the trained joint grade
        head, or None when no joint checkpoint was adopted. Grade
        indexes the clinical diagnosis ladder (``serve/reports.py``)."""
        if self.joint_variables is None:
            return None
        vol = jnp.asarray(self._canon(volume))
        logits = self._grade(self.joint_variables, vol)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        idx = int(np.argmax(probs))
        return idx, float(probs[idx])

    # -------------------- weights --------------------

    def load_seg_params(self, params, batch_stats=None) -> None:
        self.seg_variables = {**self.seg_variables, "params": params}
        if batch_stats is not None:
            self.seg_variables = {**self.seg_variables,
                                  "batch_stats": batch_stats}
        # _whole/_classify take variables as runtime arguments, and the
        # sliding-window predictor reads them from a mutable slot —
        # adopting new weights never retraces any compiled program
        self._sw.set_variables(self.seg_variables)


def preprocess_image(path_or_array, target_size=(128, 128, 128)
                     ) -> np.ndarray:
    """File/array -> normalized (D,H,W) float32 (reference
    ``main.py:356-380``: NIfTI via codec, 2D images stacked, z-score,
    zoom). ``target_size=None`` keeps the native resolution so the
    sliding-window engine can segment at full res (the reference always
    zooms destructively to model size)."""
    from ..data.dataset import load_any_volume
    vol = (load_any_volume(path_or_array)
           if isinstance(path_or_array, str) else
           np.asarray(path_or_array, np.float32))
    out = np.asarray(_pre_chain(
        jnp.asarray(vol),
        None if target_size is None else tuple(target_size)))
    return out.astype(np.float32)
