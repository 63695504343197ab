"""Configuration system for the TPU-native brain-tumor framework.

Frozen-dataclass re-design of the reference's class-attribute ``Config`` tree
(reference: ``config.py:10-195``).  The reference exposes a base ``Config``
plus four presets (``FastTrainingConfig``, ``HighQualityConfig``,
``LightweightConfig``, ``ProductionConfig``) and module-level BraTS constants;
we mirror the same names, fields, and default values, but as immutable,
hashable dataclasses so they can be closed over by ``jax.jit`` without
retracing hazards.

TPU-specific additions (no reference counterpart):
  * ``compute_dtype`` — bf16 matmul/conv with fp32 accumulation replaces the
    reference's CUDA AMP (``training.py:200,292-299``).
  * ``mesh_shape`` / ``mesh_axes`` — ``jax.sharding.Mesh`` layout for data /
    spatial parallelism (reference is single-device, ``train_model.py:135``).
  * ``sw_*`` fields — Gaussian sliding-window inference over full
    240x240x155 volumes (the reference destructively zooms everything to
    ``IMAGE_SIZE``, ``training.py:117-146``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple


def _freeze(v):
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference ``config.py:14-17``)."""

    in_channels: int = 4
    out_channels: int = 4
    features: Tuple[int, ...] = (32, 64, 128, 256, 512)
    dropout_rate: float = 0.2
    # TPU additions
    compute_dtype: str = "bfloat16"   # conv/matmul dtype; params stay fp32
    param_dtype: str = "float32"
    remat: bool = True                # jax.checkpoint on DoubleConv blocks
    # (a ``use_pallas`` group-norm flag was removed in round 3: the
    # Pallas group-norm kernel measured-and-lost on this libtpu and was
    # never wired in — a config field must not advertise an unwired
    # kernel; see benchmarks/RESULTS.md)
    # eval-only space-to-depth level 0 (ops/s2d.py): full-lane conv2d
    # for the N<=32 extremity blocks; exact and checkpoint-compatible.
    # MEASURED AND LOSES on this libtpu (real-chip A/B 2026-08-18:
    # headline 8.42 vs 10.78 vol/s, tiled 4.54 vs 5.53, train 307.5 vs
    # 247.2 ms/step — benchmarks/RESULTS.md s2d section). Defaults stay
    # False; kept because it is exact and may win on other platforms.
    s2d_eval: bool = False
    # same for training steps (fwd + bwd)
    s2d_train: bool = False
    # packed-s2d Pallas kernels (ops/pallas/ps2d.py) for the
    # decoder-last stage at eval: 1.6-2.9x per-conv over zcat on v5e
    # (benchmarks/RESULTS.md round 3). Exact and checkpoint-compatible;
    # takes precedence over s2d_eval at level 0.
    ps2d_eval: bool = False
    # how many resolution levels (from 0) run flat-resident with
    # ps2d_eval (2 extends the region to enc1/dec1)
    ps2d_levels: int = 1


@dataclass(frozen=True)
class LossConfig:
    """Loss weighting (reference ``config.py:39-43``)."""

    dice_weight: float = 0.5
    ce_weight: float = 0.3
    focal_weight: float = 0.2
    focal_alpha: float = 1.0
    focal_gamma: float = 2.0
    # deep supervision weights, main output first (reference losses.py:102)
    deep_supervision_weights: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.4)
    use_deep_supervision: bool = True
    # False (default): deep losses at each head's native scale with
    # nearest-downsampled targets (nnU-Net practice; ~300 ms/step
    # cheaper at 128^3 b2). True: upsample heads to full res in the
    # model (the reference model's written-but-dead behavior,
    # main.py:163-171).
    deep_supervision_full_res: bool = False


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + cosine-warm-restarts (reference ``config.py:46-54``,
    ``training.py:187-197``)."""

    name: str = "adamw"
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    scheduler: str = "cosine_warm_restarts"
    t_0: int = 10            # first restart period (epochs)
    t_mult: int = 2          # period multiplier
    eta_min: float = 1e-6
    grad_clip_norm: float = 0.0   # 0 = off (reference does not clip)


@dataclass(frozen=True)
class AugmentConfig:
    """Volumetric augmentation (reference ``config.py:32-36``,
    ``training.py:148-172``)."""

    enabled: bool = True
    rot90_prob: float = 0.5
    flip_prob: float = 0.5
    noise_prob: float = 0.3
    noise_sigma_max: float = 0.1
    intensity_prob: float = 0.5
    intensity_range: Tuple[float, float] = (0.9, 1.1)
    # gamma-curve augmentation (nnU-Net practice, beyond the reference's
    # set): x -> x^gamma on a per-volume min/max-normalized copy
    gamma_prob: float = 0.15
    gamma_range: Tuple[float, float] = (0.7, 1.5)


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline (reference ``config.py:26-29``)."""

    image_size: Tuple[int, int, int] = (128, 128, 128)
    num_workers: int = 4
    cache_rate: float = 0.5
    clip_percentiles: Tuple[float, float] = (1.0, 99.0)
    modalities: Tuple[str, ...] = ("t1c", "t1n", "t2f", "t2w")
    prefetch_depth: int = 2   # host->HBM double buffering


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for SPMD (TPU addition; reference has no distribution,
    SURVEY.md section 2.9)."""

    # -1 = fill with all available devices on that axis
    data: int = -1
    space: int = 1
    axis_names: Tuple[str, str] = ("data", "space")


@dataclass(frozen=True)
class InferenceConfig:
    """Sliding-window inference (north-star addition; the reference forwards
    one whole resized volume, ``main.py:382-398``)."""

    roi_size: Tuple[int, int, int] = (128, 128, 128)
    overlap: float = 0.5
    sw_batch_size: int = 4
    blend_mode: str = "gaussian"     # "gaussian" | "constant"
    gaussian_sigma_scale: float = 0.125
    # segmentation path for /upload: "cropped" segments at native
    # resolution inside the foreground bounding box (nnU-Net practice;
    # ~2x faster on skull-stripped volumes, identical semantics —
    # degrades to the full extent when there is no constant
    # background); "sliding_window" keeps native resolution without
    # cropping; "whole_volume" reproduces the reference's destructive
    # zoom-to-model-size semantics (main.py:382-398)
    upload_mode: str = "cropped"
    # mirror test-time augmentation: average probabilities over the 8
    # D/H/W flips (nnU-Net practice; ~8x inference cost, better Dice).
    # Off by default — serving latency and the headline bench stay
    # single-pass. No reference counterpart.
    tta: bool = False
    # split each volume's sliding-window grid over all devices
    # (parallel.infer.sliding_window_inference_mp): single-volume
    # latency scales with chips. Applies to cropped/sliding_window
    # modes when more than one device is visible; no-op on one chip.
    window_parallel: bool = False
    # canonical crop-bucket sizes for serving: each crop axis rounds up
    # to the smallest rung, so a serving process compiles at most a
    # handful of sliding-window programs regardless of brain sizes
    # (a novel shape costs minutes of XLA compile; ~10% extra voxels
    # buys that latency stability). () disables — every extent rounds
    # to the next multiple of 16 (best per-volume throughput; what the
    # headline bench measures).
    crop_bucket_ladder: Tuple[int, ...] = (96, 128, 160, 192, 224, 256)
    # startup compile policy for serving: "full" warms both the
    # whole-volume (demo/reference-semantics) program and the
    # upload_mode program; "upload" warms only what /upload will run
    # (halves cold-start compile when upload_mode != "whole_volume");
    # "off" compiles nothing ahead of time — the first request pays
    # the XLA compile behind the predictor lock. With the persistent
    # compilation cache warm this only matters on fresh cache dirs.
    warmup: str = "full"
    # trained weights for serving: a trainer checkpoint dir or
    # params-only export. "" = auto-discover the newest compatible
    # ``best_*`` checkpoint under ``models_dir`` (so web/CLI training
    # feeds straight into serving); "none" = always random init
    # (reference behavior — it builds untrained models at import,
    # main.py:330-354)
    checkpoint: str = ""


@dataclass(frozen=True)
class Config:
    """Top-level config mirroring reference ``config.py:10-121``."""

    name: str = "Config"
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)

    # training loop (reference config.py:20-23, 57-58, 78-79)
    epochs: int = 100
    batch_size: int = 2
    # microbatches summed per optimizer update (lax.scan inside the
    # jitted step): large-effective-batch semantics at one
    # microbatch's activation memory (batch_size 4 OOMs on one chip —
    # benchmarks/RESULTS.md). 1 = off. TPU addition; the reference has
    # no accumulation.
    grad_accum: int = 1
    # exponential moving average of the parameters, updated inside the
    # jitted train step (ema = d*ema + (1-d)*params). When > 0,
    # validation / save-on-best / serving adoption all use the EMA
    # weights (nnU-Net/production practice — smooths SGDR's restart
    # noise). 0 = off. TPU addition; the reference has no EMA.
    ema_decay: float = 0.0
    early_stopping_patience: int = 20
    val_interval: int = 1
    seed: int = 42

    # paths (reference config.py:61-66)
    data_dir: str = "data"
    results_dir: str = "results"
    models_dir: str = "results/models"
    logs_dir: str = "logs"
    checkpoints_dir: str = "checkpoints"

    # experiment tracking (reference config.py:69-71)
    use_wandb: bool = False
    use_tensorboard: bool = True
    experiment_name: str = "brain_tumor_segmentation"

    # metric names tracked per epoch (reference config.py:82-89)
    tracked_metrics: Tuple[str, ...] = (
        "train_loss", "val_loss", "train_dice", "val_dice",
        "val_hausdorff", "learning_rate",
    )

    # ---- helpers (parity with reference classmethods config.py:91-121) ----

    def create_directories(self) -> None:
        for d in (self.data_dir, self.results_dir, self.models_dir,
                  self.logs_dir, self.checkpoints_dir):
            os.makedirs(d, exist_ok=True)

    def print_config(self) -> str:
        text = json.dumps(self.to_dict(), indent=2, default=str)
        print(text)
        return text

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        kw: Dict[str, Any] = {}
        sub = {
            "model": ModelConfig, "loss": LossConfig,
            "optimizer": OptimizerConfig, "augment": AugmentConfig,
            "data": DataConfig, "mesh": MeshConfig,
            "inference": InferenceConfig,
        }
        for k, v in d.items():
            if k in sub and isinstance(v, Mapping):
                v = dict(v)
                for fk, fv in v.items():
                    if isinstance(fv, list):
                        v[fk] = tuple(fv)
                kw[k] = sub[k](**v)
            elif isinstance(v, list):
                kw[k] = tuple(v)
            else:
                kw[k] = v
        return cls(**kw)


# ---------------------------------------------------------------------------
# Presets (reference config.py:123-172)
# ---------------------------------------------------------------------------

def FastTrainingConfig() -> Config:
    """64^3 / 20-epoch smoke preset (reference ``config.py:123-131``)."""
    base = Config()
    return base.replace(
        name="FastTrainingConfig",
        epochs=20,
        batch_size=4,
        data=dataclasses.replace(base.data, image_size=(64, 64, 64)),
        inference=dataclasses.replace(base.inference, roi_size=(64, 64, 64)),
    )


def HighQualityConfig() -> Config:
    """(192,192,128), features up to 1024 (reference ``config.py:133-146``)."""
    base = Config()
    return base.replace(
        name="HighQualityConfig",
        epochs=200,
        batch_size=1,
        data=dataclasses.replace(base.data, image_size=(192, 192, 128)),
        model=dataclasses.replace(
            base.model, features=(64, 128, 256, 512, 1024)),
    )


def LightweightConfig() -> Config:
    """96^3, features 16..256 (reference ``config.py:148-153``)."""
    base = Config()
    return base.replace(
        name="LightweightConfig",
        data=dataclasses.replace(base.data, image_size=(96, 96, 96)),
        model=dataclasses.replace(base.model, features=(16, 32, 64, 128, 256)),
        inference=dataclasses.replace(base.inference, roi_size=(96, 96, 96)),
    )


def ProductionConfig() -> Config:
    """Re-weighted losses for deployment (reference ``config.py:155-172``)."""
    base = Config()
    return base.replace(
        name="ProductionConfig",
        loss=dataclasses.replace(
            base.loss, dice_weight=0.6, ce_weight=0.2, focal_weight=0.2),
        early_stopping_patience=30,
    )


PRESETS = {
    "standard": Config,
    "fast": FastTrainingConfig,
    "high_quality": HighQualityConfig,
    "lightweight": LightweightConfig,
    "production": ProductionConfig,
}


def get_config(name: str = "standard") -> Config:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; choose from {sorted(PRESETS)}")


# ---------------------------------------------------------------------------
# BraTS constants (reference config.py:175-195)
# ---------------------------------------------------------------------------

BRATS_MODALITIES: Tuple[str, ...] = ("t1c", "t1n", "t2f", "t2w")

# Raw BraTS label convention (enhancing tumor is label 4 on disk).
BRATS_LABELS: Dict[int, str] = {
    0: "Background",
    1: "Necrotic Core",
    2: "Peritumoral Edema",
    4: "Enhancing Tumor",
}

# Training-time remap: label 4 -> 3 (reference training.py:136-138).
BRATS_LABEL_REMAP: Dict[int, int] = {0: 0, 1: 1, 2: 2, 4: 3}

# Class names after remap, index == class id (reference main.py:413-421).
CLASS_NAMES: Tuple[str, ...] = (
    "Background", "Necrotic Core", "Peritumoral Edema", "Enhancing Tumor",
)

# Composite evaluation regions (reference config.py:183-187).
BRATS_REGIONS: Dict[str, Tuple[int, ...]] = {
    "WT": (1, 2, 3),   # whole tumor
    "TC": (1, 3),      # tumor core
    "ET": (3,),        # enhancing tumor
}

# Display colors per class (reference config.py:190-195).
BRATS_COLORS: Dict[int, str] = {
    0: "#000000",
    1: "#e74c3c",
    2: "#f1c40f",
    3: "#3498db",
}
