"""Public-API-surface parity audit (SURVEY.md §2.11).

Every symbol the reference exposes to its users must be importable here
with the same callable surface, so a reference user can switch without
hunting for renames. Citations point into /root/reference.
"""

import inspect

PKG = "segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu"


def _get(modpath, name):
    import importlib
    mod = importlib.import_module(f"{PKG}.{modpath}")
    assert hasattr(mod, name), f"{PKG}.{modpath}.{name} missing"
    return getattr(mod, name)


def test_training_module_surface():
    """reference training.py:29,174,517,536,554,568,576."""
    ds = _get("data.dataset", "BraTS2024Dataset")
    sig = inspect.signature(ds)
    for p in ("data_dir", "mode", "augment", "cache_size"):
        assert p in sig.parameters, f"BraTS2024Dataset missing {p}"

    trainer = _get("train.trainer", "ModernBrainTumorTrainer")
    for meth in ("train", "train_epoch", "validate_epoch",
                 "calculate_dice_score", "save_model"):
        assert callable(getattr(trainer, meth, None)), \
            f"ModernBrainTumorTrainer.{meth} missing"

    for cls in ("CombinedLoss", "DiceLoss", "FocalLoss"):
        assert callable(_get("losses", cls))
    assert callable(_get("data.preprocess", "create_data_transforms"))
    loaders = _get("data.pipeline", "create_brats_data_loaders")
    sig = inspect.signature(loaders)
    for p in ("data_dir", "batch_size", "num_workers"):
        assert p in sig.parameters


def test_losses_module_surface():
    """reference losses.py:7,77,99."""
    for cls in ("CombinedLoss3D", "TverskyLoss3D",
                "DeepSupervisionLoss3D"):
        assert callable(_get("losses", cls))


def test_data_loader_module_surface():
    """reference utils/data_loader.py:15,94,124."""
    assert callable(_get("data.dataset", "BrainTumorDataset"))
    assert callable(_get("data.synthetic", "create_synthetic_data"))
    assert callable(_get("data.pipeline", "get_data_loader"))


def test_metrics_module_surface():
    """reference utils/metrics.py:11,98."""
    sm = _get("metrics", "SegmentationMetrics")
    for meth in ("dice_coefficient", "iou_score", "sensitivity",
                 "specificity", "hausdorff_distance",
                 "compute_all_metrics"):
        assert callable(getattr(sm, meth, None)), \
            f"SegmentationMetrics.{meth} missing"
    lm = _get("metrics", "LossMetrics")
    assert lm is not None


def test_model_surface():
    """reference main.py:102,205,244,301."""
    for name in ("UNet3D", "DoubleConv3D", "AttentionGate3D"):
        assert callable(_get("models.unet3d", name))
    assert callable(_get("models.classifier", "BrainTumorClassifier"))
    # reference defaults (main.py:105): features [32..512], dropout 0.2
    u = _get("models", "UNet3D")
    fields = {f.name for f in u.__dataclass_fields__.values()} \
        if hasattr(u, "__dataclass_fields__") else set(dir(u))
    for f in ("features", "dropout_rate", "out_channels"):
        assert f in fields, f"UNet3D missing field {f}"


def test_config_surface():
    """reference config.py:10-195 — presets + BraTS constants."""
    get_config = _get("config", "get_config")
    for preset in ("standard", "fast", "high_quality", "lightweight",
                   "production"):
        cfg = get_config(preset)
        assert cfg.model.out_channels == 4
    for const in ("BRATS_MODALITIES", "BRATS_LABELS", "BRATS_REGIONS",
                  "BRATS_COLORS"):
        assert _get("config", const) is not None


def test_visualizer_surface():
    """reference utils/visualization.py:24-461 — all 9 methods."""
    viz = _get("utils.visualization", "ModernMedicalVisualizer")
    for meth in ("create_multimodal_visualization",
                 "create_segmentation_overlay",
                 "create_3d_tumor_reconstruction",
                 "create_volume_analysis_dashboard",
                 "create_training_dashboard",
                 "create_performance_heatmap",
                 "save_visualization",
                 "generate_medical_report"):
        assert callable(getattr(viz, meth, None)), \
            f"ModernMedicalVisualizer.{meth} missing"
    assert callable(_get("utils.visualization", "create_modern_colormap"))
    assert callable(_get("utils.visualization", "plot_slice_comparison"))


def test_web_training_surface():
    """reference web_training.py:146-158 module functions."""
    for fn in ("start_web_training", "stop_web_training",
               "get_web_training_progress"):
        assert callable(_get("serve.jobs", fn))


def test_data_utils_surface():
    """reference data_utils.py:11-177 — the 9-function orphan lib."""
    for fn in ("load_nifti_volume", "preprocess_volume",
               "augment_volume_3d", "create_2d_slices_from_3d",
               "get_2d_augmentations", "calculate_class_weights",
               "validate_data_integrity", "create_train_val_split",
               "get_dataset_statistics"):
        assert callable(_get("data.data_utils", fn))


def test_bootstrap_surface():
    """reference environment.py:13,60 / setup_project / validate /
    start_app entry points."""
    assert callable(_get("environment", "setup_environment"))
    assert callable(_get("environment", "validate_dependencies"))
