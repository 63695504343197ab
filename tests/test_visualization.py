"""Visualization library coverage: every ModernMedicalVisualizer method
produces its artifact (data-URI PNG or standalone HTML)."""

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.visualization import (
    ModernMedicalVisualizer, create_dice_analysis,
    create_modern_colormap, create_training_dashboard,
    plot_slice_comparison)


@pytest.fixture(scope="module")
def viz():
    return ModernMedicalVisualizer()


@pytest.fixture(scope="module")
def volume_seg():
    rng = np.random.default_rng(0)
    vol = rng.normal(0.5, 0.2, (24, 24, 16)).astype(np.float32)
    seg = np.zeros((24, 24, 16), np.uint8)
    seg[6:18, 6:18, 4:12] = 2
    seg[9:15, 9:15, 6:10] = 1
    seg[11:13, 11:13, 7:9] = 3
    return vol, seg


def test_multimodal(viz, volume_seg, tmp_path):
    vol, _ = volume_seg
    out = viz.create_multimodal_visualization(
        {"t1c": vol, "t2w": vol * 0.5}, str(tmp_path / "mm.png"))
    assert out.startswith("data:image/png;base64,")
    assert (tmp_path / "mm.png").exists()


def test_overlay(viz, volume_seg):
    vol, seg = volume_seg
    assert viz.create_segmentation_overlay(vol, seg).startswith(
        "data:image/png;base64,")


def test_3d_reconstruction(viz, volume_seg, tmp_path):
    _, seg = volume_seg
    html = viz.create_3d_tumor_reconstruction(
        seg, str(tmp_path / "m.html"), min_voxels=1)
    assert "mesh3d" in html and "plotly" in html.lower()
    assert (tmp_path / "m.html").exists()
    # empty segmentation still yields valid HTML
    assert "<html" in viz.create_3d_tumor_reconstruction(
        np.zeros((8, 8, 8), np.uint8))


def test_volume_dashboard(viz, volume_seg):
    vol, seg = volume_seg
    assert viz.create_volume_analysis_dashboard(vol, seg).startswith(
        "data:image/png;base64,")


def test_training_dashboards(tmp_path):
    hist = {"train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
            "train_dice": [0.1, 0.3], "val_dice": [0.1, 0.25],
            "val_hausdorff": [9.0, 5.0], "learning_rates": [1e-4, 9e-5]}
    out = create_training_dashboard(hist, str(tmp_path / "d.png"))
    assert out.startswith("data:image/png;base64,")
    assert create_dice_analysis(hist).startswith("data:image")
    # interactive plotly twin (reference training.py:416-466): valid
    # standalone HTML with the embedded figure JSON
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.visualization import (
        create_training_dashboard_html)
    html = create_training_dashboard_html(hist, str(tmp_path / "d.html"))
    assert html.startswith("<!DOCTYPE html") and "Plotly.newPlot" in html
    assert (tmp_path / "d.html").exists()
    import json as _json
    payload = html.split("var f = ", 1)[1].split(";\n", 1)[0]
    fig = _json.loads(payload.split("; Plotly")[0])
    names = {t["name"] for t in fig["data"]}
    assert {"train loss", "val dice", "lr", "val HD95 (mm)"} <= names
    assert fig["layout"]["yaxis3"]["type"] == "log"


def test_trainer_report_emits_png_and_html(tmp_path):
    """generate_training_report writes BOTH dashboard artifacts
    (VERDICT r2 item 9)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu as bt
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
        models)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.trainer import (
        ModernBrainTumorTrainer)
    cfg = bt.config.Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(4, 8),
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(8, 8, 8)),
        results_dir=str(tmp_path))
    model = models.UNet3D(out_channels=4, features=(4, 8),
                          dtype=jnp.float32)
    tr = ModernBrainTumorTrainer(model, config=cfg,
                                 experiment_name="viz_e2e")
    tr.metrics_history.update({
        "train_loss": [1.0, 0.8], "val_loss": [1.1, 0.9],
        "train_dice": [0.1, 0.2], "val_dice": [0.1, 0.2],
        "val_hausdorff": [8.0, 6.0], "learning_rates": [1e-4, 9e-5]})
    path = tr.generate_training_report()
    assert path and (tmp_path / "reports").exists()
    import os
    files = os.listdir(tmp_path / "reports")
    assert "viz_e2e_dashboard.png" in files
    assert "viz_e2e_dashboard.html" in files


def test_heatmap_and_save(viz, tmp_path):
    cm = np.asarray([[5, 1], [0, 7]])
    out = viz.create_performance_heatmap(cm)
    p = viz.save_visualization(out, str(tmp_path / "h.png"))
    import os
    assert os.path.getsize(p) > 100
    # reference multi-panel form (utils/visualization.py:366-380):
    # list of per-class matrices + titles
    out2 = viz.create_performance_heatmap(
        [cm, cm.T], class_names=["Edema", "Enhancing"])
    assert out2.startswith("data:image/png;base64,")
    p2 = viz.save_visualization("<html></html>", str(tmp_path / "x.html"))
    assert open(p2).read() == "<html></html>"


def test_medical_report(viz, tmp_path):
    html = viz.generate_medical_report(
        {"classification": "Benign", "risk_level": "Low",
         "measurements": {"volume": "12 mm³"},
         "images": ["data:image/png;base64,AAAA"]},
        str(tmp_path / "r.html"))
    assert "Brain Tumor Analysis Report" in html
    assert "12 mm³" in html


def test_module_utils(volume_seg):
    vol, _ = volume_seg
    cmap = create_modern_colormap()
    assert cmap.N == 4
    assert plot_slice_comparison(vol, vol * 2).startswith(
        "data:image/png;base64,")
