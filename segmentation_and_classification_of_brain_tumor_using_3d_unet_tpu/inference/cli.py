"""Batch prediction CLI: NIfTI/npy volumes in, label maps + clinical
reports out.

The reference exposes inference only through the Flask ``/upload``
route (``main.py:829-910``); production cohorts need a headless path.
This CLI drives the same stack serving uses — ``Predictor`` modes
(cropped / sliding_window / whole_volume), trained-checkpoint adoption
(``train.checkpoints.adopt_trained_weights``), and the deterministic
clinical report (``serve/reports.py``) — over a file, a case
directory, or a cohort of case directories.

Usage:
    python -m segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.cli \
        --input data/cohort --output results/predictions --report

Cases with a ground-truth ``*seg*`` file get REAL quality metrics
(Dice/IoU/HD95 vs GT) in their report; without one the report carries
the honest ``quality_estimated`` flag, exactly like serving.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

from ._files import VOLUME_EXTS as _VOLUME_EXTS
from ._files import is_volume as _is_volume
from ._files import volume_stem as _volume_stem


def _case_from_dir(pdir: Path, modalities: Sequence[str]) -> Optional[Dict]:
    """One case from a directory of per-modality files (BraTS layout,
    ``data/dataset.py:_scan`` but with seg optional and partial
    modality sets allowed)."""
    files = [f for f in sorted(pdir.iterdir()) if _is_volume(f)]
    if not files:
        return None
    images: List[str] = []
    for m in modalities:
        match = [f for f in files if m in f.name and "seg" not in f.name]
        if match:
            images.append(str(match[0]))
    if not images:  # no modality tokens: every non-seg file is a channel
        images = [str(f) for f in files if "seg" not in f.name]
    if not images:
        return None
    seg = [f for f in files if "seg" in f.name]
    return {"case_id": pdir.name, "images": images,
            "seg": str(seg[0]) if seg else None}


def discover_cases(input_path: str,
                   modalities: Sequence[str]) -> List[Dict]:
    """File -> one single-channel case. Directory of volumes -> one
    case per file (or one stacked case if names carry modality tokens).
    Directory of directories -> one case per subdir."""
    root = Path(input_path)
    if root.is_file():
        if not _is_volume(root):
            raise SystemExit(f"unsupported input: {root}")
        return [{"case_id": _volume_stem(root),
                 "images": [str(root)], "seg": None}]
    if not root.is_dir():
        raise SystemExit(f"input not found: {input_path}")

    subdirs = [d for d in sorted(root.iterdir()) if d.is_dir()]
    cases = [c for c in (_case_from_dir(d, modalities) for d in subdirs)
             if c]
    if cases:
        return cases
    # flat directory of modality-token files: group by the prefix
    # before "_<modality>" — several cases can share one directory
    # (previously only the alphabetically-first case survived)
    files = [f for f in sorted(root.iterdir()) if _is_volume(f)]
    groups: Dict[str, List[tuple]] = {}
    for f in files:
        if "seg" in f.name:
            continue
        for mi, m in enumerate(modalities):
            idx = f.name.find(f"_{m}")
            if idx > 0:
                groups.setdefault(f.name[:idx], []).append((mi, f))
                break
    if len(groups) > 1:
        out = []
        for cid in sorted(groups):
            # cid + "_" so case_1 never claims case_10's seg file
            seg = [f for f in files
                   if "seg" in f.name and f.name.startswith(cid + "_")]
            # order channels by the modalities sequence (matching
            # _case_from_dir), not by filename sort
            imgs = [str(f) for _, f in sorted(groups[cid])]
            out.append({"case_id": cid,
                        "images": imgs,
                        "seg": str(seg[0]) if seg else None})
        return out
    own = _case_from_dir(root, modalities)
    if own and any(m in Path(f).name for f in own["images"]
                   for m in modalities):
        return [own]        # the dir IS one multi-modal case
    return [{"case_id": _volume_stem(f), "images": [f],
             "seg": None}
            for f in (own or {"images": []})["images"]]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Segment brain MRI volumes (TPU-native, headless)")
    p.add_argument("--input", required=True,
                   help="volume file, case directory, or cohort root")
    p.add_argument("--output", default="results/predictions")
    p.add_argument("--mode", default="cropped",
                   choices=["cropped", "sliding_window", "whole_volume"],
                   help="cropped = foreground crop + Gaussian sliding "
                        "window (serving default); whole_volume = the "
                        "reference's destructive-resize semantics")
    p.add_argument("--checkpoint", default="",
                   help="trained checkpoint to adopt ('none' disables "
                        "auto-discovery)")
    p.add_argument("--models_dir", default="results/models",
                   help="auto-adopt the newest compatible best_* here "
                        "when --checkpoint is not given")
    p.add_argument("--report", action="store_true",
                   help="write <case>_report.json (volume/shape metrics,"
                        " classification, clinical findings; real "
                        "quality metrics when a *seg* GT file exists)")
    p.add_argument("--save_confidence", action="store_true",
                   help="also write <case>_conf.* per-voxel max-softmax "
                        "confidence maps (float32)")
    p.add_argument("--tta", action="store_true",
                   help="mirror test-time augmentation: average "
                        "probabilities over the 8 D/H/W flips (~8x "
                        "cost, better Dice)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard cases over all devices on a data mesh "
                        "(whole_volume mode; same-shape cases batch "
                        "together)")
    p.add_argument("--batch_per_chip", type=int, default=1,
                   help="volumes per device per wave in --data_parallel")
    p.add_argument("--window_parallel", action="store_true",
                   help="split each volume's sliding-window grid over "
                        "all devices (cropped/sliding_window modes; "
                        "single-volume latency scales with chips)")
    p.add_argument("--brats_labels", action="store_true",
                   help="write masks in the raw BraTS convention "
                        "(enhancing tumor = label 4, as on disk in "
                        "BraTS datasets) instead of the model's "
                        "contiguous 0..3 labels — output is directly "
                        "comparable with BraTS tooling and the "
                        "datasets' own seg files")
    p.add_argument("--format", default="nii.gz",
                   choices=["nii.gz", "nii", "npy"])
    p.add_argument("--preset", default="standard",
                   choices=["standard", "fast", "high_quality",
                            "lightweight", "production"])
    p.add_argument("--image_size", type=int, nargs=3, default=None)
    p.add_argument("--features", type=int, nargs="+", default=None)
    p.add_argument("--roi_size", type=int, nargs=3, default=None,
                   help="sliding-window tile size")
    return p


def predict_main(argv: Optional[Sequence[str]] = None) -> List[Dict]:
    """Programmatic entry; returns the per-case summary list."""
    from ..environment import ensure_compilation_cache
    ensure_compilation_cache()
    import jax.numpy as jnp

    from ..config import BRATS_MODALITIES, get_config
    from ..data import nifti
    from ..data.dataset import load_any_volume
    from ..data.preprocess import preprocess_multimodal
    from ..serve.reports import (calculate_medical_metrics,
                                 generate_clinical_report)
    from ..train.checkpoints import adopt_trained_weights
    from .predictor import Predictor

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    cfg = get_config(args.preset)
    mkw = {}
    if args.features:
        mkw["features"] = tuple(args.features)
    if mkw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **mkw))
    if args.image_size:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, image_size=tuple(args.image_size)))
    if args.roi_size:
        cfg = cfg.replace(inference=dataclasses.replace(
            cfg.inference, roi_size=tuple(args.roi_size)))

    cases = discover_cases(args.input, BRATS_MODALITIES)
    if not cases:
        raise SystemExit(f"no volumes found under {args.input}")
    logger.info("%d case(s) from %s", len(cases), args.input)

    predictor = Predictor(cfg)
    adopted = adopt_trained_weights(predictor, args.checkpoint,
                                    args.models_dir, logger)
    os.makedirs(args.output, exist_ok=True)

    def _load(case):
        vols = [load_any_volume(p) for p in case["images"]]
        raw = np.stack(vols, axis=-1)               # (D,H,W,M)
        # native-resolution normalization (whole_volume resizes inside
        # the predictor; cropped/sliding_window segment at native res)
        norm = np.asarray(preprocess_multimodal(jnp.asarray(raw),
                                                out_size=None))
        return raw, norm

    if args.window_parallel:
        if args.mode == "whole_volume":
            raise SystemExit("--window_parallel distributes sliding "
                             "windows; whole_volume has none (use "
                             "--data_parallel there)")
        if args.data_parallel:
            raise SystemExit("--window_parallel and --data_parallel "
                             "are different axes; pick one")
        from ..parallel import create_mesh
        wp_mesh = create_mesh()     # every device on the data axis
        logger.info("window-parallel over %d device(s)",
                    wp_mesh.devices.size)
        predictor.enable_window_parallel(wp_mesh)

    loaded: Dict[str, tuple] = {}
    dp_results: Dict[str, tuple] = {}
    if args.data_parallel:
        # whole cohort resident on host; fine for cohort batch jobs,
        # use the sequential path for arbitrarily large runs
        if args.mode != "whole_volume":
            raise SystemExit("--data_parallel batches the single-"
                             "forward whole_volume mode; cropped/"
                             "sliding_window are per-volume "
                             "(drop --data_parallel)")
        if args.tta:
            raise SystemExit("--tta is per-volume; drop "
                             "--data_parallel to combine")
        from ..parallel import create_mesh
        from ..parallel.infer import segment_cohort_whole
        mesh = create_mesh()        # every device on the data axis
        logger.info("data-parallel over %d device(s)",
                    mesh.devices.size)
        groups: Dict[tuple, List] = {}
        for case in cases:
            loaded[case["case_id"]] = _load(case)
            canon = predictor._canon(loaded[case["case_id"]][1])
            groups.setdefault(canon.shape, []).append(
                (case["case_id"], canon))
        t_dp = time.time()
        for shape, members in groups.items():
            labs, confs = segment_cohort_whole(
                predictor.seg_model, predictor.seg_variables, mesh,
                np.stack([c for _, c in members]),
                cfg.data.image_size,
                batch_per_chip=args.batch_per_chip)
            for (cid, _), lab, conf in zip(members, labs, confs):
                dp_results[cid] = (lab, conf)
        # amortize the batched segmentation into per-case seconds
        dp_seconds = (time.time() - t_dp) / max(len(cases), 1)

    summaries: List[Dict] = []
    for case in cases:
        t0 = time.time()
        raw, norm = loaded.get(case["case_id"]) or _load(case)
        if case["case_id"] in dp_results:
            labels, conf = dp_results[case["case_id"]]
        else:
            labels, conf = predictor.segment_with_confidence(
                norm, mode=args.mode, tta=args.tta)
        base = os.path.join(args.output, case["case_id"])
        mask_path = f"{base}_seg.{args.format}"
        # --brats_labels: undo the training-time 4 -> 3 remap
        # (BRATS_LABEL_REMAP) in the WRITTEN mask only — enhancing
        # tumor back to its on-disk label 4 for BraTS tooling; reports
        # and metrics below keep the model's contiguous labels
        out_labels = (np.where(labels == 3, 4, labels)
                      if args.brats_labels else labels)
        # carry the scan's voxel->world affine into the outputs so the
        # mask registers over the original in viewers (header-only
        # read; .npy inputs have no affine -> identity)
        affine = None
        try:
            affine = nifti.load_affine(case["images"][0])
        except Exception:
            pass
        if args.format == "npy":
            np.save(mask_path, out_labels)
        else:
            nifti.save(mask_path, out_labels.astype(np.uint8),
                       affine=affine)
        secs = time.time() - t0
        if case["case_id"] in dp_results:
            secs += dp_seconds
        summary = {"case_id": case["case_id"], "mask": mask_path,
                   "tumor_voxels": int((labels > 0).sum()),
                   "shape": list(labels.shape),
                   "seconds": round(secs, 3)}
        if args.save_confidence:
            conf_path = f"{base}_conf.{args.format}"
            if args.format == "npy":
                np.save(conf_path, conf)
            else:
                nifti.save(conf_path, conf.astype(np.float32),
                           affine=affine)
            summary["confidence"] = conf_path

        if args.report:
            gt = None
            if case["seg"]:
                gt = load_any_volume(case["seg"]).astype(np.int32)
            # real voxel geometry from the scan's affine (per-axis
            # column norms for areas, |det| for volumes — exact under
            # shear); the reference assumes 1 mm isotropic everywhere
            # (main.py:473), which holds for BraTS but not general
            # scans — identity/absent affine degrades to exactly that
            metrics = calculate_medical_metrics(
                raw[..., 0], labels, ground_truth=gt,
                confidence_map=conf,
                spacing_mm=nifti.affine_spacing(affine),
                voxel_volume_mm3=nifti.affine_voxel_volume(affine))
            tumor_type, cls_conf = predictor.classify_tumor(
                norm, segmentation=labels)
            grade = predictor.classify_grade(norm)
            report = generate_clinical_report(
                metrics, filename=case["case_id"],
                classifier_confidence=cls_conf,
                model_grade=grade[0] if grade else None,
                grade_confidence=grade[1] if grade else None)
            report["tumor_type"] = tumor_type
            report["weights"] = adopted or "random_init"
            report_path = f"{base}_report.json"
            with open(report_path, "w") as f:
                json.dump(report, f, indent=1, default=float)
            summary["report"] = report_path
            summary["diagnosis"] = (
                report["classification"]["primary_diagnosis"])
        summaries.append(summary)
        logger.info("%s: %d tumor voxels in %.2fs", case["case_id"],
                    summary["tumor_voxels"], summary["seconds"])

    index = {"weights": adopted or "random_init", "mode": args.mode,
             "cases": summaries}
    if args.data_parallel:
        index["data_parallel_devices"] = int(mesh.devices.size)
    if args.window_parallel:
        index["window_parallel_devices"] = int(wp_mesh.devices.size)
    with open(os.path.join(args.output, "predictions.json"), "w") as f:
        json.dump(index, f, indent=1, default=float)
    return summaries


def main() -> None:
    predict_main()


if __name__ == "__main__":
    main()
