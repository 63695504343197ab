"""Host data-pipeline benchmark (VERDICT round-2 item 7).

Measures end-to-end loader throughput on full-res .nii.gz BraTS-layout
cases: epoch 1 (cold — gz inflate + normalize dominate) and epoch 2
(normalized-tensor host cache — pays only H2D [+ patch sampling]).
The decode fan-out parallelizes per-modality gz inflate across the
worker pool (data/dataset.py), which is the round-1 serial tail.

Usage:
    python benchmarks/loader_bench.py [--cases 8] [--patch 128 128 128]
"""

import argparse
import shutil
import sys
import tempfile
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def consume(loader, label, n_vols):
    t0 = time.time()
    nb = 0
    last = None
    for batch in loader:
        last = batch["image"]
        nb += 1
    last.block_until_ready()
    dt = time.time() - t0
    print(f"{label}: {nb} batches / {n_vols} vols in {dt:.2f}s "
          f"= {n_vols / dt:.2f} vol/s", flush=True)
    return n_vols / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--patch", type=int, nargs=3, default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    pkg = "segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu"
    from importlib import import_module
    synth = import_module(pkg + ".data.synthetic")
    pipeline = import_module(pkg + ".data.pipeline")

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    try:
        t0 = time.time()
        synth.create_enhanced_synthetic_data(
            num_samples=args.cases, save_dir=tmp, fmt="nii.gz", seed=0)
        print(f"generated {args.cases} full-res gz cases in "
              f"{time.time() - t0:.1f}s", flush=True)

        train, _ = pipeline.create_brats_data_loaders(
            tmp, batch_size=args.batch, num_workers=args.workers,
            patch_size=tuple(args.patch) if args.patch else None)
        n_train = len(train.dataset)
        cold = consume(train, "epoch 1 (cold: gz decode + normalize)",
                       n_train)
        # epoch 2 still pays one-time augment compiles for any batch
        # shape not seen in epoch 1 (ragged last batch); exclude them
        consume(train, "epoch 2 (compile warm-up)", n_train)
        warm = consume(train, "epoch 3 (host cache: H2D + augment)",
                       n_train)
        print(f"summary: cold {cold:.2f} vol/s, warm {warm:.2f} vol/s")
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
