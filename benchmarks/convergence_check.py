"""End-to-end learning check on real hardware: train the attention-gated
UNet on a small synthetic BraTS cohort and verify validation Dice
climbs well above chance (the reference's implied 'training works'
criterion — its own training path never ran, SURVEY.md caveat)."""

import argparse
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--size", type=int, nargs=3, default=(64, 64, 64))
    ap.add_argument("--features", type=int, nargs="+",
                    default=(16, 32, 64, 128))
    ap.add_argument("--no_deep_sup", action="store_true")
    ap.add_argument("--deep_full_res", action="store_true")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="parameter-EMA decay; validation scores the "
                         "EMA weights (Config.ema_decay)")
    ap.add_argument("--scheduler", choices=("constant",
                                            "cosine_warm_restarts"),
                    default="constant")
    ap.add_argument("--patch", type=int, nargs=3, default=None,
                    help="nnU-Net-style foreground-biased patch "
                         "sampling at native resolution")
    ap.add_argument("--val_interval", type=int, default=1)
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint dir to resume from (continues the "
                         "epoch counter and metrics history); after a "
                         "kill, prefer latest_<name> over best_<name> "
                         "if it is ahead")
    ap.add_argument("--save_latest_every", type=int, default=None,
                    help="ALSO checkpoint the current state to "
                         "latest_<name> every N epochs (save-on-best "
                         "alone loses the tail of a killed run); "
                         "--long defaults to 10")
    ap.add_argument("--data_dir", type=str, default=None,
                    help="persistent cohort dir; reused if it already "
                         "contains cases (skips the slow 1-CPU "
                         "synthetic-data regeneration on restarts)")
    ap.add_argument("--hausdorff_every", type=int, default=5)
    ap.add_argument("--experiment_name", type=str,
                    default="convergence_check",
                    help="save-on-best checkpoint name (results/models/"
                         "best_<name>); override for side experiments "
                         "so they cannot clobber the main run's resume "
                         "checkpoint")
    ap.add_argument("--size_range", type=int, nargs=2, default=None,
                    help="tumor-radius draw (lo, hi) for the generated "
                         "cohort; the --long preset defaults to "
                         "(14, 22) so the enhancing core (0.3*size) is "
                         "above the dice learnability floor at the "
                         "96^3 grid (r3: default 6-10 left ET at 27-81 "
                         "voxels/case and dice 0.014)")
    ap.add_argument("--long", action="store_true",
                    help="quality-demonstration preset (VERDICT r3 "
                         "item 4): 32-case native-res cohort, flagship "
                         "features, SGDR + EMA, 300 epochs — targets "
                         "val dice >= 0.85 vs the reference's claimed "
                         "0.892 (templates/metrics.html:20)")
    args = ap.parse_args()
    if args.long:
        args.samples = max(args.samples, 32)
        args.size = (96, 96, 64)
        args.features = (32, 64, 128, 256, 512)
        args.scheduler = "cosine_warm_restarts"
        args.ema = args.ema or 0.999
        if args.epochs == 120:
            args.epochs = 300
        if args.size_range is None:
            args.size_range = (14, 22)
        if args.save_latest_every is None:
            args.save_latest_every = 10

    import dataclasses
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        create_brats_data_loaders, create_enhanced_synthetic_data)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
        ModernBrainTumorTrainer)

    size = tuple(args.size)
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model,
                                  features=tuple(args.features)),
        data=dataclasses.replace(cfg.data, image_size=size),
        # constant LR default: per-epoch SGDR restarts degenerate on
        # tiny synthetic cohorts (few steps/epoch); --long uses SGDR
        optimizer=dataclasses.replace(cfg.optimizer,
                                      scheduler=args.scheduler),
        # a tiny-cohort learning check needs its full step budget
        early_stopping_patience=10_000, val_interval=args.val_interval,
        use_tensorboard=False, batch_size=2, ema_decay=args.ema)
    if args.no_deep_sup:
        cfg = cfg.replace(loss=dataclasses.replace(
            cfg.loss, use_deep_supervision=False))

    import os
    data_dir = args.data_dir or tempfile.mkdtemp(prefix="convergence_")
    # count CASE dirs (one level below the train/val splits) — the
    # top-level entries are the two split dirs themselves
    have = (os.path.isdir(data_dir)
            and sum(1 for s in os.scandir(data_dir) if s.is_dir()
                    for e in os.scandir(s.path) if e.is_dir()))
    if have and args.data_dir:
        print(f"reusing {have}-case cohort in {data_dir}")
    else:
        create_enhanced_synthetic_data(
            args.samples, data_dir, shape=(96, 96, 64), seed=7,
            size_range=(tuple(args.size_range)
                        if args.size_range else None))
    train_loader, val_loader = create_brats_data_loaders(
        data_dir, batch_size=2, num_workers=2, image_size=size,
        aug_cfg=cfg.augment,
        patch_size=tuple(args.patch) if args.patch else None)
    model = UNet3D(out_channels=4, features=tuple(args.features),
                   dtype=jnp.bfloat16,
                   deep_sup_full_res=args.deep_full_res)
    trainer = ModernBrainTumorTrainer(
        model, learning_rate=1e-3, config=cfg,
        experiment_name=args.experiment_name,
        hausdorff_every=args.hausdorff_every,
        save_latest_every=args.save_latest_every or 0)
    if args.resume:
        trainer.load_checkpoint(args.resume)
    t0 = time.time()
    hist = trainer.train(train_loader, val_loader, args.epochs)
    dt = time.time() - t0
    first, best = hist["val_dice"][0], max(hist["val_dice"])
    print(f"epochs={len(hist['val_dice'])}  first val dice {first:.4f}"
          f"  best val {best:.4f}  best train "
          f"{max(hist['train_dice']):.4f}  wall {dt:.0f}s")
    assert best > 0.3, f"model failed to learn (best dice {best:.3f})"
    assert best > first + 0.1, "no meaningful improvement"
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
