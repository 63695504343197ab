"""Training CLI — parity with ``train_model.py`` flags
(reference ``train_model.py:121-133``) plus TPU extensions.

Usage::

    python -m segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.cli \
        --create_synthetic --num_samples 20 --epochs 5

Also exposed as ``train_main(argv)`` for the interactive menu and tests.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import Optional, Sequence

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train 3D brain tumor segmentation (TPU-native)")
    # reference flags (train_model.py:121-133)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches summed per optimizer update "
                        "(batch_size must divide evenly); large-batch "
                        "semantics at one microbatch's memory")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="parameter EMA decay (e.g. 0.999); validation, "
                        "save-on-best and serving use the EMA weights. "
                        "0 = off")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--data_dir", type=str, default="data/synthetic/BraTS2024")
    p.add_argument("--create_synthetic", action="store_true")
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--save_latest_every", type=int, default=0,
                   help="ALSO checkpoint the current state to "
                        "latest_<experiment> every N epochs; "
                        "save-on-best alone loses every epoch after "
                        "the last val improvement when a run is killed")
    p.add_argument("--num_workers", type=int, default=4)
    # TPU extensions
    p.add_argument("--preset", type=str, default="standard",
                   choices=["standard", "fast", "high_quality",
                            "lightweight", "production"])
    p.add_argument("--image_size", type=int, nargs=3, default=None)
    p.add_argument("--patch_size", type=int, nargs=3, default=None,
                   help="train on native-resolution foreground-biased "
                        "patches (nnU-Net practice) instead of "
                        "whole-volume resize")
    p.add_argument("--fg_patch_prob", type=float, default=0.5)
    p.add_argument("--features", type=int, nargs="+", default=None,
                   help="encoder channel progression, e.g. 32 64 128")
    p.add_argument("--synthetic_shape", type=int, nargs=3, default=None,
                   help="native shape of generated synthetic volumes")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel mesh axis size (1 = single device)")
    p.add_argument("--mesh_space", type=int, default=1)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p


def train_main(argv: Optional[Sequence[str]] = None):
    """Programmatic entry (parity with ``train_model.main``)."""
    from ..environment import ensure_compilation_cache
    ensure_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..config import get_config
    from ..data.pipeline import create_brats_data_loaders
    from ..data.synthetic import create_enhanced_synthetic_data
    from ..models import UNet3D
    from ..parallel.mesh import create_mesh
    from .trainer import ModernBrainTumorTrainer

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    cfg = get_config(args.preset)
    cfg = cfg.replace(epochs=args.epochs, batch_size=args.batch_size,
                      grad_accum=args.grad_accum,
                      ema_decay=args.ema_decay,
                      use_wandb=args.use_wandb)
    if args.image_size:
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data,
                                     image_size=tuple(args.image_size)))
    model_kw = {}
    if args.no_remat or args.dtype == "float32":
        model_kw.update(remat=not args.no_remat,
                        compute_dtype=args.dtype)
    if args.features:
        model_kw.update(features=tuple(args.features))
    if model_kw:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, **model_kw))
    cfg.create_directories()

    if args.create_synthetic:
        shape = tuple(args.synthetic_shape) if args.synthetic_shape else (
            240, 240, 155)
        logger.info("generating %d synthetic samples at %s",
                    args.num_samples, shape)
        create_enhanced_synthetic_data(args.num_samples, args.data_dir,
                                       shape=shape)

    mesh = None
    if args.mesh_data * args.mesh_space > 1:
        mesh = create_mesh(args.mesh_data, args.mesh_space)
        logger.info("mesh: %s", mesh)

    sharding = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding
        sharding = batch_sharding(mesh)

    train_loader, val_loader = create_brats_data_loaders(
        args.data_dir, batch_size=args.batch_size,
        num_workers=args.num_workers, image_size=cfg.data.image_size,
        seed=cfg.seed, sharding=sharding, aug_cfg=cfg.augment,
        patch_size=tuple(args.patch_size) if args.patch_size else None,
        fg_patch_prob=args.fg_patch_prob)
    if len(train_loader.dataset) == 0:
        logger.warning("no training data found in %s — generating "
                       "synthetic fallback (reference train_model.py:162)",
                       args.data_dir)
        fb_shape = (tuple(args.synthetic_shape)
                    if args.synthetic_shape else (240, 240, 155))
        create_enhanced_synthetic_data(max(args.num_samples, 10),
                                       args.data_dir, shape=fb_shape)
        train_loader, val_loader = create_brats_data_loaders(
            args.data_dir, batch_size=args.batch_size,
            num_workers=args.num_workers, image_size=cfg.data.image_size,
            seed=cfg.seed, sharding=sharding, aug_cfg=cfg.augment,
            patch_size=tuple(args.patch_size) if args.patch_size else None,
            fg_patch_prob=args.fg_patch_prob)

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else (
        jnp.float32)
    model = UNet3D(out_channels=cfg.model.out_channels,
                   features=cfg.model.features,
                   dropout_rate=cfg.model.dropout_rate,
                   dtype=dtype, remat=cfg.model.remat,
                   s2d_train=cfg.model.s2d_train,
                   s2d_eval=cfg.model.s2d_eval,
                   deep_sup_full_res=cfg.loss.deep_supervision_full_res)

    trainer = ModernBrainTumorTrainer(
        model, learning_rate=args.lr,
        experiment_name=args.experiment_name, config=cfg, mesh=mesh,
        save_latest_every=args.save_latest_every)
    if args.resume:
        trainer.load_checkpoint(args.resume)

    history = trainer.train(train_loader, val_loader, args.epochs)
    logger.info("done; best val dice %.4f", trainer.best_dice)
    return trainer, history


main = train_main

if __name__ == "__main__":
    train_main()
