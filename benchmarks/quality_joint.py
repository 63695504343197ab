"""Grade-classification quality check (VERDICT r3 item 4, second half).

Trains the joint seg+grade model (``models/joint.py``, BASELINE config
4) on a synthetic BraTS cohort and reports held-out GRADE ACCURACY —
the reference paper claims 90% classification accuracy (BASELINE.md)
but its classifier is never trained (``main.py:102-328``, SURVEY §2).
Grade ground truth derives from tumor burden (``grade_from_volume``,
the same clinical volume ladder serving uses), so the net must
estimate tumor extent from raw images to classify.

Usage: python benchmarks/quality_joint.py [--epochs 60] [--samples 32]
"""

import argparse
import sys
import tempfile
import time

import os

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container sitecustomize pre-imports jax on the axon TPU
    # backend; the env var alone does not stick (CLAUDE.md) — re-assert
    # before any device query so CPU fallback runs work
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--size", type=int, nargs=3, default=(64, 64, 64))
    ap.add_argument("--features", type=int, nargs="+",
                    default=(16, 32, 64, 128))
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cls_weight", type=float, default=0.5)
    ap.add_argument("--save_ckpt", default="results/models/best_quality_joint",
                    help="save-on-best joint checkpoint (adoptable by "
                         "serve/predict via adopt_trained_weights); "
                         "'none' disables")
    args = ap.parse_args()

    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    pkg = "segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu"
    from importlib import import_module
    Config = import_module(pkg + ".config").Config
    data = import_module(pkg + ".data")
    joint = import_module(pkg + ".models.joint")
    loop = import_module(pkg + ".train.loop")
    state_mod = import_module(pkg + ".train.state")

    size = tuple(args.size)
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model,
                                  features=tuple(args.features)),
        data=dataclasses.replace(cfg.data, image_size=size),
        optimizer=dataclasses.replace(cfg.optimizer,
                                      scheduler="constant"),
        use_tensorboard=False, batch_size=2)

    # STRATIFIED cohort spanning the clinical grade ladder
    # (grade_from_volume thresholds 0.1/1/5%). The round-4 version drew
    # tumor presence stochastically (tumor_prob=0.8) over three bands;
    # the 6-case val split came out [1,1,0,0,0,3] — no grade 2, half
    # grade 0 — and train held only TWO grade-0 examples, so a head
    # collapsing to constant train-majority predictions scored EXACTLY
    # 0.000 on val for 15 epochs (the r4 stall; diagnosis journal:
    # benchmarks/r5_logs_cpu_qjoint_diag.log). Four deterministic
    # bands, one per grade, balance BOTH splits: the per-band 80/20
    # index split lands each band's tail in val. Radius bands are
    # chosen off the ladder boundaries (0.1/1/5% of the 96x96x64 grid
    # = r 5.2/11.2/19.2): 6-9 -> grade 1, 12-16 -> grade 2,
    # 21-25 -> grade 3.
    data_dir = tempfile.mkdtemp(prefix="quality_joint_")
    quarter = max(args.samples // 4, 1)
    bands = [(None, 0.0, 0), ((6, 10), 1.0, quarter),
             ((12, 17), 1.0, 2 * quarter), ((21, 26), 1.0, 3 * quarter)]
    for band, tumor_prob, start in bands:
        n = min(quarter, args.samples - start) if start < 3 * quarter \
            else args.samples - 3 * quarter
        if n <= 0:
            continue
        data.create_enhanced_synthetic_data(
            n, data_dir, shape=(96, 96, 64), seed=11 + start,
            size_range=band, tumor_prob=tumor_prob, start_index=start)
    train_loader, val_loader = data.create_brats_data_loaders(
        data_dir, batch_size=2, num_workers=2, image_size=size,
        aug_cfg=cfg.augment)

    # split-composition guard (the r4 stall was invisible for a whole
    # round because nobody printed this): fail fast on a degenerate val
    total_vox = int(np.prod(size))
    def split_hist(loader):
        gs = []
        for b in loader:
            m = np.asarray(b["mask"])
            g = joint.grade_from_volume(
                jnp.asarray((m > 0).sum(axis=(1, 2, 3))), total_vox)
            gs += np.asarray(g).tolist()
        return np.bincount(gs, minlength=4)
    tr_hist, va_hist = split_hist(train_loader), split_hist(val_loader)
    print(f"grade histogram  train {tr_hist.tolist()}  "
          f"val {va_hist.tolist()}", flush=True)
    if (va_hist == 0).any():
        print("WARNING: val split is missing a grade — accuracy on it "
              "cannot reach a fair ceiling", flush=True)

    model = joint.UNet3DWithClassifier(
        out_channels=4, features=tuple(args.features),
        dtype=jnp.bfloat16)
    state = state_mod.create_train_state(
        model, cfg, jax.random.PRNGKey(0), (1, *size, 4),
        steps_per_epoch=max(1, (args.samples * 4) // 10),
        learning_rate=args.lr)
    step = loop.make_joint_train_step(cfg, cls_weight=args.cls_weight,
                                      donate=True)

    @jax.jit
    def val_step(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["image"], train=False)
        tumor = jnp.sum((batch["mask"] > 0).astype(jnp.int32),
                        axis=(1, 2, 3))
        total = np.prod(size)
        gt = joint.grade_from_volume(tumor, total)
        pred = jnp.argmax(out["grade_logits"], -1)
        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.metrics import (
            mean_foreground_dice)
        return pred, gt, mean_foreground_dice(
            out["logits"], batch["mask"])

    t0 = time.time()
    best_acc, best_dice, accs = 0.0, 0.0, []
    best_score = -1.0
    confusion = np.zeros((4, 4), np.int64)
    key = jax.random.PRNGKey(1)
    ckpt_mod = (import_module(pkg + ".train.checkpoints")
                if args.save_ckpt != "none" else None)
    if ckpt_mod is not None:
        # collision guard (round-4 incident): never clobber a previous
        # run's best — archive it first
        ckpt_mod.archive_existing(args.save_ckpt)
    for epoch in range(args.epochs):
        tr_acc = []
        for batch in train_loader:
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
            tr_acc.append(m["grade_acc"])
        preds, gts, dices = [], [], []
        for batch in val_loader:
            p, g, d = val_step(state.params, state.batch_stats, batch)
            preds.append(np.asarray(p))
            gts.append(np.asarray(g))
            dices.append(float(d))
        if not preds:
            raise SystemExit("validation split is empty — use "
                             "--samples large enough for a val split "
                             "(the generator holds out ~20%)")
        preds, gts = np.concatenate(preds), np.concatenate(gts)
        acc = float((preds == gts).mean())
        vdice = float(np.mean(dices))
        if epoch >= args.epochs - 5:       # confusion over the last 5
            np.add.at(confusion, (gts, preds), 1)
        best_acc, best_dice = max(best_acc, acc), max(best_dice, vdice)
        accs.append(acc)
        score = acc + vdice          # joint selection: both heads matter
        if ckpt_mod is not None and score > best_score:
            best_score = score
            import os as _os
            _os.makedirs(args.save_ckpt, exist_ok=True)
            ckpt_mod.save_checkpoint(
                args.save_ckpt, state, best_dice=vdice, epoch=epoch,
                metrics_history={"val_grade_acc": accs,
                                 "val_dice": [vdice]})
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d}  train grade acc "
                  f"{float(np.mean([float(a) for a in tr_acc])):.3f}  "
                  f"VAL grade acc {acc:.3f}  val dice {vdice:.3f}",
                  flush=True)
    print(f"best val grade accuracy {best_acc:.3f} "
          f"(last5 {np.mean(accs[-5:]):.3f}) best val dice "
          f"{best_dice:.3f}  wall {time.time() - t0:.0f}s")
    print("held-out grade confusion (rows=GT 0-3, cols=pred, "
          "last-5-epoch sum):")
    for row in confusion:
        print("  " + " ".join(f"{int(c):4d}" for c in row))
    try:                                   # heatmap artifact (VERDICT)
        viz = import_module(pkg + ".utils.visualization")
        out_png = "benchmarks/r5_logs/quality_joint_confusion.png"
        import os
        os.makedirs("benchmarks/r5_logs", exist_ok=True)
        viz.ModernMedicalVisualizer().create_performance_heatmap(
            confusion,
            class_names=["grade 0", "grade 1", "grade 2", "grade 3"],
            save_path=out_png)
        print(f"confusion heatmap -> {out_png}")
    except Exception as e:                 # pragma: no cover
        print(f"confusion heatmap skipped: {e}")
    assert best_acc >= 0.5, "grade head failed to learn"
    print("QUALITY-JOINT OK")


if __name__ == "__main__":
    main()
