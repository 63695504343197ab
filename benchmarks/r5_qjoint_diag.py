"""Diagnose the r4 VAL-grade-acc-0.000 stall (VERDICT r5 item 2).

Replicates benchmarks/quality_joint.py's band-ladder cohort exactly,
then answers — WITHOUT hours of training — the questions nobody asked
in round 4:

1. What ARE the ground-truth grades of the train and val splits, as
   computed by the training ladder (grade_from_volume on the resized
   mask)?  A degenerate or boundary-straddling val split explains a
   pinned 0.000.
2. What does a short tiny-model training predict on val, per case?
   Collapsed constant predictions vs off-by-one-band errors are
   different bugs.

Run on CPU: python benchmarks/r5_qjoint_diag.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np              # noqa: E402
import jax.numpy as jnp         # noqa: E402

pkg = "segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu"
from importlib import import_module  # noqa: E402

data = import_module(pkg + ".data")
joint = import_module(pkg + ".models.joint")

SAMPLES = 32
SIZE = (32, 32, 32)     # grade ladder is a volume FRACTION: resolution-free
DATA_DIR = "/root/repo/.qjoint_diag_data"


def gen_cohort():
    # count CASES below the split dirs (the r4 guard bug counted the
    # split dirs themselves — VERDICT r4 weak #6)
    def case_count(d):
        n = 0
        for split in ("train", "val"):
            sd = os.path.join(d, split)
            if os.path.isdir(sd):
                n += sum(1 for e in os.scandir(sd) if e.is_dir())
        return n

    if case_count(DATA_DIR) >= SAMPLES:
        print(f"reusing {case_count(DATA_DIR)}-case cohort in {DATA_DIR}")
        return
    third = max(SAMPLES // 3, 1)
    bands = [(None, 0), ((11, 17), third), ((20, 26), 2 * third)]
    for band, start in bands:
        n = min(third, SAMPLES - start) if start < 2 * third \
            else SAMPLES - 2 * third
        if n <= 0:
            continue
        data.create_enhanced_synthetic_data(
            n, DATA_DIR, shape=(96, 96, 64), seed=11 + start,
            size_range=band, start_index=start)
    print(f"generated {case_count(DATA_DIR)}-case cohort in {DATA_DIR}")


if __name__ == "__main__":
    gen_cohort()

    import dataclasses
    Config = import_module(pkg + ".config").Config
    cfg = Config()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=SIZE),
        use_tensorboard=False, batch_size=2)

    train_loader, val_loader = data.create_brats_data_loaders(
        DATA_DIR, batch_size=2, num_workers=2, image_size=SIZE,
        aug_cfg=cfg.augment)

    total = int(np.prod(SIZE))

    def grades_of(loader, name):
        out = []
        for batch in loader:
            m = np.asarray(batch["mask"])
            frac = (m > 0).reshape(m.shape[0], -1).mean(axis=1)
            g = np.asarray(joint.grade_from_volume(
                jnp.asarray((m > 0).sum(axis=(1, 2, 3))), total))
            for f, gg in zip(frac, g):
                out.append((float(f), int(gg)))
        print(f"{name}: n={len(out)}")
        for f, g in out:
            print(f"  burden {f:8.5f}  grade {g}")
        hist = np.bincount([g for _, g in out], minlength=4)
        print(f"  histogram grade0..3: {hist.tolist()}")
        return out

    tr = grades_of(train_loader, "TRAIN split")
    va = grades_of(val_loader, "VAL split")

    # part 2: short tiny training, printing val preds per epoch
    loop = import_module(pkg + ".train.loop")
    state_mod = import_module(pkg + ".train.state")
    feats = (8, 16, 32, 64)
    cfg2 = cfg.replace(model=dataclasses.replace(cfg.model,
                                                 features=feats),
                       optimizer=dataclasses.replace(
                           cfg.optimizer, scheduler="constant"))
    model = joint.UNet3DWithClassifier(out_channels=4, features=feats,
                                       dtype=jnp.bfloat16)
    state = state_mod.create_train_state(
        model, cfg2, jax.random.PRNGKey(0), (1, *SIZE, 4),
        steps_per_epoch=13, learning_rate=1e-3)
    step = loop.make_joint_train_step(cfg2, cls_weight=0.5, donate=True)

    @jax.jit
    def val_step(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["image"], train=False)
        tumor = jnp.sum((batch["mask"] > 0).astype(jnp.int32),
                        axis=(1, 2, 3))
        gt = joint.grade_from_volume(tumor, total)
        return jnp.argmax(out["grade_logits"], -1), gt

    @jax.jit
    def val_step_trainmode(params, batch_stats, batch):
        # same forward but train-mode statistics: isolates an
        # eval-mode (batch_stats) collapse from a never-learned head
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.argmax(out["grade_logits"], -1)

    import time
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for epoch in range(24):
        tr_accs = []
        for batch in train_loader:
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
            tr_accs.append(float(m["grade_acc"]))
        preds, gts, preds_tm = [], [], []
        for batch in val_loader:
            p, g = val_step(state.params, state.batch_stats, batch)
            ptm = val_step_trainmode(state.params, state.batch_stats,
                                     batch)
            preds += np.asarray(p).tolist()
            gts += np.asarray(g).tolist()
            preds_tm += np.asarray(ptm).tolist()
        acc = float(np.mean(np.array(preds) == np.array(gts)))
        acc_tm = float(np.mean(np.array(preds_tm) == np.array(gts)))
        print(f"ep {epoch:2d} train_acc {np.mean(tr_accs):.3f} "
              f"val_acc {acc:.3f} val_acc(train-mode) {acc_tm:.3f} "
              f"preds {preds} gts {gts} "
              f"({time.time()-t0:.0f}s)", flush=True)
