"""Joint segmentation + grade-classification model (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    config as cfg_mod, models)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
    create_train_state)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.loop import (
    make_joint_train_step)

FEATS = (8, 16)
IMG = (16, 16, 16)


def tiny_config():
    import dataclasses
    c = cfg_mod.Config()
    return c.replace(
        model=dataclasses.replace(c.model, features=FEATS,
                                  compute_dtype="float32", remat=False),
        use_tensorboard=False)


def test_joint_forward_contract():
    m = models.UNet3DWithClassifier(features=FEATS, dtype=jnp.float32)
    x = jnp.ones((2, *IMG, 4), jnp.float32)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out["logits"].shape == (2, *IMG, 4)
    assert out["grade_logits"].shape == (2, 4)
    out_t, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(out_t["deep"]) == len(FEATS) - 1


def test_grade_from_volume():
    g = models.grade_from_volume(jnp.asarray([0, 10, 200, 2000]),
                                 jnp.asarray(16 ** 3))
    assert list(np.asarray(g)) == [0, 1, 2, 3]


def test_joint_train_step_learns(rng):
    cfg = tiny_config()
    m = models.UNet3DWithClassifier(features=FEATS, dtype=jnp.float32)
    state = create_train_state(m, cfg, jax.random.PRNGKey(0),
                               (1, *IMG, 4), steps_per_epoch=1,
                               learning_rate=1e-3)
    seg = np.zeros((2, *IMG), np.int32)
    seg[:, 4:10, 4:10, 4:10] = 2
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(2, *IMG, 4)).astype(np.float32)),
        "mask": jnp.asarray(seg),
    }
    step = make_joint_train_step(cfg, donate=False)
    losses = []
    for i in range(5):
        state, metr = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metr["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert 0.0 <= float(metr["grade_acc"]) <= 1.0
    assert float(metr["grade_ce"]) >= 0.0


def test_joint_with_explicit_grades(rng):
    cfg = tiny_config()
    m = models.UNet3DWithClassifier(features=FEATS, dtype=jnp.float32)
    state = create_train_state(m, cfg, jax.random.PRNGKey(0),
                               (1, *IMG, 4))
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(2, *IMG, 4)).astype(np.float32)),
        "mask": jnp.zeros((2, *IMG), jnp.int32),
        "grade": jnp.asarray([0, 3], jnp.int32),
    }
    step = make_joint_train_step(cfg, donate=False)
    _, metr = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metr["loss"]))
