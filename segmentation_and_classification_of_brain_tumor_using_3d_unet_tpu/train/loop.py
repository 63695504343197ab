"""jitted train / eval steps (single-device and mesh-sharded).

One XLA program per step: forward (bf16) + deep-supervision combined loss
+ backward + AdamW update + on-device Dice. Replaces the reference's
autocast/GradScaler loop body (``training.py:286-315``). With a mesh, the
same step is compiled with batch-sharded inputs and replicated params —
XLA turns the gradient reduction into a psum over ICI (SPMD data
parallelism, BASELINE.json config 5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import Config
from ..losses import combined_loss, deep_supervision_loss
from ..metrics import mean_foreground_dice
from .state import TrainState


def make_loss_fn(config: Config) -> Callable:
    lw = (config.loss.dice_weight, config.loss.ce_weight,
          config.loss.focal_weight)
    base = functools.partial(
        combined_loss, weights=lw, focal_alpha=config.loss.focal_alpha,
        focal_gamma=config.loss.focal_gamma)

    def loss_fn(out: Dict[str, Any], targets):
        if config.loss.use_deep_supervision and out["deep"]:
            return deep_supervision_loss(
                out["logits"], out["deep"], targets,
                config.loss.deep_supervision_weights, base)
        return base(out["logits"], targets)

    return loss_fn


def _valid_ema_decay(decay: float) -> float:
    """0 = off; otherwise must lie strictly in (0, 1): a negative value
    desyncs from create_train_state's ``> 0`` seeding (pytree mismatch
    on the first step) and decay >= 1 silently freezes the EMA at the
    init weights — validation, save-on-best, and serving would score
    the random init while training appears to run."""
    decay = float(decay)
    if decay != 0.0 and not (0.0 < decay < 1.0):
        raise ValueError(f"ema_decay must be 0 (off) or in (0, 1); "
                         f"got {decay}")
    return decay


def _make_ema_update(config: Config) -> Callable:
    """Parameter-EMA step applied after the optimizer update
    (``Config.ema_decay``; identity when off). Runs inside the jitted
    step — no extra dispatch, one fused multiply-add per leaf."""
    decay = _valid_ema_decay(getattr(config, "ema_decay", 0.0))
    if decay == 0.0:
        return lambda new_state: new_state

    def update(new_state: TrainState) -> TrainState:
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            new_state.ema_params, new_state.params)
        return new_state.replace(ema_params=new_ema)

    return update


def make_train_step(config: Config, num_classes: int = 4,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    grad_accum: Optional[int] = None) -> Callable:
    """Returns ``step(state, batch, key) -> (state, metrics)``, jitted.

    ``grad_accum`` > 1 (default ``config.grad_accum``) splits the batch
    into that many microbatches and runs them through a ``lax.scan``
    inside the one jitted program — gradients are averaged in the scan
    carry, so activation memory stays at ONE microbatch while the
    optimizer sees the full-batch gradient. Every loss term reduces as
    a per-sample mean (``losses.py``) and GroupNorm is per-sample, so
    the accumulated gradient equals the full-batch gradient exactly
    (tests/test_train.py parity test); batch_stats advance sequentially
    per microbatch (standard BN-under-accumulation semantics).
    """
    loss_fn = make_loss_fn(config)
    accum = config.grad_accum if grad_accum is None else grad_accum
    ema = _make_ema_update(config)

    def micro_grads(state, images, targets, key, bs_state):
        """One microbatch: (loss, grads, logits, new_batch_stats)."""
        def compute_loss(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": bs_state},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return loss_fn(out, targets), (mutated["batch_stats"],
                                           out["logits"])

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        return loss, grads, logits, new_bs

    def grad_norm(grads) -> jax.Array:
        return jnp.sqrt(sum(
            jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(grads)))

    def step(state: TrainState, batch: Dict[str, jax.Array],
             key: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        images, targets = batch["image"], batch["mask"]
        loss, grads, logits, new_bs = micro_grads(
            state, images, targets, key, state.batch_stats)
        new_state = ema(state.apply_gradients(grads=grads,
                                              batch_stats=new_bs))
        metrics = {
            "loss": loss,
            "dice": mean_foreground_dice(logits, targets, num_classes),
            "grad_norm": grad_norm(grads),
        }
        return new_state, metrics

    def step_accum(state: TrainState, batch: Dict[str, jax.Array],
                   key: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        images, targets = batch["image"], batch["mask"]
        b = images.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by "
                             f"grad_accum {accum}")
        mb = b // accum
        im = images.reshape(accum, mb, *images.shape[1:])
        tg = targets.reshape(accum, mb, *targets.shape[1:])
        keys = jax.random.split(key, accum)

        def body(carry, xs):
            bs_state, gacc, lacc, dacc = carry
            im_i, tg_i, k_i = xs
            loss, grads, logits, new_bs = micro_grads(
                state, im_i, tg_i, k_i, bs_state)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            dice = mean_foreground_dice(logits, tg_i, num_classes)
            return (new_bs, gacc, lacc + loss, dacc + dice), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_bs, gsum, lsum, dsum), _ = jax.lax.scan(
            body, (state.batch_stats, zeros, 0.0, 0.0),
            (im, tg, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        new_state = ema(state.apply_gradients(grads=grads,
                                              batch_stats=new_bs))
        metrics = {"loss": lsum / accum, "dice": dsum / accum,
                   "grad_norm": grad_norm(grads)}
        return new_state, metrics

    if accum > 1:
        step = step_accum

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated
        bs, rep = batch_sharding(mesh), replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(rep, {"image": bs, "mask": bs}, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_joint_train_step(config: Config, num_classes: int = 4,
                          cls_weight: float = 0.3,
                          mesh: Optional[Mesh] = None,
                          donate: bool = True) -> Callable:
    """Train step for ``UNet3DWithClassifier`` (BASELINE config 4).

    ``step(state, batch, key)`` where batch additionally carries integer
    ``grade`` labels (derived from tumor burden when absent).
    """
    from ..models.joint import grade_from_volume, joint_loss
    seg_loss_fn = make_loss_fn(config)
    ema = _make_ema_update(config)

    def step(state: TrainState, batch: Dict[str, jax.Array],
             key: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        images, targets = batch["image"], batch["mask"]
        if "grade" in batch:
            grades = batch["grade"]
        else:
            tumor = jnp.sum((targets > 0).astype(jnp.int32),
                            axis=(1, 2, 3))
            total = targets.shape[1] * targets.shape[2] * targets.shape[3]
            grades = grade_from_volume(tumor, total)

        def compute_loss(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            loss, parts = joint_loss(out, targets, grades, seg_loss_fn,
                                     cls_weight)
            return loss, (mutated["batch_stats"], out, parts)

        (loss, (new_bs, out, parts)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = ema(state.apply_gradients(grads=grads,
                                              batch_stats=new_bs))
        grade_acc = jnp.mean(
            (jnp.argmax(out["grade_logits"], -1) == grades
             ).astype(jnp.float32))
        metrics = {
            "loss": loss, "seg_loss": parts["seg_loss"],
            "grade_ce": parts["grade_ce"], "grade_acc": grade_acc,
            "dice": mean_foreground_dice(out["logits"], targets,
                                         num_classes),
        }
        return new_state, metrics

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated
        bs, rep = batch_sharding(mesh), replicated(mesh)
        return jax.jit(step,
                       in_shardings=(rep, {"image": bs, "mask": bs}, rep),
                       out_shardings=(rep, rep),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(config: Config, num_classes: int = 4,
                   mesh: Optional[Mesh] = None,
                   with_hausdorff: bool = False,
                   hd_percentile: float = 95.0) -> Callable:
    """Returns ``eval_step(state, batch) -> metrics``: loss, mean dice,
    WT/TC/ET region dice, argmax labels — and, when ``with_hausdorff``,
    per-sample HD95 via the exact on-device EDT (``ops/edt.py``),
    replacing both the reference's random stub (``training.py:369``)
    and the round-1 host-side batch-0 sampling. Everything stays on
    device: the trainer syncs once per epoch."""
    from ..metrics import region_dice
    from ..ops.edt import hausdorff_distance_device
    loss_fn = make_loss_fn(config)

    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Dict[str, jax.Array]:
        images, targets = batch["image"], batch["mask"]
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        loss = loss_fn(out, targets)
        labels = jnp.argmax(out["logits"], axis=-1)
        metrics = {
            "loss": loss,
            "dice": mean_foreground_dice(labels, targets, num_classes),
            "pred_labels": labels,
        }
        for name, val in region_dice(labels, targets).items():
            metrics[f"dice_{name}"] = val
        if with_hausdorff:
            metrics["hausdorff"] = jax.vmap(
                lambda p, t: hausdorff_distance_device(
                    p > 0, t > 0, percentile=hd_percentile))(
                labels, targets)
        return metrics

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated
        bs, rep = batch_sharding(mesh), replicated(mesh)
        outs = {"loss": rep, "dice": rep, "pred_labels": bs,
                "dice_WT": rep, "dice_TC": rep, "dice_ET": rep}
        if with_hausdorff:
            outs["hausdorff"] = bs
        return jax.jit(step,
                       in_shardings=(rep, {"image": bs, "mask": bs}),
                       out_shardings=outs)
    return jax.jit(step)
