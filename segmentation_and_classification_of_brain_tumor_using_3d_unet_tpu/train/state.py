"""Train state + optimizer/schedule construction.

Parity: AdamW(lr=1e-4, wd=1e-4, betas=(0.9, 0.999)) with
CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=1e-6) stepped per
epoch (reference ``training.py:187-197, 252``). The schedule is a pure
function of the optimizer step (epoch = step // steps_per_epoch), so the
whole update stays inside one jitted train step — no host-side
``scheduler.step()``.

bf16 compute happens in the model; the optimizer state and updates are
fp32 (TPU-native replacement for GradScaler — bf16 needs no loss scaling).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..config import Config, OptimizerConfig


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running stats (head BN,
    reference ``main.py:131``) + optional parameter EMA
    (``Config.ema_decay``; None when disabled)."""

    batch_stats: Any = None
    ema_params: Any = None


def ema_eval_state(state: TrainState) -> TrainState:
    """Evaluation view of a state: EMA weights when tracked, the live
    params otherwise. batch_stats stay live (they are already running
    averages)."""
    if state.ema_params is None:
        return state
    return state.replace(params=state.ema_params)


def cosine_warm_restarts(base_lr: float, t_0: int, t_mult: int,
                         eta_min: float, steps_per_epoch: int
                         ) -> optax.Schedule:
    """SGDR schedule over optimizer steps, constant within an epoch
    (the reference steps its scheduler once per epoch)."""

    t_0 = max(int(t_0), 1)
    steps_per_epoch = max(int(steps_per_epoch), 1)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        if t_mult == 1:
            frac = (epoch % t_0) / t_0
        else:
            m = jnp.float32(t_mult)
            # cycle index k: first epoch of cycle k is t_0*(m^k - 1)/(m - 1)
            k = jnp.floor(
                jnp.log(epoch * (m - 1.0) / t_0 + 1.0) / jnp.log(m))
            start = t_0 * (m ** k - 1.0) / (m - 1.0)
            length = t_0 * m ** k
            frac = (epoch - start) / length
        frac = jnp.clip(frac, 0.0, 1.0)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def build_optimizer(cfg: OptimizerConfig, steps_per_epoch: int = 1,
                    learning_rate: Optional[float] = None
                    ) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else cfg.learning_rate
    if cfg.scheduler == "cosine_warm_restarts":
        schedule: Any = cosine_warm_restarts(
            lr, cfg.t_0, cfg.t_mult, cfg.eta_min, steps_per_epoch)
    elif cfg.scheduler == "constant":
        schedule = lr
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")

    tx = optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                     weight_decay=cfg.weight_decay)
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(model, config: Config, rng: jax.Array,
                       sample_shape, steps_per_epoch: int = 1,
                       learning_rate: Optional[float] = None) -> TrainState:
    """Initialize params (Kaiming via module initializers) + optimizer."""
    x = jnp.zeros(sample_shape, jnp.float32)
    # jit the init: eager tracing dispatches hundreds of tiny ops, which
    # is pathologically slow over a remote-compile TPU attach.
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, x, train=False)
    tx = build_optimizer(config.optimizer, steps_per_epoch, learning_rate)
    from .loop import _valid_ema_decay
    _valid_ema_decay(getattr(config, "ema_decay", 0.0))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        # distinct buffers, not an alias: the train step donates the
        # state, and donating the same buffer twice (params + ema) is
        # an XLA error
        ema_params=(jax.tree_util.tree_map(jnp.copy, variables["params"])
                    if getattr(config, "ema_decay", 0.0) > 0 else None),
        tx=tx,
    )


def current_lr(state: TrainState, cfg: OptimizerConfig,
               steps_per_epoch: int,
               learning_rate: Optional[float] = None) -> float:
    lr = learning_rate if learning_rate is not None else cfg.learning_rate
    if cfg.scheduler == "constant":
        return float(lr)
    sched = cosine_warm_restarts(lr, cfg.t_0, cfg.t_mult, cfg.eta_min,
                                 steps_per_epoch)
    return float(sched(int(state.step)))
