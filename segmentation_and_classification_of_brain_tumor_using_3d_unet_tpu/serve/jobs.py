"""Async training-job manager for the web tier.

Re-design of the reference ``WebTrainingManager`` (``web_training.py:19-158``)
with two deliberate fixes:
  * the reference only *simulates* training (closed-form curves,
    ``web_training.py:77-104``); here ``mode='real'`` runs an actual JAX
    training loop in the worker thread, and the simulated path survives as
    an explicit ``mode='demo'`` degraded mode (same curve shape, so the UI
    contract is preserved);
  * session state is guarded by an RLock instead of GIL-luck
    (SURVEY.md section 5 race-detection note), and ``stop`` is actually
    honored (the reference route never calls its own stop,
    ``main.py:756-763``).

Progress JSON schema parity: ``web_training.py:121-130``.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _arch_features(arch: str):
    """Feature ladder for a web-training ``model_arch`` value.

    Accepts this UI's values (attention_unet[_full], joint[_full]) AND
    the reference form's option values — unet3d / lightweight /
    enhanced (``templates/index.html:669-673``; the reference backend
    ignored the field entirely, ``web_training.py:67``). "enhanced" and
    "*_full" train the flagship 32..512 ladder; everything else gets
    the compact 16..128 ladder for web responsiveness.
    """
    if arch.endswith("_full") or arch == "enhanced":
        return (32, 64, 128, 256, 512)
    return (16, 32, 64, 128)


class TrainingJobManager:
    def __init__(self):
        self._lock = threading.RLock()
        self._sessions: Dict[str, Dict] = {}
        self._stop_flags: Dict[str, threading.Event] = {}

    # ------------------------------------------------------------------

    def start_training_session(self, config: Optional[Dict] = None) -> str:
        config = dict(config or {})
        with self._lock:
            # id generated UNDER the lock: two same-second requests
            # racing on len(self._sessions) would collide, overwriting
            # each other's session dict and stop Event (the first run
            # would become unstoppable)
            session_id = (f"train_{time.strftime('%Y%m%d_%H%M%S')}"
                          f"_{len(self._sessions)}")
            self._sessions[session_id] = {
                "status": "starting",
                "config": config,
                "current_epoch": 0,
                "total_epochs": int(config.get("epochs", 10)),
                "train_loss": 0.0,
                "val_loss": 0.0,
                "dice_score": 0.0,
                "best_dice": 0.0,
                "learning_rate": float(config.get("learning_rate", 1e-4)),
                "logs": [],
                "started_at": time.time(),
            }
            self._stop_flags[session_id] = threading.Event()
        t = threading.Thread(target=self._run, args=(session_id, config),
                             daemon=True)
        t.start()
        return session_id

    def stop_training_session(self, session_id: str) -> bool:
        with self._lock:
            if session_id not in self._sessions:
                return False
            self._stop_flags[session_id].set()
            if self._sessions[session_id]["status"] in ("starting",
                                                        "running"):
                self._sessions[session_id]["status"] = "stopping"
        return True

    def get_training_progress(self, session_id: str) -> Optional[Dict]:
        with self._lock:
            s = self._sessions.get(session_id)
            if s is None:
                return None
            snap = {k: v for k, v in s.items() if k != "config"}
            snap["logs"] = list(s["logs"])[-10:]
            return snap

    def list_sessions(self) -> List[str]:
        with self._lock:
            return list(self._sessions)

    # ------------------------------------------------------------------

    def _log(self, sid: str, msg: str) -> None:
        with self._lock:
            if sid in self._sessions:
                self._sessions[sid]["logs"].append(
                    f"[{time.strftime('%H:%M:%S')}] {msg}")
        logger.info("[%s] %s", sid, msg)

    def _update(self, sid: str, **kw) -> None:
        with self._lock:
            if sid in self._sessions:
                self._sessions[sid].update(kw)

    def _run(self, sid: str, config: Dict) -> None:
        mode = config.get("mode", "real")
        try:
            if mode == "demo":
                self._run_demo(sid, config)
            else:
                self._run_real(sid, config)
        except Exception as e:
            logger.exception("training session %s failed", sid)
            self._log(sid, f"error: {e}")
            self._update(sid, status="error", error=str(e))

    # ---- real path: actual JAX training on synthetic data ----

    def _run_real(self, sid: str, config: Dict) -> None:
        import dataclasses
        import os
        import tempfile

        import jax
        import jax.numpy as jnp

        from ..config import Config
        from ..data.pipeline import create_brats_data_loaders
        from ..data.synthetic import create_enhanced_synthetic_data
        from ..models import UNet3D
        from ..train import checkpoints as ckpt_mod
        from ..train.loop import (make_eval_step, make_joint_train_step,
                                  make_train_step)
        from ..train.state import (create_train_state, current_lr,
                                   ema_eval_state)

        stop = self._stop_flags[sid]
        # unauthenticated JSON: cap magnitudes (a tiny request body can
        # otherwise demand unbounded CPU/disk — epochs 10^9, 512^3)
        epochs = max(1, min(int(config.get("epochs", 10)), 10_000))
        batch_size = max(1, min(int(config.get("batch_size", 2)), 32))
        lr = float(config.get("learning_rate", 1e-4))
        num_samples = max(1, min(int(config.get("num_samples", 8)), 500))
        arch = config.get("model_arch", "attention_unet")
        data_dir = config.get("data_dir")
        save_ckpt = bool(config.get("save_checkpoint", True))

        # web sessions train a compact variant for responsiveness unless
        # a full config is requested
        feats = _arch_features(arch)
        img = tuple(max(8, min(int(s), 256)) for s in
                    config.get("image_size", (64, 64, 64)))[:3]

        self._log(sid, f"preparing data ({num_samples} synthetic samples)")
        if not data_dir:
            data_dir = tempfile.mkdtemp(prefix="web_train_")
            create_enhanced_synthetic_data(
                num_samples, data_dir, shape=(96, 96, 64),
                seed=int(time.time()) % 2**31)
        cfg = Config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, features=feats),
            data=dataclasses.replace(cfg.data, image_size=img),
            batch_size=batch_size, use_tensorboard=False,
            # null-safe: the UI may post ema_decay: null; range is
            # validated by the trainer (_valid_ema_decay) and surfaces
            # as a session error message
            ema_decay=float(config.get("ema_decay") or 0.0),
            grad_accum=max(int(config.get("grad_accum") or 1), 1))

        train_loader, val_loader = create_brats_data_loaders(
            data_dir, batch_size=batch_size, num_workers=2,
            image_size=img, aug_cfg=cfg.augment)
        if len(train_loader.dataset) == 0:
            raise RuntimeError(f"no training data in {data_dir}")

        self._log(sid, f"compiling train step (arch={arch}, "
                       f"features={feats}, image={img})")
        if arch.startswith("joint"):
            if cfg.grad_accum > 1:
                # the joint step has no accumulation path; failing fast
                # beats silently training without the memory relief the
                # caller asked for
                raise ValueError("grad_accum > 1 is not supported for "
                                 "the joint arch")
            # seg trunk + grade head trained jointly (BASELINE config 4);
            # serving adopts the nested "unet" subtree of its checkpoint
            from ..models.joint import UNet3DWithClassifier
            model = UNet3DWithClassifier(out_channels=4, features=feats,
                                         dtype=jnp.bfloat16)
            tstep = make_joint_train_step(cfg, donate=False)
        else:
            model = UNet3D(out_channels=4, features=feats,
                           dtype=jnp.bfloat16)
            tstep = make_train_step(cfg, donate=False)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0), (1, *img, 4),
            steps_per_epoch=max(len(train_loader), 1),
            learning_rate=lr)
        estep = make_eval_step(cfg)
        rng = jax.random.PRNGKey(1)
        self._update(sid, status="running", total_epochs=epochs)

        best = 0.0
        for epoch in range(epochs):
            if stop.is_set():
                self._log(sid, "stopped by user")
                self._update(sid, status="stopped")
                return
            tl, td = [], []
            for batch in train_loader:
                rng, k = jax.random.split(rng)
                state, m = tstep(state, batch, k)
                tl.append(m["loss"]); td.append(m["dice"])
            vl, vd = [], []
            # EMA weights (when tracked) are what we validate and
            # save on best — same policy as the CLI trainer
            eval_state = ema_eval_state(state)
            for batch in val_loader:
                m = estep(eval_state, batch)
                vl.append(m["loss"]); vd.append(m["dice"])
            train_loss = float(jnp.mean(jnp.stack(tl))) if tl else 0.0
            val_loss = float(jnp.mean(jnp.stack(vl))) if vl else 0.0
            dice = float(jnp.mean(jnp.stack(vd))) if vd else 0.0
            if save_ckpt and (dice > best or epoch == 0):
                # persist save-on-best under models_dir so serving's
                # checkpoint auto-discovery (app._load_trained_weights)
                # picks web-trained weights up, like CLI training
                path = os.path.join(cfg.models_dir, f"best_web_{sid}")
                try:
                    ckpt_mod.save_checkpoint(path, state, best_dice=dice,
                                             epoch=epoch + 1)
                    self._update(sid, checkpoint=path)
                    self._log(sid, f"saved checkpoint {path}")
                except Exception as e:   # disk-full etc: keep training
                    logger.warning("checkpoint save failed: %s", e)
            best = max(best, dice)
            lr_now = current_lr(state, cfg.optimizer,
                                max(len(train_loader), 1), lr)
            self._update(sid, current_epoch=epoch + 1,
                         train_loss=round(train_loss, 4),
                         val_loss=round(val_loss, 4),
                         dice_score=round(dice, 4),
                         best_dice=round(best, 4),
                         learning_rate=lr_now)
            self._log(sid, f"epoch {epoch + 1}/{epochs} "
                           f"loss {train_loss:.4f} dice {dice:.4f}")
        self._update(sid, status="completed")
        self._log(sid, f"training complete; best dice {best:.4f}")

    # ---- demo path: explicit degraded mode (reference curve shape,
    #      web_training.py:84) ----

    def _run_demo(self, sid: str, config: Dict) -> None:
        stop = self._stop_flags[sid]
        epochs = int(config.get("epochs", 10))
        rng = np.random.default_rng(0)
        self._update(sid, status="running", total_epochs=epochs)
        best = 0.0
        for epoch in range(epochs):
            if stop.is_set():
                self._update(sid, status="stopped")
                self._log(sid, "stopped by user")
                return
            time.sleep(float(config.get("epoch_seconds", 1.0)))
            dice = min(0.95, 0.3 + 0.012 * epoch
                       + float(rng.normal(0, 0.01)))
            best = max(best, dice)
            self._update(
                sid, current_epoch=epoch + 1,
                train_loss=round(max(0.05, 1.5 * np.exp(-0.08 * epoch)
                                     + float(rng.normal(0, 0.02))), 4),
                val_loss=round(max(0.07, 1.6 * np.exp(-0.07 * epoch)
                                   + float(rng.normal(0, 0.03))), 4),
                dice_score=round(dice, 4), best_dice=round(best, 4))
            self._log(sid, f"[demo] epoch {epoch + 1}/{epochs}")
        self._update(sid, status="completed")
        self._log(sid, "[demo] training complete")


# module-level singleton + functional facade
# (parity: web_training.py:146-158)
training_manager = TrainingJobManager()


def start_web_training(config: Optional[Dict] = None) -> str:
    return training_manager.start_training_session(config)


def stop_web_training(session_id: str) -> bool:
    return training_manager.stop_training_session(session_id)


def get_web_training_progress(session_id: str) -> Optional[Dict]:
    return training_manager.get_training_progress(session_id)
