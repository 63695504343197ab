"""Orbax checkpointing: save-on-best + resume.

Parity with the reference's ``torch.save`` dict of model/optimizer/
scheduler state + best_dice + metrics history (``training.py:396-404``,
resume at ``train_model.py:185-190``), re-done as an Orbax pytree
checkpoint (async-safe, TPU-host friendly) plus a JSON sidecar for
human-readable metrics history.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from .state import TrainState

_META = "trainer_meta.json"


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: TrainState,
                    best_dice: float = 0.0, epoch: int = 0,
                    metrics_history: Optional[Dict[str, Any]] = None
                    ) -> str:
    """Write state pytree + metadata. ``path`` is a directory."""
    path = _ckpt_dir(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    ckptr = ocp.StandardCheckpointer()
    # write-then-swap: deleting the old best BEFORE the (possibly
    # hundreds-of-MB, interruptible) save would leave zero usable
    # checkpoints if the process dies mid-write
    state_dir = os.path.join(path, "state")
    tmp_dir = os.path.join(path, "state.tmp")
    import shutil
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    ckptr.save(tmp_dir, payload)
    ckptr.wait_until_finished()
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)
    os.rename(tmp_dir, state_dir)
    with open(os.path.join(path, _META), "w") as f:
        json.dump({
            "best_dice": float(best_dice),
            "epoch": int(epoch),
            "metrics_history": metrics_history or {},
        }, f, indent=2)
    return path


def archive_existing(path: str) -> Optional[str]:
    """Move an existing checkpoint directory to a timestamped archive
    sibling (``<parent>/archive/<name>_<ts>/``) and write-protect it.

    Loss-proofing for save-on-best: a NEW run whose experiment name
    collides with a previous run's must not clobber that run's best
    checkpoint (the round-4 incident: a side experiment using the
    default name destroyed the strongest quality artifact in the repo).
    The move is a rename — no copy cost — and the archive is chmod'd
    read-only so a buggy path join can't truncate it either.

    Returns the archive path, or None when ``path`` has no checkpoint.
    """
    path = _ckpt_dir(path)
    if not os.path.isdir(os.path.join(path, "state")):
        return None
    import shutil
    import time

    parent = os.path.dirname(path)
    name = os.path.basename(path.rstrip(os.sep))
    archive_root = os.path.join(parent, "archive")
    os.makedirs(archive_root, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    dest = os.path.join(archive_root, f"{name}_{ts}")
    n = 0
    while os.path.exists(dest):          # same-second collisions
        n += 1
        dest = os.path.join(archive_root, f"{name}_{ts}_{n}")
    shutil.move(path, dest)
    for root, dirs, files in os.walk(dest, topdown=False):
        for f in files:
            os.chmod(os.path.join(root, f), 0o444)
        for d in dirs:
            os.chmod(os.path.join(root, d), 0o555)
    os.chmod(dest, 0o555)
    return dest


def _saved_tree_keys(state_dir: str):
    """Top-level keys of an on-disk checkpoint pytree (for deciding
    whether it carries ``ema_params`` before building a restore
    target — orbax refuses structure mismatches in either direction).
    Empty set when the probe fails (orbax version/layout differences
    must not break plain restores — the caller falls back to assuming
    the checkpoint matches the live config)."""
    try:
        meta = ocp.PyTreeCheckpointer().metadata(state_dir)
        tree = getattr(meta, "item_metadata", meta)
        tree = tree.tree if hasattr(tree, "tree") else tree
        return set(tree) if isinstance(tree, dict) else set()
    except Exception:
        return set()


def restore_checkpoint(path: str, state: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of ``state``; returns (state, meta).

    EMA compatibility is symmetric: a pre-EMA checkpoint restoring into
    an EMA config seeds the EMA from the restored params, and an
    EMA-trained checkpoint restoring into a non-EMA config drops the
    saved EMA (the live params continue training)."""
    path = _ckpt_dir(path)
    state_dir = os.path.join(path, "state")
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    want_ema = state.ema_params is not None
    saved_keys = _saved_tree_keys(state_dir)
    has_ema = "ema_params" in saved_keys if saved_keys else want_ema
    if has_ema:
        # target must match disk; a non-EMA config restores the saved
        # EMA into params-shaped buffers and then discards it below
        target["ema_params"] = (state.ema_params if want_ema
                                else state.params)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(state_dir, target)
    if want_ema and not has_ema:
        # pre-EMA checkpoint: seed EMA from the restored params
        # (copied — the train step donates the state, and params+ema
        # must not alias the same buffer)
        import jax as _jax
        import jax.numpy as jnp
        restored["ema_params"] = _jax.tree_util.tree_map(
            jnp.copy, restored["params"])
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"],
        ema_params=(restored.get("ema_params", state.ema_params)
                    if want_ema else None))
    meta: Dict[str, Any] = {"best_dice": 0.0, "epoch": 0,
                            "metrics_history": {}}
    meta_path = os.path.join(path, _META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    return state, meta


def save_params_only(path: str, params) -> str:
    """Export inference weights (the ``.pth``-analog for the web app)."""
    path = _ckpt_dir(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, {"params": params})
    ckptr.wait_until_finished()
    return path


def restore_params_only(path: str, params_like):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_dir(path),
                         {"params": params_like})["params"]


def load_inference_weights(path: str) -> Tuple[Any, Optional[Any]]:
    """Read (params, batch_stats-or-None) from either a trainer
    checkpoint directory (``save_checkpoint`` layout, ``<path>/state``)
    or a params-only export (``save_params_only``).

    Restores every leaf as host ``np.ndarray`` via explicit
    ``RestoreArgs`` rather than a targetless restore: a targetless
    restore replays the *saved* shardings, so a checkpoint written on
    TPU refuses to load in a CPU-only server process
    ("Device TPU v5 lite0 was not found in jax.local_devices()").
    The caller validates structure/shape compatibility against its
    model before adopting the arrays (serving auto-discovery must skip
    checkpoints of differently-configured models)."""
    import jax
    import numpy as np

    path = _ckpt_dir(path)
    state_dir = os.path.join(path, "state")
    if os.path.isdir(state_dir):
        path = state_dir
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    restored = ckptr.restore(path, restore_args=restore_args)
    # an EMA-trained checkpoint serves its EMA weights (they are what
    # validation scored and save-on-best selected)
    params = restored.get("ema_params")
    if params is None:
        params = restored["params"]
    return params, restored.get("batch_stats")


def adopt_trained_weights(predictor, checkpoint: str = "",
                          models_dir: str = "",
                          log=None) -> Optional[str]:
    """Adopt trained segmentation weights into a ``Predictor``: an
    explicit ``checkpoint`` path, or the newest structurally compatible
    ``best_*`` checkpoint under ``models_dir`` — the trained-weights
    handoff shared by the web tier (serve/app) and the predict CLI
    (inference/cli). Joint (``UNet3DWithClassifier``) checkpoints adopt
    the nested ``unet`` trunk and enable the trained grade head.

    Returns the adopted checkpoint path, or None (incompatible/absent
    checkpoints leave the predictor untouched — the reference's
    untrained-model behavior, ``main.py:330-354``)."""
    import glob
    import logging

    log = log or logging.getLogger(__name__)
    if checkpoint == "none":
        return None
    candidates = ([checkpoint] if checkpoint else sorted(
        glob.glob(os.path.join(models_dir, "best_*")),
        key=os.path.getmtime, reverse=True))
    live = predictor.seg_variables["params"]
    for path in candidates:
        try:
            params, bstats = load_inference_weights(path)
        except Exception as e:
            log.warning("checkpoint %s unreadable: %s", path, e)
            continue
        # a joint checkpoint nests the seg trunk under "unet"
        trees = [(params, bstats)]
        if isinstance(params, dict) and "unet" in params:
            trees.append((params["unet"],
                          bstats.get("unet")
                          if isinstance(bstats, dict) else None))
        for p, b in trees:
            if not compatible_tree(p, live):
                continue
            predictor.load_seg_params(p, b)
            if p is not params and b is not None:
                # joint checkpoint: also enable the trained grade head
                try:
                    predictor.load_joint_grade(params, bstats)
                except Exception as e:
                    log.warning("grade head not enabled: %s", e)
            log.info("loaded trained weights from %s", path)
            return path
        log.info("checkpoint %s: different model config, skipping",
                 path)
    return None


def compatible_tree(a, b) -> bool:
    """True iff two pytrees have identical structure and leaf shapes
    (dtype may differ — params cast on use)."""
    import jax

    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        return False
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(getattr(x, "shape", None) == getattr(y, "shape", None)
               for x, y in zip(la, lb))
