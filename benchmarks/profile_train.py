"""Decompose the training-step cost at 128^3 b2 (reference hot loop
``training.py:286-315``): forward+loss, +backward, +optimizer, +dice,
plus per-component fwd/bwd of the deep-supervision machinery — to
locate why a step costs ~650 ms when the inference-path platform bound
predicts ~200 ms.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

RTT = [0.0]


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    ts = []
    for _ in range(8):
        t0 = time.time()
        float(f(jnp.float32(0)))
        ts.append(time.time() - t0)
    RTT[0] = min(ts)
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms", flush=True)


def timed(make_out, args, iters, label):
    """make_out(args, bump) -> scalar f32 (consumes everything)."""
    def chained(a):
        def body(c, _):
            return c + make_out(a, c * 1e-30), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(2):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        Config)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
        UNet3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
        create_train_state)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.loop import (
        make_loss_fn)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.metrics import (
        mean_foreground_dice)

    measure_rtt()
    cfg = Config()
    size = (128, 128, 128)
    B = 2
    remat = "--remat" in sys.argv
    model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=remat)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (1, *size, 4), steps_per_epoch=100)
    loss_fn = make_loss_fn(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, *size, 4)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, 4, size=(B, *size))
                      .astype(np.int32))
    key = jax.random.PRNGKey(1)
    args = (state, img, msk)

    def fwd_eval(a, bump):
        state, img, msk = a
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img + bump, train=False)
        return jnp.sum(out["logits"][..., :1, :1])

    def fwd_loss(a, bump):
        state, img, msk = a
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img + bump, train=True, mutable=["batch_stats"],
            rngs={"dropout": key})
        return loss_fn(out, msk).astype(jnp.float32)

    def fwd_loss_nodeep(a, bump):
        state, img, msk = a
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img + bump, train=True, mutable=["batch_stats"],
            rngs={"dropout": key})
        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.losses import (
            combined_loss)
        return combined_loss(out["logits"], msk).astype(jnp.float32)

    def grad_full(a, bump):
        state, img, msk = a

        def compute(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img + bump, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return loss_fn(out, msk)
        loss, grads = jax.value_and_grad(compute)(state.params)
        # consume EVERY grad leaf or XLA dead-code-eliminates the
        # unconsumed branches of the backward
        return loss.astype(jnp.float32) + sum(
            jnp.sum(g).astype(jnp.float32)
            for g in jax.tree_util.tree_leaves(grads))

    def grad_nodeep(a, bump):
        state, img, msk = a
        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.losses import (
            combined_loss)

        def compute(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img + bump, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return combined_loss(out["logits"], msk)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return loss.astype(jnp.float32) + sum(
            jnp.sum(g).astype(jnp.float32)
            for g in jax.tree_util.tree_leaves(grads))

    def dice_only(a, bump):
        state, img, msk = a
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img + bump, train=False)
        return mean_foreground_dice(out["logits"], msk, 4).astype(
            jnp.float32)

    # --- step-glue decomposition (locate the fwd+bwd -> full-step gap) ---

    def _grad_aux(a, bump, want_logits):
        state, img, msk = a

        def compute(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img + bump, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            aux = (mutated["batch_stats"],
                   out["logits"] if want_logits else None)
            return loss_fn(out, msk), aux
        return jax.value_and_grad(compute, has_aux=True)(state.params)

    def grad_dice(a, bump):
        (loss, (_, logits)), grads = _grad_aux(a, bump, True)
        msk = a[2]
        return (loss.astype(jnp.float32)
                + mean_foreground_dice(logits, msk, 4).astype(jnp.float32)
                + sum(jnp.sum(g).astype(jnp.float32)
                      for g in jax.tree_util.tree_leaves(grads)))

    def grad_opt(a, bump):
        state = a[0]
        (loss, (new_bs, _)), grads = _grad_aux(a, bump, False)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return loss.astype(jnp.float32) + sum(
            jnp.sum(p).astype(jnp.float32)
            for p in jax.tree_util.tree_leaves(new_state.params))

    def full_step(a, bump):
        state = a[0]
        msk = a[2]
        (loss, (new_bs, logits)), grads = _grad_aux(a, bump, True)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return (loss.astype(jnp.float32)
                + mean_foreground_dice(logits, msk, 4).astype(jnp.float32)
                + sum(jnp.sum(p).astype(jnp.float32)
                      for p in jax.tree_util.tree_leaves(new_state.params)))

    print(f"remat={remat} size={size} b{B}", flush=True)
    if "--glue" in sys.argv:
        timed(grad_full, args, 3, "fwd+bwd (deep sup)")
        timed(grad_dice, args, 3, "fwd+bwd + dice (logits aux kept)")
        timed(grad_opt, args, 3, "fwd+bwd + adamw apply")
        timed(full_step, args, 3, "full step (bwd+dice+opt)")
        return
    timed(fwd_eval, args, 4, "fwd eval (no deep sup, no dropout)")
    timed(fwd_loss_nodeep, args, 4, "fwd train + combined loss (no deep)")
    timed(fwd_loss, args, 4, "fwd train + deep-sup loss")
    timed(grad_nodeep, args, 3, "fwd+bwd (no deep sup)")
    timed(grad_full, args, 3, "fwd+bwd (deep sup)")
    timed(dice_only, args, 4, "fwd eval + foreground dice")


if __name__ == "__main__":
    main()
