"""Training-step benchmark (BASELINE.json config 2/3): full train step
(fwd bf16 + deep-supervision combined loss + bwd + AdamW + on-device
Dice) on 4-modality 128^3 patches, flagship UNet3D."""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, nargs=3,
                    default=(128, 128, 128))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth level 0 (ops/s2d.py) in the "
                         "train step")
    ap.add_argument("--ps2d", action="store_true",
                    help="packed-s2d Pallas level-0 convs under "
                         "jax.custom_vjp in the train step "
                         "(ops/pallas/ps2d.ps2d_conv3d_flat_train)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches per optimizer update (--batch "
                         "is the full effective batch)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="parameter-EMA decay (Config.ema_decay); "
                         "measures the EMA update's in-step cost")
    ap.add_argument("--sustained", action="store_true",
                    help="chain steps inside one jit (lax.scan) with a "
                         "single readback — device throughput without "
                         "the ~26 ms/step attach RTT that per-call "
                         "timing pays (same methodology as bench.py)")
    ap.add_argument("--sync_per_step", action="store_true",
                    help="read the loss back after every step (the "
                         "round-1/2 methodology) — charges the ~26-46 ms "
                         "attach RTT to every step; the real trainer "
                         "accumulates device arrays and syncs once per "
                         "epoch, so the default (pipelined) mode is the "
                         "deployment-honest number")
    args = ap.parse_args()

    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
        create_train_state, make_train_step)

    cfg = Config(grad_accum=args.grad_accum, ema_decay=args.ema)
    model = UNet3D(out_channels=4, dtype=jnp.bfloat16,
                   remat=not args.no_remat, s2d_train=args.s2d,
                   ps2d_train=args.ps2d)
    size = tuple(args.size)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (1, *size, 4), steps_per_epoch=100)
    step = make_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(
            size=(args.batch, *size, 4)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(
            0, 4, size=(args.batch, *size)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(1)

    if args.sustained:
        import jax as _jax

        def chained(state, batch, key):
            def body(carry, i):
                st, k = carry
                st, m = step_fn(st, batch, _jax.random.fold_in(k, i))
                return (st, k), m["loss"]
            (state, _), losses = _jax.lax.scan(
                body, (state, key), jnp.arange(args.iters))
            return state, losses

        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.loop import (
            make_train_step)
        step_fn = make_train_step(cfg, donate=False)
        run = _jax.jit(chained, donate_argnums=(0,))
        t0 = time.time()
        state2, losses = run(state, batch, key)
        float(losses[-1])
        print(f"compile+first wave: {time.time() - t0:.1f}s")
        times = []
        st = state2
        for _ in range(3):
            t0 = time.time()
            st, losses = run(st, batch, key)
            float(losses[-1])
            times.append(time.time() - t0)
        per = min(times) / args.iters
        print(f"sustained train step {size} b{args.batch} "
              f"remat={not args.no_remat}: {per*1e3:.1f} ms/step = "
              f"{args.batch/per:.2f} patches/s")
        return

    t0 = time.time()
    state, m = step(state, batch, key)
    print(f"compile+first step: {time.time() - t0:.1f}s  "
          f"loss={float(m['loss']):.4f}")

    if args.sync_per_step:
        times = []
        for i in range(args.iters):
            t0 = time.time()
            state, m = step(state, batch, jax.random.fold_in(key, i))
            _ = float(m["loss"])     # sync
            times.append(time.time() - t0)
        med = float(np.median(times))
        print(f"sync-per-step train step {size} b{args.batch} "
              f"remat={not args.no_remat}: {med * 1e3:.1f} ms/step = "
              f"{args.batch / med:.2f} patches/s")
        return

    # default: the trainer's dispatch pattern — per-call dispatch, NO
    # per-step readback, one sync at the end (train_epoch accumulates
    # device arrays and syncs once per epoch)
    times = []
    for _ in range(3):
        losses = []
        t0 = time.time()
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(m["loss"])       # device array, no sync
        _ = float(jnp.mean(jnp.stack(losses)))   # one sync
        times.append(time.time() - t0)
    per = min(times) / args.iters
    print(f"pipelined train step {size} b{args.batch} "
          f"remat={not args.no_remat}: {per*1e3:.1f} ms/step = "
          f"{args.batch/per:.2f} patches/s")


if __name__ == "__main__":
    main()
