"""Build the trained-checkpoint ps2d parity fixture (ADVICE r3).

Random-init parity tests measure near-zero logit margins, so a few ulp
of bf16 reassociation drift flips labels and the bound keeps getting
renegotiated. This trains a small-but-real UNet3D (features=(32,), so
the ps2d level-0 region is eligible) on a synthetic blob task until
the margins are real, then saves the params to
``tests/fixtures/ps2d_parity_params.npz`` for
``test_ps2d.py::test_trained_checkpoint_parity`` — which can then
demand ZERO label flips from the flat region.

Run once on the 1-CPU host (~10 min); the fixture is committed.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (  # noqa: E402
    UNet3D)

SHAPE = (8, 24, 16)
rng = np.random.default_rng(3)


def make_batch(n=4):
    """Blobby 4-class task with modality contrast — enough structure
    that a trained net develops real per-voxel margins."""
    imgs = np.zeros((n, *SHAPE, 4), np.float32)
    masks = np.zeros((n, *SHAPE), np.int32)
    zz, yy, xx = np.ogrid[:SHAPE[0], :SHAPE[1], :SHAPE[2]]
    for i in range(n):
        imgs[i] = rng.normal(0.0, 0.3, (*SHAPE, 4))
        for cls in (1, 2, 3):
            c = [rng.uniform(2, s - 2) for s in SHAPE]
            r = rng.uniform(2.0, 4.5)
            blob = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                    + (xx - c[2]) ** 2) < r ** 2
            masks[i][blob] = cls
            imgs[i][blob] += np.asarray(
                [0.5 * cls, 1.0 - 0.3 * cls, 0.4, 0.8 * (cls == 2)],
                np.float32)
    return jnp.asarray(imgs), jnp.asarray(masks)


model = UNet3D(out_channels=4, features=(32,), dtype=jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), jnp.zeros((1, *SHAPE, 4)), train=False)
params, bstats = variables["params"], variables["batch_stats"]
tx = optax.adamw(3e-3)
opt = tx.init(params)


@jax.jit
def step(params, bstats, opt, imgs, masks):
    def loss_fn(p):
        out, mut = model.apply({"params": p, "batch_stats": bstats},
                               imgs, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
        lg = out["logits"]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            lg, masks).mean()
        return ce, mut["batch_stats"]

    (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, new_opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), new_bs, new_opt, loss


imgs_val, masks_val = make_batch(2)
for it in range(300):
    imgs, masks = make_batch(4)
    params, bstats, opt, loss = step(params, bstats, opt, imgs, masks)
    if it % 50 == 0 or it == 299:
        lg = model.apply({"params": params, "batch_stats": bstats},
                         imgs_val, train=False)["logits"]
        acc = float((jnp.argmax(lg, -1) == masks_val).mean())
        top2 = jnp.sort(lg, axis=-1)
        margin = float(jnp.median(top2[..., -1] - top2[..., -2]))
        print(f"it {it:3d} loss {float(loss):.4f} val acc {acc:.3f} "
              f"median margin {margin:.2f}", flush=True)

flat, _ = jax.flatten_util.ravel_pytree((params, bstats))
print("param bytes (f32):", flat.size * 4)
leaves = {}


def store(prefix, tree):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            store(key, v)
        else:
            leaves[key] = np.asarray(v)


store("params", params)
store("batch_stats", bstats)
out = "/root/repo/tests/fixtures/ps2d_parity_params.npz"
import os  # noqa: E402

os.makedirs(os.path.dirname(out), exist_ok=True)
np.savez_compressed(out, **leaves)
print("saved", out, os.path.getsize(out), "bytes")
