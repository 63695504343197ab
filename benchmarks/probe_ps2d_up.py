"""Part 2 of the ps2d tax decomposition (probe_ps2d_glue.py): the up
path and the full in-model trunk A/B. The composed dec0 stage measured
only +1.5 ms flat-vs-normal, but bench.py --ps2d loses +11.8 ms/vol —
this probe finds the rest (suspects: conv_transpose s2d_out emission,
head-chain input produced by flat_to_normal)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D  # noqa: E402
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    FastConvTranspose3D)

RTT = [0.0]


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, args, label, iters=5):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if hasattr(v, "dtype") else v, a))
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")]
            return c + sum(jnp.sum(l[..., :1].astype(jnp.float32))
                           for l in leaves), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot
    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = [_t(lambda: float(f(args))) for _ in range(5)]
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:52s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    D, H, W = 160, 192, 144
    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x1 = jnp.asarray(rng.normal(size=(1, D // 2, H // 2, W // 2, 64))
                     .astype(np.float32), jnp.bfloat16)

    print("== up4: FastConvTranspose3D 64->32 (level1 -> level0) ==")
    up_n = FastConvTranspose3D(32, dtype=jnp.bfloat16)
    vn = up_n.init(key, x1)
    timed(lambda v, x: up_n.apply(v, x), (vn, x1), "transpose normal out")
    up_s = FastConvTranspose3D(32, dtype=jnp.bfloat16, s2d_out=True)
    vs = up_s.init(key, x1)
    timed(lambda v, x: up_s.apply(v, x), (vs, x1), "transpose s2d out")

    print("== full forward trunk A/B (argmax consumed) ==")
    xin = jnp.asarray(rng.normal(size=(1, D, H, W, 4)).astype(np.float32))
    for ps2d in (False, True):
        m = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False,
                   ps2d_eval=ps2d)
        v = jax.jit(m.init, static_argnames=("train",))(
            key, jnp.zeros((1, 128, 128, 128, 4), jnp.float32),
            train=False)
        fwd = lambda vv, xx: m.apply(vv, xx, train=False)["logits"]
        timed(fwd, (v, xin), f"fwd ps2d={ps2d}")


if __name__ == "__main__":
    main()
