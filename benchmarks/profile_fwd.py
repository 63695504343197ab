"""Per-block device-time budget of the flagship UNet3D forward at
inference resolution (240x240x160), RTT-subtracted chained timing.

Answers: where do the ~146 ms/volume actually go, now that XLA's conv
path runs at 36-76 TF/s (round-2 re-measurement)?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
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
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms")


def timed(fn, args, iters, label, flops=None):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if hasattr(v, "dtype") and v.dtype in (jnp.bfloat16,
                                                       jnp.float32)
                else v, a))
            leaves = jax.tree_util.tree_leaves(out)
            return c + sum(jnp.sum(o[..., :1, :1].astype(jnp.float32))
                           for o in leaves), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{label:42s} {dt*1e3:8.2f} ms{tf}  (compile {comp:.0f}s)")
    return dt


def main():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
        UNet3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.unet3d import (
        DoubleConv3D, AttentionGate3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
        FastConvTranspose3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops import norm

    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32),
                           jnp.bfloat16)

    import sys as _sys
    if len(_sys.argv) == 4:
        D0, H0, W0 = (int(a) for a in _sys.argv[1:4])
    else:
        D0, H0, W0 = 240, 240, 160
    f = (32, 64, 128, 256, 512)
    spatial = [(D0 >> k, H0 >> k, W0 >> k) for k in range(5)]

    total = 0.0
    # whole model first
    model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
    x = mk((1, D0, H0, W0, 4))
    vs = jax.jit(model.init, static_argnames=("train",))(
        key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)
    t_full = timed(lambda v, xx: model.apply(v, xx, train=False)["logits"],
                   (vs, x), 3, f"UNet3D full fwd @{D0}x{H0}x{W0}")

    # encoder DoubleConvs
    chans = [(4, 32), (32, 64), (64, 128), (128, 256)]
    for lvl, (ci, co) in enumerate(chans):
        dd, hh, ww = spatial[lvl]
        m = DoubleConv3D(out_channels=co, dtype=jnp.bfloat16)
        xx = mk((1, dd, hh, ww, ci))
        v = jax.jit(m.init)(key, jnp.zeros((1, 8, 8, 8, ci),
                                           jnp.float32))
        fl = 2 * 27 * dd * hh * ww * co * (ci + co)
        total += timed(lambda v, a, m=m: m.apply(v, a), (v, xx),
                       max(3, 30 // (lvl + 1)),
                       f"enc{lvl} DoubleConv {ci}->{co}", fl)
    # bottleneck
    dd, hh, ww = spatial[4]
    m = DoubleConv3D(out_channels=1024, dtype=jnp.bfloat16)
    xx = mk((1, dd, hh, ww, 512))
    v = jax.jit(m.init)(key, jnp.zeros((1, 4, 4, 4, 512), jnp.float32))
    total += timed(lambda v, a, m=m: m.apply(v, a), (v, xx), 10,
                   "bottleneck DoubleConv 512->1024",
                   2 * 27 * dd * hh * ww * 1024 * 1536)

    # decoder: upsample + gate + DoubleConv per level (coarse->fine)
    for lvl in (3, 2, 1, 0):
        dd, hh, ww = spatial[lvl]
        fi = f[lvl]
        up = FastConvTranspose3D(features=fi, dtype=jnp.bfloat16)
        g = mk((1, dd // 2, hh // 2, ww // 2, 2 * fi))
        v = jax.jit(up.init)(key, jnp.zeros((1, 4, 4, 4, 2 * fi),
                                            jnp.float32))
        total += timed(lambda v, a, up=up: up.apply(v, a), (v, g),
                       10, f"dec{lvl} ConvTranspose {2*fi}->{fi}")

        gate = AttentionGate3D(f_int=max(fi // 2, 1),
                               dtype=jnp.bfloat16)
        gg = mk((1, dd, hh, ww, fi))
        sk = mk((1, dd, hh, ww, fi))
        v = jax.jit(gate.init)(key, jnp.zeros((1, 8, 8, 8, fi),
                                              jnp.float32),
                               jnp.zeros((1, 8, 8, 8, fi), jnp.float32))
        total += timed(lambda v, a, b, gate=gate: gate.apply(v, a, b),
                       (v, gg, sk), 10, f"dec{lvl} AttentionGate {fi}")

        m = DoubleConv3D(out_channels=fi, dtype=jnp.bfloat16)
        cat = mk((1, dd, hh, ww, 2 * fi))
        v = jax.jit(m.init)(key, jnp.zeros((1, 8, 8, 8, 2 * fi),
                                           jnp.float32))
        total += timed(lambda v, a, m=m: m.apply(v, a), (v, cat),
                       max(3, 10 * (4 - lvl)),
                       f"dec{lvl} DoubleConv {2*fi}->{fi}",
                       2 * 27 * dd * hh * ww * fi * 3 * fi)

    print(f"\nfull fwd {t_full*1e3:.1f} ms; sum of blocks "
          f"{total*1e3:.1f} ms (head/deep-sup/glue = diff)")


if __name__ == "__main__":
    main()
