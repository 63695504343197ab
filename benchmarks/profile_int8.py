"""Attribute the int8 in-model regression (bench: 8.76 vol/s int8 vs
10.70 bf16, while DC-chain probes show int8 winning 1.3-1.7x).

Times, at the crop-bucket shape: (a) the FULL UNet3D forward bf16 vs
int8, (b) each encoder/decoder DoubleConv bf16 vs int8 standalone with
calibrated scales — the delta localizes whether the regression is in
the quantized blocks themselves or in the glue between them.
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


def timed(fn, args, iters, label):
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
    print(f"{label:46s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
        UNet3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.unet3d import (
        DoubleConv3D)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.quantize import (
        calibrate_int8)

    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    D0, H0, W0 = (int(a) for a in sys.argv[1:4]) if len(sys.argv) == 4 \
        else (160, 192, 144)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32),
                           jnp.bfloat16)

    # ---- full model ----
    model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
    x = mk((1, D0, H0, W0, 4))
    vs = jax.jit(model.init, static_argnames=("train",))(
        key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)
    timed(lambda v, xx: model.apply(v, xx, train=False)["logits"],
          (vs, x), 3, f"UNet3D bf16 full fwd @{D0}x{H0}x{W0}")

    qvs = calibrate_int8(model, vs, [x[0]])
    qmodel = model.clone(quant_mode="int8")
    timed(lambda v, xx: qmodel.apply(v, xx, train=False)["logits"],
          (qvs, x), 3, f"UNet3D int8 full fwd @{D0}x{H0}x{W0}")

    # decoder-only: decoder DC outputs have a single consumer, so the
    # multi-consumer materialization tax (skip+pool+deep) is avoided
    dm = model.clone(quant_blocks=("dec",))
    dqvs = calibrate_int8(dm, vs, [x[0]])
    dqmodel = dm.clone(quant_mode="int8")
    timed(lambda v, xx: dqmodel.apply(v, xx, train=False)["logits"],
          (dqvs, x), 3, f"UNet3D int8[dec-only] fwd @{D0}x{H0}x{W0}")

    em = model.clone(quant_blocks=("down", "bottleneck"))
    eqvs = calibrate_int8(em, vs, [x[0]])
    eqmodel = em.clone(quant_mode="int8")
    timed(lambda v, xx: eqmodel.apply(v, xx, train=False)["logits"],
          (eqvs, x), 3, f"UNet3D int8[enc-only] fwd @{D0}x{H0}x{W0}")

    for blocks, tag in [(("dec4",), "dec4-only"),
                        (("dec0", "dec1", "dec2", "dec3"), "dec0-3")]:
        bm = model.clone(quant_blocks=blocks)
        bqvs = calibrate_int8(bm, vs, [x[0]])
        bqmodel = bm.clone(quant_mode="int8")
        timed(lambda v, xx, m=bqmodel: m.apply(v, xx, train=False)["logits"],
              (bqvs, x), 3, f"UNet3D int8[{tag}] fwd @{D0}x{H0}x{W0}")

    if "--blocks" not in sys.argv:
        return
    # ---- standalone DoubleConvs, bf16 vs int8 ----
    spatial = [(D0 >> k, H0 >> k, W0 >> k) for k in range(3)]
    cases = [("enc0", 4, 32, spatial[0]),
             ("enc1", 32, 64, spatial[1]),
             ("enc2", 64, 128, spatial[2]),
             ("dec1", 128, 64, spatial[1]),
             ("dec0", 64, 32, spatial[0])]
    for name, ci, co, (dd, hh, ww) in cases:
        xx = mk((1, dd, hh, ww, ci))
        m = DoubleConv3D(out_channels=co, dtype=jnp.bfloat16)
        v = jax.jit(m.init)(key, jnp.zeros((1, 8, 8, 8, ci), jnp.float32))
        iters = 6 if dd == D0 else 10
        timed(lambda v, a, m=m: m.apply(v, a), (v, xx), iters,
              f"{name} DC bf16 {ci}->{co} @({dd},{hh},{ww})")

        s = float(jnp.max(jnp.abs(xx.astype(jnp.float32)))) / 127.0
        qv = {**v, "quant": {"conv1": {"act_scale": jnp.float32(s)},
                             "conv2": {"act_scale": jnp.float32(s)}}}
        mq = DoubleConv3D(out_channels=co, dtype=jnp.bfloat16,
                          quant_mode="int8")
        timed(lambda v, a, mq=mq: mq.apply(v, a), (qv, xx), iters,
              f"{name} DC int8 {ci}->{co} @({dd},{hh},{ww})")


if __name__ == "__main__":
    main()
