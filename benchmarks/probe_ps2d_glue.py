"""Decompose the in-model ps2d integration tax.

probe_ps2d.py showed the kernel wins 1.6-2.9x per conv standalone, yet
bench.py --ps2d LOSES in-model (9.57 vs 10.79 vol/s = +11.8 ms/vol).
Conv wins at the dec0 stage are ~-22 ms, so the flat-stage glue +
layout entry/exit must cost ~+34 ms over the normal-layout stage.
This probe times each component at the exact in-model shapes
(bucket 160x192x144, f0=32) so the tax table is measured, not argued.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.unet3d import (  # noqa: E402
    AttentionGate3D, DoubleConv3D, GroupNorm)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas import ps2d as P  # noqa: E402
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.s2d import (  # noqa: E402
    depth_to_space_hw, space_to_depth_hw)

RTT = [0.0]


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, args, label, iters=3):
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
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:52s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    D, H, W = 160, 192, 144
    f0 = 32
    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32),
                           jnp.bfloat16)

    x_norm = arr(1, D, H, W, f0)           # 32ch normal layout
    x_s2d = space_to_depth_hw(x_norm)      # (1,D,H2,W2,128)
    plan = P.make_ps2d_plan(H // 2, W // 2, f0, f0)
    mplan = P.make_ps2d_plan_multi(H // 2, W // 2, (f0, f0), f0)
    x_flat = P.pack_flat(x_s2d, plan)
    g_flat = P.pack_flat(x_s2d, plan)

    print("== layout entry/exit (32ch, bucket) ==")
    timed(lambda x: space_to_depth_hw(x), (x_norm,), "s2d_hw (normal->packed)")
    timed(lambda x: P.pack_flat(x, plan), (x_s2d,), "pack_flat (packed->flat)")
    timed(lambda x: P.normal_to_flat(x, plan), (x_norm,),
          "normal_to_flat (fused s2d+pad)")
    timed(lambda x: P.unpack_flat(x, plan), (x_flat,), "unpack_flat")
    timed(lambda x: P.flat_to_normal(x, plan), (x_flat,), "flat_to_normal")
    timed(lambda x: depth_to_space_hw(x), (x_s2d,), "d2s_hw (packed->normal)")

    print("== glue: GroupNorm(8) 32ch ==")
    gn_n = GroupNorm(8)
    vn = gn_n.init(key, x_norm)
    timed(lambda v, x: gn_n.apply(v, x), (vn, x_norm), "GN normal (XLA)")
    gn_f = GroupNorm(8, ps2d=True)
    vf = gn_f.init(key, x_flat, plan)
    timed(lambda v, x: gn_f.apply(v, x, plan), (vf, x_flat), "GN flat")

    print("== glue: AttentionGate3D f_int=16 ==")
    ag_n = AttentionGate3D(f_int=16, dtype=jnp.bfloat16, fast=True)
    van = ag_n.init(key, g=x_norm, x=x_norm)
    timed(lambda v, g, x: ag_n.apply(v, g=g, x=x), (van, x_norm, x_norm),
          "gate normal")
    ag_f = AttentionGate3D(f_int=16, dtype=jnp.bfloat16, fast=True,
                           ps2d=True)
    vaf = ag_f.init(key, g=g_flat, x=x_flat, plan=P.input_plan(mplan, 0))
    timed(lambda v, g, x: ag_f.apply(v, g=g, x=x,
                                     plan=P.input_plan(mplan, 0)),
          (vaf, g_flat, x_flat), "gate flat")

    print("== stage: DoubleConv3D dec0 (64->32) ==")
    cat_norm = arr(1, D, H, W, 2 * f0)
    dc_n = DoubleConv3D(f0, dtype=jnp.bfloat16, fast=True)
    vdn = dc_n.init(key, cat_norm)
    timed(lambda v, x: dc_n.apply(v, x), (vdn, cat_norm),
          "DC normal (concat input)")
    dc_f = DoubleConv3D(f0, dtype=jnp.bfloat16, fast=True, ps2d=True)
    vdf = dc_f.init(key, (x_flat, g_flat), plan=mplan)
    timed(lambda v, a, b: dc_f.apply(v, (a, b), plan=mplan),
          (vdf, x_flat, g_flat), "DC flat (2-input concat-fold)")

    print("== composed: the whole dec0 flat stage as integrated ==")
    # normal: gate -> concat -> DC            (skip, up both normal)
    def stage_norm(vag, vdc, skip, up):
        a = ag_n.apply(vag, g=up, x=skip)
        return dc_n.apply(vdc, jnp.concatenate([a, up], axis=-1))
    timed(stage_norm, (van, vdn, x_norm, x_norm), "stage normal")

    # flat as in models/unet3d.py: pack both -> gate -> DC -> exit
    def stage_flat(vag, vdc, skip, up_s2d):
        up_f = P.pack_flat(up_s2d, P.input_plan(mplan, 1))
        skip_f = P.pack_flat(space_to_depth_hw(skip),
                             P.input_plan(mplan, 0))
        a = ag_f.apply(vag, g=up_f, x=skip_f, plan=P.input_plan(mplan, 0))
        y = dc_f.apply(vdc, (a, up_f), plan=mplan)
        return P.flat_to_normal(y, mplan)
    timed(stage_flat, (vaf, vdf, x_norm, x_s2d), "stage flat (integrated)")


if __name__ == "__main__":
    main()
