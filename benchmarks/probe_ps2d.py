"""Real-chip A/B: packed-s2d Pallas conv (ops/pallas/ps2d.py) vs the
XLA zcat conv (the production formulation) at the U-Net's lane-bound
extremity shapes. Kernel-only timing (tensors resident in the flat
packed form, as they are in-model); pack/unpack at region boundaries
is timed separately.

Baselines at (160,192,144): zcat 64->32 = 21.2 ms, 32->32 = 20.9 ms
(probe_dec0.py / probe_dcbarrier.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    conv3d_zcat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas.ps2d import (  # noqa: E402
    make_ps2d_plan, pack_flat, ps2d_conv3d_flat, unpack_flat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.s2d import (  # noqa: E402
    space_to_depth_hw)

RTT = [0.0]


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, args, iters, label, gflop=None):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if hasattr(v, "dtype") else v, a))
            return c + jnp.sum(out[..., :1].astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot
    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    dt = (min(reps) - RTT[0]) / iters
    tf = f"  {gflop / dt / 1e3:6.1f} TF/s" if gflop else ""
    print(f"{label:44s} {dt*1e3:8.2f} ms{tf}  (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    if len(sys.argv) == 4:
        D, H, W = (int(a) for a in sys.argv[1:4])
    else:
        D, H, W = 160, 192, 144
    measure_rtt()
    rng = np.random.default_rng(0)
    for ci, co in ((64, 32), (32, 32), (32, 16), (4, 32)):
        x = jnp.asarray(
            rng.normal(size=(1, D, H, W, ci)).astype(np.float32),
            jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * 0.1,
            jnp.bfloat16)
        gflop = 2 * 27 * D * H * W * ci * co / 1e9
        timed(lambda xx, ww: conv3d_zcat(xx, ww), (x, w), 3,
              f"zcat {ci}->{co}", gflop)

        plan = make_ps2d_plan(H // 2, W // 2, ci, co)
        print(f"  plan: Hb={plan.Hb} P={plan.P} K={plan.K} "
              f"GH={plan.H2 // plan.Hb}")
        xp = space_to_depth_hw(x)
        xf = pack_flat(xp, plan)
        # FLOPs the kernel actually does: 2 dots of (RY, K) x (K, N4)
        RY = (plan.Hb + 1) * plan.P
        kflop = (2 * 2 * RY * plan.K * plan.N4
                 * D * (plan.H2 // plan.Hb)) / 1e9
        timed(lambda xx, ww: ps2d_conv3d_flat(xx, ww, plan), (xf, w), 3,
              f"ps2d kernel {ci}->{co} (flat-resident)", gflop)
        print(f"  (kernel does {kflop:.0f} padded GFLOP vs {gflop:.0f} "
              f"dense)")
        # sanity: exactness on chip (one call, slice compare)
        y = unpack_flat(ps2d_conv3d_flat(xf, w, plan), plan)
        ref = space_to_depth_hw(conv3d_zcat(x, w))
        err = float(jnp.max(jnp.abs(
            y[:, :4].astype(jnp.float32) - ref[:, :4].astype(jnp.float32))))
        mx = float(jnp.max(jnp.abs(ref[:, :4].astype(jnp.float32))))
        print(f"  exactness (first 4 slices): max abs err {err:.2e} "
              f"(ref max {mx:.1f})", flush=True)
        timed(lambda xx: pack_flat(space_to_depth_hw(xx), plan), (x,), 3,
              f"  pack (s2d+pad+reshape) {ci}ch")


if __name__ == "__main__":
    main()
