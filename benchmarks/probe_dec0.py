"""Attribute the in-model cost of the LAST decoder stage (up4 + att4 +
concat + dec4 DoubleConv) — probe_tail.py showed the head is ~2.6 ms
and 'everything up to the dec4 output' is ~90 ms, so the dec0 stage
must hold the unattributed ~30+ ms the round-2 budget blamed on
"dec0 DC + head + glue".

Variants:
  A  trunk to dec4 output        (= probe_tail head=none)
  B  trunk to dec1 output (cut)  -> A - B = in-model dec0-stage cost
  standalone: up4, att4, DC 64->32 at the bucket, and the fused
  up+gate+concat+DC chain from in-model-shaped inputs.

Usage: python benchmarks/probe_dec0.py [D H W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import flax.linen as nn  # noqa: E402

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.unet3d import (  # noqa: E402
    KAIMING, AttentionGate3D, DoubleConv3D)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    FastConvTranspose3D)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pool import (  # noqa: E402
    max_pool3d)

RTT = [0.0]


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms")


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
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:46s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)")
    return dt


class Trunk(nn.Module):
    """UNet3D encoder+decoder; ``levels_back`` decoder stages are cut
    from the fine end (0 = full trunk to the dec4 output)."""

    levels_back: int = 0
    features: tuple = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.resize import (
            resize_trilinear)
        feats = tuple(self.features)
        x = x.astype(jnp.bfloat16)
        skips = []
        for i, f in enumerate(feats):
            x = DoubleConv3D(f, dtype=jnp.bfloat16, name=f"down{i}")(x)
            skips.append(x)
            x = max_pool3d(x, 2)
        x = DoubleConv3D(feats[-1] * 2, dtype=jnp.bfloat16,
                         name="bottleneck")(x)
        n_dec = len(feats) - self.levels_back
        for i, f in enumerate(reversed(feats)):
            if i >= n_dec:
                break
            skip = skips[-(i + 1)]
            x = FastConvTranspose3D(f, kernel_init=KAIMING,
                                    dtype=jnp.bfloat16,
                                    name=f"up{i}")(x)
            x_att = AttentionGate3D(f_int=max(f // 2, 1),
                                    dtype=jnp.bfloat16,
                                    name=f"att{i}")(g=x, x=skip)
            if x.shape[1:-1] != skip.shape[1:-1]:
                x = resize_trilinear(x, skip.shape[1:-1])
            x = DoubleConv3D(f, dtype=jnp.bfloat16, name=f"dec{i}")(
                jnp.concatenate([x_att, x], axis=-1))
        return x.astype(jnp.float32)[..., :1]   # tiny readback


def main():
    if len(sys.argv) == 4:
        D0, H0, W0 = (int(a) for a in sys.argv[1:4])
    else:
        D0, H0, W0 = 160, 192, 144
    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32),
                           jnp.bfloat16)

    x = mk((1, D0, H0, W0, 4))
    res = {}
    for back, label in ((0, "trunk to dec4 (full decoder)"),
                        (1, "trunk to dec1 (last stage cut)")):
        m = Trunk(levels_back=back)
        vs = jax.jit(m.init)(key, jnp.zeros((1, 64, 64, 64, 4),
                                            jnp.float32))
        res[back] = timed(lambda v, xx, m=m: m.apply(v, xx), (vs, x),
                          3, label)
    print(f"\nin-model dec0 stage (diff): "
          f"{(res[0]-res[1])*1e3:.2f} ms")

    # standalone pieces at the bucket
    g_in = mk((1, D0 // 2, H0 // 2, W0 // 2, 64))
    skip = mk((1, D0, H0, W0, 32))
    up = FastConvTranspose3D(32, kernel_init=KAIMING, dtype=jnp.bfloat16)
    v_up = jax.jit(up.init)(key, jnp.zeros((1, 4, 4, 4, 64),
                                           jnp.float32))
    timed(lambda v, a: up.apply(v, a), (v_up, g_in), 10,
          "standalone up4 64->32")

    gate = AttentionGate3D(f_int=16, dtype=jnp.bfloat16)
    v_g = jax.jit(gate.init)(key, jnp.zeros((1, 8, 8, 8, 32),
                                            jnp.float32),
                             jnp.zeros((1, 8, 8, 8, 32), jnp.float32))
    gg = mk((1, D0, H0, W0, 32))
    timed(lambda v, a, b: gate.apply(v, a, b), (v_g, gg, skip), 5,
          "standalone att4 (32)")

    dc = DoubleConv3D(32, dtype=jnp.bfloat16)
    cat = mk((1, D0, H0, W0, 64))
    v_dc = jax.jit(dc.init)(key, jnp.zeros((1, 8, 8, 8, 64),
                                           jnp.float32))
    timed(lambda v, a: dc.apply(v, a), (v_dc, cat), 5,
          "standalone dec4 DC 64->32")

    # the whole dec0 stage as one standalone chain
    def stage(vu, vg, vd, g, sk):
        u = up.apply(vu, g)
        a = gate.apply(vg, u, sk)
        return dc.apply(vd, jnp.concatenate([a, u], axis=-1))
    timed(stage, (v_up, v_g, v_dc, g_in, skip), 5,
          "standalone dec0 stage chain")


if __name__ == "__main__":
    main()
