"""IN-MODEL A/B of dec0-stage rewrites (the 52.4 ms stage that
dominates the 89 ms forward — probe_dec0.py).

Standalone probes mislead at these shapes: the same 32->32 conv costs
~21 ms alone but ~9 ms inside a block (zcat fuses into the producer's
epilogue). So each candidate is measured as a FULL trunk variant:

  base   up -> gate -> concat -> DC(64->32)          [current model]
  split  up -> gate -> conv1a(att)+conv1b(up), proj split, no concat
  split_all   same split at every decoder level
  nocat_gate  gate output multiplied into up (elementwise) instead of
              concat — NOT exact, timing-only probe of the concat cost

Usage: python benchmarks/probe_dec0_forms.py [D H W]
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
    KAIMING, AttentionGate3D, DoubleConv3D, GroupNorm)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    FastConvTranspose3D, conv3d_zcat, conv1x1)
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
                if hasattr(v, "dtype") else v, a))
            return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot
    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:40s} {dt*1e3:8.2f} ms  (compile {comp:.0f}s)")
    return dt


class SplitDC(nn.Module):
    """DoubleConv whose conv1 + proj consume TWO inputs (a, u) without
    materializing cat(a, u): conv1(cat) == conv1a(a) + conv1b(u) by
    linearity. Parameter layout identical to DoubleConv3D (the split
    happens on the kernel at apply time)."""

    out_channels: int

    @nn.compact
    def __call__(self, a, u):
        co = self.out_channels
        ca, cu = a.shape[-1], u.shape[-1]
        w1 = self.param("conv1", KAIMING, (3, 3, 3, ca + cu, co),
                        jnp.float32)
        w2 = self.param("conv2", KAIMING, (3, 3, 3, co, co), jnp.float32)
        wp = self.param("proj", KAIMING, (1, 1, 1, ca + cu, co),
                        jnp.float32)
        w1 = w1.astype(jnp.bfloat16)
        wp = wp.astype(jnp.bfloat16)
        h = conv3d_zcat(a, w1[:, :, :, :ca]) + conv3d_zcat(
            u, w1[:, :, :, ca:])
        h = jax.nn.relu(GroupNorm(8, name="gn1")(h))
        h = conv3d_zcat(h, w2.astype(jnp.bfloat16))
        h = jax.nn.relu(GroupNorm(8, name="gn2")(h))
        res = conv1x1(a, wp[:, :, :, :ca]) + conv1x1(u, wp[:, :, :, ca:])
        res = GroupNorm(8, name="gn_proj")(res)
        return h + res


class Trunk(nn.Module):
    mode: str = "base"       # base | split | split_all | nocat_gate
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
        for i, f in enumerate(reversed(feats)):
            last = i == len(feats) - 1
            skip = skips[-(i + 1)]
            x = FastConvTranspose3D(f, kernel_init=KAIMING,
                                    dtype=jnp.bfloat16,
                                    name=f"up{i}")(x)
            x_att = AttentionGate3D(f_int=max(f // 2, 1),
                                    dtype=jnp.bfloat16,
                                    name=f"att{i}")(g=x, x=skip)
            if x.shape[1:-1] != skip.shape[1:-1]:
                x = resize_trilinear(x, skip.shape[1:-1])
            use_split = (self.mode == "split_all"
                         or (self.mode == "split" and last))
            if use_split:
                x = SplitDC(f, name=f"dec{i}")(x_att, x)
            elif self.mode == "nocat_gate" and last:
                # timing-only: gate as a multiplicative mask on up
                x = DoubleConv3D(f, dtype=jnp.bfloat16,
                                 name=f"dec{i}")(x_att * x)
            else:
                x = DoubleConv3D(f, dtype=jnp.bfloat16,
                                 name=f"dec{i}")(
                    jnp.concatenate([x_att, x], axis=-1))
        return x.astype(jnp.float32)[..., :1]


def main():
    if len(sys.argv) == 4:
        D0, H0, W0 = (int(a) for a in sys.argv[1:4])
    else:
        D0, H0, W0 = 160, 192, 144
    measure_rtt()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(1, D0, H0, W0, 4))
                    .astype(np.float32), jnp.bfloat16)
    for mode in ("base", "split", "split_all", "nocat_gate"):
        m = Trunk(mode=mode)
        vs = jax.jit(m.init)(key, jnp.zeros((1, 64, 64, 64, 4),
                                            jnp.float32))
        timed(lambda v, xx, m=m: m.apply(v, xx), (vs, x), 3,
              f"trunk mode={mode}")


if __name__ == "__main__":
    main()
