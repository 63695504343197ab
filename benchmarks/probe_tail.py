"""Attribute the in-model cost of the UNet3D tail (dec0 DC -> head)
and the inter-block glue that the per-block standalone budget
(profile_fwd.py) cannot see.

Round-3 roofline (benchmarks/roofline.json): measured fwd 89.0 ms vs a
42.9 ms lane-bound floor. The per-block budget attributes ~29-50 ms to
"dec0 DC + head + glue by difference". This probe pins it down by
timing VARIANT MODELS (same trunk, different tails) and standalone
chains:

  A  full model (logits)
  B  head replaced by a single Conv1x1 32->4   => in-model head cost
  C  head without BatchNorm (conv-ReLU-1x1)    => in-model BN cost
  D  standalone head chain on a (1,D,H,W,32) input
  E  standalone dec0 tail: up+gate+concat+DC (in-model-shaped inputs)

Usage: python benchmarks/probe_tail.py [D H W]
"""

import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import flax.linen as nn  # noqa: E402

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (  # noqa: E402
    UNet3D)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.unet3d import (  # noqa: E402
    KAIMING, AttentionGate3D, DoubleConv3D)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    Conv1x1, FastConv3D, FastConvTranspose3D)

RTT = [0.0]


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms")


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


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


class HeadVariantUNet(UNet3D):
    """UNet3D with a swappable head: 'full' (conv3-BN-ReLU-conv1),
    'nobn' (conv3-ReLU-conv1), 'conv1' (single 1x1), 'none' (returns
    the 32ch dec0 output as 'logits')."""

    head_mode: str = "full"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = tuple(self.features)
        x = x.astype(self.dtype)
        skips = []
        for i, f in enumerate(feats):
            x = DoubleConv3D(f, dtype=self.dtype, name=f"down{i}")(x)
            skips.append(x)
            from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pool import (
                max_pool3d)
            x = max_pool3d(x, 2)
        x = DoubleConv3D(feats[-1] * 2, dtype=self.dtype,
                         name="bottleneck")(x)
        from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.resize import (
            resize_trilinear)
        for i, f in enumerate(reversed(feats)):
            skip = skips[-(i + 1)]
            x = FastConvTranspose3D(f, kernel_init=KAIMING,
                                    dtype=self.dtype, name=f"up{i}")(x)
            x_att = AttentionGate3D(f_int=max(f // 2, 1),
                                    dtype=self.dtype,
                                    name=f"att{i}")(g=x, x=skip)
            if x.shape[1:-1] != skip.shape[1:-1]:
                x = resize_trilinear(x, skip.shape[1:-1])
            x = DoubleConv3D(f, dtype=self.dtype, name=f"dec{i}")(
                jnp.concatenate([x_att, x], axis=-1))

        if self.head_mode == "none":
            return {"logits": x.astype(jnp.float32)}
        if self.head_mode == "conv1":
            logits = Conv1x1(self.out_channels, kernel_init=KAIMING,
                             dtype=self.dtype, name="head_out")(x)
            return {"logits": logits.astype(jnp.float32)}
        h = FastConv3D(feats[0] // 2, (3, 3, 3), use_bias=True,
                       kernel_init=KAIMING, dtype=self.dtype,
                       name="head_conv")(x)
        if self.head_mode == "full":
            h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="head_bn")(h)
        h = nn.relu(h)
        logits = Conv1x1(self.out_channels, kernel_init=KAIMING,
                         dtype=self.dtype, name="head_out")(h)
        return {"logits": logits.astype(jnp.float32)}


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
    results = {}
    for mode in ("full", "nobn", "conv1", "none"):
        m = HeadVariantUNet(out_channels=4, dtype=jnp.bfloat16,
                            head_mode=mode)
        vs = jax.jit(m.init, static_argnames=("train",))(
            key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)
        results[mode] = timed(
            lambda v, xx, m=m: m.apply(v, xx, train=False)["logits"],
            (vs, x), 3, f"variant head={mode}")

    # reference: the real model (should ~match variant 'full')
    real = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
    vs = jax.jit(real.init, static_argnames=("train",))(
        key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)
    results["real"] = timed(
        lambda v, xx: real.apply(v, xx, train=False)["logits"],
        (vs, x), 3, "real UNet3D (eval head: bf16 BN)")

    # standalone head chain
    class Head(nn.Module):
        mode: str = "full"

        @nn.compact
        def __call__(self, x):
            h = FastConv3D(16, (3, 3, 3), use_bias=True,
                           kernel_init=KAIMING, dtype=jnp.bfloat16,
                           name="head_conv")(x)
            if self.mode == "full":
                h = nn.BatchNorm(use_running_average=True,
                                 dtype=jnp.bfloat16, name="head_bn")(h)
            h = nn.relu(h)
            return Conv1x1(4, kernel_init=KAIMING, dtype=jnp.bfloat16,
                           name="head_out")(h).astype(jnp.float32)

    h32 = mk((1, D0, H0, W0, 32))
    for mode in ("full", "nobn"):
        hm = Head(mode=mode)
        vs_h = jax.jit(hm.init)(key, jnp.zeros((1, 8, 8, 8, 32),
                                               jnp.float32))
        results[f"head_sa_{mode}"] = timed(
            lambda v, a, hm=hm: hm.apply(v, a), (vs_h, h32), 10,
            f"standalone head chain ({mode})")

    print("\n--- attribution ---")
    print(f"in-model head (full-conv1):   "
          f"{(results['full']-results['conv1'])*1e3:7.2f} ms")
    print(f"in-model BN (full-nobn):      "
          f"{(results['full']-results['nobn'])*1e3:7.2f} ms")
    print(f"in-model 1x1 tail (conv1-none):"
          f"{(results['conv1']-results['none'])*1e3:6.2f} ms")
    print(f"standalone head chain:        "
          f"{results['head_sa_full']*1e3:7.2f} ms")
    print(f"variant-vs-real sanity:       "
          f"{(results['real']-results['full'])*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
