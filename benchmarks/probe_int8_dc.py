"""Probe: int8 DoubleConv chains at the crop-bucket shape.

probe_int8.py measured bare zcat-conv2d int8 at ~1.9x bf16 for the hot
shapes (60.8 vs 31.8 TF/s at 32->32 @160x192x144). This probe checks
whether that survives in a REAL DoubleConv chain with the quantization
glue the model would pay:

  bf16 x -> quant(x; static scale) -> int8 conv -> int32 -> dequant
       -> +GN+ReLU (bf16) -> quant -> int8 conv -> ... -> +residual

Static per-layer activation scales (calibrated offline in the real
path) keep the quantize pass purely elementwise so XLA can fuse it
into the preceding GN/ReLU epilogue — the same fusion that makes zcat
free in-model. Weights are per-output-channel symmetric int8.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv3d_zcat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import (
    group_norm)

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


def timed(fn, args, iters, label, flops=None):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if v.dtype in (jnp.bfloat16, jnp.float32) else v, a))
            return c + jnp.sum(out, dtype=jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{label:44s} {dt*1e3:8.2f} ms{tf}  (compile {comp:.0f}s)",
          flush=True)
    return dt


def quant_act(x, scale):
    """bf16 -> int8 with a static per-layer scale (elementwise, fusable)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def conv_zcat_int8(x8, w8, deq_scale):
    """int8 zcat conv: int8 in, int32 accum, dequant to bf16.

    x8: (B,D,H,W,C) int8; w8: (3,3,3,ci,co) int8;
    deq_scale: (co,) f32 = act_scale * w_scale[co].
    """
    B, D, H, W, C = x8.shape
    co = w8.shape[-1]
    xp = jnp.pad(x8, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xz = jnp.concatenate([xp[:, k:k + D] for k in range(3)], axis=-1)
    x2 = xz.reshape(B * D, H, W, 3 * C)
    w2 = w8.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C, co)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = y.reshape(B, D, H, W, co)
    return (y.astype(jnp.float32) * deq_scale).astype(jnp.bfloat16)


def make_dc_bf16():
    def dc(x, w1, g1, b1, w2, g2, b2):
        h = conv3d_zcat(x, w1)
        h = jax.nn.relu(group_norm(h, g1, b1, 8))
        h = conv3d_zcat(h, w2)
        h = jax.nn.relu(group_norm(h, g2, b2, 8))
        if x.shape[-1] == h.shape[-1]:
            h = h + x
        return h
    return dc


def make_dc_int8(s_in, s_mid, dq1, dq2):
    def dc(x, w1q, g1, b1, w2q, g2, b2):
        h = conv_zcat_int8(quant_act(x, s_in), w1q, dq1)
        h = jax.nn.relu(group_norm(h, g1, b1, 8))
        h = conv_zcat_int8(quant_act(h, s_mid), w2q, dq2)
        h = jax.nn.relu(group_norm(h, g2, b2, 8))
        if x.shape[-1] == h.shape[-1]:
            h = h + x
        return h
    return dc


def main():
    measure_rtt()
    print(f"RTT {RTT[0]*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    D, H, W = 160, 192, 144

    for ci, co, iters in [(32, 32, 8), (64, 32, 6), (128, 64, 10)]:
        d, h, w_ = (D, H, W) if co == 32 else (80, 96, 72)
        x = jnp.asarray(rng.normal(size=(1, d, h, w_, ci)), jnp.bfloat16)
        w1 = rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * .05
        w2 = rng.normal(size=(3, 3, 3, co, co)).astype(np.float32) * .05
        g = jnp.ones((co,), jnp.float32)
        b = jnp.zeros((co,), jnp.float32)
        fl = 2 * 27 * d * h * w_ * co * (ci + co)

        timed(make_dc_bf16(),
              (x, jnp.asarray(w1, jnp.bfloat16), g, b,
               jnp.asarray(w2, jnp.bfloat16), g, b),
              iters, f"DC-bf16 {ci}->{co} @({d},{h},{w_})", fl)

        # per-channel symmetric weight quant
        ws1 = np.abs(w1).max(axis=(0, 1, 2, 3)) / 127.0
        ws2 = np.abs(w2).max(axis=(0, 1, 2, 3)) / 127.0
        w1q = jnp.asarray(np.round(w1 / ws1), jnp.int8)
        w2q = jnp.asarray(np.round(w2 / ws2), jnp.int8)
        s_act = 4.0 / 127.0          # static activation scale (~N(0,1))
        dq1 = jnp.asarray(s_act * ws1, jnp.float32)
        dq2 = jnp.asarray(s_act * ws2, jnp.float32)
        timed(make_dc_int8(s_act, s_act, dq1, dq2),
              (x, w1q, g, b, w2q, g, b),
              iters, f"DC-int8 {ci}->{co} @({d},{h},{w_})", fl)


if __name__ == "__main__":
    main()
