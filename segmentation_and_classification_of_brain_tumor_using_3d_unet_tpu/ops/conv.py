"""Fast 3D convolution formulations for TPU.

XLA's native 3D convolution lowers poorly on TPU (measured ~10 TF/s for
the 32->32 @128^3 workhorse shape); the same contraction expressed as a
z-axis im2col (concatenate the three depth-shifted views channel-wise,
K = 3*Cin) followed by ONE 2D convolution hits XLA:TPU's mature conv2d
path (~24 TF/s measured, 2.3x faster). Transposed conv (k=2, s=2, the
U-Net upsampler) is a pure matmul + depth-to-space, which runs at full
MXU utilization instead of the generic conv_transpose lowering.

These are drop-in semantics for:
  * ``nn.Conv(features, (3,3,3), padding='SAME')``  (DoubleConv blocks,
    reference ``main.py:215-222``; head conv ``main.py:130``)
  * ``nn.ConvTranspose(features, (2,2,2), strides=(2,2,2))``
    (decoder upsampling, reference ``main.py:121``)

Kernel layouts match flax (DHWIO), so parameters are checkpoint-
compatible between the fast and native paths.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv3d_zcat(x: jax.Array, w: jax.Array,
                bias: Optional[jax.Array] = None,
                acc_dtype=jnp.float32) -> jax.Array:
    """3x3x3 SAME conv over NDHWC via z-concat + conv2d.

    x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout) [DHWIO].
    Returns (B, D, H, W, Cout) in x.dtype.
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (3, 3, 3):
        raise ValueError(f"conv3d_zcat expects 3x3x3 kernels, got {w.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # channel-stacked depth shifts: [z-1 | z | z+1], kd-major order
    xz = jnp.concatenate([xp[:, k:k + D] for k in range(3)], axis=-1)
    x2 = xz.reshape(B * D, H, W, 3 * C)
    w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, 3 * ci, co)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = y.reshape(B, D, H, W, co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def conv3d_ksplit(x: jax.Array, w: jax.Array,
                  bias: Optional[jax.Array] = None,
                  acc_dtype=jnp.float32) -> jax.Array:
    """3x3x3 SAME conv via kz-in-lanes: ONE conv2d with 3*Cout output
    channels (one Cout-block per depth tap kz), reduced by a 3-slice
    shifted add:

        y[z', kz] = conv2d(x[z'], w[kz])      (channels = 3*Cout)
        out[z]    = y[z-1, 0] + y[z, 1] + y[z+1, 2]

    Rationale: zcat's conv2d emits only Cout lanes, so the N<=64 convs
    that dominate the U-Net use a fraction of the MXU's 128 lanes;
    ksplit triples the lane count at identical FLOPs, paying a 3x
    intermediate write + fused add. Wins measured for Cout <= 64 at
    the full-res shapes (benchmarks/probe_ksplit.py); zcat remains
    better for wide Cout.

    x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout) [DHWIO].
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (3, 3, 3):
        raise ValueError(f"conv3d_ksplit expects 3x3x3 kernels, got "
                         f"{w.shape}")
    # (kh, kw, ci, kz*co): channel block kz holds that tap's 2D kernel
    w2 = w.transpose(1, 2, 3, 0, 4).reshape(3, 3, ci, 3 * co)
    x2 = x.reshape(B * D, H, W, C)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = y.reshape(B, D, H, W, 3 * co)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = (yp[:, 0:D, ..., 0 * co:1 * co]
           + yp[:, 1:1 + D, ..., 1 * co:2 * co]
           + yp[:, 2:2 + D, ..., 2 * co:3 * co])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


# Formulation switch point. Standalone, ksplit wins for every Cout <=
# 128 (benchmarks/probe_ksplit.py: 2.6x at 32->32 and 6.5x at the
# 32->16 head conv on the 160x192x144 crop bucket, where zcat's conv2d
# drops to 6-25 TF/s). IN-MODEL the picture flips for the DoubleConv
# chain: zcat's input concat fuses into the preceding GN/ReLU epilogue
# while ksplit's 3*Cout intermediate cannot be absorbed, so whole-model
# bench (bench.py, crop bucket 160x192x144) measured vol/s:
#   zcat-only 10.10 | co<=16 10.70 | co<=32 8.92 | co<=64 9.26 |
#   co<=128 9.25
# => ksplit only for the lane-starved head conv (Cout <= 16), where it
# is a pure win. Override with SEG3D_KSPLIT_MAX_CO for experiments.
import os as _os

KSPLIT_MAX_CO = int(_os.environ.get("SEG3D_KSPLIT_MAX_CO", "16"))
# zsum loses in-model at every threshold (bench.py crop bucket:
# zsum everywhere 6.86 vol/s, Cout<=32 7.16, disabled 10.70) despite
# winning standalone DoubleConv-chain probes — same fusion story as
# ksplit: XLA absorbs zcat's 3-shift concat into the preceding
# GN/ReLU epilogue, while zsum's three separate conv2d calls forfeit
# that fusion AND triple the conv-engine fixed costs. Disabled by
# default; kept (tested, exact) for experiments via SEG3D_ZSUM_MAX_CO.
ZSUM_MAX_CO = int(_os.environ.get("SEG3D_ZSUM_MAX_CO", "0"))

# Per-block formulation overrides for experiments: a comma-separated
# list of <module-path-substring>=<zcat|ksplit|zsum> pairs, e.g.
# SEG3D_FORM_OVERRIDE="dec4=ksplit,down0/conv2=zsum". Matched against
# the flax module path of the conv; first match wins. The uniform
# Cout-threshold sweeps switch encoder and decoder blocks together, so
# per-block wins (cf. the enc/dec int8 asymmetry) would cancel there.
_FORM_OVERRIDES = [
    tuple(pair.split("=", 1))
    for pair in _os.environ.get("SEG3D_FORM_OVERRIDE", "").split(",")
    if "=" in pair
]
_FORMS = {}


def conv3d_form(name: str):
    """Formulation function for a conv at flax path ``name`` (honors
    SEG3D_FORM_OVERRIDE; falls back to the measured default policy)."""
    for sub, form in _FORM_OVERRIDES:
        if sub in name:
            return _FORMS[form]
    return conv3d_3x3x3


def conv3d_3x3x3(x: jax.Array, w: jax.Array,
                 bias: Optional[jax.Array] = None) -> jax.Array:
    """Fastest measured 3x3x3 SAME conv formulation for the shape."""
    if w.shape[-1] <= KSPLIT_MAX_CO:
        return conv3d_ksplit(x, w, bias)
    if w.shape[-1] <= ZSUM_MAX_CO:
        return conv3d_zsum(x, w, bias)
    return conv3d_zcat(x, w, bias)


def conv3d_zsum(x: jax.Array, w: jax.Array,
                bias: Optional[jax.Array] = None,
                acc_dtype=jnp.float32) -> jax.Array:
    """3x3x3 SAME conv as three conv2d calls on ZERO-COPY z-windows of
    the (padded) input, summed:

        out[z] = sum_dz conv2d(x[z-1+dz], w[dz])

    Unlike zcat this materializes NO 3*Cin concat, and unlike ksplit
    NO 3*Cout intermediate — the z-windows are overlapping slices of
    one padded buffer, so the only extra traffic is re-reading x three
    times (which the conv2d engine must do anyway for kh taps) plus
    two partial-sum adds that XLA fuses. Wins on real DoubleConv
    chains: 2.1x vs zcat at 32->32 and 1.4x at 64->32 on the
    160x192x144 crop bucket (benchmarks/probe_dc.py).

    x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout) [DHWIO].
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (3, 3, 3):
        raise ValueError(f"conv3d_zsum expects 3x3x3 kernels, got "
                         f"{w.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xi = jax.lax.slice_in_dim(xp, dz, dz + D, axis=1)
        x2 = xi.reshape(B * D, H, W, C)
        w2 = w[dz]                                  # (3, 3, ci, co)
        dn = jax.lax.conv_dimension_numbers(
            x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x2, w2.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=dn)
        out = y if out is None else out + y
    out = out.reshape(B, D, H, W, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def conv3d_zcat_int8(x: jax.Array, w: jax.Array, act_scale: jax.Array,
                     bias: Optional[jax.Array] = None) -> jax.Array:
    """Quantized 3x3x3 SAME conv (inference only): int8 x int8 -> int32
    accumulation on the MXU, dequantized to bf16.

    Same zcat formulation as ``conv3d_zcat`` (z-shift concat + ONE
    conv2d) so the concat keeps fusing into the producer epilogue; the
    int8 operands additionally halve the concat/conv HBM traffic and
    double the MXU rate (measured 60.8 vs 31.8 TF/s at 32->32 on the
    160x192x144 crop bucket, benchmarks/probe_int8.py; 1.3-1.7x on full
    DoubleConv chains incl. all quant glue, probe_int8_dc.py).

    Quantization scheme:
      * activations: symmetric per-tensor int8 with a STATIC calibrated
        ``act_scale`` (see inference/quantize.py) so the quantize pass
        is purely elementwise and fusable;
      * weights: symmetric per-output-channel int8, quantized on the
        fly from the f32 params (27*ci*co elements — negligible), so
        checkpoints/param layout are unchanged.

    x: (B, D, H, W, Cin) any float; w: (3, 3, 3, Cin, Cout) f32;
    act_scale: scalar f32. Returns bf16.
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (3, 3, 3):
        raise ValueError(f"conv3d_zcat_int8 expects 3x3x3 kernels, got "
                         f"{w.shape}")
    w = w.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)),
                          1e-12) / 127.0                       # (co,)
    wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    def quant(v):
        return jnp.clip(jnp.round(v.astype(jnp.float32) / act_scale),
                        -127, 127).astype(jnp.int8)

    # Formulation (benchmarks/probe_int8_form.py, dec4-only in-model):
    #   qfirst 108.3 ms (XLA inserts ~4 GB of s8/s32 relayout copies
    #   around the int8 conv), qlast 90.8 (copy-free; quantize reads
    #   the same bf16 concat the bf16 path materializes), ksplit-int8
    #   117.2, bf16-accum variants within noise. bf16 baseline: 89.5.
    #   => int8 is perf-NEUTRAL in-model on this libtpu (the 1.9x MXU
    #   win is consumed by operand staging); default qlast.
    form = _os.environ.get("SEG3D_INT8_FORM", "qlast")
    acc_t = (jnp.bfloat16 if _os.environ.get("SEG3D_INT8_ACC") == "bf16"
             else jnp.int32)
    if form == "ksplit":
        # kz-in-lanes: no input concat at all — one conv2d on the raw
        # quantized tensor emitting 3*Cout channels, shifted 3-slice add
        xq = quant(x)
        w2 = wq.transpose(1, 2, 3, 0, 4).reshape(3, 3, ci, 3 * co)
        x2 = xq.reshape(B * D, H, W, C)
        dn = jax.lax.conv_dimension_numbers(
            x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=acc_t)
        y = y.reshape(B, D, H, W, 3 * co)
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = (yp[:, 0:D, ..., 0 * co:1 * co]
               + yp[:, 1:1 + D, ..., 1 * co:2 * co]
               + yp[:, 2:2 + D, ..., 2 * co:3 * co])
        out = out.astype(jnp.float32) * (act_scale * w_scale)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out.astype(jnp.bfloat16)
    if form == "qlast":
        # concat in the producer dtype (same fusion/layout as the bf16
        # path), quantize the concatenated tensor just before the conv
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xz = jnp.concatenate([xp[:, k:k + D] for k in range(3)], axis=-1)
        x2 = quant(xz.reshape(B * D, H, W, 3 * C))
    else:
        xq = quant(x)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xz = jnp.concatenate([xp[:, k:k + D] for k in range(3)], axis=-1)
        x2 = xz.reshape(B * D, H, W, 3 * C)
    w2 = wq.transpose(1, 2, 0, 3, 4).reshape(kh, kw, 3 * ci, co)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=acc_t)
    y = y.reshape(B, D, H, W, co)
    out = y.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(jnp.bfloat16)


def conv_transpose3d_k2s2(x: jax.Array, w: jax.Array,
                          bias: Optional[jax.Array] = None,
                          acc_dtype=jnp.float32) -> jax.Array:
    """ConvTranspose(kernel=2^3, stride=2^3) as matmul + depth-to-space.

    x: (B, D, H, W, Cin); w: (2, 2, 2, Cin, Cout).
    out[b, 2d+a, 2h+p, 2w+q] = sum_ci x[b,d,h,w,ci] * w[a,p,q,ci,co].
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (2, 2, 2):
        raise ValueError(f"expected 2x2x2 kernel, got {w.shape}")
    # flax/lax conv_transpose applies the kernel spatially flipped
    w = w[::-1, ::-1, ::-1]
    wm = w.reshape(8, ci, co).transpose(1, 0, 2).reshape(ci, 8 * co)
    y = jax.lax.dot_general(
        x, wm.astype(x.dtype),
        dimension_numbers=(((4,), (0,)), ((), ())))   # (B,D,H,W,8*co)
    y = y.reshape(B, D, H, W, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)         # B,D,2,H,2,W,2,co
    y = y.reshape(B, 2 * D, 2 * H, 2 * W, co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def conv1x1(x: jax.Array, w: jax.Array,
            bias: Optional[jax.Array] = None,
            acc_dtype=jnp.float32) -> jax.Array:
    """1x1x1 convolution as a channel matmul (XLA's generic 3D-conv
    lowering is pathologically slow for pointwise convs on TPU).

    x: (..., Cin); w: (1,1,1,Cin,Cout) or (Cin,Cout).
    """
    if w.ndim == 5:
        w = w.reshape(w.shape[-2], w.shape[-1])
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


class Conv1x1(nn.Module):
    """flax module for pointwise 3D conv via matmul; parameter layout
    identical to ``nn.Conv(features, (1,1,1))``.

    ``s2d``: input/output are in space-to-depth HW layout (ops/s2d.py);
    parameters stay in normal layout, so checkpoints are identical."""

    features: int
    use_bias: bool = True
    kernel_init: Any = KAIMING
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    s2d: bool = False
    # flat packed-s2d layout (ops/pallas/ps2d.py): __call__ takes one
    # flat array (or a tuple — the channel concat, never materialized)
    # plus the region plan. Parameters identical to the normal path.
    ps2d: bool = False

    @nn.compact
    def __call__(self, x, plan=None, cis=None, se0=None, psi0=None):
        if self.ps2d:
            from .pallas.ps2d import conv1x1_flat
            xfs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
            if cis is None:
                cis = tuple(xf.shape[-1] // 4 for xf in xfs)
            kernel = self.param("kernel", self.kernel_init,
                                (1, 1, 1, sum(cis), self.features),
                                self.param_dtype)
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)
                    if self.use_bias else None)
            return conv1x1_flat(
                [xf.astype(self.dtype) for xf in xfs],
                kernel.astype(self.dtype),
                None if bias is None else bias.astype(self.dtype),
                plan, cis=cis, se0=se0, psi0=psi0)
        cin = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, 1, cin, self.features),
                            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        if self.s2d:
            from .s2d import conv1x1_s2d
            return conv1x1_s2d(x.astype(self.dtype),
                               kernel.astype(self.dtype), bias)
        return conv1x1(x.astype(self.dtype), kernel.astype(self.dtype),
                       bias)


class FastConv3D(nn.Module):
    """flax module wrapping ``conv3d_zcat`` for 3^3 kernels (falls back to
    ``nn.Conv``-equivalent lax conv for other kernel sizes). Parameter
    names/shapes identical to ``nn.Conv``.

    ``quant_mode`` (inference-only int8 serving, inference/quantize.py):
      * "off"   — bf16 compute (default; the only mode used in training)
      * "calib" — bf16 compute, additionally sows the running
        max|activation| into the "quant_stats" collection
      * "int8"  — int8 MXU conv via ``conv3d_zcat_int8`` with the
        static activation scale read from the "quant" collection
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    use_bias: bool = False
    kernel_init: Any = KAIMING
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quant_mode: str = "off"
    # space-to-depth HW layout in and out (ops/s2d.py); 3x3x3 only,
    # parameters identical to the normal path
    s2d: bool = False
    # flat packed-s2d layout via the Pallas kernel (ops/pallas/ps2d.py):
    # __call__ takes one flat array or a tuple (the channel concat,
    # folded into the kernel's K dim) plus the conv's plan. Eval-only;
    # parameters identical to the normal path.
    ps2d: bool = False

    @nn.compact
    def __call__(self, x, plan=None, cis=None, in_scale=None,
                 in_shift=None, in_relu=False, in_mul0=None,
                 emit_stats=False, differentiable=False):
        k = tuple(self.kernel_size)
        if self.ps2d:
            if (k != (3, 3, 3) or self.use_bias
                    or self.quant_mode != "off"):
                raise ValueError(
                    "ps2d supports bias-free 3x3x3 bf16 convs only")
            from .pallas.ps2d import (_interpret_default,
                                      ps2d_conv3d_flat_multi,
                                      ps2d_conv3d_flat_train)
            xfs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
            if cis is None:
                cis = tuple(xf.shape[-1] // 4 for xf in xfs)
            kernel = self.param("kernel", self.kernel_init,
                                (*k, sum(cis), self.features),
                                self.param_dtype)
            if differentiable:
                # training path: custom_vjp kernels, no fused
                # transforms (their cotangents are not implemented)
                if (in_scale is not None or in_shift is not None
                        or in_relu or in_mul0 is not None
                        or emit_stats):
                    raise ValueError("fused transforms are eval-only")
                return ps2d_conv3d_flat_train(
                    tuple(xf.astype(self.dtype) for xf in xfs),
                    kernel.astype(self.dtype), plan, tuple(cis))
            return ps2d_conv3d_flat_multi(
                [xf.astype(self.dtype) for xf in xfs],
                kernel.astype(self.dtype), plan, cis=cis,
                in_scale=in_scale, in_shift=in_shift, in_relu=in_relu,
                in_mul0=in_mul0, emit_stats=emit_stats,
                interpret=_interpret_default())
        if emit_stats:
            raise ValueError("emit_stats requires the ps2d path")
        if self.s2d:
            # calib excluded: this branch has no absmax sow, so the
            # model disables s2d for calib/int8 (see UNet3D.use_s2d)
            if k != (3, 3, 3) or self.quant_mode != "off":
                raise ValueError("s2d supports 3x3x3 bf16 convs only")
            from .s2d import conv3d_s2d
            cin = x.shape[-1] // 4
            kernel = self.param("kernel", self.kernel_init,
                                (*k, cin, self.features),
                                self.param_dtype)
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)
                    if self.use_bias else None)
            return conv3d_s2d(x.astype(self.dtype),
                              kernel.astype(self.dtype), bias)
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*k, cin, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        if k == (3, 3, 3) and self.quant_mode == "calib":
            self.sow("quant_stats", "absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.float32(0.0),
                     reduce_fn=jnp.maximum)
        elif k == (3, 3, 3) and self.quant_mode == "int8":
            scale = self.variable(
                "quant", "act_scale",
                lambda: jnp.float32(1.0)).value
            return conv3d_zcat_int8(x, kernel, scale, bias)
        x = x.astype(self.dtype)
        if k == (3, 3, 3):
            fn = (conv3d_form("/".join(map(str, self.scope.path)))
                  if _FORM_OVERRIDES else conv3d_3x3x3)
            return fn(x, kernel.astype(self.dtype), bias)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1, 1), "SAME",
            dimension_numbers=dn)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


class FastConvTranspose3D(nn.Module):
    """flax module wrapping ``conv_transpose3d_k2s2``; parameter layout
    identical to ``nn.ConvTranspose(features, (2,2,2), strides=(2,2,2))``.

    ``s2d_out``: emit the 2x-resolution output directly in s2d-HW
    layout (the matmul's HW phases are the s2d channels, skipping the
    H,W depth-to-space — ops/s2d.py). Input stays normal layout."""

    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x, flat_plan=None):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (2, 2, 2, cin, self.features),
                            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        if flat_plan is not None:
            # emit the FLAT PADDED ps2d layout directly (fused
            # s2d-out + pack_flat — ops/pallas/ps2d.py)
            from .pallas.ps2d import up_k2s2_into_flat
            return up_k2s2_into_flat(
                x.astype(self.dtype), kernel.astype(self.dtype), bias,
                flat_plan)
        if self.s2d_out:
            from .s2d import conv_transpose3d_k2s2_s2d_out
            return conv_transpose3d_k2s2_s2d_out(
                x.astype(self.dtype), kernel.astype(self.dtype), bias)
        return conv_transpose3d_k2s2(
            x.astype(self.dtype), kernel.astype(self.dtype), bias)


_FORMS.update({"zcat": conv3d_zcat, "ksplit": conv3d_ksplit,
               "zsum": conv3d_zsum, "auto": conv3d_3x3x3})
