"""Space-to-depth (2x2 on H,W) conv formulation for lane-starved blocks.

The U-Net's extremity blocks (enc0 / dec-last / head, Cout <= 32) are
~2/3 of the inference forward and run at the conv2d engine's lane bound:
zcat emits only Cout of the MXU's 128 lanes (benchmarks/RESULTS.md,
"crop-bucket block budget"). Folding a 2x2 spatial tile of H,W into
channels fixes the output side: a 3x3x3 stride-1 conv over (D, H, W, C)
is EXACTLY one 2x2 conv2d over the s2d grid (D, H/2, W/2, 4C) emitting
4*Cout channels (128 lanes for Cout=32) plus per-phase +-1 output
shifts. FLOP inflation is 16/9 (the 2x2 window of 2x2 phase tiles spans
a 4x4 original footprint, of which the 3x3 kernel uses 9 taps); lane
utilization rises 4x, so the formulation wins wherever the conv engine
is lane-bound rather than FLOP-bound.

Derivation: output row 2i+qh tap dh in {-1,0,1} touches original row
2i+qh+dh = 2(i+dh2)+ph with dh = qh - 2 + 2*kh2 + ph, kh2 in {0,1} the
s2d kernel tap and ph the input phase; taps outside {-1,0,1} are zero
in the packed kernel. The conv window is anchored so position a reads
s2d rows {a-1, a}; output phase qh then lives at conv position i+qh,
i.e. a static per-phase slice of a (H2+1, W2+1) VALID conv.

Everything between convs stays exact in the s2d layout (channel order
p-major: ch = (ph*2+pw)*C + c):
  * GroupNorm: group statistics pool over (spatial, phase, channels-in-
    group) — the same value set as the normal layout (group_norm_s2d).
  * ReLU / residual add / dropout-eval: elementwise.
  * 1x1 conv: phase-blocked matmul (conv1x1_s2d) — same weights.
  * MaxPool 2^3: max over the 4 phase channels + adjacent-z max; its
    output is the NEXT level in normal layout, so deeper levels are
    untouched (max_pool3d_from_s2d).
  * ConvTranspose k2s2: the matmul's (ph, pw) output phases ARE the
    s2d channels — the decoder's upsample produces s2d layout for free
    (conv_transpose3d_k2s2_s2d_out), skipping its H,W depth-to-space.
  * SE / global pooling: mean over (spatial, phase) per channel.

So one s2d at the model input and one d2s before the head BatchNorm are
the only layout conversions; parameters are identical to the normal
path (same DHWIO kernels, packed at trace time by pack_w_s2d).

No reference counterpart (the reference runs cuDNN NCDHW convs,
main.py:205-242); this is a TPU-specific lowering of the same math.
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth_hw(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, D, H/2, W/2, 4C), p-major channels
    (ch = (ph*2+pw)*C + c). H and W must be even."""
    B, D, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"s2d needs even H, W; got {(H, W)}")
    x = x.reshape(B, D, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, D, H // 2, W // 2, 4 * C)


def depth_to_space_hw(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth_hw`."""
    B, D, H2, W2, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, D, H2, W2, 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, D, 2 * H2, 2 * W2, C)


@lru_cache(maxsize=None)
def _pack_indices(ci: int, co: int):
    """Static gather map (idx, valid) building the (2, 2, 12ci, 4co)
    s2d conv2d kernel from a flat (3,3,3,ci,co) DHWIO kernel.

    Input channel order: kd-major, then phase, then channel
    (kd*4ci + p*ci + c); output: q-major (q*co + c)."""
    idx = np.zeros((2, 2, 12 * ci, 4 * co), np.int32)
    valid = np.zeros((2, 2, 12 * ci, 4 * co), bool)
    ar_ci = np.arange(ci)[:, None]
    ar_co = np.arange(co)[None, :]
    for kh2, kw2, qh, qw, ph, pw in itertools.product(range(2), repeat=6):
        dh = qh - 2 + 2 * kh2 + ph
        dw = qw - 2 + 2 * kw2 + pw
        if not (-1 <= dh <= 1 and -1 <= dw <= 1):
            continue
        p, q = ph * 2 + pw, qh * 2 + qw
        for kd in range(3):
            rows = kd * 4 * ci + p * ci + ar_ci           # (ci, 1)
            cols = q * co + ar_co                         # (1, co)
            flat = (((kd * 3 + (dh + 1)) * 3 + (dw + 1)) * ci * co
                    + ar_ci * co + ar_co)
            idx[kh2, kw2, rows, cols] = flat
            valid[kh2, kw2, rows, cols] = True
    # Return NUMPY arrays: converting to jnp here would capture a
    # DynamicJaxprTracer when first called under a trace (jnp constants
    # are trace-scoped), and the lru_cache would leak it into every
    # later trace (UnexpectedTracerError on the real-chip bench, where
    # jit(model.init) populates the cache before jit(run_batch) reads
    # it). NumPy indices are trace-independent and fine to cache.
    return idx, valid


def pack_w_s2d(w: jax.Array) -> jax.Array:
    """(3, 3, 3, Cin, Cout) DHWIO -> (2, 2, 12*Cin, 4*Cout) HWIO.

    Assembled from static slices + concats of w rather than the
    equivalent flat gather: a 1M-index gather costs ~1.6 ms per conv
    on-chip at runtime (TPU gathers are serial), while the structured
    form fuses to a trivial copy (benchmarks/profile_ps2d.py)."""
    ci, co = int(w.shape[3]), int(w.shape[4])
    z = jnp.zeros((ci, co), w.dtype)
    halves = []
    for kh2 in range(2):
        for kw2 in range(2):
            kd_blocks = []
            for kd in range(3):
                for ph in range(2):
                    for pw in range(2):
                        cols = []
                        for qh in range(2):
                            for qw in range(2):
                                dh = qh - 2 + 2 * kh2 + ph
                                dw = qw - 2 + 2 * kw2 + pw
                                cols.append(
                                    w[kd, dh + 1, dw + 1]
                                    if -1 <= dh <= 1 and -1 <= dw <= 1
                                    else z)
                        kd_blocks.append(jnp.concatenate(cols, axis=-1))
            halves.append(jnp.concatenate(kd_blocks, axis=0))
    return jnp.stack(halves).reshape(2, 2, 12 * ci, 4 * co)


def conv3d_s2d(x: jax.Array, w: jax.Array,
               bias: Optional[jax.Array] = None) -> jax.Array:
    """3x3x3 SAME conv, s2d-HW layout in and out.

    x: (B, D, H2, W2, 4*Cin) p-major; w: (3, 3, 3, Cin, Cout) DHWIO.
    Returns (B, D, H2, W2, 4*Cout) p-major, semantically equal to
    s2d(conv3d_zcat(d2s(x), w))."""
    B, D, H2, W2, C4 = x.shape
    ci = C4 // 4
    kd, kh, kw, wci, co = w.shape
    if (kd, kh, kw) != (3, 3, 3) or wci != ci:
        raise ValueError(f"conv3d_s2d: kernel {w.shape} does not match "
                         f"s2d input with {ci} base channels")
    # z handled zcat-style: channel-concat the three depth shifts
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xz = jnp.concatenate([xp[:, k:k + D] for k in range(3)], axis=-1)
    x2 = xz.reshape(B * D, H2, W2, 12 * ci)
    x2 = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = pack_w_s2d(w).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID", dimension_numbers=dn)
    # (B*D, H2+1, W2+1, 4co): phase q's output sits at offset (qh, qw)
    parts = [y[:, qh:qh + H2, qw:qw + W2,
               (qh * 2 + qw) * co:(qh * 2 + qw + 1) * co]
             for qh in range(2) for qw in range(2)]
    out = jnp.concatenate(parts, axis=-1).reshape(B, D, H2, W2, 4 * co)
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out.astype(x.dtype)


def conv1x1_s2d(x: jax.Array, w: jax.Array,
                bias: Optional[jax.Array] = None) -> jax.Array:
    """Pointwise conv in s2d layout: a phase-blocked channel matmul.

    x: (B, D, H2, W2, 4*Cin); w: (1,1,1,Cin,Cout) or (Cin,Cout)."""
    if w.ndim == 5:
        w = w.reshape(w.shape[-2], w.shape[-1])
    B, D, H2, W2, C4 = x.shape
    ci, co = w.shape
    xr = x.reshape(B, D, H2, W2, 4, ci)
    y = jax.lax.dot_general(
        xr, w.astype(x.dtype),
        dimension_numbers=(((5,), (0,)), ((), ())))
    y = y.reshape(B, D, H2, W2, 4 * co)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y.astype(x.dtype)


def group_norm_s2d(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                   num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over an s2d tensor — statistics identical to
    ops.norm.group_norm on the d2s'd tensor (each group's value set is
    the same; only the layout differs). gamma/beta are the NORMAL-layout
    (C,) parameters."""
    orig_dtype = x.dtype
    n, c4 = x.shape[0], x.shape[-1]
    c = c4 // 4
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by {num_groups}")
    # f32 ACCUMULATION over the native-dtype tensor (single-consumer
    # casts fuse into the reduces; a shared xf32 would materialize a
    # full f32 copy — see ops/norm.py group_norm)
    s1 = jnp.mean(x, axis=(1, 2, 3), dtype=jnp.float32)  # (N, 4C)
    s2 = jnp.mean(jnp.square(x), axis=(1, 2, 3), dtype=jnp.float32)
    g1 = jnp.mean(s1.reshape(n, 4, num_groups, -1), axis=(1, 3))  # (N,G)
    g2 = jnp.mean(s2.reshape(n, 4, num_groups, -1), axis=(1, 3))
    mean_c = jnp.repeat(g1, c // num_groups, axis=-1)    # (N, C)
    var_c = jnp.maximum(
        jnp.repeat(g2, c // num_groups, axis=-1) - jnp.square(mean_c),
        0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    gm = gamma.astype(jnp.float32)
    scale = jnp.tile(rstd_c * gm, (1, 4))                # (N, 4C)
    shift = jnp.tile(beta.astype(jnp.float32) - mean_c * rstd_c * gm,
                     (1, 4))
    shape = (n, 1, 1, 1, c4)
    return (x * scale.reshape(shape).astype(orig_dtype)
            + shift.reshape(shape).astype(orig_dtype))


def max_pool3d_from_s2d(x: jax.Array) -> jax.Array:
    """2x2x2 stride-2 max pool of an s2d tensor; returns the pooled
    level in NORMAL layout (B, D/2, H2, W2, C) — the H,W window is
    exactly the 4 phase channels."""
    B, D, H2, W2, C4 = x.shape
    m = jnp.max(x.reshape(B, D, H2, W2, 4, C4 // 4), axis=4)
    return jnp.maximum(m[:, 0::2], m[:, 1::2])


def global_avg_pool_s2d(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool3d(1) of an s2d tensor -> normal-layout (C,) mean."""
    B, D, H2, W2, C4 = x.shape
    # lane-preserving spatial reduce first (f32 accumulation, fused
    # cast), then the tiny (B, 4, C) phase fold
    m = (jnp.mean(x, axis=(1, 2, 3), dtype=jnp.float32)
         .reshape(B, 4, C4 // 4).mean(axis=1).astype(x.dtype))
    return m.reshape(B, 1, 1, 1, -1) if keepdims else m


def concat_s2d(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel concat of two s2d tensors, preserving p-major order
    (equals s2d(concat(d2s(a), d2s(b)), axis=-1))."""
    B, D, H2, W2, A4 = a.shape
    ar = a.reshape(B, D, H2, W2, 4, A4 // 4)
    br = b.reshape(B, D, H2, W2, 4, b.shape[-1] // 4)
    return jnp.concatenate([ar, br], axis=-1).reshape(
        B, D, H2, W2, A4 + b.shape[-1])


def conv_transpose3d_k2s2_s2d_out(x: jax.Array, w: jax.Array,
                                  bias: Optional[jax.Array] = None
                                  ) -> jax.Array:
    """ConvTranspose(k=2^3, s=2^3) from a NORMAL-layout input, emitting
    the 2x-resolution output directly in s2d-HW layout (the matmul's
    (ph, pw) kernel phases are the s2d channels — no H,W
    depth-to-space). x: (B, D, H, W, Cin); w: (2,2,2,Cin,Cout);
    returns (B, 2D, H, W, 4*Cout) p-major."""
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (2, 2, 2):
        raise ValueError(f"expected 2x2x2 kernel, got {w.shape}")
    w = w[::-1, ::-1, ::-1]         # flax/lax flip convention
    wm = w.reshape(8, ci, co).transpose(1, 0, 2).reshape(ci, 8 * co)
    y = jax.lax.dot_general(
        x, wm.astype(x.dtype),
        dimension_numbers=(((4,), (0,)), ((), ())))   # (B,D,H,W,8co)
    # channels are (a, ph, pw, co) a-major: interleave a into depth,
    # keep (ph, pw, co) = p-major s2d channels
    y = y.reshape(B, D, H, W, 2, 4 * co)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * D, H, W, 4 * co)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y.astype(x.dtype)
