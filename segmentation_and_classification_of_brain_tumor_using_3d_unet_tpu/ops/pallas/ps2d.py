"""Packed-s2d Pallas conv — the in-kernel space-to-depth formulation.

VERDICT r2 left ONE conv configuration unmeasured: s2d with the packing
done *inside the kernel's memory system* instead of as XLA graph ops.
The XLA s2d A/B (ops/s2d.py, RESULTS.md) lost 22% because the pack
materialized a 12*Cin-channel tensor per conv in HBM and the per-phase
output slices defeated consumer fusion. This kernel keeps every piece
of that traffic out of HBM:

  * The tensor lives in a FLAT HALO-PADDED packed form
    ``(B, D, (H2+3)*P, 4ci)`` with row r = a*P + b over padded packed
    coords (a, b), P = align16(W2+2). In this form every tap of the
    packed 2x2 conv (ops/s2d.py derivation) is a pure ROW SHIFT:
    operand(kh2, kw2) = rows [kh2*P + kw2 : ...]. Rows shifted by
    kh2*P are sublane-aligned slices (P % 16 == 0) — free. The odd
    kw2=1 shift is a single +1-row VMEM copy of each landed slab (1x
    slab bytes; HBM DMA offsets must be 8-row-tile aligned, so the
    shift cannot ride the DMA) — nothing like the 13.5x im2col VMEM
    amplification that killed the wtile kernel (RESULTS.md round 2).
  * Depth is streamed with a fori_loop inside each grid step (grid =
    (B, H2/Hb) only), dodging the ~15 us/grid-step overhead that a
    (B, hb, D) grid would pay.
  * The 3 resident z-slices live in the LANE dimension (a mod-4 slot
    ring of lane blocks), so each depth step is exactly TWO MXU calls
    (one per kh2): (M, 8*4ci) @ (8*4ci, 4co), K spanning
    (kw2, slot)-blocks with rotation-precomputed weights (the block of
    the unused 4th slot is zero — mod-4 lets the slice d+2 prefetch
    overlap compute, which a mod-3 ring cannot).
  * The s2d->output phase recombination (out[h2, w2, q] =
    y[h2+qh, w2+qw, q]) and the halo-column masking fuse into the
    f32->bf16 output-stage cast — per-phase row-shifted 32-lane column
    copies, not HBM round-trips.

Output is the SAME flat padded form, so consecutive convs chain with
no repacking; ``pack_flat`` / ``unpack_flat`` convert at region
boundaries. Semantics match ``ops.s2d.conv3d_s2d`` (== conv3d_zcat ==
torch Conv3d(3,3,3,pad=1,bias=False), reference ``main.py:215-222``)
at bf16 precision with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..s2d import pack_w_s2d

LANE = 128
GUARD = 16          # zero guard rows above the y buffer (phase recomb
#                     reads at row offsets down to -1)


class PS2DPlan(NamedTuple):
    H2: int      # packed height
    W2: int      # packed width
    P: int       # padded row pitch = align16(W2 + 2)
    Hb: int      # output h2 rows per grid step (divides H2)
    RT: int      # flat rows = (H2 + 3) * P (one trailing pad row
    #              block doubles as the DMA guard)
    C4: int      # input lanes = 4 * ci_pad (128-multiple)
    N4: int      # output lanes = 4 * co_pad (128-multiple)
    K: int       # matmul K = 8 * C4 (2 kw2-copies x 4 slots)
    ci: int      # real input channels (<= C4 // 4)
    co: int      # real output channels (<= N4 // 4)
    C4s: tuple = ()   # per-input padded lane widths (sum == C4); the
    #                   kernel takes len(C4s) HBM inputs whose channel
    #                   CONCAT it convolves — the concat lives only in
    #                   the K dimension (conv(cat(a,b)) == conva + convb
    #                   by linearity), never materialized in HBM


def _align16(n: int) -> int:
    return -(-n // 16) * 16


def _align32(n: int) -> int:
    return -(-n // 32) * 32


def make_ps2d_plan(H2: int, W2: int, ci: int, co: int,
                   vmem_budget: int = 13 * 2 ** 20) -> Optional[PS2DPlan]:
    """Geometry for one conv; None if ineligible (caller falls back to
    the XLA formulation). Channel counts that are not 32-multiples are
    zero-padded (lane tiles are 128 wide and DMA slices must be
    tile-aligned): enc0's ci=4 and the head's co=16 ride the same
    kernel at padded-lane FLOP cost, which is still far below their
    zcat lane bound."""
    C4, N4 = 4 * _align32(ci), 4 * _align32(co)
    P = _align16(W2 + 2)
    K = 8 * C4
    for Hb in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if H2 % Hb:
            continue
        RS = (Hb + 2) * P
        HbP = Hb * P
        vmem = (RS * K * 2                        # xbuf (lane ring)
                + 3 * (GUARD + (Hb + 1) * P) * N4 * 4  # ybuf + dot temps
                + 2 * (HbP + 3 * P) * N4 * 2      # out stages
                + 4 * 2 * K * N4 * 2)             # rotated weights
        if vmem <= vmem_budget:
            return PS2DPlan(H2, W2, P, Hb, (H2 + 3) * P,
                            C4, N4, K, ci, co, (C4,))
    return None


def make_ps2d_plan_multi(H2: int, W2: int, cis, co: int,
                         vmem_budget: int = 13 * 2 ** 20
                         ) -> Optional[PS2DPlan]:
    """Plan for a conv over the channel-concat of len(cis) inputs."""
    C4s = tuple(4 * _align32(ci) for ci in cis)
    base = make_ps2d_plan(H2, W2, sum(C4s) // 4, co,
                          vmem_budget=vmem_budget)
    if base is None:
        return None
    return base._replace(ci=sum(cis), C4s=C4s)


def input_plan(plan: PS2DPlan, i: int) -> PS2DPlan:
    """Single-input view of input ``i`` (for pack_flat of that input)."""
    return plan._replace(C4=plan.C4s[i], K=8 * plan.C4s[i],
                         ci=plan.C4s[i] // 4, C4s=(plan.C4s[i],))


def pack_flat(xp: jax.Array, plan: PS2DPlan) -> jax.Array:
    """Packed (B, D, H2, W2, 4ci) -> flat padded (B, D, RT, C4).

    Channel padding is PHASE-BLOCKED (p-major: lane = p*cpad + c) so
    the padded layout stays p-major for the packed weights."""
    B, D, H2, W2, Ci4 = xp.shape
    ci, cpad, P = Ci4 // 4, plan.C4 // 4, plan.P
    if cpad != ci:
        xp = jnp.pad(xp.reshape(B, D, H2, W2, 4, ci),
                     ((0, 0),) * 5 + ((0, cpad - ci),)).reshape(
            B, D, H2, W2, 4 * cpad)
    # ONE fused pad (a second pad call would materialize the tensor
    # twice); the extra trailing row block is the +1-row DMA guard
    x = jnp.pad(xp, ((0, 0), (0, 0), (1, 2), (1, P - W2 - 1), (0, 0)))
    return x.reshape(B, D, (H2 + 3) * P, plan.C4)


def _relaxed() -> bool:
    """Opt-in (SEG3D_PS2D_RELAXED=1) relaxation of the W2 % 8 layout
    gates on the relayout/up kernels. The 8-row gate was precautionary
    (Mosaic relayouts for unaligned second-minor dims); interpret mode
    always takes the kernel path so tests pin exactness at unaligned
    W2, and the on-chip opt-in isolates a lowering failure to its own
    A/B step. Level-1 geometry at the crop bucket has W2 = 36."""
    import os
    return os.environ.get("SEG3D_PS2D_RELAXED") == "1"


def _pack_flat_kernel(x_ref, o_ref, *, Db: int, H2: int, W2: int):
    # x_ref (1, Db, H2, W2, C4) -> o_ref (1, Db, H2+3, P, C4): data at
    # [1:H2+1, 1:W2+1), zeros elsewhere (halo + pitch padding). The
    # column offset 1 is an unaligned sublane store (a VPU relayout,
    # like the conv kernel's kw2 shift) — DMA cannot land it directly.
    o_ref[...] = jnp.zeros_like(o_ref)
    for i in range(Db):
        o_ref[0, i, 1:H2 + 1, 1:W2 + 1, :] = x_ref[0, i]


def pack_flat_fast(xp: jax.Array, plan: PS2DPlan,
                   interpret: Optional[bool] = None) -> jax.Array:
    """``pack_flat`` as a Pallas relayout kernel.

    The XLA form (one fused jnp.pad) still materializes the padded
    tensor through XLA's layout machinery (~5.4 ms standalone for the
    32ch level-0 shape vs ~0.8 ms of pure HBM traffic —
    benchmarks/RESULTS.md round 3 "integration tax"). This kernel
    streams (Db, H2, W2, C4) slabs through VMEM with automatic
    double-buffering and writes the flat padded form directly. Falls
    back to the XLA form when the shape is ineligible (channel-padded
    inputs, odd W2)."""
    B, D, H2, W2, C4 = xp.shape
    if interpret is None:
        interpret = _interpret_default()
    if (C4 != plan.C4 or (H2, W2) != (plan.H2, plan.W2)
            or (W2 % 8 and not (interpret or _relaxed()))
            or C4 % 128):
        return pack_flat(xp, plan)
    unit = (H2 * W2 + (H2 + 3) * plan.P) * C4 * xp.dtype.itemsize
    Db = 1
    for cand in (8, 5, 4, 3, 2):
        if D % cand == 0 and 2 * cand * unit <= 18 * 2 ** 20:
            Db = cand
            break
    kern = functools.partial(_pack_flat_kernel, Db=Db, H2=H2, W2=W2)
    yf = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, D, H2 + 3, plan.P, C4),
                                       xp.dtype),
        grid=(B, D // Db),
        in_specs=[pl.BlockSpec((1, Db, H2, W2, C4),
                               lambda b, d: (b, d, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Db, H2 + 3, plan.P, C4),
                               lambda b, d: (b, d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 2 ** 20),
        interpret=interpret,
    )(xp)
    # merging (H2+3, P) -> RT is layout-free (adjacent dims)
    return yf.reshape(B, D, plan.RT, C4)


def _up_flat_kernel(x_ref, w_ref, b_ref, o_ref, *, H2: int, W2: int):
    # x_ref (1, 1, H2, W2, ci); w_ref (2, ci, C4); b_ref (1, C4);
    # o_ref (1, 1, 2, H2+3, P, C4). One input depth slice produces the
    # two output depth phases (k2s2 transpose conv is a per-phase 1x1
    # matmul); each lands directly in the flat padded layout.
    o_ref[...] = jnp.zeros_like(o_ref)
    ci = x_ref.shape[-1]
    C4 = o_ref.shape[-1]
    xs = x_ref[0, 0].reshape(H2 * W2, ci)
    for a in range(2):
        y = jnp.dot(xs, w_ref[a], preferred_element_type=jnp.float32)
        y = y + b_ref[0:1, :]
        o_ref[0, 0, a, 1:H2 + 1, 1:W2 + 1, :] = (
            y.astype(o_ref.dtype).reshape(H2, W2, C4))


def up_k2s2_into_flat(x: jax.Array, w: jax.Array,
                      bias: Optional[jax.Array], plan: PS2DPlan,
                      interpret: Optional[bool] = None) -> jax.Array:
    """ConvTranspose(k=2^3, s=2^3) emitting the FLAT PADDED layout
    directly — fuses ``conv_transpose3d_k2s2_s2d_out`` + ``pack_flat``
    into one kernel (the XLA pair costs an interleave transpose plus a
    materialized pad; the matmul here is tiny next to that traffic).

    x: (B, D2, H2, W2, Cin) normal layout; w: (2,2,2,Cin,Cout) flax
    ConvTranspose convention; returns (B, 2*D2, RT, 4*Cout) bf16 with
    the flat-layout zero-pad invariant. Semantics ==
    ``pack_flat(conv_transpose3d_k2s2_s2d_out(x, w, bias), plan)``
    (falls back to exactly that when the shape is ineligible)."""
    B, D2, H2, W2, ci = x.shape
    co = w.shape[-1]
    C4 = 4 * co
    if interpret is None:
        interpret = _interpret_default()
    if (C4 != plan.C4 or (H2, W2) != (plan.H2, plan.W2)
            or (W2 % 8 and not (interpret or _relaxed()))
            or C4 % 128 or ci % 8):
        from ..s2d import conv_transpose3d_k2s2_s2d_out
        return pack_flat(conv_transpose3d_k2s2_s2d_out(x, w, bias),
                         plan)
    wf = w[::-1, ::-1, ::-1]            # flax/lax flip convention
    # wk[a]: (ci, 4co) with (ph, pw, co) p-major lanes — the s2d lane
    # order pack_flat preserves (see conv_transpose3d_k2s2_s2d_out)
    wk = (wf.reshape(2, 4, ci, co).transpose(0, 2, 1, 3)
          .reshape(2, ci, C4).astype(x.dtype))
    b = (jnp.tile(bias, 4) if bias is not None
         else jnp.zeros((C4,), jnp.float32))
    b = b.reshape(1, C4).astype(jnp.float32)
    kern = functools.partial(_up_flat_kernel, H2=H2, W2=W2)
    yf = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (B, D2, 2, H2 + 3, plan.P, C4), x.dtype),
        grid=(B, D2),
        in_specs=[
            pl.BlockSpec((1, 1, H2, W2, ci),
                         lambda bb, d: (bb, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ci, C4), lambda bb, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda bb, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, H2 + 3, plan.P, C4),
                               lambda bb, d: (bb, d, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2 ** 20),
        interpret=interpret,
    )(x, wk, b)
    # (D2, 2) -> D and (H2+3, P) -> RT merges are layout-free
    return yf.reshape(B, 2 * D2, plan.RT, C4)


def _pool_flat_kernel(x_ref, o_ref, *, P0: int, H21: int, W21: int,
                      cp: int):
    # x_ref (1, 2, RT0, 4cp): two level-L depth slices of the flat
    # form; o_ref (1, 1, H21+3, P1, 4cp): one level-(L+1) flat slice.
    # 2x2x2 max pool decomposes exactly onto the layouts: the HxW
    # window IS the 4 level-L phase lane blocks (intra-tile lane-block
    # max), the depth pair is the elementwise max of the two slices,
    # and the level-(L+1) s2d regroup is a stride-2 row/column gather
    # into the 4 output phase blocks. Pads stay exact zero: only valid
    # source rows are gathered and the output is zero-initialized.
    o_ref[...] = jnp.zeros_like(o_ref)
    m = jnp.maximum(x_ref[0, 0], x_ref[0, 1])            # (RT0, 4cp)
    m = m.reshape(m.shape[0], 4, cp).max(axis=1)         # phase max
    mv = m.reshape(m.shape[0] // P0, P0, cp)
    for ph in range(2):
        for pw in range(2):
            # stride-2 phase pick WITHOUT a strided slice: Mosaic
            # lowers multi-dim strided slices to gathers and only
            # supports 2D gather (r5 on-chip ps2d_l2_pool log). A
            # contiguous slice + pair-split reshape + static index 0
            # selects the same rows/cols as pure slice/reshape ops.
            t = mv[ph + 1:ph + 1 + 2 * H21,
                   pw + 1:pw + 1 + 2 * W21, :]   # (2H21, 2W21, cp)
            blk = t.reshape(H21, 2, 2 * W21, cp)[:, 0]
            blk = blk.reshape(H21, W21, 2, cp)[:, :, 0]  # (H21,W21,cp)
            q = 2 * ph + pw
            o_ref[0, 0, 1:H21 + 1, 1:W21 + 1,
                  q * cp:(q + 1) * cp] = blk


def pool_into_flat(xf: jax.Array, plan0: PS2DPlan, plan1: PS2DPlan,
                   interpret: Optional[bool] = None) -> jax.Array:
    """MaxPool(2^3) of a flat level-L tensor emitting the flat
    level-(L+1) layout DIRECTLY — fuses ``max_pool3d_from_flat`` +
    ``space_to_depth_hw`` + ``pack_flat`` into one kernel (the XLA
    chain unpacks the full level-L tensor and re-materializes the
    padded level-(L+1) form). Semantics ==
    ``normal_to_flat(max_pool3d_from_flat(xf, plan0), plan1)``.

    The fused kernel runs in interpret mode (tests) or when
    ``SEG3D_POOL_FUSED=1`` (on-chip opt-in so a Mosaic lowering issue
    can only fail its own A/B step); otherwise — and for ineligible
    shapes — the exact XLA chain runs."""
    import os
    B, D, RT0, C4 = xf.shape
    if interpret is None:
        interpret = _interpret_default()
    cp = C4 // 4
    fused_on = interpret or os.environ.get("SEG3D_POOL_FUSED") == "1"
    if (not fused_on or RT0 != plan0.RT or C4 != plan0.C4
            or C4 != plan1.C4 or 4 * plan0.co != C4
            or plan1.H2 * 2 != plan0.H2 or plan1.W2 * 2 != plan0.W2
            or D % 2 or C4 % 128):
        return normal_to_flat(max_pool3d_from_flat(xf, plan0), plan1)
    kern = functools.partial(_pool_flat_kernel, P0=plan0.P,
                             H21=plan1.H2, W21=plan1.W2, cp=cp)
    yf = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (B, D // 2, plan1.H2 + 3, plan1.P, C4), xf.dtype),
        grid=(B, D // 2),
        in_specs=[pl.BlockSpec((1, 2, RT0, C4),
                               lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, plan1.H2 + 3, plan1.P, C4),
                               lambda b, d: (b, d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 2 ** 20),
        interpret=interpret,
    )(xf)
    # merging (H21+3, P1) -> RT1 is layout-free (adjacent dims)
    return yf.reshape(B, D // 2, plan1.RT, C4)


def unpack_flat(yf: jax.Array, plan: PS2DPlan) -> jax.Array:
    """Flat padded (B, D, RT, N4) -> packed (B, D, H2, W2, 4co)."""
    B, D, _, N4 = yf.shape
    H2, W2, P, co = plan.H2, plan.W2, plan.P, plan.co
    y = yf[:, :, :(H2 + 2) * P].reshape(B, D, H2 + 2, P, N4)
    y = y[:, :, 1:H2 + 1, 1:W2 + 1]
    cpad = N4 // 4
    if cpad != co:
        y = y.reshape(B, D, H2, W2, 4, cpad)[..., :co].reshape(
            B, D, H2, W2, 4 * co)
    return y


def pack_w_rot(w: jax.Array, plan: PS2DPlan,
               cis=None) -> jax.Array:
    """(3,3,3,ci,co) DHWIO -> (4 rot, 2 kh2, K, N4) lane-ring weights.

    K row block (i, kw2, j) carries input i's packed-s2d tap
    (dz, kh2, kw2) with dz = (j - rho + 1) mod 4 (slot j holds depth
    slice s == j mod 4; rho = d mod 4); dz == 3 is the unused slot ->
    zeros. For multi-input plans ``cis`` gives the REAL channel split
    of w's input dim (the concat split); each split block is padded to
    its C4s lane width independently.
    """
    N4, K = plan.N4, plan.K
    cop, co = N4 // 4, w.shape[4]
    if cis is None:
        cis = (w.shape[3],)
    assert len(cis) == len(plan.C4s) and sum(cis) == w.shape[3]
    # assembled by concatenation (in K order: input i, then kw2, then
    # slot j) rather than scatter .at[].set updates — the scatter form
    # lowered to per-conv runtime gathers (~1.6 ms each on-chip)
    w2ds, coff = [], 0
    for ci, C4i in zip(cis, plan.C4s):
        wi = w[:, :, :, coff:coff + ci, :]
        coff += ci
        cip = C4i // 4
        if (cip, cop) != (ci, co):
            wi = jnp.pad(wi,
                         ((0, 0),) * 3 + ((0, cip - ci), (0, cop - co)))
        w2ds.append(pack_w_s2d(wi))     # (2, 2, 12*cip, 4*cop), kd-major
    rows = []
    for rho in range(4):
        for kh2 in range(2):
            blocks = []
            for (ci, C4i), w2d in zip(zip(cis, plan.C4s), w2ds):
                zblk = jnp.zeros((C4i, N4), jnp.bfloat16)
                for kw2 in range(2):
                    for j in range(4):
                        dz = (j - rho + 1) % 4
                        blocks.append(
                            zblk if dz == 3 else
                            w2d[kh2, kw2, dz * C4i:(dz + 1) * C4i]
                            .astype(jnp.bfloat16))
            rows.append(jnp.concatenate(blocks, axis=0))
    return jnp.stack(rows).reshape(4, 2, K, N4)


def _kernel(*refs, plan: PS2DPlan, D: int, GH: int,
            has_affine: bool = False, has_shift: bool = False,
            has_relu: bool = False, has_mul0: bool = False,
            emit_stats: bool = False):
    p = plan
    n_in = len(p.C4s)
    x_hbms = refs[:n_in]
    refs = list(refs[n_in:])
    mul0_hbm = refs.pop(0) if has_mul0 else None
    w_ref = refs.pop(0)
    ss_ref = refs.pop(0) if has_affine else None
    o_hbm = refs.pop(0)
    stats_ref = refs.pop(0) if emit_stats else None
    xbuf = refs.pop(0)
    pbuf = refs.pop(0) if has_mul0 else None
    ybuf, ostage, in_sem, out_sem = refs
    bases = []
    acc = 0
    for C4i in p.C4s:
        bases.append(acc)
        acc += 8 * C4i
    Hb, P, N4 = p.Hb, p.P, p.N4
    RS = (Hb + 2) * P
    RY = (Hb + 1) * P
    HbP = Hb * P
    b = pl.program_id(0)
    g = pl.program_id(1)
    row0 = g * (Hb * P)          # first input flat row of this block
    first, last = g == 0, g == GH - 1

    # ---------------- input DMA: slice s -> lane slot s % 4 ----------
    # One ALIGNED DMA per slice (HBM slices must be 8-row-tile aligned;
    # row0 = g*Hb*P is, row0+1 is not). The kw2=1 operand block is then
    # a +1-row VMEM shift of the landed block — 1x slab VPU traffic,
    # nothing like the wtile kernel's 13.5x im2col amplification. The
    # shift's missing last row feeds only the masked pad column
    # (b = P-1), so its content never reaches the output.
    def load_copies(s):
        slot = jax.lax.rem(s, 4)
        out = []
        for i, (x_hbm, C4i) in enumerate(zip(x_hbms, p.C4s)):
            lane0 = pl.multiple_of(bases[i] + slot * C4i, C4i)
            out.append(pltpu.make_async_copy(
                x_hbm.at[b, s, pl.ds(row0, RS), :],
                xbuf.at[:, pl.ds(lane0, C4i)],
                in_sem.at[slot, i]))
        if has_mul0:
            out.append(pltpu.make_async_copy(
                mul0_hbm.at[b, s, pl.ds(row0, RS), :],
                pbuf.at[slot], in_sem.at[slot, n_in]))
        return out

    def start_load(s):
        for c in load_copies(s):
            c.start()

    def wait_load(s):
        for c in load_copies(s):
            c.wait()

    # ------------- on-load input transform (kernel v2) ----------------
    # Applied to the landed kw2=0 slab BEFORE shift_slot copies it into
    # the kw2=1 block, so both operand copies see transformed values.
    # This is how the previous op's GroupNorm affine + ReLU (and the
    # attention gate's psi/SE mask) ride the slab traffic the kernel
    # already pays, instead of separate full-resolution XLA passes.
    # in_valid guards the affine SHIFT: true pad positions must stay
    # exact zero (they are the conv's SAME-padding halo).
    if has_affine and has_shift:
        ri = jax.lax.broadcasted_iota(jnp.int32, (RS, 1), 0)
        colr = jax.lax.rem(ri, P)
        in_valid = jnp.logical_and(colr >= 1, colr <= p.W2)
        # no jnp.where on bools: Mosaic cannot legalize i1 selects
        in_valid = jnp.logical_and(
            in_valid,
            jnp.logical_or(jnp.logical_not(first), ri >= P))
        in_valid = jnp.logical_and(
            in_valid,
            jnp.logical_or(jnp.logical_not(last), ri < RS - P))

    def transform_slot(s):
        if not (has_affine or has_mul0):
            return
        slot = jax.lax.rem(s, 4)
        loff = 0
        for i, C4i in enumerate(p.C4s):
            lane0 = pl.multiple_of(bases[i] + slot * C4i, C4i)
            v = None
            if has_affine:
                v = xbuf[:, pl.ds(lane0, C4i)]
                sc = ss_ref[0, 0:1, pl.ds(loff, C4i)]      # (1, C4i)
                sh = ss_ref[0, 1:2, pl.ds(loff, C4i)]
                v = v * sc + sh
                if has_relu:
                    v = jnp.maximum(v, 0)
                if has_shift:
                    v = jnp.where(in_valid, v, 0)
            if has_mul0 and i == 0:
                if v is None:
                    v = xbuf[:, pl.ds(lane0, C4i)]
                v = v * pbuf[slot]
            if v is not None:
                xbuf[:, pl.ds(lane0, C4i)] = v.astype(xbuf.dtype)
            loff += C4i

    def shift_slot(s):
        slot = jax.lax.rem(s, 4)
        for i, C4i in enumerate(p.C4s):
            src0 = pl.multiple_of(bases[i] + slot * C4i, C4i)
            dst0 = pl.multiple_of(bases[i] + (4 + slot) * C4i, C4i)
            xbuf[0:RS - 1, pl.ds(dst0, C4i)] = \
                xbuf[1:RS, pl.ds(src0, C4i)]

    def zero_slot(s):
        slot = jax.lax.rem(s, 4)
        for i, C4i in enumerate(p.C4s):
            for kw2 in range(2):
                lane0 = bases[i] + (kw2 * 4 + slot) * C4i
                xbuf[:, pl.ds(pl.multiple_of(lane0, C4i), C4i)] = \
                    jnp.zeros((RS, C4i), xbuf.dtype)

    # ---------------- output DMA --------------------------------------
    # ostage rows: [0, P) zeros | [P, P + HbP) data | tail zeros.
    # Edge grid steps extend the write to cover the flat pad rows
    # (a = 0 and a = H2+1 (+16 guard)), so the out array is fully
    # written and chains as the next conv's input.
    tail = 2 * P

    def store_copy(d):
        sl = jax.lax.rem(d, 2)
        orow = (row0 + P)
        cfgs = []
        if GH == 1:
            cfgs.append((True, 0, HbP + 3 * P, 0))
        else:
            cfgs.append((jnp.logical_and(first, jnp.logical_not(last)),
                         0, P + HbP, 0))
            cfgs.append((jnp.logical_and(last, jnp.logical_not(first)),
                         P, HbP + tail, orow))
            cfgs.append((jnp.logical_and(jnp.logical_not(first),
                                         jnp.logical_not(last)),
                         P, HbP, orow))
        out = []
        for cond, src0, n, dst0 in cfgs:
            out.append((cond, pltpu.make_async_copy(
                ostage.at[sl, pl.ds(src0, n), :],
                o_hbm.at[b, d, pl.ds(dst0, n), :],
                out_sem.at[sl])))
        return out

    def start_store(d):
        for cond, c in store_copy(d):
            if cond is True:
                c.start()
            else:
                pl.when(cond)(lambda c=c: c.start())

    def wait_store(d):
        for cond, c in store_copy(d):
            if cond is True:
                c.wait()
            else:
                pl.when(cond)(lambda c=c: c.wait())

    # ---------------- warmup ------------------------------------------
    xbuf[:] = jnp.zeros((RS, p.K), xbuf.dtype)
    ybuf[0:GUARD] = jnp.zeros((GUARD, N4), ybuf.dtype)
    ostage[:] = jnp.zeros((2, HbP + 3 * P, N4), ostage.dtype)
    if emit_stats:
        # stats block index is (b, 0, 0): the buffer stays resident
        # across the g steps of one batch item (standard minor-most
        # reduction), so zero it once per b
        @pl.when(g == 0)
        def _():
            stats_ref[0] = jnp.zeros((8, N4), jnp.float32)
    start_load(0)
    if D >= 2:
        start_load(1)
    wait_load(0)
    transform_slot(0)
    shift_slot(0)

    # dest-row validity: r = h2l*P + (w2+1); halo columns -> 0
    col = jax.lax.broadcasted_iota(jnp.int32, (HbP, 1), 0) % P
    valid = jnp.logical_and(col >= 1, col < p.W2 + 1)

    def body(d, carry):
        @pl.when(d + 1 < D)
        def _():
            wait_load(d + 1)
            transform_slot(d + 1)
            shift_slot(d + 1)

        @pl.when(d + 2 < D)
        def _():
            start_load(d + 2)

        @pl.when(d + 2 == D)
        def _():
            zero_slot(d + 2)      # slot (D+... ) reused as slice "D"

        rho = jax.lax.rem(d, 4)
        y = (jnp.dot(xbuf[0:RY, :], w_ref[rho, 0],
                     preferred_element_type=jnp.float32)
             + jnp.dot(xbuf[P:P + RY, :], w_ref[rho, 1],
                       preferred_element_type=jnp.float32))
        ybuf[GUARD:GUARD + RY] = y

        @pl.when(d >= 2)
        def _():
            wait_store(d - 2)

        sl = jax.lax.rem(d, 2)
        for qh in range(2):
            for qw in range(2):
                q = qh * 2 + qw
                off = GUARD - 1 + qh * P + qw
                co = N4 // 4
                src = ybuf[pl.ds(off, HbP), q * co:(q + 1) * co]
                valbf = jnp.where(valid, src, 0.0).astype(ostage.dtype)
                ostage[sl, P:P + HbP, q * co:(q + 1) * co] = valbf
                if emit_stats:
                    # per-lane sum / sum-of-squares of the bf16 OUTPUT
                    # values (f32 accumulation) — the next GroupNorm's
                    # statistics ride the store the kernel already
                    # pays, replacing a full-resolution XLA read pass.
                    # Summing the CAST values keeps the statistics
                    # identical (up to f32 order) to the XLA path's
                    # sums over the bf16 tensor.
                    v32 = valbf.astype(jnp.float32)
                    s1 = stats_ref[0, 0:1, pl.ds(q * co, co)]
                    stats_ref[0, 0:1, pl.ds(q * co, co)] = (
                        s1 + jnp.sum(v32, axis=0, keepdims=True))
                    s2 = stats_ref[0, 1:2, pl.ds(q * co, co)]
                    stats_ref[0, 1:2, pl.ds(q * co, co)] = (
                        s2 + jnp.sum(v32 * v32, axis=0, keepdims=True))
        start_store(d)
        return carry

    jax.lax.fori_loop(0, D, body, 0)

    @pl.when(D >= 2)
    def _():
        wait_store(D - 2)

    wait_store(D - 1)


def ps2d_conv3d_flat_multi(xfs, w: jax.Array, plan: PS2DPlan,
                           cis=None, interpret: bool = False,
                           vmem_limit: int = 24 * 2 ** 20,
                           in_scale: Optional[jax.Array] = None,
                           in_shift: Optional[jax.Array] = None,
                           in_relu: bool = False,
                           in_mul0: Optional[jax.Array] = None,
                           emit_stats: bool = False):
    """len(plan.C4s) flat inputs -> flat (B, D, RT, N4) bf16.

    Convolves the CHANNEL CONCAT of the inputs (w's input dim = the
    concat) without materializing it: the concat lives only in the
    kernel's K dimension. ``cis`` is the real channel split of w's
    input dim (defaults to the single-input w shape).

    Kernel-v2 on-load input transforms (applied to the arriving slab,
    riding the VMEM traffic the kernel already pays — each replaces a
    full-resolution XLA pass):

      * ``in_scale`` / ``in_shift`` (B, sum C4s) per-lane affine over
        the input lane concat — the PREVIOUS op's GroupNorm affine.
        With a shift, true pad positions are re-zeroed in-kernel.
      * ``in_relu``: ReLU after the affine.
      * ``in_mul0`` (B, D, RT, C4s[0]): per-position-per-lane
        multiplier on input 0 — the attention gate's full psi*SE mask.
        (A 4-lane per-phase form would halve nothing: lane-4 arrays
        are physically 128 lanes under the (8,128) tiling, and Mosaic
        cannot DMA sub-tile lane slices.)

    ``emit_stats=True`` additionally returns per-lane output
    statistics ``(s1, s2)`` of shape (B, N4) f32 — raw sums and
    sums-of-squares of the bf16 output over the valid positions,
    accumulated in-kernel during the output stage. The consuming
    GroupNorm (``group_norm_flat_affine(sums=...)``) then skips its
    full-resolution statistics read pass.
    """
    B, D, RT, _ = xfs[0].shape
    assert len(xfs) == len(plan.C4s)
    for xf, C4i in zip(xfs, plan.C4s):
        assert xf.shape == (B, D, RT, C4i), (xf.shape, plan)
    assert RT == plan.RT, (RT, plan.RT)
    GH = plan.H2 // plan.Hb
    wr = pack_w_rot(w, plan, cis=cis).astype(xfs[0].dtype)
    p = plan
    C4sum = sum(p.C4s)
    has_affine = in_scale is not None or in_shift is not None
    has_shift = in_shift is not None
    has_mul0 = in_mul0 is not None
    kern = functools.partial(_kernel, plan=plan, D=D, GH=GH,
                             has_affine=has_affine, has_shift=has_shift,
                             has_relu=in_relu, has_mul0=has_mul0,
                             emit_stats=emit_stats)
    dt = xfs[0].dtype
    extra_in, extra_specs = [], []
    if has_mul0:
        assert in_mul0.shape == (B, D, RT, p.C4s[0]), in_mul0.shape
        extra_in.append(in_mul0.astype(dt))
        extra_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    extra_in.append(wr)
    extra_specs.append(
        pl.BlockSpec((4, 2, p.K, p.N4), lambda b, g: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM))
    if has_affine:
        sc = (in_scale if in_scale is not None
              else jnp.ones((B, C4sum), dt))
        sh = (in_shift if in_shift is not None
              else jnp.zeros((B, C4sum), dt))
        ss = jnp.stack([sc.astype(dt), sh.astype(dt)], axis=1)
        extra_in.append(ss)                       # (B, 2, C4sum)
        extra_specs.append(
            pl.BlockSpec((1, 2, C4sum), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM))
    scratch = [
        pltpu.VMEM(((p.Hb + 2) * p.P, p.K), dt),              # xbuf
    ]
    if has_mul0:
        scratch.append(
            pltpu.VMEM((4, (p.Hb + 2) * p.P, p.C4s[0]), dt))      # pbuf
    scratch += [
        pltpu.VMEM((GUARD + (p.Hb + 1) * p.P, p.N4),
                   jnp.float32),                              # ybuf
        pltpu.VMEM((2, p.Hb * p.P + 3 * p.P, p.N4), dt),      # ostage
        pltpu.SemaphoreType.DMA((4, len(xfs) + (1 if has_mul0
                                                else 0))),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    # scoped-vmem limit must cover the actual residency: level-1 plans
    # (ci=128 -> K=4096) carry 16.8 MB of rotated weights alone, past
    # the 24 MB default that fit every level-0 shape
    need = (4 * 2 * p.K * p.N4 * 2                      # rotated w
            + (p.Hb + 2) * p.P * p.K * 2                # xbuf
            + 3 * (GUARD + (p.Hb + 1) * p.P) * p.N4 * 4  # ybuf + temps
            + 2 * (p.Hb * p.P + 3 * p.P) * p.N4 * 2 * 2  # ostages x2
            + (4 * (p.Hb + 2) * p.P * p.C4s[0] * 2 if has_mul0 else 0))
    # +4 MiB flat headroom: Mosaic's stack allocator rounds each buffer
    # to tile-aligned extents and adds dot temporaries the closed-form
    # estimate can't see — on-chip the dec3/level-1 shape came out 83 KB
    # (~0.2%) over the 1.2x'd estimate (r5 ps2d_l2 log).
    vmem_limit = max(int(vmem_limit), int(need * 1.2) + (4 << 20))
    out_shape = jax.ShapeDtypeStruct((B, D, RT, p.N4), dt)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    if emit_stats:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, 8, p.N4), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((1, 8, p.N4), lambda b, g: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(B, GH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xfs)
        + extra_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Mosaic's default scoped-vmem limit is 16 MiB; the buffers
            # + dot temps at Hb=16/ci=64 need ~17.2. v5e VMEM is larger
            # than the default scope — raise it rather than shrink Hb
            # (smaller blocks re-DMA proportionally more halo rows).
            vmem_limit_bytes=int(vmem_limit)),
        interpret=interpret,
    )(*xfs, *extra_in)
    if emit_stats:
        yf, st = res
        return yf, (st[:, 0], st[:, 1])
    return res


def ps2d_conv3d_flat(xf: jax.Array, w: jax.Array, plan: PS2DPlan,
                     interpret: bool = False,
                     vmem_limit: int = 24 * 2 ** 20) -> jax.Array:
    """Flat padded (B, D, RT, 4ci) bf16 -> (B, D, RT, 4co) bf16."""
    return ps2d_conv3d_flat_multi((xf,), w, plan, interpret=interpret,
                                  vmem_limit=vmem_limit)


def ps2d_conv3d(xp: jax.Array, w: jax.Array,
                interpret: bool = False) -> Optional[jax.Array]:
    """Packed (B, D, H2, W2, 4ci) -> packed (B, D, H2, W2, 4co), or
    None when the shape is ineligible. Convenience wrapper: real users
    chain flat tensors with pack_flat/unpack_flat at region edges."""
    B, D, H2, W2, C4 = xp.shape
    ci, co = C4 // 4, w.shape[-1]
    plan = make_ps2d_plan(H2, W2, ci, co)
    if plan is None:
        return None
    xf = pack_flat(xp.astype(jnp.bfloat16), plan)
    yf = ps2d_conv3d_flat(xf, w, plan, interpret=interpret)
    return unpack_flat(yf, plan)


# ----------------------------------------------------------------------
# Training backward (VERDICT r3 item 5): the flat conv under
# jax.custom_vjp so the ps2d formulation can serve train-mode forwards.
#
#   * data grad: the SAME kernel with flipped-transposed weights
#     (transpose of a SAME odd conv is a SAME conv with
#     w[::-1,::-1,::-1] and ci<->co swapped; the flat layout carries
#     it unchanged because the halo rows make SAME boundary behavior
#     exact). Upstream cotangents may carry garbage in the pad
#     rows/columns (not every consumer masks), so the grad kernel
#     re-zeroes pads in its on-load transform (identity affine + the
#     in_valid select — rides VMEM traffic the kernel already pays).
#   * weight grad: XLA's own conv weight-grad on the UNPACKED packed-
#     s2d tensors via jax.linear_transpose of conv3d_s2d — the same
#     cost class as the zcat training step already pays for its weight
#     grads; the kernels win on forward + data grad and tie here.
# ----------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ps2d_conv3d_flat_train(xfs, w: jax.Array, plan: PS2DPlan,
                           cis: tuple) -> jax.Array:
    """Differentiable flat conv (tuple of flat inputs, concat in K).

    Semantics == ``ps2d_conv3d_flat_multi(xfs, w, plan, cis=cis)``;
    gradients flow to every input and to ``w``."""
    return ps2d_conv3d_flat_multi(tuple(xfs), w, plan, cis=cis,
                                  interpret=_interpret_default())


def _train_fwd(xfs, w, plan, cis):
    y = ps2d_conv3d_flat_multi(tuple(xfs), w, plan, cis=cis,
                               interpret=_interpret_default())
    return y, (tuple(xfs), w)


def _train_bwd(plan, cis, res, dy):
    from ..s2d import concat_s2d, conv3d_s2d
    xfs, w = res
    B = dy.shape[0]
    co = w.shape[-1]
    interpret = _interpret_default()
    # ---- data grads: flipped-weight kernel per input -----------------
    ones = jnp.ones((B, 4 * _align32(co)), dy.dtype)
    zeros = jnp.zeros_like(ones)
    dxs, coff = [], 0
    for ci_i, C4i in zip(cis, plan.C4s):
        wi = w[:, :, :, coff:coff + ci_i, :]
        coff += ci_i
        wT = wi[::-1, ::-1, ::-1].swapaxes(3, 4)     # (3,3,3,co,ci_i)
        plan_i = make_ps2d_plan(plan.H2, plan.W2, co, ci_i)
        if plan_i is None or plan_i.N4 != C4i:
            raise ValueError(
                f"no grad-kernel plan for {co}->{ci_i} at "
                f"({plan.H2},{plan.W2})")
        dxs.append(ps2d_conv3d_flat_multi(
            (dy,), wT, plan_i, cis=(co,), in_scale=ones,
            in_shift=zeros, interpret=interpret))
    # ---- weight grad: XLA conv weight-grad on unpacked tensors ------
    xps = [unpack_flat(xf, plan._replace(co=ci_i))
           for xf, ci_i in zip(xfs, cis)]
    xp = xps[0]
    for nxt in xps[1:]:
        xp = concat_s2d(xp, nxt)
    dyp = unpack_flat(dy, plan)
    dw = jax.linear_transpose(
        lambda ww: conv3d_s2d(xp, ww), w)(dyp)[0]
    return tuple(dxs), dw.astype(w.dtype)


ps2d_conv3d_flat_train.defvjp(_train_fwd, _train_bwd)


# ----------------------------------------------------------------------
# Flat-layout glue ops — everything between convs in a ps2d region runs
# directly on the flat padded form so tensors stay flat-resident from
# region entry to exit (per-conv pack/unpack would cost more than the
# kernel wins; see RESULTS.md round 3). All ops keep the invariant that
# pad rows/columns are EXACT ZERO (the kernels rely on it), and all
# statistics divide by the true voxel count, never the padded row count.
# ----------------------------------------------------------------------


def _interpret_default() -> bool:
    """Pallas interpret mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"


def row_valid_mask(plan: PS2DPlan, dtype=jnp.bfloat16) -> jax.Array:
    """(RT, 1): 1 where row r = a*P + b has a in [1, H2+1) and
    b in [1, W2+1), else 0."""
    import numpy as np
    r = np.arange(plan.RT)
    a, b = r // plan.P, r % plan.P
    m = ((a >= 1) & (a < plan.H2 + 1)
         & (b >= 1) & (b < plan.W2 + 1))
    return jnp.asarray(m[:, None], dtype)


def valid_count(plan: PS2DPlan) -> int:
    return plan.H2 * plan.W2


def conv1x1_flat(xfs, w: jax.Array, bias, plan: PS2DPlan, cis=None,
                 mask: jax.Array = None, se0: jax.Array = None,
                 psi0: jax.Array = None) -> jax.Array:
    """Pointwise conv on flat input(s): per-phase channel matmul over
    the (possibly multi-input) channel concat. Output lanes 4*co (co
    need not be padded — only KERNEL inputs need 128-multiple lanes).
    Pad rows are re-zeroed (bias would otherwise leak into them).

    ``se0`` (B, cis[0]) / ``psi0`` (B, D, RT, 4): the attention gate's
    channel / spatial factors applied to input 0 WITHOUT materializing
    the gated tensor — a 1x1 conv is per-position and phase-diagonal,
    so se folds into input-0's weights (per-batch) and psi scales
    input-0's dot contribution on the already-(…,4,co)-shaped
    intermediate (no lane reshape)."""
    if not isinstance(xfs, (tuple, list)):
        xfs = (xfs,)
    if w.ndim == 5:
        w = w.reshape(w.shape[-2], w.shape[-1])
    if cis is None:
        cis = (w.shape[0],)
    co = w.shape[1]
    B, D, RT, _ = xfs[0].shape
    y = None
    coff = 0
    for i, (xf, ci) in enumerate(zip(xfs, cis)):
        cpad = xf.shape[-1] // 4
        wi = w[coff:coff + ci]
        coff += ci
        if i == 0 and se0 is not None:
            wi = wi * se0[..., None].astype(wi.dtype)   # (B, ci, co)
        if cpad != ci:
            widths = ((0, 0),) * (wi.ndim - 2) + ((0, cpad - ci),
                                                  (0, 0))
            wi = jnp.pad(wi, widths)
        xr = xf.reshape(B, D, RT, 4, cpad)
        if wi.ndim == 3:
            t = jax.lax.dot_general(
                xr, wi.astype(xf.dtype),
                dimension_numbers=(((4,), (1,)), ((0,), (0,))))
        else:
            t = jax.lax.dot_general(
                xr, wi.astype(xf.dtype),
                dimension_numbers=(((4,), (0,)), ((), ())))
        if i == 0 and psi0 is not None:
            t = t * psi0[..., None].astype(t.dtype)     # (B,D,RT,4,1)
        y = t if y is None else y + t
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(B, D, RT, 4 * co)
    if mask is None:
        mask = row_valid_mask(plan, y.dtype)
    return y * mask


def group_norm_flat_affine(xf: jax.Array, gamma: jax.Array,
                           beta: jax.Array, num_groups: int,
                           plan: PS2DPlan, eps: float = 1e-5,
                           sums=None):
    """GroupNorm statistics of a flat tensor -> per-lane (scale, shift)
    f32 pairs of shape (B, C4), such that ``xf * scale + shift`` is the
    normalized result. Statistics are identical to group_norm_s2d on
    the packed tensor (pads are exact zero so sums are unaffected; the
    divisor is the true voxel count). Split out so the affine can ride
    the NEXT ps2d conv kernel's on-load transform instead of a
    separate full-resolution apply pass.

    ``sums``: optional kernel-emitted per-lane raw (sum, sum_sq) f32
    pair of shape (B, C4) (ps2d_conv3d_flat_multi(emit_stats=True)) —
    skips the full-resolution statistics read passes entirely. Only
    valid when the producing conv's lanes are unpadded (N4 == 4*c)."""
    B, D, RT, C4 = xf.shape
    c = C4 // 4
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by {num_groups}")
    n = D * valid_count(plan)
    if sums is not None:
        if sums[0].shape != (B, C4):
            raise ValueError(
                f"kernel stats lanes {sums[0].shape} != (B, {C4}); "
                "channel-padded conv outputs cannot feed GN stats")
        s1, s2 = sums[0] / n, sums[1] / n
    else:
        # f32 ACCUMULATION, single-consumer casts (no materialized f32
        # copy of the flat tensor — see ops/norm.py group_norm)
        s1 = jnp.sum(xf, axis=(1, 2), dtype=jnp.float32) / n  # (B, C4)
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2),
                     dtype=jnp.float32) / n
    g1 = jnp.mean(s1.reshape(B, 4, num_groups, -1), axis=(1, 3))
    g2 = jnp.mean(s2.reshape(B, 4, num_groups, -1), axis=(1, 3))
    mean_c = jnp.repeat(g1, c // num_groups, axis=-1)    # (B, c)
    var_c = jnp.maximum(
        jnp.repeat(g2, c // num_groups, axis=-1) - jnp.square(mean_c),
        0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    gm = gamma.astype(jnp.float32)
    scale = jnp.tile(rstd_c * gm, (1, 4))                # (B, C4)
    shift = jnp.tile(beta.astype(jnp.float32) - mean_c * rstd_c * gm,
                     (1, 4))
    return scale, shift


def group_norm_flat(xf: jax.Array, gamma: jax.Array, beta: jax.Array,
                    num_groups: int, plan: PS2DPlan, eps: float = 1e-5,
                    mask: jax.Array = None, sums=None) -> jax.Array:
    """GroupNorm on a flat tensor (see group_norm_flat_affine).
    The affine shift would break the zero pads, so the result is
    re-masked."""
    orig_dtype = xf.dtype
    scale, shift = group_norm_flat_affine(xf, gamma, beta, num_groups,
                                          plan, eps, sums=sums)
    if mask is None:
        mask = row_valid_mask(plan, orig_dtype)
    # apply in the input dtype: one fused bf16 pass instead of reading
    # a materialized f32 copy (scale/shift stay f32-derived)
    return (xf * scale[:, None, None, :].astype(orig_dtype)
            + shift[:, None, None, :].astype(orig_dtype)) * mask


def global_avg_pool_flat(xf: jax.Array, plan: PS2DPlan,
                         keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool3d(1): mean over (spatial, phase) per channel,
    dividing by the true voxel count (pads are zero)."""
    B, D, RT, C4 = xf.shape
    c = C4 // 4
    # lane-preserving reduce first (f32 accumulation, fused cast),
    # then the tiny (B, 4, c) phase fold — no 5-D reshape of the
    # full-resolution tensor
    s = jnp.sum(jnp.sum(xf, axis=(1, 2), dtype=jnp.float32)
                .reshape(B, 4, c),
                axis=1) / (4 * D * valid_count(plan))
    s = s.astype(xf.dtype)
    return s.reshape(B, 1, 1, 1, c) if keepdims else s


def max_pool3d_from_flat(xf: jax.Array, plan: PS2DPlan) -> jax.Array:
    """2x2x2 stride-2 max pool of a flat tensor -> NORMAL-layout
    (B, D/2, H2, W2, c) next level (the H,W window IS the 4 phases)."""
    yp = unpack_flat(xf, plan)
    from ..s2d import max_pool3d_from_s2d
    return max_pool3d_from_s2d(yp)


def flat_to_normal(yf: jax.Array, plan: PS2DPlan) -> jax.Array:
    """Flat padded -> normal (B, D, H, W, co) layout (region exit)."""
    from ..s2d import depth_to_space_hw
    return depth_to_space_hw(unpack_flat(yf, plan))


def normal_to_flat(x: jax.Array, plan: PS2DPlan) -> jax.Array:
    """Normal (B, D, H, W, c) -> flat padded form (region entry)."""
    from ..s2d import space_to_depth_hw
    return pack_flat(space_to_depth_hw(x), plan)
