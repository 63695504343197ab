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
                            C4, N4, K, ci, co)
    return None


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


def pack_w_rot(w: jax.Array, plan: PS2DPlan) -> jax.Array:
    """(3,3,3,ci,co) DHWIO -> (4 rot, 2 kh2, K, N4) lane-ring weights.

    K row block (kw2, j) carries the packed-s2d tap (dz, kh2, kw2) with
    dz = (j - rho + 1) mod 4 (slot j holds depth slice s == j mod 4;
    rho = d mod 4); dz == 3 is the unused slot -> zeros.
    """
    C4, N4, K = plan.C4, plan.N4, plan.K
    cip, cop = C4 // 4, N4 // 4
    ci, co = w.shape[3], w.shape[4]
    if (cip, cop) != (ci, co):
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cip - ci), (0, cop - co)))
    w2d = pack_w_s2d(w)                 # (2, 2, 12*cip, 4*cop), kd-major
    out = jnp.zeros((4, 2, K, N4), w2d.dtype)
    for rho in range(4):
        for kh2 in range(2):
            for kw2 in range(2):
                for j in range(4):
                    dz = (j - rho + 1) % 4
                    if dz == 3:
                        continue
                    blk = w2d[kh2, kw2,
                              dz * 4 * cip:(dz + 1) * 4 * cip]
                    off = (kw2 * 4 + j) * C4
                    out = out.at[rho, kh2, off:off + C4].set(blk)
    return out


def _kernel(x_hbm, w_ref, o_hbm, xbuf, ybuf, ostage,
            in_sem, out_sem, *, plan: PS2DPlan, D: int, GH: int):
    p = plan
    Hb, P, C4, N4 = p.Hb, p.P, p.C4, p.N4
    RS = (Hb + 2) * P
    RY = (Hb + 1) * P
    HbP = Hb * P
    b = pl.program_id(0)
    g = pl.program_id(1)
    row0 = g * (Hb * P)          # first input flat row of this block

    # ---------------- input DMA: slice s -> lane slot s % 4 ----------
    # One ALIGNED DMA per slice (HBM slices must be 8-row-tile aligned;
    # row0 = g*Hb*P is, row0+1 is not). The kw2=1 operand block is then
    # a +1-row VMEM shift of the landed block — 1x slab VPU traffic,
    # nothing like the wtile kernel's 13.5x im2col amplification. The
    # shift's missing last row feeds only the masked pad column
    # (b = P-1), so its content never reaches the output.
    def load_copy(s):
        slot = jax.lax.rem(s, 4)
        lane0 = pl.multiple_of(slot * C4, C4)
        return pltpu.make_async_copy(
            x_hbm.at[b, s, pl.ds(row0, RS), :],
            xbuf.at[:, pl.ds(lane0, C4)],
            in_sem.at[slot])

    def start_load(s):
        load_copy(s).start()

    def wait_load(s):
        load_copy(s).wait()

    def shift_slot(s):
        slot = jax.lax.rem(s, 4)
        src0 = pl.multiple_of(slot * C4, C4)
        dst0 = pl.multiple_of((4 + slot) * C4, C4)
        xbuf[0:RS - 1, pl.ds(dst0, C4)] = xbuf[1:RS, pl.ds(src0, C4)]

    def zero_slot(s):
        slot = jax.lax.rem(s, 4)
        for kw2 in range(2):
            lane0 = (kw2 * 4 + slot) * C4
            xbuf[:, pl.ds(pl.multiple_of(lane0, C4), C4)] = jnp.zeros(
                (RS, C4), xbuf.dtype)

    # ---------------- output DMA --------------------------------------
    # ostage rows: [0, P) zeros | [P, P + HbP) data | tail zeros.
    # Edge grid steps extend the write to cover the flat pad rows
    # (a = 0 and a = H2+1 (+16 guard)), so the out array is fully
    # written and chains as the next conv's input.
    first, last = g == 0, g == GH - 1
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
    start_load(0)
    if D >= 2:
        start_load(1)
    wait_load(0)
    shift_slot(0)

    # dest-row validity: r = h2l*P + (w2+1); halo columns -> 0
    col = jax.lax.broadcasted_iota(jnp.int32, (HbP, 1), 0) % P
    valid = jnp.logical_and(col >= 1, col < p.W2 + 1)

    def body(d, carry):
        @pl.when(d + 1 < D)
        def _():
            wait_load(d + 1)
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
                ostage[sl, P:P + HbP, q * co:(q + 1) * co] = jnp.where(
                    valid, src, 0.0).astype(ostage.dtype)
        start_store(d)
        return carry

    jax.lax.fori_loop(0, D, body, 0)

    @pl.when(D >= 2)
    def _():
        wait_store(D - 2)

    wait_store(D - 1)


def ps2d_conv3d_flat(xf: jax.Array, w: jax.Array, plan: PS2DPlan,
                     interpret: bool = False,
                     vmem_limit: int = 24 * 2 ** 20) -> jax.Array:
    """Flat padded (B, D, RT, 4ci) bf16 -> (B, D, RT, 4co) bf16."""
    args_vmem_limit = vmem_limit
    B, D, RT, C4 = xf.shape
    assert RT == plan.RT and C4 == plan.C4, (xf.shape, plan)
    GH = plan.H2 // plan.Hb
    wr = pack_w_rot(w.astype(xf.dtype), plan)
    kern = functools.partial(_kernel, plan=plan, D=D, GH=GH)
    p = plan
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, D, RT, p.N4), xf.dtype),
        grid=(B, GH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 2, p.K, p.N4), lambda b, g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(((p.Hb + 2) * p.P, p.K), xf.dtype),        # xbuf
            pltpu.VMEM((GUARD + (p.Hb + 1) * p.P, p.N4),
                       jnp.float32),                              # ybuf
            pltpu.VMEM((2, p.Hb * p.P + 3 * p.P, p.N4),
                       xf.dtype),                                 # ostage
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Mosaic's default scoped-vmem limit is 16 MiB; the buffers
            # + dot temps at Hb=16/ci=64 need ~17.2. v5e VMEM is larger
            # than the default scope — raise it rather than shrink Hb
            # (smaller blocks re-DMA proportionally more halo rows).
            vmem_limit_bytes=int(args_vmem_limit)),
        interpret=interpret,
    )(xf, wr)


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
