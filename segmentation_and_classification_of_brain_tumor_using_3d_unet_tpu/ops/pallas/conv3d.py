"""Width-tiled block-Toeplitz 3D convolution — the TPU-native conv.

Replaces the XLA z-concat conv2d formulation (``ops/conv.py``) for the
hot 3x3x3 SAME convs (reference ``main.py:215-222``). Motivation, from
measured facts on v5e (benchmarks/RESULTS.md, probe_mxu.py):

  * XLA's conv path delivers ~7-24 TF/s at the U-Net's shapes; the
    Cout=32 full-resolution blocks are MXU-lane-capped (N=32 of 128).
  * The in-VMEM MXU rate at (M,1728)@(1728,128) is ~219 TF/s — the
    compute ceiling is ~10x away.
  * Pallas per-grid-step overhead is ~15 us on this runtime, so the
    kernel must do MANY tiles of work per grid step.

Design
------
Activations are NDHWC with the (W, C) pair flattened into the lane
dimension. A "supertile" is ``Tw`` adjacent width positions x ``ci``
channels = ``ws = Tw*ci`` lanes, chosen so ``ws`` is a multiple of 128.
Packing ``Tw`` width outputs into the matmul N dim gives ``N = Tw*co``
full MXU lanes; K = 9*(Tw+2)*ci covers the (dz,dy) tap pairs times a
(Tw+2)-position input window. Padded-FLOP ratio is (Tw+2)/3: 2x for
32ch, 4/3 for 64ch, and 1x (none) for ci >= 128.

Grid = (batch, W-blocks) — W-block slicing keeps every DMA lane-offset
a multiple of 128, which Mosaic requires (H offsets are NOT sliceable:
sublane tiling). Each grid step holds a full-H slab of ``nb`` interior
supertiles (+1 halo supertile each side) per depth slice and runs a
fori_loop over D, streaming slices through a 4-slot rolling ring with
double-buffered input stages and output tiles: each slice is DMA'd
once and reused for the three dz taps while the MXU runs.

The im2col matrix (M = H*(nb+2) rows) is built from three contiguous
VMEM block copies per (dz, dy) — storing rows as ``r = h*(nb+2) + s``
makes source and destination strides match:

    B piece: the supertile itself         (M, ws)  row offset  0
    A piece: last ci lanes, row offset -1 (M, ci)  (w = -1 halo)
    C piece: first ci lanes, row offset +1 (M, ci) (w = +Tw halo)

and the (M, N) matmul output maps 1:1 onto the flat (w, c) output
layout — no output relayout.

Gradients: ``wtile_conv3d`` carries a custom VJP — dx is the transposed
conv (spatially flipped, ci/co-swapped weights) through this same
kernel when eligible; dw falls back to XLA contractions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class Plan(NamedTuple):
    Tw: int      # output width positions per supertile
    ws: int      # supertile lanes = Tw * ci
    N: int       # matmul N = Tw * co
    K: int       # matmul K = 9 * (Tw + 2) * ci
    ns: int      # real supertiles per row = W // Tw
    nb: int      # interior supertiles per W-block
    M: int       # matmul M = H * (nb + 2)


def make_plan(ci: int, co: int, W: int, H: int,
              max_col_bytes: int = 5 * 2 ** 20) -> Optional[Plan]:
    """Pick the supertile geometry; None if the shape is ineligible."""
    if ci <= 0 or co <= 0 or ci % 32 or co % 32:
        return None
    # smallest Tw with ws % 128 == 0 and N >= 128 minimizes padded
    # FLOPs ((Tw+2)/3)
    Tw = None
    for cand in (1, 2, 4):
        if (cand * ci) % 128 == 0 and cand * co >= 128:
            Tw = cand
            break
    if Tw is None or W % Tw:
        return None
    ws, N, K = Tw * ci, Tw * co, 9 * (Tw + 2) * ci
    ns = W // Tw
    Hp = -(-H // 8) * 8   # sublane tiling: full-H DMA slices need H%8==0
    # largest nb dividing ns with the im2col block under budget
    nb = None
    for cand in (16, 10, 8, 5, 4, 2, 1):
        if ns % cand == 0 and Hp * (cand + 2) * K * 2 <= max_col_bytes:
            nb = cand
            break
    if nb is None:
        return None
    return Plan(Tw, ws, N, K, ns, nb, Hp * (nb + 2))


def build_wbig(w: jax.Array, plan: Plan) -> jax.Array:
    """(3,3,3,ci,co) DHWIO -> (K, N) block-Toeplitz, K grouped
    [9 x B(Tw positions, ci)] ++ [9 x A(ci)] ++ [9 x C(ci)]."""
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    Tw, N = plan.Tw, plan.N
    blocks = []
    for dz in range(3):          # B: input position p, output jo
        for dy in range(3):
            blk = jnp.zeros((Tw, ci, Tw, co), w.dtype)
            for p in range(Tw):
                for jo in range(Tw):
                    kwi = p - jo + 1
                    if 0 <= kwi < 3:
                        blk = blk.at[p, :, jo, :].set(w[dz, dy, kwi])
            blocks.append(blk.reshape(Tw * ci, N))
    for dz in range(3):          # A: w = -1 -> only jo = 0, tap kw=0
        for dy in range(3):
            blk = jnp.zeros((ci, Tw, co), w.dtype)
            blk = blk.at[:, 0, :].set(w[dz, dy, 0])
            blocks.append(blk.reshape(ci, N))
    for dz in range(3):          # C: w = Tw -> only jo = Tw-1, tap kw=2
        for dy in range(3):
            blk = jnp.zeros((ci, Tw, co), w.dtype)
            blk = blk.at[:, Tw - 1, :].set(w[dz, dy, 2])
            blocks.append(blk.reshape(ci, N))
    out = jnp.concatenate(blocks, axis=0)
    assert out.shape == (plan.K, N)
    return out


def _kernel(x_hbm, w_ref, o_hbm, col, xs, stage, ostage,
            in_sem, out_sem, *, plan: Plan, D: int, H: int, wbn: int):
    p = plan
    nsp = p.nb + 2
    R = (H + 2) * nsp + 2        # ring rows (+1 zero h-row each side,
    #                              +1 guard row each end for A/C +-1)
    b = pl.program_id(0)
    wb = pl.program_id(1)
    # first interior input/output lane; multiple_of helps Mosaic prove
    # 128-divisibility of the DMA lane offsets
    lane_in0 = pl.multiple_of(wb * (p.nb * p.ws), p.nb * p.ws)
    lane_out0 = pl.multiple_of(wb * (p.nb * p.N), p.nb * p.N)

    # --- input DMA: one full-H depth slice -> stage slot -------------
    # stage layout: (H, nsp*ws); interior supertiles at cols
    # [ws, (nb+1)*ws); halo supertiles from the neighbouring blocks,
    # zeroed at the volume edge. Four static cases keep DMA shapes
    # static; lane offsets are ws-multiples (>=128) as Mosaic requires.
    only = wbn == 1

    def _copies(s):
        slot = jax.lax.rem(s, 2)
        out = []
        if only:
            out.append((True, pltpu.make_async_copy(
                x_hbm.at[b, s, :, pl.ds(0, p.nb * p.ws)],
                stage.at[slot, :, pl.ds(p.ws, p.nb * p.ws)],
                in_sem.at[slot])))
        else:
            out.append((wb == 0, pltpu.make_async_copy(
                x_hbm.at[b, s, :, pl.ds(0, (p.nb + 1) * p.ws)],
                stage.at[slot, :, pl.ds(p.ws, (p.nb + 1) * p.ws)],
                in_sem.at[slot])))
            out.append((wb == wbn - 1, pltpu.make_async_copy(
                x_hbm.at[b, s, :, pl.ds(pl.multiple_of(lane_in0 - p.ws, p.ws),
                                        (p.nb + 1) * p.ws)],
                stage.at[slot, :, pl.ds(0, (p.nb + 1) * p.ws)],
                in_sem.at[slot])))
            out.append((jnp.logical_and(wb != 0, wb != wbn - 1),
                        pltpu.make_async_copy(
                x_hbm.at[b, s, :, pl.ds(pl.multiple_of(lane_in0 - p.ws, p.ws),
                                        (p.nb + 2) * p.ws)],
                stage.at[slot], in_sem.at[slot])))
        return out

    def start_load(s):
        for cond, c in _copies(s):
            if cond is True:
                c.start()
            else:
                pl.when(cond)(lambda c=c: c.start())

    def wait_load(s):
        for cond, c in _copies(s):
            if cond is True:
                c.wait()
            else:
                pl.when(cond)(lambda c=c: c.wait())

    def edge_zero(st):
        """zero halo supertile columns not covered by the DMA."""
        if only:
            stage[st, :, 0:p.ws] = jnp.zeros((H, p.ws), stage.dtype)
            stage[st, :, (p.nb + 1) * p.ws:] = jnp.zeros(
                (H, p.ws), stage.dtype)
        else:
            @pl.when(wb == 0)
            def _():
                stage[st, :, 0:p.ws] = jnp.zeros((H, p.ws), stage.dtype)

            @pl.when(wb == wbn - 1)
            def _():
                stage[st, :, (p.nb + 1) * p.ws:] = jnp.zeros(
                    (H, p.ws), stage.dtype)

    def scatter(s):
        """stage[s%2] -> ring slot (s+1)%4: ONE contiguous copy (row
        r = 1 + (h+1)*nsp + st maps the (H, nsp*ws) stage onto rows
        [1+nsp, 1+nsp+H*nsp))."""
        slot = jax.lax.rem(s + 1, 4)
        st = jax.lax.rem(s, 2)
        edge_zero(st)
        xs[slot, 1 + nsp: 1 + nsp + H * nsp] = \
            stage[st].reshape(H * nsp, p.ws)

    def zero_slot(s):
        slot = jax.lax.rem(s + 1, 4)
        xs[slot] = jnp.zeros((R, p.ws), xs.dtype)

    def store_copy(d):
        slot = jax.lax.rem(d, 2)
        return pltpu.make_async_copy(
            ostage.at[slot],
            o_hbm.at[b, d, :, pl.ds(pl.multiple_of(lane_out0, p.N),
                                    p.nb * p.N)],
            out_sem.at[slot])

    # --- warmup ------------------------------------------------------
    # zeroing the ring establishes slice -1, the zero h-rows (local
    # h' = 0 and H+1), and the A/C guard rows; the scatter only ever
    # writes rows [1+nsp, 1+nsp+H*nsp).
    xs[:] = jnp.zeros((4, R, p.ws), xs.dtype)
    start_load(0)
    wait_load(0)
    scatter(0)
    if D >= 2:
        start_load(1)

    # --- stream over depth -------------------------------------------
    def body(d, carry):
        @pl.when(d + 1 < D)
        def _():
            wait_load(d + 1)
            scatter(d + 1)

        @pl.when(d + 1 == D)
        def _():
            zero_slot(d + 1)

        @pl.when(d + 2 < D)
        def _():
            start_load(d + 2)

        # im2col: 27 contiguous block copies from the 3 resident slices
        ci = p.ws // p.Tw
        c = 0
        for dz in range(3):                       # B pieces
            slot = jax.lax.rem(d + dz, 4)
            for dy in range(3):
                col[:, c:c + p.ws] = \
                    xs[slot, 1 + dy * nsp: 1 + dy * nsp + p.M]
                c += p.ws
        for dz in range(3):                       # A pieces (row -1)
            slot = jax.lax.rem(d + dz, 4)
            for dy in range(3):
                col[:, c:c + ci] = \
                    xs[slot, dy * nsp: dy * nsp + p.M, p.ws - ci:]
                c += ci
        for dz in range(3):                       # C pieces (row +1)
            slot = jax.lax.rem(d + dz, 4)
            for dy in range(3):
                col[:, c:c + ci] = \
                    xs[slot, 2 + dy * nsp: 2 + dy * nsp + p.M, :ci]
                c += ci

        y = jnp.dot(col[:], w_ref[:], preferred_element_type=jnp.float32)

        @pl.when(d >= 2)
        def _():
            store_copy(d - 2).wait()

        oslot = jax.lax.rem(d, 2)
        yt = y.reshape(H, nsp, p.N)[:, 1:-1, :]     # drop halo tiles
        ostage[oslot] = yt.reshape(H, p.nb * p.N).astype(ostage.dtype)
        store_copy(d).start()
        return carry

    jax.lax.fori_loop(0, D, body, 0)

    @pl.when(D >= 2)
    def _():
        store_copy(D - 2).wait()

    store_copy(D - 1).wait()


def _wtile_conv3d_impl(x: jax.Array, wbig: jax.Array, plan: Plan,
                       interpret: bool = False) -> jax.Array:
    """x: (B, D, H, W, ci) -> (B, D, H, W, co); bf16-preferred."""
    B, D, H, W, ci = x.shape
    p = plan
    co = p.N // p.Tw
    nsp = p.nb + 2
    wbn = p.ns // p.nb
    Hp = p.M // nsp
    if Hp != H:   # zero-pad rows == SAME-conv semantics; sliced back
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, 0), (0, 0)))
    xf = x.reshape(B, D, Hp, W * ci)
    R = (Hp + 2) * nsp + 2

    kern = functools.partial(_kernel, plan=p, D=D, H=Hp, wbn=wbn)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, W * co), x.dtype),
        grid=(B, wbn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((p.K, p.N), lambda b, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((p.M, p.K), x.dtype),              # im2col
            pltpu.VMEM((4, R, p.ws), x.dtype),            # z ring
            pltpu.VMEM((2, Hp, nsp * p.ws), x.dtype),     # in stages
            pltpu.VMEM((2, Hp, p.nb * p.N), x.dtype),     # out stages
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xf, wbig)
    return out.reshape(B, D, Hp, W, co)[:, :, :H]


# --------------------------------------------------------------------
# public op with custom VJP (dx via this kernel, dw via XLA)
# --------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def wtile_conv3d(x: jax.Array, w: jax.Array, plan: Plan,
                 interpret: bool = False) -> jax.Array:
    """3x3x3 SAME conv over NDHWC via the width-tiled Pallas kernel.

    ``plan`` must come from ``make_plan(ci, co, W, H)``; semantics match
    ``ops.conv.conv3d_zcat`` (reference torch Conv3d(3,3,3,pad=1),
    ``main.py:215-222``) at bf16 precision with f32 accumulation.
    """
    wbig = build_wbig(w.astype(x.dtype), plan)
    return _wtile_conv3d_impl(x, wbig, plan, interpret)


def _fwd(x, w, plan, interpret):
    return wtile_conv3d(x, w, plan, interpret), (x, w)


def _bwd(plan, interpret, res, g):
    from ..conv import conv3d_zcat
    x, w = res
    # dx = conv(g, flip(w) with ci/co swapped)
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    B, D, H, W, ci = x.shape
    co = w.shape[-1]
    gplan = make_plan(co, ci, W, H)
    if gplan is not None:
        dx = wtile_conv3d(g, w_flip, gplan, interpret)
    else:
        dx = conv3d_zcat(g, w_flip.astype(g.dtype))
    # dw[dz,dy,dx',ci,co]: 27 contractions over shifted views (XLA)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(-1, co)
    dws = []
    for dz in range(3):
        for dy in range(3):
            for dxx in range(3):
                xsv = jax.lax.dynamic_slice(
                    xp, (0, dz, dy, dxx, 0), (B, D, H, W, ci))
                dws.append(jnp.einsum(
                    "nc,nk->ck",
                    xsv.reshape(-1, ci).astype(jnp.float32),
                    gf.astype(jnp.float32)))
    dw = jnp.stack(dws).reshape(3, 3, 3, ci, co).astype(w.dtype)
    return dx.astype(x.dtype), dw


wtile_conv3d.defvjp(_fwd, _bwd)
