"""Attention-gated residual 3D U-Net with deep supervision — TPU-native.

Behavioral parity with the reference PyTorch model (``main.py:102-299``),
re-designed for TPU:

  * NDHWC layout (channels-last) so XLA tiles conv3d onto the MXU.
  * bf16 compute / fp32 params & norm statistics (replaces CUDA AMP,
    reference ``training.py:200,292-299``).
  * Optional ``jax.checkpoint`` (remat) on each DoubleConv block — trades
    FLOPs for HBM at 128^3+ activations (SURVEY.md section 3.4: level-0
    activations are ~537 MB fp32 in the reference).
  * Pure functional forward: deep-supervision heads always traced; the
    train/eval distinction is a static ``train`` flag, not module state.

Architecture (reference ``main.py:105-203``):
  encoder: 5 x [DoubleConv3D -> (deep-sup 1x1x1 conv, trilinear to full res)
               -> MaxPool(2) -> ChannelDropout]
  bottleneck: DoubleConv3D(features[-1] -> 2*features[-1])
  decoder: 5 x [ConvTranspose(k2,s2) -> AttentionGate3D(g=up, x=skip)
               -> concat(x_att, up) -> DoubleConv3D]
  head: Conv3x3 -> BatchNorm -> ReLU -> Conv1x1 -> out_channels logits
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import Conv1x1, FastConv3D, FastConvTranspose3D
from ..ops.norm import group_norm
from ..ops.pool import max_pool3d, global_avg_pool
from ..ops.resize import resize_trilinear
from ..ops.s2d import (concat_s2d, depth_to_space_hw, global_avg_pool_s2d,
                       group_norm_s2d, max_pool3d_from_s2d,
                       space_to_depth_hw)

KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class GroupNorm(nn.Module):
    """GroupNorm wrapper over the functional op (Pallas-swappable).

    ``s2d``: input is in space-to-depth HW layout (ops/s2d.py);
    statistics and parameters are identical to the normal layout."""

    num_groups: int
    eps: float = 1e-5
    s2d: bool = False
    # flat packed-s2d layout (ops/pallas/ps2d.py): true-count stats,
    # pads re-zeroed; requires the region plan at call time
    ps2d: bool = False

    @nn.compact
    def __call__(self, x, plan=None, return_affine=False, sums=None):
        c = x.shape[-1] // 4 if (self.s2d or self.ps2d) else x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.ps2d:
            from ..ops.pallas.ps2d import (group_norm_flat,
                                           group_norm_flat_affine)
            if return_affine:
                # per-lane (scale, shift) for the next kernel's on-load
                # transform — no apply pass here. ``sums``: kernel-
                # emitted statistics (FastConv3D(emit_stats=True)) —
                # skips the full-resolution stats read pass.
                return group_norm_flat_affine(x, gamma, beta,
                                              self.num_groups, plan,
                                              self.eps, sums=sums)
            return group_norm_flat(x, gamma, beta, self.num_groups,
                                   plan, self.eps, sums=sums)
        if sums is not None:
            raise ValueError("kernel stats require the ps2d path")
        if self.s2d:
            return group_norm_s2d(x, gamma, beta, self.num_groups,
                                  self.eps)
        return group_norm(x, gamma, beta, self.num_groups, self.eps)


class DoubleConv3D(nn.Module):
    """Conv3-GN8-ReLU x2 with residual add (reference ``main.py:205-242``).

    Residual: identity when in_ch == out_ch and ``use_residual``;
    1x1x1 Conv + GN(8) projection when in_ch != out_ch.
    """

    out_channels: int
    mid_channels: int | None = None
    use_residual: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    fast: bool = True
    quant_mode: str = "off"
    # whole block computed in space-to-depth HW layout (ops/s2d.py);
    # requires fast=True, parameters identical to the normal path
    s2d: bool = False
    # whole block in FLAT packed-s2d layout via the Pallas conv kernel
    # (ops/pallas/ps2d.py). __call__ takes a flat array or a TUPLE of
    # flat arrays (their channel concat is folded into the kernel's K
    # dim, never materialized) plus the conv1 plan. Eval-only;
    # parameters identical to the normal path.
    ps2d: bool = False

    @nn.compact
    def __call__(self, x, plan=None, gate=None, entry=False,
                 trainable=False):
        if self.ps2d:
            return self._ps2d(x, plan, gate, entry, trainable)
        if gate is not None or entry:
            raise ValueError("gate folding / flat-region entry require "
                             "the ps2d path")
        if self.s2d and not self.fast:
            raise ValueError("s2d DoubleConv requires fast=True")
        in_ch = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        mid = self.mid_channels or self.out_channels

        def conv(f, k, name):
            if self.fast and k == 3:
                return FastConv3D(f, (3, 3, 3), use_bias=False,
                                  kernel_init=KAIMING, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  quant_mode=self.quant_mode,
                                  s2d=self.s2d, name=name)
            if self.fast and k == 1:
                return Conv1x1(f, use_bias=False, kernel_init=KAIMING,
                               dtype=self.dtype, s2d=self.s2d,
                               param_dtype=self.param_dtype, name=name)
            return nn.Conv(f, (k, k, k), padding="SAME", use_bias=False,
                           kernel_init=KAIMING, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)

        gn = lambda name: GroupNorm(8, s2d=self.s2d, name=name)
        out = conv(mid, 3, "conv1")(x)
        out = gn("gn1")(out)
        out = nn.relu(out)
        out = conv(self.out_channels, 3, "conv2")(out)
        out = gn("gn2")(out)
        out = nn.relu(out)

        if in_ch == self.out_channels:
            if self.use_residual:
                out = out + x
        else:
            res = conv(self.out_channels, 1, "proj")(x)
            res = gn("gn_proj")(res)
            out = out + res
        return out

    def _ps2d(self, x, plan, gate=None, entry=False, trainable=False):
        """Flat-layout block: same parameter tree as the normal path
        (conv1 / gn1 / conv2 / gn2 / proj / gn_proj), convs via the
        packed-s2d Pallas kernel, GN with true-count statistics.

        ``gate``: optional (psi (B,D,RT,4), se (B, cis[0])) attention-
        gate factors for input 0 — applied inside conv1's on-load
        transform (psi via in_mul0, se via per-lane in_scale) and
        folded into proj's weights/phase-dot, so the gated tensor is
        NEVER materialized in HBM. gn1's affine + ReLU likewise ride
        conv2's on-load transform instead of an XLA apply pass.

        ``entry=True``: flat-REGION ENTRY variant (enc0). ``x`` is a
        single PACKED-s2d tensor with few channels (enc0's ci=4, where
        the ps2d kernel loses to XLA — RESULTS.md round 3); conv1 and
        the residual proj run as XLA s2d ops and only their 32-channel
        OUTPUTS are packed flat, so the 8x channel-padding blowup of a
        4-channel flat tensor is never paid. ``plan`` is conv2's plan;
        the block returns the flat form for the rest of the region
        (pool, the level-0 skip consumed by the decoder stage)."""
        from ..ops.pallas.ps2d import make_ps2d_plan
        if not self.fast or self.quant_mode != "off":
            raise ValueError("ps2d DoubleConv requires fast=True, "
                             "quant off")
        mid_ch = self.mid_channels or self.out_channels
        if mid_ch % 32 or self.out_channels % 32:
            # GroupNorm params are sized from the flat lane count; a
            # non-32-multiple channel width would pad them and break
            # checkpoint compatibility
            raise ValueError("ps2d DoubleConv needs 32-multiple widths")
        if entry:
            return self._ps2d_entry(x, plan, gate, trainable)
        xfs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        cis = tuple(C4i // 4 for C4i in plan.C4s)
        in_ch = sum(cis)
        mid = self.mid_channels or self.out_channels
        common = dict(use_bias=False, kernel_init=KAIMING,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      ps2d=True)

        if trainable:
            # training path: custom_vjp conv kernels, plain XLA glue
            # (the eval fusions' cotangents are not implemented). The
            # gate is applied by the caller BEFORE this block.
            if gate is not None:
                raise ValueError("gate folding is eval-only; apply the "
                                 "gate before a trainable ps2d block")
            out = FastConv3D(mid, (3, 3, 3), name="conv1", **common)(
                xfs, plan=plan, cis=cis, differentiable=True)
            out = nn.relu(GroupNorm(8, ps2d=True, name="gn1")(out,
                                                              plan))
            plan_mid = make_ps2d_plan(plan.H2, plan.W2, mid,
                                      self.out_channels)
            out = FastConv3D(self.out_channels, (3, 3, 3),
                             name="conv2", **common)(
                out, plan=plan_mid, differentiable=True)
            out = nn.relu(GroupNorm(8, ps2d=True, name="gn2")(out,
                                                              plan))
            if in_ch == self.out_channels:
                if self.use_residual:
                    if len(xfs) != 1:
                        raise ValueError("identity residual needs a "
                                         "single ps2d input")
                    out = out + xfs[0]
            else:
                res = Conv1x1(self.out_channels, name="proj",
                              **common)(xfs, plan=plan, cis=cis)
                res = GroupNorm(8, ps2d=True, name="gn_proj")(res, plan)
                out = out + res
            return out

        psi = se = mask0 = None
        if gate is not None:
            psi, se = gate
            cp0 = plan.C4s[0] // 4
            # full-lane psi*SE mask for conv1's on-load transform
            # (lanes are phase-major; the kron expansion is the
            # measured-fastest phase->lane broadcast — see the gate)
            expand = jnp.kron(jnp.eye(4, dtype=psi.dtype),
                              jnp.ones((1, cp0), psi.dtype))
            se_pad = jnp.pad(se.astype(psi.dtype),
                             ((0, 0), (0, cp0 - cis[0])))
            mask0 = (jax.lax.dot_general(
                psi, expand,
                dimension_numbers=(((3,), (0,)), ((), ())))
                * jnp.tile(se_pad, (1, 4))[:, None, None, :])

        # both convs emit their output statistics in-kernel, so neither
        # GroupNorm pays a full-resolution stats read pass
        out, st1 = FastConv3D(mid, (3, 3, 3), name="conv1", **common)(
            xfs, plan=plan, cis=cis, in_mul0=mask0, emit_stats=True)
        # gn1 affine + ReLU ride conv2's on-load transform
        sc1, sh1 = GroupNorm(8, ps2d=True, name="gn1")(
            out, plan, return_affine=True, sums=st1)
        plan_mid = make_ps2d_plan(plan.H2, plan.W2, mid,
                                  self.out_channels)
        out, st2 = FastConv3D(self.out_channels, (3, 3, 3), name="conv2",
                              **common)(out, plan=plan_mid,
                                        in_scale=sc1.astype(self.dtype),
                                        in_shift=sh1.astype(self.dtype),
                                        in_relu=True, emit_stats=True)
        out = nn.relu(GroupNorm(8, ps2d=True, name="gn2")(out, plan,
                                                          sums=st2))

        if in_ch == self.out_channels:
            if self.use_residual:
                if len(xfs) != 1 or gate is not None:
                    raise ValueError("identity residual needs a single "
                                     "ungated ps2d input")
                out = out + xfs[0]
        else:
            res = Conv1x1(self.out_channels, name="proj", **common)(
                xfs, plan=plan, cis=cis, se0=se, psi0=psi)
            res = GroupNorm(8, ps2d=True, name="gn_proj")(res, plan)
            out = out + res
        return out

    def _ps2d_entry(self, xp, plan, gate=None, trainable=False):
        """See ``_ps2d(entry=True)``. ``xp``: packed s2d
        (B, D, H2, W2, 4*ci), ci < 32; returns flat (B, D, RT, N4)."""
        from ..ops.pallas.ps2d import pack_flat, pack_flat_fast
        if gate is not None:
            raise ValueError("entry blocks take no gate")
        if isinstance(xp, (tuple, list)):
            raise ValueError("entry blocks take a single packed input")
        # the Pallas relayout has no VJP; training uses the XLA pad
        pack = pack_flat if trainable else pack_flat_fast
        in_ch = xp.shape[-1] // 4
        mid = self.mid_channels or self.out_channels
        if (plan.ci, plan.co) != (mid, self.out_channels):
            raise ValueError("entry plan must be conv2's plan")
        common = dict(use_bias=False, kernel_init=KAIMING,
                      dtype=self.dtype, param_dtype=self.param_dtype)

        # conv1 in the XLA s2d formulation (full 4*mid output lanes;
        # the tiny-ci conv is not lane-bound — RESULTS.md round 3), its
        # 32-channel output packed flat ONCE for the rest of the region
        out1 = FastConv3D(mid, (3, 3, 3), s2d=True, name="conv1",
                          **common)(xp)
        out1 = pack(out1, plan)
        if trainable:
            out1 = nn.relu(GroupNorm(8, ps2d=True, name="gn1")(out1,
                                                               plan))
            out = FastConv3D(self.out_channels, (3, 3, 3),
                             name="conv2", ps2d=True, **common)(
                out1, plan=plan, differentiable=True)
            out = nn.relu(GroupNorm(8, ps2d=True, name="gn2")(out,
                                                              plan))
        else:
            # gn1 affine + ReLU ride conv2's on-load transform
            sc1, sh1 = GroupNorm(8, ps2d=True, name="gn1")(
                out1, plan, return_affine=True)
            out, st2 = FastConv3D(self.out_channels, (3, 3, 3),
                                  name="conv2", ps2d=True, **common)(
                out1, plan=plan, in_scale=sc1.astype(self.dtype),
                in_shift=sh1.astype(self.dtype), in_relu=True,
                emit_stats=True)
            out = nn.relu(GroupNorm(8, ps2d=True, name="gn2")(
                out, plan, sums=st2))

        if in_ch == self.out_channels:
            if self.use_residual:
                raise ValueError("entry blocks require a projection "
                                 "residual (in_ch != out_ch)")
        else:
            # proj + gn_proj on the packed few-channel input (tiny
            # compute), flat-packed only at the add
            res = Conv1x1(self.out_channels, s2d=True, name="proj",
                          **common)(xp)
            res = GroupNorm(8, s2d=True, name="gn_proj")(res)
            # pack_flat reads only C4 (lane pad target) and P
            out = out + pack(res, plan._replace(C4=plan.N4))
        return out


class AttentionGate3D(nn.Module):
    """Additive spatial attention gate + squeeze-excite channel attention
    (reference ``main.py:244-299``).

    g: gating signal (decoder, coarse); x: skip features. Returns gated x.
    """

    f_int: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    fast: bool = True
    # g and x arrive in space-to-depth HW layout (ops/s2d.py); the
    # gate's 1x1 convs become phase-blocked matmuls, GroupNorm uses the
    # s2d statistics, SE pools over (spatial, phase). Parameters
    # identical to the normal path.
    s2d: bool = False
    # g and x arrive in FLAT packed-s2d layout (ops/pallas/ps2d.py,
    # requires the region plan); statistics use true voxel counts and
    # the zero pads survive every step (sigmoid(0)=0.5 is multiplied
    # by the zero-padded x). Parameters identical to the normal path.
    ps2d: bool = False

    @nn.compact
    def __call__(self, g, x, plan=None, fold=False):
        if self.ps2d:
            return self._ps2d(g, x, plan, fold)
        if fold:
            raise ValueError("gate factor folding requires ps2d")
        if self.s2d and not self.fast:
            raise ValueError("s2d AttentionGate requires fast=True")
        if self.fast:
            conv1 = lambda f, name: Conv1x1(
                f, use_bias=True, kernel_init=KAIMING, dtype=self.dtype,
                s2d=self.s2d, param_dtype=self.param_dtype, name=name)
        else:
            conv1 = lambda f, name: nn.Conv(
                f, (1, 1, 1), use_bias=True, kernel_init=KAIMING,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        f_l = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        gn = lambda groups, name: GroupNorm(groups, s2d=self.s2d,
                                            name=name)

        g1 = gn(4, "gn_g")(conv1(self.f_int, "w_g")(g))
        x1 = gn(4, "gn_x")(conv1(self.f_int, "w_x")(x))
        if g1.shape[1:-1] != x1.shape[1:-1]:
            if self.s2d:
                raise ValueError("s2d attention gate requires matching "
                                 "g/x spatial shapes (pad input dims to "
                                 "a multiple of 2**levels)")
            g1 = resize_trilinear(g1, x1.shape[1:-1])

        psi = nn.relu(g1 + x1)
        psi = gn(1, "gn_psi")(conv1(1, "psi")(psi))
        psi = nn.sigmoid(psi)
        if self.s2d:
            # psi has one channel per phase: broadcast within phases
            B, D, H2, W2, _ = x.shape
            x_spatial = (x.reshape(B, D, H2, W2, 4, f_l)
                         * psi[..., None]).reshape(x.shape)
        else:
            x_spatial = x * psi

        # Squeeze-excite channel attention on the raw skip features.
        # The pooled vector is normal-layout (C,) in both modes, so the
        # SE convs are plain Conv1x1 with shared parameters.
        se = global_avg_pool_s2d(x) if self.s2d else global_avg_pool(x)
        se_conv = lambda f, name: Conv1x1(
            f, use_bias=True, kernel_init=KAIMING, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name) if self.fast else (
            conv1(f, name))
        se = nn.relu(se_conv(max(f_l // 8, 1), "se_down")(se))
        se = nn.sigmoid(se_conv(f_l, "se_up")(se))
        if self.s2d:
            se = jnp.tile(se, (1, 1, 1, 1, 4))
        return x_spatial * se

    def _ps2d(self, g, x, plan, fold=False):
        """Flat-layout gate: same parameter tree as the normal path.

        ``fold=True`` returns the factored mask ``(psi (B,D,RT,4),
        se (B, f_l))`` instead of the gated tensor, so the consumer
        (DoubleConv3D ps2d) can apply both inside its conv kernels
        without ever materializing x*psi*se in HBM."""
        from ..ops.pallas.ps2d import global_avg_pool_flat
        if not self.fast:
            raise ValueError("ps2d AttentionGate requires fast=True")
        if g.shape != x.shape:
            raise ValueError("ps2d attention gate requires matching "
                             "g/x shapes")
        f_l = x.shape[-1] // 4
        conv1 = lambda f, name: Conv1x1(
            f, use_bias=True, kernel_init=KAIMING, dtype=self.dtype,
            ps2d=True, param_dtype=self.param_dtype, name=name)
        gn = lambda groups, name: GroupNorm(groups, ps2d=True,
                                            name=name)
        g1 = gn(4, "gn_g")(conv1(self.f_int, "w_g")(g, plan=plan), plan)
        x1 = gn(4, "gn_x")(conv1(self.f_int, "w_x")(x, plan=plan), plan)
        psi = nn.relu(g1 + x1)
        psi = gn(1, "gn_psi")(conv1(1, "psi")(psi, plan=plan), plan)
        psi = nn.sigmoid(psi)       # 0.5 at pads; x is zero there
        B, D, RT, _ = x.shape

        se = global_avg_pool_flat(x, plan)      # (B,1,1,1,f_l) normal
        se_conv = lambda f, name: Conv1x1(
            f, use_bias=True, kernel_init=KAIMING, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        se = nn.relu(se_conv(max(f_l // 8, 1), "se_down")(se))
        se = nn.sigmoid(se_conv(f_l, "se_up")(se))
        if fold:
            return psi, se.reshape(B, f_l)
        # Phase->lane broadcast: lanes are phase-major (p*f_l + c).
        # Four formulations measured (benchmarks/profile_ps2d.py):
        # the (...,4C)->(...,4,C) reshape multiply (1.4 ms relayouts on
        # both sides — not (8,128)-tiling compatible), jnp.repeat (same
        # reshape chain internally), per-phase broadcast+lane-concat
        # (XLA materializes every branch; +7.5 ms), and a dot with the
        # constant kron(I4, 1_f) expansion — the dot wins (fwd 97.8 vs
        # 104.9/105.4 ms total).
        expand = jnp.kron(jnp.eye(4, dtype=psi.dtype),
                          jnp.ones((1, f_l), psi.dtype))
        psi_wide = jax.lax.dot_general(
            psi, expand, dimension_numbers=(((3,), (0,)), ((), ())))
        se_wide = jnp.tile(se.reshape(B, 1, 1, f_l), (1, 1, 1, 4))
        return x * psi_wide * se_wide


class UNet3D(nn.Module):
    """Flagship segmentation model (reference ``main.py:102-203``).

    Call: ``model.apply(vars, x, train=..., rngs={'dropout': k})``
    with x of shape (B, D, H, W, C). Returns a dict:
      {"logits": (B,D,H,W,out), "deep": [4 x (B,D,H,W,out)]}
    Deep outputs are only populated when ``train=True`` (matching the
    reference's train/eval return split, ``main.py:200-203``).
    """

    out_channels: int = 4
    features: Sequence[int] = (32, 64, 128, 256, 512)
    dropout_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    fast: bool = True
    # Reference main.py:163-171 trilinearly upsamples every deep head to
    # full resolution inside the forward. That costs ~300 ms/step at
    # 128^3 b2 (benchmarks/profile_train.py: 4 extra full-res combined
    # losses). Since the reference's deep supervision is DEAD code (its
    # trainer cannot consume the tuple — SURVEY.md section 2.2), the
    # trainer defaults to the nnU-Net semantics instead: deep heads stay
    # at their native scale and the LOSS nearest-resizes the target
    # (losses.deep_supervision_loss handles both). Set True to emulate
    # the reference model's written behavior exactly.
    deep_sup_full_res: bool = False
    # int8 quantized serving (inference/quantize.py): "off" | "calib"
    # | "int8". Applies to the DoubleConv 3x3x3 convs; the head, gates
    # and upsamplers stay bf16. ``quant_blocks`` optionally restricts
    # quantization to blocks whose name starts with one of the given
    # prefixes (e.g. ("dec",) for decoder-only) — encoder DC outputs
    # feed skip + pool + deep-sup consumers, where quantization forces
    # an extra full-size materialization (benchmarks/profile_int8.py).
    quant_mode: str = "off"
    quant_blocks: Any = None
    # Eval-only space-to-depth level 0 (ops/s2d.py): enc0 / att-last /
    # dec-last / head_conv run in s2d-HW layout so their conv2ds emit
    # 4*Cout MXU lanes instead of Cout. Exact (test_s2d.py, model
    # parity test); parameters identical, so checkpoints and the train
    # path are unchanged. Requires H, W multiples of 2**levels (the
    # sliding-window ROI padding guarantees this). Ignored when
    # train=True or quant_mode="int8".
    s2d_eval: bool = False
    # Same for train=True forwards (and their backward passes — the
    # gradient of the s2d conv2d is another full-lane conv2d). Deep-sup
    # head 0 emits normal layout either way (d2s'd before the loss).
    s2d_train: bool = False
    # Eval-only PACKED-s2d Pallas path (ops/pallas/ps2d.py) for the
    # decoder-last stage — the 52 ms hot spot of the crop-bucket
    # forward. The gate + both DC convs + GN glue run on flat
    # halo-padded tensors; the skip/up concat folds into the conv
    # kernel's K dim. Measured 1.6-2.9x per-conv over zcat
    # (benchmarks/RESULTS.md round 3). Parameters identical; takes
    # precedence over s2d_eval at level 0. Falls back silently when no
    # kernel plan exists for the shape.
    ps2d_eval: bool = False
    # Same for train=True forwards: the level-0 DC convs run the ps2d
    # kernels under jax.custom_vjp (data grad = flipped-weight kernel,
    # weight grad = XLA s2d weight-grad conv on unpacked tensors —
    # ops/pallas/ps2d.ps2d_conv3d_flat_train); glue, gate, up and
    # deep-sup stay differentiable XLA ops (no eval-only fusions).
    # Parameters identical to every other path. Level-0 blocks are not
    # remat-wrapped under this flag (static plan args); the flat
    # region's working set replaces the normal-layout one.
    ps2d_train: bool = False
    # How many resolution levels (from 0) run flat-resident when the
    # ps2d path is active. 2 extends the treatment to level 1 (the
    # next-largest spatial extent after the level-0 extremities —
    # VERDICT r3 item 2): enc1's DoubleConv, the level-1 skip, up3 and
    # the dec1 stage (gate folded, concat in K) all stay in the level-1
    # flat layout; the region enters from the pooled enc0 output and
    # exits before up4. Eval-only (ps2d_train stays level-0); falls
    # back per-level when no plan exists for the shape. Parameters
    # identical to every other path.
    ps2d_levels: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, Any]:
        feats = tuple(self.features)
        dc = DoubleConv3D
        if self.remat:
            dc = nn.remat(DoubleConv3D)
        def block(f, name, s2d=False, ps2d=False):
            qm = self.quant_mode
            if self.quant_blocks is not None and not any(
                    name.startswith(p) for p in self.quant_blocks):
                qm = "off"
            return dc(f, dtype=self.dtype, param_dtype=self.param_dtype,
                      fast=self.fast, quant_mode=qm, s2d=s2d, ps2d=ps2d,
                      name=name)
        if self.fast:
            conv_out = lambda name, s2d=False: Conv1x1(
                self.out_channels, kernel_init=KAIMING, dtype=self.dtype,
                s2d=s2d, param_dtype=self.param_dtype, name=name)
        else:
            conv_out = lambda name, s2d=False: nn.Conv(
                self.out_channels, (1, 1, 1), kernel_init=KAIMING,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        x = x.astype(self.dtype)
        full_res = x.shape[1:-1]
        min_size = 2 ** len(feats)
        if min(full_res) < min_size:
            raise ValueError(
                f"input spatial dims {full_res} too small for "
                f"{len(feats)} encoder levels (need >= {min_size}); "
                f"use fewer features or a larger volume")
        # evenness is the only shape requirement: the initial s2d needs
        # even H, W, and the level-0 decoder up must exactly double the
        # level-1 dims back (interior levels reconcile odd sizes via
        # resize_trilinear as before)
        # quant_mode gates: int8 has no s2d kernels, and CALIB must
        # trace the normal path too — the s2d conv branch never reaches
        # the absmax sow, so calibrating with s2d on would leave the
        # int8 model without act_scale entries for the level-0 blocks
        use_s2d = ((self.s2d_train if train else self.s2d_eval)
                   and self.fast and self.quant_mode == "off"
                   and all(s % 2 == 0 for s in full_res))
        # packed-s2d Pallas path for the level-0 extremities (the
        # enc0 + dec0 hot spots of the crop-bucket forward): eval-only,
        # takes precedence over s2d there (both target level 0).
        # enc_plan drives enc0's conv2 and the flat-resident level-0
        # skip; ps2d_plan the decoder stage's concat conv.
        ps2d_plan = enc_plan = None
        if ((self.ps2d_train if train else self.ps2d_eval)
                and self.fast
                and self.quant_mode == "off"
                and feats[0] % 32 == 0  # DC width gate (GN param shapes)
                and all(s % 2 == 0 for s in full_res)):
            from ..ops.pallas.ps2d import (make_ps2d_plan,
                                           make_ps2d_plan_multi)
            f0 = feats[0]
            ps2d_plan = make_ps2d_plan_multi(
                full_res[1] // 2, full_res[2] // 2, (f0, f0), f0)
            enc_plan = make_ps2d_plan(
                full_res[1] // 2, full_res[2] // 2, f0, f0)
            if ps2d_plan is None or enc_plan is None:
                ps2d_plan = enc_plan = None
        if ps2d_plan is not None:
            use_s2d = False
        # level-1 flat region (eval-only): needs level-1 dims even AND
        # level-2 dims exact (H, W % 8, D % 4) so pool/up round-trip
        # without resize reconciliation, plus a 32-multiple width
        l1_plans = None
        if (ps2d_plan is not None and self.ps2d_levels >= 2
                and not train
                and len(feats) >= 2 and feats[1] % 32 == 0
                and full_res[0] % 4 == 0
                and full_res[1] % 8 == 0 and full_res[2] % 8 == 0):
            from ..ops.pallas.ps2d import (make_ps2d_plan,
                                           make_ps2d_plan_multi)
            f1 = feats[1]
            # the 2f1->f1 concat conv carries 4*2*K*N4*2 = 16.8 MB of
            # rotated weights at f1=64; budget accordingly (v5e VMEM is
            # 128 MB — the call raises its scoped limit to match)
            dec_plan_l1 = make_ps2d_plan_multi(
                full_res[1] // 4, full_res[2] // 4, (f1, f1), f1,
                vmem_budget=28 * 2 ** 20)
            enc_plan_l1 = make_ps2d_plan(
                full_res[1] // 4, full_res[2] // 4, feats[0], f1)
            if dec_plan_l1 is not None and enc_plan_l1 is not None:
                l1_plans = (enc_plan_l1, dec_plan_l1)
        skips: List[jax.Array] = []
        deep: List[jax.Array] = []

        # ---- encoder ----
        for i, f in enumerate(feats):
            lvl_s2d = use_s2d and i == 0
            lvl_ps2d = ps2d_plan is not None and i == 0
            if lvl_ps2d:
                # flat-region entry: the whole enc0 stage (conv2 via
                # the ps2d kernel) runs flat-resident, and the level-0
                # skip STAYS flat until the decoder stage consumes it
                # (no decoder-side re-pack)
                from ..ops.pallas.ps2d import (flat_to_normal,
                                               max_pool3d_from_flat)
                x = DoubleConv3D(
                    f, dtype=self.dtype, param_dtype=self.param_dtype,
                    fast=self.fast, ps2d=True, name=f"down{i}")(
                    space_to_depth_hw(x), plan=enc_plan, entry=True,
                    trainable=train)
                skips.append(x)
                # dead at eval (returned only when train) but traced
                # so an eval-mode init creates the same parameter tree
                if i < len(feats) - 1:   # deep heads: non-final levels
                    d = Conv1x1(
                        self.out_channels, kernel_init=KAIMING,
                        dtype=self.dtype, ps2d=True,
                        param_dtype=self.param_dtype, name=f"deep{i}")(
                        x, plan=enc_plan)
                    if train:
                        # losses consume normal layout
                        d = flat_to_normal(
                            d, enc_plan._replace(co=self.out_channels))
                        if self.deep_sup_full_res:
                            d = resize_trilinear(d, full_res)
                    deep.append(d)
                if l1_plans is None:
                    x = max_pool3d_from_flat(x, enc_plan)
                # else: x stays FLAT — the pool fuses into the level-1
                # region entry (pool_into_flat below)
                x = nn.Dropout(self.dropout_rate,
                               broadcast_dims=(1, 2, 3),
                               deterministic=not train)(x)
                continue
            if l1_plans is not None and i == 1:
                # level-1 flat region entry from the pooled (normal-
                # layout) enc0 output; the level-1 skip STAYS flat
                # until the dec1 stage consumes it. ci=32 is already
                # lane-full, so no entry variant is needed — the whole
                # DC runs on the kernels (eval-only region; the train
                # graph never reaches here and builds the identical
                # parameter tree on the normal path).
                from ..ops.pallas.ps2d import (max_pool3d_from_flat,
                                               normal_to_flat,
                                               pool_into_flat)
                enc_plan_l1 = l1_plans[0]
                if x.ndim == 4:
                    # flat level-0 straight from enc0: pool + s2d +
                    # pack in one kernel (exact XLA chain otherwise)
                    x = pool_into_flat(x, enc_plan, enc_plan_l1)
                else:
                    x = normal_to_flat(x, enc_plan_l1)
                x = DoubleConv3D(
                    f, dtype=self.dtype, param_dtype=self.param_dtype,
                    fast=self.fast, ps2d=True, name=f"down{i}")(
                    x, plan=enc_plan_l1)
                skips.append(x)
                if i < len(feats) - 1:
                    d = Conv1x1(self.out_channels, kernel_init=KAIMING,
                                dtype=self.dtype, ps2d=True,
                                param_dtype=self.param_dtype,
                                name=f"deep{i}")(x, plan=enc_plan_l1)
                    deep.append(d)      # dead at eval (l1 is eval-only)
                x = max_pool3d_from_flat(x, enc_plan_l1)
                x = nn.Dropout(self.dropout_rate,
                               broadcast_dims=(1, 2, 3),
                               deterministic=not train)(x)
                continue
            if lvl_s2d:
                x = space_to_depth_hw(x)
            x = block(f, f"down{i}", s2d=lvl_s2d)(x)
            skips.append(x)
            if i < len(feats) - 1:
                # dead at eval (returned only when train) but traced so
                # init creates the same parameter tree in both modes
                d = conv_out(f"deep{i}", s2d=lvl_s2d)(x)
                if lvl_s2d:
                    # losses consume normal layout
                    d = depth_to_space_hw(d)
                if self.deep_sup_full_res:
                    d = resize_trilinear(d, full_res)
                # kept in compute dtype; losses cast to f32 internally
                deep.append(d)
            x = max_pool3d_from_s2d(x) if lvl_s2d else max_pool3d(x, 2)
            x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(x)

        # ---- bottleneck ----
        x = block(feats[-1] * 2, "bottleneck")(x)
        bottleneck_feats = x

        # ---- decoder ----
        for i, f in enumerate(reversed(feats)):
            last = i == len(feats) - 1
            lvl_s2d = use_s2d and last
            lvl_ps2d = ps2d_plan is not None and last
            skip = skips[-(i + 1)]
            if l1_plans is not None and i == len(feats) - 2:
                # level-1 flat-resident stage (eval-only): the skip
                # arrives flat from enc1, the up conv targets the flat
                # form (fused kernel when the shape is eligible, exact
                # XLA pair otherwise), the gate folds into the DC's
                # conv kernels, and the stage exits to normal layout
                # for the level-0 up that follows.
                from ..ops.pallas.ps2d import flat_to_normal, input_plan
                dec_plan_l1 = l1_plans[1]
                if (x.shape[2:4] != (dec_plan_l1.H2, dec_plan_l1.W2)
                        or skip.shape != (x.shape[0], 2 * x.shape[1],
                                          dec_plan_l1.RT,
                                          dec_plan_l1.C4s[0])):
                    raise ValueError(
                        "ps2d level 1: decoder/skip shape mismatch; "
                        "pad input dims to a multiple of 2**levels")
                x = FastConvTranspose3D(
                    f, kernel_init=KAIMING, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"up{i}")(
                    x, flat_plan=input_plan(dec_plan_l1, 1))
                psi, se = AttentionGate3D(
                    f_int=max(f // 2, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, fast=self.fast,
                    ps2d=True, name=f"att{i}")(
                    g=x, x=skip, plan=input_plan(dec_plan_l1, 0),
                    fold=True)
                x = DoubleConv3D(
                    f, dtype=self.dtype, param_dtype=self.param_dtype,
                    fast=self.fast, ps2d=True, name=f"dec{i}")(
                    (skip, x), plan=dec_plan_l1, gate=(psi, se))
                x = flat_to_normal(x, dec_plan_l1)
                continue
            up_plan = None
            if lvl_ps2d:
                # flat-resident stage: the skip arrives ALREADY flat
                # from enc0 (no re-pack), the up conv EMITS the flat
                # form directly (fused s2d-out + pack, ops/pallas/
                # ps2d.up_k2s2_into_flat), then the gate, both DC
                # convs, GN glue and the residual run on flat tensors;
                # the concat folds into the conv kernel's K dim
                from ..ops.pallas.ps2d import flat_to_normal, input_plan
                # pre-up x is level-1: (B, D/2, H2, W2, ·)
                if x.shape[2:4] != (ps2d_plan.H2, ps2d_plan.W2) or \
                        skip.shape != (x.shape[0], 2 * x.shape[1],
                                       ps2d_plan.RT,
                                       ps2d_plan.C4s[0]):
                    raise ValueError(
                        "ps2d level 0: decoder/skip shape mismatch; "
                        "pad input dims to a multiple of 2**levels")
                up_plan = input_plan(ps2d_plan, 1)
            if self.fast:
                # at train the fused up-into-flat kernel has no VJP:
                # emit s2d and pack with the (differentiable) XLA pad
                x = FastConvTranspose3D(
                    f, kernel_init=KAIMING, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    s2d_out=lvl_s2d or (lvl_ps2d and train),
                    name=f"up{i}")(
                    x, flat_plan=None if train else up_plan)
            else:
                x = nn.ConvTranspose(
                    f, (2, 2, 2), strides=(2, 2, 2), kernel_init=KAIMING,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"up{i}")(x)
            if lvl_ps2d:
                if train:
                    from ..ops.pallas.ps2d import pack_flat
                    up_f = pack_flat(x, up_plan)
                else:
                    up_f = x
                skip_f = skip
                gate_mod = AttentionGate3D(
                    f_int=max(f // 2, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, fast=self.fast,
                    ps2d=True, name=f"att{i}")
                # plain DoubleConv3D, NOT the remat-wrapped `dc`: remat
                # would trace the static plan ints as dynamic args.
                # Same module name -> same param tree.
                dec_mod = DoubleConv3D(
                    f, dtype=self.dtype, param_dtype=self.param_dtype,
                    fast=self.fast, ps2d=True, name=f"dec{i}")
                if train:
                    # differentiable path: the gate applies its mask
                    # as flat XLA ops; the DC convs run the custom_vjp
                    # kernels
                    skip_g = gate_mod(g=up_f, x=skip_f,
                                      plan=input_plan(ps2d_plan, 0))
                    x = dec_mod((skip_g, up_f), plan=ps2d_plan,
                                trainable=True)
                else:
                    # factored gate: psi/se are applied INSIDE the
                    # DC's conv kernels (on-load transform / weight
                    # fold) — the gated skip never materializes in HBM
                    psi, se = gate_mod(
                        g=up_f, x=skip_f,
                        plan=input_plan(ps2d_plan, 0), fold=True)
                    x = dec_mod((skip_f, up_f), plan=ps2d_plan,
                                gate=(psi, se))
                x = flat_to_normal(x, ps2d_plan)
                continue
            x_att = AttentionGate3D(
                f_int=max(f // 2, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, fast=self.fast,
                s2d=lvl_s2d, name=f"att{i}")(g=x, x=skip)
            if x.shape[1:-1] != skip.shape[1:-1]:
                if lvl_s2d:
                    raise ValueError("s2d level 0: decoder/skip shape "
                                     "mismatch; pad input dims to a "
                                     "multiple of 2**levels")
                x = resize_trilinear(x, skip.shape[1:-1])
            cat = (concat_s2d(x_att, x) if lvl_s2d
                   else jnp.concatenate([x_att, x], axis=-1))
            x = block(f, f"dec{i}", s2d=lvl_s2d)(cat)

        # ---- head: Conv3-BN-ReLU-Conv1 (reference main.py:129-134) ----
        if self.fast:
            h = FastConv3D(feats[0] // 2, (3, 3, 3), use_bias=True,
                           kernel_init=KAIMING, dtype=self.dtype,
                           param_dtype=self.param_dtype, s2d=use_s2d,
                           name="head_conv")(x)
            if use_s2d:
                h = depth_to_space_hw(h)
        else:
            h = nn.Conv(feats[0] // 2, (3, 3, 3), padding="SAME",
                        kernel_init=KAIMING, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head_conv")(x)
        # At eval BatchNorm is a per-channel affine from running stats;
        # computing it in bf16 (f32 params) avoids a full-res f32
        # round-trip of the head activations (~5 ms/volume at 240^3).
        # Training keeps f32 batch-stats for stability.
        bn_dtype = jnp.float32 if train else self.dtype
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=bn_dtype,
                         name="head_bn")(h.astype(bn_dtype))
        h = nn.relu(h).astype(self.dtype)
        if self.fast:
            logits = Conv1x1(self.out_channels, kernel_init=KAIMING,
                             dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="head_out")(h)
        else:
            logits = nn.Conv(self.out_channels, (1, 1, 1),
                             kernel_init=KAIMING, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="head_out")(h)

        return {
            "logits": logits.astype(jnp.float32),
            "deep": deep if train else [],
            # bottleneck features for joint heads (models/joint.py);
            # dead code unless consumed, so eval-only graphs drop it
            "bottleneck": bottleneck_feats,
        }
