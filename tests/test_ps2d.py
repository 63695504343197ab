"""Exactness tests for the packed-s2d Pallas conv (ops/pallas/ps2d.py)
against the XLA s2d formulation (itself tested == conv3d_zcat ==
torch.nn.Conv3d in test_s2d.py / test_torch_parity.py). Interpret mode
on the CPU backend; the real-chip A/B lives in benchmarks/probe_ps2d.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.s2d import (
    conv3d_s2d, space_to_depth_hw)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas.ps2d import (
    GUARD, make_ps2d_plan, pack_flat, ps2d_conv3d, ps2d_conv3d_flat,
    unpack_flat)

RNG = np.random.default_rng(7)


def _run(B, D, H, W, ci, co, Hb=None):
    x = jnp.asarray(RNG.normal(size=(B, D, H, W, ci)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(
        RNG.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * 0.1,
        jnp.bfloat16)
    xp = space_to_depth_hw(x)
    plan = make_ps2d_plan(H // 2, W // 2, ci, co)
    assert plan is not None
    if Hb is not None:
        plan = plan._replace(Hb=Hb)
    yf = ps2d_conv3d_flat(pack_flat(xp, plan), w, plan, interpret=True)
    y = np.asarray(unpack_flat(yf, plan), np.float32)
    ref = np.asarray(conv3d_s2d(xp, w), np.float32)
    return y, ref, yf, plan


def _assert_bf16_close(y, ref):
    # both sides cast to bf16; summation order may differ by 1 ulp
    rel = np.abs(y - ref) / np.maximum(np.abs(ref), 1e-2)
    assert rel.max() <= 2 ** -7 + 1e-6, rel.max()
    assert (np.abs(y - ref) > 0).mean() < 5e-3


@pytest.mark.parametrize(
    "B,D,H,W,ci,co,Hb",
    [
        (1, 5, 8, 12, 32, 32, None),     # single block
        (1, 5, 8, 12, 32, 32, 2),        # GH = 2
        (1, 4, 12, 8, 32, 32, 2),        # GH = 3
        (2, 3, 8, 8, 64, 32, None),      # batch, ci=64 (dec0 shape)
        (1, 1, 8, 8, 32, 16, None),      # D = 1, head co=16
        (1, 2, 8, 8, 32, 8, None),       # D = 2, N4 = 32
        (1, 7, 16, 20, 64, 64, 4),       # larger, GH = 2
        (1, 3, 8, 12, 4, 32, None),      # enc0: ci=4 channel-padded
        (1, 3, 8, 12, 32, 16, None),     # head: co=16 channel-padded
        (1, 3, 8, 12, 4, 4, None),       # both padded
    ])
def test_ps2d_matches_xla_s2d(B, D, H, W, ci, co, Hb):
    y, ref, _, _ = _run(B, D, H, W, ci, co, Hb)
    _assert_bf16_close(y, ref)


def test_flat_output_pads_are_zero():
    """The flat output must carry exact-zero halos so kernels chain."""
    _, _, yf, plan = _run(1, 3, 8, 12, 32, 32, Hb=2)
    y = np.asarray(yf, np.float32)
    body = y[:, :, :(plan.H2 + 2) * plan.P].reshape(
        1, 3, plan.H2 + 2, plan.P, plan.N4)
    assert np.abs(body[:, :, 0]).max() == 0          # row a = 0
    assert np.abs(body[:, :, -1]).max() == 0         # row a = H2+1
    assert np.abs(body[:, :, :, 0]).max() == 0       # col b = 0
    assert np.abs(body[:, :, :, plan.W2 + 1:]).max() == 0
    assert np.abs(y[:, :, (plan.H2 + 2) * plan.P:]).max() == 0  # guard


def test_kernels_chain_without_repacking():
    """conv -> conv directly on the flat form == two XLA s2d convs."""
    B, D, H, W, ci, mid, co = 1, 3, 8, 12, 32, 32, 32
    x = jnp.asarray(RNG.normal(size=(B, D, H, W, ci)).astype(np.float32),
                    jnp.bfloat16)
    w1 = jnp.asarray(RNG.normal(size=(3, 3, 3, ci, mid)) * 0.1,
                     jnp.bfloat16)
    w2 = jnp.asarray(RNG.normal(size=(3, 3, 3, mid, co)) * 0.1,
                     jnp.bfloat16)
    xp = space_to_depth_hw(x)
    plan1 = make_ps2d_plan(H // 2, W // 2, ci, mid)
    plan2 = make_ps2d_plan(H // 2, W // 2, mid, co)
    y1f = ps2d_conv3d_flat(pack_flat(xp, plan1), w1, plan1,
                           interpret=True)
    y2 = unpack_flat(ps2d_conv3d_flat(y1f, w2, plan2, interpret=True),
                     plan2)
    ref = conv3d_s2d(conv3d_s2d(xp, w1), w2)
    _assert_bf16_close(np.asarray(y2, np.float32),
                       np.asarray(ref, np.float32))


def test_plan_pads_channels():
    plan = make_ps2d_plan(4, 6, 8, 32)
    assert plan is not None and plan.C4 == 128       # ci 8 -> 32
    plan = make_ps2d_plan(4, 6, 32, 16)
    assert plan is not None and plan.N4 == 128       # co 16 -> 32
    assert plan.P % 16 == 0
    assert GUARD % 16 == 0


def test_packed_convenience_wrapper():
    x = jnp.asarray(RNG.normal(size=(1, 3, 8, 8, 32)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(RNG.normal(size=(3, 3, 3, 32, 32)) * 0.1,
                    jnp.bfloat16)
    xp = space_to_depth_hw(x)
    y = ps2d_conv3d(xp, w, interpret=True)
    _assert_bf16_close(np.asarray(y, np.float32),
                       np.asarray(conv3d_s2d(xp, w), np.float32))
