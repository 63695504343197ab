"""SPMD tests on the virtual 8-device CPU mesh: mesh construction,
batch-sharded training step == single-device step, explicit halo-exchange
spatial conv == global conv, dryrun_multichip entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    config as cfg_mod, models)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel import (
    batch_sharding, create_mesh, replicated, shard_batch)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel.spatial import (
    halo_exchange_d, sharded_conv3d, zero_boundary_halo_conv)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
    create_train_state, make_train_step)

FEATS = (8, 16)
IMG = (16, 16, 16)


def tiny_config():
    import dataclasses
    c = cfg_mod.Config()
    return c.replace(
        model=dataclasses.replace(c.model, features=FEATS,
                                  compute_dtype="float32", remat=False),
        use_tensorboard=False)


def test_mesh_shapes():
    m = create_mesh(4, 2)
    assert dict(m.shape) == {"data": 4, "space": 2}
    m2 = create_mesh(-1, 2)
    assert m2.shape["data"] == len(jax.devices()) // 2
    with pytest.raises(ValueError):
        create_mesh(16, 1)


@pytest.mark.slow
def test_dp_step_matches_single_device(rng):
    """Gradient psum over the mesh must reproduce single-device math."""
    cfg = tiny_config()
    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.float32)
    batch_np = {
        "image": rng.normal(size=(8, *IMG, 4)).astype(np.float32),
        "mask": rng.integers(0, 4, size=(8, *IMG)).astype(np.int32),
    }
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                (1, *IMG, 4))
    key = jax.random.PRNGKey(9)

    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.loop import (
        make_loss_fn)
    loss_fn = make_loss_fn(cfg)

    def grads_of(state, batch, key):
        def compute(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return loss_fn(out, batch["mask"])
        return jax.value_and_grad(compute)(state.params)

    batch1 = jax.tree_util.tree_map(jnp.asarray, batch_np)
    l1, g1 = jax.jit(grads_of, static_argnums=())(state0, batch1, key)

    mesh = create_mesh(4, 2)
    state_r = jax.device_put(state0, replicated(mesh))
    batch_s = shard_batch(batch1, mesh)
    lN, gN = jax.jit(grads_of)(state_r, batch_s, key)

    # loss and raw gradients (scale-sensitive: catches bad psum scaling)
    assert float(l1) == pytest.approx(float(lN), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)

    # and the full sharded optimizer step must run + stay finite
    stepN = make_train_step(cfg, mesh=mesh, donate=False)
    sN, mN = stepN(state_r, batch_s, key)
    assert np.isfinite(float(mN["loss"]))
    assert np.isfinite(float(mN["dice"]))


def test_halo_exchange_reconstructs_neighbours(rng):
    mesh = create_mesh(1, 8)
    x = jnp.asarray(rng.normal(size=(1, 32, 4, 4, 2)).astype(np.float32))
    from jax import shard_map

    f = shard_map(lambda xs: halo_exchange_d(xs, 1),
                  mesh=mesh, in_specs=(P(None, "space"),),
                  out_specs=P(None, "space"))
    out = np.asarray(f(x))     # each 4-slice shard -> 6 slices
    assert out.shape == (1, 48, 4, 4, 2)
    xn = np.asarray(x)
    shard1 = out[:, 6:12]
    np.testing.assert_array_equal(shard1[:, 0], xn[:, 3])   # left halo
    np.testing.assert_array_equal(shard1[:, 1:5], xn[:, 4:8])
    np.testing.assert_array_equal(shard1[:, 5], xn[:, 8])   # right halo
    # boundary clamp: first shard's left halo replicates slice 0
    np.testing.assert_array_equal(out[:, 0], xn[:, 0])


def test_sharded_conv_matches_global(rng):
    """Explicit halo-exchange conv == unsharded conv (zero-pad SAME)."""
    mesh = create_mesh(1, 8)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def conv_same(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")))

    def conv_valid_hw_same(v):
        # VALID in D (halo provides context), SAME in H/W
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")))

    want = conv_same(x)
    f = zero_boundary_halo_conv(mesh, conv_valid_hw_same)
    got = f(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_dryrun_multichip_8():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # asserts internally


@pytest.mark.slow
def test_entry_compiles_cpu():
    import __graft_entry__ as g
    fn, (v, x) = g.entry()
    small = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    out = jax.jit(fn)(v, small)
    assert out.shape == (1, 32, 32, 32, 4)


@pytest.mark.slow
def test_dp_batch_inference_matches_single_device(rng):
    """Mesh-sharded cohort segmentation == per-volume single-device."""
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
        models)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel import (
        create_mesh, segment_cohort)

    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.float32)
    vols = rng.normal(size=(5, *IMG, 4)).astype(np.float32)  # 5 % 8 != 0
    vars_ = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, *IMG, 4)), train=False)

    want = []
    for v in vols:
        out = model.apply(vars_, jnp.asarray(v)[None], train=False)
        want.append(np.asarray(
            jnp.argmax(out["logits"][0], -1).astype(jnp.int8)))
    want = np.stack(want)

    mesh = create_mesh(8, 1)
    got = segment_cohort(model, vars_, mesh, vols)
    np.testing.assert_array_equal(got, want)


def test_dp_shard_map_ps2d_matches_single_device(rng):
    """shard_map DP segmenter (auto-selected for the Pallas flat-region
    model, which GSPMD cannot partition) == single-device ps2d, exact.
    Also pins the auto-selection: a ps2d model routes via shard_map."""
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
        models)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel import (
        create_mesh)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel.infer import (
        make_dp_segmenter)

    model = models.UNet3D(out_channels=4, features=(32, 64),
                          dtype=jnp.float32, ps2d_eval=True,
                          ps2d_levels=2)
    vols = rng.normal(size=(8, 8, 16, 16, 4)).astype(np.float32)
    vars_ = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 4)),
        train=False)
    want = np.asarray(jax.jit(
        lambda v, b: jnp.argmax(
            model.apply(v, b, train=False)["logits"],
            -1).astype(jnp.int8))(vars_, jnp.asarray(vols)))

    mesh = create_mesh(8, 1)
    got = np.asarray(make_dp_segmenter(model, vars_, mesh)(
        jnp.asarray(vols)))
    np.testing.assert_array_equal(got, want)


def _windowpar_case(rng, **model_kwargs):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
        models)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.sliding_window import (
        sliding_window_inference)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.parallel import (
        create_mesh, sliding_window_inference_mp)

    mesh = create_mesh(8, 1)
    vol = jnp.asarray(rng.normal(size=(24, 24, 16, 4)).astype(np.float32))
    model = models.UNet3D(out_channels=4, dtype=jnp.float32,
                          **model_kwargs)
    vars_ = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)),
        train=False)

    def apply_fn(v, p):
        return model.apply(v, p, train=False)["logits"]

    sw_kw = dict(roi_size=(16, 16, 16), overlap=0.5, sw_batch_size=2)
    ref = np.asarray(sliding_window_inference(
        vars_, vol, apply_fn, **sw_kw))
    got = np.asarray(sliding_window_inference_mp(
        vars_, vol, apply_fn, mesh, **sw_kw))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_window_parallel_sliding_window_matches_single_device(rng):
    """Window-parallel sliding window (grid split over the mesh, one
    psum of the accumulators) == the single-device engine, up to fp32
    accumulation order."""
    _windowpar_case(rng, features=FEATS)


@pytest.mark.slow
def test_window_parallel_sliding_window_ps2d(rng):
    """Same, with the ps2d flat-region model — shard_map runs the
    Pallas kernels per chip unchanged (interpret mode here, so slow)."""
    _windowpar_case(rng, features=(32, 64), ps2d_eval=True,
                    ps2d_levels=2)


def test_sharded_conv3d_wrapper_matches_global(rng):
    """sharded_conv3d (the SAME-conv wrapper, zero global boundaries)
    == the unsharded zero-pad SAME conv — including the first/last D
    slices, which edge-replicated halos used to get wrong."""
    mesh = create_mesh(1, 8)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))

    def conv_same(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")))

    want = conv_same(x)
    got = sharded_conv3d(mesh, conv_same)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
