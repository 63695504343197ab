"""Probe: space-to-depth conv formulation vs zcat on the lane-starved
extremity blocks (crop bucket 160x192x144).

Measures realistic DoubleConv CHAINS (conv-GN-relu x2 + residual), not
bare convs — previous formulations (ksplit/zsum/int8) won standalone
and lost in-model to zcat's concat-into-epilogue fusion, so the chain
with its GN/ReLU epilogues is the unit that predicts in-model behavior.

Variants per chain:
  zcat     — current production formulation
  s2d      — whole chain in s2d layout, boundary conversions EXCLUDED
             (the model keeps level 0 in s2d end-to-end)
  s2d+conv — s2d layout including the s2d/d2s boundary conversions
             (upper bound on conversion cost if layouts don't fuse)

Timing: sustained scan-chained (single readback), warm compile.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops import s2d
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv1x1, conv3d_zcat, conv3d_ksplit)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import group_norm


def dc_zcat(x, p):
    """DoubleConv chain, zcat formulation, normal layout."""
    h = conv3d_zcat(x, p["w1"].astype(x.dtype))
    h = group_norm(h, p["g1"], p["b1"], 8)
    h = jax.nn.relu(h)
    h = conv3d_zcat(h, p["w2"].astype(x.dtype))
    h = group_norm(h, p["g2"], p["b2"], 8)
    h = jax.nn.relu(h)
    if p["w1"].shape[3] == p["w2"].shape[4]:
        return h + x
    r = conv1x1(x, p["wp"].astype(x.dtype))
    r = group_norm(r, p["gp"], p["bp"], 8)
    return h + r


def dc_s2d(x, p):
    """Same chain in s2d layout (x already s2d)."""
    h = s2d.conv3d_s2d(x, p["w1"].astype(x.dtype))
    h = s2d.group_norm_s2d(h, p["g1"], p["b1"], 8)
    h = jax.nn.relu(h)
    h = s2d.conv3d_s2d(h, p["w2"].astype(x.dtype))
    h = s2d.group_norm_s2d(h, p["g2"], p["b2"], 8)
    h = jax.nn.relu(h)
    if p["w1"].shape[3] == p["w2"].shape[4]:
        return h + x
    r = s2d.conv1x1_s2d(x, p["wp"].astype(x.dtype))
    r = s2d.group_norm_s2d(r, p["gp"], p["bp"], 8)
    return h + r


def head_zcat(x, p):
    h = conv3d_ksplit(x, p["w1"].astype(x.dtype))   # production: ksplit
    return jax.nn.relu(h * p["g1"][:16].astype(h.dtype))


def head_s2d(x, p):
    h = s2d.conv3d_s2d(x, p["w1"].astype(x.dtype))
    return jax.nn.relu(h * jnp.tile(p["g1"][:16], 4).astype(h.dtype))


def make_params(rng, ci, co):
    mid = co
    p = {"w1": rng.normal(size=(3, 3, 3, ci, mid)).astype(np.float32) * .1,
         "g1": np.ones(mid, np.float32), "b1": np.zeros(mid, np.float32),
         "w2": rng.normal(size=(3, 3, 3, mid, co)).astype(np.float32) * .1,
         "g2": np.ones(co, np.float32), "b2": np.zeros(co, np.float32)}
    if ci != co:
        p.update(
            wp=rng.normal(size=(1, 1, 1, ci, co)).astype(np.float32) * .1,
            gp=np.ones(co, np.float32), bp=np.zeros(co, np.float32))
    return jax.tree.map(jnp.asarray, p)


def timed(fn, params, x, steps, iters):
    """Sustained: scan `steps` applications, single readback."""
    def run(p, x0):
        def body(h, _):
            out = fn(h, p)
            # re-inject to keep shapes closed without growing memory:
            # feed the chain its own output when shapes match, else x0
            h2 = out if out.shape == h.shape else x0
            return h2, jnp.sum(out[..., 0].astype(jnp.float32))
        _, sums = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(sums)

    jrun = jax.jit(run)
    t0 = time.time()
    float(jrun(params, x))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(iters):
        t0 = time.time()
        float(jrun(params, x))
        best = min(best, time.time() - t0)
    return best / steps * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(160, 192, 144))
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chains", nargs="*",
                    default=["enc0", "dec_last", "head"])
    args = ap.parse_args()

    D, H, W = args.shape
    rng = np.random.default_rng(0)
    specs = {"enc0": (4, 32), "dec_last": (64, 32), "head": (32, 16)}

    for name in args.chains:
        ci, co = specs[name]
        p = make_params(rng, ci, co)
        xn = jnp.asarray(
            rng.normal(size=(1, D, H, W, ci)).astype(np.float32)
        ).astype(jnp.bfloat16)
        xs = s2d.space_to_depth_hw(xn)

        if name == "head":
            fz, fs = head_zcat, head_s2d
        else:
            fz, fs = dc_zcat, dc_s2d

        ms_z, cz = timed(fz, p, xn, args.steps, args.iters)
        ms_s, cs = timed(fs, p, xs, args.steps, args.iters)

        def with_conv(x, pp):
            return s2d.depth_to_space_hw(fs(s2d.space_to_depth_hw(x), pp))
        ms_c, cc = timed(with_conv, p, xn, args.steps, args.iters)

        print(f"{name:9s} ({ci:3d}->{co:3d}) @ {D}x{H}x{W}: "
              f"zcat {ms_z:7.2f} ms | s2d {ms_s:7.2f} ms "
              f"({ms_z / ms_s:4.2f}x) | s2d+conv {ms_c:7.2f} ms "
              f"({ms_z / ms_c:4.2f}x)   [compile {cz:.0f}/{cs:.0f}/{cc:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
