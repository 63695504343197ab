"""Op-level XLA profile of the ps2d vs base forward (jax.profiler
works through the axon attach — device ops land in the trace under
pid /device:TPU:0). Prints the top device ops for each variant so the
+16 ms in-model ps2d loss can be attributed to named fusions instead
of argued by subtraction."""

import collections
import glob
import gzip
import json
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D  # noqa: E402


def device_ops(trace_dir):
    f = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(f))
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    durs = collections.Counter()
    counts = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            if e["name"].startswith("jit"):
                continue          # module-level envelope
            durs[e["name"]] += e.get("dur", 0)
            counts[e["name"]] += 1
    return durs, counts


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    xin = jnp.asarray(
        rng.normal(size=(1, 160, 192, 144, 4)).astype(np.float32))
    for ps2d in (False, True):
        m = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False,
                   ps2d_eval=ps2d)
        v = jax.jit(m.init, static_argnames=("train",))(
            key, jnp.zeros((1, 128, 128, 128, 4), jnp.float32),
            train=False)
        fwd = jax.jit(lambda vv, xx: jnp.argmax(
            m.apply(vv, xx, train=False)["logits"], -1))
        fwd(v, xin).block_until_ready()
        tdir = f"/tmp/ps2d_prof_{int(ps2d)}"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(reps):
                fwd(v, xin).block_until_ready()
        durs, counts = device_ops(tdir)
        total = sum(durs.values()) / 1000 / reps
        print(f"\n== ps2d={ps2d}: device total {total:.2f} ms/iter ==")
        for name, us in durs.most_common(28):
            print(f"  {us/1000/reps:8.3f} ms  x{counts[name]//reps:<3d}"
                  f" {name[:90]}")


if __name__ == "__main__":
    main()
