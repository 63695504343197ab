"""Sweep int8 conv formulation variants on the dec4-only quantized
model (the block whose in-model int8 regression costs ~20 ms: XLA
inserts ~4 GB of relayout copies around the int8 conv, see
/tmp-layout analysis logged in RESULTS.md)."""

import os
import subprocess
import sys

CASES = [
    ("ksplit/int32 dec4", {"SEG3D_INT8_FORM": "ksplit"}),
    ("ksplit/bf16acc dec4", {"SEG3D_INT8_FORM": "ksplit",
                             "SEG3D_INT8_ACC": "bf16"}),
    ("qlast/int32 ALL", {"SEG3D_INT8_FORM": "qlast",
                         "SEG3D_QB": "all"}),
]

SNIPPET = r'''
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.quantize import calibrate_int8

f = jax.jit(lambda x: x + 1.0); float(f(jnp.float32(0)))
ts = []
for _ in range(8):
    t0 = time.time(); float(f(jnp.float32(0))); ts.append(time.time() - t0)
rtt = min(ts)

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
import os
qb = None if os.environ.get("SEG3D_QB") == "all" else ("dec4",)
model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False,
               quant_blocks=qb)
x = jnp.asarray(rng.normal(size=(1, 160, 192, 144, 4)), jnp.bfloat16)
vs = jax.jit(model.init, static_argnames=("train",))(
    key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)
qvs = calibrate_int8(model, vs, [x[0]])
qmodel = model.clone(quant_mode="int8")

def chained(v, xx):
    def body(c, _):
        out = qmodel.apply(v, xx + (c * 1e-30).astype(xx.dtype),
                           train=False)["logits"]
        return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
    tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=3)
    return tot

g = jax.jit(chained)
t0 = time.time(); float(g(qvs, x)); comp = time.time() - t0
reps = []
for _ in range(3):
    t0 = time.time(); float(g(qvs, x)); reps.append(time.time() - t0)
dt = (min(reps) - rtt) / 3
print(f"RESULT {dt*1e3:.2f} ms (compile {comp:.0f}s)", flush=True)
'''


def main():
    for name, env in CASES:
        e = dict(os.environ, **env)
        r = subprocess.run([sys.executable, "-c", SNIPPET], env=e,
                           capture_output=True, text=True, timeout=1500)
        out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name:18s} {out[0][7:] if out else 'FAILED: ' + r.stderr[-200:]}",
              flush=True)


if __name__ == "__main__":
    main()
