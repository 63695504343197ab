"""Per-block conv-formulation sweep on the full-model forward.

The uniform Cout-threshold sweeps (RESULTS.md) switch encoder and
decoder blocks together; the int8 experiments showed enc/dec respond
asymmetrically, so per-block wins could cancel in those sweeps. This
probe times the whole bf16 forward at the crop bucket under
SEG3D_FORM_OVERRIDE combinations (module-path-substring=form).
"""

import os
import subprocess
import sys

CASES = [
    ("dec4=ksplit", "dec4=ksplit"),
    ("dec4/conv1=ksplit", "dec4/conv1=ksplit"),
    ("dec4=zsum", "dec4=zsum"),
    ("down0=ksplit", "down0=ksplit"),
    ("dec3+dec4=ksplit", "dec3=ksplit,dec4=ksplit"),
]

SNIPPET = r'''
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D

f = jax.jit(lambda x: x + 1.0); float(f(jnp.float32(0)))
ts = []
for _ in range(8):
    t0 = time.time(); float(f(jnp.float32(0))); ts.append(time.time() - t0)
rtt = min(ts)

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
x = jnp.asarray(rng.normal(size=(1, 160, 192, 144, 4)), jnp.bfloat16)
vs = jax.jit(model.init, static_argnames=("train",))(
    key, jnp.zeros((1, 64, 64, 64, 4), jnp.float32), train=False)

def chained(v, xx):
    def body(c, _):
        out = model.apply(v, xx + (c * 1e-30).astype(xx.dtype),
                          train=False)["logits"]
        return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
    tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
    return tot

g = jax.jit(chained)
t0 = time.time(); float(g(vs, x)); comp = time.time() - t0
reps = []
for _ in range(3):
    t0 = time.time(); float(g(vs, x)); reps.append(time.time() - t0)
print(f"RESULT {(min(reps)-rtt)/4*1e3:.2f} ms (compile {comp:.0f}s)",
      flush=True)
'''


def main():
    for name, override in CASES:
        e = dict(os.environ, SEG3D_FORM_OVERRIDE=override)
        try:
            r = subprocess.run([sys.executable, "-c", SNIPPET], env=e,
                               capture_output=True, text=True,
                               timeout=1200)
            out = [l for l in r.stdout.splitlines()
                   if l.startswith("RESULT")]
            msg = out[0][7:] if out else "FAILED: " + r.stderr[-200:]
        except Exception as e:
            msg = f"ERROR {e}"
        print(f"{name:22s} {msg}", flush=True)


if __name__ == "__main__":
    main()
