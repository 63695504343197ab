"""Decompose the e2e per-case device cost (r5: 2.08 s/vol u8 ship).

The e2e wire-format attack cut wire bytes 42 MB -> 17 MB/case but the
measured device+transfer barely moved (2.13 -> 2.08 s/vol), so bytes
are NOT the dominant term.  This probe isolates, on the real attach:

  1. H2D bandwidth by dtype/size (device_put + block_until_ready)
  2. D2H bandwidth by size (np.asarray of a device array)
  3. dispatch+sync overhead of a trivial jit (per-call RTT floor)
  4. the resident SW-inference compute time at the e2e bucket (the
     part that is genuinely compute)

so the e2e attribution can name the real bottleneck instead of
guessing.  Run on chip: python benchmarks/probe_tunnel.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

try:
    from ml_dtypes import bfloat16 as bf16
except ImportError:  # pragma: no cover
    bf16 = np.float16


def timeit(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    rng = np.random.default_rng(0)

    # --- 1. H2D by dtype ---
    shapes = [
        ("u8 crop (160,160,160,4) 16.4MB", rng.integers(0, 255, (160, 160, 160, 4), dtype=np.uint8)),
        ("bf16 crop (160,160,160,4) 32.8MB", rng.standard_normal((160, 160, 160, 4)).astype(bf16)),
        ("f32 crop (160,160,160,4) 65.5MB", rng.standard_normal((160, 160, 160, 4)).astype(np.float32)),
        ("u8 small (64,64,64,4) 1.0MB", rng.integers(0, 255, (64, 64, 64, 4), dtype=np.uint8)),
        ("bf16 small (64,64,64,4) 2.1MB", rng.standard_normal((64, 64, 64, 4)).astype(bf16)),
    ]
    for name, arr in shapes:
        mb = arr.nbytes / 1e6
        best, mean = timeit(
            lambda a=arr: jax.device_put(a, dev).block_until_ready())
        print(f"H2D {name}: best {best*1e3:7.1f} ms  mean {mean*1e3:7.1f} ms"
              f"  -> {mb/best:6.1f} MB/s", flush=True)

    # --- 2. per-call dispatch+sync floor (before D2H: a D2H attempt
    # can hard-crash the client process with no traceback — observed
    # 2026-08-20 — so the cheap diagnostic runs first) ---
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    best, mean = timeit(lambda: np.asarray(f(x)))
    print(f"trivial jit round-trip: best {best*1e3:.1f} ms  mean {mean*1e3:.1f} ms",
          flush=True)

    # --- 3. D2H by size, each size in its OWN subprocess so a client
    # crash costs one measurement, not the probe ---
    import subprocess
    for name, shape, dt in [
        ("packed labels (160,160,40) 1.0MB", (160, 160, 40), "uint8"),
        ("int8 full map (240,240,155) 8.9MB", (240, 240, 155), "int8"),
        ("f32 16MB", (2048, 2048), "float32"),
    ]:
        code = (
            "import time, numpy as np, jax, jax.numpy as jnp\n"
            f"y = jnp.ones({shape!r}, jnp.{dt}).block_until_ready()\n"
            "np.asarray(y)\n"
            "ts = []\n"
            "for _ in range(5):\n"
            "    t0 = time.time(); np.asarray(y); ts.append(time.time()-t0)\n"
            "print('RESULT', min(ts), sum(ts)/len(ts))\n")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=300)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("RESULT")]
            if not line:
                print(f"D2H {name}: FAILED rc={r.returncode} "
                      f"(client died: {r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else 'no stderr'})",
                      flush=True)
                continue
            best, mean = (float(v) for v in line[0].split()[1:])
        except subprocess.TimeoutExpired:
            print(f"D2H {name}: HUNG >300s", flush=True)
            continue
        nbytes = int(np.prod(shape)) * np.dtype(dt).itemsize
        print(f"D2H {name}: best {best*1e3:7.1f} ms  mean {mean*1e3:7.1f} ms"
              f"  -> {nbytes/1e6/best:6.1f} MB/s", flush=True)

    # --- 4. resident compute at the e2e bucket ---
    pkg = "segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu"
    from importlib import import_module
    models = import_module(pkg + ".models")
    preprocess = import_module(pkg + ".data.preprocess")
    sw = import_module(pkg + ".inference.sliding_window")

    model = models.UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
    key = jax.random.PRNGKey(0)
    var = model.init(key, jnp.zeros((1, 64, 64, 64, 4), jnp.bfloat16),
                     train=False)
    apply_fn = lambda v, x: model.apply(v, x, train=False)

    bucket = (160, 160, 160)
    roi = (160, 160, 160)
    crop = jax.device_put(
        rng.standard_normal((*bucket, 4)).astype(np.float32), dev)

    def seg_one(v, x):
        x = preprocess.preprocess_multimodal(x, out_size=None)
        logits = sw.sliding_window_inference(
            v, x, apply_fn, roi_size=roi, overlap=0.25, sw_batch_size=1,
            blend_mode="gaussian", out_channels=4)
        seg = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        s = seg.reshape(*seg.shape[:2], -1, 4)
        return (s[..., 0] | (s[..., 1] << 2) | (s[..., 2] << 4)
                | (s[..., 3] << 6))

    jrun = jax.jit(seg_one)
    t0 = time.time()
    jrun(var, crop).block_until_ready()
    print(f"resident seg compile+first: {time.time()-t0:.1f} s", flush=True)
    best, mean = timeit(lambda: jrun(var, crop).block_until_ready(), reps=5)
    print(f"resident seg (160^3 bucket, normalize+SW+argmax+pack): "
          f"best {best*1e3:7.1f} ms  mean {mean*1e3:7.1f} ms", flush=True)

    # --- 5. grouped dispatch (the --e2e_group path): per-case time of
    # one scan-of-G launch vs G single launches isolates the fixed
    # per-launch cost the grouping amortizes ---
    G = 4
    jrun_g = jax.jit(lambda v, xs: jax.lax.scan(
        lambda _, c: (None, seg_one(v, c)), None, xs)[1])
    crops = jnp.stack([crop] * G)
    t0 = time.time()
    jrun_g(var, crops).block_until_ready()
    print(f"grouped seg compile+first: {time.time()-t0:.1f} s", flush=True)
    best, mean = timeit(lambda: jrun_g(var, crops).block_until_ready(),
                        reps=5)
    print(f"grouped seg (G={G}, one launch): best {best*1e3/G:7.1f} ms/case"
          f"  mean {mean*1e3/G:7.1f} ms/case", flush=True)


if __name__ == "__main__":
    main()
