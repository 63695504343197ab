"""Environment bootstrap: seeding, logging, dependency validation.

Parity with reference ``environment.py:13-95`` re-designed functionally:
instead of mutating global RNG state (``environment.py:16-21``), the
setup returns an explicit ``jax.random.PRNGKey`` — JAX transforms need
keys threaded through, not ambient seeds (NumPy seeding is still applied
for host-side code).
"""

from __future__ import annotations

import importlib
import logging
import os
import time
from typing import Dict, Optional, Tuple

logger = logging.getLogger(__name__)

REQUIRED_PACKAGES = (
    "jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "chex",
    "einops", "numpy", "scipy", "matplotlib", "PIL",
)
OPTIONAL_PACKAGES = ("torch", "pandas", "sklearn", "wandb")

DEFAULT_DIRS = ("data/raw", "data/processed", "data/synthetic",
                "results/models", "results/reports",
                "results/visualizations", "logs", "checkpoints",
                "uploads")


def setup_logging(log_dir: str = "logs",
                  level: int = logging.INFO) -> str:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir,
                        f"app_{time.strftime('%Y%m%d_%H%M%S')}.log")
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(), logging.FileHandler(path)],
        force=True)
    return path


def validate_dependencies(verbose: bool = True
                          ) -> Tuple[bool, Dict[str, bool]]:
    """Probe required+optional packages (reference
    ``environment.py:60-95``)."""
    status: Dict[str, bool] = {}
    ok = True
    for pkg in REQUIRED_PACKAGES:
        try:
            importlib.import_module(pkg)
            status[pkg] = True
        except ImportError:
            status[pkg] = False
            ok = False
            if verbose:
                logger.error("missing required package: %s", pkg)
    for pkg in OPTIONAL_PACKAGES:
        try:
            importlib.import_module(pkg)
            status[pkg] = True
        except ImportError:
            status[pkg] = False
            if verbose:
                logger.info("optional package not available: %s", pkg)
    return ok, status


def describe_devices() -> str:
    try:
        import jax
        devs = jax.devices()
        return f"{len(devs)} x {devs[0].platform}:{devs[0].device_kind}"
    except Exception as e:
        return f"no accelerator ({e})"


def ensure_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    XLA compiles of the full-resolution normalize/augment/train programs
    take 30-150 s each on this class of attach; the persistent cache
    makes every process after the first start in seconds. Honors
    ``SEG3D_JAX_CACHE_DIR``; defaults to the repo-level ``.jax_cache/``
    — the SAME directory bench.py and benchmarks/ hardcode, so serve/
    train/CLI processes and benchmark processes share one cache
    instead of each paying their own cold compiles.
    """
    import jax
    repo_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              os.pardir, ".jax_cache")
    cache_dir = (cache_dir or os.environ.get("SEG3D_JAX_CACHE_DIR")
                 or os.path.abspath(repo_cache))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        if jax.config.jax_compilation_cache_dir != cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:      # never make startup fatal over caching
        logger.warning("compilation cache unavailable: %s", e)
    return cache_dir


def setup_environment(seed: int = 42, log_dir: str = "logs",
                      create_dirs: bool = True):
    """Seed + logging + dirs + dependency check; returns
    (prng_key, log_path). Reference ``environment.py:13-38``."""
    import numpy as np
    np.random.seed(seed)
    log_path = setup_logging(log_dir)
    if create_dirs:
        for d in DEFAULT_DIRS:
            os.makedirs(d, exist_ok=True)
    ok, _ = validate_dependencies()
    if not ok:
        logger.warning("some required dependencies are missing")
    logger.info("devices: %s", describe_devices())
    ensure_compilation_cache()
    import jax
    return jax.random.PRNGKey(seed), log_path


if __name__ == "__main__":
    key, path = setup_environment()
    print(f"environment ready; log at {path}")


def enable_nan_debugging(enable: bool = True) -> None:
    """Numerics sanitizer (SURVEY.md section 5): make jit'd programs
    fault on NaN production (jax_debug_nans)."""
    import jax
    jax.config.update("jax_debug_nans", enable)
