"""Logging, memory statistics, and image metrics.

Replaces the reference's ``argmaxtools.utils.get_logger`` and
``mx.metal.get_peak_memory``-based accounting (reference
python/src/diffusionkit/mlx/__init__.py:318-533, utils.py:11-83) with
JAX/TPU-native equivalents.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Optional

import numpy as np

_LOGGERS: Dict[str, logging.Logger] = {}


def get_logger(name: str) -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(levelname)s:%(asctime)s:%(name)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("DIFFUSIONKIT_TPU_LOGLEVEL", "INFO"))
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


def bytes2gigabytes(n: int) -> float:
    """Unit conversion (reference utils.py:11-13)."""
    return n / (1024**3)


def device_memory_stats(device=None) -> Dict[str, Optional[float]]:
    """HBM statistics for one device, in bytes.

    TPU equivalent of ``mx.metal.get_peak_memory``/``get_active_memory``
    (reference mlx/__init__.py:322-326). XLA exposes no per-section peak
    reset, so callers record high-water marks per phase instead.
    Returns ``{"peak_memory": None, "active_memory": None}`` on backends
    without memory stats (e.g. CPU).
    """
    import jax

    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {"peak_memory": None, "active_memory": None}
    return {
        "peak_memory": stats.get("peak_bytes_in_use"),
        "active_memory": stats.get("bytes_in_use"),
    }


def memory_snapshot_gb(device=None) -> Dict[str, Optional[float]]:
    stats = device_memory_stats(device)
    return {
        k: (round(bytes2gigabytes(v), 3) if v is not None else None)
        for k, v in stats.items()
    }


def compute_psnr(reference: np.ndarray, proxy: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (reference utils.py:66-83)."""
    reference = np.asarray(reference, dtype=np.float64).squeeze()
    proxy = np.asarray(proxy, dtype=np.float64).squeeze()
    assert reference.shape == proxy.shape, (reference.shape, proxy.shape)
    peak = np.abs(reference).max()
    noise = reference - proxy
    noise_power = np.power(noise, 2).mean()
    if noise_power == 0:
        return float("inf")
    return float(20 * np.log10(peak / np.sqrt(noise_power)))


def image_psnr(reference, image) -> float:
    """PSNR between two images (PIL Images or arrays) (reference utils.py:52-63)."""
    return compute_psnr(np.asarray(reference), np.asarray(image))


def tree_num_params(tree) -> int:
    """Total parameter count of a pytree (reference utils.py:16-49
    ``_load_weights`` param-count validation role).

    int4-packed leaves (uint32 "q4" words, ops/quantized.py) count as the 8
    weights they carry, so a 12B int4 model reports 12B, not 1.5B; the
    per-group scales/zeros count as themselves (they are real memory).
    """
    import jax
    import numpy as np

    total = 0
    for path, x in jax.tree_util.tree_flatten_with_path(tree)[0]:
        n = int(np.prod(x.shape))
        if any(getattr(p, "key", None) == "q4" for p in path):
            n *= 8
        total += n
    return total


def inference_context() -> Dict[str, object]:
    """OS/device spec report — equivalent of the reference's
    ``DiffusionKitInferenceContext`` (reference mlx/__init__.py:56-61,512-517,
    argmaxtools AppleSiliconContextMixin) for TPU hosts."""
    import platform

    import jax

    dev = jax.devices()[0]
    return {
        "os": f"{platform.system()} {platform.release()}",
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "num_devices": jax.device_count(),
        "process_index": jax.process_index(),
        "num_processes": jax.process_count(),
    }


_COMPILE_CACHE_SET = False


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache.

    Cold-start matters for serving: large MMDiT programs take minutes to
    compile. Called automatically by the pipelines; opt out with
    DIFFUSIONKIT_TPU_COMPILE_CACHE=0 or point it at a shared directory.
    """
    global _COMPILE_CACHE_SET
    if _COMPILE_CACHE_SET:
        return
    env = os.environ.get("DIFFUSIONKIT_TPU_COMPILE_CACHE", "")
    if env == "0":
        return
    import jax

    # CPU programs compile in seconds and XLA:CPU AOT entries are
    # host-CPU-feature specific (cached entries from another machine load
    # with SIGILL-risk warnings), so the persistent cache is TPU/GPU-only.
    if jax.default_backend() == "cpu" and not env:
        return

    cache_dir = os.path.expanduser(env or "~/.cache/diffusionkit_tpu/xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # No min-compile-time floor: behind a PJRT relay (the axon backend)
        # the LOCAL compile call returns in <1 s while the real compile runs
        # remotely, so JAX's default 1.0 s floor rejects writing exactly the
        # expensive Mosaic-bearing programs (the MMDiT step recompiled 3-5
        # min in every new process). Entries for genuinely tiny programs are
        # a few KB — caching them is harmless.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _COMPILE_CACHE_SET = True
    except Exception as e:  # pragma: no cover - config name drift
        get_logger(__name__).debug("compilation cache unavailable: %s", e)
