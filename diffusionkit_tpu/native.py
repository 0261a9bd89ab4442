"""ctypes bindings for the native I/O library (native/dkio.cpp).

Builds ``libdkio.so`` on demand with g++ (cached next to the source) and
falls back to pure numpy when no toolchain is available, so the package
stays importable everywhere. See native/dkio.cpp for what lives natively
and why.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from .utils import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libdkio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "dkio.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread",
        str(src), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain absent / sandboxed build dir
        logger.debug("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libdkio; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "dkio.cpp"
    stale = (
        _SO_PATH.exists()
        and src.exists()
        and _SO_PATH.stat().st_mtime < src.stat().st_mtime
    )
    if (not _SO_PATH.exists() or stale) and not _build() and not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.dk_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        lib.dk_prefetch.restype = ctypes.c_int
        for name in ("dk_f16_to_f32", "dk_bf16_to_f32"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
            fn.restype = None
        lib.dk_f32_to_bf16.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.dk_f32_to_bf16.restype = None
        try:  # absent in pre-quantizer builds of the .so
            lib.dk_quantize_int4.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.dk_quantize_int4.restype = None
        except AttributeError:
            pass
        try:  # absent in pre-ALS builds of the .so
            lib.dk_quantize_int4_als.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.dk_quantize_int4_als.restype = None
        except AttributeError:
            pass
        _lib = lib
    except OSError as e:
        logger.debug("libdkio load failed: %s", e)
    return _lib


def prefetch(buf, eager: bool = False) -> None:
    """madvise(WILLNEED) a buffer (e.g. a mmap'd checkpoint); no-op without
    the native lib."""
    lib = get_lib()
    if lib is None:
        return
    # np.frombuffer accepts read-only buffers (ctypes.from_buffer does not).
    view = np.frombuffer(buf, dtype=np.uint8)
    lib.dk_prefetch(ctypes.c_void_p(view.ctypes.data), view.size, int(eager))


def f16_to_f32(src: np.ndarray) -> np.ndarray:
    """Bulk fp16 -> fp32 (native when available)."""
    assert src.dtype == np.float16
    lib = get_lib()
    flat = np.ascontiguousarray(src)
    if lib is None:
        return flat.astype(np.float32)
    out = np.empty(flat.shape, np.float32)
    lib.dk_f16_to_f32(
        flat.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        flat.size,
    )
    return out


def quantize_int4(w: np.ndarray, group_size: int):
    """Multi-threaded affine int4 group quantization of an (in, out) float32
    kernel into the execution layout (packed uint32 + fp32 scales/zeros).
    Returns None when the native lib is unavailable (caller uses numpy)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dk_quantize_int4"):
        return None
    in_dim, out_dim = w.shape
    w = np.ascontiguousarray(w, dtype=np.float32)
    packed = np.empty((in_dim // 8, out_dim), np.uint32)
    scales = np.empty((in_dim // group_size, out_dim), np.float32)
    zeros = np.empty_like(scales)
    lib.dk_quantize_int4(
        w.ctypes.data_as(ctypes.c_void_p), in_dim, out_dim, group_size,
        packed.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
        zeros.ctypes.data_as(ctypes.c_void_p),
    )
    return {"q4": packed, "scales": scales, "zeros": zeros}


def quantize_int4_als(w: np.ndarray, group_size: int, iters: int = 8,
                      f16_grid: bool = True, want_wscale: bool = False):
    """Refined (alternating-least-squares) affine int4 group quantization —
    native/dkio.cpp dk_quantize_int4_als. With ``f16_grid`` the winning
    scales/zeros are rounded to IEEE half (the storage dtype) before the
    final requantize, and are returned as float16 arrays. ``want_wscale``
    additionally returns the exact per-out-channel max|dequant|/127 (the
    w4a8 int8-grid scale), tracked during packing — computing it afterwards
    costs a second full nibble-unpack of the model (minutes at 12B in
    numpy). Returns None when the native lib is unavailable (caller uses
    the numpy implementation)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dk_quantize_int4_als"):
        return None
    in_dim, out_dim = w.shape
    w = np.ascontiguousarray(w, dtype=np.float32)
    packed = np.empty((in_dim // 8, out_dim), np.uint32)
    scales = np.empty((in_dim // group_size, out_dim), np.float32)
    zeros = np.empty_like(scales)
    wscale = np.empty((out_dim,), np.float32) if want_wscale else None
    lib.dk_quantize_int4_als(
        w.ctypes.data_as(ctypes.c_void_p), in_dim, out_dim, group_size,
        iters, int(f16_grid),
        packed.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
        zeros.ctypes.data_as(ctypes.c_void_p),
        wscale.ctypes.data_as(ctypes.c_void_p) if want_wscale else None,
    )
    if f16_grid:  # values are already half-rounded; the cast is lossless
        scales = scales.astype(np.float16)
        zeros = zeros.astype(np.float16)
    out = {"q4": packed, "scales": scales, "zeros": zeros}
    if want_wscale:
        out["wscale"] = wscale
    return out


def f32_to_bf16(src: np.ndarray) -> np.ndarray:
    """Bulk fp32 -> bf16 (round-to-nearest-even), returned as ml_dtypes array."""
    import ml_dtypes

    flat = np.ascontiguousarray(src, dtype=np.float32)
    lib = get_lib()
    if lib is None:
        return flat.astype(ml_dtypes.bfloat16)
    out = np.empty(flat.shape, np.uint16)
    lib.dk_f32_to_bf16(
        flat.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        flat.size,
    )
    return out.view(ml_dtypes.bfloat16)
