"""ctypes bindings for the native dcsynth data-synthesis core.

Builds ``native/dcsynth.cpp`` on first use (g++ -O3 -shared; no pybind11 in
the image, so the ABI is plain C + ctypes). All entry points have pure-python
fallbacks in :mod:`deepcharuco_tpu.data.augment` / ``dataset`` — the native
path is a drop-in accelerator for the host-bound synthesis loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dcsynth.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libdcsynth.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.dc_procedural_bg.argtypes = [ctypes.c_uint64, ctypes.c_int,
                                         ctypes.c_int, _u8p]
        lib.dc_composite_photometric.argtypes = [
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, _u8p, _u8p, _u8p,
            ctypes.c_int,
        ]
        lib.dc_box_blur.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    _u8p, _u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# numpy-facing wrappers
# ---------------------------------------------------------------------------

def procedural_bg(seed: int, h: int, w: int) -> np.ndarray:
    lib = load()
    out = np.empty((h, w, 3), np.uint8)
    lib.dc_procedural_bg(seed & (2**64 - 1), h, w, out)
    return out


def composite_photometric(seed: int, board: np.ndarray, mask: np.ndarray,
                          bg: np.ndarray, is_negative: bool = False,
                          blur_radius: int = 0) -> np.ndarray:
    """Fused paste+photometric stack, in place on a copy of ``bg``."""
    lib = load()
    h, w = bg.shape[:2]
    out = np.ascontiguousarray(bg.copy())
    lib.dc_composite_photometric(
        seed & (2**64 - 1), h, w,
        np.ascontiguousarray(board), np.ascontiguousarray(mask), out,
        int(is_negative),
    )
    if blur_radius > 0:
        scratch = np.empty_like(out)
        lib.dc_box_blur(h, w, blur_radius, out, scratch)
    return out


