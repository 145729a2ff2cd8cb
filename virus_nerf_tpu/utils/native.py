"""ctypes bindings to the native (C++) components in native/.

The native library accelerates host-side data loading (PCD point-cloud
parsing — multi-million-point GT maps are read at every dataset
construction).  If the shared library is missing it is built on first use
when a compiler is available; otherwise callers fall back to the pure-
Python implementations (virus_nerf_tpu.data.pcl), which are also the
golden reference the native code is tested against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpcd_io.so")

_lib = None
_load_attempted = False


def _try_build() -> bool:
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, built on demand; None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pcd_load_xyz.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.pcd_load_xyz.restype = ctypes.c_int
    lib.pcd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.pcd_save_xyz.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.pcd_save_xyz.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_pcd_native(path: str) -> Optional[np.ndarray]:
    """Load x/y/z from a PCD file via the native parser; None when the
    library is unavailable.  Raises on parse errors."""
    lib = get_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    rc = lib.pcd_load_xyz(
        path.encode(), ctypes.byref(data), ctypes.byref(n)
    )
    if rc != 0:
        raise ValueError(f"native PCD parse failed (code {rc}): {path}")
    try:
        out = np.ctypeslib.as_array(data, shape=(n.value, 3)).copy()
    finally:
        lib.pcd_free(data)
    return out


def save_pcd_native(path: str, xyz: np.ndarray, binary: bool = True) -> bool:
    """Save an (N, 3) cloud via the native writer; False when unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    rc = lib.pcd_save_xyz(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xyz.shape[0],
        1 if binary else 0,
    )
    if rc != 0:
        raise IOError(f"native PCD write failed: {path}")
    return True
