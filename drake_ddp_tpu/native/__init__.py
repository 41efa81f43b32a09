"""Native (C++) host-side components.

The reference's native layer is Drake's C++ core; on TPU the compute
path is JAX/XLA, and native code serves the *host-side runtime* around
it.  Currently: ``meshproc`` — OBJ parsing + sphere-cover approximation
of mesh collision geometry (the model-build path's hot loop when
sweeping many models).  Libraries are compiled on demand with g++ and
cached next to their sources; every native entry point has a pure-Python
fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "meshproc.cpp")
_LIB = os.path.join(_DIR, "libmeshproc.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_meshproc() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native mesh library; None if
    unavailable (callers fall back to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.meshproc_sphere_cover.restype = ctypes.c_int
        lib.meshproc_sphere_cover.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def sphere_cover(obj_path: str, scale: float = 1.0,
                 max_spheres: int = 4
                 ) -> Optional[List[Tuple[np.ndarray, float]]]:
    """Native sphere cover of an OBJ mesh; None if the library is
    unavailable or parsing failed (caller falls back to io/mesh.py)."""
    lib = load_meshproc()
    if lib is None:
        return None
    centers = (ctypes.c_double * (3 * max_spheres))()
    radii = (ctypes.c_double * max_spheres)()
    n = lib.meshproc_sphere_cover(
        obj_path.encode(), ctypes.c_double(scale),
        ctypes.c_int(max_spheres), centers, radii)
    if n <= 0:
        return None
    return [
        (np.array(centers[3 * i:3 * i + 3]), float(radii[i]))
        for i in range(n)
    ]
