"""Native (C) components, compiled on first use.

The compute path of this framework is JAX/XLA/Pallas; the host-side data
path (trajectory text I/O — the role the reference fills with its native
ascii utilities, src/utils/utils.h / cxx_utils.h) is C, built here into a
shared object with the system compiler and bound through ctypes.  No build
step at install time: the first import compiles (cached next to the user
cache dir); if no compiler is available everything falls back to numpy
paths (utils/trajectory.py), so the package never hard-depends on a
toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastio.c")
_LIB = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "uammd_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    cc = (
        os.environ.get("CC")
        or shutil.which("cc")
        or shutil.which("gcc")
        or shutil.which("clang")
    )
    if cc is None or not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"fastio-{tag}.so")
    if os.path.exists(out):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=_cache_dir())
    try:
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, out)  # atomic: concurrent builders race safely
        return out
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None


def get_fastio():
    """ctypes handle to the fastio library, or None (no compiler / build
    failure — callers fall back to numpy)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fastio_write_frame.restype = ctypes.c_long
        lib.fastio_write_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long, ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
        ]
        lib.fastio_read_floats.restype = ctypes.c_long
        lib.fastio_read_floats.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return get_fastio() is not None
