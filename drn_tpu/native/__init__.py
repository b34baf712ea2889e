"""ctypes binding for the native feature reader (feature_reader.cpp).

Builds the shared library with g++ on first import if missing (no
pybind11 — plain C ABI). Falls back cleanly when a toolchain isn't
available: `load()` returns None and callers use the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "feature_reader.cpp")
_LIB = os.path.join(_DIR, "libfeature_reader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile to a temp file and os.rename() it into place.

    Multiple processes (e.g. Grain workers) can race through first-use
    build: the rename is atomic, so a reader never CDLLs a half-written
    .so, and an fcntl lock serializes concurrent compiles (last writer
    wins harmlessly — identical output)."""
    tmp = f"{_LIB}.build.{os.getpid()}"
    lock_path = f"{_LIB}.lock"
    try:
        import fcntl

        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                # another process may have finished while we waited
                if (os.path.exists(_LIB)
                        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
                    return True
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                os.rename(tmp, _LIB)
                return True
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
    except (OSError, subprocess.SubprocessError, ImportError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        have_lib = os.path.exists(_LIB)
        have_src = os.path.exists(_SRC)
        if not have_lib and not have_src:
            return None  # nothing to load or build → NumPy fallback
        # Rebuild only when the source exists and is newer; a prebuilt .so
        # without its source (installed package) is used as-is.
        if have_src and (
            not have_lib or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fr_read_resample.restype = ctypes.c_int
        lib.fr_read_resample.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.fr_num_rows.restype = ctypes.c_int64
        lib.fr_num_rows.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def read_resample(path: str, num_clips: int, feature_dim_hint: int = 8192
                  ) -> Optional[tuple]:
    """Read + resample a 2-D .npy in one native pass.

    Returns ((num_clips, F) float32, raw_row_count), or None if the native
    path can't handle the file (missing, >hint cols, f8, fortran order…).

    Set DRN_NATIVE_READER=0 to force the NumPy fallback (A/B benching —
    scripts/host_pipeline_probe.py; env vars reach Grain worker
    processes, which a monkeypatch would not)."""
    if os.environ.get("DRN_NATIVE_READER", "1").lower() in ("0", "off",
                                                            "false"):
        return None
    lib = load()
    if lib is None:
        return None
    out = np.empty((num_clips, feature_dim_hint), np.float32)
    cols = ctypes.c_int64(0)
    rows = ctypes.c_int64(0)
    rc = lib.fr_read_resample(
        path.encode(), num_clips,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(cols), ctypes.byref(rows), feature_dim_hint,
    )
    if rc != 0:
        return None
    f = cols.value
    # the C side writes out[i*F + c] contiguously (stride F, not the hint)
    flat = out.reshape(-1)[: num_clips * f]
    return flat.reshape(num_clips, f).copy(), rows.value


def num_rows(path: str) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    r = lib.fr_num_rows(path.encode())
    return None if r < 0 else int(r)
