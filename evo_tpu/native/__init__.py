"""Native (C++) runtime components, loaded via ctypes.

The shared library is compiled lazily from `event_parser.cpp` on first use
(g++ -O3 -march=native); falls back to pure-numpy implementations when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

_log = logging.getLogger(__name__)
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "libevo_native.so")
_SRC = os.path.join(_DIR, "event_parser.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _SO_PATH,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler
        _log.warning("native build unavailable: %s", e)
        return False
    if res.returncode != 0:
        _log.warning("native build failed:\n%s", res.stderr)
        return False
    return True


def load():
    """Return the ctypes library handle, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _log.warning("failed to load native lib: %s", e)
            return None
        lib.evo_count_events.restype = ctypes.c_int64
        lib.evo_count_events.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.evo_parse_events.restype = ctypes.c_int64
        lib.evo_parse_events.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
