"""Native (C++) runtime components, built on demand with g++.

The compiled objects are cached next to the sources; absence of a
toolchain degrades gracefully to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def load_library(name: str, sources: list[str], libs: list[str] = [],
                 ) -> ctypes.CDLL | None:
    """Compile (if needed) and load lib<name>.so from native/ sources."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = os.path.join(_DIR, f"lib{name}.so")
        srcs = [os.path.join(_DIR, s) for s in sources]
        try:
            if (not os.path.exists(so) or
                    any(os.path.getmtime(s) > os.path.getmtime(so)
                        for s in srcs)):
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", "-o", so, *srcs,
                       *[f"-l{l}" for l in libs]]
                subprocess.run(cmd, check=True, capture_output=True)
            _LIBS[name] = ctypes.CDLL(so)
        except Exception:
            _LIBS[name] = None
        return _LIBS[name]
