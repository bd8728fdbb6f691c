"""Shared auto-build + ctypes loader for the native (C++) cores.

The three native modules (``native_decode``, ``native_resize``,
``records``) each ship a single-file C++ core under ``native/`` that is
compiled on first use (no pybind11 in this environment — plain ctypes).
This helper is the one copy of that machinery: g++ invocation with a
portable retry, mtime-based rebuild when the source changes, a
failure latch so a missing toolchain is probed once per process, and a
corrupt-``.so`` guard (a partially written library from an interrupted
build triggers ONE rebuild instead of raising ``OSError`` out of
``native_available()``).

Every loader falls back loudly to its pure-Python path when ``load()``
returns None — native code is an optimization, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Sequence

__all__ = ["NativeLib", "NATIVE_DIR", "BUILD_DIR"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")


class NativeLib:
    """One auto-built ctypes library.

    Args:
      src: C++ source filename under ``native/``.
      lib: output shared-object filename under ``native/build/``.
      declare: callback receiving the loaded ``ctypes.CDLL`` to set
        restype/argtypes for every exported symbol.
      extra_flags: appended to the g++ command line (e.g. ``-ljpeg``).
      try_march_native: attempt ``-march=native`` first, retrying
        portably on failure (worth it for pure-compute kernels).
    """

    def __init__(self, src: str, lib: str,
                 declare: Callable[[ctypes.CDLL], None],
                 extra_flags: Sequence[str] = (),
                 try_march_native: bool = False):
        self.src = os.path.join(NATIVE_DIR, src)
        self.path = os.path.join(BUILD_DIR, lib)
        self._declare = declare
        self._extra = list(extra_flags)
        self._march = try_march_native
        self._lock = threading.Lock()
        self._lib: ctypes.CDLL | None = None
        self._failed = False

    def _gxx(self, flags: list[str]) -> bool:
        cmd = ["g++", "-O3", *flags, "-fPIC", "-shared", "-o", self.path,
               self.src, *self._extra]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return False

    def _build(self) -> bool:
        os.makedirs(BUILD_DIR, exist_ok=True)
        if self._march and self._gxx(["-march=native"]):
            return True
        return self._gxx([])

    def load(self) -> ctypes.CDLL | None:
        """The declared CDLL, building/rebuilding as needed; None on any
        failure (latched — no repeated probes)."""
        with self._lock:
            if self._lib is not None or self._failed:
                return self._lib
            stale = not os.path.exists(self.path) or (
                os.path.exists(self.src)
                and os.path.getmtime(self.src) > os.path.getmtime(self.path)
            )
            if stale and not self._build():
                self._failed = True
                return None
            lib = self._cdll()
            if lib is None and self._build():
                lib = self._cdll()
            if lib is None:
                self._failed = True
                return None
            self._declare(lib)
            self._lib = lib
            return lib

    def _cdll(self) -> ctypes.CDLL | None:
        try:
            return ctypes.CDLL(self.path)
        except OSError:  # corrupt/partial .so from an interrupted build
            return None
