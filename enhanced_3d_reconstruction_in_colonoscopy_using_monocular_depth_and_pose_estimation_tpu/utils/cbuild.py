"""Tiny native-build helper: compile a C++ source to a cached .so and load
it with ctypes (pybind11 is not in this image; the C ABI keeps bindings
dependency-free)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


def build_and_load(src_path: str, extra_flags: tuple[str, ...] = ()
                   ) -> ctypes.CDLL:
    src_path = os.path.abspath(src_path)
    with _LOCK:
        if src_path in _CACHE:
            return _CACHE[src_path]
        with open(src_path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        base = os.path.splitext(os.path.basename(src_path))[0]
        so_path = os.path.join(os.path.dirname(src_path),
                               f"_{base}_{digest}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src_path, "-o", so_path + ".tmp",
                   *extra_flags]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
        _CACHE[src_path] = lib
        return lib
