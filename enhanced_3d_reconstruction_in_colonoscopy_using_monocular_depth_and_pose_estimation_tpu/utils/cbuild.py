"""Tiny native-build helper: compile a C++ source to a cached .so and load
it with ctypes (pybind11 is not in this image; the C ABI keeps bindings
dependency-free)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading

_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


def _host_isa_tag() -> str:
    """Hash of the host ISA so a -march=native binary is never reused on
    a CPU it wasn't built for (shared filesystems / copied checkouts:
    loading a foreign-tuned .so would SIGILL at first call)."""
    flags = platform.machine()
    try:
        with open("/proc/cpuinfo", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags += line
                    break
    except OSError:
        pass
    return hashlib.sha256(flags.encode()).hexdigest()[:8]


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
                               f"_{base}_{digest}_{_host_isa_tag()}.so")
        if not os.path.exists(so_path):
            # Unique tmp per process: concurrent first-use builds (e.g.
            # parallel test workers on a fresh checkout) must not
            # interleave g++ output in one file; os.replace publishes
            # whichever finishes first, atomically.
            tmp = f"{so_path}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src_path, "-o", tmp, *extra_flags]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so_path)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
        lib = ctypes.CDLL(so_path)
        _CACHE[src_path] = lib
        return lib
