"""ctypes binding for the native tar IO library (builds on demand with g++)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libtario.so")
_SRC = os.path.join(_HERE, "tario.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.tario_open.restype = ctypes.c_void_p
        lib.tario_open.argtypes = [ctypes.c_char_p]
        lib.tario_count.restype = ctypes.c_int64
        lib.tario_count.argtypes = [ctypes.c_void_p]
        lib.tario_name.restype = ctypes.c_char_p
        lib.tario_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_size.restype = ctypes.c_int64
        lib.tario_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_read.restype = ctypes.c_int64
        lib.tario_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_int64]
        lib.tario_close.restype = None
        lib.tario_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeTarReader:
    """Indexed random/sequential access to a tar shard via the C++ library."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tario unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.tario_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)

    def __len__(self) -> int:
        return int(self._lib.tario_count(self._h))

    def name(self, i: int) -> str:
        return self._lib.tario_name(self._h, i).decode()

    def read(self, i: int) -> bytes:
        n = int(self._lib.tario_size(self._h, i))
        buf = ctypes.create_string_buffer(n)
        got = self._lib.tario_read(self._h, i, buf, n)
        if got != n:
            raise IOError(f"short read on member {i}")
        return buf.raw

    def close(self):
        if self._h:
            self._lib.tario_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
