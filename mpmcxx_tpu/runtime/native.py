"""ctypes bindings for the native runtime (mpmcio.cpp).

Builds the shared library on first use (g++ is baked into the image) and
caches it next to the source.  Every entry point has a pure-Python fallback
so the framework still runs where no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mpmcio.cpp")
_LIB = os.path.join(_HERE, "libmpmcio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pqr_format.restype = ctypes.c_longlong
        lib.pqr_parse.restype = ctypes.c_longlong
        lib.async_write.restype = None
        lib.async_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_longlong, ctypes.c_int]
        lib.async_drain.restype = None
        lib.async_errors.restype = ctypes.c_longlong
        _lib = lib
        return _lib


def _pack_str8(strings) -> np.ndarray:
    out = np.zeros((len(strings), 8), dtype=np.uint8)
    for i, s in enumerate(strings):
        b = s.encode()[:7]
        out[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


def pqr_format_native(data: dict, ext_output: bool) -> str | None:
    """Bulk-serialise ATOM lines via the native codec; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data["atomtype"])
    at = _pack_str8(data["atomtype"])
    mt = _pack_str8(data["moleculetype"])
    fl = np.frombuffer("".join(data["flag"]).encode(), dtype=np.uint8)
    mid = np.asarray(data["molecule_id"], dtype=np.int32)
    pos = np.ascontiguousarray(data["pos"], dtype=np.float64)
    params = np.stack([np.asarray(data[k], dtype=np.float64)
                       for k in ("mass", "charge_e", "polarizability",
                                 "epsilon", "sigma", "omega", "gwp_alpha",
                                 "c6", "c8", "c10", "c9")], axis=1)
    params = np.ascontiguousarray(params)
    cap = 512 * max(n, 1)
    buf = ctypes.create_string_buffer(cap)
    w = lib.pqr_format(
        ctypes.c_int(n),
        at.ctypes.data_as(ctypes.c_char_p),
        mt.ctypes.data_as(ctypes.c_char_p),
        fl.ctypes.data_as(ctypes.c_char_p),
        mid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(1 if ext_output else 0),
        buf, ctypes.c_longlong(cap))
    if w < 0:
        return None
    return buf.raw[:w].decode()


def pqr_parse_native(text: str, max_atoms: int = 1 << 20):
    """Bulk-parse ATOM records; returns dict of arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    at = np.zeros((max_atoms, 8), dtype=np.uint8)
    mt = np.zeros((max_atoms, 8), dtype=np.uint8)
    fl = np.zeros(max_atoms, dtype=np.uint8)
    mid = np.zeros(max_atoms, dtype=np.int32)
    pos = np.zeros((max_atoms, 3), dtype=np.float64)
    params = np.zeros((max_atoms, 11), dtype=np.float64)
    n = lib.pqr_parse(
        ctypes.c_char_p(raw), ctypes.c_longlong(len(raw)),
        ctypes.c_int(max_atoms),
        at.ctypes.data_as(ctypes.c_char_p),
        mt.ctypes.data_as(ctypes.c_char_p),
        fl.ctypes.data_as(ctypes.c_char_p),
        mid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if n < 0:
        raise ValueError(f"malformed PQR line {-int(n)}")
    n = int(n)

    def unpack(arr):
        return [bytes(arr[i]).rstrip(b"\0").decode() for i in range(n)]

    return {
        "atomtype": unpack(at), "moleculetype": unpack(mt),
        "flag": [chr(c) for c in fl[:n]],
        "molecule_id": mid[:n], "pos": pos[:n], "params": params[:n],
    }


def async_write(path: str, text: str, rotate_last: bool) -> bool:
    """Queue a file write on the native writer thread; False -> caller
    should write synchronously."""
    lib = get_lib()
    if lib is None:
        return False
    raw = text.encode()
    lib.async_write(path.encode(), raw, len(raw),
                    1 if rotate_last else 0)
    return True


def async_drain() -> None:
    lib = get_lib()
    if lib is not None:
        lib.async_drain()


def async_errors() -> int:
    lib = get_lib()
    return int(lib.async_errors()) if lib is not None else 0
