"""ctypes binding for the C++ host data-plane hot path (io/native/packing.cpp).

The shared library is built on first use with the system toolchain and cached
next to the source. Every entry point has a numpy fallback so the framework works
without a compiler; ``HAVE_NATIVE`` reports which path is active."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native" / "packing.cpp"
_LIB = Path(__file__).parent / "native" / "libpacking.so"
_lock = threading.Lock()
_lib = None
HAVE_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, HAVE_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _lib = False
            return _lib
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        lib.pack_iq_i16.argtypes = [i16p, u32p, ctypes.c_int64]
        lib.unpack_iq_f32.argtypes = [u32p, f32p, ctypes.c_int64]
        lib.pack_iq_f32.argtypes = [f32p, u32p, ctypes.c_int64]
        lib.crc32_ieee.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]
        lib.crc32_ieee.restype = ctypes.c_uint32
        lib.unpack_cfar_words.argtypes = [u32p, ctypes.c_int64, ctypes.c_int,
                                          u32p, u32p, u8p]
        _lib = lib
        HAVE_NATIVE = True
        return _lib


def pack_iq_i16(iq: np.ndarray) -> np.ndarray:
    """Interleaved int16 [re, im, ...] (or complex-viewed int16 pairs) -> uint32
    beat words. Shape [..., n, 2] int16 or flat even-length int16."""
    iq = np.ascontiguousarray(iq, np.int16).reshape(-1)
    n = iq.size // 2
    out = np.empty(n, np.uint32)
    lib = _load()
    if lib:
        lib.pack_iq_i16(iq, out, n)
    else:
        pairs = iq.reshape(n, 2).astype(np.uint16)
        out[:] = (pairs[:, 0].astype(np.uint32) << 16) | pairs[:, 1]
    return out


def unpack_iq_c64(words: np.ndarray) -> np.ndarray:
    """uint32 beat words -> complex64 array (host-side fast path)."""
    words = np.ascontiguousarray(words, np.uint32).reshape(-1)
    out = np.empty(2 * words.size, np.float32)
    lib = _load()
    if lib:
        lib.unpack_iq_f32(words, out, words.size)
    else:
        out[0::2] = (words >> 16).astype(np.uint16).view(np.int16).astype(np.float32)
        out[1::2] = (words & 0xFFFF).astype(np.uint16).view(np.int16).astype(np.float32)
    return out.view(np.complex64)


def pack_iq_c64(iq: np.ndarray) -> np.ndarray:
    """complex64 -> uint32 beat words (round-half-up, saturating int16)."""
    flat = np.ascontiguousarray(iq, np.complex64).reshape(-1)
    out = np.empty(flat.size, np.uint32)
    lib = _load()
    if lib:
        lib.pack_iq_f32(flat.view(np.float32), out, flat.size)
    else:
        r = np.clip(np.floor(flat.real + 0.5), -32768, 32767).astype(np.int16)
        m = np.clip(np.floor(flat.imag + 0.5), -32768, 32767).astype(np.int16)
        out[:] = (r.astype(np.uint16).astype(np.uint32) << 16) | m.astype(np.uint16)
    return out


def crc32(data: np.ndarray | bytes, seed: int = 0) -> int:
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    lib = _load()
    if lib:
        return int(lib.crc32_ieee(buf, buf.size, seed))
    import zlib

    return zlib.crc32(buf.tobytes(), seed) & 0xFFFFFFFF


def unpack_cfar_words(words: np.ndarray, bin_width: int):
    """CFAR output words -> (threshold, bins, peaks) via the native decoder."""
    words = np.ascontiguousarray(words, np.uint32).reshape(-1)
    n = words.size
    thr = np.empty(n, np.uint32)
    bins = np.empty(n, np.uint32)
    pk = np.empty(n, np.uint8)
    lib = _load()
    if lib:
        lib.unpack_cfar_words(words, n, bin_width, thr, bins, pk)
    else:
        pk[:] = words & 1
        bins[:] = (words >> 1) & ((1 << bin_width) - 1)
        thr[:] = words >> (bin_width + 1)
    return thr, bins, pk
