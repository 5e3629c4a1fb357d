"""Native IO extension: lazy-built C++ FASTQ reader (ctypes binding).

The reference's IO layer is C++ (gzstream + per-tool parsers,
src/cpptools). Here one shared library handles gzip streaming, FASTQ
parsing, barcode extraction, and 2-bit encoding in bulk; Python/numpy does
the (vectorized) grouping. Built on demand with g++ (pybind11 is not
vendored; the C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "fastq_reader.cpp")
_LIB_NAME = "libpangaea_io.so"
_lib = None
_build_failed = False


def _build_lib() -> Optional[str]:
    out = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if os.path.isfile(out) and os.path.getmtime(out) > os.path.getmtime(_SRC):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", out + ".tmp", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(out + ".tmp", out)
        return out
    except (subprocess.CalledProcessError, OSError) as e:
        detail = getattr(e, "stderr", str(e))
        log.warning("native IO build failed (%s); using Python fallback",
                    detail)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = _build_lib()
    if path is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.pgn_open.restype = ctypes.c_void_p
    lib.pgn_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.pgn_close.argtypes = [ctypes.c_void_p]
    lib.pgn_read.restype = ctypes.c_int
    lib.pgn_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    lib.pgn_sort_feed.restype = ctypes.c_longlong
    lib.pgn_sort_feed.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.pgn_sort_emit.restype = ctypes.c_longlong
    lib.pgn_sort_emit.argtypes = [ctypes.c_int, ctypes.c_char_p]
    lib.pgn_sort_radix.restype = ctypes.c_longlong
    lib.pgn_sort_radix.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_longlong]
    lib.pgn_read_lq.restype = ctypes.c_int
    lib.pgn_read_lq.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


class NativeFastqReader:
    """Bulk record reader: (codes, lengths, barcodes[, names][, lowq])
    arrays. With ``with_lowq`` the quality mask is RETURNED as a per-base
    0/1 plane instead of applied to the codes (the weighted masked
    sort-join needs both; kernels/features.py §quality-masked)."""

    def __init__(self, path: str, max_len: int = 256,
                 min_qual_char: Optional[str] = None,
                 barcode_width: int = 48, name_width: int = 0,
                 with_lowq: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native IO unavailable")
        self._lib = lib
        self.max_len = max_len
        self.bc_w = barcode_width
        self.nm_w = name_width
        self.with_lowq = with_lowq
        mq = ord(min_qual_char) if min_qual_char else 0
        self._h = lib.pgn_open(path.encode(), mq)
        if not self._h:
            raise FileNotFoundError(path)

    def read(self, n: int) -> Optional[Tuple[np.ndarray, ...]]:
        codes = np.empty((n, self.max_len), np.uint8)
        lengths = np.empty(n, np.int32)
        barcodes = np.empty((n, self.bc_w), dtype="S1")
        names = (np.empty((n, self.nm_w), dtype="S1") if self.nm_w
                 else None)
        names_ptr = names.ctypes.data if names is not None else None
        if self.with_lowq:
            lowq = np.empty((n, self.max_len), np.uint8)
            got = self._lib.pgn_read_lq(
                self._h, n, self.max_len,
                codes.ctypes.data, lengths.ctypes.data,
                barcodes.ctypes.data, self.bc_w, names_ptr, self.nm_w,
                lowq.ctypes.data)
        else:
            lowq = None
            got = self._lib.pgn_read(
                self._h, n, self.max_len,
                codes.ctypes.data, lengths.ctypes.data,
                barcodes.ctypes.data, self.bc_w, names_ptr, self.nm_w)
        if got == 0:
            return None
        out = (codes[:got], lengths[:got],
               barcodes[:got].view(f"S{self.bc_w}").ravel())
        if names is not None:
            out += (names[:got].view(f"S{self.nm_w}").ravel(),)
        if lowq is not None:
            out += (lowq[:got],)
        return out

    def close(self) -> None:
        if self._h:
            self._lib.pgn_close(self._h)
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
