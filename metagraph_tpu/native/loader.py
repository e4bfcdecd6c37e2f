"""On-demand build + ctypes bindings for the native codecs.

The reference links kseq/zlib C code into its binary; here the C codec is
compiled once with the system toolchain into a cached shared object and
bound with ctypes (no pip dependencies). Everything degrades gracefully
to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fasta_codec.c")
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:16]
        cache = os.environ.get(
            "METAGRAPH_TPU_NATIVE_CACHE",
            os.path.expanduser("~/.cache/metagraph_tpu_native"))
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"fasta_codec_{tag}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", so, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.fasta_encode.restype = ctypes.c_long
        lib.fasta_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
            ctypes.c_ubyte,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.pack2_codes.restype = ctypes.c_long
        lib.pack2_codes.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _build() is not None


def fasta_encode_native(data: bytes, table: np.ndarray, sep_code: int = 255
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(codes with separators, record start offsets) or None if the
    native codec is unavailable."""
    lib = _build()
    if lib is None:
        return None
    n = len(data)
    out = np.empty(n + 1, np.uint8)
    max_recs = max(16, data.count(b"\n") // 2 + 2)
    offsets = np.empty(max_recs, np.int64)
    n_recs = ctypes.c_long(0)
    written = lib.fasta_encode(data, n, table.tobytes(), sep_code, out,
                               len(out), offsets, max_recs,
                               ctypes.byref(n_recs))
    if written < 0:
        return None
    return out[:written], offsets[:n_recs.value].copy()


def pack2_codes_native(codes: np.ndarray, max_inval: int
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """2-bit block pack of a code array (len divisible by 16) with a
    sparse invalid-position sidecar. Returns (words uint32, inval_idx
    int64) or None when the codec is unavailable or invalids overflow
    ``max_inval`` (callers fall back to the 4-bit pack)."""
    lib = _build()
    if lib is None:
        return None
    n = codes.shape[0]
    assert n % 16 == 0
    words = np.empty(n // 16, np.uint32)
    inval = np.empty(max(max_inval, 1), np.int64)
    ninv = lib.pack2_codes(np.ascontiguousarray(codes), n, words, inval,
                           max_inval)
    if ninv < 0:
        return None
    return words, inval[:ninv].copy()
