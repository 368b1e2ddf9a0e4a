"""Native runtime components (C, ctypes-loaded).

Compiled on first use with the system compiler into a per-version cache;
every entry point has a numpy fallback so the framework works without a
toolchain. This is the TPU framework's analog of the reference's JNI
kernels (jni/, SURVEY.md §2.4) — host-side hot loops in C, device compute
in XLA/Pallas.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "fastq_codec.c")
    with open(src, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.path.join(
        tempfile.gettempdir(), f"bbtools_tpu_native_{digest}.so"
    )
    if os.path.exists(cache):
        return cache
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", "-o", cache + ".tmp", src],
            check=True,
            capture_output=True,
        )
        os.replace(cache + ".tmp", cache)
        return cache
    except Exception as e:  # no compiler / failed build -> fallback
        print(f"bbtools_tpu: native build unavailable ({e})", file=sys.stderr)
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            lib.scan_newlines.restype = ctypes.c_long
            lib.fill_records.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def fill_records_native(buf: np.ndarray, line_starts: np.ndarray,
                        line_ends: np.ndarray, pad: int, qual_offset: int):
    """Native record gather; returns (bases, quals, ascii, lengths) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nrec = len(line_starts) // 4
    bases = np.empty((nrec, pad), dtype=np.uint8)
    quals = np.empty((nrec, pad), dtype=np.uint8)
    ascii_b = np.empty((nrec, pad), dtype=np.uint8)
    lengths = np.empty(nrec, dtype=np.int32)
    ls = np.ascontiguousarray(line_starts, dtype=np.int64)
    le = np.ascontiguousarray(line_ends, dtype=np.int64)
    bufc = np.ascontiguousarray(buf)
    lib.fill_records(
        _ptr(bufc), _ptr(ls), _ptr(le),
        ctypes.c_long(nrec), ctypes.c_long(pad), ctypes.c_int(qual_offset),
        _ptr(bases), _ptr(quals), _ptr(ascii_b), _ptr(lengths),
    )
    return bases, quals, ascii_b, lengths


def pack_2bit_native(bases: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    n, pad = bases.shape
    pb = -(-pad // 4)
    nb = -(-pad // 8)
    packed = np.empty((n, pb), dtype=np.uint8)
    nmask = np.empty((n, nb), dtype=np.uint8)
    b = np.ascontiguousarray(bases)
    lib.pack_2bit(_ptr(b), ctypes.c_long(n), ctypes.c_long(pad), _ptr(packed), _ptr(nmask))
    return packed, nmask
