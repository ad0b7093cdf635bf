"""Native (C++) ingest bindings — ctypes loader with auto-build and a
pure-Python fallback (SURVEY.md §3.2: the reference's throughput-
critical ingest lives in native code; so does ours).

The shared object is built on first use with g++ -O3 into
~/.cache/shannon_tpu/ (or SHANNON_TPU_NATIVE_DIR) and memoized; every
entry point degrades gracefully to the Python parser when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "ingest.cpp"
_LIB_NAME = "shannon_tpu_ingest.so"
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build_dir() -> Path:
    d = os.environ.get("SHANNON_TPU_NATIVE_DIR")
    return Path(d) if d else Path.home() / ".cache" / "shannon_tpu"


def load() -> ctypes.CDLL | None:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        out = _build_dir()
        out.mkdir(parents=True, exist_ok=True)
        so = out / _LIB_NAME
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(_SRC), "-o", str(so)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(so))
        lib.sti_count_records.restype = ctypes.c_long
        lib.sti_count_records.argtypes = [ctypes.c_char_p]
        lib.sti_parse_pack.restype = ctypes.c_long
        lib.sti_parse_pack.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def pack_file(path: str | os.PathLike, pad_length: int = 128):
    """Parse + encode a FASTA/FASTQ file into a ReadBatch.  Uses the
    native parser when possible (plain files); gzip or loader failure
    falls back to the Python path transparently."""
    from shannon_tpu.io.fastx import read_fastx
    from shannon_tpu.io.pack import ReadBatch, pack_reads

    path = Path(path)
    lib = None if path.suffix == ".gz" else load()
    if lib is None:
        return pack_reads((s for _, s in read_fastx(path)), pad_length)
    n = lib.sti_count_records(str(path).encode())
    if n < 0:
        # malformed for the native fast path; Python parser raises the
        # descriptive error (or handles the corner case)
        return pack_reads((s for _, s in read_fastx(path)), pad_length)
    codes = np.empty((n, pad_length), dtype=np.uint8)
    lengths = np.empty(n, dtype=np.int32)
    got = lib.sti_parse_pack(
        str(path).encode(),
        pad_length,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
    )
    if got != n:
        return pack_reads((s for _, s in read_fastx(path)), pad_length)
    return ReadBatch(codes=codes, lengths=lengths, paired=False)
