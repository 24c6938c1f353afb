"""ctypes bindings for libgrmio with transparent build + Python fallback.

``available()`` reports whether the native library is loadable (building it
on first use if a compiler is present). All call sites in
:mod:`grm_tpu.kmer` fall back to the numpy/XLA implementations when the
library is unavailable, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgrmio.so")
_lib = None
_build_attempted = False


def build(force=False):
    """Compile libgrmio.so with make; returns True on success."""
    global _build_attempted
    _build_attempted = True
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _HERE] + (["clean", "all"] if force else ["all"]),
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if _build_attempted or not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.grm_encode_fasta.restype = ctypes.c_long
    lib.grm_encode_fasta.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
    ]
    lib.grm_encode_fastq.restype = ctypes.c_long
    lib.grm_encode_fastq.argtypes = lib.grm_encode_fasta.argtypes

    lib.grm_count_kmers.restype = ctypes.c_long
    lib.grm_count_kmers.argtypes = [
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        ctypes.c_void_p,  # counts or NULL
        ctypes.c_long,
    ]

    lib.grm_merge_union.restype = ctypes.c_long
    lib.grm_merge_union.argtypes = [
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
    ]

    lib.grm_union_columns.restype = None
    lib.grm_union_columns.argtypes = [
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]

    lib.grm_set_presence_bits.restype = None
    lib.grm_set_presence_bits.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_int,
    ]

    _lib = lib
    return lib


def available():
    return _load() is not None


def encode_fasta_native(text, fastq=False):
    """FASTA/FASTQ text (str or bytes) -> int8 codes with separators."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    if isinstance(text, str):
        text = text.encode("ascii")
    out = np.empty(len(text), dtype=np.int8)
    fn = lib.grm_encode_fastq if fastq else lib.grm_encode_fasta
    n = fn(text, len(text), out)
    return out[:n].copy()


def count_kmers_native(codes, k, return_counts=False):
    """Sorted distinct canonical k-mers (+counts) from codes; DSK role."""
    from ..ops.kmer import n_words_for_k

    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    nw = n_words_for_k(k)
    cap = max(int(codes.shape[0]), 1)
    out = np.empty((cap, nw), dtype=np.uint32)
    counts = np.empty(cap, dtype=np.int64) if return_counts else None
    n = lib.grm_count_kmers(
        codes, codes.shape[0], k, out,
        counts.ctypes.data if counts is not None else None, cap,
    )
    if n < 0:
        raise RuntimeError("grm_count_kmers failed (code %d)" % n)
    if return_counts:
        return out[:n].copy(), counts[:n].copy()
    return out[:n].copy()


def merge_union_native(kmer_lists, nw):
    """Sorted distinct union + per-k-mer genome counts; dsk2kover role.

    kmer_lists: list of (n_i, nw) uint32 sorted arrays.
    Returns (union (U, nw) uint32, genome_counts (U,) int64,
             per-genome column index arrays).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    sizes = [int(a.shape[0]) for a in kmer_lists]
    total = sum(sizes)
    concat = np.ascontiguousarray(
        np.concatenate([np.asarray(a, np.uint32).reshape(-1, nw) for a in kmer_lists]
                       + [np.zeros((0, nw), np.uint32)])
    )
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    cap = max(total, 1)
    out_union = np.empty((cap, nw), dtype=np.uint32)
    out_counts = np.empty(cap, dtype=np.int64)
    n = lib.grm_merge_union(
        concat, offsets, len(sizes), nw, out_union, out_counts, cap
    )
    if n < 0:
        raise RuntimeError("grm_merge_union capacity exceeded")
    union = out_union[:n].copy()
    counts = out_counts[:n].copy()

    col_arrays = []
    for a in kmer_lists:
        a = np.ascontiguousarray(np.asarray(a, np.uint32).reshape(-1, nw))
        cols = np.empty(a.shape[0], dtype=np.int64)
        lib.grm_union_columns(union, n, a, a.shape[0], nw, cols)
        col_arrays.append(cols)
    return union, counts, col_arrays
