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
        _register(lib)
    except AttributeError:
        # Stale libgrmio.so from an older source tree: rebuild once.
        if not build(force=True):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _register(lib)
        except (OSError, AttributeError):
            return None
    except OSError:
        return None

    _lib = lib
    return lib


def _register(lib):
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

    lib.grm_merge_union_cols64.restype = ctypes.c_long
    lib.grm_merge_union_cols64.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),  # list addrs
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),   # sizes
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
    ]

    lib.grm_set_presence_bits32.restype = None
    lib.grm_set_presence_bits32.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_int,
    ]

    lib.grm_merge_union_bits64.restype = ctypes.c_long
    lib.grm_merge_union_bits64.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),  # list addrs
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),   # sizes
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long,
    ]

    lib.grm_merge_union_bits_rows.restype = ctypes.c_long
    lib.grm_merge_union_bits_rows.argtypes = lib.grm_merge_union_bits64.argtypes

    lib.grm_compact_rows.restype = None
    lib.grm_compact_rows.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
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


def merge_union_cols_native(kmer_lists, nw):
    """Fused dsk2kover merge for nw <= 2 (k <= 32): ONE loser-tree pass
    emits the sorted distinct union, per-union genome counts, and every
    genome's union column indices — no per-genome binary-search pass, no
    input concatenation (streams are passed by pointer), and outputs are
    returned as views (first-touch page faults on this class of VM cost
    more than the merge itself, so fresh pages are kept to a minimum).

    Returns (union (U, nw) uint32, genome_counts (U,) int32,
             per-genome int32 column arrays (views into one buffer)).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    if nw not in (1, 2):
        raise ValueError("merge_union_cols_native requires nw in {1, 2}")
    arrays = [np.ascontiguousarray(np.asarray(a, np.uint32).reshape(-1, nw))
              for a in kmer_lists]
    sizes = np.array([a.shape[0] for a in arrays], dtype=np.int64)
    total = int(sizes.sum())
    if total >= 2 ** 31:
        raise ValueError("merge_union_cols_native: total k-mers >= 2^31; "
                         "use merge_union_native")
    addrs = np.array([a.ctypes.data for a in arrays], dtype=np.uint64)
    offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    cap = max(total, 1)
    out_union = np.empty((cap, nw), dtype=np.uint32)
    out_counts = np.empty(cap, dtype=np.int32)
    out_cols = np.empty(cap, dtype=np.int32)
    n = lib.grm_merge_union_cols64(
        addrs, sizes, len(arrays), nw, out_union, out_counts, out_cols, cap
    )
    if n == -1:
        raise RuntimeError("grm_merge_union_cols64 capacity exceeded")
    if n < 0:
        raise RuntimeError("grm_merge_union_cols64 failed (code %d)" % n)
    union = out_union[:n]
    counts = out_counts[:n]
    col_arrays = [out_cols[offsets[i]: offsets[i + 1]]
                  for i in range(len(arrays))]
    return union, counts, col_arrays


def merge_union_bits_native(kmer_lists, nw):
    """Fully fused dsk2kover role for nw in [1, 8]: ONE loser-tree pass emits the
    sorted distinct union, per-union genome counts, AND the packed uint64
    presence matrix — no per-element column buffer, no separate bit-set
    pass. Outputs are views over cap-sized buffers whose untouched virtual
    pages cost nothing (first-touch faults dominate on these VMs).

    Returns (union (U, nw) uint32, genome_counts (U,) int32,
             matrix (ceil(G/64), U) uint64).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    if not 1 <= nw <= 8:
        raise ValueError("merge_union_bits_native requires nw in [1, 8]")
    arrays = [np.ascontiguousarray(np.asarray(a, np.uint32).reshape(-1, nw))
              for a in kmer_lists]
    sizes = np.array([a.shape[0] for a in arrays], dtype=np.int64)
    total = int(sizes.sum())
    if total >= 2 ** 31:
        raise ValueError("merge_union_bits_native: total k-mers >= 2^31; "
                         "use merge_union_native")
    addrs = np.array([a.ctypes.data for a in arrays], dtype=np.uint64)
    n_genomes = len(arrays)
    n_words64 = -(-n_genomes // 64)
    cap = max(total, 1)
    out_union = np.empty((cap, nw), dtype=np.uint32)
    out_counts = np.empty(cap, dtype=np.int32)
    matrix_buf = np.empty(n_words64 * cap, dtype=np.uint64)
    kernel = (lib.grm_merge_union_bits64 if nw <= 2
              else lib.grm_merge_union_bits_rows)
    n = kernel(
        addrs, sizes, n_genomes, nw, out_union, out_counts,
        matrix_buf, cap, cap,
    )
    if n == -1:
        raise RuntimeError("fused union merge capacity exceeded")
    if n < 0:
        raise RuntimeError(
            "%s failed (code %d)"
            % ("grm_merge_union_bits64" if nw <= 2
               else "grm_merge_union_bits_rows", n)
        )
    lib.grm_compact_rows(matrix_buf, n_words64, n, cap, n)
    matrix = matrix_buf[: n_words64 * n].reshape(n_words64, n)
    return out_union[:n], out_counts[:n], matrix


def merge_union_bits_parallel(kmer_lists, nw, n_threads=None,
                              min_total=1 << 22):
    """Partition-parallel fused dsk2kover merge (nw in [1, 8], k up to 128).

    The fused loser-tree merge (:func:`merge_union_bits_native`) is a single
    sequential stream. Here the canonical key space is split into balanced
    ranges on the leading uint32 word (every per-genome list is sorted, so a
    range is a contiguous slice found by binary search), and each range is
    merged independently by the SAME native kernel — ctypes releases the GIL,
    so ranges run on separate cores. Output is bit-identical to the serial
    merge: ranges are disjoint and ordered, so the final union/counts/matrix
    are the concatenations of the per-range outputs.

    This is the host-side analogue of the framework's k-mer-column sharding:
    the same hash/sort-partitioned key space that `parallel/build.py` spreads
    over devices is spread over host cores here (the reference's multidsk
    `-nb-cores` role, kmer_count.py:34).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    if not 1 <= nw <= 8:
        raise ValueError("merge_union_bits_parallel requires nw in [1, 8]")
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    arrays = [np.ascontiguousarray(np.asarray(a, np.uint32).reshape(-1, nw))
              for a in kmer_lists]
    sizes = np.array([a.shape[0] for a in arrays], dtype=np.int64)
    total = int(sizes.sum())
    if n_threads <= 1 or total < min_total or len(arrays) < 2:
        return merge_union_bits_native(arrays, nw)
    if total >= 2 ** 31:
        raise ValueError("merge_union_bits_parallel: total k-mers >= 2^31")

    n_genomes = len(arrays)
    n_words64 = -(-n_genomes // 64)

    # Balanced range boundaries on the leading word, from a global sample.
    n_parts = min(4 * n_threads, max(total // (1 << 20), n_threads), 256)
    n_parts = max(n_parts, 2)
    samples = []
    for a in arrays:
        if a.shape[0]:
            step = max(a.shape[0] // 512, 1)
            samples.append(np.ascontiguousarray(a[::step, 0]))
    sample = np.sort(np.concatenate(samples))
    q = (np.arange(1, n_parts) * len(sample)) // n_parts
    boundaries = np.unique(sample[q])  # ascending interior boundaries
    n_parts = len(boundaries) + 1

    # Per-array range starts: rows with word0 < b come first (word0 is the
    # primary sort key), so searchsorted on the word0 column slices exactly.
    starts = np.zeros((len(arrays), n_parts + 1), dtype=np.int64)
    for i, a in enumerate(arrays):
        if a.shape[0]:
            w0 = np.ascontiguousarray(a[:, 0])
            starts[i, 1:-1] = np.searchsorted(w0, boundaries, side="left")
            starts[i, -1] = a.shape[0]

    part_out = [None] * n_parts

    def run_part(p):
        sub_sizes = starts[:, p + 1] - starts[:, p]
        cap = max(int(sub_sizes.sum()), 1)
        addrs = np.array(
            [a.ctypes.data + int(starts[i, p]) * nw * 4
             for i, a in enumerate(arrays)],
            dtype=np.uint64,
        )
        out_union = np.empty((cap, nw), dtype=np.uint32)
        out_counts = np.empty(cap, dtype=np.int32)
        matrix_buf = np.empty(n_words64 * cap, dtype=np.uint64)
        kernel = (lib.grm_merge_union_bits64 if nw <= 2
                  else lib.grm_merge_union_bits_rows)
        n = kernel(
            addrs, np.ascontiguousarray(sub_sizes), n_genomes, nw,
            out_union, out_counts, matrix_buf, cap, cap,
        )
        if n < 0:
            raise RuntimeError(
                "%s failed (code %d)"
                % ("grm_merge_union_bits64" if nw <= 2
                   else "grm_merge_union_bits_rows", n)
            )
        part_out[p] = (n, out_union, out_counts, matrix_buf, cap)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(run_part, range(n_parts)))

    ns = [po[0] for po in part_out]
    n_union = int(sum(ns))
    union = np.empty((n_union, nw), dtype=np.uint32)
    counts = np.empty(n_union, dtype=np.int32)
    matrix = np.empty((n_words64, n_union), dtype=np.uint64)
    offs = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(ns, out=offs[1:])

    def copy_part(p):
        n, out_union, out_counts, matrix_buf, cap = part_out[p]
        lo, hi = offs[p], offs[p + 1]
        union[lo:hi] = out_union[:n]
        counts[lo:hi] = out_counts[:n]
        for w in range(n_words64):
            matrix[w, lo:hi] = matrix_buf[w * cap : w * cap + n]

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(copy_part, range(n_parts)))
    return union, counts, matrix


def set_presence_bits_native(matrix, col_arrays):
    """OR genome presence bits into the packed uint64 matrix in place.

    matrix: (ceil(G/64), K) uint64; genome g = bit 63-(g%64) of row g//64.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libgrmio unavailable")
    for g_idx, cols in enumerate(col_arrays):
        if cols.dtype == np.int32:
            cols = np.ascontiguousarray(cols)
            lib.grm_set_presence_bits32(
                matrix[g_idx // 64], cols, cols.shape[0], g_idx % 64
            )
        else:
            cols = np.ascontiguousarray(cols, dtype=np.int64)
            lib.grm_set_presence_bits(
                matrix[g_idx // 64], cols, cols.shape[0], g_idx % 64
            )
