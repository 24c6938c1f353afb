"""Host allocator tuning for page-fault-bound VMs.

The ingest pipeline (FASTA parse -> k-mer count -> union merge -> packed
matrix) cycles through multi-hundred-MB numpy buffers. glibc serves
allocations above M_MMAP_THRESHOLD (default 128 KB) with fresh mmap()s and
returns them to the kernel on free, so every stage pays first-touch page
faults for its working set. On the virtualized hosts this framework targets,
faulting a page costs ~40x a warm write (measured: 0.2 GB/s first-touch vs
8 GB/s reuse), which made the dsk2kover-role merge allocator-bound rather
than compute-bound.

``tune_host_allocator()`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so
large freed blocks stay in the heap arena and are reused warm. Memory cost:
the arena retains the high-water mark of freed space (fine on large-RAM
hosts; disable with GRM_NO_MALLOC_TUNE=1).
"""

from __future__ import annotations

import ctypes
import os
import sys

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_host_allocator(threshold_bytes: int = 1 << 30) -> bool:
    """Idempotently raise glibc's mmap/trim thresholds. Returns True if set."""
    global _done
    if _done:
        return True
    if os.environ.get("GRM_NO_MALLOC_TUNE") == "1":
        return False
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)
    except OSError:
        return False
    _done = bool(ok1) and bool(ok2)
    return _done
