"""Per-genome canonical k-mer counting — the DSK / multidsk equivalent.

The reference shells out to the GATB-based C++ ``dsk``/``multidsk`` binaries
(``bin/kover/core/kover/dataset/tools/kmer_count.py:23-53``,
``src/app.py:1356-1416``) to produce per-genome k-mer count sets. Here the
counting runs on-device via :mod:`grm_tpu.ops.kmer`; the host streams FASTA /
FASTQ files, 2-bit-encodes them and collects sorted distinct canonical k-mers
(contigs mode) or k-mer counts with a min-abundance filter (reads mode,
matching multidsk's ``-abundance-min`` flag semantics).
"""

from __future__ import annotations

import gzip as _gzip
import os
from dataclasses import dataclass

import numpy as np

from ..ops.kmer import encode_contigs, sorted_kmers_np
from ..utils import fasta_to_sequences

__all__ = ["GenomeKmers", "count_fasta", "count_fasta_many",
           "count_reads_dir", "count_reads_many", "fastq_to_sequences"]

READS_EXTENSIONS = (".fastq", ".fastq.gz", ".fq", ".fq.gz")
FASTA_EXTENSIONS = (".fna", ".fa", ".fasta", ".fna.gz", ".fa.gz", ".fasta.gz")


@dataclass
class GenomeKmers:
    """Sorted distinct canonical k-mers of one genome.

    ``kmers``: (n, n_words) uint32, big-endian word order, sorted ascending.
    ``counts``: occurrence counts (only retained for reads mode).
    """

    genome_id: str
    k: int
    kmers: np.ndarray
    counts: np.ndarray | None = None

    @property
    def n_kmers(self):
        return self.kmers.shape[0]


def _resolve_engine(engine):
    """'auto' -> 'native' when libgrmio is built, else 'device' (XLA).

    Counting output feeds the host-side union merge, so host-native counting
    avoids a device->host transfer of every genome's k-mer set — on tunneled
    or DCN-attached accelerators that transfer dominates. The device engine
    remains available explicitly (and is the fallback without a toolchain).
    """
    if engine != "auto":
        return engine
    from ..native import bindings as nb

    return "native" if nb.available() else "device"


def _count_codes(codes, k, keep_counts, engine):
    engine = _resolve_engine(engine)
    if engine == "native":
        from ..native.bindings import count_kmers_native

        return count_kmers_native(codes, k, return_counts=keep_counts)
    return sorted_kmers_np(codes, k, return_counts=keep_counts)


def count_fasta_many(paths_by_genome_id, k, engine="auto", n_workers=None,
                     progress_callback=None):
    """Count many genomes concurrently (multidsk's -nb-cores role).

    The native counter releases the GIL, so a thread pool scales across
    cores. Returns GenomeKmers in the input order.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    # Accept a mapping (gid -> path) or a sequence of (gid, path) pairs.
    if hasattr(paths_by_genome_id, "items"):
        items = list(paths_by_genome_id.items())
    else:
        items = list(paths_by_genome_id)
    if n_workers is None:
        n_workers = min(len(items), _os.cpu_count() or 1)
    if progress_callback is None:
        progress_callback = lambda t, p: None

    results = [None] * len(items)
    engine = _resolve_engine(engine)
    if engine != "native" or n_workers <= 1:
        for i, (gid, path) in enumerate(items):
            progress_callback("K-mer counting", float(i) / max(len(items), 1))
            results[i] = count_fasta(path, k, genome_id=gid, engine=engine)
    else:
        done = [0]

        def work(i, gid, path):
            out = count_fasta(path, k, genome_id=gid, engine="native")
            done[0] += 1
            progress_callback("K-mer counting", done[0] / len(items))
            return i, out

        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            for i, out in pool.map(lambda a: work(*a),
                                   [(i, g, p) for i, (g, p) in enumerate(items)]):
                results[i] = out
    progress_callback("K-mer counting", 1.0)
    return results


def count_reads_many(dirs_by_genome_id, k, abundance_min=1, n_workers=None,
                     progress_callback=None):
    """Count many genomes' read directories concurrently (reads-mode
    multidsk -nb-cores role); same pool semantics as count_fasta_many.

    ``dirs_by_genome_id``: mapping or sequence of (genome_id, fastq_dir).
    Returns GenomeKmers in the input order.
    """
    from concurrent.futures import ThreadPoolExecutor
    from itertools import count as _count

    if hasattr(dirs_by_genome_id, "items"):
        items = list(dirs_by_genome_id.items())
    else:
        items = list(dirs_by_genome_id)
    if n_workers is None:
        n_workers = min(len(items), os.cpu_count() or 1)
    if progress_callback is None:
        progress_callback = lambda t, p: None
    done = _count(1)

    def work(args):
        gid, rdir = args
        out = count_reads_dir(rdir, k, abundance_min=abundance_min,
                              genome_id=str(gid))
        progress_callback("K-mer counting", next(done) / max(len(items), 1))
        return out

    if n_workers > 1 and len(items) > 1:
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            results = list(pool.map(work, items))
    else:
        results = [work(it) for it in items]
    progress_callback("K-mer counting", 1.0)
    return results


def count_fasta(path, k, genome_id=None, keep_counts=False, engine="auto"):
    """Count canonical k-mers of a FASTA genome (contigs mode).

    Equivalent to ``dsk -file <genome> -kmer-size K`` on an assembly
    (src/app.py:1372): every distinct canonical k-mer is reported; k-mers
    never span contig boundaries. ``engine``: 'device' (XLA), 'native'
    (libgrmio) or 'auto'; both produce identical sorted output.
    """
    engine = _resolve_engine(engine)
    if engine == "native":
        # The C parser encodes straight from the raw bytes (5x the Python
        # parse) and, GIL-free, keeps the counting thread pool scaling.
        from ..native.bindings import encode_fasta_native

        opener = _gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rb") as f:
            codes = encode_fasta_native(f.read())
    else:
        codes = encode_contigs(fasta_to_sequences(path))
    out = _count_codes(codes, k, keep_counts, engine)
    gid = genome_id or _stem(path)
    if keep_counts:
        kmers, counts = out
        return GenomeKmers(gid, k, kmers, counts)
    return GenomeKmers(gid, k, out)


def fastq_to_sequences(path):
    """Read sequences from a FASTQ (optionally gzipped) file."""
    opener = _gzip.open if str(path).endswith(".gz") else open
    seqs = []
    with opener(path, "rt") as f:
        for i, line in enumerate(f):
            if i % 4 == 1:
                seqs.append(line.strip().upper())
    return seqs


def count_reads_dir(read_dir, k, abundance_min=1, genome_id=None, engine="auto"):
    """Count canonical k-mers over all FASTQ files of one genome (reads mode).

    Mirrors the reference reads path (create.py:479-499): every
    ``.fastq``/``.fastq.gz`` in the directory contributes reads; k-mers seen
    fewer than ``abundance_min`` times are dropped (multidsk
    ``-abundance-min``, kmer_count.py:47). A single FASTQ file path is also
    accepted (a one-file genome).
    """
    if os.path.isfile(read_dir):
        files = [read_dir]
    else:
        files = sorted(
            os.path.join(read_dir, f)
            for f in os.listdir(read_dir)
            if f.endswith(READS_EXTENSIONS)
        )
    if not files:
        raise IOError("No FASTQ files found in %s" % read_dir)
    engine = _resolve_engine(engine)
    if engine == "native":
        from ..native.bindings import encode_fasta_native

        parts = []
        for fp in files:
            opener = _gzip.open if str(fp).endswith(".gz") else open
            with opener(fp, "rb") as f:
                codes = encode_fasta_native(f.read(), fastq=True)
            if parts and len(codes):
                parts.append(np.array([4], np.int8))
            parts.append(codes)
        codes = np.concatenate(parts) if parts else np.zeros(0, np.int8)
    else:
        seqs = []
        for f in files:
            seqs.extend(fastq_to_sequences(f))
        codes = encode_contigs(seqs)
    kmers, counts = _count_codes(codes, k, True, engine)
    keep = counts >= abundance_min
    return GenomeKmers(
        genome_id or os.path.basename(os.path.normpath(read_dir)),
        k,
        kmers[keep],
        counts[keep],
    )


def _stem(path):
    base = os.path.basename(str(path))
    for ext in (".gz",):
        if base.endswith(ext):
            base = base[: -len(ext)]
    return os.path.splitext(base)[0]
