"""Distributed presence-matrix construction — the Ray Surveyor role at scale.

Data layout (SURVEY.md section 2.6): genome rows are data-parallel across
processes/hosts; the k-mer union is built by exchanging the per-process
sorted partial unions and merging (host-side sorted-merge; the cross-host
exchange rides DCN via ``process_allgather``). Each process then sets the
presence bits for ITS genomes into the packed uint64 matrix; the disjoint
partial matrices are OR-combined (bit-disjoint by construction, exchanged as
uint32 halves since TPUs lack 64-bit integers).

With one process this degenerates exactly to
:func:`grm_tpu.kmer.matrix.build_presence_matrix` output (determinism across
process counts is asserted in tests — the distributed-equals-local contract
the reference implicitly relied on when consuming Ray Surveyor's MPI output
interchangeably with DSK's).
"""

from __future__ import annotations

import numpy as np

from ..kmer.counter import count_fasta
from ..kmer.matrix import KmerMatrix, kmer_rows_sort_key
from ..ops.kmer import n_words_for_k
from .distributed import all_gather_arrays, process_count, process_index, \
    shard_round_robin

__all__ = ["build_presence_matrix_distributed"]


def _merge_sorted_unions(union_arrays, nw):
    """Merge per-process sorted distinct (n, nw) arrays into the global union."""
    if len(union_arrays) == 1:
        return np.ascontiguousarray(union_arrays[0])
    allk = np.concatenate(
        [np.asarray(a, np.uint32).reshape(-1, nw) for a in union_arrays]
        + [np.zeros((0, nw), np.uint32)]
    )
    keys = kmer_rows_sort_key(allk)
    _, first_idx = np.unique(keys, return_index=True)
    return np.ascontiguousarray(allk[first_idx])


def _spec_digest(genome_specs, k, filter_singleton):
    """Digest of the build contract that must agree across processes.

    Covers the genome-id order, count, k, and the filter flag — NOT the
    paths (per-host mounts may legitimately differ; each process only reads
    its own round-robin share)."""
    import hashlib

    h = hashlib.sha256()
    for gid, _ in genome_specs:
        h.update(str(gid).encode())
        h.update(b"\0")
    h.update(("%d|%d|%d" % (len(genome_specs), k,
                            int(bool(filter_singleton)))).encode())
    return np.frombuffer(h.digest(), dtype=np.uint32).copy()


def _check_spec_agreement(genome_specs, k, filter_singleton):
    """Fail fast, on every process, when the build inputs disagree.

    Without this, a mismatched genome list either hangs the union exchange
    (shape mismatch) or silently produces a diverged matrix. The reference
    surfaced such faults only as subprocess return codes
    (src/app.py:1326-1337); here every rank raises a diagnosable error
    naming the disagreeing processes before any heavy work runs.
    """
    if process_count() <= 1:
        return
    digest = _spec_digest(genome_specs, k, filter_singleton)
    digests = all_gather_arrays(digest)
    me = process_index()
    bad = [i for i, d in enumerate(digests)
           if not np.array_equal(d, digests[0])]
    if bad:
        raise ValueError(
            "Distributed build input mismatch: process(es) %s disagree with "
            "process 0 on the (genome ids, k, filter) contract "
            "(this is process %d). Every process must pass the identical "
            "ordered genome list and parameters." % (bad, me)
        )


def build_presence_matrix_distributed(genome_specs, k, filter_singleton=False,
                                      engine="auto", progress_callback=None):
    """Build the packed presence matrix with genome-data-parallel processes.

    ``genome_specs``: ordered list of (genome_id, fasta_path) — identical on
    every process; each process counts its round-robin share.
    Returns a :class:`KmerMatrix` (identical on every process).
    """
    if progress_callback is None:
        progress_callback = lambda t, p: None
    _check_spec_agreement(genome_specs, k, filter_singleton)
    nw = n_words_for_k(k)
    n_genomes = len(genome_specs)

    # 1. Local counting of this process's genome share.
    my_items = shard_round_robin(list(enumerate(genome_specs)))
    local_kmers = {}
    for j, (g_idx, (gid, path)) in enumerate(my_items):
        progress_callback("K-mer counting", float(j) / max(len(my_items), 1))
        local_kmers[g_idx] = count_fasta(path, k, genome_id=gid,
                                         engine=engine).kmers
    progress_callback("K-mer counting", 1.0)

    # 2. Local partial union (sorted distinct).
    if local_kmers:
        local_all = np.concatenate(
            list(local_kmers.values()) + [np.zeros((0, nw), np.uint32)]
        )
        keys = kmer_rows_sort_key(local_all)
        _, first_idx = np.unique(keys, return_index=True)
        local_union = np.ascontiguousarray(local_all[first_idx])
    else:
        local_union = np.zeros((0, nw), np.uint32)

    # 3. Global union over DCN.
    union = _merge_sorted_unions(all_gather_arrays(local_union), nw)
    union_keys = kmer_rows_sort_key(union)
    n_kmers = union.shape[0]
    progress_callback("Union", 1.0)

    # 4. Partial packed matrix for local genomes (bit-disjoint by genome).
    n_words64 = -(-n_genomes // 64)
    partial = np.zeros((n_words64, n_kmers), dtype=np.uint64)
    genome_counts = np.zeros(n_kmers, dtype=np.int64)
    for g_idx, kmers in local_kmers.items():
        cols = np.searchsorted(union_keys, kmer_rows_sort_key(kmers))
        partial[g_idx // 64, cols] |= np.uint64(1) << np.uint64(63 - (g_idx % 64))
        genome_counts[cols] += 1

    # 5. Combine partials across processes (disjoint bits -> OR == sum).
    if process_count() > 1:
        hi = (partial >> np.uint64(32)).astype(np.uint32)
        lo = (partial & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        parts_hi = all_gather_arrays(hi.reshape(-1))
        parts_lo = all_gather_arrays(lo.reshape(-1))
        hi = np.bitwise_or.reduce(np.stack(parts_hi)).reshape(partial.shape)
        lo = np.bitwise_or.reduce(np.stack(parts_lo)).reshape(partial.shape)
        partial = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        counts_parts = all_gather_arrays(genome_counts)
        genome_counts = np.sum(np.stack(counts_parts), axis=0)
    progress_callback("Matrix", 1.0)

    if filter_singleton:
        keep = genome_counts != 1
        union = union[keep]
        partial = partial[:, keep]

    return KmerMatrix(
        k=k,
        kmers=union,
        matrix=partial,
        genome_ids=[gid for gid, _ in genome_specs],
    )
