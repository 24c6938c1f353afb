"""Fully on-device presence-matrix construction.

The host/native build (:mod:`grm_tpu.kmer.matrix`) returns every genome's
k-mer set to the host for the union merge. This builder keeps the whole
construction on device — the TPU-native ingest path for the in-memory
pipeline (codes in, HBM-resident packed matrix out, nothing but scalars
fetched):

1. per-genome canonical window extraction (vmapped elementwise pipeline from
   :mod:`grm_tpu.ops.kmer`);
2. ONE global lexicographic sort over all genomes' windows with keys
   ``[invalid, kmer words..., genome_id]`` — genome-id as the last key makes
   per-genome duplicates adjacent, so no per-genome dedup pass is needed;
3. run-length flags give each distinct k-mer its union column (cumsum);
   duplicate (k-mer, genome) pairs are masked so a scatter-add of disjoint
   genome bits builds the packed uint32 matrix directly;
4. the singleton filter and column compaction are one more stable sort +
   gather.

Shapes are static: the column axis is padded to ``k_budget`` (caller's upper
bound on the union size; checked at runtime). Suited to in-memory scale
(the global sort holds all windows at once); artifact-scale ingest uses the
native streaming build, and pod-scale uses the multi-process builder in
:mod:`grm_tpu.parallel.build`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.kmer import _extract_canon, _lex_sort, n_words_for_k
from ..ops.popcount import BitMatrix

__all__ = ["build_matrix_device", "build_matrix_device_batched",
           "DeviceMatrix"]


class DeviceMatrix:
    """Device-resident build result: padded matrix + union + true size."""

    def __init__(self, matrix, union_words, n_kmers, k, genome_ids):
        self.matrix = matrix          # (W, k_budget) uint32, device
        self.union_words = union_words  # (k_budget, nw) uint32, device
        self.n_kmers = int(n_kmers)
        self.k = k
        self.genome_ids = list(genome_ids)

    def bit_matrix(self):
        bm = BitMatrix(self.matrix, len(self.genome_ids))
        bm.n_columns = self.n_kmers  # padding columns are all-zero
        return bm

    def union_kmers_host(self):
        return np.asarray(jax.device_get(self.union_words))[: self.n_kmers]


@partial(jax.jit, static_argnames=("k", "n_genomes", "k_budget",
                                   "filter_singleton"))
def _build(codes, k, n_genomes, k_budget, filter_singleton):
    """codes: (G, L) int8 padded with 4s. Returns device arrays."""
    nw = n_words_for_k(k)
    G, L = codes.shape

    canon, valid = jax.vmap(lambda c: _extract_canon(c, k))(codes)
    # canon: list of nw arrays (G, L); valid: (G, L)
    # Fold the invalid flag into the sort keys instead of carrying a fourth
    # key operand: invalid windows get all-ones words and the out-of-range
    # genome id G, so they sort to the end of their (possibly shared) word
    # run and after every real genome's rows. A genuine all-ones k-mer (k a
    # multiple of 16, all-T) still sorts before invalid rows via the gid key,
    # and validity is recovered as gid < G.
    valid_flat = valid.reshape(-1)
    flat_words = [
        jnp.where(valid_flat, w.reshape(-1), jnp.uint32(0xFFFFFFFF))
        for w in canon
    ]
    gid = jnp.where(
        valid_flat,
        jnp.repeat(jnp.arange(G, dtype=jnp.uint32), L),
        jnp.uint32(G),
    )

    sorted_ops = _lex_sort(flat_words + [gid])
    words_s = sorted_ops[:nw]
    gid_s = sorted_ops[-1]

    n = gid_s.shape[0]
    new_kmer = jnp.zeros((n,), bool).at[0].set(True)
    for w in words_s:
        new_kmer = new_kmer | jnp.concatenate(
            [jnp.ones((1,), bool), w[1:] != w[:-1]]
        )
    valid_s = gid_s < G
    first = new_kmer & valid_s
    col = jnp.cumsum(first.astype(jnp.int32)) - 1  # union column per row
    n_kmers = jnp.sum(first.astype(jnp.int32))

    # Duplicate (k-mer, genome) rows: same kmer run AND same gid as previous.
    same_gid = jnp.concatenate([jnp.zeros((1,), bool), gid_s[1:] == gid_s[:-1]])
    dup = (~new_kmer) & same_gid
    keep = valid_s & (~dup)

    # Scatter genome bits into the packed matrix (bits disjoint after dedup,
    # so add == or). Invalid/duplicate rows go to a trash column.
    w_count = -(-n_genomes // 32)
    word_idx = (gid_s // 32).astype(jnp.int32)
    bit = jnp.where(
        keep, jnp.uint32(1) << (31 - (gid_s % 32)).astype(jnp.uint32),
        jnp.uint32(0),
    )
    col_safe = jnp.where(keep, col, k_budget).astype(jnp.int32)
    # For the matrix build keep duplicate rows at their true column (their
    # bit is already zero) and only route invalid rows — which sort to the
    # very end — to the trash column: that makes the linearized destination
    # index nondecreasing ((col, gid) pairs are sorted, so word_idx = gid//32
    # is nondecreasing within a column run), and a sorted segment-sum beats
    # a general scatter-add.
    col_valid = jnp.where(valid_s, col, k_budget).astype(jnp.int32)
    lin_idx = col_valid * w_count + word_idx
    matrix = jax.ops.segment_sum(
        bit, lin_idx, num_segments=(k_budget + 1) * w_count,
        indices_are_sorted=True,
    ).reshape(k_budget + 1, w_count).T
    matrix = matrix[:, :k_budget]

    # Union k-mer words per column (duplicates write identical values).
    union_words = jnp.zeros((nw, k_budget + 1), jnp.uint32)
    for j, w in enumerate(words_s):
        union_words = union_words.at[j, col_safe].set(jnp.where(keep, w, 0))
    union_words = union_words[:, :k_budget]

    # Genome counts per column (for the singleton filter).
    counts = jnp.zeros((k_budget + 1,), jnp.int32).at[col_safe].add(
        keep.astype(jnp.int32)
    )[:k_budget]

    if filter_singleton:
        col_live = jnp.arange(k_budget) < n_kmers
        keep_col = col_live & (counts != 1)
        # Stable-compact kept columns to the front.
        order = jnp.argsort(~keep_col, stable=True)
        matrix = jnp.take(matrix, order, axis=1)
        union_words = jnp.take(union_words, order, axis=1)
        zero_mask = jnp.take(keep_col, order)
        matrix = jnp.where(zero_mask[None, :], matrix, 0)
        union_words = jnp.where(zero_mask[None, :], union_words, 0)
        n_kmers = jnp.sum(keep_col.astype(jnp.int32))

    return matrix, union_words.T, n_kmers


@partial(jax.jit, static_argnames=("nw", "k_budget"))
def _merge_ranks(words, valids, nw, k_budget):
    """One fused multi-way union merge over concatenated batch unions.

    ``words``: (R, nw) uint32 — every batch's union rows back to back, each
    batch's valid prefix lexicographically sorted (as :func:`_build` emits
    them). ``valids``: (R,) bool. Returns ``dest`` (R,) int32 — each row's
    column in the merged, sorted, deduplicated union (invalid rows get a
    trash sentinel past any real column) — the merged union words
    (k_budget, nw), and the merged k-mer count.

    One lex sort of R rows total, regardless of the number of batches: the
    sort keys are the k-mer words with the concat position folded in as
    the last key (invalid rows get all-ones words AND the sentinel
    position, so a genuine all-ones k-mer still sorts ahead of them).
    """
    r = words.shape[0]
    trash = jnp.int32(2**31 - 1)
    pos = jnp.where(
        valids, jnp.arange(r, dtype=jnp.uint32), jnp.uint32(0xFFFFFFFF)
    )
    keys = [
        jnp.where(valids, words[:, j], jnp.uint32(0xFFFFFFFF))
        for j in range(nw)
    ]
    s = _lex_sort(keys + [pos])
    words_s, pos_s = s[:nw], s[-1]
    valid_s = pos_s != jnp.uint32(0xFFFFFFFF)

    new_kmer = jnp.zeros((r,), bool).at[0].set(True)
    for w in words_s:
        new_kmer = new_kmer | jnp.concatenate(
            [jnp.ones((1,), bool), w[1:] != w[:-1]]
        )
    first = new_kmer & valid_s
    col = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_merged = jnp.sum(first.astype(jnp.int32))

    dest = jnp.full((r + 1,), trash, jnp.int32).at[
        jnp.where(valid_s, pos_s, r).astype(jnp.int32)
    ].set(jnp.where(valid_s, col, trash))[:r]

    union = jnp.zeros((k_budget + 1, nw), jnp.uint32).at[
        jnp.minimum(dest, k_budget)
    ].set(jnp.where(valids[:, None], words, 0))
    union = union.at[k_budget].set(0)
    return dest, union[:k_budget], n_merged


@partial(jax.jit, static_argnames=("k_budget",), donate_argnums=(0,))
def _scatter_batch_columns(final, b_matrix, dest_b, w_off, k_budget):
    """Place one batch's packed columns at their merged destinations.

    ``final``: (W, k_budget+1) uint32 (last column is scatter trash).
    The batch's word-rows [w_off, w_off+wb) are untouched by every other
    batch, so a row-slice column scatter needs no bitwise combine.
    """
    wb = b_matrix.shape[0]
    dest_b = jnp.minimum(dest_b, k_budget)
    sl = jax.lax.dynamic_slice(final, (w_off, 0), (wb, k_budget + 1))
    sl = sl.at[:, dest_b].set(b_matrix)
    return jax.lax.dynamic_update_slice(final, sl, (w_off, 0))


@partial(jax.jit, static_argnames=("k_budget",), donate_argnums=(0, 1))
def _compact_singletons(matrix, union, n_kmers, k_budget):
    """Drop columns present in exactly one genome; compact survivors left.

    Same contract as the tail of :func:`_build` (the reference's
    ``filter_singleton`` of ``bin/kover/kover:144-147``), applied to the
    fully merged matrix so cross-batch occurrences count.
    """
    counts = jnp.sum(
        jax.lax.population_count(matrix[:, :k_budget]).astype(jnp.int32),
        axis=0,
    )
    col_live = jnp.arange(k_budget) < n_kmers
    keep_col = col_live & (counts != 1)
    order = jnp.argsort(~keep_col, stable=True)
    out = jnp.take(matrix[:, :k_budget], order, axis=1)
    union_o = jnp.take(union, order, axis=0)
    zero_mask = jnp.take(keep_col, order)
    out = jnp.where(zero_mask[None, :], out, 0)
    union_o = jnp.where(zero_mask[:, None], union_o, 0)
    out = jnp.concatenate(
        [out, jnp.zeros((out.shape[0], 1), jnp.uint32)], axis=1
    )
    return out, union_o, jnp.sum(keep_col.astype(jnp.int32))


def build_matrix_device_batched(codes_list, k, genome_ids=None, k_budget=None,
                                genome_batch=32, batch_budget=None,
                                filter_singleton=False):
    """Artifact-scale device ingest: batched builds + ONE fused union merge.

    :func:`build_matrix_device` holds every genome's windows in one global
    sort — fine in-memory, impossible at artifact scale (342 genomes x
    5 Mbp is ~1.7G sort rows). This builder sorts one ``genome_batch``'s
    windows at a time (per-batch cost bounded by the batch's window count),
    keeps each batch's deduplicated union + packed columns resident, then
    merges ALL batch unions in one sort whose cost is bounded by the sum of
    union sizes — the device analogue of the native streaming merge
    (``native/grmio.cpp``) and of the role dsk2kover's per-genome merge
    plays in the reference (``tools/kmer_pack.py:23-36``). Batch word-rows
    are disjoint in the packed layout, so each batch's columns scatter into
    the final matrix without bitwise combines.

    ``genome_batch`` must be a multiple of 32 so each batch's packed rows
    drop into the global word-row grid untouched. ``k_budget`` bounds the
    UNION size (raises when exceeded); ``batch_budget`` bounds one batch's
    distinct k-mers (defaults to the batch's window count, always safe —
    tighter values cut both the merge sort and peak memory).
    """
    G = len(codes_list)
    if G == 0:
        raise ValueError("At least one genome is required.")
    if genome_batch % 32 != 0:
        raise ValueError("genome_batch must be a multiple of 32.")
    if genome_ids is None:
        genome_ids = ["g%d" % i for i in range(G)]
    nw = n_words_for_k(k)
    w_total = -(-G // 32)
    if k_budget is None:
        k_budget = sum(max(len(c) - k + 1, 0) for c in codes_list)
    k_budget = int(k_budget)

    # Phase 1: per-batch builds, fully asynchronous — no per-batch
    # device_get (1-6 s each through this rig's tunnel regardless of
    # size), so batch N+1's host padding + H2D overlap batch N's sort.
    # Budget-overflow checks ride the single merge-time fetch below.
    batches = []  # (matrix, union_words, n_dev scalar, w_off, bucket)
    for lo in range(0, G, genome_batch):
        sub = codes_list[lo : lo + genome_batch]
        bb = batch_budget
        if bb is None:
            bb = sum(max(len(c) - k + 1, 0) for c in sub)
        # Bucket the batch budget (next power of two) to bound recompiles
        # across ragged batches.
        bucket = 1 << 10
        while bucket < bb:
            bucket *= 2
        b_matrix, b_union, b_n = _build_codes(sub, k, bucket)
        batches.append((b_matrix, b_union, b_n, lo // 32, bucket))

    # Phase 2: one multi-way union merge over the concatenated batch unions
    # (per-batch validity from the DEVICE count scalars — still no sync).
    words = jnp.concatenate([b[1] for b in batches], axis=0)
    valids = jnp.concatenate([
        jnp.arange(b[4]) < b[2] for b in batches
    ])
    dest, union, n_dev = _merge_ranks(words, valids, nw=nw,
                                      k_budget=k_budget)
    counts = jax.device_get([n_dev] + [b[2] for b in batches])
    n_kmers = int(counts[0])
    for (_, _, _, lo32, bucket), b_n in zip(batches, counts[1:]):
        if int(b_n) > bucket:
            raise ValueError(
                "batch at word-row %d overflowed its %d-kmer budget (%d)"
                % (lo32, bucket, int(b_n)))
    if n_kmers > k_budget:
        raise ValueError(
            "k_budget=%d too small: union has %d k-mers" % (k_budget, n_kmers)
        )

    # Phase 3: scatter each batch's packed columns to their merged homes.
    final = jnp.zeros((w_total, k_budget + 1), jnp.uint32)
    off = 0
    for b_matrix, _, _, w_off, bucket in batches:
        final = _scatter_batch_columns(
            final, b_matrix, jax.lax.dynamic_slice(dest, (off,), (bucket,)),
            w_off, k_budget=k_budget,
        )
        off += bucket

    if filter_singleton:
        final, union, n_dev = _compact_singletons(
            final, union, n_dev, k_budget=k_budget
        )
        n_kmers = int(jax.device_get(n_dev))
    return DeviceMatrix(final[:, :k_budget], union, n_kmers, k, genome_ids)


def _build_codes(codes_list, k, k_budget, filter_singleton=False):
    """Pad + upload one genome batch and dispatch its build; returns
    (matrix, union_words, n_kmers) with the count still a DEVICE scalar
    (no sync — callers batch the fetch)."""
    G = len(codes_list)
    L = max(max(len(c) for c in codes_list), k)
    # Bucket to limit recompiles.
    bucket = 1 << 12
    L = -(-L // bucket) * bucket
    codes = np.full((G, L), 4, dtype=np.int8)
    for i, c in enumerate(codes_list):
        codes[i, : len(c)] = c
    return _build(
        jnp.asarray(codes), k, G, int(k_budget), bool(filter_singleton)
    )


def build_matrix_device(codes_list, k, genome_ids=None, k_budget=None,
                        filter_singleton=False):
    """Build the packed presence matrix on device from per-genome codes.

    ``codes_list``: per-genome int8 code arrays (0..3, 4=invalid/separator).
    ``k_budget``: static upper bound on the union size (default: total
    window count, always safe; tighter budgets save memory).
    """
    G = len(codes_list)
    if G == 0:
        raise ValueError("At least one genome is required.")
    if genome_ids is None:
        genome_ids = ["g%d" % i for i in range(G)]
    if k_budget is None:
        L = max(max(len(c) for c in codes_list), k)
        k_budget = G * (-(-L // (1 << 12)) * (1 << 12))
    matrix, union_words, n_kmers = _build_codes(
        codes_list, k, int(k_budget), filter_singleton)
    n_kmers = int(jax.device_get(n_kmers))
    if n_kmers > k_budget:
        raise ValueError(
            "k_budget=%d too small: union has %d k-mers" % (k_budget, n_kmers)
        )
    return DeviceMatrix(matrix, union_words, n_kmers, k, genome_ids)
