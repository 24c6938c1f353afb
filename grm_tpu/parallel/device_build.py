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

__all__ = ["build_matrix_device", "DeviceMatrix"]


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
    L = max(max(len(c) for c in codes_list), k)
    # Bucket to limit recompiles.
    bucket = 1 << 12
    L = -(-L // bucket) * bucket
    codes = np.full((G, L), 4, dtype=np.int8)
    for i, c in enumerate(codes_list):
        codes[i, : len(c)] = c
    if k_budget is None:
        k_budget = G * L
    matrix, union_words, n_kmers = _build(
        jnp.asarray(codes), k, G, int(k_budget), bool(filter_singleton)
    )
    n_kmers = int(jax.device_get(n_kmers))
    if n_kmers > k_budget:
        raise ValueError(
            "k_budget=%d too small: union has %d k-mers" % (k_budget, n_kmers)
        )
    return DeviceMatrix(matrix, union_words, n_kmers, k, genome_ids)
