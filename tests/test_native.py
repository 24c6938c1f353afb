"""Native grmio library vs Python/device oracles."""

import numpy as np
import pytest

from grm_tpu.native import bindings as nb
from grm_tpu.ops.kmer import (
    canonical_kmers_brute,
    decode_kmers,
    encode_contigs,
    sorted_kmers_np,
)

pytestmark = pytest.mark.skipif(
    not nb.build(), reason="C++ toolchain unavailable"
)


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_encode_fasta_matches_python(rng):
    contigs = [_random_seq(rng, 100), "ACGTNNacgt", _random_seq(rng, 57)]
    text = "".join(
        ">c%d desc\n%s\n" % (i, c[: len(c) // 2] + "\n" + c[len(c) // 2:])
        for i, c in enumerate(contigs)
    )
    got = nb.encode_fasta_native(text)
    want = encode_contigs(contigs)
    np.testing.assert_array_equal(got, want)


def test_encode_fastq(rng):
    reads = [_random_seq(rng, 40), _random_seq(rng, 35)]
    text = "".join("@r%d\n%s\n+\n%s\n" % (i, r, "I" * len(r))
                   for i, r in enumerate(reads))
    got = nb.encode_fastq = nb.encode_fasta_native(text, fastq=True)
    want = encode_contigs(reads)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [7, 16, 31, 33, 128])
def test_count_kmers_matches_device(rng, k):
    contigs = [_random_seq(rng, 300), _random_seq(rng, 200)]
    codes = encode_contigs(contigs)
    got = nb.count_kmers_native(codes, k)
    want = sorted_kmers_np(codes, k)
    np.testing.assert_array_equal(got, want)
    assert decode_kmers(got, k) == canonical_kmers_brute(contigs, k)


def test_count_kmers_counts(rng):
    codes = encode_contigs(["AAAATTTTAAAA"])
    kmers, counts = nb.count_kmers_native(codes, 4, return_counts=True)
    _, want_counts = sorted_kmers_np(codes, 4, return_counts=True)
    np.testing.assert_array_equal(counts, want_counts)


def test_merge_union_matches_numpy(rng):
    k = 15
    from grm_tpu.ops.kmer import n_words_for_k

    nw = n_words_for_k(k)
    lists = []
    for _ in range(5):
        codes = encode_contigs([_random_seq(rng, rng.randint(100, 400))])
        lists.append(sorted_kmers_np(codes, k))
    union, counts, col_arrays = nb.merge_union_native(lists, nw)

    # numpy oracle
    allk = np.concatenate(lists)
    from grm_tpu.kmer.matrix import kmer_rows_sort_key

    keys = kmer_rows_sort_key(allk)
    uk, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
    assert union.shape[0] == uk.shape[0]
    np.testing.assert_array_equal(counts, cnt)
    off = 0
    for i, a in enumerate(lists):
        np.testing.assert_array_equal(col_arrays[i], inv[off:off + len(a)])
        off += len(a)


def test_set_presence_bits():
    lib = nb._load()
    row = np.zeros(10, dtype=np.uint64)
    cols = np.array([0, 3, 9], dtype=np.int64)
    lib.grm_set_presence_bits(row, cols, len(cols), 5)
    want = np.uint64(1) << np.uint64(63 - 5)
    assert row[0] == want and row[3] == want and row[9] == want
    assert row[1] == 0


@pytest.mark.parametrize("nw", [1, 2])
def test_merge_union_cols_matches_generic(rng, nw):
    k = 13 if nw == 1 else 27
    lists = []
    for _ in range(7):
        codes = encode_contigs([_random_seq(rng, rng.randint(50, 400))])
        lists.append(sorted_kmers_np(codes, k))
    lists.append(np.zeros((0, nw), np.uint32))  # exhausted-from-start stream

    union, counts, cols = nb.merge_union_cols_native(lists, nw)
    union_ref, counts_ref, cols_ref = nb.merge_union_native(lists, nw)
    np.testing.assert_array_equal(union, union_ref)
    np.testing.assert_array_equal(counts, counts_ref)
    for a, b in zip(cols, cols_ref):
        np.testing.assert_array_equal(a, b)


def test_merge_union_cols_max_key(rng):
    # A real all-ones key (k=16 'TTTT...' fills the uint32 word) must not be
    # confused with the exhausted-stream sentinel.
    tmax = np.array([[0xFFFFFFFF]], np.uint32)
    a = np.array([[1], [0xFFFFFFFF]], np.uint32)
    union, counts, cols = nb.merge_union_cols_native([a, tmax], 1)
    np.testing.assert_array_equal(union[:, 0], [1, 0xFFFFFFFF])
    np.testing.assert_array_equal(counts, [1, 2])
    np.testing.assert_array_equal(cols[0], [0, 1])
    np.testing.assert_array_equal(cols[1], [1])


def test_merge_union_cols_single_list():
    a = np.array([[3, 7], [9, 2]], np.uint32)
    union, counts, cols = nb.merge_union_cols_native([a], 2)
    np.testing.assert_array_equal(union, a)
    np.testing.assert_array_equal(counts, [1, 1])
    np.testing.assert_array_equal(cols[0], [0, 1])


def test_set_presence_bits_native_matrix():
    matrix = np.zeros((2, 6), np.uint64)
    # 65 genomes: genome 64 lands in word row 1, bit 0 (MSB).
    col_arrays = [np.array([g % 6], np.int64) for g in range(65)]
    nb.set_presence_bits_native(matrix, col_arrays)
    for g in range(65):
        word, bit = g // 64, np.uint64(1) << np.uint64(63 - (g % 64))
        assert matrix[word, g % 6] & bit


@pytest.mark.parametrize("n_genomes", [3, 65, 130])
def test_merge_union_bits_matches_generic(rng, n_genomes):
    k = 17
    lists = []
    for _ in range(n_genomes):
        codes = encode_contigs([_random_seq(rng, rng.randint(30, 120))])
        lists.append(sorted_kmers_np(codes, k))

    union, counts, matrix = nb.merge_union_bits_native(lists, 2)
    union_ref, counts_ref, cols_ref = nb.merge_union_native(lists, 2)
    np.testing.assert_array_equal(union, union_ref)
    np.testing.assert_array_equal(counts, counts_ref)
    want = np.zeros((-(-n_genomes // 64), union_ref.shape[0]), np.uint64)
    for g, cols in enumerate(cols_ref):
        want[g // 64, cols] |= np.uint64(1) << np.uint64(63 - (g % 64))
    np.testing.assert_array_equal(matrix, want)


@pytest.mark.parametrize("n_genomes,nw", [(3, 1), (65, 2)])
def test_merge_union_bits_parallel_matches_serial(rng, n_genomes, nw):
    k = 9 if nw == 1 else 17
    base_len = 40000 if nw == 1 else 2500
    lists = []
    for _ in range(n_genomes):
        codes = encode_contigs([_random_seq(rng, rng.randint(base_len, base_len + 1000))])
        lists.append(sorted_kmers_np(codes, k))

    import grm_tpu.native.bindings as bindings

    # Drop the threaded-path gate so the partitioned merge really runs
    # at test scale (a light replication still exercises multi-partition
    # boundaries).
    big = lists * 4
    u_par, c_par, m_par = bindings.merge_union_bits_parallel(
        big, nw, n_threads=3, min_total=1)
    u_ser, c_ser, m_ser = bindings.merge_union_bits_native(big, nw)
    np.testing.assert_array_equal(u_par, u_ser)
    np.testing.assert_array_equal(c_par, c_ser)
    np.testing.assert_array_equal(m_par, m_ser)

    # The small-input fallback is exact too.
    u_p2, c_p2, m_p2 = bindings.merge_union_bits_parallel(lists, nw, n_threads=2)
    u_s2, c_s2, m_s2 = bindings.merge_union_bits_native(lists, nw)
    np.testing.assert_array_equal(u_p2, u_s2)
    np.testing.assert_array_equal(c_p2, c_s2)
    np.testing.assert_array_equal(m_p2, m_s2)


@pytest.mark.parametrize("k,nw", [(47, 3), (63, 4), (101, 7)])
def test_merge_union_bits_rows_matches_generic(rng, k, nw):
    lists = []
    for _ in range(70):
        codes = encode_contigs([_random_seq(rng, rng.randint(150, 400))])
        lists.append(sorted_kmers_np(codes, k))

    union, counts, matrix = nb.merge_union_bits_native(lists, nw)
    union_ref, counts_ref, cols_ref = nb.merge_union_native(lists, nw)
    np.testing.assert_array_equal(union, union_ref)
    np.testing.assert_array_equal(counts, counts_ref)
    want = np.zeros((2, union_ref.shape[0]), np.uint64)
    for g, cols in enumerate(cols_ref):
        want[g // 64, cols] |= np.uint64(1) << np.uint64(63 - (g % 64))
    np.testing.assert_array_equal(matrix, want)

    # Parallel driver agrees for multiword rows too (gate dropped so the
    # threaded path runs at test scale).
    big = lists * 4
    u_par, c_par, m_par = nb.merge_union_bits_parallel(
        big, nw, n_threads=3, min_total=1)
    u_ser, c_ser, m_ser = nb.merge_union_bits_native(big, nw)
    np.testing.assert_array_equal(u_par, u_ser)
    np.testing.assert_array_equal(c_par, c_ser)
    np.testing.assert_array_equal(m_par, m_ser)
