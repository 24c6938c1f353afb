"""Canonical k-mer extraction vs brute-force host oracle."""

import numpy as np
import pytest

from grm_tpu.ops.kmer import (
    canonical_kmers_brute,
    decode_kmers,
    encode_contigs,
    encode_kmer_strings,
    encode_sequence,
    sorted_kmers_np,
)


def _random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), n))


def test_encode_sequence():
    np.testing.assert_array_equal(
        encode_sequence("ACGTN"), np.array([0, 1, 2, 3, 4], dtype=np.int8)
    )
    np.testing.assert_array_equal(encode_sequence("acgt"), np.arange(4, dtype=np.int8))


@pytest.mark.parametrize("k", [5, 16, 17, 31, 32, 33, 63, 100, 128])
def test_sorted_canonical_vs_brute(rng, k):
    seqs = [_random_seq(rng, rng.randint(k, 400)) for _ in range(4)]
    codes = encode_contigs(seqs)
    kmers = sorted_kmers_np(codes, k)
    got = decode_kmers(kmers, k)
    want = canonical_kmers_brute(seqs, k)
    assert got == want


def test_invalid_bases_and_contig_boundaries(rng):
    k = 7
    seqs = ["ACGTNNACGTACG", "TTTTT", "GGGGGGGGG"]
    codes = encode_contigs(seqs)
    got = decode_kmers(sorted_kmers_np(codes, k), k)
    want = canonical_kmers_brute(seqs, k)
    assert got == want
    # Boundary check: no k-mer spans two contigs.
    joined = canonical_kmers_brute(["".join(seqs)], k)
    assert got != joined


def test_counts_mode(rng):
    k = 4
    seq = "AAAATTTTAAAA"  # AAAA appears: fwd 0,8 and TTTT(canonical AAAA) 4; + spans
    codes = encode_contigs([seq])
    kmers, counts = sorted_kmers_np(codes, k, return_counts=True)
    strings = decode_kmers(kmers, k)
    count_by_kmer = dict(zip(strings, counts))
    # Brute-force counting of canonical occurrences
    comp = str.maketrans("ACGT", "TGCA")
    brute = {}
    for i in range(len(seq) - k + 1):
        km = seq[i : i + k]
        rc = km.translate(comp)[::-1]
        c = min(km, rc)
        brute[c] = brute.get(c, 0) + 1
    assert count_by_kmer == brute


def test_short_sequence_no_kmers():
    codes = encode_contigs(["ACG"])
    kmers = sorted_kmers_np(codes, 5)
    assert kmers.shape == (0, 1)


def test_encode_decode_kmer_strings_roundtrip(rng):
    k = 21
    strings = canonical_kmers_brute([_random_seq(rng, 100)], k)
    packed = encode_kmer_strings(strings, k)
    assert decode_kmers(packed, k) == strings
