"""Fully on-device matrix build vs the host/native builder."""

import numpy as np
import pytest

from grm_tpu.kmer.counter import GenomeKmers
from grm_tpu.kmer.matrix import build_presence_matrix
from grm_tpu.ops.kmer import encode_contigs, sorted_kmers_np
from grm_tpu.ops.popcount import u64_matrix_to_u32
from grm_tpu.parallel.device_build import build_matrix_device


def _genomes(rng, n=6, lo=100, hi=400):
    out = []
    for _ in range(n):
        out.append(["".join(rng.choice(list("ACGT"), rng.randint(lo, hi)))
                    for _ in range(2)])
    return out


@pytest.mark.parametrize("k", [9, 17, 33])
def test_device_build_matches_host(rng, k):
    contig_sets = _genomes(rng)
    codes_list = [encode_contigs(c) for c in contig_sets]
    dm = build_matrix_device(codes_list, k)

    gks = [GenomeKmers("g%d" % i, k, sorted_kmers_np(c, k))
           for i, c in enumerate(codes_list)]
    km = build_presence_matrix(gks)

    assert dm.n_kmers == km.n_kmers
    np.testing.assert_array_equal(dm.union_kmers_host(), km.kmers)
    got32 = np.asarray(dm.matrix)[:, : dm.n_kmers]
    want32 = u64_matrix_to_u32(km.matrix)[: got32.shape[0]]
    np.testing.assert_array_equal(got32, want32)


@pytest.mark.parametrize("k", [16, 32])
def test_device_build_all_ones_kmer_vs_invalid_sentinel(rng, k):
    """A genuine all-T k-mer (k % 16 == 0) has all-ones key words, colliding
    with the sentinel used for invalid windows in the fused sort; the gid key
    must still separate them."""
    poly_t = "T" * (k + 3)
    contig_sets = [
        [poly_t + "N" + "".join(rng.choice(list("ACGT"), 60))],
        ["".join(rng.choice(list("ACGT"), 60)) + "NN" + poly_t],
        ["N" * (k + 2), "".join(rng.choice(list("ACGT"), 60))],
    ]
    codes_list = [encode_contigs(c) for c in contig_sets]
    dm = build_matrix_device(codes_list, k)

    gks = [GenomeKmers("g%d" % i, k, sorted_kmers_np(c, k))
           for i, c in enumerate(codes_list)]
    km = build_presence_matrix(gks)

    assert dm.n_kmers == km.n_kmers
    np.testing.assert_array_equal(dm.union_kmers_host(), km.kmers)
    got32 = np.asarray(dm.matrix)[:, : dm.n_kmers]
    want32 = u64_matrix_to_u32(km.matrix)[: got32.shape[0]]
    np.testing.assert_array_equal(got32, want32)


def test_device_build_singleton_filter(rng):
    k = 11
    codes_list = [encode_contigs(c) for c in _genomes(rng)]
    dm = build_matrix_device(codes_list, k, filter_singleton=True)
    gks = [GenomeKmers("g%d" % i, k, sorted_kmers_np(c, k))
           for i, c in enumerate(codes_list)]
    km = build_presence_matrix(gks, filter_singleton=True)
    assert dm.n_kmers == km.n_kmers
    np.testing.assert_array_equal(dm.union_kmers_host(), km.kmers)
    got32 = np.asarray(dm.matrix)[:, : dm.n_kmers]
    want32 = u64_matrix_to_u32(km.matrix)[: got32.shape[0]]
    np.testing.assert_array_equal(got32, want32)


@pytest.mark.parametrize("k,filter_singleton", [(9, False), (17, False),
                                                (11, True)])
def test_batched_build_matches_host(rng, k, filter_singleton):
    """Batched builds + device union merges == the host oracle, including a
    ragged final batch and k-mers shared across batches."""
    shared = "".join(rng.choice(list("ACGT"), 120))  # cross-batch overlap
    contig_sets = []
    for _ in range(70):
        own = "".join(rng.choice(list("ACGT"), rng.randint(60, 200)))
        contig_sets.append([shared, own])
    codes_list = [encode_contigs(c) for c in contig_sets]

    from grm_tpu.parallel.device_build import build_matrix_device_batched

    dm = build_matrix_device_batched(
        codes_list, k, genome_batch=32, filter_singleton=filter_singleton
    )
    gks = [GenomeKmers("g%d" % i, k, sorted_kmers_np(c, k))
           for i, c in enumerate(codes_list)]
    km = build_presence_matrix(gks, filter_singleton=filter_singleton)

    assert dm.n_kmers == km.n_kmers
    np.testing.assert_array_equal(dm.union_kmers_host(), km.kmers)
    got32 = np.asarray(dm.matrix)[:, : dm.n_kmers]
    want32 = u64_matrix_to_u32(km.matrix)[: got32.shape[0]]
    np.testing.assert_array_equal(got32, want32)


def test_batched_build_validation(rng):
    from grm_tpu.parallel.device_build import build_matrix_device_batched

    codes_list = [encode_contigs(c) for c in _genomes(rng, n=40)]
    with pytest.raises(ValueError, match="multiple of 32"):
        build_matrix_device_batched(codes_list, 9, genome_batch=20)
    with pytest.raises(ValueError, match="k_budget"):
        build_matrix_device_batched(codes_list, 9, genome_batch=32,
                                    k_budget=10)


def test_device_build_budget_too_small(rng):
    codes_list = [encode_contigs(c) for c in _genomes(rng, n=3)]
    with pytest.raises(ValueError, match="k_budget"):
        build_matrix_device(codes_list, 9, k_budget=10)


def test_device_build_feeds_learning(rng):
    """Device-built matrix drives the fused SCM fit directly."""
    import jax.numpy as jnp

    from grm_tpu.parallel.mesh import scm_fit_batch_device
    from grm_tpu.parallel.scm_device import build_packed_mask

    k = 13
    marker = "TTGGCCAATTGGCCAATTGGAGC"
    codes_list = []
    y = []
    for i in range(12):
        bg = "".join(rng.choice(list("ACGT"), 300))
        seq = bg[:150] + (marker if i % 2 else "") + bg[150:]
        codes_list.append(encode_contigs([seq]))
        y.append(i % 2)
    y = np.array(y)

    dm = build_matrix_device(codes_list, k)
    bm = dm.bit_matrix()
    pos = build_packed_mask(np.where(y == 1)[0], 12, bm.n_words)
    neg = build_packed_mask(np.where(y == 0)[0], 12, bm.n_words)
    rules, n_rules, n_neg = scm_fit_batch_device(
        bm.data, jnp.asarray(pos[None]), jnp.asarray(neg[None]),
        jnp.asarray(np.array([1.0], np.float32)), bm.n_columns, 3,
    )
    assert int(np.asarray(n_neg)[0]) == 0
    best = int(np.asarray(rules)[0][0])
    from grm_tpu.ops.kmer import decode_kmers

    assert best < bm.n_columns  # a presence rule separates the classes
    seq = decode_kmers(dm.union_kmers_host()[best : best + 1], k)[0]
    comp = str.maketrans("ACGT", "TGCA")
    marker_kmers = {
        min(marker[i : i + k], marker[i : i + k].translate(comp)[::-1])
        for i in range(len(marker) - k + 1)
    }
    assert seq in marker_kmers
