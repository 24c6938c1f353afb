"""Masked popcount column-sweep vs dense numpy oracle."""

import numpy as np

from grm_tpu.ops.popcount import BitMatrix, masked_popcount_colsum
from grm_tpu.utils import pack_binary_bytes_to_ints


def test_colsum_matches_dense(rng):
    n_genomes, n_kmers = 70, 253
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)

    rows_a = rng.choice(n_genomes, 20, replace=False)
    rows_b = rng.choice(n_genomes, 31, replace=False)
    counts = bm.presence_counts([rows_a, rows_b])
    np.testing.assert_array_equal(counts[0], dense[rows_a].sum(axis=0))
    np.testing.assert_array_equal(counts[1], dense[rows_b].sum(axis=0))


def test_sum_rows_reference_contract(rng):
    """sum_rows returns presence counts then absence counts (rules.py:201-267)."""
    n_genomes, n_kmers = 40, 97
    dense = (rng.rand(n_genomes, n_kmers) > 0.4).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)

    rows = rng.choice(n_genomes, 17, replace=False)
    out = bm.sum_rows(rows)
    assert out.shape == (2 * n_kmers,)
    assert out.dtype == np.uint8  # minimum uint size for 17 rows
    np.testing.assert_array_equal(out[:n_kmers], dense[rows].sum(axis=0))
    np.testing.assert_array_equal(out[n_kmers:], 17 - dense[rows].sum(axis=0))


def test_from_u64_roundtrip(rng):
    dense = (rng.rand(130, 33) > 0.5).astype(np.uint8)
    m64 = pack_binary_bytes_to_ints(dense, 64)
    bm = BitMatrix.from_u64(m64, 130)
    rows = np.arange(130)
    np.testing.assert_array_equal(
        bm.presence_counts([rows])[0], dense.sum(axis=0)
    )


def test_from_u64_device_path_matches_host(rng):
    """The device de-interleave (raw uint32 view upload) must produce the
    exact uint32 layout of the host converter for any word count."""
    import jax

    from grm_tpu.ops.popcount import u64_matrix_to_u32

    for n_rows, n_cols in [(1, 7), (64, 33), (130, 100), (200, 1)]:
        dense = (rng.rand(n_rows, n_cols) > 0.5).astype(np.uint8)
        m64 = pack_binary_bytes_to_ints(dense, 64)
        bm = BitMatrix.from_u64(m64, n_rows)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(bm.data)), u64_matrix_to_u32(m64)
        )


def test_empty_row_selection(rng):
    dense = (rng.rand(10, 5) > 0.5).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    out = bm.sum_rows(np.zeros(0, dtype=np.int64))
    assert (out == 0).all()


def test_colsum_direct(rng):
    matrix = rng.randint(0, 2**32, size=(4, 11)).astype(np.uint32)
    masks = rng.randint(0, 2**32, size=(3, 4)).astype(np.uint32)
    got = np.asarray(masked_popcount_colsum(matrix, masks))
    want = np.zeros((3, 11), np.int32)
    for c in range(3):
        for k in range(11):
            for w in range(4):
                want[c, k] += bin(int(matrix[w, k]) & int(masks[c, w])).count("1")
    np.testing.assert_array_equal(got, want)
