"""Bit packing round-trips and parity with the reference's loop semantics."""

import numpy as np
import pytest

from grm_tpu.utils import (
    build_row_mask,
    minimum_uint_size,
    pack_binary_bytes_to_ints,
    unpack_binary_bytes_from_ints,
)
from grm_tpu.ops.popcount import u32_matrix_to_u64, u64_matrix_to_u32


def _pack_reference(a, pack_size):
    """Direct transcription of the reference algorithm (utils.py:133-156)."""
    dtype = np.uint64 if pack_size == 64 else np.uint32
    b = np.zeros((int(np.ceil(1.0 * a.shape[0] / pack_size)), a.shape[1]), dtype=dtype)
    packed_rows = 0
    packing_row = 0
    for i in range(a.shape[0]):
        if packed_rows == pack_size:
            packed_rows = 0
            packing_row += 1
        tmp = np.asarray(a[i], dtype=dtype)
        tmp = np.left_shift(tmp, dtype(pack_size - packed_rows - 1))
        np.bitwise_or(b[packing_row], tmp, out=b[packing_row])
        packed_rows += 1
    return b


@pytest.mark.parametrize("pack_size", [32, 64])
@pytest.mark.parametrize("n_rows", [1, 5, 32, 64, 65, 130])
def test_pack_matches_reference_semantics(rng, pack_size, n_rows):
    a = (rng.rand(n_rows, 17) > 0.5).astype(np.uint8)
    ours = pack_binary_bytes_to_ints(a, pack_size)
    ref = _pack_reference(a, pack_size)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("pack_size", [32, 64])
def test_pack_unpack_roundtrip(rng, pack_size):
    a = (rng.rand(70, 9) > 0.3).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(a, pack_size)
    unpacked = unpack_binary_bytes_from_ints(packed)
    np.testing.assert_array_equal(unpacked[: a.shape[0]], a)
    assert (unpacked[a.shape[0] :] == 0).all()


def test_unpack_1d(rng):
    a = (rng.rand(40, 1) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(a, 64)[:, 0]
    unpacked = unpack_binary_bytes_from_ints(packed)
    assert unpacked.ndim == 1
    np.testing.assert_array_equal(unpacked[:40], a[:, 0])


def test_u64_u32_roundtrip(rng):
    m64 = rng.randint(0, 2**63, size=(3, 7)).astype(np.uint64)
    m32 = u64_matrix_to_u32(m64)
    assert m32.shape == (6, 7)
    np.testing.assert_array_equal(u32_matrix_to_u64(m32), m64)


def test_u64_to_u32_preserves_genome_bits(rng):
    # Genome g's bit must land in uint32 row g//32 at bit 31-(g%32).
    a = (rng.rand(100, 5) > 0.5).astype(np.uint8)
    m64 = pack_binary_bytes_to_ints(a, 64)
    m32 = u64_matrix_to_u32(m64)
    direct32 = pack_binary_bytes_to_ints(a, 32)
    np.testing.assert_array_equal(m32[: direct32.shape[0]], direct32)


def test_build_row_mask_msb_first():
    mask = build_row_mask([0, 33, 63], 64, 32)
    assert mask.dtype == np.uint32
    assert mask[0] == np.uint32(1 << 31)
    assert mask[1] == np.uint32((1 << 30) | 1)


def test_minimum_uint_size():
    assert minimum_uint_size(255) == np.uint8
    assert minimum_uint_size(256) == np.uint16
    assert minimum_uint_size(2**16) == np.uint32
    assert minimum_uint_size(2**40) == np.uint64
