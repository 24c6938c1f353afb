"""Pallas sweep kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from grm_tpu.ops.pallas_popcount import popcount_colsum_pallas
from grm_tpu.ops.popcount import masked_popcount_colsum


@pytest.mark.parametrize("shape", [(4, 512), (12, 513), (3, 2000), (160, 700)])
def test_pallas_matches_xla(rng, shape):
    w, k = shape
    matrix = rng.randint(0, 2**32, size=(w, k)).astype(np.uint32)
    masks = rng.randint(0, 2**32, size=(3, w)).astype(np.uint32)
    got = np.asarray(popcount_colsum_pallas(matrix, masks))
    want = np.asarray(masked_popcount_colsum(matrix, masks))
    np.testing.assert_array_equal(got, want)


def test_pallas_single_mask(rng):
    matrix = rng.randint(0, 2**32, size=(5, 600)).astype(np.uint32)
    mask = rng.randint(0, 2**32, size=5).astype(np.uint32)
    got = np.asarray(popcount_colsum_pallas(matrix, mask))
    want = np.asarray(masked_popcount_colsum(matrix, mask))
    np.testing.assert_array_equal(got, want)
