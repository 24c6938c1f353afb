"""Sharded sweeps and the fused device SCM step on a virtual 8-device mesh."""

import numpy as np
import pytest

import jax

from grm_tpu.ops.popcount import BitMatrix, masked_popcount_colsum
from grm_tpu.parallel.mesh import (
    make_mesh,
    scm_device_step,
    shard_bit_matrix,
    sharded_presence_counts,
)
from grm_tpu.utils import build_row_mask, pack_binary_bytes_to_ints


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("row_devices", [1, 2])
def test_sharded_counts_match_unsharded(rng, row_devices):
    n_genomes, n_kmers = 100, 531  # deliberately not divisible by shards
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)

    mesh = make_mesh(8, row_devices=row_devices)
    m_sharded, k = shard_bit_matrix(packed, mesh)
    assert k == n_kmers

    rows_a = rng.choice(n_genomes, 40, replace=False)
    rows_b = rng.choice(n_genomes, 13, replace=False)
    w_padded = m_sharded.shape[0]
    masks = np.zeros((2, w_padded), np.uint32)
    for i, rows in enumerate([rows_a, rows_b]):
        m = build_row_mask(rows, n_genomes, 32)
        masks[i, : len(m)] = m

    counts = sharded_presence_counts(m_sharded, masks, mesh)[:, :k]
    np.testing.assert_array_equal(counts[0], dense[rows_a].sum(axis=0))
    np.testing.assert_array_equal(counts[1], dense[rows_b].sum(axis=0))


def _host_scm_fast(dense, y, p, max_rules):
    """Pure-argmax (fast path) SCM reference on host."""
    n = dense.shape[1]
    X = np.hstack([dense, 1 - dense]).astype(np.int64)
    pos = set(np.where(y == 1)[0])
    neg = set(np.where(y == 0)[0])
    chosen = []
    while neg and len(chosen) < max_rules:
        pos_l, neg_l = sorted(pos), sorted(neg)
        neg_cover = (X[neg_l] == 0).sum(axis=0)
        pos_err = (X[pos_l] == 0).sum(axis=0)
        utility = neg_cover.astype(np.float32) - np.float32(p) * pos_err.astype(
            np.float32
        )
        utility[(neg_cover == 0) & (pos_err == 0)] = -np.inf
        best = int(np.argmax(utility))
        chosen.append(best)
        pos = {i for i in pos if X[i, best]}
        neg = {i for i in neg if X[i, best]}
    return chosen


@pytest.mark.parametrize("sharded", [False, True])
def test_scm_device_step_matches_host(rng, sharded):
    n_genomes, n_kmers = 70, 300
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)

    if sharded:
        mesh = make_mesh(8, row_devices=2)
        matrix, k = shard_bit_matrix(packed, mesh)
        w = matrix.shape[0]
    else:
        import jax.numpy as jnp

        matrix, k = jnp.asarray(packed), n_kmers
        w = packed.shape[0]

    pos_mask = np.zeros(w, np.uint32)
    neg_mask = np.zeros(w, np.uint32)
    pm = build_row_mask(np.where(y == 1)[0], n_genomes, 32)
    nm = build_row_mask(np.where(y == 0)[0], n_genomes, 32)
    pos_mask[: len(pm)] = pm
    neg_mask[: len(nm)] = nm

    p = 1.0
    want = _host_scm_fast(dense, y, p, 4)
    got = []
    for _ in range(4):
        best, util, pos_mask, neg_mask, n_neg = scm_device_step(
            matrix, pos_mask, neg_mask, p, k
        )
        got.append(int(best))
        if int(n_neg) == 0:
            break
    assert got == want[: len(got)]


def test_scm_fit_batch_device_matches_host(rng):
    """The one-dispatch batched fit (scan+while) matches the per-step path."""
    import jax.numpy as jnp

    from grm_tpu.parallel.mesh import scm_fit_batch_device

    n_genomes, n_kmers = 60, 200
    dense = (rng.rand(n_genomes, n_kmers) > 0.55).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    matrix = jnp.asarray(packed)
    w = packed.shape[0]

    pm = np.zeros(w, np.uint32)
    nm = np.zeros(w, np.uint32)
    pmv = build_row_mask(np.where(y == 1)[0], n_genomes, 32)
    nmv = build_row_mask(np.where(y == 0)[0], n_genomes, 32)
    pm[: len(pmv)] = pmv
    nm[: len(nmv)] = nmv

    ps = [0.5, 1.0, 3.0]
    pos_masks = jnp.asarray(np.stack([pm] * len(ps)))
    neg_masks = jnp.asarray(np.stack([nm] * len(ps)))
    rules, n_rules, n_neg_left = scm_fit_batch_device(
        matrix, pos_masks, neg_masks, jnp.asarray(np.array(ps, np.float32)),
        n_kmers, 5,
    )
    rules = np.asarray(rules)
    n_rules = np.asarray(n_rules)
    for i, p in enumerate(ps):
        want = _host_scm_fast(dense, y, p, 5)
        got = [r for r in rules[i] if r >= 0]
        assert got == want
        assert n_rules[i] == len(want)


def test_scm_device_step_full_separation(rng):
    n_genomes, n_kmers = 64, 100
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 42] = y
    packed = pack_binary_bytes_to_ints(dense, 32)
    mesh = make_mesh(8)
    matrix, k = shard_bit_matrix(packed, mesh)

    pos_mask = build_row_mask(np.where(y == 1)[0], n_genomes, 32).astype(np.uint32)
    neg_mask = build_row_mask(np.where(y == 0)[0], n_genomes, 32).astype(np.uint32)
    best, util, pos_mask, neg_mask, n_neg = scm_device_step(
        matrix, pos_mask, neg_mask, 1.0, k
    )
    assert int(best) == 42
    assert int(n_neg) == 0


@pytest.mark.parametrize("block,sweep", [
    (64, "xla"), (None, "xla"), (None, "pallas_interpret"),
])
def test_scm_grid_engine_matches_scan_engine(rng, block, sweep):
    """Iteration-major MXU grid engine == scan-over-fits engine, bit for bit.

    Exercises multi-block column scans (block=64 on 531 columns), column
    padding, disjunction fits, early stopping, per-length risk tracking,
    and the fused Pallas sweep kernel (interpreter mode off-TPU).
    """
    from grm_tpu.parallel.scm_device import build_packed_mask, scm_cv_batch_device
    from grm_tpu.parallel.scm_grid import scm_cv_grid_device

    n_genomes, n_kmers = 70, 531
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    w = packed.shape[0]

    from helpers_scm import make_cv_fits

    fits = make_cv_fits(y, n_genomes, w)

    r_scan, n_scan, k_scan = scm_cv_batch_device(packed, fits, n_kmers, 6)
    r_grid, n_grid, k_grid = scm_cv_grid_device(
        packed, fits, n_kmers, 6, block=block, sweep=sweep
    )
    np.testing.assert_array_equal(r_grid, r_scan)
    np.testing.assert_array_equal(n_grid, n_scan)
    np.testing.assert_allclose(k_grid, k_scan, atol=1e-6)


@pytest.mark.parametrize("block,sweep", [
    (64, "xla"), (None, "xla"), (None, "pallas_interpret"),
])
def test_scm_grid_sharded_matches_scan_engine(rng, block, sweep):
    """Column-sharded grid engine (8-device mesh) == scan engine exactly.

    531 columns over 8 shards exercises uneven padding, cross-shard winner
    selection, and the one-hot psum column broadcast."""
    from grm_tpu.parallel.scm_device import build_packed_mask, scm_cv_batch_device
    from grm_tpu.parallel.scm_grid import scm_cv_grid_sharded

    n_genomes, n_kmers = 70, 531
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    w = packed.shape[0]

    from helpers_scm import make_cv_fits

    fits = make_cv_fits(y, n_genomes, w)

    mesh = make_mesh(8)
    r_scan, n_scan, k_scan = scm_cv_batch_device(packed, fits, n_kmers, 6)
    r_sh, n_sh, k_sh = scm_cv_grid_sharded(
        packed, fits, n_kmers, 6, mesh, block=block, sweep=sweep
    )
    np.testing.assert_array_equal(r_sh, r_scan)
    np.testing.assert_array_equal(n_sh, n_scan)
    np.testing.assert_allclose(k_sh, k_scan, atol=1e-6)


def test_scm_pallas_sweep_ragged_blocks(rng):
    """Multi-block pallas sweep with a ragged last block and with upstream
    column padding (n_kmers < K): index masking must exclude both the
    unspecified out-of-bounds lanes and the zero padding columns."""
    import jax.numpy as jnp

    from grm_tpu.ops.pallas_scm_sweep import scm_utility_argmax_pallas
    from grm_tpu.parallel.scm_device import build_packed_mask

    n_genomes = 70
    for n_kmers, k_cols in [(531, 531), (500, 531), (130, 256)]:
        dense = (rng.rand(n_genomes, k_cols) > 0.6).astype(np.uint8)
        dense[:, n_kmers:] = 0  # upstream padding columns
        packed = pack_binary_bytes_to_ints(dense, 32)
        w = packed.shape[0]
        y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
        pos = np.where(y == 1)[0]
        neg = np.where(y == 0)[0]
        pm = build_packed_mask(pos, n_genomes, w)
        nm = build_packed_mask(neg, n_genomes, w)
        p = 2.0
        bpu, bpi, bau, bai = scm_utility_argmax_pallas(
            jnp.asarray(packed), jnp.asarray(nm[None]),
            jnp.asarray(pm[None]),
            jnp.asarray(np.array([len(neg)], np.float32)),
            jnp.asarray(np.array([len(pos)], np.float32)),
            jnp.asarray(np.array([p], np.float32)),
            n_kmers, interpret=True, block=128,
        )
        cn = dense[neg, :n_kmers].sum(0).astype(np.float32)
        cp = dense[pos, :n_kmers].sum(0).astype(np.float32)
        u_pres = (len(neg) - cn) - np.float32(p) * (len(pos) - cp)
        u_pres[(cn == len(neg)) & (cp == len(pos))] = -np.inf
        u_abs = cn - np.float32(p) * cp
        u_abs[(cn == 0) & (cp == 0)] = -np.inf
        assert int(bpi[0]) == int(np.argmax(u_pres)), (n_kmers, k_cols)
        assert float(bpu[0]) == float(u_pres.max())
        assert int(bai[0]) == int(np.argmax(u_abs)), (n_kmers, k_cols)
        assert float(bau[0]) == float(u_abs.max())


def test_cart_pallas_frontier_ragged_blocks(rng):
    """Frontier kernel over a ragged multi-block grid == per-node XLA."""
    from grm_tpu.learning.rules import KmerRuleClassifications
    from grm_tpu.parallel.cart_device import cart_frontier_splits_device
    from grm_tpu.ops.popcount import BitMatrix

    n, K = 90, 500  # 500 = 3 blocks of 128 + ragged 116
    dense = (rng.rand(n, K) > 0.55).astype(np.uint8)
    y = (rng.rand(n) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    bm = BitMatrix(packed, n)
    priors = {0: 0.5, 1: 0.5}
    totals = {c: int((y == c).sum()) for c in range(2)}
    idx = np.arange(n)
    frontier = [
        {c: idx[(y == c) & (idx < 70)] for c in range(2)},
        {c: idx[(y == c) & (idx >= 20)] for c in range(2)},
    ]
    for criterion in ["gini", "cross-entropy"]:
        want = cart_frontier_splits_device(
            bm, frontier, priors, totals, criterion, sweep="xla"
        )
        got = cart_frontier_splits_device(
            bm, frontier, priors, totals, criterion,
            sweep="pallas_interpret", block=128,
        )
        for (wi, ws), (gi, gs) in zip(want, got):
            assert wi == gi, (criterion, wi, gi)
            assert np.isclose(ws, gs, rtol=1e-5)



@pytest.mark.parametrize("block,sweep", [(64, "xla"), (None, None)])
def test_scm_grid_sharded_blacklist_matches_unsharded(rng, block, sweep):
    """Blacklist (rule exclusion) on the column-sharded grid engine ==
    unsharded grid engine — the mask shards with the columns (VERDICT r2
    item 6)."""
    from grm_tpu.parallel.scm_grid import (scm_cv_grid_device,
                                           scm_cv_grid_sharded)

    n_genomes, n_kmers = 60, 531
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 17] = y  # perfect marker that the blacklist must exclude
    packed = pack_binary_bytes_to_ints(dense, 32)
    w = packed.shape[0]

    from helpers_scm import make_cv_fits

    fits = make_cv_fits(y, n_genomes, w)
    excl = [17, 17 + n_kmers, 200, 400 + n_kmers]

    r_un, n_un, k_un = scm_cv_grid_device(
        packed, fits, n_kmers, 5, excl_rules=excl)
    mesh = make_mesh(8)
    r_sh, n_sh, k_sh = scm_cv_grid_sharded(
        packed, fits, n_kmers, 5, mesh, block=block, sweep=sweep,
        excl_rules=excl)
    np.testing.assert_array_equal(r_sh, r_un)
    np.testing.assert_array_equal(n_sh, n_un)
    np.testing.assert_allclose(k_sh, k_un, atol=1e-6)
    assert not np.isin(r_sh, excl).any()


def test_cart_frontier_sharded_blacklist_matches_unsharded(rng):
    """Paired k-mer blacklist on the sharded CART frontier scorer ==
    unsharded scorer (VERDICT r2 item 6)."""
    from grm_tpu.parallel.cart_device import (cart_frontier_splits_device,
                                              cart_frontier_splits_sharded)

    n_genomes, n_kmers = 50, 531
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 11] = y
    bm = BitMatrix.from_dense(dense)
    excl = np.zeros(n_kmers, bool)
    excl[[11, 123, 400]] = True

    node_sets = [
        {0: np.where(y == 0)[0], 1: np.where(y == 1)[0]},
        {0: np.where(y == 0)[0][:10], 1: np.where(y == 1)[0][:15]},
    ]
    priors = [{0: 0.5, 1: 0.5}] * 2
    totals = [{0: float((y == 0).sum()), 1: float((y == 1).sum())}] * 2

    un = cart_frontier_splits_device(
        bm, node_sets, priors, totals, "gini", excl=excl)
    mesh = make_mesh(8)
    sh = cart_frontier_splits_sharded(
        bm, node_sets, priors, totals, "gini", mesh, excl=excl)
    assert [s[0] for s in sh] == [s[0] for s in un]
    np.testing.assert_allclose([s[1] for s in sh], [s[1] for s in un],
                               rtol=1e-6)
    assert all(s[0] != 11 for s in sh)
