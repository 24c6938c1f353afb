"""Exact-parity device CART split scoring: tuple tables + candidate gathers.

The argmax frontier scorers (:mod:`grm_tpu.parallel.cart_device`,
:mod:`grm_tpu.ops.pallas_cart_sweep`) resolve impurity ties to the lowest
column and compare scores in float32 — fast, but not the reference's
semantics (``learners/cart.py:219-250``: float64 scores, exact-equality
candidate sets, then the max-occurrence tiebreaker of
``experiment_cart.py:82-94``). This module reproduces the reference
selection bit-for-bit while keeping the matrix sweeps on the MXU, using
two regimes keyed on a node's per-class count lattice:

**Tuple regime** (lattice fits ``S_MAX`` = 65536 entries — virtually every
node of a median-scale dataset, and ALL small nodes, where exact impurity
ties span millions of columns): a split's float64 score depends only on
the tuple of per-class left-child counts, so the engine builds, per node,
dense per-tuple tables on device — max train-set occurrence (the
tiebreaker input) and the lowest column achieving it — via scatter-max /
scatter-min over one blocked MXU pass each. The host then replays the
float64 impurity (:func:`grm_tpu.learning.cart.score_candidates_f64` —
the same op sequence as the host engine) over the ≤65536 present tuples:
the minimum tie set, the occurrence tiebreak, and the winning column are
all exact, with **no margin or over-inclusion machinery at all**. A
100k-column tie set costs the same as a unique winner.

**Gather regime** (big nodes, lattice > ``S_MAX``): one pass computes
per-node float32 score minima; a second compacts every column within a
float32-error margin of the minimum (cols, per-class counts, occurrences)
into fixed budgets via cursor scatters. Exact float64 selection is
replayed on the host over the candidate pool (margin over-covers the f32
evaluation error; over-inclusion is harmless). Budgets escalate on
overflow. Big nodes have coarse score lattices, so near-minimum candidate
mass is small — the regimes are complementary.

Equivalent-rule tie sets (consumed only by master trees' split callbacks)
are compacted in a separate gather pass restricted to the winning tuples.

Column-sharded matrices work unchanged: the passes are plain jit
programs, so XLA's auto-partitioning runs them SPMD over the matrix
sharding, and every decision stays on the host from exact integers.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .scm_grid import _unpack_words

__all__ = ["cart_frontier_candidates", "resolve_equiv_specs"]

_F32_EPS = 1.2e-7
S_MAX = 1 << 16


def _scores_f32(counts, n_node, priors, totals, criterion):
    """float32 child-impurity scores for count blocks.

    counts (N, C, B) int32 left-child counts; n_node (N, C) int32;
    priors/totals (N, C) f32. Mirrors the host float64 formula
    (score_candidates_f64) with per-node parameters.
    """
    left = counts.astype(jnp.float32)
    right = (n_node[:, :, None] - counts).astype(jnp.float32)
    scale = (priors / totals)[:, :, None]  # (N, C, 1)

    def child(n_by_class):
        p = scale * n_by_class
        p_t = jnp.sum(p, axis=1)  # (N, B)
        if criterion == "gini":
            num = p_t * p_t - jnp.sum(p * p, axis=1)
            return jnp.where(p_t > 0, num / p_t, 0.0)
        frac = jnp.where(p_t[:, None, :] > 0, p / p_t[:, None, :], 0.0)
        ent = -jnp.sum(jnp.where(frac > 0, frac * jnp.log(frac), 0.0),
                       axis=1)
        return ent * p_t

    score = child(left) + child(right)
    empty = (jnp.sum(counts, axis=1) == 0) | (
        jnp.sum(n_node[:, :, None] - counts, axis=1) == 0)
    return jnp.where(empty, jnp.inf, score)  # (N, B)


def _block_counts(matrix, md, n, c, b, sb):
    """One matrix block's per-node class counts + train occurrences.

    md: (N*(C+1), 32W) int8 dense masks (classes then the train mask).
    Returns (counts (N, C, sb) int32, occ (N, sb) int32, col (sb,) int32).
    """
    w = matrix.shape[0]
    mb = jax.lax.dynamic_slice(matrix, (0, b * sb), (w, sb))
    xb = _unpack_words(mb)  # (32W, sb) int8
    counts = jax.lax.dot_general(
        md, xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(n, c + 1, sb)
    col = b * sb + jnp.arange(sb, dtype=jnp.int32)
    return counts[:, :c], counts[:, c], col


def _mixed_radix_key(class_counts, radix):
    """(N, C, B) counts + (N, C) radix -> (N, B) int32 lattice keys."""
    c = class_counts.shape[1]
    key = class_counts[:, 0]
    for ci in range(1, c):
        key = key * radix[:, ci][:, None] + class_counts[:, ci]
    return key


@jax.jit
def _thresh_from_gmin(gmin, cf):
    """Margin-threshold from per-node f32 minima (device-side; same margin
    as the gather regime — over-covers the f32 evaluation error, so every
    float64-minimum tuple's columns pass the filter together)."""
    margin = (256.0 + 128.0 * cf) * _F32_EPS * (1.0 + jnp.abs(gmin))
    return jnp.where(jnp.isfinite(gmin), gmin + margin, -jnp.inf)


@partial(jax.jit, static_argnames=("sb", "s", "criterion"),
         donate_argnums=(8,))
def _tuple_scatter_chunk(chunk, md, radix, n_node, priors, totals, active,
                         thresh, occtab, col_base, excl_chunk, sb, s,
                         criterion):
    """Margin-filtered tuple-table build: scatter per-tuple max train
    occurrence (+1; 0 = absent) for NEAR-MINIMUM columns only.

    TPU scatter-with-combiner runs at ~90M updates/s (measured), so
    scattering every (node, column) pair — NB x K per sweep — cost
    seconds per chunk. A split's float32 score is a function of its count
    tuple, so every column of a float64-minimum tuple passes the margin
    filter together; scatter volume collapses to the near-minimum mass.
    """
    n, c = radix.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, n, c, sb, col_base, excl_chunk, active)
    rowbase = (jnp.arange(n, dtype=jnp.int32) * s)[:, None]

    def body(tab, b):
        ccounts, occ, col, valid, _mb = at(b)
        score = _scores_f32(ccounts, n_node, priors, totals, criterion)
        hit = valid & (score <= thresh[:, None])
        key = _mixed_radix_key(ccounts, radix)
        flat = (rowbase + key).reshape(-1)
        upd = jnp.where(hit, occ.astype(jnp.uint32) + 1, 0).reshape(-1)
        return tab.at[flat].max(upd, mode="promise_in_bounds"), None

    occtab, _ = jax.lax.scan(body, occtab, jnp.arange(nsb))
    return occtab


@partial(jax.jit, static_argnames=("s",))
def _take_table_rows(occtab, rows, s):
    """Bucketed full-row fetch from the flat per-node table."""
    return occtab.reshape(-1, s)[rows]


_COL_SENT = np.int32(0x7FFFFFFF)


@partial(jax.jit, static_argnames=("sb", "t_budget", "criterion"),
         donate_argnums=(8, 9, 10, 11, 12, 13))
def _distinct_chunk(chunk, md, radix, n_node, priors, totals, active,
                    thresh, keys_tab, occ_tab, cocc_tab, cany_tab,
                    wbits_tab, over, col_base, excl_chunk, sb, t_budget,
                    criterion):
    """Near-minimum DISTINCT tuple keys by pure reduction (no scatter).

    The margin-filtered scatter-table pass cost O(nodes x columns) scatter
    updates at ~90M/s on v5e (7-15 s/level at median scale) even though
    non-hits scattered no-op values — a scatter processes every index
    regardless. But the tuple regime's whole premise is that near-minimum
    mass collapses to FEW distinct tuples (millions of tied columns share
    one count tuple), so the set we actually need — distinct near-min keys
    with their per-key max train occurrence and winning columns — is tiny.
    This pass extracts up to ``t_budget`` of them per node with iterated
    min/max REDUCTIONS (the op class this rig measures fastest) and merges
    across blocks in (N, 2T) registers. Nodes with more distinct near-min
    tuples than the budget set ``over`` and escalate to the scatter-table
    path.

    Per distinct key the pass carries everything the host selection needs,
    so no separate winner pass over the matrix is required afterwards:

    - ``occ_tab``  — max train occurrence over the key's columns;
    - ``cocc_tab`` — min GLOBAL column among columns at that max
      occurrence (the reference's occurrence-tiebreak winner);
    - ``cany_tab`` — min column over ALL the key's columns (the identity
      tiebreak of a bare ``fit()``);
    - ``wbits_tab`` — the PACKED column bits of ``cocc_tab``'s column, so
      the tree's per-level winner-column fetch disappears for
      occurrence-tiebreak nodes.

    keys_tab (N, T) int32 ascending distinct keys (S_MAX pad); occ_tab
    (N, T) int32 (-1 pad); cocc_tab/cany_tab (N, T) int32 (_COL_SENT
    pad); wbits_tab (N, T, W) uint32; over (N,) bool.
    """
    n, c = radix.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, n, c, sb, col_base, excl_chunk, active)
    sent = jnp.int32(S_MAX)  # keys are mixed-radix < S_MAX
    csent = jnp.int32(_COL_SENT)

    def extract(keys, occs, coccs, canys):
        """T smallest distinct keys + per-key (occmax, mincol@occmax,
        mincol). ``coccs`` entries are only valid at their row's occ
        value; ``canys`` always."""
        cur = keys
        out_k, out_o, out_co, out_ca = [], [], [], []
        for _ in range(t_budget):
            m = cur.min(axis=1)
            sel = keys == m[:, None]
            o = jnp.where(sel, occs, -1).max(axis=1)
            co = jnp.where(sel & (occs == o[:, None]), coccs,
                           csent).min(axis=1)
            ca = jnp.where(sel, canys, csent).min(axis=1)
            out_k.append(m)
            out_o.append(o)
            out_co.append(co)
            out_ca.append(ca)
            cur = jnp.where(sel, sent, cur)
        rem = (cur != sent).any(axis=1)
        return (jnp.stack(out_k, 1), jnp.stack(out_o, 1),
                jnp.stack(out_co, 1), jnp.stack(out_ca, 1), rem)

    def route_bits(keys_cat, occs_cat, coccs_cat, wcat, mkeys, moccs,
                   mcocc):
        """Select each merged slot's winner-column bits from whichever
        input slot supplied its (key, occmax, mincol) triple. Column ids
        are globally unique, so at most one input slot matches."""
        out = []
        for t in range(t_budget):
            match = ((keys_cat == mkeys[:, t][:, None])
                     & (occs_cat == moccs[:, t][:, None])
                     & (coccs_cat == mcocc[:, t][:, None]))
            idx = jnp.argmax(match, axis=1)  # (N,)
            out.append(jnp.take_along_axis(
                wcat, idx[:, None, None], axis=1)[:, 0])
        return jnp.stack(out, axis=1)  # (N, T, W)

    def body(carry, b):
        keys_tab, occ_tab, cocc_tab, cany_tab, wbits_tab, over = carry
        ccounts, occ, col, valid, mb = at(b)
        score = _scores_f32(ccounts, n_node, priors, totals, criterion)
        hit = valid & (score <= thresh[:, None])
        key = jnp.where(hit, _mixed_radix_key(ccounts, radix), sent)
        occm = jnp.where(hit, occ, -1)
        colm = jnp.broadcast_to(col[None, :], (n, sb))
        bkeys, boccs, bcocc, bcany, brem = extract(key, occm, colm, colm)
        # Winner-column bits for this block's extracted slots (bcocc is
        # always a column OF THIS BLOCK when it is not the sentinel).
        loc = jnp.clip(bcocc - col[0], 0, sb - 1)  # (N, T) block-local
        bbits = jnp.take_along_axis(
            mb[None, :, :], loc[:, None, :], axis=2
        ).transpose(0, 2, 1)  # (N, T, W)

        keys_cat = jnp.concatenate([keys_tab, bkeys], axis=1)
        occs_cat = jnp.concatenate([occ_tab, boccs], axis=1)
        coccs_cat = jnp.concatenate([cocc_tab, bcocc], axis=1)
        cany_cat = jnp.concatenate([cany_tab, bcany], axis=1)
        wcat = jnp.concatenate([wbits_tab, bbits], axis=1)
        mkeys, moccs, mcocc, mcany, mrem = extract(
            keys_cat, occs_cat, coccs_cat, cany_cat)
        mbits = route_bits(keys_cat, occs_cat, coccs_cat, wcat, mkeys,
                           moccs, mcocc)
        over = over | brem | mrem
        return (mkeys, moccs, mcocc, mcany, mbits, over), None

    carry, _ = jax.lax.scan(
        body, (keys_tab, occ_tab, cocc_tab, cany_tab, wbits_tab, over),
        jnp.arange(nsb))
    return carry


def _tuple_match(key, tset, tmax):
    """(M, B) bool: key matches any of the node's winning tuples.

    Broadcast-compared in 32-wide slabs: an unrolled per-key Python loop
    emits tmax HLOs (tie sets can escalate to thousands of tuples — the
    compile-blowup class this module already hit once), while one full
    (M, B, tmax) broadcast can transiently exceed memory."""
    m, b = key.shape
    match = jnp.zeros((m, b), bool)
    for t0 in range(0, tmax, 32):
        ts = tset[:, t0:t0 + 32]
        match = match | (key[:, :, None] == ts[:, None, :]).any(axis=-1)
    return match


@partial(jax.jit, static_argnames=("sb", "tmax"), donate_argnums=(6, 7))
def _winner_chunk(chunk, md, radix, tset, occmax, active, best, count,
                  col_base, excl_chunk, sb, tmax):
    """Winning column per node by PURE REDUCTION (no scatter, no table
    gather): min global column among columns whose tuple is in the
    winning set with maximal occurrence, plus the match count."""
    m, c = radix.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, m, c, sb, col_base, excl_chunk, active)

    def body(carry, b):
        best, count = carry
        ccounts, occ, col, valid, _mb = at(b)
        key = _mixed_radix_key(ccounts, radix)
        match = _tuple_match(key, tset, tmax)
        occ_ok = (occmax[:, None] < 0) | (occ == occmax[:, None])
        sel = valid & match & occ_ok
        colb = jnp.where(sel, jnp.broadcast_to(
            col[None, :].astype(jnp.uint32), (m, sb)),
            jnp.uint32(0xFFFFFFFF))
        best = jnp.minimum(best, colb.min(axis=1))
        count = count + sel.sum(axis=1).astype(jnp.int32)
        return (best, count), None

    (best, count), _ = jax.lax.scan(body, (best, count), jnp.arange(nsb))
    return best, count


@partial(jax.jit, static_argnames=("sb", "budget", "criterion"))
def _gather_pass(matrix, masks, train_masks, n_node, priors, totals, active,
                 n_kmers, sb, budget, criterion, excl=None):
    """Big-node regime: f32 minima then margin-threshold compaction.

    Returns (cols (N, budget) int32 [-1 pad, ascending], counts
    (N, C, budget) int32, occ (N, budget) int32, total (N,) int32,
    gmin (N,) float32).
    """
    n, c, w = masks.shape
    kp = matrix.shape[1]
    nsb = kp // sb
    md = _unpack_words(
        jnp.concatenate([masks, train_masks[:, None, :]], axis=1)
        .reshape(n * (c + 1), w).T
    ).T

    def scored(b):
        ccounts, occ, col = _block_counts(matrix, md, n, c, b, sb)
        score = _scores_f32(ccounts, n_node, priors, totals, criterion)
        valid = (col < n_kmers)[None, :] & active[:, None]
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (b * sb,), (sb,))
            valid = valid & ~eb[None, :]
        return jnp.where(valid, score, jnp.inf), ccounts, occ, col

    def sweep1(gmin, b):
        score = scored(b)[0]
        return jnp.minimum(gmin, score.min(axis=1)), None

    gmin, _ = jax.lax.scan(
        sweep1, jnp.full((n,), jnp.inf, jnp.float32), jnp.arange(nsb))

    # Margin over-covering the f32 evaluation error of the impurity
    # formula (a few dozen rounded O(1)-magnitude ops per class; inputs
    # are exact int32 counts and f32-rounded priors). Over-inclusion is
    # replayed away exactly on the host.
    margin = (256.0 + 128.0 * c) * _F32_EPS * (1.0 + jnp.abs(gmin))
    thresh = jnp.where(jnp.isfinite(gmin), gmin + margin, -jnp.inf)

    rowidx = jnp.arange(n, dtype=jnp.int32)[:, None]

    def sweep2(carry, b):
        cursor, cols, cnts, occs = carry
        score, ccounts, occ, col = scored(b)
        hit = score <= thresh[:, None]
        pos = cursor[:, None] + jnp.cumsum(hit, axis=1) - 1
        tgt = jnp.where(hit & (pos < budget), pos, budget)  # budget = drop
        cols = cols.at[rowidx, tgt].set(
            jnp.broadcast_to(col[None, :], (n, sb)), mode="drop")
        occs = occs.at[rowidx, tgt].set(occ, mode="drop")
        for ci in range(c):
            cnts = cnts.at[rowidx, ci, tgt].set(ccounts[:, ci], mode="drop")
        cursor = cursor + hit.sum(axis=1).astype(jnp.int32)
        return (cursor, cols, cnts, occs), None

    (total, cols, cnts, occs), _ = jax.lax.scan(
        sweep2,
        (jnp.zeros((n,), jnp.int32),
         jnp.full((n, budget), -1, jnp.int32),
         jnp.full((n, c, budget), -1, jnp.int32),
         jnp.full((n, budget), -1, jnp.int32)),
        jnp.arange(nsb))
    return cols, cnts, occs, total, gmin


# -- streamed (out-of-core) chunk programs ----------------------------------
#
# For matrices past the HBM budget (host-resident StreamingBitMatrix) the
# same sweeps run per H2D column chunk with the accumulator tables carried
# (donated) across chunk calls — identical math, identical selection; the
# reference's out-of-core contract (rules.py:243-262) kept exact on the
# accelerator. Chunks share one compiled program each (fixed chunk width,
# global pads ride in the excl slice, global column ids via col_base).


@jax.jit
def _dense_masks(masks, train_masks):
    n, c, w = masks.shape
    return _unpack_words(
        jnp.concatenate([masks, train_masks[:, None, :]], axis=1)
        .reshape(n * (c + 1), w).T
    ).T  # (N(C+1), 32W) int8


def _chunk_blocks(chunk, md, n, c, sb, col_base, excl_chunk, active):
    """Iterator body shared by the streamed sweeps: per in-chunk block,
    (class counts, occ, GLOBAL col, valid, packed block)."""
    def at(b):
        ccounts, occ, col = _block_counts(chunk, md, n, c, b, sb)
        valid = active[:, None] & ~jax.lax.dynamic_slice(
            excl_chunk, (b * sb,), (sb,))[None, :]
        mb = jax.lax.dynamic_slice(
            chunk, (0, b * sb), (chunk.shape[0], sb))
        return ccounts, occ, col + col_base, valid, mb
    return at


@partial(jax.jit, static_argnames=("sb", "criterion"), donate_argnums=(6,))
def _gather1_chunk(chunk, md, n_node, priors, totals, active, gmin,
                   excl_chunk, sb, criterion):
    n, c = n_node.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, n, c, sb, jnp.int32(0), excl_chunk, active)

    def sweep(g, b):
        ccounts, _, _, valid, _mb = at(b)
        score = _scores_f32(ccounts, n_node, priors, totals, criterion)
        score = jnp.where(valid, score, jnp.inf)
        return jnp.minimum(g, score.min(axis=1)), None

    gmin, _ = jax.lax.scan(sweep, gmin, jnp.arange(nsb))
    return gmin


@partial(jax.jit, static_argnames=("sb", "budget", "criterion"),
         donate_argnums=(7, 8, 9, 10))
def _gather2_chunk(chunk, md, n_node, priors, totals, active, thresh,
                   cursor, cols, cnts, occs, col_base, excl_chunk, sb,
                   budget, criterion):
    n, c = n_node.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, n, c, sb, col_base, excl_chunk, active)
    rowidx = jnp.arange(n, dtype=jnp.int32)[:, None]

    def sweep(carry, b):
        cursor, cols, cnts, occs = carry
        ccounts, occ, col, valid, _mb = at(b)
        score = _scores_f32(ccounts, n_node, priors, totals, criterion)
        score = jnp.where(valid, score, jnp.inf)
        hit = score <= thresh[:, None]
        pos = cursor[:, None] + jnp.cumsum(hit, axis=1) - 1
        tgt = jnp.where(hit & (pos < budget), pos, budget)
        sbw = col.shape[0]
        cols = cols.at[rowidx, tgt].set(
            jnp.broadcast_to(col[None, :], (n, sbw)), mode="drop")
        occs = occs.at[rowidx, tgt].set(occ, mode="drop")
        for ci in range(c):
            cnts = cnts.at[rowidx, ci, tgt].set(ccounts[:, ci], mode="drop")
        cursor = cursor + hit.sum(axis=1).astype(jnp.int32)
        return (cursor, cols, cnts, occs), None

    carry, _ = jax.lax.scan(sweep, (cursor, cols, cnts, occs),
                            jnp.arange(nsb))
    return carry


@partial(jax.jit, static_argnames=("sb", "budget", "tmax"),
         donate_argnums=(6, 7))
def _equiv_chunk(chunk, md, radix, tset, occmax, active, cursor, cols,
                 col_base, excl_chunk, sb, budget, tmax):
    m, c = radix.shape
    nsb = chunk.shape[1] // sb
    at = _chunk_blocks(chunk, md, m, c, sb, col_base, excl_chunk, active)
    rowidx = jnp.arange(m, dtype=jnp.int32)[:, None]

    def sweep(carry, b):
        cursor, cols = carry
        ccounts, occ, col, valid, _mb = at(b)
        key = _mixed_radix_key(ccounts, radix)
        match = _tuple_match(key, tset, tmax)
        occ_ok = (occmax[:, None] < 0) | (occ == occmax[:, None])
        sel = valid & match & occ_ok
        pos = cursor[:, None] + jnp.cumsum(sel, axis=1) - 1
        tgt = jnp.where(sel & (pos < budget), pos, budget)
        sbw = col.shape[0]
        cols = cols.at[rowidx, tgt].set(
            jnp.broadcast_to(col[None, :], (m, sbw)), mode="drop")
        cursor = cursor + sel.sum(axis=1).astype(jnp.int32)
        return (cursor, cols), None

    carry, _ = jax.lax.scan(sweep, (cursor, cols), jnp.arange(nsb))
    return carry


class _HostStream:
    """Chunked H2D access to a host-resident matrix (+ its excl map).

    The matrix is NEVER copied whole (it is >HBM by definition): full
    chunks upload as views, the ragged tail materializes into one
    chunk-sized zero-padded buffer per pass (pad columns ride as
    excluded). Cached on the bit matrix so per-level calls reuse it.
    """

    def __init__(self, host_matrix, n_kmers, excl, chunk_cols=None):
        import os as _os

        if chunk_cols is None:
            chunk_cols = int(_os.environ.get(
                "GRM_STREAM_CHUNK_COLS", 1 << 21))
        sb = min(8192, max(256, chunk_cols))
        chunk_cols = max(sb, (chunk_cols // sb) * sb)
        self.sb = sb
        self.host = host_matrix
        self.chunk_cols = chunk_cols
        kp = host_matrix.shape[1]
        self.padded_cols = kp + ((-kp) % chunk_cols)
        excl_full = np.ones(self.padded_cols, bool)
        excl_full[:n_kmers] = False
        if excl is not None:
            lim = min(len(excl), n_kmers)
            excl_full[:lim] |= np.asarray(excl[:lim], bool)
        self.excl = excl_full

    def chunks(self):
        ch = self.chunk_cols
        kp = self.host.shape[1]
        for ci in range(self.padded_cols // ch):
            lo = ci * ch
            if lo + ch <= kp:
                block = self.host[:, lo:lo + ch]
            else:
                block = np.zeros((self.host.shape[0], ch), np.uint32)
                block[:, : kp - lo] = self.host[:, lo:]
            yield (jnp.asarray(block),
                   jnp.asarray(self.excl[lo:lo + ch]),
                   jnp.int32(lo))


class _DeviceStream:
    """Chunked access to a DEVICE-resident matrix.

    Monolithic whole-matrix programs embed an ``nsb``-iteration scatter
    scan; past a few hundred blocks their XLA compiles blow up (measured:
    a 1280-block tuple-table program wedged a remote compile service for
    40+ minutes, vs minutes at 244 blocks). Big resident matrices
    therefore run the SAME per-chunk programs as the out-of-core stream,
    with chunks sliced on device — each chunk program is one short scan,
    compiled once.
    """

    def __init__(self, matrix_dev, n_kmers, excl, chunk_cols=None):
        import os as _os

        if chunk_cols is None:
            chunk_cols = int(_os.environ.get(
                "GRM_STREAM_CHUNK_COLS", 1 << 21))
        sb = min(8192, max(256, chunk_cols))
        chunk_cols = max(sb, (chunk_cols // sb) * sb)
        self.sb = sb
        self.matrix = matrix_dev
        self.chunk_cols = chunk_cols
        kp = matrix_dev.shape[1]
        self.padded_cols = kp + ((-kp) % chunk_cols)
        excl_full = np.ones(self.padded_cols, bool)
        excl_full[:n_kmers] = False
        if excl is not None:
            lim = min(len(excl), n_kmers)
            excl_full[:lim] |= np.asarray(excl[:lim], bool)
        self.excl = excl_full
        self._slice = jax.jit(
            lambda m, lo: jax.lax.dynamic_slice(
                m, (0, lo), (m.shape[0], chunk_cols)))
        self._tail = None

    def chunks(self):
        ch = self.chunk_cols
        kp = self.matrix.shape[1]
        for ci in range(self.padded_cols // ch):
            lo = ci * ch
            if lo + ch <= kp:
                chunk = self._slice(self.matrix, lo)
            else:
                if self._tail is None:
                    pad = lo + ch - kp
                    self._tail = jax.jit(
                        partial(jnp.pad, pad_width=((0, 0), (0, pad)))
                    )(self.matrix[:, lo:])
                chunk = self._tail
            yield (chunk, jnp.asarray(self.excl[lo:lo + ch]),
                   jnp.int32(lo))


def _cached_device_stream(bit_matrix, matrix, n_kmers, excl):
    """Per-(matrix, blacklist) cached device-slicing stream."""
    excl_key = None if excl is None else np.asarray(excl, bool).tobytes()
    cache = getattr(bit_matrix, "_dev_stream_cache", None)
    if cache is None:
        cache = bit_matrix._dev_stream_cache = {}
    stream = cache.get(excl_key)
    if stream is None:
        stream = cache[excl_key] = _DeviceStream(matrix, n_kmers, excl)
    return stream


def _bucket(x, lo=8):
    b = lo
    while b < x:
        b *= 2
    return b


def _pad_rows(arr, bucket):
    pad = bucket - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:],
                                         arr.dtype)], axis=0)


def _place_matrix(bit_matrix, mesh, sb):
    """Device placement (+ column-shard cache on meshes) and sb padding."""
    matrix = bit_matrix.data
    if mesh is not None and mesh.shape.get("cols", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        cache = getattr(bit_matrix, "_exact_shard_cache", None)
        if cache is None:
            cache = bit_matrix._exact_shard_cache = {}
        sharded = cache.get(mesh)
        if sharded is None:
            sharding = NamedSharding(mesh, P(None, "cols"))
            n_shards = mesh.shape["cols"]
            col_pad = (-matrix.shape[1]) % n_shards
            if not isinstance(matrix, jax.Array):
                mm = np.asarray(matrix)
                if col_pad:
                    mm = np.pad(mm, ((0, 0), (0, col_pad)))
                sharded = jax.device_put(mm, sharding)
            else:
                sharded = jax.jit(
                    lambda m: jnp.pad(m, ((0, 0), (0, col_pad))),
                    out_shardings=sharding,
                )(matrix)
            cache[mesh] = sharded
        matrix = sharded
    kp = matrix.shape[1]
    sb = min(sb, max(256, kp))
    pad = (-kp) % sb
    if pad:
        matrix = jax.jit(lambda m: jnp.pad(m, ((0, 0), (0, pad))))(matrix)
    return matrix, sb


def cart_frontier_candidates(bit_matrix, node_example_sets, altered_priors,
                             total_n_examples_by_class, criterion,
                             train_example_idx, excl=None, mesh=None,
                             sb=8192, tuple_budget=4096, gather_budget=4096,
                             need_equiv=None, occ_tiebreak=None,
                             defer_equiv=None):
    """Exact-selection data for a BFS frontier.

    ``node_example_sets``: per-node {class: example idx} dicts.
    ``altered_priors`` / ``total_n_examples_by_class``: one dict or a
    per-node list (forest batching mixes trees with different priors).
    ``train_example_idx``: per-node training-set index arrays (the
    occurrence-tiebreaker population). ``need_equiv``: per-node bools —
    False skips the equivalent-rule gather (fold trees).
    ``defer_equiv``: per-node bools — True returns the winning-tuple spec
    (``equiv_spec``) instead of compacting the equivalence set now; only
    the finally-selected master's sets are ever consumed, so the HP
    search defers them and resolves once at the end via
    :func:`resolve_equiv_specs`.

    Returns a list per node: ``None`` when no valid split exists (exactly
    when the host's float64 minimum is +inf), else one of

    - ``{"winner": col, "equiv": ndarray | None}`` — tuple regime; the
      float64 selection already replayed (bit-identical to the host);
      with deferral the dict carries ``equiv_spec`` = (winning tuple
      keys, occmax) instead of ``equiv``;
    - ``{"cols", "left", "occ"}`` — gather regime; candidates provably
      cover the float64 minimum tie set, selection replays in the tree.
    """
    from .cart_device import _frontier_masks, _per_node_dicts
    from .scm_device import build_packed_mask

    crit = "gini" if criterion == "gini" else "cross-entropy"
    masks, n_node, priors, totals = _frontier_masks(
        bit_matrix, node_example_sets, altered_priors,
        total_n_examples_by_class,
    )
    n, c, w = masks.shape
    priors_l = _per_node_dicts(altered_priors, n)
    totals_l = _per_node_dicts(total_n_examples_by_class, n)
    classes = sorted(totals_l[0]) if n else []
    if need_equiv is None:
        need_equiv = [True] * n
    if occ_tiebreak is None:
        occ_tiebreak = [True] * n
    if defer_equiv is None:
        defer_equiv = [False] * n
    train_masks = np.stack([
        build_packed_mask(idx, bit_matrix.n_rows, w)
        for idx in train_example_idx
    ]) if n else np.zeros((0, w), np.uint32)

    n_kmers = bit_matrix.n_columns
    stream = None
    excl_dev = None
    if hasattr(bit_matrix, "data"):
        import os as _os

        matrix, sb = _place_matrix(bit_matrix, mesh, sb)
        monolith_max = int(_os.environ.get(
            "GRM_MONOLITH_MAX_COLS", 3 << 20))
        if ((mesh is None or mesh.shape.get("cols", 1) == 1)
                and matrix.shape[1] > monolith_max):
            # Big resident matrix: per-chunk programs (device-sliced) —
            # the whole-matrix programs' block scans stop compiling
            # tractably past a few hundred superblocks.
            stream = _cached_device_stream(bit_matrix, matrix, n_kmers,
                                           excl)
            matrix = None
            sb = stream.sb
        elif excl is not None:
            excl_np = np.zeros(matrix.shape[1], bool)
            excl_np[: len(excl)] = np.asarray(excl, bool)
            excl_dev = jnp.asarray(excl_np)
    else:
        # Host-resident (>HBM) matrix: stream column chunks through the
        # same sweeps — identical selection, out-of-core. Cached on the
        # matrix (keyed by blacklist) so per-level calls reuse it.
        excl_key = None if excl is None else np.asarray(excl, bool).tobytes()
        cache = getattr(bit_matrix, "_host_stream_cache", None)
        if cache is None:
            cache = bit_matrix._host_stream_cache = {}
        stream = cache.get(excl_key)
        if stream is None:
            stream = cache[excl_key] = _HostStream(
                bit_matrix.host, n_kmers, excl)
        matrix = None
        sb = stream.sb

    # Regime split on the count-lattice size.
    n_node64 = n_node.astype(np.int64)
    lattice = np.prod(n_node64 + 1, axis=1) if n else np.zeros(0, np.int64)
    is_tuple = lattice <= S_MAX
    out = [None] * n

    t_idx = np.where(is_tuple)[0]
    g_idx = np.where(~is_tuple)[0]

    if len(t_idx):
        # The tuple regime always runs through per-chunk programs; a
        # resident matrix gets a device-slicing stream (one short scan
        # per program — whole-matrix scatter scans stopped compiling
        # tractably past a few hundred superblocks).
        t_stream = stream
        if t_stream is None:
            t_stream = _cached_device_stream(bit_matrix, matrix, n_kmers,
                                             excl)
        _run_tuple_regime(
            out, t_idx, matrix, masks, train_masks, n_node, n_kmers,
            t_stream.sb, tuple_budget, crit, classes, priors_l, totals_l,
            need_equiv, excl_dev, t_stream, priors, totals, occ_tiebreak,
            defer_equiv)
    if len(g_idx):
        _run_gather_regime(
            out, g_idx, matrix, masks, train_masks, n_node, priors, totals,
            n_kmers, sb, gather_budget, crit, classes, excl_dev, stream)

    return out


def _run_tuple_regime(out, t_idx, matrix, masks, train_masks, n_node,
                      n_kmers, sb, budget, crit, classes, priors_l,
                      totals_l, need_equiv, excl_dev, stream,
                      priors, totals, occ_tiebreak, defer_equiv):
    c = masks.shape[1]
    nb = _bucket(len(t_idx))
    masks_t = _pad_rows(masks[t_idx], nb)
    train_t = _pad_rows(train_masks[t_idx], nb)
    radix_np = (n_node[t_idx] + 1).astype(np.int32)
    radix_t = _pad_rows(radix_np, nb)
    radix_t[len(t_idx):] = 1
    n_node_t = _pad_rows(n_node[t_idx], nb)
    priors_t = _pad_rows(priors[t_idx], nb)
    totals_t = _pad_rows(totals[t_idx], nb)
    totals_t[totals_t == 0] = 1.0  # padded rows: no NaN into the minima
    active = np.zeros(nb, bool)
    active[: len(t_idx)] = True

    import os as _os
    import time as _time
    dbg = _os.environ.get("GRM_EXACT_DEBUG")
    t0 = _time.perf_counter()

    def _mark(label):
        nonlocal t0
        if dbg:
            now = _time.perf_counter()
            print("[cart_exact] %-14s %6.2fs (n=%d)"
                  % (label, now - t0, len(t_idx)), flush=True)
            t0 = now

    md = _dense_masks(jnp.asarray(masks_t), jnp.asarray(train_t))
    radix_d = jnp.asarray(radix_t)
    active_d = jnp.asarray(active)
    n_node_d = jnp.asarray(n_node_t)
    priors_d = jnp.asarray(priors_t)
    totals_d = jnp.asarray(totals_t)

    sync = dbg == "2"

    # Pass 1: per-node float32 minima (pure reduction — no scatter).
    gmin = jnp.full((nb,), jnp.inf, jnp.float32)
    for chunk, exc, base in stream.chunks():
        gmin = _gather1_chunk(chunk, md, n_node_d, priors_d, totals_d,
                              active_d, gmin, exc, sb, crit)
    if sync:
        jax.device_get(gmin[:1])
        _mark("pass1_sync")
    thresh = _thresh_from_gmin(gmin, jnp.float32(c))

    # Pass 2: near-minimum DISTINCT tuple extraction — pure reductions
    # (the old margin-filtered scatter table cost O(nodes x columns)
    # scatter updates, 7-15 s/level; this is reduction-only like pass 1).
    t_budget = max(1, min(budget, int(_os.environ.get(
        "GRM_TUPLE_DISTINCT_BUDGET", 16))))
    w_words = masks_t.shape[2]
    keys_tab = jnp.full((nb, t_budget), S_MAX, jnp.int32)
    occ_tab = jnp.full((nb, t_budget), -1, jnp.int32)
    cocc_tab = jnp.full((nb, t_budget), _COL_SENT, jnp.int32)
    cany_tab = jnp.full((nb, t_budget), _COL_SENT, jnp.int32)
    wbits_tab = jnp.zeros((nb, t_budget, w_words), jnp.uint32)
    over_d = jnp.zeros((nb,), bool)
    for chunk, exc, base in stream.chunks():
        (keys_tab, occ_tab, cocc_tab, cany_tab, wbits_tab,
         over_d) = _distinct_chunk(
            chunk, md, radix_d, n_node_d, priors_d, totals_d, active_d,
            thresh, keys_tab, occ_tab, cocc_tab, cany_tab, wbits_tab,
            over_d, base, exc, sb, t_budget, crit)
    if sync:
        jax.device_get(over_d[:1])
        _mark("pass2_sync")
    keys, occs, coccs, canys, wbits, over_np = jax.device_get(
        (keys_tab, occ_tab, cocc_tab, cany_tab, wbits_tab, over_d))
    _mark("extract_fetch")

    # Escalation: nodes with more distinct near-min tuples than the
    # budget run the scatter-table path on their own (small) bucket.
    full_rows = {}
    over = [i for i in range(len(t_idx)) if over_np[i]]
    if over:
        ob = _bucket(len(over), lo=4)
        sel = np.zeros(ob, np.int64)
        sel[: len(over)] = over
        o_act = np.zeros(ob, bool)
        o_act[: len(over)] = True
        o_md = _dense_masks(jnp.asarray(masks_t[sel]),
                            jnp.asarray(train_t[sel]))
        o_radix = jnp.asarray(radix_t[sel])
        o_nn = jnp.asarray(n_node_t[sel])
        o_pr = jnp.asarray(priors_t[sel])
        o_to = jnp.asarray(totals_t[sel])
        o_thresh = thresh[jnp.asarray(sel)]
        occtab = jnp.zeros((ob * S_MAX,), jnp.uint32)
        for chunk, exc, base in stream.chunks():
            occtab = _tuple_scatter_chunk(
                chunk, o_md, o_radix, o_nn, o_pr, o_to,
                jnp.asarray(o_act), o_thresh, occtab, base, exc, sb,
                S_MAX, crit)
        occ_rows = jax.device_get(_take_table_rows(
            occtab, jnp.arange(ob, dtype=np.int32), S_MAX))
        for j, i in enumerate(over):
            full_rows[i] = occ_rows[j]
    _mark("escalation(%d)" % len(over))

    # Host float64 replay over the near-minimum tuples. Every
    # float64-minimum tuple is within the float32 margin, so the minimum
    # over this subset is the global minimum (and all of its columns hit
    # the filter together — occ maxima are over the full tuple).
    from ..learning.cart import score_candidates_f64

    winner_jobs = []  # escalated: (slot i, node ni, T keys, occmax, equiv?)
    equiv_jobs = []   # tuple-path masters: (slot i, node ni, keys, occmax)
    esc_specs = {}    # escalated masters with deferral: ni -> spec
    for i, ni in enumerate(t_idx):
        esc = i in full_rows
        tcocc = tcany = None
        if esc:
            occ_row = full_rows[i]
            pres = occ_row > 0
            tkeys = np.where(pres)[0].astype(np.int64)
            toccs = occ_row[pres].astype(np.int64) - 1
        else:
            pres = keys[i] < S_MAX
            tkeys = keys[i][pres].astype(np.int64)
            toccs = occs[i][pres].astype(np.int64)
            tcocc = coccs[i][pres].astype(np.int64)
            tcany = canys[i][pres].astype(np.int64)
        if len(tkeys) == 0:
            continue
        # Mixed-radix decode (inverse of _mixed_radix_key).
        radix = radix_np[i].astype(np.int64)
        rem = tkeys.copy()
        lefts = [None] * c
        for ci in range(c - 1, 0, -1):
            lefts[ci] = rem % radix[ci]
            rem //= radix[ci]
        lefts[0] = rem
        node_counts = {cl: int(n_node[ni, cj])
                       for cj, cl in enumerate(classes)}
        left_int = {cl: lefts[cj] for cj, cl in enumerate(classes)}
        vals = score_candidates_f64(
            crit, priors_l[ni], totals_l[ni], node_counts, left_int)
        vmin = np.min(vals)
        if vmin == np.inf:
            continue
        tie = vals == vmin
        if occ_tiebreak[ni]:
            # Reference tiebreak: np.isclose(occ, occ.max()) — exact
            # equality for integer occurrences up to ~1e5 (n_genomes <=
            # 5022).
            occmax = int(toccs[tie].max())
            winset = tie & (toccs == occmax)
        else:
            # Identity tiebreak (fit() default): first candidate wins —
            # the minimum column over ALL minimum-score tuples; sentinel
            # -1 disables the occurrence condition in the match programs.
            occmax = -1
            winset = tie
        if esc:
            # Scatter-table rows carry no column info; winner + equiv
            # resolve in a dedicated reduction pass.
            winner_jobs.append((i, ni, tkeys[winset], occmax,
                                bool(need_equiv[ni])
                                and not defer_equiv[ni]))
            if need_equiv[ni] and defer_equiv[ni]:
                esc_specs[ni] = (tkeys[winset].copy(), occmax)
            continue
        # The extraction pass already carried each key's winning column,
        # so the winner is pure host math — no device pass:
        # min col at max occurrence over the winning tuples (reference
        # experiment_cart.py:82-94 then best_rules_idx[0]).
        if occ_tiebreak[ni]:
            slots = np.where(pres)[0][winset]
            best_j = int(np.argmin(tcocc[winset]))
            wincol = int(tcocc[winset][best_j])
            out[ni] = {"winner": wincol, "equiv": None,
                       # packed winner-column bits: the tree skips its
                       # per-level column fetch for this node
                       "winner_bits": wbits[i, slots[best_j]].copy()}
        else:
            wincol = int(tcany[winset].min())
            out[ni] = {"winner": wincol, "equiv": None}
        if need_equiv[ni]:
            if defer_equiv[ni]:
                out[ni]["equiv_spec"] = (tkeys[winset].copy(), occmax)
            else:
                equiv_jobs.append((i, ni, tkeys[winset], occmax))
    _mark("host_replay")

    # Escalated nodes: winner by min-reduction match (+ equiv for their
    # masters) in a dedicated pass. Tuple-path masters only compact their
    # equivalence sets — fold trees need no device pass at all here.
    if winner_jobs:
        _resolve_winners(out, winner_jobs, masks_t, train_t, radix_t,
                         sb, stream)
        for ni, spec in esc_specs.items():
            if out[ni] is not None:
                out[ni]["equiv_spec"] = spec
        _mark("winners(%d)" % len(winner_jobs))
    if equiv_jobs:
        _resolve_equiv(out, equiv_jobs, masks_t, train_t, radix_t, sb,
                       stream)
        _mark("equiv(%d)" % len(equiv_jobs))


def _resolve_winners(out, winner_jobs, masks_t, train_t, radix_t, sb,
                     stream):
    """Escalated-node winners by min-reduction match.

    ``winner_jobs``: (slot, node, winning tuple keys, occmax, keep_equiv).
    The winner is the minimum global column among columns whose tuple is
    in the winning set with maximal occurrence — computed as a min
    reduction (scatter-free; per-element scatters cost ~90M updates/s on
    v5e and dominated earlier designs). Only nodes escalated to the
    scatter-table path reach here (the extraction pass carries winning
    columns for everyone else); their masters' equivalence sets follow
    via :func:`_resolve_equiv`.
    """
    tmax = _bucket(max(len(j[2]) for j in winner_jobs), lo=4)
    mb = _bucket(len(winner_jobs), lo=4)
    sel_rows = np.zeros(mb, np.int64)
    tset = np.full((mb, tmax), -1, np.int32)
    occmax_v = np.zeros(mb, np.int32)
    active = np.zeros(mb, bool)
    for j, (i, ni, tk, om, _) in enumerate(winner_jobs):
        sel_rows[j] = i
        tset[j, : len(tk)] = tk
        occmax_v[j] = om
        active[j] = True
    md = _dense_masks(jnp.asarray(masks_t[sel_rows]),
                      jnp.asarray(train_t[sel_rows]))
    radix_d = jnp.asarray(radix_t[sel_rows])
    tset_d = jnp.asarray(tset)
    occmax_d = jnp.asarray(occmax_v)
    active_d = jnp.asarray(active)

    best = jnp.full((mb,), 0xFFFFFFFF, jnp.uint32)
    count = jnp.zeros((mb,), jnp.int32)
    for chunk, exc, base in stream.chunks():
        best, count = _winner_chunk(
            chunk, md, radix_d, tset_d, occmax_d, active_d, best, count,
            base, exc, sb, tmax)
    best_np, count_np = jax.device_get((best, count))

    for j, (i, ni, tk, om, keep_equiv) in enumerate(winner_jobs):
        if count_np[j] == 0:
            # Cannot happen (a winning tuple has >= 1 column); never hand
            # the tree a broken payload.
            continue
        out[ni] = {"winner": int(best_np[j]), "equiv": None}

    ejobs = [(i, ni, tk, om) for (i, ni, tk, om, keep) in winner_jobs
             if keep]
    if ejobs:
        _resolve_equiv(out, ejobs, masks_t, train_t, radix_t, sb, stream)


def _resolve_equiv(out, equiv_jobs, masks_t, train_t, radix_t, sb, stream):
    """Equivalence-set compaction for master trees.

    ``equiv_jobs``: (slot, node, winning tuple keys, occmax). Compacts the
    full ascending list of columns matching the winning tuples at max
    occurrence (the reference's equivalent-rule set), escalating the
    budget x8 on overflow. Fold trees never reach here.
    """
    budget = 4096
    etmax = _bucket(max(len(tk) for _, _, tk, _ in equiv_jobs), lo=4)
    eb = _bucket(len(equiv_jobs), lo=4)
    e_rows = np.zeros(eb, np.int64)
    e_tset = np.full((eb, etmax), -1, np.int32)
    e_occ = np.zeros(eb, np.int32)
    e_act = np.zeros(eb, bool)
    for k, (i, ni, tk, om) in enumerate(equiv_jobs):
        e_rows[k] = i
        e_tset[k, : len(tk)] = tk
        e_occ[k] = om
        e_act[k] = True
    e_md = _dense_masks(jnp.asarray(masks_t[e_rows]),
                        jnp.asarray(train_t[e_rows]))
    e_radix = jnp.asarray(radix_t[e_rows])
    e_tset_d = jnp.asarray(e_tset)
    e_occ_d = jnp.asarray(e_occ)

    def run_equiv(bud, act):
        cursor = jnp.zeros((eb,), jnp.int32)
        cols_c = jnp.full((eb, bud), -1, jnp.int32)
        for chunk, exc, base in stream.chunks():
            cursor, cols_c = _equiv_chunk(
                chunk, e_md, e_radix, e_tset_d, e_occ_d,
                jnp.asarray(act), cursor, cols_c, base, exc, sb,
                bud, etmax)
        return cols_c, cursor

    e_cols_d, e_total_d = run_equiv(budget, e_act)
    e_cols, e_total = jax.device_get((e_cols_d, e_total_d))

    pending = []
    for k, (i, ni, tk, om) in enumerate(equiv_jobs):
        if e_total[k] > budget:
            pending.append(k)
            continue
        cc = e_cols[k]
        if out[ni] is not None:
            out[ni]["equiv"] = cc[cc >= 0].astype(np.int64)
    while pending:
        budget *= 8
        for k in range(eb):
            e_act[k] = k in pending
        e_cols_d, e_total_d = run_equiv(budget, e_act)
        e_cols, e_total = jax.device_get((e_cols_d, e_total_d))
        still = []
        for k in pending:
            i, ni, tk, om = equiv_jobs[k]
            if e_total[k] > budget:
                still.append(k)
                continue
            cc = e_cols[k]
            if out[ni] is not None:
                out[ni]["equiv"] = cc[cc >= 0].astype(np.int64)
        pending = still


def _run_gather_regime(out, g_idx, matrix, masks, train_masks, n_node,
                       priors, totals, n_kmers, sb, budget, crit, classes,
                       excl_dev, stream=None):
    c = masks.shape[1]
    pending = np.asarray(g_idx)
    while len(pending):
        nb = _bucket(len(pending))
        masks_g = _pad_rows(masks[pending], nb)
        train_g = _pad_rows(train_masks[pending], nb)
        n_node_g = _pad_rows(n_node[pending], nb)
        priors_g = _pad_rows(priors[pending], nb)
        totals_g = _pad_rows(totals[pending], nb)
        totals_g[totals_g == 0] = 1.0  # padded/zero-total rows: no NaN
        active = np.zeros(nb, bool)
        active[: len(pending)] = True

        if stream is None:
            cols_d, cnts_d, occs_d, total_d, gmin_d = _gather_pass(
                matrix, jnp.asarray(masks_g), jnp.asarray(train_g),
                jnp.asarray(n_node_g), jnp.asarray(priors_g),
                jnp.asarray(totals_g), jnp.asarray(active), n_kmers, sb,
                budget, crit, excl=excl_dev)
        else:
            md = _dense_masks(jnp.asarray(masks_g), jnp.asarray(train_g))
            n_node_d = jnp.asarray(n_node_g)
            priors_d = jnp.asarray(priors_g)
            totals_d = jnp.asarray(totals_g)
            active_d = jnp.asarray(active)
            gmin_d = jnp.full((nb,), jnp.inf, jnp.float32)
            for chunk, exc, base in stream.chunks():
                gmin_d = _gather1_chunk(chunk, md, n_node_d, priors_d,
                                        totals_d, active_d, gmin_d, exc,
                                        sb, crit)
            gmin_np = np.asarray(gmin_d, np.float64)
            margin = (256.0 + 128.0 * c) * _F32_EPS * (1.0 + np.abs(gmin_np))
            thresh = np.where(np.isfinite(gmin_np), gmin_np + margin,
                              -np.inf).astype(np.float32)
            thresh_d = jnp.asarray(thresh)
            cursor = jnp.zeros((nb,), jnp.int32)
            cols_c = jnp.full((nb, budget), -1, jnp.int32)
            cnts_c = jnp.full((nb, c, budget), -1, jnp.int32)
            occs_c = jnp.full((nb, budget), -1, jnp.int32)
            for chunk, exc, base in stream.chunks():
                cursor, cols_c, cnts_c, occs_c = _gather2_chunk(
                    chunk, md, n_node_d, priors_d, totals_d, active_d,
                    thresh_d, cursor, cols_c, cnts_c, occs_c, base, exc,
                    sb, budget, crit)
            cols_d, cnts_d, occs_d, total_d = cols_c, cnts_c, occs_c, cursor
        cols, cnts, occs, total, gmin = jax.device_get(
            (cols_d, cnts_d, occs_d, total_d, gmin_d))

        overflow = []
        for i, ni in enumerate(pending):
            if not np.isfinite(gmin[i]):
                continue
            if total[i] > budget:
                overflow.append(ni)
                continue
            cc = cols[i]
            valid = cc >= 0
            if not valid.any():
                continue
            out[ni] = {
                "cols": cc[valid].astype(np.int64),
                "left": {cl: cnts[i, cj][valid].astype(np.int64)
                         for cj, cl in enumerate(classes)},
                "occ": occs[i][valid].astype(np.int64),
            }
        pending = np.asarray(overflow, dtype=np.int64)
        budget *= 8


def resolve_equiv_specs(bit_matrix, node_example_sets, train_example_idx,
                        specs, excl=None, mesh=None, sb=8192):
    """Resolve deferred equivalence specs for the finally-selected master.

    The HP search grows dozens of master trees but only the winning one's
    equivalence sets are ever consumed (experiment_cart.py:636-638), so
    with ``defer_equiv`` the per-level compaction passes are skipped and
    this single batched pass runs once at the end.

    ``node_example_sets``: per-node {class: idx}; ``train_example_idx``:
    per-node training-set index arrays; ``specs``: per-node (winning
    tuple keys, occmax) as returned in ``equiv_spec`` payloads.
    Returns a list of ascending int64 rule-column arrays.
    """
    from .cart_device import _frontier_masks
    from .scm_device import build_packed_mask

    n = len(node_example_sets)
    if n == 0:
        return []
    classes = sorted(node_example_sets[0])
    dummy = {cl: 1.0 for cl in classes}
    masks, n_node, _, _ = _frontier_masks(
        bit_matrix, node_example_sets, dummy, dummy)
    w = masks.shape[2]
    train_masks = np.stack([
        build_packed_mask(idx, bit_matrix.n_rows, w)
        for idx in train_example_idx
    ])
    n_kmers = bit_matrix.n_columns

    if hasattr(bit_matrix, "data"):
        matrix, sb = _place_matrix(bit_matrix, mesh, sb)
        stream = _cached_device_stream(bit_matrix, matrix, n_kmers, excl)
    else:
        excl_key = None if excl is None else np.asarray(excl, bool).tobytes()
        cache = getattr(bit_matrix, "_host_stream_cache", None)
        if cache is None:
            cache = bit_matrix._host_stream_cache = {}
        stream = cache.get(excl_key)
        if stream is None:
            stream = cache[excl_key] = _HostStream(
                bit_matrix.host, n_kmers, excl)
    sb = stream.sb

    nb = _bucket(n)
    masks_t = _pad_rows(masks, nb)
    train_t = _pad_rows(train_masks, nb)
    radix_t = _pad_rows((n_node + 1).astype(np.int32), nb)
    radix_t[n:] = 1
    out = [{"winner": None, "equiv": None} for _ in range(n)]
    jobs = [(i, i, np.asarray(spec[0], np.int64), int(spec[1]))
            for i, spec in enumerate(specs)]
    _resolve_equiv(out, jobs, masks_t, train_t, radix_t, sb, stream)
    return [out[i]["equiv"] for i in range(n)]
