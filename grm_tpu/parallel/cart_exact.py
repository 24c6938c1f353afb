"""Exact-parity device CART split scoring: candidate gathers, host f64 ties.

The argmax frontier scorers (:mod:`grm_tpu.parallel.cart_device`,
:mod:`grm_tpu.ops.pallas_cart_sweep`) resolve impurity ties to the lowest
column and compare scores in float32 — fast, but not the reference's
semantics (``learners/cart.py:219-250``: float64 scores, exact-equality
candidate sets, then the max-occurrence tiebreaker of
``experiment_cart.py:82-94``). This module is the CART analogue of
:mod:`grm_tpu.parallel.scm_exact`:

1. **Pass 1 (device, MXU)** — per frontier node, one blocked matrix pass
   computes every column's class counts and reduces the float32
   child-impurity scores to per-superblock minima. Scores follow the same
   formula as the host (`sum of child impurities x node probability`);
   empty children and blacklisted columns are +inf — conditions on exact
   integers, so the inf-structure is exact.
2. **Threshold (host)** — candidates for the exact float64 minimum can
   only live below ``min32 + margin``; the margin over-covers the float32
   evaluation error of the impurity formula (a few hundred ulps of
   O(1)-magnitude probabilities; over-inclusion is harmless because the
   decision is replayed exactly in step 3).
3. **Gather (device)** — candidate columns' exact integer class counts
   and their occurrence counts among the tree's training set (the
   tiebreaker input) come back compacted; the host recomputes the float64
   scores with the SAME impurity closure as the host engine, takes the
   exact-equality min set, and applies the isclose max-occurrence
   tiebreaker — selected splits AND equivalent-rule sets are bit-identical
   to the host engine.

Column-sharded matrices work unchanged: the passes are plain jit programs,
so XLA's auto-partitioning runs them SPMD over the matrix sharding, and
every decision stays on the host from exact integers.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .scm_grid import _unpack_words

__all__ = ["cart_frontier_candidates"]

_F32_EPS = 1.2e-7


def _scores_f32(counts, n_node, priors, totals, criterion):
    """float32 child-impurity scores for count blocks.

    counts (N, C, B) int32 left-child counts; n_node (N, C) int32;
    priors/totals (N, C) f32. Mirrors cart_device._best_split's math with
    per-node parameters.
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


@partial(jax.jit, static_argnames=("n_kmers", "sb", "criterion"))
def _pass1_sbmin(matrix, masks, n_node, priors, totals, n_kmers, sb,
                 criterion, excl=None):
    """(N, NSB) per-superblock float32 score minima + (N,) global minima."""
    n, c, w = masks.shape
    kp = matrix.shape[1]
    nsb = kp // sb
    masks_dense = _unpack_words(
        masks.reshape(n * c, w).T
    ).T  # (N*C, 32W) int8

    def scan_block(sbmin, b):
        mb = jax.lax.dynamic_slice(matrix, (0, b * sb), (w, sb))
        xb = _unpack_words(mb)  # (32W, sb)
        counts = jax.lax.dot_general(
            masks_dense, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(n, c, sb)
        score = _scores_f32(counts, n_node, priors, totals, criterion)
        col = b * sb + jnp.arange(sb)
        pad = (col >= n_kmers)[None, :]
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (b * sb,), (sb,))
            pad = pad | eb[None, :]
        score = jnp.where(pad, jnp.inf, score)
        m = score.min(axis=1)
        return jax.lax.dynamic_update_slice(sbmin, m[:, None], (0, b)), None

    sbmin, _ = jax.lax.scan(
        scan_block, jnp.full((n, nsb), jnp.inf, jnp.float32),
        jnp.arange(nsb),
    )
    return sbmin, sbmin.min(axis=1)


@partial(jax.jit, static_argnames=("m",))
def _hit_sbs(sbmin, thresh, m):
    n, nsb = sbmin.shape
    hit = sbmin <= thresh[:, None]
    key = jnp.where(hit, jnp.arange(nsb, dtype=jnp.int32)[None, :],
                    jnp.int32(nsb))
    key = jax.lax.sort(key, dimension=1)[:, :m]
    return (jnp.where(key < nsb, key, -1),
            hit.sum(axis=1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("n_kmers", "sb", "cmax", "criterion"))
def _pass2_gather(matrix, masks, n_node, priors, totals, train_masks,
                  pair_n, pair_sb, thresh, n_kmers, sb, cmax, criterion,
                  excl=None):
    """Candidate (col, per-class left counts, train occurrence) per pair."""
    w = matrix.shape[0]
    c = masks.shape[1]

    def one(ni, sbi):
        mslice = jax.lax.dynamic_slice(matrix, (0, sbi * sb), (w, sb))
        xb = _unpack_words(mslice)  # (32W, sb)
        md = _unpack_words(
            jnp.concatenate([masks[ni], train_masks[ni][None]], axis=0).T
        ).T  # (C+1, 32W)
        counts = jax.lax.dot_general(
            md, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (C+1, sb)
        ccounts, occ = counts[:c], counts[c]
        score = _scores_f32(
            ccounts[None], n_node[ni][None], priors[ni][None],
            totals[ni][None], criterion,
        )[0]
        col = sbi * sb + jnp.arange(sb)
        pad = col >= n_kmers
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (sbi * sb,), (sb,))
            pad = pad | eb
        score = jnp.where(pad, jnp.inf, score)
        hitm = score <= thresh[ni]
        key = jnp.where(hitm, jnp.arange(sb, dtype=jnp.int32), jnp.int32(sb))
        order = jax.lax.sort(key)[:cmax]
        valid = order < sb
        j = jnp.where(valid, order, 0)
        out_cols = jnp.where(valid, sbi * sb + j, -1).astype(jnp.int32)
        out_counts = jnp.where(valid[None, :], ccounts[:, j], -1)
        out_occ = jnp.where(valid, occ[j], -1)
        return out_cols, out_counts, out_occ, hitm.sum().astype(jnp.int32)

    return jax.vmap(one)(pair_n, pair_sb)


def cart_frontier_candidates(bit_matrix, node_example_sets, altered_priors,
                             total_n_examples_by_class, criterion,
                             train_example_idx, excl=None, mesh=None,
                             sb=8192, hit_budget=64, cand_budget=64):
    """Exact-candidate data for a BFS frontier.

    ``train_example_idx``: per-node training-set index arrays (the
    occurrence-tiebreaker population — each node's own tree's train set;
    forest batching mixes trees). Returns a list per node: ``None`` when no
    valid split exists (exactly when the host's float64 minimum is +inf),
    else a dict with

    - ``cols``: ascending candidate column indices (guaranteed to contain
      every column whose exact float64 score can equal the minimum),
    - ``left``: {class: int64 left-child counts aligned with cols},
    - ``occ``: int64 occurrence counts among the tree's train set.
    """
    from .cart_device import _frontier_masks
    from .scm_device import build_packed_mask

    crit = "gini" if criterion == "gini" else "cross-entropy"
    masks, n_node, priors, totals = _frontier_masks(
        bit_matrix, node_example_sets, altered_priors,
        total_n_examples_by_class,
    )
    n, c, w = masks.shape
    classes = sorted(
        (total_n_examples_by_class[0]
         if isinstance(total_n_examples_by_class, list)
         else total_n_examples_by_class))
    train_masks = np.stack([
        build_packed_mask(idx, bit_matrix.n_rows, w)
        for idx in train_example_idx
    ])

    matrix = bit_matrix.data
    if mesh is not None and mesh.shape.get("cols", 1) > 1:
        # Column-shard once per (bit_matrix, mesh) — same cache as the
        # argmax sharded scorer; the exact passes are plain jit programs,
        # so GSPMD partitions them over the sharding.
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
    n_kmers = bit_matrix.n_columns
    kp = matrix.shape[1]
    sb = min(sb, max(256, kp))
    pad = (-kp) % sb
    if pad:
        matrix = jax.jit(lambda m: jnp.pad(m, ((0, 0), (0, pad))))(matrix)
    excl_dev = None
    if excl is not None:
        excl_np = np.zeros(matrix.shape[1], bool)
        excl_np[: len(excl)] = np.asarray(excl, bool)
        excl_dev = jnp.asarray(excl_np)

    masks_d = jnp.asarray(masks)
    n_node_d = jnp.asarray(n_node)
    priors_d = jnp.asarray(priors)
    totals_d = jnp.asarray(totals)
    train_d = jnp.asarray(train_masks)

    sbmin, gmin = _pass1_sbmin(matrix, masks_d, n_node_d, priors_d,
                               totals_d, n_kmers, sb, crit, excl=excl_dev)
    gmin_np = np.asarray(gmin, np.float64)

    # Margin: a few hundred f32 ulps of the O(1) impurity magnitudes,
    # scaled by the class count (each class adds ~12 rounded ops); 1e-3
    # absolute dominates for small C. Over-inclusion only grows the gather.
    margin = (1e-3 + 5e-6 * c) * (1.0 + np.abs(gmin_np))
    finite = np.isfinite(gmin_np)
    thresh = np.where(finite, gmin_np + margin, -np.inf).astype(np.float32)
    thresh_d = jnp.asarray(thresh)

    hits_m = hit_budget
    while True:
        hits, hcount = _hit_sbs(sbmin, thresh_d, hits_m)
        hits, hcount = np.asarray(hits), np.asarray(hcount)
        if (hcount <= hits_m).all():
            break
        hits_m = min(int(sbmin.shape[1]), hits_m * 16)

    pair_n, pair_sb = [], []
    for ni in range(n):
        if not finite[ni]:
            continue
        for s in hits[ni]:
            if s >= 0:
                pair_n.append(ni)
                pair_sb.append(int(s))

    pools = {ni: [] for ni in range(n)}
    if pair_n:
        pair_n = np.asarray(pair_n, np.int32)
        pair_sb = np.asarray(pair_sb, np.int32)

        def run(pn, psb, cmax):
            cnt = len(pn)
            bucket = 16
            while bucket < cnt:
                bucket *= 4
            pn_p = np.zeros(bucket, np.int32)
            psb_p = np.zeros(bucket, np.int32)
            pn_p[:cnt], psb_p[:cnt] = pn, psb
            cols, counts, occ, found = _pass2_gather(
                matrix, masks_d, n_node_d, priors_d, totals_d, train_d,
                jnp.asarray(pn_p), jnp.asarray(psb_p), thresh_d,
                n_kmers, sb, cmax, crit, excl=excl_dev,
            )
            return (np.asarray(cols)[:cnt], np.asarray(counts)[:cnt],
                    np.asarray(occ)[:cnt], np.asarray(found)[:cnt])

        def run_chunked(pn, psb, cmax):
            chunk = 256
            if len(pn) <= chunk:
                return run(pn, psb, cmax)
            parts = [run(pn[lo:lo + chunk], psb[lo:lo + chunk], cmax)
                     for lo in range(0, len(pn), chunk)]
            return tuple(np.concatenate([p[i] for p in parts])
                         for i in range(4))

        cols, counts, occ, found = run_chunked(pair_n, pair_sb, cand_budget)
        overflow = found > cand_budget
        groups = [(pair_n[~overflow], cols[~overflow], counts[~overflow],
                   occ[~overflow])]
        if overflow.any():
            c2, k2, o2, _ = run_chunked(pair_n[overflow], pair_sb[overflow],
                                        sb)
            groups.append((pair_n[overflow], c2, k2, o2))
        for pn, pcols, pcounts, pocc in groups:
            for i in range(len(pn)):
                valid = pcols[i] >= 0
                if valid.any():
                    pools[int(pn[i])].append(
                        (pcols[i][valid], pcounts[i][:, valid],
                         pocc[i][valid]))

    out = []
    for ni in range(n):
        if not finite[ni] or not pools[ni]:
            out.append(None)
            continue
        cols_all = np.concatenate([p[0] for p in pools[ni]]).astype(np.int64)
        counts_all = np.concatenate([p[1] for p in pools[ni]], axis=1)
        occ_all = np.concatenate([p[2] for p in pools[ni]]).astype(np.int64)
        order = np.argsort(cols_all, kind="stable")
        out.append({
            "cols": cols_all[order],
            "left": {cl: counts_all[ci][order].astype(np.int64)
                     for ci, cl in enumerate(classes)},
            "occ": occ_all[order],
        })
    return out
