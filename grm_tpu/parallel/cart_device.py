"""Device-resident CART split scoring.

Computes the class-weighted Gini / cross-entropy impurity for ALL candidate
k-mer rules and its argmin entirely on device, fetching only the winning
rule index and score — the fast path for accelerators where pulling the
(n_classes, K) count matrix to the host is expensive.

Math mirrors ``learning/learners/cart.py:85-207`` (altered-prior Breiman
impurities, empty children forbidden) in float32; the host engine remains
the float64 exact-parity path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "cart_best_split_device",
    "cart_frontier_splits_device",
    "cart_frontier_splits_sharded",
]


@partial(jax.jit, static_argnames=("criterion",))
def _best_split(matrix, class_masks, priors, totals, criterion, excl=None):
    """matrix (W, K) uint32; class_masks (C, W) uint32; priors/totals (C,).

    Returns (best_kmer_idx int32, best_score f32). Scores follow the
    reference's 'sum of child impurities, multiplied by node probability'
    formulation; empty children score +inf. ``excl`` (optional (K,) bool)
    excludes k-mer columns — the blacklist contract (kover blacklists ban a
    k-mer's presence AND absence rules together, so column exclusion is
    exact for the presence-split scorer).
    """
    counts = jnp.sum(
        jax.lax.population_count(
            matrix[None, :, :] & class_masks[:, :, None]
        ).astype(jnp.int32),
        axis=1,
    )  # (C, K) left-child (k-mer present) counts
    n_node = jnp.sum(jax.lax.population_count(class_masks), axis=1).astype(
        jnp.int32
    )  # (C,) examples of each class in the node
    left = counts.astype(jnp.float32)
    right = (n_node[:, None] - counts).astype(jnp.float32)

    scale = (priors / totals)[:, None]  # (C, 1)

    def child_score(n_by_class):
        p = scale * n_by_class  # p_j_t, (C, K)
        p_t = jnp.sum(p, axis=0)
        if criterion == "gini":
            # sum_{i != j} p_i p_j / p_t^2, times p_t
            num = p_t * p_t - jnp.sum(p * p, axis=0)
            return jnp.where(p_t > 0, num / p_t, 0.0)
        # cross-entropy: -sum p/p_t log(p/p_t), times p_t
        frac = jnp.where(p_t > 0, p / p_t, 0.0)
        ent = -jnp.sum(jnp.where(frac > 0, frac * jnp.log(frac), 0.0), axis=0)
        return ent * p_t

    score = child_score(left) + child_score(right)
    empty = (jnp.sum(left, axis=0) == 0) | (jnp.sum(right, axis=0) == 0)
    score = jnp.where(empty, jnp.inf, score)
    if excl is not None:
        score = jnp.where(excl, jnp.inf, score)
    best = jnp.argmin(score)
    return best.astype(jnp.int32), score[best]


def cart_best_split_device(bit_matrix, class_example_idx, altered_priors,
                           total_n_examples_by_class, criterion, excl=None):
    """Find the best presence-rule split for a node on device.

    Returns (kmer_idx, score) or (None, inf) when no valid split exists.
    """
    from .scm_device import build_packed_mask

    classes = sorted(class_example_idx)
    masks = np.stack([
        build_packed_mask(class_example_idx[c], bit_matrix.n_rows,
                          bit_matrix.n_words)
        for c in classes
    ])
    priors = np.array([altered_priors[c] for c in classes], np.float32)
    totals = np.array(
        [total_n_examples_by_class[c] for c in classes], np.float32
    )
    crit = "gini" if criterion == "gini" else "cross-entropy"
    best, score = _best_split(
        bit_matrix.data, jnp.asarray(masks), jnp.asarray(priors),
        jnp.asarray(totals), crit,
        excl=None if excl is None else jnp.asarray(excl),
    )
    score = float(jax.device_get(score))
    if not np.isfinite(score):
        return None, np.inf
    return int(jax.device_get(best)), score


def cart_frontier_splits_device(bit_matrix, node_example_sets, altered_priors,
                                total_n_examples_by_class, criterion,
                                sweep=None, block=None, excl=None):
    """Best presence-rule split for a whole BFS frontier in one matrix pass.

    ``node_example_sets`` is a list of per-node ``{class: example_idx}``
    dicts (all nodes share the class key set). ``altered_priors`` /
    ``total_n_examples_by_class`` are one dict shared by every node or a
    per-node list of dicts (forest batching across trees). Returns a list
    of (kmer_idx or None, score) pairs, one per node. On TPU the fused
    Pallas frontier kernel (:mod:`grm_tpu.ops.pallas_cart_sweep`) scores
    every node in one pass; elsewhere it falls back to the per-node XLA
    scorer. ``sweep``: "pallas", "pallas_interpret", or "xla" (default:
    pallas on TPU, xla otherwise). ``excl`` (optional (K,) bool): excluded
    k-mer columns (blacklist); exclusion lives in the XLA scorer, so a
    non-None excl selects sweep="xla".
    """
    if excl is not None:
        sweep = "xla"
    if sweep is None:
        sweep = "pallas" if jax.default_backend() == "tpu" else "xla"
    if sweep == "xla":
        excl_d = None if excl is None else jnp.asarray(excl)
        n = len(node_example_sets)
        priors_l = _per_node_dicts(altered_priors, n)
        totals_l = _per_node_dicts(total_n_examples_by_class, n)
        return [
            cart_best_split_device(
                bit_matrix, idx, priors_l[i], totals_l[i], criterion,
                excl=excl_d,
            )
            for i, idx in enumerate(node_example_sets)
        ]

    from ..ops.pallas_cart_sweep import BLOCK_K, cart_frontier_scores_pallas

    masks, n_node, priors, totals = _frontier_masks(
        bit_matrix, node_example_sets, altered_priors,
        total_n_examples_by_class,
    )
    c, w = masks.shape[1], masks.shape[2]
    crit = "gini" if criterion == "gini" else "cross-entropy"

    # Chunk the frontier to a FIXED node count: bounds the kernel's VMEM
    # footprint (mask rows, counts, and ~10 per-node f32 impurity tiles all
    # scale with nodes x classes) and buckets every call of a tree run into
    # one compiled shape. Short chunks zero-pad (zero masks -> empty
    # children -> +inf, sliced off).
    bk = min(BLOCK_K if block is None else block, bit_matrix.data.shape[1])
    w32p = -(-32 * w // 128) * 128
    vmem_budget = 10 << 20
    fixed = w32p * bk  # int8 unpack scratch
    per_node = c * w32p + c * bk * 4 + 10 * bk * 4
    chunk = max(32, min(256, (vmem_budget - fixed) // max(per_node, 1)))
    chunk = max(32, (chunk // 32) * 32)

    def score_chunk(m, nn, pr, tt):
        return cart_frontier_scores_pallas(
            bit_matrix.data, jnp.asarray(m), jnp.asarray(nn),
            jnp.asarray(pr), jnp.asarray(tt), crit,
            bit_matrix.n_columns, interpret=(sweep == "pallas_interpret"),
            block=block,
        )

    return _chunked_frontier_scores(masks, n_node, priors, totals, chunk,
                                    score_chunk)


def _per_node_dicts(value, n):
    """Normalize a shared dict or per-node list of dicts to a list of n."""
    if isinstance(value, dict):
        return [value] * n
    if len(value) != n:
        raise ValueError("per-node parameter list length mismatch")
    return list(value)


def _frontier_masks(bit_matrix, node_example_sets, altered_priors,
                    total_n_examples_by_class):
    """Shared mask/param assembly.

    ``altered_priors`` / ``total_n_examples_by_class`` are either one dict
    shared by every node or a per-node list of dicts (forest batching:
    nodes of different trees carry different priors).
    Returns (masks (N,C,W) uint32, n_node (N,C) int32, priors (N,C) f32,
    totals (N,C) f32) over the sorted class key set.
    """
    from .scm_device import build_packed_mask

    n = len(node_example_sets)
    priors_l = _per_node_dicts(altered_priors, n)
    totals_l = _per_node_dicts(total_n_examples_by_class, n)
    classes = sorted(totals_l[0]) if n else []
    c, w = len(classes), bit_matrix.n_words
    masks = np.zeros((n, c, w), np.uint32)
    n_node = np.zeros((n, c), np.int32)
    priors = np.zeros((n, c), np.float32)
    totals = np.ones((n, c), np.float32)
    for i, example_idx in enumerate(node_example_sets):
        for ci, cl in enumerate(classes):
            idx = example_idx.get(cl, ())
            if len(idx):
                masks[i, ci] = build_packed_mask(idx, bit_matrix.n_rows, w)
                n_node[i, ci] = len(idx)
            priors[i, ci] = priors_l[i][cl]
            totals[i, ci] = totals_l[i][cl]
    return masks, n_node, priors, totals


def _chunked_frontier_scores(masks, n_node, priors, totals, chunk,
                             score_chunk):
    """Run ``score_chunk(masks_chunk, n_node_chunk, priors_chunk,
    totals_chunk)`` over fixed-size zero-padded frontier chunks (zero masks
    -> empty children -> +inf, sliced off; totals pad with ones so the
    padded scale stays finite); returns the per-node (kmer_idx or None,
    score) list."""
    n = masks.shape[0]
    cols = np.empty(n, np.int64)
    scores = np.empty(n, np.float64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = np.zeros((chunk,) + masks.shape[1:], np.uint32)
        nn = np.zeros((chunk,) + n_node.shape[1:], np.int32)
        pr = np.zeros((chunk,) + priors.shape[1:], np.float32)
        tt = np.ones((chunk,) + totals.shape[1:], np.float32)
        m[: hi - lo] = masks[lo:hi]
        nn[: hi - lo] = n_node[lo:hi]
        pr[: hi - lo] = priors[lo:hi]
        tt[: hi - lo] = totals[lo:hi]
        ch_cols, ch_scores = score_chunk(m, nn, pr, tt)
        cols[lo:hi] = np.asarray(jax.device_get(ch_cols))[: hi - lo]
        scores[lo:hi] = np.asarray(jax.device_get(ch_scores))[: hi - lo]
    return [
        (None, np.inf) if not np.isfinite(scores[i]) else
        (int(cols[i]), float(scores[i]))
        for i in range(n)
    ]


def _sharded_frontier_fn(mesh, sweep, crit, local_k, has_excl=False,
                         _cache={}):
    """Build (and cache) the jitted shard_map frontier scorer.

    Keyed so repeated BFS levels of a tree run reuse one compiled program
    per chunk shape instead of re-tracing a fresh closure every level.
    FIFO-bounded so long-lived processes over many datasets/meshes don't
    pin compiled programs (and their meshes) forever. ``has_excl``: the
    scorer takes a column-sharded (local_k,) exclusion mask (k-mer
    blacklist) — each shard masks only its own columns, no collective.
    """
    key = (mesh, sweep, crit, local_k, has_excl)
    if key in _cache:
        return _cache[key]
    while len(_cache) >= 16:
        _cache.pop(next(iter(_cache)))

    from jax.sharding import PartitionSpec as P

    def body(matrix_local, excl_local, masks, priors, totals):
        # priors/totals are per-node (N, C) rows (forest batching).
        if sweep == "xla":
            cols_l, scores_l = jax.vmap(
                lambda cm, pr, tt: _best_split(matrix_local, cm, pr, tt,
                                               crit, excl=excl_local)
            )(masks, priors, totals)
        else:
            from ..ops.pallas_cart_sweep import cart_frontier_scores_pallas

            n_node = jnp.sum(
                jax.lax.population_count(masks), axis=2
            ).astype(jnp.int32)
            cols_l, scores_l = cart_frontier_scores_pallas(
                matrix_local, masks, n_node, priors, totals, crit,
                local_k, interpret=(sweep == "pallas_interpret"),
            )
        # (S, Nc) gathered winners, shard order == ascending column ranges.
        all_scores = jax.lax.all_gather(scores_l, "cols")
        all_cols = jax.lax.all_gather(cols_l, "cols")
        best_shard = jnp.argmin(all_scores, axis=0)  # first occurrence
        nn = jnp.arange(all_scores.shape[1])
        best_score = all_scores[best_shard, nn]
        best_col = (best_shard * local_k
                    + all_cols[best_shard, nn]).astype(jnp.int32)
        return best_col, best_score

    rep = P()
    excl_spec = P("cols") if has_excl else rep
    run = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "cols"), excl_spec, rep, rep, rep),
            out_specs=(rep, rep),
            check_vma=False,
        )
    )
    _cache[key] = run
    return run


def cart_frontier_splits_sharded(bit_matrix, node_example_sets, altered_priors,
                                 total_n_examples_by_class, criterion, mesh,
                                 sweep=None, excl=None):
    """Column-sharded frontier split scoring over a ("rows", "cols") mesh.

    The matrix's k-mer columns spread over the mesh "cols" axis (the
    framework's long-axis parallelism, SURVEY.md section 2.6); node masks
    are replicated. Each shard scores the frontier on its local columns,
    the per-shard winners combine with an ``all_gather`` of O(N x shards)
    scalars, and the global winner per node is the min score with ties to
    the lowest global column (all_gather shard order == ascending column
    ranges, so a first-occurrence argmin suffices). Zero padding columns
    self-exclude: an all-zero column makes the left child empty, which the
    scorer already sends to +inf.

    Same return contract as :func:`cart_frontier_splits_device`. ``excl``
    (optional (K,) bool): excluded k-mer columns (paired blacklist) — the
    mask shards with the columns; a non-None excl selects sweep="xla" like
    the unsharded engine.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh.shape.get("rows", 1) != 1:
        raise ValueError("cart_frontier_splits_sharded shards columns only")
    if excl is not None:
        sweep = "xla"
    if sweep is None:
        sweep = "pallas" if jax.default_backend() == "tpu" else "xla"
    n_shards = mesh.shape["cols"]

    masks, n_node, priors, totals = _frontier_masks(
        bit_matrix, node_example_sets, altered_priors,
        total_n_examples_by_class,
    )
    crit = "gini" if criterion == "gini" else "cross-entropy"

    # Shard (and column-pad) the matrix ONCE per (bit_matrix, mesh): every
    # BFS level of every fold/HP tree re-enters here, and re-distributing a
    # multi-GB matrix each call would dominate the run.
    cache = getattr(bit_matrix, "_cart_shard_cache", None)
    if cache is None:
        cache = bit_matrix._cart_shard_cache = {}
    matrix = cache.get(mesh)
    if matrix is None:
        raw = bit_matrix.data
        kp = raw.shape[1]
        col_pad = (-kp) % n_shards
        sharding = NamedSharding(mesh, P(None, "cols"))
        if not isinstance(raw, jax.Array):
            if col_pad:
                raw = np.pad(np.asarray(raw), ((0, 0), (0, col_pad)))
            matrix = jax.device_put(raw, sharding)
        elif col_pad or raw.sharding != sharding:
            matrix = jax.jit(
                _pad_cols, static_argnums=1, out_shardings=sharding
            )(raw, col_pad)
        else:
            matrix = raw
        cache[mesh] = matrix
    local_k = matrix.shape[1] // n_shards
    # Real columns beyond bit_matrix.n_columns (artifact padding) must also
    # self-exclude; BitMatrix guarantees padding columns are zero.

    excl_dev = None
    if excl is not None:
        excl_np = np.zeros(matrix.shape[1], bool)
        excl_np[: len(excl)] = np.asarray(excl, bool)
        excl_dev = jax.device_put(excl_np, NamedSharding(mesh, P("cols")))

    rep_sharding = NamedSharding(mesh, P())
    run = _sharded_frontier_fn(mesh, sweep, crit, local_k,
                               has_excl=excl is not None)

    # Fixed-size frontier chunks: bound the per-shard VMEM footprint and
    # bucket every call of a tree run into one compiled shape.
    chunk = min(128, max(32, -(-masks.shape[0] // 32) * 32))

    def score_chunk(m, nn, pr, tt):
        del nn  # per-node counts derive from mask popcounts in the body
        return run(matrix, excl_dev, jax.device_put(m, rep_sharding),
                   jax.device_put(pr, rep_sharding),
                   jax.device_put(tt, rep_sharding))

    return _chunked_frontier_scores(masks, n_node, priors, totals, chunk,
                                    score_chunk)


def _pad_cols(m, col_pad):
    return jnp.pad(m, ((0, 0), (0, col_pad)))
