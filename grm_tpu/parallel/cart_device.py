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

__all__ = ["cart_best_split_device", "cart_frontier_splits_device"]


@partial(jax.jit, static_argnames=("criterion",))
def _best_split(matrix, class_masks, priors, totals, criterion):
    """matrix (W, K) uint32; class_masks (C, W) uint32; priors/totals (C,).

    Returns (best_kmer_idx int32, best_score f32). Scores follow the
    reference's 'sum of child impurities, multiplied by node probability'
    formulation; empty children score +inf.
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
    best = jnp.argmin(score)
    return best.astype(jnp.int32), score[best]


def cart_best_split_device(bit_matrix, class_example_idx, altered_priors,
                           total_n_examples_by_class, criterion):
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
    )
    score = float(jax.device_get(score))
    if not np.isfinite(score):
        return None, np.inf
    return int(jax.device_get(best)), score


def cart_frontier_splits_device(bit_matrix, node_example_sets, altered_priors,
                                total_n_examples_by_class, criterion,
                                sweep=None, block=None):
    """Best presence-rule split for a whole BFS frontier in one matrix pass.

    ``node_example_sets`` is a list of per-node ``{class: example_idx}``
    dicts (all nodes share the class key set). Returns a list of
    (kmer_idx or None, score) pairs, one per node. On TPU the fused Pallas
    frontier kernel (:mod:`grm_tpu.ops.pallas_cart_sweep`) scores every
    node in one pass; elsewhere it falls back to the per-node XLA scorer.
    ``sweep``: "pallas", "pallas_interpret", or "xla" (default: pallas on
    TPU, xla otherwise).
    """
    if sweep is None:
        sweep = "pallas" if jax.default_backend() == "tpu" else "xla"
    if sweep == "xla":
        return [
            cart_best_split_device(
                bit_matrix, idx, altered_priors,
                total_n_examples_by_class, criterion,
            )
            for idx in node_example_sets
        ]

    from ..ops.pallas_cart_sweep import BLOCK_K, cart_frontier_scores_pallas
    from .scm_device import build_packed_mask

    classes = sorted(total_n_examples_by_class)
    n, c, w = len(node_example_sets), len(classes), bit_matrix.n_words
    masks = np.zeros((n, c, w), np.uint32)
    n_node = np.zeros((n, c), np.int32)
    for i, example_idx in enumerate(node_example_sets):
        for ci, cl in enumerate(classes):
            idx = example_idx.get(cl, ())
            if len(idx):
                masks[i, ci] = build_packed_mask(
                    idx, bit_matrix.n_rows, w
                )
                n_node[i, ci] = len(idx)
    priors = np.array([altered_priors[cl] for cl in classes], np.float32)
    totals = np.array(
        [total_n_examples_by_class[cl] for cl in classes], np.float32
    )
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

    cols = np.empty(n, np.int64)
    scores = np.empty(n, np.float64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = np.zeros((chunk, c, w), np.uint32)
        nn = np.zeros((chunk, c), np.int32)
        m[: hi - lo] = masks[lo:hi]
        nn[: hi - lo] = n_node[lo:hi]
        ch_cols, ch_scores = cart_frontier_scores_pallas(
            bit_matrix.data, jnp.asarray(m), jnp.asarray(nn),
            jnp.asarray(priors), jnp.asarray(totals), crit,
            bit_matrix.n_columns, interpret=(sweep == "pallas_interpret"),
            block=block,
        )
        cols[lo:hi] = np.asarray(jax.device_get(ch_cols))[: hi - lo]
        scores[lo:hi] = np.asarray(jax.device_get(ch_scores))[: hi - lo]
    return [
        (None, np.inf) if not np.isfinite(scores[i]) else
        (int(cols[i]), float(scores[i]))
        for i in range(n)
    ]
