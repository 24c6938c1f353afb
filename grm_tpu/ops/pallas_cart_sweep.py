"""Fused Pallas kernel for frontier-batched CART split scoring.

Scores the class-weighted Gini / cross-entropy impurity of every candidate
presence rule for a whole BFS frontier of tree nodes in ONE pass over the
packed bit matrix: per column block the packed words are unpacked to an
int8 tile in VMEM, contracted with all (node, class) example masks on the
MXU, and reduced to per-node block minima; the winning block per node is
then located and recomputed exactly by XLA (packed popcount path), so the
kernel carries no cross-lane argmin.

This replaces the reference's per-node ``sum_rows`` + vectorized impurity
loop (``bin/kover/core/kover/learning/learners/cart.py:85-207`` over
``rules.py:201-267``) with one device program per tree level instead of
one full-matrix sweep per class per node — the CART analogue of the SCM
grid engine (:mod:`grm_tpu.ops.pallas_scm_sweep`).

Numerics follow :func:`grm_tpu.parallel.cart_device._best_split` (float32,
altered-prior Breiman impurities, empty children forbidden); ties resolve
to the lowest k-mer index. The matrix is consumed in place (no padding
copies — see :mod:`grm_tpu.ops.pallas_scm_sweep`): full-height column
tiles, zero-tail int8 scratch, and column-index masking on the ragged last
block, whose out-of-bounds lanes read unspecified values.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_scm_sweep import (
    _pad_to,
    _unpack_masks_i8,
    _unpack_to_scratch,
    pick_block_k,
)

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["cart_frontier_scores_pallas", "BLOCK_K"]

BLOCK_K = 1024
_POS_INF = float(np.finfo(np.float32).max)


def _child_score(p_list, criterion):
    """Reference impurity of one child, vectorized over (Np, BK).

    p_list: per-class resubstitution-weighted counts p_j_t = prior/total * n.
    Matches cart_device._best_split's child_score (float32 order of ops).
    """
    p_t = p_list[0]
    for p in p_list[1:]:
        p_t = p_t + p
    if criterion == "gini":
        sq = p_list[0] * p_list[0]
        for p in p_list[1:]:
            sq = sq + p * p
        num = p_t * p_t - sq
        return jnp.where(p_t > 0, num / p_t, jnp.float32(0.0))
    ent = jnp.zeros_like(p_t)
    for p in p_list:
        frac = jnp.where(p_t > 0, p / p_t, jnp.float32(0.0))
        ent = ent - jnp.where(frac > 0, frac * jnp.log(frac), jnp.float32(0.0))
    return ent * p_t


def _make_kernel(w, w32p, bk, n_classes, npad, criterion, n_kmers, n_blocks):
    first_masked = max((n_kmers - 1) // bk, 0)

    def kernel(masks_ref, params_ref, mat_ref, min_ref, x_scratch):
        """masks_ref: (C*Np, w32p) int8, class-major; params_ref: (2C, Np)
        f32 [n_node rows, then prior/total scale rows]; mat_ref: (W, BK)
        uint32; min_ref: (1, 1, Np) block row of the (NB, 1, Np) minima."""
        b = pl.program_id(0)
        _unpack_to_scratch(mat_ref, x_scratch, w, w32p, bk, True)

        counts = jax.lax.dot_general(
            masks_ref[:], x_scratch[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (C*Np, BK), class-major

        lefts, rights, pl_, pr = [], [], [], []
        for c in range(n_classes):
            left = counts[c * npad : (c + 1) * npad, :].astype(jnp.float32)
            n_node = params_ref[c, :][:, None]          # (Np, 1)
            scale = params_ref[n_classes + c, :][:, None]
            right = n_node - left
            lefts.append(left)
            rights.append(right)
            pl_.append(scale * left)
            pr.append(scale * right)

        score = _child_score(pl_, criterion) + _child_score(pr, criterion)
        left_n = lefts[0]
        right_n = rights[0]
        for c in range(1, n_classes):
            left_n = left_n + lefts[c]
            right_n = right_n + rights[c]
        score = jnp.where(
            (left_n == 0) | (right_n == 0), jnp.float32(_POS_INF), score
        )
        if first_masked < n_blocks - 1 or n_kmers < n_blocks * bk:
            # Ragged tail / padded columns: exclude by global column index
            # (their lanes may hold unspecified values).
            @pl.when(b >= first_masked)
            def _():
                col = b * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (npad, bk), 1
                )
                min_ref[0, 0, :] = jnp.min(
                    jnp.where(col >= n_kmers, jnp.float32(_POS_INF), score),
                    axis=1,
                )

            @pl.when(b < first_masked)
            def _():
                min_ref[0, 0, :] = jnp.min(score, axis=1)
        else:
            min_ref[0, 0, :] = jnp.min(score, axis=1)

    return kernel


def _block_class_counts(blocks, masks):
    """blocks (N, W, BK) uint32, masks (N, C, W) uint32 -> (N, C, BK) f32."""
    sel = blocks[:, None, :, :] & masks[:, :, :, None]
    return jnp.sum(
        jax.lax.population_count(sel).astype(jnp.int32), axis=2
    ).astype(jnp.float32)


@partial(jax.jit, static_argnames=("criterion", "n_kmers", "interpret", "block"))
def cart_frontier_scores_pallas(matrix, class_masks, n_node, priors, totals,
                                criterion, n_kmers, interpret=False, block=None):
    """Best presence-rule split per frontier node, one matrix pass.

    matrix: (W, K) uint32 packed presence. class_masks: (N, C, W) uint32
    packed example masks per node per class. n_node: (N, C) example counts.
    priors/totals: (C,) altered priors and total class sizes shared by all
    nodes, or (N, C) per-node values — the forest-batched engine scores
    frontiers of MANY trees (different folds / class importances, hence
    different altered priors) in one pass.
    Returns (best_col (N,) int32, best_score (N,) f32); +inf score means no
    valid split for that node.
    """
    if not _HAS_PLTPU:  # pragma: no cover
        raise RuntimeError("pallas TPU namespace unavailable")

    n, c, w = class_masks.shape
    k = matrix.shape[1]
    if matrix.shape[0] != w:
        raise ValueError("matrix word rows must match the mask width")
    # Pad the node axis only to sublane granularity (c*npad int8 mask rows
    # must be a multiple of 32; the f32 impurity tiles need npad % 8): the
    # impurity math is VPU-bound and npad bounds the VMEM footprint.
    npad = max(-(-n // 32) * 32, 32)

    # Class-major mask rows: [class0 node0..Np, class1 node0..Np, ...].
    # Padded node rows are all-zero -> empty children -> +inf everywhere.
    mask_rows = []
    for ci in range(c):
        mask_rows.append(_unpack_masks_i8(class_masks[:, ci, :], npad))
    masks_i8 = jnp.concatenate(mask_rows, axis=0)  # (C*Np, 32W)
    masks_i8 = _pad_to(masks_i8, 1, 128)
    w32p = masks_i8.shape[1]
    # counts (C*Np int32) + ~10 f32 per-node impurity tiles per column.
    bk = pick_block_k(w32p, c * npad * 4 + 10 * npad * 4, k, block)

    nb = -(-k // bk)

    scale = (priors.astype(jnp.float32) / totals.astype(jnp.float32))
    if scale.ndim == 1:  # (C,) shared -> (N, C) per node
        scale = jnp.broadcast_to(scale[None, :], (n, c))
    params = jnp.concatenate([
        _pad_to(n_node.astype(jnp.float32).T, 1, npad),       # (C, Np)
        _pad_to(scale.T, 1, npad),
    ], axis=0)  # (2C, Np)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    (minima,) = pl.pallas_call(
        _make_kernel(w, w32p, bk, c, npad, criterion, n_kmers, nb),
        grid=(nb,),
        in_specs=[
            spec((c * npad, w32p), lambda b: (0, 0)),
            spec((2 * c, npad), lambda b: (0, 0)),
            spec((w, bk), lambda b: (0, b)),
        ],
        out_specs=[spec((1, 1, npad), lambda b: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, 1, npad), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((w32p, bk), jnp.int8)],
        interpret=interpret,
    )(masks_i8, params, matrix)

    minima = minima[:, 0, :n]  # (NB, N)
    best_blk = jnp.argmin(minima, axis=0)  # (N,) first occurrence

    # Phase 2 (XLA, tiny): recompute the winning block exactly; block
    # starts clamp so the ragged tail re-reads real columns.
    best_start = jnp.minimum(best_blk * bk, k - bk)

    def gather_block(start):
        return jax.lax.dynamic_slice(matrix, (0, start), (w, bk))

    blocks = jax.vmap(gather_block)(best_start)  # (N, W, BK)
    left = _block_class_counts(blocks, class_masks)      # (N, C, BK)
    right = n_node.astype(jnp.float32)[:, :, None] - left

    def child(nc):
        p = scale[:, :, None] * nc
        p_t = jnp.sum(p, axis=1)
        if criterion == "gini":
            num = p_t * p_t - jnp.sum(p * p, axis=1)
            return jnp.where(p_t > 0, num / p_t, 0.0)
        frac = jnp.where(p_t[:, None, :] > 0, p / p_t[:, None, :], 0.0)
        ent = -jnp.sum(
            jnp.where(frac > 0, frac * jnp.log(frac), 0.0), axis=1
        )
        return ent * p_t

    score = child(left) + child(right)  # (N, BK)
    cols = best_start[:, None] + jnp.arange(bk)[None, :]
    score = jnp.where(
        (cols >= n_kmers)
        | (jnp.sum(left, axis=1) == 0)
        | (jnp.sum(right, axis=1) == 0),
        jnp.float32(np.inf),
        score,
    )
    off = jnp.argmin(score, axis=1)
    rows = jnp.arange(n)
    best_score = score[rows, off]
    best_col = (best_start + off).astype(jnp.int32)
    return best_col, best_score
