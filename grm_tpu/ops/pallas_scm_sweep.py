"""Fused Pallas kernel for the iteration-major SCM utility sweep.

The XLA path of :mod:`grm_tpu.parallel.scm_grid` unpacks each packed column
block to an int8 tile, contracts it with the fit masks on the MXU, then
scans utilities — but XLA materializes the unpacked tiles (and the uint32
shift intermediates) through HBM, so the sweep moves ~50x more bytes than
the packed matrix it reads. This kernel keeps the per-block pipeline in
VMEM and strips the hot loop down to the minimum VPU work via two tricks:

1. **Affine complement.** With ``C_f = n_neg - p*n_pos``, the presence and
   absence utilities satisfy ``u_pres = C_f - u_abs`` exactly, so one
   ``u_abs = cn - p*cp`` array serves both halves: the best absence rule is
   its max, the best presence rule is its min.
2. **Two-phase argmax.** The kernel emits only per-block extrema
   ``(min u_abs, max u_abs)`` per fit; the global winner block is located
   by XLA on the tiny (n_blocks, F) result and the winning column is
   recomputed exactly (direct utility formulas over one gathered block per
   fit, packed popcount path) — so the per-block inner loop carries no
   cross-lane argmax at all.

The matrix is consumed IN PLACE — no row or column padding copies (a 7 GB
matrix at the largest published dataset scale would not tolerate one): the
kernel loads full-height (W, BLOCK_K) tiles, zero-fills the int8 scratch
tail rows once, and the ragged last block is excluded by column-index
masking (out-of-bounds lanes of a partial tile read unspecified values, so
both extrema mask on ``col >= n_kmers``).

Per greedy iteration the HBM traffic is one read of the packed matrix
(1 bit per genome x k-mer) plus O(n_blocks x F) extrema. This replaces the
reference's hot ``sum_rows`` masked-popcount loop
(``bin/kover/core/kover/learning/common/rules.py:201-267``,
``popcount.pyx:76-95``) batched over every (model_type, p, fold) fit of its
fork-per-HP CV search (``experiment_scm.py:196-248``).

Selection semantics match :func:`grm_tpu.parallel.scm_grid._grid_step_impl`
under exact float32 arithmetic (integer counts; ties broken to the lowest
block then lowest column, presence beats absence on equal utility). When
``p*count`` rounds in float32, a column whose directly-computed utility
ties the winner only after rounding may be chosen differently — model
quality is unaffected and the host parity engine is unchanged.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU builds; interpret mode uses it for specs.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["scm_utility_argmax_pallas", "BLOCK_K"]

# 4K columns per block: measured ~16% faster than 1K at median-dataset
# scale on v5e (fewer grid steps amortize the per-block mask reload).
BLOCK_K = 4096
_NEG_INF = float(np.finfo(np.float32).min)
_POS_INF = float(np.finfo(np.float32).max)
# The scoped-vmem stack limit is 16 MB on v5e; budget below it so the
# scratch + counts + score tiles fit at ANY genome count (a 24 MB budget
# compiled fine at 342 genomes but OOMed the scoped stack at the largest
# published dataset's 5022 genomes / 157 word rows).
_VMEM_BUDGET = 13 << 20


def pick_block_k(w32p, row_bytes_per_col, k, block=None):
    """Column block size bounded by the VMEM budget.

    Per column the kernel holds ``w32p`` int8 scratch bytes plus
    ``row_bytes_per_col`` bytes of counts/score intermediates; shrink the
    block (lane-aligned) when huge genome counts would overflow VMEM.
    """
    bk = BLOCK_K if block is None else block
    fit = _VMEM_BUDGET // max(w32p + row_bytes_per_col, 1)
    bk = min(bk, max(128, (fit // 128) * 128))
    return min(bk, k)


def _unpack_to_scratch(mat_ref, x_scratch, w, w32p, bk, zero_tail):
    """Unpack the packed (W, BK) uint32 block to int8 rows [0, 32W) of the
    (w32p, BK) scratch; zero the tail rows once (they persist)."""
    if zero_tail and w32p > 32 * w:
        @pl.when(pl.program_id(0) == 0)
        def _():
            x_scratch[32 * w :, :] = jnp.zeros(
                (w32p - 32 * w, bk), jnp.int8
            )
    shifts = jnp.uint32(31) - jax.lax.broadcasted_iota(jnp.uint32, (32, bk), 0)
    for i in range(w):  # static, small
        word = mat_ref[i, :][None, :]
        x_scratch[32 * i : 32 * (i + 1), :] = (
            (word >> shifts) & jnp.uint32(1)
        ).astype(jnp.int8)


def _make_kernel(w, w32p, bk, fp, n_kmers, n_blocks, has_limit):
    # The last block that contains any real column; every block at or past
    # it may carry unspecified out-of-bounds lanes and masks on col index.
    # With a TRACED limit (sharded use: the valid-column count differs per
    # shard), every block masks on the runtime limit instead.
    first_masked = max((n_kmers - 1) // bk, 0)

    def kernel(*refs):
        """[limit_ref (1,1) i32 SMEM when has_limit,] masks_ref (2Fp, w32p)
        int8 [neg rows then pos rows]; params_ref (3, Fp) f32
        [n_neg, n_pos, p]; mat_ref (W, BK) uint32; outputs (1, 1, Fp) rows
        of (NB, 1, Fp)."""
        if has_limit:
            (limit_ref, masks_ref, params_ref, mat_ref,
             minp_ref, maxa_ref, x_scratch) = refs
        else:
            (masks_ref, params_ref, mat_ref,
             minp_ref, maxa_ref, x_scratch) = refs
        b = pl.program_id(0)
        _unpack_to_scratch(mat_ref, x_scratch, w, w32p, bk, True)

        counts = jax.lax.dot_general(
            masks_ref[:], x_scratch[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2Fp, BK): rows [0, Fp) = neg counts cn, [Fp, 2Fp) = pos cp
        cn = counts[:fp, :]
        cp = counts[fp:, :]

        ps = params_ref[2, :][:, None]
        u = cn.astype(jnp.float32) - ps * cp.astype(jnp.float32)  # u_abs

        s = cn + cp
        nn_i = params_ref[0, :][:, None].astype(jnp.int32)
        np_i = params_ref[1, :][:, None].astype(jnp.int32)
        # absence rule covering nothing: cn == cp == 0  <=>  s == 0
        u_max = jnp.where(s == 0, jnp.float32(_NEG_INF), u)
        # presence rule covering nothing: cn == n_neg and cp == n_pos
        u_min = jnp.where(s == nn_i + np_i, jnp.float32(_POS_INF), u)

        if has_limit:
            col = b * bk + jax.lax.broadcasted_iota(jnp.int32, (fp, bk), 1)
            bad = col >= limit_ref[0, 0]
            minp_ref[0, 0, :] = jnp.min(
                jnp.where(bad, jnp.float32(_POS_INF), u_min), axis=1
            )
            maxa_ref[0, 0, :] = jnp.max(
                jnp.where(bad, jnp.float32(_NEG_INF), u_max), axis=1
            )
        elif first_masked < n_blocks - 1 or n_kmers < n_blocks * bk:
            # Ragged tail / padded columns: exclude by global column index
            # (their lanes may hold unspecified values).
            @pl.when(b >= first_masked)
            def _():
                col = b * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (fp, bk), 1
                )
                bad = col >= n_kmers
                minp_ref[0, 0, :] = jnp.min(
                    jnp.where(bad, jnp.float32(_POS_INF), u_min), axis=1
                )
                maxa_ref[0, 0, :] = jnp.max(
                    jnp.where(bad, jnp.float32(_NEG_INF), u_max), axis=1
                )

            @pl.when(b < first_masked)
            def _():
                minp_ref[0, 0, :] = jnp.min(u_min, axis=1)
                maxa_ref[0, 0, :] = jnp.max(u_max, axis=1)
        else:
            minp_ref[0, 0, :] = jnp.min(u_min, axis=1)
            maxa_ref[0, 0, :] = jnp.max(u_max, axis=1)

    return kernel


def _pad_to(x, axis, multiple):
    pad = (-x.shape[axis]) % multiple
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _unpack_masks_i8(masks, fp):
    """(F, W) uint32 packed -> (Fp, 32W) int8 0/1, zero row padded."""
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    bits = (masks[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return _pad_to(
        bits.astype(jnp.int8).reshape(masks.shape[0], -1), 0, fp
    )


def _block_counts(blocks, masks):
    """Packed popcount counts over gathered blocks.

    blocks: (F, W, BK) uint32; masks: (F, W) uint32 -> (F, BK) int32.
    """
    sel = blocks & masks[:, :, None]
    return jnp.sum(
        jax.lax.population_count(sel).astype(jnp.int32), axis=1
    )


@partial(jax.jit, static_argnames=("n_kmers", "interpret", "block"))
def scm_utility_argmax_pallas(matrix, neg_masks, pos_masks, n_neg, n_pos, ps,
                              n_kmers, interpret=False, block=None,
                              col_limit=None):
    """Best presence/absence utility + column per fit, one matrix pass.

    matrix: (W, K) uint32 packed presence (genome rows MSB-first), consumed
    in place (no padding copies); requires K >= BLOCK_K columns.
    neg_masks/pos_masks: (F, W) uint32 packed example-selection masks.
    n_neg/n_pos: (F,) current example counts; ps: (F,) trade-off values.
    ``col_limit`` (optional TRACED scalar) overrides the static ``n_kmers``
    as the valid-column bound — for sharded use where each shard's valid
    count differs at runtime; every block then masks on the runtime limit.
    Returns (bpu, bpi, bau, bai): best presence utility/column and best
    absence utility/column per fit, float32/int32 arrays of shape (F,).
    """
    if not _HAS_PLTPU:  # pragma: no cover
        raise RuntimeError("pallas TPU namespace unavailable")

    f, w = neg_masks.shape
    k = matrix.shape[1]
    if matrix.shape[0] != w:
        raise ValueError("matrix word rows must match the mask width")
    # Pad the fit axis only to the int8 sublane granularity (2*fp mask rows
    # must be a multiple of 32): the utility math is VPU-bound, so padding
    # to full 128 lanes would waste up to 60% of the per-block work.
    fp = max(-(-f // 16) * 16, 16)

    # Padded fit rows are all-zero -> s == 0 == nn+np -> +/-inf extrema,
    # resolved to junk winners that are sliced off at the end.
    masks_i8 = jnp.concatenate(
        [_unpack_masks_i8(neg_masks, fp), _unpack_masks_i8(pos_masks, fp)],
        axis=0,
    )  # (2Fp, 32W)
    masks_i8 = _pad_to(masks_i8, 1, 128)  # lane-pad the contraction dim
    w32p = masks_i8.shape[1]
    # counts (2Fp int32) + ~8 f32 per-fit intermediates per column.
    bk = pick_block_k(w32p, 2 * fp * 4 + 8 * fp * 4, k, block)

    nb = -(-k // bk)

    nnf = _pad_to(n_neg.astype(jnp.float32), 0, fp)
    npf = _pad_to(n_pos.astype(jnp.float32), 0, fp)
    psf = _pad_to(ps.astype(jnp.float32), 0, fp)
    params = jnp.stack([nnf, npf, psf])  # (3, Fp)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    has_limit = col_limit is not None
    in_specs = [
        spec((2 * fp, w32p), lambda b: (0, 0)),
        spec((3, fp), lambda b: (0, 0)),
        spec((w, bk), lambda b: (0, b)),
    ]
    operands = [masks_i8, params, matrix]
    if has_limit:
        in_specs.insert(0, pl.BlockSpec(
            (1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM
        ))
        operands.insert(
            0, jnp.reshape(col_limit, (1, 1)).astype(jnp.int32)
        )

    minp, maxa = pl.pallas_call(
        _make_kernel(w, w32p, bk, fp, n_kmers, nb, has_limit),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            spec((1, 1, fp), lambda b: (b, 0, 0)),
            spec((1, 1, fp), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, fp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, fp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((w32p, bk), jnp.int8)],
        interpret=interpret,
    )(*operands)

    # Phase 2 (XLA, tiny): locate winner blocks, recompute them exactly with
    # the direct utility formulas over the packed gathered blocks. Block
    # starts clamp so the ragged tail re-reads real columns.
    minp = minp[:, 0, :f]  # (NB, F)
    maxa = maxa[:, 0, :f]
    pres_blk = jnp.argmin(minp, axis=0)  # (F,) first occurrence = lowest blk
    abs_blk = jnp.argmax(maxa, axis=0)

    def gather_block(start):
        return jax.lax.dynamic_slice(matrix, (0, start), (w, bk))

    pres_start = jnp.minimum(pres_blk * bk, k - bk)
    abs_start = jnp.minimum(abs_blk * bk, k - bk)
    pres_blocks = jax.vmap(gather_block)(pres_start)  # (F, W, BK)
    abs_blocks = jax.vmap(gather_block)(abs_start)

    nn = n_neg.astype(jnp.float32)[:, None]
    np_ = n_pos.astype(jnp.float32)[:, None]
    pv = ps.astype(jnp.float32)[:, None]
    neg_inf = jnp.float32(-jnp.inf)
    rows = jnp.arange(f)
    limit = col_limit if has_limit else n_kmers

    # Presence winner: direct u_pres over the gathered block.
    cn = _block_counts(pres_blocks, neg_masks).astype(jnp.float32)
    cp = _block_counts(pres_blocks, pos_masks).astype(jnp.float32)
    u_pres = (nn - cn) - pv * (np_ - cp)
    cols = pres_start[:, None] + jnp.arange(bk)[None, :]
    u_pres = jnp.where(
        (cols >= limit) | ((cn == nn) & (cp == np_)), neg_inf, u_pres
    )
    off = jnp.argmax(u_pres, axis=1)
    bpu = u_pres[rows, off]
    bpi = (pres_start + off).astype(jnp.int32)

    # Absence winner: direct u_abs over the gathered block.
    cn = _block_counts(abs_blocks, neg_masks).astype(jnp.float32)
    cp = _block_counts(abs_blocks, pos_masks).astype(jnp.float32)
    u_abs = cn - pv * cp
    cols = abs_start[:, None] + jnp.arange(bk)[None, :]
    u_abs = jnp.where(
        (cols >= limit) | ((cn == 0) & (cp == 0)), neg_inf, u_abs
    )
    off = jnp.argmax(u_abs, axis=1)
    bau = u_abs[rows, off]
    bai = (abs_start + off).astype(jnp.int32)
    return bpu, bpi, bau, bai
