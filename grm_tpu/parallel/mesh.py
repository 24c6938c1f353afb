"""Device-mesh sharding for the bit matrix and learning sweeps.

This is the TPU-native replacement for the reference's two distribution
mechanisms (SURVEY.md section 2.6): MPI-rank parallelism in Ray Surveyor
(``src/app.py:1310``) and the multiprocessing HP-grid pools
(``experiment_scm.py:217``, ``experiment_cart.py:450``).

Sharding layout:

- mesh axes ``("rows", "cols")``: genome word-rows are the data-parallel
  axis, k-mer columns are the feature/model-parallel axis (the reference's
  43M-column "long axis" — our analogue of tensor/sequence parallelism).
- the packed matrix is sharded ``P("rows", "cols")``; row masks are sharded
  ``P(None, "rows")`` and replicated along ``cols``.
- the masked-popcount column sweep reduces over the row axis — XLA inserts
  the ``psum`` over the ``rows`` mesh axis automatically; the utility argmax
  reduces over the column axis — XLA inserts the cross-shard max/argmax
  collectives. No hand-written NCCL/MPI analogue required.

``scm_device_step`` is the fully-jitted fast-path SCM iteration: utility
computation, global rule argmax, and packed-mask example-set updates all in
one XLA program. (The parity path keeps the argmax/tie scan on host to
reproduce the reference's np.isclose semantics bit-for-bit; this step is the
performance mode and the multi-chip dry-run target.)
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_bit_matrix",
    "sharded_presence_counts",
    "scm_device_step",
    "pad_columns",
]


def make_mesh(n_devices=None, row_devices=1, devices=None):
    """Build a ("rows", "cols") mesh over the available devices.

    ``row_devices`` devices shard the genome word-rows (data parallel);
    the rest shard the k-mer columns (feature parallel).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    if n_devices % row_devices != 0:
        raise ValueError("row_devices must divide n_devices")
    col_devices = n_devices // row_devices
    return Mesh(devices.reshape(row_devices, col_devices), ("rows", "cols"))


def pad_columns(matrix, multiple):
    """Zero-pad the column axis to a multiple (zero words popcount to 0)."""
    k = matrix.shape[1]
    pad = (-k) % multiple
    if pad == 0:
        return matrix, k
    return (
        np.concatenate(
            [matrix, np.zeros((matrix.shape[0], pad), matrix.dtype)], axis=1
        ),
        k,
    )


def shard_bit_matrix(packed_u32, mesh):
    """Place a (W, K) uint32 matrix on the mesh, padded to the shard grid.

    Returns (sharded jax array, original K). Rows are padded to the row-shard
    multiple, columns to the column-shard multiple.
    """
    packed_u32 = np.asarray(packed_u32, dtype=np.uint32)
    w, k = packed_u32.shape
    row_shards = mesh.shape["rows"]
    col_shards = mesh.shape["cols"]
    w_pad = (-w) % row_shards
    k_pad = (-k) % col_shards
    if w_pad or k_pad:
        packed_u32 = np.pad(packed_u32, ((0, w_pad), (0, k_pad)))
    sharding = NamedSharding(mesh, P("rows", "cols"))
    return jax.device_put(packed_u32, sharding), k


def _colsum(matrix, masks):
    sel = matrix[None, :, :] & masks[:, :, None]
    return jnp.sum(jax.lax.population_count(sel).astype(jnp.int32), axis=1)


def sharded_presence_counts(matrix_sharded, masks, mesh):
    """Multi-mask popcount column sweep over the sharded matrix.

    masks: (C, W_padded) uint32 host array. Returns (C, K_padded) int32 on
    host. The reduction over rows rides the ``rows`` mesh axis as a psum.
    """
    masks = jnp.asarray(np.asarray(masks, dtype=np.uint32))
    fn = jax.jit(
        _colsum,
        in_shardings=(
            NamedSharding(mesh, P("rows", "cols")),
            NamedSharding(mesh, P(None, "rows")),
        ),
        out_shardings=NamedSharding(mesh, P(None, "cols")),
    )
    return np.asarray(jax.device_get(fn(matrix_sharded, masks)))


@partial(jax.jit, static_argnames=("n_kmers",), donate_argnums=(1, 2))
def _scm_step(matrix, pos_mask, neg_mask, p, n_kmers):
    """One fused SCM iteration on device.

    matrix: (W, Kp) uint32 packed presence (may be column-padded; padded
    columns have zero presence so their presence-rule utility cannot exceed a
    real column's, and their absence twins are masked explicitly).
    pos_mask/neg_mask: (W,) uint32 packed example-selection masks.
    Returns (best_rule_idx, best_utility, new_pos_mask, new_neg_mask,
    n_neg_remaining).
    """
    counts = jnp.sum(
        jax.lax.population_count(
            matrix[None, :, :] & jnp.stack([neg_mask, pos_mask])[:, :, None]
        ).astype(jnp.int32),
        axis=1,
    )  # (2, Kp)
    n_neg = jnp.sum(jax.lax.population_count(neg_mask)).astype(jnp.int32)
    n_pos = jnp.sum(jax.lax.population_count(pos_mask)).astype(jnp.int32)

    kp = matrix.shape[1]
    col_is_pad = jnp.arange(kp) >= n_kmers
    neg_cover = jnp.concatenate([n_neg - counts[0], counts[0]])
    pos_err = jnp.concatenate([n_pos - counts[1], counts[1]])
    utility = neg_cover.astype(jnp.float32) - p * pos_err.astype(jnp.float32)
    # Padded columns: presence rules are harmless (cover everything nothing?
    # zero presence -> neg_cover = n_neg, same as a never-present k-mer; they
    # must still be excluded) — mask both halves to -inf.
    pad_mask = jnp.concatenate([col_is_pad, col_is_pad])
    utility = jnp.where(pad_mask, -jnp.inf, utility)
    # Rules covering nothing and erring on nothing are not useful.
    utility = jnp.where((neg_cover == 0) & (pos_err == 0), -jnp.inf, utility)

    best = jnp.argmax(utility)
    best_col = best % kp
    is_absence = best >= kp
    col = jax.lax.dynamic_slice_in_dim(matrix, best_col, 1, axis=1)[:, 0]
    rule_bits = jnp.where(is_absence, ~col, col)
    new_neg = neg_mask & rule_bits
    new_pos = pos_mask & rule_bits
    n_neg_left = jnp.sum(jax.lax.population_count(new_neg)).astype(jnp.int32)
    # Report the index in the un-padded 2K rule space.
    best_unpadded = jnp.where(is_absence, best_col + n_kmers, best_col)
    return best_unpadded, utility[best], new_pos, new_neg, n_neg_left


def scm_device_step(matrix_sharded, pos_mask, neg_mask, p, n_kmers, mesh=None):
    """Run one fused SCM iteration; works on sharded or single-device arrays."""
    pos_mask = jnp.asarray(np.asarray(pos_mask, dtype=np.uint32))
    neg_mask = jnp.asarray(np.asarray(neg_mask, dtype=np.uint32))
    return _scm_step(
        matrix_sharded, pos_mask, neg_mask, jnp.float32(p), n_kmers
    )


def _scm_iteration(matrix, pos_mask, neg_mask, p, n_kmers):
    """Shared body: (best_rule, new_pos, new_neg, n_neg_left). Concat-free."""
    counts = jnp.sum(
        jax.lax.population_count(
            matrix[None, :, :] & jnp.stack([neg_mask, pos_mask])[:, :, None]
        ).astype(jnp.int32),
        axis=1,
    )  # (2, Kp)
    cn, cp = counts[0], counts[1]
    n_neg = jnp.sum(jax.lax.population_count(neg_mask)).astype(jnp.int32)
    n_pos = jnp.sum(jax.lax.population_count(pos_mask)).astype(jnp.int32)

    kp = matrix.shape[1]
    col_is_pad = jnp.arange(kp) >= n_kmers
    # presence half: cover = n_neg - cn, err = n_pos - cp
    u_pres = (n_neg - cn).astype(jnp.float32) - p * (n_pos - cp).astype(jnp.float32)
    u_pres = jnp.where(col_is_pad | ((cn == n_neg) & (cp == n_pos)), -jnp.inf, u_pres)
    # absence half: cover = cn, err = cp
    u_abs = cn.astype(jnp.float32) - p * cp.astype(jnp.float32)
    u_abs = jnp.where(col_is_pad | ((cn == 0) & (cp == 0)), -jnp.inf, u_abs)

    best_pres = jnp.argmax(u_pres)
    best_abs = jnp.argmax(u_abs)
    # np.argmax-over-concat semantics: presence wins ties.
    use_abs = u_abs[best_abs] > u_pres[best_pres]
    best_col = jnp.where(use_abs, best_abs, best_pres)

    col = jax.lax.dynamic_slice_in_dim(matrix, best_col, 1, axis=1)[:, 0]
    rule_bits = jnp.where(use_abs, ~col, col)
    new_pos = pos_mask & rule_bits
    new_neg = neg_mask & rule_bits
    n_neg_left = jnp.sum(jax.lax.population_count(new_neg)).astype(jnp.int32)
    best_rule = jnp.where(use_abs, best_col + n_kmers, best_col).astype(jnp.int32)
    return best_rule, new_pos, new_neg, n_neg_left


@partial(jax.jit, static_argnames=("n_kmers", "max_rules"))
def scm_fit_batch_device(matrix, pos_masks, neg_masks, ps, n_kmers, max_rules):
    """Fit a whole batch of SCMs entirely on device — ONE dispatch, ONE fetch.

    Runs ``lax.scan`` over fits (e.g. the full CV hyperparameter grid: every
    (model_type, p, fold) combination) with a ``lax.while_loop`` over greedy
    rule additions inside each fit. This replaces the reference's
    multiprocessing HP-grid pool (experiment_scm.py:196-248) with a single
    XLA program over the HBM-resident matrix: no host round-trip per
    iteration, which matters when device->host latency is high.

    Parameters
    ----------
    matrix : (W, Kp) uint32 packed presence matrix (may be column-padded)
    pos_masks, neg_masks : (F, W) uint32 per-fit example masks (for
        disjunction fits, pass the masks pre-swapped)
    ps : (F,) float32 per-fit trade-off parameter

    Returns
    -------
    rules : (F, max_rules) int32 — selected rule indices in the 2K space,
        -1 for unused slots
    n_rules : (F,) int32, n_neg_left : (F,) int32
    """

    def one_fit(_, fit):
        pos0, neg0, p = fit

        def cond(state):
            i, pos, neg, rules, n_neg = state
            return (i < max_rules) & (n_neg > 0)

        def body(state):
            i, pos, neg, rules, _ = state
            best_rule, new_pos, new_neg, n_neg_left = _scm_iteration(
                matrix, pos, neg, p, n_kmers
            )
            rules = rules.at[i].set(best_rule)
            return i + 1, new_pos, new_neg, rules, n_neg_left

        n_neg0 = jnp.sum(jax.lax.population_count(neg0)).astype(jnp.int32)
        rules0 = jnp.full((max_rules,), -1, jnp.int32)
        i, pos, neg, rules, n_neg = jax.lax.while_loop(
            cond, body, (jnp.int32(0), pos0, neg0, rules0, n_neg0)
        )
        return None, (rules, i, n_neg)

    _, (rules, n_rules, n_neg_left) = jax.lax.scan(
        one_fit, None, (pos_masks, neg_masks, ps)
    )
    return rules, n_rules, n_neg_left
