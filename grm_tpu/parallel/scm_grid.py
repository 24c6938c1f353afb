"""Iteration-major SCM CV grid engine: the MXU count path.

The scan-over-fits engine (:mod:`grm_tpu.parallel.scm_device`) streams the
packed bit matrix once per fit per greedy iteration — F x R full-matrix
sweeps for an F-fit hyperparameter grid.  Those sweeps are HBM-bandwidth
bound, so the grid cost scales linearly with the grid size even though every
fit reads the *same* matrix.

This engine inverts the loop nest: each greedy iteration makes ONE pass over
the packed matrix and scores ALL fits at once.  Per column block, the packed
words are unpacked to an int8 0/1 tile in registers/VMEM and the per-rule
presence counts for every fit become a single matrix multiplication,

    counts[f, k] = sum_g mask[f, g] * X[g, k]

an int8 x int8 -> int32 contraction that runs on the MXU (systolic array)
instead of VPU popcounts.  The matrix stays bit-packed in HBM (1 bit/cell),
is read R times total instead of F x R, and the arithmetic rides the
hardware's highest-throughput unit.  This is the TPU-native replacement for
the reference's fork-per-hyperparameter ``multiprocessing.Pool`` CV search
(``bin/kover/core/kover/learning/experiments/experiment_scm.py:196-248``).

Two deployments:

- :func:`scm_cv_grid_device` — single device; the sweep backend is either
  the XLA block scan or the fused Pallas kernel
  (:mod:`grm_tpu.ops.pallas_scm_sweep`).
- :func:`scm_cv_grid_sharded` — the k-mer columns sharded over the "cols"
  axis of a device mesh (SPMD via ``jax.shard_map``): each device sweeps
  its local columns, the per-fit winners combine with an ``all_gather`` of
  O(F) scalars over ICI, and the winning rule's packed column is broadcast
  back with a one-hot ``psum`` — the multi-chip replacement for the
  reference's MPI-rank parallelism (``src/app.py:1310``).

Selection semantics match :func:`grm_tpu.parallel.mesh._scm_iteration`
exactly: pure argmax utility (no isclose tie sets), presence half wins ties
against the absence half, lowest column index wins within a half, rules that
cover nothing and err on nothing are excluded, padded columns are excluded.
Per-length fold-test risks are tracked from packed prediction masks the same
way as :func:`grm_tpu.parallel.scm_device._cv_batch`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["scm_cv_grid_device", "scm_cv_grid_sharded"]


def _pick_block(kp, n_fits):
    """Column block size: keep the (2F, B) int32 counts block ~<=64 MB."""
    per_col_bytes = 2 * max(n_fits, 1) * 4
    b = (64 << 20) // per_col_bytes
    b = max(512, min(int(kp), b))
    return -(-b // 512) * 512  # round up to a lane-friendly multiple


def _unpack_words(packed):
    """(W, B) uint32 MSB-first packed -> (32W, B) int8 0/1 rows."""
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    bits = ((packed[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1))
    return bits.astype(jnp.int8).reshape(-1, packed.shape[1])


def _popcount_rows(masks):
    """(F, W) uint32 -> (F,) int32 set-bit counts."""
    return jnp.sum(
        jax.lax.population_count(masks).astype(jnp.int32), axis=-1
    )


def _fold_risks(conj, tpos, tneg, n_tpos, n_tneg, is_disj):
    """Vectorized fold-test risk of the current conjunction masks (F, W)."""
    pos_pred1 = _popcount_rows(tpos & conj).astype(jnp.float32)
    neg_pred1 = _popcount_rows(tneg & conj).astype(jnp.float32)
    n_test = jnp.maximum(n_tpos + n_tneg, 1.0)
    conj_errors = (n_tpos - pos_pred1) + neg_pred1
    disj_errors = pos_pred1 + (n_tneg - neg_pred1)
    return jnp.where(is_disj, disj_errors, conj_errors) / n_test


def _sweep_xla(matrix, pos, neg, ps, n_neg, n_pos, n_kmers, block,
               col_offset, axis_name=None, excl=None):
    """Best presence/absence utility + GLOBAL column per fit over the local
    matrix columns, via a block scan of MXU contractions.

    ``col_offset`` (traced) is the global index of the local column 0;
    columns at global index >= n_kmers are padding and excluded.
    ``axis_name`` marks the scan carry as varying over that manual mesh
    axis when the sweep runs inside shard_map. ``excl`` (optional (2, Kp)
    bool): rules to exclude — row 0 presence, row 1 absence (the k-mer
    blacklist, experiment_scm.py:632-671).
    """
    f = pos.shape[0]
    w, kp = matrix.shape
    nb = kp // block
    neg_inf = jnp.float32(-jnp.inf)
    rows = jnp.arange(f)

    # neg first: counts[:F] = negative-example presence counts, like
    # _scm_iteration's stack([neg_mask, pos_mask]) ordering.
    masks_dense = _unpack_words(
        jnp.concatenate([neg, pos], axis=0).T
    ).T  # (2F, 32W)
    nn = n_neg[:, None].astype(jnp.float32)
    np_ = n_pos[:, None].astype(jnp.float32)

    def scan_block(carry, b):
        bpu, bpi, bau, bai = carry
        mb = jax.lax.dynamic_slice(matrix, (0, b * block), (w, block))
        xb = _unpack_words(mb)  # (32W, block) int8
        counts = jax.lax.dot_general(
            masks_dense, xb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2F, block)
        cn, cp = counts[:f], counts[f:]
        col_idx = col_offset + b * block + jnp.arange(block)
        pad = (col_idx >= n_kmers)[None, :]
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (0, b * block), (2, block))
            pad_pres = pad | eb[0][None, :]
            pad_abs = pad | eb[1][None, :]
        else:
            pad_pres = pad_abs = pad
        cnf, cpf = cn.astype(jnp.float32), cp.astype(jnp.float32)
        u_pres = (nn - cnf) - ps[:, None] * (np_ - cpf)
        u_pres = jnp.where(
            pad_pres | ((cn == n_neg[:, None]) & (cp == n_pos[:, None])),
            neg_inf, u_pres)
        u_abs = cnf - ps[:, None] * cpf
        u_abs = jnp.where(pad_abs | ((cn == 0) & (cp == 0)), neg_inf, u_abs)

        bp = jnp.argmax(u_pres, axis=1)
        up = u_pres[rows, bp]
        ba = jnp.argmax(u_abs, axis=1)
        ua = u_abs[rows, ba]
        # Strict > keeps the earliest (lowest-index) maximum across
        # blocks, matching np.argmax first-occurrence semantics.
        take_p = up > bpu
        bpu = jnp.where(take_p, up, bpu)
        bpi = jnp.where(take_p, col_idx[bp], bpi)
        take_a = ua > bau
        bau = jnp.where(take_a, ua, bau)
        bai = jnp.where(take_a, col_idx[ba], bai)
        return (bpu, bpi, bau, bai), None

    init = (
        jnp.full((f,), neg_inf), jnp.zeros((f,), jnp.int32),
        jnp.full((f,), neg_inf), jnp.zeros((f,), jnp.int32),
    )
    if axis_name is not None:
        pcast = getattr(jax.lax, "pcast", None)
        if pcast is not None:
            init = tuple(pcast(x, axis_name, to="varying") for x in init)
        else:  # pragma: no cover - older jax
            init = tuple(jax.lax.pvary(x, axis_name) for x in init)
    (bpu, bpi, bau, bai), _ = jax.lax.scan(
        scan_block, init, jnp.arange(nb, dtype=jnp.int32)
    )
    return bpu, bpi.astype(jnp.int32), bau, bai.astype(jnp.int32)


def _fetch_columns(matrix, cols):
    """(F,) per-fit packed-column fetch -> (F, W) uint32.

    Single-column gathers (jnp.take on the minor axis, or vmapped (W, 1)
    dynamic_slice) make XLA materialize a relaid-out matrix copy — fatal at
    multi-GB matrix sizes. Wide (W, B) dynamic_slices lower to a cheap
    gather, so fetch a block and pick the lane.
    """
    w, k = matrix.shape
    b = min(1024, k)

    def take_block(c):
        start = jnp.minimum(c, k - b)
        return jax.lax.dynamic_slice(matrix, (0, start), (w, b)), c - start

    blocks, offs = jax.vmap(take_block)(cols)  # (F, W, B), (F,)
    return jnp.take_along_axis(
        blocks, offs[:, None, None].astype(jnp.int32), axis=2
    )[:, :, 0]


def _apply_rule(state, bits, use_abs, best_col, step_i, n_kmers):
    """Advance the fit state with the chosen rules' packed columns.

    state = (pos, neg, conj, rules, risks, n_rules, active) plus the
    constant fold-test inputs; bits (F, W) is each fit's rule column
    (already inverted for absence rules).
    """
    (pos, neg, conj, rules, risks, n_rules, active,
     tpos, tneg, n_tpos, n_tneg, is_disj) = state

    act = active[:, None]
    new_pos = jnp.where(act, pos & bits, pos)
    new_neg = jnp.where(act, neg & bits, neg)
    new_conj = jnp.where(act, conj & bits, conj)

    best_rule = jnp.where(
        use_abs, best_col + n_kmers, best_col
    ).astype(jnp.int32)
    rules = rules.at[:, step_i].set(jnp.where(active, best_rule, -1))
    risk = _fold_risks(new_conj, tpos, tneg, n_tpos, n_tneg, is_disj)
    # Inactive fits carry their last risk forward (the reference duplicates
    # the final element, experiment_scm.py:180-181).
    prev = risks[:, step_i]
    risks = risks.at[:, step_i + 1].set(jnp.where(active, risk, prev))
    n_rules = n_rules + active.astype(jnp.int32)
    n_neg_left = _popcount_rows(new_neg)
    new_active = active & (n_neg_left > 0)
    return new_pos, new_neg, new_conj, rules, risks, n_rules, new_active


def _grid_step_impl(matrix, pos, neg, conj, rules, risks, n_rules, active,
                    tpos, tneg, n_tpos, n_tneg, ps, is_disj, step_i,
                    n_kmers, block, sweep="xla", excl=None):
    """One greedy SCM iteration for ALL fits: one pass over the matrix.

    matrix: (W, Kp) uint32 packed presence (Kp a multiple of ``block``).
    pos/neg/conj: (F, W) uint32 packed state masks (fit space).
    rules (F, R) int32, risks (F, R+1) float32, n_rules (F,) int32,
    active (F,) bool; step_i is the traced iteration index. ``sweep``
    picks the matrix-pass backend: "xla" (block scan + MXU contraction),
    "pallas" (fused VMEM kernel), "pallas_interpret" (same, interpreter —
    for tests off-TPU).
    """
    n_neg = _popcount_rows(neg)
    n_pos = _popcount_rows(pos)

    if sweep in ("pallas", "pallas_interpret"):
        from ..ops.pallas_scm_sweep import scm_utility_argmax_pallas

        bpu, bpi, bau, bai = scm_utility_argmax_pallas(
            matrix, neg, pos,
            n_neg.astype(jnp.float32), n_pos.astype(jnp.float32), ps,
            n_kmers, interpret=(sweep == "pallas_interpret"),
        )
    else:
        bpu, bpi, bau, bai = _sweep_xla(
            matrix, pos, neg, ps, n_neg, n_pos, n_kmers, block,
            jnp.int32(0), excl=excl,
        )

    # Presence wins ties against absence (argmax-over-concat semantics).
    use_abs = bau > bpu
    best_col = jnp.where(use_abs, bai, bpi)

    packed = _fetch_columns(matrix, best_col)[:, : pos.shape[1]]  # (F, W)
    bits = jnp.where(use_abs[:, None], ~packed, packed)

    state = (pos, neg, conj, rules, risks, n_rules, active,
             tpos, tneg, n_tpos, n_tneg, is_disj)
    return _apply_rule(state, bits, use_abs, best_col, step_i, n_kmers)


@partial(
    jax.jit,
    static_argnames=("n_kmers", "block", "sweep", "max_rules"),
    donate_argnums=(1, 2, 3, 4, 5, 6, 7),
)
def _grid_run(matrix, pos, neg, conj, rules, risks, n_rules, active,
              tpos, tneg, n_tpos, n_tneg, ps, is_disj,
              n_kmers, block, sweep, max_rules, excl=None):
    """All greedy iterations in ONE program: lax.scan over _grid_step_impl
    (one dispatch and one fetch for the whole CV grid training)."""

    def body(state, i):
        pos, neg, conj, rules, risks, n_rules, active = state
        return _grid_step_impl(
            matrix, pos, neg, conj, rules, risks, n_rules, active,
            tpos, tneg, n_tpos, n_tneg, ps, is_disj, i,
            n_kmers, block, sweep, excl=excl,
        ), None

    state, _ = jax.lax.scan(
        body, (pos, neg, conj, rules, risks, n_rules, active),
        jnp.arange(max_rules, dtype=jnp.int32),
    )
    return state


def _grid_step_sharded_body(matrix_local, pos, neg, conj, rules, risks,
                            n_rules, active, tpos, tneg, n_tpos, n_tneg,
                            ps, is_disj, step_i, n_kmers, block, local_k,
                            sweep="xla", excl_local=None):
    """Per-shard body of one greedy iteration (runs under shard_map).

    matrix_local: this device's (W, local_k) column shard; every other
    operand is replicated. Communication per iteration: one all_gather of
    4 (F,) arrays + one (F, W) psum — O(F x W), independent of K.
    ``sweep`` picks the local matrix-pass backend (same choices as
    :func:`_grid_step_impl`); the fused Pallas kernel runs per shard.
    ``excl_local``: this shard's (2, local_k) slice of the rule-exclusion
    mask (k-mer blacklist) — sharded with the columns, no collective
    needed (each shard only ever scores its own columns).
    """
    f = pos.shape[0]
    shard = jax.lax.axis_index("cols")
    col_offset = (shard * local_k).astype(jnp.int32)

    n_neg = _popcount_rows(neg)
    n_pos = _popcount_rows(pos)
    if sweep in ("pallas", "pallas_interpret"):
        from ..ops.pallas_scm_sweep import scm_utility_argmax_pallas

        # The kernel indexes columns locally. The number of VALID local
        # columns differs per shard (global zero-padding lands on the tail
        # shards, and a zero column is a legal presence rule that must not
        # win), so pass the per-shard valid count as a traced limit.
        local_valid = jnp.clip(n_kmers - col_offset, 0, local_k)
        bpu, bpi_l, bau, bai_l = scm_utility_argmax_pallas(
            matrix_local, neg, pos,
            n_neg.astype(jnp.float32), n_pos.astype(jnp.float32), ps,
            local_k, interpret=(sweep == "pallas_interpret"),
            col_limit=local_valid,
        )
        bpi = bpi_l + col_offset
        bai = bai_l + col_offset
    else:
        bpu, bpi, bau, bai = _sweep_xla(
            matrix_local, pos, neg, ps, n_neg, n_pos, n_kmers, block,
            col_offset, axis_name="cols", excl=excl_local,
        )

    # Global winner per fit and half: shards are ordered by column range,
    # so first-occurrence argmax over the gathered axis keeps the lowest
    # global column among exact ties.
    g_bpu = jax.lax.all_gather(bpu, "cols")  # (S, F)
    g_bpi = jax.lax.all_gather(bpi, "cols")
    g_bau = jax.lax.all_gather(bau, "cols")
    g_bai = jax.lax.all_gather(bai, "cols")
    rows = jnp.arange(f)
    sp = jnp.argmax(g_bpu, axis=0)
    bpu = g_bpu[sp, rows]
    bpi = g_bpi[sp, rows]
    sa = jnp.argmax(g_bau, axis=0)
    bau = g_bau[sa, rows]
    bai = g_bai[sa, rows]

    use_abs = bau > bpu
    best_col = jnp.where(use_abs, bai, bpi)

    # Fetch each winning rule's packed column from its owner shard: the
    # non-owners contribute zero words, so a psum broadcasts the column.
    owner = (best_col >= col_offset) & (best_col < col_offset + local_k)
    local_idx = jnp.clip(best_col - col_offset, 0, local_k - 1)
    packed = _fetch_columns(matrix_local, local_idx)  # (F, W)
    packed = jnp.where(owner[:, None], packed, jnp.uint32(0))
    packed = jax.lax.psum(packed, "cols")[:, : pos.shape[1]]
    bits = jnp.where(use_abs[:, None], ~packed, packed)

    state = (pos, neg, conj, rules, risks, n_rules, active,
             tpos, tneg, n_tpos, n_tneg, is_disj)
    return _apply_rule(state, bits, use_abs, best_col, step_i, n_kmers)


@partial(jax.jit, static_argnames=("row_pad", "col_pad"))
def _pad_matrix(matrix, row_pad, col_pad):
    return jnp.pad(matrix, ((0, row_pad), (0, col_pad)))


def _build_fit_arrays(fits):
    """Fit-state arrays in numpy: identical bytes on every process, so they
    feed multi-process (multi-host) jits as replicated inputs directly."""
    pos = np.stack([f["pos_mask"] for f in fits])
    neg = np.stack([f["neg_mask"] for f in fits])
    tpos = np.stack([f["test_pos_mask"] for f in fits])
    tneg = np.stack([f["test_neg_mask"] for f in fits])
    ps = np.array([f["p"] for f in fits], np.float32)
    is_disj = np.array(
        [f["model_type"] == "disjunction" for f in fits], bool
    )
    return pos, neg, tpos, tneg, ps, is_disj


def _init_state(pos, neg, tpos, tneg, is_disj, n_fits, max_rules):
    """Initial fit state in numpy (same multi-process rationale as above).

    The empty model predicts all 1 (conj mask all-ones), so the length-0
    risk reduces to n_tneg/n_test (conjunction) or n_tpos/n_test
    (disjunction) — float32, matching :func:`_fold_risks` exactly.
    """
    n_tpos = np.bitwise_count(tpos).sum(-1).astype(np.float32)
    n_tneg = np.bitwise_count(tneg).sum(-1).astype(np.float32)
    conj = np.full_like(pos, np.uint32(0xFFFFFFFF))
    rules = np.full((n_fits, max_rules), -1, np.int32)
    risks = np.zeros((n_fits, max_rules + 1), np.float32)
    n_test = np.maximum(n_tpos + n_tneg, np.float32(1.0))
    risks[:, 0] = np.where(is_disj, n_tpos, n_tneg) / n_test
    n_rules = np.zeros((n_fits,), np.int32)
    active = np.bitwise_count(neg).sum(-1) > 0
    return conj, rules, risks, n_rules, active, n_tpos, n_tneg


def scm_cv_grid_device(matrix, fits, n_kmers, max_rules, block=None,
                       sweep=None, excl_rules=None):
    """Run the batched CV fits, iteration-major on the MXU.

    Same contract as :func:`grm_tpu.parallel.scm_device.scm_cv_batch_device`:
    ``fits`` is a list of dicts with keys pos_mask, neg_mask, test_pos_mask,
    test_neg_mask (numpy uint32 (W,)), p (float), model_type (str); returns
    (rules (F, max_rules) int32 [-1 pad], n_rules (F,) int32,
    risks (F, max_rules+1) float32) as numpy arrays.

    ``sweep`` picks the matrix-pass backend ("xla", "pallas",
    "pallas_interpret"); default is the fused Pallas kernel on TPU and the
    XLA block scan elsewhere. ``excl_rules`` (optional int array, values in
    [0, 2K)): blacklisted rules (presence idx k, absence idx k + n_kmers)
    excluded from selection — the k-mer-blacklist contract of
    experiment_scm.py:632-671. Exclusion masking lives in the XLA sweep, so
    a non-empty blacklist selects sweep="xla".
    """
    if excl_rules is not None and len(excl_rules):
        sweep = "xla"
    if sweep is None:
        sweep = "pallas" if jax.default_backend() == "tpu" else "xla"
    pos, neg, tpos, tneg, ps, is_disj = _build_fit_arrays(fits)
    n_fits = len(fits)

    matrix = matrix if isinstance(matrix, jax.Array) else jnp.asarray(matrix)
    if matrix.dtype != jnp.uint32:
        raise ValueError("grid engine expects a uint32-packed matrix")
    w, kp = matrix.shape
    if sweep == "xla":
        if block is None:
            block = _pick_block(kp, n_fits)
        col_pad = (-kp) % block
        if col_pad:
            matrix = _pad_matrix(matrix, 0, col_pad)
    else:
        # The pallas sweep consumes the matrix in place (no padding copies).
        block = 0  # unused by the pallas sweep

    conj, rules, risks, n_rules, active, n_tpos, n_tneg = _init_state(
        pos, neg, tpos, tneg, is_disj, n_fits, max_rules
    )

    excl = None
    if excl_rules is not None and len(excl_rules):
        excl_np = np.zeros((2, matrix.shape[1]), bool)
        er = np.asarray(excl_rules, np.int64)
        excl_np[0, er[er < n_kmers]] = True
        excl_np[1, er[er >= n_kmers] - n_kmers] = True
        excl = jnp.asarray(excl_np)

    # Materialize the donated state on device (donating host numpy buffers
    # only triggers copy warnings).
    pos, neg, conj, rules, risks, n_rules, active = (
        jnp.asarray(a) for a in (pos, neg, conj, rules, risks, n_rules,
                                 active)
    )
    pos, neg, conj, rules, risks, n_rules, active = _grid_run(
        matrix, pos, neg, conj, rules, risks, n_rules, active,
        tpos, tneg, n_tpos, n_tneg, ps, is_disj,
        n_kmers, block, sweep, max_rules, excl=excl,
    )
    rules, n_rules, risks = jax.device_get((rules, n_rules, risks))
    return np.asarray(rules), np.asarray(n_rules), np.asarray(risks)


def scm_cv_grid_sharded(matrix, fits, n_kmers, max_rules, mesh, block=None,
                        sweep=None, excl_rules=None):
    """Column-sharded CV grid engine over a ("rows", "cols") mesh.

    Same contract as :func:`scm_cv_grid_device`. The matrix's k-mer columns
    are sharded over the mesh "cols" axis (the reference's 43M-column "long
    axis"); fit state is replicated. Requires an unsharded word-row axis
    (``rows`` size 1) — row-sharded matrices take the scan engine instead.
    ``sweep`` picks each shard's local matrix-pass backend ("xla",
    "pallas", "pallas_interpret"); default is the fused Pallas kernel on
    TPU and the XLA block scan elsewhere. ``excl_rules``: blacklisted rule
    indices in [0, 2K) — the exclusion mask shards with the columns (each
    shard masks only its own columns; no collective), and a non-empty
    blacklist selects the XLA sweep like the unsharded engine.
    """
    if mesh.shape.get("rows", 1) != 1:
        raise ValueError(
            "scm_cv_grid_sharded shards columns only; use the scan engine "
            "for row-sharded matrices"
        )
    if excl_rules is not None and len(excl_rules):
        sweep = "xla"
    if sweep is None:
        sweep = "pallas" if jax.default_backend() == "tpu" else "xla"
    n_shards = mesh.shape["cols"]
    pos, neg, tpos, tneg, ps, is_disj = _build_fit_arrays(fits)
    n_fits = len(fits)

    if matrix.dtype != np.uint32:
        raise ValueError("grid engine expects a uint32-packed matrix")
    kp = matrix.shape[1]
    if sweep == "xla":
        if block is None:
            block = _pick_block(-(-kp // n_shards), n_fits)
        shard_multiple = n_shards * block
    else:
        block = 0  # the pallas sweep needs no block-multiple padding
        shard_multiple = n_shards
    col_pad = (-kp) % shard_multiple
    sharding = NamedSharding(mesh, P(None, "cols"))
    if not isinstance(matrix, jax.Array):
        # Host value (identical on every process): pad in numpy and place
        # the global array directly — works single- and multi-process.
        if col_pad:
            matrix = np.pad(np.asarray(matrix), ((0, 0), (0, col_pad)))
        matrix = jax.device_put(matrix, sharding)
    elif col_pad or matrix.sharding != sharding:
        pad_fn = jax.jit(
            lambda m: jnp.pad(m, ((0, 0), (0, col_pad))),
            out_shardings=sharding,
        )
        matrix = pad_fn(matrix)
    local_k = matrix.shape[1] // n_shards

    excl = None
    if excl_rules is not None and len(excl_rules):
        excl_np = np.zeros((2, matrix.shape[1]), bool)
        er = np.asarray(excl_rules, np.int64)
        excl_np[0, er[er < n_kmers]] = True
        excl_np[1, er[er >= n_kmers] - n_kmers] = True
        excl = jax.device_put(excl_np, sharding)

    conj, rules, risks, n_rules, active, n_tpos, n_tneg = _init_state(
        pos, neg, tpos, tneg, is_disj, n_fits, max_rules
    )
    # Replicate the fit state across the mesh explicitly (numpy values are
    # process-invariant), so the step can donate real device buffers.
    rep_sharding = NamedSharding(mesh, P())
    (pos, neg, conj, rules, risks, n_rules, active,
     tpos, tneg, n_tpos, n_tneg, ps, is_disj) = (
        jax.device_put(a, rep_sharding)
        for a in (pos, neg, conj, rules, risks, n_rules, active,
                  tpos, tneg, n_tpos, n_tneg, ps, is_disj)
    )

    def run_body(matrix_local, excl_local, pos, neg, conj, rules, risks,
                 n_rules, active, tpos, tneg, n_tpos, n_tneg, ps, is_disj):
        # All greedy iterations per shard in one program (collectives
        # inside the scan body ride the mesh every iteration).
        def body(state, i):
            pos, neg, conj, rules, risks, n_rules, active = state
            return _grid_step_sharded_body(
                matrix_local, pos, neg, conj, rules, risks, n_rules,
                active, tpos, tneg, n_tpos, n_tneg, ps, is_disj, i,
                n_kmers=n_kmers, block=block, local_k=local_k, sweep=sweep,
                excl_local=excl_local,
            ), None

        state, _ = jax.lax.scan(
            body, (pos, neg, conj, rules, risks, n_rules, active),
            jnp.arange(max_rules, dtype=jnp.int32),
        )
        return state

    rep = P()
    excl_spec = P(None, "cols") if excl is not None else rep
    run = jax.jit(
        jax.shard_map(
            run_body,
            mesh=mesh,
            in_specs=(P(None, "cols"), excl_spec) + (rep,) * 13,
            out_specs=(rep,) * 7,
            # Outputs are identical on every shard after the all_gather +
            # psum combines, which the varying-axis inference can't prove.
            check_vma=False,
        ),
        donate_argnums=(2, 3, 4, 5, 6, 7, 8),
    )

    pos, neg, conj, rules, risks, n_rules, active = run(
        matrix, excl, pos, neg, conj, rules, risks, n_rules, active,
        tpos, tneg, n_tpos, n_tneg, ps, is_disj,
    )
    rules, n_rules, risks = jax.device_get((rules, n_rules, risks))
    return np.asarray(rules), np.asarray(n_rules), np.asarray(risks)
