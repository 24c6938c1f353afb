"""Exact-parity device SCM engine: bit-identical selection, MXU sweeps.

The pure-argmax grid engine (:mod:`grm_tpu.parallel.scm_grid`) is the
speed-of-light path, but it resolves utility ties to the lowest rule index
instead of the reference's semantics. This engine closes that gap without
giving up the device: selection is *bit-identical* to the reference host
path (``learning/learners/scm.py:238-288`` + the risk-table tiebreaker of
``experiment_scm.py:120-130``), yet the count vectors never leave HBM.

Per greedy iteration, for all F fits of a CV grid at once:

1. **Pass 1 (device, MXU)** — one blocked pass over the packed matrix
   computes every rule's presence counts as an int8 x int8 -> int32
   contraction and reduces them to per-*superblock* float32 utility maxima
   ``(F, NSB)`` plus the per-fit global max. Nothing big is fetched.
2. **Threshold (host)** — exact-tie candidates can only live above
   ``gmax - margin``, where the margin provably over-covers both the
   reference's ``np.isclose``/``np.allclose`` radii (rtol 1e-5, atol 1e-8)
   and the float32 evaluation error of pass 1 (counts are exact int32;
   only the ``p *`` product and subtractions round). Over-inclusion is
   harmless: membership is re-decided exactly on the host in step 4.
3. **Pass 2 (device)** — gather ``(rule, neg_count, pos_count)`` triples
   from the hit superblocks only, compacted on device (sort-based) to a
   small fixed budget with raw-superblock escalation on overflow. The
   fetch is a few hundred KB instead of the 2K-length count vector.
4. **Replay (host, float64)** — over the candidate pool, re-run the
   reference's exact blockwise utility scan (``UTIL_BLOCK_SIZE`` = 1e6
   blocks, the ``np.allclose`` accumulate-without-raising-best quirk, the
   ``np.isclose`` tie sets), the zero-coverage filter
   (scm.py:108-114), and the fold-risk-table tiebreaker
   (experiment_scm.py:120-130). Candidate counts are exact integers, so
   the float64 utilities — and therefore every tie decision — are
   bit-identical to the host engine. The safety argument: the final
   "best" utility is within one isclose radius of the global max, tie
   members within three radii, and everything below the threshold is
   more than that away, so no member can be missed.
5. **Apply (device)** — the chosen rules' packed columns update the fit
   state (pos/neg/conjunction masks) and the fold-test error *counts*
   (exact ints) come back, so CV risks are computed on the host in
   float64 exactly like the reference.

The engine therefore returns the same rules, the same equivalence (tie)
sets, and the same fold risks as the host parity engine, while reading the
matrix twice per greedy iteration on the MXU (pass 1 + the tiny pass 2)
instead of streaming 2K-length count vectors to the host.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .scm_grid import _fetch_columns, _popcount_rows, _unpack_words

__all__ = ["ExactScmEngine", "UTIL_BLOCK_SIZE"]

UTIL_BLOCK_SIZE = 1000000  # reference scm.py:29
_RTOL, _ATOL = 1.0e-5, 1.0e-8  # np.isclose / np.allclose defaults
_F32_EPS = 1.2e-7


@partial(jax.jit, static_argnames=("sb",))
def _pass1(matrix, neg, pos, ps, n_kmers, sb, excl=None):
    """Per-superblock max utility (F, NSB) float32 + per-fit global max.

    Utilities follow the reference's definition per rule half:
    presence u = (n_neg - cn) - p * (n_pos - cp); absence u = cn - p * cp,
    with cn/cp the k-mer presence counts among negative/positive examples.
    Padding columns (>= n_kmers) and blacklisted rules are -inf. The
    zero-coverage rule filter is NOT applied here — the reference applies
    it after tie accumulation (scm.py:108-114), which the host replay does.
    """
    f = neg.shape[0]
    w, kp = matrix.shape
    nsb = kp // sb
    neg_inf = jnp.float32(-jnp.inf)

    masks_dense = _unpack_words(
        jnp.concatenate([neg, pos], axis=0).T
    ).T  # (2F, 32W) int8
    nn = _popcount_rows(neg)[:, None].astype(jnp.float32)
    np_ = _popcount_rows(pos)[:, None].astype(jnp.float32)

    def scan_block(sbmax, b):
        mb = jax.lax.dynamic_slice(matrix, (0, b * sb), (w, sb))
        xb = _unpack_words(mb)  # (32W, sb) int8
        counts = jax.lax.dot_general(
            masks_dense, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2F, sb)
        cnf = counts[:f].astype(jnp.float32)
        cpf = counts[f:].astype(jnp.float32)
        col = b * sb + jnp.arange(sb)
        pad = (col >= n_kmers)[None, :]
        u_pres = (nn - cnf) - ps[:, None] * (np_ - cpf)
        u_abs = cnf - ps[:, None] * cpf
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (0, b * sb), (2, sb))
            u_pres = jnp.where(pad | eb[0][None, :], neg_inf, u_pres)
            u_abs = jnp.where(pad | eb[1][None, :], neg_inf, u_abs)
        else:
            u_pres = jnp.where(pad, neg_inf, u_pres)
            u_abs = jnp.where(pad, neg_inf, u_abs)
        m = jnp.maximum(u_pres, u_abs).max(axis=1)  # (F,)
        return jax.lax.dynamic_update_slice(sbmax, m[:, None], (0, b)), None

    sbmax, _ = jax.lax.scan(
        scan_block, jnp.full((f, nsb), neg_inf), jnp.arange(nsb)
    )
    return sbmax, sbmax.max(axis=1)


@partial(jax.jit, static_argnames=("m",))
def _hit_sbs(sbmax, thresh, m):
    """Superblocks whose max reaches the per-fit threshold.

    Returns (F, m) int32 superblock indices (ascending, -1 padded) and the
    true per-fit hit counts (for overflow escalation).
    """
    f, nsb = sbmax.shape
    hit = sbmax >= thresh[:, None]
    key = jnp.where(hit, jnp.arange(nsb, dtype=jnp.int32)[None, :],
                    jnp.int32(nsb))
    key = jax.lax.sort(key, dimension=1)[:, :m]
    return (jnp.where(key < nsb, key, -1),
            hit.sum(axis=1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("sb", "cmax"))
def _pass2(matrix, neg, pos, ps, pair_f, pair_sb, thresh, n_kmers, sb, cmax,
           excl=None):
    """Candidate (rule, cn, cp) triples per hit (fit, superblock) pair.

    Counts are exact int32; candidacy is ``u_f32 >= thresh[fit]`` — an
    over-inclusive superset, with the exact decision replayed on the host.
    Compacted per pair to ``cmax`` entries; the true per-pair candidate
    count is returned for overflow escalation.
    """
    w = matrix.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    def one(fi, sbi):
        mslice = jax.lax.dynamic_slice(matrix, (0, sbi * sb), (w, sb))
        xb = _unpack_words(mslice)  # (32W, sb)
        mdense = _unpack_words(
            jnp.stack([neg[fi], pos[fi]], axis=1)
        ).T  # (2, 32W)
        counts = jax.lax.dot_general(
            mdense, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2, sb)
        cn, cp = counts[0], counts[1]
        nn = jnp.sum(jax.lax.population_count(neg[fi])).astype(jnp.float32)
        np_ = jnp.sum(jax.lax.population_count(pos[fi])).astype(jnp.float32)
        col = sbi * sb + jnp.arange(sb)
        pad = col >= n_kmers
        cnf, cpf = cn.astype(jnp.float32), cp.astype(jnp.float32)
        u_pres = (nn - cnf) - ps[fi] * (np_ - cpf)
        u_abs = cnf - ps[fi] * cpf
        if excl is not None:
            eb = jax.lax.dynamic_slice(excl, (0, sbi * sb), (2, sb))
            u_pres = jnp.where(pad | eb[0], neg_inf, u_pres)
            u_abs = jnp.where(pad | eb[1], neg_inf, u_abs)
        else:
            u_pres = jnp.where(pad, neg_inf, u_pres)
            u_abs = jnp.where(pad, neg_inf, u_abs)
        uflat = jnp.concatenate([u_pres, u_abs])  # (2sb,) presence|absence
        mask = uflat >= thresh[fi]
        key = jnp.where(mask, jnp.arange(2 * sb, dtype=jnp.int32),
                        jnp.int32(2 * sb))
        order = jax.lax.sort(key)[:cmax]
        valid = order < 2 * sb
        j = jnp.where(valid, order, 0)
        jcol = j % sb
        ridx = sbi * sb + jcol + jnp.where(j >= sb, n_kmers, 0)
        cn2 = jnp.concatenate([cn, cn])[j]
        cp2 = jnp.concatenate([cp, cp])[j]
        return (jnp.where(valid, ridx, -1).astype(jnp.int32),
                jnp.where(valid, cn2, -1),
                jnp.where(valid, cp2, -1),
                mask.sum().astype(jnp.int32))

    return jax.vmap(one)(pair_f, pair_sb)


def _apply_and_stats(matrix, pos, neg, conj, tpos, tneg, is_disj, chosen,
                     use_abs, valid):
    """Apply the chosen rules (no-op rows where valid is False) and compute
    the post-apply test errors + remaining example counts."""
    w32 = pos.shape[1]
    packed = _fetch_columns(matrix, chosen)[:, :w32]
    bits = jnp.where(use_abs[:, None], ~packed, packed)
    act = valid[:, None]
    pos = jnp.where(act, pos & bits, pos)
    neg = jnp.where(act, neg & bits, neg)
    conj = jnp.where(act, conj & bits, conj)
    n_tpos = _popcount_rows(tpos)
    n_tneg = _popcount_rows(tneg)
    pos_pred1 = _popcount_rows(tpos & conj)
    neg_pred1 = _popcount_rows(tneg & conj)
    conj_err = (n_tpos - pos_pred1) + neg_pred1
    disj_err = pos_pred1 + (n_tneg - neg_pred1)
    err = jnp.where(is_disj, disj_err, conj_err)
    return (pos, neg, conj, err, _popcount_rows(neg), _popcount_rows(pos))


def _probe_state(matrix, pos, neg, ps, active, n_neg_now, n_kmers, sb,
                 hit_m, cmax, fc, excl):
    """Pass 1 + thresholds + hit superblocks + candidate gather for the
    current state (the per-iteration probe the host replays from)."""
    sbmax, gmax = _pass1(matrix, neg, pos, ps, n_kmers, sb, excl=excl)

    # Thresholds on device (same margins as ExactScmEngine._thresholds;
    # float32 evaluation of the margin only wiggles it by ulps, and the
    # margin carries 2x headroom).
    radius = _ATOL + _RTOL * jnp.abs(gmax)
    scale = n_neg_now.astype(jnp.float32) + 4.0 * jnp.abs(gmax) + 1.0
    fslack = 4.0 * _F32_EPS * scale
    thresh = gmax - 8.0 * radius - 4.0 * fslack - _ATOL
    thresh = jnp.where(active & (n_neg_now > 0), thresh, jnp.inf)

    # Top hit superblocks per fit.
    f, nsb = sbmax.shape
    hit = sbmax >= thresh[:, None]
    key = jnp.where(hit, jnp.arange(nsb, dtype=jnp.int32)[None, :],
                    jnp.int32(nsb))
    hits = jax.lax.sort(key, dimension=1)  # ascending sb idx, nsb = dead
    if hits.shape[1] < hit_m:
        # Fewer superblocks than slots: pad with the dead sentinel —
        # slicing with a traced j would otherwise CLAMP out-of-range
        # indices to column 0 and gather duplicates.
        hits = jnp.pad(hits, ((0, 0), (0, hit_m - hits.shape[1])),
                       constant_values=nsb)
    else:
        hits = hits[:, :hit_m]
    hit_count = hit.sum(axis=1).astype(jnp.int32)

    # Candidate gather over the (F, hit_m) speculative pairs.
    w = matrix.shape[0]
    masks_dense = _unpack_words(
        jnp.concatenate([neg, pos], axis=0).T
    ).T  # (2F, 32W)
    nn = _popcount_rows(neg).astype(jnp.float32)
    np_ = _popcount_rows(pos).astype(jnp.float32)
    rowsF = jnp.arange(f)
    neg_inf = jnp.float32(-jnp.inf)

    # Fit-axis chunking for the candidate gather: each vmapped lane
    # materializes a (32W, sb) int8 unpack (~84 MB at 5022 genomes x
    # sb=16384), so a full-width vmap over the 128-fit bucket asks the
    # compiler for ~10 GB of temps — the remote compile helper dies
    # (HTTP 500, exit 1) rather than compile it. fc lanes per scan step
    # bound the temp; small shapes keep fc=F (no behavior change).
    fcw = f if fc is None else min(fc, f)

    def gather_j(_, j):
        sbi_all = jnp.where(hits[:, j] < nsb, hits[:, j], 0)
        live = hits[:, j] < nsb

        def one(fi, s):
            mslice = jax.lax.dynamic_slice(matrix, (0, s * sb), (w, sb))
            xb = _unpack_words(mslice)
            md = jnp.stack([masks_dense[fi], masks_dense[f + fi]])  # (2,32W)
            counts = jax.lax.dot_general(
                md, xb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            cn, cp = counts[0], counts[1]
            col = s * sb + jnp.arange(sb)
            pad = col >= n_kmers
            cnf, cpf = cn.astype(jnp.float32), cp.astype(jnp.float32)
            u_pres = (nn[fi] - cnf) - ps[fi] * (np_[fi] - cpf)
            u_abs = cnf - ps[fi] * cpf
            if excl is not None:
                eb = jax.lax.dynamic_slice(excl, (0, s * sb), (2, sb))
                u_pres = jnp.where(pad | eb[0], neg_inf, u_pres)
                u_abs = jnp.where(pad | eb[1], neg_inf, u_abs)
            else:
                u_pres = jnp.where(pad, neg_inf, u_pres)
                u_abs = jnp.where(pad, neg_inf, u_abs)
            uflat = jnp.concatenate([u_pres, u_abs])
            m = uflat >= thresh[fi]
            kk = jnp.where(m, jnp.arange(2 * sb, dtype=jnp.int32),
                           jnp.int32(2 * sb))
            order = jax.lax.sort(kk)[:cmax]
            v = order < 2 * sb
            jj = jnp.where(v, order, 0)
            ridx = s * sb + jj % sb + jnp.where(jj >= sb, n_kmers, 0)
            return (jnp.where(v, ridx, -1).astype(jnp.int32),
                    jnp.where(v, jnp.concatenate([cn, cn])[jj], -1),
                    jnp.where(v, jnp.concatenate([cp, cp])[jj], -1),
                    m.sum().astype(jnp.int32))

        if fcw >= f:
            cols_j, cn_j, cp_j, cc_j = jax.vmap(one)(rowsF, sbi_all)
        else:
            def chunk_body(_, ci):
                fis = ci * fcw + jnp.arange(fcw)
                s_c = jax.lax.dynamic_slice(sbi_all, (ci * fcw,), (fcw,))
                return None, jax.vmap(one)(fis, s_c)

            _, (cols_c, cn_c, cp_c, cc_c) = jax.lax.scan(
                chunk_body, None, jnp.arange(f // fcw))
            cols_j = cols_c.reshape(f, -1)
            cn_j = cn_c.reshape(f, -1)
            cp_j = cp_c.reshape(f, -1)
            cc_j = cc_c.reshape(f)
        cols_j = jnp.where(live[:, None], cols_j, -1)
        cc_j = jnp.where(live, cc_j, 0)
        return None, (cols_j, cn_j, cp_j, cc_j)

    _, (cols, cn, cp, ccount) = jax.lax.scan(
        gather_j, None, jnp.arange(hit_m)
    )  # leading axis hit_m -> (hit_m, F, cmax) etc.
    return gmax, hit_count, cols, cn, cp, ccount, sbmax


@partial(jax.jit,
         static_argnames=("sb", "hit_m", "cmax", "fc"),
         donate_argnums=(1, 2, 3))
def _fused_step(matrix, pos, neg, conj, tpos, tneg, ps, is_disj,
                chosen, use_abs, valid, active, n_kmers, sb, hit_m, cmax,
                excl=None, fc=None):
    """Apply the previous selection AND gather the next iteration's
    candidates in ONE program — a single host round trip per greedy
    iteration (the tunnel's dispatch latency, not compute, dominates the
    e2e learn wall-clock otherwise).

    Returns (pos, neg, conj) [device state], plus (err, n_neg, n_pos,
    gmax, hit_count, cand_cols, cand_cn, cand_cp, cand_count, sbmax) —
    the small arrays are fetched together; ``sbmax`` is only pulled on
    budget overflow (the slow-path fallback needs it).
    """
    pos, neg, conj, err, n_neg_now, n_pos_now = _apply_and_stats(
        matrix, pos, neg, conj, tpos, tneg, is_disj, chosen, use_abs,
        valid)
    gmax, hit_count, cols, cn, cp, ccount, sbmax = _probe_state(
        matrix, pos, neg, ps, active, n_neg_now, n_kmers, sb, hit_m, cmax,
        fc, excl)
    return (pos, neg, conj, err, n_neg_now, n_pos_now, gmax, hit_count,
            cols, cn, cp, ccount, sbmax)


def _device_guess(cols, cn, cp, nn, np_, ps, is_disj, risk_tabs, tab_id,
                  has_tab, n_kmers):
    """Approximate the host's exact selection over the gathered pools —
    f32 utility max, risk-index tiebreak (min for conjunctions, max for
    disjunctions — risks ride as unique-risk INDICES, whose order equals
    the risk order), lowest rule index. The HOST always verifies against
    its exact float64 replay, so a wrong guess costs one extra round
    trip, never correctness. Returns (guess rule idx, guess_valid)."""
    hit_m, f, cmax = cols.shape
    r = jnp.transpose(cols, (1, 0, 2)).reshape(f, hit_m * cmax)
    cnv = jnp.transpose(cn, (1, 0, 2)).reshape(f, hit_m * cmax)
    cpv = jnp.transpose(cp, (1, 0, 2)).reshape(f, hit_m * cmax)
    valid = r >= 0
    pres = r < n_kmers
    ncov = jnp.where(pres, nn[:, None] - cnv, cnv)
    perr = jnp.where(pres, np_[:, None] - cpv, cpv)
    u = ncov.astype(jnp.float32) - ps[:, None] * perr.astype(jnp.float32)
    ok = valid & ((ncov != 0) | (perr != 0))
    u = jnp.where(ok, u, -jnp.inf)
    m = u.max(axis=1)
    sel = ok & (u == m[:, None])

    big = jnp.int32(0x7FFFFFFF)
    r_safe = jnp.where(valid, r, 0)
    riskv = jax.vmap(lambda tid, rr: risk_tabs[tid][rr])(tab_id, r_safe)
    rk_min = jnp.where(sel, riskv, big).min(axis=1)
    rk_max = jnp.where(sel, riskv, -1).max(axis=1)
    rstar = jnp.where(is_disj, rk_max, rk_min)
    sel2 = sel & (riskv == rstar[:, None])
    g = jnp.where(sel2, r, big).min(axis=1)
    g_valid = jnp.isfinite(m) & (g < big) & has_tab
    return g, g_valid


@partial(jax.jit,
         static_argnames=("sb", "hit_m", "cmax", "fc"),
         donate_argnums=(1, 2, 3, 4, 5, 6))
def _spec_step(matrix, pos1, neg1, conj1, pos2, neg2, conj2, use_prev,
               tpos, tneg, ps, is_disj, chosenA, use_absA, validA, active,
               risk_tabs, tab_id, has_tab, n_kmers, sb, hit_m, cmax,
               excl=None, fc=None):
    """Speculative DOUBLE greedy iteration in one round trip.

    Applies the host-verified selection to the per-fit base state
    (``use_prev`` picks the pre-speculation checkpoint on a miss), probes
    the result (pools P1), lets the device GUESS the winner, commits the
    guess, and probes again (pools P2). The host replays P1 exactly: on a
    guess hit it already holds the next iteration's pools — two greedy
    iterations per tunnel round trip; on a miss the returned checkpoint
    state makes the next dispatch a correction. Selection stays
    bit-identical by construction (the guess only decides WHICH
    precomputed results are usable, never what is selected).
    """
    base_pos = jnp.where(use_prev[:, None], pos1, pos2)
    base_neg = jnp.where(use_prev[:, None], neg1, neg2)
    base_conj = jnp.where(use_prev[:, None], conj1, conj2)

    s1_pos, s1_neg, s1_conj, err1, nn1, np1 = _apply_and_stats(
        matrix, base_pos, base_neg, base_conj, tpos, tneg, is_disj,
        chosenA, use_absA, validA)
    act1 = active & (nn1 > 0)
    gmax1, hc1, cols1, cn1, cp1, cc1, sbmax1 = _probe_state(
        matrix, s1_pos, s1_neg, ps, act1, nn1, n_kmers, sb, hit_m, cmax,
        fc, excl)

    guess, g_valid = _device_guess(
        cols1, cn1, cp1, nn1, np1, ps, is_disj, risk_tabs, tab_id,
        has_tab, n_kmers)
    g_valid = g_valid & act1
    g_col = jnp.where(g_valid, guess % n_kmers, 0).astype(jnp.int32)
    g_abs = g_valid & (guess >= n_kmers)

    s2_pos, s2_neg, s2_conj, err2, nn2, np2 = _apply_and_stats(
        matrix, s1_pos, s1_neg, s1_conj, tpos, tneg, is_disj,
        g_col, g_abs, g_valid)
    act2 = g_valid & (nn2 > 0)
    gmax2, hc2, cols2, cn2, cp2, cc2, sbmax2 = _probe_state(
        matrix, s2_pos, s2_neg, ps, act2, nn2, n_kmers, sb, hit_m, cmax,
        fc, excl)

    return (s1_pos, s1_neg, s1_conj, s2_pos, s2_neg, s2_conj,
            err1, nn1, np1, gmax1, hc1, cols1, cn1, cp1, cc1, sbmax1,
            guess, g_valid,
            err2, nn2, np2, gmax2, hc2, cols2, cn2, cp2, cc2, sbmax2)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _apply_step(pos, neg, conj, tpos, tneg, bits_packed, use_abs, valid,
                is_disj):
    """Streamed-mode state update: apply host-fetched rule columns.

    ``bits_packed`` (F, W) uint32 — the chosen rules' packed presence
    columns, gathered from the HOST matrix (no device matrix exists in
    streamed mode). Same math as the apply prologue of _fused_step.
    """
    bits = jnp.where(use_abs[:, None], ~bits_packed, bits_packed)
    act = valid[:, None]
    pos = jnp.where(act, pos & bits, pos)
    neg = jnp.where(act, neg & bits, neg)
    conj = jnp.where(act, conj & bits, conj)
    n_tpos = _popcount_rows(tpos)
    n_tneg = _popcount_rows(tneg)
    pos_pred1 = _popcount_rows(tpos & conj)
    neg_pred1 = _popcount_rows(tneg & conj)
    conj_err = (n_tpos - pos_pred1) + neg_pred1
    disj_err = pos_pred1 + (n_tneg - neg_pred1)
    err = jnp.where(is_disj, disj_err, conj_err)
    return (pos, neg, conj, err, _popcount_rows(neg), _popcount_rows(pos))


def _replay_block_scan(idx, cn, cp, n_neg, n_pos, p, n_kmers):
    """The reference's blockwise utility max + tie accumulation, exactly.

    ``idx`` (ascending rule indices in [0, 2K)), ``cn``/``cp`` the exact
    presence counts among negatives/positives. Reproduces
    scm.py:255-288 over the candidate pool: float64 utilities, 1e6-rule
    blocks, the allclose-accumulate-without-raising-best quirk, isclose
    tie sets. Returns (tie_idx, tie_pos_err, tie_neg_cover) in the order
    the reference would produce.
    """
    presence = idx < n_kmers
    neg_cover = np.where(presence, n_neg - cn, cn).astype(np.int64)
    pos_err = np.where(presence, n_pos - cp, cp).astype(np.int64)
    u = neg_cover - float(p) * pos_err.astype(np.float64)

    best = -np.inf
    best_idx = np.array([], dtype=np.int64)
    best_pos_err = np.array([], dtype=np.int64)
    best_neg_cover = np.array([], dtype=np.int64)
    blocks = idx // UTIL_BLOCK_SIZE
    for b in np.unique(blocks):  # ascending, like the reference's loop
        sel = blocks == b
        bu = u[sel]
        bmax = bu.max()
        if bmax > best or np.allclose(best, bmax):
            argm = np.isclose(bu, bmax)
            if np.allclose(bmax, best):
                best_idx = np.hstack((best_idx, idx[sel][argm]))
                best_pos_err = np.hstack((best_pos_err, pos_err[sel][argm]))
                best_neg_cover = np.hstack(
                    (best_neg_cover, neg_cover[sel][argm]))
            else:
                best = bmax
                best_idx = idx[sel][argm]
                best_pos_err = pos_err[sel][argm]
                best_neg_cover = neg_cover[sel][argm]
    return best_idx, best_pos_err, best_neg_cover


def _select_rule(tie_idx, tie_pos_err, tie_neg_cover, risk_lookup,
                 model_type):
    """Zero-coverage filter + risk tiebreaker, exactly as the host fit.

    Returns (chosen_rule or None, equivalent_rules ndarray or None) — the
    reference's scm.py:108-130 + experiment_scm.py:120-130 contract.
    """
    keep = (tie_neg_cover != 0) | (tie_pos_err != 0)
    kept = tie_idx[keep]
    if len(kept) == 0:
        return None, None
    if len(kept) == 1:
        return int(kept[0]), np.array([int(kept[0])])
    tie_rule_risks = risk_lookup(kept)
    if model_type == "conjunction":
        equiv = kept[np.isclose(tie_rule_risks, tie_rule_risks.min())]
    else:
        # Disjunction trains on inverted labels: risks = 1 - conj risks.
        equiv = kept[np.isclose(tie_rule_risks, tie_rule_risks.max())]
    return int(equiv[0]), equiv


def _pad_fit_arrays(f_true, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np):
    """Bucket the fit count to a multiple of 16 (compile hygiene: CV grids
    of 75 and 80 fits share one compiled program; a multiple-of-16 grid —
    the default 2x8x5 = 80 — pads nothing). Padded fits have zero masks,
    so ``active = n_neg > 0`` retires them immediately.
    """
    fb = max(16, -(-f_true // 16) * 16)
    if fb == f_true:
        return f_true, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np
    pad = fb - f_true

    def z(a):
        return np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    return (fb, z(pos_np), z(neg_np), z(tpos), z(tneg),
            np.concatenate([ps_np, np.ones(pad, ps_np.dtype)]),
            np.concatenate([is_disj_np, np.zeros(pad, bool)]))


def _make_risk_lookup(by_kmer, by_anti, n_kmers):
    """rule_risks[idx] over the virtual hstack(by_kmer, by_anti) table.

    The raw index tables ride as attributes so the speculative engine can
    place them on device (the guess's tiebreak input); opaque callables
    without them simply never speculate successfully."""
    by_kmer = np.asarray(by_kmer)
    by_anti = np.asarray(by_anti)

    def lookup(idx):
        out = np.empty(len(idx), dtype=np.float64)
        pres = idx < n_kmers
        out[pres] = by_kmer[idx[pres]]
        out[~pres] = by_anti[idx[~pres] - n_kmers]
        return out

    lookup.by_kmer = by_kmer
    lookup.by_anti = by_anti
    return lookup


class ExactScmEngine:
    """Iteration-major exact SCM over a device-resident packed matrix.

    Parameters
    ----------
    matrix : (W, K) uint32 packed presence matrix (device or host value)
    n_kmers : number of real k-mer columns (trailing columns are padding)
    excl_rules : optional int array of blacklisted rule indices in [0, 2K)
    sb : superblock width (columns) for the hit-detection granularity
    hit_budget / cand_budget : initial device compaction budgets (escalate
        x16 on overflow; small values exercise the escalation paths in
        tests)
    """

    def __init__(self, matrix, n_kmers, excl_rules=None, sb=8192,
                 hit_budget=64, cand_budget=64, streamed=False,
                 chunk_cols=None):
        self.streamed = bool(streamed)
        if self.streamed:
            # Out-of-core mode: the matrix stays in HOST memory; pass 1
            # streams fixed-width column chunks H2D, pass 2 uploads only
            # the hit superblocks. Bit-identical selection — the same
            # programs run on chunks, every decision happens on the host
            # from exact integers (the reference's out-of-core contract,
            # rules.py:243-262, kept exact on the accelerator).
            matrix = np.ascontiguousarray(np.asarray(matrix))
            if matrix.dtype != np.uint32:
                raise ValueError("exact engine expects a uint32-packed matrix")
        elif not isinstance(matrix, jax.Array):
            matrix = jnp.asarray(np.ascontiguousarray(matrix))
        if matrix.dtype != jnp.uint32:
            raise ValueError("exact engine expects a uint32-packed matrix")
        kp = matrix.shape[1]
        sb = min(sb, max(256, kp))
        if not self.streamed:
            # Keep the fused program's per-iteration scan under ~1200
            # superblocks: the remote compile service crashes (HTTP 500,
            # tpu_compile_helper exit 1) on the ~1430-block scan an
            # 11.7M-column matrix produces at sb=8192, and ~1280-block
            # scatter-in-scan programs have faulted the TPU worker before
            # (CLAUDE.md). The median 9.6M scale (1171 blocks) compiles
            # fine and keeps its cached executables; wider superblocks
            # trade block-temp size for scan length past that.
            max_blocks = int(os.environ.get("GRM_FUSED_MAX_BLOCKS", 1200))
            while kp // sb > max_blocks:
                sb *= 2
        self.n_kmers = int(n_kmers)
        self.sb = sb
        self.hit_budget = int(hit_budget)
        self.cand_budget = int(cand_budget)
        excl_np = None
        if excl_rules is not None and len(excl_rules):
            excl_np = np.zeros((2, kp), bool)
            er = np.asarray(excl_rules, np.int64)
            excl_np[0, er[er < n_kmers]] = True
            excl_np[1, er[er >= n_kmers] - n_kmers] = True
            if excl_np[:, :n_kmers].all():
                # Mirrors the host fit's guard (scm.py): every utility
                # would be -inf and the candidate machinery degenerates.
                raise ValueError("The blacklist cannot include all the rules.")
        if self.streamed:
            if chunk_cols is None:
                chunk_cols = int(os.environ.get(
                    "GRM_STREAM_CHUNK_COLS", 1 << 21))
            # Chunk width: a whole number of superblocks so hit indexing
            # lines up; every chunk shares ONE compiled pass-1 program.
            # The ragged tail materializes into a zero-padded chunk-sized
            # buffer per pass (the >HBM matrix is never copied whole).
            chunk_cols = max(sb, (chunk_cols // sb) * sb)
            self.chunk_cols = chunk_cols
            self.padded_cols = kp + ((-kp) % chunk_cols)
            self.matrix = matrix
            # Global pads (and the blacklist) ride in one host-side excl
            # map, sliced per chunk — pass 1/2 see n_kmers == chunk width.
            full = np.ones((2, self.padded_cols), bool)
            full[:, : self.n_kmers] = False
            if excl_np is not None:
                full[:, :kp] |= excl_np
            self.excl_host = full
            self.excl = None
            return
        pad = (-kp) % sb
        if pad:
            matrix = jax.jit(
                lambda m: jnp.pad(m, ((0, 0), (0, pad)))
            )(matrix)
        self.matrix = matrix
        self.excl = None
        if excl_np is not None:
            excl_pad = np.zeros((2, matrix.shape[1]), bool)
            excl_pad[:, :kp] = excl_np
            self.excl = jnp.asarray(excl_pad)

    # -- candidate machinery -------------------------------------------------

    def _thresholds(self, gmax, n_neg, n_pos, ps, active):
        """Safe over-inclusive candidate thresholds (see module docstring).

        margin = 8 isclose radii + 4x the float32 evaluation error bound;
        anything below cannot join a tie set, anything above is gathered.

        The f32 error bound must NOT scale with p: for any rule whose
        utility u is in the candidate range, u = (n_neg - cn) - p*(n_pos -
        cp) implies |p*(n_pos - cp)| <= n_neg + |u|, so the product's
        rounding error is bounded by eps*(n_neg + |gmax| + margin) even for
        p = 999999 (the reference's largest default). Scaling with p here
        would widen the threshold by p*eps and gather millions of
        non-candidates.
        """
        radius = _ATOL + _RTOL * np.abs(gmax)
        scale = n_neg + 4.0 * np.abs(gmax) + 1.0
        fslack = 4.0 * _F32_EPS * scale
        thresh = gmax - 8.0 * radius - 4.0 * fslack - _ATOL
        return np.where(active, thresh, np.inf).astype(np.float32)

    def _gather_candidates(self, sbmax, neg_dev, pos_dev, ps_dev, thresh_np,
                           active):
        """Hit superblocks -> candidate pools per fit (host numpy)."""
        sb, matrix = self.sb, self.matrix
        thresh_dev = jnp.asarray(thresh_np)
        hits_m = self.hit_budget
        while True:
            hits, hcount = _hit_sbs(sbmax, thresh_dev, hits_m)
            hits, hcount = jax.device_get((hits, hcount))  # ONE round trip
            if (hcount[active] <= hits_m).all():
                break
            hits_m = min(int(sbmax.shape[1]), hits_m * 16)

        pair_f, pair_sb = [], []
        for f in np.where(active)[0]:
            for s in hits[f]:
                if s >= 0:
                    pair_f.append(f)
                    pair_sb.append(int(s))
        pools = {int(f): [] for f in np.where(active)[0]}
        if not pair_f:
            return pools
        pair_f = np.asarray(pair_f, np.int32)
        pair_sb = np.asarray(pair_sb, np.int32)
        if os.environ.get("GRM_EXACT_DEBUG"):
            print("[scm_exact] gather: %d pairs over %d active fits "
                  "(hit budget %d)" % (len(pair_f), int(active.sum()),
                                       hits_m), flush=True)

        def run_pairs_chunk(pf, psb, cmax):
            # Bucket-pad the pair count to limit recompiles. Returns
            # DEVICE arrays (no sync — run_pairs drains all chunks with
            # one fetch).
            n = len(pf)
            bucket = 16
            while bucket < n:
                bucket *= 4
            pf_p = np.zeros(bucket, np.int32)
            psb_p = np.zeros(bucket, np.int32)
            pf_p[:n], psb_p[:n] = pf, psb
            return _pass2(
                matrix, neg_dev, pos_dev, ps_dev,
                jnp.asarray(pf_p), jnp.asarray(psb_p), thresh_dev,
                self.n_kmers, sb, cmax, excl=self.excl,
            )

        def run_pairs(pf, psb, cmax):
            # Chunked: the vmapped per-pair matrix slices materialize
            # (P, 32W, sb) int8 unpacks — a giant pathological tie set
            # must not turn into one giant dispatch. ALL chunks dispatch
            # asynchronously and ONE device_get drains them: genuine
            # near-max tie mass can span thousands of (fit, superblock)
            # pairs, and per-chunk fetches turned that into a 60-round-trip
            # storm at 1-6 s each through this rig's tunnel.
            # Per-pair temp ~128*W*sb bytes (the padded u32 slice stack —
            # measured 25 MB/pair at W=12, sb=16384); chunks are bucket
            # sizes (16*4^k) because _pass2 pads the pair count up to one.
            per_pair = 128 * int(matrix.shape[0]) * sb
            budget = int(os.environ.get("GRM_GATHER_TEMP_BYTES", 1 << 31))
            chunk = 16
            while chunk * 4 * per_pair <= budget and chunk < 1024:
                chunk *= 4
            spans = list(range(0, len(pf), chunk))
            devs = [run_pairs_chunk(pf[lo:lo + chunk], psb[lo:lo + chunk],
                                    cmax)
                    for lo in spans]
            host = jax.device_get(devs)
            lens = [len(pf[lo:lo + chunk]) for lo in spans]
            return tuple(np.concatenate(
                [np.asarray(part[i])[:n] for part, n in zip(host, lens)])
                for i in range(4))

        def collect(pf, ridx, cn, cp):
            for i in range(len(pf)):
                valid = ridx[i] >= 0
                if valid.any():
                    pools[int(pf[i])].append(
                        (ridx[i][valid], cn[i][valid], cp[i][valid]))

        ridx, cn, cp, count = run_pairs(pair_f, pair_sb, self.cand_budget)
        overflow = count > self.cand_budget
        collect(pair_f[~overflow], ridx[~overflow], cn[~overflow],
                cp[~overflow])
        if overflow.any():
            # Escalate overflowing pairs to a full-superblock gather.
            r2, c2, p2, _ = run_pairs(
                pair_f[overflow], pair_sb[overflow], 2 * sb)
            collect(pair_f[overflow], r2, c2, p2)
        return pools

    # -- shared host selection ----------------------------------------------

    def _select_for_fit(self, parts, fit, n_neg_fi, n_pos_fi, p_fi):
        """Exact float64 replay + selection over one fit's candidate parts."""
        if not parts:
            return None, None
        idx = np.concatenate([p[0] for p in parts]).astype(np.int64)
        cnv = np.concatenate([p[1] for p in parts]).astype(np.int64)
        cpv = np.concatenate([p[2] for p in parts]).astype(np.int64)
        order = np.argsort(idx, kind="stable")
        idx, cnv, cpv = idx[order], cnv[order], cpv[order]
        tie_idx, tie_pe, tie_nc = _replay_block_scan(
            idx, cnv, cpv, n_neg_fi, n_pos_fi, p_fi, self.n_kmers)
        return _select_rule(tie_idx, tie_pe, tie_nc, fit["risk_lookup"],
                            fit["model_type"])

    # -- the greedy loop -----------------------------------------------------

    def _gather_lanes(self, f):
        """Fit-lane width for the fused step's candidate gather: each lane
        costs ~40 * W * sb temp bytes (the (32W, sb) int8 unpack dominates);
        the full F-wide vmap at 5022-genome scale asked the compiler for
        ~10 GB and crashed the remote compile helper. Halve (keeping a
        divisor of the padded fit count) until under budget."""
        per_fit = 40 * int(self.matrix.shape[0]) * self.sb
        budget = int(os.environ.get("GRM_GATHER_TEMP_BYTES", 1 << 31))
        max_lanes = max(1, budget // max(per_fit, 1))
        fc = f
        while fc > max_lanes and fc % 2 == 0:
            fc //= 2
        return fc


    def _run_fits_speculative(self, fits, max_rules, collect_ties=False):
        """Greedy loop with host-verified device speculation: each round
        trip advances up to TWO iterations (see :func:`_spec_step`).

        Exactness: every committed rule comes from the host's float64
        replay over the probe pools — identical to the classic loop. The
        device's guess only decides whether the second probe's pools are
        usable; a miss rolls back to the checkpointed state and costs one
        extra round trip."""
        f_true = len(fits)
        pos_np = np.stack([x["pos_mask"] for x in fits])
        neg_np = np.stack([x["neg_mask"] for x in fits])
        tpos = np.stack([x["test_pos_mask"] for x in fits])
        tneg = np.stack([x["test_neg_mask"] for x in fits])
        ps_np = np.array([x["p"] for x in fits], np.float64)
        is_disj_np = np.array(
            [x["model_type"] == "disjunction" for x in fits], bool)
        (f, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np) = _pad_fit_arrays(
            f_true, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np)

        # Per-fit risk-index tables on device (the guess's tiebreak input).
        # Fold lookups are shared across a fold's fits, so a handful of
        # tables serve the whole grid; fits with opaque lookups simply
        # never speculate successfully (has_tab False -> guaranteed miss).
        tabs, tab_index = [], {}
        tab_id = np.zeros(f, np.int32)
        has_tab = np.zeros(f, bool)
        for i in range(f_true):
            lk = fits[i]["risk_lookup"]
            bk = getattr(lk, "by_kmer", None)
            ba = getattr(lk, "by_anti", None)
            if bk is None or ba is None:
                continue
            key = id(lk)
            if key not in tab_index:
                # Table SHAPE is 2x the bucketed matrix width (shape
                # hygiene: same-bucket datasets must share the compiled
                # program); the virtual-index layout inside still splits
                # at the true n_kmers.
                kp = int(self.matrix.shape[1])
                t = np.zeros(2 * kp, np.int32)
                t[: self.n_kmers] = np.asarray(bk, np.int64).astype(np.int32)
                t[self.n_kmers : 2 * self.n_kmers] = np.asarray(
                    ba, np.int64).astype(np.int32)
                tab_index[key] = len(tabs)
                tabs.append(t)
            tab_id[i] = tab_index[key]
            has_tab[i] = True
        if not tabs:
            tabs = [np.zeros(2 * int(self.matrix.shape[1]), np.int32)]
        tbb = 1
        while tbb < len(tabs):
            tbb *= 2
        risk_tabs = jnp.asarray(
            np.stack(tabs + [tabs[0]] * (tbb - len(tabs))))

        pos1 = jnp.array(pos_np)
        neg1 = jnp.array(neg_np)
        conj1 = jnp.array(np.full_like(pos_np, np.uint32(0xFFFFFFFF)))
        pos2 = jnp.array(pos_np)
        neg2 = jnp.array(neg_np)
        conj2 = jnp.array(np.full_like(pos_np, np.uint32(0xFFFFFFFF)))
        tpos_d = jnp.asarray(tpos)
        tneg_d = jnp.asarray(tneg)
        ps_dev = jnp.asarray(ps_np.astype(np.float32))
        is_disj_d = jnp.asarray(is_disj_np)
        tab_id_d = jnp.asarray(tab_id)
        has_tab_d = jnp.asarray(has_tab)

        n_pos = np.bitwise_count(pos_np).sum(-1).astype(np.int64)
        n_neg = np.bitwise_count(neg_np).sum(-1).astype(np.int64)
        n_tpos = np.bitwise_count(tpos).sum(-1).astype(np.int64)
        n_tneg = np.bitwise_count(tneg).sum(-1).astype(np.int64)

        rules = np.full((f, max_rules), -1, np.int64)
        errors = np.zeros((f, max_rules + 1), np.int64)
        errors[:, 0] = np.where(is_disj_np, n_tpos, n_tneg)
        err_recorded = np.zeros(f, np.int64)
        ties = [[] for _ in range(f)] if collect_ties else None
        L = np.zeros(f, np.int64)
        done = ~(n_neg > 0)
        if max_rules == 0:
            done[:] = True

        use_prev = np.ones(f, bool)
        chosenA = np.zeros(f, np.int32)
        use_absA = np.zeros(f, bool)
        validA = np.zeros(f, bool)
        pend_len = np.zeros(f, np.int64)

        hit_m = max(4, min(16, self.hit_budget))
        fc = self._gather_lanes(f)
        dbg = os.environ.get("GRM_EXACT_DEBUG")
        dispatches = 0
        guard = 0

        def parts_of(cols, cn, cp, fi):
            parts = []
            for j in range(hit_m):
                selv = cols[j, fi] >= 0
                if selv.any():
                    parts.append((cols[j, fi][selv], cn[j, fi][selv],
                                  cp[j, fi][selv]))
            return parts

        while (~done).any() or validA.any():
            guard += 1
            if guard > 4 * (max_rules + 2) + 16:
                raise RuntimeError("speculative SCM loop failed to converge")
            active = ~done
            out = _spec_step(
                self.matrix, pos1, neg1, conj1, pos2, neg2, conj2,
                jnp.asarray(use_prev), tpos_d, tneg_d, ps_dev, is_disj_d,
                jnp.asarray(chosenA), jnp.asarray(use_absA),
                jnp.asarray(validA), jnp.asarray(active),
                risk_tabs, tab_id_d, has_tab_d,
                self.n_kmers, self.sb, hit_m, self.cand_budget,
                excl=self.excl, fc=fc)
            (pos1, neg1, conj1, pos2, neg2, conj2,
             err1_d, nn1_d, np1_d, gmax1_d, hc1_d, cols1_d, cn1_d, cp1_d,
             cc1_d, sbmax1_d, guess_d, gvalid_d,
             err2_d, nn2_d, np2_d, gmax2_d, hc2_d, cols2_d, cn2_d, cp2_d,
             cc2_d, sbmax2_d) = out
            (err1, nn1, np1v, gmax1, hc1, cols1, cn1, cp1, cc1, guess,
             gvalid, err2, nn2, np2v, gmax2, hc2, cols2, cn2, cp2,
             cc2) = jax.device_get(
                (err1_d, nn1_d, np1_d, gmax1_d, hc1_d, cols1_d, cn1_d,
                 cp1_d, cc1_d, guess_d, gvalid_d, err2_d, nn2_d, np2_d,
                 gmax2_d, hc2_d, cols2_d, cn2_d, cp2_d, cc2_d))
            dispatches += 1

            for fi in np.where(validA)[0]:
                errors[fi, pend_len[fi]] = err1[fi]
                err_recorded[fi] = max(err_recorded[fi], pend_len[fi])

            act_idx = np.where(active)[0]
            over1 = (hc1 > hit_m) | (cc1 > self.cand_budget).any(axis=0)
            pools1 = {}
            for fi in act_idx:
                if not over1[fi]:
                    pools1[int(fi)] = parts_of(cols1, cn1, cp1, fi)
            if over1[active].any():
                thresh = self._thresholds(
                    np.asarray(gmax1, np.float64),
                    nn1.astype(np.float64), np1v.astype(np.float64),
                    ps_np, active & over1)
                pools1.update(self._gather_candidates(
                    sbmax1_d, neg1, pos1, ps_dev, thresh, active & over1))

            new_chosen = np.zeros(f, np.int32)
            new_useabs = np.zeros(f, bool)
            new_valid = np.zeros(f, bool)
            new_useprev = np.ones(f, bool)
            new_pend = np.zeros(f, np.int64)
            hits = misses = 0
            for fi in act_idx:
                n_neg[fi] = nn1[fi]
                n_pos[fi] = np1v[fi]
                if n_neg[fi] == 0 or L[fi] >= max_rules:
                    done[fi] = True
                    continue
                rule, equiv = self._select_for_fit(
                    pools1.get(int(fi), []), fits[fi], n_neg[fi],
                    n_pos[fi], ps_np[fi])
                if rule is None:
                    done[fi] = True
                    continue
                rules[fi, L[fi]] = rule
                if collect_ties:
                    ties[fi].append(equiv)
                L[fi] += 1
                hit = (not over1[fi]) and bool(gvalid[fi]) \
                    and int(guess[fi]) == int(rule)
                if not hit:
                    misses += 1
                    new_useprev[fi] = True  # roll back the guess
                    new_chosen[fi] = rule % self.n_kmers
                    new_useabs[fi] = rule >= self.n_kmers
                    new_valid[fi] = True
                    new_pend[fi] = L[fi]
                    continue
                hits += 1
                # Guess verified: the speculated apply IS the commit.
                errors[fi, L[fi]] = err2[fi]
                err_recorded[fi] = max(err_recorded[fi], L[fi])
                n_neg[fi] = nn2[fi]
                n_pos[fi] = np2v[fi]
                new_useprev[fi] = False  # base = post-guess state
                if n_neg[fi] == 0 or L[fi] >= max_rules:
                    done[fi] = True
                    continue
                over2_f = (hc2[fi] > hit_m) or (
                    cc2[:, fi] > self.cand_budget).any()
                if over2_f:
                    # Probe again from the committed state next round.
                    continue
                rule2, equiv2 = self._select_for_fit(
                    parts_of(cols2, cn2, cp2, fi), fits[fi], n_neg[fi],
                    n_pos[fi], ps_np[fi])
                if rule2 is None:
                    done[fi] = True
                    continue
                rules[fi, L[fi]] = rule2
                if collect_ties:
                    ties[fi].append(equiv2)
                L[fi] += 1
                new_chosen[fi] = rule2 % self.n_kmers
                new_useabs[fi] = rule2 >= self.n_kmers
                new_valid[fi] = True
                new_pend[fi] = L[fi]
            if dbg:
                print("[scm_exact] spec round %d: %d hits, %d misses, "
                      "%d live" % (dispatches, hits, misses,
                                   int((~done).sum())), flush=True)
            chosenA, use_absA, validA = new_chosen, new_useabs, new_valid
            use_prev, pend_len = new_useprev, new_pend

        for fi in range(f):
            for jt in range(int(err_recorded[fi]) + 1, max_rules + 1):
                errors[fi, jt] = errors[fi, jt - 1]

        n_rules = (rules >= 0).sum(axis=1).astype(np.int64)
        n_test = n_tpos + n_tneg
        if collect_ties:
            return (rules[:f_true], n_rules[:f_true], errors[:f_true],
                    n_test[:f_true], ties[:f_true])
        return (rules[:f_true], n_rules[:f_true], errors[:f_true],
                n_test[:f_true])

    def run_fits(self, fits, max_rules, collect_ties=False):
        """Greedy SCM for every fit, exact reference selection semantics.

        ``fits``: list of dicts with keys pos_mask, neg_mask (uint32 (W,),
        fit space — disjunction pre-swapped), test_pos_mask, test_neg_mask
        (label space), p (float), model_type (str), and risk_lookup (a
        callable idx -> float risks, from :func:`_make_risk_lookup`).

        Returns (rules (F, max_rules) int64 [-1 pad], n_rules (F,) int64,
        errors (F, max_rules+1) int64 exact fold-test error counts, and —
        when ``collect_ties`` — a list per fit of per-iteration equivalent
        rule index arrays).
        """
        if self.streamed:
            return self._run_fits_streamed(fits, max_rules, collect_ties)
        # Speculation doubles the fused program; past ~half of HBM the
        # remote compile helper dies on it (the single-probe program at
        # the 8 GB isoniazid matrix already sits at its edge), and the
        # e2e there is load-dominated anyway — classic loop instead.
        spec_max = int(os.environ.get("GRM_SPECULATE_MAX_BYTES", 4 << 30))
        if (os.environ.get("GRM_SCM_SPECULATE", "1") != "0"
                and int(self.matrix.size) * 4 <= spec_max):
            return self._run_fits_speculative(fits, max_rules, collect_ties)
        f_true = len(fits)
        pos_np = np.stack([x["pos_mask"] for x in fits])
        neg_np = np.stack([x["neg_mask"] for x in fits])
        tpos = np.stack([x["test_pos_mask"] for x in fits])
        tneg = np.stack([x["test_neg_mask"] for x in fits])
        ps_np = np.array([x["p"] for x in fits], np.float64)
        is_disj_np = np.array(
            [x["model_type"] == "disjunction" for x in fits], bool)
        (f, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np) = _pad_fit_arrays(
            f_true, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np)
        w32 = pos_np.shape[1]

        pos = jnp.asarray(pos_np)
        neg = jnp.asarray(neg_np)
        conj = jnp.asarray(np.full_like(pos_np, np.uint32(0xFFFFFFFF)))
        tpos_d = jnp.asarray(tpos)
        tneg_d = jnp.asarray(tneg)
        ps_dev = jnp.asarray(ps_np.astype(np.float32))
        is_disj_d = jnp.asarray(is_disj_np)

        n_pos = np.bitwise_count(pos_np).sum(-1).astype(np.int64)
        n_neg = np.bitwise_count(neg_np).sum(-1).astype(np.int64)
        n_tpos = np.bitwise_count(tpos).sum(-1).astype(np.int64)
        n_tneg = np.bitwise_count(tneg).sum(-1).astype(np.int64)

        rules = np.full((f, max_rules), -1, np.int64)
        errors = np.zeros((f, max_rules + 1), np.int64)
        # Length-0 model predicts all 1 (conjunction) / all 0 (disjunction).
        errors[:, 0] = np.where(is_disj_np, n_tpos, n_tneg)
        ties = [[] for _ in range(f)] if collect_ties else None
        active = n_neg > 0

        hit_m = max(4, min(16, self.hit_budget))
        chosen = np.zeros(f, np.int32)
        use_abs = np.zeros(f, bool)
        valid = np.zeros(f, bool)

        # One fused device program per greedy iteration: apply the previous
        # host selection, sweep, threshold, and gather the next iteration's
        # candidates — a single dispatch + fetch round trip (the tunnel's
        # latency dominates the e2e learn otherwise). Budget overflows fall
        # back to the multi-pass gather for that iteration.
        for it in range(max_rules + 1):
            (pos, neg, conj, err_d, n_neg_d, n_pos_d, gmax_d, hcount_d,
             cols_d, cn_d, cp_d, ccount_d, sbmax) = _fused_step(
                self.matrix, pos, neg, conj, tpos_d, tneg_d, ps_dev,
                is_disj_d, jnp.asarray(chosen), jnp.asarray(use_abs),
                jnp.asarray(valid), jnp.asarray(active),
                self.n_kmers, self.sb, hit_m, self.cand_budget,
                excl=self.excl, fc=self._gather_lanes(f),
            )
            err, n_neg_new, n_pos_new, gmax_np, hcount, cols, cn, cp, \
                ccount = jax.device_get(
                    (err_d, n_neg_d, n_pos_d, gmax_d, hcount_d, cols_d,
                     cn_d, cp_d, ccount_d))
            if it > 0:
                errors[:, it] = np.where(valid, err, errors[:, it - 1])
                n_neg = np.where(valid, n_neg_new.astype(np.int64), n_neg)
                n_pos = np.where(valid, n_pos_new.astype(np.int64), n_pos)
                active = active & (n_neg > 0)
            if it == max_rules or not active.any():
                for jt in range(it + 1, max_rules + 1):
                    errors[:, jt] = errors[:, jt - 1]
                break

            # Assemble per-fit candidate pools from the speculative gather;
            # overflowing fits re-gather via the multi-pass path.
            gmax64 = np.asarray(gmax_np, np.float64)
            overflow_f = (hcount > hit_m) | (
                (ccount > self.cand_budget).any(axis=0))
            pools = {}
            for fi in np.where(active)[0]:
                if overflow_f[fi]:
                    continue
                parts = []
                for j in range(hit_m):
                    sel = cols[j, fi] >= 0
                    if sel.any():
                        parts.append((cols[j, fi][sel], cn[j, fi][sel],
                                      cp[j, fi][sel]))
                pools[int(fi)] = parts
            if overflow_f[active].any():
                thresh = self._thresholds(gmax64, n_neg, n_pos, ps_np,
                                          active & overflow_f)
                slow = self._gather_candidates(
                    sbmax, neg, pos, ps_dev, thresh, active & overflow_f)
                pools.update(slow)

            chosen = np.zeros(f, np.int32)
            use_abs = np.zeros(f, bool)
            valid = np.zeros(f, bool)
            for fi in np.where(active)[0]:
                rule, equiv = self._select_for_fit(
                    pools.get(int(fi), []), fits[fi], n_neg[fi], n_pos[fi],
                    ps_np[fi])
                if rule is None:
                    active[fi] = False
                    continue
                rules[fi, it] = rule
                chosen[fi] = rule % self.n_kmers
                use_abs[fi] = rule >= self.n_kmers
                valid[fi] = True
                if collect_ties:
                    ties[fi].append(equiv)

        n_rules = (rules >= 0).sum(axis=1).astype(np.int64)
        n_test = n_tpos + n_tneg
        if collect_ties:
            return (rules[:f_true], n_rules[:f_true], errors[:f_true],
                    n_test[:f_true], ties[:f_true])
        return rules[:f_true], n_rules[:f_true], errors[:f_true],             n_test[:f_true]

    # -- streamed (out-of-core) greedy loop ---------------------------------

    def _run_fits_streamed(self, fits, max_rules, collect_ties=False):
        """Greedy SCM over a HOST-resident matrix: pass 1 streams column
        chunks H2D (one compiled program for every chunk), pass 2 uploads
        only the hit superblocks compacted, and the chosen rules' columns
        are gathered from host memory. Selection is the same host float64
        replay — bit-identical to the resident engine and the host engine.
        """
        f_true = len(fits)
        pos_np = np.stack([x["pos_mask"] for x in fits])
        neg_np = np.stack([x["neg_mask"] for x in fits])
        tpos = np.stack([x["test_pos_mask"] for x in fits])
        tneg = np.stack([x["test_neg_mask"] for x in fits])
        ps_np = np.array([x["p"] for x in fits], np.float64)
        is_disj_np = np.array(
            [x["model_type"] == "disjunction" for x in fits], bool)
        (f, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np) = _pad_fit_arrays(
            f_true, pos_np, neg_np, tpos, tneg, ps_np, is_disj_np)
        w32 = pos_np.shape[1]

        pos = jnp.asarray(pos_np)
        neg = jnp.asarray(neg_np)
        conj = jnp.asarray(np.full_like(pos_np, np.uint32(0xFFFFFFFF)))
        tpos_d = jnp.asarray(tpos)
        tneg_d = jnp.asarray(tneg)
        ps_dev = jnp.asarray(ps_np.astype(np.float32))
        is_disj_d = jnp.asarray(is_disj_np)

        n_pos = np.bitwise_count(pos_np).sum(-1).astype(np.int64)
        n_neg = np.bitwise_count(neg_np).sum(-1).astype(np.int64)
        n_tpos = np.bitwise_count(tpos).sum(-1).astype(np.int64)
        n_tneg = np.bitwise_count(tneg).sum(-1).astype(np.int64)

        rules = np.full((f, max_rules), -1, np.int64)
        errors = np.zeros((f, max_rules + 1), np.int64)
        errors[:, 0] = np.where(is_disj_np, n_tpos, n_tneg)
        ties = [[] for _ in range(f)] if collect_ties else None
        active = n_neg > 0

        sb = self.sb
        ch = self.chunk_cols
        kp = self.padded_cols
        true_cols = self.matrix.shape[1]
        nsb = kp // sb
        sb_per_chunk = ch // sb
        n_chunks = kp // ch

        def chunk_view(lo):
            if lo + ch <= true_cols:
                return self.matrix[:, lo:lo + ch]
            block = np.zeros((self.matrix.shape[0], ch), np.uint32)
            if lo < true_cols:
                block[:, : true_cols - lo] = self.matrix[:, lo:]
            return block

        chosen = np.zeros(f, np.int32)
        use_abs = np.zeros(f, bool)
        valid = np.zeros(f, bool)

        for it in range(max_rules + 1):
            bits_np = (self.matrix[:, chosen].T.copy()
                       if valid.any() else np.zeros((f, w32), np.uint32))
            pos, neg, conj, err_d, nn_d, np_d = _apply_step(
                pos, neg, conj, tpos_d, tneg_d,
                jnp.asarray(bits_np[:, :w32]), jnp.asarray(use_abs),
                jnp.asarray(valid), is_disj_d)
            err, n_neg_new, n_pos_new = jax.device_get((err_d, nn_d, np_d))
            if it > 0:
                errors[:, it] = np.where(valid, err, errors[:, it - 1])
                n_neg = np.where(valid, n_neg_new.astype(np.int64), n_neg)
                n_pos = np.where(valid, n_pos_new.astype(np.int64), n_pos)
                active = active & (n_neg > 0)
            if it == max_rules or not active.any():
                for jt in range(it + 1, max_rules + 1):
                    errors[:, jt] = errors[:, jt - 1]
                break

            # -- pass 1: stream chunks, accumulate superblock maxima ------
            sbmax = np.full((f, nsb), -np.inf, np.float32)
            for ci in range(n_chunks):
                chunk = jnp.asarray(chunk_view(ci * ch))
                exc = jnp.asarray(self.excl_host[:, ci * ch:(ci + 1) * ch])
                sm, _ = _pass1(chunk, neg, pos, ps_dev, ch, sb, excl=exc)
                sbmax[:, ci * sb_per_chunk:(ci + 1) * sb_per_chunk] = (
                    np.asarray(sm))
            gmax64 = sbmax.max(axis=1).astype(np.float64)
            thresh = self._thresholds(gmax64, n_neg, n_pos, ps_np, active)

            # -- pass 2: upload ONLY the hit superblocks, compacted -------
            hit = sbmax >= thresh[:, None]
            hit[~active] = False
            gsbs = np.unique(np.where(hit.any(axis=0))[0])
            pools = {}
            if len(gsbs):
                nusb = 1
                while nusb < len(gsbs):
                    nusb *= 2
                cw = nusb * sb
                compact = np.zeros((self.matrix.shape[0], cw), np.uint32)
                c_excl = np.ones((2, cw), bool)
                for li, gs in enumerate(gsbs):
                    lo = int(gs) * sb
                    width = max(0, min(true_cols - lo, sb))
                    compact[:, li * sb:li * sb + width] = (
                        self.matrix[:, lo:lo + width])
                    c_excl[:, li * sb:(li + 1) * sb] = (
                        self.excl_host[:, lo:lo + sb])
                compact_d = jnp.asarray(compact)
                c_excl_d = jnp.asarray(c_excl)
                local_of = {int(g): i for i, g in enumerate(gsbs)}

                pair_f, pair_sb = [], []
                for fi in np.where(active)[0]:
                    for gs in np.where(hit[fi])[0]:
                        pair_f.append(fi)
                        pair_sb.append(local_of[int(gs)])
                pair_f = np.asarray(pair_f, np.int32)
                pair_sb = np.asarray(pair_sb, np.int32)
                thresh_d = jnp.asarray(thresh.astype(np.float32))

                def run_pairs_chunk(pf, psb, cmax):
                    n = len(pf)
                    bucket = 16
                    while bucket < n:
                        bucket *= 4
                    pf_p = np.zeros(bucket, np.int32)
                    psb_p = np.zeros(bucket, np.int32)
                    pf_p[:n], psb_p[:n] = pf, psb
                    return _pass2(
                        compact_d, neg, pos, ps_dev,
                        jnp.asarray(pf_p), jnp.asarray(psb_p), thresh_d,
                        cw, sb, cmax, excl=c_excl_d,
                    )

                def run_pairs(pf, psb, cmax):
                    # Async-dispatch all chunks, ONE fetch (see the
                    # resident path's run_pairs for why).
                    chunk_p = 64
                    spans = list(range(0, len(pf), chunk_p))
                    devs = [run_pairs_chunk(pf[lo:lo + chunk_p],
                                            psb[lo:lo + chunk_p], cmax)
                            for lo in spans]
                    host = jax.device_get(devs)
                    lens = [len(pf[lo:lo + chunk_p]) for lo in spans]
                    return tuple(np.concatenate(
                        [np.asarray(part[i])[:n]
                         for part, n in zip(host, lens)])
                        for i in range(4))

                def remap(ridx_row):
                    """Compact rule idx -> global rule idx (keeps -1 pads)."""
                    r = ridx_row.astype(np.int64)
                    live = r >= 0
                    is_abs = live & (r >= cw)
                    base = np.where(is_abs, r - cw, r)
                    gcol = gsbs[np.clip(base // sb, 0, len(gsbs) - 1)] * sb \
                        + base % sb
                    out = np.where(is_abs, gcol + self.n_kmers, gcol)
                    return np.where(live, out, -1)

                def collect(pf, ridx, cn, cp):
                    for i in range(len(pf)):
                        rr = remap(ridx[i])
                        sel = rr >= 0
                        if sel.any():
                            pools.setdefault(int(pf[i]), []).append(
                                (rr[sel], cn[i][sel], cp[i][sel]))

                ridx, cn, cp, count = run_pairs(pair_f, pair_sb,
                                                self.cand_budget)
                overflow = count > self.cand_budget
                collect(pair_f[~overflow], ridx[~overflow], cn[~overflow],
                        cp[~overflow])
                if overflow.any():
                    r2, c2, p2, _ = run_pairs(
                        pair_f[overflow], pair_sb[overflow], 2 * sb)
                    collect(pair_f[overflow], r2, c2, p2)

            chosen = np.zeros(f, np.int32)
            use_abs = np.zeros(f, bool)
            valid = np.zeros(f, bool)
            for fi in np.where(active)[0]:
                rule, equiv = self._select_for_fit(
                    pools.get(int(fi), []), fits[fi], n_neg[fi], n_pos[fi],
                    ps_np[fi])
                if rule is None:
                    active[fi] = False
                    continue
                rules[fi, it] = rule
                chosen[fi] = rule % self.n_kmers
                use_abs[fi] = rule >= self.n_kmers
                valid[fi] = True
                if collect_ties:
                    ties[fi].append(equiv)

        n_rules = (rules >= 0).sum(axis=1).astype(np.int64)
        n_test = n_tpos + n_tneg
        if collect_ties:
            return (rules[:f_true], n_rules[:f_true], errors[:f_true],
                    n_test[:f_true], ties[:f_true])
        return rules[:f_true], n_rules[:f_true], errors[:f_true],             n_test[:f_true]
