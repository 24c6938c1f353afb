"""Device-resident SCM engine: full CV grid fitting + risk-by-length scoring.

The performance-mode counterpart of the host parity path in
:mod:`grm_tpu.learning.experiments.scm_experiment`. Where the parity path
reproduces the reference's np.isclose tie accumulation and risk tiebreakers
on the host (requiring count vectors on the host), this engine keeps the
entire cross-validation search on device:

- every (model_type, p, fold) fit runs as a ``lax.while_loop`` of fused
  masked-popcount iterations (pure argmax rule selection);
- per-length fold-test risks are computed from packed prediction masks
  (a conjunction model's predictions are just AND-chains of rule columns);
- ``lax.scan`` over the whole grid -> ONE dispatch, one small fetch.

Ties resolve to the lowest rule index instead of the reference's
risk-table tiebreaker; utilities compare exactly (no isclose fuzz). Model
*quality* metrics are unaffected; selected rules can differ among exactly
tied candidates.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .mesh import _scm_iteration

__all__ = ["scm_cv_batch_device", "build_packed_mask"]


def build_packed_mask(rows, n_genomes, n_words):
    """uint32 MSB-first packed row mask padded to n_words."""
    from ..utils import build_row_mask

    out = np.zeros(n_words, np.uint32)
    m = build_row_mask(np.asarray(rows, dtype=np.int64), n_genomes, 32)
    out[: len(m)] = m
    return out


@partial(jax.jit, static_argnames=("n_kmers", "max_rules"))
def _cv_batch(matrix, pos_masks, neg_masks, test_pos_masks, test_neg_masks,
              ps, is_disjunction, n_kmers, max_rules):
    """Per-fit greedy SCM + per-length test risks, all on device.

    All mask arrays: (F, W) uint32. In fit space, disjunction fits have
    train pos/neg pre-swapped; test masks are NOT swapped (they carry the
    true labels) — the disjunction flag converts conjunction predictions in
    fit space back to label space.
    Returns (rules (F, max_rules) int32 [-1 pad], n_rules (F,),
    risks (F, max_rules+1) float32).
    """

    def one_fit(_, fit):
        pos0, neg0, tpos, tneg, p, is_disj = fit
        n_tpos = jnp.sum(jax.lax.population_count(tpos)).astype(jnp.float32)
        n_tneg = jnp.sum(jax.lax.population_count(tneg)).astype(jnp.float32)
        n_test = jnp.maximum(n_tpos + n_tneg, 1.0)

        def risk_of(conj_mask):
            # conjunction-in-fit-space predictions: 1 where conj_mask bit set
            pos_pred1 = jnp.sum(
                jax.lax.population_count(tpos & conj_mask)
            ).astype(jnp.float32)
            neg_pred1 = jnp.sum(
                jax.lax.population_count(tneg & conj_mask)
            ).astype(jnp.float32)
            conj_errors = (n_tpos - pos_pred1) + neg_pred1
            # disjunction prediction = NOT conjunction(fit space)
            disj_errors = pos_pred1 + (n_tneg - neg_pred1)
            return jnp.where(is_disj, disj_errors, conj_errors) / n_test

        full = jnp.full_like(pos0, jnp.uint32(0xFFFFFFFF))

        def cond(state):
            i, pos, neg, conj, rules, risks, n_neg = state
            return (i < max_rules) & (n_neg > 0)

        def body(state):
            i, pos, neg, conj, rules, risks, _ = state
            best_rule, new_pos, new_neg, n_neg_left = _scm_iteration(
                matrix, pos, neg, p, n_kmers
            )
            # Track the conjunction prediction mask over ALL genomes.
            col = jax.lax.dynamic_slice_in_dim(
                matrix, best_rule % n_kmers, 1, axis=1
            )[:, 0]
            bits = jnp.where(best_rule >= n_kmers, ~col, col)
            conj = conj & bits
            rules = rules.at[i].set(best_rule)
            risks = risks.at[i + 1].set(risk_of(conj))
            return i + 1, new_pos, new_neg, conj, rules, risks, n_neg_left

        n_neg0 = jnp.sum(jax.lax.population_count(neg0)).astype(jnp.int32)
        rules0 = jnp.full((max_rules,), -1, jnp.int32)
        risks0 = jnp.zeros((max_rules + 1,), jnp.float32)
        risks0 = risks0.at[0].set(risk_of(full))  # empty model predicts all 1
        i, pos, neg, conj, rules, risks, n_neg = jax.lax.while_loop(
            cond, body, (jnp.int32(0), pos0, neg0, full, rules0, risks0, n_neg0)
        )
        # Fill unreached lengths with the last computed risk (the reference
        # duplicates the last element, experiment_scm.py:180-181).
        idx = jnp.arange(max_rules + 1)
        last = risks[i]
        risks = jnp.where(idx <= i, risks, last)
        return None, (rules, i, risks)

    _, (rules, n_rules, risks) = jax.lax.scan(
        one_fit, None,
        (pos_masks, neg_masks, test_pos_masks, test_neg_masks, ps,
         is_disjunction),
    )
    return rules, n_rules, risks


def scm_cv_batch_device(matrix, fits, n_kmers, max_rules):
    """Run the batched CV fits.

    ``fits``: list of dicts with keys pos_mask, neg_mask, test_pos_mask,
    test_neg_mask (numpy uint32 (W,)), p (float), model_type (str).
    Returns (rules, n_rules, risk_by_length) as numpy arrays.
    """
    pos = np.stack([f["pos_mask"] for f in fits])
    neg = np.stack([f["neg_mask"] for f in fits])
    tpos = np.stack([f["test_pos_mask"] for f in fits])
    tneg = np.stack([f["test_neg_mask"] for f in fits])
    ps = np.array([f["p"] for f in fits], np.float32)
    is_disj = np.array(
        [f["model_type"] == "disjunction" for f in fits], bool
    )
    rules, n_rules, risks = _cv_batch(
        jnp.asarray(matrix) if not isinstance(matrix, jax.Array) else matrix,
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(tpos),
        jnp.asarray(tneg), jnp.asarray(ps), jnp.asarray(is_disj),
        n_kmers, max_rules,
    )
    return (np.asarray(jax.device_get(rules)),
            np.asarray(jax.device_get(n_rules)),
            np.asarray(jax.device_get(risks)))
