"""Set Covering Machine learner (Marchand & Shawe-Taylor 2003).

Greedy rule selection with decision semantics bit-identical to the reference
(``learning/learners/scm.py``): utility = negative-cover − p·positive-errors
scanned blockwise in float64 with np.allclose/np.isclose tie accumulation
(scm.py:262-286), zero-coverage rules skipped (scm.py:108-114), user
tiebreaker hook, disjunction = conjunction on inverted labels with inverted
rules (scm.py:69-73, 180-184).

The per-iteration count computation is where the TPU earns its keep: both
``sum_rows`` sweeps (negatives and positives) run as a single multi-mask
masked-popcount pass over the HBM-resident bit matrix instead of two full
HDF5 matrix reads through a Cython kernel.
"""

from __future__ import annotations

import logging
from math import ceil

import numpy as np

from .models import (
    ConjunctionModel,
    DisjunctionModel,
    conjunction,
    disjunction,
)

__all__ = ["SetCoveringMachine", "BaseSetCoveringMachine", "UTIL_BLOCK_SIZE"]

UTIL_BLOCK_SIZE = 1000000


def _compute_rule_importances(rule_classifications, model_rules_idx, training_example_idx):
    """Fraction of the model's negative predictions each rule accounts for
    (reference scm.py:32-36)."""
    model_rule_classifications = rule_classifications.get_columns(model_rules_idx)[
        training_example_idx
    ]
    model_neg_prediction_idx = np.where(
        np.prod(model_rule_classifications, axis=1) == 0
    )[0]
    return (
        float(len(model_neg_prediction_idx))
        - model_rule_classifications[model_neg_prediction_idx].sum(axis=0)
    ) / len(model_neg_prediction_idx)


class BaseSetCoveringMachine:
    def __init__(self, model_type, max_rules):
        if model_type == conjunction:
            self._add_rule_to_model = self._append_conjunction_model
            self.model_type = conjunction
        elif model_type == disjunction:
            self._add_rule_to_model = self._append_disjunction_model
            self.model_type = disjunction
        else:
            raise ValueError("Unsupported model type.")
        self.max_rules = max_rules
        self._flags = {}

    def fit(self, rules, rule_classifications, positive_example_idx,
            negative_example_idx, rule_blacklist=(), tiebreaker=None,
            iteration_callback=None, iteration_rule_importances=False, **kwargs):
        utility_args = {
            key[9:]: value for key, value in kwargs.items() if key[:9] == "utility__"
        }

        if len(positive_example_idx) == 0 or len(negative_example_idx) == 0:
            raise ValueError(
                "There must be positive and negative examples to train the SCM."
            )

        if self.model_type == disjunction:
            positive_example_idx, negative_example_idx = (
                negative_example_idx,
                positive_example_idx,
            )

        if rule_classifications.shape[1] != len(rules):
            raise ValueError(
                "The number of rules must match between rule_classifications and rules."
            )

        rule_blacklist = np.asarray(rule_blacklist, dtype=np.int64)
        if len(rule_blacklist) > 0:
            rule_blacklist = np.unique(rule_blacklist)
            if len(rule_blacklist) == rule_classifications.shape[1]:
                raise ValueError("The blacklist cannot include all the rules.")

        training_example_idx = np.hstack((positive_example_idx, negative_example_idx))
        model_rules_idx = []
        model_rule_importances = []
        while len(negative_example_idx) > 0 and len(self.model) < self.max_rules:
            iteration_info = {"iteration_number": len(self.model) + 1}

            (best_utility, best_utility_idx, best_utility_pos_error_counts,
             best_utility_neg_cover_counts) = self._get_best_utility_rules(
                rule_classifications=rule_classifications,
                positive_example_idx=positive_example_idx,
                negative_example_idx=negative_example_idx,
                rule_blacklist=rule_blacklist,
                **utility_args,
            )
            iteration_info["utility_max"] = best_utility
            iteration_info["utility_argmax"] = best_utility_idx

            # Skip rules covering no negatives and erring on no positives
            # (scm.py:108-114).
            best_utility_idx = iteration_info["utility_argmax"][
                np.logical_or(
                    best_utility_neg_cover_counts != 0,
                    best_utility_pos_error_counts != 0,
                )
            ]
            if len(best_utility_idx) == 0:
                logging.debug(
                    "The max-utility rule covers no negatives and makes no "
                    "positive errors; stopping."
                )
                break

            if len(best_utility_idx) == 1:
                best_rule_idx = best_utility_idx[0]
                iteration_info["equivalent_rules_idx"] = np.array([best_rule_idx])
            else:
                best_rule_idx = tiebreaker(best_utility_idx)
                iteration_info["equivalent_rules_idx"] = best_rule_idx
                best_rule_idx = best_rule_idx[0]

            iteration_info["selected_rule"] = self._add_rule_to_model(
                rules[best_rule_idx]
            )
            model_rules_idx.append(best_rule_idx)

            best_rule_classifications = rule_classifications.get_columns(
                int(best_rule_idx)
            )
            negative_example_idx = negative_example_idx[
                best_rule_classifications[negative_example_idx] != 0
            ]
            positive_example_idx = positive_example_idx[
                best_rule_classifications[positive_example_idx] != 0
            ]

            if iteration_rule_importances:
                model_rule_importances = _compute_rule_importances(
                    rule_classifications, model_rules_idx, training_example_idx
                )
                iteration_info["rule_importances"] = model_rule_importances

            if iteration_callback is not None:
                iteration_callback(iteration_info)

        if len(model_rules_idx) > 0:
            if iteration_rule_importances:
                self.rule_importances = model_rule_importances
            else:
                self.rule_importances = _compute_rule_importances(
                    rule_classifications, model_rules_idx, training_example_idx
                )
        else:
            self.rule_importances = []

    def predict(self, X):
        return self._predict(X)

    def _append_conjunction_model(self, new_rule):
        self.model.add(new_rule)
        return new_rule

    def _append_disjunction_model(self, new_rule):
        new_rule = new_rule.inverse()
        self.model.add(new_rule)
        return new_rule

    def _is_fitted(self):
        return len(self.model) > 0

    def _predict(self, X):
        if not self._is_fitted():
            raise RuntimeError("A model must be fitted prior to calling predict.")
        return self.model.predict(X)


class SetCoveringMachine(BaseSetCoveringMachine):
    def __init__(self, model_type=conjunction, p=1.0, max_rules=10):
        super().__init__(model_type=model_type, max_rules=max_rules)
        if model_type == conjunction:
            self.model = ConjunctionModel()
        elif model_type == disjunction:
            self.model = DisjunctionModel()
        else:
            raise ValueError("Unsupported model type.")
        self.p = p

    def _get_best_utility_rules(self, rule_classifications, positive_example_idx,
                                negative_example_idx, rule_blacklist=()):
        n_kmers = rule_classifications.shape[1] // 2
        rule_is_blacklisted = np.zeros(rule_classifications.shape[1], dtype=bool)
        rule_is_blacklisted[np.asarray(rule_blacklist, dtype=np.int64)] = True

        # ONE device pass for both row sets; absence-rule counts derived on
        # host (presence count of absence rule = n_rows - presence count).
        has_pos = positive_example_idx.shape[0] > 0
        row_sets = [negative_example_idx] + ([positive_example_idx] if has_pos else [])
        counts = rule_classifications.presence_counts(row_sets)

        n_neg = negative_example_idx.shape[0]
        negative_cover_counts = np.empty(2 * n_kmers, dtype=np.int64)
        # presence rules: covered negatives = negatives where k-mer absent
        negative_cover_counts[:n_kmers] = n_neg - counts[0]
        # absence rules: sum_rows gives n_neg - presence -> cover = presence
        negative_cover_counts[n_kmers:] = counts[0]

        positive_error_counts = np.zeros(2 * n_kmers, dtype=np.int64)
        if has_pos:
            n_pos = positive_example_idx.shape[0]
            positive_error_counts[:n_kmers] = n_pos - counts[1]
            positive_error_counts[n_kmers:] = counts[1]

        # Blockwise float64 utility max with reference tie accumulation
        # (scm.py:258-286).
        best_utility = -np.inf
        best_utility_idx = np.array([])
        best_utility_pos_error_count = np.array([])
        best_utility_neg_cover_count = np.array([])
        n_rules = 2 * n_kmers
        for block in range(int(ceil(1.0 * n_rules / UTIL_BLOCK_SIZE))):
            lo = block * UTIL_BLOCK_SIZE
            hi = min(n_rules, (block + 1) * UTIL_BLOCK_SIZE)
            block_utilities = negative_cover_counts[lo:hi] - float(
                self.p
            ) * positive_error_counts[lo:hi].astype(np.float64)
            block_utilities[rule_is_blacklisted[lo:hi]] = -np.inf

            block_max_utility = np.max(block_utilities)
            if block_max_utility > best_utility or np.allclose(
                best_utility, block_max_utility
            ):
                block_utility_argmax = (
                    np.where(np.isclose(block_utilities, block_max_utility))[0] + lo
                )
                if np.allclose(block_max_utility, best_utility):
                    best_utility_idx = np.hstack(
                        (best_utility_idx, block_utility_argmax)
                    )
                    best_utility_pos_error_count = np.hstack(
                        (
                            best_utility_pos_error_count,
                            positive_error_counts[block_utility_argmax],
                        )
                    )
                    best_utility_neg_cover_count = np.hstack(
                        (
                            best_utility_neg_cover_count,
                            negative_cover_counts[block_utility_argmax],
                        )
                    )
                else:
                    best_utility = block_max_utility
                    best_utility_idx = block_utility_argmax
                    best_utility_pos_error_count = positive_error_counts[
                        block_utility_argmax
                    ]
                    best_utility_neg_cover_count = negative_cover_counts[
                        block_utility_argmax
                    ]

        return (
            best_utility,
            best_utility_idx,
            best_utility_pos_error_count,
            best_utility_neg_cover_count,
        )
