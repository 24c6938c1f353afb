"""Binary and multiclass prediction metrics.

Value conventions mirror the reference ``learning/experiments/metrics.py``:
each metric maps to a LIST with one entry per prediction row, empty
denominators yield ``-inf``, and risk is the plain error fraction.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

__all__ = ["get_binary_metrics", "get_multiclass_metrics"]


def get_binary_metrics(predictions, answers):
    """Binary metrics dict of lists (reference metrics.py:24-63)."""
    predictions = np.asarray(predictions)
    answers = np.asarray(answers)
    if predictions.ndim == 1:
        predictions = predictions.reshape(1, -1)
    metrics = defaultdict(list)
    for i in range(predictions.shape[0]):
        p = predictions[i]
        risk = 1.0 * len(p[p != answers]) / len(answers)
        tp = int(np.sum(p[answers == 1] == 1))
        fp = int(np.sum(p[answers == 0] == 1))
        tn = int(np.sum(p[answers == 0] == 0))
        fn = int(np.sum(p[answers == 1] == 0))
        precision = 1.0 * tp / (tp + fp) if (tp + fp) != 0 else -np.inf
        sensitivity = recall = 1.0 * tp / (tp + fn) if (tp + fn) != 0 else -np.inf
        specificity = 1.0 * tn / (fp + tn) if (fp + tn) != 0 else -np.inf
        f1_score = (
            2.0 * precision * recall / (precision + recall)
            if (precision + recall) > 0.0
            else -np.inf
        )
        metrics["risk"].append(risk)
        metrics["tp"].append(tp)
        metrics["fp"].append(fp)
        metrics["tn"].append(tn)
        metrics["fn"].append(fn)
        metrics["precision"].append(precision)
        metrics["sensitivity"].append(sensitivity)
        metrics["recall"].append(recall)
        metrics["specificity"].append(specificity)
        metrics["f1_score"].append(f1_score)
    return metrics


def get_multiclass_metrics(predictions, answers, nb_class):
    """Multiclass risk + confusion matrix (reference metrics.py:65-92)."""
    predictions = np.asarray(predictions)
    answers = np.asarray(answers)
    if predictions.ndim == 1:
        predictions = predictions.reshape(1, -1)
    metrics = defaultdict(list)
    for i in range(predictions.shape[0]):
        p = predictions[i]
        risk = 1.0 * len(p[p != answers]) / len(answers)
        confusion_matrix = [
            [
                int(np.sum(p[answers == actual] == predicted))
                for predicted in range(nb_class)
            ]
            for actual in range(nb_class)
        ]
        metrics["risk"].append(risk)
        metrics["confusion_matrix"].append(confusion_matrix)
    return metrics
