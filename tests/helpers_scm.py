"""Shared builders for SCM device-engine tests."""

import numpy as np

from grm_tpu.parallel.scm_device import build_packed_mask


def make_cv_fits(y, n_genomes, w, model_types=("conjunction", "disjunction"),
                 ps=(0.5, 1.0, 3.0), n_folds=3):
    """The (model_type, p, fold) CV fit batch for scm_cv_grid_device et al.

    Disjunction fits swap the train masks (scm.py:69-73 semantics); test
    masks keep the true labels. Folds partition arange(n) by index modulo.
    """
    idx = np.arange(n_genomes)
    fits = []
    for model_type in model_types:
        for p in ps:
            for fold in range(n_folds):
                te = idx[idx % n_folds == fold]
                tr = idx[idx % n_folds != fold]
                pos = tr[y[tr] == 1]
                neg = tr[y[tr] == 0]
                if model_type == "disjunction":
                    pos, neg = neg, pos
                fits.append({
                    "pos_mask": build_packed_mask(pos, n_genomes, w),
                    "neg_mask": build_packed_mask(neg, n_genomes, w),
                    "test_pos_mask": build_packed_mask(
                        te[y[te] == 1], n_genomes, w),
                    "test_neg_mask": build_packed_mask(
                        te[y[te] == 0], n_genomes, w),
                    "p": p,
                    "model_type": model_type,
                })
    return fits
