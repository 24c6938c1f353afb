"""Metrics, models, rules, bounds unit tests."""

import numpy as np
import pytest

from grm_tpu.learning.bounds import build_compression_set, scm_bound
from grm_tpu.learning.metrics import get_binary_metrics, get_multiclass_metrics
from grm_tpu.learning.models import ConjunctionModel, DisjunctionModel, KmerRule


def test_binary_metrics_hand_computed():
    answers = np.array([1, 1, 1, 0, 0, 0])
    preds = np.array([1, 1, 0, 0, 0, 1])
    m = get_binary_metrics(preds, answers)
    assert m["risk"][0] == pytest.approx(2 / 6)
    assert m["tp"][0] == 2 and m["fn"][0] == 1
    assert m["fp"][0] == 1 and m["tn"][0] == 2
    assert m["precision"][0] == pytest.approx(2 / 3)
    assert m["sensitivity"][0] == pytest.approx(2 / 3)
    assert m["specificity"][0] == pytest.approx(2 / 3)
    assert m["f1_score"][0] == pytest.approx(2 / 3)


def test_binary_metrics_empty_denominators():
    answers = np.zeros(4, dtype=int)
    preds = np.zeros(4, dtype=int)
    m = get_binary_metrics(preds, answers)
    assert m["precision"][0] == -np.inf
    assert m["sensitivity"][0] == -np.inf
    assert m["specificity"][0] == 1.0
    assert m["f1_score"][0] == -np.inf


def test_multiclass_metrics():
    answers = np.array([0, 1, 2, 2])
    preds = np.array([0, 2, 2, 1])
    m = get_multiclass_metrics(preds, answers, 3)
    assert m["risk"][0] == pytest.approx(0.5)
    assert m["confusion_matrix"][0] == [[1, 0, 0], [0, 0, 1], [0, 1, 1]]


def test_multiclass_metrics_small_dtype_many_classes():
    """uint8 labels with nb_class >= 16 must not overflow the flattened
    confusion index (y * nb_class + p wraps in uint8 under NEP 50)."""
    answers = np.array([16, 16, 3], dtype=np.uint8)
    preds = np.array([[16, 2, 3]], dtype=np.uint8)
    m = get_multiclass_metrics(preds, answers, 17)
    cm = np.array(m["confusion_matrix"][0])
    assert cm[16][16] == 1
    assert cm[16][2] == 1
    assert cm[3][3] == 1
    assert cm.sum() == 3


def test_conjunction_disjunction_predictions():
    X = np.array([[1, 1], [1, 0], [0, 1], [0, 0]], dtype=np.uint8)
    r0 = KmerRule(0, "AAA", "presence")
    r1 = KmerRule(1, "CCC", "presence")
    conj = ConjunctionModel()
    conj.add(r0)
    conj.add(r1)
    np.testing.assert_array_equal(conj.predict(X), [1, 0, 0, 0])
    disj = DisjunctionModel()
    disj.add(r0)
    disj.add(r1)
    np.testing.assert_array_equal(disj.predict(X), [1, 1, 1, 0])

    absence = KmerRule(0, "AAA", "absence")
    conj2 = ConjunctionModel()
    conj2.add(absence)
    np.testing.assert_array_equal(conj2.predict(X), [0, 0, 1, 1])
    assert str(absence) == "Absence(AAA)"
    assert str(conj) == "Presence(AAA) and Presence(CCC)"


def test_compression_set_greedy():
    # 4 examples x 3 rule-kmers
    presence = np.array([
        [1, 1, 0],
        [0, 0, 1],
        [1, 0, 0],
        [0, 1, 1],
    ])
    cs = build_compression_set(presence)
    # First pick: example 0 or 3 (both cover 2); argmax -> example 0.
    # Remaining column: kmer 2 -> best is example 1 (index in ORIGINAL rows).
    assert cs == [0, 1]


def test_compression_set_uncoverable_column_terminates():
    presence = np.zeros((3, 2), dtype=int)
    assert build_compression_set(presence) == []


class _FakeRuleClassifications:
    def __init__(self, dense):
        self.dense = dense

    def get_columns(self, columns):
        return self.dense[:, np.asarray(columns)]


def test_scm_bound_quirk():
    """For non-empty models the comb terms are dropped (reference
    experiment_scm.py:384-398 ternary precedence)."""
    from math import comb, exp, log as ln, pi

    train_idx = np.arange(6)
    answers = np.array([1, 1, 1, 0, 0, 0])
    preds = np.array([1, 1, 0, 0, 0, 0])

    # Empty model: comb terms only.
    model = ConjunctionModel()
    b0 = scm_bound(preds, answers, train_idx, model, 0.05, 1000,
                   _FakeRuleClassifications(np.zeros((6, 1), np.uint8)))
    m, mz = 6.0, 0.0
    r = 1.0
    want0 = 1.0 - exp((-1.0 / (m - mz - r)) * (ln(comb(6, 0)) + ln(comb(6, 1))))
    assert b0 == pytest.approx(want0)

    # One-rule model: h*ln(2 Z) + ln(pi^6 ...) only, NO comb terms.
    dense = np.array([[1], [1], [0], [0], [0], [0]], np.uint8)
    model1 = ConjunctionModel()
    model1.add(KmerRule(0, "AAA", "presence"))
    b1 = scm_bound(preds, answers, train_idx, model1, 0.05, 1000,
                   _FakeRuleClassifications(dense))
    # compression set: greedy over dense[train] -> example 0 covers the column
    mz = 1.0
    Z = mz * 1000
    h = 1.0
    r = float((preds != answers).sum()) - 0.0  # example 0 predicted correctly
    want1 = 1.0 - exp(
        (-1.0 / (m - mz - r))
        * (h * ln(2 * Z) + ln(pi ** 6 * (h + 1) ** 2 * (r + 1) ** 2 * (mz + 1) ** 2 / (216 * 0.05)))
    )
    assert b1 == pytest.approx(want1)


def test_lazy_sequence_cache_invalidates_on_rebuild(tmp_path):
    """The process-wide sequence/chunk caches key on (path, mtime): a
    dataset REBUILT at the same path must not serve stale sequences."""
    import os
    import time

    import numpy as np

    from grm_tpu.dataset import GrmDataset, from_tsv
    from grm_tpu.learning.rules import LazyKmerRuleList

    def write(tag):
        n, nk, k = 6, 8, 6
        ids = ["g%d" % i for i in range(n)]
        kmers = [tag * 3 + "".join("ACGT"[(i >> (2 * j)) & 3]
                                   for j in range(k - 3))
                 for i in range(nk)]
        lines = ["kmers\t" + "\t".join(ids)]
        for r in range(nk):
            lines.append(kmers[r] + "\t" + "\t".join("1" for _ in ids))
        (tmp_path / "m.tsv").write_text("\n".join(lines) + "\n")
        (tmp_path / "meta.tsv").write_text(
            "\n".join("%s\t%d" % (g, i % 2)
                      for i, g in enumerate(ids)) + "\n")
        out = tmp_path / "same_path.h5"
        if out.exists():
            os.unlink(out)
        from_tsv(tmp_path / "m.tsv", out, phenotype_description="x",
                 phenotype_metadata_path=tmp_path / "meta.tsv", gzip=0)
        return out, kmers[0][:3]

    ds_path, tag_a = write("A")
    rules = LazyKmerRuleList(GrmDataset(ds_path))
    assert rules[0].kmer_sequence.startswith(tag_a)

    time.sleep(0.02)  # ensure a distinct mtime
    ds_path, tag_c = write("C")
    os.utime(ds_path)  # robust against coarse mtime resolution
    rules2 = LazyKmerRuleList(GrmDataset(ds_path))
    assert rules2[0].kmer_sequence.startswith(tag_c)
