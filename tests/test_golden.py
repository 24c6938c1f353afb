"""Golden regression tests: exact model outputs pinned for fixed seeds.

These freeze the selection semantics (utility ties, risk tiebreakers, RNG
contracts) end-to-end: any refactor that changes a chosen rule, a metric
value, or a report line shows up as a diff here. The expected values were
produced by this implementation and hand-checked against the reference
algorithm's decision rules.
"""

import json

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_contigs
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments import learn_CART, learn_SCM


@pytest.fixture(scope="module")
def golden_dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("golden")
    rng = np.random.RandomState(1234)
    lines_c, lines_m = [], []
    for i in range(18):
        gid = "G%02d" % i
        seq = "".join(rng.choice(list("ACGT"), 600))
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % seq)
        lines_c.append("%s\t%s" % (gid, p))
        lines_m.append("%s\t%d" % (gid, 1 if i % 3 == 0 else 0))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds = tmp_path / "g.h5"
    from_contigs(tmp_path / "c.tsv", ds, kmer_size=17,
                 phenotype_description="golden",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(ds, "s", train_prop=0.7, random_seed=99, n_folds=2)
    return ds


def test_golden_dataset_shape(golden_dataset):
    ds = GrmDataset(golden_dataset)
    assert ds.genome_count == 18
    assert ds.kmer_count == 10512
    sp = ds.get_split("s")
    assert list(sp.train_genome_idx[:5]) == [0, 2, 4, 5, 6]
    assert len(sp.unique_risks) == 6


def test_golden_scm_none(golden_dataset):
    out = learn_SCM(dataset_file=golden_dataset, split_name="s",
                    model_type="conjunction", p=[1.0], max_rules=3,
                    parameter_selection="none", random_seed=7)
    best_hp, score, train_m, test_m, model, importances, equiv, cls = out
    rules = [str(r) for r in model.rules]
    # Regression pin: the exact greedy selection for this seed/dataset.
    # (Random unseparable data: one rule exhausts the useful utility.)
    assert rules == ["Presence(AAAAAACAGGTACCAGT)"], rules
    assert train_m["risk"][0] == pytest.approx(0.3076923076923077)


def test_golden_cart_cv(golden_dataset):
    out = learn_CART(dataset_file=golden_dataset, split_name="s",
                     criterion="gini", max_depth=3, min_samples_split=2,
                     class_importance={0: 1.0, 1: 1.0},
                     parameter_selection="cv")
    best_hps, score, train_m, test_m, model, imp, equiv, cls = out
    # CV cost-complexity pruning on random data collapses to the root leaf.
    assert [str(r) for r in model.decision_tree.rules] == []
    assert model.decision_tree.is_leaf
