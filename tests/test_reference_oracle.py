"""Reference-executed parity: the ACTUAL Kover implementation (2to3-
converted at test time, tests/refkover.py) is the oracle, not this repo's
hand-ported host engine (VERDICT r4 missing #1).

Every test here runs the converted reference code end to end — from_tsv,
split_with_proportion, learn_SCM, learn_CART — and asserts exact equality
(rules, tie sets, fold risks, metrics, importances, equivalence sets,
classification lists) against grm_tpu on tie-rich datasets where argmax
shortcuts would diverge. Matches: reference learners/scm.py:238-288,
experiment_scm.py:102-248, learners/cart.py:219-341, split.py:124-231.
"""

import shutil

import h5py
import numpy as np
import pytest

from grm_tpu.dataset import from_tsv
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.cart_experiment import learn_CART
from grm_tpu.learning.experiments.scm_experiment import learn_SCM

from refkover import import_ref


@pytest.fixture(scope="module")
def ref():
    return import_ref()


# ---------------------------------------------------------------------------
# dataset builders (tie-rich: duplicated + complemented columns)
# ---------------------------------------------------------------------------

def _write_tsv(tmp_path, dense, labels, name):
    n_genomes, n_kmers = dense.shape
    ids = ["g%03d" % i for i in range(n_genomes)]
    k = 8
    kmers = ["".join("ACGT"[(i >> (2 * j)) & 3] for j in range(k))
             for i in range(n_kmers)]
    assert len(set(kmers)) == n_kmers
    lines = ["kmers\t" + "\t".join(ids)]
    for r in range(n_kmers):
        lines.append(kmers[r] + "\t"
                     + "\t".join(str(int(v)) for v in dense[:, r]))
    tsv = tmp_path / (name + ".tsv")
    tsv.write_text("\n".join(lines) + "\n")
    meta = tmp_path / (name + "_meta.tsv")
    meta.write_text("\n".join(
        "%s\t%s" % (g, l) for g, l in zip(ids, labels)) + "\n")
    return tsv, meta


def _tied_dense(seed, n_genomes=24, n_kmers=60, n_classes=2):
    rng = np.random.RandomState(seed)
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = rng.randint(0, n_classes, n_genomes)
    # planted markers at several noise levels
    for c, noise in [(4, 3), (12, 6), (18, 9)]:
        col = (labels > 0).astype(np.uint8)
        flips = rng.choice(n_genomes, noise, replace=False)
        col[flips] = 1 - col[flips]
        dense[:, c] = col
    # exact duplicates -> utility/impurity ties with identical predictions
    dense[:, 30] = dense[:, 4]
    dense[:, 31] = dense[:, 4]
    dense[:, 40] = dense[:, 12]
    # complement pairs -> presence/absence rule ties
    dense[:, 50] = 1 - dense[:, 4]
    return dense, labels


def _parallel_artifacts(tmp_path, ref, dense, labels, name, seed=7,
                        n_folds=3, train_prop=0.7):
    """One artifact built+split by grm, one built+split by the REFERENCE
    implementation, from the same TSV. Returns (grm_path, ref_path)."""
    tsv, meta = _write_tsv(tmp_path, dense, labels, name)
    grm_ds = tmp_path / (name + "_grm.h5")
    ref_ds = tmp_path / (name + "_ref.h5")
    from_tsv(tsv, grm_ds, phenotype_description="synthetic",
             phenotype_metadata_path=meta, gzip=0)
    ref.dataset.create.from_tsv(
        str(tsv), str(ref_ds), phenotype_description="synthetic",
        phenotype_metadata_path=str(meta), gzip=0)
    split_with_proportion(grm_ds, "sp", train_prop=train_prop,
                          random_seed=seed, n_folds=n_folds)
    ref.dataset.split.split_with_proportion(
        str(ref_ds), "sp", train_prop=train_prop, random_seed=seed,
        n_folds=n_folds)
    return grm_ds, ref_ds


# ---------------------------------------------------------------------------
# normalizers (reference returns bytes where grm returns str)
# ---------------------------------------------------------------------------

def _s(x):
    return x.decode() if isinstance(x, bytes) else str(x)


def _rule_key(r):
    return (_s(r.kmer_sequence), _s(r.type))


def _norm_metrics(m):
    if m is None:
        return None
    return {k: [float(x) if not isinstance(x, list) else x for x in v]
            if isinstance(v, (list, np.ndarray)) else float(v)
            for k, v in m.items()}


def _scm_fingerprint(out):
    best_hp, score, train_m, test_m, model, imps, equiv, cls = out
    return {
        "hp": (_s(best_hp["model_type"]), float(best_hp["p"]),
               int(best_hp["max_rules"])),
        "score": None if score is None else float(score),
        "rules": [_rule_key(r) for r in model.rules],
        "importances": [float(v) for v in np.asarray(imps).ravel()],
        "equiv": [sorted(_rule_key(e) for e in eq) for eq in equiv],
        "train": _norm_metrics(train_m),
        "test": _norm_metrics(test_m),
        "cls": {k: sorted(_s(g) for g in v) for k, v in cls.items()},
    }


def _tree_fingerprint(node):
    if node.is_leaf:
        return ("leaf", int(node.class_prediction))
    return ("split", _rule_key(node.rule),
            _tree_fingerprint(node.left_child),
            _tree_fingerprint(node.right_child))


def _cart_fingerprint(out):
    best_hp, score, train_m, test_m, model, imps, equiv, cls = out
    ci = best_hp["class_importance"]
    return {
        "hp": (_s(best_hp["criterion"]),
               tuple(sorted((int(k), float(v)) for k, v in ci.items())),
               int(best_hp["max_depth"]),
               float(best_hp["min_samples_split"]),
               float(best_hp["pruning_alpha"])),
        "score": float(score),
        "tree": _tree_fingerprint(model.decision_tree),
        "importances": {_rule_key(r): float(v) for r, v in imps.items()},
        "equiv": {_rule_key(r): sorted(_rule_key(e) for e in eq)
                  for r, eq in equiv.items()},
        "train": _norm_metrics(train_m),
        "test": _norm_metrics(test_m),
        "cls": {k: sorted(_s(g) for g in v) for k, v in cls.items()},
    }


# ---------------------------------------------------------------------------
# artifact + split parity (reference create.py:119-275, split.py:124-231)
# ---------------------------------------------------------------------------

def test_reference_from_tsv_artifact_parity(tmp_path, ref):
    dense, labels = _tied_dense(0)
    tsv, meta = _write_tsv(tmp_path, dense, labels, "art")
    grm_ds = tmp_path / "art_grm.h5"
    ref_ds = tmp_path / "art_ref.h5"
    from_tsv(tsv, grm_ds, phenotype_description="synthetic",
             phenotype_metadata_path=meta, gzip=0)
    ref.dataset.create.from_tsv(
        str(tsv), str(ref_ds), phenotype_description="synthetic",
        phenotype_metadata_path=str(meta), gzip=0)
    with h5py.File(grm_ds) as fg, h5py.File(ref_ds) as fr:
        np.testing.assert_array_equal(fg["kmer_matrix"][...],
                                      fr["kmer_matrix"][...])
        np.testing.assert_array_equal(fg["phenotype"][...],
                                      fr["phenotype"][...])
        np.testing.assert_array_equal(fg["kmer_by_matrix_column"][...],
                                      fr["kmer_by_matrix_column"][...])
        assert ([_s(x) for x in fg["kmer_sequences"][...]]
                == [_s(x) for x in fr["kmer_sequences"][...]])
        assert ([_s(x) for x in fg["genome_identifiers"][...]]
                == [_s(x) for x in fr["genome_identifiers"][...]])
        assert (_s(fg.attrs["classification_type"])
                == _s(fr.attrs["classification_type"]))


def test_reference_split_parity(tmp_path, ref):
    dense, labels = _tied_dense(1)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "spl", seed=42, n_folds=4)
    with h5py.File(grm_ds) as fg, h5py.File(ref_ds) as fr:
        sg, sr = fg["splits/sp"], fr["splits/sp"]
        for key in ("train_genome_idx", "test_genome_idx", "unique_risks",
                    "unique_risk_by_kmer", "unique_risk_by_anti_kmer"):
            np.testing.assert_array_equal(sg[key][...], sr[key][...],
                                          err_msg=key)
        assert sorted(sg["folds"]) == sorted(sr["folds"])
        for fold in sg["folds"]:
            for key in ("train_genome_idx", "test_genome_idx",
                        "unique_risks", "unique_risk_by_kmer",
                        "unique_risk_by_anti_kmer"):
                np.testing.assert_array_equal(
                    sg["folds"][fold][key][...],
                    sr["folds"][fold][key][...],
                    err_msg="%s/%s" % (fold, key))


# ---------------------------------------------------------------------------
# SCM parity (reference experiment_scm.py:674-889)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 3])
def test_reference_scm_cv_parity(tmp_path, ref, seed):
    dense, labels = _tied_dense(seed)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "scv%d" % seed, seed=seed)
    kwargs = dict(
        split_name="sp", model_type=["conjunction", "disjunction"],
        p=[0.5, 1.0, 2.0], kmer_blacklist_file=None, max_rules=4,
        max_equiv_rules=100, parameter_selection="cv", n_cpu=1,
        random_seed=17, authorized_rules="", bound_delta=0.05,
        bound_max_genome_size=dense.shape[1])
    expected = _scm_fingerprint(ref.learning.experiments.experiment_scm
                                .learn_SCM(dataset_file=str(ref_ds),
                                           **kwargs))
    host = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="host",
                                      **kwargs))
    dev = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="device",
                                     **kwargs))
    assert host == expected
    assert dev == expected
    if seed == 0:
        # the engineered duplicates must actually have produced tie sets
        assert any(len(eq) > 1 for eq in expected["equiv"])


def test_reference_scm_bound_parity(tmp_path, ref):
    dense, labels = _tied_dense(5)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "sbd", seed=5)
    kwargs = dict(
        split_name="sp", model_type=["conjunction", "disjunction"],
        p=[1.0, 2.0], kmer_blacklist_file=None, max_rules=3,
        max_equiv_rules=100, parameter_selection="bound", n_cpu=1,
        random_seed=3, authorized_rules="", bound_delta=0.05,
        bound_max_genome_size=1000)
    expected = _scm_fingerprint(ref.learning.experiments.experiment_scm
                                .learn_SCM(dataset_file=str(ref_ds),
                                           **kwargs))
    host = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="host",
                                      **kwargs))
    dev = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="device",
                                     **kwargs))
    assert host == expected
    assert dev == expected


def test_reference_scm_equiv_subsample_parity(tmp_path, ref):
    """max_equiv_rules smaller than a tie set forces the RandomState
    subsample (experiment_scm.py:269-282) — same seed, same sample."""
    rng = np.random.RandomState(9)
    n_genomes, n_kmers = 20, 40
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    for c in range(8):  # 8-way duplicated PERFECT marker: the greedy
        dense[:, 10 + c] = labels  # winner is an 8-way tie > the cap

    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "ssub", seed=9, n_folds=2)
    kwargs = dict(
        split_name="sp", model_type=["conjunction"], p=[1.0],
        kmer_blacklist_file=None, max_rules=3, max_equiv_rules=3,
        parameter_selection="none", n_cpu=1, random_seed=1234,
        authorized_rules="", bound_delta=0.05,
        bound_max_genome_size=n_kmers)
    expected = _scm_fingerprint(ref.learning.experiments.experiment_scm
                                .learn_SCM(dataset_file=str(ref_ds),
                                           **kwargs))
    host = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="host",
                                      **kwargs))
    dev = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="device",
                                     **kwargs))
    assert max(len(eq) for eq in expected["equiv"]) == 3  # cap engaged
    assert host == expected
    assert dev == expected


# ---------------------------------------------------------------------------
# CART parity (reference experiment_cart.py:521-646)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("criterion", ["gini", "cross-entropy"])
def test_reference_cart_cv_parity(tmp_path, ref, criterion):
    dense, labels = _tied_dense(2)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "ccv" + criterion[:1], seed=2,
                                         n_folds=2)
    kwargs = dict(
        split_name="sp", criterion=[criterion], max_depth=[3],
        min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        bound_delta=0.05, bound_max_genome_size=dense.shape[1],
        kmer_blacklist_file=None, parameter_selection="cv", n_cpu=1,
        authorized_rules="")
    expected = _cart_fingerprint(ref.learning.experiments.experiment_cart
                                 .learn_CART(dataset_file=str(ref_ds),
                                             **kwargs))
    host = _cart_fingerprint(learn_CART(dataset_file=grm_ds, engine="host",
                                        **kwargs))
    dev = _cart_fingerprint(learn_CART(dataset_file=grm_ds,
                                       engine="device", **kwargs))
    assert host == expected
    assert dev == expected


def test_reference_cart_bound_parity(tmp_path, ref):
    dense, labels = _tied_dense(6)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "cbd", seed=6, n_folds=2)
    kwargs = dict(
        split_name="sp", criterion=["gini"], max_depth=[3],
        min_samples_split=[2], class_importance=[{0: 1.0, 1: 1.0}],
        bound_delta=0.05, bound_max_genome_size=1000,
        kmer_blacklist_file=None, parameter_selection="bound", n_cpu=1,
        authorized_rules="")
    expected = _cart_fingerprint(ref.learning.experiments.experiment_cart
                                 .learn_CART(dataset_file=str(ref_ds),
                                             **kwargs))
    host = _cart_fingerprint(learn_CART(dataset_file=grm_ds, engine="host",
                                        **kwargs))
    dev = _cart_fingerprint(learn_CART(dataset_file=grm_ds,
                                       engine="device", **kwargs))
    assert host == expected
    assert dev == expected


def test_reference_cart_multiclass_parity(tmp_path, ref):
    dense, labels = _tied_dense(4, n_classes=3)
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "cmc", seed=4, n_folds=2)
    kwargs = dict(
        split_name="sp", criterion=["gini"], max_depth=[3],
        min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0, 2: 1.0}],
        bound_delta=0.05, bound_max_genome_size=dense.shape[1],
        kmer_blacklist_file=None, parameter_selection="cv", n_cpu=1,
        authorized_rules="")
    expected = _cart_fingerprint(ref.learning.experiments.experiment_cart
                                 .learn_CART(dataset_file=str(ref_ds),
                                             **kwargs))
    host = _cart_fingerprint(learn_CART(dataset_file=grm_ds, engine="host",
                                        **kwargs))
    dev = _cart_fingerprint(learn_CART(dataset_file=grm_ds,
                                       engine="device", **kwargs))
    assert host == expected
    assert dev == expected


def test_reference_cart_equiv_tie_parity(tmp_path, ref):
    """A perfect 4-way duplicated marker forces an impurity tie the
    occurrence tiebreaker cannot break — the reference's equivalence set
    (experiment_cart.py:82-94, _split_callback) must match exactly."""
    rng = np.random.RandomState(8)
    n_genomes, n_kmers = 24, 40
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    for c in range(4):
        dense[:, 10 + c] = labels
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "ceq", seed=8, n_folds=2)
    kwargs = dict(
        split_name="sp", criterion=["gini"], max_depth=[2],
        min_samples_split=[2], class_importance=[{0: 1.0, 1: 1.0}],
        bound_delta=0.05, bound_max_genome_size=n_kmers,
        kmer_blacklist_file=None, parameter_selection="cv", n_cpu=1,
        authorized_rules="")
    expected = _cart_fingerprint(ref.learning.experiments.experiment_cart
                                 .learn_CART(dataset_file=str(ref_ds),
                                             **kwargs))
    host = _cart_fingerprint(learn_CART(dataset_file=grm_ds, engine="host",
                                        **kwargs))
    dev = _cart_fingerprint(learn_CART(dataset_file=grm_ds,
                                       engine="device", **kwargs))
    assert max(len(v) for v in expected["equiv"].values()) >= 4
    assert host == expected
    assert dev == expected


def test_reference_split_with_ids_parity(tmp_path, ref):
    """Explicit-id splits (reference split.py:31-83): same idx order, fold
    assignment, and risk tables."""
    dense, labels = _tied_dense(7)
    tsv, meta = _write_tsv(tmp_path, dense, labels, "sid")
    grm_ds = tmp_path / "sid_grm.h5"
    ref_ds = tmp_path / "sid_ref.h5"
    from_tsv(tsv, grm_ds, phenotype_description="synthetic",
             phenotype_metadata_path=meta, gzip=0)
    ref.dataset.create.from_tsv(
        str(tsv), str(ref_ds), phenotype_description="synthetic",
        phenotype_metadata_path=str(meta), gzip=0)
    ids = [_s(x) for x in
           __import__("h5py").File(grm_ds)["genome_identifiers"][...]]
    train_f = tmp_path / "train_ids.txt"
    test_f = tmp_path / "test_ids.txt"
    train_f.write_text("\n".join(ids[:16]) + "\n")
    test_f.write_text("\n".join(ids[16:]) + "\n")

    from grm_tpu.dataset.split import split_with_ids

    split_with_ids(grm_ds, "sp", train_f, test_f, random_seed=3, n_folds=3)
    ref.dataset.split.split_with_ids(
        str(ref_ds), "sp", str(train_f), str(test_f), random_seed=3,
        n_folds=3)
    with h5py.File(grm_ds) as fg, h5py.File(ref_ds) as fr:
        sg, sr = fg["splits/sp"], fr["splits/sp"]
        for key in ("train_genome_idx", "test_genome_idx", "unique_risks",
                    "unique_risk_by_kmer", "unique_risk_by_anti_kmer"):
            np.testing.assert_array_equal(sg[key][...], sr[key][...],
                                          err_msg=key)
        for fold in sg["folds"]:
            for key in ("train_genome_idx", "test_genome_idx",
                        "unique_risks", "unique_risk_by_kmer"):
                np.testing.assert_array_equal(
                    sg["folds"][fold][key][...],
                    sr["folds"][fold][key][...],
                    err_msg="%s/%s" % (fold, key))


def test_reference_scm_blacklist_parity(tmp_path, ref):
    """k-mer blacklists route through _find_rule_blacklist
    (experiment_scm.py:632-671) — presence AND absence rule indices —
    and must exclude the same rules in both implementations."""
    rng = np.random.RandomState(14)
    n_genomes, n_kmers = 24, 50
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 7] = labels  # perfect marker, to be blacklisted
    col = labels.copy()
    col[rng.choice(n_genomes, 3, replace=False)] ^= 1
    dense[:, 20] = col  # runner-up
    grm_ds, ref_ds = _parallel_artifacts(tmp_path, ref, dense, labels,
                                         "sbl", seed=14, n_folds=2)
    seqs = [_s(x) for x in h5py.File(grm_ds)["kmer_sequences"][...]]
    kbc = h5py.File(grm_ds)["kmer_by_matrix_column"][...]
    marker_kmer = seqs[int(kbc[7])]
    bl = tmp_path / "bl.txt"
    bl.write_text(marker_kmer + "\n")
    kwargs = dict(
        split_name="sp", model_type=["conjunction"], p=[1.0],
        kmer_blacklist_file=str(bl), max_rules=3, max_equiv_rules=100,
        parameter_selection="cv", n_cpu=1, random_seed=1,
        authorized_rules="", bound_delta=0.05,
        bound_max_genome_size=n_kmers)
    expected = _scm_fingerprint(ref.learning.experiments.experiment_scm
                                .learn_SCM(dataset_file=str(ref_ds),
                                           **kwargs))
    host = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="host",
                                      **kwargs))
    dev = _scm_fingerprint(learn_SCM(dataset_file=grm_ds, engine="device",
                                     **kwargs))
    assert all(seq != marker_kmer for seq, _ in expected["rules"])
    assert host == expected
    assert dev == expected
