"""SCM learner: dense numpy oracle parity + end-to-end learn_SCM."""

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_contigs
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.scm_experiment import learn_SCM
from grm_tpu.learning.models import KmerRule
from grm_tpu.learning.rules import KmerRuleClassifications
from grm_tpu.learning.scm import SetCoveringMachine
from grm_tpu.ops.popcount import BitMatrix


# ---------------------------------------------------------------------------
# Oracle: direct dense implementation of the reference SCM greedy algorithm
# (no bit packing, no blocking) used to validate the engine path.
# ---------------------------------------------------------------------------
def _oracle_scm(dense, pos_idx, neg_idx, p, max_rules, model_type, risk_order):
    """Returns the sequence of selected rule indices (2K space)."""
    n_kmers = dense.shape[1]
    X = np.hstack([dense, 1 - dense])  # presence then absence columns
    if model_type == "disjunction":
        pos_idx, neg_idx = neg_idx, pos_idx
    chosen = []
    pos_idx = np.array(pos_idx)
    neg_idx = np.array(neg_idx)
    while len(neg_idx) > 0 and len(chosen) < max_rules:
        neg_cover = (X[neg_idx] == 0).sum(axis=0).astype(np.float64)
        pos_err = (X[pos_idx] == 0).sum(axis=0).astype(np.float64)
        utility = neg_cover - p * pos_err
        best = utility.max()
        ties = np.where(np.isclose(utility, best))[0]
        ties = ties[np.logical_or(neg_cover[ties] != 0, pos_err[ties] != 0)]
        if len(ties) == 0:
            break
        if len(ties) > 1:
            tie_risks = risk_order[ties]
            if model_type == "conjunction":
                ties = ties[np.isclose(tie_risks, tie_risks.min())]
            else:
                ties = ties[np.isclose(tie_risks, tie_risks.max())]
        rule = int(ties[0])
        chosen.append(rule)
        neg_idx = neg_idx[X[neg_idx, rule] != 0]
        pos_idx = pos_idx[X[pos_idx, rule] != 0]
    return chosen


class _DenseDataset:
    """Minimal stand-in implementing the dataset surface used by the engine."""

    def __init__(self, dense):
        self.dense = np.asarray(dense, np.uint8)
        self._bm = BitMatrix.from_dense(self.dense)
        self.genome_count = self.dense.shape[0]
        self.kmer_count = self.dense.shape[1]

    def bit_matrix(self, sharding=None):
        return self._bm

    def get_matrix_columns(self, columns):
        columns = np.asarray(columns, np.int64)
        base = np.where(columns >= self.kmer_count, columns - self.kmer_count, columns)
        out = self.dense[:, base].copy()
        inv = columns >= self.kmer_count
        out[:, inv] = 1 - out[:, inv]
        return out


class _ListRules:
    def __init__(self, n_kmers):
        self.n = 2 * n_kmers
        self.n_kmers = n_kmers

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        i = int(i)
        return KmerRule(i % self.n_kmers, "K%d" % (i % self.n_kmers),
                        "absence" if i >= self.n_kmers else "presence")


@pytest.mark.parametrize("model_type", ["conjunction", "disjunction"])
@pytest.mark.parametrize("p", [0.5, 1.0, 2.0])
def test_scm_matches_dense_oracle(rng, model_type, p):
    n_genomes, n_kmers = 50, 120
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    pos_idx = np.where(y == 1)[0]
    neg_idx = np.where(y == 0)[0]
    risk_order = rng.permutation(2 * n_kmers).astype(np.float64)

    selected = []

    def tiebreaker(idx):
        tie = risk_order[idx]
        if model_type == "conjunction":
            return idx[np.isclose(tie, tie.min())]
        return idx[np.isclose(tie, tie.max())]

    ds = _DenseDataset(dense)
    predictor = SetCoveringMachine(model_type=model_type, p=p, max_rules=5)
    predictor.fit(
        rules=_ListRules(n_kmers),
        rule_classifications=KmerRuleClassifications(ds),
        positive_example_idx=pos_idx,
        negative_example_idx=neg_idx,
        tiebreaker=tiebreaker,
        iteration_callback=lambda info: selected.append(
            int(info["equivalent_rules_idx"][0])
        ),
    )
    want = _oracle_scm(dense, pos_idx, neg_idx, p, 5, model_type, risk_order)
    assert selected == want


def test_scm_finds_planted_rule(rng):
    """A k-mer perfectly separating classes must be chosen first with risk 0."""
    n_genomes, n_kmers = 30, 80
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 7] = y  # perfect presence marker
    ds = _DenseDataset(dense)

    predictor = SetCoveringMachine(model_type="conjunction", p=1.0, max_rules=5)
    predictor.fit(
        rules=_ListRules(n_kmers),
        rule_classifications=KmerRuleClassifications(ds),
        positive_example_idx=np.where(y == 1)[0],
        negative_example_idx=np.where(y == 0)[0],
        tiebreaker=lambda idx: idx,
    )
    assert len(predictor.model) == 1
    assert predictor.model.rules[0].kmer_index == 7
    X = np.hstack([dense, 1 - dense])
    preds = predictor.model.predict(dense)
    np.testing.assert_array_equal(preds, y)


def test_scm_blacklist(rng):
    n_genomes, n_kmers = 30, 40
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 3] = y
    ds = _DenseDataset(dense)
    predictor = SetCoveringMachine(model_type="conjunction", p=1.0, max_rules=1)
    predictor.fit(
        rules=_ListRules(n_kmers),
        rule_classifications=KmerRuleClassifications(ds),
        positive_example_idx=np.where(y == 1)[0],
        negative_example_idx=np.where(y == 0)[0],
        rule_blacklist=[3, 3 + n_kmers],
        tiebreaker=lambda idx: idx,
    )
    assert all(r.kmer_index != 3 for r in predictor.model.rules)


# ---------------------------------------------------------------------------
# End-to-end learn_SCM over a real HDF5 dataset
# ---------------------------------------------------------------------------
@pytest.fixture
def planted_dataset(tmp_path, rng):
    """20 genomes; label-1 genomes carry a marker sequence."""
    k = 15
    marker = "ACGTTGCAACGGTCATCGAATTGCC"  # 25bp -> 11 distinct 15-mers
    list_lines = []
    labels_lines = []
    for i in range(20):
        gid = "g%02d" % i
        label = i % 2
        bg = "".join(rng.choice(list("ACGT"), 300))
        seq = bg[:150] + (marker if label else "") + bg[150:]
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c0\n%s\n" % seq)
        list_lines.append("%s\t%s" % (gid, p))
        labels_lines.append("%s\t%d" % (gid, label))
    contig_list = tmp_path / "contigs.tsv"
    contig_list.write_text("\n".join(list_lines) + "\n")
    meta = tmp_path / "meta.tsv"
    meta.write_text("\n".join(labels_lines) + "\n")
    ds_path = tmp_path / "ds.h5"
    from_contigs(contig_list, ds_path, kmer_size=k,
                 phenotype_description="marker", phenotype_metadata_path=meta,
                 gzip=0)
    split_with_proportion(ds_path, "sp", train_prop=0.7, random_seed=2, n_folds=2)
    return ds_path, marker, k


def test_learn_scm_none_selection(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hp, best_hp_score, train_metrics, test_metrics, model, \
        rule_importances, equivalent_rules, classifications = learn_SCM(
            dataset_file=ds_path, split_name="sp", model_type="conjunction",
            p=[1.0], max_rules=3, parameter_selection="none", random_seed=42,
            bound_delta=0.05, bound_max_genome_size=1000,
        )
    assert train_metrics["risk"][0] == 0.0
    assert test_metrics["risk"][0] == 0.0
    assert len(model) == 1
    # The selected rule's k-mer must come from the marker.
    marker_kmers = set()
    comp = str.maketrans("ACGT", "TGCA")
    for i in range(len(marker) - k + 1):
        km = marker[i:i + k]
        marker_kmers.add(min(km, km.translate(comp)[::-1]))
    assert model.rules[0].kmer_sequence in marker_kmers
    assert model.rules[0].type == "presence"
    assert 0.0 < train_metrics["bound"] < 1.0
    assert len(equivalent_rules[0]) >= 1
    assert rule_importances[0] == pytest.approx(1.0)
    assert len(classifications["train_errors"]) == 0


def test_learn_scm_cv(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hp, best_hp_score, train_metrics, test_metrics, model, *_ = learn_SCM(
        dataset_file=ds_path, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0],
        max_rules=3, parameter_selection="cv", random_seed=42,
        bound_delta=0.05, bound_max_genome_size=1000,
    )
    assert best_hp_score == 0.0  # separable -> perfect CV score
    assert best_hp["max_rules"] == 1
    assert test_metrics["risk"][0] == 0.0


def test_learn_scm_device_engine(planted_dataset):
    """Device-engine CV + fit: same quality on the separable dataset."""
    ds_path, marker, k = planted_dataset
    best_hp, best_hp_score, train_metrics, test_metrics, model, \
        rule_importances, equivalent_rules, classifications = learn_SCM(
            dataset_file=ds_path, split_name="sp",
            model_type=["conjunction", "disjunction"], p=[0.5, 1.0],
            max_rules=3, parameter_selection="cv", random_seed=42,
            engine="device",
        )
    assert best_hp_score == 0.0
    assert best_hp["max_rules"] == 1
    assert train_metrics["risk"][0] == 0.0
    assert test_metrics["risk"][0] == 0.0
    assert len(model) == 1
    assert rule_importances[0] == pytest.approx(1.0)
    # exact device engine captures the true equivalence (tie) set: every
    # marker k-mer separates perfectly, so the class has multiple members
    assert len(equivalent_rules) == 1 and len(equivalent_rules[0]) >= 1


def test_learn_scm_device_matches_host_on_unique_utilities(tmp_path, rng):
    """With no exact utility ties, both engines select identical rules."""
    from grm_tpu.dataset import from_contigs
    from grm_tpu.dataset.split import split_with_proportion

    # Single-contig random genomes: k-mer utilities rarely tie exactly at
    # p=0.77 with uneven class sizes; verify rule-for-rule equality.
    k = 13
    lines_c, lines_m = [], []
    for i in range(15):
        gid = "h%02d" % i
        seq = "".join(rng.choice(list("ACGT"), 400))
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % seq)
        lines_c.append("%s\t%s" % (gid, p))
        lines_m.append("%s\t%d" % (gid, 1 if i < 7 else 0))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds_path = tmp_path / "d.h5"
    from_contigs(tmp_path / "c.tsv", ds_path, kmer_size=k,
                 phenotype_description="x",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(ds_path, "s", train_prop=0.8, random_seed=5, n_folds=0)

    out_host = learn_SCM(dataset_file=ds_path, split_name="s",
                         model_type="conjunction", p=[0.77], max_rules=4,
                         parameter_selection="none", random_seed=1)
    out_dev = learn_SCM(dataset_file=ds_path, split_name="s",
                        model_type="conjunction", p=[0.77], max_rules=4,
                        parameter_selection="none", random_seed=1,
                        engine="device")
    host_rules = [(r.kmer_sequence, r.type) for r in out_host[4].rules]
    dev_rules = [(r.kmer_sequence, r.type) for r in out_dev[4].rules]
    assert host_rules == dev_rules
    assert out_host[2]["risk"][0] == out_dev[2]["risk"][0]


def test_learn_scm_device_engine_sharded(planted_dataset):
    """Device engine over an 8-device mesh matches the unsharded device run."""
    from grm_tpu.parallel.mesh import make_mesh

    ds_path, marker, k = planted_dataset
    kwargs = dict(
        dataset_file=ds_path, split_name="sp",
        model_type=["conjunction"], p=[1.0], max_rules=3,
        parameter_selection="cv", random_seed=42, engine="device",
    )
    out_plain = learn_SCM(**kwargs)
    out_mesh = learn_SCM(**kwargs, mesh=make_mesh(8))
    assert [str(r) for r in out_plain[4].rules] == [str(r) for r in out_mesh[4].rules]
    assert out_plain[1] == out_mesh[1]
    assert out_plain[3]["risk"][0] == out_mesh[3]["risk"][0]


def test_learn_scm_bound_selection(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hp, best_hp_score, train_metrics, test_metrics, model, *_ = learn_SCM(
        dataset_file=ds_path, split_name="sp", model_type=["conjunction"],
        p=[1.0], max_rules=3, parameter_selection="bound", random_seed=42,
        bound_delta=0.05, bound_max_genome_size=1000,
    )
    assert 0.0 < best_hp_score < 1.0
    assert train_metrics["bound"] == best_hp_score
    assert test_metrics["risk"][0] == 0.0
