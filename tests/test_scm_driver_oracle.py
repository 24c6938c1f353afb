"""Independent dense-numpy oracle of the FULL learn_SCM CV flow.

VERDICT r2 item 4: the golden tests elsewhere pin this implementation
against itself; this file pins the *experiment driver* against a dense
reimplementation written directly from the reference sources —
``experiment_scm.py:100-346`` (fold loop, per-length risk matrix, HP tie
rules, full train + equivalent-rule RNG) and ``learners/scm.py:54-288``
(greedy fit, blockwise utility scan with the allclose quirk, zero-coverage
filter) — with no bit packing, no blocking engine, and no imports from
``grm_tpu.learning``. If ``_cross_validation``'s tie rules or the greedy
fit semantics drift, these tests fail.

Known deliberate divergence (documented in scm_experiment.py): the
reference evaluates HPs in ``Pool.imap_unordered`` completion order
(nondeterministic); this framework and the oracle use deterministic
``product(model_types, p_values)`` order.
"""

import numpy as np
import pytest

import grm_tpu.learning.scm as scm_mod
import grm_tpu.parallel.scm_exact as exact_mod
from grm_tpu.dataset import GrmDataset, from_tsv
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.scm_experiment import learn_SCM
from grm_tpu.utils import unpack_binary_bytes_from_ints


# ---------------------------------------------------------------------------
# The oracle. Dense numpy only, written from the reference call stack.
# ---------------------------------------------------------------------------

class ScmOracle:
    """learn_SCM (cv flow) from the reference, over a dense 0/1 matrix."""

    def __init__(self, dense, labels, util_block_size):
        self.dense = np.asarray(dense, np.int64)  # (n_genomes, n_kmers)
        self.labels = np.asarray(labels, np.int64)
        self.n_kmers = dense.shape[1]
        # X: 2K rule outputs — presence columns then absence columns
        # (rules.py:57-79).
        self.X = np.hstack([self.dense, 1 - self.dense])
        self.util_block_size = util_block_size

    # -- split.py:171-188: per-k-mer risk tables ---------------------------
    def risk_tables(self, train_idx):
        y = self.labels[train_idx]
        pos = train_idx[y == 1]
        neg = train_idx[y == 0]
        kmer_risks = (len(pos) - self.dense[pos].sum(axis=0)
                      + self.dense[neg].sum(axis=0)) / float(len(train_idx))
        kmer_risks = np.round(kmer_risks, 5)
        anti = np.round(1.0 - kmer_risks, 5)
        unique_risks, unique_idx = np.unique(
            np.hstack((kmer_risks, anti)), return_inverse=True)
        return unique_idx  # rule_risks = index-into-unique per rule

    # -- learners/scm.py:238-288: blockwise utility max + tie sets ---------
    def _best_utility_rules(self, pos_idx, neg_idx, p, blacklist):
        neg_cover = (self.X[neg_idx] == 0).sum(axis=0)
        pos_err = (self.X[pos_idx] == 0).sum(axis=0)
        n_rules = 2 * self.n_kmers
        bs = self.util_block_size
        best = -np.inf
        best_idx = np.array([], dtype=np.int64)
        best_pe = np.array([], dtype=np.int64)
        best_nc = np.array([], dtype=np.int64)
        for b in range(int(np.ceil(n_rules / bs))):
            u = (neg_cover[b * bs:(b + 1) * bs]
                 - float(p) * pos_err[b * bs:(b + 1) * bs].astype(np.float64))
            bl = blacklist[(blacklist >= b * bs) & (blacklist < (b + 1) * bs)]
            u[bl - b * bs] = -np.inf
            bmax = np.max(u)
            if bmax > best or np.allclose(best, bmax):
                argm = np.where(np.isclose(u, bmax))[0] + b * bs
                if np.allclose(bmax, best):
                    best_idx = np.hstack((best_idx, argm))
                    best_pe = np.hstack((best_pe, pos_err[argm]))
                    best_nc = np.hstack((best_nc, neg_cover[argm]))
                else:
                    best = bmax
                    best_idx, best_pe, best_nc = argm, pos_err[argm], neg_cover[argm]
        return best_idx, best_pe, best_nc

    # -- learners/scm.py:54-159: the greedy fit ----------------------------
    def fit(self, pos_idx, neg_idx, p, max_rules, model_type, rule_risks,
            blacklist=np.array([], np.int64), iteration_callback=None):
        if model_type == "disjunction":
            pos_idx, neg_idx = neg_idx, pos_idx
        pos_idx = np.array(pos_idx)
        neg_idx = np.array(neg_idx)
        rules = []
        while len(neg_idx) > 0 and len(rules) < max_rules:
            tie_idx, tie_pe, tie_nc = self._best_utility_rules(
                pos_idx, neg_idx, p, blacklist)
            tie_idx = tie_idx[(tie_nc != 0) | (tie_pe != 0)]
            if len(tie_idx) == 0:
                break
            if len(tie_idx) == 1:
                equiv = np.array([tie_idx[0]])
            else:
                tie_risks = rule_risks[tie_idx]
                if model_type == "conjunction":
                    equiv = tie_idx[np.isclose(tie_risks, tie_risks.min())]
                else:
                    equiv = tie_idx[np.isclose(tie_risks, tie_risks.max())]
            rule = int(equiv[0])
            rules.append(rule)
            neg_idx = neg_idx[self.X[neg_idx, rule] != 0]
            pos_idx = pos_idx[self.X[pos_idx, rule] != 0]
            if iteration_callback is not None:
                iteration_callback(rule, equiv)
        return rules

    # -- model predictions (conjunction of selected rule outputs; a
    #    disjunction model is the inverted conjunction, scm.py:69-73) ------
    def predict(self, rules, example_idx, model_type):
        if len(rules) == 0:
            out = np.ones(len(example_idx), np.int64)
        else:
            out = self.X[np.ix_(example_idx, rules)].prod(axis=1)
        if model_type == "disjunction":
            out = 1 - out
        return out

    # -- experiment_scm.py:100-193: per-HP CV score ------------------------
    def cv_score_hp(self, model_type, p, max_rules, folds):
        fold_scores = np.ones((len(folds), max_rules + 1)) * np.inf
        for i, (ftr, fte) in enumerate(folds):
            rule_risks = self.risk_tables(ftr)
            y = self.labels[ftr]
            pos = ftr[y == 1]
            neg = ftr[y == 0]
            preds_by_len = [self.predict([], fte, model_type)]
            self.fit(pos, neg, p, max_rules, model_type, rule_risks,
                     iteration_callback=lambda r, e, acc=preds_by_len,
                     got=[]: (got.append(r),
                              acc.append(self.predict(got, fte, model_type))))
            while len(preds_by_len) < max_rules + 1:
                preds_by_len.append(preds_by_len[-1])
            answers = self.labels[fte]
            risks = np.array([
                np.mean(pr != answers) for pr in preds_by_len], np.float64)
            fold_scores[i] = risks
        score_by_len = np.mean(fold_scores, axis=0)
        best_idx = int(np.argmin(score_by_len))
        return (model_type, p, best_idx), score_by_len[best_idx]

    # -- experiment_scm.py:196-248: HP selection ---------------------------
    def cross_validation(self, model_types, p_values, max_rules, folds):
        from itertools import product

        best_hp_score = 1.0
        best_hp = {"model_type": None, "p": None, "max_rules": None}
        for model_type, p in product(model_types, p_values):
            hp, score = self.cv_score_hp(model_type, p, max_rules, folds)
            # py2 quirk: `hp[2] < None` is False, so the length/p tiebreaks
            # can never fire against the initial None state.
            if (
                (not np.allclose(score, best_hp_score)
                 and score < best_hp_score)
                or (np.allclose(score, best_hp_score)
                    and best_hp["max_rules"] is not None
                    and hp[2] < best_hp["max_rules"])
                or (np.allclose(score, best_hp_score)
                    and best_hp["max_rules"] is not None
                    and hp[2] == best_hp["max_rules"]
                    and not np.allclose(hp[1], best_hp["p"])
                    and abs(1.0 - hp[1]) < abs(1.0 - best_hp["p"]))
            ):
                best_hp = {"model_type": hp[0], "p": hp[1],
                           "max_rules": hp[2]}
                best_hp_score = score
        return best_hp_score, best_hp

    # -- experiment_scm.py:251-346: full train ------------------------------
    def full_train(self, train_idx, model_type, p, max_rules,
                   max_equiv_rules, random_generator):
        rule_risks = self.risk_tables(train_idx)
        y = self.labels[train_idx]
        pos = train_idx[y == 1]
        neg = train_idx[y == 0]
        equivalent_rules = []

        def cb(rule, equiv):
            if len(equiv) > max_equiv_rules:
                ri = random_generator.choice(len(equiv), max_equiv_rules,
                                             replace=False)
                ri.sort()
                equiv = equiv[ri]
            if model_type == "disjunction":
                equiv = (equiv + self.n_kmers) % (2 * self.n_kmers)
            equivalent_rules.append(equiv)

        rules = self.fit(pos, neg, p, max_rules, model_type, rule_risks,
                         iteration_callback=cb)
        return rules, equivalent_rules

    def learn_cv(self, train_idx, test_idx, folds, model_types, p_values,
                 max_rules, max_equiv_rules, random_seed):
        random_generator = np.random.RandomState(random_seed)
        best_hp_score, best_hp = self.cross_validation(
            model_types, p_values, max_rules, folds)
        rules, equivalent_rules = self.full_train(
            train_idx, best_hp["model_type"], best_hp["p"],
            best_hp["max_rules"], max_equiv_rules, random_generator)
        train_pred = self.predict(rules, train_idx,
                                  best_hp["model_type"])
        test_pred = self.predict(rules, test_idx, best_hp["model_type"])
        train_risk = np.mean(train_pred != self.labels[train_idx])
        test_risk = np.mean(test_pred != self.labels[test_idx])
        return dict(best_hp=best_hp, best_hp_score=best_hp_score,
                    rules=rules, equivalent_rules=equivalent_rules,
                    train_risk=train_risk, test_risk=test_risk)


# ---------------------------------------------------------------------------
# Harness: build an artifact, run learn_SCM (host + exact device), run the
# oracle from the artifact's raw data, compare everything.
# ---------------------------------------------------------------------------

def _build_artifact(tmp_path, dense, labels, name, n_folds, seed):
    n_genomes, n_kmers = dense.shape
    ids = ["g%03d" % i for i in range(n_genomes)]
    k = 10
    kmers = ["".join("ACGT"[(i >> (2 * j)) & 3] for j in range(k))
             for i in range(n_kmers)]
    lines = ["kmers\t" + "\t".join(ids)]
    for r in range(n_kmers):
        lines.append(kmers[r] + "\t"
                     + "\t".join(str(int(v)) for v in dense[:, r]))
    (tmp_path / (name + ".tsv")).write_text("\n".join(lines) + "\n")
    (tmp_path / (name + "_m.tsv")).write_text("\n".join(
        "%s\t%d" % (g, l) for g, l in zip(ids, labels)) + "\n")
    out = tmp_path / (name + ".h5")
    from_tsv(tmp_path / (name + ".tsv"), out, phenotype_description="x",
             phenotype_metadata_path=tmp_path / (name + "_m.tsv"), gzip=0)
    split_with_proportion(out, "sp", train_prop=0.7, random_seed=seed,
                          n_folds=n_folds)
    return out


def _artifact_dense(ds_path):
    """The artifact's matrix/labels/split AS STORED (creation reorders
    genomes and columns; the oracle consumes the stored order)."""
    ds = GrmDataset(ds_path)
    with ds.open() as f:
        m64 = f["kmer_matrix"][...]
    dense = unpack_binary_bytes_from_ints(m64)[: ds.genome_count]
    labels = ds.phenotype.metadata
    split = ds.get_split("sp")
    folds = [(f.train_genome_idx.astype(np.int64),
              f.test_genome_idx.astype(np.int64)) for f in split.folds]
    return (dense, labels, split.train_genome_idx.astype(np.int64),
            split.test_genome_idx.astype(np.int64), folds)


def _rule_to_idx(ds, rule):
    """(kmer_sequence, type) -> rule index in the 2K space of the artifact."""
    seqs = [s.decode() for s in ds.kmer_sequences]
    kmer_by_col = ds.kmer_by_matrix_column.tolist()
    col = kmer_by_col.index(seqs.index(rule.kmer_sequence))
    return col + (ds.kmer_count if rule.type == "absence" else 0)


@pytest.mark.parametrize("seed,block", [(0, 10**6), (1, 10**6), (2, 64),
                                        (3, 64)])
def test_cv_driver_matches_oracle(tmp_path, monkeypatch, seed, block):
    """Full CV flow (both engines) vs the oracle, incl. small-block runs
    that exercise the reference's multi-block allclose quirk."""
    monkeypatch.setattr(scm_mod, "UTIL_BLOCK_SIZE", block)
    monkeypatch.setattr(exact_mod, "UTIL_BLOCK_SIZE", block)

    rng = np.random.RandomState(seed)
    n_genomes, n_kmers = 24, 80
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    for i in range(5):  # duplicated columns -> exact ties
        dense[:, 2 * i + 1] = dense[:, 2 * i]
    ds_path = _build_artifact(tmp_path, dense, labels, "o%d" % seed,
                              n_folds=3, seed=seed)

    sdense, slabels, train_idx, test_idx, folds = _artifact_dense(ds_path)
    oracle = ScmOracle(sdense, slabels, block).learn_cv(
        train_idx, test_idx, folds,
        ["conjunction", "disjunction"], [0.5, 1.0, 2.0],
        max_rules=4, max_equiv_rules=10000, random_seed=31)

    ds = GrmDataset(ds_path)
    for engine in ("host", "device"):
        out = learn_SCM(dataset_file=ds_path, split_name="sp",
                        model_type=["conjunction", "disjunction"],
                        p=[0.5, 1.0, 2.0], max_rules=4,
                        parameter_selection="cv", random_seed=31,
                        engine=engine)
        best_hp, best_hp_score, train_m, test_m, model, _, equiv, _ = out
        assert (best_hp["model_type"], best_hp["p"], best_hp["max_rules"]) \
            == (oracle["best_hp"]["model_type"], oracle["best_hp"]["p"],
                oracle["best_hp"]["max_rules"]), engine
        assert best_hp_score == oracle["best_hp_score"], engine
        got_rules = [_rule_to_idx(ds, r) for r in model.rules]
        # disjunction models store inverted rules; map back to selected idx
        if best_hp["model_type"] == "disjunction":
            got_rules = [(r + ds.kmer_count) % (2 * ds.kmer_count)
                         for r in got_rules]
        assert got_rules == oracle["rules"], engine
        got_equiv = [sorted(_rule_to_idx(ds, e) for e in eq) for eq in equiv]
        want_equiv = [sorted(int(i) for i in eq)
                      for eq in oracle["equivalent_rules"]]
        assert got_equiv == want_equiv, engine
        assert train_m["risk"][0] == oracle["train_risk"], engine
        assert test_m["risk"][0] == oracle["test_risk"], engine


def test_cv_driver_hp_tie_rules_against_oracle(tmp_path):
    """A dataset where several HPs reach the same CV score: the shorter
    model, then p-closest-to-1 tie rules must fire identically."""
    rng = np.random.RandomState(7)
    n_genomes, n_kmers = 20, 40
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 3] = labels  # separable: every p ties at score 0
    ds_path = _build_artifact(tmp_path, dense, labels, "tie", n_folds=2,
                              seed=11)
    sdense, slabels, train_idx, test_idx, folds = _artifact_dense(ds_path)
    p_values = [0.1, 0.9, 1.5, 4.0]
    oracle = ScmOracle(sdense, slabels, 10**6).learn_cv(
        train_idx, test_idx, folds, ["conjunction"], p_values,
        max_rules=3, max_equiv_rules=10000, random_seed=5)
    for engine in ("host", "device"):
        out = learn_SCM(dataset_file=ds_path, split_name="sp",
                        model_type="conjunction", p=p_values, max_rules=3,
                        parameter_selection="cv", random_seed=5,
                        engine=engine)
        assert out[0]["p"] == oracle["best_hp"]["p"] == 0.9, engine
        assert out[0]["max_rules"] == oracle["best_hp"]["max_rules"], engine
