"""CART learner: split selection, pruning sequence, end-to-end learn_CART."""

import numpy as np
import pytest

from grm_tpu.learning.cart import DecisionTreeClassifier, prune_tree
from grm_tpu.learning.rules import KmerRuleClassifications
from grm_tpu.learning.experiments.cart_experiment import BetweenDict, learn_CART

from test_scm import _DenseDataset, _ListRules


def _fit_tree(dense, y, criterion="gini", max_depth=4, min_samples_split=2,
              class_importance=None, n_classes=2):
    ds = _DenseDataset(dense)
    rc = KmerRuleClassifications(ds)
    if class_importance is None:
        class_importance = {c: 1.0 for c in range(n_classes)}
    clf = DecisionTreeClassifier(
        criterion=criterion, max_depth=max_depth,
        min_samples_split=min_samples_split, class_importance=class_importance,
    )
    example_idx = {c: np.where(y == c)[0] for c in range(n_classes)}
    occurrences = rc.sum_rows(np.arange(len(y)))

    def tiebreaker(idx):
        tie = occurrences[idx]
        return idx[np.isclose(tie, tie.max())]

    clf.fit(rules=_ListRules(dense.shape[1]), rule_classifications=rc,
            example_idx=example_idx, tiebreaker=tiebreaker)
    return clf


def test_tree_perfect_split(rng):
    n, K = 40, 30
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (rng.rand(n) > 0.5).astype(np.uint8)
    dense[:, 11] = y
    clf = _fit_tree(dense, y)
    root = clf.decision_tree
    assert root.rule.kmer_index == 11
    # Left child (k-mer present) = positives, right = negatives.
    assert root.left_child.class_prediction == 1
    assert root.right_child.class_prediction == 0
    np.testing.assert_array_equal(clf.predict(dense), y)


def test_tree_two_level_structure(rng):
    """y = k7 AND k3 requires a depth-2 tree."""
    n, K = 200, 20
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (dense[:, 7] & dense[:, 3]).astype(np.uint8)
    clf = _fit_tree(dense, y, max_depth=3)
    np.testing.assert_array_equal(clf.predict(dense), y)
    assert clf.decision_tree.tree_depth >= 2
    used = {r.kmer_index for r in clf.decision_tree.rules}
    assert {3, 7} <= used


def test_tree_respects_max_depth(rng):
    n, K = 100, 15
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (rng.rand(n) > 0.5).astype(np.uint8)
    clf = _fit_tree(dense, y, max_depth=2)
    assert clf.decision_tree.tree_depth <= 2


def test_tree_min_samples_split(rng):
    n, K = 30, 10
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (rng.rand(n) > 0.5).astype(np.uint8)
    clf = _fit_tree(dense, y, min_samples_split=n + 1)
    assert clf.decision_tree.is_leaf


def test_tree_multiclass(rng):
    n, K = 120, 25
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    # Three classes determined by two planted k-mers.
    y = np.where(dense[:, 2] == 1, 2, np.where(dense[:, 9] == 1, 1, 0)).astype(np.uint8)
    clf = _fit_tree(dense, y, n_classes=3, max_depth=4)
    np.testing.assert_array_equal(clf.predict(dense), y)


def test_class_importance_shifts_prediction(rng):
    """Heavily weighting class 0 should bias predictions toward 0."""
    n, K = 60, 12
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (rng.rand(n) > 0.3).astype(np.uint8)  # mostly 1s
    clf_bal = _fit_tree(dense, y, max_depth=2)
    clf_w = _fit_tree(dense, y, max_depth=2,
                      class_importance={0: 100.0, 1: 1.0})
    assert (clf_w.predict(dense) == 0).sum() >= (clf_bal.predict(dense) == 0).sum()


def test_prune_tree_sequence(rng):
    n, K = 300, 30
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    # Noisy target so the overgrown tree has prunable structure.
    y = (dense[:, 5] | (rng.rand(n) > 0.9)).astype(np.uint8)
    clf = _fit_tree(dense, y, max_depth=6)
    alphas, trees = prune_tree(clf.decision_tree)
    assert alphas[0] == 0
    assert list(alphas) == sorted(alphas)
    sizes = [len(t) for t in trees]
    assert sizes == sorted(sizes, reverse=True)
    assert trees[-1].is_leaf or len(trees[-1]) <= sizes[0]
    # Original tree untouched by pruning (deepcopy semantics).
    assert not clf.decision_tree.is_leaf


def test_between_dict():
    bd = BetweenDict()
    bd[(0.0, 1.0)] = "a"
    bd[(1.0, np.inf)] = "b"
    assert bd[0.5] == "a"
    assert bd[1.0] == "b"
    assert bd[100.0] == "b"
    assert 0.5 in bd
    with pytest.raises(KeyError):
        bd[-1.0]
    with pytest.raises(RuntimeError):
        bd[(2.0, 1.0)] = "x"


def test_device_split_matches_host_when_unique(rng):
    """Device impurity argmin picks the same split as the host float64 scan
    when the minimum is unique."""
    n, K = 80, 50
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = (rng.rand(n) > 0.5).astype(np.uint8)
    dense[:, 23] = y  # unique perfect split
    host = _fit_tree(dense, y, max_depth=1)
    ds = _DenseDataset(dense)
    rc = KmerRuleClassifications(ds)
    clf = DecisionTreeClassifier(criterion="gini", max_depth=1,
                                 min_samples_split=2,
                                 class_importance={0: 1.0, 1: 1.0},
                                 engine="device")
    clf.fit(rules=_ListRules(K), rule_classifications=rc,
            example_idx={c: np.where(y == c)[0] for c in range(2)})
    assert clf.decision_tree.rule.kmer_index == host.decision_tree.rule.kmer_index == 23


def test_learn_cart_device_engine(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hps, best_score, train_metrics, test_metrics, model, *_ = learn_CART(
        dataset_file=ds_path, split_name="sp", criterion="gini",
        max_depth=4, min_samples_split=2,
        class_importance={0: 1.0, 1: 1.0},
        parameter_selection="cv", engine="device",
    )
    assert train_metrics["risk"][0] == 0.0
    assert test_metrics["risk"][0] == 0.0


# ---------------------------------------------------------------------------
# End-to-end learn_CART
# ---------------------------------------------------------------------------
def test_learn_cart_cv(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hps, best_score, train_metrics, test_metrics, model, \
        rule_importances, equiv, classifications = learn_CART(
            dataset_file=ds_path, split_name="sp", criterion="gini",
            max_depth=4, min_samples_split=2,
            class_importance={0: 1.0, 1: 1.0},
            parameter_selection="cv",
        )
    assert train_metrics["risk"][0] == 0.0
    assert test_metrics["risk"][0] == 0.0
    assert len(model.decision_tree.rules) >= 1
    assert abs(sum(rule_importances.values()) - 1.0) < 1e-9


def test_learn_cart_bound(planted_dataset):
    ds_path, marker, k = planted_dataset
    best_hps, best_score, train_metrics, test_metrics, model, *_ = learn_CART(
        dataset_file=ds_path, split_name="sp", criterion=["gini", "cross-entropy"],
        max_depth=3, min_samples_split=2,
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        parameter_selection="bound", bound_delta=0.05,
        bound_max_genome_size=1000,
    )
    assert 0.0 < best_score < 1.0
    assert test_metrics["risk"][0] == 0.0
    assert "pruning_alpha" in best_hps


from test_scm import planted_dataset  # noqa: E402,F401  (fixture reuse)


def test_frontier_pallas_matches_per_node_xla(rng):
    """The fused frontier kernel (interpret mode) == the per-node XLA scorer,
    across criteria, multi-node frontiers, empty classes, and multiclass."""
    from grm_tpu.parallel.cart_device import cart_frontier_splits_device

    n, K = 90, 700
    dense = (rng.rand(n, K) > 0.55).astype(np.uint8)
    y = rng.randint(0, 3, size=n)
    ds = _DenseDataset(dense)
    rc = KmerRuleClassifications(ds)
    priors = {0: 0.5, 1: 0.3, 2: 0.2}
    totals = {c: int((y == c).sum()) for c in range(3)}

    idx = np.arange(n)
    frontier = [
        {c: idx[(y == c) & (idx < 60)] for c in range(3)},
        {c: idx[(y == c) & (idx >= 30)] for c in range(3)},
        {c: idx[(y == c) & (idx % 2 == 0)] for c in range(3)},
        {0: idx[y == 0], 1: np.array([], np.int64), 2: idx[y == 2]},
    ]
    for criterion in ["gini", "cross-entropy"]:
        want = cart_frontier_splits_device(
            rc.bit_matrix, frontier, priors, totals, criterion, sweep="xla"
        )
        got = cart_frontier_splits_device(
            rc.bit_matrix, frontier, priors, totals, criterion,
            sweep="pallas_interpret",
        )
        for (wi, ws), (gi, gs) in zip(want, got):
            assert wi == gi, (criterion, wi, gi)
            assert np.isclose(ws, gs, rtol=1e-5) or (
                not np.isfinite(ws) and not np.isfinite(gs)
            )


def test_learn_cart_sharded_matches_device(planted_dataset):
    """Column-sharded frontier scoring over the 8-device mesh must pick the
    same tree as the single-device engine."""
    from grm_tpu.parallel.mesh import make_mesh

    ds_path, marker, k = planted_dataset
    kwargs = dict(dataset_file=ds_path, split_name="sp", criterion="gini",
                  max_depth=3, min_samples_split=2,
                  class_importance={0: 1.0, 1: 1.0},
                  parameter_selection="cv", engine="device")
    dev = learn_CART(**kwargs)
    shd = learn_CART(mesh=make_mesh(8), **kwargs)
    assert str(dev[4]) == str(shd[4])
    assert dev[3]["risk"] == shd[3]["risk"]
    assert dev[3]["risk"][0] == 0.0


def test_learn_cart_device_blacklist_matches_host(planted_dataset, tmp_path):
    """A k-mer blacklist on the CART device engine (column exclusion in the
    split scorer) picks the same tree as the host engine and avoids the
    banned k-mer."""
    ds_path, marker, k = planted_dataset
    base = learn_CART(dataset_file=ds_path, split_name="sp", criterion="gini",
                      max_depth=2, min_samples_split=2,
                      class_importance={0: 1.0, 1: 1.0},
                      parameter_selection="cv", engine="device")
    banned = base[4].decision_tree.rules[0].kmer_sequence
    bl = tmp_path / "bl.txt"
    bl.write_text(banned + "\n")

    out = {}
    for engine in ("host", "device"):
        r = learn_CART(dataset_file=ds_path, split_name="sp",
                       criterion="gini", max_depth=2, min_samples_split=2,
                       class_importance={0: 1.0, 1: 1.0},
                       kmer_blacklist_file=str(bl),
                       parameter_selection="cv", engine=engine)
        rules = [x.kmer_sequence for x in r[4].decision_tree.rules]
        assert banned not in rules, (engine, rules)
        out[engine] = (rules, r[3]["risk"][0])
    assert out["host"] == out["device"], out


def test_frontier_per_node_priors(rng):
    """Per-node priors/totals (forest batching): one batched call over nodes
    carrying DIFFERENT priors == separate calls each with its own priors —
    on both the per-node XLA path and the fused kernel (interpret mode)."""
    from grm_tpu.parallel.cart_device import cart_frontier_splits_device

    n, K = 80, 600
    dense = (rng.rand(n, K) > 0.5).astype(np.uint8)
    y = rng.randint(0, 2, size=n)
    rc = KmerRuleClassifications(_DenseDataset(dense))
    idx = np.arange(n)

    nodes = [
        {c: idx[(y == c) & (idx < 50)] for c in range(2)},
        {c: idx[(y == c) & (idx >= 20)] for c in range(2)},
        {c: idx[(y == c) & (idx % 3 == 0)] for c in range(2)},
    ]
    priors = [{0: 0.5, 1: 0.5}, {0: 0.8, 1: 0.2}, {0: 0.3, 1: 0.7}]
    totals = [{0: 40.0, 1: 40.0}, {0: 30.0, 1: 50.0}, {0: 25.0, 1: 55.0}]

    for sweep in ("xla", "pallas_interpret"):
        want = [
            cart_frontier_splits_device(
                rc.bit_matrix, [nodes[i]], priors[i], totals[i], "gini",
                sweep=sweep,
            )[0]
            for i in range(3)
        ]
        got = cart_frontier_splits_device(
            rc.bit_matrix, nodes, priors, totals, "gini", sweep=sweep,
        )
        for (wi, ws), (gi, gs) in zip(want, got):
            assert wi == gi, (sweep, wi, gi)
            assert np.isclose(ws, gs, rtol=1e-5)


def test_forest_batched_grid_matches_host(planted_dataset):
    """The forest-batched device engine (ALL HP combos' fold+master trees
    grown as one level-synchronous forest) must pick the same model and
    metrics as the sequential host engine over a multi-HP grid."""
    ds_path, marker, k = planted_dataset
    kwargs = dict(
        dataset_file=ds_path, split_name="sp",
        criterion=["gini", "cross-entropy"],
        max_depth=[2, 3], min_samples_split=2,
        class_importance=[{0: 1.0, 1: 1.0}, {0: 0.5, 1: 1.0}],
        parameter_selection="cv",
    )
    host = learn_CART(engine="host", **kwargs)
    dev = learn_CART(engine="device", **kwargs)
    assert str(host[4]) == str(dev[4])          # same tree
    assert host[0] == dev[0]                    # same chosen hps
    assert host[3]["risk"] == dev[3]["risk"]
    assert host[3]["risk"][0] == 0.0
