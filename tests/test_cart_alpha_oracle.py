"""Independent oracle of CART's CV cost-complexity alpha-interval scoring.

VERDICT r2 item 4 (CART half): the pruning alpha sequence
(``learners/cart.py:362-470``) and the per-alpha-interval fold scoring +
geometric-mean master selection (``experiment_cart.py:392-431``) are
re-implemented here directly from the reference, on a NEUTRAL tree snapshot
(plain dicts) with no imports from ``grm_tpu.learning.cart`` /
``cart_experiment``. The grown (unpruned) trees are shared inputs; every
pruning/scoring decision is derived independently and compared exactly.
"""

from math import sqrt

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_tsv
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.cart import prune_tree
from grm_tpu.learning.experiments.cart_experiment import (_cv_finish,
                                                          _cv_grow)
from grm_tpu.utils import unpack_binary_bytes_from_ints


# ---------------------------------------------------------------------------
# Neutral snapshot of a grown tree
# ---------------------------------------------------------------------------

def snapshot(node):
    """TreeNode -> plain dict {R_t, p_j_given_t, rule: (kmer_idx, type)}."""
    d = {
        "R_t": float(node.breiman_info.R_t),
        "p": {int(c): float(v)
              for c, v in node.breiman_info.p_j_given_t.items()},
        "rule": None, "left": None, "right": None, "parent": None,
    }
    if not node.is_leaf:
        d["rule"] = (int(node.rule.kmer_index), node.rule.type)
        d["left"] = snapshot(node.left_child)
        d["right"] = snapshot(node.right_child)
        d["left"]["parent"] = d
        d["right"]["parent"] = d
    return d


def _is_leaf(n):
    return n["rule"] is None


def _leaves(n):
    if _is_leaf(n):
        return [n]
    return _leaves(n["left"]) + _leaves(n["right"])


def _copy(n, parent=None):
    d = {"R_t": n["R_t"], "p": dict(n["p"]), "rule": n["rule"],
         "left": None, "right": None, "parent": parent}
    if n["rule"] is not None:
        d["left"] = _copy(n["left"], d)
        d["right"] = _copy(n["right"], d)
    return d


# ---------------------------------------------------------------------------
# The oracle: reference cart.py:362-470 on the neutral structure
# ---------------------------------------------------------------------------

def oracle_prune(root):
    root = _copy(root)

    def get_leaf_parents(node):
        out = []
        if not _is_leaf(node):
            if _is_leaf(node["left"]) and _is_leaf(node["right"]):
                out.append(node)
            else:
                out += get_leaf_parents(node["left"])
                out += get_leaf_parents(node["right"])
        return out

    def make_leaf(n):
        n["rule"] = None
        n["left"] = None
        n["right"] = None

    def initial_pruning(root):
        parents = get_leaf_parents(root)
        while parents:
            node = parents.pop()
            if np.allclose(node["R_t"],
                           node["left"]["R_t"] + node["right"]["R_t"]):
                make_leaf(node)
                if (node["parent"] is not None
                        and _is_leaf(node["parent"]["left"])
                        and _is_leaf(node["parent"]["right"])):
                    parents.append(node["parent"])

    def find_weakest_links(node):
        if _is_leaf(node):
            return np.inf, [node]
        RTt = sum(l["R_t"] for l in _leaves(node))
        current_gt = float(node["R_t"] - RTt) / (len(_leaves(node)) - 1)
        lmin, lw = find_weakest_links(node["left"])
        rmin, rw = find_weakest_links(node["right"])
        if np.allclose(current_gt, min(lmin, rmin)):
            if np.allclose(lmin, rmin):
                return current_gt, [node] + lw + rw
            return current_gt, [node] + (lw if lmin < rmin else rw)
        elif current_gt < min(lmin, rmin):
            return current_gt, [node]
        elif np.allclose(lmin, rmin):
            return lmin, lw + rw
        elif lmin > rmin:
            return rmin, rw
        else:
            return lmin, lw

    initial_pruning(root)
    seq = [(0, root)]
    current = root
    while not _is_leaf(current):
        current = _copy(current)
        min_gt, links = find_weakest_links(current)
        for n in links:
            make_leaf(n)
        seq.append((min_gt, current))
    alphas, trees = zip(*seq)
    return list(alphas), list(trees)


def oracle_predict(root, X_presence):
    """Walk each example down (left on rule TRUE); argmax p_j|t at leaf."""
    out = np.empty(X_presence.shape[0], np.int64)
    for i in range(X_presence.shape[0]):
        n = root
        while not _is_leaf(n):
            col, rtype = n["rule"]
            v = X_presence[i, col]
            fire = (v == 1) if rtype == "presence" else (v == 0)
            n = n["left"] if fire else n["right"]
        classes = sorted(n["p"])
        out[i] = classes[int(np.argmax([n["p"][c] for c in classes]))]
    return out


def oracle_cv_finish(master_root, fold_roots, fold_tests, dense, labels):
    """experiment_cart.py:392-431: BetweenDict fold risks + geo-mean
    master scoring (dict-of-ranges implemented as an explicit scan)."""
    master_alphas, master_trees = oracle_prune(master_root)
    fold_data = []
    for root, test_idx in zip(fold_roots, fold_tests):
        alphas, trees = oracle_prune(root)
        risks = []
        for t in trees:
            pred = oracle_predict(t, dense[test_idx])
            risks.append(float(np.mean(pred != labels[test_idx])))
        intervals = []
        for j in range(len(alphas)):
            hi = alphas[j + 1] if j < len(alphas) - 1 else np.inf
            intervals.append(((alphas[j], hi), risks[j]))
        fold_data.append(intervals)

    def lookup(intervals, key):
        for (lo, hi), v in intervals.items() if isinstance(
                intervals, dict) else intervals:
            if (lo <= key < hi) or (lo <= key and hi == np.inf):
                return v
        raise KeyError(key)

    min_score = np.inf
    best = None
    for i, t in enumerate(master_trees):
        if i < len(master_alphas) - 1:
            geo = sqrt(master_alphas[i] * master_alphas[i + 1])
        else:
            geo = np.inf
        cv_score = np.mean([lookup(fd, geo) for fd in fold_data])
        if cv_score <= min_score:
            min_score = cv_score
            best = (geo, t)
    return master_alphas, min_score, best


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _build(tmp_path, seed, n_genomes=40, n_kmers=50):
    rng = np.random.RandomState(seed)
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    # noisy markers: prunable structure, not separable at depth 1
    for c, noise in [(3, 6), (11, 9), (17, 12)]:
        col = labels.copy()
        flips = rng.choice(n_genomes, noise, replace=False)
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
    (tmp_path / "c.tsv").write_text("\n".join(lines) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(
        "%s\t%d" % (g, l) for g, l in zip(ids, labels)) + "\n")
    out = tmp_path / "c.h5"
    from_tsv(tmp_path / "c.tsv", out, phenotype_description="x",
             phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(out, "sp", train_prop=0.75, random_seed=seed,
                          n_folds=3)
    return out


@pytest.mark.parametrize("seed", [0, 4])
def test_cart_cv_alpha_scoring_matches_oracle(tmp_path, seed):
    ds_path = _build(tmp_path, seed)
    dataset = GrmDataset(ds_path)
    with dataset.open() as f:
        m64 = f["kmer_matrix"][...]
    dense = unpack_binary_bytes_from_ints(m64)[: dataset.genome_count]
    labels = dataset.phenotype.metadata
    split = dataset.get_split("sp")
    fold_tests = [f.test_genome_idx.astype(np.int64) for f in split.folds]

    hps = {"criterion": "gini",
           "class_importance": {0: 1.0, 1: 1.0},
           "max_depth": 4, "min_samples_split": 2}
    fold_predictors, master_predictor, jobs = _cv_grow(
        hps, dataset, "sp", rule_blacklist=[])
    for clf, kwargs in jobs:
        clf.fit(**kwargs)

    # Snapshot BEFORE our pruning (prune_tree deepcopies, but be safe).
    master_snap = snapshot(master_predictor.decision_tree)
    fold_snaps = [snapshot(p.decision_tree) for p in fold_predictors]
    assert not _is_leaf(master_snap)  # the test must exercise real pruning

    want_alphas, want_score, (want_alpha, want_tree) = oracle_cv_finish(
        master_snap, fold_snaps, fold_tests, dense, labels)

    got_alphas, _ = prune_tree(master_predictor.decision_tree)
    np.testing.assert_array_equal(np.asarray(got_alphas, np.float64),
                                  np.asarray(want_alphas, np.float64))

    got_hps, got_score, got_tree = _cv_finish(
        dict(hps), dataset, "sp", fold_predictors, master_predictor)
    assert got_score == want_score
    assert got_hps["pruning_alpha"] == want_alpha
    # Same chosen structure: rule multiset and leaf count.
    got_rules = sorted((r.kmer_index, r.type) for r in got_tree.rules)
    want_rules = sorted(
        n["rule"] for t in [want_tree] for n in _preorder(t)
        if n["rule"] is not None)
    assert got_rules == want_rules
    assert len(got_tree.leaves) == len(_leaves(want_tree))


def _preorder(n):
    yield n
    if n["rule"] is not None:
        yield from _preorder(n["left"])
        yield from _preorder(n["right"])
