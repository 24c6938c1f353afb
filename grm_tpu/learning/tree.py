"""Decision-tree node structures with Breiman quantities.

Mirrors the reference ``learning/common/tree.py``: per-node Breiman (1984)
probabilities (p_j_t, p_t, p_j|t, r_t, R_t), preorder iteration, leaf/rule
harvesting, and probabilistic prediction where each example walks down the
tree (left on rule TRUE) and receives the leaf's class proportions. The
prediction here is vectorized by index partitioning instead of a Python loop
per example; class ties resolve to the lowest class index (np.argmax), same
as the reference.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BreimanInfo", "TreeNode", "ProbabilisticTreeNode"]


class BreimanInfo:
    def __init__(self, node_n_examples_by_class, class_priors, total_n_examples_by_class):
        classes = sorted(class_priors)
        # Eq. 2.2: P(example in class j AND falls into node t)
        self.p_j_t = {
            c: class_priors[c] * node_n_examples_by_class[c] / total_n_examples_by_class[c]
            for c in classes
        }
        # Eq. 2.3: P(any example falls into node t)
        self.p_t = sum(self.p_j_t.values())
        # Eq. 2.4: P(class j | node t)
        self.p_j_given_t = {c: self.p_j_t[c] / self.p_t for c in classes}
        # Def. 2.10: misclassification probability given node t
        self.r_t = 1.0 - max(self.p_j_given_t.values())
        # Node contribution to overall tree misclassification
        self.R_t = self.r_t * self.p_t


class TreeNode:
    def __init__(self, depth, class_examples_idx, total_n_examples_by_class,
                 class_priors, rule=None, parent=None, left_child=None,
                 right_child=None, criterion_value=-1):
        self.rule = rule
        self.parent = parent
        self.left_child = left_child
        self.right_child = right_child
        self.class_examples_idx = class_examples_idx
        self.depth = depth
        self.criterion_value = criterion_value
        n_examples_by_class = {c: len(idx) for c, idx in class_examples_idx.items()}
        self.breiman_info = BreimanInfo(
            node_n_examples_by_class=n_examples_by_class,
            class_priors=class_priors,
            total_n_examples_by_class=total_n_examples_by_class,
        )

    @property
    def is_leaf(self):
        return self.rule is None and self.left_child is None and self.right_child is None

    @property
    def is_root(self):
        return self.parent is None

    @property
    def n_examples(self):
        return sum(len(idx) for idx in self.class_examples_idx.values())

    @property
    def class_proportions(self):
        n = self.n_examples
        return {c: float(len(idx)) / n for c, idx in self.class_examples_idx.items()}

    @property
    def class_prediction(self):
        """Class with max p_j|t; ties -> lowest class index (tree.py:103-108)."""
        classes = sorted(self.breiman_info.p_j_given_t)
        values = [self.breiman_info.p_j_given_t[c] for c in classes]
        return classes[int(np.argmax(values))]

    @property
    def rules(self):
        def _get(node):
            if node.is_leaf:
                return []
            return [node.rule] + _get(node.left_child) + _get(node.right_child)

        return _get(self)

    @property
    def leaves(self):
        def _get(node):
            if node.is_leaf:
                return [node]
            return _get(node.left_child) + _get(node.right_child)

        return _get(self)

    @property
    def tree_depth(self):
        def _get(node):
            if node.is_leaf:
                return node.depth
            return max(_get(node.left_child), _get(node.right_child))

        return _get(self)

    def __iter__(self):
        def _preorder(node):
            nodes = [node]
            if not node.is_leaf:
                nodes += _preorder(node.left_child)
                nodes += _preorder(node.right_child)
            return nodes

        for node_id, node in enumerate(_preorder(self)):
            yield node_id, node

    def __len__(self):
        return len(self.rules) + len(self.leaves)

    def __str__(self, depth=0):
        if self.is_leaf:
            return "\n" + ("    " * depth) + str(self.class_prediction)
        out = self.right_child.__str__(depth=depth + 1)
        out += "\n" + ("    " * depth + "   ") + "/"
        out += "\n" + ("    " * depth) + str(self.rule)
        out += "\n" + ("    " * depth + "   ") + "\\"
        out += self.left_child.__str__(depth=depth + 1)
        return out


class ProbabilisticTreeNode(TreeNode):
    def predict(self, X):
        """argmax over class probabilities; ties -> lowest class index."""
        class_probabilities = self.predict_proba(X)
        return np.argmax(class_probabilities, axis=0)

    def predict_proba(self, X):
        """Vectorized tree walk: partition example indices down the tree."""
        X = np.ascontiguousarray(X)
        classes = sorted(self.class_examples_idx)
        proba = np.zeros((len(classes), X.shape[0]))

        def _fill(node, idx):
            if idx.shape[0] == 0:
                return
            if node.is_leaf:
                for ci, c in enumerate(classes):
                    proba[ci, idx] = node.breiman_info.p_j_given_t[c]
                return
            branch_left = node.rule.classify(X[idx]).astype(bool)
            _fill(node.left_child, idx[branch_left])
            _fill(node.right_child, idx[~branch_left])

        _fill(self, np.arange(X.shape[0]))
        return proba
