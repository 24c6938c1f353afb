"""Profile the exact-CART e2e path: where does the wall-clock go?

Instruments the exact device engine's stages (pass1 / hit / pass2), the
host-side HDF5 column fetches, pruning, and prediction scoring, then runs
`learn_CART` with the accelerator-default engine on the bench artifact.

Usage: python examples/cart_profile.py [--kmers 2000000] [--combos 4]
"""

import argparse
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STATS = defaultdict(float)
COUNTS = defaultdict(int)


def timed(name, fn):
    def wrapper(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        STATS[name] += time.perf_counter() - t0
        COUNTS[name] += 1
        return out
    return wrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=2_000_000)
    ap.add_argument("--genomes", type=int, default=342)
    ap.add_argument("--combos", type=int, default=4)
    ap.add_argument("--engine", default="device")
    ap.add_argument("--hp", default="cv")
    args = ap.parse_args()

    import jax
    plat = os.environ.get("GRM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from grm_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    print("devices:", jax.devices(), file=sys.stderr)

    sys.path.insert(0, REPO)
    import bench
    ds_path = bench.build_cache_artifact(args.genomes, args.kmers, 5)

    # --- instrument ---
    from grm_tpu.parallel import cart_exact
    from grm_tpu.dataset import artifact
    from grm_tpu.learning import cart as cart_mod
    from grm_tpu.learning.experiments import cart_experiment

    shapes_seen = set()

    def spy(name, orig, shape_of=None, count_of=None):
        def wrapper(*a, **kw):
            if shape_of:
                shapes_seen.add((name, shape_of(*a, **kw)))
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            jax.block_until_ready(out)
            STATS[name] += time.perf_counter() - t0
            COUNTS[name] += 1
            if count_of:
                COUNTS[name + "_nodes"] += count_of(*a, **kw)
            return out
        return wrapper

    cart_exact._gather_pass = spy(
        "gather_pass", cart_exact._gather_pass,
        shape_of=lambda m, masks, *a, **k: masks.shape,
        count_of=lambda m, masks, *a, **k: masks.shape[0])

    cart_exact.cart_frontier_candidates = timed(
        "frontier_candidates", cart_exact.cart_frontier_candidates)
    cart_mod.service_frontier_request = timed(
        "service_frontier", cart_mod.service_frontier_request)
    artifact.GrmDataset.get_matrix_columns = timed(
        "get_matrix_columns", artifact.GrmDataset.get_matrix_columns)
    cart_mod.prune_tree = timed("prune_tree", cart_mod.prune_tree)
    cart_experiment.prune_tree = cart_mod.prune_tree
    cart_experiment._predictions = timed(
        "cv_predictions", cart_experiment._predictions)
    from grm_tpu.parallel import cart_forest as _cf
    _cf.grow_trees_batched = timed("grow_trees_batched",
                                   _cf.grow_trees_batched)
    cart_experiment.grow_trees_batched = _cf.grow_trees_batched
    cart_experiment._ColumnCache.__init__ = timed(
        "column_cache_prefetch", cart_experiment._ColumnCache.__init__)
    artifact.GrmDataset.bit_matrix = timed(
        "artifact_bit_matrix", artifact.GrmDataset.bit_matrix)
    cart_experiment._learn_pruned_tree_cv = timed(
        "learn_pruned_tree_cv", cart_experiment._learn_pruned_tree_cv)
    # cart_forest imports service_frontier_request at module import time
    from grm_tpu.parallel import cart_forest
    cart_forest.service_frontier_request = cart_mod.service_frontier_request

    from grm_tpu.learning.experiments import learn_CART

    vals = [0.25, 0.5, 0.75, 1.0][: max(1, int(round(args.combos ** 0.5)))]
    cis = [{0: a, 1: b} for a in vals for b in vals]
    print("grid: gini x %d class-importance combos x depth 10" % len(cis),
          file=sys.stderr)

    t0 = time.perf_counter()
    out = learn_CART(
        dataset_file=ds_path, split_name="sp", criterion="gini",
        max_depth=10, min_samples_split=2, class_importance=cis,
        bound_delta=0.05, bound_max_genome_size=args.kmers,
        parameter_selection=args.hp, engine=args.engine,
    )
    total = time.perf_counter() - t0
    best_hp, best_score, train_m, test_m, model = out[:5]
    print("total learn_CART: %.1fs  (train_risk=%.4f test_risk=%.4f "
          "tree_rules=%d)" % (total, train_m["risk"][0],
                              test_m["risk"][0],
                              len(model.decision_tree.rules)))
    for k in sorted(STATS):
        extra = ("nodes=%d" % COUNTS[k + "_nodes"]
                 if k + "_nodes" in COUNTS else "")
        print("  %-22s %8.2fs  calls=%-6d %s" % (
            k, STATS[k], COUNTS[k], extra))
    print("  distinct jit input shapes: %d" % len(shapes_seen))
    for s in sorted(shapes_seen, key=str)[:40]:
        print("    %s" % (s,))


if __name__ == "__main__":
    main()
