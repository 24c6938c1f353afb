"""Multi-device scaling benchmark for the column-sharded engines.

Measures the SCM CV grid engine's wall-clock at 1 device and at N devices
(k-mer columns sharded over the mesh "cols" axis) and reports the scaling
efficiency — the BASELINE.md "scaling efficiency at N >= 2 hosts" metric.
On a multi-chip TPU host this exercises ICI collectives (all_gather of
winner scalars + one-hot psum column broadcast per greedy iteration); with
XLA_FLAGS=--xla_force_host_platform_device_count=N it validates the SPMD
program on virtual CPU devices (timings there are NOT meaningful — virtual
devices share the same cores).

Usage:
    python examples/scaling_bench.py [n_devices] [n_kmers]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from grm_tpu.parallel.mesh import make_mesh
    from grm_tpu.parallel.scm_grid import (
        scm_cv_grid_device,
        scm_cv_grid_sharded,
    )
    from grm_tpu.utils import build_row_mask

    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    n_kmers = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_genomes, n_folds, max_rules = 342, 5, 10

    rng = np.random.RandomState(0)
    w = -(-n_genomes // 32)
    matrix = np.frombuffer(
        rng.bytes(w * n_kmers * 4), dtype=np.uint32
    ).reshape(w, n_kmers).copy()
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)

    def mask_of(idx):
        m = np.zeros(w, np.uint32)
        v = build_row_mask(idx, n_genomes, 32)
        m[: len(v)] = v
        return m

    idx = np.arange(n_genomes)
    rng.shuffle(idx)
    tr = idx[: int(0.67 * n_genomes)]
    fold = np.arange(len(tr)) % n_folds
    fits = []
    for mt in ("conjunction", "disjunction"):
        for p in (0.562, 1.0, 1.778, 3.162):
            for f in range(n_folds):
                ftr, fte = tr[fold != f], tr[fold == f]
                pos, neg = ftr[y[ftr] == 1], ftr[y[ftr] == 0]
                if mt == "disjunction":
                    pos, neg = neg, pos
                fits.append({
                    "pos_mask": mask_of(pos), "neg_mask": mask_of(neg),
                    "test_pos_mask": mask_of(fte[y[fte] == 1]),
                    "test_neg_mask": mask_of(fte[y[fte] == 0]),
                    "p": p, "model_type": mt,
                })

    def timed(fn):
        fn()  # compile
        best = float("inf")
        out = None
        for _ in range(3):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    t1, out1 = timed(
        lambda: scm_cv_grid_device(matrix, fits, n_kmers, max_rules))
    print("1 device: %.3fs (%d fits x %d rules, %d x %.1fM matrix)"
          % (t1, len(fits), max_rules, n_genomes, n_kmers / 1e6))

    if n_devices > 1:
        mesh = make_mesh(n_devices, row_devices=1)
        tn, outN = timed(lambda: scm_cv_grid_sharded(
            matrix, fits, n_kmers, max_rules, mesh))
        eff = t1 / (tn * n_devices)
        print("%d devices: %.3fs  speedup %.2fx  efficiency %.0f%%"
              % (n_devices, tn, t1 / tn, 100 * eff))
        assert np.array_equal(out1[0], outN[0]), "sharded model must match"
        print("sharded model identical to single-device model")


if __name__ == "__main__":
    main()
