"""Learn-path compile hygiene: datasets of similar scale must share every
compiled program (VERDICT r3 item 7).

BitMatrix bucket-pads word rows and k-mer columns, and the exact SCM
engine bucket-pads the fit count, so a second dataset with a different
k-mer count (same bucket) triggers ZERO new jit compiles — asserted via
the jit caches of the fused programs themselves.
"""

import numpy as np
import pytest

from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.scm_experiment import learn_SCM

from test_scm_exact import _write_tsv_dataset


def _dataset(tmp_path, n_kmers, name, seed):
    rng = np.random.RandomState(seed)
    n_genomes = 30
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    col = labels.copy()
    col[rng.choice(n_genomes, 2, replace=False)] ^= 1
    dense[:, 7] = col
    dense[:, 11] = labels  # clean marker: a non-empty model always exists
    ds = _write_tsv_dataset(tmp_path, dense, labels, name=name)
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=seed,
                          n_folds=2)
    return ds


def test_second_dataset_in_same_bucket_compiles_nothing(tmp_path,
                                                        monkeypatch):
    monkeypatch.setenv("GRM_COL_BUCKET", "4096")
    monkeypatch.setenv("GRM_ROW_BUCKET_WORDS", "4")
    monkeypatch.setenv("GRM_SHAPE_BUCKETS", "1")

    from grm_tpu.parallel import scm_exact

    ds_a = _dataset(tmp_path, 2000, "bka", seed=1)
    ds_b = _dataset(tmp_path, 2300, "bkb", seed=2)

    kwargs = dict(split_name="sp", model_type=["conjunction", "disjunction"],
                  p=[0.5, 1.0, 2.0], max_rules=3, max_equiv_rules=50,
                  parameter_selection="cv", random_seed=0, bound_delta=0.05,
                  bound_max_genome_size=3000, engine="device")
    out_a = learn_SCM(dataset_file=ds_a, **kwargs)

    # Every exact-engine program is now compiled for the bucketed shapes
    # (the speculative double-step is the learn path's program).
    tracked = [scm_exact._spec_step, scm_exact._pass1, scm_exact._pass2,
               scm_exact._hit_sbs]
    before = [t._cache_size() for t in tracked]
    assert before[0] >= 1  # the speculative step actually ran

    out_b = learn_SCM(dataset_file=ds_b, **kwargs)
    after = [t._cache_size() for t in tracked]
    assert after == before, (
        "new learn-path compiles for a same-bucket dataset: %s -> %s"
        % (before, after))

    # Sanity: both runs produced real models.
    assert len(out_a[4].rules) >= 1
    assert len(out_b[4].rules) >= 1


def test_fit_count_bucketing_pads_inactive_fits():
    """A 5-fit grid and a 16-fit grid share one compiled shape; padded
    fits retire immediately and outputs slice back to the true count."""
    from grm_tpu.parallel.scm_exact import _pad_fit_arrays

    f = 5
    pos = np.ones((f, 3), np.uint32)
    neg = np.ones((f, 3), np.uint32)
    t = np.zeros((f, 3), np.uint32)
    ps = np.full(f, 2.0)
    dis = np.zeros(f, bool)
    fb, pos2, neg2, tp2, tn2, ps2, dis2 = _pad_fit_arrays(
        f, pos, neg, t, t, ps, dis)
    assert fb == 16
    assert pos2.shape == (16, 3)
    assert (neg2[5:] == 0).all()          # padded fits have empty masks
    assert (ps2[5:] == 1.0).all()
    # exact multiples of 16 stay untouched (the default 2x8x5 grid = 80)
    fb2, *rest = _pad_fit_arrays(80, *(np.zeros((80, 3), np.uint32),) * 4,
                                 np.ones(80), np.zeros(80, bool))
    assert fb2 == 80
