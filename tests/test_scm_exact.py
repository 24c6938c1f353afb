"""Exact device SCM engine: bit-identical parity with the host engine on
tie-rich datasets (VERDICT r2 item 2).

The datasets here are engineered so the greedy utility scan hits exact ties
(duplicated k-mer columns, balanced column pairs) — the regime where the
old pure-argmax device engine diverged from the reference semantics. Every
assertion is exact equality (rules, tie sets, risks, hyperparameters), not
approximate quality.
"""

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_tsv
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments.scm_experiment import learn_SCM


def _write_tsv_dataset(tmp_path, dense, labels, name="ds", gzip=0):
    """dense: (n_genomes, n_kmers) 0/1. Writes the reference TSV format
    (rows = k-mers, cols = genomes) and builds the HDF5 artifact."""
    n_genomes, n_kmers = dense.shape
    ids = ["g%03d" % i for i in range(n_genomes)]
    k = 8
    bases = "ACGT"
    kmers = []
    for i in range(n_kmers):
        s = "".join(bases[(i >> (2 * j)) & 3] for j in range(k))
        kmers.append(s)
    assert len(set(kmers)) == n_kmers
    lines = ["kmers\t" + "\t".join(ids)]
    for r in range(n_kmers):
        lines.append(kmers[r] + "\t" + "\t".join(
            str(int(v)) for v in dense[:, r]))
    tsv = tmp_path / (name + ".tsv")
    tsv.write_text("\n".join(lines) + "\n")
    meta = tmp_path / (name + "_meta.tsv")
    meta.write_text("\n".join(
        "%s\t%d" % (g, int(l)) for g, l in zip(ids, labels)) + "\n")
    out = tmp_path / (name + ".h5")
    from_tsv(tsv, out, phenotype_description="synthetic",
             phenotype_metadata_path=meta, gzip=gzip)
    return out


def _tied_dataset(tmp_path, seed=0, n_genomes=24, n_kmers=60, n_dups=6,
                  name="tied"):
    """Random matrix with duplicated columns (exact utility ties whose
    members share predictions) AND pairs of distinct columns engineered to
    tie in utility while splitting examples differently."""
    rng = np.random.RandomState(seed)
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    # exact duplicates
    for i in range(n_dups):
        dense[:, 2 * i + 1] = dense[:, 2 * i]
    # complement pairs: column j and ~column j tie the presence/absence halves
    for i in range(4):
        dense[:, 20 + 2 * i + 1] = 1 - dense[:, 20 + 2 * i]
    return _write_tsv_dataset(tmp_path, dense, labels, name=name)


def _model_fingerprint(out):
    best_hp, best_hp_score, train_m, test_m, model, imps, equiv, cls = out
    return {
        "hp": (best_hp["model_type"], best_hp["p"], best_hp["max_rules"]),
        "score": best_hp_score,
        "rules": [(r.kmer_sequence, r.type) for r in model.rules],
        "equiv": [sorted((e.kmer_sequence, e.type) for e in eq)
                  for eq in equiv],
        "importances": np.asarray(imps).tolist(),
        "train_risk": train_m["risk"][0],
        "test_risk": test_m["risk"][0] if test_m else None,
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_exact_engine_matches_host_cv_with_ties(tmp_path, seed):
    ds = _tied_dataset(tmp_path, seed=seed)
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=seed,
                          n_folds=3)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0, 2.0],
        max_rules=4, parameter_selection="cv", random_seed=17,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev


def test_exact_engine_matches_host_extreme_p_grid(tmp_path):
    """The reference's full default p grid, including p=999999 — the
    regime where a p-scaled float32 slack would blow the candidate
    threshold open (r3 OOM regression)."""
    ds = _tied_dataset(tmp_path, seed=6, name="xp")
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=6, n_folds=2)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"],
        p=[0.1, 0.316, 0.562, 1.0, 1.778, 3.162, 10.0, 999999.0],
        max_rules=3, parameter_selection="cv", random_seed=2,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev


@pytest.mark.parametrize("model_type", ["conjunction", "disjunction"])
def test_exact_engine_matches_host_full_train_ties(tmp_path, model_type):
    ds = _tied_dataset(tmp_path, seed=9, name="t9")
    split_with_proportion(ds, "sp", train_prop=0.8, random_seed=3, n_folds=0)
    kwargs = dict(
        dataset_file=ds, split_name="sp", model_type=model_type, p=[1.0],
        max_rules=5, parameter_selection="none", random_seed=23,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev
    # ties must actually exist for this to be a meaningful parity check
    assert any(len(eq) > 1 for eq in host["equiv"])


def test_exact_engine_equiv_rule_subsampling_rng_parity(tmp_path):
    """max_equiv_rules < |tie set| consumes the RNG identically."""
    rng = np.random.RandomState(5)
    n_genomes, n_kmers = 20, 40
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 10:20] = labels[:, None]  # 10-way exact tie, perfect marker
    ds = _write_tsv_dataset(tmp_path, dense, labels, name="sub")
    split_with_proportion(ds, "sp", train_prop=0.8, random_seed=1, n_folds=0)
    kwargs = dict(
        dataset_file=ds, split_name="sp", model_type="conjunction", p=[1.0],
        max_rules=3, parameter_selection="none", random_seed=77,
        max_equiv_rules=4,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev
    assert len(host["equiv"][0]) == 4  # subsampled from the 10-way tie


def test_exact_engine_blacklist_parity(tmp_path):
    rng = np.random.RandomState(8)
    n_genomes, n_kmers = 20, 30
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 4] = labels  # perfect marker to be blacklisted
    ds = _write_tsv_dataset(tmp_path, dense, labels, name="bl")
    split_with_proportion(ds, "sp", train_prop=0.8, random_seed=2, n_folds=2)

    dataset = GrmDataset(ds)
    seqs = [s.decode() for s in dataset.kmer_sequences]
    kmer_of_col4 = seqs[int(dataset.kmer_by_matrix_column[4])]
    bl_file = ds.parent / "blacklist.txt"
    bl_file.write_text(kmer_of_col4 + "\n")

    kwargs = dict(
        dataset_file=ds, split_name="sp", model_type="conjunction", p=[1.0],
        max_rules=3, parameter_selection="cv", random_seed=11,
        kmer_blacklist_file=str(bl_file),
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev
    assert all(seq != kmer_of_col4 for seq, _ in host["rules"])


def test_exact_engine_budget_escalation(tmp_path, monkeypatch):
    """Tiny device budgets force the hit/candidate escalation paths; the
    result must be unchanged."""
    import grm_tpu.learning.experiments.scm_experiment as se
    from grm_tpu.parallel import scm_exact

    rng = np.random.RandomState(13)
    n_genomes, n_kmers = 16, 600
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    # a 40-wide exact tie scattered across the column space
    cols = rng.choice(n_kmers, 40, replace=False)
    dense[:, cols] = labels[:, None]
    ds = _write_tsv_dataset(tmp_path, dense, labels, name="esc")
    split_with_proportion(ds, "sp", train_prop=0.8, random_seed=4, n_folds=2)

    kwargs = dict(
        dataset_file=ds, split_name="sp", model_type="conjunction", p=[1.0],
        max_rules=3, parameter_selection="cv", random_seed=3,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))

    real_init = scm_exact.ExactScmEngine.__init__

    def tiny_init(self, matrix, n_kmers, excl_rules=None, sb=8192,
                  hit_budget=64, cand_budget=64):
        real_init(self, matrix, n_kmers, excl_rules=excl_rules, sb=64,
                  hit_budget=2, cand_budget=2)

    monkeypatch.setattr(scm_exact.ExactScmEngine, "__init__", tiny_init)
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert host == dev


def test_exact_engine_sharded_matches_host_with_ties(tmp_path):
    """engine=device over a columns-only 8-device mesh is STILL
    bit-identical to host on tie-rich data (exact engine, column-sharded
    matrix via XLA auto-partitioning)."""
    from grm_tpu.parallel.mesh import make_mesh

    ds = _tied_dataset(tmp_path, seed=21, name="shx")
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=21,
                          n_folds=2)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0],
        max_rules=3, parameter_selection="cv", random_seed=8,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    dev = _model_fingerprint(learn_SCM(engine="device", mesh=make_mesh(8),
                                       **kwargs))
    assert host == dev


def test_device_argmax_engine_still_available(tmp_path):
    """The speed-path engine remains selectable and produces a model of the
    same quality (selection may differ on ties, metrics must match on a
    separable dataset)."""
    rng = np.random.RandomState(2)
    n_genomes, n_kmers = 20, 30
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    labels = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    dense[:, 7] = labels
    ds = _write_tsv_dataset(tmp_path, dense, labels, name="am")
    split_with_proportion(ds, "sp", train_prop=0.8, random_seed=6, n_folds=2)
    out = learn_SCM(dataset_file=ds, split_name="sp",
                    model_type="conjunction", p=[1.0], max_rules=3,
                    parameter_selection="cv", random_seed=5,
                    engine="device-argmax")
    assert out[2]["risk"][0] == 0.0


def test_exact_engine_streams_past_hbm_budget(tmp_path, monkeypatch):
    """A matrix forced past the HBM budget must stay on the EXACT device
    path (streamed chunks), not fall back to the 0.24x host engine — with
    results identical to both the host engine and the resident exact
    engine (VERDICT r3 item 3)."""
    ds = _tied_dataset(tmp_path, seed=5, n_genomes=28, n_kmers=900,
                       name="hbm")
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=5,
                          n_folds=2)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0, 2.0],
        max_rules=4, max_equiv_rules=100, parameter_selection="cv",
        random_seed=7, bound_delta=0.05, bound_max_genome_size=900,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    resident = _model_fingerprint(learn_SCM(engine="device", **kwargs))

    # Shrink the budget so bit_matrix() returns a StreamingBitMatrix and
    # the exact engine takes the streamed path with several chunks.
    monkeypatch.setenv("GRM_HBM_BUDGET_BYTES", "1000")
    monkeypatch.setenv("GRM_STREAM_CHUNK_COLS", "256")

    from grm_tpu.dataset import GrmDataset as GD
    from grm_tpu.ops.popcount import StreamingBitMatrix
    from grm_tpu.parallel import scm_exact

    streamed_runs = []
    orig = scm_exact.ExactScmEngine._run_fits_streamed

    def spy(self, *a, **kw):
        streamed_runs.append(self.matrix.shape)
        return orig(self, *a, **kw)

    monkeypatch.setattr(scm_exact.ExactScmEngine, "_run_fits_streamed", spy)
    assert isinstance(GD(ds).bit_matrix(), StreamingBitMatrix)
    streamed = _model_fingerprint(learn_SCM(engine="device", **kwargs))

    assert streamed == host
    assert streamed == resident
    # ONE streamed engine run serves CV AND full train: the speculative
    # per-HP full-train fits ride the CV batch (round-trip economy).
    assert len(streamed_runs) == 1


def test_scm_e2e_round_trip_budget(tmp_path, monkeypatch):
    """The e2e learn is fetch-count-bound on this rig (1-6 s per
    device_get through the tunnel regardless of size, CLAUDE.md), so the
    device-exact path must stay under 15 round trips for a full
    cv-selected learn: one fused dispatch+fetch per greedy iteration
    serving the CV grid AND the speculative per-HP full-train fits."""
    import jax

    ds = _tied_dataset(tmp_path, seed=11, name="rtb")
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=11,
                          n_folds=3)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0, 2.0],
        max_rules=10, max_equiv_rules=100, parameter_selection="cv",
        random_seed=5,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))

    fetches = []
    orig = jax.device_get

    def counting_get(x):
        fetches.append(1)
        return orig(x)

    monkeypatch.setattr(jax, "device_get", counting_get)
    dev = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    monkeypatch.undo()

    assert dev == host
    # Speculation advances two greedy iterations per round trip (verified
    # on the host, misses roll back) — the budget is now single digits.
    assert len(fetches) < 10, "device round trips regressed: %d" % len(fetches)


def test_speculative_and_classic_loops_agree(tmp_path, monkeypatch):
    """GRM_SCM_SPECULATE=0 (classic one-iteration-per-round-trip loop)
    and the speculative double-step must produce identical learns on
    tie-rich data — speculation only changes WHICH precomputed results
    are consumed, never the selection."""
    ds = _tied_dataset(tmp_path, seed=21, name="specvs")
    split_with_proportion(ds, "sp", train_prop=0.7, random_seed=21,
                          n_folds=3)
    kwargs = dict(
        dataset_file=ds, split_name="sp",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0, 999999.0],
        max_rules=6, max_equiv_rules=50, parameter_selection="cv",
        random_seed=9,
    )
    host = _model_fingerprint(learn_SCM(engine="host", **kwargs))
    spec = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    monkeypatch.setenv("GRM_SCM_SPECULATE", "0")
    classic = _model_fingerprint(learn_SCM(engine="device", **kwargs))
    assert spec == host
    assert classic == host
