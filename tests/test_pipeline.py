"""In-memory end-to-end pipeline tests."""

import numpy as np
import pytest

from grm_tpu.pipeline import InMemoryDataset, train_scm


@pytest.fixture
def inmem(tmp_path, rng):
    marker = "TTAACCGGATCGATCGGCTAGCTAACG"
    specs, labels = [], {}
    for i in range(16):
        gid = "m%02d" % i
        bg = "".join(rng.choice(list("ACGT"), 500))
        seq = bg[:250] + (marker if i % 2 else "") + bg[250:]
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % seq)
        specs.append((gid, str(p)))
        labels[gid] = i % 2
    return specs, labels


def test_in_memory_pipeline_conjunction(inmem):
    specs, labels = inmem
    ds = InMemoryDataset.from_contigs(specs, labels, k=15)
    result = train_scm(ds, model_type="conjunction", p=1.0, max_rules=3,
                       train_prop=0.75, random_seed=1)
    assert result.train_metrics["risk"][0] == 0.0
    assert result.test_metrics["risk"][0] == 0.0
    assert len(result.model) >= 1


def test_in_memory_pipeline_disjunction(inmem):
    specs, labels = inmem
    ds = InMemoryDataset.from_contigs(specs, labels, k=15)
    result = train_scm(ds, model_type="disjunction", p=1.0, max_rules=3,
                       random_seed=1)
    assert result.train_metrics["risk"][0] == 0.0


def test_device_ingest_pipeline(inmem):
    """Fully on-device ingest -> fused SCM fit, same quality + same rules."""
    specs, labels = inmem
    ds_host = InMemoryDataset.from_contigs(specs, labels, k=15)
    ds_dev = InMemoryDataset.from_contigs_device(specs, labels, k=15)
    assert ds_dev.kmer_count == ds_host.kmer_count

    r_host = train_scm(ds_host, random_seed=3)
    r_dev = train_scm(ds_dev, random_seed=3)
    assert [str(r) for r in r_host.model.rules] == [str(r) for r in r_dev.model.rules]
    assert r_dev.test_metrics["risk"][0] == r_host.test_metrics["risk"][0] == 0.0


def test_device_ingest_pipeline_batched(tmp_path, rng):
    """Batched device ingest (multi-batch + ragged tail) through the
    pipeline produces the same union size and the same learned rules."""
    marker = "TTGACGGCTAGCTCAGT"
    specs, labels = [], {}
    for i in range(40):
        gid = "g%02d" % i
        bg = "".join(rng.choice(list("ACGT"), 240))
        seq = bg[:100] + (marker if i % 2 else "") + bg[100:]
        p = tmp_path / (gid + ".fna")
        p.write_text(">c\n%s\n" % seq)
        specs.append((gid, str(p)))
        labels[gid] = i % 2

    ds_host = InMemoryDataset.from_contigs(specs, labels, k=15)
    ds_dev = InMemoryDataset.from_contigs_device(specs, labels, k=15,
                                                 genome_batch=32)
    assert ds_dev.kmer_count == ds_host.kmer_count
    r_host = train_scm(ds_host, random_seed=3)
    r_dev = train_scm(ds_dev, random_seed=3)
    assert [str(r) for r in r_host.model.rules] == \
        [str(r) for r in r_dev.model.rules]


def test_in_memory_pipeline_sharded(inmem):
    from grm_tpu.parallel.mesh import make_mesh

    specs, labels = inmem
    ds = InMemoryDataset.from_contigs(specs, labels, k=15)
    plain = train_scm(ds, random_seed=2)

    ds2 = InMemoryDataset.from_contigs(specs, labels, k=15)
    sharded = train_scm(ds2, random_seed=2, mesh=make_mesh(8))
    assert [str(r) for r in plain.model.rules] == [str(r) for r in sharded.model.rules]
    assert plain.test_metrics["risk"][0] == sharded.test_metrics["risk"][0]


def test_planted_marker_full_artifact_pipeline(tmp_path, rng):
    """Biology-shaped E2E: a resistance cassette planted in class-1 genomes
    must be recovered as a Presence rule with zero test risk by BOTH the
    exact host engine and the device CV-grid engine, through the full HDF5
    artifact path (create -> split -> learn)."""
    from grm_tpu.dataset import from_contigs
    from grm_tpu.dataset.split import split_with_proportion
    from grm_tpu.learning.experiments import learn_SCM

    bases = np.array(list("ACGT"))
    backbone = rng.randint(0, 4, 8000)
    marker = rng.randint(0, 4, 80)
    lines_c, lines_m = [], []
    for g in range(16):
        seq = backbone.copy()
        seq[rng.randint(0, len(seq), 60)] = rng.randint(0, 4, 60)
        label = g % 2
        full = np.concatenate([seq, marker]) if label else seq
        p = tmp_path / ("h%d.fna" % g)
        p.write_text(">c0\n%s\n" % "".join(bases[full]))
        lines_c.append("gen%d\t%s" % (g, p))
        lines_m.append("gen%d\t%d" % (g, label))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds = tmp_path / "ds.h5"
    from_contigs(tmp_path / "c.tsv", ds, kmer_size=21,
                 phenotype_description="amr",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(ds, "sp", train_prop=0.75, random_seed=7, n_folds=3)

    results = {}
    for engine in ("host", "device"):
        out = learn_SCM(dataset_file=ds, split_name="sp",
                        model_type=["conjunction", "disjunction"],
                        p=[0.562, 1.0, 1.778], max_rules=5,
                        parameter_selection="cv", random_seed=3,
                        engine=engine)
        _, _, _, test_m, model, _, _, _ = out
        results[engine] = ([str(r) for r in model.rules], test_m["risk"][0])

    assert results["host"] == results["device"]
    rules, risk = results["host"]
    assert risk == 0.0
    assert len(rules) >= 1 and rules[0].startswith("Presence(")


def test_blacklist_device_engine_matches_host(tmp_path, rng):
    """k-mer blacklists on the device engine (grid-engine XLA sweep column
    masks) pick the same model as the host engine: blacklisting the planted
    marker's winning k-mer forces both engines to the same fallback rule."""
    from grm_tpu.dataset import from_contigs
    from grm_tpu.dataset.split import split_with_proportion
    from grm_tpu.learning.experiments import learn_SCM

    bases = np.array(list("ACGT"))
    backbone = rng.randint(0, 4, 6000)
    marker = rng.randint(0, 4, 80)
    lines_c, lines_m = [], []
    for g in range(14):
        seq = backbone.copy()
        seq[rng.randint(0, len(seq), 40)] = rng.randint(0, 4, 40)
        label = g % 2
        full = np.concatenate([seq, marker]) if label else seq
        p = tmp_path / ("b%d.fna" % g)
        p.write_text(">c0\n%s\n" % "".join(bases[full]))
        lines_c.append("bl%d\t%s" % (g, p))
        lines_m.append("bl%d\t%d" % (g, label))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds = tmp_path / "ds.h5"
    from_contigs(tmp_path / "c.tsv", ds, kmer_size=21,
                 phenotype_description="amr",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(ds, "sp", train_prop=0.75, random_seed=11,
                          n_folds=2)

    # Find the rule both engines pick without a blacklist, then ban its
    # k-mer and re-learn with both engines.
    base = learn_SCM(dataset_file=ds, split_name="sp",
                     model_type=["conjunction"], p=[1.0], max_rules=1,
                     parameter_selection="none", random_seed=3,
                     engine="host")
    banned = base[4].rules[0].kmer_sequence
    blacklist = tmp_path / "blacklist.txt"
    blacklist.write_text(banned + "\n")

    out = {}
    for engine in ("host", "device"):
        r = learn_SCM(dataset_file=ds, split_name="sp",
                      model_type=["conjunction", "disjunction"],
                      p=[0.562, 1.0], max_rules=3,
                      kmer_blacklist_file=str(blacklist),
                      parameter_selection="cv", random_seed=3,
                      engine=engine)
        rules = [str(x) for x in r[4].rules]
        assert banned not in " ".join(rules), (engine, rules)
        out[engine] = (rules, r[3]["risk"][0])
    assert out["host"] == out["device"], out
