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


def test_in_memory_pipeline_sharded(inmem):
    from grm_tpu.parallel.mesh import make_mesh

    specs, labels = inmem
    ds = InMemoryDataset.from_contigs(specs, labels, k=15)
    plain = train_scm(ds, random_seed=2)

    ds2 = InMemoryDataset.from_contigs(specs, labels, k=15)
    sharded = train_scm(ds2, random_seed=2, mesh=make_mesh(8))
    assert [str(r) for r in plain.model.rules] == [str(r) for r in sharded.model.rules]
    assert plain.test_metrics["risk"][0] == sharded.test_metrics["risk"][0]
