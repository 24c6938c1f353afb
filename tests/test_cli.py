"""CLI end-to-end: dataset create/split/info + learn scm/tree + kmer tools."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, n_devices=1):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GRM_PLATFORM"] = "cpu"  # sitecustomize may override JAX_PLATFORMS
    if n_devices > 1:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=%d" % n_devices
        )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Share compiled XLA programs across the spawned CLI processes.
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/grm_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return subprocess.run(
        [sys.executable, "-m", "grm_tpu"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300,
    )


@pytest.fixture(scope="module")
def cli_workspace(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(5)
    marker = "TTGACGGCTAGCTCAGTCCTAGGTAC"
    lines_c, lines_m = [], []
    for i in range(12):
        gid = "iso%02d" % i
        bg = "".join(rng.choice(list("ACGT"), 350))
        seq = bg[:150] + (marker if i % 2 else "") + bg[150:]
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % seq)
        lines_c.append("%s\t%s" % (gid, p))
        lines_m.append("%s\t%s" % (gid, "resistant" if i % 2 else "susceptible"))
    (tmp_path / "contigs.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "meta.tsv").write_text("\n".join(lines_m) + "\n")
    return tmp_path


def test_cli_full_pipeline(cli_workspace):
    tmp = cli_workspace
    r = _run(["dataset", "create", "from-contigs",
              "--genomic-data", "contigs.tsv", "--output", "amr.h5",
              "--kmer-size", "15", "--singleton-kmers",
              "--phenotype-description", "test amr",
              "--phenotype-metadata", "meta.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    assert (tmp / "amr.h5").exists()

    r = _run(["dataset", "split", "--dataset", "amr.h5", "--id", "sp1",
              "--train-size", "0.75", "--folds", "2", "--random-seed", "9"],
             cwd=tmp)
    assert r.returncode == 0, r.stderr

    r = _run(["dataset", "info", "--dataset", "amr.h5", "--genome-count",
              "--kmer-count", "--splits", "--phenotype-tags"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    assert "Genome count: 12" in r.stdout
    assert "sp1" in r.stdout
    assert "resistant, susceptible" in r.stdout

    r = _run(["dataset", "info", "--dataset", "amr.h5", "--all"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    for field in ("Genome type:", "Genome source:", "Genome count: 12",
                  "K-mer length:", "K-mer count:", "Phenotype description:",
                  "Phenotype tags:", "UUID:", "Compression:",
                  "Classification type:", "splits"):
        assert field in r.stdout, field

    r = _run(["learn", "scm", "--dataset", "amr.h5", "--split", "sp1",
              "--model-type", "conjunction", "disjunction",
              "--p", "0.5", "1.0", "--max-rules", "3",
              "--hp-choice", "cv", "--random-seed", "3",
              "--output-dir", "scm_out"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    assert "Kover Learning Report" in r.stdout
    results = json.loads((tmp / "scm_out" / "results.json").read_text())
    assert results["metrics"]["test"]["risk"][0] == 0.0
    assert results["model"]["n_rules"] >= 1
    assert (tmp / "scm_out" / "model.fasta").exists()
    assert (tmp / "scm_out" / "report.txt").exists()
    assert (tmp / "scm_out" / "config.json").exists()

    r = _run(["learn", "tree", "--dataset", "amr.h5", "--split", "sp1",
              "--criterion", "gini", "--max-depth", "3",
              "--hp-choice", "cv", "--output-dir", "tree_out"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    results = json.loads((tmp / "tree_out" / "results.json").read_text())
    assert results["metrics"]["test"]["risk"][0] == 0.0
    assert (tmp / "tree_out" / "model.fasta").exists()


def test_cli_kmer_tools(cli_workspace):
    tmp = cli_workspace
    r = _run(["kmer", "count", "--genome", "iso01.fna", "--kmer-size", "21",
              "--out", "counts.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    lines = (tmp / "counts.tsv").read_text().splitlines()
    assert len(lines) > 100
    assert all(len(l.split("\t")) == 2 for l in lines)
    kmers = [l.split("\t")[0] for l in lines]
    assert kmers == sorted(kmers)

    r = _run(["kmer", "matrix", "--genome-list", "contigs.tsv",
              "--kmer-size", "15", "--out", "matrix.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    header = (tmp / "matrix.tsv").read_text().splitlines()[0].split("\t")
    assert header[0] == "kmers"
    assert len(header) == 13


def test_cli_from_reads(cli_workspace, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reads")
    rng = np.random.RandomState(3)
    lines_r, lines_m = [], []
    for i in range(4):
        gid = "r%02d" % i
        rdir = tmp / gid
        os.makedirs(rdir)
        seq = "".join(rng.choice(list("ACGT"), 300))
        with open(rdir / "a.fastq", "w") as f:
            f.write("@x\n%s\n+\n%s\n" % (seq, "I" * len(seq)))
        lines_r.append("%s\t%s" % (gid, rdir))
        lines_m.append("%s\t%d" % (gid, i % 2))
    (tmp / "reads.tsv").write_text("\n".join(lines_r) + "\n")
    (tmp / "meta.tsv").write_text("\n".join(lines_m) + "\n")
    r = _run(["dataset", "create", "from-reads",
              "--genomic-data", "reads.tsv", "--output", "reads.h5",
              "--kmer-size", "11", "--abundance-min", "1", "--singleton-kmers",
              "--phenotype-description", "t",
              "--phenotype-metadata", "meta.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    r = _run(["dataset", "info", "--dataset", "reads.h5", "--genome-type",
              "--kmer-count"], cwd=tmp)
    assert "Genome type: reads" in r.stdout


def test_cli_create_from_contigs_dir(cli_workspace, tmp_path_factory):
    """A directory of .fna files stands in for the paths TSV (the GUI's
    create_contigs_path_tsv role, src/kover.py:40-49); the resulting
    dataset matches the TSV-driven build genome for genome."""
    import h5py

    tmp = tmp_path_factory.mktemp("dircreate")
    gdir = tmp / "genomes"
    gdir.mkdir()
    for line in (cli_workspace / "contigs.tsv").read_text().splitlines():
        gid, path = line.split("\t")
        (gdir / ("%s.fna" % gid)).write_text(open(path).read())
    meta = (cli_workspace / "meta.tsv").read_text()
    (tmp / "meta.tsv").write_text(meta)

    r = _run(["dataset", "create", "from-contigs",
              "--genomic-data", "genomes", "--output", "dir.h5",
              "--kmer-size", "15", "--singleton-kmers",
              "--phenotype-description", "test amr",
              "--phenotype-metadata", "meta.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    assert (tmp / "dir.h5.paths.tsv").exists()

    with h5py.File(tmp / "dir.h5") as a, \
            h5py.File(cli_workspace / "amr.h5") as b:
        np.testing.assert_array_equal(a["genome_identifiers"][...],
                                      b["genome_identifiers"][...])
        np.testing.assert_array_equal(a["kmer_matrix"][...],
                                      b["kmer_matrix"][...])


def test_cli_errors(cli_workspace):
    tmp = cli_workspace
    r = _run(["dataset", "split", "--dataset", "amr.h5", "--id", "bad",
              "--folds", "1"], cwd=tmp)
    assert "folds must be 0 or >= 2" in r.stdout

    r = _run(["learn", "scm", "--dataset", "amr.h5", "--split", "nope"],
             cwd=tmp)
    assert r.returncode != 0
    assert "does not exist" in r.stdout


def test_cli_learn_n_devices(cli_workspace):
    """--engine device --n-devices N (column-sharded engines through the
    CLI) picks the same model as the default host engine. Self-contained:
    builds its own dataset so it runs in any test order."""
    tmp = cli_workspace
    r = _run(["dataset", "create", "from-contigs",
              "--genomic-data", "contigs.tsv", "--output", "nd.h5",
              "--kmer-size", "15", "--singleton-kmers",
              "--phenotype-description", "test amr",
              "--phenotype-metadata", "meta.tsv"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    r = _run(["dataset", "split", "--dataset", "nd.h5", "--id", "sp",
              "--train-size", "0.75", "--folds", "2", "--random-seed", "9"],
             cwd=tmp)
    assert r.returncode == 0, r.stderr
    common = ["learn", "scm", "--dataset", "nd.h5", "--split", "sp",
              "--p", "0.5", "1.0", "--max-rules", "3", "--hp-choice", "cv"]
    r = _run(common + ["--engine", "device", "--n-devices", "4",
                       "--output-dir", "scm_dev4"], cwd=tmp, n_devices=4)
    assert r.returncode == 0, r.stderr
    r = _run(common + ["--output-dir", "scm_host_nd"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    sharded = json.loads((tmp / "scm_dev4" / "results.json").read_text())
    host = json.loads((tmp / "scm_host_nd" / "results.json").read_text())
    assert sharded["model"]["rules"] == host["model"]["rules"]
    assert sharded["metrics"]["test"]["risk"] == host["metrics"]["test"]["risk"]

    # --n-devices with the host engine must refuse loudly, not silently
    # ignore the sharding request.
    r = _run(common + ["--n-devices", "4", "--output-dir", "x"],
             cwd=tmp, n_devices=4)
    assert r.returncode != 0
    assert "requires --engine device" in r.stdout


def test_info_splits_golden_reference_grammar(tmp_path, capsys):
    """Pin `dataset info --splits` to the reference's exact split grammar
    (KoverDatasetSplit.__str__, ds.py:171-180) — the GUI parses this format
    to discover splits and fold counts (src/app.py:2775-2866)."""
    import numpy as np

    from grm_tpu import cli
    from grm_tpu.dataset import from_tsv
    from grm_tpu.dataset.split import split_with_proportion

    n_genomes, n_kmers = 10, 12
    rng = np.random.RandomState(0)
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    ids = ["g%02d" % i for i in range(n_genomes)]
    kmers = ["".join("ACGT"[(i >> (2 * j)) & 3] for j in range(6))
             for i in range(n_kmers)]
    lines = ["kmers\t" + "\t".join(ids)]
    for r in range(n_kmers):
        lines.append(kmers[r] + "\t"
                     + "\t".join(str(int(v)) for v in dense[:, r]))
    (tmp_path / "m.tsv").write_text("\n".join(lines) + "\n")
    (tmp_path / "meta.tsv").write_text("\n".join(
        "%s\t%d" % (g, i % 2) for i, g in enumerate(ids)) + "\n")
    ds = tmp_path / "d.h5"
    from_tsv(tmp_path / "m.tsv", ds, phenotype_description="x",
             phenotype_metadata_path=tmp_path / "meta.tsv", gzip=0)
    split_with_proportion(ds, "split_a", train_prop=0.7, random_seed=13,
                          n_folds=3)

    cli.main(["dataset", "info", "--dataset", str(ds), "--splits"])
    out = capsys.readouterr().out
    # 10 genomes * 0.7 -> ceil = 7 train / 3 test.
    assert ("split_a   Train genomes: 7 (0.700)   Test genomes: 3 (0.300)"
            "   Folds: 3   Random Seed: 13") in out
    assert "The following splits are available for learning:" in out
