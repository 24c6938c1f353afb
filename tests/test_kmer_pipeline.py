"""FASTA -> counting -> union presence matrix -> TSV round trip."""

import gzip
import os

import numpy as np
import pytest

from grm_tpu.kmer.counter import count_fasta, count_reads_dir
from grm_tpu.kmer.matrix import (
    build_presence_matrix,
    counts_to_tsv,
    matrix_to_tsv,
    read_matrix_tsv,
)
from grm_tpu.ops.kmer import canonical_kmers_brute, decode_kmers


def _write_fasta(path, contigs):
    with open(path, "w") as f:
        for i, c in enumerate(contigs):
            f.write(">contig%d\n%s\n" % (i, c))


def _random_genome(rng, n_contigs=3, lo=50, hi=300):
    return [
        "".join(rng.choice(list("ACGT"), rng.randint(lo, hi)))
        for _ in range(n_contigs)
    ]


@pytest.fixture
def genomes_dir(tmp_path, rng):
    contigs_by_genome = {}
    for i in range(5):
        gid = "genome_%d" % i
        contigs = _random_genome(rng)
        _write_fasta(tmp_path / ("%s.fna" % gid), contigs)
        contigs_by_genome[gid] = contigs
    return tmp_path, contigs_by_genome


def test_count_fasta_matches_brute(genomes_dir):
    tmp_path, contigs_by_genome = genomes_dir
    k = 21
    for gid, contigs in contigs_by_genome.items():
        g = count_fasta(tmp_path / ("%s.fna" % gid), k, genome_id=gid)
        assert g.genome_id == gid
        assert decode_kmers(g.kmers, k) == canonical_kmers_brute(contigs, k)


def test_presence_matrix_vs_dense_oracle(genomes_dir):
    tmp_path, contigs_by_genome = genomes_dir
    k = 15
    gks = [
        count_fasta(tmp_path / ("%s.fna" % gid), k, genome_id=gid)
        for gid in sorted(contigs_by_genome)
    ]
    km = build_presence_matrix(gks)

    union = sorted(set().union(*(
        canonical_kmers_brute(contigs_by_genome[gid], k)
        for gid in sorted(contigs_by_genome)
    )))
    assert km.kmer_strings() == union

    dense = km.dense()
    for i, gid in enumerate(sorted(contigs_by_genome)):
        present = set(canonical_kmers_brute(contigs_by_genome[gid], k))
        want = np.array([s in present for s in union], dtype=np.uint8)
        np.testing.assert_array_equal(dense[i], want)


def test_singleton_filter(genomes_dir):
    tmp_path, contigs_by_genome = genomes_dir
    k = 11
    gks = [
        count_fasta(tmp_path / ("%s.fna" % gid), k, genome_id=gid)
        for gid in sorted(contigs_by_genome)
    ]
    km_all = build_presence_matrix(gks)
    km_filt = build_presence_matrix(gks, filter_singleton=True)
    counts = km_all.dense().sum(axis=0)
    assert km_filt.n_kmers == int((counts != 1).sum())
    kept = [s for s, c in zip(km_all.kmer_strings(), counts) if c != 1]
    assert km_filt.kmer_strings() == kept


def test_tsv_roundtrip(genomes_dir, tmp_path):
    gdir, contigs_by_genome = genomes_dir
    k = 9
    gks = [
        count_fasta(gdir / ("%s.fna" % gid), k, genome_id=gid)
        for gid in sorted(contigs_by_genome)
    ]
    km = build_presence_matrix(gks)
    out = tmp_path / "matrix.tsv"
    matrix_to_tsv(km, out)
    ids, kstrings, dense = read_matrix_tsv(out)
    assert ids == km.genome_ids
    assert kstrings == km.kmer_strings()
    np.testing.assert_array_equal(dense, km.dense())


def test_counts_tsv(tmp_path, rng):
    k = 7
    contigs = _random_genome(rng, 1, 60, 80)
    _write_fasta(tmp_path / "g.fna", contigs)
    g = count_fasta(tmp_path / "g.fna", k, keep_counts=True)
    out = tmp_path / "counts.tsv"
    counts_to_tsv(g, out)
    lines = [l.split("\t") for l in open(out).read().splitlines()]
    assert [l[0] for l in lines] == canonical_kmers_brute(contigs, k)
    assert all(int(l[1]) >= 1 for l in lines)


def test_reads_mode_abundance_filter(tmp_path, rng):
    k = 5
    read = "".join(rng.choice(list("ACGT"), 60))
    rdir = tmp_path / "reads"
    os.makedirs(rdir)
    # One read appearing twice, another once -> kmers unique to read2 have count 1
    with open(rdir / "a.fastq", "w") as f:
        for name, seq in [("r1", read), ("r2", read)]:
            f.write("@%s\n%s\n+\n%s\n" % (name, seq, "I" * len(seq)))
    other = "".join(rng.choice(list("ACGT"), 60))
    with gzip.open(rdir / "b.fastq.gz", "wt") as f:
        f.write("@r3\n%s\n+\nIIII\n" % other)

    g1 = count_reads_dir(rdir, k, abundance_min=1)
    g2 = count_reads_dir(rdir, k, abundance_min=2)
    assert g2.n_kmers <= g1.n_kmers
    assert set(decode_kmers(g2.kmers, k)) <= set(decode_kmers(g1.kmers, k))
    # every kmer of the duplicated read must survive abundance_min=2
    dup_kmers = set(canonical_kmers_brute([read], k))
    assert dup_kmers <= set(decode_kmers(g2.kmers, k))


def test_mismatched_k_raises(genomes_dir):
    tmp_path, contigs_by_genome = genomes_dir
    gids = sorted(contigs_by_genome)[:2]
    a = count_fasta(tmp_path / ("%s.fna" % gids[0]), 11, genome_id=gids[0])
    b = count_fasta(tmp_path / ("%s.fna" % gids[1]), 13, genome_id=gids[1])
    with pytest.raises(ValueError):
        build_presence_matrix([a, b])
