"""Dataset artifact creation + split semantics."""

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_contigs, from_tsv
from grm_tpu.dataset.create import parse_metadata
from grm_tpu.dataset.split import split_with_ids, split_with_proportion
from grm_tpu.kmer.counter import count_fasta
from grm_tpu.kmer.matrix import build_presence_matrix, matrix_to_tsv
from grm_tpu.ops.kmer import canonical_kmers_brute
from grm_tpu.utils import unpack_binary_bytes_from_ints


def _write_fasta(path, contigs):
    with open(path, "w") as f:
        for i, c in enumerate(contigs):
            f.write(">c%d\n%s\n" % (i, c))


@pytest.fixture
def small_dataset(tmp_path, rng):
    """A 12-genome contigs dataset with binary phenotype."""
    k = 11
    n_genomes = 12
    contigs_by_genome = {}
    list_lines = []
    for i in range(n_genomes):
        gid = "g%02d" % i
        contigs = ["".join(rng.choice(list("ACGT"), rng.randint(80, 200)))
                   for _ in range(2)]
        p = tmp_path / ("%s.fna" % gid)
        _write_fasta(p, contigs)
        contigs_by_genome[gid] = contigs
        list_lines.append("%s\t%s" % (gid, p))
    contig_list = tmp_path / "contigs.tsv"
    contig_list.write_text("\n".join(list_lines) + "\n")

    metadata = tmp_path / "meta.tsv"
    labels = {gid: ("Resistant" if i % 2 else "Susceptible")
              for i, gid in enumerate(sorted(contigs_by_genome))}
    metadata.write_text(
        "".join("%s\t%s\n" % (g, l) for g, l in labels.items())
    )

    ds_path = tmp_path / "data.h5"
    from_contigs(
        contig_list, ds_path, kmer_size=k,
        phenotype_description="test resistance",
        phenotype_metadata_path=metadata, gzip=0,
    )
    return ds_path, contigs_by_genome, labels, k


def test_create_from_contigs(small_dataset):
    ds_path, contigs_by_genome, labels, k = small_dataset
    ds = GrmDataset(ds_path)
    assert ds.genome_count == 12
    assert ds.kmer_length == k
    assert ds.classification_type == "binary"
    assert ds.phenotype.description == "test resistance"
    assert list(ds.phenotype.tags) == ["Resistant", "Susceptible"]

    # Genomes sorted by label: Resistant (label 0) genomes first.
    ids = ds.genome_identifiers
    y = ds.phenotype.metadata
    assert (np.diff(y) >= 0).all()
    for gid, label in zip(ids, y):
        assert labels[gid] == ("Resistant" if label == 0 else "Susceptible")

    # Matrix presence matches brute force per genome.
    kseqs = [s.decode() for s in ds.kmer_sequences]
    union = sorted(set().union(*(set(canonical_kmers_brute(c, k))
                                 for c in contigs_by_genome.values())))
    assert kseqs == union
    dense = unpack_binary_bytes_from_ints(ds.kmer_matrix_u64())[: ds.genome_count]
    for i, gid in enumerate(ids):
        present = set(canonical_kmers_brute(contigs_by_genome[gid], k))
        np.testing.assert_array_equal(
            dense[i], np.array([s in present for s in union], np.uint8)
        )


def test_create_all_kmers_filtered_is_clean_error(tmp_path, rng):
    """Singleton filter removing every k-mer must raise a clear ValueError,
    not an h5py chunk-shape crash (zero-column matrix)."""
    list_lines = []
    for i in range(3):
        gid = "g%d" % i
        p = tmp_path / ("%s.fna" % gid)
        _write_fasta(p, ["".join(rng.choice(list("ACGT"), 120))])
        list_lines.append("%s\t%s" % (gid, p))
    contig_list = tmp_path / "contigs.tsv"
    contig_list.write_text("\n".join(list_lines) + "\n")
    metadata = tmp_path / "meta.tsv"
    metadata.write_text("g0\t0\ng1\t1\ng2\t1\n")
    with pytest.raises(ValueError, match="No k-mers remain"):
        from_contigs(
            contig_list, tmp_path / "empty.h5", kmer_size=31,
            filter_singleton=True, phenotype_description="d",
            phenotype_metadata_path=metadata, gzip=0,
        )


def test_parse_metadata_multiclass(tmp_path):
    m = tmp_path / "meta.tsv"
    m.write_text("g1\thigh\ng2\tlow\ng3\tmid\ng4\thigh\n")
    ids, labels, tags, ctype = parse_metadata(m, ["g1", "g2", "g3", "g4"])
    assert ctype == "multiclass"
    assert list(tags) == ["high", "low", "mid"]
    np.testing.assert_array_equal(labels, [0, 1, 2, 0])


def test_parse_metadata_binary_01_passthrough(tmp_path):
    m = tmp_path / "meta.tsv"
    m.write_text("g1\t1\ng2\t0\n")
    ids, labels, tags, ctype = parse_metadata(m, ["g1", "g2"])
    assert ctype == "binary"
    np.testing.assert_array_equal(labels, [1, 0])


def test_parse_metadata_discards_missing(tmp_path):
    m = tmp_path / "meta.tsv"
    m.write_text("g1\tA\ng2\tB\ngX\tA\n")
    warnings = []
    ids, labels, tags, ctype = parse_metadata(
        m, ["g1", "g2", "g3"], warning_callback=warnings.append
    )
    assert list(ids) == ["g1", "g2"]
    assert len(warnings) == 2  # one for g3 (no metadata), one for gX (no data)


def test_split_with_proportion(small_dataset):
    ds_path, _, _, _ = small_dataset
    split_with_proportion(ds_path, "s1", train_prop=0.75, random_seed=7, n_folds=3)
    ds = GrmDataset(ds_path)
    sp = ds.get_split("s1")
    assert len(sp.train_genome_idx) == 9
    assert len(sp.test_genome_idx) == 3
    assert sp.random_seed == 7
    assert len(sp.folds) == 3
    # folds partition the training set
    all_fold_test = np.sort(np.concatenate([f.test_genome_idx for f in sp.folds]))
    np.testing.assert_array_equal(all_fold_test, np.sort(sp.train_genome_idx))
    # RNG parity: reference uses RandomState(seed).shuffle(arange(n))
    check = np.arange(12)
    np.random.RandomState(7).shuffle(check)
    np.testing.assert_array_equal(np.sort(check[:9]), sp.train_genome_idx)


def test_split_risk_tables(small_dataset):
    ds_path, _, _, _ = small_dataset
    split_with_proportion(ds_path, "s2", train_prop=0.8, random_seed=3, n_folds=0)
    ds = GrmDataset(ds_path)
    sp = ds.get_split("s2")
    # recompute risks densely
    y = ds.phenotype.metadata
    dense = unpack_binary_bytes_from_ints(ds.kmer_matrix_u64())[: ds.genome_count]
    tr = sp.train_genome_idx
    pos, neg = tr[y[tr] == 1], tr[y[tr] == 0]
    risks = (len(pos) - dense[pos].sum(0) + dense[neg].sum(0)) / len(tr)
    risks = np.round(risks, 5)
    np.testing.assert_allclose(sp.unique_risks[sp.unique_risk_by_kmer], risks)
    anti = np.round(1.0 - risks, 5)
    np.testing.assert_allclose(sp.unique_risks[sp.unique_risk_by_anti_kmer], anti)


def test_split_validation_errors(small_dataset):
    ds_path, _, _, _ = small_dataset
    split_with_proportion(ds_path, "dup", train_prop=0.5, random_seed=1)
    with pytest.raises(Exception, match="already exists"):
        split_with_proportion(ds_path, "dup", train_prop=0.5, random_seed=1)
    with pytest.raises(Exception, match="folds"):
        split_with_proportion(ds_path, "bad", train_prop=0.5, random_seed=1, n_folds=1)


def test_split_with_ids(small_dataset, tmp_path):
    ds_path, _, _, _ = small_dataset
    ds = GrmDataset(ds_path)
    ids = list(ds.genome_identifiers)
    (tmp_path / "train.txt").write_text("\n".join(ids[:8]) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(ids[8:]) + "\n")
    split_with_ids(ds_path, "byid", tmp_path / "train.txt", tmp_path / "test.txt",
                   random_seed=11, n_folds=2)
    sp = ds.get_split("byid")
    np.testing.assert_array_equal(sp.train_genome_idx, np.arange(8))
    np.testing.assert_array_equal(sp.test_genome_idx, np.arange(8, 12))


def test_from_tsv_matches_from_contigs(small_dataset, tmp_path):
    """from_tsv over the exported matrix reproduces the same packed matrix."""
    ds_path, contigs_by_genome, labels, k = small_dataset
    ds = GrmDataset(ds_path)

    from grm_tpu.kmer.counter import GenomeKmers

    km = build_presence_matrix([
        GenomeKmers(gid, k, count_fasta_to_kmers(contigs_by_genome[gid], k))
        for gid in sorted(contigs_by_genome)
    ])
    tsv = tmp_path / "m.tsv"
    matrix_to_tsv(km, tsv)

    meta = tmp_path / "meta2.tsv"
    meta.write_text("".join("%s\t%s\n" % (g, l) for g, l in labels.items()))
    out = tmp_path / "tsv.h5"
    from_tsv(tsv, out, phenotype_description="test resistance",
             phenotype_metadata_path=meta, gzip=0)
    ds2 = GrmDataset(out)
    assert list(ds2.genome_identifiers) == list(ds.genome_identifiers)
    np.testing.assert_array_equal(ds2.kmer_matrix_u64(), ds.kmer_matrix_u64())
    np.testing.assert_array_equal(ds2.phenotype.metadata, ds.phenotype.metadata)


def count_fasta_to_kmers(contigs, k):
    from grm_tpu.ops.kmer import encode_contigs, sorted_kmers_np

    return sorted_kmers_np(encode_contigs(contigs), k)
