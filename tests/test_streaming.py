"""Out-of-core StreamingBitMatrix vs resident BitMatrix."""

import numpy as np
import pytest

from grm_tpu.ops.popcount import BitMatrix, StreamingBitMatrix
from grm_tpu.utils import pack_binary_bytes_to_ints


def test_streaming_matches_resident(rng):
    n_genomes, n_kmers = 90, 5000
    dense = (rng.rand(n_genomes, n_kmers) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    resident = BitMatrix(packed, n_genomes)
    streaming = StreamingBitMatrix(packed, n_genomes, block_cols=1024)

    rows_a = rng.choice(n_genomes, 30, replace=False)
    rows_b = rng.choice(n_genomes, 11, replace=False)
    np.testing.assert_array_equal(
        streaming.presence_counts([rows_a, rows_b]),
        resident.presence_counts([rows_a, rows_b]),
    )
    np.testing.assert_array_equal(
        streaming.sum_rows(rows_a), resident.sum_rows(rows_a)
    )
    assert streaming.shape == resident.shape


def test_dataset_auto_streams_large_matrices(tmp_path, rng, monkeypatch):
    """A tiny memory budget forces the streaming variant; results identical."""
    from grm_tpu.dataset import GrmDataset, from_contigs
    from grm_tpu.dataset.split import split_with_proportion

    lines_c, lines_m = [], []
    for i in range(8):
        gid = "s%d" % i
        p = tmp_path / (gid + ".fna")
        p.write_text(">c\n%s\n" % "".join(rng.choice(list("ACGT"), 300)))
        lines_c.append("%s\t%s" % (gid, p))
        lines_m.append("%s\t%d" % (gid, i % 2))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds_path = tmp_path / "d.h5"
    from_contigs(tmp_path / "c.tsv", ds_path, kmer_size=11,
                 phenotype_description="t",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)

    monkeypatch.setenv("GRM_HBM_BUDGET_BYTES", "1024")  # absurdly small
    ds = GrmDataset(ds_path)
    bm = ds.bit_matrix()
    assert isinstance(bm, StreamingBitMatrix)

    # host-engine learning over the streaming matrix end-to-end
    split_with_proportion(ds_path, "s", train_prop=0.75, random_seed=2, n_folds=2)
    from grm_tpu.learning.experiments import learn_SCM

    out = learn_SCM(dataset_file=ds_path, split_name="s",
                    model_type="conjunction", p=[1.0], max_rules=2,
                    parameter_selection="none", random_seed=0)
    assert out[2]["risk"][0] <= 0.5

    # The EXACT device engine streams column chunks past the budget —
    # identical results, no fallback warning; only the fused argmax
    # engine still falls back to the host engine.
    warnings = []
    out_dev = learn_SCM(dataset_file=ds_path, split_name="s",
                        model_type="conjunction", p=[1.0], max_rules=2,
                        parameter_selection="none", random_seed=0,
                        engine="device", warning_callback=warnings.append)
    assert not any("falling back" in w for w in warnings)
    assert [str(r) for r in out[4].rules] == [str(r) for r in out_dev[4].rules]

    warnings_am = []
    out_am = learn_SCM(dataset_file=ds_path, split_name="s",
                       model_type="conjunction", p=[1.0], max_rules=2,
                       parameter_selection="none", random_seed=0,
                       engine="device-argmax",
                       warning_callback=warnings_am.append)
    assert any("falling back" in w for w in warnings_am)
    assert [str(r) for r in out[4].rules] == [str(r) for r in out_am[4].rules]

    from grm_tpu.learning.experiments import learn_CART

    warnings_cart = []
    cart_out = learn_CART(dataset_file=ds_path, split_name="s",
                          criterion="gini", max_depth=2, min_samples_split=2,
                          class_importance={0: 1.0, 1: 1.0},
                          parameter_selection="bound", bound_delta=0.05,
                          bound_max_genome_size=1000, engine="device",
                          warning_callback=warnings_cart.append)
    assert not any("falling back" in w for w in warnings_cart)
    assert cart_out[3]["risk"][0] <= 1.0

    monkeypatch.delenv("GRM_HBM_BUDGET_BYTES")
    ds2 = GrmDataset(ds_path)
    assert isinstance(ds2.bit_matrix(), BitMatrix)
    out2 = learn_SCM(dataset_file=ds_path, split_name="s",
                     model_type="conjunction", p=[1.0], max_rules=2,
                     parameter_selection="none", random_seed=0)
    assert [str(r) for r in out[4].rules] == [str(r) for r in out2[4].rules]
