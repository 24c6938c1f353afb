"""Multiclass CART end-to-end over the HDF5 artifact (reference parity:
SCM rejects multiclass, CART supports it with confusion-matrix metrics)."""

import numpy as np
import pytest

from grm_tpu.dataset import GrmDataset, from_contigs
from grm_tpu.dataset.split import split_with_proportion
from grm_tpu.learning.experiments import learn_CART, learn_SCM


@pytest.fixture
def multiclass_dataset(tmp_path, rng):
    """3 classes, each tagged by its own planted marker."""
    k = 13
    markers = {
        "high": "ACGGTTACCGGAATTCCGGATCCA",
        "low": "TTGGCCAATTGGCCAATTGGAGCT",
        "mid": "GGATATCCGGATATCCAAGCTTGG",
    }
    lines_c, lines_m = [], []
    class_names = sorted(markers)
    for i in range(18):
        gid = "mc%02d" % i
        cls = class_names[i % 3]
        bg = "".join(rng.choice(list("ACGT"), 400))
        seq = bg[:200] + markers[cls] + bg[200:]
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % seq)
        lines_c.append("%s\t%s" % (gid, p))
        lines_m.append("%s\t%s" % (gid, cls))
    (tmp_path / "c.tsv").write_text("\n".join(lines_c) + "\n")
    (tmp_path / "m.tsv").write_text("\n".join(lines_m) + "\n")
    ds = tmp_path / "mc.h5"
    from_contigs(tmp_path / "c.tsv", ds, kmer_size=k,
                 phenotype_description="mic level",
                 phenotype_metadata_path=tmp_path / "m.tsv", gzip=0)
    split_with_proportion(ds, "s", train_prop=0.7, random_seed=3, n_folds=2)
    return ds


def test_dataset_is_multiclass(multiclass_dataset):
    ds = GrmDataset(multiclass_dataset)
    assert ds.classification_type == "multiclass"
    assert list(ds.phenotype.tags) == ["high", "low", "mid"]
    assert set(ds.phenotype.metadata) == {0, 1, 2}


def test_learn_cart_multiclass(multiclass_dataset):
    out = learn_CART(
        dataset_file=multiclass_dataset, split_name="s", criterion="gini",
        max_depth=4, min_samples_split=2,
        class_importance={0: 1.0, 1: 1.0, 2: 1.0},
        parameter_selection="cv",
    )
    best_hps, score, train_m, test_m, model, imp, equiv, cls = out
    assert train_m["risk"][0] == 0.0
    assert test_m["risk"][0] == 0.0
    cm = np.array(test_m["confusion_matrix"][0])
    assert cm.shape == (3, 3)
    assert cm.sum() == len(cls["test_correct"]) + len(cls["test_errors"])
    assert np.trace(cm) == cm.sum()  # perfect separation
    # Tree needs >= 2 internal rules to split 3 classes.
    assert len(model.decision_tree.rules) >= 2


def test_multiclass_cart_report(multiclass_dataset, tmp_path):
    from grm_tpu.reports import write_cart_outputs

    out = learn_CART(
        dataset_file=multiclass_dataset, split_name="s", criterion="gini",
        max_depth=4, min_samples_split=2,
        class_importance={0: 1.0, 1: 1.0, 2: 1.0},
        parameter_selection="cv",
    )
    best_hps, score, train_m, test_m, model, imp, equiv, cls = out
    report = write_cart_outputs(
        output_dir=tmp_path / "out", dataset=GrmDataset(multiclass_dataset),
        split_name="s", config={"hp_choice": "cv", "criterion": ["gini"],
                                "max_depth": [4]},
        best_hp=best_hps, best_hp_score=score, train_metrics=train_m,
        test_metrics=test_m, model=model, rule_importances=imp,
        equivalent_rules=equiv, classifications=cls, running_time_seconds=1.0,
        classification_type="multiclass",
    )
    assert "Confusion Matrix" in report
    assert "high" in report and "mid" in report


def test_learn_cart_multiclass_device_engines(multiclass_dataset):
    """Multiclass (3-class) trees from the device engine — single-device and
    column-sharded — match the host engine."""
    from grm_tpu.parallel.mesh import make_mesh

    kwargs = dict(dataset_file=multiclass_dataset, split_name="s",
                  criterion="gini", max_depth=4, min_samples_split=2,
                  class_importance={0: 1.0, 1: 1.0, 2: 1.0},
                  parameter_selection="cv")
    host = learn_CART(engine="host", **kwargs)
    dev = learn_CART(engine="device", **kwargs)
    shd = learn_CART(engine="device", mesh=make_mesh(8), **kwargs)
    assert str(host[4]) == str(dev[4]) == str(shd[4])
    assert host[3]["risk"] == dev[3]["risk"] == shd[3]["risk"]
    assert dev[3]["risk"][0] == 0.0
