"""Results-site aggregation + profiling utilities."""

import json
import os

import numpy as np

from grm_tpu.profiling import StageTimer, throughput
from grm_tpu.results_site import aggregate_runs, write_site


def _fake_results_dir(tmp_path, name, risk, n_rules, running_time,
                      sensitivity=0.9):
    d = tmp_path / name
    os.makedirs(d)
    results = {
        "data": {"uuid": "u", "path": "p", "split": "s"},
        "metrics": {
            "train": {"risk": [0.0]},
            "test": {
                "risk": [risk], "sensitivity": [sensitivity],
                "specificity": [0.8],
                "precision": [0.9], "recall": [0.9], "f1_score": [0.9],
                "tp": [9], "tn": [8], "fp": [2], "fn": [1],
            },
        },
        "model": {"n_rules": n_rules, "rules": ["Presence(AAA)"],
                  "rule_importances": [1.0], "equivalent_rule_counts": [7],
                  "type": "conjunction"},
        "classifications": {
            "train_correct": ["g%d" % i for i in range(10)],
            "train_errors": [],
            "test_correct": ["t%d" % i for i in range(17)],
            "test_errors": ["e%d" % i for i in range(3)],
        },
        "running_time": running_time,
    }
    with open(d / "results.json", "w") as f:
        json.dump(results, f)
    with open(d / "model.fasta", "w") as f:
        f.write(">rule-1 presence, importance: 1.00\nAAA\n")
    return str(d)


def test_aggregate_runs_mean_over_repeats(tmp_path):
    runs = [
        {"species": "escherichia coli", "antibiotic": "ampicillin",
         "results_dir": _fake_results_dir(tmp_path, "r1", 0.10, 2, 100)},
        {"species": "escherichia coli", "antibiotic": "ampicillin",
         "results_dir": _fake_results_dir(tmp_path, "r2", 0.20, 4, 200)},
    ]
    out = tmp_path / "site"
    summary = aggregate_runs(runs, out)
    assert len(summary) == 1
    row = summary[0]
    assert row["ds_full_name"] == "ampicillin___escherichia_coli"
    assert row["risk"] == 0.15
    assert row["n_rules"] == 3.0
    assert row["running_time"] == 150.0
    assert row["ds_n_examples"] == 30

    ds_dir = out / "datasets" / "ampicillin___escherichia_coli"
    repeats = json.load(open(ds_dir / "repeats.json"))
    assert len(repeats) == 2
    assert json.load(open(ds_dir / "model.json"))["n_rules"] == 2
    overview = json.load(open(ds_dir / "overview.json"))
    assert overview[0]["mean_risk"] == 0.15
    assert json.load(open(out / "summary.json")) == summary


def test_write_site_html(tmp_path):
    runs = [
        {"species": "klebsiella pneumoniae", "antibiotic": "gentamicin",
         "results_dir": _fake_results_dir(tmp_path, "r", 0.22, 2, 312)},
    ]
    out = tmp_path / "site"
    write_site(runs, out)
    page = open(out / "index.html").read()
    assert "Klebsiella Pneumoniae" in page
    assert "0.22" in page


def test_write_site_details_and_scatter(tmp_path):
    """VERDICT r2 item 5: per-dataset details pages + the SVG scatter
    explorer, browsable for a 3-dataset run."""
    runs = [
        {"species": "escherichia coli", "antibiotic": "ampicillin",
         "results_dir": _fake_results_dir(tmp_path, "a", 0.10, 2, 100,
                                          sensitivity=0.95)},
        {"species": "klebsiella pneumoniae", "antibiotic": "gentamicin",
         "results_dir": _fake_results_dir(tmp_path, "b", 0.22, 3, 312,
                                          sensitivity=0.70)},
        {"species": "enterococcus faecium", "antibiotic": "vancomycin",
         "results_dir": _fake_results_dir(tmp_path, "c", 0.01, 1, 250,
                                          sensitivity=1.0)},
    ]
    out = tmp_path / "site"
    write_site(runs, out)

    index = open(out / "index.html").read()
    assert "<svg" in index  # the explorer panels
    assert index.count('class="pt"') >= 3  # one dot per dataset per panel
    assert "details.html" in index

    for name in ["ampicillin___escherichia_coli",
                 "gentamicin___klebsiella_pneumoniae",
                 "vancomycin___enterococcus_faecium"]:
        ds_dir = out / "datasets" / name
        details = open(ds_dir / "details.html").read()
        assert "Presence(AAA)" in details
        assert "7" in details  # equivalent-rule count
        assert (name + ".fasta") in details
        assert (ds_dir / (name + ".fasta")).exists()
        assert "repeats.json" in details


def test_serve_site_http(tmp_path):
    """The embedded-server role (reference src/app.py:114-122): the emitted
    site is served over HTTP; index and per-dataset JSON both resolve."""
    import urllib.request

    from grm_tpu.results_site import serve_site

    runs = [
        {"species": "escherichia coli", "antibiotic": "ampicillin",
         "results_dir": _fake_results_dir(tmp_path, "r", 0.10, 2, 100)},
    ]
    out = tmp_path / "site"
    write_site(runs, out)

    server = serve_site(str(out), port=0)  # ephemeral port
    import threading

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = "http://127.0.0.1:%d" % server.server_address[1]
        index = urllib.request.urlopen(base + "/index.html", timeout=10).read()
        assert b"<svg" in index
        rep = urllib.request.urlopen(
            base + "/datasets/ampicillin___escherichia_coli/repeats.json",
            timeout=10).read()
        assert len(json.loads(rep)) == 1
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_serve_site_missing_dir(tmp_path):
    import pytest

    from grm_tpu.results_site import serve_site

    with pytest.raises(ValueError):
        serve_site(str(tmp_path / "nope"))


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    with t.stage("a"):
        pass
    assert set(t.stages) == {"a", "b"}
    assert t.total >= 0
    assert "TOTAL" in t.report()


def test_throughput():
    out = throughput(n_kmers=1e6, n_genomes=50, seconds=2.0, n_chips=2)
    assert out["kmers_per_s_per_chip"] == 250000.0
    assert out["genomes_per_s"] == 25.0
