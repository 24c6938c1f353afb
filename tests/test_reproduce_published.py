"""Offline tests of the published-result comparison logic
(examples/reproduce_published.py) against fixtures shaped exactly like
the reference's page/results schema (model.json / overview.json /
repeats.json) and this framework's `grm learn scm` results.json."""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.reproduce_published import (canonical_rule_set,
                                          compare_to_published,
                                          load_grm_results, load_published,
                                          parse_rule)

K31A = "A" * 31
K31B = "ACGT" * 7 + "ACG"
K31C = "G" * 31


def _published_fixture(tmp_path, rules, typ, mean_risk=0.16,
                       repeat_risks=(0.12, 0.18)):
    d = tmp_path / "results" / "datasets" / "amik___ab"
    d.mkdir(parents=True)
    (d / "model.json").write_text(json.dumps({
        "rules": rules, "type": typ, "n_rules": len(rules),
        "rule_importances": [0.8] * len(rules),
        "rule_annotations": [{} for _ in rules],
    }))
    (d / "overview.json").write_text(json.dumps([{
        "mean_risk": mean_risk, "mean_sensitivity": 0.86,
        "mean_specificity": 0.75, "ds_n_genomes": 256,
        "ds_n_kmers": 14599054, "running_time": 928.0,
        "ds_n_res": 195, "ds_n_sus": 61,
    }]))
    (d / "repeats.json").write_text(json.dumps([
        {"type": "test", "risk": r, "sensitivity": 0.85 + i * 0.02,
         "specificity": 0.74 + i * 0.02, "n_rules": len(rules),
         "repeat_id": i + 1}
        for i, r in enumerate(repeat_risks)
    ]))
    return tmp_path / "results"


def _grm_results_fixture(tmp_path, rules, typ, risk=0.15, sens=0.86,
                         spec=0.76):
    d = tmp_path / "out"
    d.mkdir(exist_ok=True)
    (d / "results.json").write_text(json.dumps({
        "model": {"rules": rules, "type": typ, "n_rules": len(rules),
                  "rule_importances": [0.9] * len(rules)},
        "metrics": {"test": {"risk": [risk], "sensitivity": [sens],
                             "specificity": [spec]}},
    }))
    return d


def test_parse_rule_and_canonical_set():
    assert parse_rule("Presence(%s)" % K31A) == ("presence", K31A)
    assert parse_rule("Absence(%s)" % K31B) == ("absence", K31B)
    with pytest.raises(ValueError):
        parse_rule("Junk(%s)" % K31A)
    s = canonical_rule_set(["Presence(%s)" % K31A, "Presence(%s)" % K31A])
    assert len(s) == 1


def test_exact_match_reports_ok(tmp_path):
    rules = ["Presence(%s)" % K31A, "Presence(%s)" % K31B]
    root = _published_fixture(tmp_path, rules, "disjunction")
    out = _grm_results_fixture(tmp_path, rules, "disjunction", risk=0.155)
    pub = load_published(str(root), "amik___ab")
    grm = load_grm_results(str(out))
    rep = compare_to_published(grm, pub)
    assert rep["ok"]
    assert rep["rules_exact_match"]
    assert rep["rules_only_published"] == []
    assert rep["rules_only_grm"] == []
    # risk delta 0.155-0.16 = -0.005, within the repeat spread 0.06
    assert rep["metrics"]["risk"]["within_tolerance"]


def test_partial_overlap_and_metric_violation(tmp_path):
    pub_rules = ["Presence(%s)" % K31A, "Presence(%s)" % K31B]
    grm_rules = ["Presence(%s)" % K31A, "Absence(%s)" % K31C]
    root = _published_fixture(tmp_path, pub_rules, "disjunction",
                              mean_risk=0.16, repeat_risks=(0.15, 0.17))
    out = _grm_results_fixture(tmp_path, grm_rules, "disjunction",
                               risk=0.40)
    rep = compare_to_published(load_grm_results(str(out)),
                               load_published(str(root), "amik___ab"))
    assert not rep["rules_exact_match"]
    assert rep["rules_shared"] == ["Presence(%s)" % K31A]
    assert rep["rules_only_published"] == ["Presence(%s)" % K31B]
    assert rep["rules_only_grm"] == ["Absence(%s)" % K31C]
    # risk 0.40 vs mean 0.16 exceeds the 0.02 spread -> not ok
    assert not rep["metrics"]["risk"]["within_tolerance"]
    assert not rep["ok"]


def test_type_mismatch_fails(tmp_path):
    rules = ["Presence(%s)" % K31A]
    root = _published_fixture(tmp_path, rules, "disjunction")
    out = _grm_results_fixture(tmp_path, rules, "conjunction", risk=0.16)
    rep = compare_to_published(load_grm_results(str(out)),
                               load_published(str(root), "amik___ab"))
    assert not rep["type_match"]
    assert not rep["ok"]


def test_compare_against_real_reference_schema():
    """The loader must parse the ACTUAL shipped schema (when the reference
    checkout is present) — guards against schema drift in our fixtures."""
    root = "/root/reference/page/results"
    name = "amikacin___acinetobacter_baumannii"
    if not os.path.isdir(os.path.join(root, "datasets", name)):
        pytest.skip("reference results not available")
    pub = load_published(root, name)
    assert pub["model"]["type"] == "disjunction"
    assert pub["model"]["n_rules"] == len(pub["model"]["rules"]) == 3
    assert all(parse_rule(r)[0] == "presence"
               for r in pub["model"]["rules"])
    assert pub["overview"]["ds_n_genomes"] == 256
    assert len(pub["repeats"]) >= 1
