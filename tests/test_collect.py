"""AMR metadata filtering vs the reference GUI's semantics."""

import os

import numpy as np
import pandas as pd
import pytest

from grm_tpu.collect.amr import AmrDatabase, sanitize_filename


@pytest.fixture
def amr_file(tmp_path):
    rows = [
        # genome_id, genome_name, antibiotic, phenotype, measurement, unit
        ("1.1", "Escherichia coli K12", "ampicillin", "Resistant", "8", "mg/L"),
        ("1.1", "Escherichia coli K12", "ampicillin", "Resistant", "8", "mg/L"),  # dup
        ("1.2", "escherichia COLI xyz", "ampicillin", "Susceptible", "1", "mg/L"),
        ("1.3", "[Escherichia] coli", "ampicillin", "Intermediate", "4", "mg/L"),
        ("1.4", "Escherichia coli", "ampicillin", "Resistant", "20", "mm"),  # mm drop
        ("1.5", "Staphylococcus aureus", "methicillin", "Resistant", "16", "mg/L"),
        ("1.5", "Staphylococcus aureus", "methicillin", "Susceptible", "1", "mg/L"),  # contradiction
        ("1.6", "Staphylococcus aureus", "methicillin", "Susceptible", "0.5", "mg/L"),
        ("1.7", "Klebsiella pneumoniae", "gentamicin", "Resistant", "", "mg/L"),  # empty
    ]
    p = tmp_path / "PATRIC_genomes_AMR.txt"
    with open(p, "w") as f:
        f.write("genome_id\tgenome_name\tantibiotic\tresistant_phenotype\t"
                "measurement\tmeasurement_unit\textra_col\n")
        for r in rows:
            f.write("\t".join(r) + "\textra\n")
    return p


def test_load_cleaning(amr_file):
    db = AmrDatabase.load(amr_file)
    # dup removed, mm removed, empty-measurement removed
    assert len(db.frame) == 6
    # name normalization: two lowercase words, brackets stripped
    assert set(db.frame["genome_name"]) == {
        "escherichia coli", "staphylococcus aureus"}
    # measurement merged with unit
    assert (db.frame["measurement"].str.endswith("mg/L")).all()


def test_select_filters(amr_file):
    db = AmrDatabase.load(amr_file)
    data = db.select(species="escherichia coli", antibiotic="ampicillin")
    assert set(data["genome_id"]) == {"1.1", "1.2", "1.3"}

    data = db.select(species="escherichia coli", antibiotic="ampicillin",
                     drop_intermediate=True)
    assert set(data["genome_id"]) == {"1.1", "1.2"}

    # contradiction filter drops genome 1.5 (Resistant+Susceptible rows)
    data = db.select(species="staphylococcus aureus", antibiotic="methicillin",
                     filter_contradictions=True)
    assert set(data["genome_id"]) == {"1.6"}


def test_numeric_phenotypes(amr_file):
    db = AmrDatabase.load(amr_file)
    data = db.select(species="escherichia coli", antibiotic="ampicillin",
                     numeric_phenotypes=True)
    by_id = dict(zip(data["genome_id"], data["resistant_phenotype"]))
    assert by_id == {"1.1": 1, "1.2": 0, "1.3": 2}


def test_dataset_list_group_filter(tmp_path):
    rows = []
    for i in range(60):
        rows.append(("2.%d" % i, "Big species", "drugA",
                     "Resistant" if i < 55 else "Susceptible", "8", "mg/L"))
    for i in range(120):
        rows.append(("3.%d" % i, "Good species", "drugB",
                     "Resistant" if i < 60 else "Susceptible", "8", "mg/L"))
    p = tmp_path / "amr.txt"
    with open(p, "w") as f:
        f.write("genome_id\tgenome_name\tantibiotic\tresistant_phenotype\t"
                "measurement\tmeasurement_unit\n")
        for r in rows:
            f.write("\t".join(r) + "\n")
    db = AmrDatabase.load(p)
    full = db.dataset_list()
    assert len(full) == 2
    filtered = db.dataset_list(min_group_count=50)
    # "Big species" has only 5 susceptible -> filtered out
    assert filtered.values.tolist() == [["good species", "drugB"]]


def test_export_files(amr_file, tmp_path):
    db = AmrDatabase.load(amr_file)
    data = db.select(species="escherichia coli", antibiotic="ampicillin",
                     drop_intermediate=True, numeric_phenotypes=True)
    folder = db.export(data, tmp_path / "out", "escherichia coli", "ampicillin")
    base = "escherichia_coli_ampicillin"
    for suffix in ["_full.tsv", "_phenotype_metadata.tsv", "_id_name.tsv",
                   "_description.tsv"]:
        assert os.path.exists(os.path.join(folder, base + suffix))
    # phenotype metadata: genome_id<TAB>label, no header
    lines = open(os.path.join(folder, base + "_phenotype_metadata.tsv")).read().splitlines()
    assert sorted(l.split("\t")[0] for l in lines) == ["1.1", "1.2"]
    # usable directly as grm dataset create metadata
    labels = {l.split("\t")[0]: l.split("\t")[1] for l in lines}
    assert labels == {"1.1": "1", "1.2": "0"}


def test_sanitize_filename():
    assert sanitize_filename("escherichia coli/k12") == "escherichia_coli_k12"
