"""In-process CLI unit tests (grammar parsing, option handling)."""

import numpy as np
import pytest

from grm_tpu.cli import _parse_class_importances


def test_class_importance_grammar_per_class():
    out = _parse_class_importances(
        ["res:", "1.0", "2.0", "sus:", "0.5"], ["res", "sus"]
    )
    assert out == [{0: 1.0, 1: 0.5}, {0: 2.0, 1: 0.5}]


def test_class_importance_grammar_cartesian():
    out = _parse_class_importances(
        ["a:", "1", "2", "b:", "3", "4"], ["a", "b"]
    )
    assert len(out) == 4
    assert {0: 2.0, 1: 4.0} in out


def test_class_importance_unknown_class_exits(capsys):
    with pytest.raises(SystemExit):
        _parse_class_importances(["a:", "1", "zzz:", "2"], ["a", "b"])


def test_class_importance_missing_class_exits():
    with pytest.raises(SystemExit):
        _parse_class_importances(["a:", "1"], ["a", "b"])


def test_class_importance_bad_value_exits():
    with pytest.raises(SystemExit):
        _parse_class_importances(["a:", "x", "b:", "1"], ["a", "b"])


def test_class_importance_empty_class_exits():
    with pytest.raises(SystemExit):
        _parse_class_importances(["a:", "b:", "1"], ["a", "b"])


def test_parse_survey_conf(tmp_path):
    """Reference survey.conf grammar (src/app.py:3812-3835) round-trips."""
    from grm_tpu.kmer.matrix import parse_survey_conf

    conf = tmp_path / "survey.conf"
    conf.write_text(
        "-k 31\n-run-surveyor\n-output /data/out/survey.res\n"
        "-write-kmer-matrix\n"
        "-read-sample-assembly g1 /data/g1.fna\n"
        "-read-sample-assembly g2 /data/g2.fna\n"
    )
    k, pairs, output = parse_survey_conf(conf)
    assert k == 31
    assert pairs == [("g1", "/data/g1.fna"), ("g2", "/data/g2.fna")]
    assert output == "/data/out/survey.res"

    bad = tmp_path / "bad.conf"
    bad.write_text("-run-surveyor\n")
    import pytest

    with pytest.raises(ValueError):
        parse_survey_conf(bad)


def test_settings_persistence_roundtrip(tmp_path, monkeypatch, capsys):
    """The GUI settings store's headless contract (src/app.py:62-64,
    213-223): JSON at a persisted path, defaults on missing/corrupt file,
    collect amr falls back to the stored amr_database."""
    from grm_tpu import cli
    from grm_tpu.settings import load_settings

    monkeypatch.setenv("GRM_SETTINGS_PATH", str(tmp_path / "settings.json"))
    # Defaults with no file.
    s = load_settings()
    assert s["general"]["amr_date"] == "0000-00-00 00:00:00"

    cli._cmd_settings_set(["amr_database", "/data/PATRIC_genomes_AMR.txt"])
    capsys.readouterr()
    cli._cmd_settings_get(["amr_database"])
    assert capsys.readouterr().out.strip() == "/data/PATRIC_genomes_AMR.txt"
    cli._cmd_settings_show([])
    out = capsys.readouterr().out
    assert "amr_database" in out and "settings.json" in out

    # Corrupt file falls back to defaults silently.
    (tmp_path / "settings.json").write_text("{not json")
    assert load_settings()["general"]["amr_date"] == "0000-00-00 00:00:00"


def test_collect_amr_uses_persisted_database(tmp_path, monkeypatch, capsys):
    from grm_tpu import cli

    monkeypatch.setenv("GRM_SETTINGS_PATH", str(tmp_path / "settings.json"))
    amr = tmp_path / "PATRIC_genomes_AMR.txt"
    with open(amr, "w") as f:
        f.write("genome_id\tgenome_name\tantibiotic\tresistant_phenotype\t"
                "measurement\tmeasurement_unit\n")
        for i in range(3):
            f.write("1.%d\tEscherichia coli\tampicillin\tResistant\t8\tmg/L\n" % i)
    # First invocation persists the path...
    cli._cmd_collect_amr(["--amr-metadata", str(amr)])
    capsys.readouterr()
    # ...second invocation finds it without --amr-metadata.
    cli._cmd_collect_amr([])
    assert "Total: 3" in capsys.readouterr().out
