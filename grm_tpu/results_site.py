"""Results-site emission: aggregate learn runs into the published schema.

The reference bundles a static results viewer (``page/``) fed by
``results/summary.json`` (one row of mean-over-repeats metrics per dataset,
``page/index.html:77``) and per-dataset ``overview.json`` / ``model.json`` /
``repeats.json`` (``page/details.html:485-520``). This module reproduces
those artifacts from a collection of `grm learn` output directories so the
analysis capability survives without the embedded WebView2 browser: the
emitted JSON is schema-compatible and a minimal standalone HTML index is
generated alongside it.
"""

from __future__ import annotations

import html
import json
import os

import numpy as np

__all__ = ["aggregate_runs", "write_site"]

_METRIC_KEYS = [
    "risk", "sensitivity", "specificity", "precision", "recall", "f1_score",
    "tp", "tn", "fp", "fn",
]


def _one_repeat_row(results, species, antibiotic):
    """One repeats.json row from a results.json payload."""
    test = results["metrics"]["test"] or {}
    row = {
        "antibiotic": antibiotic,
        "species": species,
        "n_rules": results["model"]["n_rules"],
        "running_time": results.get("running_time", 0),
    }
    for key in _METRIC_KEYS:
        if key in test:
            value = test[key][0]
            row[key] = None if value is None else float(value)
    n_train = len(results["classifications"].get("train_correct", [])) + len(
        results["classifications"].get("train_errors", [])
    )
    n_test = len(results["classifications"].get("test_correct", [])) + len(
        results["classifications"].get("test_errors", [])
    )
    row["ds_n_train_examples"] = n_train
    row["ds_n_test_examples"] = n_test
    row["ds_n_examples"] = n_train + n_test
    return row


def aggregate_runs(runs, out_dir):
    """Aggregate learn output dirs into summary.json + per-dataset files.

    ``runs``: list of dicts {species, antibiotic, results_dir} where
    results_dir contains a results.json written by :mod:`grm_tpu.reports`.
    Repeats of the same (species, antibiotic) are averaged like the
    reference's mean-over-repeats summary rows.
    """
    by_dataset = {}
    for run in runs:
        species = run["species"]
        antibiotic = run["antibiotic"]
        ds_full_name = "%s___%s" % (
            antibiotic.lower().replace(" ", "_"),
            species.lower().replace(" ", "_"),
        )
        with open(os.path.join(run["results_dir"], "results.json")) as f:
            results = json.load(f)
        entry = by_dataset.setdefault(
            ds_full_name,
            {"species": species, "antibiotic": antibiotic, "repeats": [],
             "models": []},
        )
        entry["repeats"].append(_one_repeat_row(results, species, antibiotic))
        entry["models"].append(results["model"])

    summary = []
    datasets_dir = os.path.join(out_dir, "datasets")
    os.makedirs(datasets_dir, exist_ok=True)
    for ds_full_name, entry in sorted(by_dataset.items()):
        repeats = entry["repeats"]
        row = {
            "antibiotic": entry["antibiotic"].title(),
            "species": entry["species"].title(),
            "ds_full_name": ds_full_name,
        }
        numeric_keys = set()
        for r in repeats:
            numeric_keys.update(
                k for k, v in r.items() if isinstance(v, (int, float))
            )
        for key in sorted(numeric_keys):
            values = [r[key] for r in repeats
                      if isinstance(r.get(key), (int, float))]
            if values:
                row[key] = round(float(np.mean(values)), 4)
        summary.append(row)

        ds_dir = os.path.join(datasets_dir, ds_full_name)
        os.makedirs(ds_dir, exist_ok=True)
        with open(os.path.join(ds_dir, "repeats.json"), "w") as f:
            json.dump(repeats, f)
        with open(os.path.join(ds_dir, "overview.json"), "w") as f:
            json.dump(
                [{
                    "mean_risk": row.get("risk"),
                    "mean_sensitivity": row.get("sensitivity"),
                    "mean_specificity": row.get("specificity"),
                    "running_time": row.get("running_time"),
                    "ds_n_genomes": row.get("ds_n_examples"),
                }],
                f,
            )
        # model.json from the first repeat's model (reference shows one).
        with open(os.path.join(ds_dir, "model.json"), "w") as f:
            json.dump(entry["models"][0], f)

    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


_INDEX_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>GRM-TPU results</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid #ccc; padding: 4px 10px; text-align: right; }}
th {{ background: #f0f0f0; }}
td:first-child, td:nth-child(2) {{ text-align: left; }}
</style></head><body>
<h1>GRM-TPU learning results</h1>
<p>{n} datasets (mean over repeats)</p>
<table>
<tr><th>Species</th><th>Antibiotic</th><th>Error rate</th><th>Sensitivity</th>
<th>Specificity</th><th>F1</th><th>Rules</th><th>Time (s)</th></tr>
{rows}
</table></body></html>
"""


def write_site(runs, out_dir):
    """Aggregate + emit a browsable static index.html (WebView2 replacement)."""
    summary = aggregate_runs(runs, out_dir)
    rows = []
    for r in summary:
        rows.append(
            "<tr><td>%s</td><td>%s</td><td>%s</td><td>%s</td><td>%s</td>"
            "<td>%s</td><td>%s</td><td>%s</td></tr>"
            % tuple(
                html.escape(str(r.get(k, "")))
                for k in ["species", "antibiotic", "risk", "sensitivity",
                          "specificity", "f1_score", "n_rules", "running_time"]
            )
        )
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(_INDEX_TEMPLATE.format(n=len(summary), rows="\n".join(rows)))
    return summary
