"""PATRIC/BV-BRC AMR phenotype metadata: loading, filtering, export.

Headless re-implementation of the GUI's data-collection AMR tab
(``src/app.py:3430-3810``): the same column set, cleaning rules, group
filters and the four-file TSV export, driving dataset construction instead
of a table widget.

Semantics preserved from the reference:

- genome_name normalized to the first two lower-cased words, brackets
  stripped (app.py:3458-3460);
- duplicate rows dropped; rows with any empty field dropped; disk-diffusion
  rows (measurement_unit == "mm") dropped; measurement and unit merged
  (app.py:3475-3488);
- the "phenotype count >= 50" list filter requires >=50 Resistant AND >=50
  Susceptible rows per (species, antibiotic) group (app.py:3494-3501);
- drop-intermediate keeps only Resistant/Susceptible rows (app.py:3676-3686);
- the contradiction filter drops genomes whose rows disagree on the
  phenotype (app.py:3688-3698);
- the numeric phenotype mask maps Susceptible->0, Resistant->1, other->2
  (app.py:3615-3635);
- export writes ``<base>_full.tsv``, ``<base>_phenotype_metadata.tsv``
  (genome_id -> label, deduplicated, no header), ``<base>_id_name.tsv`` and
  ``<base>_description.tsv`` (app.py:3739-3808).
"""

from __future__ import annotations

import csv
import os
import re

import pandas as pd

__all__ = ["AmrDatabase", "sanitize_filename"]

AMR_COLUMNS = [
    "genome_id",
    "genome_name",
    "antibiotic",
    "resistant_phenotype",
    "measurement",
    "measurement_unit",
]


def sanitize_filename(name):
    return re.sub(r"[^A-Za-z0-9._-]+", "_", name.strip())


def _normalize_genome_name(x):
    return " ".join(str(x).lower().split()[:2]).replace("[", "").replace("]", "")


class AmrDatabase:
    """A loaded, cleaned PATRIC_genomes_AMR.txt table."""

    def __init__(self, frame):
        self.frame = frame

    @classmethod
    def load(cls, path):
        frame = pd.read_csv(
            path,
            sep="\t",
            usecols=AMR_COLUMNS,
            converters={
                "genome_id": str,
                "genome_name": _normalize_genome_name,
                "antibiotic": str,
                "resistant_phenotype": str,
                "measurement": str,
                "measurement_unit": str,
            },
        )
        frame = frame.drop_duplicates()
        mask = pd.Series(True, index=frame.index)
        for col in AMR_COLUMNS:
            mask &= frame[col] != ""
        frame = frame[mask]
        frame = frame[frame["measurement_unit"] != "mm"]
        frame = frame.copy()
        frame["measurement"] = frame["measurement"] + frame["measurement_unit"]
        return cls(frame)

    # -- dataset lists ------------------------------------------------------
    def dataset_list(self, min_group_count=None):
        """(species, antibiotic) pairs; optionally the >=50/50 filter."""
        if min_group_count is None:
            return self.frame[["genome_name", "antibiotic"]].drop_duplicates()
        n = min_group_count
        return (
            self.frame.groupby(["genome_name", "antibiotic"])
            .filter(
                lambda x: (x["resistant_phenotype"] == "Resistant").sum() >= n
                and (x["resistant_phenotype"] == "Susceptible").sum() >= n
            )[["genome_name", "antibiotic"]]
            .drop_duplicates()
        )

    def species(self):
        return sorted(self.frame["genome_name"].unique())

    def antibiotics(self):
        return sorted(self.frame["antibiotic"].unique())

    # -- per-dataset selection ---------------------------------------------
    def select(self, species="All", antibiotic="All", drop_intermediate=False,
               filter_contradictions=False, numeric_phenotypes=False):
        """Rows for one (species, antibiotic) with the reference's filters."""
        data = self.frame
        if antibiotic != "All" and species != "All":
            data = data[(data["antibiotic"] == antibiotic)
                        & (data["genome_name"] == species)]
        elif antibiotic != "All":
            data = data[data["antibiotic"] == antibiotic]
        elif species != "All":
            data = data[data["genome_name"] == species]

        data = data[["genome_id", "genome_name", "resistant_phenotype",
                     "measurement"]]

        if drop_intermediate:
            data = data[
                (data["resistant_phenotype"] == "Resistant")
                | (data["resistant_phenotype"] == "Susceptible")
            ]

        if filter_contradictions:
            data = (
                data.groupby("genome_id")
                .filter(
                    lambda x: not (
                        len(x) > 1 and len(x["resistant_phenotype"].unique()) > 1
                    )
                )
                .reset_index(drop=True)
            )

        if numeric_phenotypes:
            data = self._phenotype_mask(data)
        return data

    @staticmethod
    def _phenotype_mask(data):
        out = data.copy()
        col = "resistant_phenotype"
        # Old pandas allowed ints into a str column; modern dtypes need object.
        out[col] = out[col].astype(object)
        out.loc[~out[col].isin(["Resistant", "Susceptible"]), col] = 2
        out.loc[out[col] == "Susceptible", col] = 0
        out.loc[out[col] == "Resistant", col] = 1
        return out

    # -- export -------------------------------------------------------------
    def export(self, data, out_dir, species, antibiotic):
        """Write the four reference TSVs; returns the dataset directory."""
        species_s = sanitize_filename(species)
        anti_s = sanitize_filename(antibiotic)
        base = "%s_%s" % (species_s, anti_s)
        folder = os.path.join(out_dir, species_s, anti_s)
        os.makedirs(folder, exist_ok=True)

        with open(os.path.join(folder, base + "_full.tsv"), "w", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            w.writerow(data.columns.tolist())
            w.writerows(data.values)

        with open(
            os.path.join(folder, base + "_phenotype_metadata.tsv"), "w", newline=""
        ) as f:
            w = csv.writer(f, delimiter="\t")
            w.writerows(data.iloc[:, [0, 2]].drop_duplicates().values)

        with open(os.path.join(folder, base + "_id_name.tsv"), "w", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            w.writerow(data.columns[:2].tolist())
            w.writerows(data.iloc[:, [0, 1]].values)

        with open(os.path.join(folder, base + "_description.tsv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Species: %s" % species_s])
            w.writerow(["Antibiotics: %s" % anti_s])
        return folder
