"""Quickstart: synthetic AMR dataset -> SCM + CART models, two ways.

Run from the repo root:

    python examples/quickstart.py [workdir]

Generates 20 synthetic genomes where "resistant" isolates carry a planted
marker sequence, then:

1. the artifact workflow (library equivalents of the `grm` CLI commands):
   dataset create -> split -> learn scm / learn tree with reports;
2. the in-memory pipeline: contigs -> matrix -> fused device SCM fit.
"""

import os
import sys
import tempfile

import numpy as np


def make_genomes(workdir, n=20, genome_len=2000, seed=0):
    marker = "GGATCCGTTAACCGGTATTACGCATGCAAGCTT"
    rng = np.random.RandomState(seed)
    contig_lines, meta_lines, specs, labels = [], [], [], {}
    for i in range(n):
        gid = "iso%02d" % i
        resistant = i % 2 == 1
        bg = "".join(rng.choice(list("ACGT"), genome_len))
        seq = bg[: genome_len // 2] + (marker if resistant else "") + bg[genome_len // 2:]
        path = os.path.join(workdir, gid + ".fna")
        with open(path, "w") as f:
            f.write(">contig1\n%s\n" % seq)
        contig_lines.append("%s\t%s" % (gid, path))
        meta_lines.append("%s\t%s" % (gid, "resistant" if resistant else "susceptible"))
        specs.append((gid, path))
        labels[gid] = int(resistant)
    contigs_tsv = os.path.join(workdir, "contigs.tsv")
    meta_tsv = os.path.join(workdir, "meta.tsv")
    open(contigs_tsv, "w").write("\n".join(contig_lines) + "\n")
    open(meta_tsv, "w").write("\n".join(meta_lines) + "\n")
    return contigs_tsv, meta_tsv, specs, labels


def artifact_workflow(workdir, contigs_tsv, meta_tsv):
    from grm_tpu.dataset import GrmDataset, from_contigs
    from grm_tpu.dataset.split import split_with_proportion
    from grm_tpu.learning.experiments import learn_CART, learn_SCM

    ds_path = os.path.join(workdir, "amr.h5")
    from_contigs(contigs_tsv, ds_path, kmer_size=21,
                 phenotype_description="marker resistance",
                 phenotype_metadata_path=meta_tsv)
    split_with_proportion(ds_path, "demo", train_prop=0.75, random_seed=7,
                          n_folds=2)
    ds = GrmDataset(ds_path)
    print("dataset: %d genomes x %d k-mers (%s)"
          % (ds.genome_count, ds.kmer_count, ds.classification_type))

    hp, score, train_m, test_m, model, *_ = learn_SCM(
        dataset_file=ds_path, split_name="demo",
        model_type=["conjunction", "disjunction"], p=[0.5, 1.0],
        max_rules=3, parameter_selection="cv", random_seed=1,
    )
    print("SCM:", str(model), "| test risk:", test_m["risk"][0])

    hps, score, train_m, test_m, cart_model, *_ = learn_CART(
        dataset_file=ds_path, split_name="demo", criterion="gini",
        max_depth=3, min_samples_split=2, class_importance={0: 1.0, 1: 1.0},
        parameter_selection="cv",
    )
    print("CART rules:", [str(r) for r in cart_model.decision_tree.rules],
          "| test risk:", test_m["risk"][0])


def in_memory_pipeline(specs, labels):
    from grm_tpu.pipeline import InMemoryDataset, train_scm

    ds = InMemoryDataset.from_contigs(specs, labels, k=21)
    result = train_scm(ds, model_type="conjunction", p=1.0, max_rules=3,
                       random_seed=0)
    print("in-memory SCM:", str(result.model),
          "| test risk:", result.test_metrics["risk"][0])


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="grm_demo_")
    os.makedirs(workdir, exist_ok=True)
    print("workdir:", workdir)
    contigs_tsv, meta_tsv, specs, labels = make_genomes(workdir)
    artifact_workflow(workdir, contigs_tsv, meta_tsv)
    in_memory_pipeline(specs, labels)
