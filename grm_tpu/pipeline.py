"""In-memory end-to-end pipeline: contigs -> matrix -> split -> SCM model.

The HDF5 artifact workflow (create / split / learn as separate invocations)
mirrors the reference's checkpointed stages. This module provides the
direct path for production serving and benchmarking: build the presence
matrix in memory (native or device ingest), keep it resident, and train in
one process — no intermediate artifact, minimal host<->device traffic.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil

import numpy as np

from .kmer.counter import GenomeKmers, count_fasta
from .kmer.matrix import KmerMatrix, build_presence_matrix
from .learning.metrics import get_binary_metrics
from .learning.models import ConjunctionModel, DisjunctionModel, KmerRule
from .ops.kmer import decode_kmers
from .ops.popcount import BitMatrix, u64_matrix_to_u32

__all__ = ["InMemoryDataset", "train_scm", "PipelineResult"]


class InMemoryDataset:
    """A KmerMatrix + labels exposing the surface the learners need."""

    def __init__(self, km: KmerMatrix, labels_by_genome_id, sharding=None):
        self.km = km
        self.genome_count = km.n_genomes
        self.kmer_count = km.n_kmers
        self.labels = np.array(
            [int(labels_by_genome_id[g]) for g in km.genome_ids], dtype=np.uint8
        )
        self._bm = None
        self._sharding = sharding
        self._dense = None

    @classmethod
    def from_contigs(cls, genome_specs, labels_by_genome_id, k,
                     filter_singleton=False, engine="auto", sharding=None):
        """Host/native ingest: per-genome counting + host union merge."""
        gks = [count_fasta(path, k, genome_id=gid, engine=engine)
               for gid, path in genome_specs]
        km = build_presence_matrix(gks, filter_singleton=filter_singleton)
        return cls(km, labels_by_genome_id, sharding=sharding)

    @classmethod
    def from_contigs_device(cls, genome_specs, labels_by_genome_id, k,
                            filter_singleton=False, k_budget=None,
                            genome_batch=None, batch_budget=None):
        """Fully on-device ingest: extraction, union and packing stay in HBM.

        Returns a :class:`DeviceDataset` whose matrix never leaves the
        device (only the model's few rule k-mers are decoded at the end).
        ``genome_batch`` (a multiple of 32) switches to the batched builder
        — per-batch window sorts + one fused union merge — for inputs past
        single-global-sort scale.
        """
        from .ops.kmer import encode_contigs
        from .parallel.device_build import (build_matrix_device,
                                            build_matrix_device_batched)
        from .utils import fasta_to_sequences

        codes_list = [encode_contigs(fasta_to_sequences(path))
                      for _, path in genome_specs]
        ids = [gid for gid, _ in genome_specs]
        if genome_batch:
            dm = build_matrix_device_batched(
                codes_list, k, genome_ids=ids, k_budget=k_budget,
                genome_batch=genome_batch, batch_budget=batch_budget,
                filter_singleton=filter_singleton,
            )
        else:
            dm = build_matrix_device(
                codes_list, k, genome_ids=ids, k_budget=k_budget,
                filter_singleton=filter_singleton,
            )
        return DeviceDataset(dm, labels_by_genome_id)

    def bit_matrix(self, sharding=None):
        if self._bm is None:
            self._bm = BitMatrix(
                u64_matrix_to_u32(self.km.matrix), self.km.n_genomes,
                columns_sharding=sharding or self._sharding,
            )
        return self._bm

    def get_matrix_columns(self, columns):
        if self._dense is None:
            self._dense = self.km.dense()
        columns = np.asarray(columns, dtype=np.int64)
        base = np.where(columns >= self.kmer_count, columns - self.kmer_count,
                        columns)
        out = self._dense[:, base].copy()
        inv = columns >= self.kmer_count
        out[:, inv] = 1 - out[:, inv]
        return out


class DeviceDataset:
    """In-memory dataset over a fully device-built matrix.

    The packed matrix lives only in HBM; column gathers for final model
    evaluation unpack the few selected rule columns from the device.
    """

    def __init__(self, device_matrix, labels_by_genome_id):
        self.dm = device_matrix
        self.genome_count = len(device_matrix.genome_ids)
        self.kmer_count = device_matrix.n_kmers
        self.labels = np.array(
            [int(labels_by_genome_id[g]) for g in device_matrix.genome_ids],
            dtype=np.uint8,
        )
        self._bm = device_matrix.bit_matrix()
        self.km = _DeviceKmerView(device_matrix)

    def bit_matrix(self, sharding=None):
        return self._bm

    def get_matrix_columns(self, columns):
        import jax

        columns = np.asarray(columns, dtype=np.int64)
        base = np.where(columns >= self.kmer_count, columns - self.kmer_count,
                        columns)
        packed = np.asarray(
            jax.device_get(self._bm.data[:, np.asarray(base)])
        )  # (W, n_cols) uint32 — a few columns only
        from .utils import unpack_binary_bytes_from_ints

        dense = unpack_binary_bytes_from_ints(packed)[: self.genome_count]
        inv = columns >= self.kmer_count
        dense[:, inv] = 1 - dense[:, inv]
        return dense


class _DeviceKmerView:
    """Minimal KmerMatrix-like view for rule decoding."""

    def __init__(self, device_matrix):
        self._dm = device_matrix
        self.k = device_matrix.k
        self._kmers = None

    @property
    def kmers(self):
        if self._kmers is None:
            self._kmers = self._dm.union_kmers_host()
        return self._kmers


@dataclass
class PipelineResult:
    model: object
    rules: list
    train_metrics: dict
    test_metrics: dict
    train_idx: np.ndarray
    test_idx: np.ndarray


def train_scm(dataset: InMemoryDataset, model_type="conjunction", p=1.0,
              max_rules=10, train_prop=0.75, random_seed=0, mesh=None):
    """Greedy SCM on the in-memory matrix with the fused device engine.

    Split semantics mirror the reference (RandomState shuffle + ceil
    proportion). Returns the fitted model and train/test metrics.
    """
    import jax.numpy as jnp

    from .parallel.mesh import scm_fit_batch_device
    from .parallel.scm_device import build_packed_mask

    rngen = np.random.RandomState(random_seed)
    n = dataset.genome_count
    idx = np.arange(n)
    rngen.shuffle(idx)
    n_train = int(ceil(train_prop * n))
    train_idx, test_idx = np.sort(idx[:n_train]), np.sort(idx[n_train:])

    labels = dataset.labels
    pos = train_idx[labels[train_idx] == 1]
    neg = train_idx[labels[train_idx] == 0]
    if model_type == "disjunction":
        pos, neg = neg, pos

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, "cols"))
    bm = dataset.bit_matrix(sharding=sharding)

    rules_arr, n_rules, _ = scm_fit_batch_device(
        bm.data,
        jnp.asarray(build_packed_mask(pos, n, bm.n_words)[None]),
        jnp.asarray(build_packed_mask(neg, n, bm.n_words)[None]),
        jnp.asarray(np.array([p], np.float32)),
        bm.n_columns,
        max_rules,
    )
    rule_idx = [int(r) for r in np.asarray(rules_arr)[0] if r >= 0]

    model = ConjunctionModel() if model_type == "conjunction" else DisjunctionModel()
    kmer_strings = None
    rules = []
    for ridx in rule_idx:
        kmer_i = ridx % dataset.kmer_count
        rule_type = "absence" if ridx >= dataset.kmer_count else "presence"
        seq = decode_kmers(dataset.km.kmers[kmer_i : kmer_i + 1], dataset.km.k)[0]
        rule = KmerRule(kmer_i, seq, rule_type)
        if model_type == "disjunction":
            rule = rule.inverse()
        model.add(rule)
        rules.append(rule)

    X = dataset.get_matrix_columns([r.kmer_index for r in model.rules])
    readdressed = (ConjunctionModel() if model_type == "conjunction"
                   else DisjunctionModel())
    for i, r in enumerate(model.rules):
        rr = KmerRule(i, r.kmer_sequence, r.type)
        readdressed.add(rr)
    train_pred = readdressed.predict(X[train_idx])
    test_pred = readdressed.predict(X[test_idx])
    return PipelineResult(
        model=model,
        rules=rules,
        train_metrics=get_binary_metrics(train_pred, labels[train_idx]),
        test_metrics=get_binary_metrics(test_pred, labels[test_idx]),
        train_idx=train_idx,
        test_idx=test_idx,
    )
