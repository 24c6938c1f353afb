"""The dataset artifact: a reference-compatible HDF5 layout.

Stores the same groups/datasets/attributes as a Kover ``.kover`` file
(``bin/kover/core/kover/dataset/create.py:196-238`` and ``ds.py:26-148``):

- attrs: ``uuid``, ``genome_source_type``, ``genomic_data``,
  ``phenotype_description``, ``phenotype_metadata_source``, ``filter``,
  ``compression``, ``classification_type``
- datasets: ``genome_identifiers``, ``phenotype`` (uint8 labels, attr
  ``description``), ``phenotype_tags``, ``kmer_sequences`` (fixed-width
  bytes), ``kmer_matrix`` (uint64 MSB-first packed, rows of 64 genomes),
  ``kmer_by_matrix_column``, and ``splits/<name>/...`` written by
  :mod:`grm_tpu.dataset.split`.

so existing Kover datasets can be read by this framework and vice versa.
The accessor also materializes the device-side :class:`BitMatrix` for the
learning layer (uint32 layout, HBM-resident).
"""

from __future__ import annotations

import os

import numpy as np
import h5py

from ..ops.popcount import BitMatrix
from ..utils import unpack_binary_bytes_from_ints

__all__ = ["GrmDataset"]


class _Phenotype:
    def __init__(self, description, tags, metadata, metadata_source):
        self.description = description
        self.tags = tags
        self.metadata = metadata
        self.metadata_source = metadata_source


class _Fold:
    def __init__(self, name, grp):
        self.name = name
        self.train_genome_idx = grp["train_genome_idx"][...]
        self.test_genome_idx = grp["test_genome_idx"][...]
        self.unique_risks = grp["unique_risks"][...]
        self.unique_risk_by_kmer = grp["unique_risk_by_kmer"][...]
        self.unique_risk_by_anti_kmer = grp["unique_risk_by_anti_kmer"][...]


class _Split:
    def __init__(self, name, grp):
        self.name = name
        self.random_seed = grp.attrs["random_seed"]
        self.train_proportion = grp.attrs["train_proportion"]
        self.test_proportion = grp.attrs.get(
            "test_proportion", 1.0 - grp.attrs["train_proportion"]
        )
        self.train_genome_idx = grp["train_genome_idx"][...]
        self.test_genome_idx = grp["test_genome_idx"][...]
        self.unique_risks = grp["unique_risks"][...]
        self.unique_risk_by_kmer = grp["unique_risk_by_kmer"][...]
        self.unique_risk_by_anti_kmer = grp["unique_risk_by_anti_kmer"][...]
        if "folds" in grp:
            self.folds = [
                _Fold(name, grp["folds"][name]) for name in sorted(grp["folds"])
            ]
        else:
            self.folds = []

    def __str__(self):
        return (
            "%s   Train genomes: %d (%.3f)   Test genomes: %d (%.3f)   "
            "Folds: %d   Random Seed: %d"
            % (
                self.name,
                len(self.train_genome_idx),
                self.train_proportion,
                len(self.test_genome_idx),
                self.test_proportion,
                len(self.folds),
                self.random_seed,
            )
        )


class GrmDataset:
    """Read-mostly accessor over the HDF5 dataset artifact."""

    def __init__(self, path):
        self.path = str(path)
        self._bit_matrix = None

    def open(self, mode="r"):
        return h5py.File(self.path, mode)

    # -- attributes ---------------------------------------------------------
    @property
    def uuid(self):
        with self.open() as f:
            return f.attrs["uuid"]

    @property
    def compression(self):
        with self.open() as f:
            return f.attrs["compression"]

    @property
    def kmer_filter(self):
        with self.open() as f:
            return f.attrs.get("filter", "nothing")

    @property
    def classification_type(self):
        with self.open() as f:
            return f.attrs.get("classification_type", "binary")

    @property
    def genome_source_type(self):
        with self.open() as f:
            return f.attrs["genome_source_type"]

    @property
    def genome_source(self):
        with self.open() as f:
            return f.attrs["genomic_data"]

    # -- datasets -----------------------------------------------------------
    @property
    def genome_identifiers(self):
        with self.open() as f:
            ids = f["genome_identifiers"][...]
        return np.array([v.decode() if isinstance(v, bytes) else str(v) for v in ids])

    @property
    def genome_count(self):
        with self.open() as f:
            return f["genome_identifiers"].shape[0]

    @property
    def kmer_count(self):
        with self.open() as f:
            return f["kmer_sequences"].shape[0]

    @property
    def kmer_length(self):
        with self.open() as f:
            return len(f["kmer_sequences"][0])

    @property
    def kmer_sequences(self):
        with self.open() as f:
            return f["kmer_sequences"][...]

    @property
    def kmer_by_matrix_column(self):
        with self.open() as f:
            return f["kmer_by_matrix_column"][...]

    @property
    def phenotype(self):
        with self.open() as f:
            description = f.attrs.get("phenotype_description", "NA")
            tags = (
                f["phenotype_tags"][...]
                if "phenotype_tags" in f
                else np.array([b"0", b"1"])
            )
            tags = np.array(
                [t.decode() if isinstance(t, bytes) else str(t) for t in tags]
            )
            metadata = f["phenotype"][...] if "phenotype" in f else None
            source = f.attrs.get("phenotype_metadata_source", "NA")
        return _Phenotype(description, tags, metadata, source)

    @property
    def splits(self):
        with self.open() as f:
            if "splits" not in f:
                return []
            names = sorted(f["splits"])
        return [self.get_split(n) for n in names]

    def get_split(self, name):
        with self.open() as f:
            return _Split(name, f["splits"][name])

    # -- matrices -----------------------------------------------------------
    def kmer_matrix_u64(self):
        """Host copy of the packed uint64 matrix (reference layout).

        gzip-chunked matrices decompress on a thread pool: the raw chunk
        bytes are read serially (HDF5 is not thread-safe) but inflate —
        the dominant cost at GB scale — parallelizes across cores, the
        read-side counterpart of the parallel writer in
        :func:`grm_tpu.dataset.create._write_matrix_chunks`.
        """
        with self.open() as f:
            ds = f["kmer_matrix"]
            if (ds.compression != "gzip" or ds.chunks is None
                    or ds.shape[1] == 0):
                return ds[...]
            return _parallel_gzip_read(ds)

    @staticmethod
    def _device_memory_budget():
        """Usable accelerator memory in bytes (override: GRM_HBM_BUDGET_BYTES)."""
        import os

        env = os.environ.get("GRM_HBM_BUDGET_BYTES")
        if env:
            return int(env)
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            if limit:
                return int(limit)
        except Exception:
            pass
        return 12 << 30

    def bit_matrix(self, sharding=None):
        """Device-resident :class:`BitMatrix` (cached per sharding).

        Matrices that would not fit in ~60% of device memory come back as a
        :class:`~grm_tpu.ops.popcount.StreamingBitMatrix` (host-resident,
        blocks streamed per sweep) unless a mesh sharding spreads them
        across chips.
        """
        if self._bit_matrix is None or (
            sharding is not None
            and getattr(self._bit_matrix, "_sharding_key", None) != str(sharding)
        ):
            m64 = self.kmer_matrix_u64()
            device_bytes = m64.shape[0] * 2 * m64.shape[1] * 4
            if sharding is None and device_bytes > 0.6 * self._device_memory_budget():
                from ..ops.popcount import StreamingBitMatrix

                self._bit_matrix = StreamingBitMatrix.from_u64(
                    m64, self.genome_count
                )
            else:
                self._bit_matrix = BitMatrix.from_u64(
                    m64, self.genome_count, columns_sharding=sharding,
                    shape_bucket=(
                        sharding is None
                        and os.environ.get("GRM_SHAPE_BUCKETS", "1") != "0"
                    ),
                )
            self._bit_matrix._sharding_key = (
                str(sharding) if sharding is not None else None
            )
        return self._bit_matrix

    def get_matrix_columns(self, columns):
        """Unpacked presence columns (n_genomes, len(columns)) uint8.

        The host-side analogue of ``KmerRuleClassifications.get_columns``
        (rules.py:135-171) for model prediction paths: columns may include
        absence-rule indices (>= kmer_count), which are returned inverted.
        """
        columns = np.asarray(columns, dtype=np.int64)
        n_kmers = self.kmer_count
        base_cols = np.where(columns >= n_kmers, columns - n_kmers, columns)
        invert = columns >= n_kmers
        uniq, inverse = np.unique(base_cols, return_inverse=True)
        bm = self._bit_matrix
        if bm is not None and hasattr(bm, "get_columns_dense"):
            # The matrix is already device-resident: one small device
            # gather instead of inflating full gzip chunks per packed row
            # (the HDF5 chunk cache is disabled, reference utils.py:78-87,
            # so the fancy read below costs MBs of inflate per call).
            dense = bm.get_columns_dense(uniq)
        else:
            with self.open() as f:
                packed = f["kmer_matrix"][:, uniq.tolist()]
            dense = unpack_binary_bytes_from_ints(packed)[: self.genome_count]
        dense = dense[:, inverse]
        dense[:, invert] = 1 - dense[:, invert]
        return dense


def _parallel_gzip_read(ds):
    """Read a gzip-chunked 2D dataset with thread-parallel inflate.

    Raw chunk bytes stream off the file serially (h5py/HDF5 hold a global
    lock); zlib.decompress releases the GIL, so inflation and the output
    copies run on a pool. Chunks are stored full-size; the ragged tail is
    sliced on copy. In-flight raw payloads are window-bounded.
    """
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    n_rows, n_cols = ds.shape
    crows, ccols = ds.chunks
    out = np.empty(ds.shape, ds.dtype)
    itemsize = out.itemsize

    def inflate(args):
        r, c, raw = args
        arr = np.frombuffer(zlib.decompress(raw), dtype=ds.dtype).reshape(
            crows, ccols
        )
        h = min(crows, n_rows - r)
        w = min(ccols, n_cols - c)
        out[r : r + h, c : c + w] = arr[:h, :w]

    coords = [
        (r, c)
        for r in range(0, n_rows, crows)
        for c in range(0, n_cols, ccols)
    ]
    n_workers = min(os.cpu_count() or 1, 8)
    window = 4 * n_workers
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        for lo in range(0, len(coords), window):
            batch = [
                (r, c, ds.id.read_direct_chunk((r, c))[1])
                for r, c in coords[lo : lo + window]
            ]
            list(pool.map(inflate, batch))
    return out
