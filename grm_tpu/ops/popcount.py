"""Masked-popcount column sweeps over the packed genome x k-mer bit matrix.

This is the single hot kernel that powers SCM utility scoring, CART impurity,
and split risk precomputation — the TPU-native replacement for the reference's
Cython ``inplace_popcount_64`` + ``KmerRuleClassifications.sum_rows``
(``bin/kover/core/kover/learning/common/rules.py:201-267``,
``popcount.pyx:31-95``).

Layout
------
The on-device matrix is uint32-packed, MSB-first: row ``w`` holds genomes
``[32w, 32w+32)``; genome ``g`` is bit ``31 - (g % 32)`` of row ``g // 32``.
The on-disk (reference-compatible) format packs rows of 64 genomes into
uint64 words; :func:`u64_matrix_to_u32` converts between the two — row ``w``
of the uint64 matrix splits into uint32 rows ``2w`` (high half, genomes
``[64w, 64w+32)``) and ``2w+1`` (low half).

The sweep computes, for ``C`` row-selection masks at once::

    counts[c, k] = sum_w popcount(matrix[w, k] & masks[c, w])

i.e. for each k-mer column, how many selected genomes contain the k-mer.
Computing several masks per pass amortizes the HBM read of the matrix (the
reference reads the full matrix once per mask). Absence-rule counts are
derived on the host as ``n_selected - presence`` (rules.py:265).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import build_row_mask

__all__ = [
    "BitMatrix",
    "StreamingBitMatrix",
    "masked_popcount_colsum",
    "u64_matrix_to_u32",
    "u32_matrix_to_u64",
]


def u64_matrix_to_u32(m64):
    """Split a uint64 MSB-first packed matrix into the uint32 device layout.

    On little-endian hosts the two 32-bit halves of each word already sit
    adjacent in memory (low half first), so the split is a de-interleaving
    copy instead of shift/mask arithmetic — ~7x faster at the 460 MB
    median-artifact scale, directly on the learn path's load time.
    """
    m64 = np.ascontiguousarray(m64, dtype=np.uint64)
    out = np.empty((m64.shape[0] * 2,) + m64.shape[1:], dtype=np.uint32)
    if m64.dtype.byteorder in ("=", "<") and np.little_endian:
        halves = m64.view(np.uint32).reshape(m64.shape[0], -1, 2)
        out[0::2] = halves[..., 1]  # high half: genomes [64w, 64w+32)
        out[1::2] = halves[..., 0]  # low half:  genomes [64w+32, 64w+64)
    else:  # pragma: no cover - big-endian hosts
        out[0::2] = (m64 >> np.uint64(32)).astype(np.uint32)
        out[1::2] = (m64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return out


@partial(jax.jit, donate_argnums=(0,))
def _deinterleave_u64_view(x):
    """(W64, 2K) uint32 raw little-endian view of a uint64 matrix ->
    (2*W64, K) device layout (high half first, matching
    :func:`u64_matrix_to_u32`). A layout copy at HBM bandwidth. The input
    buffer is donated (same byte size as the output) so peak HBM stays at
    ~1x matrix bytes — large-but-resident matrices near the 0.6x budget
    (artifact.py) would otherwise OOM at load."""
    r, k2 = x.shape
    x = x.reshape(r, k2 // 2, 2)
    return jnp.stack([x[:, :, 1], x[:, :, 0]], axis=1).reshape(2 * r, k2 // 2)


def u32_matrix_to_u64(m32):
    """Inverse of :func:`u64_matrix_to_u32` (pads odd row counts with zeros)."""
    m32 = np.ascontiguousarray(m32, dtype=np.uint32)
    n32 = m32.shape[0]
    if n32 % 2:
        m32 = np.concatenate([m32, np.zeros((1,) + m32.shape[1:], np.uint32)])
    hi = m32[0::2].astype(np.uint64)
    lo = m32[1::2].astype(np.uint64)
    return (hi << np.uint64(32)) | lo


@jax.jit
def _gather_columns(matrix, cols):
    """(C,) column indices -> (C, W) packed uint32 columns.

    Same wide-slice trick as scm_grid._fetch_columns: single-column takes
    on the minor axis make XLA materialize a relaid-out matrix copy, while
    (W, B) dynamic_slices lower to a cheap gather. B is kept small: the
    vmapped intermediate is (C, W, B) — B times the output size.
    """
    w, k = matrix.shape
    b = min(256, k)

    def take_block(c):
        start = jnp.clip(c, 0, k - b).astype(jnp.int32)
        return jax.lax.dynamic_slice(matrix, (0, start), (w, b)), c - start

    blocks, offs = jax.vmap(take_block)(cols)  # (C, W, B), (C,)
    return jnp.take_along_axis(
        blocks, offs[:, None, None].astype(jnp.int32), axis=2
    )[:, :, 0]


@jax.jit
def _colsum_xla(matrix, masks):
    """counts[c, k] = sum_w popcount(matrix[w, k] & masks[c, w]); XLA path."""
    sel = matrix[None, :, :] & masks[:, :, None]  # (C, W, K), fused by XLA
    return jnp.sum(jax.lax.population_count(sel).astype(jnp.int32), axis=1)


@jax.jit
def _colsum_xla_u16(matrix, masks):
    """Same sweep with a device-side uint16 downcast: halves the host
    transfer when counts fit 16 bits (n_genomes < 65536 always does)."""
    sel = matrix[None, :, :] & masks[:, :, None]
    return jnp.sum(
        jax.lax.population_count(sel).astype(jnp.int32), axis=1
    ).astype(jnp.uint16)


def masked_popcount_colsum(matrix, masks):
    """Run the masked popcount column sweep.

    Parameters
    ----------
    matrix : (W, K) uint32 array (device or host)
    masks : (C, W) uint32 array of row-selection bitmasks

    Returns
    -------
    (C, K) int32 presence counts.
    """
    matrix = jnp.asarray(matrix, dtype=jnp.uint32)
    masks = jnp.asarray(masks, dtype=jnp.uint32)
    if masks.ndim == 1:
        masks = masks[None, :]
    return _colsum_xla(matrix, masks)


class StreamingBitMatrix:
    """Out-of-core variant: matrix stays in host RAM, column blocks are
    streamed through the device per sweep.

    For matrices larger than HBM (the largest published dataset is 5022
    genomes x 43M k-mers ~ 27 GB packed, vs 16 GB on a v5e): the host array
    is the residency, each ``presence_counts`` call streams fixed-size column
    blocks H2D and accumulates counts host-side. This supports the host
    (parity) learning engine's ``sum_rows`` contract; the fused device
    engine requires a resident or mesh-sharded matrix (shard across chips
    for that). Mirrors the reference's out-of-core block streaming
    (rules.py:243-262) with the block read being H2D instead of HDF5 I/O.
    """

    DEFAULT_BLOCK_COLS = 1 << 22

    def __init__(self, packed_u32, n_rows, block_cols=None):
        self.host = np.ascontiguousarray(packed_u32, dtype=np.uint32)
        self.n_rows = int(n_rows)
        self.n_words = self.host.shape[0]
        self.n_columns = self.host.shape[1]
        self.block_cols = int(block_cols or self.DEFAULT_BLOCK_COLS)
        if self.n_words * 32 < self.n_rows:
            raise ValueError("Packed matrix has too few word-rows for n_rows.")

    @classmethod
    def from_u64(cls, m64, n_rows, **kw):
        return cls(u64_matrix_to_u32(m64), n_rows, **kw)

    @property
    def shape(self):
        return self.n_rows, self.n_columns * 2

    def row_mask(self, rows):
        return build_row_mask(np.asarray(rows, dtype=np.int64), self.n_words * 32, 32)

    def presence_counts(self, rows_list):
        masks = jnp.asarray(np.stack([self.row_mask(r) for r in rows_list]))
        use_u16 = self.n_rows < 65536
        out = np.empty((len(rows_list), self.n_columns), dtype=np.int64)
        for lo in range(0, self.n_columns, self.block_cols):
            hi = min(self.n_columns, lo + self.block_cols)
            block = jnp.asarray(self.host[:, lo:hi])
            counts = (_colsum_xla_u16 if use_u16 else _colsum_xla)(block, masks)
            out[:, lo:hi] = np.asarray(jax.device_get(counts), dtype=np.int64)
        return out

    def sum_rows(self, rows):
        from ..utils import minimum_uint_size

        rows = np.asarray(rows)
        presence = self.presence_counts([rows])[0]
        out = np.empty(self.n_columns * 2,
                       dtype=minimum_uint_size(max(rows.shape[0], 1)))
        out[: self.n_columns] = presence
        out[self.n_columns:] = rows.shape[0] - presence
        return out

    def get_columns_dense(self, cols):
        """Unpacked presence columns (n_rows, len(cols)) uint8 — a plain
        host-RAM gather (the matrix is already inflated here, unlike the
        HDF5 path which re-inflates gzip chunks per fetch)."""
        from ..utils import unpack_binary_bytes_from_ints

        cols = np.asarray(cols, dtype=np.int64)
        if cols.size == 0:
            return np.empty((self.n_rows, 0), np.uint8)
        if (cols < 0).any() or (cols >= self.n_columns).any():
            raise IndexError("column index out of range")
        return unpack_binary_bytes_from_ints(
            np.ascontiguousarray(self.host[:, cols])
        )[: self.n_rows]


class BitMatrix:
    """Device-resident packed presence matrix with reference `sum_rows` semantics.

    Wraps a (W32, K) uint32 matrix for ``n_rows`` genomes. ``sum_rows`` mirrors
    ``KmerRuleClassifications.sum_rows`` (reference rules.py:201-267): given
    genome row indices, return a length ``2K`` count vector — presence-rule
    counts followed by absence-rule counts.
    """

    def __init__(self, packed_u32, n_rows, columns_sharding=None,
                 shape_bucket=False):
        packed_u32 = np.asarray(packed_u32) if not isinstance(
            packed_u32, jax.Array
        ) else packed_u32
        if packed_u32.dtype != np.uint32:
            raise ValueError("BitMatrix expects a uint32-packed matrix.")
        self.n_rows = int(n_rows)
        self.n_words = packed_u32.shape[0]
        self.n_columns = packed_u32.shape[1]
        if self.n_words * 32 < self.n_rows:
            raise ValueError("Packed matrix has too few word-rows for n_rows.")
        if columns_sharding is not None:
            # Pad the column axis to the sharding grid (zero columns popcount
            # to 0; consumers mask or slice by n_columns).
            n_shards = getattr(columns_sharding, "num_devices", None)
            try:
                from jax.sharding import NamedSharding

                if isinstance(columns_sharding, NamedSharding):
                    spec = columns_sharding.spec
                    axis = spec[1] if len(spec) > 1 else None
                    n_shards = (
                        columns_sharding.mesh.shape[axis] if axis else 1
                    )
            except ImportError:  # pragma: no cover
                pass
            if n_shards:
                pad = (-self.n_columns) % int(n_shards)
                if pad:
                    packed_u32 = np.concatenate(
                        [np.asarray(packed_u32),
                         np.zeros((self.n_words, pad), np.uint32)], axis=1
                    )
            arr = jax.device_put(jnp.asarray(packed_u32), columns_sharding)
        else:
            arr = jnp.asarray(packed_u32)
            if shape_bucket:
                # Compile-hygiene bucketing: round the word rows and the
                # k-mer columns up to coarse grids so datasets of similar
                # scale share every compiled learn-path program (remote
                # compiles cost 10-500 s through tunneled compile
                # services). Zero pad rows/columns are inert: row masks
                # never select them and every engine masks columns >=
                # n_columns. Overhead <= ~12.5% extra sweep width.
                import os as _os

                row_b = int(_os.environ.get("GRM_ROW_BUCKET_WORDS", 4))
                # Column grid: 1/8-power-of-two steps (<= 12.5% pad), so
                # e.g. 9.6M and 10.1M columns land on one 10.5M bucket.
                # GRM_COL_BUCKET raises the step floor.
                col_floor = int(_os.environ.get("GRM_COL_BUCKET", 256))
                col_step = max(col_floor, 1 << max(
                    int(np.ceil(np.log2(max(self.n_columns, 2)))) - 3, 0))
                rp = (-self.n_words) % max(row_b, 1)
                cp = (-self.n_columns) % col_step
                if rp or cp:
                    arr = jax.jit(
                        partial(jnp.pad, pad_width=((0, rp), (0, cp)))
                    )(arr)
                    self.n_words = arr.shape[0]
        self.data = arr

    @classmethod
    def from_u64(cls, m64, n_rows, **kw):
        import os as _os

        # The device de-interleave's XLA temps pad to ~1.6x the matrix, so
        # near-HBM-scale matrices (the 7.4 GB isoniazid artifact OOMed at
        # load) de-interleave on the host instead — a strided numpy copy,
        # seconds even at that scale — and upload the u32 form directly
        # (peak HBM ~1x matrix bytes).
        device_max = int(_os.environ.get(
            "GRM_DEVICE_DEINTERLEAVE_MAX_BYTES", 2 << 30))
        if (kw.get("columns_sharding") is None
                and isinstance(m64, np.ndarray)
                and m64.nbytes <= device_max
                and m64.dtype == np.uint64
                and m64.dtype.byteorder in ("=", "<") and np.little_endian):
            # Upload the raw uint32 view (zero host work — the strided host
            # de-interleave costs seconds at the 460 MB median-artifact
            # scale) and split the word halves on device at HBM bandwidth.
            m64 = np.ascontiguousarray(m64)
            return cls(_deinterleave_u64_view(jnp.asarray(m64.view(np.uint32))),
                       n_rows, **kw)
        return cls(u64_matrix_to_u32(m64), n_rows, **kw)

    @classmethod
    def from_dense(cls, dense01, **kw):
        """Build from a dense (n_genomes, n_kmers) 0/1 matrix (tests/small)."""
        from ..utils import pack_binary_bytes_to_ints

        dense01 = np.asarray(dense01, dtype=np.uint8)
        packed = pack_binary_bytes_to_ints(dense01, 32)
        return cls(packed, dense01.shape[0], **kw)

    @property
    def shape(self):
        """(n_genomes, 2 * n_kmers) — presence + absence rules, like the ref."""
        return self.n_rows, self.n_columns * 2

    def row_mask(self, rows):
        return build_row_mask(np.asarray(rows, dtype=np.int64), self.n_words * 32, 32)

    def presence_counts(self, rows_list):
        """Presence counts for several row sets in ONE matrix pass.

        rows_list: sequence of index arrays. Returns (C, K) int64 numpy
        (column padding from sharded placement is sliced off).
        """
        masks = jnp.asarray(np.stack([self.row_mask(r) for r in rows_list]))
        if self.n_rows < 65536:
            counts = _colsum_xla_u16(self.data, masks)
        else:
            counts = _colsum_xla(self.data, masks)
        out = np.asarray(jax.device_get(counts), dtype=np.int64)
        return out[:, : self.n_columns]

    def sum_rows(self, rows):
        """Reference-compatible: length-2K vector, presence then absence counts.

        Matches rules.py:201-267 including the result dtype contract (minimum
        uint size for len(rows)).
        """
        from ..utils import minimum_uint_size

        rows = np.asarray(rows)
        presence = self.presence_counts([rows])[0]
        out = np.empty(self.n_columns * 2, dtype=minimum_uint_size(max(rows.shape[0], 1)))
        out[: self.n_columns] = presence
        out[self.n_columns :] = rows.shape[0] - presence
        return out

    def get_columns_dense(self, cols):
        """Unpacked presence columns (n_rows, len(cols)) uint8, one device
        gather.

        The device replacement for the HDF5 fancy column read of the
        reference's ``get_columns`` (rules.py:135-171): with the chunk
        cache disabled, every HDF5 column fetch inflates full gzip chunks
        per packed row — MBs of host work per call — while the matrix is
        already resident in HBM. Column counts are bucket-padded (pow2) so
        repeated model-sized fetches share one compiled program.
        """
        cols = np.asarray(cols, dtype=np.int64)
        if cols.size == 0:
            return np.empty((self.n_rows, 0), np.uint8)
        if (cols < 0).any() or (cols >= self.n_columns).any():
            raise IndexError("column index out of range")
        n = len(cols)
        # Chunk big requests: the gather's vmapped intermediate is ~256x
        # the output size, and whole-grid prefetches can ask for
        # thousands of columns next to a resident matrix near the HBM
        # budget. All chunks fetch in ONE device_get (one round trip).
        chunk = 2048
        parts = []
        for lo in range(0, n, chunk):
            sub = cols[lo:lo + chunk]
            bucket = 1
            while bucket < len(sub):
                bucket *= 2
            padded = np.zeros(bucket, np.int64)
            padded[: len(sub)] = sub
            parts.append(
                _gather_columns(self.data, jnp.asarray(padded))[: len(sub)])
        packed = np.concatenate(
            [np.asarray(x) for x in jax.device_get(parts)], axis=0)
        # (n, W) uint32 -> (32W, n) bits, MSB-first per word.
        from ..utils import unpack_binary_bytes_from_ints

        dense = unpack_binary_bytes_from_ints(packed.T)
        return dense[: self.n_rows]

