"""Canonical k-mer extraction on device — the DSK-equivalent compute core.

Replaces the reference's external C++ k-mer counters (DSK / multidsk, GATB
based; invoked at ``bin/kover/core/kover/dataset/tools/kmer_count.py:23-53``
and ``src/app.py:1356-1416``) with an XLA-native pipeline:

1. host encodes FASTA contigs to 2-bit codes (A=0 C=1 G=2 T=3; 4 = invalid,
   used both for non-ACGT bases and as a contig separator so windows never
   span contigs — DSK counts per-sequence);
2. sliding 16-base packing via log-step doubling (5 shift/or sweeps instead of
   a k-wide gather);
3. reverse-complement stream packed once and re-indexed (no per-window bit
   reversal);
4. canonical = lexicographic min(forward, revcomp) under A<C<G<T;
5. multiword lexicographic sort (``lax.sort`` with ``num_keys``) with a
   validity key that pushes invalid windows to the end;
6. run-length flags for unique/count extraction.

k-mers are (n, n_words) uint32, big-endian word order, bases packed MSB-first
and the last word left-aligned — so numeric order == DNA lexicographic order
for fixed k. k up to 128 (8 words), matching the reference CLI's limit
(``bin/kover/kover:114``). k in [1, 16] uses the single-word fast path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "n_words_for_k",
    "encode_sequence",
    "encode_contigs",
    "extract_sorted_kmers",
    "sorted_kmers_np",
    "canonical_kmers_brute",
    "decode_kmers",
    "MAX_K",
]

MAX_K = 128
_CODE = np.full(256, 4, dtype=np.int8)
for i, b in enumerate("ACGT"):
    _CODE[ord(b)] = i
    _CODE[ord(b.lower())] = i
_BASES = np.array(list("ACGT"))


def n_words_for_k(k):
    if not 1 <= k <= MAX_K:
        raise ValueError("k must be in [1, %d]" % MAX_K)
    return -(-k // 16)


def encode_sequence(seq):
    """Encode one DNA string to int8 codes (0..3, 4=invalid)."""
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _CODE[raw]


def encode_contigs(contigs):
    """Encode a list of contig strings into one code array.

    Contigs are joined with a single invalid (4) separator so that no k-mer
    window spans a contig boundary (mirrors DSK's per-sequence counting).
    """
    if not contigs:
        return np.zeros(0, dtype=np.int8)
    parts = []
    for i, c in enumerate(contigs):
        if i:
            parts.append(np.array([4], dtype=np.int8))
        parts.append(encode_sequence(c))
    return np.concatenate(parts)


def _sliding_pack16(c2):
    """P[t] = codes[t:t+16] packed MSB-first into a uint32 (left-aligned)."""
    P = (c2.astype(jnp.uint32)) << 30
    n = 1
    while n < 16:
        shifted = jnp.concatenate([P[n:], jnp.zeros((n,), P.dtype)])
        P = P | (shifted >> (2 * n))
        n *= 2
    return P


def _window_words(P16, t0_offset, k, L):
    """Word arrays (list of nw (L,) uint32) for windows starting at each t.

    ``P16`` is the sliding 16-pack of the underlying stream; window t's word j
    is ``P16[t + 16j]``; the last (partial) word keeps only its top 2r bits.
    """
    nw = n_words_for_k(k)
    r = k - 16 * (nw - 1)  # bases in last word, in [1, 16]
    words = []
    for j in range(nw):
        off = 16 * j
        w = jnp.concatenate([P16[off:], jnp.zeros((min(off, L),), P16.dtype)])[:L]
        if j == nw - 1 and r < 16:
            w = w & jnp.uint32((0xFFFFFFFF << (32 - 2 * r)) & 0xFFFFFFFF)
        words.append(w)
    return words


def _lex_sort(operands):
    """Lexicographic sort of parallel word arrays, keys = all operands in order.

    Implemented as least-significant-key-first stable single-key sorts: XLA's
    variadic ``num_keys > 1`` sort falls back to a comparator-per-element path
    that is orders of magnitude slower on CPU (and suboptimal on TPU), whereas
    ``num_keys=1`` stable sorts hit the fast vectorized path on both.
    """
    ops = list(operands)
    n = len(ops)
    for key_idx in reversed(range(n)):
        order = [key_idx] + [i for i in range(n) if i != key_idx]
        sorted_ops = jax.lax.sort([ops[i] for i in order], num_keys=1, is_stable=True)
        inv = {src: dst for dst, src in enumerate(order)}
        ops = [sorted_ops[inv[i]] for i in range(n)]
    return ops


def _lex_less(a_words, b_words):
    """Elementwise lexicographic a < b over big-endian word lists."""
    lt = jnp.zeros(a_words[0].shape, dtype=bool)
    for j in reversed(range(len(a_words))):
        lt = (a_words[j] < b_words[j]) | ((a_words[j] == b_words[j]) & lt)
    return lt


@partial(jax.jit, static_argnames=("k",))
def _extract_canon(codes, k):
    """Jitted elementwise pipeline: codes (L,) int8 -> canonical window words.

    Returns (words: nw arrays (L,) uint32, valid: (L,) bool). Window i starts
    at position i; padding/invalid windows carry garbage words and valid=False.
    """
    L = codes.shape[0]
    codes = codes.astype(jnp.int32)

    # Window validity: no invalid base in [t, t+k) and t <= L-k.
    bad = (codes >= 4).astype(jnp.int32)
    cbad = jnp.cumsum(bad)
    cbad_shift = jnp.concatenate([jnp.zeros((1,), jnp.int32), cbad[:-1]])
    end = jnp.minimum(jnp.arange(L) + k - 1, L - 1)
    window_bad = cbad[end] - cbad_shift
    valid = (window_bad == 0) & (jnp.arange(L) <= L - k)

    c2 = (codes & 3).astype(jnp.uint32)
    fwd_P = _sliding_pack16(c2)
    fwd_words = _window_words(fwd_P, 0, k, L)

    # Reverse-complement stream: rc_codes[t] = 3 - codes[L-1-t]; the RC of the
    # window starting at t is the RC-stream window starting at L-k-t, i.e. the
    # flipped word array offset by k-1.
    rc_c2 = (3 - c2[::-1]) & 3
    rc_P = _sliding_pack16(rc_c2)
    rc_all = _window_words(rc_P, 0, k, L)
    rc_words = []
    for w in rc_all:
        wr = w[::-1]
        rc_words.append(jnp.concatenate([wr[k - 1 :], jnp.zeros((k - 1,), wr.dtype)])[:L])

    use_rc = _lex_less(rc_words, fwd_words)
    canon = [jnp.where(use_rc, r, f) for f, r in zip(fwd_words, rc_words)]
    return canon, valid


@partial(jax.jit, static_argnames=())
def _sort_unique_device(invalid_key, canon):
    """Device sort + first-occurrence flags (TPU path)."""
    sorted_ops = _lex_sort([invalid_key] + list(canon))
    inv_sorted = sorted_ops[0]
    words_sorted = sorted_ops[1:]
    L = inv_sorted.shape[0]
    neq_prev = jnp.zeros((L,), dtype=bool).at[0].set(True)
    for w in words_sorted:
        diff = jnp.concatenate([jnp.ones((1,), bool), w[1:] != w[:-1]])
        neq_prev = neq_prev | diff
    first_flag = neq_prev & (inv_sorted == 0)
    return words_sorted, inv_sorted, first_flag


def _sort_unique_host(invalid_key, canon):
    """Host numpy sort + flags (CPU path: XLA CPU sort compiles are ~10s each)."""
    invalid_key = np.asarray(invalid_key)
    canon = [np.asarray(w) for w in canon]
    # np.lexsort: last key is primary -> order (w_last, ..., w0, invalid).
    order = np.lexsort(tuple(reversed(canon)) + (invalid_key,))
    inv_sorted = invalid_key[order]
    words_sorted = [w[order] for w in canon]
    L = inv_sorted.shape[0]
    neq_prev = np.zeros(L, dtype=bool)
    if L:
        neq_prev[0] = True
    for w in words_sorted:
        neq_prev[1:] |= w[1:] != w[:-1]
    first_flag = neq_prev & (inv_sorted == 0)
    return words_sorted, inv_sorted, first_flag


def _extract_sorted(codes, k):
    """Full pipeline: canonical extraction (jit) + platform-dispatched sort."""
    canon, valid = _extract_canon(codes, k)
    invalid_key = (~valid).astype(jnp.uint32)
    if jax.default_backend() == "cpu":
        return _sort_unique_host(invalid_key, canon)
    return _sort_unique_device(invalid_key, tuple(canon))


_PAD_UNIT = 1 << 16


def _pad_codes(codes):
    """Pad to a bucketed length (power-of-2-ish) to bound jit recompiles."""
    L = codes.shape[0]
    target = _PAD_UNIT
    while target < L:
        target *= 2
    if target != L:
        codes = np.concatenate([codes, np.full(target - L, 4, dtype=np.int8)])
    return codes


def extract_sorted_kmers(codes, k):
    """Run the device pipeline; returns jax arrays (words, invalid, first)."""
    codes = np.asarray(codes, dtype=np.int8)
    if codes.shape[0] < k:
        nw = n_words_for_k(k)
        z = jnp.zeros((0,), jnp.uint32)
        return [z] * nw, jnp.zeros((0,), jnp.uint32), jnp.zeros((0,), bool)
    return _extract_sorted(jnp.asarray(_pad_codes(codes)), k)


def sorted_kmers_np(codes, k, return_counts=False):
    """Sorted distinct canonical k-mers as a (n, nw) uint32 numpy array.

    With ``return_counts=True`` also returns per-k-mer occurrence counts
    (the DSK 'reads' mode contract, used for min-abundance filtering).
    """
    words, inv, first = jax.device_get(extract_sorted_kmers(codes, k))
    if len(inv) == 0:
        empty = np.zeros((0, n_words_for_k(k)), np.uint32)
        return (empty, np.zeros(0, np.int64)) if return_counts else empty
    valid = inv == 0
    first = np.asarray(first)
    kmers = np.stack([np.asarray(w)[first] for w in words], axis=1)
    if not return_counts:
        return kmers
    n_valid = int(valid.sum())
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n_valid))
    return kmers, counts


_BASES_BYTES = np.frombuffer(b"ACGT", dtype="S1")


def decode_kmers_bytes(kmers, k):
    """(n, nw) packed uint32 -> (n,) numpy bytes array of dtype S{k}.

    Fully vectorized (k vector passes); the string-list variant below costs
    ~100x more at matrix scale (millions of Python string objects).
    """
    kmers = np.asarray(kmers, dtype=np.uint32)
    n = kmers.shape[0]
    if n == 0:
        return np.zeros(0, dtype="S%d" % k)
    ascii_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    chars = np.empty((n, k), dtype=np.uint8)
    for j in range(k):
        word = j // 16
        shift = 30 - 2 * (j % 16)
        code = (kmers[:, word] >> np.uint32(shift)) & np.uint32(3)
        chars[:, j] = ascii_map[code]
    return chars.reshape(-1).view("S%d" % k)


def decode_kmers(kmers, k):
    """(n, nw) packed uint32 -> list of DNA strings (for TSV/FASTA output)."""
    return [s.decode() for s in decode_kmers_bytes(kmers, k)]


def encode_kmer_strings(kmer_strings, k):
    """List of DNA strings -> (n, nw) packed uint32 (for tests/blacklists)."""
    nw = n_words_for_k(k)
    out = np.zeros((len(kmer_strings), nw), dtype=np.uint32)
    for i, s in enumerate(kmer_strings):
        if len(s) != k:
            raise ValueError("k-mer %r does not have length %d" % (s, k))
        codes = encode_sequence(s)
        if (codes >= 4).any():
            raise ValueError("k-mer %r is not a valid DNA sequence" % s)
        for j, c in enumerate(codes):
            out[i, j // 16] |= np.uint32(int(c)) << np.uint32(30 - 2 * (j % 16))
    return out


def canonical_kmers_brute(seqs, k):
    """Brute-force host oracle: sorted distinct canonical k-mers as strings."""
    comp = str.maketrans("ACGT", "TGCA")
    found = set()
    for s in seqs:
        s = s.upper()
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            if set(km) - set("ACGT"):
                continue
            rc = km.translate(comp)[::-1]
            found.add(min(km, rc))
    return sorted(found)
