// grmio: native host-side genomic IO + k-mer kernels.
//
// The TPU-native framework keeps its compute path in XLA, but the runtime
// around it is native where the reference's was: the reference shells out to
// C++ DSK/multidsk for k-mer counting and dsk2kover for the sorted-stream
// merge into the packed matrix (kmer_count.py:23-53, kmer_pack.py:23-36).
// This library provides those host-side roles:
//
//   - FASTA/FASTQ buffer -> 2-bit codes (A=0 C=1 G=2 T=3, 4 = invalid and
//     contig separator), matching grm_tpu.ops.kmer.encode_contigs;
//   - canonical k-mer extraction + sort + unique (+counts) for one genome —
//     the DSK role, used as the host fallback / ingest accelerator;
//   - N-way merge of per-genome sorted k-mer arrays into the union k-mer
//     space with per-genome column indices — the dsk2kover role (a
//     pointer-chasing workload that belongs on the host, not the TPU).
//
// K-mers are (n, nw) uint32 rows, big-endian word order, bases MSB-first,
// last word left-aligned: numeric/lexicographic equivalence with the device
// representation, so outputs are interchangeable.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FASTA/FASTQ parsing
// ---------------------------------------------------------------------------

// Encode a FASTA text buffer into 2-bit codes with contig separators.
// Returns the number of codes written (<= n). out must have capacity n.
long grm_encode_fasta(const char* buf, long n, int8_t* out) {
    static int8_t table[256];
    static bool init = false;
    if (!init) {
        memset(table, 4, sizeof(table));
        table[(unsigned char)'A'] = table[(unsigned char)'a'] = 0;
        table[(unsigned char)'C'] = table[(unsigned char)'c'] = 1;
        table[(unsigned char)'G'] = table[(unsigned char)'g'] = 2;
        table[(unsigned char)'T'] = table[(unsigned char)'t'] = 3;
        init = true;
    }
    long w = 0;
    long i = 0;
    bool wrote_any = false;
    while (i < n) {
        if (buf[i] == '>') {
            // Header line: skip to end of line; separate contigs.
            while (i < n && buf[i] != '\n') i++;
            if (wrote_any && w > 0 && out[w - 1] != 4) out[w++] = 4;
        } else {
            for (; i < n && buf[i] != '\n'; i++) {
                unsigned char c = (unsigned char)buf[i];
                if (c == '\r' || c == ' ' || c == '\t') continue;
                out[w++] = table[c];
                wrote_any = true;
            }
        }
        i++;  // skip newline
    }
    // Trim trailing separator.
    while (w > 0 && out[w - 1] == 4 && (w == 1 || out[w - 2] == 4)) w--;
    return w;
}

// Encode a FASTQ text buffer (sequence lines only) into 2-bit codes with
// separators between reads. Returns number of codes written.
long grm_encode_fastq(const char* buf, long n, int8_t* out) {
    static int8_t table[256];
    static bool init = false;
    if (!init) {
        memset(table, 4, sizeof(table));
        table[(unsigned char)'A'] = table[(unsigned char)'a'] = 0;
        table[(unsigned char)'C'] = table[(unsigned char)'c'] = 1;
        table[(unsigned char)'G'] = table[(unsigned char)'g'] = 2;
        table[(unsigned char)'T'] = table[(unsigned char)'t'] = 3;
        init = true;
    }
    long w = 0;
    long i = 0;
    int line = 0;
    bool first = true;
    while (i < n) {
        long start = i;
        while (i < n && buf[i] != '\n') i++;
        if (line % 4 == 1) {  // sequence line
            if (!first) out[w++] = 4;
            for (long j = start; j < i; j++) {
                unsigned char c = (unsigned char)buf[j];
                if (c == '\r') continue;
                out[w++] = table[c];
            }
            first = false;
        }
        i++;
        line++;
    }
    return w;
}

// ---------------------------------------------------------------------------
// Canonical k-mer counting (DSK role)
// ---------------------------------------------------------------------------

namespace {

struct KmerRow {
    uint32_t w[8];
};

inline bool row_less_n(const uint32_t* a, const uint32_t* b, int nw) {
    for (int j = 0; j < nw; j++) {
        if (a[j] != b[j]) return a[j] < b[j];
    }
    return false;
}

inline bool row_eq_n(const uint32_t* a, const uint32_t* b, int nw) {
    for (int j = 0; j < nw; j++)
        if (a[j] != b[j]) return false;
    return true;
}

}  // namespace

// Extract canonical k-mers from codes; sort; unique; optional counts.
// codes: length n of values 0..4. out_kmers capacity: cap rows of nw words.
// out_counts may be null. Returns the number of distinct k-mers, or -1 if
// capacity exceeded, or -2 for invalid k.
//
// The window state rolls in O(nw) per position (not O(k)): the forward
// k-mer is kept right-aligned across 64-bit words and shifted left two bits
// per step; the reverse complement is kept left-aligned in the same 2k-bit
// field and shifted right. Emission converts to the canonical big-endian
// left-aligned uint32 row representation.
namespace {

// LSD radix sort (16-bit digits) for uint64 keys of at most key_bits bits.
// All pass histograms are built in ONE sweep (3 fewer full reads for k=31
// keys) and the scatter prefetches its destination line ~16 elements ahead
// (the scatter is cache-miss bound at multi-MB working sets). Measured
// ~2.4x faster than std::sort at k-mer-count scales; counter blocks are
// per-call (counting runs on a thread pool; no shared statics).
void radix_sort_u64(std::vector<uint64_t>& vals, int key_bits) {
    const int passes = (key_bits + 15) / 16;
    const size_t n = vals.size();
    std::vector<uint64_t> buf(n);
    std::vector<size_t> hist((size_t)passes << 16);
    memset(hist.data(), 0, hist.size() * sizeof(size_t));
    for (size_t i = 0; i < n; i++) {
        const uint64_t v = vals[i];
        for (int p = 0; p < passes; p++)
            hist[((size_t)p << 16) + ((v >> (16 * p)) & 0xFFFF)]++;
    }
    uint64_t* src = vals.data();
    uint64_t* dst = buf.data();
    std::vector<size_t> count(1 << 16);
    for (int p = 0; p < passes; p++) {
        const int shift = 16 * p;
        const size_t* h = &hist[(size_t)p << 16];
        if (h[(src[0] >> shift) & 0xFFFF] == n)
            continue;  // all keys share this digit; pass is a no-op
        size_t total = 0;
        for (int d = 0; d < (1 << 16); d++) {
            count[d] = total;
            total += h[d];
        }
        for (size_t i = 0; i < n; i++) {
            if (i + 16 < n)
                __builtin_prefetch(
                    &dst[count[(src[i + 16] >> shift) & 0xFFFF]], 1, 0);
            dst[count[(src[i] >> shift) & 0xFFFF]++] = src[i];
        }
        std::swap(src, dst);
    }
    if (src != vals.data())
        memcpy(vals.data(), src, n * sizeof(uint64_t));
}

// Fast path for k <= 32: the whole canonical k-mer fits one uint64.
long count_kmers_u64(const int8_t* codes, long n, int k, uint32_t* out_kmers,
                     int64_t* out_counts, long cap) {
    const int nw = (k + 15) / 16;
    const uint64_t mask = (2 * k == 64) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    const int top_shift = 2 * k - 2;

    std::vector<uint64_t> vals;
    vals.reserve(n > k ? n - k + 1 : 0);

    uint64_t fwd = 0, rc = 0;
    long bad = 0, filled = 0;
    for (long t = 0; t < n; t++) {
        const int8_t c = codes[t];
        if (c >= 4) bad = k;
        else if (bad > 0) bad--;
        const uint64_t b = (uint64_t)(c & 3);
        fwd = ((fwd << 2) | b) & mask;
        rc = (rc >> 2) | ((3ULL - b) << top_shift);
        if (++filled < k || bad > 0) continue;
        vals.push_back(fwd < rc ? fwd : rc);
    }
    if (!vals.empty()) radix_sort_u64(vals, 2 * k);

    const int pad_bits = 32 * nw - 2 * k;
    long out = 0;
    for (size_t i = 0; i < vals.size(); i++) {
        if (i == 0 || vals[i] != vals[i - 1]) {
            if (out >= cap) return -1;
            const uint64_t f = vals[i] << pad_bits;  // left-aligned field
            if (nw == 1) {
                out_kmers[out] = (uint32_t)(f & 0xFFFFFFFFULL);
            } else {
                out_kmers[out * 2] = (uint32_t)(f >> 32);
                out_kmers[out * 2 + 1] = (uint32_t)(f & 0xFFFFFFFFULL);
            }
            if (out_counts) out_counts[out] = 1;
            out++;
        } else if (out_counts) {
            out_counts[out - 1]++;
        }
    }
    return out;
}

}  // namespace

long grm_count_kmers(const int8_t* codes, long n, int k, uint32_t* out_kmers,
                     int64_t* out_counts, long cap) {
    if (k < 1 || k > 128) return -2;
    if (k <= 32) return count_kmers_u64(codes, n, k, out_kmers, out_counts, cap);
    const int nw = (k + 15) / 16;          // uint32 words in output rows
    const int nq = (2 * k + 63) / 64;      // uint64 words of rolling state
    const int top_shift = (2 * k - 2) % 64;  // bit slot of the leading base
    const int top_word = (2 * k - 2) / 64;
    const uint64_t top_mask =
        (2 * k % 64) ? ((1ULL << (2 * k % 64)) - 1) : ~0ULL;

    std::vector<KmerRow> rows;
    rows.reserve(n > k ? n - k + 1 : 0);

    uint64_t fwd_q[4] = {0, 0, 0, 0};  // right-aligned, word 0 = least sig
    uint64_t rc_q[4] = {0, 0, 0, 0};
    long bad = 0;
    long filled = 0;  // window warm-up counter

    KmerRow out_row;
    const int pad_bits = 32 * nw - 2 * k;  // left-align shift at emission

    for (long t = 0; t < n; t++) {
        const int8_t c = codes[t];
        if (c >= 4) bad = k;  // poisons the next k windows
        else if (bad > 0) bad--;

        const uint64_t b = (uint64_t)(c & 3);
        // fwd: shift left 2, insert new base at the bottom.
        for (int q = nq - 1; q > 0; q--)
            fwd_q[q] = (fwd_q[q] << 2) | (fwd_q[q - 1] >> 62);
        fwd_q[0] = (fwd_q[0] << 2) | b;
        fwd_q[nq - 1] &= top_mask;
        // rc: shift right 2, insert complement at the top.
        for (int q = 0; q < nq - 1; q++)
            rc_q[q] = (rc_q[q] >> 2) | (rc_q[q + 1] << 62);
        rc_q[nq - 1] >>= 2;
        rc_q[top_word] |= (3ULL - b) << top_shift;

        if (++filled < k || bad > 0) continue;

        // Emit: canonical = min(fwd, rc) in big-endian left-aligned uint32
        // rows. Choose via the right-aligned 2k-bit numeric value (identical
        // ordering).
        const uint64_t* pick = fwd_q;
        for (int q = nq - 1; q >= 0; q--) {
            if (rc_q[q] != fwd_q[q]) {
                if (rc_q[q] < fwd_q[q]) pick = rc_q;
                break;
            }
        }
        // Left-align into 32*nw bits: value << pad_bits over the row words.
        uint64_t shifted[5] = {0, 0, 0, 0, 0};
        const int ws = pad_bits / 64, bs = pad_bits % 64;
        for (int q = 0; q < nq; q++) {
            shifted[q + ws] |= bs ? (pick[q] << bs) : pick[q];
            if (bs && q + ws + 1 < 5) shifted[q + ws + 1] |= pick[q] >> (64 - bs);
        }
        memset(out_row.w, 0, sizeof(out_row.w));
        for (int j = 0; j < nw; j++) {
            // row word j is most-significant-first: bits
            // [32*(nw-j), 32*(nw-1-j)) of the left-aligned field.
            const int bit_lo = 32 * (nw - 1 - j);
            out_row.w[j] =
                (uint32_t)((shifted[bit_lo / 64] >> (bit_lo % 64)) & 0xFFFFFFFFULL);
        }
        rows.push_back(out_row);
    }

    auto cmp = [nw](const KmerRow& a, const KmerRow& b) {
        return row_less_n(a.w, b.w, nw);
    };
    std::sort(rows.begin(), rows.end(), cmp);

    long out = 0;
    for (size_t i = 0; i < rows.size(); i++) {
        if (i == 0 || !row_eq_n(rows[i].w, rows[i - 1].w, nw)) {
            if (out >= cap) return -1;
            memcpy(out_kmers + out * nw, rows[i].w, nw * sizeof(uint32_t));
            if (out_counts) out_counts[out] = 1;
            out++;
        } else if (out_counts) {
            out_counts[out - 1]++;
        }
    }
    return out;
}

// ---------------------------------------------------------------------------
// N-way merge into the union k-mer space (dsk2kover role)
// ---------------------------------------------------------------------------

// Merge n_lists sorted k-mer arrays (rows of nw uint32) into the sorted
// distinct union. lists: concatenated rows; offsets[i]..offsets[i+1] delimit
// list i (in rows). out_union capacity cap rows. out_genome_counts (cap):
// number of source lists containing each union k-mer. Returns union size or
// -1 if capacity exceeded.
long grm_merge_union(const uint32_t* lists, const int64_t* offsets,
                     int n_lists, int nw, uint32_t* out_union,
                     int64_t* out_genome_counts, long cap) {
    // Heap of (list_idx) ordered by current head row.
    std::vector<int64_t> pos(n_lists);
    for (int i = 0; i < n_lists; i++) pos[i] = offsets[i];

    auto head = [&](int i) { return lists + pos[i] * nw; };
    auto heap_cmp = [&](int a, int b) {
        // max-heap by default; invert for min-heap, tie-break on index for
        // determinism.
        const uint32_t* ra = head(a);
        const uint32_t* rb = head(b);
        for (int j = 0; j < nw; j++) {
            if (ra[j] != rb[j]) return ra[j] > rb[j];
        }
        return a > b;
    };

    std::vector<int> heap;
    heap.reserve(n_lists);
    for (int i = 0; i < n_lists; i++) {
        if (pos[i] < offsets[i + 1]) heap.push_back(i);
    }
    std::make_heap(heap.begin(), heap.end(), heap_cmp);

    long out = 0;
    while (!heap.empty()) {
        std::pop_heap(heap.begin(), heap.end(), heap_cmp);
        int i = heap.back();
        heap.pop_back();
        const uint32_t* row = head(i);
        if (out == 0 || !row_eq_n(out_union + (out - 1) * nw, row, nw)) {
            if (out >= cap) return -1;
            memcpy(out_union + out * nw, row, nw * sizeof(uint32_t));
            out_genome_counts[out] = 1;
            out++;
        } else {
            out_genome_counts[out - 1]++;
        }
        pos[i]++;
        if (pos[i] < offsets[i + 1]) {
            heap.push_back(i);
            std::push_heap(heap.begin(), heap.end(), heap_cmp);
        }
    }
    return out;
}

// Fused dsk2kover merge, nw <= 2 fast path (k <= 32, including the k=21/31
// parity oracles): one pass over the N sorted per-genome k-mer lists emits
// the sorted distinct union, per-union genome counts, AND each input
// element's union column (out_cols, aligned with the concatenated input).
// The generic heap merge above compares (nw)-word rows through a lambda per
// step and leaves column assignment to per-genome binary searches
// (grm_union_columns); at 1e8 elements that costs ~30s on this host. Here
// rows collapse to one uint64 key (big-endian word order makes u64 compare
// == lexicographic row compare) driven through a loser-tree tournament:
// log2(N) integer compares per element, no heap function-call machinery,
// and columns fall out of the emission order for free.
long grm_merge_union_cols64(const uint64_t* list_addrs, const int64_t* sizes,
                            int n_lists, int nw, uint32_t* out_union,
                            int32_t* out_genome_counts, int32_t* out_cols,
                            long cap) {
    if (nw < 1 || nw > 2 || n_lists < 1) return -2;

    // Loser tree over M = next_pow2(n_lists) leaves; tree[n] parks the loser
    // at internal node n. cur/rank are sized M so padding leaves carry real
    // sentinel entries (the branchless replay indexes them directly).
    int M = 1;
    while (M < n_lists) M <<= 1;
    // Per-stream cursors. Streams are passed as raw addresses (no host-side
    // concatenation: on this class of VM, first-touch page faults on a fresh
    // concat buffer cost more than the merge itself).
    std::vector<const uint32_t*> ptr(n_lists);
    std::vector<const uint32_t*> end(n_lists);
    std::vector<uint64_t> cur(M, ~0ULL);
    std::vector<int64_t> col_base(n_lists + 1);
    std::vector<int64_t> idx(n_lists);
    // rank orders streams with equal keys; exhausted streams get
    // n_lists + i so a real all-ones key still beats the sentinel.
    std::vector<int> rank(M);
    long remaining = 0;

    auto load = [&](int i) {
        if (ptr[i] >= end[i]) {
            cur[i] = ~0ULL;
            rank[i] = n_lists + i;
            return;
        }
        const uint32_t* row = ptr[i];
        cur[i] = (nw == 1)
                     ? (uint64_t)row[0]
                     : (((uint64_t)row[0] << 32) | (uint64_t)row[1]);
    };
    for (int i = 0; i < M; i++) rank[i] = 2 * M + i;  // padding sentinels
    col_base[0] = 0;
    for (int i = 0; i < n_lists; i++) {
        ptr[i] = (const uint32_t*)(uintptr_t)list_addrs[i];
        end[i] = ptr[i] + sizes[i] * nw;
        idx[i] = 0;
        rank[i] = i;
        col_base[i + 1] = col_base[i] + sizes[i];
        load(i);
        remaining += sizes[i];
    }

    auto less = [&](int a, int b) {
        return cur[a] < cur[b] || (cur[a] == cur[b] && rank[a] < rank[b]);
    };
    std::vector<int> tree(M);
    int winner;
    {
        std::vector<int> up(2 * M);
        for (int i = 0; i < M; i++) up[M + i] = i;
        for (int n = M - 1; n >= 1; n--) {
            int a = up[2 * n], b = up[2 * n + 1];
            int w = less(a, b) ? a : b;
            tree[n] = (w == a) ? b : a;
            up[n] = w;
        }
        winner = up[1];
    }

    long out = 0;
    uint64_t prev = 0;
    while (remaining > 0) {
        int i = winner;
        uint64_t key = cur[i];
        if (out == 0 || key != prev) {
            if (out >= cap) return -1;
            uint32_t* dst = out_union + (long)out * nw;
            if (nw == 1) {
                dst[0] = (uint32_t)key;
            } else {
                dst[0] = (uint32_t)(key >> 32);
                dst[1] = (uint32_t)key;
            }
            out_genome_counts[out] = 0;
            prev = key;
            out++;
        }
        out_genome_counts[out - 1]++;
        out_cols[col_base[i] + idx[i]] = (int32_t)(out - 1);
        idx[i]++;
        ptr[i] += nw;
        remaining--;
        load(i);
        // Branchless replay from leaf i to the root (see
        // grm_merge_union_bits64 for why).
        int node = (M + i) >> 1;
        winner = i;
        uint64_t wk = cur[winner];
        int wr = rank[winner];
        while (node >= 1) {
            const int t = tree[node];
            const uint64_t tk = cur[t];
            const int tr = rank[t];
            const bool sw = (tk < wk) | ((tk == wk) & (tr < wr));
            tree[node] = sw ? winner : t;
            winner = sw ? t : winner;
            wk = sw ? tk : wk;
            wr = sw ? tr : wr;
            node >>= 1;
        }
    }
    return out;
}

// int32-cols variant of grm_set_presence_bits (pairs with the fused merge).
void grm_set_presence_bits32(uint64_t* matrix_row, const int32_t* cols,
                             long n_cols, int bit) {
    const uint64_t mask = 1ULL << (63 - bit);
    for (long i = 0; i < n_cols; i++) matrix_row[cols[i]] |= mask;
}

// Fully fused dsk2kover merge: like grm_merge_union_cols64 but sets the
// packed presence bits DIRECTLY during emission instead of materializing
// per-element column indices. Eliminates the cols buffer (the largest
// output) and the separate bit-set pass; on fault-bound VMs that halves the
// merge stage again. ``matrix`` is (ceil(n_lists/64), cap)-shaped with row
// stride ``matrix_stride`` (elements); rows are zeroed lazily column by
// column as union entries are emitted, so the buffer may be uninitialized
// and only ceil(n_lists/64) x n_union cells are ever touched. Compact with
// grm_compact_rows afterwards.
long grm_merge_union_bits64(const uint64_t* list_addrs, const int64_t* sizes,
                            int n_lists, int nw, uint32_t* out_union,
                            int32_t* out_genome_counts, uint64_t* matrix,
                            long matrix_stride, long cap) {
    if (nw < 1 || nw > 2 || n_lists < 1) return -2;
    const int n_words = (n_lists + 63) >> 6;

    int M = 1;
    while (M < n_lists) M <<= 1;
    // Arrays sized M so padding leaves [n_lists, M) carry real sentinel
    // entries — the branchless replay indexes them directly.
    std::vector<const uint32_t*> ptr(n_lists);
    std::vector<const uint32_t*> end(n_lists);
    std::vector<uint64_t> cur(M, ~0ULL);
    std::vector<int> rank(M);
    long remaining = 0;

    auto load = [&](int i) {
        if (ptr[i] >= end[i]) {
            cur[i] = ~0ULL;
            rank[i] = n_lists + i;
            return;
        }
        const uint32_t* row = ptr[i];
        cur[i] = (nw == 1)
                     ? (uint64_t)row[0]
                     : (((uint64_t)row[0] << 32) | (uint64_t)row[1]);
    };
    for (int i = 0; i < M; i++) rank[i] = 2 * M + i;  // padding sentinels
    for (int i = 0; i < n_lists; i++) {
        ptr[i] = (const uint32_t*)(uintptr_t)list_addrs[i];
        end[i] = ptr[i] + sizes[i] * nw;
        rank[i] = i;
        load(i);
        remaining += sizes[i];
    }

    auto less = [&](int a, int b) {
        return cur[a] < cur[b] || (cur[a] == cur[b] && rank[a] < rank[b]);
    };
    std::vector<int> tree(M);
    int winner;
    {
        std::vector<int> up(2 * M);
        for (int i = 0; i < M; i++) up[M + i] = i;
        for (int n = M - 1; n >= 1; n--) {
            int a = up[2 * n], b = up[2 * n + 1];
            int w = less(a, b) ? a : b;
            tree[n] = (w == a) ? b : a;
            up[n] = w;
        }
        winner = up[1];
    }

    long out = 0;
    uint64_t prev = 0;
    while (remaining > 0) {
        int i = winner;
        uint64_t key = cur[i];
        if (out == 0 || key != prev) {
            if (out >= cap) return -1;
            uint32_t* dst = out_union + (long)out * nw;
            if (nw == 1) {
                dst[0] = (uint32_t)key;
            } else {
                dst[0] = (uint32_t)(key >> 32);
                dst[1] = (uint32_t)key;
            }
            out_genome_counts[out] = 0;
            for (int w = 0; w < n_words; w++) matrix[w * matrix_stride + out] = 0;
            prev = key;
            out++;
        }
        out_genome_counts[out - 1]++;
        matrix[(long)(i >> 6) * matrix_stride + (out - 1)] |=
            1ULL << (63 - (i & 63));
        ptr[i] += nw;
        remaining--;
        load(i);
        // Branchless replay: the loser/winner swap outcome is ~random, so
        // a branchy swap pays a misprediction per level per element (the
        // dominant cost of the flat merge). Conditional-select keeps the
        // pipeline full; keys and ranks compare arithmetically.
        int node = (M + i) >> 1;
        winner = i;
        uint64_t wk = cur[winner];
        int wr = rank[winner];
        while (node >= 1) {
            const int t = tree[node];
            const uint64_t tk = cur[t];
            const int tr = rank[t];
            const bool sw = (tk < wk) | ((tk == wk) & (tr < wr));
            tree[node] = sw ? winner : t;
            winner = sw ? t : winner;
            wk = sw ? tk : wk;
            wr = sw ? tr : wr;
            node >>= 1;
        }
    }
    return out;
}

// Generalization of grm_merge_union_bits64 to any row width nw in [1, 8]
// (k up to 128): the loser tree runs on (row pointer, rank) entries with
// lexicographic multiword compares. Exhausted streams are flagged instead
// of carrying a sentinel key, so every real key value is representable.
// Same output contract as the u64 variant.
long grm_merge_union_bits_rows(const uint64_t* list_addrs, const int64_t* sizes,
                               int n_lists, int nw, uint32_t* out_union,
                               int32_t* out_genome_counts, uint64_t* matrix,
                               long matrix_stride, long cap) {
    if (nw < 1 || nw > 8 || n_lists < 1) return -2;
    const int n_words = (n_lists + 63) >> 6;

    int M = 1;
    while (M < n_lists) M <<= 1;
    // Each stream caches a 64-bit PREFIX of its head row (first two words,
    // big-endian significant): the replay compares prefixes branchlessly
    // like the u64 kernel, and falls to a full-row tie compare only when
    // prefixes are equal (rare for k > 32 — it needs a shared 32-base
    // prefix). cur/rank are sized M so padding leaves hold sentinels.
    std::vector<const uint32_t*> ptr(n_lists);
    std::vector<const uint32_t*> end(n_lists);
    std::vector<uint64_t> cur(M, ~0ULL);
    std::vector<int> rank(M);
    long remaining = 0;

    auto load = [&](int i) {
        if (ptr[i] >= end[i]) {
            cur[i] = ~0ULL;
            rank[i] = n_lists + i;
            return;
        }
        const uint32_t* row = ptr[i];
        cur[i] = (nw == 1)
                     ? (uint64_t)row[0]
                     : (((uint64_t)row[0] << 32) | (uint64_t)row[1]);
    };
    for (int i = 0; i < M; i++) rank[i] = 2 * M + i;  // padding sentinels
    for (int i = 0; i < n_lists; i++) {
        ptr[i] = (const uint32_t*)(uintptr_t)list_addrs[i];
        end[i] = ptr[i] + sizes[i] * nw;
        rank[i] = i;
        load(i);
        remaining += sizes[i];
    }

    // Equal-prefix ordering: exhausted/padding (rank >= n_lists) order by
    // rank (live streams always precede them); live streams compare the
    // tail words, then rank.
    auto tie_less = [&](int a, int b) {
        if (rank[a] >= n_lists || rank[b] >= n_lists)
            return rank[a] < rank[b];
        const uint32_t* ra = ptr[a];
        const uint32_t* rb = ptr[b];
        for (int j = 2; j < nw; j++) {
            if (ra[j] != rb[j]) return ra[j] < rb[j];
        }
        return rank[a] < rank[b];
    };
    auto less = [&](int a, int b) {
        return cur[a] < cur[b] || (cur[a] == cur[b] && tie_less(a, b));
    };
    std::vector<int> tree(M);
    int winner;
    {
        std::vector<int> up(2 * M);
        for (int i = 0; i < M; i++) up[M + i] = i;
        for (int n = M - 1; n >= 1; n--) {
            int a = up[2 * n], b = up[2 * n + 1];
            int w = less(a, b) ? a : b;
            tree[n] = (w == a) ? b : a;
            up[n] = w;
        }
        winner = up[1];
    }

    long out = 0;
    while (remaining > 0) {
        const int i = winner;
        const uint32_t* row = ptr[i];
        if (out == 0 || !row_eq_n(out_union + (out - 1) * nw, row, nw)) {
            if (out >= cap) return -1;
            memcpy(out_union + (long)out * nw, row, nw * sizeof(uint32_t));
            out_genome_counts[out] = 0;
            for (int w = 0; w < n_words; w++) matrix[w * matrix_stride + out] = 0;
            out++;
        }
        out_genome_counts[out - 1]++;
        matrix[(long)(i >> 6) * matrix_stride + (out - 1)] |=
            1ULL << (63 - (i & 63));
        ptr[i] += nw;
        remaining--;
        load(i);
        // Replay: branchless prefix select; the equal-prefix fallback is a
        // predictable rarely-taken branch.
        int node = (M + i) >> 1;
        winner = i;
        uint64_t wk = cur[winner];
        while (node >= 1) {
            const int t = tree[node];
            const uint64_t tk = cur[t];
            bool sw;
            if (tk != wk) {
                sw = tk < wk;
            } else {
                sw = tie_less(t, winner);
            }
            tree[node] = sw ? winner : t;
            winner = sw ? t : winner;
            wk = sw ? tk : wk;
            node >>= 1;
        }
    }
    return out;
}

// Compact rows laid out at src_stride down to dst_stride (dst_stride <=
// src_stride), ascending: buf[r*dst_stride .. +n_cols) = buf[r*src_stride ..).
// Safe in place (see proof in the caller): dst never overruns a later src.
void grm_compact_rows(uint64_t* buf, long n_rows, long n_cols,
                      long src_stride, long dst_stride) {
    for (long r = 1; r < n_rows; r++) {
        memmove(buf + r * dst_stride, buf + r * src_stride,
                n_cols * sizeof(uint64_t));
    }
}

// For one genome's sorted k-mers, find each k-mer's column in the sorted
// union (binary search). Every genome k-mer must exist in the union.
void grm_union_columns(const uint32_t* union_kmers, long n_union,
                       const uint32_t* genome_kmers, long n_genome, int nw,
                       int64_t* out_cols) {
    long lo = 0;
    for (long i = 0; i < n_genome; i++) {
        const uint32_t* key = genome_kmers + i * nw;
        // exploit sortedness of the genome list: restart search at last hit
        long a = lo, b = n_union;
        while (a < b) {
            long mid = (a + b) / 2;
            if (row_less_n(union_kmers + mid * nw, key, nw))
                a = mid + 1;
            else
                b = mid;
        }
        out_cols[i] = a;
        lo = a;
    }
}

// Set genome presence bits into a packed uint64 matrix row (MSB-first):
// matrix_row[col] |= 1 << (63 - bit) for each column.
void grm_set_presence_bits(uint64_t* matrix_row, const int64_t* cols,
                           long n_cols, int bit) {
    const uint64_t mask = 1ULL << (63 - bit);
    for (long i = 0; i < n_cols; i++) matrix_row[cols[i]] |= mask;
}

}  // extern "C"
