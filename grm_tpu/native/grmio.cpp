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
long grm_count_kmers(const int8_t* codes, long n, int k, uint32_t* out_kmers,
                     int64_t* out_counts, long cap) {
    if (k < 1 || k > 128) return -2;
    const int nw = (k + 15) / 16;

    // Collect valid canonical k-mers.
    std::vector<KmerRow> rows;
    rows.reserve(n > k ? n - k + 1 : 0);

    // Sliding validity: count of invalid codes in window.
    long bad = 0;
    for (long i = 0; i < k - 1 && i < n; i++)
        if (codes[i] >= 4) bad++;

    KmerRow fwd, rc;
    for (long t = 0; t + k <= n; t++) {
        if (codes[t + k - 1] >= 4) bad++;
        if (t > 0 && codes[t - 1] >= 4) bad--;
        if (bad == 0) {
            memset(fwd.w, 0, sizeof(fwd.w));
            memset(rc.w, 0, sizeof(rc.w));
            for (int j = 0; j < k; j++) {
                uint32_t c = (uint32_t)(codes[t + j] & 3);
                fwd.w[j / 16] |= c << (30 - 2 * (j % 16));
                uint32_t cc = 3 - (uint32_t)(codes[t + k - 1 - j] & 3);
                rc.w[j / 16] |= cc << (30 - 2 * (j % 16));
            }
            rows.push_back(row_less_n(rc.w, fwd.w, nw) ? rc : fwd);
        }
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
