// Native ingest: FASTA/FASTQ parsing + base encoding at memory
// bandwidth, feeding the TPU pipeline's packed read batches.
//
// Role: the reference pipeline's throughput-critical ingest is native
// (Jellyfish's C++ parsers — SURVEY.md §3.2); this is the rebuild's
// equivalent for the host side of the host->device boundary.  The
// Python layer (shannon_tpu/native/__init__.py) loads this via ctypes
// and falls back to the pure-Python parser when the shared object is
// unavailable (e.g. no compiler).
//
// API (C, ctypes-friendly):
//   sti_count_records(path) -> number of records, or -1 on error
//   sti_parse_pack(path, pad_len, codes_out[n*pad_len],
//                  lengths_out[n], n) -> records filled, or -1
//
// Records longer than pad_len are truncated; positions past a read's
// length hold 4 (BASE_INVALID), matching shannon_tpu.io.pack.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// A=0 C=1 G=2 T=3 (U=T), everything else invalid=4; matches
// shannon_tpu/io/dna.py exactly.
struct Lut {
    uint8_t t[256];
    Lut() {
        memset(t, 4, sizeof(t));
        t['A'] = t['a'] = 0;
        t['C'] = t['c'] = 1;
        t['G'] = t['g'] = 2;
        t['T'] = t['t'] = 3;
        t['U'] = t['u'] = 3;
    }
};
const Lut LUT;

struct Reader {
    FILE* f;
    char* buf;
    size_t cap;
    explicit Reader(const char* path) : f(fopen(path, "rb")), buf(nullptr), cap(0) {}
    ~Reader() {
        if (f) fclose(f);
        free(buf);
    }
    // getline without trailing newline; returns length or -1 at EOF
    long line() {
        ssize_t n = getline(&buf, &cap, f);
        if (n < 0) return -1;
        while (n > 0 && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) --n;
        buf[n] = 0;
        return n;
    }
};

enum Fmt { FMT_FASTA, FMT_FASTQ, FMT_BAD };

Fmt sniff(Reader& r, long& first_len) {
    for (;;) {
        first_len = r.line();
        if (first_len < 0) return FMT_BAD;
        if (first_len == 0) continue;
        if (r.buf[0] == '>') return FMT_FASTA;
        if (r.buf[0] == '@') return FMT_FASTQ;
        return FMT_BAD;
    }
}

}  // namespace

extern "C" {

// Count records (so Python can allocate exact-size arrays).
long sti_count_records(const char* path) {
    Reader r(path);
    if (!r.f) return -1;
    long first;
    Fmt fmt = sniff(r, first);
    if (fmt == FMT_BAD) return -1;
    long count = 1;  // sniff consumed the first header
    if (fmt == FMT_FASTA) {
        long n;
        while ((n = r.line()) >= 0)
            if (n > 0 && r.buf[0] == '>') ++count;
    } else {
        // FASTQ: 4 lines per record
        long lines = 1, n;
        while ((n = r.line()) >= 0) ++lines;
        if (lines % 4 != 0) return -1;  // truncated file
        count = lines / 4;
    }
    return count;
}

// Parse + encode into caller-allocated buffers.  Returns records
// written or -1 on error.
long sti_parse_pack(const char* path, int32_t pad_len, uint8_t* codes,
                    int32_t* lengths, long max_records) {
    Reader r(path);
    if (!r.f) return -1;
    long first;
    Fmt fmt = sniff(r, first);
    if (fmt == FMT_BAD) return -1;

    long rec = 0;
    if (fmt == FMT_FASTA) {
        int32_t len = 0;
        uint8_t* row = codes;
        bool open = true;  // a record is open (header already consumed)
        long n;
        auto close_rec = [&]() {
            for (int32_t i = len; i < pad_len; ++i) row[i] = 4;
            lengths[rec] = len;
            ++rec;
        };
        while ((n = r.line()) >= 0) {
            if (n > 0 && r.buf[0] == '>') {
                if (rec >= max_records) return -1;
                close_rec();
                row = codes + rec * (long)pad_len;
                len = 0;
                open = true;
            } else {
                for (long i = 0; i < n && len < pad_len; ++i)
                    row[len++] = LUT.t[(uint8_t)r.buf[i]];
            }
        }
        if (open) {
            if (rec >= max_records) return -1;
            close_rec();
        }
    } else {
        long n;
        for (;;) {
            // current line buffer holds the header (sniff or loop end)
            n = r.line();  // sequence
            if (n < 0) return -1;
            if (rec >= max_records) return -1;
            uint8_t* row = codes + rec * (long)pad_len;
            int32_t len = 0;
            for (long i = 0; i < n && len < pad_len; ++i)
                row[len++] = LUT.t[(uint8_t)r.buf[i]];
            for (int32_t i = len; i < pad_len; ++i) row[i] = 4;
            lengths[rec] = len;
            ++rec;
            if (r.line() < 0) return -1;  // '+'
            if (r.line() < 0) return -1;  // quals
            long h = r.line();            // next header (or EOF)
            if (h < 0) break;
            if (h == 0 || r.buf[0] != '@') return -1;
        }
    }
    return rec;
}

}  // extern "C"
