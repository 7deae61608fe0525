// Fast raster-text IO for circuitscape_tpu.
//
// The maps-on pairwise path writes hundreds of per-pair ASCII grids
// (the reference writes the same files through GDAL's AAIGrid driver,
// src/out.jl:485-531).  Python-side "%.12g" row formatting costs
// ~1 s per 1M-cell map and dominated maps-on jobs; this formatter hits
// the same "%.12g" text (C printf semantics are what CPython's float
// formatting uses) at ~10x the throughput, and ctypes releases the GIL
// so a writer thread genuinely overlaps device compute.
//
// Build: part of `make` in this directory (libcsio.so).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// Format one double as %.12g into buf, return length.
// Fast path for integral values in the exact-int range (NODATA -9999,
// zero fills, log-transformed sentinels) — avoids snprintf for the
// most common cells in sparse current maps.
inline int fmt_value(double v, char* buf) {
    double r = v >= 0 ? std::floor(v) : std::ceil(v);
    if (r == v && std::fabs(v) < 1e12 && !(v == 0 && std::signbit(v))) {
        long long i = (long long)v;
        // hand-rolled lltoa (snprintf "%lld" is ~2x slower)
        char tmp[24];
        int k = 0;
        unsigned long long u = i < 0 ? (unsigned long long)(-i) : (unsigned long long)i;
        do { tmp[k++] = (char)('0' + (u % 10)); u /= 10; } while (u);
        int n = 0;
        if (i < 0) buf[n++] = '-';
        while (k) buf[n++] = tmp[--k];
        return n;
    }
    return snprintf(buf, 32, "%.12g", v);
}

}  // namespace

extern "C" {

// Append the grid body (space-separated %.12g, one line per row) to an
// already-open path (caller wrote the 6 header lines).  Returns bytes
// written, or -1 on IO error.
long long csio_write_asc_body(const char* path, const double* data,
                              long long nrows, long long ncols) {
    FILE* f = fopen(path, "ab");
    if (!f) return -1;
    // buffer a batch of rows; each value worst-case ~26 chars + sep
    const long long ROWS_PER_FLUSH =
        (ncols > 0) ? ((1 << 22) / (28 * ncols) + 1) : 1;
    int nth = 1;
#if defined(_OPENMP)
    nth = omp_get_max_threads();
    if (nth > 8) nth = 8;
#endif
    const size_t row_bytes = (size_t)(28 * ncols + 2);
    std::vector<std::vector<char>> bufs(nth);
    std::vector<size_t> lens(nth);
    long long total = 0;
    bool io_err = false;
    for (long long r0 = 0; r0 < nrows && !io_err; r0 += ROWS_PER_FLUSH * nth) {
        // format nth sub-batches in parallel, write them in order
#if defined(_OPENMP)
#pragma omp parallel for num_threads(nth) schedule(static, 1)
#endif
        for (int t = 0; t < nth; ++t) {
            long long a = r0 + (long long)t * ROWS_PER_FLUSH;
            long long b = a + ROWS_PER_FLUSH < nrows ? a + ROWS_PER_FLUSH : nrows;
            lens[t] = 0;
            if (a >= b) continue;
            if (bufs[t].size() < (size_t)(b - a) * row_bytes)
                bufs[t].resize((size_t)(b - a) * row_bytes);
            char* p = bufs[t].data();
            for (long long r = a; r < b; ++r) {
                const double* row = data + r * ncols;
                for (long long c = 0; c < ncols; ++c) {
                    if (c) *p++ = ' ';
                    p += fmt_value(row[c], p);
                }
                *p++ = '\n';
            }
            lens[t] = (size_t)(p - bufs[t].data());
        }
        for (int t = 0; t < nth; ++t) {
            if (!lens[t]) continue;
            if (fwrite(bufs[t].data(), 1, lens[t], f) != lens[t]) {
                io_err = true;
                break;
            }
            total += (long long)lens[t];
        }
    }
    fclose(f);
    return io_err ? -1 : total;
}

}  // extern "C"
