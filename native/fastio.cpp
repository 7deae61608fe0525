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
#include <algorithm>
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

// --- fast %g-style formatter -------------------------------------------
//
// snprintf("%.12g") costs ~350ns/value on this class of host; with only
// a couple of cores, that alone is ~90s for a 16-point maps-on pairwise
// job (240 one-million-cell grids).  This formatter emits the same
// %g-style text (trailing zeros stripped, scientific notation outside
// [1e-4, 10^sig)) at ~25ns/value by scaling into a uint64 of `sig`
// significant digits.  The last digit can differ from a correctly
// rounded printf by one ulp-of-the-last-place (relative ~10^-(sig-1)),
// far below every output tolerance in the suite (atol 1e-6,
// src/out.jl:119-121 semantics).

namespace {

double g_pow10[660];        // 10^(k-330) for k in [0, 660)
unsigned long long g_p10i[20];
char g_digit2[200];         // "00".."99" pairs

struct Pow10Init {
    Pow10Init() {
        for (int k = 0; k < 660; ++k) g_pow10[k] = std::pow(10.0, k - 330);
        g_p10i[0] = 1;
        for (int k = 1; k < 20; ++k) g_p10i[k] = g_p10i[k - 1] * 10ULL;
        for (int k = 0; k < 100; ++k) {
            g_digit2[2 * k] = (char)('0' + k / 10);
            g_digit2[2 * k + 1] = (char)('0' + k % 10);
        }
    }
} g_pow10_init;

// digits of D (with `nd` digits) into dig[], two at a time
inline void extract_digits(unsigned long long D, int nd, char* dig) {
    int i = nd;
    while (i >= 2) {
        unsigned q = (unsigned)(D % 100);
        D /= 100;
        i -= 2;
        dig[i] = g_digit2[2 * q];
        dig[i + 1] = g_digit2[2 * q + 1];
    }
    if (i) dig[0] = (char)('0' + (unsigned)(D % 10));
}

inline double pow10d(int e) { return g_pow10[e + 330]; }

inline int fmt_value_fast(double v, char* buf, int sig) {
    if (v != v) { std::memcpy(buf, "nan", 3); return 3; }
    int n = 0;
    if (std::signbit(v)) { buf[n++] = '-'; v = -v; }
    if (v == 0) { buf[n++] = '0'; return n; }
    if (std::isinf(v)) { std::memcpy(buf + n, "inf", 3); return n + 3; }

    // integral fast path (NODATA -9999, zero-filled regions, ids)
    double r = std::floor(v);
    if (r == v && v < (double)g_p10i[sig]) {
        unsigned long long u = (unsigned long long)v;
        char tmp[24];
        int k = 0;
        do { tmp[k++] = (char)('0' + (u % 10)); u /= 10; } while (u);
        while (k) buf[n++] = tmp[--k];
        return n;
    }

    // decimal exponent: e10 = floor(log10(v)), via the binary exponent
    unsigned long long bits;
    std::memcpy(&bits, &v, 8);
    int e2 = (int)((bits >> 52) & 0x7FF) - 1022;   // frexp exponent
    if (e2 == -1022) {                             // subnormal (rare)
        std::frexp(v, &e2);
    }
    int e10 = (int)std::floor((e2 - 1) * 0.30102999566398119521);
    if (e10 < 307 && v >= pow10d(e10 + 1)) ++e10;
    else if (v < pow10d(e10)) --e10;

    // scale to exactly `sig` digits
    int shift = sig - 1 - e10;
    double scaled;
    if (shift > 300) scaled = (v * 1e300) * pow10d(shift - 300);
    else if (shift < -300) scaled = (v * 1e-300) * pow10d(shift + 300);
    else scaled = v * pow10d(shift);
    unsigned long long D = (unsigned long long)(scaled + 0.5);
    if (D >= g_p10i[sig]) { D /= 10; ++e10; }
    else if (D < g_p10i[sig - 1]) {        // e10 estimate one too high (rare)
        --e10; ++shift;
        if (shift > 300) scaled = (v * 1e300) * pow10d(shift - 300);
        else if (shift < -300) scaled = (v * 1e-300) * pow10d(shift + 300);
        else scaled = v * pow10d(shift);
        D = (unsigned long long)(scaled + 0.5);
        if (D >= g_p10i[sig]) { D /= 10; ++e10; }
    }

    int nd = sig;
    while (nd > 1 && D % 10 == 0) { D /= 10; --nd; }
    char dig[20];
    extract_digits(D, nd, dig);

    if (e10 >= -4 && e10 < sig) {
        if (e10 >= nd - 1) {                 // integer, maybe trailing zeros
            std::memcpy(buf + n, dig, nd); n += nd;
            for (int i = 0; i < e10 - (nd - 1); ++i) buf[n++] = '0';
        } else if (e10 >= 0) {               // ddd.ddd
            std::memcpy(buf + n, dig, e10 + 1); n += e10 + 1;
            buf[n++] = '.';
            std::memcpy(buf + n, dig + e10 + 1, nd - e10 - 1);
            n += nd - e10 - 1;
        } else {                             // 0.000ddd
            buf[n++] = '0'; buf[n++] = '.';
            for (int i = 0; i < -e10 - 1; ++i) buf[n++] = '0';
            std::memcpy(buf + n, dig, nd); n += nd;
        }
    } else {                                 // d.ddde±XX
        buf[n++] = dig[0];
        if (nd > 1) {
            buf[n++] = '.';
            std::memcpy(buf + n, dig + 1, nd - 1); n += nd - 1;
        }
        buf[n++] = 'e';
        int e = e10;
        if (e < 0) { buf[n++] = '-'; e = -e; } else buf[n++] = '+';
        if (e >= 100) { buf[n++] = (char)('0' + e / 100); e %= 100;
                        buf[n++] = (char)('0' + e / 10); }
        else buf[n++] = (char)('0' + e / 10);
        buf[n++] = (char)('0' + e % 10);
    }
    return n;
}

// shared body-writer loop, parameterized on the element reader
template <typename T, typename Fmt>
long long write_body(const char* path, const T* data, long long nrows,
                     long long ncols, Fmt fmt, char sep = ' ',
                     bool append = true) {
    FILE* f = fopen(path, append ? "ab" : "wb");
    if (!f) return -1;
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
                const T* row = data + r * ncols;
                for (long long c = 0; c < ncols; ++c) {
                    if (c) *p++ = sep;
                    p += fmt(row[c], p);
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

}  // namespace

extern "C" {

// Fast %g-style body writers: `sig` significant digits, trailing zeros
// stripped.  f64 and f32 entry points (the device maps path holds f32).
long long csio_write_asc_body_fast(const char* path, const double* data,
                                   long long nrows, long long ncols,
                                   int sig) {
    if (sig < 1) sig = 1;
    if (sig > 17) sig = 17;
    return write_body(path, data, nrows, ncols,
                      [sig](double v, char* p) {
                          return fmt_value_fast(v, p, sig);
                      });
}

long long csio_write_asc_body_f32(const char* path, const float* data,
                                  long long nrows, long long ncols,
                                  int sig) {
    if (sig < 1) sig = 1;
    if (sig > 17) sig = 17;
    return write_body(path, data, nrows, ncols,
                      [sig](float v, char* p) {
                          return fmt_value_fast((double)v, p, sig);
                      });
}

// Append the grid body (space-separated %.12g, one line per row) to an
// already-open path (caller wrote the 6 header lines).  Returns bytes
// written, or -1 on IO error.
long long csio_write_asc_body(const char* path, const double* data,
                              long long nrows, long long ncols) {
    return write_body(path, data, nrows, ncols,
                      [](double v, char* p) { return fmt_value(v, p); });
}

// Node currents from one (H x W) voltage map and the four directed
// weight planes (we, ws, wse, wne — zero where no edge): the
// max(inflow, outflow) / cutoff*max-branch semantics of
// solve/stencil.py node_currents_np (src/out.jl:178-290), in f32.
// The maps-on pairwise pipeline computes one of these per written
// pair on writer-pool threads; the numpy version cost ~150 ms/map of
// GIL-holding time, this runs ~10 ms and releases the GIL via ctypes.
// Tab/space-separated f64 matrix writer (Julia writedlm analogue):
// truncates the file, `sig` significant digits per value.  Network
// node/branch current text outputs (src/out.jl:117-124) route here.
long long csio_write_dlm(const char* path, const double* data,
                         long long nrows, long long ncols, int sig,
                         char sep) {
    if (sig < 1) sig = 1;
    if (sig > 17) sig = 17;
    return write_body(path, data, nrows, ncols,
                      [sig](double v, char* p) {
                          return fmt_value_fast(v, p, sig);
                      }, sep, false);
}

long long csio_node_currents_f32(const float* we, const float* ws,
                                 const float* wse, const float* wne,
                                 const float* V, float* out,
                                 long long H, long long W, float cutoff) {
    if (H <= 0 || W <= 0) return 0;
    const long long n = H * W;
    // directions: {dr, dc}; weight of dir d at cell (i,j) is
    // plane_d[(i+wro_d)*W + (j+wco_d)] with the listed offsets
    struct Dir { int dr, dc, wro, wco; const float* w; };
    const Dir dirs[8] = {
        {0, 1, 0, 0, we},  {0, -1, 0, -1, we},
        {1, 0, 0, 0, ws},  {-1, 0, -1, 0, ws},
        {1, 1, 0, 0, wse}, {-1, -1, -1, -1, wse},
        {-1, 1, 0, 0, wne}, {1, -1, 1, -1, wne},
    };

    float maxb = 0.0f;
    for (int d = 0; d < 8; ++d) {
        const Dir& D = dirs[d];
        const long long i0 = std::max(0, -D.dr),
                        i1 = H - std::max(0, D.dr);
        const long long j0 = std::max(0, -D.dc),
                        j1 = W - std::max(0, D.dc);
        const long long woff = (long long)D.wro * W + D.wco;
        const long long voff = (long long)D.dr * W + D.dc;
        for (long long i = i0; i < i1; ++i) {
            const long long base = i * W;
            for (long long j = j0; j < j1; ++j) {
                const long long k = base + j;
                float f = D.w[k + woff] * (V[k + voff] - V[k]);
                float a = f < 0 ? -f : f;
                if (a > maxb) maxb = a;
            }
        }
    }
    const float thr = cutoff * maxb;

    std::vector<float> inflow((size_t)n, 0.0f), outflow((size_t)n, 0.0f);
    for (int d = 0; d < 8; ++d) {
        const Dir& D = dirs[d];
        const long long i0 = std::max(0, -D.dr),
                        i1 = H - std::max(0, D.dr);
        const long long j0 = std::max(0, -D.dc),
                        j1 = W - std::max(0, D.dc);
        const long long woff = (long long)D.wro * W + D.wco;
        const long long voff = (long long)D.dr * W + D.dc;
        for (long long i = i0; i < i1; ++i) {
            const long long base = i * W;
            for (long long j = j0; j < j1; ++j) {
                const long long k = base + j;
                float f = D.w[k + woff] * (V[k + voff] - V[k]);
                float a = f < 0 ? -f : f;
                if (a < thr) continue;
                if (f > 0) inflow[k] += f;
                else outflow[k] -= f;
            }
        }
    }
    for (long long k = 0; k < n; ++k)
        out[k] = inflow[k] > outflow[k] ? inflow[k] : outflow[k];
    return n;
}

}  // extern "C"
