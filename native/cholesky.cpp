// Native sparse Cholesky (LL^T) with batched multi-RHS triangular solves.
//
// This is the framework's direct-solver tier, the role SuiteSparse
// CHOLMOD plays for the reference (src/core.jl:519-523 factors
// G + 10*eps*I once per component; src/core.jl:446-493 back-substitutes
// batches of up to cholmod_batch_size right-hand sides).
//
// Two engines:
//   1. Supernodal left-looking factorization with dense BLAS-3 kernels
//      (dpotrf/dtrsm/dgemm), the same architecture as CHOLMOD itself:
//      fundamental supernodes from the elimination tree + column counts,
//      relaxed amalgamation for wider panels, pending-update linked
//      lists, and blocked multi-RHS solves (one pass over L per RHS
//      block instead of one per RHS).  BLAS comes from an existing
//      shared library (the Python binding passes scipy's bundled
//      OpenBLAS) loaded via dlopen — no new dependencies.
//   2. The original scalar up-looking engine (etree + ereach symbolic,
//      column-stored numeric) as a fallback when no BLAS library is
//      available, and as a cross-check oracle (CS_CHOL_SCALAR=1).
//
// C ABI:
//   chol_set_blas(path)          -> 1 on success (enables supernodal)
//   chol_order(n, indptr, indices, perm_out)   fill-reducing ordering
//   chol_factorize(n, indptr, indices, data, perm) -> handle (NULL on
//       failure); perm (from chol_order, or NULL) is applied internally
//   chol_solve(handle, b, nrhs)  [b is (n x nrhs) C-contiguous
//       row-major in ORIGINAL node order, in/out]
//   chol_nnz(handle)
//   chol_free(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <dlfcn.h>

#ifdef _OPENMP
#include <omp.h>
#endif

#include <chrono>

namespace {
double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}
}  // namespace

namespace {

// ---------------------------------------------------------------------
// BLAS via dlopen.  All integer arguments are passed as pointers to
// int64_t: correct for ILP64 builds, and on little-endian also correct
// for LP64 builds (the callee reads the low 4 bytes; all our dimensions
// fit in 31 bits).
// ---------------------------------------------------------------------
typedef void (*dpotrf_t)(const char*, const int64_t*, double*,
                         const int64_t*, int64_t*);
typedef void (*dtrsm_t)(const char*, const char*, const char*, const char*,
                        const int64_t*, const int64_t*, const double*,
                        const double*, const int64_t*, double*,
                        const int64_t*);
typedef void (*dgemm_t)(const char*, const char*, const int64_t*,
                        const int64_t*, const int64_t*, const double*,
                        const double*, const int64_t*, const double*,
                        const int64_t*, const double*, double*,
                        const int64_t*);

struct Blas {
    dpotrf_t dpotrf = nullptr;
    dtrsm_t dtrsm = nullptr;
    dgemm_t dgemm = nullptr;
    bool ok() const { return dpotrf && dtrsm && dgemm; }
};

Blas g_blas;

void* sym(void* h, const char* base) {
    // try plain, underscore, and scipy-prefixed spellings
    char buf[64];
    void* p = dlsym(h, base);
    if (p) return p;
    snprintf(buf, sizeof buf, "%s_", base);
    p = dlsym(h, buf);
    if (p) return p;
    snprintf(buf, sizeof buf, "scipy_%s_", base);
    p = dlsym(h, buf);
    if (p) return p;
    snprintf(buf, sizeof buf, "scipy_%s", base);
    return dlsym(h, buf);
}

// ---------------------------------------------------------------------
// Shared symbolic machinery
// ---------------------------------------------------------------------

// Elimination tree of A (upper triangle of a symmetric CSC matrix),
// with path compression through `ancestor`.
void etree(int64_t n, const int64_t* Ap, const int64_t* Ai,
           std::vector<int64_t>& parent) {
    parent.assign(n, -1);
    std::vector<int64_t> ancestor(n, -1);
    for (int64_t k = 0; k < n; ++k) {
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int64_t i = Ai[p];
            while (i != -1 && i < k) {
                int64_t next = ancestor[i];
                ancestor[i] = k;
                if (next == -1) parent[i] = k;
                i = next;
            }
        }
    }
}

// Row pattern of row k of L: reach of A[0:k, k) in the etree.
// Returns entries in topological (ascending elimination) order packed
// at the END of `stack`; returns the start index.
int64_t ereach(int64_t n, const int64_t* Ap, const int64_t* Ai, int64_t k,
               const std::vector<int64_t>& parent,
               std::vector<int64_t>& stack, std::vector<int64_t>& mark,
               int64_t tag) {
    int64_t top = n;
    mark[k] = tag;
    for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
        int64_t i = Ai[p];
        if (i >= k) continue;
        int64_t len = 0;
        for (; mark[i] != tag; i = parent[i]) {
            stack[len++] = i;
            mark[i] = tag;
        }
        while (len > 0) stack[--top] = stack[--len];
    }
    return top;
}

// ---------------------------------------------------------------------
// Engine 1: scalar up-looking (fallback / oracle)
// ---------------------------------------------------------------------
struct ScalarFactor {
    int64_t n = 0;
    std::vector<int64_t> colptr;  // L by column, diagonal first
    std::vector<int64_t> rowind;
    std::vector<double> values;
};

ScalarFactor* scalar_factorize(int64_t n, const std::vector<int64_t>& Ap,
                               const std::vector<int64_t>& Ai,
                               const std::vector<double>& Ax,
                               const std::vector<int64_t>& parent) {
    std::vector<int64_t> colcount(n, 0);
    {
        std::vector<int64_t> stack(n), mark(n, -1);
        for (int64_t k = 0; k < n; ++k) {
            int64_t top = ereach(n, Ap.data(), Ai.data(), k, parent, stack,
                                 mark, k);
            for (int64_t t = top; t < n; ++t) colcount[stack[t]]++;
        }
    }

    ScalarFactor* F = new ScalarFactor();
    F->n = n;
    F->colptr.assign(n + 1, 0);
    for (int64_t j = 0; j < n; ++j)
        F->colptr[j + 1] = F->colptr[j] + colcount[j] + 1;  // +1 diagonal
    int64_t lnz = F->colptr[n];
    F->rowind.assign(lnz, 0);
    F->values.assign(lnz, 0.0);

    std::vector<int64_t> cnext(n);
    for (int64_t j = 0; j < n; ++j) {
        cnext[j] = F->colptr[j] + 1;
        F->rowind[F->colptr[j]] = j;
    }

    std::vector<int64_t> stack(n), mark(n, -1);
    std::vector<double> x(n, 0.0);
    for (int64_t k = 0; k < n; ++k) {
        int64_t top = ereach(n, Ap.data(), Ai.data(), k, parent, stack,
                             mark, n + k);
        double d = 0.0;
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            if (Ai[p] < k)
                x[Ai[p]] = Ax[p];
            else if (Ai[p] == k)
                d = Ax[p];
        }
        for (int64_t t = top; t < n; ++t) {
            int64_t j = stack[t];
            double lkj = x[j] / F->values[F->colptr[j]];
            x[j] = 0.0;
            for (int64_t p = F->colptr[j] + 1; p < cnext[j]; ++p) {
                int64_t r = F->rowind[p];
                if (r < k) x[r] -= F->values[p] * lkj;
            }
            d -= lkj * lkj;
            F->values[cnext[j]] = lkj;
            F->rowind[cnext[j]] = k;
            cnext[j]++;
        }
        if (d <= 0.0) {
            delete F;
            return nullptr;
        }
        F->values[F->colptr[k]] = std::sqrt(d);
    }
    return F;
}

void scalar_solve(const ScalarFactor* F, double* B, int64_t nrhs) {
    const int64_t n = F->n;
    const int64_t* cp = F->colptr.data();
    const int64_t* ri = F->rowind.data();
    const double* vx = F->values.data();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < nrhs; ++r) {
        double* b = B + r * n;
        for (int64_t j = 0; j < n; ++j) {
            double yj = b[j] / vx[cp[j]];
            b[j] = yj;
            for (int64_t p = cp[j] + 1; p < cp[j + 1]; ++p)
                b[ri[p]] -= vx[p] * yj;
        }
        for (int64_t j = n - 1; j >= 0; --j) {
            double s = b[j];
            for (int64_t p = cp[j] + 1; p < cp[j + 1]; ++p)
                s -= vx[p] * b[ri[p]];
            b[j] = s / vx[cp[j]];
        }
    }
}

// ---------------------------------------------------------------------
// Engine 2: supernodal left-looking with BLAS-3 panels
// ---------------------------------------------------------------------
struct SuperFactor {
    int64_t n = 0;
    int64_t nsuper = 0;
    int64_t lnz = 0;               // total panel entries
    std::vector<int64_t> sn_start;  // first column of each supernode (+end)
    std::vector<int64_t> rptr;      // row-pattern offsets per supernode
    std::vector<int64_t> rows;      // concatenated sorted row patterns
    std::vector<int64_t> pptr;      // panel value offsets per supernode
    std::vector<double> panels;     // column-major ns x w dense panels
    std::vector<int64_t> col2sn;    // column -> supernode
};

// Relaxed amalgamation over the computed fundamental patterns: greedily
// merge adjacent supernodes while the exact merged panel (|union| x w)
// stays within (1+tau) of the sum of the panels it replaces.  Unions
// are exact (sorted-merge of the two patterns), so padding is bounded
// by construction.  Wider panels = fewer, bigger BLAS calls.
void amalgamate_patterns(std::vector<int64_t>& sn_start,
                         std::vector<std::vector<int64_t>>& pat) {
    // CHOLMOD-style width-tiered relaxation: narrow supernodes merge
    // readily (per-call BLAS overhead dominates there), wide ones only
    // when nearly pattern-identical.
    auto tau = [](int64_t w) {
        if (w <= 8) return 1.00;    // allow up to 2x entries
        if (w <= 16) return 0.40;
        if (w <= 48) return 0.20;
        return 0.08;
    };
    const int64_t max_w = 96;
    std::vector<int64_t> new_start;
    std::vector<std::vector<int64_t>> new_pat;
    std::vector<int64_t> merged;
    size_t i = 0;
    const size_t nsn = pat.size();
    while (i < nsn) {
        int64_t j0 = sn_start[i];
        int64_t w = sn_start[i + 1] - j0;
        std::vector<int64_t> cur = std::move(pat[i]);
        int64_t exact = static_cast<int64_t>(cur.size()) * w;
        size_t k = i + 1;
        while (k < nsn) {
            int64_t w2 = sn_start[k + 1] - sn_start[k];
            if (w + w2 > max_w) break;
            const std::vector<int64_t>& nxt = pat[k];
            merged.clear();
            std::set_union(cur.begin(), cur.end(), nxt.begin(), nxt.end(),
                           std::back_inserter(merged));
            int64_t cost = static_cast<int64_t>(merged.size()) * (w + w2);
            int64_t base = exact + static_cast<int64_t>(nxt.size()) * w2;
            if (cost > (1.0 + tau(w + w2)) * base) break;
            cur.swap(merged);
            w += w2;
            exact = base;
            ++k;
        }
        new_start.push_back(j0);
        new_pat.push_back(std::move(cur));
        i = k;
    }
    new_start.push_back(sn_start.back());
    sn_start.swap(new_start);
    pat.swap(new_pat);
}

SuperFactor* super_factorize(int64_t n, const std::vector<int64_t>& Up,
                             const std::vector<int64_t>& Ui,
                             const std::vector<int64_t>& Lp,
                             const std::vector<int64_t>& Li,
                             const std::vector<double>& Lx,
                             const std::vector<int64_t>& parent) {
    // column counts (excluding diagonal) via ereach over rows
    std::vector<int64_t> colcount(n, 0);
    {
        std::vector<int64_t> stack(n), mark(n, -1);
        for (int64_t k = 0; k < n; ++k) {
            int64_t top = ereach(n, Up.data(), Ui.data(), k, parent, stack,
                                 mark, k);
            for (int64_t t = top; t < n; ++t) colcount[stack[t]]++;
        }
    }

    // fundamental supernodes
    SuperFactor* F = new SuperFactor();
    F->n = n;
    F->sn_start.push_back(0);
    for (int64_t j = 1; j < n; ++j) {
        bool chain = (parent[j - 1] == j) &&
                     (colcount[j - 1] == colcount[j] + 1);
        if (!chain) F->sn_start.push_back(j);
    }
    F->sn_start.push_back(n);
    F->nsuper = static_cast<int64_t>(F->sn_start.size()) - 1;

    F->col2sn.assign(n, 0);
    for (int64_t s = 0; s < F->nsuper; ++s)
        for (int64_t j = F->sn_start[s]; j < F->sn_start[s + 1]; ++j)
            F->col2sn[j] = s;

    // row pattern per supernode: own columns + union of A-lower rows of
    // its columns and the beyond-column rows of child supernodes
    std::vector<std::vector<int64_t>> children(F->nsuper);
    std::vector<char> flag(n, 0);
    std::vector<int64_t> scratch;
    F->rptr.assign(F->nsuper + 1, 0);
    // two passes: sizes then fill (children lists built incrementally, so
    // single pass with temporary per-supernode vectors, then flatten)
    std::vector<std::vector<int64_t>> pat(F->nsuper);
    for (int64_t s = 0; s < F->nsuper; ++s) {
        int64_t j0 = F->sn_start[s], j1 = F->sn_start[s + 1];
        scratch.clear();
        for (int64_t j = j0; j < j1; ++j) {
            if (!flag[j]) { flag[j] = 1; scratch.push_back(j); }
            for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p) {
                int64_t r = Li[p];
                if (!flag[r]) { flag[r] = 1; scratch.push_back(r); }
            }
        }
        for (int64_t d : children[s]) {
            int64_t d1 = F->sn_start[d + 1];
            const std::vector<int64_t>& pd = pat[d];
            // rows beyond d's columns
            for (int64_t r : pd) {
                if (r < d1) continue;
                if (!flag[r]) { flag[r] = 1; scratch.push_back(r); }
            }
        }
        std::sort(scratch.begin(), scratch.end());
        for (int64_t r : scratch) flag[r] = 0;
        pat[s] = scratch;
        // attach to parent supernode (first row beyond own columns)
        int64_t w = j1 - j0;
        if (static_cast<int64_t>(scratch.size()) > w) {
            int64_t pr = scratch[w];
            children[F->col2sn[pr]].push_back(s);
        }
    }
    children.clear();

    // widen panels (exact unions, bounded padding), rebuild column map
    amalgamate_patterns(F->sn_start, pat);
    F->nsuper = static_cast<int64_t>(F->sn_start.size()) - 1;
    for (int64_t s = 0; s < F->nsuper; ++s)
        for (int64_t j = F->sn_start[s]; j < F->sn_start[s + 1]; ++j)
            F->col2sn[j] = s;
    F->rptr.assign(F->nsuper + 1, 0);

    // flatten patterns, allocate panels
    for (int64_t s = 0; s < F->nsuper; ++s)
        F->rptr[s + 1] = F->rptr[s] + static_cast<int64_t>(pat[s].size());
    F->rows.resize(F->rptr[F->nsuper]);
    F->pptr.assign(F->nsuper + 1, 0);
    for (int64_t s = 0; s < F->nsuper; ++s) {
        std::copy(pat[s].begin(), pat[s].end(),
                  F->rows.begin() + F->rptr[s]);
        int64_t ns = static_cast<int64_t>(pat[s].size());
        int64_t w = F->sn_start[s + 1] - F->sn_start[s];
        F->pptr[s + 1] = F->pptr[s] + ns * w;
    }
    pat.clear();
    F->lnz = F->pptr[F->nsuper];
    F->panels.assign(F->lnz, 0.0);

    // numeric left-looking with pending-update lists
    std::vector<int64_t> relind(n, -1);          // global row -> local row
    std::vector<int64_t> head(F->nsuper, -1);    // pending list heads
    std::vector<int64_t> nextd(F->nsuper, -1);   // list links
    std::vector<int64_t> dpos(F->nsuper, 0);     // cursor into pattern(d)
    int64_t max_panel_rows = 0, max_w = 0;
    for (int64_t s = 0; s < F->nsuper; ++s) {
        max_panel_rows = std::max(max_panel_rows, F->rptr[s + 1] - F->rptr[s]);
        max_w = std::max(max_w, F->sn_start[s + 1] - F->sn_start[s]);
    }
    std::vector<double> C(static_cast<size_t>(max_panel_rows) * max_w);

    const int64_t one = 1;
    (void)one;
    for (int64_t s = 0; s < F->nsuper; ++s) {
        int64_t j0 = F->sn_start[s], j1 = F->sn_start[s + 1];
        int64_t w = j1 - j0;
        int64_t ns = F->rptr[s + 1] - F->rptr[s];
        const int64_t* Rs = &F->rows[F->rptr[s]];
        double* P = &F->panels[F->pptr[s]];

        for (int64_t t = 0; t < ns; ++t) relind[Rs[t]] = t;

        // scatter A's lower columns (incl. diagonal) into the panel
        for (int64_t j = j0; j < j1; ++j) {
            double* col = P + (j - j0) * ns;
            col[relind[j]] = 0.0;  // ensure diagonal slot exists
            for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p)
                col[relind[Li[p]]] = Lx[p];
        }
        // include the diagonal entries stored in the lower CSC? The
        // lower CSC includes rows >= j, so the loop above already set
        // the diagonal.  (Lp/Li/Lx carry rows >= j per column.)

        // drain pending updates
        int64_t d = head[s];
        while (d != -1) {
            int64_t next_in_list = nextd[d];
            int64_t d_ns = F->rptr[d + 1] - F->rptr[d];
            int64_t d_w = F->sn_start[d + 1] - F->sn_start[d];
            const int64_t* Rd = &F->rows[F->rptr[d]];
            const double* Pd = &F->panels[F->pptr[d]];
            int64_t k0 = dpos[d];
            int64_t k1 = k0;
            while (k1 < d_ns && Rd[k1] < j1) ++k1;
            int64_t m = d_ns - k0;   // rows participating (>= j0)
            int64_t nn = k1 - k0;    // rows landing in s's columns
            // C(m x nn) = Pd[k0:, :] * Pd[k0:k1, :]^T
            {
                const double alpha = 1.0, beta = 0.0;
                const char* tN = "N";
                const char* tT = "T";
                g_blas.dgemm(tN, tT, &m, &nn, &d_w, &alpha, Pd + k0, &d_ns,
                             Pd + k0, &d_ns, &beta, C.data(), &m);
            }
            // scatter-subtract lower part into the panel.  After
            // amalgamation a row of d's (padded) pattern may be absent
            // from s's pattern (relind == -1); such a row's products are
            // exactly zero (disjoint column support inside d's panel),
            // so skipping it is lossless.
            for (int64_t t = 0; t < nn; ++t) {
                int64_t col = relind[Rd[k0 + t]];  // local col == local row
                if (col < 0) continue;
                double* dst = P + col * ns;
                const double* src = C.data() + t * m;
                for (int64_t u = t; u < m; ++u) {
                    int64_t ri = relind[Rd[k0 + u]];
                    if (ri >= 0) dst[ri] -= src[u];
                }
            }
            // advance d to its next consumer supernode
            dpos[d] = k1;
            if (k1 < d_ns) {
                int64_t sn = F->col2sn[Rd[k1]];
                nextd[d] = head[sn];
                head[sn] = d;
            }
            d = next_in_list;
        }

        // dense factorization of the panel
        {
            int64_t info = 0;
            const char* lo = "L";
            g_blas.dpotrf(lo, &w, P, &ns, &info);
            if (info != 0) {
                for (int64_t t = 0; t < ns; ++t) relind[Rs[t]] = -1;
                delete F;
                return nullptr;
            }
            int64_t mb = ns - w;
            if (mb > 0) {
                const double alpha = 1.0;
                const char* R = "R";
                const char* lo2 = "L";
                const char* T = "T";
                const char* N = "N";
                g_blas.dtrsm(R, lo2, T, N, &mb, &w, &alpha, P, &ns, P + w,
                             &ns);
                // queue s's own below-diagonal block as a pending update
                dpos[s] = w;
                int64_t sn = F->col2sn[Rs[w]];
                nextd[s] = head[sn];
                head[sn] = s;
            }
        }

        for (int64_t t = 0; t < ns; ++t) relind[Rs[t]] = -1;
    }
    return F;
}

// Solve in RHS-transposed layout: Bt is (nrhs x n) column-major, i.e.
// the nrhs values of each (permuted-order) row sit contiguously; every
// supernode then reads/writes contiguous (nrhs x w) blocks instead of
// w rows strided across the whole RHS matrix.
void super_solve(const SuperFactor* F, double* Bt, int64_t nrhs) {
    int64_t max_m = 0;
    for (int64_t s = 0; s < F->nsuper; ++s) {
        int64_t ns = F->rptr[s + 1] - F->rptr[s];
        int64_t w = F->sn_start[s + 1] - F->sn_start[s];
        max_m = std::max(max_m, ns - w);
    }
    std::vector<double> U(static_cast<size_t>(std::max<int64_t>(max_m, 1)) *
                          nrhs);
    const double one = 1.0, neg = -1.0, zero = 0.0;
    const char *L = "L", *T = "T", *N = "N", *R = "R";
    const bool prof = getenv("CS_CHOL_PROF") != nullptr;
    double t_trsm = 0, t_gemm = 0, t_scat = 0, t0;

    // forward: L y = b  (solved as Y^T = B^T L^-T, all blocks contiguous)
    for (int64_t s = 0; s < F->nsuper; ++s) {
        int64_t j0 = F->sn_start[s], j1 = F->sn_start[s + 1];
        int64_t w = j1 - j0;
        int64_t ns = F->rptr[s + 1] - F->rptr[s];
        int64_t m = ns - w;
        const double* P = &F->panels[F->pptr[s]];
        double* X = Bt + j0 * nrhs;  // (nrhs x w), ld nrhs
        if (prof) t0 = now_s();
        g_blas.dtrsm(R, L, T, N, &nrhs, &w, &one, P, &ns, X, &nrhs);
        if (prof) t_trsm += now_s() - t0;
        if (m > 0) {
            // U^T (nrhs x m) = Y^T * P_below^T
            if (prof) t0 = now_s();
            g_blas.dgemm(N, T, &nrhs, &m, &w, &one, X, &nrhs, P + w, &ns,
                         &zero, U.data(), &nrhs);
            if (prof) {
                t_gemm += now_s() - t0;
                t0 = now_s();
            }
            const int64_t* Rb = &F->rows[F->rptr[s] + w];
            for (int64_t t = 0; t < m; ++t) {
                double* b = Bt + Rb[t] * nrhs;
                const double* u = U.data() + t * nrhs;
                for (int64_t r = 0; r < nrhs; ++r) b[r] -= u[r];
            }
            if (prof) t_scat += now_s() - t0;
        }
    }
    // backward: L^T x = y  (X^T = (Y^T - X_pat^T P_below) L^-1)
    for (int64_t s = F->nsuper - 1; s >= 0; --s) {
        int64_t j0 = F->sn_start[s], j1 = F->sn_start[s + 1];
        int64_t w = j1 - j0;
        int64_t ns = F->rptr[s + 1] - F->rptr[s];
        int64_t m = ns - w;
        const double* P = &F->panels[F->pptr[s]];
        double* X = Bt + j0 * nrhs;
        if (m > 0) {
            const int64_t* Rb = &F->rows[F->rptr[s] + w];
            if (prof) t0 = now_s();
            for (int64_t t = 0; t < m; ++t) {
                const double* b = Bt + Rb[t] * nrhs;
                double* u = U.data() + t * nrhs;
                for (int64_t r = 0; r < nrhs; ++r) u[r] = b[r];
            }
            if (prof) {
                t_scat += now_s() - t0;
                t0 = now_s();
            }
            g_blas.dgemm(N, N, &nrhs, &w, &m, &neg, U.data(), &nrhs, P + w,
                         &ns, &one, X, &nrhs);
            if (prof) t_gemm += now_s() - t0;
        }
        if (prof) t0 = now_s();
        g_blas.dtrsm(R, L, N, N, &nrhs, &w, &one, P, &ns, X, &nrhs);
        if (prof) t_trsm += now_s() - t0;
    }

    if (prof)
        fprintf(stderr,
                "chol_solve prof: nsuper=%lld trsm=%.3fs gemm=%.3fs "
                "scatter=%.3fs\n",
                static_cast<long long>(F->nsuper), t_trsm, t_gemm, t_scat);
}

// ---------------------------------------------------------------------
// Handle wrapper
// ---------------------------------------------------------------------
struct Handle {
    ScalarFactor* scalar = nullptr;
    SuperFactor* super = nullptr;
    std::vector<int64_t> perm;  // new label -> original label
    ~Handle() {
        delete scalar;
        delete super;
    }
};

}  // namespace

extern "C" {

// Fill-reducing ordering: level-set nested dissection (recursive BFS
// bisection with the median level-set as separator, ordered after both
// halves), leaf blocks in reverse Cuthill-McKee-style BFS order.  The
// native analogue of CHOLMOD delegating to AMD/METIS.  In-place over
// segment ranges of `perm`, so memory is O(n).
void chol_order(int64_t n, const int64_t* indptr, const int64_t* indices,
                int64_t* perm) {
    const int64_t leaf = 128;
    std::vector<int64_t> tag(n, 0);       // segment id per node
    std::vector<int64_t> level(n, -1);
    std::vector<int64_t> frontier, nextf, scratch;
    frontier.reserve(1024);
    nextf.reserve(1024);
    for (int64_t i = 0; i < n; ++i) perm[i] = i;

    struct Seg {
        int64_t lo, hi, id;
    };
    std::vector<Seg> stack;
    stack.push_back({0, n, 1});
    for (int64_t i = 0; i < n; ++i) tag[i] = 1;
    int64_t next_id = 2;

    auto bfs = [&](int64_t start, int64_t seg_id) -> int64_t {
        // levels within the segment; returns the last-visited node
        frontier.clear();
        frontier.push_back(start);
        level[start] = 0;
        int64_t last = start, d = 0;
        while (!frontier.empty()) {
            ++d;
            nextf.clear();
            for (int64_t u : frontier) {
                for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
                    int64_t v = indices[p];
                    if (tag[v] == seg_id && level[v] == -1) {
                        level[v] = d;
                        nextf.push_back(v);
                        last = v;
                    }
                }
            }
            frontier.swap(nextf);
        }
        return last;
    };

    while (!stack.empty()) {
        Seg sg = stack.back();
        stack.pop_back();
        int64_t m = sg.hi - sg.lo;
        if (m <= 1) continue;
        int64_t* seg = perm + sg.lo;

        // reset levels for this segment
        for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
        int64_t far = bfs(seg[0], sg.id);

        // disconnected? split reached/unreached and retry both
        bool disconnected = false;
        for (int64_t t = 0; t < m; ++t)
            if (level[seg[t]] == -1) {
                disconnected = true;
                break;
            }
        if (disconnected) {
            scratch.assign(seg, seg + m);
            int64_t a = 0, b = m;
            for (int64_t v : scratch) {
                if (level[v] != -1)
                    seg[a++] = v;
                else
                    seg[--b] = v;
            }
            std::reverse(seg + b, seg + m);
            int64_t id1 = next_id++, id2 = next_id++;
            for (int64_t t = 0; t < a; ++t) tag[seg[t]] = id1;
            for (int64_t t = a; t < m; ++t) tag[seg[t]] = id2;
            stack.push_back({sg.lo, sg.lo + a, id1});
            stack.push_back({sg.lo + a, sg.hi, id2});
            continue;
        }

        if (m <= leaf) {
            // connected leaf: RCM-style ordering (reverse BFS discovery
            // from the far node)
            for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
            bfs(far, sg.id);
            scratch.assign(seg, seg + m);
            std::sort(scratch.begin(), scratch.end(),
                      [&](int64_t x, int64_t y) {
                          return level[x] > level[y];
                      });
            std::copy(scratch.begin(), scratch.end(), seg);
            for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
            continue;
        }

        // second BFS from the pseudo-peripheral node
        for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
        bfs(far, sg.id);
        int64_t maxlv = 0;
        for (int64_t t = 0; t < m; ++t)
            maxlv = std::max(maxlv, level[seg[t]]);
        if (maxlv < 2) {
            // too shallow to bisect: RCM the whole segment
            scratch.assign(seg, seg + m);
            std::sort(scratch.begin(), scratch.end(),
                      [&](int64_t x, int64_t y) {
                          return level[x] > level[y];
                      });
            std::copy(scratch.begin(), scratch.end(), seg);
            for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
            continue;
        }
        int64_t mid = maxlv / 2;
        // partition [left | right | separator], separator ordered last
        scratch.assign(seg, seg + m);
        int64_t a = 0;
        for (int64_t v : scratch)
            if (level[v] < mid) seg[a++] = v;
        int64_t r = a;
        for (int64_t v : scratch)
            if (level[v] > mid) seg[r++] = v;
        int64_t s2 = r;
        for (int64_t v : scratch)
            if (level[v] == mid) seg[s2++] = v;
        int64_t id1 = next_id++, id2 = next_id++, id3 = next_id++;
        for (int64_t t = 0; t < a; ++t) tag[seg[t]] = id1;
        for (int64_t t = a; t < r; ++t) tag[seg[t]] = id2;
        for (int64_t t = r; t < m; ++t) tag[seg[t]] = id3;  // sep: done
        for (int64_t t = 0; t < m; ++t) level[seg[t]] = -1;
        stack.push_back({sg.lo, sg.lo + a, id1});
        stack.push_back({sg.lo + a, sg.lo + r, id2});
    }
}

int chol_set_blas(const char* path) {
    if (g_blas.ok()) return 1;
    void* h = dlopen(path, RTLD_NOW | RTLD_GLOBAL);
    if (!h) return 0;
    g_blas.dpotrf = reinterpret_cast<dpotrf_t>(sym(h, "dpotrf"));
    g_blas.dtrsm = reinterpret_cast<dtrsm_t>(sym(h, "dtrsm"));
    g_blas.dgemm = reinterpret_cast<dgemm_t>(sym(h, "dgemm"));
    // pin BLAS to one thread: our panels are small/mid-sized, and the
    // thread-pool handoff dominates at those shapes (the reference pins
    // BLAS threads off the same way, src/Circuitscape.jl:18-20)
    typedef void (*setnt_t)(int);
    auto setnt =
        reinterpret_cast<setnt_t>(dlsym(h, "openblas_set_num_threads"));
    if (!setnt)
        setnt = reinterpret_cast<setnt_t>(
            dlsym(h, "scipy_openblas_set_num_threads"));
    if (setnt) setnt(1);
    return g_blas.ok() ? 1 : 0;
}

void* chol_factorize(int64_t n, const int64_t* indptr,
                     const int64_t* indices, const double* data,
                     const int64_t* perm) {
    // apply the fill-reducing permutation (perm may be NULL = identity)
    // while splitting the symmetric CSC input into upper (row <= col,
    // for the etree/ereach symbolics) and lower (row >= col, for panel
    // scatter).  Unsorted rows within a column are fine for both.
    std::vector<int64_t> inv(n);
    for (int64_t i = 0; i < n; ++i) inv[perm ? perm[i] : i] = i;
    std::vector<int64_t> Up(n + 1, 0), Ui, Lp(n + 1, 0), Li;
    std::vector<double> Ux, Lx;
    Ui.reserve(indptr[n] / 2 + n);
    Ux.reserve(indptr[n] / 2 + n);
    Li.reserve(indptr[n] / 2 + n);
    Lx.reserve(indptr[n] / 2 + n);
    for (int64_t j = 0; j < n; ++j) {
        int64_t oj = perm ? perm[j] : j;
        for (int64_t p = indptr[oj]; p < indptr[oj + 1]; ++p) {
            int64_t r = inv[indices[p]];
            if (r <= j) {
                Ui.push_back(r);
                Ux.push_back(data[p]);
            }
            if (r >= j) {
                Li.push_back(r);
                Lx.push_back(data[p]);
            }
        }
        Up[j + 1] = static_cast<int64_t>(Ui.size());
        Lp[j + 1] = static_cast<int64_t>(Li.size());
    }

    std::vector<int64_t> parent;
    etree(n, Up.data(), Ui.data(), parent);

    Handle* H = new Handle();
    H->perm.resize(n);
    for (int64_t i = 0; i < n; ++i) H->perm[i] = perm ? perm[i] : i;
    bool use_scalar = !g_blas.ok() || getenv("CS_CHOL_SCALAR");
    if (use_scalar) {
        H->scalar = scalar_factorize(n, Up, Ui, Ux, parent);
        if (!H->scalar) {
            delete H;
            return nullptr;
        }
    } else {
        H->super = super_factorize(n, Up, Ui, Lp, Li, Lx, parent);
        if (!H->super) {
            delete H;
            return nullptr;
        }
    }
    return H;
}

int64_t chol_nnz(void* handle) {
    Handle* H = static_cast<Handle*>(handle);
    if (!H) return 0;
    if (H->scalar) return static_cast<int64_t>(H->scalar->values.size());
    if (H->super) return H->super->lnz;
    return 0;
}

// B is C-contiguous (n x nrhs) row-major in ORIGINAL (unpermuted) node
// order, solved in place.  Row-major means each node's nrhs values sit
// contiguously — the layout the supernodal solve wants, so the permuted
// gather is a contiguous row copy per node.
void chol_solve(void* handle, double* B, int64_t nrhs) {
    Handle* H = static_cast<Handle*>(handle);
    const int64_t n = H->perm.size();
    const int64_t* perm = H->perm.data();
    const bool prof = getenv("CS_CHOL_PROF") != nullptr;
    double t0 = prof ? now_s() : 0;
    if (H->super) {
        // RHS columns are independent through both triangular sweeps:
        // split them across cores, each thread with its own transposed
        // buffer (the reference's CHOLMOD gets the same effect from
        // threaded BLAS; here the panels are too small for that)
        int nth = 1;
#if defined(_OPENMP)
        nth = omp_get_max_threads();
        if (nth > 8) nth = 8;
        if (nrhs < 2 * nth) nth = std::max<int64_t>(1, nrhs / 2);
#endif
        if (prof) t0 = now_s();
#if defined(_OPENMP)
#pragma omp parallel for num_threads(nth) schedule(static, 1)
#endif
        for (int t = 0; t < nth; ++t) {
            int64_t c0 = nrhs * t / nth, c1 = nrhs * (t + 1) / nth;
            int64_t cn = c1 - c0;
            if (cn <= 0) continue;
            std::vector<double> Btc(static_cast<size_t>(n) * cn);
            for (int64_t i = 0; i < n; ++i)
                std::memcpy(&Btc[i * cn], B + perm[i] * nrhs + c0,
                            sizeof(double) * cn);
            super_solve(H->super, Btc.data(), cn);
            for (int64_t i = 0; i < n; ++i)
                std::memcpy(B + perm[i] * nrhs + c0, &Btc[i * cn],
                            sizeof(double) * cn);
        }
        if (prof) fprintf(stderr, "chol_solve super (%d threads): %.3fs\n",
                          nth, now_s() - t0);
    } else {
        // scalar engine works on (n x nrhs) column-major
        std::vector<double> Bt(static_cast<size_t>(n) * nrhs);
        for (int64_t r = 0; r < nrhs; ++r)
            for (int64_t i = 0; i < n; ++i)
                Bt[r * n + i] = B[perm[i] * nrhs + r];
        scalar_solve(H->scalar, Bt.data(), nrhs);
        for (int64_t r = 0; r < nrhs; ++r)
            for (int64_t i = 0; i < n; ++i)
                B[perm[i] * nrhs + r] = Bt[r * n + i];
    }
}

void chol_free(void* handle) { delete static_cast<Handle*>(handle); }

}  // extern "C"
