// Native sparse Cholesky (LL^T) with batched multi-RHS triangular solves.
//
// This is the framework's direct-solver tier, the role SuiteSparse
// CHOLMOD plays for the reference (src/core.jl:519-523 factors
// G + 10*eps*I once per component; src/core.jl:446-493 back-substitutes
// batches of up to cholmod_batch_size right-hand sides).  Implemented
// from the classic up-looking algorithm: elimination tree + ereach
// symbolic analysis, column-stored numeric factorization, and
// OpenMP-parallel batched forward/backward solves.
//
// The caller is expected to pre-permute the matrix with a fill-reducing
// ordering (the Python binding uses reverse Cuthill-McKee from scipy;
// orderings are one-off setup work, like the reference delegating AMD
// to the CHOLMOD library).
//
// C ABI:
//   chol_factorize(n, indptr, indices, data) -> handle (NULL on failure)
//   chol_solve(handle, b, nrhs)  [b is n*nrhs column-major, in/out]
//   chol_nnz(handle)
//   chol_free(handle)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Factor {
    int64_t n = 0;
    // L stored by column (including the diagonal as the first entry)
    std::vector<int64_t> colptr;
    std::vector<int64_t> rowind;
    std::vector<double> values;
};

// Elimination tree of A (upper triangle of a symmetric CSC matrix),
// with path compression through `ancestor`.
static void etree(int64_t n, const int64_t* Ap, const int64_t* Ai,
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
static int64_t ereach(int64_t n, const int64_t* Ap, const int64_t* Ai,
                      int64_t k, const std::vector<int64_t>& parent,
                      std::vector<int64_t>& stack,
                      std::vector<int64_t>& mark, int64_t tag) {
    int64_t top = n;
    mark[k] = tag;
    for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
        int64_t i = Ai[p];
        if (i >= k) continue;
        int64_t len = 0;
        // climb the etree until we hit a marked node
        for (; mark[i] != tag; i = parent[i]) {
            stack[len++] = i;
            mark[i] = tag;
        }
        // reverse the climbed path onto the output stack
        while (len > 0) stack[--top] = stack[--len];
    }
    return top;
}

}  // namespace

extern "C" {

void* chol_factorize(int64_t n, const int64_t* indptr,
                     const int64_t* indices, const double* data) {
    // Extract the upper triangle pattern (row <= col) of the CSC input.
    std::vector<int64_t> Ap(n + 1, 0), Ai;
    std::vector<double> Ax;
    Ai.reserve(indptr[n]);
    Ax.reserve(indptr[n]);
    for (int64_t j = 0; j < n; ++j) {
        for (int64_t p = indptr[j]; p < indptr[j + 1]; ++p) {
            if (indices[p] <= j) {
                Ai.push_back(indices[p]);
                Ax.push_back(data[p]);
            }
        }
        Ap[j + 1] = static_cast<int64_t>(Ai.size());
    }

    std::vector<int64_t> parent;
    etree(n, Ap.data(), Ai.data(), parent);

    // Symbolic pass: count entries per column of L (excluding diagonal).
    std::vector<int64_t> colcount(n, 0);
    {
        std::vector<int64_t> stack(n), mark(n, -1);
        for (int64_t k = 0; k < n; ++k) {
            int64_t top = ereach(n, Ap.data(), Ai.data(), k, parent, stack,
                                 mark, k);
            for (int64_t t = top; t < n; ++t) colcount[stack[t]]++;
        }
    }

    Factor* F = new Factor();
    F->n = n;
    F->colptr.assign(n + 1, 0);
    for (int64_t j = 0; j < n; ++j)
        F->colptr[j + 1] = F->colptr[j] + colcount[j] + 1;  // +1 diagonal
    int64_t lnz = F->colptr[n];
    F->rowind.assign(lnz, 0);
    F->values.assign(lnz, 0.0);

    // write cursor per column; slot 0 holds the diagonal
    std::vector<int64_t> cnext(n);
    for (int64_t j = 0; j < n; ++j) {
        cnext[j] = F->colptr[j] + 1;
        F->rowind[F->colptr[j]] = j;
    }

    // Numeric up-looking factorization.
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
            // apply column j of L (rows strictly between j and k)
            for (int64_t p = F->colptr[j] + 1; p < cnext[j]; ++p) {
                int64_t r = F->rowind[p];
                if (r < k) x[r] -= F->values[p] * lkj;
            }
            d -= lkj * lkj;
            // store L[k][j] at the tail of column j
            F->values[cnext[j]] = lkj;
            F->rowind[cnext[j]] = k;
            cnext[j]++;
        }
        if (d <= 0.0) {  // not positive definite
            delete F;
            return nullptr;
        }
        F->values[F->colptr[k]] = std::sqrt(d);
    }
    return F;
}

int64_t chol_nnz(void* handle) {
    Factor* F = static_cast<Factor*>(handle);
    return F ? static_cast<int64_t>(F->values.size()) : 0;
}

// Solve L L^T X = B for nrhs columns (B column-major n x nrhs, in/out).
void chol_solve(void* handle, double* B, int64_t nrhs) {
    Factor* F = static_cast<Factor*>(handle);
    const int64_t n = F->n;
    const int64_t* cp = F->colptr.data();
    const int64_t* ri = F->rowind.data();
    const double* vx = F->values.data();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < nrhs; ++r) {
        double* b = B + r * n;
        // forward: L y = b (column scatter)
        for (int64_t j = 0; j < n; ++j) {
            double yj = b[j] / vx[cp[j]];
            b[j] = yj;
            for (int64_t p = cp[j] + 1; p < cp[j + 1]; ++p)
                b[ri[p]] -= vx[p] * yj;
        }
        // backward: L^T x = y (column gather)
        for (int64_t j = n - 1; j >= 0; --j) {
            double s = b[j];
            for (int64_t p = cp[j] + 1; p < cp[j + 1]; ++p)
                s -= vx[p] * b[ri[p]];
            b[j] = s / vx[cp[j]];
        }
    }
}

void chol_free(void* handle) {
    delete static_cast<Factor*>(handle);
}

}  // extern "C"
