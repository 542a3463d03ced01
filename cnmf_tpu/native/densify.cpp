// Threaded CSR -> dense expansion (float32 / float64).
//
// The largest host-side cost at atlas scale is expanding the sparse counts /
// TPM matrices into the dense HBM layout the device kernels consume;
// scipy's .toarray() is single-threaded. Rows are independent, so this
// parallelizes embarrassingly with OpenMP. Loaded via ctypes — no pybind11
// dependency (see cnmf_tpu/native/__init__.py for the build-on-first-use
// logic and the scipy fallback).

#include <cstdint>
#include <cstring>

extern "C" {

void densify_csr_f32(const float* data, const int32_t* indices,
                     const int64_t* indptr, int64_t n_rows, int64_t n_cols,
                     float* out) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
        float* row = out + i * n_cols;
        std::memset(row, 0, sizeof(float) * n_cols);
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            row[indices[p]] = data[p];
        }
    }
}

void densify_csr_f64(const double* data, const int32_t* indices,
                     const int64_t* indptr, int64_t n_rows, int64_t n_cols,
                     double* out) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
        double* row = out + i * n_cols;
        std::memset(row, 0, sizeof(double) * n_cols);
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            row[indices[p]] = data[p];
        }
    }
}

// CSR f64/f32 -> dense f32 with direct cast (the common path: float64 h5ad
// counts feeding float32 device buffers without an intermediate f64 dense)
void densify_csr_f64_to_f32(const double* data, const int32_t* indices,
                            const int64_t* indptr, int64_t n_rows,
                            int64_t n_cols, float* out) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
        float* row = out + i * n_cols;
        std::memset(row, 0, sizeof(float) * n_cols);
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            row[indices[p]] = static_cast<float>(data[p]);
        }
    }
}

}  // extern "C"

// One-pass per-column sum / sum-of-squares over CSR nonzeros (the moments
// feeding per-gene mean/variance; numpy needs two bincount passes plus a
// transient squared-data copy). Thread-local accumulators, merged serially —
// n_cols doubles are tiny next to the nnz stream.
#include <vector>

extern "C" {

void csr_col_moments_f64(const double* data, const int32_t* indices,
                         int64_t nnz, int64_t n_cols,
                         double* sum_out, double* sumsq_out) {
#pragma omp parallel
    {
        std::vector<double> ls((size_t)n_cols, 0.0), lq((size_t)n_cols, 0.0);
#pragma omp for schedule(static)
        for (int64_t p = 0; p < nnz; ++p) {
            const double v = data[p];
            const int32_t c = indices[p];
            ls[c] += v;
            lq[c] += v * v;
        }
#pragma omp critical
        {
            for (int64_t j = 0; j < n_cols; ++j) {
                sum_out[j] += ls[j];
                sumsq_out[j] += lq[j];
            }
        }
    }
}

// Column subset of a CSR matrix through a gather table (lookup[j] = output
// column of input column j, or -1 to drop). Two phases so the caller can
// allocate exact-size outputs: a counting pass, then a sequential fill
// (both memory-bound streams; numpy needs ~5 intermediate nnz-length
// arrays for the same result, each paying first-touch faults).
int64_t csr_col_subset_count(const int32_t* indices, int64_t nnz,
                             const int32_t* lookup) {
    int64_t kept = 0;
#pragma omp parallel for schedule(static) reduction(+ : kept)
    for (int64_t p = 0; p < nnz; ++p) {
        kept += lookup[indices[p]] >= 0 ? 1 : 0;
    }
    return kept;
}

void csr_col_subset_fill_f64(const double* data, const int32_t* indices,
                             const int64_t* indptr, int64_t n_rows,
                             const int32_t* lookup, double* out_data,
                             int32_t* out_indices, int64_t* out_indptr) {
    int64_t pos = 0;
    out_indptr[0] = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            const int32_t nc = lookup[indices[p]];
            if (nc >= 0) {
                out_data[pos] = data[p];
                out_indices[pos] = nc;
                ++pos;
            }
        }
        out_indptr[i + 1] = pos;
    }
}

void csr_col_subset_fill_f32(const float* data, const int32_t* indices,
                             const int64_t* indptr, int64_t n_rows,
                             const int32_t* lookup, float* out_data,
                             int32_t* out_indices, int64_t* out_indptr) {
    int64_t pos = 0;
    out_indptr[0] = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            const int32_t nc = lookup[indices[p]];
            if (nc >= 0) {
                out_data[pos] = data[p];
                out_indices[pos] = nc;
                ++pos;
            }
        }
        out_indptr[i + 1] = pos;
    }
}

void csr_col_moments_f32(const float* data, const int32_t* indices,
                         int64_t nnz, int64_t n_cols,
                         double* sum_out, double* sumsq_out) {
#pragma omp parallel
    {
        std::vector<double> ls((size_t)n_cols, 0.0), lq((size_t)n_cols, 0.0);
#pragma omp for schedule(static)
        for (int64_t p = 0; p < nnz; ++p) {
            const double v = (double)data[p];
            const int32_t c = indices[p];
            ls[c] += v;
            lq[c] += v * v;
        }
#pragma omp critical
        {
            for (int64_t j = 0; j < n_cols; ++j) {
                sum_out[j] += ls[j];
                sumsq_out[j] += lq[j];
            }
        }
    }
}

}  // extern "C"
