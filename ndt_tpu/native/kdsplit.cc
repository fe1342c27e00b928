// Native kd-tree leaf-cell builder — exact replica of the reference's
// kd_tree_split_node (kd-tree.c:294-419) as re-derived in
// ndt_tpu/utils/kdtree.py:build_c_exact:
//   * exhaustive candidate splits at every item's lower-2eps / upper+2eps,
//     scanned dim-major then item-major (lower before upper), strict score
//     improvement: score = n - (|left-right| + 2*straddling);
//   * straddling items duplicated into BOTH children, unlimited recursion
//     (the reference builds with levels_remaining = min_per_node = -1);
//   * a node with no useful split becomes a leaf: every item in it gets the
//     accumulated clip cell.
// The scene compiler uses the resulting per-item leaf cells to gate
// orthotope EPSILON-shell hits exactly like the C's traversal.  The Python
// implementation is O(d n^2) per split with interpreter-speed loops
// (~0.5 s at 600 objects per frame); this runs the identical f64 arithmetic
// at native speed.  C ABI via ctypes; output buffers are malloc'd here and
// released with ndt_kd_cells_free.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Builder {
    const double *lo;   // [n, d]
    const double *hi;
    int64_t n, d;
    double eps;
    std::vector<double> boxes;   // flat [count, d, 2]
    std::vector<int32_t> items;  // [count]

    void leaf(const std::vector<int64_t> &idx, const double *cell_lo,
              const double *cell_hi) {
        for (int64_t it : idx) {
            items.push_back(static_cast<int32_t>(it));
            for (int64_t k = 0; k < d; ++k) {
                boxes.push_back(cell_lo[k]);
                boxes.push_back(cell_hi[k]);
            }
        }
    }

    void split(const std::vector<int64_t> &idx, std::vector<double> cell_lo,
               std::vector<double> cell_hi) {
        const int64_t m = static_cast<int64_t>(idx.size());
        double best_score = -INFINITY;
        int64_t best_dim = -1;
        double best_pos = 0.0;
        for (int64_t dd = 0; dd < d; ++dd) {
            for (int64_t i = 0; i < m; ++i) {
                // candidate order: item-major, lower before upper
                const double cands[2] = {lo[idx[i] * d + dd] - 2.0 * eps,
                                         hi[idx[i] * d + dd] + 2.0 * eps};
                for (int c = 0; c < 2; ++c) {
                    const double pos = cands[c];
                    int64_t left = 0, right = 0;
                    for (int64_t j = 0; j < m; ++j) {
                        if (hi[idx[j] * d + dd] < pos - eps) ++left;
                        if (lo[idx[j] * d + dd] > pos + eps) ++right;
                    }
                    if (left == 0 || right == 0) continue;
                    const int64_t straddle = m - left - right;
                    const double score =
                        m - (std::llabs(left - right) + 2.0 * straddle);
                    if (score > best_score) {
                        best_score = score;
                        best_dim = dd;
                        best_pos = pos;
                    }
                }
            }
        }
        if (best_dim < 0) {
            leaf(idx, cell_lo.data(), cell_hi.data());
            return;
        }
        std::vector<int64_t> left_idx, right_idx;
        for (int64_t j : idx) {
            if (lo[j * d + best_dim] <= best_pos + eps) left_idx.push_back(j);
            if (hi[j * d + best_dim] >= best_pos - eps) right_idx.push_back(j);
        }
        std::vector<double> l_hi = cell_hi;
        if (best_pos + eps < l_hi[best_dim]) l_hi[best_dim] = best_pos + eps;
        std::vector<double> r_lo = cell_lo;
        if (best_pos - eps > r_lo[best_dim]) r_lo[best_dim] = best_pos - eps;
        split(left_idx, cell_lo, l_hi);
        split(right_idx, r_lo, cell_hi);
    }
};

}  // namespace

extern "C" {

// Returns the number of leaf boxes; *out_boxes = malloc'd [count, d, 2] f64,
// *out_items = malloc'd [count] i32.  Caller frees via ndt_kd_cells_free.
int64_t ndt_kd_cells(const double *lo, const double *hi, int64_t n,
                     int64_t d, double eps, double **out_boxes,
                     int32_t **out_items) {
    Builder b;
    b.lo = lo;
    b.hi = hi;
    b.n = n;
    b.d = d;
    b.eps = eps;
    if (n > 0) {
        std::vector<int64_t> idx(n);
        for (int64_t i = 0; i < n; ++i) idx[i] = i;
        std::vector<double> cell_lo(d, -INFINITY), cell_hi(d, INFINITY);
        b.split(idx, cell_lo, cell_hi);
    }
    const int64_t count = static_cast<int64_t>(b.items.size());
    *out_boxes = static_cast<double *>(malloc(sizeof(double) * b.boxes.size()));
    *out_items = static_cast<int32_t *>(malloc(sizeof(int32_t) * count));
    memcpy(*out_boxes, b.boxes.data(), sizeof(double) * b.boxes.size());
    memcpy(*out_items, b.items.data(), sizeof(int32_t) * count);
    return count;
}

void ndt_kd_cells_free(double *boxes, int32_t *items) {
    free(boxes);
    free(items);
}

}  // extern "C"
