// Native binned-SAH BVH builder.
// ----------------------------------------------------------------------------
// The host-side scene-build hot path: building acceleration structures for
// large meshes is serial, branchy work that belongs in C++ (the reference
// gets this from OptiX Trbvh; here it is our own builder). Produces the
// exact same flattened layout as the numpy reference builder in
// bifrost3d_tpu/geometry/bvh.py (depth-first, left child = parent + 1):
//   node_min/node_max : [n, 3] AABBs
//   node_a            : leaf -> first prim slot; internal -> right child
//   node_count        : leaf -> prim count (> 0); internal -> 0
//   prim_order        : triangle ids reordered so leaves are contiguous
// Exposed with a C ABI for ctypes.
// ----------------------------------------------------------------------------

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int N_BINS = 16;
constexpr float TRAVERSAL_COST = 1.0f;
constexpr float INTERSECT_COST = 1.0f;

struct Vec3 {
    double x = 0, y = 0, z = 0;
    void min_with(const float* p) {
        x = std::min(x, (double)p[0]); y = std::min(y, (double)p[1]); z = std::min(z, (double)p[2]);
    }
    void max_with(const float* p) {
        x = std::max(x, (double)p[0]); y = std::max(y, (double)p[1]); z = std::max(z, (double)p[2]);
    }
    double operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

inline double surface(const Vec3& lo, const Vec3& hi) {
    double dx = std::max(0.0, hi.x - lo.x);
    double dy = std::max(0.0, hi.y - lo.y);
    double dz = std::max(0.0, hi.z - lo.z);
    return 2.0 * (dx * dy + dy * dz + dx * dz);
}

struct Builder {
    const float* tri_min;   // [t][3]
    const float* tri_max;   // [t][3]
    std::vector<double> centroid;  // [t][3]
    int t;
    int max_leaf;

    float* node_min;
    float* node_max;
    int32_t* node_a;
    int32_t* node_count;
    int32_t* prim_order;
    int n_nodes = 0;

    struct Work { int first, count, patch_parent; };

    int run() {
        for (int i = 0; i < t; ++i) prim_order[i] = i;
        centroid.resize((size_t)t * 3);
        for (int i = 0; i < t; ++i)
            for (int c = 0; c < 3; ++c)
                centroid[(size_t)i * 3 + c] =
                    0.5 * ((double)tri_min[i * 3 + c] + (double)tri_max[i * 3 + c]);

        std::vector<Work> stack;
        stack.push_back({0, t, -1});
        std::vector<int32_t> scratch(t);

        while (!stack.empty()) {
            Work w = stack.back();
            stack.pop_back();
            int me = n_nodes++;
            if (w.patch_parent >= 0) node_a[w.patch_parent] = me;

            Vec3 lo{1e30, 1e30, 1e30}, hi{-1e30, -1e30, -1e30};
            Vec3 clo{1e30, 1e30, 1e30}, chi{-1e30, -1e30, -1e30};
            for (int s = 0; s < w.count; ++s) {
                int id = prim_order[w.first + s];
                lo.min_with(tri_min + id * 3);
                hi.max_with(tri_max + id * 3);
                for (int c = 0; c < 3; ++c) {
                    double v = centroid[(size_t)id * 3 + c];
                    if (c == 0) { clo.x = std::min(clo.x, v); chi.x = std::max(chi.x, v); }
                    if (c == 1) { clo.y = std::min(clo.y, v); chi.y = std::max(chi.y, v); }
                    if (c == 2) { clo.z = std::min(clo.z, v); chi.z = std::max(chi.z, v); }
                }
            }
            for (int c = 0; c < 3; ++c) {
                node_min[me * 3 + c] = (float)lo[c];
                node_max[me * 3 + c] = (float)hi[c];
            }

            int best_axis = -1;
            double best_plane = 0.0;
            if (w.count > max_leaf)
                find_split(w, lo, hi, clo, chi, best_axis, best_plane);

            if (w.count <= max_leaf) {
                node_a[me] = w.first;
                node_count[me] = w.count;
                continue;
            }

            int n_left = 0;
            if (best_axis >= 0) {
                // Partition by plane, stable.
                int r = 0;
                for (int s = 0; s < w.count; ++s) {
                    int id = prim_order[w.first + s];
                    if (centroid[(size_t)id * 3 + best_axis] < best_plane)
                        prim_order[w.first + n_left++] = id;
                    else
                        scratch[r++] = id;
                }
                std::memcpy(prim_order + w.first + n_left, scratch.data(),
                            sizeof(int32_t) * r);
            }
            if (best_axis < 0 || n_left == 0 || n_left == w.count) {
                // Median split on the widest axis (SAH found nothing useful
                // but the leaf would exceed the traversal's bound).
                int axis = 0;
                double dx = hi.x - lo.x, dy = hi.y - lo.y, dz = hi.z - lo.z;
                if (dy > dx && dy >= dz) axis = 1;
                else if (dz > dx && dz > dy) axis = 2;
                std::stable_sort(
                    prim_order + w.first, prim_order + w.first + w.count,
                    [&](int a, int b) {
                        return centroid[(size_t)a * 3 + axis] < centroid[(size_t)b * 3 + axis];
                    });
                n_left = w.count / 2;
            }

            node_count[me] = 0;
            stack.push_back({w.first + n_left, w.count - n_left, me});  // right
            stack.push_back({w.first, n_left, -1});                     // left
        }
        return n_nodes;
    }

    void find_split(const Work& w, const Vec3& lo, const Vec3& hi,
                    const Vec3& clo, const Vec3& chi,
                    int& best_axis, double& best_plane) {
        best_axis = -1;
        double best_cost = INTERSECT_COST * w.count;
        double sa = std::max(surface(lo, hi), 1e-20);

        for (int axis = 0; axis < 3; ++axis) {
            double extent = chi[axis] - clo[axis];
            if (extent < 1e-12) continue;
            double scale = N_BINS / extent;

            int bin_cnt[N_BINS] = {};
            Vec3 bin_lo[N_BINS], bin_hi[N_BINS];
            for (int b = 0; b < N_BINS; ++b) {
                bin_lo[b] = {1e30, 1e30, 1e30};
                bin_hi[b] = {-1e30, -1e30, -1e30};
            }
            for (int s = 0; s < w.count; ++s) {
                int id = prim_order[w.first + s];
                int b = std::min(N_BINS - 1,
                                 (int)((centroid[(size_t)id * 3 + axis] - clo[axis]) * scale));
                bin_cnt[b]++;
                bin_lo[b].min_with(tri_min + id * 3);
                bin_hi[b].max_with(tri_max + id * 3);
            }

            // Suffix sweep.
            Vec3 rlo[N_BINS], rhi[N_BINS];
            int rcnt[N_BINS];
            Vec3 acc_lo{1e30, 1e30, 1e30}, acc_hi{-1e30, -1e30, -1e30};
            int acc_cnt = 0;
            for (int b = N_BINS - 1; b >= 0; --b) {
                acc_lo.x = std::min(acc_lo.x, bin_lo[b].x);
                acc_lo.y = std::min(acc_lo.y, bin_lo[b].y);
                acc_lo.z = std::min(acc_lo.z, bin_lo[b].z);
                acc_hi.x = std::max(acc_hi.x, bin_hi[b].x);
                acc_hi.y = std::max(acc_hi.y, bin_hi[b].y);
                acc_hi.z = std::max(acc_hi.z, bin_hi[b].z);
                acc_cnt += bin_cnt[b];
                rlo[b] = acc_lo; rhi[b] = acc_hi; rcnt[b] = acc_cnt;
            }
            // Prefix sweep + cost.
            acc_lo = {1e30, 1e30, 1e30};
            acc_hi = {-1e30, -1e30, -1e30};
            acc_cnt = 0;
            for (int b = 0; b < N_BINS - 1; ++b) {
                acc_lo.x = std::min(acc_lo.x, bin_lo[b].x);
                acc_lo.y = std::min(acc_lo.y, bin_lo[b].y);
                acc_lo.z = std::min(acc_lo.z, bin_lo[b].z);
                acc_hi.x = std::max(acc_hi.x, bin_hi[b].x);
                acc_hi.y = std::max(acc_hi.y, bin_hi[b].y);
                acc_hi.z = std::max(acc_hi.z, bin_hi[b].z);
                acc_cnt += bin_cnt[b];
                if (acc_cnt == 0 || rcnt[b + 1] == 0) continue;
                double cost = TRAVERSAL_COST
                    + (surface(acc_lo, acc_hi) * acc_cnt
                       + surface(rlo[b + 1], rhi[b + 1]) * rcnt[b + 1])
                      * INTERSECT_COST / sa;
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_plane = clo[axis] + (double)(b + 1) / scale;
                }
            }
        }
    }
};

}  // namespace

extern "C" {

// Returns the number of nodes written. Arrays must be preallocated:
// node_* capacity 2t, prim_order capacity t.
int bifrost_build_bvh(const float* tri_min, const float* tri_max, int t,
                      int max_leaf,
                      float* node_min, float* node_max,
                      int32_t* node_a, int32_t* node_count,
                      int32_t* prim_order) {
    if (t <= 0) return 0;
    Builder b;
    b.tri_min = tri_min;
    b.tri_max = tri_max;
    b.t = t;
    b.max_leaf = max_leaf;
    b.node_min = node_min;
    b.node_max = node_max;
    b.node_a = node_a;
    b.node_count = node_count;
    b.prim_order = prim_order;
    return b.run();
}

}  // extern "C"
