// Binned SAH BVH builder — higher-quality trees than the Morton LBVH
// (typically 1.5-2x fewer traversal visits), same output contract as
// lbvh.cpp: preorder emission with skip pointers, contiguous leaf
// ranges, block-aligned splits so leaves fill whole triangle blocks.
//
// C ABI:
//   int64 sah_build(const float* v0, const float* e1, const float* e2,
//                   int64 n_tris, int max_leaf_size,
//                   float* bmin, float* bmax,          // cap 2n x 3
//                   int32* skip, int32* leaf_first,    // cap 2n
//                   int32* leaf_count, int32* left, int32* right,
//                   int64* tri_order)                  // n
//   returns node_count, or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr int kBins = 32;

struct AABB {
    double lo[3] = {1e300, 1e300, 1e300};
    double hi[3] = {-1e300, -1e300, -1e300};

    void grow(const double* l, const double* h) {
        for (int k = 0; k < 3; ++k) {
            lo[k] = std::min(lo[k], l[k]);
            hi[k] = std::max(hi[k], h[k]);
        }
    }
    void grow_point(const double* p) { grow(p, p); }
    double area() const {
        double d[3] = {std::max(hi[0] - lo[0], 0.0),
                       std::max(hi[1] - lo[1], 0.0),
                       std::max(hi[2] - lo[2], 0.0)};
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0];
    }
};

struct SahBuilder {
    int64_t n;
    int block;
    std::vector<double> tmin, tmax, centroid;  // n x 3, indexed by tri id
    std::vector<int64_t> order;                // current arrangement
    // outputs
    float* bmin;
    float* bmax;
    int32_t* skip;
    int32_t* leaf_first;
    int32_t* leaf_count;
    int32_t* left;
    int32_t* right;
    int64_t node_count = 0;

    AABB range_bounds(int64_t start, int64_t end, bool centroids) const {
        AABB b;
        for (int64_t i = start; i < end; ++i) {
            int64_t t = order[i];
            if (centroids) {
                b.grow_point(&centroid[t * 3]);
            } else {
                b.grow(&tmin[t * 3], &tmax[t * 3]);
            }
        }
        return b;
    }

    // Choose the SAH-optimal binned split of [start, end); returns the
    // block-aligned split index, or -1 to make a leaf.
    int64_t find_split(int64_t start, int64_t end, const AABB& cb) {
        int64_t count = end - start;
        int best_axis = -1;
        int best_bin = -1;
        double best_cost = 1e300;
        for (int axis = 0; axis < 3; ++axis) {
            double lo = cb.lo[axis], hi = cb.hi[axis];
            if (hi - lo < 1e-12) continue;
            double inv = kBins / (hi - lo);
            AABB bins[kBins];
            int64_t counts[kBins] = {0};
            for (int64_t i = start; i < end; ++i) {
                int64_t t = order[i];
                int b = static_cast<int>((centroid[t * 3 + axis] - lo) * inv);
                b = std::min(std::max(b, 0), kBins - 1);
                bins[b].grow(&tmin[t * 3], &tmax[t * 3]);
                counts[b]++;
            }
            // suffix areas
            AABB suffix[kBins];
            AABB acc;
            int64_t suffix_count[kBins] = {0};
            int64_t c = 0;
            for (int b = kBins - 1; b >= 0; --b) {
                acc.grow(bins[b].lo, bins[b].hi);
                suffix[b] = acc;
                c += counts[b];
                suffix_count[b] = c;
            }
            AABB prefix;
            int64_t left_count = 0;
            for (int b = 0; b < kBins - 1; ++b) {
                prefix.grow(bins[b].lo, bins[b].hi);
                left_count += counts[b];
                if (left_count == 0 || left_count == count) continue;
                double cost = prefix.area() * left_count +
                              suffix[b + 1].area() * suffix_count[b + 1];
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_bin = b;
                }
            }
        }
        // Degenerate (all centroids equal): forced block-aligned
        // median so leaves never exceed the block size.
        if (best_axis < 0) {
            return start + block * std::max<int64_t>(1, (count / 2) / block);
        }
        // Partition by bin boundary.
        double lo = cb.lo[best_axis], hi = cb.hi[best_axis];
        double inv = kBins / (hi - lo);
        auto mid = std::stable_partition(
            order.begin() + start, order.begin() + end,
            [&](int64_t t) {
                int b = static_cast<int>(
                    (centroid[t * 3 + best_axis] - lo) * inv);
                b = std::min(std::max(b, 0), kBins - 1);
                return b <= best_bin;
            });
        int64_t split = mid - order.begin();
        // Snap to a block multiple (ranges start block-aligned, so
        // leaves fill whole blocks).
        int64_t rel = split - start;
        int64_t snapped = ((rel + block / 2) / block) * block;
        if (snapped <= 0) snapped = block;
        if (start + snapped >= end)
            snapped = ((end - start - 1) / block) * block;
        if (snapped <= 0) snapped = block;
        split = start + snapped;
        if (split <= start || split >= end) {
            // Forced block-aligned median keeps leaf counts <= block.
            split = start + block * std::max<int64_t>(1, (count / 2) / block);
            if (split >= end) return -1;  // count <= block: leaf
        }
        return split;
    }

    void build() {
        struct Frame {
            int64_t start, end, node;
            int state;
        };
        std::vector<Frame> stack;
        stack.push_back({0, n, -1, 0});
        while (!stack.empty()) {
            Frame f = stack.back();
            stack.pop_back();
            if (f.state == 1) {
                skip[f.node] = static_cast<int32_t>(node_count);
                continue;
            }
            int64_t node = node_count++;
            AABB b = range_bounds(f.start, f.end, false);
            for (int k = 0; k < 3; ++k) {
                bmin[node * 3 + k] = static_cast<float>(b.lo[k]);
                bmax[node * 3 + k] = static_cast<float>(b.hi[k]);
            }
            stack.push_back({f.start, f.end, node, 1});
            int64_t split = -1;
            if (f.end - f.start > block) {
                AABB cb = range_bounds(f.start, f.end, true);
                split = find_split(f.start, f.end, cb);
            }
            if (split < 0) {
                leaf_first[node] = static_cast<int32_t>(f.start);
                leaf_count[node] = static_cast<int32_t>(f.end - f.start);
                left[node] = -1;
                right[node] = -1;
            } else {
                leaf_first[node] = -1;
                leaf_count[node] = 0;
                left[node] = static_cast<int32_t>(node + 1);
                right[node] = -2;
                stack.push_back({split, f.end, -1, 0});
                stack.push_back({f.start, split, -1, 0});
            }
        }
        for (int64_t i = 0; i < node_count; ++i) {
            if (right[i] == -2) right[i] = skip[left[i]];
        }
    }
};

}  // namespace

extern "C" int64_t sah_build(
    const float* v0, const float* e1, const float* e2, int64_t n_tris,
    int max_leaf_size, float* bmin, float* bmax, int32_t* skip,
    int32_t* leaf_first, int32_t* leaf_count, int32_t* left,
    int32_t* right, int64_t* tri_order) {
    if (n_tris <= 0) return -1;
    SahBuilder b;
    b.n = n_tris;
    b.block = max_leaf_size;
    b.tmin.resize(n_tris * 3);
    b.tmax.resize(n_tris * 3);
    b.centroid.resize(n_tris * 3);
    b.order.resize(n_tris);
    for (int64_t i = 0; i < n_tris; ++i) {
        b.order[i] = i;
        for (int k = 0; k < 3; ++k) {
            double a = v0[i * 3 + k];
            double p1 = a + e1[i * 3 + k];
            double p2 = a + e2[i * 3 + k];
            double lo = std::min(a, std::min(p1, p2));
            double hi = std::max(a, std::max(p1, p2));
            b.tmin[i * 3 + k] = lo;
            b.tmax[i * 3 + k] = hi;
            b.centroid[i * 3 + k] = (lo + hi) * 0.5;
        }
    }
    b.bmin = bmin;
    b.bmax = bmax;
    b.skip = skip;
    b.leaf_first = leaf_first;
    b.leaf_count = leaf_count;
    b.left = left;
    b.right = right;
    b.build();
    for (int64_t i = 0; i < n_tris; ++i) tri_order[i] = b.order[i];
    return b.node_count;
}
