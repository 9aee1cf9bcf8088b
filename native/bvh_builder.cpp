// Native SAH BVH builder — C++ twin of pathtracer_tpu/scene/bvh.py.
//
// Re-implements the reference's host-side build (reference src/bvhnode.cpp:
// 12-bucket SAH over centroid offsets, max-extent split axis, median
// fallback, DFS-preorder flatten with left child at i+1) with this repo's
// extensions: max_leaf triangles per contiguous leaf range and
// parent/sibling links for the stackless/packet traversals.
//
// All geometric math is double precision with the exact same operation
// order as the NumPy builder, so both emit IDENTICAL trees (tested in
// tests/test_native_bvh.py) — the native build is purely a load-time
// speedup for large meshes.
//
// Build: make -C native   (g++ -O3 -shared; loaded via ctypes, no pybind11)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct V3 {
    double x, y, z;
};

inline V3 vmin(const V3& a, const V3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(const V3& a, const V3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline double surface_area(const V3& mn, const V3& mx) {
    double dx = mx.x - mn.x, dy = mx.y - mn.y, dz = mx.z - mn.z;
    return 2.0 * (dx * dy + dx * dz + dy * dz);
}
inline double comp(const V3& v, int axis) {
    return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
}

constexpr int N_BUCKETS = 12;
constexpr double INF = 1e300;

struct Builder {
    const V3* tri_min;
    const V3* tri_max;
    const V3* centroid;
    int max_leaf;
    bool use_sah;

    std::vector<float> bounds_min, bounds_max;
    std::vector<int32_t> tri_first, tri_count, second_child, parent, sibling;
    std::vector<int64_t> leaf_order;

    int emit(const V3& mn, const V3& mx) {
        int my = (int)tri_first.size();
        bounds_min.push_back((float)mn.x);
        bounds_min.push_back((float)mn.y);
        bounds_min.push_back((float)mn.z);
        bounds_max.push_back((float)mx.x);
        bounds_max.push_back((float)mx.y);
        bounds_max.push_back((float)mx.z);
        tri_first.push_back(-1);
        tri_count.push_back(0);
        second_child.push_back(0);
        parent.push_back(-1);
        sibling.push_back(-1);
        return my;
    }

    // Recursive DFS like the reference (bvhnode.cpp:151). Depth is bounded
    // by the split invariant (>=1 triangle per side) at ~T/max_leaf frames
    // worst case — trivially within the default stack for mesh-scale inputs.
    int build(std::vector<int64_t>& idx) {
        V3 mn = {INF, INF, INF}, mx = {-INF, -INF, -INF};
        for (int64_t t : idx) {
            mn = vmin(mn, tri_min[t]);
            mx = vmax(mx, tri_max[t]);
        }
        int my = emit(mn, mx);

        if ((int)idx.size() <= max_leaf) {
            tri_first[my] = (int32_t)leaf_order.size();
            tri_count[my] = (int32_t)idx.size();
            for (int64_t t : idx) leaf_order.push_back(t);
            return my;
        }

        // split axis = max extent of node bounds (bvhnode.cpp:38-50,172)
        double ex = std::abs(mx.x - mn.x), ey = std::abs(mx.y - mn.y),
               ez = std::abs(mx.z - mn.z);
        int axis = (ex >= ey && ex >= ez) ? 0 : (ey >= ez ? 1 : 2);

        double cmin = INF, cmax = -INF;
        for (int64_t t : idx) {
            double c = comp(centroid[t], axis);
            cmin = std::min(cmin, c);
            cmax = std::max(cmax, c);
        }

        std::vector<int64_t> left_idx, right_idx;
        bool split_done = false;
        if (use_sah && cmax > cmin && idx.size() > 2) {
            // 12-bucket SAH (bvhnode.cpp:93-146)
            int64_t counts[N_BUCKETS] = {0};
            V3 bmins[N_BUCKETS], bmaxs[N_BUCKETS];
            for (int k = 0; k < N_BUCKETS; ++k) {
                bmins[k] = {INF, INF, INF};
                bmaxs[k] = {-INF, -INF, -INF};
            }
            std::vector<int8_t> bucket(idx.size());
            for (size_t i = 0; i < idx.size(); ++i) {
                double c = comp(centroid[idx[i]], axis);
                int b = (int)(N_BUCKETS * (c - cmin) / (cmax - cmin));
                b = std::min(b, N_BUCKETS - 1);
                bucket[i] = (int8_t)b;
                counts[b]++;
                bmins[b] = vmin(bmins[b], tri_min[idx[i]]);
                bmaxs[b] = vmax(bmaxs[b], tri_max[idx[i]]);
            }
            double sa_parent = surface_area(mn, mx);
            // prefix/suffix sweeps (bvhnode.cpp:109-122)
            V3 pre_min[N_BUCKETS], pre_max[N_BUCKETS];
            V3 suf_min[N_BUCKETS], suf_max[N_BUCKETS];
            int64_t pre_cnt[N_BUCKETS], suf_cnt[N_BUCKETS];
            pre_min[0] = bmins[0];
            pre_max[0] = bmaxs[0];
            pre_cnt[0] = counts[0];
            for (int k = 1; k < N_BUCKETS; ++k) {
                pre_min[k] = vmin(pre_min[k - 1], bmins[k]);
                pre_max[k] = vmax(pre_max[k - 1], bmaxs[k]);
                pre_cnt[k] = pre_cnt[k - 1] + counts[k];
            }
            suf_min[N_BUCKETS - 1] = bmins[N_BUCKETS - 1];
            suf_max[N_BUCKETS - 1] = bmaxs[N_BUCKETS - 1];
            suf_cnt[N_BUCKETS - 1] = counts[N_BUCKETS - 1];
            for (int k = N_BUCKETS - 2; k >= 0; --k) {
                suf_min[k] = vmin(suf_min[k + 1], bmins[k]);
                suf_max[k] = vmax(suf_max[k + 1], bmaxs[k]);
                suf_cnt[k] = suf_cnt[k + 1] + counts[k];
            }
            int best = 0;
            double best_cost = INF;
            for (int i = 0; i < N_BUCKETS - 1; ++i) {
                double sa0 = pre_cnt[i] ? surface_area(pre_min[i], pre_max[i])
                                        : 0.0;
                double sa1 = suf_cnt[i + 1]
                                 ? surface_area(suf_min[i + 1], suf_max[i + 1])
                                 : 0.0;
                double cost = 0.125 + (pre_cnt[i] * sa0
                                       + suf_cnt[i + 1] * sa1) / sa_parent;
                if (cost < best_cost) {  // argmin keeps FIRST minimum (numpy)
                    best_cost = cost;
                    best = i;
                }
            }
            for (size_t i = 0; i < idx.size(); ++i) {
                if (bucket[i] <= best) left_idx.push_back(idx[i]);
                else right_idx.push_back(idx[i]);
            }
            if (!left_idx.empty() && !right_idx.empty()) split_done = true;
        }

        if (!split_done) {
            // median split after stable centroid sort (bvhnode.cpp:184-188)
            left_idx.clear();
            right_idx.clear();
            std::vector<int64_t> order(idx.size());
            for (size_t i = 0; i < idx.size(); ++i) order[i] = (int64_t)i;
            std::stable_sort(order.begin(), order.end(),
                             [&](int64_t a, int64_t b) {
                                 return comp(centroid[idx[a]], axis)
                                        < comp(centroid[idx[b]], axis);
                             });
            size_t midn = idx.size() / 2;
            for (size_t i = 0; i < midn; ++i) left_idx.push_back(idx[order[i]]);
            for (size_t i = midn; i < idx.size(); ++i)
                right_idx.push_back(idx[order[i]]);
        }
        idx.clear();
        idx.shrink_to_fit();

        int left = build(left_idx);
        int right = build(right_idx);
        second_child[my] = right;
        parent[left] = my;
        parent[right] = my;
        sibling[left] = right;
        return my;
    }
};

}  // namespace

extern "C" {

// Returns the node count (<= 2*n_tris - 1). Output buffers must be sized for
// the worst case: bounds [3*(2T-1)] f32, int arrays [(2T-1)], leaf_order [T].
int build_bvh_sah(int n_tris, const float* v0, const float* v1,
                  const float* v2, int max_leaf, int use_sah,
                  float* out_bounds_min, float* out_bounds_max,
                  int32_t* out_tri_first, int32_t* out_tri_count,
                  int32_t* out_second_child, int32_t* out_parent,
                  int32_t* out_sibling, int64_t* out_leaf_order) {
    std::vector<V3> tmin(n_tris), tmax(n_tris), cent(n_tris);
    for (int i = 0; i < n_tris; ++i) {
        V3 a = {v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
        V3 b = {v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
        V3 c = {v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
        tmin[i] = vmin(vmin(a, b), c);
        tmax[i] = vmax(vmax(a, b), c);
        cent[i] = {(a.x + b.x + c.x) / 3.0, (a.y + b.y + c.y) / 3.0,
                   (a.z + b.z + c.z) / 3.0};
    }

    Builder bld;
    bld.tri_min = tmin.data();
    bld.tri_max = tmax.data();
    bld.centroid = cent.data();
    bld.max_leaf = max_leaf;
    bld.use_sah = use_sah != 0;

    std::vector<int64_t> all(n_tris);
    for (int i = 0; i < n_tris; ++i) all[i] = i;
    bld.build(all);

    int n_nodes = (int)bld.tri_first.size();
    std::copy(bld.bounds_min.begin(), bld.bounds_min.end(), out_bounds_min);
    std::copy(bld.bounds_max.begin(), bld.bounds_max.end(), out_bounds_max);
    std::copy(bld.tri_first.begin(), bld.tri_first.end(), out_tri_first);
    std::copy(bld.tri_count.begin(), bld.tri_count.end(), out_tri_count);
    std::copy(bld.second_child.begin(), bld.second_child.end(),
              out_second_child);
    std::copy(bld.parent.begin(), bld.parent.end(), out_parent);
    std::copy(bld.sibling.begin(), bld.sibling.end(), out_sibling);
    std::copy(bld.leaf_order.begin(), bld.leaf_order.end(), out_leaf_order);
    return n_nodes;
}

}  // extern "C"
