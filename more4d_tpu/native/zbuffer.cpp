// Native z-buffer point-cloud projection — the host-side data-path hot loop
// of the ViSM training-pair assembly (MoRe4D/data/wan_dataset.py:433-470:
// index_reduce_('amin') min-depth resolve + scatter('mean') color ties).
//
// Exact semantics of more4d_tpu/data/vism.py::project_point_cloud (which is
// itself golden-tested against a literal torch re-implementation):
//  - normalized pinhole (fx, fy, cx, cy), points already camera-space;
//  - keep u,v in [0,1] and depth >= 0;
//  - column-major flat pixel index floor(u*W)*H + floor(v*H) (clamped);
//  - per pixel: minimum depth wins, exact-tie colors averaged;
//  - final image transposed back to row-major [H, W, 3]; hole = all-zero
//    color.
//
// Compiled on demand by more4d_tpu/native/__init__.py (g++ -O3 -shared) and
// called through ctypes; the numpy implementation remains the fallback and
// the parity oracle.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// coords [n,3], colors [n,3], intr = {fx, fy, cx, cy} normalized.
// out_color [h*w*3] row-major RGB, out_hole [h*w] (1 = hole).
// Returns number of points kept after the frustum test.
int64_t zbuffer_project(const float* coords, const float* colors,
                        int64_t n, const float* intr, int64_t h, int64_t w,
                        float* out_color, float* out_hole) {
    const float fx = intr[0], fy = intr[1], cx = intr[2], cy = intr[3];
    const int64_t npix = h * w;

    std::vector<float> min_depth(npix, INFINITY);
    std::vector<int64_t> flat(n);
    std::vector<float> dep(n);
    std::vector<uint8_t> keep(n, 0);

    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float x = coords[3 * i], y = coords[3 * i + 1],
                    z = coords[3 * i + 2];
        if (!(z >= 0.f)) continue;
        const float zi = z > 1e-12f ? z : 1e-12f;
        const float u = fx * (x / zi) + cx;
        const float v = fy * (y / zi) + cy;
        if (u < 0.f || u > 1.f || v < 0.f || v > 1.f) continue;
        int64_t ix = (int64_t)std::floor(u * (float)w);
        int64_t iy = (int64_t)std::floor(v * (float)h);
        if (ix > w - 1) ix = w - 1;
        if (ix < 0) ix = 0;
        if (iy > h - 1) iy = h - 1;
        if (iy < 0) iy = 0;
        const int64_t p = ix * h + iy;   // column-major (reference quirk)
        flat[i] = p;
        dep[i] = z;
        keep[i] = 1;
        if (z < min_depth[p]) min_depth[p] = z;
        ++kept;
    }

    std::vector<double> acc(npix * 3, 0.0);
    std::vector<int32_t> cnt(npix, 0);
    for (int64_t i = 0; i < n; ++i) {
        if (!keep[i]) continue;
        const int64_t p = flat[i];
        if (dep[i] == min_depth[p]) {   // exact-tie mean, like the reference
            acc[3 * p] += colors[3 * i];
            acc[3 * p + 1] += colors[3 * i + 1];
            acc[3 * p + 2] += colors[3 * i + 2];
            cnt[p] += 1;
        }
    }

    for (int64_t iy = 0; iy < h; ++iy) {
        for (int64_t ix = 0; ix < w; ++ix) {
            const int64_t p = ix * h + iy;      // column-major source
            const int64_t q = iy * w + ix;      // row-major dest
            float r = 0.f, g = 0.f, b = 0.f;
            if (cnt[p] > 0) {
                const double inv = 1.0 / (double)cnt[p];
                r = (float)(acc[3 * p] * inv);
                g = (float)(acc[3 * p + 1] * inv);
                b = (float)(acc[3 * p + 2] * inv);
            }
            out_color[3 * q] = r;
            out_color[3 * q + 1] = g;
            out_color[3 * q + 2] = b;
            out_hole[q] = (r + g + b == 0.f) ? 1.f : 0.f;
        }
    }
    return kept;
}

}  // extern "C"
