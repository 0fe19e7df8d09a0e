// Native scene-bake helpers — the host-side hot loops of
// models/device_scene.py (instance transform bake), mirroring the
// reference's native asset path (Scene.zig's packed attribute reads).
//
// C ABI:
//   void bake_triangles(
//       const float* positions, int64 n_verts,       // object space
//       const uint32* indices, int64 n_tris,          // 3 per tri
//       const double* A,       // 3x3 row-major linear part
//       const double* t,       // translation
//       const double* N,       // 3x3 row-major inverse(A) (normal quirk)
//       float* out_v0, float* out_e1, float* out_e2,  // n_tris x 3
//       float* out_gn)                                // n_tris x 3
//
//   void transform_points(const float* p, int64 n, const double* A,
//                         const double* t, float* out)   // world pos
//   void transform_dirs(const float* p, int64 n, const double* N,
//                       float* out)                      // normals etc.

#include <cmath>
#include <cstdint>

namespace {

inline void mat3_mul(const double* M, const double* v, double* out) {
    out[0] = M[0] * v[0] + M[1] * v[1] + M[2] * v[2];
    out[1] = M[3] * v[0] + M[4] * v[1] + M[5] * v[2];
    out[2] = M[6] * v[0] + M[7] * v[1] + M[8] * v[2];
}

}  // namespace

extern "C" void transform_points(const float* p, int64_t n,
                                 const double* A, const double* t,
                                 float* out) {
    for (int64_t i = 0; i < n; ++i) {
        double v[3] = {p[i * 3], p[i * 3 + 1], p[i * 3 + 2]};
        double w[3];
        mat3_mul(A, v, w);
        out[i * 3 + 0] = static_cast<float>(w[0] + t[0]);
        out[i * 3 + 1] = static_cast<float>(w[1] + t[1]);
        out[i * 3 + 2] = static_cast<float>(w[2] + t[2]);
    }
}

extern "C" void transform_dirs(const float* p, int64_t n, const double* N,
                               float* out) {
    for (int64_t i = 0; i < n; ++i) {
        double v[3] = {p[i * 3], p[i * 3 + 1], p[i * 3 + 2]};
        double w[3];
        mat3_mul(N, v, w);
        out[i * 3 + 0] = static_cast<float>(w[0]);
        out[i * 3 + 1] = static_cast<float>(w[1]);
        out[i * 3 + 2] = static_cast<float>(w[2]);
    }
}

extern "C" void bake_triangles(const float* positions, int64_t n_verts,
                               const uint32_t* indices, int64_t n_tris,
                               const double* A, const double* t,
                               const double* N, float* out_v0,
                               float* out_e1, float* out_e2,
                               float* out_gn) {
    (void)n_verts;
    for (int64_t i = 0; i < n_tris; ++i) {
        uint32_t i0 = indices[i * 3 + 0];
        uint32_t i1 = indices[i * 3 + 1];
        uint32_t i2 = indices[i * 3 + 2];
        double p0[3], p1[3], p2[3];
        for (int k = 0; k < 3; ++k) {
            p0[k] = positions[i0 * 3 + k];
            p1[k] = positions[i1 * 3 + k];
            p2[k] = positions[i2 * 3 + k];
        }
        double w0[3], w1[3], w2[3];
        mat3_mul(A, p0, w0);
        mat3_mul(A, p1, w1);
        mat3_mul(A, p2, w2);
        for (int k = 0; k < 3; ++k) {
            // Round each world position to f32 BEFORE the edge
            // subtraction — bit-identical to the NumPy bake
            // (device_scene.py casts pos_w to float32, then subtracts).
            float f0 = static_cast<float>(w0[k] + t[k]);
            float f1 = static_cast<float>(w1[k] + t[k]);
            float f2 = static_cast<float>(w2[k] + t[k]);
            out_v0[i * 3 + k] = f0;
            out_e1[i * 3 + k] = f1 - f0;
            out_e2[i * 3 + k] = f2 - f0;
        }
        // Geometric normal: object-space edge cross then inverse(A)
        // (the reference's row-vector transform quirk,
        // triangle.glsl:99-107), normalized.
        double e1o[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        double e2o[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        double c[3] = {e1o[1] * e2o[2] - e1o[2] * e2o[1],
                       e1o[2] * e2o[0] - e1o[0] * e2o[2],
                       e1o[0] * e2o[1] - e1o[1] * e2o[0]};
        double g[3];
        mat3_mul(N, c, g);
        // Divide (not multiply-by-reciprocal) by max(len, 1e-30),
        // matching device_scene.py's NumPy rounding exactly.
        double len = std::sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2]);
        if (len < 1e-30) len = 1e-30;
        out_gn[i * 3 + 0] = static_cast<float>(g[0] / len);
        out_gn[i * 3 + 1] = static_cast<float>(g[1] / len);
        out_gn[i * 3 + 2] = static_cast<float>(g[2] / len);
    }
}
