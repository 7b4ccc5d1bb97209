// Z-buffered sphere-splat rasterizer for point-cloud visualization.
//
// Same extern "C" ABI as the reference viewer kernel
// (/root/reference/visualization/render_balls.cpp:14 —
//  render_ball(h, w, show, n, xyzs, c0, c1, c2, r)) so the ctypes viewer is
// drop-in compatible, including its quirky output channel order
// (bgr <- (c2, c0, c1) scaled by the sphere-normal shade).
//
// Implementation is its own design: the ball footprint is precomputed once
// into flat offset/shade arrays, the z-buffer and image are touched through
// row pointers, and the depth-intensity ramp is fused into integer output.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Footprint {
  std::vector<int> dx, dy, dz;
  std::vector<float> shade;  // dz / r in [0, 1]
};

Footprint make_footprint(int r) {
  Footprint f;
  for (int ax = -r; ax <= r; ++ax) {
    for (int ay = -r; ay <= r; ++ay) {
      int d2 = ax * ax + ay * ay;
      if (d2 < r * r) {
        double h = std::sqrt(double(r * r - d2));
        f.dx.push_back(ax);
        f.dy.push_back(ay);
        f.dz.push_back(int(h));
        f.shade.push_back(float(h / r));
      }
    }
  }
  return f;
}

}  // namespace

extern "C" {

void render_ball(int h, int w, unsigned char *show, int n, int *xyzs,
                 float *c0, float *c1, float *c2, int r) {
  if (r < 1) r = 1;
  if (n <= 0 || h <= 0 || w <= 0) return;

  const Footprint fp = make_footprint(r);
  const int m = int(fp.dx.size());

  std::vector<int32_t> depth(size_t(h) * w, INT32_MIN / 2);

  // global depth range for the intensity ramp (0.3 .. 1.0)
  int zlo = xyzs[2] - r, zhi = xyzs[2] + r;
  for (int i = 1; i < n; ++i) {
    const int z = xyzs[i * 3 + 2];
    if (z - r < zlo) zlo = z - r;
    if (z + r > zhi) zhi = z + r;
  }
  const double zspan = (zhi > zlo) ? double(zhi - zlo) : 1.0;

  for (int i = 0; i < n; ++i) {
    const int px = xyzs[i * 3 + 0];
    const int py = xyzs[i * 3 + 1];
    const int pz = xyzs[i * 3 + 2];
    const float col0 = c0[i], col1 = c1[i], col2 = c2[i];
    for (int j = 0; j < m; ++j) {
      const int x = px + fp.dx[j];
      const int y = py + fp.dy[j];
      if (x < 0 || x >= h || y < 0 || y >= w) continue;
      const int z = pz + fp.dz[j];
      int32_t *dcell = &depth[size_t(x) * w + y];
      if (*dcell >= z) continue;
      *dcell = z;
      double intensity = (z - zlo) / zspan * 0.7 + 0.3;
      if (intensity > 1.0) intensity = 1.0;
      const float s = fp.shade[j] * float(intensity);
      unsigned char *px3 = show + (size_t(x) * w + y) * 3;
      px3[0] = (unsigned char)(s * col2);
      px3[1] = (unsigned char)(s * col0);
      px3[2] = (unsigned char)(s * col1);
    }
  }
}

}  // extern "C"
