// quadfind: native contour-based quad proposal for ArUco detection.
//
// The runtime counterpart of the reference's vendored aruco MarkerDetector
// contour stage (Thirdparty/aruco/markerdetector_impl.cpp — behavior
// reproduced from the ArUco3 pipeline description, not copied): given a
// binarized image, follow the outer contours of dark blobs (Suzuki-style
// border following), simplify each contour to a polygon (Douglas-Peucker),
// and emit 4-corner candidates. This is the host-side fast path for
// latency-critical CPU deployments and for video-ingest preprocessing; the
// on-device path (ops/aruco/detector.py) remains the TPU-native
// label-propagation formulation. Both feed the same batched warp/decode.
//
// Build: see native/build.sh. ABI: plain C, used from Python via ctypes
// (orb_slam2_aruco_tpu/ops/aruco/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  int x, y;
};

// Moore-neighbor border following. Marks visited border pixels in `visited`.
void trace_contour(const uint8_t* bin, uint8_t* visited, int w, int h,
                   int sx, int sy, std::vector<Pt>& out) {
  static const int dx[8] = {1, 1, 0, -1, -1, -1, 0, 1};
  static const int dy[8] = {0, 1, 1, 1, 0, -1, -1, -1};
  int cx = sx, cy = sy, dir = 7;
  out.clear();
  for (int steps = 0; steps < 4 * (w + h) + 4096; ++steps) {
    out.push_back({cx, cy});
    visited[cy * w + cx] = 1;
    int found = -1;
    // search neighbors clockwise starting left of the entry direction
    for (int i = 0; i < 8; ++i) {
      int d = (dir + 6 + i) & 7;  // start from dir-2 (Moore tracing)
      int nx = cx + dx[d], ny = cy + dy[d];
      if (nx < 0 || ny < 0 || nx >= w || ny >= h) continue;
      if (bin[ny * w + nx]) {
        found = d;
        cx = nx;
        cy = ny;
        break;
      }
    }
    if (found < 0) break;  // isolated pixel
    dir = found;
    if (cx == sx && cy == sy && out.size() > 2) break;
  }
}

double pt_line_dist2(const Pt& p, const Pt& a, const Pt& b) {
  double vx = b.x - a.x, vy = b.y - a.y;
  double wx = p.x - a.x, wy = p.y - a.y;
  double c = vx * wx + vy * wy;
  double len2 = vx * vx + vy * vy;
  if (len2 <= 1e-12) return wx * wx + wy * wy;
  double t = c / len2;
  if (t < 0) t = 0;
  if (t > 1) t = 1;
  double ex = wx - t * vx, ey = wy - t * vy;
  return ex * ex + ey * ey;
}

// Douglas-Peucker on a closed contour split at the two farthest points.
void dp_simplify(const std::vector<Pt>& pts, int i0, int i1, double eps2,
                 std::vector<int>& keep) {
  if (i1 - i0 < 2) return;
  double best = -1;
  int bi = -1;
  for (int i = i0 + 1; i < i1; ++i) {
    double d = pt_line_dist2(pts[i], pts[i0], pts[i1]);
    if (d > best) {
      best = d;
      bi = i;
    }
  }
  if (best > eps2) {
    dp_simplify(pts, i0, bi, eps2, keep);
    keep.push_back(bi);
    dp_simplify(pts, bi, i1, eps2, keep);
  }
}

}  // namespace

extern "C" {

// bin: [h*w] uint8 (1 = dark/foreground). Outputs up to max_quads quads as
// (x0,y0,...,x3,y3) float32 into out_quads; returns the number found.
int quadfind(const uint8_t* bin, int w, int h, int min_perimeter,
             int max_perimeter, float approx_eps_frac, float min_area,
             float* out_quads, int max_quads) {
  std::vector<uint8_t> visited(static_cast<size_t>(w) * h, 0);
  std::vector<Pt> contour;
  std::vector<int> keep;
  int n_out = 0;
  for (int y = 1; y < h - 1 && n_out < max_quads; ++y) {
    const uint8_t* row = bin + y * w;
    for (int x = 1; x < w - 1 && n_out < max_quads; ++x) {
      // outer border start: foreground with background to the left, unvisited
      if (!row[x] || row[x - 1] || visited[y * w + x]) continue;
      trace_contour(bin, visited.data(), w, h, x, y, contour);
      int per = static_cast<int>(contour.size());
      if (per < min_perimeter || per > max_perimeter) continue;
      // split at farthest-point pair approximation: index 0 and per/2
      double eps = approx_eps_frac * per;
      double eps2 = eps * eps;
      keep.clear();
      keep.push_back(0);
      dp_simplify(contour, 0, per / 2, eps2, keep);
      keep.push_back(per / 2);
      dp_simplify(contour, per / 2, per - 1, eps2, keep);
      keep.push_back(per - 1);
      // collapse near-duplicate last/first
      if (keep.size() >= 2) {
        const Pt& a = contour[keep.front()];
        const Pt& b = contour[keep.back()];
        if (std::abs(a.x - b.x) + std::abs(a.y - b.y) <= 2) keep.pop_back();
      }
      if (keep.size() != 4) continue;
      // convexity + area check
      double area2 = 0;
      bool convex = true;
      for (int i = 0; i < 4; ++i) {
        const Pt& p0 = contour[keep[i]];
        const Pt& p1 = contour[keep[(i + 1) % 4]];
        const Pt& p2 = contour[keep[(i + 2) % 4]];
        double cr = (double)(p1.x - p0.x) * (p2.y - p1.y) -
                    (double)(p1.y - p0.y) * (p2.x - p1.x);
        if (i == 0) {
          convex = true;
        }
        if (cr == 0) convex = false;
        area2 += (double)p0.x * p1.y - (double)p1.x * p0.y;
      }
      double sign0 = 0;
      for (int i = 0; i < 4 && convex; ++i) {
        const Pt& p0 = contour[keep[i]];
        const Pt& p1 = contour[keep[(i + 1) % 4]];
        const Pt& p2 = contour[keep[(i + 2) % 4]];
        double cr = (double)(p1.x - p0.x) * (p2.y - p1.y) -
                    (double)(p1.y - p0.y) * (p2.x - p1.x);
        if (i == 0)
          sign0 = cr;
        else if (cr * sign0 < 0)
          convex = false;
      }
      if (!convex) continue;
      if (std::fabs(area2) * 0.5 < min_area) continue;
      for (int i = 0; i < 4; ++i) {
        out_quads[n_out * 8 + 2 * i + 0] = (float)contour[keep[i]].x;
        out_quads[n_out * 8 + 2 * i + 1] = (float)contour[keep[i]].y;
      }
      ++n_out;
    }
  }
  return n_out;
}

// Adaptive threshold on the host (box mean - c), for the pure-CPU path.
void adaptive_threshold_u8(const float* img, int w, int h, int win, float c,
                           uint8_t* out) {
  // integral image
  std::vector<double> integ(static_cast<size_t>(w + 1) * (h + 1), 0.0);
  for (int y = 0; y < h; ++y) {
    double rowsum = 0;
    for (int x = 0; x < w; ++x) {
      rowsum += img[y * w + x];
      integ[(y + 1) * (w + 1) + (x + 1)] = integ[y * (w + 1) + (x + 1)] + rowsum;
    }
  }
  int r = win / 2;
  for (int y = 0; y < h; ++y) {
    int y0 = y - r < 0 ? 0 : y - r;
    int y1 = y + r + 1 > h ? h : y + r + 1;
    for (int x = 0; x < w; ++x) {
      int x0 = x - r < 0 ? 0 : x - r;
      int x1 = x + r + 1 > w ? w : x + r + 1;
      double s = integ[y1 * (w + 1) + x1] - integ[y0 * (w + 1) + x1] -
                 integ[y1 * (w + 1) + x0] + integ[y0 * (w + 1) + x0];
      double mean = s / ((y1 - y0) * (x1 - x0));
      out[y * w + x] = img[y * w + x] < (mean - c) ? 1 : 0;
    }
  }
}

}  // extern "C"
