// Scanline rasterizer: anti-aliased polygon fill (nonzero / even-odd),
// stroke expansion, glyph runs, and image blits. Replaces fitz
// page.get_pixmap(matrix, clip) (ref pdf_image_segmentation.py:3638-3657).
#include "spdf.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <cstdlib>

namespace spdf {

namespace {

struct Canvas {
  std::vector<uint8_t> px;  // RGB8
  int w = 0, h = 0;
  double scale = 1.0;
  double off_x = 0, off_y = 0;  // page pts of top-left corner
  // paint modifiers for the item being replayed (set by rasterize):
  int bm = 0;                               // PDF /BM blend mode
  const std::vector<float>* smask = nullptr;  // canvas-sized alpha 0..1

  inline void to_dev(float px_, float py_, float* dx, float* dy) const {
    *dx = (float)((px_ - off_x) * scale);
    *dy = (float)((py_ - off_y) * scale);
  }
};

// ------------------------------------------------------- blend modes
// PDF 11.3.5 separable blend functions; cb = backdrop, cs = source,
// both 0..1. Mode encoding per spdf.h.
inline float blend_sep(int m, float cb, float cs) {
  switch (m) {
    case 1: return cb * cs;                        // Multiply
    case 2: return cb + cs - cb * cs;              // Screen
    case 3: return blend_sep(8, cs, cb);           // Overlay = HardLight^T
    case 4: return std::min(cb, cs);               // Darken
    case 5: return std::max(cb, cs);               // Lighten
    case 6:                                        // ColorDodge
      if (cb <= 0) return 0;
      if (cs >= 1) return 1;
      return std::min(1.0f, cb / (1 - cs));
    case 7:                                        // ColorBurn
      if (cb >= 1) return 1;
      if (cs <= 0) return 0;
      return 1 - std::min(1.0f, (1 - cb) / cs);
    case 8:                                        // HardLight
      return cs <= 0.5f ? cb * (2 * cs)
                        : cb + (2 * cs - 1) - cb * (2 * cs - 1);
    case 9: {                                      // SoftLight
      if (cs <= 0.5f) return cb - (1 - 2 * cs) * cb * (1 - cb);
      float d = cb <= 0.25f ? ((16 * cb - 12) * cb + 4) * cb
                            : std::sqrt(cb);
      return cb + (2 * cs - 1) * (d - cb);
    }
    case 10: return std::fabs(cb - cs);            // Difference
    default: return cb + cs - 2 * cb * cs;         // Exclusion
  }
}

// Non-separable helpers (PDF 11.3.5.3)
inline float lum3(const float c[3]) {
  return 0.3f * c[0] + 0.59f * c[1] + 0.11f * c[2];
}
inline void clip_color(float c[3]) {
  float l = lum3(c);
  float n = std::min({c[0], c[1], c[2]});
  float x = std::max({c[0], c[1], c[2]});
  if (n < 0)
    for (int k = 0; k < 3; k++)
      c[k] = l + (c[k] - l) * l / std::max(l - n, 1e-6f);
  if (x > 1)
    for (int k = 0; k < 3; k++)
      c[k] = l + (c[k] - l) * (1 - l) / std::max(x - l, 1e-6f);
}
inline void set_lum(float c[3], float l) {
  float d = l - lum3(c);
  for (int k = 0; k < 3; k++) c[k] += d;
  clip_color(c);
}
inline float sat3(const float c[3]) {
  return std::max({c[0], c[1], c[2]}) - std::min({c[0], c[1], c[2]});
}
inline void set_sat(float c[3], float s) {
  int mn = 0, mx = 0;
  for (int k = 1; k < 3; k++) {
    if (c[k] < c[mn]) mn = k;
    if (c[k] > c[mx]) mx = k;
  }
  int md = 3 - mn - mx;
  if (mx == mn) md = mx;  // all equal
  if (c[mx] > c[mn]) {
    c[md] = (c[md] - c[mn]) * s / (c[mx] - c[mn]);
    c[mx] = s;
  } else {
    c[md] = c[mx] = 0;
  }
  c[mn] = 0;
}

// Apply blend mode m to src rgb (0..1, in place) against the backdrop
// pixel dst (RGB8).
inline void blend_apply(int m, const uint8_t* dst, float* rgb) {
  float cb[3] = {dst[0] / 255.0f, dst[1] / 255.0f, dst[2] / 255.0f};
  if (m < 12) {
    for (int k = 0; k < 3; k++) rgb[k] = blend_sep(m, cb[k], rgb[k]);
    return;
  }
  float cs[3] = {rgb[0], rgb[1], rgb[2]};
  float out[3];
  switch (m) {
    case 12:  // Hue: SetLum(SetSat(Cs, Sat(Cb)), Lum(Cb))
      out[0] = cs[0]; out[1] = cs[1]; out[2] = cs[2];
      set_sat(out, sat3(cb));
      set_lum(out, lum3(cb));
      break;
    case 13:  // Saturation: SetLum(SetSat(Cb, Sat(Cs)), Lum(Cb))
      out[0] = cb[0]; out[1] = cb[1]; out[2] = cb[2];
      set_sat(out, sat3(cs));
      set_lum(out, lum3(cb));
      break;
    case 14:  // Color: SetLum(Cs, Lum(Cb))
      out[0] = cs[0]; out[1] = cs[1]; out[2] = cs[2];
      set_lum(out, lum3(cb));
      break;
    default:  // Luminosity: SetLum(Cb, Lum(Cs))
      out[0] = cb[0]; out[1] = cb[1]; out[2] = cb[2];
      set_lum(out, lum3(cs));
      break;
  }
  for (int k = 0; k < 3; k++)
    rgb[k] = std::min(std::max(out[k], 0.0f), 1.0f);
}

struct Edge {
  float x0, y0, x1, y1;
  int dir;  // +1 down, -1 up
};

void gather_edges(const std::vector<std::vector<std::pair<float, float>>>& sps,
                  const Canvas& cv, std::vector<Edge>* edges, float* ymin,
                  float* ymax, float* xmin, float* xmax) {
  *ymin = 1e30f;
  *ymax = -1e30f;
  *xmin = 1e30f;
  *xmax = -1e30f;
  for (auto& sp : sps) {
    if (sp.size() < 2) continue;
    size_t n = sp.size();
    for (size_t i = 0; i < n; i++) {
      float ax, ay, bx, by;
      cv.to_dev(sp[i].first, sp[i].second, &ax, &ay);
      size_t j = (i + 1) % n;  // implicit close
      cv.to_dev(sp[j].first, sp[j].second, &bx, &by);
      if (ay == by) continue;
      Edge e;
      if (ay < by) {
        e = {ax, ay, bx, by, 1};
      } else {
        e = {bx, by, ax, ay, -1};
      }
      edges->push_back(e);
      *ymin = std::min(*ymin, e.y0);
      *ymax = std::max(*ymax, e.y1);
      *xmin = std::min({*xmin, ax, bx});
      *xmax = std::max({*xmax, ax, bx});
    }
  }
}

// AA scanline core over pre-gathered device-space edges: 4x vertical
// supersampling + fractional horizontal coverage, blended into the
// canvas. Templated on a per-pixel color callback so shadings reuse the
// identical machinery; fill_polygon_t and the glyph fast path both land
// here.
template <class ColorAt>
void scanline_fill_edges(Canvas* cv, const std::vector<Edge>& edges,
                         float ymin, float ymax, float xmin, float xmax,
                         bool even_odd, const Rect& clip_pts,
                         ColorAt&& color_at, float const_alpha = 1.0f) {
  // device clip
  float cx0, cy0, cx1, cy1;
  cv->to_dev((float)clip_pts.x0, (float)clip_pts.y0, &cx0, &cy0);
  cv->to_dev((float)clip_pts.x1, (float)clip_pts.y1, &cx1, &cy1);
  int y_start = std::max({0, (int)std::floor(ymin), (int)std::floor(cy0)});
  int y_end = std::min({cv->h - 1, (int)std::ceil(ymax), (int)std::ceil(cy1)});
  int x_lo = std::max({0, (int)std::floor(xmin), (int)std::floor(cx0)});
  int x_hi = std::min({cv->w - 1, (int)std::ceil(xmax), (int)std::ceil(cx1)});
  if (y_start > y_end || x_lo > x_hi) return;

  static thread_local std::vector<float> cov;
  cov.assign((size_t)x_hi - x_lo + 2, 0.0f);
  static thread_local std::vector<std::pair<float, int>> xs;
  const int SS = 4;

  // Crossing buckets: for modest edge counts (glyphs, ticks, small
  // paths — the dominant call class: a text page fills 500k glyph
  // polygons) the per-sample-row edge scan is O(rows x SS x E) while
  // the actual crossing count is far smaller. Bucketing walks each
  // edge once over the sample rows it spans (exact same inclusion
  // test and x formula as the scan loop, so output is bit-identical)
  // and turns the inner loop into a bucket read. Large fills keep the
  // scan path: their bucket memory is unbounded while the scan's
  // working set is one row.
  const int nrows = (y_end - y_start + 1) * SS;
  const bool bucketed = edges.size() <= 512;
  static thread_local std::vector<int> bstart;
  static thread_local std::vector<std::pair<float, int>> bx;
  if (bucketed) {
    bstart.assign((size_t)nrows + 1, 0);
    auto row_range = [&](const Edge& e, int* k0, int* k1) {
      double lo = ((double)e.y0 - y_start) * SS - 1.0;
      double hi = ((double)e.y1 - y_start) * SS + 1.0;
      *k0 = std::max(0, (int)lo - 1);
      *k1 = std::min(nrows, (int)hi + 1);
    };
    for (auto& e : edges) {
      int k0, k1;
      row_range(e, &k0, &k1);
      for (int k = k0; k < k1; k++) {
        float sy = (y_start + k / SS) + (k % SS + 0.5f) / SS;
        if (sy < e.y0 || sy >= e.y1) continue;
        bstart[k + 1]++;
      }
    }
    for (int k = 0; k < nrows; k++) bstart[k + 1] += bstart[k];
    bx.resize(bstart[nrows]);
    static thread_local std::vector<int> bfill;
    bfill.assign(bstart.begin(), bstart.end() - 1);
    for (auto& e : edges) {
      int k0, k1;
      row_range(e, &k0, &k1);
      for (int k = k0; k < k1; k++) {
        float sy = (y_start + k / SS) + (k % SS + 0.5f) / SS;
        if (sy < e.y0 || sy >= e.y1) continue;
        float t = (sy - e.y0) / (e.y1 - e.y0);
        bx[bfill[k]++] = {e.x0 + t * (e.x1 - e.x0), e.dir};
      }
    }
  }

  for (int y = y_start; y <= y_end; y++) {
    std::fill(cov.begin(), cov.end(), 0.0f);
    for (int s = 0; s < SS; s++) {
      float sy = y + (s + 0.5f) / SS;
      xs.clear();
      if (bucketed) {
        int k = (y - y_start) * SS + s;
        xs.assign(bx.begin() + bstart[k], bx.begin() + bstart[k + 1]);
      } else {
        for (auto& e : edges) {
          if (sy < e.y0 || sy >= e.y1) continue;
          float t = (sy - e.y0) / (e.y1 - e.y0);
          xs.push_back({e.x0 + t * (e.x1 - e.x0), e.dir});
        }
      }
      if (xs.empty()) continue;
      std::sort(xs.begin(), xs.end());
      // build spans
      if (even_odd) {
        for (size_t i = 0; i + 1 < xs.size(); i += 2) {
          float xa = xs[i].first, xb = xs[i + 1].first;
          // accumulate [xa, xb)
          xa = std::max(xa, (float)x_lo);
          xb = std::min(xb, (float)x_hi + 1);
          if (xb <= xa) continue;
          int ia = (int)xa, ib = (int)xb;
          if (ia == ib) {
            cov[ia - x_lo] += (xb - xa) / SS;
          } else {
            cov[ia - x_lo] += (ia + 1 - xa) / SS;
            for (int k = ia + 1; k < ib; k++) cov[k - x_lo] += 1.0f / SS;
            if (ib - x_lo < (int)cov.size()) cov[ib - x_lo] += (xb - ib) / SS;
          }
        }
      } else {
        int wind = 0;
        float span_start = 0;
        for (size_t i = 0; i < xs.size(); i++) {
          int prev = wind;
          wind += xs[i].second;
          if (prev == 0 && wind != 0) {
            span_start = xs[i].first;
          } else if (prev != 0 && wind == 0) {
            float xa = std::max(span_start, (float)x_lo);
            float xb = std::min(xs[i].first, (float)x_hi + 1);
            if (xb <= xa) continue;
            int ia = (int)xa, ib = (int)xb;
            if (ia == ib) {
              cov[ia - x_lo] += (xb - xa) / SS;
            } else {
              cov[ia - x_lo] += (ia + 1 - xa) / SS;
              for (int k = ia + 1; k < ib; k++) cov[k - x_lo] += 1.0f / SS;
              if (ib - x_lo < (int)cov.size())
                cov[ib - x_lo] += (xb - ib) / SS;
            }
          }
        }
      }
    }
    // blend scanline
    uint8_t* row = cv->px.data() + ((size_t)y * cv->w + x_lo) * 3;
    for (int x = x_lo; x <= x_hi; x++, row += 3) {
      float a = cov[x - x_lo];
      if (a <= 0.002f) continue;
      if (a > 1.0f) a = 1.0f;
      a *= const_alpha;  // ExtGState /ca constant alpha
      if (cv->smask) a *= (*cv->smask)[(size_t)y * cv->w + x];
      if (a <= 0.002f) continue;
      float rgb[3];
      if (!color_at(x, y, rgb)) continue;
      if (cv->bm) blend_apply(cv->bm, row, rgb);
      row[0] = (uint8_t)(row[0] + (rgb[0] * 255.0f - row[0]) * a);
      row[1] = (uint8_t)(row[1] + (rgb[1] * 255.0f - row[1]) * a);
      row[2] = (uint8_t)(row[2] + (rgb[2] * 255.0f - row[2]) * a);
    }
  }
}

// AA polygon fill over page-space subpaths (general entry point).
template <class ColorAt>
void fill_polygon_t(
    Canvas* cv, const std::vector<std::vector<std::pair<float, float>>>& sps,
    bool even_odd, const Rect& clip_pts, ColorAt&& color_at,
    float const_alpha = 1.0f) {
  // thread_local scratch: a text page fills 2000+ glyph polygons; fresh
  // vector allocations per glyph dominated small-glyph cost
  static thread_local std::vector<Edge> edges;
  edges.clear();
  float ymin, ymax, xmin, xmax;
  gather_edges(sps, *cv, &edges, &ymin, &ymax, &xmin, &xmax);
  if (edges.empty()) return;
  scanline_fill_edges(cv, edges, ymin, ymax, xmin, xmax, even_odd, clip_pts,
                      std::forward<ColorAt>(color_at), const_alpha);
}

void fill_polygon(Canvas* cv,
                  const std::vector<std::vector<std::pair<float, float>>>& sps,
                  const float rgb[3], bool even_odd, const Rect& clip_pts,
                  float const_alpha = 1.0f) {
  fill_polygon_t(cv, sps, even_odd, clip_pts,
                 [&](int, int, float* o) {
                   o[0] = rgb[0];
                   o[1] = rgb[1];
                   o[2] = rgb[2];
                   return true;
                 },
                 const_alpha);
}

// Glyph-instance fill without the per-glyph nested-vector copy: the
// default pipeline path renders every glyph through a direct polygon
// fill (the bitmap cache is opt-in — see draw_glyph_run), and building
// a fresh contours->device vector-of-vectors per instance was ~1/3 of
// text-render cost. Transforms contours straight into the edge scratch
// with arithmetic identical to the old two-step path (float-narrowed
// page coords, then to_dev) so output stays bit-identical.
void fill_glyph_direct(Canvas* cv, const Glyph& g, double a, double b,
                       double c, double d, double e, double f,
                       const float rgb[3], const Rect& clip_pts) {
  static thread_local std::vector<Edge> edges;
  edges.clear();
  float ymin = 1e30f, ymax = -1e30f, xmin = 1e30f, xmax = -1e30f;
  for (auto& cont : g.contours) {
    size_t n = cont.size();
    if (n < 2) continue;
    // page coords, float-narrowed exactly like the devc path did
    float px0 = (float)(a * cont[0].first + c * cont[0].second + e);
    float py0 = (float)(b * cont[0].first + d * cont[0].second + f);
    float ax, ay;
    cv->to_dev(px0, py0, &ax, &ay);
    float fx = ax, fy = ay;  // first device point (for implicit close)
    for (size_t i = 0; i < n; i++) {
      float bx, by;
      if (i + 1 < n) {
        float pxi = (float)(a * cont[i + 1].first + c * cont[i + 1].second + e);
        float pyi = (float)(b * cont[i + 1].first + d * cont[i + 1].second + f);
        cv->to_dev(pxi, pyi, &bx, &by);
      } else {
        bx = fx;
        by = fy;
      }
      if (ay != by) {
        Edge ed;
        if (ay < by) ed = {ax, ay, bx, by, 1};
        else ed = {bx, by, ax, ay, -1};
        edges.push_back(ed);
        ymin = std::min(ymin, ed.y0);
        ymax = std::max(ymax, ed.y1);
        xmin = std::min({xmin, ax, bx});
        xmax = std::max({xmax, ax, bx});
      }
      ax = bx;
      ay = by;
    }
  }
  if (edges.empty()) return;
  scanline_fill_edges(cv, edges, ymin, ymax, xmin, xmax, false, clip_pts,
                      [&](int, int, float* o) {
                        o[0] = rgb[0];
                        o[1] = rgb[1];
                        o[2] = rgb[2];
                        return true;
                      });
}

// Axial/radial shading paint: per covered pixel, invert to shading space,
// solve for the gradient parameter s, and look up the pre-sampled LUT.
// Gouraud mesh replay: each triangle fills through the AA machinery
// with barycentric per-pixel color interpolation.
void draw_mesh_shading(Canvas* cv, const RenderShading& sh) {
  size_t ntri = sh.tri_xy.size() / 6;
  const Matrix& m = sh.shade_to_page;
  for (size_t t = 0; t < ntri; t++) {
    const float* xy = sh.tri_xy.data() + t * 6;
    const uint8_t* cols = sh.tri_rgb.data() + t * 9;
    double px[3], py[3];
    for (int i = 0; i < 3; i++)
      m.apply(xy[i * 2], xy[i * 2 + 1], &px[i], &py[i]);
    double det = (py[1] - py[2]) * (px[0] - px[2]) +
                 (px[2] - px[1]) * (py[0] - py[2]);
    if (std::fabs(det) < 1e-12) continue;
    std::vector<std::vector<std::pair<float, float>>> tri{
        {{(float)px[0], (float)py[0]},
         {(float)px[1], (float)py[1]},
         {(float)px[2], (float)py[2]}}};
    double inv_scale = 1.0 / cv->scale;
    fill_polygon_t(
        cv, tri, false, sh.clip, [&](int xd, int yd, float* rgb) {
          double qx = (xd + 0.5) * inv_scale + cv->off_x;
          double qy = (yd + 0.5) * inv_scale + cv->off_y;
          double l0 = ((py[1] - py[2]) * (qx - px[2]) +
                       (px[2] - px[1]) * (qy - py[2])) /
                      det;
          double l1 = ((py[2] - py[0]) * (qx - px[2]) +
                       (px[0] - px[2]) * (qy - py[2])) /
                      det;
          double l2 = 1 - l0 - l1;
          l0 = std::min(std::max(l0, 0.0), 1.0);
          l1 = std::min(std::max(l1, 0.0), 1.0);
          l2 = std::min(std::max(l2, 0.0), 1.0);
          for (int k = 0; k < 3; k++)
            rgb[k] = (float)((cols[k] * l0 + cols[3 + k] * l1 +
                              cols[6 + k] * l2) /
                             255.0);
          return true;
        },
        sh.const_alpha);
  }
}

void draw_shading(Canvas* cv, const RenderShading& sh) {
  if (sh.shading_type >= 4) {
    draw_mesh_shading(cv, sh);
    return;
  }
  const std::vector<std::vector<std::pair<float, float>>>* path =
      &sh.clip_path;
  std::vector<std::vector<std::pair<float, float>>> rectpath;
  if (path->empty()) {  // `sh` operator: paint the whole clip region
    double px0 = std::max(sh.clip.x0, cv->off_x);
    double py0 = std::max(sh.clip.y0, cv->off_y);
    double px1 = std::min(sh.clip.x1, cv->off_x + cv->w / cv->scale);
    double py1 = std::min(sh.clip.y1, cv->off_y + cv->h / cv->scale);
    if (px1 <= px0 || py1 <= py0) return;
    rectpath.push_back({{(float)px0, (float)py0},
                        {(float)px1, (float)py0},
                        {(float)px1, (float)py1},
                        {(float)px0, (float)py1}});
    path = &rectpath;
  }
  Matrix page_to_shade = sh.shade_to_page.invert();
  double inv_scale = 1.0 / cv->scale;
  double c0x = sh.coords[0], c0y = sh.coords[1];
  auto color_at = [&](int xd, int yd, float* rgb) -> bool {
    double px = (xd + 0.5) * inv_scale + cv->off_x;
    double py = (yd + 0.5) * inv_scale + cv->off_y;
    double sx, sy;
    page_to_shade.apply(px, py, &sx, &sy);
    double s;
    if (sh.shading_type == 1) {
      // function-based: (sx, sy) are domain coords; outside = unpainted
      const int L = RenderShading::kLut2d;
      if (sh.lut2d.empty()) return false;
      double u = (sx - sh.dom2d[0]) / (sh.dom2d[1] - sh.dom2d[0] + 1e-30);
      double v = (sy - sh.dom2d[2]) / (sh.dom2d[3] - sh.dom2d[2] + 1e-30);
      if (u < 0 || u > 1 || v < 0 || v > 1) return false;
      int xi = std::min(L - 1, (int)(u * (L - 1) + 0.5));
      int yi = std::min(L - 1, (int)(v * (L - 1) + 0.5));
      const uint8_t* px = sh.lut2d.data() + ((size_t)yi * L + xi) * 3;
      rgb[0] = px[0] / 255.0f;
      rgb[1] = px[1] / 255.0f;
      rgb[2] = px[2] / 255.0f;
      return true;
    }
    if (sh.shading_type == 2) {
      double dx = sh.coords[2] - c0x, dy = sh.coords[3] - c0y;
      double dd = dx * dx + dy * dy;
      if (dd <= 0) return false;
      s = ((sx - c0x) * dx + (sy - c0y) * dy) / dd;
    } else {
      // circle interpolation |p - c(s)| = r(s) (quadratic in s)
      double r0 = sh.coords[2];
      double cdx = sh.coords[3] - c0x, cdy = sh.coords[4] - c0y;
      double dr = sh.coords[5] - r0;
      double pdx = sx - c0x, pdy = sy - c0y;
      double a = cdx * cdx + cdy * cdy - dr * dr;
      double b = pdx * cdx + pdy * cdy + r0 * dr;
      double cq = pdx * pdx + pdy * pdy - r0 * r0;
      if (std::fabs(a) < 1e-9) {
        if (std::fabs(b) < 1e-12) return false;
        s = cq / (2 * b);
      } else {
        double disc = b * b - a * cq;
        if (disc < 0) return false;
        double sq = std::sqrt(disc);
        s = (b + sq) / a;  // prefer the larger root with r(s) >= 0
        if (r0 + s * dr < 0) s = (b - sq) / a;
        if (r0 + s * dr < 0) return false;
      }
    }
    if (s < 0) {
      if (!sh.extend0) return false;
      s = 0;
    }
    if (s > 1) {
      if (!sh.extend1) return false;
      s = 1;
    }
    int idx = (int)(s * 255.0 + 0.5);
    rgb[0] = sh.lut[idx][0] * (1.0f / 255.0f);
    rgb[1] = sh.lut[idx][1] * (1.0f / 255.0f);
    rgb[2] = sh.lut[idx][2] * (1.0f / 255.0f);
    return true;
  };
  fill_polygon_t(cv, *path, sh.even_odd, sh.clip, color_at,
                 sh.const_alpha);
}

// expand a polyline into stroke quads (with square joins/caps)

// ---------------------------------------------------------------------------
// Glyph alpha-bitmap cache: each distinct (glyph outline, device scale,
// 1/4-px subpixel phase) rasterizes ONCE per thread and blends as an alpha
// bitmap thereafter. Text pages carry thousands of glyph occurrences from a
// few dozen distinct glyphs — direct per-occurrence polygon filling was the
// rasterizer's dominant cost (~59ms/page text-heavy; ~12x the drawing
// cost). Rotated/skewed text falls back to direct filling.
// ---------------------------------------------------------------------------

struct GlyphBitmap {
  int w = 0, h = 0;
  int ox = 0, oy = 0;             // offset of bitmap[0,0] from the anchor
  bool oversize = false;          // bitmap refused for size: caller must
                                  // fall back to direct polygon filling
  std::vector<uint8_t> alpha;     // coverage 0..255
};

struct GlyphKey {
  const void* glyph;
  uint64_t gen;                   // Document::gen_id — Glyph* addresses can
                                  // be reused across document lifetimes
  int32_t qa, qd;                 // exact float bits of the device scale
  int8_t phx, phy;                // subpixel phase, 1/32s
  bool operator==(const GlyphKey& o) const {
    return glyph == o.glyph && gen == o.gen && qa == o.qa && qd == o.qd &&
           phx == o.phx && phy == o.phy;
  }
};
struct GlyphKeyHash {
  size_t operator()(const GlyphKey& k) const {
    size_t h = (size_t)k.glyph ^ (size_t)k.gen * 0x9E3779B97F4A7C15ull;
    h = h * 1315423911u ^ (size_t)(uint32_t)k.qa;
    h = h * 1315423911u ^ (size_t)(uint32_t)k.qd;
    h = h * 1315423911u ^ (size_t)((uint32_t)k.phx * 32 + (uint32_t)k.phy);
    return h;
  }
};

using GlyphCache = std::unordered_map<GlyphKey, GlyphBitmap, GlyphKeyHash>;

// Rasterize one glyph (font units) under x' = A*u + fx, y' = D*v + fy into
// an alpha bitmap — same 4x vertical supersampling + exact horizontal
// coverage as fill_polygon.
GlyphBitmap rasterize_glyph_alpha(const Glyph& g, float A, float D, float fx,
                                  float fy) {
  GlyphBitmap out;
  float xmin = 1e30f, xmax = -1e30f, ymin = 1e30f, ymax = -1e30f;
  std::vector<Edge> edges;
  for (auto& cont : g.contours) {
    size_t n = cont.size();
    for (size_t i = 0; i < n; i++) {
      size_t j = (i + 1) % n;
      float ax = cont[i].first * A + fx, ay = cont[i].second * D + fy;
      float bx = cont[j].first * A + fx, by = cont[j].second * D + fy;
      if (ay == by) {
        xmin = std::min({xmin, ax, bx});
        xmax = std::max({xmax, ax, bx});
        ymin = std::min({ymin, ay});
        ymax = std::max({ymax, ay});
        continue;
      }
      Edge e;
      if (ay < by) e = {ax, ay, bx, by, 1};
      else e = {bx, by, ax, ay, -1};
      edges.push_back(e);
      xmin = std::min({xmin, ax, bx});
      xmax = std::max({xmax, ax, bx});
      ymin = std::min(ymin, e.y0);
      ymax = std::max(ymax, e.y1);
    }
  }
  if (edges.empty() || xmax < xmin) return out;
  int x0 = (int)std::floor(xmin), x1 = (int)std::ceil(xmax);
  int y0 = (int)std::floor(ymin), y1 = (int)std::ceil(ymax);
  out.ox = x0;
  out.oy = y0;
  out.w = std::max(1, x1 - x0 + 1);
  out.h = std::max(1, y1 - y0 + 1);
  if ((int64_t)out.w * out.h > 1 << 22) {  // absurd size: refuse cache
    out.w = out.h = 0;
    out.oversize = true;  // caller falls back to direct polygon fill
    return out;
  }
  out.alpha.assign((size_t)out.w * out.h, 0);
  std::vector<float> cov((size_t)out.w + 2, 0.0f);
  std::vector<std::pair<float, int>> xs;
  // cached bitmaps amortize across occurrences, so spend MORE quality
  // here than the direct path: 8x vertical supersampling halves the
  // coverage quantization that phase rounding can flip
  const int SS = 8;
  for (int y = 0; y < out.h; y++) {
    std::fill(cov.begin(), cov.end(), 0.0f);
    for (int s = 0; s < SS; s++) {
      float sy = (y0 + y) + (s + 0.5f) / SS;
      xs.clear();
      for (auto& e : edges) {
        if (sy < e.y0 || sy >= e.y1) continue;
        float t = (sy - e.y0) / (e.y1 - e.y0);
        xs.push_back({e.x0 + t * (e.x1 - e.x0), e.dir});
      }
      if (xs.empty()) continue;
      std::sort(xs.begin(), xs.end());
      int wind = 0;
      float span_x = 0;
      for (auto& [x, dir] : xs) {
        int prev = wind;
        wind += dir;
        if (prev == 0 && wind != 0) {
          span_x = x;
        } else if (prev != 0 && wind == 0) {
          float xa = std::max(span_x - x0, 0.0f);
          float xb = std::min(x - x0, (float)out.w);
          if (xb <= xa) continue;
          int ia = (int)xa, ib = (int)xb;
          if (ia == ib) {
            cov[ia] += (xb - xa) / SS;
          } else {
            cov[ia] += (ia + 1 - xa) / SS;
            for (int k = ia + 1; k < ib; k++) cov[k] += 1.0f / SS;
            if (ib < (int)cov.size()) cov[ib] += (xb - ib) / SS;
          }
        }
      }
    }
    uint8_t* row = out.alpha.data() + (size_t)y * out.w;
    for (int k = 0; k < out.w; k++) {
      float c = cov[k];
      if (c <= 0) continue;
      if (c > 1) c = 1;
      row[k] = (uint8_t)(c * 255.0f + 0.5f);
    }
  }
  return out;
}

void blend_glyph_bitmap(Canvas* cv, const GlyphBitmap& bm, int ax, int ay,
                        const float rgb[3], const Rect& clip_pts) {
  float cx0, cy0, cx1, cy1;
  cv->to_dev((float)clip_pts.x0, (float)clip_pts.y0, &cx0, &cy0);
  cv->to_dev((float)clip_pts.x1, (float)clip_pts.y1, &cx1, &cy1);
  int clx = std::max(0, (int)std::floor(cx0));
  int cly = std::max(0, (int)std::floor(cy0));
  int chx = std::min(cv->w - 1, (int)std::ceil(cx1));
  int chy = std::min(cv->h - 1, (int)std::ceil(cy1));
  uint8_t cr = (uint8_t)(rgb[0] * 255.0f + 0.5f);
  uint8_t cg = (uint8_t)(rgb[1] * 255.0f + 0.5f);
  uint8_t cb = (uint8_t)(rgb[2] * 255.0f + 0.5f);
  for (int y = 0; y < bm.h; y++) {
    int dy = ay + bm.oy + y;
    if (dy < cly || dy > chy) continue;
    const uint8_t* srow = bm.alpha.data() + (size_t)y * bm.w;
    uint8_t* drow = cv->px.data() + ((size_t)dy * cv->w) * 3;
    for (int x = 0; x < bm.w; x++) {
      uint8_t a = srow[x];
      if (!a) continue;
      int dx = ax + bm.ox + x;
      if (dx < clx || dx > chx) continue;
      uint8_t* p = drow + (size_t)dx * 3;
      if (cv->bm || cv->smask) {  // rare for text: take the slow path
        float af = a / 255.0f;
        if (cv->smask) af *= (*cv->smask)[(size_t)dy * cv->w + dx];
        if (af <= 0.002f) continue;
        float src[3] = {rgb[0], rgb[1], rgb[2]};
        if (cv->bm) blend_apply(cv->bm, p, src);
        for (int k = 0; k < 3; k++)
          p[k] = (uint8_t)(p[k] + (src[k] * 255.0f - p[k]) * af);
      } else if (a == 255) {
        p[0] = cr;
        p[1] = cg;
        p[2] = cb;
      } else {
        int ia = 255 - a;
        p[0] = (uint8_t)((p[0] * ia + cr * a) / 255);
        p[1] = (uint8_t)((p[1] * ia + cg * a) / 255);
        p[2] = (uint8_t)((p[2] * ia + cb * a) / 255);
      }
    }
  }
}

void draw_glyph_run(Canvas* cv, const RenderGlyphRun& gr, GlyphCache* cache,
                    uint64_t doc_gen) {
  // OPT-IN (SPDF_GLYPH_CACHE=1): the cache wins ~10x on full text PAGES
  // (repeated glyphs at one scale: training-data generation, scanned-book
  // synthesis) but LOSES on the pipeline's region crops — fitted-DPI
  // renders give every region its own scale, so keys rarely repeat and
  // the 1/32-phase bitmap builds are pure overhead (bench: 21.0 vs 22.8
  // pages/s), while phase rounding costs OCR CER 0.025 -> 0.038.
  static const bool use_cache = getenv("SPDF_GLYPH_CACHE") != nullptr;
  // per-instance cull: a line of body text often straddles the render
  // canvas edge — the run survives the list-level bounds check but most
  // of its glyphs still cannot ink a pixel (margin: 2 device px of AA)
  const float gmargin = (float)(2.0 / cv->scale);
  const float gx0 = (float)cv->off_x - gmargin;
  const float gy0 = (float)cv->off_y - gmargin;
  const float gx1 = (float)(cv->off_x + cv->w / cv->scale) + gmargin;
  const float gy1 = (float)(cv->off_y + cv->h / cv->scale) + gmargin;
  for (const auto& gi : gr.glyph_insts) {
    if (gi.bx1 >= gi.bx0 &&
        (gi.bx1 < gx0 || gi.bx0 > gx1 || gi.by1 < gy0 || gi.by0 > gy1))
      continue;
    // glyph -> device affine
    float A = (float)(gi.a * cv->scale);
    float B = (float)(gi.b * cv->scale);
    float C = (float)(gi.c * cv->scale);
    float D = (float)(gi.d * cv->scale);
    float E = (float)((gi.e - cv->off_x) * cv->scale);
    float F = (float)((gi.f - cv->off_y) * cv->scale);
    bool axis_aligned =
        use_cache &&
        std::fabs(B) < 1e-4f * (std::fabs(A) + 1e-6f) + 1e-4f &&
        std::fabs(C) < 1e-4f * (std::fabs(D) + 1e-6f) + 1e-4f;
    if (axis_aligned) {
      int ax = (int)std::floor(E), ay = (int)std::floor(F);
      float fx = E - ax, fy = F - ay;
      // 1/32-px phase grid: coarser grids measurably degraded OCR on
      // small (8-10px) glyphs via per-glyph position jitter
      int phx = (int)(fx * 32.0f) & 31, phy = (int)(fy * 32.0f) & 31;
      // key on the EXACT float bits: per-font-unit scales are tiny
      // (~0.005 for upem 2048) and identical across occurrences of the
      // same (font size, dpi) — coarse quantization would alias
      // different text sizes onto one bitmap
      int32_t qa, qd;
      memcpy(&qa, &A, 4);
      memcpy(&qd, &D, 4);
      GlyphKey key{gi.glyph, doc_gen, qa, qd, (int8_t)phx, (int8_t)phy};
      auto it = cache->find(key);
      if (it == cache->end()) {
        if (cache->size() > 20000) cache->clear();  // unbounded-book guard
        it = cache->emplace(key, rasterize_glyph_alpha(
                                      *gi.glyph, A, D, phx * 0.03125f,
                                      phy * 0.03125f)).first;
      }
      if (it->second.w) {
        blend_glyph_bitmap(cv, it->second, ax, ay, gr.rgb, gr.clip);
        continue;
      }
      // size-refused bitmaps (display-size glyphs at high DPI) must still
      // render: fall through to the direct polygon-fill path below
      if (!it->second.oversize) continue;  // genuinely empty glyph
    }
    // direct fill (default path: cache off, or rotated/skewed/oversize)
    fill_glyph_direct(cv, *gi.glyph, gi.a, gi.b, gi.c, gi.d, gi.e, gi.f,
                      gr.rgb, gr.clip);
  }
}

// Convex-quad AA fill — the stroke-segment hot path. A text/chart page
// strokes thousands of short segments; the general fill_polygon paid a
// nested-vector copy + crossing sort + winding walk per segment
// (profiled ~45% of rasterize). A convex quad has exactly two scanline
// crossings, so the span is [min, max] of the edge intersections — same
// arithmetic as the general nonzero path, no allocation, no sort.
// Coverage/blend math matches fill_polygon_t exactly (4x vertical
// supersample + fractional horizontal), so output is pixel-identical.
void fill_quad(Canvas* cv, const float qx[4], const float qy[4],
               const float rgb[3], const Rect& clip_pts,
               float const_alpha = 1.0f) {
  // device-space edges (implicit close), downward-oriented like
  // gather_edges
  float dx[4], dy[4];
  float ymin = 1e30f, ymax = -1e30f, xmin = 1e30f, xmax = -1e30f;
  for (int i = 0; i < 4; i++) {
    cv->to_dev(qx[i], qy[i], &dx[i], &dy[i]);
    ymin = std::min(ymin, dy[i]);
    ymax = std::max(ymax, dy[i]);
    xmin = std::min(xmin, dx[i]);
    xmax = std::max(xmax, dx[i]);
  }
  float cx0, cy0, cx1, cy1;
  cv->to_dev((float)clip_pts.x0, (float)clip_pts.y0, &cx0, &cy0);
  cv->to_dev((float)clip_pts.x1, (float)clip_pts.y1, &cx1, &cy1);
  int y_start = std::max({0, (int)std::floor(ymin), (int)std::floor(cy0)});
  int y_end = std::min({cv->h - 1, (int)std::ceil(ymax), (int)std::ceil(cy1)});
  int x_lo = std::max({0, (int)std::floor(xmin), (int)std::floor(cx0)});
  int x_hi = std::min({cv->w - 1, (int)std::ceil(xmax), (int)std::ceil(cx1)});
  if (y_start > y_end || x_lo > x_hi) return;

  static thread_local std::vector<float> cov;
  cov.assign((size_t)x_hi - x_lo + 2, 0.0f);
  const int SS = 4;
  for (int y = y_start; y <= y_end; y++) {
    std::fill(cov.begin(), cov.end(), 0.0f);
    bool any = false;
    for (int s = 0; s < SS; s++) {
      float sy = y + (s + 0.5f) / SS;
      float xa = 1e30f, xb = -1e30f;
      for (int i = 0; i < 4; i++) {
        int j = (i + 1) & 3;
        float ay = dy[i], by = dy[j];
        float ax = dx[i], bx = dx[j];
        if (ay == by) continue;
        if (ay > by) {
          std::swap(ay, by);
          std::swap(ax, bx);
        }
        if (sy < ay || sy >= by) continue;
        float t = (sy - ay) / (by - ay);
        float x = ax + t * (bx - ax);
        xa = std::min(xa, x);
        xb = std::max(xb, x);
      }
      if (xb <= xa) continue;
      xa = std::max(xa, (float)x_lo);
      xb = std::min(xb, (float)x_hi + 1);
      if (xb <= xa) continue;
      any = true;
      int ia = (int)xa, ib = (int)xb;
      if (ia == ib) {
        cov[ia - x_lo] += (xb - xa) / SS;
      } else {
        cov[ia - x_lo] += (ia + 1 - xa) / SS;
        for (int k = ia + 1; k < ib; k++) cov[k - x_lo] += 1.0f / SS;
        if (ib - x_lo < (int)cov.size()) cov[ib - x_lo] += (xb - ib) / SS;
      }
    }
    if (!any) continue;
    uint8_t* row = cv->px.data() + ((size_t)y * cv->w + x_lo) * 3;
    for (int x = x_lo; x <= x_hi; x++, row += 3) {
      float a = cov[x - x_lo];
      if (a <= 0.002f) continue;
      if (a > 1.0f) a = 1.0f;
      a *= const_alpha;  // ExtGState /CA constant alpha
      if (cv->smask) a *= (*cv->smask)[(size_t)y * cv->w + x];
      if (a <= 0.002f) continue;
      float src[3] = {rgb[0], rgb[1], rgb[2]};
      if (cv->bm) blend_apply(cv->bm, row, src);
      row[0] = (uint8_t)(row[0] + (src[0] * 255.0f - row[0]) * a);
      row[1] = (uint8_t)(row[1] + (src[1] * 255.0f - row[1]) * a);
      row[2] = (uint8_t)(row[2] + (src[2] * 255.0f - row[2]) * a);
    }
  }
}

void stroke_subpath(Canvas* cv, const std::vector<std::pair<float, float>>& sp,
                    float width_pts, const float rgb[3], const Rect& clip,
                    float const_alpha = 1.0f) {
  if (sp.size() < 2) return;
  float hw = std::max((float)(width_pts * cv->scale), 0.9f) * 0.5f /
             (float)cv->scale;  // half width in page pts
  for (size_t i = 0; i + 1 < sp.size(); i++) {
    float x0 = sp[i].first, y0 = sp[i].second;
    float x1 = sp[i + 1].first, y1 = sp[i + 1].second;
    float dx = x1 - x0, dy = y1 - y0;
    float len = std::sqrt(dx * dx + dy * dy);
    if (len < 1e-9f) continue;
    float px = -dy / len * hw, py = dx / len * hw;
    // extend ends by hw for cap/join coverage
    float ex = dx / len * hw, ey = dy / len * hw;
    const float qx[4] = {x0 - ex + px, x1 + ex + px, x1 + ex - px,
                         x0 - ex - px};
    const float qy[4] = {y0 - ey + py, y1 + ey + py, y1 + ey - py,
                         y0 - ey - py};
    fill_quad(cv, qx, qy, rgb, clip, const_alpha);
  }
}

void blit_image(Canvas* cv, Document* doc, const RenderImage& ri) {
  const std::vector<uint8_t>* pix = nullptr;
  const std::vector<uint8_t>* alpha = nullptr;
  int iw = 0, ih = 0, aw = 0, ah = 0;
  if (ri.inline_image) {
    pix = &ri.inline_rgb;
    iw = ri.inline_w;
    ih = ri.inline_h;
    if (!ri.inline_alpha.empty()) {
      alpha = &ri.inline_alpha;
      aw = ri.inline_aw;
      ah = ri.inline_ah;
    }
  } else {
    // document-level cache (spdf.h::Document::img_cache): shared with
    // spdf_decode_image so the variance-validation decode warms the two
    // renders. Cap check BEFORE taking any reference into the map — a
    // clear mid-use would dangle pix/alpha.
    if (doc->img_cache_bytes > Document::kImgCacheCap) {
      doc->img_cache.clear();
      doc->img_cache_bytes = 0;
    }
    auto& ci = doc->img_cache[ri.obj_num];
    if (!ci.alpha_done) {
      ObjPtr xo = doc->get_object(ri.obj_num);
      ci.alpha = decode_image_alpha(doc, xo, &ci.aw, &ci.ah);
      ci.alpha_done = true;
      doc->img_cache_bytes += ci.alpha.size();
    }
    if (!ri.stencil && !ci.rgb_done) {
      ObjPtr xo = doc->get_object(ri.obj_num);
      ci.rgb = decode_image_rgb_obj(doc, xo, &ci.w, &ci.h);
      ci.rgb_done = true;
      doc->img_cache_bytes += ci.rgb.size();
    }
    pix = &ci.rgb;
    // stencil geometry = mask dims; pixels come from stencil_rgb
    iw = ri.stencil ? ci.aw : ci.w;
    ih = ri.stencil ? ci.ah : ci.h;
    if (!ci.alpha.empty()) {
      alpha = &ci.alpha;
      aw = ci.aw;
      ah = ci.ah;
    }
  }
  if (ri.stencil) {
    if (!alpha) return;  // a stencil without coverage paints nothing
  } else if (!pix || pix->empty()) {
    return;
  }
  if (iw <= 0 || ih <= 0) return;
  // invert img_to_page: page pt -> unit square
  const Matrix& m = ri.img_to_page;
  double det = m.a * m.d - m.b * m.c;
  if (std::fabs(det) < 1e-12) return;
  double ia = m.d / det, ib = -m.b / det, ic = -m.c / det, id = m.a / det;
  double ie = -(m.e * ia + m.f * ic), iff = -(m.e * ib + m.f * id);
  // device bbox of unit square
  Rect bb;
  for (int k = 0; k < 4; k++) {
    double ux = k & 1, uy = k >> 1;
    double pxp = m.a * ux + m.c * uy + m.e;
    double pyp = m.b * ux + m.d * uy + m.f;
    float dx, dy;
    cv->to_dev((float)pxp, (float)pyp, &dx, &dy);
    bb.grow(dx, dy);
  }
  float ccx0, ccy0, ccx1, ccy1;
  cv->to_dev((float)ri.clip.x0, (float)ri.clip.y0, &ccx0, &ccy0);
  cv->to_dev((float)ri.clip.x1, (float)ri.clip.y1, &ccx1, &ccy1);
  int x0 = std::max({0, (int)std::floor(bb.x0), (int)std::floor(ccx0)});
  int y0 = std::max({0, (int)std::floor(bb.y0), (int)std::floor(ccy0)});
  int x1 = std::min({cv->w - 1, (int)std::ceil(bb.x1), (int)std::ceil(ccx1)});
  int y1 = std::min({cv->h - 1, (int)std::ceil(bb.y1), (int)std::ceil(ccy1)});
  if (x1 < x0 || y1 < y0) return;

  // Axis-aligned placements (the overwhelming case: upright figures and
  // scans) factor the inverse map per axis — ux depends only on x and
  // uy only on y, so the per-column sample coordinates, clamped bilinear
  // indices and weights are computed once instead of per pixel (was
  // ~26% of full-page render time at 8 ms/image). The expressions
  // mirror the general path's operation order, but the compiler's FMA
  // contraction rounds the restructured loop differently: output can
  // differ from the general path by at most 1/255 per channel at
  // bilinear rounding boundaries (measured max |delta| = 1 over the
  // 1,000-page bench book).
  bool axis = ib == 0.0 && ic == 0.0 && !cv->bm && !cv->smask &&
              alpha == nullptr && !ri.stencil && ri.const_alpha >= 1.0f;
  if (axis) {
    struct ColS { int i0, i1; double wx; bool in; };
    static thread_local std::vector<ColS> cols;
    cols.resize((size_t)x1 - x0 + 1);
    for (int x = x0; x <= x1; x++) {
      double pxp = cv->off_x + (x + 0.5) / cv->scale;
      double ux = ia * pxp + ie;
      ColS& cs = cols[x - x0];
      cs.in = !(ux < 0 || ux >= 1);
      if (!cs.in) continue;
      double fx = ux * iw - 0.5;
      int sx = (int)std::floor(fx);
      cs.wx = fx - sx;
      cs.i0 = std::min(std::max(sx, 0), iw - 1);
      cs.i1 = std::min(std::max(sx + 1, 0), iw - 1);
    }
    for (int y = y0; y <= y1; y++) {
      double pyp = cv->off_y + (y + 0.5) / cv->scale;
      double uy = id * pyp + iff;
      if (uy < 0 || uy >= 1) continue;
      double fy = (1.0 - uy) * ih - 0.5;
      int sy = (int)std::floor(fy);
      double ay = fy - sy;
      const uint8_t* r0 =
          pix->data() + (size_t)std::min(std::max(sy, 0), ih - 1) * iw * 3;
      const uint8_t* r1 = pix->data() +
                          (size_t)std::min(std::max(sy + 1, 0), ih - 1) *
                              iw * 3;
      uint8_t* out = cv->px.data() + ((size_t)y * cv->w + x0) * 3;
      for (int x = x0; x <= x1; x++, out += 3) {
        const ColS& cs = cols[x - x0];
        if (!cs.in) continue;
        const uint8_t *p00 = r0 + (size_t)cs.i0 * 3,
                      *p01 = r0 + (size_t)cs.i1 * 3,
                      *p10 = r1 + (size_t)cs.i0 * 3,
                      *p11 = r1 + (size_t)cs.i1 * 3;
        double ax = cs.wx;
        for (int k = 0; k < 3; k++) {
          // same expression order as the general path below
          double v = p00[k] * (1 - ax) * (1 - ay) +
                     p01[k] * ax * (1 - ay) + p10[k] * (1 - ax) * ay +
                     p11[k] * ax * ay;
          out[k] = (uint8_t)std::min(255.0, std::max(0.0, v));
        }
      }
    }
    return;
  }

  for (int y = y0; y <= y1; y++) {
    for (int x = x0; x <= x1; x++) {
      // device px center -> page pts
      double pxp = cv->off_x + (x + 0.5) / cv->scale;
      double pyp = cv->off_y + (y + 0.5) / cv->scale;
      double ux = ia * pxp + ic * pyp + ie;
      double uy = ib * pxp + id * pyp + iff;
      if (ux < 0 || ux >= 1 || uy < 0 || uy >= 1) continue;
      // PDF image space: (0,0) bottom-left; row 0 of samples = top
      double fx = ux * iw - 0.5, fy = (1.0 - uy) * ih - 0.5;
      int sx = (int)std::floor(fx), sy = (int)std::floor(fy);
      double ax = fx - sx, ay = fy - sy;
      auto at = [&](int yy, int xx, int k) -> double {
        yy = std::min(std::max(yy, 0), ih - 1);
        xx = std::min(std::max(xx, 0), iw - 1);
        return (*pix)[((size_t)yy * iw + xx) * 3 + k];
      };
      double a = ri.const_alpha;  // ExtGState /ca at placement
      if (alpha) {
        // the alpha plane has its own dims (SMask resolution may differ)
        double gx = ux * aw - 0.5, gy = (1.0 - uy) * ah - 0.5;
        int tx = (int)std::floor(gx), ty = (int)std::floor(gy);
        double bx = gx - tx, by = gy - ty;
        auto aat = [&](int yy, int xx) -> double {
          yy = std::min(std::max(yy, 0), ah - 1);
          xx = std::min(std::max(xx, 0), aw - 1);
          return (*alpha)[(size_t)yy * aw + xx];
        };
        a *= (aat(ty, tx) * (1 - bx) * (1 - by) +
              aat(ty, tx + 1) * bx * (1 - by) +
              aat(ty + 1, tx) * (1 - bx) * by +
              aat(ty + 1, tx + 1) * bx * by) /
             255.0;
      }
      if (cv->smask) a *= (*cv->smask)[(size_t)y * cv->w + x];
      if (a <= 1.0 / 255.0) continue;
      uint8_t* out = cv->px.data() + ((size_t)y * cv->w + x) * 3;
      float src[3];
      for (int k = 0; k < 3; k++) {
        double v = ri.stencil
                       ? ri.stencil_rgb[k] * 255.0
                       : at(sy, sx, k) * (1 - ax) * (1 - ay) +
                             at(sy, sx + 1, k) * ax * (1 - ay) +
                             at(sy + 1, sx, k) * (1 - ax) * ay +
                             at(sy + 1, sx + 1, k) * ax * ay;
        src[k] = (float)std::min(1.0, std::max(0.0, v / 255.0));
      }
      if (cv->bm) blend_apply(cv->bm, out, src);
      for (int k = 0; k < 3; k++) {
        double v = src[k] * 255.0 * a + out[k] * (1 - a);
        out[k] = (uint8_t)std::min(255.0, std::max(0.0, v));
      }
    }
  }
}

}  // namespace

// Tiling-pattern fill: rasterize the cell display list once per
// (pattern, device scale) with white AND black backgrounds to recover
// per-pixel alpha (rendered = src*a + bg*(1-a) solves for a and src),
// then fill the path with a color_at that samples the tiled cell.
struct TileBitmap {
  std::vector<uint8_t> rgb;    // premultiplied-src recovered colors
  std::vector<uint8_t> alpha;  // 0..255 coverage
  int w = 0, h = 0;
};

static void draw_tiled_fill(
    Canvas* cv, Document* doc, const RenderPath& rp,
    std::unordered_map<const DisplayList*, TileBitmap>* tile_cache) {
  auto it = tile_cache->find(rp.tile_dl.get());
  if (it == tile_cache->end()) {
    TileBitmap tb;
    const Matrix& m = rp.tile_to_page;
    double s = cv->scale * std::sqrt(std::fabs(m.a * m.d - m.b * m.c));
    if (!(s > 1e-9) || !std::isfinite(s)) s = cv->scale;
    double tw = rp.tile_dl->page_w * s, th = rp.tile_dl->page_h * s;
    if (tw >= 1 && th >= 1 && tw <= 2048 && th <= 2048) {
      double cellscale = s;
      int w1, h1, w2, h2;
      std::vector<uint8_t> on_white =
          rasterize(doc, *rp.tile_dl, cellscale, nullptr, &w1, &h1, 255);
      std::vector<uint8_t> on_black =
          rasterize(doc, *rp.tile_dl, cellscale, nullptr, &w2, &h2, 0);
      if (!on_white.empty() && w1 == w2 && h1 == h2) {
        tb.w = w1;
        tb.h = h1;
        tb.rgb.resize(on_white.size());
        tb.alpha.resize((size_t)w1 * h1);
        for (size_t i = 0; i < tb.alpha.size(); i++) {
          int amax = 0;
          for (int k = 0; k < 3; k++) {
            int a = 255 - (on_white[i * 3 + k] - on_black[i * 3 + k]);
            if (a > amax) amax = a;
          }
          amax = std::min(std::max(amax, 0), 255);
          tb.alpha[i] = (uint8_t)amax;
          for (int k = 0; k < 3; k++) {
            int src = amax ? on_black[i * 3 + k] * 255 / amax : 0;
            tb.rgb[i * 3 + k] = (uint8_t)std::min(src, 255);
          }
        }
      }
    }
    it = tile_cache->emplace(rp.tile_dl.get(), std::move(tb)).first;
  }
  const TileBitmap& tb = it->second;
  if (tb.w <= 0 || tb.h <= 0) {
    // degenerate cell: mid-gray degrade, keep ink for detection
    const float gray[3] = {0.5f, 0.5f, 0.5f};
    fill_polygon(cv, rp.subpaths, gray, rp.even_odd, rp.clip);
    return;
  }
  // invert pattern->page for per-pixel lookup
  const Matrix& m = rp.tile_to_page;
  double det = m.a * m.d - m.b * m.c;
  if (std::fabs(det) < 1e-12) return;
  double ia = m.d / det, ib = -m.b / det, ic = -m.c / det, id = m.a / det;
  double ie = -(m.e * ia + m.f * ic), iff = -(m.e * ib + m.f * id);
  fill_polygon_t(
      cv, rp.subpaths, rp.even_odd, rp.clip, [&](int x, int y, float* o) {
        double px = cv->off_x + (x + 0.5) / cv->scale;
        double py = cv->off_y + (y + 0.5) / cv->scale;
        double ux = ia * px + ic * py + ie;
        double uy = ib * px + id * py + iff;
        double fx = std::fmod(ux - rp.tile_x0, (double)rp.tile_xstep);
        if (fx < 0) fx += rp.tile_xstep;
        double fy = std::fmod(uy - rp.tile_y0, (double)rp.tile_ystep);
        if (fy < 0) fy += rp.tile_ystep;
        // steps larger than the cell leave gaps between tiles
        if (fx >= rp.tile_w || fy >= rp.tile_h) return false;
        int tx = std::min(tb.w - 1, (int)(fx / rp.tile_w * tb.w));
        // cell bitmap is y-down from the bbox top
        int ty = std::min(tb.h - 1, (int)((1.0 - fy / rp.tile_h) * tb.h));
        ty = std::max(ty, 0);
        size_t ti = (size_t)ty * tb.w + tx;
        float a = tb.alpha[ti] / 255.0f;
        if (a <= 0.004f) return false;
        const uint8_t* cur =
            cv->px.data() + ((size_t)y * cv->w + x) * 3;
        for (int k = 0; k < 3; k++)
          o[k] = (tb.rgb[ti * 3 + k] / 255.0f) * a +
                 (cur[k] / 255.0f) * (1 - a);
        return true;
      });
}

// ---------------------------------------------------------------------------
// display-list bounds (region-render culling)
// ---------------------------------------------------------------------------

namespace {

inline Rect rect_clamp(const Rect& b, const Rect& clip) {
  Rect r;
  r.x0 = std::max(b.x0, clip.x0);
  r.y0 = std::max(b.y0, clip.y0);
  r.x1 = std::min(b.x1, clip.x1);
  r.y1 = std::min(b.y1, clip.y1);
  return r;  // may come out invalid (= paints nothing / never culled)
}

}  // namespace

// One pass after extraction: conservative page-space paint bounds per
// primitive. The pipeline renders every detected region twice (fitted-DPI
// analysis canvas + 150-DPI output crop, synapta_tpu/io/loader.py) with a
// clip a fraction of the page; before this pass each render replayed the
// FULL page display list (every body-text glyph built edges, every path
// sorted crossings) only for the scanline clip to discard the work.
// Bounds are conservative: strokes inflate by the full line width
// (covers caps/joins/min-width widening), glyph instances transform the
// outline bbox corners, images transform the unit square. Validity
// doubles as the cull gate — an invalid rect (empty path, never-computed
// sub-list) is never culled, so unknown always renders.
void compute_display_bounds(DisplayList* dl) {
  for (auto& rp : dl->paths) {
    Rect b;
    for (auto& sp : rp.subpaths)
      for (auto& p : sp) b.grow(p.first, p.second);
    if (rp.stroke && b.valid()) {
      double inf = std::max(1.0, (double)rp.line_width);
      b.x0 -= inf;
      b.y0 -= inf;
      b.x1 += inf;
      b.y1 += inf;
    }
    rp.bounds = b.valid() ? rect_clamp(b, rp.clip) : b;
  }
  // font-unit outline bbox per distinct glyph (shared across instances)
  std::unordered_map<const Glyph*, Rect> glyph_bb;
  for (auto& gr : dl->glyphs) {
    Rect rb;
    for (auto& gi : gr.glyph_insts) {
      auto it = glyph_bb.find(gi.glyph);
      if (it == glyph_bb.end()) {
        Rect fb;
        if (gi.glyph)
          for (auto& c : gi.glyph->contours)
            for (auto& p : c) fb.grow(p.first, p.second);
        it = glyph_bb.emplace(gi.glyph, fb).first;
      }
      const Rect& fb = it->second;
      if (!fb.valid()) continue;  // empty glyph: instance stays invalid
      Rect ib;
      const double xs[2] = {fb.x0, fb.x1}, ys[2] = {fb.y0, fb.y1};
      for (int i = 0; i < 2; i++)
        for (int j = 0; j < 2; j++)
          ib.grow(gi.a * xs[i] + gi.c * ys[j] + gi.e,
                  gi.b * xs[i] + gi.d * ys[j] + gi.f);
      gi.bx0 = (float)ib.x0;
      gi.by0 = (float)ib.y0;
      gi.bx1 = (float)ib.x1;
      gi.by1 = (float)ib.y1;
      rb.grow(ib.x0, ib.y0);
      rb.grow(ib.x1, ib.y1);
    }
    gr.bounds = rb.valid() ? rect_clamp(rb, gr.clip) : rb;
  }
  for (auto& ri : dl->images) {
    Rect b;
    const double us[2] = {0.0, 1.0};
    for (int i = 0; i < 2; i++)
      for (int j = 0; j < 2; j++) {
        double x, y;
        ri.img_to_page.apply(us[i], us[j], &x, &y);
        b.grow(x, y);
      }
    ri.bounds = rect_clamp(b, ri.clip);
  }
  for (auto& sh : dl->shadings) {
    if (sh.clip_path.empty()) {
      // `sh` operator paints the whole clip region
      sh.bounds = sh.clip;
      continue;
    }
    Rect b;
    for (auto& sp : sh.clip_path)
      for (auto& p : sp) b.grow(p.first, p.second);
    sh.bounds = b.valid() ? rect_clamp(b, sh.clip) : b;
  }
}

std::vector<uint8_t> rasterize(Document* doc, const DisplayList& dl,
                               double scale, const double* clip_pts,
                               int* out_w, int* out_h, uint8_t bg) {
  Canvas cv;
  double cx0 = 0, cy0 = 0, cx1 = dl.page_w, cy1 = dl.page_h;
  if (clip_pts) {
    cx0 = clip_pts[0];
    cy0 = clip_pts[1];
    cx1 = clip_pts[2];
    cy1 = clip_pts[3];
  }
  cv.scale = scale;
  cv.off_x = cx0;
  cv.off_y = cy0;
  cv.w = std::max(1, (int)std::lround((cx1 - cx0) * scale));
  cv.h = std::max(1, (int)std::lround((cy1 - cy0) * scale));
  if ((int64_t)cv.w * cv.h > (int64_t)256 << 20) {
    *out_w = *out_h = 0;
    return {};
  }
  cv.px.assign((size_t)cv.w * cv.h * 3, bg);  // page background

  std::unordered_map<const DisplayList*, TileBitmap> tile_cache;
  static thread_local GlyphCache glyph_cache;

  // ExtGState /SMask planes: the mask group renders once per (mask,
  // canvas) at identical geometry; luminosity (over the /BC backdrop)
  // or dual-background-recovered alpha becomes a 0..1 multiplier.
  std::unordered_map<const SoftMaskSpec*, std::vector<float>> mask_cache;
  auto mask_plane =
      [&](const std::shared_ptr<SoftMaskSpec>& sm) -> const std::vector<float>* {
    if (!sm || !sm->dl) return nullptr;
    auto it = mask_cache.find(sm.get());
    if (it != mask_cache.end())
      return it->second.empty() ? nullptr : &it->second;
    std::vector<float> plane;
    double mclip[4] = {cv.off_x, cv.off_y, cv.off_x + cv.w / cv.scale,
                       cv.off_y + cv.h / cv.scale};
    int mw = 0, mh = 0;
    if (sm->luminosity) {
      uint8_t bgl = (uint8_t)std::min(
          255.0f, std::max(0.0f, (0.3f * sm->backdrop[0] +
                                  0.59f * sm->backdrop[1] +
                                  0.11f * sm->backdrop[2]) *
                                     255.0f));
      std::vector<uint8_t> rgb =
          rasterize(doc, *sm->dl, cv.scale, mclip, &mw, &mh, bgl);
      if (mw == cv.w && mh == cv.h && !rgb.empty()) {
        plane.resize((size_t)cv.w * cv.h);
        for (size_t k = 0; k < plane.size(); k++)
          plane[k] = (0.3f * rgb[k * 3] + 0.59f * rgb[k * 3 + 1] +
                      0.11f * rgb[k * 3 + 2]) /
                     255.0f;
      }
    } else {
      // /S /Alpha: the engine keeps no alpha channel, so recover it the
      // tiling-pattern way — render on white and black backdrops
      int w2 = 0, h2 = 0;
      std::vector<uint8_t> on_w =
          rasterize(doc, *sm->dl, cv.scale, mclip, &mw, &mh, 255);
      std::vector<uint8_t> on_b =
          rasterize(doc, *sm->dl, cv.scale, mclip, &w2, &h2, 0);
      if (mw == cv.w && mh == cv.h && w2 == mw && h2 == mh &&
          !on_w.empty()) {
        plane.resize((size_t)cv.w * cv.h);
        for (size_t k = 0; k < plane.size(); k++) {
          int amax = 0;
          for (int c = 0; c < 3; c++) {
            int a = 255 - (on_w[k * 3 + c] - on_b[k * 3 + c]);
            amax = std::max(amax, a);
          }
          plane[k] = std::min(std::max(amax, 0), 255) / 255.0f;
        }
      }
    }
    it = mask_cache.emplace(sm.get(), std::move(plane)).first;
    return it->second.empty() ? nullptr : &it->second;
  };

  // Region-render culling: skip primitives whose page-space bounds miss
  // the canvas. The margin (2 device px in pts) covers antialiasing
  // bleed and sub-px widening; invalid bounds (never computed) always
  // render. Blend modes / soft masks only act where a primitive paints,
  // so a primitive that cannot touch the canvas cannot change it.
  const double cull_margin = 2.0 / cv.scale;
  const double can_x0 = cv.off_x - cull_margin;
  const double can_y0 = cv.off_y - cull_margin;
  const double can_x1 = cv.off_x + cv.w / cv.scale + cull_margin;
  const double can_y1 = cv.off_y + cv.h / cv.scale + cull_margin;
  auto culled = [&](const Rect& b) {
    return b.valid() && (b.x1 < can_x0 || b.x0 > can_x1 || b.y1 < can_y0 ||
                         b.y0 > can_y1);
  };

  for (size_t i = 0; i < dl.order_kind.size(); i++) {
    int kind = dl.order_kind[i], idx = dl.order_index[i];
    if (kind == 0) {
      const RenderPath& rp = dl.paths[idx];
      if (culled(rp.bounds)) continue;
      cv.bm = rp.blend_mode;
      cv.smask = mask_plane(rp.smask);
      if (rp.fill) {
        if (rp.tile_dl)
          draw_tiled_fill(&cv, doc, rp, &tile_cache);
        else
          fill_polygon(&cv, rp.subpaths, rp.rgb_fill, rp.even_odd, rp.clip,
                       rp.fill_alpha);
      }
      if (rp.stroke) {
        for (auto& sp : rp.subpaths)
          stroke_subpath(&cv, sp, rp.line_width, rp.rgb_stroke, rp.clip,
                         rp.stroke_alpha);
      }
    } else if (kind == 1) {
      const RenderGlyphRun& gr = dl.glyphs[idx];
      if (culled(gr.bounds)) continue;
      cv.bm = gr.blend_mode;
      cv.smask = mask_plane(gr.smask);
      draw_glyph_run(&cv, gr, &glyph_cache, doc ? doc->gen_id : 0);
    } else if (kind == 2) {
      const RenderImage& ri = dl.images[idx];
      if (culled(ri.bounds)) continue;
      cv.bm = ri.blend_mode;
      cv.smask = mask_plane(ri.smask);
      blit_image(&cv, doc, ri);
    } else {
      const RenderShading& sh = dl.shadings[idx];
      if (culled(sh.bounds)) continue;
      cv.bm = sh.blend_mode;
      cv.smask = mask_plane(sh.smask);
      draw_shading(&cv, sh);
    }
    cv.bm = 0;
    cv.smask = nullptr;
  }
  *out_w = cv.w;
  *out_h = cv.h;
  return std::move(cv.px);
}

}  // namespace spdf
