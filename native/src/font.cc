// TrueType parsing (cmap/loca/glyf/hmtx, composite glyphs, quadratic
// flattening) and PDF font dictionaries (encodings, /Widths, ToUnicode).
#include "spdf.h"

#include <cmath>
#include <cstring>

namespace spdf {

// ---------------------------------------------------------------------------
// big-endian readers
// ---------------------------------------------------------------------------

static inline uint16_t rd16(const uint8_t* p) { return (p[0] << 8) | p[1]; }
static inline int16_t rds16(const uint8_t* p) { return (int16_t)rd16(p); }
static inline uint32_t rd32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

bool TrueTypeFont::load(std::string data) {
  data_ = std::move(data);
  return parse_tables();
}

bool TrueTypeFont::parse_tables() {
  const uint8_t* d = (const uint8_t*)data_.data();
  size_t n = data_.size();
  if (n < 12) return false;
  uint32_t tag = rd32(d);
  size_t off = 0;
  if (tag == 0x74746366) {  // 'ttcf' collection: use first font
    if (n < 16) return false;
    off = rd32(d + 12);
    if (off + 12 > n) return false;
  }
  uint16_t num_tables = rd16(d + off + 4);
  size_t p = off + 12;
  for (uint16_t i = 0; i < num_tables && p + 16 <= n; i++, p += 16) {
    std::string tg((const char*)d + p, 4);
    uint32_t toff = rd32(d + p + 8), tlen = rd32(d + p + 12);
    if ((size_t)toff + tlen <= n) tables_[tg] = {toff, tlen};
  }
  auto head = tables_.find("head");
  if (head != tables_.end() && head->second.second >= 54) {
    const uint8_t* hp = d + head->second.first;
    upem_ = rd16(hp + 18);
    long_loca_ = rd16(hp + 50) != 0;
  }
  auto maxp = tables_.find("maxp");
  if (maxp != tables_.end() && maxp->second.second >= 6)
    num_glyphs_ = rd16(d + maxp->second.first + 4);
  // hmtx
  auto hhea = tables_.find("hhea");
  auto hmtx = tables_.find("hmtx");
  if (hhea != tables_.end() && hmtx != tables_.end() &&
      hhea->second.second >= 36) {
    uint16_t num_hm = rd16(d + hhea->second.first + 34);
    const uint8_t* mp = d + hmtx->second.first;
    size_t mlen = hmtx->second.second;
    hmtx_advances_.resize(num_glyphs_, 0);
    uint16_t last = 0;
    for (uint16_t g = 0; g < num_glyphs_; g++) {
      if (g < num_hm && (size_t)g * 4 + 2 <= mlen) {
        last = rd16(mp + (size_t)g * 4);
      }
      hmtx_advances_[g] = last;
    }
  }
  // loca
  auto loca = tables_.find("loca");
  if (loca != tables_.end()) {
    const uint8_t* lp = d + loca->second.first;
    size_t llen = loca->second.second;
    size_t cnt = long_loca_ ? llen / 4 : llen / 2;
    loca_.resize(cnt);
    for (size_t i = 0; i < cnt; i++)
      loca_[i] = long_loca_ ? rd32(lp + i * 4) : 2u * rd16(lp + i * 2);
  }
  parse_cmap();
  return tables_.count("glyf") > 0 || !cmap_.empty();
}

bool TrueTypeFont::parse_cmap() {
  auto it = tables_.find("cmap");
  if (it == tables_.end()) return false;
  const uint8_t* d = (const uint8_t*)data_.data() + it->second.first;
  size_t len = it->second.second;
  if (len < 4) return false;
  uint16_t ntab = rd16(d + 2);
  uint32_t best = 0;
  int best_score = -1;
  for (uint16_t i = 0; i < ntab && 4 + (size_t)i * 8 + 8 <= len; i++) {
    uint16_t plat = rd16(d + 4 + i * 8), enc = rd16(d + 6 + i * 8);
    uint32_t off = rd32(d + 8 + i * 8);
    int score = -1;
    if (plat == 3 && enc == 10) score = 5;       // UCS-4
    else if (plat == 3 && enc == 1) score = 4;   // BMP
    else if (plat == 0) score = 3;               // unicode
    else if (plat == 3 && enc == 0) score = 2;   // symbol
    else if (plat == 1 && enc == 0) score = 1;   // mac roman
    if (score > best_score && off < len) {
      best_score = score;
      best = off;
    }
  }
  if (best_score < 0) return false;
  const uint8_t* s = d + best;
  uint16_t fmt = rd16(s);
  if (fmt == 4) {
    uint16_t segx2 = rd16(s + 6);
    const uint8_t* endp = s + 14;
    const uint8_t* startp = endp + segx2 + 2;
    const uint8_t* deltap = startp + segx2;
    const uint8_t* rangep = deltap + segx2;
    for (int seg = 0; seg < segx2 / 2; seg++) {
      uint16_t end = rd16(endp + seg * 2), start = rd16(startp + seg * 2);
      int16_t delta = rds16(deltap + seg * 2);
      uint16_t ro = rd16(rangep + seg * 2);
      if (start == 0xFFFF) continue;
      for (uint32_t c = start; c <= end && c <= 0xFFFF; c++) {
        uint16_t gid;
        if (ro == 0) {
          gid = (uint16_t)(c + delta);
        } else {
          const uint8_t* gp = rangep + seg * 2 + ro + (c - start) * 2;
          if (gp + 2 > d + len) continue;
          gid = rd16(gp);
          if (gid) gid = (uint16_t)(gid + delta);
        }
        if (gid) cmap_[c] = gid;
        if (c == 0xFFFF) break;
      }
    }
  } else if (fmt == 12) {
    uint32_t ngroups = rd32(s + 12);
    for (uint32_t g = 0; g < ngroups; g++) {
      const uint8_t* gp = s + 16 + g * 12;
      if (gp + 12 > d + len) break;
      uint32_t sc = rd32(gp), ec = rd32(gp + 4), sg = rd32(gp + 8);
      for (uint32_t c = sc; c <= ec && c - sc < 65536; c++)
        cmap_[c] = (uint16_t)(sg + (c - sc));
    }
  } else if (fmt == 6) {
    uint16_t first = rd16(s + 6), cnt = rd16(s + 8);
    for (uint16_t k = 0; k < cnt; k++) cmap_[first + k] = rd16(s + 10 + k * 2);
  } else if (fmt == 0) {
    for (int c = 0; c < 256; c++) cmap_[c] = s[6 + c];
  }
  return true;
}

uint16_t TrueTypeFont::glyph_for_unicode(uint32_t cp) const {
  auto it = cmap_.find(cp);
  if (it != cmap_.end()) return it->second;
  // symbol fonts map 0xF000+code
  it = cmap_.find(0xF000 + cp);
  return it != cmap_.end() ? it->second : 0;
}

float TrueTypeFont::advance_for_gid(uint16_t gid) const {
  if (gid < hmtx_advances_.size()) return hmtx_advances_[gid];
  return upem_ * 0.5f;
}

// flatten one quadratic bezier into `out`
static void flatten_quad(std::vector<std::pair<float, float>>* out, float x0,
                         float y0, float cx, float cy, float x1, float y1) {
  const int STEPS = 8;
  for (int i = 1; i <= STEPS; i++) {
    float t = (float)i / STEPS, u = 1 - t;
    out->push_back({u * u * x0 + 2 * u * t * cx + t * t * x1,
                    u * u * y0 + 2 * u * t * cy + t * t * y1});
  }
}

void TrueTypeFont::parse_glyph_outline(uint16_t gid, Glyph* g, int depth) {
  if (depth > 5) return;
  auto glyf = tables_.find("glyf");
  if (glyf == tables_.end() || gid + 1 >= loca_.size()) return;
  uint32_t off = loca_[gid], end = loca_[gid + 1];
  if (end <= off) return;  // empty glyph (space)
  // loca VALUES come from the file and may point anywhere; clamp to the
  // glyf table or a corrupt font reads far out of bounds (fuzz finding)
  if (end > glyf->second.second) return;
  const uint8_t* d = (const uint8_t*)data_.data() + glyf->second.first + off;
  const uint8_t* dend =
      (const uint8_t*)data_.data() + glyf->second.first + end;
  if (d + 10 > dend) return;
  int16_t ncont = rds16(d);
  if (ncont >= 0) {
    // simple glyph
    const uint8_t* p = d + 10;
    std::vector<uint16_t> cont_ends(ncont);
    int prev_end = -1;
    for (int i = 0; i < ncont; i++, p += 2) {
      if (p + 2 > dend) return;
      cont_ends[i] = rd16(p);
      // ends must be nondecreasing or the contour loop below indexes
      // xs/ys/flags past npts (fuzz finding: heap overflow)
      if ((int)cont_ends[i] < prev_end) return;
      prev_end = cont_ends[i];
    }
    if (p + 2 > dend) return;
    uint16_t ninstr = rd16(p);
    p += 2;
    if ((size_t)ninstr > (size_t)(dend - p)) return;  // instr skip in-bounds
    p += ninstr;
    int npts = ncont ? cont_ends[ncont - 1] + 1 : 0;
    std::vector<uint8_t> flags;
    flags.reserve(npts);
    while ((int)flags.size() < npts && p < dend) {
      uint8_t f = *p++;
      flags.push_back(f);
      if (f & 8) {  // repeat
        if (p >= dend) break;
        uint8_t r = *p++;
        for (int k = 0; k < r && (int)flags.size() < npts; k++)
          flags.push_back(f);
      }
    }
    if ((int)flags.size() < npts) return;
    std::vector<float> xs(npts), ys(npts);
    float v = 0;
    for (int i = 0; i < npts; i++) {
      uint8_t f = flags[i];
      if (f & 2) {
        if (p >= dend) return;
        uint8_t dx = *p++;
        v += (f & 16) ? dx : -(float)dx;
      } else if (!(f & 16)) {
        if (p + 2 > dend) return;
        v += rds16(p);
        p += 2;
      }
      xs[i] = v;
    }
    v = 0;
    for (int i = 0; i < npts; i++) {
      uint8_t f = flags[i];
      if (f & 4) {
        if (p >= dend) return;
        uint8_t dy = *p++;
        v += (f & 32) ? dy : -(float)dy;
      } else if (!(f & 32)) {
        if (p + 2 > dend) return;
        v += rds16(p);
        p += 2;
      }
      ys[i] = v;
    }
    int start = 0;
    for (int ci = 0; ci < ncont; ci++) {
      int cend = cont_ends[ci];
      int count = cend - start + 1;
      if (count <= 0) {
        start = cend + 1;
        continue;
      }
      std::vector<std::pair<float, float>> contour;
      // find first on-curve point
      int first_on = -1;
      for (int k = 0; k < count; k++)
        if (flags[start + k] & 1) {
          first_on = k;
          break;
        }
      float sx, sy;
      if (first_on < 0) {
        // all off-curve: start at midpoint of first two
        sx = (xs[start] + xs[start + 1 % count]) / 2;
        sy = (ys[start] + ys[start + 1 % count]) / 2;
        first_on = 0;  // treat synthetic start
      } else {
        sx = xs[start + first_on];
        sy = ys[start + first_on];
      }
      contour.push_back({sx, sy});
      float px = sx, py = sy;
      float cx = 0, cy = 0;
      bool have_ctrl = false;
      for (int k = 1; k <= count; k++) {
        int idx = start + (first_on + k) % count;
        bool on = flags[idx] & 1;
        float x = xs[idx], y = ys[idx];
        if (on) {
          if (have_ctrl) {
            flatten_quad(&contour, px, py, cx, cy, x, y);
            have_ctrl = false;
          } else {
            contour.push_back({x, y});
          }
          px = x;
          py = y;
        } else {
          if (have_ctrl) {
            float mx = (cx + x) / 2, my = (cy + y) / 2;
            flatten_quad(&contour, px, py, cx, cy, mx, my);
            px = mx;
            py = my;
          }
          cx = x;
          cy = y;
          have_ctrl = true;
        }
      }
      if (have_ctrl) flatten_quad(&contour, px, py, cx, cy, sx, sy);
      g->contours.push_back(std::move(contour));
      start = cend + 1;
    }
  } else {
    // composite glyph
    const uint8_t* p = d + 10;
    while (p + 4 <= dend) {
      uint16_t flags = rd16(p), cgid = rd16(p + 2);
      p += 4;
      float dx = 0, dy = 0;
      if (flags & 1) {  // words
        if (p + 4 > dend) break;
        dx = rds16(p);
        dy = rds16(p + 2);
        p += 4;
      } else {
        if (p + 2 > dend) break;
        dx = (int8_t)p[0];
        dy = (int8_t)p[1];
        p += 2;
      }
      float a = 1, b = 0, c = 0, dd = 1;
      if (flags & 8) {
        if (p + 2 > dend) break;
        a = dd = rds16(p) / 16384.0f;
        p += 2;
      } else if (flags & 0x40) {
        if (p + 4 > dend) break;
        a = rds16(p) / 16384.0f;
        dd = rds16(p + 2) / 16384.0f;
        p += 4;
      } else if (flags & 0x80) {
        if (p + 8 > dend) break;
        a = rds16(p) / 16384.0f;
        b = rds16(p + 2) / 16384.0f;
        c = rds16(p + 4) / 16384.0f;
        dd = rds16(p + 6) / 16384.0f;
        p += 8;
      }
      Glyph sub;
      parse_glyph_outline(cgid, &sub, depth + 1);
      for (auto& cont : sub.contours) {
        std::vector<std::pair<float, float>> tc;
        tc.reserve(cont.size());
        for (auto& pt : cont)
          tc.push_back({a * pt.first + c * pt.second + dx,
                        b * pt.first + dd * pt.second + dy});
        g->contours.push_back(std::move(tc));
      }
      if (!(flags & 0x20)) break;  // no MORE_COMPONENTS
    }
  }
}

const Glyph* TrueTypeFont::glyph(uint16_t gid) {
  auto it = glyph_cache_.find(gid);
  if (it != glyph_cache_.end()) return &it->second;
  Glyph g;
  parse_glyph_outline(gid, &g, 0);
  g.advance = advance_for_gid(gid);
  g.loaded = true;
  auto res = glyph_cache_.emplace(gid, std::move(g));
  return &res.first->second;
}

// ---------------------------------------------------------------------------
// encodings
// ---------------------------------------------------------------------------

// WinAnsiEncoding codes 128..159 that differ from latin-1.
static const uint16_t kWinAnsiHigh[32] = {
    0x20AC, 0x0000, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x0000, 0x017D, 0x0000,
    0x0000, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x0000, 0x017E, 0x0178};

static uint32_t winansi_to_unicode(uint32_t code) {
  if (code >= 128 && code < 160) {
    uint16_t u = kWinAnsiHigh[code - 128];
    return u ? u : code;
  }
  return code;  // latin-1 compatible elsewhere
}

// Minimal glyph-name -> unicode (AGL subset for common names).
uint32_t glyph_name_to_unicode(const std::string& n) {
  static const std::unordered_map<std::string, uint32_t> m = {
      {"space", 32},     {"exclam", 33},    {"quotedbl", 34},
      {"numbersign", 35},{"dollar", 36},    {"percent", 37},
      {"ampersand", 38}, {"quotesingle", 39},{"parenleft", 40},
      {"parenright", 41},{"asterisk", 42},  {"plus", 43},
      {"comma", 44},     {"hyphen", 45},    {"period", 46},
      {"slash", 47},     {"colon", 58},     {"semicolon", 59},
      {"less", 60},      {"equal", 61},     {"greater", 62},
      {"question", 63},  {"at", 64},        {"bracketleft", 91},
      {"backslash", 92}, {"bracketright", 93},{"asciicircum", 94},
      {"underscore", 95},{"grave", 96},     {"braceleft", 123},
      {"bar", 124},      {"braceright", 125},{"asciitilde", 126},
      {"quoteleft", 0x2018}, {"quoteright", 0x2019},
      {"quotedblleft", 0x201C}, {"quotedblright", 0x201D},
      {"endash", 0x2013},{"emdash", 0x2014},{"bullet", 0x2022},
      {"fi", 0xFB01},    {"fl", 0xFB02},    {"degree", 0x00B0},
      {"minus", 0x2212}, {"multiply", 0x00D7}, {"divide", 0x00F7},
  };
  auto it = m.find(n);
  if (it != m.end()) return it->second;
  if (n.size() == 1) return (uint8_t)n[0];
  if (n.size() >= 2 && n[0] >= 'A' && n[0] <= 'Z' && n.size() == 1) return n[0];
  if (n.size() >= 4 && n.compare(0, 3, "uni") == 0)
    return (uint32_t)strtoul(n.c_str() + 3, nullptr, 16);
  if (n.size() >= 2 && n[0] == 'u')
    return (uint32_t)strtoul(n.c_str() + 1, nullptr, 16);
  // digit names
  static const char* digits[] = {"zero", "one", "two",   "three", "four",
                                 "five", "six", "seven", "eight", "nine"};
  for (int i = 0; i < 10; i++)
    if (n == digits[i]) return '0' + i;
  if (n.size() == 1) return n[0];
  return 0;
}

double PdfFont::width_for_code(uint32_t code) const {
  auto it = widths.find(code);
  if (it != widths.end()) return it->second;
  if (ttf) {
    uint16_t gid = gid_for_code(code);
    if (gid) return ttf->glyph(gid)->advance * 1000.0 / ttf->units_per_em();
  }
  return default_width;
}

uint32_t PdfFont::unicode_for_code(uint32_t code) const {
  auto it = to_unicode.find(code);
  if (it != to_unicode.end()) return it->second;
  if (!differences.empty()) {
    auto dit = differences.find(code);
    if (dit != differences.end()) {
      uint32_t u = glyph_name_to_unicode(dit->second);
      if (u) return u;
    }
  }
  if (is_cid) return 0;  // no mapping known
  if (encoding == "WinAnsiEncoding" || encoding.empty())
    return winansi_to_unicode(code);
  return code;
}

uint16_t PdfFont::gid_for_code(uint32_t code) const {
  auto it = code_to_gid.find(code);
  if (it != code_to_gid.end()) return it->second;
  if (!ttf) return 0;
  if (is_cid) return ttf->gid_for_cid(code);  // identity unless CID-keyed CFF
  // name-keyed fonts (CFF charset / Type1 CharStrings): an exact
  // /Differences glyph name beats any unicode round trip
  if (!differences.empty()) {
    auto dit = differences.find(code);
    if (dit != differences.end()) {
      uint16_t gid = ttf->gid_for_name(dit->second);
      if (gid) return gid;
    }
  }
  uint32_t u = unicode_for_code(code);
  uint16_t gid = u ? ttf->glyph_for_unicode(u) : 0;
  if (!gid && symbolic_cmap) gid = ttf->glyph_for_unicode(0xF000 + code);
  if (!gid) gid = ttf->glyph_for_unicode(code);
  return gid;
}

}  // namespace spdf
