// Type1 font support (PDF FontFile): PFB/PFA containers, eexec decryption,
// /CharStrings + /Subrs extraction, and a Type1 charstring interpreter
// (hsbw, seac, div, flex + hint replacement via OtherSubrs emulation)
// flattening outlines to the shared spdf::Glyph polyline form.
//
// Closes the round-1 gap noted at content.cc:200 ("no outline support
// yet") — pre-2000s textbooks the reference ingested via PyMuPDF
// (pdf_image_segmentation.py:2731) embed Type1 almost exclusively.
#include "spdf.h"

#include <cmath>
#include <cstring>

namespace spdf {

// eexec / charstring decryption (Type1 spec, chapter 7).
static std::string t1_decrypt(const uint8_t* p, size_t n, uint16_t r,
                              int skip) {
  std::string out;
  out.reserve(n > (size_t)skip ? n - skip : 0);
  const uint16_t c1 = 52845, c2 = 22719;
  for (size_t i = 0; i < n; i++) {
    uint8_t c = p[i];
    uint8_t plain = c ^ (r >> 8);
    r = (uint16_t)((c + r) * c1 + c2);
    if ((int)i >= skip) out.push_back((char)plain);
  }
  return out;
}

static bool is_hex_digit(char c) {
  return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
         (c >= 'A' && c <= 'F');
}

bool Type1Font::load(std::string data) {
  std::string raw;
  // PFB segments: 0x80 0x01/0x02 + 4-byte LE length
  if (data.size() > 6 && (uint8_t)data[0] == 0x80) {
    size_t p = 0;
    while (p + 6 <= data.size() && (uint8_t)data[p] == 0x80) {
      uint8_t kind = (uint8_t)data[p + 1];
      uint32_t len = (uint8_t)data[p + 2] | ((uint8_t)data[p + 3] << 8) |
                     ((uint8_t)data[p + 4] << 16) |
                     ((uint8_t)data[p + 5] << 24);
      p += 6;
      if (kind == 3) break;
      if (p + len > data.size()) break;
      raw.append(data, p, len);
      p += len;
    }
  } else {
    raw = std::move(data);
  }

  size_t ee = raw.find("eexec");
  if (ee == std::string::npos) return false;
  size_t bin = ee + 5;
  while (bin < raw.size() &&
         (raw[bin] == '\r' || raw[bin] == '\n' || raw[bin] == ' ' ||
          raw[bin] == '\t'))
    bin++;
  if (bin >= raw.size()) return false;

  // ASCII-hex eexec section? (PFA): first 4 bytes all hex digits
  std::string enc;
  bool hex = true;
  for (int i = 0; i < 4 && bin + i < raw.size(); i++)
    if (!is_hex_digit(raw[bin + i])) hex = false;
  if (hex) {
    enc.reserve((raw.size() - bin) / 2);
    int hi = -1;
    for (size_t i = bin; i < raw.size(); i++) {
      char ch = raw[i];
      int v;
      if (ch >= '0' && ch <= '9') v = ch - '0';
      else if (ch >= 'a' && ch <= 'f') v = ch - 'a' + 10;
      else if (ch >= 'A' && ch <= 'F') v = ch - 'A' + 10;
      else continue;
      if (hi < 0) hi = v;
      else {
        enc.push_back((char)((hi << 4) | v));
        hi = -1;
      }
    }
  } else {
    enc = raw.substr(bin);
  }

  std::string priv = t1_decrypt((const uint8_t*)enc.data(), enc.size(),
                                55665, 4);

  // /lenIV
  size_t lv = priv.find("/lenIV");
  if (lv != std::string::npos) len_iv_ = atoi(priv.c_str() + lv + 6);

  // /Subrs N array-of "dup <i> <len> RD <bin> NP"
  size_t sp = priv.find("/Subrs");
  if (sp != std::string::npos) {
    int nsub = atoi(priv.c_str() + sp + 6);
    if (nsub > 0 && nsub < 65536) subrs_.resize(nsub);
    size_t p = sp;
    for (int k = 0; k < nsub; k++) {
      p = priv.find("dup ", p);
      if (p == std::string::npos) break;
      p += 4;
      int idx = atoi(priv.c_str() + p);
      while (p < priv.size() && priv[p] != ' ') p++;
      p++;
      int len = atoi(priv.c_str() + p);
      // skip to the binary: after "RD " or "-| "
      size_t rd = priv.find(' ', p);
      if (rd == std::string::npos) break;
      rd++;  // start of RD token
      size_t sp2 = priv.find(' ', rd);
      if (sp2 == std::string::npos) break;
      size_t binp = sp2 + 1;
      if (binp + len > priv.size()) break;
      if (idx >= 0 && (size_t)idx < subrs_.size() && len >= len_iv_)
        subrs_[idx] = t1_decrypt((const uint8_t*)priv.data() + binp,
                                 (size_t)len, 4330, len_iv_);
      p = binp + len;
    }
  }

  // /CharStrings N dict dup begin then "/name len RD <bin> ND"
  size_t cs = priv.find("/CharStrings");
  if (cs == std::string::npos) return false;
  size_t p = cs;
  while (true) {
    p = priv.find('/', p + 1);
    if (p == std::string::npos) break;
    size_t ne = p + 1;
    while (ne < priv.size() && priv[ne] != ' ' && priv[ne] != '\t' &&
           priv[ne] != '\r' && priv[ne] != '\n')
      ne++;
    std::string name = priv.substr(p + 1, ne - p - 1);
    if (name == "CharStrings") { p = ne; continue; }
    if (name.empty() || ne >= priv.size()) break;
    size_t lp = ne;
    while (lp < priv.size() && priv[lp] == ' ') lp++;
    if (lp >= priv.size() || priv[lp] < '0' || priv[lp] > '9') continue;
    int len = atoi(priv.c_str() + lp);
    size_t rd = priv.find(' ', lp);
    if (rd == std::string::npos) break;
    rd++;
    size_t sp2 = priv.find(' ', rd);
    if (sp2 == std::string::npos) break;
    size_t binp = sp2 + 1;
    if (binp + len > priv.size()) break;
    if (len >= len_iv_) {
      uint16_t gid = (uint16_t)names_.size();
      names_.push_back(name);
      charstrings_.push_back(t1_decrypt(
          (const uint8_t*)priv.data() + binp, (size_t)len, 4330, len_iv_));
      name_to_gid_.emplace(name, gid);
      uint32_t u = glyph_name_to_unicode(name);
      if (u && !unicode_to_gid_.count(u)) unicode_to_gid_.emplace(u, gid);
    }
    p = binp + len;
    if (priv.compare(p, 4, " end") == 0 ||
        priv.find("end", p) == p + 1)
      ;  // loop termination handled by find('/') failing past the dict
  }
  return !charstrings_.empty();
}

// ---------------------------------------------------------------------------
// Type1 charstring interpreter
// ---------------------------------------------------------------------------

namespace {

struct T1Ctx {
  std::vector<double> st;
  std::vector<double> ps;  // PostScript stack for othersubr results
  double x = 0, y = 0;
  double sbx = 0;
  double adv = 0;
  std::vector<std::pair<float, float>>* contour = nullptr;
  Glyph* g = nullptr;
  bool ended = false;
  // flex accumulation
  bool in_flex = false;
  double flex_sx = 0, flex_sy = 0;  // position when flex began
  std::vector<double> flex_pts;
  // seac
  bool has_seac = false;
  double seac[5];
};

void t1_flatten_cubic(std::vector<std::pair<float, float>>* c, double x0,
                      double y0, double x1, double y1, double x2, double y2,
                      double x3, double y3, int depth = 0) {
  double dx = x3 - x0, dy = y3 - y0;
  double d1 = fabs((x1 - x0) * dy - (y1 - y0) * dx);
  double d2 = fabs((x2 - x0) * dy - (y2 - y0) * dx);
  double dd = d1 + d2;
  if (depth > 8 || dd * dd < 0.25 * (dx * dx + dy * dy) ||
      (dx == 0 && dy == 0)) {
    c->push_back({(float)x3, (float)y3});
    return;
  }
  double x01 = (x0 + x1) / 2, y01 = (y0 + y1) / 2;
  double x12 = (x1 + x2) / 2, y12 = (y1 + y2) / 2;
  double x23 = (x2 + x3) / 2, y23 = (y2 + y3) / 2;
  double xa = (x01 + x12) / 2, ya = (y01 + y12) / 2;
  double xb = (x12 + x23) / 2, yb = (y12 + y23) / 2;
  double xm = (xa + xb) / 2, ym = (ya + yb) / 2;
  t1_flatten_cubic(c, x0, y0, x01, y01, xa, ya, xm, ym, depth + 1);
  t1_flatten_cubic(c, xm, ym, xb, yb, x23, y23, x3, y3, depth + 1);
}

// Standard Encoding code -> glyph name (for seac); AGL via the CFF table
// would duplicate — keep the simple ASCII block + common accents.
const char* t1_std_name(uint8_t code) {
  static const char* low[] = {
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quoteright", "parenleft", "parenright", "asterisk",
      "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
      "three", "four", "five", "six", "seven", "eight", "nine", "colon",
      "semicolon", "less", "equal", "greater", "question", "at", "A", "B",
      "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M", "N", "O", "P",
      "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z", "bracketleft",
      "backslash", "bracketright", "asciicircum", "underscore",
      "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k",
      "l", "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y",
      "z", "braceleft", "bar", "braceright", "asciitilde"};
  if (code >= 32 && code <= 126) return low[code - 32];
  switch (code) {
    case 193: return "grave";
    case 194: return "acute";
    case 195: return "circumflex";
    case 196: return "tilde";
    case 197: return "macron";
    case 199: return "dotaccent";
    case 200: return "dieresis";
    case 202: return "ring";
    case 203: return "cedilla";
    case 207: return "caron";
    default: return nullptr;
  }
}

}  // namespace

void Type1Font::run_charstring(const std::string& cs, Glyph* g, int depth,
                               double x0, double y0, bool in_seac) {
  if (depth > 10) return;
  static thread_local T1Ctx* ctx = nullptr;
  bool top_level = depth == 0;
  T1Ctx local;
  if (top_level) {
    ctx = &local;
    ctx->g = g;
    ctx->x = x0;
    ctx->y = y0;
  }
  T1Ctx& c = *ctx;

  auto new_contour = [&]() {
    if (c.contour && c.contour->size() < 2 && !c.g->contours.empty())
      c.g->contours.pop_back();
    c.g->contours.emplace_back();
    c.contour = &c.g->contours.back();
    c.contour->push_back({(float)c.x, (float)c.y});
  };
  auto line_to = [&](double nx, double ny) {
    if (!c.contour) new_contour();
    c.contour->push_back({(float)nx, (float)ny});
    c.x = nx;
    c.y = ny;
  };
  auto curve_to = [&](double x1, double y1, double x2, double y2, double x3,
                      double y3) {
    if (!c.contour) new_contour();
    t1_flatten_cubic(c.contour, c.x, c.y, x1, y1, x2, y2, x3, y3);
    c.x = x3;
    c.y = y3;
  };

  const uint8_t* p = (const uint8_t*)cs.data();
  const uint8_t* e = p + cs.size();
  while (p < e && !c.ended) {
    uint8_t b = *p;
    if (b >= 32) {
      double v;
      if (b <= 246) {
        v = (double)b - 139;
        p += 1;
      } else if (b <= 250) {
        if (p + 2 > e) return;
        v = (b - 247) * 256.0 + p[1] + 108.0;
        p += 2;
      } else if (b <= 254) {
        if (p + 2 > e) return;
        v = -((b - 251) * 256.0) - p[1] - 108.0;
        p += 2;
      } else {  // 255: 32-bit int
        if (p + 5 > e) return;
        v = (double)(int32_t)(((uint32_t)p[1] << 24) | (p[2] << 16) |
                              (p[3] << 8) | p[4]);
        p += 5;
      }
      c.st.push_back(v);
      continue;
    }
    p++;
    switch (b) {
      case 13:  // hsbw: sbx wx
        if (c.st.size() >= 2) {
          c.sbx = c.st[0];
          c.adv = c.st[1];
          if (!in_seac) c.x = c.st[0];
        }
        c.st.clear();
        break;
      case 9:  // closepath
        c.st.clear();
        break;
      case 1: case 3:  // hstem/vstem
        c.st.clear();
        break;
      case 21:  // rmoveto
        if (c.in_flex) {
          if (c.st.size() >= 2) {
            c.flex_pts.push_back(c.x + c.st[c.st.size() - 2]);
            c.flex_pts.push_back(c.y + c.st[c.st.size() - 1]);
            c.x = c.flex_pts[c.flex_pts.size() - 2];
            c.y = c.flex_pts[c.flex_pts.size() - 1];
          }
        } else if (c.st.size() >= 2) {
          c.x += c.st[c.st.size() - 2];
          c.y += c.st[c.st.size() - 1];
          new_contour();
        }
        c.st.clear();
        break;
      case 22:  // hmoveto
        if (c.in_flex) {
          if (!c.st.empty()) {
            c.flex_pts.push_back(c.x + c.st.back());
            c.flex_pts.push_back(c.y);
            c.x += c.st.back();
          }
        } else if (!c.st.empty()) {
          c.x += c.st.back();
          new_contour();
        }
        c.st.clear();
        break;
      case 4:  // vmoveto
        if (c.in_flex) {
          if (!c.st.empty()) {
            c.flex_pts.push_back(c.x);
            c.flex_pts.push_back(c.y + c.st.back());
            c.y += c.st.back();
          }
        } else if (!c.st.empty()) {
          c.y += c.st.back();
          new_contour();
        }
        c.st.clear();
        break;
      case 5:  // rlineto
        if (c.st.size() >= 2) line_to(c.x + c.st[0], c.y + c.st[1]);
        c.st.clear();
        break;
      case 6:  // hlineto
        if (!c.st.empty()) line_to(c.x + c.st[0], c.y);
        c.st.clear();
        break;
      case 7:  // vlineto
        if (!c.st.empty()) line_to(c.x, c.y + c.st[0]);
        c.st.clear();
        break;
      case 8:  // rrcurveto
        if (c.st.size() >= 6) {
          double x1 = c.x + c.st[0], y1 = c.y + c.st[1];
          double x2 = x1 + c.st[2], y2 = y1 + c.st[3];
          curve_to(x1, y1, x2, y2, x2 + c.st[4], y2 + c.st[5]);
        }
        c.st.clear();
        break;
      case 30:  // vhcurveto
        if (c.st.size() >= 4) {
          double x1 = c.x, y1 = c.y + c.st[0];
          double x2 = x1 + c.st[1], y2 = y1 + c.st[2];
          curve_to(x1, y1, x2, y2, x2 + c.st[3], y2);
        }
        c.st.clear();
        break;
      case 31:  // hvcurveto
        if (c.st.size() >= 4) {
          double x1 = c.x + c.st[0], y1 = c.y;
          double x2 = x1 + c.st[1], y2 = y1 + c.st[2];
          curve_to(x1, y1, x2, y2, x2, y2 + c.st[3]);
        }
        c.st.clear();
        break;
      case 10: {  // callsubr
        if (c.st.empty()) break;
        int idx = (int)c.st.back();
        c.st.pop_back();
        if (idx >= 0 && (size_t)idx < subrs_.size())
          run_charstring(subrs_[idx], g, depth + 1, 0, 0, in_seac);
        break;
      }
      case 11:  // return
        return;
      case 14:  // endchar
        c.ended = true;
        break;
      case 12: {  // escape
        if (p >= e) return;
        uint8_t b2 = *p++;
        switch (b2) {
          case 0:  // dotsection
          case 1:  // vstem3
          case 2:  // hstem3
            c.st.clear();
            break;
          case 6:  // seac: asb adx ady bchar achar
            if (c.st.size() >= 5) {
              c.has_seac = true;
              for (int k = 0; k < 5; k++) c.seac[k] = c.st[k];
            }
            c.st.clear();
            c.ended = true;
            break;
          case 7:  // sbw: sbx sby wx wy
            if (c.st.size() >= 4) {
              c.sbx = c.st[0];
              c.adv = c.st[2];
              if (!in_seac) { c.x = c.st[0]; c.y = c.st[1]; }
            }
            c.st.clear();
            break;
          case 12:  // div
            if (c.st.size() >= 2) {
              double bv = c.st.back(); c.st.pop_back();
              double av = c.st.back(); c.st.pop_back();
              c.st.push_back(bv != 0 ? av / bv : 0);
            }
            break;
          case 16: {  // callothersubr: args... n othersubr#
            if (c.st.size() < 2) { c.st.clear(); break; }
            int subno = (int)c.st.back(); c.st.pop_back();
            int nargs = (int)c.st.back(); c.st.pop_back();
            std::vector<double> args;
            for (int k = 0; k < nargs && !c.st.empty(); k++) {
              args.insert(args.begin(), c.st.back());
              c.st.pop_back();
            }
            if (subno == 1) {        // start flex
              c.in_flex = true;
              c.flex_sx = c.x;
              c.flex_sy = c.y;
              c.flex_pts.clear();
            } else if (subno == 2) { // flex point collected (via rmoveto)
            } else if (subno == 0) { // end flex: emit two cubics
              c.in_flex = false;
              if (c.flex_pts.size() >= 14) {
                // flex_pts holds 7 (x,y) pairs: [0] is the reference
                // midpoint, [1..3] the first curve's controls + endpoint,
                // [4..6] the second's. Rewind to the flex start and emit.
                const double* f = c.flex_pts.data();
                c.x = c.flex_sx;
                c.y = c.flex_sy;
                curve_to(f[2], f[3], f[4], f[5], f[6], f[7]);
                curve_to(f[8], f[9], f[10], f[11], f[12], f[13]);
              }
              // endpoint coords for the trailing "pop pop setcurrentpoint"
              c.ps.push_back(c.y);
              c.ps.push_back(c.x);
            } else if (subno == 3) { // hint replacement
              c.ps.push_back(3);
            } else {
              for (double a : args) c.ps.push_back(a);
            }
            break;
          }
          case 17:  // pop
            c.st.push_back(c.ps.empty() ? 0 : c.ps.back());
            if (!c.ps.empty()) c.ps.pop_back();
            break;
          case 33:  // setcurrentpoint
            if (c.st.size() >= 2) { c.x = c.st[0]; c.y = c.st[1]; }
            c.st.clear();
            break;
          default:
            c.st.clear();
            break;
        }
        break;
      }
      default:
        c.st.clear();
        break;
    }
  }
  if (top_level) {
    g->advance = (float)c.adv;
    if (!g->contours.empty() && g->contours.back().size() < 3)
      g->contours.pop_back();
    if (c.has_seac) {
      // seac: asb adx ady bchar achar — compose from StandardEncoding
      const char* bn = t1_std_name((uint8_t)c.seac[3]);
      const char* an = t1_std_name((uint8_t)c.seac[4]);
      double adx = c.seac[1], ady = c.seac[2], asb = c.seac[0];
      ctx = nullptr;  // recursive glyph() below re-enters run_charstring
      if (bn) {
        uint16_t bgid = gid_for_name(bn);
        if (bgid || name_to_gid_.count(bn)) {
          const Glyph* bg = glyph(gid_for_name(bn));
          for (auto& cont : bg->contours) g->contours.push_back(cont);
        }
      }
      if (an) {
        uint16_t agid = gid_for_name(an);
        if (agid || name_to_gid_.count(an)) {
          const Glyph* ag = glyph(gid_for_name(an));
          double dx = c.sbx - asb + adx;
          for (auto& cont : ag->contours) {
            std::vector<std::pair<float, float>> tc;
            tc.reserve(cont.size());
            for (auto& pt : cont)
              tc.push_back({pt.first + (float)dx, pt.second + (float)ady});
            g->contours.push_back(std::move(tc));
          }
        }
      }
    }
    ctx = nullptr;
  }
}

const Glyph* Type1Font::glyph(uint16_t gid) {
  auto it = glyph_cache_.find(gid);
  if (it != glyph_cache_.end()) return &it->second;
  // Guard against seac re-entry: a corrupt font whose seac base/accent name
  // resolves back to the glyph being built would recurse unboundedly (the
  // cache is populated only after run_charstring returns). Return empty.
  static const Glyph kEmpty;
  if (!building_.insert(gid).second) return &kEmpty;
  Glyph g;
  if (gid < charstrings_.size())
    run_charstring(charstrings_[gid], &g, 0, 0, 0, false);
  g.loaded = true;
  building_.erase(gid);
  auto res = glyph_cache_.emplace(gid, std::move(g));
  return &res.first->second;
}

uint16_t Type1Font::glyph_for_unicode(uint32_t cp) const {
  auto it = unicode_to_gid_.find(cp);
  return it != unicode_to_gid_.end() ? it->second : 0;
}

uint16_t Type1Font::gid_for_name(const std::string& n) const {
  auto it = name_to_gid_.find(n);
  return it != name_to_gid_.end() ? it->second : 0;
}

float Type1Font::advance_for_gid(uint16_t gid) const {
  auto it = glyph_cache_.find(gid);
  if (it != glyph_cache_.end()) return it->second.advance;
  return const_cast<Type1Font*>(this)->glyph(gid)->advance;
}

}  // namespace spdf
