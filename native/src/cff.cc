// CFF / Type1C font support: INDEX/DICT parsing, charsets, FDArray/FDSelect
// (CID-keyed fonts), and a Type2 charstring interpreter flattening glyph
// outlines to the shared spdf::Glyph polyline form.
//
// Covers the PDF FontFile3 subtypes (/Type1C, /CIDFontType0C) and the
// 'CFF ' table of OTTO-flavoured OpenType (FontFile3 /OpenType), i.e. the
// embedded-font classes the reference ingested through PyMuPDF
// (pdf_image_segmentation.py:2731) that the round-1 engine declined.
#include "spdf.h"

#include <cmath>
#include <cstdlib>
#include <cstring>

namespace spdf {

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

static inline uint16_t rd16(const uint8_t* p) { return (p[0] << 8) | p[1]; }
static inline uint32_t rd32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

static uint32_t rd_off(const uint8_t* p, int sz) {
  uint32_t v = 0;
  for (int i = 0; i < sz; i++) v = (v << 8) | p[i];
  return v;
}

// The 391 CFF standard strings (SIDs 0..390), per the CFF spec appendix A.
static const char* kStdStrings[] = {
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero", "one",
    "two", "three", "four", "five", "six", "seven", "eight", "nine", "colon",
    "semicolon", "less", "equal", "greater", "question", "at", "A", "B", "C",
    "D", "E", "F", "G", "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q",
    "R", "S", "T", "U", "V", "W", "X", "Y", "Z", "bracketleft", "backslash",
    "bracketright", "asciicircum", "underscore", "quoteleft", "a", "b", "c",
    "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q",
    "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
    "braceright", "asciitilde", "exclamdown", "cent", "sterling", "fraction",
    "yen", "florin", "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl", "endash",
    "dagger", "daggerdbl", "periodcentered", "paragraph", "bullet",
    "quotesinglbase", "quotedblbase", "quotedblright", "guillemotright",
    "ellipsis", "perthousand", "questiondown", "grave", "acute",
    "circumflex", "tilde", "macron", "breve", "dotaccent", "dieresis",
    "ring", "cedilla", "hungarumlaut", "ogonek", "caron", "emdash", "AE",
    "ordfeminine", "Lslash", "Oslash", "OE", "ordmasculine", "ae",
    "dotlessi", "lslash", "oslash", "oe", "germandbls", "onesuperior",
    "logicalnot", "mu", "trademark", "Eth", "onehalf", "plusminus", "Thorn",
    "onequarter", "divide", "brokenbar", "degree", "thorn",
    "threequarters", "twosuperior", "registered", "minus", "eth",
    "multiply", "threesuperior", "copyright", "Aacute", "Acircumflex",
    "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute",
    "Ecircumflex", "Edieresis", "Egrave", "Iacute", "Icircumflex",
    "Idieresis", "Igrave", "Ntilde", "Oacute", "Ocircumflex", "Odieresis",
    "Ograve", "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis",
    "Ugrave", "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex", "odieresis",
    "ograve", "otilde", "scaron", "uacute", "ucircumflex", "udieresis",
    "ugrave", "yacute", "ydieresis", "zcaron", "exclamsmall",
    "Hungarumlautsmall", "dollaroldstyle", "dollarsuperior",
    "ampersandsmall", "Acutesmall", "parenleftsuperior",
    "parenrightsuperior", "twodotenleader", "onedotenleader",
    "zerooldstyle", "oneoldstyle", "twooldstyle", "threeoldstyle",
    "fouroldstyle", "fiveoldstyle", "sixoldstyle", "sevenoldstyle",
    "eightoldstyle", "nineoldstyle", "commasuperior",
    "threequartersemdash", "periodsuperior", "questionsmall", "asuperior",
    "bsuperior", "centsuperior", "dsuperior", "esuperior", "isuperior",
    "lsuperior", "msuperior", "nsuperior", "osuperior", "rsuperior",
    "ssuperior", "tsuperior", "ff", "ffi", "ffl", "parenleftinferior",
    "parenrightinferior", "Circumflexsmall", "hyphensuperior",
    "Gravesmall", "Asmall", "Bsmall", "Csmall", "Dsmall", "Esmall",
    "Fsmall", "Gsmall", "Hsmall", "Ismall", "Jsmall", "Ksmall", "Lsmall",
    "Msmall", "Nsmall", "Osmall", "Psmall", "Qsmall", "Rsmall", "Ssmall",
    "Tsmall", "Usmall", "Vsmall", "Wsmall", "Xsmall", "Ysmall", "Zsmall",
    "colonmonetary", "onefitted", "rupiah", "Tildesmall", "exclamdownsmall",
    "centoldstyle", "Lslashsmall", "Scaronsmall", "Zcaronsmall",
    "Dieresissmall", "Brevesmall", "Caronsmall", "Dotaccentsmall",
    "Macronsmall", "figuredash", "hypheninferior", "Ogoneksmall",
    "Ringsmall", "Cedillasmall", "questiondownsmall", "oneeighth",
    "threeeighths", "fiveeighths", "seveneighths", "onethird", "twothirds",
    "zerosuperior", "foursuperior", "fivesuperior", "sixsuperior",
    "sevensuperior", "eightsuperior", "ninesuperior", "zeroinferior",
    "oneinferior", "twoinferior", "threeinferior", "fourinferior",
    "fiveinferior", "sixinferior", "seveninferior", "eightinferior",
    "nineinferior", "centinferior", "dollarinferior", "periodinferior",
    "commainferior", "Agravesmall", "Aacutesmall", "Acircumflexsmall",
    "Atildesmall", "Adieresissmall", "Aringsmall", "AEsmall",
    "Ccedillasmall", "Egravesmall", "Eacutesmall", "Ecircumflexsmall",
    "Edieresissmall", "Igravesmall", "Iacutesmall", "Icircumflexsmall",
    "Idieresissmall", "Ethsmall", "Ntildesmall", "Ogravesmall",
    "Oacutesmall", "Ocircumflexsmall", "Otildesmall", "Odieresissmall",
    "OEsmall", "Oslashsmall", "Ugravesmall", "Uacutesmall",
    "Ucircumflexsmall", "Udieresissmall", "Yacutesmall", "Thornsmall",
    "Ydieresissmall", "001.000", "001.001", "001.002", "001.003", "Black",
    "Bold", "Book", "Light", "Medium", "Regular", "Roman", "Semibold"};
static const int kNumStdStrings = 391;

// Standard Encoding code -> SID (for seac composition), CFF spec appx B.
// Only codes with assigned glyphs; 0 elsewhere.
static uint16_t std_encoding_sid(uint8_t code) {
  // Codes 32..126 map to SIDs 1..95 in order; high codes are accents etc.
  if (code >= 32 && code <= 126) return (uint16_t)(code - 31);
  switch (code) {
    case 161: return 96;  case 162: return 97;  case 163: return 98;
    case 164: return 99;  case 165: return 100; case 166: return 101;
    case 167: return 102; case 168: return 103; case 169: return 104;
    case 170: return 105; case 171: return 106; case 172: return 107;
    case 173: return 108; case 174: return 109; case 175: return 110;
    case 177: return 111; case 178: return 112; case 179: return 113;
    case 180: return 114; case 182: return 115; case 183: return 116;
    case 184: return 117; case 185: return 118; case 186: return 119;
    case 187: return 120; case 188: return 121; case 189: return 122;
    case 191: return 123; case 193: return 124; case 194: return 125;
    case 195: return 126; case 196: return 127; case 197: return 128;
    case 198: return 129; case 199: return 130; case 200: return 131;
    case 202: return 132; case 203: return 133; case 205: return 134;
    case 206: return 135; case 207: return 136; case 208: return 137;
    case 225: return 138; case 227: return 139; case 232: return 140;
    case 233: return 141; case 234: return 142; case 235: return 143;
    case 241: return 144; case 245: return 145; case 248: return 146;
    case 249: return 147; case 250: return 148; case 251: return 149;
    default: return 0;
  }
}

// ---------------------------------------------------------------------------
// INDEX / DICT
// ---------------------------------------------------------------------------

CFFFont::Index CFFFont::read_index(size_t pos) const {
  Index ix;
  const uint8_t* d = (const uint8_t*)data_.data();
  size_t n = data_.size();
  if (pos + 2 > n) return ix;
  uint16_t count = rd16(d + pos);
  if (count == 0) {
    ix.end = pos + 2;
    return ix;
  }
  if (pos + 3 > n) return ix;
  int osz = d[pos + 2];
  if (osz < 1 || osz > 4) return ix;
  size_t offs = pos + 3;
  if (offs + (size_t)(count + 1) * osz > n) return ix;
  size_t data_base = offs + (size_t)(count + 1) * osz - 1;
  uint32_t prev = rd_off(d + offs, osz);
  for (uint32_t i = 1; i <= count; i++) {
    uint32_t cur = rd_off(d + offs + (size_t)i * osz, osz);
    if (data_base + cur > n + 1 || cur < prev) {
      ix.items.clear();
      return ix;
    }
    ix.items.push_back({(uint32_t)(data_base + prev), cur - prev});
    prev = cur;
  }
  ix.end = data_base + prev;
  return ix;
}

std::string_view CFFFont::item(const Index& ix, size_t i) const {
  if (i >= ix.items.size()) return {};
  auto [off, len] = ix.items[i];
  if ((size_t)off + len > data_.size()) return {};
  return std::string_view(data_).substr(off, len);
}

std::string CFFFont::sid_name(uint16_t sid) const {
  if (sid < kNumStdStrings) return kStdStrings[sid];
  size_t i = (size_t)sid - kNumStdStrings;
  auto sv = item(strings_, i);
  return std::string(sv);
}

// DICT: map of op -> operand list.
static void parse_dict(std::string_view dv,
                       std::unordered_map<int, std::vector<double>>* out) {
  const uint8_t* p = (const uint8_t*)dv.data();
  const uint8_t* e = p + dv.size();
  std::vector<double> ops;
  while (p < e) {
    uint8_t b = *p;
    if (b <= 21) {  // operator
      int op = b;
      p++;
      if (b == 12 && p < e) {
        op = 1200 + *p;
        p++;
      }
      (*out)[op] = ops;
      ops.clear();
    } else if (b == 28) {
      if (p + 3 > e) break;
      ops.push_back((double)(int16_t)rd16(p + 1));
      p += 3;
    } else if (b == 29) {
      if (p + 5 > e) break;
      ops.push_back((double)(int32_t)rd32(p + 1));
      p += 5;
    } else if (b == 30) {  // real number (BCD nibbles)
      p++;
      std::string s;
      bool done = false;
      while (p < e && !done) {
        for (int half = 0; half < 2; half++) {
          int nib = half == 0 ? (*p >> 4) : (*p & 0xF);
          if (nib <= 9) s.push_back('0' + nib);
          else if (nib == 0xa) s.push_back('.');
          else if (nib == 0xb) s.push_back('E');
          else if (nib == 0xc) s += "E-";
          else if (nib == 0xe) s.push_back('-');
          else if (nib == 0xf) { done = true; break; }
        }
        p++;
      }
      ops.push_back(atof(s.c_str()));
    } else if (b >= 32 && b <= 246) {
      ops.push_back((double)b - 139);
      p++;
    } else if (b >= 247 && b <= 250) {
      if (p + 2 > e) break;
      ops.push_back((b - 247) * 256.0 + p[1] + 108.0);
      p += 2;
    } else if (b >= 251 && b <= 254) {
      if (p + 2 > e) break;
      ops.push_back(-((b - 251) * 256.0) - p[1] - 108.0);
      p += 2;
    } else {
      p++;  // reserved
    }
  }
}

// ---------------------------------------------------------------------------
// load / parse
// ---------------------------------------------------------------------------

bool CFFFont::load_otf(const std::string& data) {
  // OTTO sfnt wrapper: locate the 'CFF ' table.
  const uint8_t* d = (const uint8_t*)data.data();
  size_t n = data.size();
  if (n < 12 || rd32(d) != 0x4F54544F) return false;  // 'OTTO'
  uint16_t num_tables = rd16(d + 4);
  for (uint16_t i = 0; i < num_tables && 12 + (size_t)i * 16 + 16 <= n; i++) {
    const uint8_t* rec = d + 12 + (size_t)i * 16;
    if (memcmp(rec, "CFF ", 4) == 0) {
      uint32_t off = rd32(rec + 8), len = rd32(rec + 12);
      if ((size_t)off + len <= n) return load(data.substr(off, len));
    }
  }
  return false;
}

bool CFFFont::load(std::string data) {
  data_ = std::move(data);
  return parse();
}

bool CFFFont::parse() {
  const uint8_t* d = (const uint8_t*)data_.data();
  size_t n = data_.size();
  if (n < 4) return false;
  uint8_t hdr_size = d[2];
  Index name_ix = read_index(hdr_size);
  if (name_ix.end == 0) return false;
  Index top_ix = read_index(name_ix.end);
  if (top_ix.items.empty()) return false;
  strings_ = read_index(top_ix.end);
  gsubrs_ = read_index(strings_.end ? strings_.end : top_ix.end);

  std::unordered_map<int, std::vector<double>> top;
  parse_dict(item(top_ix, 0), &top);

  auto get1 = [&](int op, double dflt) {
    auto it = top.find(op);
    return (it != top.end() && !it->second.empty()) ? it->second[0] : dflt;
  };

  // FontMatrix (1207): upem = 1 / m[0] (default 0.001 -> 1000)
  auto fm = top.find(1207);
  if (fm != top.end() && fm->second.size() >= 1 && fm->second[0] > 0)
    upem_ = (float)(1.0 / fm->second[0]);

  size_t cs_off = (size_t)get1(17, 0);
  if (!cs_off) return false;
  charstrings_ = read_index(cs_off);
  if (charstrings_.items.empty()) return false;

  cid_keyed_ = top.count(1230) > 0;  // ROS

  // Private DICT (non-CID)
  auto load_private = [&](double size, double off, PrivateInfo* pi) {
    if (size <= 0 || off <= 0 || (size_t)(off + size) > data_.size()) return;
    std::unordered_map<int, std::vector<double>> pd;
    parse_dict(std::string_view(data_).substr((size_t)off, (size_t)size),
               &pd);
    auto g = [&](int op, double dflt) {
      auto it = pd.find(op);
      return (it != pd.end() && !it->second.empty()) ? it->second[0] : dflt;
    };
    pi->default_width = g(20, 0);
    pi->nominal_width = g(21, 0);
    double sub = g(19, 0);
    if (sub > 0) {
      pi->subrs = read_index((size_t)(off + sub));
      pi->has_subrs = true;
    }
  };
  auto pv = top.find(18);
  if (pv != top.end() && pv->second.size() >= 2)
    load_private(pv->second[0], pv->second[1], &priv_);

  // charset (gid -> SID/CID)
  size_t nglyphs = charstrings_.items.size();
  charset_sids_.assign(nglyphs, 0);
  double charset_off = get1(15, 0);
  bool charset_known = true;
  if (charset_off > 2) {
    parse_charset((size_t)charset_off);
  } else if (charset_off == 0) {
    // ISOAdobe default: SID == gid
    for (size_t g = 0; g < nglyphs; g++) charset_sids_[g] = (uint16_t)g;
  } else {
    // predefined Expert/ExpertSubset charsets (1/2): NON-sequential SID
    // lists this engine does not carry — leave the name maps empty
    // rather than build systematically WRONG mappings (glyphs still
    // reach via CID/unicode fallbacks or the substitute font)
    charset_known = false;
  }

  // CID: FDArray (1236) + FDSelect (1237)
  if (cid_keyed_) {
    double fda = get1(1236, 0);
    if (fda > 0) {
      Index fdix = read_index((size_t)fda);
      for (size_t i = 0; i < fdix.items.size(); i++) {
        std::unordered_map<int, std::vector<double>> fd;
        parse_dict(item(fdix, i), &fd);
        PrivateInfo pi;
        auto it = fd.find(18);
        if (it != fd.end() && it->second.size() >= 2)
          load_private(it->second[0], it->second[1], &pi);
        fd_priv_.push_back(std::move(pi));
      }
    }
    fd_select_.assign(nglyphs, 0);
    double fds = get1(1237, 0);
    if (fds > 0 && (size_t)fds < n) {
      const uint8_t* p = d + (size_t)fds;
      uint8_t fmt = p[0];
      if (fmt == 0 && (size_t)fds + 1 + nglyphs <= n) {
        for (size_t g = 0; g < nglyphs; g++) fd_select_[g] = p[1 + g];
      } else if (fmt == 3 && (size_t)fds + 5 <= n) {
        uint16_t nr = rd16(p + 1);
        size_t q = 3;
        uint16_t first = rd16(p + q);
        q += 2;
        for (uint16_t r = 0; r < nr; r++) {
          uint8_t fd = p[q];
          uint16_t next = rd16(p + q + 1);
          for (uint32_t g = first; g < next && g < nglyphs; g++)
            fd_select_[g] = fd;
          first = next;
          q += 3;
        }
      }
    }
    for (size_t g = 0; g < nglyphs; g++)
      cid_to_gid_[charset_sids_[g]] = (uint16_t)g;
  } else if (charset_known) {
    for (size_t g = 0; g < nglyphs; g++) {
      std::string nm = sid_name(charset_sids_[g]);
      if (nm.empty()) continue;
      name_to_gid_.emplace(nm, (uint16_t)g);
      uint32_t u = glyph_name_to_unicode(nm);
      if (u) unicode_to_gid_.emplace(u, (uint16_t)g);
    }
  }
  return true;
}

void CFFFont::parse_charset(size_t pos) {
  const uint8_t* d = (const uint8_t*)data_.data();
  size_t n = data_.size();
  size_t nglyphs = charset_sids_.size();
  if (pos >= n) return;
  uint8_t fmt = d[pos];
  charset_sids_[0] = 0;  // .notdef
  if (fmt == 0) {
    for (size_t g = 1; g < nglyphs && pos + 1 + g * 2 <= n; g++)
      charset_sids_[g] = rd16(d + pos + 1 + (g - 1) * 2);
  } else if (fmt == 1 || fmt == 2) {
    size_t q = pos + 1;
    size_t g = 1;
    int lsz = fmt == 1 ? 1 : 2;
    while (g < nglyphs && q + 2 + lsz <= n) {
      uint16_t first = rd16(d + q);
      uint32_t left = fmt == 1 ? d[q + 2] : rd16(d + q + 2);
      q += 2 + lsz;
      for (uint32_t k = 0; k <= left && g < nglyphs; k++)
        charset_sids_[g++] = (uint16_t)(first + k);
    }
  }
}

// ---------------------------------------------------------------------------
// Type2 charstrings
// ---------------------------------------------------------------------------

namespace {

struct T2Ctx {
  std::vector<double> st;
  double x = 0, y = 0;
  int nstems = 0;
  bool width_done = false;
  std::vector<std::pair<float, float>>* contour = nullptr;
  Glyph* g = nullptr;
  double trans[32];  // transient array (put/get) — rarely used
  double adv = 0;    // advance (nominal + delta)
  double seac[4];
  bool has_seac = false;
  bool ended = false;
};

void t2_flatten_cubic(std::vector<std::pair<float, float>>* c, double x0,
                      double y0, double x1, double y1, double x2, double y2,
                      double x3, double y3, int depth = 0) {
  // subdivide until flat
  double dx = x3 - x0, dy = y3 - y0;
  double d1 = fabs((x1 - x0) * dy - (y1 - y0) * dx);
  double d2 = fabs((x2 - x0) * dy - (y2 - y0) * dx);
  double dd = d1 + d2;
  if (depth > 8 || dd * dd < 0.25 * (dx * dx + dy * dy) || (dx == 0 && dy == 0)) {
    c->push_back({(float)x3, (float)y3});
    return;
  }
  double x01 = (x0 + x1) / 2, y01 = (y0 + y1) / 2;
  double x12 = (x1 + x2) / 2, y12 = (y1 + y2) / 2;
  double x23 = (x2 + x3) / 2, y23 = (y2 + y3) / 2;
  double xa = (x01 + x12) / 2, ya = (y01 + y12) / 2;
  double xb = (x12 + x23) / 2, yb = (y12 + y23) / 2;
  double xm = (xa + xb) / 2, ym = (ya + yb) / 2;
  t2_flatten_cubic(c, x0, y0, x01, y01, xa, ya, xm, ym, depth + 1);
  t2_flatten_cubic(c, xm, ym, xb, yb, x23, y23, x3, y3, depth + 1);
}

}  // namespace

const CFFFont::PrivateInfo& CFFFont::priv_for_gid(uint16_t gid) const {
  if (cid_keyed_ && !fd_priv_.empty()) {
    uint8_t fd = gid < fd_select_.size() ? fd_select_[gid] : 0;
    if (fd < fd_priv_.size()) return fd_priv_[fd];
    return fd_priv_[0];
  }
  return priv_;
}

void CFFFont::run_charstring(std::string_view cs, const PrivateInfo& priv,
                             Glyph* g, int depth) {
  if (depth > 10) return;
  // interpreter state lives across subr calls via a thread_local ctx
  static thread_local T2Ctx* ctx = nullptr;
  bool top_level = depth == 0;
  T2Ctx local;
  if (top_level) {
    ctx = &local;
    ctx->g = g;
    ctx->adv = priv.default_width;
  }
  T2Ctx& c = *ctx;

  auto bias = [](size_t count) -> int {
    return count < 1240 ? 107 : count < 33900 ? 1131 : 32768;
  };
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
    t2_flatten_cubic(c.contour, c.x, c.y, x1, y1, x2, y2, x3, y3);
    c.x = x3;
    c.y = y3;
  };
  auto take_width = [&](size_t even) {
    // a leading extra operand on the first stack-clearing op is the
    // width delta from nominalWidthX
    if (!c.width_done) {
      c.width_done = true;
      if (c.st.size() % 2 == (even ? 1 : 0) && !c.st.empty()) {
        c.adv = priv.nominal_width + c.st[0];
        c.st.erase(c.st.begin());
      }
    }
  };

  const uint8_t* p = (const uint8_t*)cs.data();
  const uint8_t* e = p + cs.size();
  while (p < e) {
    uint8_t b = *p;
    if (b >= 32 || b == 28) {
      double v;
      if (b == 28) {
        if (p + 3 > e) return;
        v = (double)(int16_t)rd16(p + 1);
        p += 3;
      } else if (b <= 246) {
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
      } else {  // 255: 16.16 fixed
        if (p + 5 > e) return;
        v = (double)(int32_t)rd32(p + 1) / 65536.0;
        p += 5;
      }
      if (c.st.size() < 64) c.st.push_back(v);
      continue;
    }
    p++;
    switch (b) {
      case 1: case 3: case 18: case 23:  // h/vstem(hm)
        take_width(true);
        c.nstems += (int)(c.st.size() / 2);
        c.st.clear();
        break;
      case 19: case 20: {  // hintmask / cntrmask
        take_width(true);
        c.nstems += (int)(c.st.size() / 2);
        c.st.clear();
        p += (c.nstems + 7) / 8;
        break;
      }
      case 21:  // rmoveto
        take_width(true);
        if (c.st.size() >= 2) {
          c.x += c.st[c.st.size() - 2];
          c.y += c.st[c.st.size() - 1];
        }
        c.st.clear();
        new_contour();
        break;
      case 22:  // hmoveto
        take_width(false);
        if (!c.st.empty()) c.x += c.st.back();
        c.st.clear();
        new_contour();
        break;
      case 4:  // vmoveto
        take_width(false);
        if (!c.st.empty()) c.y += c.st.back();
        c.st.clear();
        new_contour();
        break;
      case 5:  // rlineto
        for (size_t i = 0; i + 1 < c.st.size(); i += 2)
          line_to(c.x + c.st[i], c.y + c.st[i + 1]);
        c.st.clear();
        break;
      case 6: case 7: {  // hlineto / vlineto (alternating)
        bool horiz = b == 6;
        for (size_t i = 0; i < c.st.size(); i++) {
          if (horiz) line_to(c.x + c.st[i], c.y);
          else line_to(c.x, c.y + c.st[i]);
          horiz = !horiz;
        }
        c.st.clear();
        break;
      }
      case 8:  // rrcurveto
        for (size_t i = 0; i + 5 < c.st.size(); i += 6)
          curve_to(c.x + c.st[i], c.y + c.st[i + 1],
                   c.x + c.st[i] + c.st[i + 2],
                   c.y + c.st[i + 1] + c.st[i + 3],
                   c.x + c.st[i] + c.st[i + 2] + c.st[i + 4],
                   c.y + c.st[i + 1] + c.st[i + 3] + c.st[i + 5]);
        c.st.clear();
        break;
      case 24: {  // rcurveline
        size_t i = 0;
        while (i + 5 < c.st.size() && c.st.size() - i > 2) {
          curve_to(c.x + c.st[i], c.y + c.st[i + 1],
                   c.x + c.st[i] + c.st[i + 2],
                   c.y + c.st[i + 1] + c.st[i + 3],
                   c.x + c.st[i] + c.st[i + 2] + c.st[i + 4],
                   c.y + c.st[i + 1] + c.st[i + 3] + c.st[i + 5]);
          i += 6;
        }
        if (i + 1 < c.st.size()) line_to(c.x + c.st[i], c.y + c.st[i + 1]);
        c.st.clear();
        break;
      }
      case 25: {  // rlinecurve
        size_t i = 0;
        while (c.st.size() - i > 6) {
          line_to(c.x + c.st[i], c.y + c.st[i + 1]);
          i += 2;
        }
        if (i + 5 < c.st.size())
          curve_to(c.x + c.st[i], c.y + c.st[i + 1],
                   c.x + c.st[i] + c.st[i + 2],
                   c.y + c.st[i + 1] + c.st[i + 3],
                   c.x + c.st[i] + c.st[i + 2] + c.st[i + 4],
                   c.y + c.st[i + 1] + c.st[i + 3] + c.st[i + 5]);
        c.st.clear();
        break;
      }
      case 26: {  // vvcurveto
        size_t i = 0;
        double dx1 = 0;
        if (c.st.size() % 4 == 1) { dx1 = c.st[0]; i = 1; }
        for (; i + 3 < c.st.size(); i += 4) {
          double x1 = c.x + dx1, y1 = c.y + c.st[i];
          double x2 = x1 + c.st[i + 1], y2 = y1 + c.st[i + 2];
          curve_to(x1, y1, x2, y2, x2, y2 + c.st[i + 3]);
          dx1 = 0;
        }
        c.st.clear();
        break;
      }
      case 27: {  // hhcurveto
        size_t i = 0;
        double dy1 = 0;
        if (c.st.size() % 4 == 1) { dy1 = c.st[0]; i = 1; }
        for (; i + 3 < c.st.size(); i += 4) {
          double x1 = c.x + c.st[i], y1 = c.y + dy1;
          double x2 = x1 + c.st[i + 1], y2 = y1 + c.st[i + 2];
          curve_to(x1, y1, x2, y2, x2 + c.st[i + 3], y2);
          dy1 = 0;
        }
        c.st.clear();
        break;
      }
      case 30: case 31: {  // vhcurveto / hvcurveto
        bool horiz = b == 31;
        size_t i = 0;
        while (i + 3 < c.st.size()) {
          bool last = c.st.size() - i == 5;
          double x1, y1, x2, y2, x3, y3;
          if (horiz) {
            x1 = c.x + c.st[i]; y1 = c.y;
            x2 = x1 + c.st[i + 1]; y2 = y1 + c.st[i + 2];
            y3 = y2 + c.st[i + 3];
            x3 = last ? x2 + c.st[i + 4] : x2;
          } else {
            x1 = c.x; y1 = c.y + c.st[i];
            x2 = x1 + c.st[i + 1]; y2 = y1 + c.st[i + 2];
            x3 = x2 + c.st[i + 3];
            y3 = last ? y2 + c.st[i + 4] : y2;
          }
          curve_to(x1, y1, x2, y2, x3, y3);
          horiz = !horiz;
          i += 4;
        }
        c.st.clear();
        break;
      }
      case 10: {  // callsubr
        if (c.st.empty()) break;
        int idx = (int)c.st.back() + (priv.has_subrs
                                          ? bias(priv.subrs.items.size())
                                          : 107);
        c.st.pop_back();
        if (priv.has_subrs && idx >= 0 &&
            (size_t)idx < priv.subrs.items.size())
          run_charstring(item(priv.subrs, idx), priv, g, depth + 1);
        if (c.ended) { if (top_level) goto done; return; }
        break;
      }
      case 29: {  // callgsubr
        if (c.st.empty()) break;
        int idx = (int)c.st.back() + bias(gsubrs_.items.size());
        c.st.pop_back();
        if (idx >= 0 && (size_t)idx < gsubrs_.items.size())
          run_charstring(item(gsubrs_, idx), priv, g, depth + 1);
        if (c.ended) { if (top_level) goto done; return; }
        break;
      }
      case 11:  // return
        return;
      case 14: {  // endchar (optional seac: adx ady bchar achar)
        take_width(true);
        if (c.st.size() >= 4) {
          c.seac[0] = c.st[c.st.size() - 4];
          c.seac[1] = c.st[c.st.size() - 3];
          c.seac[2] = c.st[c.st.size() - 2];
          c.seac[3] = c.st[c.st.size() - 1];
          c.has_seac = true;
        }
        c.st.clear();
        c.ended = true;
        if (top_level) goto done;
        return;
      }
      case 12: {  // escape
        if (p >= e) return;
        uint8_t b2 = *p++;
        switch (b2) {
          case 35: {  // flex: 13 args + fd
            if (c.st.size() >= 13) {
              double x1 = c.x + c.st[0], y1 = c.y + c.st[1];
              double x2 = x1 + c.st[2], y2 = y1 + c.st[3];
              double x3 = x2 + c.st[4], y3 = y2 + c.st[5];
              curve_to(x1, y1, x2, y2, x3, y3);
              double x4 = c.x + c.st[6], y4 = c.y + c.st[7];
              double x5 = x4 + c.st[8], y5 = y4 + c.st[9];
              double x6 = x5 + c.st[10], y6 = y5 + c.st[11];
              curve_to(x4, y4, x5, y5, x6, y6);
            }
            c.st.clear();
            break;
          }
          case 34: {  // hflex
            if (c.st.size() >= 7) {
              double y0 = c.y;
              double x1 = c.x + c.st[0], y1 = c.y;
              double x2 = x1 + c.st[1], y2 = y1 + c.st[2];
              double x3 = x2 + c.st[3], y3 = y2;
              curve_to(x1, y1, x2, y2, x3, y3);
              double x4 = c.x + c.st[4], y4 = c.y;
              double x5 = x4 + c.st[5], y5 = y0;
              double x6 = x5 + c.st[6], y6 = y0;
              curve_to(x4, y4, x5, y5, x6, y6);
            }
            c.st.clear();
            break;
          }
          case 36: {  // hflex1
            if (c.st.size() >= 9) {
              double y0 = c.y;
              double x1 = c.x + c.st[0], y1 = c.y + c.st[1];
              double x2 = x1 + c.st[2], y2 = y1 + c.st[3];
              double x3 = x2 + c.st[4], y3 = y2;
              curve_to(x1, y1, x2, y2, x3, y3);
              double x4 = c.x + c.st[5], y4 = c.y;
              double x5 = x4 + c.st[6], y5 = y4 + c.st[7];
              double x6 = x5 + c.st[8], y6 = y0;
              curve_to(x4, y4, x5, y5, x6, y6);
            }
            c.st.clear();
            break;
          }
          case 37: {  // flex1
            if (c.st.size() >= 11) {
              double sx = c.x, sy = c.y;
              double dx = 0, dy = 0;
              for (int k = 0; k < 10; k += 2) { dx += c.st[k]; dy += c.st[k + 1]; }
              double x1 = c.x + c.st[0], y1 = c.y + c.st[1];
              double x2 = x1 + c.st[2], y2 = y1 + c.st[3];
              double x3 = x2 + c.st[4], y3 = y2 + c.st[5];
              curve_to(x1, y1, x2, y2, x3, y3);
              double x4 = c.x + c.st[6], y4 = c.y + c.st[7];
              double x5 = x4 + c.st[8], y5 = y4 + c.st[9];
              double x6, y6;
              if (fabs(dx) > fabs(dy)) { x6 = x5 + c.st[10]; y6 = sy; }
              else { x6 = sx; y6 = y5 + c.st[10]; }
              curve_to(x4, y4, x5, y5, x6, y6);
            }
            c.st.clear();
            break;
          }
          case 12: {  // div
            if (c.st.size() >= 2) {
              double bv = c.st.back(); c.st.pop_back();
              double av = c.st.back(); c.st.pop_back();
              c.st.push_back(bv != 0 ? av / bv : 0);
            }
            break;
          }
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
done:
  if (top_level) {
    g->advance = (float)c.adv;
    // drop degenerate trailing contour
    if (!g->contours.empty() && g->contours.back().size() < 3)
      g->contours.pop_back();
    if (c.has_seac) {
      // compose base + accent from Standard Encoding codes
      uint16_t bsid = std_encoding_sid((uint8_t)c.seac[2]);
      uint16_t asid = std_encoding_sid((uint8_t)c.seac[3]);
      uint16_t bgid = bsid ? gid_for_name(kStdStrings[bsid]) : 0;
      uint16_t agid = asid ? gid_for_name(kStdStrings[asid]) : 0;
      if (bgid) {
        const Glyph* bg = glyph(bgid);
        for (auto& cont : bg->contours) g->contours.push_back(cont);
      }
      if (agid) {
        const Glyph* ag = glyph(agid);
        for (auto& cont : ag->contours) {
          std::vector<std::pair<float, float>> tc;
          tc.reserve(cont.size());
          for (auto& pt : cont)
            tc.push_back({pt.first + (float)c.seac[0],
                          pt.second + (float)c.seac[1]});
          g->contours.push_back(std::move(tc));
        }
      }
    }
    ctx = nullptr;
  }
}

const Glyph* CFFFont::glyph(uint16_t gid) {
  auto it = glyph_cache_.find(gid);
  if (it != glyph_cache_.end()) return &it->second;
  // Guard against seac re-entry: a corrupt font whose endchar-seac base or
  // accent resolves (via its own charset) back to the glyph being built would
  // recurse unboundedly (the cache is only populated after run_charstring
  // returns). Real fonts never self-compose; return an empty glyph instead.
  static const Glyph kEmpty;
  if (!building_.insert(gid).second) return &kEmpty;
  Glyph g;
  if (gid < charstrings_.items.size())
    run_charstring(item(charstrings_, gid), priv_for_gid(gid), &g, 0);
  g.loaded = true;
  building_.erase(gid);
  auto res = glyph_cache_.emplace(gid, std::move(g));
  return &res.first->second;
}

uint16_t CFFFont::glyph_for_unicode(uint32_t cp) const {
  auto it = unicode_to_gid_.find(cp);
  return it != unicode_to_gid_.end() ? it->second : 0;
}

uint16_t CFFFont::gid_for_name(const std::string& n) const {
  auto it = name_to_gid_.find(n);
  return it != name_to_gid_.end() ? it->second : 0;
}

uint16_t CFFFont::gid_for_cid(uint32_t cid) const {
  if (!cid_keyed_) return (uint16_t)cid;
  auto it = cid_to_gid_.find(cid);
  return it != cid_to_gid_.end() ? it->second : 0;
}

float CFFFont::advance_for_gid(uint16_t gid) const {
  auto it = glyph_cache_.find(gid);
  if (it != glyph_cache_.end()) return it->second.advance;
  // advance requires running the charstring; const-cast through cache
  return const_cast<CFFFont*>(this)->glyph(gid)->advance;
}

}  // namespace spdf
