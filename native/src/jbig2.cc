// JBIG2 decode for PDF-embedded streams (ITU T.88, PDF 7.4.7) — the
// MMR subset: segment parsing (embedded organization), page info, and
// generic regions coded with MMR=1, whose payload is CCITT G4 — decoded
// by the already-cross-validated ccitt.cc engine (tests validate the
// entropy layer against PIL's independent G4 encoder). Arithmetic-coded
// regions and symbol dictionaries return failure so the caller keeps
// the documented neutral-plate degrade: the MQ-coder's state tables
// can't be implemented confidently without the spec text to hand, and
// a wrong table decodes garbage with nothing to validate against.
#include "spdf.h"

#include <cstring>

namespace spdf {

namespace {

inline uint32_t rd32be(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

struct PageBitmap {
  int w = 0, h = 0;
  std::vector<uint8_t> px;  // 1 byte per pixel, 1 = black
};

// returns false on malformed stream (caller degrades)
bool process_segments(const uint8_t* d, size_t n, PageBitmap* page) {
  size_t p = 0;
  while (p + 11 <= n) {
    uint32_t seg_num = rd32be(d + p);
    uint8_t flags = d[p + 4];
    int type = flags & 0x3F;
    bool page4 = flags & 0x40;
    p += 5;
    // referred-to segments
    if (p >= n) return false;
    uint32_t ref_count = d[p] >> 5;
    if (ref_count == 7) {
      if (p + 4 > n) return false;
      ref_count = rd32be(d + p) & 0x1FFFFFFF;
      if (ref_count > 1u << 20) return false;
      p += 4 + (ref_count + 8) / 8;  // retain bits: ceil((count+1)/8)
    } else {
      p += 1;
    }
    int ref_size = seg_num <= 256 ? 1 : seg_num <= 65536 ? 2 : 4;
    p += (size_t)ref_count * ref_size;
    p += page4 ? 4 : 1;  // page association
    if (p + 4 > n) return false;
    uint32_t dlen = rd32be(d + p);
    p += 4;
    if (dlen == 0xFFFFFFFFu) return false;  // unknown length: unsupported
    if (p + dlen > n) return false;
    const uint8_t* seg = d + p;

    if (type == 48 && dlen >= 17) {  // page information
      uint32_t pw = rd32be(seg), ph = rd32be(seg + 4);
      uint8_t pflags = dlen >= 17 ? seg[16] : 0;
      if (pw >= 1 && ph >= 1 && (int64_t)pw * ph <= (int64_t)64 << 20 &&
          ph != 0xFFFFFFFFu) {
        page->w = (int)pw;
        page->h = (int)ph;
        page->px.assign((size_t)pw * ph, (pflags & 4) ? 1 : 0);
      }
    } else if ((type == 36 || type == 38 || type == 39) && dlen >= 18) {
      // (immediate) generic region
      uint32_t rw = rd32be(seg), rh = rd32be(seg + 4);
      uint32_t rx = rd32be(seg + 8), ry = rd32be(seg + 12);
      uint8_t gflags = seg[17];
      bool mmr = gflags & 1;
      if (!mmr) return false;  // arithmetic coding: unsupported subset
      if (rw < 1 || rh < 1 || (int64_t)rw * rh > (int64_t)64 << 20)
        return false;
      std::string payload((const char*)seg + 18, dlen - 18);
      // MMR == CCITT G4 over the region width; 1 = black
      // ccitt.cc's packed output sets bit=1 for black when
      // black_is_1=false (the PDF-default convention); keep that and
      // read 1=black below
      std::string rows = ccitt_decode(payload, -1, (int)rw, (int)rh,
                                      /*black_is_1=*/false,
                                      /*byte_align=*/false);
      size_t rowbytes = ((size_t)rw + 7) / 8;
      if (rows.size() < rowbytes * rh) return false;
      if (page->px.empty()) {
        // no page info segment: size the page to this region
        page->w = (int)(rx + rw);
        page->h = (int)(ry + rh);
        if ((int64_t)page->w * page->h > (int64_t)64 << 20) return false;
        page->px.assign((size_t)page->w * page->h, 0);
      }
      for (uint32_t y = 0; y < rh; y++) {
        int py = (int)(ry + y);
        if (py < 0 || py >= page->h) continue;
        const uint8_t* row = (const uint8_t*)rows.data() + rowbytes * y;
        for (uint32_t x = 0; x < rw; x++) {
          int px_ = (int)(rx + x);
          if (px_ < 0 || px_ >= page->w) continue;
          if ((row[x / 8] >> (7 - x % 8)) & 1)
            page->px[(size_t)py * page->w + px_] = 1;  // OR composition
        }
      }
    } else if (type == 0 || type == 4 || type == 6 || type == 7 ||
               type == 40 || type == 42 || type == 43) {
      // symbol dictionary / text region / refinement: unsupported subset
      return false;
    }
    // other types (end-of-page/stripe/file, extensions, tables): skip
    p += dlen;
  }
  return !page->px.empty();
}

}  // namespace

// Decode a PDF-embedded JBIG2 stream (+ optional JBIG2Globals) to an
// 8-bit gray plane (0 = black ink, 255 = white). Empty on unsupported
// content — the caller keeps its neutral-plate degrade.
std::vector<uint8_t> jbig2_decode_gray(const std::string& data,
                                       const std::string& globals,
                                       int* w, int* h) {
  PageBitmap page;
  if (!globals.empty() &&
      !process_segments((const uint8_t*)globals.data(), globals.size(),
                        &page)) {
    // globals typically hold symbol dicts (unsupported) — but globals
    // that only carry page info may still leave a usable page
    if (page.px.empty()) return {};
  }
  if (!process_segments((const uint8_t*)data.data(), data.size(), &page))
    return {};
  *w = page.w;
  *h = page.h;
  std::vector<uint8_t> gray((size_t)page.w * page.h);
  for (size_t i = 0; i < gray.size(); i++)
    gray[i] = page.px[i] ? 0 : 255;
  return gray;
}

}  // namespace spdf
