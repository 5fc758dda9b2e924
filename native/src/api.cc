// C API for the spdf engine (ctypes-friendly). Page metadata crosses the
// boundary as JSON; pixel buffers as malloc'd RGB8 the caller frees.
#include "spdf.h"

#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

using namespace spdf;

namespace {

struct DocHandle {
  Document doc;
  // cached per-page extraction (content runs once; render reuses).
  // Mutex: Python calls in from a prefetch thread and the consume thread
  // concurrently (ctypes releases the GIL during foreign calls).
  std::mutex mu;
  std::unordered_map<int, std::shared_ptr<std::pair<PageContent, DisplayList>>>
      pages;
  std::shared_ptr<std::pair<PageContent, DisplayList>> get_page(int i) {
    auto it = pages.find(i);
    if (it != pages.end()) return it->second;
    auto pc = std::make_shared<std::pair<PageContent, DisplayList>>();
    ContentEngine eng(&doc);
    eng.run(i, &pc->first, &pc->second);
    pages[i] = pc;
    return pc;
  }
};

void json_escape(const std::string& s, std::string* out) {
  for (unsigned char c : s) {
    switch (c) {
      case '"': *out += "\\\""; break;
      case '\\': *out += "\\\\"; break;
      case '\n': *out += "\\n"; break;
      case '\r': *out += "\\r"; break;
      case '\t': *out += "\\t"; break;
      default:
        if (c < 0x20) {
          char buf[8];
          snprintf(buf, sizeof(buf), "\\u%04x", c);
          *out += buf;
        } else {
          *out += (char)c;
        }
    }
  }
}

void append_rect(std::string* j, const Rect& r) {
  char buf[128];
  snprintf(buf, sizeof(buf), "[%.3f,%.3f,%.3f,%.3f]", r.x0, r.y0, r.x1, r.y1);
  *j += buf;
}

}  // namespace

extern "C" {

void* spdf_open_pw(const char* path, const char* password) {
  auto* h = new DocHandle();
  if (!h->doc.load(path, password ? password : "")) {
    delete h;
    return nullptr;
  }
  return h;
}

void* spdf_open(const char* path) { return spdf_open_pw(path, ""); }

void* spdf_open_bytes_pw(const uint8_t* data, long size,
                         const char* password) {
  auto* h = new DocHandle();
  std::vector<uint8_t> b(data, data + size);
  if (!h->doc.load_bytes(std::move(b), password ? password : "")) {
    delete h;
    return nullptr;
  }
  return h;
}

void* spdf_open_bytes(const uint8_t* data, long size) {
  return spdf_open_bytes_pw(data, size, "");
}

void spdf_close(void* handle) { delete (DocHandle*)handle; }

int spdf_page_count(void* handle) {
  // page_count()/page_size() resolve objects and can mutate the document's
  // caches (indirect attrs, lazy object streams); callers run concurrently
  // with render/metadata threads (ctypes drops the GIL), so every entry
  // point takes the handle mutex.
  auto* h = (DocHandle*)handle;
  std::lock_guard<std::mutex> lock(h->mu);
  return h->doc.page_count();
}

void spdf_page_size(void* handle, int index, double* w, double* h) {
  auto* hd = (DocHandle*)handle;
  std::lock_guard<std::mutex> lock(hd->mu);
  hd->doc.page_size(index, w, h);
}

// JSON: {"spans": [{"text","bbox","size","font"}...],
//        "drawings": [{"bbox","kind","is_rect","items"}...],
//        "images": [{"obj","bbox","width","height","inline"}...]}
char* spdf_page_metadata(void* handle, int index) {
  auto* h = (DocHandle*)handle;
  std::lock_guard<std::mutex> lock(h->mu);
  auto pc = h->get_page(index);
  std::string j = "{\"spans\":[";
  bool first = true;
  for (auto& s : pc->first.spans) {
    if (!first) j += ",";
    first = false;
    j += "{\"text\":\"";
    json_escape(s.text, &j);
    j += "\",\"bbox\":";
    append_rect(&j, s.bbox);
    char buf[96];
    snprintf(buf, sizeof(buf), ",\"size\":%.2f,\"font\":\"", s.size);
    j += buf;
    json_escape(s.font, &j);
    j += "\"}";
  }
  j += "],\"drawings\":[";
  first = true;
  for (auto& d : pc->first.drawings) {
    if (!first) j += ",";
    first = false;
    j += "{\"bbox\":";
    append_rect(&j, d.bbox);
    char buf[96];
    snprintf(buf, sizeof(buf), ",\"kind\":%d,\"is_rect\":%s,\"items\":%d}",
             d.kind, d.is_rect ? "true" : "false", d.item_count);
    j += buf;
  }
  j += "],\"images\":[";
  first = true;
  for (auto& im : pc->first.images) {
    if (!first) j += ",";
    first = false;
    j += "{\"obj\":";
    j += std::to_string(im.obj_num);
    j += ",\"bbox\":";
    append_rect(&j, im.rect);
    char buf[96];
    snprintf(buf, sizeof(buf), ",\"width\":%d,\"height\":%d,\"inline\":%s}",
             im.width, im.height, im.inline_image ? "true" : "false");
    j += buf;
  }
  j += "]}";
  char* out = (char*)malloc(j.size() + 1);
  memcpy(out, j.data(), j.size() + 1);
  return out;
}

// Render page region. clip = [x0,y0,x1,y1] page pts top-left origin or null.
// Returns malloc'd RGB8 buffer, sets out_w/out_h.
uint8_t* spdf_render(void* handle, int index, double scale,
                     const double* clip, int* out_w, int* out_h) {
  auto* h = (DocHandle*)handle;
  std::lock_guard<std::mutex> lock(h->mu);
  auto pc = h->get_page(index);
  std::vector<uint8_t> px =
      rasterize(&h->doc, pc->second, scale, clip, out_w, out_h);
  if (px.empty()) return nullptr;
  uint8_t* out = (uint8_t*)malloc(px.size());
  memcpy(out, px.data(), px.size());
  return out;
}

// Decode an embedded image XObject to RGB8.
uint8_t* spdf_decode_image(void* handle, int obj_num, int* w, int* h) {
  auto* hd = (DocHandle*)handle;
  std::lock_guard<std::mutex> lock(hd->mu);
  std::vector<uint8_t> px = decode_image_rgb(&hd->doc, obj_num, w, h);
  if (px.empty()) return nullptr;
  uint8_t* out = (uint8_t*)malloc(px.size());
  memcpy(out, px.data(), px.size());
  return out;
}

// PNG-encode an RGB8 buffer: filter-NONE rows + zlib level 1.
//
// The pipeline writes one 150-DPI crop PNG per segment; PIL's encoder
// spends most of its time trying all five PNG row filters per row
// (adaptive heuristic). Crop renders are white-background line art that
// deflates fine unfiltered, so fixed filter 0 + fast deflate cuts the
// per-crop host cost ~3x on the 1-core host (profiled: png_encode was
// the single largest CPU stage of the 1,000-page bench).
//
// Crops with <= 256 distinct colors (virtually every chart/diagram
// render: flat fills + antialiased text against white) additionally
// take the palettized PNG8 path — deflate then runs over 1 byte/px
// instead of 3, which cuts the dominant compress cost ~3x again and
// produces smaller files. Photographic crops (> 256 colors) fall back
// to truecolor. Both emit spec-conformant PNGs (lossless either way).
// Returns malloc'd PNG bytes, sets *out_len; caller frees via spdf_free.
uint8_t* spdf_png_encode(const uint8_t* rgb, int w, int h, long* out_len) {
  *out_len = 0;
  if (!rgb || w <= 0 || h <= 0) return nullptr;
  const size_t stride = (size_t)w * 3;
  const size_t n_px = (size_t)w * (size_t)h;

  // ---- try to palettize: open-addressed map of 24-bit colors ----------
  // 2048 slots (power of two); key = color | 0x80000000 marks occupancy.
  // A last-color fast path makes runs (white background) ~1 compare/px.
  std::vector<uint8_t> idx(n_px);
  uint32_t slots[2048];
  memset(slots, 0, sizeof(slots));
  uint8_t slot_idx[2048];
  std::vector<uint8_t> palette;  // r,g,b triplets
  palette.reserve(256 * 3);
  int n_colors = 0;
  uint32_t last_color = 0xffffffffu;
  uint8_t last_idx = 0;
  bool palettized = true;
  for (size_t i = 0; i < n_px; i++) {
    const uint8_t* p = rgb + i * 3;
    uint32_t c = ((uint32_t)p[0] << 16) | ((uint32_t)p[1] << 8) | p[2];
    if (c == last_color) {
      idx[i] = last_idx;
      continue;
    }
    uint32_t key = c | 0x80000000u;
    uint32_t slot = (c * 2654435761u) >> 21;  // top 11 bits
    while (true) {
      uint32_t s = slots[slot & 2047];
      if (s == key) break;
      if (s == 0) {
        if (n_colors == 256) { palettized = false; break; }
        slots[slot & 2047] = key;
        slot_idx[slot & 2047] = (uint8_t)n_colors;
        palette.push_back(p[0]);
        palette.push_back(p[1]);
        palette.push_back(p[2]);
        n_colors++;
        break;
      }
      slot++;
    }
    if (!palettized) break;
    last_color = c;
    last_idx = slot_idx[slot & 2047];
    idx[i] = last_idx;
  }

  // ---- raw scanlines (filter byte 0 per row) ---------------------------
  std::vector<uint8_t> raw;
  if (palettized) {
    raw.resize(((size_t)w + 1) * (size_t)h);
    for (int y = 0; y < h; y++) {
      uint8_t* row = raw.data() + ((size_t)w + 1) * (size_t)y;
      row[0] = 0;
      memcpy(row + 1, idx.data() + (size_t)w * (size_t)y, w);
    }
  } else {
    raw.resize((stride + 1) * (size_t)h);
    for (int y = 0; y < h; y++) {
      uint8_t* row = raw.data() + (stride + 1) * (size_t)y;
      row[0] = 0;  // filter: NONE
      memcpy(row + 1, rgb + stride * (size_t)y, stride);
    }
  }
  uLongf bound = compressBound((uLong)raw.size());
  std::vector<uint8_t> idat(bound);
  if (compress2(idat.data(), &bound, raw.data(), (uLong)raw.size(), 1) !=
      Z_OK)
    return nullptr;

  std::vector<uint8_t> png;
  png.reserve(bound + 64 + palette.size());
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                 '\n'};
  png.insert(png.end(), sig, sig + 8);
  auto be32 = [](uint32_t v, uint8_t* p) {
    p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
  };
  auto chunk = [&](const char* type, const uint8_t* data, size_t n) {
    uint8_t hdr[8];
    be32((uint32_t)n, hdr);
    memcpy(hdr + 4, type, 4);
    png.insert(png.end(), hdr, hdr + 8);
    if (n) png.insert(png.end(), data, data + n);
    uLong crc = crc32(0L, (const Bytef*)type, 4);
    if (n) crc = crc32(crc, data, (uInt)n);
    uint8_t cb[4];
    be32((uint32_t)crc, cb);
    png.insert(png.end(), cb, cb + 4);
  };
  uint8_t ihdr[13];
  be32((uint32_t)w, ihdr);
  be32((uint32_t)h, ihdr + 4);
  ihdr[8] = 8;                         // bit depth
  ihdr[9] = palettized ? 3 : 2;        // color type: indexed / truecolor
  ihdr[10] = ihdr[11] = ihdr[12] = 0;  // deflate / filter 0 / no interlace
  chunk("IHDR", ihdr, 13);
  if (palettized) chunk("PLTE", palette.data(), palette.size());
  chunk("IDAT", idat.data(), bound);
  chunk("IEND", nullptr, 0);

  uint8_t* out = (uint8_t*)malloc(png.size());
  memcpy(out, png.data(), png.size());
  *out_len = (long)png.size();
  return out;
}

// Fused luma + 2x2-strided subsample over a crop batch — the analyze
// pass's H2D prep (ops/color.gray_quarter_host). The numpy version costs
// ~100ms per 32-crop chunk in uint16 temporaries on the 1-core host;
// this single pass runs at memory speed (~15ms) and releases the GIL
// via ctypes. gray: (n,h,w) uint8, integer luma (77,150,29)/256 with
// rounding — bit-identical to the numpy path. rgbq: (n,h/2,w/2,3) uint8.
// Caller allocates both outputs.
void spdf_gray_quarter(const uint8_t* rgb, int n, int h, int w,
                       uint8_t* gray, uint8_t* rgbq) {
  const int hq = h / 2, wq = w / 2;
  for (int i = 0; i < n; i++) {
    const uint8_t* src = rgb + (size_t)i * h * w * 3;
    uint8_t* g = gray + (size_t)i * h * w;
    uint8_t* q = rgbq + (size_t)i * hq * wq * 3;
    for (int y = 0; y < h; y++) {
      const uint8_t* row = src + (size_t)y * w * 3;
      uint8_t* grow = g + (size_t)y * w;
      for (int x = 0; x < w; x++) {
        const uint8_t* p = row + x * 3;
        grow[x] =
            (uint8_t)((77 * p[0] + 150 * p[1] + 29 * p[2] + 128) >> 8);
      }
      if ((y & 1) == 0 && (y >> 1) < hq) {
        uint8_t* qrow = q + (size_t)(y >> 1) * wq * 3;
        for (int x = 0; x < wq; x++) {
          const uint8_t* p = row + (size_t)(x * 2) * 3;
          qrow[x * 3] = p[0];
          qrow[x * 3 + 1] = p[1];
          qrow[x * 3 + 2] = p[2];
        }
      }
    }
  }
}

void spdf_free(void* p) { free(p); }

}  // extern "C"
