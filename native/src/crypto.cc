// PDF standard security handler: MD5, RC4 and AES-128/256-CBC decryption
// (V1/V2 RC4, V4 AESV2/V2 crypt filters, empty user password) — the
// encryption classes real textbook PDFs ship with ("owner-locked" files
// that open without a password). The reference read them through PyMuPDF
// (pdf_image_segmentation.py:2731); round-1's engine declined them.
#include "spdf.h"

#include <cstring>

namespace spdf {

// ---------------------------------------------------------------------------
// MD5 (RFC 1321) — compact implementation
// ---------------------------------------------------------------------------

namespace {

struct MD5 {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe, d = 0x10325476;
  uint64_t len = 0;
  uint8_t buf[64];
  size_t fill = 0;

  static uint32_t rol(uint32_t x, int s) { return (x << s) | (x >> (32 - s)); }

  void block(const uint8_t* p) {
    static const uint32_t K[64] = {
        0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf,
        0x4787c62a, 0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af,
        0xffff5bb1, 0x895cd7be, 0x6b901122, 0xfd987193, 0xa679438e,
        0x49b40821, 0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
        0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8, 0x21e1cde6,
        0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
        0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122,
        0xfde5380c, 0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
        0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05, 0xd9d4d039,
        0xe6db99e5, 0x1fa27cf8, 0xc4ac5665, 0xf4292244, 0x432aff97,
        0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92, 0xffeff47d,
        0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
        0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
    static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                              7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                              5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                              4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                              6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                              6, 10, 15, 21};
    uint32_t m[16];
    for (int i = 0; i < 16; i++)
      m[i] = p[i * 4] | (p[i * 4 + 1] << 8) | (p[i * 4 + 2] << 16) |
             ((uint32_t)p[i * 4 + 3] << 24);
    uint32_t A = a, B = b, C = c, D = d;
    for (int i = 0; i < 64; i++) {
      uint32_t F;
      int g;
      if (i < 16) { F = (B & C) | (~B & D); g = i; }
      else if (i < 32) { F = (D & B) | (~D & C); g = (5 * i + 1) % 16; }
      else if (i < 48) { F = B ^ C ^ D; g = (3 * i + 5) % 16; }
      else { F = C ^ (B | ~D); g = (7 * i) % 16; }
      uint32_t tmp = D;
      D = C;
      C = B;
      B = B + rol(A + F + K[i] + m[g], S[i]);
      A = tmp;
    }
    a += A; b += B; c += C; d += D;
  }

  void update(const uint8_t* p, size_t n) {
    len += n;
    while (n) {
      size_t take = 64 - fill < n ? 64 - fill : n;
      memcpy(buf + fill, p, take);
      fill += take;
      p += take;
      n -= take;
      if (fill == 64) { block(buf); fill = 0; }
    }
  }

  void digest(uint8_t out[16]) {
    uint64_t bits = len * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t z = 0;
    while (fill != 56) update(&z, 1);
    uint8_t lb[8];
    for (int i = 0; i < 8; i++) lb[i] = (uint8_t)(bits >> (8 * i));
    update(lb, 8);
    uint32_t h[4] = {a, b, c, d};
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++) out[i * 4 + j] = (uint8_t)(h[i] >> (8 * j));
  }
};

std::string md5(const std::string& in) {
  MD5 m;
  m.update((const uint8_t*)in.data(), in.size());
  uint8_t d[16];
  m.digest(d);
  return std::string((const char*)d, 16);
}

// ---------------------------------------------------------------------------
// RC4
// ---------------------------------------------------------------------------

std::string rc4(const std::string& key, const std::string& data) {
  uint8_t S[256];
  for (int i = 0; i < 256; i++) S[i] = (uint8_t)i;
  int j = 0;
  for (int i = 0; i < 256; i++) {
    j = (j + S[i] + (uint8_t)key[i % key.size()]) & 0xFF;
    std::swap(S[i], S[j]);
  }
  std::string out(data.size(), '\0');
  int i = 0;
  j = 0;
  for (size_t k = 0; k < data.size(); k++) {
    i = (i + 1) & 0xFF;
    j = (j + S[i]) & 0xFF;
    std::swap(S[i], S[j]);
    out[k] = (char)((uint8_t)data[k] ^ S[(S[i] + S[j]) & 0xFF]);
  }
  return out;
}

// ---------------------------------------------------------------------------
// AES-128/192/256 decrypt (FIPS-197 inverse cipher) + CBC
// ---------------------------------------------------------------------------

const uint8_t kSBox[256] = {
    0x63,0x7c,0x77,0x7b,0xf2,0x6b,0x6f,0xc5,0x30,0x01,0x67,0x2b,0xfe,0xd7,
    0xab,0x76,0xca,0x82,0xc9,0x7d,0xfa,0x59,0x47,0xf0,0xad,0xd4,0xa2,0xaf,
    0x9c,0xa4,0x72,0xc0,0xb7,0xfd,0x93,0x26,0x36,0x3f,0xf7,0xcc,0x34,0xa5,
    0xe5,0xf1,0x71,0xd8,0x31,0x15,0x04,0xc7,0x23,0xc3,0x18,0x96,0x05,0x9a,
    0x07,0x12,0x80,0xe2,0xeb,0x27,0xb2,0x75,0x09,0x83,0x2c,0x1a,0x1b,0x6e,
    0x5a,0xa0,0x52,0x3b,0xd6,0xb3,0x29,0xe3,0x2f,0x84,0x53,0xd1,0x00,0xed,
    0x20,0xfc,0xb1,0x5b,0x6a,0xcb,0xbe,0x39,0x4a,0x4c,0x58,0xcf,0xd0,0xef,
    0xaa,0xfb,0x43,0x4d,0x33,0x85,0x45,0xf9,0x02,0x7f,0x50,0x3c,0x9f,0xa8,
    0x51,0xa3,0x40,0x8f,0x92,0x9d,0x38,0xf5,0xbc,0xb6,0xda,0x21,0x10,0xff,
    0xf3,0xd2,0xcd,0x0c,0x13,0xec,0x5f,0x97,0x44,0x17,0xc4,0xa7,0x7e,0x3d,
    0x64,0x5d,0x19,0x73,0x60,0x81,0x4f,0xdc,0x22,0x2a,0x90,0x88,0x46,0xee,
    0xb8,0x14,0xde,0x5e,0x0b,0xdb,0xe0,0x32,0x3a,0x0a,0x49,0x06,0x24,0x5c,
    0xc2,0xd3,0xac,0x62,0x91,0x95,0xe4,0x79,0xe7,0xc8,0x37,0x6d,0x8d,0xd5,
    0x4e,0xa9,0x6c,0x56,0xf4,0xea,0x65,0x7a,0xae,0x08,0xba,0x78,0x25,0x2e,
    0x1c,0xa6,0xb4,0xc6,0xe8,0xdd,0x74,0x1f,0x4b,0xbd,0x8b,0x8a,0x70,0x3e,
    0xb5,0x66,0x48,0x03,0xf6,0x0e,0x61,0x35,0x57,0xb9,0x86,0xc1,0x1d,0x9e,
    0xe1,0xf8,0x98,0x11,0x69,0xd9,0x8e,0x94,0x9b,0x1e,0x87,0xe9,0xce,0x55,
    0x28,0xdf,0x8c,0xa1,0x89,0x0d,0xbf,0xe6,0x42,0x68,0x41,0x99,0x2d,0x0f,
    0xb0,0x54,0xbb,0x16};

uint8_t inv_sbox[256];
bool inv_init = [] {
  for (int i = 0; i < 256; i++) inv_sbox[kSBox[i]] = (uint8_t)i;
  return true;
}();

uint8_t xtime(uint8_t x) { return (uint8_t)((x << 1) ^ ((x >> 7) * 0x1b)); }

uint8_t gmul(uint8_t a, uint8_t b) {
  uint8_t p = 0;
  for (int i = 0; i < 8; i++) {
    if (b & 1) p ^= a;
    a = xtime(a);
    b >>= 1;
  }
  return p;
}

struct AES {
  int nr;                 // rounds: 10/12/14
  uint8_t rk[15][16];     // round keys

  explicit AES(const std::string& key) {
    int nk = (int)key.size() / 4;  // words
    nr = nk + 6;
    uint8_t w[60][4];
    for (int i = 0; i < nk; i++)
      for (int j = 0; j < 4; j++) w[i][j] = (uint8_t)key[i * 4 + j];
    uint8_t rcon = 1;
    for (int i = nk; i < 4 * (nr + 1); i++) {
      uint8_t t[4] = {w[i - 1][0], w[i - 1][1], w[i - 1][2], w[i - 1][3]};
      if (i % nk == 0) {
        uint8_t tmp = t[0];
        t[0] = (uint8_t)(kSBox[t[1]] ^ rcon);
        t[1] = kSBox[t[2]];
        t[2] = kSBox[t[3]];
        t[3] = kSBox[tmp];
        rcon = xtime(rcon);
      } else if (nk > 6 && i % nk == 4) {
        for (int j = 0; j < 4; j++) t[j] = kSBox[t[j]];
      }
      for (int j = 0; j < 4; j++) w[i][j] = (uint8_t)(w[i - nk][j] ^ t[j]);
    }
    for (int r = 0; r <= nr; r++)
      for (int c = 0; c < 4; c++)
        for (int j = 0; j < 4; j++) rk[r][c * 4 + j] = w[r * 4 + c][j];
  }

  void decrypt_block(uint8_t* s) const {
    auto add_rk = [&](int r) {
      for (int i = 0; i < 16; i++) s[i] ^= rk[r][i];
    };
    auto inv_shift = [&] {
      uint8_t t[16];
      memcpy(t, s, 16);
      // columns-major state: byte i = col i/4, row i%4; inv shift row r by r
      for (int c = 0; c < 4; c++)
        for (int r = 0; r < 4; r++)
          s[((c + r) % 4) * 4 + r] = t[c * 4 + r];
    };
    auto inv_sub = [&] {
      for (int i = 0; i < 16; i++) s[i] = inv_sbox[s[i]];
    };
    auto inv_mix = [&] {
      for (int c = 0; c < 4; c++) {
        uint8_t* col = s + c * 4;
        uint8_t a0 = col[0], a1 = col[1], a2 = col[2], a3 = col[3];
        col[0] = gmul(a0, 14) ^ gmul(a1, 11) ^ gmul(a2, 13) ^ gmul(a3, 9);
        col[1] = gmul(a0, 9) ^ gmul(a1, 14) ^ gmul(a2, 11) ^ gmul(a3, 13);
        col[2] = gmul(a0, 13) ^ gmul(a1, 9) ^ gmul(a2, 14) ^ gmul(a3, 11);
        col[3] = gmul(a0, 11) ^ gmul(a1, 13) ^ gmul(a2, 9) ^ gmul(a3, 14);
      }
    };
    add_rk(nr);
    for (int r = nr - 1; r > 0; r--) {
      inv_shift();
      inv_sub();
      add_rk(r);
      inv_mix();
    }
    inv_shift();
    inv_sub();
    add_rk(0);
  }
};

std::string aes_cbc_decrypt(const std::string& key, const std::string& in) {
  // in = 16-byte IV + ciphertext; strips PKCS#5 padding
  if (in.size() < 32 || (in.size() % 16) != 0) return "";
  AES aes(key);
  uint8_t prev[16];
  memcpy(prev, in.data(), 16);
  std::string out;
  out.reserve(in.size() - 16);
  for (size_t off = 16; off + 16 <= in.size(); off += 16) {
    uint8_t blk[16];
    memcpy(blk, in.data() + off, 16);
    uint8_t ct[16];
    memcpy(ct, blk, 16);
    aes.decrypt_block(blk);
    for (int i = 0; i < 16; i++) blk[i] ^= prev[i];
    memcpy(prev, ct, 16);
    out.append((const char*)blk, 16);
  }
  if (!out.empty()) {
    uint8_t pad = (uint8_t)out.back();
    if (pad >= 1 && pad <= 16 && pad <= out.size())
      out.resize(out.size() - pad);
  }
  return out;
}

const char kPad[33] =
    "\x28\xBF\x4E\x5E\x4E\x75\x8A\x41\x64\x00\x4E\x56\xFF\xFA\x01\x08"
    "\x2E\x2E\x00\xB6\xD0\x68\x3E\x80\x2F\x0C\xA9\xFE\x64\x53\x69\x7A";

}  // namespace

// ---------------------------------------------------------------------------
// Document integration
// ---------------------------------------------------------------------------

void Document::setup_encryption() {
  if (!trailer_) return;
  auto encit = trailer_->dict.find("Encrypt");
  if (encit == trailer_->dict.end()) return;
  if (encit->second->is(ObjType::Ref))
    encrypt_obj_num_ = encit->second->ref_num;
  // NOTE: encrypted_ stays false while the Encrypt dict / ID are
  // resolved — their strings are stored UNencrypted per spec, and
  // setting the flag early would scramble indirect /O //U //CF values
  // with the not-yet-derived key. The flag is set at every exit below;
  // an unsupported scheme leaves file_key_ empty and load_bytes refuses
  // the document instead of emitting ciphertext garbage.
  ObjPtr enc = resolve(encit->second);
  if (!enc->is(ObjType::Dict)) {
    encrypted_ = true;
    return;
  }
  ObjPtr filter = dict_get(enc, "Filter");
  if (filter->s != "Standard") {
    err_ = "unsupported encryption filter " + filter->s;
    encrypted_ = true;
    return;
  }
  int v = (int)dict_get(enc, "V")->num();
  int r = (int)dict_get(enc, "R")->num();
  int length = (int)dict_get(enc, "Length")->num();
  if (length == 0) length = 40;
  std::string O = dict_get(enc, "O")->s;
  ObjPtr Pv = dict_get(enc, "P");
  uint32_t P = (uint32_t)(int64_t)Pv->num();
  ObjPtr em = dict_get(enc, "EncryptMetadata");
  bool enc_meta = em->is(ObjType::Null) ? true : em->b;

  // crypt filters (V4+): default to RC4 unless AESV2 requested
  enc_aes_ = false;
  if (v >= 4) {
    ObjPtr cf = dict_get(enc, "CF");
    ObjPtr stmf = dict_get(enc, "StmF");
    std::string fname = stmf->is(ObjType::Name) ? stmf->s : "Identity";
    if (fname != "Identity" && cf->is(ObjType::Dict)) {
      ObjPtr f = dict_get(cf, fname);
      ObjPtr cfm = dict_get(f, "CFM");
      if (cfm->s == "AESV2") enc_aes_ = true;
      else if (cfm->s == "AESV3") {
        err_ = "AES-256 (R6) encryption not supported yet";
        encrypted_ = true;
        return;
      }
      ObjPtr cl = dict_get(f, "Length");
      if (!cl->is(ObjType::Null)) {
        int n = (int)cl->num();
        length = n <= 40 ? n * 8 : n;  // some writers store bytes
      }
    }
  }
  if (v == 5 || r >= 5) {
    err_ = "AES-256 (V5) encryption not supported yet";
    encrypted_ = true;
    return;
  }

  // file ID[0]
  std::string id0;
  ObjPtr id = dict_get(trailer_, "ID");
  if (id->is(ObjType::Array) && !id->arr.empty())
    id0 = resolve(id->arr[0])->s;

  // Algorithm 2: empty user password -> file key
  std::string input(kPad, 32);
  input += O.substr(0, 32);
  for (int i = 0; i < 4; i++) input.push_back((char)((P >> (8 * i)) & 0xFF));
  input += id0;
  if (r >= 4 && !enc_meta) input += "\xFF\xFF\xFF\xFF";
  std::string key = md5(input);
  int keylen = r == 2 ? 5 : length / 8;
  if (keylen < 5) keylen = 5;
  if (keylen > 16) keylen = 16;
  if (r >= 3)
    for (int i = 0; i < 50; i++) key = md5(key.substr(0, (size_t)keylen));
  std::string fkey = key.substr(0, (size_t)keylen);

  // Algorithm 6: authenticate the (empty) user password against /U —
  // a wrong password must refuse the document, not decrypt to garbage
  std::string U = dict_get(enc, "U")->s;
  std::string u_check;
  if (r == 2) {
    u_check = rc4(fkey, std::string(kPad, 32));
  } else {
    u_check = rc4(fkey, md5(std::string(kPad, 32) + id0));
    for (int i = 1; i < 20; i++) {
      std::string k2 = fkey;
      for (auto& ch : k2) ch = (char)((uint8_t)ch ^ i);
      u_check = rc4(k2, u_check);
    }
  }
  size_t cmp = r == 2 ? 32 : 16;
  if (U.size() < cmp || memcmp(U.data(), u_check.data(), cmp) != 0) {
    err_ = "document requires a user password";
    encrypted_ = true;
    return;
  }

  file_key_ = fkey;
  encrypt_metadata_ = enc_meta;
  encrypted_ = true;
}

std::string Document::object_key(int num, int gen) const {
  std::string in = file_key_;
  in.push_back((char)(num & 0xFF));
  in.push_back((char)((num >> 8) & 0xFF));
  in.push_back((char)((num >> 16) & 0xFF));
  in.push_back((char)(gen & 0xFF));
  in.push_back((char)((gen >> 8) & 0xFF));
  if (enc_aes_) in += "sAlT";
  std::string k = md5(in);
  size_t n = file_key_.size() + 5;
  if (n > 16) n = 16;
  return k.substr(0, n);
}

std::string Document::decrypt_data(const std::string& data, int num,
                                   int gen) const {
  std::string k = object_key(num, gen);
  return enc_aes_ ? aes_cbc_decrypt(k, data) : rc4(k, data);
}

void Document::decrypt_object(const ObjPtr& o, int num, int gen, int depth) {
  // strings decrypt in place; stream_raw decrypts at decode_stream time
  // (needs obj identity, carried on the Object)
  if (!o || depth > 32) return;
  if (o->is(ObjType::String)) {
    o->s = decrypt_data(o->s, num, gen);
    return;
  }
  for (auto& kv : o->dict) decrypt_object(kv.second, num, gen, depth + 1);
  for (auto& el : o->arr) decrypt_object(el, num, gen, depth + 1);
}

}  // namespace spdf
