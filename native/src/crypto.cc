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

// ---------------------------------------------------------------------------
// SHA-256 / SHA-384 / SHA-512 (FIPS 180-4) — needed by the AES-256 (R5/R6)
// password algorithms (ISO 32000-2 Algorithm 2.A/2.B)
// ---------------------------------------------------------------------------

struct SHA256 {
  uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                   0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  uint64_t len = 0;
  uint8_t buf[64];
  size_t fill = 0;

  static uint32_t ror(uint32_t x, int s) { return (x >> s) | (x << (32 - s)); }

  void block(const uint8_t* p) {
    static const uint32_t K[64] = {
        0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b,
        0x59f111f1, 0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01,
        0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7,
        0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
        0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152,
        0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
        0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
        0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
        0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819,
        0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116, 0x1e376c08,
        0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f,
        0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
        0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
      w[i] = ((uint32_t)p[i * 4] << 24) | (p[i * 4 + 1] << 16) |
             (p[i * 4 + 2] << 8) | p[i * 4 + 3];
    for (int i = 16; i < 64; i++) {
      uint32_t s0 = ror(w[i - 15], 7) ^ ror(w[i - 15], 18) ^ (w[i - 15] >> 3);
      uint32_t s1 = ror(w[i - 2], 17) ^ ror(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 64; i++) {
      uint32_t S1 = ror(e, 6) ^ ror(e, 11) ^ ror(e, 25);
      uint32_t ch = (e & f) ^ (~e & g);
      uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      uint32_t S0 = ror(a, 2) ^ ror(a, 13) ^ ror(a, 22);
      uint32_t mj = (a & b) ^ (a & c) ^ (b & c);
      uint32_t t2 = S0 + mj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }

  void update(const uint8_t* p, size_t n) {
    len += n;
    while (n) {
      size_t take = 64 - fill < n ? 64 - fill : n;
      memcpy(buf + fill, p, take);
      fill += take; p += take; n -= take;
      if (fill == 64) { block(buf); fill = 0; }
    }
  }

  void digest(uint8_t out[32]) {
    uint64_t bits = len * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t z = 0;
    while (fill != 56) update(&z, 1);
    uint8_t lb[8];
    for (int i = 0; i < 8; i++) lb[i] = (uint8_t)(bits >> (8 * (7 - i)));
    update(lb, 8);
    for (int i = 0; i < 8; i++)
      for (int j = 0; j < 4; j++)
        out[i * 4 + j] = (uint8_t)(h[i] >> (8 * (3 - j)));
  }
};

std::string sha256(const std::string& in) {
  SHA256 s;
  s.update((const uint8_t*)in.data(), in.size());
  uint8_t d[32];
  s.digest(d);
  return std::string((const char*)d, 32);
}

struct SHA512 {
  // sha384: same compression, different IV, truncated output
  uint64_t h[8];
  uint64_t len = 0;  // byte count (inputs here are tiny)
  uint8_t buf[128];
  size_t fill = 0;

  explicit SHA512(bool is384) {
    static const uint64_t iv512[8] = {
        0x6a09e667f3bcc908ull, 0xbb67ae8584caa73bull, 0x3c6ef372fe94f82bull,
        0xa54ff53a5f1d36f1ull, 0x510e527fade682d1ull, 0x9b05688c2b3e6c1full,
        0x1f83d9abfb41bd6bull, 0x5be0cd19137e2179ull};
    static const uint64_t iv384[8] = {
        0xcbbb9d5dc1059ed8ull, 0x629a292a367cd507ull, 0x9159015a3070dd17ull,
        0x152fecd8f70e5939ull, 0x67332667ffc00b31ull, 0x8eb44a8768581511ull,
        0xdb0c2e0d64f98fa7ull, 0x47b5481dbefa4fa4ull};
    memcpy(h, is384 ? iv384 : iv512, sizeof(h));
  }

  static uint64_t ror(uint64_t x, int s) { return (x >> s) | (x << (64 - s)); }

  void block(const uint8_t* p) {
    static const uint64_t K[80] = {
        0x428a2f98d728ae22ull, 0x7137449123ef65cdull, 0xb5c0fbcfec4d3b2full,
        0xe9b5dba58189dbbcull, 0x3956c25bf348b538ull, 0x59f111f1b605d019ull,
        0x923f82a4af194f9bull, 0xab1c5ed5da6d8118ull, 0xd807aa98a3030242ull,
        0x12835b0145706fbeull, 0x243185be4ee4b28cull, 0x550c7dc3d5ffb4e2ull,
        0x72be5d74f27b896full, 0x80deb1fe3b1696b1ull, 0x9bdc06a725c71235ull,
        0xc19bf174cf692694ull, 0xe49b69c19ef14ad2ull, 0xefbe4786384f25e3ull,
        0x0fc19dc68b8cd5b5ull, 0x240ca1cc77ac9c65ull, 0x2de92c6f592b0275ull,
        0x4a7484aa6ea6e483ull, 0x5cb0a9dcbd41fbd4ull, 0x76f988da831153b5ull,
        0x983e5152ee66dfabull, 0xa831c66d2db43210ull, 0xb00327c898fb213full,
        0xbf597fc7beef0ee4ull, 0xc6e00bf33da88fc2ull, 0xd5a79147930aa725ull,
        0x06ca6351e003826full, 0x142929670a0e6e70ull, 0x27b70a8546d22ffcull,
        0x2e1b21385c26c926ull, 0x4d2c6dfc5ac42aedull, 0x53380d139d95b3dfull,
        0x650a73548baf63deull, 0x766a0abb3c77b2a8ull, 0x81c2c92e47edaee6ull,
        0x92722c851482353bull, 0xa2bfe8a14cf10364ull, 0xa81a664bbc423001ull,
        0xc24b8b70d0f89791ull, 0xc76c51a30654be30ull, 0xd192e819d6ef5218ull,
        0xd69906245565a910ull, 0xf40e35855771202aull, 0x106aa07032bbd1b8ull,
        0x19a4c116b8d2d0c8ull, 0x1e376c085141ab53ull, 0x2748774cdf8eeb99ull,
        0x34b0bcb5e19b48a8ull, 0x391c0cb3c5c95a63ull, 0x4ed8aa4ae3418acbull,
        0x5b9cca4f7763e373ull, 0x682e6ff3d6b2b8a3ull, 0x748f82ee5defb2fcull,
        0x78a5636f43172f60ull, 0x84c87814a1f0ab72ull, 0x8cc702081a6439ecull,
        0x90befffa23631e28ull, 0xa4506cebde82bde9ull, 0xbef9a3f7b2c67915ull,
        0xc67178f2e372532bull, 0xca273eceea26619cull, 0xd186b8c721c0c207ull,
        0xeada7dd6cde0eb1eull, 0xf57d4f7fee6ed178ull, 0x06f067aa72176fbaull,
        0x0a637dc5a2c898a6ull, 0x113f9804bef90daeull, 0x1b710b35131c471bull,
        0x28db77f523047d84ull, 0x32caab7b40c72493ull, 0x3c9ebe0a15c9bebcull,
        0x431d67c49c100d4cull, 0x4cc5d4becb3e42b6ull, 0x597f299cfc657e2aull,
        0x5fcb6fab3ad6faecull, 0x6c44198c4a475817ull};
    uint64_t w[80];
    for (int i = 0; i < 16; i++) {
      w[i] = 0;
      for (int j = 0; j < 8; j++) w[i] = (w[i] << 8) | p[i * 8 + j];
    }
    for (int i = 16; i < 80; i++) {
      uint64_t s0 = ror(w[i - 15], 1) ^ ror(w[i - 15], 8) ^ (w[i - 15] >> 7);
      uint64_t s1 = ror(w[i - 2], 19) ^ ror(w[i - 2], 61) ^ (w[i - 2] >> 6);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint64_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 80; i++) {
      uint64_t S1 = ror(e, 14) ^ ror(e, 18) ^ ror(e, 41);
      uint64_t ch = (e & f) ^ (~e & g);
      uint64_t t1 = hh + S1 + ch + K[i] + w[i];
      uint64_t S0 = ror(a, 28) ^ ror(a, 34) ^ ror(a, 39);
      uint64_t mj = (a & b) ^ (a & c) ^ (b & c);
      uint64_t t2 = S0 + mj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }

  void update(const uint8_t* p, size_t n) {
    len += n;
    while (n) {
      size_t take = 128 - fill < n ? 128 - fill : n;
      memcpy(buf + fill, p, take);
      fill += take; p += take; n -= take;
      if (fill == 128) { block(buf); fill = 0; }
    }
  }

  void digest(uint8_t* out, size_t outlen) {
    uint64_t bits = len * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t z = 0;
    while (fill != 112) update(&z, 1);
    uint8_t lb[16] = {0};  // 128-bit length; high 64 bits zero for our sizes
    for (int i = 0; i < 8; i++) lb[8 + i] = (uint8_t)(bits >> (8 * (7 - i)));
    update(lb, 16);
    for (size_t i = 0; i < outlen; i++)
      out[i] = (uint8_t)(h[i / 8] >> (8 * (7 - i % 8)));
  }
};

std::string sha384(const std::string& in) {
  SHA512 s(true);
  s.update((const uint8_t*)in.data(), in.size());
  uint8_t d[48];
  s.digest(d, 48);
  return std::string((const char*)d, 48);
}

std::string sha512(const std::string& in) {
  SHA512 s(false);
  s.update((const uint8_t*)in.data(), in.size());
  uint8_t d[64];
  s.digest(d, 64);
  return std::string((const char*)d, 64);
}

// AES forward cipher (encryption) — Algorithm 2.B's hardening loop
// encrypts with AES-128-CBC.
struct AESEnc {
  AES ks;  // reuse the key schedule
  explicit AESEnc(const std::string& key) : ks(key) {}

  void encrypt_block(uint8_t* s) const {
    auto add_rk = [&](int r) {
      for (int i = 0; i < 16; i++) s[i] ^= ks.rk[r][i];
    };
    auto shift = [&] {
      uint8_t t[16];
      memcpy(t, s, 16);
      // inverse of inv_shift: row r rotates LEFT by r
      for (int c = 0; c < 4; c++)
        for (int r = 0; r < 4; r++)
          s[c * 4 + r] = t[((c + r) % 4) * 4 + r];
    };
    auto sub = [&] {
      for (int i = 0; i < 16; i++) s[i] = kSBox[s[i]];
    };
    auto mix = [&] {
      for (int c = 0; c < 4; c++) {
        uint8_t* col = s + c * 4;
        uint8_t a0 = col[0], a1 = col[1], a2 = col[2], a3 = col[3];
        col[0] = (uint8_t)(gmul(a0, 2) ^ gmul(a1, 3) ^ a2 ^ a3);
        col[1] = (uint8_t)(a0 ^ gmul(a1, 2) ^ gmul(a2, 3) ^ a3);
        col[2] = (uint8_t)(a0 ^ a1 ^ gmul(a2, 2) ^ gmul(a3, 3));
        col[3] = (uint8_t)(gmul(a0, 3) ^ a1 ^ a2 ^ gmul(a3, 2));
      }
    };
    add_rk(0);
    for (int r = 1; r < ks.nr; r++) {
      sub(); shift(); mix(); add_rk(r);
    }
    sub(); shift(); add_rk(ks.nr);
  }
};

// CBC encrypt, explicit IV, NO padding (input must be a block multiple)
std::string aes_cbc_encrypt_nopad(const std::string& key,
                                  const std::string& iv,
                                  const std::string& in) {
  AESEnc aes(key);
  uint8_t prev[16];
  memcpy(prev, iv.data(), 16);
  std::string out(in.size(), '\0');
  for (size_t off = 0; off + 16 <= in.size(); off += 16) {
    uint8_t blk[16];
    memcpy(blk, in.data() + off, 16);
    for (int i = 0; i < 16; i++) blk[i] ^= prev[i];
    aes.encrypt_block(blk);
    memcpy(prev, blk, 16);
    memcpy(&out[off], blk, 16);
  }
  return out;
}

// CBC decrypt with zero IV, NO padding strip — the UE/OE/Perms entries of
// the AES-256 scheme are encrypted this way (ISO 32000-2, 7.6.4.4.8)
std::string aes_cbc_zero_iv_decrypt(const std::string& key,
                                    const std::string& in) {
  if (in.size() < 16 || in.size() % 16) return "";
  AES aes(key);
  uint8_t prev[16] = {0};
  std::string out(in.size(), '\0');
  for (size_t off = 0; off + 16 <= in.size(); off += 16) {
    uint8_t blk[16], ct[16];
    memcpy(blk, in.data() + off, 16);
    memcpy(ct, blk, 16);
    aes.decrypt_block(blk);
    for (int i = 0; i < 16; i++) blk[i] ^= prev[i];
    memcpy(prev, ct, 16);
    memcpy(&out[off], blk, 16);
  }
  return out;
}

// ISO 32000-2 Algorithm 2.B: the R6 iterated password hash. ``udata`` is
// the 48-byte /U string for the owner-password case, else empty.
std::string hash_2b(const std::string& pw, const std::string& salt,
                    const std::string& udata) {
  std::string K = sha256(pw + salt + udata);
  std::string E;
  for (int i = 0;; i++) {
    std::string k1 = pw + K + udata;
    std::string rep;
    rep.reserve(k1.size() * 64);
    for (int j = 0; j < 64; j++) rep += k1;
    E = aes_cbc_encrypt_nopad(K.substr(0, 16), K.substr(16, 16), rep);
    int mod = 0;
    for (int j = 0; j < 16; j++) mod += (uint8_t)E[j];
    switch (mod % 3) {
      case 0: K = sha256(E); break;
      case 1: K = sha384(E); break;
      default: K = sha512(E); break;
    }
    if (i >= 63 && (uint8_t)E.back() <= (unsigned)(i - 31)) break;
  }
  return K.substr(0, 32);
}

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

  // crypt filters (V4+): default to RC4 unless AESV2/AESV3 requested
  enc_aes_ = false;
  enc_aes256_ = false;
  if (v >= 4) {
    ObjPtr cf = dict_get(enc, "CF");
    ObjPtr stmf = dict_get(enc, "StmF");
    std::string fname = stmf->is(ObjType::Name) ? stmf->s : "Identity";
    if (fname != "Identity" && cf->is(ObjType::Dict)) {
      ObjPtr f = dict_get(cf, fname);
      ObjPtr cfm = dict_get(f, "CFM");
      if (cfm->s == "AESV2") enc_aes_ = true;
      else if (cfm->s == "AESV3") enc_aes_ = enc_aes256_ = true;
      ObjPtr cl = dict_get(f, "Length");
      if (!cl->is(ObjType::Null)) {
        int n = (int)cl->num();
        length = n <= 40 ? n * 8 : n;  // some writers store bytes
      }
    }
  }

  std::string U = dict_get(enc, "U")->s;
  const std::string& pw = password_;

  if (v == 5 || r >= 5) {
    // ---- AES-256 (R5 deprecated / R6): ISO 32000-2 Algorithm 2.A ----
    // /U and /O are 48 bytes: hash[32] + validation salt[8] + key salt[8].
    // The 256-bit file key is recovered by decrypting /UE (user path) or
    // /OE (owner path) with an intermediate key derived from the password.
    enc_aes_ = enc_aes256_ = true;
    std::string UE = dict_get(enc, "UE")->s;
    std::string OE = dict_get(enc, "OE")->s;
    if (U.size() < 48 || O.size() < 48) {
      err_ = "malformed AES-256 encryption dictionary";
      encrypted_ = true;
      return;
    }
    // password is UTF-8, truncated to 127 bytes (SASLprep omitted: ASCII
    // passwords — the practical case — are unaffected)
    std::string p6 = pw.substr(0, 127);
    auto h6 = [&](const std::string& salt, const std::string& ud) {
      return r == 5 ? sha256(p6 + salt + ud) : hash_2b(p6, salt, ud);
    };
    // user password?
    if (h6(U.substr(32, 8), "") == U.substr(0, 32)) {
      std::string ik = h6(U.substr(40, 8), "");
      file_key_ = aes_cbc_zero_iv_decrypt(ik, UE.substr(0, 32));
    } else if (h6(O.substr(32, 8), U.substr(0, 48)) == O.substr(0, 32)) {
      // owner password (hash includes the full 48-byte /U)
      std::string ik = h6(O.substr(40, 8), U.substr(0, 48));
      file_key_ = aes_cbc_zero_iv_decrypt(ik, OE.substr(0, 32));
    } else {
      err_ = pw.empty() ? "document requires a user password"
                        : "wrong password";
      encrypted_ = true;
      return;
    }
    if (file_key_.size() != 32) {
      err_ = "AES-256 file key derivation failed";
      file_key_.clear();
      encrypted_ = true;
      return;
    }
    encrypt_metadata_ = enc_meta;
    encrypted_ = true;
    return;
  }

  // file ID[0]
  std::string id0;
  ObjPtr id = dict_get(trailer_, "ID");
  if (id->is(ObjType::Array) && !id->arr.empty())
    id0 = resolve(id->arr[0])->s;

  // Algorithm 2 inputs: the user password (or empty) padded to 32 bytes
  auto pad32 = [](const std::string& p) {
    std::string s = p.substr(0, 32);
    s.append(kPad, 32 - s.size());
    return s;
  };
  // derive the file key from a padded user-password string (Algorithm 2)
  auto derive = [&](const std::string& upw32) {
    std::string input = upw32;
    input += O.substr(0, 32);
    for (int i = 0; i < 4; i++)
      input.push_back((char)((P >> (8 * i)) & 0xFF));
    input += id0;
    if (r >= 4 && !enc_meta) input += "\xFF\xFF\xFF\xFF";
    std::string key = md5(input);
    int keylen = r == 2 ? 5 : length / 8;
    if (keylen < 5) keylen = 5;
    if (keylen > 16) keylen = 16;
    if (r >= 3)
      for (int i = 0; i < 50; i++) key = md5(key.substr(0, (size_t)keylen));
    return key.substr(0, (size_t)keylen);
  };
  // Algorithm 6 check: does this file key authenticate against /U?
  auto u_ok = [&](const std::string& fkey) {
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
    return U.size() >= cmp && memcmp(U.data(), u_check.data(), cmp) == 0;
  };

  std::string fkey = derive(pad32(pw));
  if (!u_ok(fkey)) {
    // Algorithm 7: try the password as the OWNER password — derive the
    // RC4 key from it, decrypt /O back to the padded user password, and
    // re-run the user path with that.
    bool owner_ok = false;
    if (!pw.empty()) {
      std::string okey = md5(pad32(pw));
      int keylen = r == 2 ? 5 : length / 8;
      if (keylen < 5) keylen = 5;
      if (keylen > 16) keylen = 16;
      if (r >= 3)
        for (int i = 0; i < 50; i++)
          okey = md5(okey.substr(0, (size_t)keylen));
      okey = okey.substr(0, (size_t)keylen);
      std::string upw = O.substr(0, 32);
      if (r == 2) {
        upw = rc4(okey, upw);
      } else {
        for (int i = 19; i >= 0; i--) {
          std::string k2 = okey;
          for (auto& ch : k2) ch = (char)((uint8_t)ch ^ i);
          upw = rc4(k2, upw);
        }
      }
      fkey = derive(upw);
      owner_ok = u_ok(fkey);
    }
    if (!owner_ok) {
      err_ = pw.empty() ? "document requires a user password"
                        : "wrong password";
      encrypted_ = true;
      return;
    }
  }

  file_key_ = fkey;
  encrypt_metadata_ = enc_meta;
  encrypted_ = true;
}

std::string Document::object_key(int num, int gen) const {
  // AES-256 uses the file key for every object (no per-object salting)
  if (enc_aes256_) return file_key_;
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
