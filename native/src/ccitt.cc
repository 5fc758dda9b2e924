// CCITTFaxDecode (ITU-T T.4/T.6): Group 4 (K<0, 2D) and Group 3 1-D
// (K=0, MH) decoding — the dominant compression of black-and-white
// scanned textbook pages. Output is packed 1-bit rows in PDF photometric
// convention (BlackIs1=false: 0 bits are black).
#include "spdf.h"

#include <cstring>

namespace spdf {

namespace {

struct Code {
  uint16_t bits;  // left-aligned within len
  uint8_t len;
  uint16_t run;
};

// ITU-T T.4 modified-Huffman run-length tables.
const Code kWhite[] = {
    {0b00110101, 8, 0},    {0b000111, 6, 1},     {0b0111, 4, 2},
    {0b1000, 4, 3},        {0b1011, 4, 4},       {0b1100, 4, 5},
    {0b1110, 4, 6},        {0b1111, 4, 7},       {0b10011, 5, 8},
    {0b10100, 5, 9},       {0b00111, 5, 10},     {0b01000, 5, 11},
    {0b001000, 6, 12},     {0b000011, 6, 13},    {0b110100, 6, 14},
    {0b110101, 6, 15},     {0b101010, 6, 16},    {0b101011, 6, 17},
    {0b0100111, 7, 18},    {0b0001100, 7, 19},   {0b0001000, 7, 20},
    {0b0010111, 7, 21},    {0b0000011, 7, 22},   {0b0000100, 7, 23},
    {0b0101000, 7, 24},    {0b0101011, 7, 25},   {0b0010011, 7, 26},
    {0b0100100, 7, 27},    {0b0011000, 7, 28},   {0b00000010, 8, 29},
    {0b00000011, 8, 30},   {0b00011010, 8, 31},  {0b00011011, 8, 32},
    {0b00010010, 8, 33},   {0b00010011, 8, 34},  {0b00010100, 8, 35},
    {0b00010101, 8, 36},   {0b00010110, 8, 37},  {0b00010111, 8, 38},
    {0b00101000, 8, 39},   {0b00101001, 8, 40},  {0b00101010, 8, 41},
    {0b00101011, 8, 42},   {0b00101100, 8, 43},  {0b00101101, 8, 44},
    {0b00000100, 8, 45},   {0b00000101, 8, 46},  {0b00001010, 8, 47},
    {0b00001011, 8, 48},   {0b01010010, 8, 49},  {0b01010011, 8, 50},
    {0b01010100, 8, 51},   {0b01010101, 8, 52},  {0b00100100, 8, 53},
    {0b00100101, 8, 54},   {0b01011000, 8, 55},  {0b01011001, 8, 56},
    {0b01011010, 8, 57},   {0b01011011, 8, 58},  {0b01001010, 8, 59},
    {0b01001011, 8, 60},   {0b00110010, 8, 61},  {0b00110011, 8, 62},
    {0b00110100, 8, 63},
    // makeup
    {0b11011, 5, 64},      {0b10010, 5, 128},    {0b010111, 6, 192},
    {0b0110111, 7, 256},   {0b00110110, 8, 320}, {0b00110111, 8, 384},
    {0b01100100, 8, 448},  {0b01100101, 8, 512}, {0b01101000, 8, 576},
    {0b01100111, 8, 640},  {0b011001100, 9, 704},{0b011001101, 9, 768},
    {0b011010010, 9, 832}, {0b011010011, 9, 896},{0b011010100, 9, 960},
    {0b011010101, 9, 1024},{0b011010110, 9, 1088},{0b011010111, 9, 1152},
    {0b011011000, 9, 1216},{0b011011001, 9, 1280},{0b011011010, 9, 1344},
    {0b011011011, 9, 1408},{0b010011000, 9, 1472},{0b010011001, 9, 1536},
    {0b010011010, 9, 1600},{0b011000, 6, 1664},  {0b010011011, 9, 1728},
};

const Code kBlack[] = {
    {0b0000110111, 10, 0},   {0b010, 3, 1},           {0b11, 2, 2},
    {0b10, 2, 3},            {0b011, 3, 4},           {0b0011, 4, 5},
    {0b0010, 4, 6},          {0b00011, 5, 7},         {0b000101, 6, 8},
    {0b000100, 6, 9},        {0b0000100, 7, 10},      {0b0000101, 7, 11},
    {0b0000111, 7, 12},      {0b00000100, 8, 13},     {0b00000111, 8, 14},
    {0b000011000, 9, 15},    {0b0000010111, 10, 16},  {0b0000011000, 10, 17},
    {0b0000001000, 10, 18},  {0b00001100111, 11, 19}, {0b00001101000, 11, 20},
    {0b00001101100, 11, 21}, {0b00000110111, 11, 22}, {0b00000101000, 11, 23},
    {0b00000010111, 11, 24}, {0b00000011000, 11, 25},
    {0b000011001010, 12, 26},{0b000011001011, 12, 27},
    {0b000011001100, 12, 28},{0b000011001101, 12, 29},
    {0b000001101000, 12, 30},{0b000001101001, 12, 31},
    {0b000001101010, 12, 32},{0b000001101011, 12, 33},
    {0b000011010010, 12, 34},{0b000011010011, 12, 35},
    {0b000011010100, 12, 36},{0b000011010101, 12, 37},
    {0b000011010110, 12, 38},{0b000011010111, 12, 39},
    {0b000001101100, 12, 40},{0b000001101101, 12, 41},
    {0b000011011010, 12, 42},{0b000011011011, 12, 43},
    {0b000001010100, 12, 44},{0b000001010101, 12, 45},
    {0b000001010110, 12, 46},{0b000001010111, 12, 47},
    {0b000001100100, 12, 48},{0b000001100101, 12, 49},
    {0b000001010010, 12, 50},{0b000001010011, 12, 51},
    {0b000000100100, 12, 52},{0b000000110111, 12, 53},
    {0b000000111000, 12, 54},{0b000000100111, 12, 55},
    {0b000000101000, 12, 56},{0b000001011000, 12, 57},
    {0b000001011001, 12, 58},{0b000000101011, 12, 59},
    {0b000000101100, 12, 60},{0b000001011010, 12, 61},
    {0b000001100110, 12, 62},{0b000001100111, 12, 63},
    // makeup
    {0b0000001111, 10, 64},   {0b000011001000, 12, 128},
    {0b000011001001, 12, 192},{0b000001011011, 12, 256},
    {0b000000110011, 12, 320},{0b000000110100, 12, 384},
    {0b000000110101, 12, 448},{0b0000001101100, 13, 512},
    {0b0000001101101, 13, 576},{0b0000001001010, 13, 640},
    {0b0000001001011, 13, 704},{0b0000001001100, 13, 768},
    {0b0000001001101, 13, 832},{0b0000001110010, 13, 896},
    {0b0000001110011, 13, 960},{0b0000001110100, 13, 1024},
    {0b0000001110101, 13, 1088},{0b0000001110110, 13, 1152},
    {0b0000001110111, 13, 1216},{0b0000001010010, 13, 1280},
    {0b0000001010011, 13, 1344},{0b0000001010100, 13, 1408},
    {0b0000001010101, 13, 1472},{0b0000001011010, 13, 1536},
    {0b0000001011011, 13, 1600},{0b0000001100100, 13, 1664},
    {0b0000001100101, 13, 1728},
};

// shared extended makeup codes (1792..2560), valid for both colors
const Code kExt[] = {
    {0b00000001000, 11, 1792},  {0b00000001100, 11, 1856},
    {0b00000001101, 11, 1920},  {0b000000010010, 12, 1984},
    {0b000000010011, 12, 2048}, {0b000000010100, 12, 2112},
    {0b000000010101, 12, 2176}, {0b000000010110, 12, 2240},
    {0b000000010111, 12, 2304}, {0b000000011100, 12, 2368},
    {0b000000011101, 12, 2432}, {0b000000011110, 12, 2496},
    {0b000000011111, 12, 2560},
};

struct BitReader {
  const uint8_t* d;
  size_t n;
  size_t bitpos = 0;

  bool eof() const { return bitpos >= n * 8; }
  int peek(int len) const {
    int v = 0;
    for (int i = 0; i < len; i++) {
      size_t bp = bitpos + i;
      int bit = bp < n * 8 ? (d[bp / 8] >> (7 - bp % 8)) & 1 : 0;
      v = (v << 1) | bit;
    }
    return v;
  }
  void skip(int len) { bitpos += len; }
  void byte_align() { bitpos = (bitpos + 7) & ~size_t(7); }
};

// decode one run of the given color; returns total run length (makeup
// chains) or -1 on invalid code
int read_run(BitReader& br, bool white) {
  int total = 0;
  for (int guard = 0; guard < 64; guard++) {
    const Code* tab = white ? kWhite : kBlack;
    size_t tn = white ? sizeof(kWhite) / sizeof(Code)
                      : sizeof(kBlack) / sizeof(Code);
    int matched_run = -1;
    int matched_len = 0;
    for (size_t i = 0; i < tn; i++) {
      if (br.peek(tab[i].len) == tab[i].bits) {
        matched_run = tab[i].run;
        matched_len = tab[i].len;
        break;
      }
    }
    if (matched_run < 0) {
      for (size_t i = 0; i < sizeof(kExt) / sizeof(Code); i++) {
        if (br.peek(kExt[i].len) == kExt[i].bits) {
          matched_run = kExt[i].run;
          matched_len = kExt[i].len;
          break;
        }
      }
    }
    if (matched_run < 0) return -1;
    br.skip(matched_len);
    total += matched_run;
    if (matched_run < 64 || matched_run % 64 != 0) return total;
    // terminating codes are < 64; makeup codes (multiples of 64) chain
    if (matched_run < 64) return total;
  }
  return total;
}

}  // namespace

std::string ccitt_decode(const std::string& in, int k, int columns, int rows,
                         bool black_is_1, bool byte_align) {
  if (columns <= 0) columns = 1728;
  size_t rowbytes = (size_t)(columns + 7) / 8;
  std::string out;
  BitReader br{(const uint8_t*)in.data(), in.size()};

  // changing-element positions of the reference (previous) line;
  // initial reference line is all white
  std::vector<int> ref{columns, columns};
  std::vector<int> cur;

  auto emit_row = [&](const std::vector<int>& changes) {
    std::string row(rowbytes, black_is_1 ? 0x00 : 0xFF);
    // changes: positions where color flips, starting from white
    bool white = true;
    int x = 0;
    for (size_t ci = 0; ci <= changes.size(); ci++) {
      int next = ci < changes.size() ? changes[ci] : columns;
      if (next > columns) next = columns;
      if (!white) {
        for (int p = x; p < next; p++) {
          // black pixel: bit 0 when BlackIs1=false, else bit 1
          if (black_is_1)
            row[p / 8] |= (char)(0x80 >> (p % 8));
          else
            row[p / 8] &= (char)~(0x80 >> (p % 8));
        }
      }
      x = next;
      white = !white;
      if (x >= columns) break;
    }
    out += row;
  };

  int produced = 0;
  // G4 (k<0) rows are always 2-D. Mixed Group 3 (k>0) rows carry a tag bit
  // after each EOL: 1 = the next row is 1-D (MH), 0 = 2-D (MR, same mode
  // codes as G4). First row of a K>0 stream is 1-D per T.4.
  bool row_2d = k < 0;
  while (!br.eof() && (rows <= 0 || produced < rows)) {
    if (byte_align) br.byte_align();
    // skip any EOL codes (000000000001; K>0 appends the 1-D/2-D tag bit)
    while (br.peek(12) == 1) {
      br.skip(12);
      if (k > 0) {
        row_2d = br.peek(1) == 0;
        br.skip(1);
      }
    }
    if (br.eof()) break;

    cur.clear();
    int a0 = -1;     // last changing element on coding line (start: imaginary)
    bool white = true;
    bool bad = false;

    if (row_2d) {
      // ---- 2-D row (G4 always; G3 K>0 rows tagged 2-D) ----
      while (a0 < columns) {
        // find b1: first change on ref line right of a0 with opposite
        // color of a0's color run... ref holds alternating changes
        // starting with white->black
        int b1 = columns, b2 = columns;
        {
          // ref changes alternate starting from a white run
          size_t i = 0;
          // parity: if current color is white, b1 is a white->black
          // change (even index), else black->white (odd index)
          size_t start = white ? 0 : 1;
          for (i = start; i < ref.size(); i += 1) {
            if (((int)i % 2 == (int)start % 2) && ref[i] > a0) {
              b1 = ref[i];
              b2 = (i + 1) < ref.size() ? ref[i + 1] : columns;
              break;
            }
          }
        }
        // mode decode
        if (br.peek(1) == 1) {                    // V0
          br.skip(1);
          cur.push_back(b1);
          a0 = b1;
          white = !white;
        } else if (br.peek(3) == 0b011) {         // VR1
          br.skip(3);
          cur.push_back(b1 + 1);
          a0 = b1 + 1;
          white = !white;
        } else if (br.peek(3) == 0b010) {         // VL1
          br.skip(3);
          cur.push_back(b1 - 1);
          a0 = b1 - 1;
          white = !white;
        } else if (br.peek(3) == 0b001) {         // Horizontal
          br.skip(3);
          int r1 = read_run(br, white);
          int r2 = read_run(br, !white);
          if (r1 < 0 || r2 < 0) { bad = true; break; }
          int s = a0 < 0 ? 0 : a0;
          cur.push_back(s + r1);
          cur.push_back(s + r1 + r2);
          a0 = s + r1 + r2;
        } else if (br.peek(4) == 0b0001) {        // Pass
          br.skip(4);
          a0 = b2;
        } else if (br.peek(6) == 0b000011) {      // VR2
          br.skip(6);
          cur.push_back(b1 + 2);
          a0 = b1 + 2;
          white = !white;
        } else if (br.peek(6) == 0b000010) {      // VL2
          br.skip(6);
          cur.push_back(b1 - 2);
          a0 = b1 - 2;
          white = !white;
        } else if (br.peek(7) == 0b0000011) {     // VR3
          br.skip(7);
          cur.push_back(b1 + 3);
          a0 = b1 + 3;
          white = !white;
        } else if (br.peek(7) == 0b0000010) {     // VL3
          br.skip(7);
          cur.push_back(b1 - 3);
          a0 = b1 - 3;
          white = !white;
        } else if (br.peek(12) == 1) {            // EOL / EOFB
          bad = true;  // row ends; handled by outer loop
          break;
        } else {
          bad = true;
          break;
        }
        if (a0 >= columns) break;
        if (br.eof()) break;
      }
    } else {
      // ---- Group 3 1-D (MH) row ----
      int x = 0;
      while (x < columns) {
        int r = read_run(br, white);
        if (r < 0) { bad = true; break; }
        x += r;
        cur.push_back(x < columns ? x : columns);
        white = !white;
      }
    }

    if (cur.empty() && bad) break;
    emit_row(cur);
    produced++;
    // the decoded line becomes the reference line
    ref = cur;
    ref.push_back(columns);
    ref.push_back(columns);
  }
  // pad to requested rows with white
  while (rows > 0 && produced < rows) {
    out.append(rowbytes, black_is_1 ? 0x00 : 0xFF);
    produced++;
  }
  return out;
}

}  // namespace spdf
