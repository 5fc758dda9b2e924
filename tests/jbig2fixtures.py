"""JBIG2 *encoder* fixtures: a first-party Python implementation of the
T.88 arithmetic coding procedures (Annex E MQ encoder, Annex A integer
encoding), generic-region coding (templates 0-3, AT pixels, TPGDON) and
arithmetic symbol-dictionary / text-region segments.

This is the validation counterpart to native/src/jbig2.cc: no JBIG2
toolchain exists in this environment (no jbig2dec/jbig2enc/mutool/
imagecodecs), so the decoder is validated by exhaustive round-trip
against this independently written encoder. Both sides implement the
published T.88 procedures from scratch in different languages; the one
shared artifact is the 47-entry Qe state table (identical in T.88 and
JPEG 2000) — a wrong transcription there would round-trip yet disagree
with real-world encoders, which is documented as the residual risk in
PARITY.md. Everything else (renorm/byteout/flush logic, context
modeling, segment framing) is structurally independent.
"""
from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQEncoder:
    """T.88 Annex E software-conventions MQ encoder.

    The byte buffer carries a 0x00 sentinel at index 0 standing in for
    the spec's B at BP = BPST - 1; whether the sentinel is part of the
    emitted stream is decided empirically in finish() by round-trip
    (see tests/test_jbig2.py::test_mq_roundtrip_settles_sentinel) —
    the spec's carry rule can increment it, making it significant.
    """

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0x00])

    # context arrays are bytearrays of packed (state_index << 1) | mps
    def encode(self, cxs: bytearray, idx: int, d: int) -> None:
        st = cxs[idx]
        i, mps = st >> 1, st & 1
        qe, nmps, nlps, sw = QE[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                cxs[idx] = (nmps << 1) | mps
                self._renorm()
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                mps ^= 1
            cxs[idx] = (nlps << 1) | mps
            self._renorm()

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry into the previous byte
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def finish(self) -> bytes:
        """FLUSH (E.3.5) and return the stream bytes."""
        # SETBITS: pick the value in [C, C+A) whose trailing bits are
        # all ones, so the truncated stream + the decoder's implicit
        # 0xFF padding stays inside the final interval.
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        # The sentinel at index 0 stood in for B at BPST-1. If no carry
        # reached it, it is still 0x00 and the stream proper starts at
        # index 1; a carry made it significant, so it stays. (Verified
        # by decoder round-trip in the test suite.)
        if self.out[0] == 0x00:
            return bytes(self.out[1:])
        return bytes(self.out)


# ------------------------------------------------------------- int encoding

def new_int_ctx() -> bytearray:
    return bytearray(512)


def _enc_bit(mq: MQEncoder, ctx: bytearray, prev: int, bit: int) -> int:
    mq.encode(ctx, prev, bit)
    if prev < 256:
        return (prev << 1) | bit
    return ((((prev << 1) | bit) & 511) | 256)


def encode_int(mq: MQEncoder, ctx: bytearray, v) -> None:
    """T.88 A.2 inverse. v=None encodes OOB."""
    prev = 1
    if v is None:
        prev = _enc_bit(mq, ctx, prev, 1)  # sign
        prev = _enc_bit(mq, ctx, prev, 0)
        for _ in range(2):
            prev = _enc_bit(mq, ctx, prev, 0)
        return
    s = 1 if v < 0 else 0
    av = -v if v < 0 else v
    prev = _enc_bit(mq, ctx, prev, s)
    if av < 4:
        spec = ([0], 2, 0)
    elif av < 20:
        spec = ([1, 0], 4, 4)
    elif av < 84:
        spec = ([1, 1, 0], 6, 20)
    elif av < 340:
        spec = ([1, 1, 1, 0], 8, 84)
    elif av < 4436:
        spec = ([1, 1, 1, 1, 0], 12, 340)
    else:
        spec = ([1, 1, 1, 1, 1], 32, 4436)
    prefix, nbits, base = spec
    for b in prefix:
        prev = _enc_bit(mq, ctx, prev, b)
    rem = av - base
    for i in range(nbits - 1, -1, -1):
        prev = _enc_bit(mq, ctx, prev, (rem >> i) & 1)


def encode_iaid(mq: MQEncoder, ctx: bytearray, codelen: int,
                value: int) -> None:
    prev = 1
    for i in range(codelen - 1, -1, -1):
        bit = (value >> i) & 1
        mq.encode(ctx, prev, bit)
        prev = (prev << 1) | bit


# --------------------------------------------------------- generic encoding

# Template pixel lists in the spec's context bit order (MSB first) with
# the index of each AT slot; mirrors kGenT in native/src/jbig2.cc but
# transcribed independently from the T.88 6.2.5.3 figures.
GEN_TEMPLATES = {
    0: ([(-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),
         (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [11, 5, 4, 0], 0x9B25),
    1: ([(-1, -2), (0, -2), (1, -2), (2, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
         (-3, 0), (-2, 0), (-1, 0)],
        [9], 0x0795),
    2: ([(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-2, 0), (-1, 0)],
        [7], 0x00E5),
    3: ([(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [5], 0x0195),
}

NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}


def encode_generic(mq: MQEncoder, gbcx: bytearray, bm: np.ndarray,
                   template: int = 0, at=None, tpgdon: bool = False
                   ) -> None:
    """Encode one bitmap (uint8 0/1, shape (h, w)) with the generic
    region procedure. gbcx: caller-owned 1<<16 context bytearray."""
    px, at_slots, tpgd_cx = GEN_TEMPLATES[template]
    px = list(px)
    at = list(at if at is not None else NOMINAL_AT[template])
    for slot, (ax, ay) in zip(at_slots, at):
        px[slot] = (ax, ay)
    h, w = bm.shape

    def get(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(bm[y, x])

    ltp = 0
    for y in range(h):
        if tpgdon:
            same = y > 0 and bool((bm[y] == bm[y - 1]).all()) or (
                y == 0 and not bm[y].any())
            sltp = ltp ^ (1 if same else 0)
            mq.encode(gbcx, tpgd_cx, sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(w):
            cx = 0
            for dx, dy in px:
                cx = (cx << 1) | get(x + dx, y + dy)
            mq.encode(gbcx, cx, int(bm[y, x]))


# ------------------------------------------------------------ segment build

def segment(num: int, stype: int, page: int, data: bytes,
            refs=()) -> bytes:
    """One segment with small (<=4) referred-to list, 1-byte page assoc."""
    assert len(refs) <= 4
    head = struct.pack(">IB", num, stype)
    head += bytes([len(refs) << 5])
    for r in refs:
        assert num <= 256
        head += bytes([r])
    head += bytes([page])
    head += struct.pack(">I", len(data))
    return head + data


def page_info_segment(w: int, h: int, num: int = 0, page: int = 1) -> bytes:
    data = struct.pack(">IIII", w, h, 0, 0) + bytes([0]) + b"\x00\x00"
    return segment(num, 48, page, data)


def generic_region_segment(bm: np.ndarray, num: int = 1, page: int = 1,
                           template: int = 0, at=None,
                           tpgdon: bool = False, x: int = 0, y: int = 0
                           ) -> bytes:
    h, w = bm.shape
    rinfo = struct.pack(">IIII", w, h, x, y) + bytes([0])  # op = OR
    gflags = ((1 if tpgdon else 0) << 3) | (template << 1)  # MMR=0
    at = list(at if at is not None else NOMINAL_AT[template])
    atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
    mq = MQEncoder()
    gbcx = bytearray(1 << 16)
    encode_generic(mq, gbcx, bm, template, at, tpgdon)
    data = rinfo + bytes([gflags]) + atb + mq.finish()
    return segment(num, 38, page, data)  # immediate generic region


def symbol_dict_segment(symbols, num: int = 1, page: int = 0,
                        template: int = 0) -> bytes:
    """Arithmetic symbol dictionary exporting all `symbols` (list of
    uint8 0/1 arrays), encoded in height classes per 6.5.5."""
    at = NOMINAL_AT[template]
    flags = template << 10  # SDHUFF=0 SDREFAGG=0
    atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0], i))
    mq = MQEncoder()
    iadh, iadw, iaex = new_int_ctx(), new_int_ctx(), new_int_ctx()
    gbcx = bytearray(1 << 16)
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        encode_int(mq, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            encode_int(mq, iadw, w - symwidth)
            symwidth = w
            encode_generic(mq, gbcx, symbols[order[i]], template, at,
                           tpgdon=False)
            i += 1
        encode_int(mq, iadw, None)  # OOB ends the height class
    # export all new symbols: run of 0 non-exported, then all exported
    encode_int(mq, iaex, 0)
    encode_int(mq, iaex, len(symbols))
    data = (struct.pack(">H", flags) + atb +
            struct.pack(">II", len(symbols), len(symbols)) + mq.finish())
    return segment(num, 0, page, data), order


def text_region_segment(w: int, h: int, instances, symbols,
                        num: int = 2, page: int = 1, refs=(1,),
                        refcorner: int = 1, transposed: bool = False,
                        logsbstrips: int = 0, dsoffset: int = 0,
                        x: int = 0, y: int = 0,
                        sbrefine: bool = False, rtemplate: int = 0,
                        rat=None) -> bytes:
    """Arithmetic text region placing `instances` = [(sym_id, s, t)]
    where (s, t) is the symbol's reference-corner coordinate per the
    chosen refcorner/transposed mode. Instances are grouped into strips
    by t (quantized by SBSTRIPS). `symbols` is the dictionary's export
    list (the decoder's CURS advance needs each symbol's extent).

    With sbrefine=True, 6-tuples (sym_id, s, t, bitmap, rdx, rdy) place
    `bitmap` as a refinement of symbol sym_id (6.4.11): RDW/RDH are the
    size deltas, (rdx, rdy) the extra offsets on top of floor(RDW/2),
    floor(RDH/2)."""
    nsyms = len(symbols)
    advance = [(b.shape[0] - 1) if transposed else (b.shape[1] - 1)
               for b in symbols]
    sbstrips = 1 << logsbstrips
    rinfo = struct.pack(">IIII", w, h, x, y) + bytes([0])  # op = OR
    flags = (logsbstrips << 2) | (refcorner << 4)
    if transposed:
        flags |= 0x40
    flags |= (dsoffset & 0x1F) << 10
    ratb = b""
    if sbrefine:
        flags |= 2
        flags |= rtemplate << 15
        if rtemplate == 0:
            r = list(rat if rat is not None else NOMINAL_REF_AT)
            ratb = b"".join(struct.pack("bb", ax, ay) for ax, ay in r)
    codelen = 1
    while (1 << codelen) < nsyms:
        codelen += 1

    mq = MQEncoder()
    iadt, iafs, iads, iait = (new_int_ctx(), new_int_ctx(), new_int_ctx(),
                              new_int_ctx())
    iari, iardw, iardh, iardx, iardy = (new_int_ctx(), new_int_ctx(),
                                        new_int_ctx(), new_int_ctx(),
                                        new_int_ctx())
    iaid_cx = bytearray(1 << (codelen + 1))
    grcx = bytearray(1 << 13)

    # group into strips: strip t = (t // sbstrips) * sbstrips
    strips: dict = {}
    for inst in instances:
        t = inst[2]
        strips.setdefault((t // sbstrips) * sbstrips, []).append(inst)
    stript = 0
    encode_int(mq, iadt, 0)  # initial STRIPT = -0 * SBSTRIPS
    firsts = 0
    for st_t in sorted(strips):
        dt, rem = divmod(st_t - stript, sbstrips)
        assert rem == 0
        encode_int(mq, iadt, dt)
        stript = st_t
        row = sorted(strips[st_t], key=lambda inst: inst[1])
        curs = None
        for inst in row:
            sym_id, s, t = inst[0], inst[1], inst[2]
            if curs is None:
                encode_int(mq, iafs, s - firsts)
                firsts = s
                curs = s
            else:
                encode_int(mq, iads, s - curs - dsoffset)
                curs = s
            if sbstrips > 1:
                encode_int(mq, iait, t - stript)
            encode_iaid(mq, iaid_cx, codelen, sym_id)
            if sbrefine and len(inst) == 6:
                bm, rdx, rdy = inst[3], inst[4], inst[5]
                ref = symbols[sym_id]
                rdw = bm.shape[1] - ref.shape[1]
                rdh = bm.shape[0] - ref.shape[0]
                encode_int(mq, iari, 1)
                encode_int(mq, iardw, rdw)
                encode_int(mq, iardh, rdh)
                encode_int(mq, iardx, rdx)
                encode_int(mq, iardy, rdy)
                gdx = (rdw >> 1) + rdx  # python >> floors
                gdy = (rdh >> 1) + rdy
                encode_refinement(mq, grcx, bm, ref, gdx, gdy, rtemplate)
                curs += (bm.shape[0] - 1) if transposed else (
                    bm.shape[1] - 1)
                continue
            if sbrefine:
                encode_int(mq, iari, 0)
            curs += advance[sym_id]
        encode_int(mq, iads, None)  # OOB ends the strip
    data = (rinfo + struct.pack(">H", flags) + ratb +
            struct.pack(">I", len(instances)) + mq.finish())
    return segment(num, 6, page, data, refs=refs)  # immediate text region


# ----------------------------------------------------------------- PDF glue

def jbig2_pdf(stream: bytes, w: int, h: int,
              globals_stream: bytes = b"") -> bytes:
    """A one-page PDF embedding `stream` as a JBIG2Decode image."""
    from tests.fontfixtures import _pdf

    content = b"q 306 0 0 306 100 400 cm /Im Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /XObject << /Im 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n" +
        content + b"\nendstream",
    ]
    img = (b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode() +
           b" /Height " + str(h).encode() +
           b" /ColorSpace /DeviceGray /BitsPerComponent 1 "
           b"/Filter /JBIG2Decode ")
    if globals_stream:
        img += b"/DecodeParms << /JBIG2Globals 6 0 R >> "
    img += (b"/Length " + str(len(stream)).encode() + b" >>\nstream\n" +
            stream + b"\nendstream")
    objs.append(img)
    if globals_stream:
        objs.append(b"<< /Length " + str(len(globals_stream)).encode() +
                    b" >>\nstream\n" + globals_stream + b"\nendstream")
    return _pdf(objs)


# -------------------------------------------------- Huffman encoding (B.*)
#
# First-party encoder for the T.88 Huffman path, mirroring the arithmetic
# half above: standard tables B.1-B.15 transcribed independently of
# native/src/jbig2.cc (the table VALUES are necessarily the same spec
# constants — the shared-artifact residual risk PARITY.md documents for
# the MQ Qe table), canonical assignment per B.3, symbol dictionaries
# with collective bitmaps (6.5.9), text regions with run-coded symbol ID
# tables (7.4.3.1.7).

class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def write_bytes(self, b: bytes) -> None:
        assert self.nbits == 0, "write_bytes requires byte alignment"
        self.out += b

    def tobytes(self) -> bytes:
        self.align()
        return bytes(self.out)


class HuffEnc:
    """Canonical prefix-code table: lines = [(preflen, rangelen, rangelow,
    kind)] with kind 0 normal / 1 lower-range / 2 OOB."""

    def __init__(self, lines) -> None:
        self.lines = lines
        maxlen = max(l[0] for l in lines)
        cnt = [0] * (maxlen + 1)
        for l in lines:
            if l[0] > 0:
                cnt[l[0]] += 1
        fc = 0
        cur = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            fc = (fc + cnt[ln - 1]) << 1
            cur[ln] = fc
        self.codes = []
        for l in lines:
            if l[0] > 0:
                self.codes.append(cur[l[0]])
                cur[l[0]] += 1
            else:
                self.codes.append(None)

    def encode(self, bw: BitWriter, value) -> None:
        if value is None:  # OOB
            for (pl, rl, lo, kind), code in zip(self.lines, self.codes):
                if kind == 2:
                    bw.write(code, pl)
                    return
            raise AssertionError("table has no OOB line")
        for (pl, rl, lo, kind), code in zip(self.lines, self.codes):
            if kind == 2 or pl == 0:
                continue
            if rl == 32:
                if kind == 1 and value <= lo:
                    bw.write(code, pl)
                    bw.write(lo - value, 32)
                    return
                if kind == 0 and value >= lo:
                    bw.write(code, pl)
                    bw.write(value - lo, 32)
                    return
            elif lo <= value < lo + (1 << rl):
                bw.write(code, pl)
                if rl:
                    bw.write(value - lo, rl)
                return
        raise AssertionError(f"value {value} not encodable")


# standard tables used by the fixtures (preflen, rangelen, rangelow, kind)
HUFF_B1 = HuffEnc([(1, 4, 0, 0), (2, 8, 16, 0), (3, 16, 272, 0),
                   (3, 32, 65808, 0)])
HUFF_B2 = HuffEnc([(1, 0, 0, 0), (2, 0, 1, 0), (3, 0, 2, 0), (4, 3, 3, 0),
                   (5, 6, 11, 0), (6, 32, 75, 0), (6, 0, 0, 2)])
HUFF_B3 = HuffEnc([(8, 8, -256, 0), (1, 0, 0, 0), (2, 0, 1, 0),
                   (3, 0, 2, 0), (4, 3, 3, 0), (5, 6, 11, 0),
                   (8, 32, -257, 1), (7, 32, 75, 0), (6, 0, 0, 2)])
HUFF_B4 = HuffEnc([(1, 0, 1, 0), (2, 0, 2, 0), (3, 0, 3, 0), (4, 3, 4, 0),
                   (5, 6, 12, 0), (5, 32, 76, 0)])
HUFF_B5 = HuffEnc([(7, 8, -255, 0), (1, 0, 1, 0), (2, 0, 2, 0),
                   (3, 0, 3, 0), (4, 3, 4, 0), (5, 6, 12, 0),
                   (7, 32, -256, 1), (6, 32, 76, 0)])
HUFF_B6 = HuffEnc([(5, 10, -2048, 0), (4, 9, -1024, 0), (4, 8, -512, 0),
                   (4, 7, -256, 0), (5, 6, -128, 0), (5, 5, -64, 0),
                   (4, 5, -32, 0), (2, 7, 0, 0), (3, 7, 128, 0),
                   (3, 8, 256, 0), (4, 9, 512, 0), (4, 10, 1024, 0),
                   (6, 32, -2049, 1), (6, 32, 2048, 0)])
HUFF_B8 = HuffEnc([(8, 3, -15, 0), (9, 1, -7, 0), (8, 1, -5, 0),
                   (9, 0, -3, 0), (7, 0, -2, 0), (4, 0, -1, 0),
                   (2, 1, 0, 0), (5, 0, 2, 0), (6, 0, 3, 0), (3, 4, 4, 0),
                   (6, 1, 20, 0), (4, 4, 22, 0), (4, 5, 38, 0),
                   (5, 6, 70, 0), (5, 7, 134, 0), (6, 7, 262, 0),
                   (7, 8, 390, 0), (6, 10, 646, 0), (9, 32, -16, 1),
                   (9, 32, 1670, 0), (2, 0, 0, 2)])
HUFF_B11 = HuffEnc([(1, 0, 1, 0), (2, 1, 2, 0), (4, 0, 4, 0), (4, 1, 5, 0),
                    (5, 1, 7, 0), (5, 2, 9, 0), (6, 2, 13, 0),
                    (7, 2, 17, 0), (7, 3, 21, 0), (7, 4, 29, 0),
                    (7, 5, 45, 0), (7, 6, 77, 0), (7, 32, 141, 0)])


def _pack_rows(bm: np.ndarray) -> bytes:
    """Pack a 0/1 bitmap into MSB-first rows (1 = black)."""
    h, w = bm.shape
    rowbytes = (w + 7) // 8
    out = bytearray(rowbytes * h)
    for y in range(h):
        for x in range(w):
            if bm[y, x]:
                out[y * rowbytes + x // 8] |= 0x80 >> (x % 8)
    return bytes(out)


def _g4_bytes(bm: np.ndarray) -> bytes:
    """Raw CCITT G4 (MMR) payload for a 0/1 bitmap via PIL TIFF."""
    import io as _io
    import struct as _struct

    from PIL import Image

    img = Image.fromarray(np.where(bm, 0, 255).astype(np.uint8)).convert("1")
    bio = _io.BytesIO()
    img.save(bio, format="TIFF", compression="group4")
    b = bio.getvalue()
    assert b[:2] == b"II"
    u16 = lambda o: _struct.unpack_from("<H", b, o)[0]  # noqa: E731
    u32 = lambda o: _struct.unpack_from("<I", b, o)[0]  # noqa: E731
    ifd = u32(4)
    tags = {}
    for i in range(u16(ifd)):
        off = ifd + 2 + i * 12
        tag, typ = u16(off), u16(off + 2)
        tags[tag] = u16(off + 8) if typ == 3 else u32(off + 8)
    return b[tags[273]: tags[273] + tags[279]]


def huff_symbol_dict_segment(symbols, num: int = 1, page: int = 0,
                             mmr: bool = False, sel_dh: int = 0,
                             sel_dw: int = 0, refs=(),
                             custom_dh: "HuffEnc" = None):
    """Huffman symbol dictionary (SDHUFF=1) exporting all `symbols`;
    collective bitmaps uncompressed (BMSIZE=0) or MMR. sel_dh/sel_dw pick
    the standard table pair (0: B.4/B.2, 1: B.5/B.3); sel_dh=3 uses
    `custom_dh`, whose type-53 segment must be listed first in `refs`."""
    t_dh = {0: HUFF_B4, 1: HUFF_B5, 3: custom_dh}.get(sel_dh)
    t_dw = {0: HUFF_B2, 1: HUFF_B3}.get(sel_dw)
    assert t_dh is not None and t_dw is not None
    flags = 1 | (sel_dh << 2) | (sel_dw << 4)  # SDHUFFBMSIZE=0 -> B.1
    # B.2 (sel 0) encodes only non-negative width deltas -> widths must
    # be non-decreasing within a height class (B.3 handles negatives)
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0],
                                  symbols[i].shape[1], i))
    bw = BitWriter()
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        t_dh.encode(bw, h - hcheight)
        hcheight = h
        symwidth = 0
        cls = []
        while i < len(order) and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            t_dw.encode(bw, w - symwidth)
            symwidth = w
            cls.append(symbols[order[i]])
            i += 1
        t_dw.encode(bw, None)  # OOB ends the height class
        coll = np.concatenate(cls, axis=1)
        if mmr:
            payload = _g4_bytes(coll)
            HUFF_B1.encode(bw, len(payload))
            bw.align()
            bw.write_bytes(payload)
        else:
            HUFF_B1.encode(bw, 0)
            bw.align()
            bw.write_bytes(_pack_rows(coll))
    # export all new symbols: run of 0 non-exported, then all exported
    HUFF_B1.encode(bw, 0)
    HUFF_B1.encode(bw, len(symbols))
    data = (struct.pack(">H", flags) +
            struct.pack(">II", len(symbols), len(symbols)) + bw.tobytes())
    return segment(num, 0, page, data, refs=refs), order


def huff_text_region_segment(w: int, h: int, instances, symbols,
                             num: int = 2, page: int = 1, refs=(1,),
                             refcorner: int = 1, transposed: bool = False,
                             dsoffset: int = 0, x: int = 0, y: int = 0
                             ) -> bytes:
    """Huffman text region (SBHUFF=1, SBSTRIPS=1) placing `instances` =
    [(sym_id, s, t)]. Standard tables: FS B.6, DS B.8, DT B.11. Symbol
    IDs get equal-length canonical codes via a single 1-bit run code."""
    nsyms = len(symbols)
    advance = [(b.shape[0] - 1) if transposed else (b.shape[1] - 1)
               for b in symbols]
    rinfo = struct.pack(">IIII", w, h, x, y) + bytes([0])  # op = OR
    flags = 1 | (refcorner << 4)  # SBHUFF=1, SBSTRIPS=1
    if transposed:
        flags |= 0x40
    flags |= (dsoffset & 0x1F) << 10
    hflags = 0  # FS sel 0 (B.6), DS sel 0 (B.8), DT sel 0 (B.11)
    symlen = 1
    while (1 << symlen) < nsyms:
        symlen += 1

    bw = BitWriter()
    # 7.4.3.1.7 symbol ID code table: 35 x 4-bit run-code lengths. Every
    # symbol gets code length `symlen`, announced via run code `symlen`
    # which is the only run code in use -> its canonical code is the
    # single bit 0.
    for rc in range(35):
        bw.write(1 if rc == symlen else 0, 4)
    for _ in range(nsyms):
        bw.write(0, 1)  # run code `symlen` once per symbol
    bw.align()

    strips: dict = {}
    for sym_id, s, t in instances:
        strips.setdefault(t, []).append((sym_id, s, t))
    # B.11's value space starts at 1: emit initial STRIPT value 1 (i.e.
    # STRIPT = -1) and let the first strip delta re-reach its T.
    HUFF_B11.encode(bw, 1)
    stript = -1
    firsts = 0
    for st_t in sorted(strips):
        HUFF_B11.encode(bw, st_t - stript)
        stript = st_t
        row = sorted(strips[st_t], key=lambda inst: inst[1])
        curs = None
        for sym_id, s, t in row:
            if curs is None:
                HUFF_B6.encode(bw, s - firsts)
                firsts = s
                curs = s
            else:
                HUFF_B8.encode(bw, s - curs - dsoffset)
                curs = s
            bw.write(sym_id, symlen)
            curs += advance[sym_id]
        HUFF_B8.encode(bw, None)  # OOB ends the strip
    data = (rinfo + struct.pack(">H", flags) + struct.pack(">H", hflags) +
            struct.pack(">I", len(instances)) + bw.tobytes())
    return segment(num, 6, page, data, refs=refs)


def custom_table_segment(lines, htlow: int, hthigh: int, num: int = 10,
                         page: int = 0, htoob: bool = False,
                         htps: int = 8, htrs: int = 8,
                         lower_len: int = 8, upper_len: int = 8,
                         oob_len: int = 8) -> bytes:
    """Custom code table segment (type 53, B.2 form). `lines` =
    [(preflen, rangelen)] covering [htlow, hthigh) contiguously."""
    data = bytearray()
    data.append((1 if htoob else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4))
    data += struct.pack(">ii", htlow, hthigh)
    bw = BitWriter()
    cur = htlow
    for preflen, rangelen in lines:
        bw.write(preflen, htps)
        bw.write(rangelen, htrs)
        cur += 1 << rangelen
    assert cur >= hthigh, "lines must cover [htlow, hthigh)"
    bw.write(lower_len, htps)
    bw.write(upper_len, htps)
    if htoob:
        bw.write(oob_len, htps)
    return segment(num, 53, page, bytes(data) + bw.tobytes())


# ------------------------------------------- refinement encoding (6.3)

# Refinement templates in the spec's context bit order (MSB first):
# coding-layer pixels then reference-layer pixels; template 0 carries
# one adaptive pixel per layer (A1 coding, A2 reference). Mirrors
# decode_refinement in native/src/jbig2.cc but transcribed independently
# from the T.88 6.3.5.3 figures.
REF_TEMPLATES = {
    0: ([(0, -1), (1, -1), (-1, 0), "A1"],
        [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
         (-1, 1), (0, 1), (1, 1), "A2"],
        0x0020),
    1: ([(-1, -1), (0, -1), (1, -1), (-1, 0)],
        [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)],
        0x0008),
}

NOMINAL_REF_AT = [(-1, -1), (-1, -1)]


def encode_refinement(mq: MQEncoder, grcx: bytearray, bm: np.ndarray,
                      ref: np.ndarray, dx: int = 0, dy: int = 0,
                      template: int = 0, at=None,
                      tpgron: bool = False) -> None:
    """Encode `bm` as a generic refinement of `ref` shifted by (dx, dy)
    (T.88 6.3.5). grcx: caller-owned 1<<13 context bytearray. With
    TPGRON, rows where every non-uniform-reference pixel needs coding
    anyway emit LTP transitions exactly like the decoder consumes them:
    a pixel whose 3x3 reference neighbourhood is uniform MUST then equal
    that neighbourhood (the encoder asserts this; pick inputs
    accordingly or keep tpgron=False)."""
    cod, refl, tpgr_cx = REF_TEMPLATES[template]
    a1, a2 = list(at if at is not None else NOMINAL_REF_AT)
    cod = [a1 if p == "A1" else p for p in cod]
    refl = [a2 if p == "A2" else p for p in refl]
    h, w = bm.shape
    rh, rw = ref.shape

    def cur(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(bm[y, x])

    def rget(x, y):
        if x < 0 or y < 0 or x >= rw or y >= rh:
            return 0
        return int(ref[y, x])

    ltp = 0
    for y in range(h):
        if tpgron:
            # LTP on for rows where typical prediction is sound (all
            # uniform-neighbourhood pixels equal their neighbourhood);
            # here: turn it on for every such row to exercise the path.
            want = 1
            for x in range(w):
                s = sum(rget(x - dx + i, y - dy + j)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if (s == 0 and bm[y, x]) or (s == 9 and not bm[y, x]):
                    want = 0
                    break
            sltp = ltp ^ want
            mq.encode(grcx, tpgr_cx, sltp)
            ltp = want
        for x in range(w):
            if ltp:
                s = sum(rget(x - dx + i, y - dy + j)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if s == 0 or s == 9:
                    assert int(bm[y, x]) == (1 if s == 9 else 0)
                    continue
            cx = 0
            for px, py in cod:
                cx = (cx << 1) | cur(x + px, y + py)
            for px, py in refl:
                cx = (cx << 1) | rget(x - dx + px, y - dy + py)
            mq.encode(grcx, cx, int(bm[y, x]))


def refinement_region_segment(target: np.ndarray, num: int = 3,
                              page: int = 1, x: int = 0, y: int = 0,
                              reference: np.ndarray = None,
                              template: int = 0, at=None,
                              tpgron: bool = False) -> bytes:
    """Generic refinement region segment (type 40/42/43): refines the
    page content under the region box into `target`. `reference` is
    what the page holds there when the segment executes (the caller
    composed it with earlier segments)."""
    h, w = target.shape
    assert reference is not None and reference.shape == (h, w)
    rinfo = struct.pack(">IIII", w, h, x, y) + bytes([0])
    rflags = (1 if tpgron else 0) << 1 | template
    atb = b""
    if template == 0:
        a = list(at if at is not None else NOMINAL_REF_AT)
        atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in a)
    mq = MQEncoder()
    grcx = bytearray(1 << 13)
    encode_refinement(mq, grcx, target, reference, 0, 0, template,
                      at, tpgron)
    data = rinfo + bytes([rflags]) + atb + mq.finish()
    return segment(num, 42, page, data)  # immediate refinement region


def symbol_dict_refagg_segment(new_syms, insym_shapes, num: int = 2,
                               page: int = 0, refs=(1,),
                               template: int = 0, rtemplate: int = 0,
                               rat=None) -> bytes:
    """Symbol dictionary with SDREFAGG=1: every new symbol is a
    refinement (REFAGGNINST == 1) of an already-known one.
    `new_syms` = [(bitmap, ref_id, rdx, rdy, ref_bitmap)] where ref_id
    indexes input symbols then earlier new symbols, and ref_bitmap is
    that symbol's pixels (the encoder needs them for context).
    `insym_shapes` = count of input symbols imported from `refs`.
    Exports only the new symbols. Symbols must be pre-sorted by height
    (height-class coding)."""
    flags = 2 | (template << 10) | (rtemplate << 12)  # SDHUFF=0 SDREFAGG=1
    at = NOMINAL_AT[template]
    atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
    ratb = b""
    if rtemplate == 0:
        r = list(rat if rat is not None else NOMINAL_REF_AT)
        ratb = b"".join(struct.pack("bb", ax, ay) for ax, ay in r)
    num_new = len(new_syms)
    total = insym_shapes + num_new
    codelen = 1
    while (1 << codelen) < total:
        codelen += 1

    mq = MQEncoder()
    iadh, iadw, iaex, iaai = (new_int_ctx(), new_int_ctx(), new_int_ctx(),
                              new_int_ctx())
    iardx, iardy = new_int_ctx(), new_int_ctx()
    iaid_cx = bytearray(1 << (codelen + 1))
    grcx = bytearray(1 << 13)

    hcheight = 0
    i = 0
    while i < num_new:
        h = new_syms[i][0].shape[0]
        encode_int(mq, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < num_new and new_syms[i][0].shape[0] == h:
            bm, ref_id, rdx, rdy, ref_bm = new_syms[i]
            w = bm.shape[1]
            encode_int(mq, iadw, w - symwidth)
            symwidth = w
            encode_int(mq, iaai, 1)  # REFAGGNINST
            encode_iaid(mq, iaid_cx, codelen, ref_id)
            encode_int(mq, iardx, rdx)
            encode_int(mq, iardy, rdy)
            encode_refinement(mq, grcx, bm, ref_bm, rdx, rdy, rtemplate)
            i += 1
        encode_int(mq, iadw, None)
    # export only the new symbols: skip the inputs, export the rest
    encode_int(mq, iaex, insym_shapes)
    encode_int(mq, iaex, num_new)
    data = (struct.pack(">H", flags) + atb + ratb +
            struct.pack(">II", num_new, num_new) + mq.finish())
    return segment(num, 0, page, data, refs=refs)


# --------------------------------------- pattern dict + halftone (6.7)

def pattern_dict_segment(patterns, num: int = 1, page: int = 0,
                         template: int = 0, mmr: bool = False) -> bytes:
    """Pattern dictionary (type 16): `patterns` = list of equal-shape
    uint8 0/1 arrays; encodes the collective bitmap with
    AT1 = (-HDPW, 0) per 6.7.5 (or MMR/G4 when mmr=True — PIL's
    independent G4 encoder, cross-validating ccitt.cc)."""
    hdph, hdpw = patterns[0].shape
    for p in patterns:
        assert p.shape == (hdph, hdpw)
    coll = np.concatenate(patterns, axis=1)
    if mmr:
        payload = _g4_bytes(coll)
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)][: 4 if template == 0
                                                       else 1]
        mq = MQEncoder()
        gbcx = bytearray(1 << 16)
        encode_generic(mq, gbcx, coll, template, at, tpgdon=False)
        payload = mq.finish()
    data = (bytes([(1 if mmr else 0) | (template << 1)]) +
            bytes([hdpw, hdph]) +
            struct.pack(">I", len(patterns) - 1) + payload)
    return segment(num, 16, page, data)


def halftone_region_segment(grayvals: np.ndarray, patterns,
                            w: int, h: int, num: int = 2, page: int = 1,
                            refs=(1,), x: int = 0, y: int = 0,
                            gx: int = 0, gy: int = 0,
                            rx: int = 256, ry: int = 0,
                            combop: int = 0, defpixel: int = 0,
                            template: int = 0) -> bytes:
    """Halftone region (type 20/22/23): encodes `grayvals` (HGH, HGW)
    as Gray-coded bitplanes (C.5, MSB first, one shared coder+contexts)
    selecting from `patterns`. Grid: cell (m, n) lands at
    ((gx + m*ry + n*rx) >> 8, (gy + m*rx - n*ry) >> 8)."""
    hgh, hgw = grayvals.shape
    npats = len(patterns)
    assert grayvals.max() < npats
    bits = 0
    while (1 << bits) < npats:
        bits += 1
    at = [(3 if template <= 1 else 2, -1), (-3, -1), (2, -2),
          (-2, -2)][: 4 if template == 0 else 1]
    mq = MQEncoder()
    gbcx = bytearray(1 << 16)
    # gray-code planes: g_{J-1} = bit_{J-1}; g_j = bit_j XOR g_{j+1}
    prev = None
    for j in range(bits - 1, -1, -1):
        bit = (grayvals >> j) & 1
        plane = bit if prev is None else (bit ^ prev)
        encode_generic(mq, gbcx, plane.astype(np.uint8), template, at,
                       tpgdon=False)
        prev = bit
    rinfo = struct.pack(">IIII", w, h, x, y) + bytes([0])
    hflags = (template << 1) | (combop << 4) | (defpixel << 7)
    data = (rinfo + bytes([hflags]) +
            struct.pack(">IIiiHH", hgw, hgh, gx, gy, rx, ry) + mq.finish())
    return segment(num, 22, page, data, refs=refs)
