"""Third-party font/PDF fixtures the repo's own writer can NEVER emit.

Fonts come from fontTools (CFF compiled from Type2 charstrings) and a
hand-rolled Type1 generator (eexec + 4330 charstring encryption per the
Adobe Type1 spec) — then get embedded in hand-assembled classic-xref PDFs.
This exercises the native engine's FontFile3 (CFF), OTTO and FontFile
(Type1) paths against artifacts produced by an independent toolchain
(VERDICT round-1 item 5: "spdf parses a PDF it didn't write").
"""
from __future__ import annotations

import io


# ---------------------------------------------------------------- CFF font

def build_cff_font(glyph_order=("A", "B", "C")):
    """A minimal CFF font (fontTools) whose letters are distinct bar
    shapes: 'A' a full box, 'B' two horizontal bars, 'C' a left bar.
    Returns (bare_cff_bytes, otf_bytes, advance=600)."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.t2CharStringPen import T2CharStringPen

    glyphs = [".notdef"] + list(glyph_order)
    fb = FontBuilder(1000, isTTF=False)
    fb.setupGlyphOrder(glyphs)
    fb.setupCharacterMap({ord(g): g for g in glyph_order})

    def draw(shapes):
        pen = T2CharStringPen(600, None)
        for (x0, y0, x1, y1) in shapes:
            pen.moveTo((x0, y0))
            pen.lineTo((x1, y0))
            pen.lineTo((x1, y1))
            pen.lineTo((x0, y1))
            pen.closePath()
        return pen.getCharString()

    shapes = {
        ".notdef": [],
        "A": [(50, 0, 550, 700)],
        "B": [(50, 0, 550, 250), (50, 450, 550, 700)],
        "C": [(50, 0, 250, 700)],
    }
    fb.setupCFF(
        "TestCFF", {"FullName": "TestCFF"},
        {g: draw(shapes.get(g, [])) for g in glyphs}, {},
    )
    fb.setupHorizontalMetrics({g: (600, 50) for g in glyphs})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "TestCFF", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    bio = io.BytesIO()
    fb.save(bio)
    otf = bio.getvalue()
    cff = fb.font.getTableData("CFF ")
    return cff, otf, 600


# -------------------------------------------------------------- Type1 font

def _t1_encrypt(data: bytes, r: int, lead: int) -> bytes:
    c1, c2 = 52845, 22719
    out = bytearray()
    for b in bytes(lead) + data:
        c = b ^ (r >> 8)
        out.append(c & 0xFF)
        r = ((c + r) * c1 + c2) & 0xFFFF
    return bytes(out)


def _t1_num(v: int) -> bytes:
    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return bytes([255]) + v.to_bytes(4, "big", signed=True)


def _t1_charstring(advance: int, shapes) -> bytes:
    """hsbw + closed rectangle subpaths via rmoveto/rlineto."""
    out = _t1_num(0) + _t1_num(advance) + bytes([13])  # 0 adv hsbw
    x, y = 0, 0
    for (x0, y0, x1, y1) in shapes:
        out += _t1_num(x0 - x) + _t1_num(y0 - y) + bytes([21])  # rmoveto
        out += _t1_num(x1 - x0) + _t1_num(0) + bytes([5])       # rlineto
        out += _t1_num(0) + _t1_num(y1 - y0) + bytes([5])
        out += _t1_num(x0 - x1) + _t1_num(0) + bytes([5])
        out += bytes([9])                                        # closepath
        x, y = x0, y1
    out += bytes([14])  # endchar
    return out


def build_type1_font(glyph_shapes=None, advance=600) -> bytes:
    """A minimal PFA-format Type1 font (hand-assembled, eexec-encrypted)."""
    if glyph_shapes is None:
        glyph_shapes = {
            "D": [(50, 0, 550, 700)],
            "E": [(50, 0, 550, 250), (50, 450, 550, 700)],
            "F": [(50, 0, 250, 700)],
        }
    cs = {".notdef": _t1_charstring(advance, [])}
    for name, shapes in glyph_shapes.items():
        cs[name] = _t1_charstring(advance, shapes)

    private = io.BytesIO()
    private.write(b"dup /Private 8 dict dup begin\n")
    private.write(b"/lenIV 4 def\n")
    private.write(b"/Subrs 0 array def\n")
    private.write(b"end\n")
    private.write(b"/CharStrings %d dict dup begin\n" % len(cs))
    for name, data in cs.items():
        enc = _t1_encrypt(data, 4330, 4)
        private.write(b"/%s %d RD " % (name.encode(), len(enc)))
        private.write(enc)
        private.write(b" ND\n")
    private.write(b"end\nend\nmark currentfile closefile\n")
    eexec_plain = b"XXXX" + private.getvalue()  # 4 throwaway lead bytes
    eexec_enc = _t1_encrypt(eexec_plain[4:], 55665, 4)

    clear = io.BytesIO()
    clear.write(b"%!PS-AdobeFont-1.0: TestT1 001.000\n")
    clear.write(b"/FontName /TestT1 def\n")
    clear.write(b"/Encoding StandardEncoding def\n")
    clear.write(b"/PaintType 0 def /FontType 1 def\n")
    clear.write(b"/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n")
    clear.write(b"currentdict end\ncurrentfile eexec\n")

    hexed = eexec_enc.hex().encode()
    lines = b"\n".join(hexed[i:i + 64] for i in range(0, len(hexed), 64))
    tail = b"\n" + b"0" * 64 + b"\n" + b"cleartomark\n"
    return clear.getvalue() + lines + tail


# ------------------------------------------------------------ PDF assembly

def _pdf(objs) -> bytes:
    """Assemble a classic-xref PDF from 1-based object bodies."""
    out = io.BytesIO()
    out.write(b"%PDF-1.5\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\n" % (len(objs) + 1))
    out.write(b"startxref\n%d\n%%%%EOF\n" % xref)
    return out.getvalue()


def _stream(dict_extra: bytes, data: bytes) -> bytes:
    return (b"<< " + dict_extra + b" /Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream")


def make_cff_pdf(use_otf=False) -> bytes:
    """PDF with text set in an embedded CFF (FontFile3) or OTTO font."""
    cff, otf, adv = build_cff_font()
    if use_otf:
        ff = _stream(b"/Subtype /OpenType", otf)
    else:
        ff = _stream(b"/Subtype /Type1C", cff)
    content = b"BT /F1 24 Tf 72 700 Td (ABC) Tj ET\n"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        _stream(b"", content),
        (b"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
         b"/FirstChar 65 /LastChar 67 /Widths [600 600 600] "
         b"/FontDescriptor 6 0 R >>"),
        (b"<< /Type /FontDescriptor /FontName /TestCFF /Flags 32 "
         b"/FontBBox [0 -200 600 800] /ItalicAngle 0 /Ascent 800 "
         b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile3 7 0 R >>"),
        ff,
    ]
    return _pdf(objs)


def make_type1_pdf() -> bytes:
    """PDF with text set in an embedded Type1 (FontFile) font."""
    t1 = build_type1_font()
    content = b"BT /F1 24 Tf 72 700 Td (DEF) Tj ET\n"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        _stream(b"", content),
        (b"<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
         b"/FirstChar 68 /LastChar 70 /Widths [600 600 600] "
         b"/FontDescriptor 6 0 R >>"),
        (b"<< /Type /FontDescriptor /FontName /TestT1 /Flags 32 "
         b"/FontBBox [0 -200 600 800] /ItalicAngle 0 /Ascent 800 "
         b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile 7 0 R >>"),
        _stream(b"", t1),
    ]
    return _pdf(objs)
