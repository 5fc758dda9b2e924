"""Type3 font support (content.cc load_font + op_show_text CharProc
replay): glyphs are PDF content streams in glyph space under FontMatrix.
LaTeX/pdfTeX bitmap-font PDFs and matplotlib's default pdf.fonttype=3
output use these; the reference read them via MuPDF (ref :2731)."""
import io

import numpy as np

from synapta_tpu.io.ingest import open_pdf


def _pdf(objs):
    out = io.BytesIO()
    out.write(b"%PDF-1.7\n")
    offs = [0]
    for i, body in enumerate(objs, 1):
        offs.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xr = out.tell()
    out.write(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1))
    for o in offs[1:]:
        out.write(b"%010d 00000 n \n" % o)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
              % (len(objs) + 1, xr))
    return out.getvalue()


def _stream(extra, data):
    return (b"<< " + extra + b" /Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream")


def _t3_pdf():
    """Type3 font with two glyphs: 'square' (filled box, code 97 = 'a')
    and 'tri' (triangle, code 98 = 'b'), FontMatrix 0.001 scale,
    glyph-space width 600."""
    content = b"BT /F3 48 Tf 72 150 Td (ab) Tj ET\n"
    square = _stream(b"", b"600 0 d0 50 50 500 500 re f\n")
    tri = _stream(b"", b"600 0 d0 50 50 m 550 50 l 300 500 l h f\n")
    font = (b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 600 600] "
            b"/FontMatrix [0.001 0 0 0.001 0 0] "
            b"/CharProcs << /square 6 0 R /tri 7 0 R >> "
            b"/Encoding << /Type /Encoding "
            b"/Differences [97 /square /tri] >> "
            b"/FirstChar 97 /LastChar 98 /Widths [600 600] >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
         b"/Resources << /Font << /F3 5 0 R >> >> /Contents 4 0 R >>"),
        _stream(b"", content),
        font,
        square,
        tri,
    ]
    return _pdf(objs)


def test_type3_glyphs_render(tmp_path):
    p = tmp_path / "t3.pdf"
    p.write_bytes(_t3_pdf())
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)
    dark = (arr < 128).any(axis=-1)
    # glyph 'a' (square): text at (72,150), 48pt font, glyph box
    # [50..500]/1000 em -> x in [74.4, 96], y in [152.4, 174] page pts
    # -> device rows 300-174=126 .. 300-152=148
    assert dark[135, 80] and dark[130, 92]
    # between glyphs: x = 72 + 0.6*48 = 100.8 advance; 'b' starts at 100.8
    # triangle apex ~ (100.8+0.3*48=115.2, 150+0.5*48=174)
    assert dark[145, 112]                 # triangle base
    assert not dark[128, 105]             # apex region left gap is white
    # total ink sanity: both glyphs drew something substantial
    assert int(dark.sum()) > 400


def test_type3_text_extraction(tmp_path):
    """Span text comes from Differences glyph names where AGL-mappable;
    private names like /square fall back without crashing."""
    p = tmp_path / "t3b.pdf"
    p.write_bytes(_t3_pdf())
    doc = open_pdf(str(p))
    spans = doc.page_spans(0)
    assert len(spans) >= 1  # a span was produced with a sane bbox
    bb = spans[0]["bbox"]
    assert bb[2] > bb[0] and bb[3] > bb[1]
