"""CCITT Group 4 fax decode (native/src/ccitt.cc) cross-validated against
libtiff's G4 ENCODER (via PIL): random text-like bitmaps round-trip
pixel-exactly through PIL-G4-encode -> PDF CCITTFaxDecode -> native
decode. The dominant compression of scanned black-and-white textbook
pages (the reference ingested them via PyMuPDF, ref :2731).

Note: PIL/libtiff writes MinIsBlack strips (code-space white == visual
black), so the PDF fixtures declare /BlackIs1 true."""
import io
import struct

import numpy as np
import pytest
from PIL import Image

from synapta_tpu.io.ingest import open_pdf


def _g4_strip(bm: np.ndarray) -> bytes:
    img = Image.fromarray(np.where(bm, 0, 255).astype(np.uint8)).convert("1")
    bio = io.BytesIO()
    img.save(bio, format="TIFF", compression="group4")
    b = bio.getvalue()
    assert b[:2] == b"II"
    u16 = lambda o: struct.unpack_from("<H", b, o)[0]  # noqa: E731
    u32 = lambda o: struct.unpack_from("<I", b, o)[0]  # noqa: E731
    ifd = u32(4)
    tags = {}
    for i in range(u16(ifd)):
        off = ifd + 2 + i * 12
        tag, typ = u16(off), u16(off + 2)
        tags[tag] = u16(off + 8) if typ == 3 else u32(off + 8)
    return b[tags[273]: tags[273] + tags[279]]


def _ccitt_pdf(bm: np.ndarray, g4: bytes) -> bytes:
    H, W = bm.shape

    def stream(extra, data):
        return (b"<< " + extra + b" /Length %d >>\nstream\n" % len(data)
                + data + b"\nendstream")

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        stream(b"", b"q %d 0 0 %d 100 500 cm /Im1 Do Q\n" % (W, H)),
        stream((b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode /DecodeParms "
                b"<< /K -1 /Columns %d /Rows %d /BlackIs1 true >>"
                % (W, H, W, H)), g4),
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
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


def _textlike(h, w, seed):
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), bool)
    for y in range(2, h - 2, 12):
        x = 3
        while x < w - 10:
            seg = int(rng.integers(4, 30))
            if rng.random() > 0.3:
                bm[y:y + 7, x:x + seg] = True
            x += seg + int(rng.integers(3, 8))
    return bm


@pytest.mark.parametrize("h,w,seed", [
    (4, 24, 0),          # trivial (pass/horizontal/vertical modes)
    (96, 200, 3),        # text-like page fragment
    (64, 331, 7),        # non-byte-aligned width
    (128, 1728, 1),      # full fax width
])
def test_g4_roundtrip_pixel_exact(tmp_path, h, w, seed):
    bm = _textlike(h, w, seed)
    p = tmp_path / "c.pdf"
    p.write_bytes(_ccitt_pdf(bm, _g4_strip(bm)))
    doc = open_pdf(str(p))
    arr = doc.decode_image(5)
    assert arr is not None and arr.shape[:2] == (h, w)
    got_black = arr[..., 0] < 128
    assert (got_black == bm).all()


def _bits_to_bytes(bits: str) -> bytes:
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_g3_mixed_2d_rows(tmp_path):
    """K>0 (mixed Group 3 2-D): the tag bit after each EOL selects 1-D vs
    2-D row coding. Hand-assembled stream (MH codes from T.4 tables): row 0
    is 1-D (4 white "1011", 4 black "011", 8 white "10011"); rows 1-3 are
    2-D rows identical to their reference line = three V0 codes ("111").
    The pre-fix decoder skipped the tag and decoded 2-D rows as MH garbage."""
    W, H = 16, 4
    eol = "000000000001"
    bits = eol + "1" + "1011" + "011" + "10011"       # tag=1: 1-D row
    for _ in range(H - 1):
        bits += eol + "0" + "111"                      # tag=0: 2-D row
    data = _bits_to_bytes(bits)

    def stream(extra, payload):
        return (b"<< " + extra + b" /Length %d >>\nstream\n" % len(payload)
                + payload + b"\nendstream")

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        stream(b"", b"q 16 0 0 4 100 500 cm /Im1 Do Q\n"),
        stream((b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode /DecodeParms "
                b"<< /K 4 /Columns %d /Rows %d >>"
                % (W, H, W, H)), data),
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
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
    p = tmp_path / "k4.pdf"
    p.write_bytes(out.getvalue())

    doc = open_pdf(str(p))
    arr = doc.decode_image(5)
    assert arr is not None and arr.shape[:2] == (H, W)
    got_black = arr[..., 0] < 128
    expect = np.zeros((H, W), bool)
    expect[:, 4:8] = True
    assert (got_black == expect).all()


def test_g4_page_renders(tmp_path):
    bm = _textlike(96, 200, 3)
    p = tmp_path / "c.pdf"
    p.write_bytes(_ccitt_pdf(bm, _g4_strip(bm)))
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)
    assert int((arr < 128).any(axis=-1).sum()) > 100


def _jbig2_pdf(bm, mmr: bool = True) -> bytes:
    """PDF embedding a JBIG2 stream: page-info + one immediate generic
    region. mmr=False flips the region to arithmetic coding (which the
    decoder does not support) to exercise the neutral-plate fallback."""
    import struct

    from tests.fontfixtures import _pdf

    H, W = bm.shape
    payload = _g4_strip(bm)  # MMR == G4 (PIL-encoded, independent)

    def seg(num, stype, page, data):
        return (struct.pack(">IB", num, stype) + bytes([0]) +
                bytes([page]) + struct.pack(">I", len(data)) + data)

    pinfo = struct.pack(">IIII", W, H, 0, 0) + bytes([0]) + b"\x00\x00"
    rinfo = struct.pack(">IIII", W, H, 0, 0) + bytes([0])
    greg = rinfo + bytes([1 if mmr else 0]) + payload
    stream = seg(0, 48, 1, pinfo) + seg(1, 38, 1, greg)
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 320 192] "
        b"/Contents 4 0 R /Resources << /XObject << /Im 5 0 R >> >> >>",
        b"<< /Length 36 >>\nstream\nq 320 0 0 192 0 0 cm /Im Do Q"
        b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width " + str(W).encode() +
        b" /Height " + str(H).encode() +
        b" /ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /JBIG2Decode /Length " + str(len(stream)).encode() +
        b" >>\nstream\n" + stream + b"\nendstream",
    ])


def test_jbig2_mmr_generic_region_pixel_exact(tmp_path):
    """JBIG2 MMR-coded generic regions decode to real pixels: the MMR
    payload is CCITT G4 produced by PIL (independent encoder), so the
    entropy layer is cross-validated; only the segment framing is
    first-party. Upgrades the former whole-format neutral-plate
    degrade for scanner output that uses MMR mode."""
    from synapta_tpu.io.ingest import open_pdf

    bm = _textlike(96, 160, 11)
    p = tmp_path / "jbig2.pdf"
    p.write_bytes(_jbig2_pdf(bm, mmr=True))
    d = open_pdf(str(p))
    rgb = d.decode_image(5)
    assert rgb is not None and rgb.shape == (96, 160, 3)
    got = (rgb[:, :, 0] < 128).astype(np.uint8)
    assert (got == bm).all()
    arr = d.render(0, dpi=72)
    assert (np.asarray(arr) < 128).sum() > 100  # ink reaches the page


def test_jbig2_bogus_arithmetic_payload_no_crash(tmp_path):
    """A G4 payload mislabeled as arithmetic-coded (MMR flag cleared)
    decodes as arbitrary-but-bounded MQ noise since round 3 added the
    real arithmetic decoder (tests/test_jbig2.py covers correctness);
    the only contract here is full-size output and no crash."""
    from synapta_tpu.io.ingest import open_pdf

    bm = _textlike(96, 160, 11)
    p = tmp_path / "jbig2a.pdf"
    p.write_bytes(_jbig2_pdf(bm, mmr=False))
    d = open_pdf(str(p))
    rgb = d.decode_image(5)
    assert rgb is not None and rgb.shape == (96, 160, 3)
