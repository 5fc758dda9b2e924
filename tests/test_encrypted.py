"""Encrypted-PDF coverage: the native engine's standard security handler
(crypto.cc — MD5/RC4/AES-128-CBC, empty user password) against fixtures
produced by an INDEPENDENT Python implementation of the PDF 1.7 spec
algorithms (tests/encfixtures.py: hashlib MD5, own RC4, `cryptography`
AES) — the two sides cross-validate each other.

Covers the "owner-locked" encryption class real textbooks ship with,
which the reference read through PyMuPDF (ref :2731)."""
import numpy as np
import pytest

from tests.encfixtures import make_encrypted_pdf

from synapta_tpu.io.ingest import open_pdf


def _open(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    return open_pdf(str(p))


@pytest.mark.parametrize("aes", [False, True], ids=["rc4_v2r3", "aes_v4r4"])
def test_encrypted_text_and_render(tmp_path, aes):
    doc = _open(tmp_path, "enc.pdf", make_encrypted_pdf(aes=aes))
    spans = doc.page_spans(0)
    assert [s["text"] for s in spans] == ["Secret Figure 7"]
    # vector drawing metadata survives stream decryption
    assert len(doc.page_drawings(0)) == 1
    arr = doc.render(0, dpi=72)
    assert int((arr < 128).any(axis=-1).sum()) > 1000


@pytest.mark.parametrize("aes", [False, True], ids=["rc4", "aes"])
def test_encrypted_string_objects(tmp_path, aes):
    """Strings inside encrypted documents decrypt at parse (the content
    text above flows through an encrypted stream; this exercises the
    string path via the same fixture's page tree integrity)."""
    doc = _open(tmp_path, "enc2.pdf", make_encrypted_pdf(
        aes=aes, text="Another (escaped) title"))
    assert [s["text"] for s in doc.page_spans(0)] == [
        "Another (escaped) title"
    ]


def test_detection_on_encrypted_pdf(tmp_path):
    """The full detection stack runs over an encrypted document."""
    from synapta_tpu.config import DetectionConfig
    from synapta_tpu.vision.detect import DetectionEngine

    doc = _open(tmp_path, "enc3.pdf", make_encrypted_pdf(aes=True))
    eng = DetectionEngine(doc, DetectionConfig())
    regions = eng.detect_page(0)
    assert isinstance(regions, list)


def test_real_user_password_refused(tmp_path):
    """A document locked with a NON-empty user password must be refused
    (Algorithm 6 /U authentication), not 'decrypted' into garbage."""
    import hashlib
    import io
    import zlib

    import tests.encfixtures as E

    o = E.compute_o(b"", b"secret", 3, 16)
    id0 = hashlib.md5(b"x").digest()
    fkey = E.file_key(b"secret", o, -44, id0, 3, 16)
    u = E.compute_u(fkey, id0, 3)
    content = zlib.compress(b"BT /F1 24 Tf 72 700 Td (locked) Tj ET\n")
    enc_content = E.encrypt_data(content, fkey, 4, 0, False)

    def stream(extra, data):
        return (b"<< " + extra + b" /Length %d >>\nstream\n" % len(data)
                + data + b"\nendstream")

    def hexs(b):
        return b"<" + b.hex().encode() + b">"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        stream(b"/Filter /FlateDecode", enc_content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        (b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O ")
        + hexs(o) + b" /U " + hexs(u) + b" >>",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.6\n")
    offs = [0]
    for i, body in enumerate(objs, 1):
        offs.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xr = out.tell()
    out.write(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1))
    for off in offs[1:]:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID ["
              % (len(objs) + 1))
    out.write(hexs(id0) + b" " + hexs(id0)
              + b"] >>\nstartxref\n%d\n%%%%EOF\n" % xr)
    p = tmp_path / "locked.pdf"
    p.write_bytes(out.getvalue())
    with pytest.raises(OSError):
        open_pdf(str(p))


# ---------------------------------------------------------------------------
# AES-256 (V5/R6) + password paths
# ---------------------------------------------------------------------------


def test_r6_empty_password_opens(tmp_path):
    """AES-256/R6 with an empty user password (the owner-locked modern
    class) opens without a password and decodes pixel-correct content."""
    from tests.encfixtures import make_encrypted_pdf_r6

    doc = _open(tmp_path, "r6.pdf", make_encrypted_pdf_r6())
    assert [s["text"] for s in doc.page_spans(0)] == ["Secret Figure 9"]
    assert len(doc.page_drawings(0)) == 1
    arr = doc.render(0, dpi=72)
    assert int((arr < 128).any(axis=-1).sum()) > 1000


def test_r6_user_password(tmp_path):
    from tests.encfixtures import make_encrypted_pdf_r6

    data = make_encrypted_pdf_r6(user_pw=b"s3cret", owner_pw=b"admin")
    p = tmp_path / "r6pw.pdf"
    p.write_bytes(data)
    # no password and wrong password refuse cleanly
    with pytest.raises(OSError):
        open_pdf(str(p))
    with pytest.raises(OSError):
        open_pdf(str(p), password="wrong")
    # user password opens
    doc = open_pdf(str(p), password="s3cret")
    assert [s["text"] for s in doc.page_spans(0)] == ["Secret Figure 9"]
    # owner password opens too (hash includes the 48-byte /U)
    doc2 = open_pdf(str(p), password="admin")
    assert [s["text"] for s in doc2.page_spans(0)] == ["Secret Figure 9"]


@pytest.mark.parametrize("aes", [False, True], ids=["rc4_v2r3", "aes_v4r4"])
def test_legacy_user_password(tmp_path, aes):
    """R3/R4 documents locked with a real user password open with that
    password (Algorithm 2/6) and with the owner password (Algorithm 7)."""
    data = make_encrypted_pdf(aes=aes, user_pw=b"upw", owner_pw=b"opw")
    p = tmp_path / "pw.pdf"
    p.write_bytes(data)
    with pytest.raises(OSError):
        open_pdf(str(p))
    with pytest.raises(OSError):
        open_pdf(str(p), password="nope")
    doc = open_pdf(str(p), password="upw")
    assert [s["text"] for s in doc.page_spans(0)] == ["Secret Figure 7"]
    doc2 = open_pdf(str(p), password="opw")
    assert [s["text"] for s in doc2.page_spans(0)] == ["Secret Figure 7"]
