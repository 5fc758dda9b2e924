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
