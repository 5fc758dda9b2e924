"""Arithmetic-coded JBIG2 round-trip tests.

The native decoder (native/src/jbig2.cc — MQ coder, generic regions
templates 0-3 with TPGDON and adaptive AT pixels, arithmetic symbol
dictionaries + text regions) is validated against the first-party
spec-implemented Python *encoder* in tests/jbig2fixtures.py. The two
sides are independently written from the T.88 procedures in different
languages; see jbig2fixtures.py's module docstring for the shared-
Qe-table caveat (no external JBIG2 toolchain exists here).
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.jbig2fixtures import (
    generic_region_segment,
    jbig2_pdf,
    page_info_segment,
    symbol_dict_segment,
    text_region_segment,
)


def _textlike(h, w, seed):
    r = np.random.default_rng(seed)
    bm = np.zeros((h, w), np.uint8)
    for y in range(4, h - 8, 11):
        for x in range(4, w - 10, 9):
            if r.random() < 0.7:
                bm[y:y + 7, x:x + 6] = (r.random((7, 6)) < 0.85).astype(
                    np.uint8)
    return bm


def _decode(tmp_path, stream, w, h, globals_stream=b""):
    from synapta_tpu.io.ingest import open_pdf

    p = tmp_path / "j.pdf"
    p.write_bytes(jbig2_pdf(stream, w, h, globals_stream=globals_stream))
    return open_pdf(str(p)).decode_image(5)


def _ink(rgb):
    return (rgb[:, :, 0] < 128).astype(np.uint8)


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(template, tpgdon, tmp_path):
    """Arithmetic generic regions decode pixel-exactly for every GB
    template, with and without typical prediction."""
    rng = np.random.default_rng(template * 2 + int(tpgdon))
    for bm in (_textlike(60, 100, template + 1),
               (rng.random((48, 80)) < 0.3).astype(np.uint8)):
        h, w = bm.shape
        stream = page_info_segment(w, h) + generic_region_segment(
            bm, template=template, tpgdon=tpgdon)
        rgb = _decode(tmp_path, stream, w, h)
        assert rgb is not None and rgb.shape == (h, w, 3)
        assert (_ink(rgb) == bm).all()


def test_generic_region_nonnominal_at(tmp_path):
    """Adaptive template pixels at non-nominal positions keep their
    context bit slots (T.88 6.2.5.3) — moved-AT streams round-trip."""
    bm = _textlike(50, 90, 9)
    h, w = bm.shape
    stream = page_info_segment(w, h) + generic_region_segment(
        bm, template=0, at=[(2, -1), (-2, -1), (1, -2), (-1, -2)])
    rgb = _decode(tmp_path, stream, w, h)
    assert (_ink(rgb) == bm).all()


def test_tpgdon_compresses_flat_rows(tmp_path):
    """TPGDON fixture sanity: a bitmap of mostly-repeated rows encodes
    smaller with typical prediction on, and both decode identically."""
    bm = np.zeros((64, 120), np.uint8)
    bm[10:50, 20:100] = 1
    h, w = bm.shape
    seg_on = generic_region_segment(bm, tpgdon=True)
    seg_off = generic_region_segment(bm, tpgdon=False)
    assert len(seg_on) < len(seg_off)
    for seg in (seg_on, seg_off):
        rgb = _decode(tmp_path, page_info_segment(w, h) + seg, w, h)
        assert (_ink(rgb) == bm).all()


def _glyphs():
    out = []
    for i, (gh, gw) in enumerate([(8, 6), (8, 9), (12, 7), (12, 7),
                                  (5, 14)]):
        r = np.random.default_rng(i + 1)
        g = (r.random((gh, gw)) < 0.5).astype(np.uint8)
        g[0, 0] = 1
        g[-1, -1] = 1  # pin extents so expected placement is exact
        out.append(g)
    return out


def _expected_page(export, instances, w, h, refcorner, transposed):
    expect = np.zeros((h, w), np.uint8)
    for sid, s, t in instances:
        b = export[sid]
        bh, bw = b.shape
        if not transposed:
            y0 = t if (refcorner & 1) else t - bh + 1
            x0 = s
        else:
            x0 = t - bw + 1 if (refcorner & 2) else t
            y0 = s
        ys, xs = max(0, y0), max(0, x0)
        ye, xe = min(h, y0 + bh), min(w, x0 + bw)
        if ye > ys and xe > xs:
            expect[ys:ye, xs:xe] |= b[ys - y0:ye - y0, xs - x0:xe - x0]
    return expect


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
@pytest.mark.parametrize("transposed", [False, True])
def test_symbol_text_region_roundtrip(refcorner, transposed, tmp_path):
    """Symbol dictionary + text region (the scanner-text mode): glyphs
    of mixed height classes place pixel-exactly under every reference
    corner, both orientations, multi-strip layout with DS offsets."""
    syms = _glyphs()
    seg_sd, order = symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    W, H = 120, 90
    logsb, dsoff = (2, 3) if refcorner in (1, 2) else (0, 0)
    instances = []
    for strip in range(3):
        t = 20 + strip * 18
        s = 5 + strip * 3
        for k in range(4):
            sid = (strip * 4 + k) % len(export)
            instances.append((sid, s, t + (k % (1 << logsb))))
            s += export[sid].shape[0 if transposed else 1] + 4
    seg_tr = text_region_segment(
        W, H, instances, export, num=2, refs=(1,), refcorner=refcorner,
        transposed=transposed, logsbstrips=logsb, dsoffset=dsoff)
    stream = page_info_segment(W, H, num=0) + seg_sd + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    assert rgb is not None and rgb.shape == (H, W, 3)
    expect = _expected_page(export, instances, W, H, refcorner,
                            transposed)
    assert (_ink(rgb) == expect).all()


def test_symbol_dict_in_globals(tmp_path):
    """The PDF JBIG2Globals stream carries the symbol dictionary (the
    layout Acrobat-family encoders emit: shared dict, per-image text
    regions)."""
    syms = _glyphs()
    seg_sd, order = symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    W, H = 100, 60
    instances = [(i % len(export), 6 + 18 * i, 30) for i in range(5)]
    seg_tr = text_region_segment(W, H, instances, export, num=2,
                                 refs=(1,), refcorner=1)
    stream = page_info_segment(W, H, num=0) + seg_tr
    rgb = _decode(tmp_path, stream, W, H, globals_stream=seg_sd)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert (_ink(rgb) == expect).all()


def test_unsupported_subsets_degrade_to_plate(tmp_path):
    """Refinement/aggregate symbol coding and halftone regions are
    outside the supported subset: the image degrades to the documented
    neutral plate, never silent blankness or garbage."""
    import struct

    W = H = 40
    # SDREFAGG=1 symbol dictionary (refinement/aggregate coding)
    sd_refagg = (struct.pack(">H", 2) + struct.pack(">II", 1, 1))
    from tests.jbig2fixtures import segment

    stream = (page_info_segment(W, H, num=0) +
              segment(1, 0, 1, sd_refagg))
    rgb = _decode(tmp_path, stream, W, H)
    assert rgb is not None and (rgb == 200).all()
    # halftone region (type 22)
    rinfo = struct.pack(">IIII", W, H, 0, 0) + bytes([0])
    stream = (page_info_segment(W, H, num=0) +
              segment(1, 22, 1, rinfo + b"\x00" * 8))
    rgb = _decode(tmp_path, stream, W, H)
    assert rgb is not None and (rgb == 200).all()


def test_truncated_arith_stream_no_crash(tmp_path):
    """Truncating the MQ payload mid-stream must not crash: the decoder
    pads with implicit 0xFF marker bytes and still produces a full-size
    bitmap (content beyond the cut is arbitrary but bounded)."""
    bm = _textlike(60, 100, 5)
    h, w = bm.shape
    seg = generic_region_segment(bm)
    for cut in (len(seg) - 8, len(seg) - 30, 40):
        stream = page_info_segment(w, h) + seg[:cut]
        rgb = _decode(tmp_path, stream, w, h)
        assert rgb is not None  # plate or partial decode, never a crash


def test_arithmetic_page_renders_ink(tmp_path):
    """Full-path check: an arithmetic JBIG2 image placed by the content
    stream reaches the rasterized page as ink."""
    from synapta_tpu.io.ingest import open_pdf

    bm = _textlike(96, 160, 11)
    h, w = bm.shape
    stream = page_info_segment(w, h) + generic_region_segment(bm)
    p = tmp_path / "page.pdf"
    p.write_bytes(jbig2_pdf(stream, w, h))
    d = open_pdf(str(p))
    arr = d.render(0, dpi=72)
    assert (np.asarray(arr) < 128).sum() > 100


# ----------------------------------------------------------- Huffman path

def test_huff_symbol_text_region_roundtrip(tmp_path):
    """Huffman symbol dictionary (uncompressed collective bitmaps) +
    Huffman text region: pixel-exact round-trip with standard tables
    B.1/B.2/B.4 (dict) and B.6/B.8/B.11 (text)."""
    from tests.jbig2fixtures import (
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    syms = _glyphs()
    seg_sd, order = huff_symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    W, H = 120, 90
    instances = []
    for strip in range(3):
        t = 20 + strip * 18
        s = 5 + strip * 3
        for k in range(4):
            sid = (strip * 4 + k) % len(export)
            instances.append((sid, s, t))
            s += export[sid].shape[1] + 4
    seg_tr = huff_text_region_segment(W, H, instances, export, num=2,
                                      refs=(1,), refcorner=1)
    stream = page_info_segment(W, H, num=0) + seg_sd + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    assert rgb is not None and rgb.shape == (H, W, 3)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert (_ink(rgb) == expect).all()


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
@pytest.mark.parametrize("transposed", [False, True])
def test_huff_text_region_corners(refcorner, transposed, tmp_path):
    """Huffman text regions place pixel-exactly under every reference
    corner and both orientations (same contract as the arithmetic path)."""
    from tests.jbig2fixtures import (
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    syms = _glyphs()
    seg_sd, order = huff_symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    W, H = 110, 80
    instances = []
    s = 6
    for i in range(5):
        sid = i % len(export)
        instances.append((sid, s, 30))
        s += export[sid].shape[0 if transposed else 1] + 5
    seg_tr = huff_text_region_segment(
        W, H, instances, export, num=2, refs=(1,), refcorner=refcorner,
        transposed=transposed, dsoffset=2)
    stream = page_info_segment(W, H, num=0) + seg_sd + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    expect = _expected_page(export, instances, W, H, refcorner, transposed)
    assert (_ink(rgb) == expect).all()


def test_huff_symbol_dict_mmr_collective(tmp_path):
    """Huffman symbol dictionary with MMR-coded (CCITT G4) collective
    bitmaps — cross-validated against PIL's independent G4 encoder."""
    from tests.jbig2fixtures import (
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    syms = _glyphs()
    seg_sd, order = huff_symbol_dict_segment(syms, num=1, page=1, mmr=True)
    export = [syms[i] for i in order]
    W, H = 100, 60
    instances = [(i % len(export), 6 + 18 * i, 30) for i in range(5)]
    seg_tr = huff_text_region_segment(W, H, instances, export, num=2,
                                      refs=(1,), refcorner=1)
    stream = page_info_segment(W, H, num=0) + seg_sd + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert (_ink(rgb) == expect).all()


def test_huff_dict_in_globals(tmp_path):
    """Huffman symbol dictionary resident in the PDF JBIG2Globals stream
    (shared-dictionary layout) feeds a per-image Huffman text region."""
    from tests.jbig2fixtures import (
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    syms = _glyphs()
    seg_sd, order = huff_symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    W, H = 100, 60
    instances = [(i % len(export), 6 + 18 * i, 30) for i in range(5)]
    seg_tr = huff_text_region_segment(W, H, instances, export, num=2,
                                      refs=(1,), refcorner=1)
    stream = page_info_segment(W, H, num=0) + seg_tr
    rgb = _decode(tmp_path, stream, W, H, globals_stream=seg_sd)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert (_ink(rgb) == expect).all()


def test_huff_custom_table_segment(tmp_path):
    """A custom code table segment (type 53, Annex B.2 form) drives the
    symbol dictionary's DH decoding (selector 3)."""
    from tests.jbig2fixtures import (
        HuffEnc,
        custom_table_segment,
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    # custom DH table over [0, 16): 2/2/2/3-bit prefixes + 4-bit range
    # lines (Kraft-complete: 3/4 + 1/8 + 2/16 = 1)
    lines = [(2, 2), (2, 2), (2, 2), (3, 2)]
    seg_tab = custom_table_segment(lines, 0, 16, num=8, page=0,
                                   htps=4, htrs=4, lower_len=4,
                                   upper_len=4)
    enc = HuffEnc([(2, 2, 0, 0), (2, 2, 4, 0), (2, 2, 8, 0), (3, 2, 12, 0),
                   (4, 32, -1, 1), (4, 32, 16, 0)])
    syms = _glyphs()
    seg_sd, order = huff_symbol_dict_segment(
        syms, num=1, page=1, sel_dh=3, refs=(8,), custom_dh=enc)
    export = [syms[i] for i in order]
    W, H = 100, 60
    instances = [(i % len(export), 6 + 18 * i, 30) for i in range(5)]
    seg_tr = huff_text_region_segment(W, H, instances, export, num=2,
                                      refs=(1,), refcorner=1)
    stream = (page_info_segment(W, H, num=0) + seg_tab + seg_sd + seg_tr)
    rgb = _decode(tmp_path, stream, W, H)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert (_ink(rgb) == expect).all()
