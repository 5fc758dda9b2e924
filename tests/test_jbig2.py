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
    """The remaining out-of-subset forms (Huffman + refinement/aggregate
    dictionaries, MMR and HENABLESKIP halftone regions) degrade to the
    documented neutral plate, never silent blankness or garbage."""
    import struct

    W = H = 40
    from tests.jbig2fixtures import segment

    # SDHUFF=1 + SDREFAGG=1 symbol dictionary (Huffman refinement)
    sd_huffref = (struct.pack(">H", 3) + struct.pack(">II", 1, 1))
    stream = (page_info_segment(W, H, num=0) +
              segment(1, 0, 1, sd_huffref))
    rgb = _decode(tmp_path, stream, W, H)
    assert rgb is not None and (rgb == 200).all()
    # halftone regions: HMMR=1 and HENABLESKIP=1 forms
    rinfo = struct.pack(">IIII", W, H, 0, 0) + bytes([0])
    for hflags in (0x01, 0x08):
        ht = rinfo + bytes([hflags]) + struct.pack(">IIiiHH",
                                                   4, 4, 0, 0, 256, 0)
        stream = (page_info_segment(W, H, num=0) +
                  segment(1, 22, 1, ht))
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


# ----------------------------------------- refinement + halftone (round 4)

@pytest.mark.parametrize("template", [0, 1])
@pytest.mark.parametrize("tpgron", [False, True])
def test_refinement_region_roundtrip(template, tpgron, tmp_path):
    """Generic refinement region (type 42): the page content decodes,
    then a refinement segment REPLACEs it with a corrected bitmap —
    pixel-exact for both GR templates, with and without typical
    prediction."""
    from tests.jbig2fixtures import refinement_region_segment

    base = _textlike(48, 80, 21 + template)
    h, w = base.shape
    rng = np.random.default_rng(3 + template + 2 * int(tpgron))
    target = base.copy()
    target[rng.integers(0, h, 25), rng.integers(0, w, 25)] ^= 1
    target[30:38, 60:70] = 1  # a blob the base lacks entirely
    stream = (page_info_segment(w, h) +
              generic_region_segment(base, num=1) +
              refinement_region_segment(target, num=2, reference=base,
                                        template=template, tpgron=tpgron))
    rgb = _decode(tmp_path, stream, w, h)
    assert rgb is not None and (_ink(rgb) == target).all()


def test_refinement_region_nonnominal_at(tmp_path):
    """Template-0 refinement with moved adaptive pixels (A1 coding,
    A2 reference) keeps its context slots."""
    from tests.jbig2fixtures import refinement_region_segment

    base = _textlike(40, 64, 31)
    h, w = base.shape
    target = base.copy()
    target[10:20, 10:30] ^= 1
    at = [(2, -1), (-2, 1)]
    stream = (page_info_segment(w, h) +
              generic_region_segment(base, num=1) +
              refinement_region_segment(target, num=2, reference=base,
                                        template=0, at=at))
    rgb = _decode(tmp_path, stream, w, h)
    assert (_ink(rgb) == target).all()


@pytest.mark.parametrize("rtemplate", [0, 1])
def test_symbol_dict_refagg_roundtrip(rtemplate, tmp_path):
    """SDREFAGG=1 symbol dictionary: every new symbol decodes as a
    refinement (REFAGGNINST == 1) of an input-dictionary symbol at
    nonzero (RDX, RDY), then places through a text region."""
    from tests.jbig2fixtures import symbol_dict_refagg_segment

    syms = _glyphs()
    seg1, order = symbol_dict_segment(syms, num=1, page=1)
    base = [syms[i] for i in order]
    rng = np.random.default_rng(7 + rtemplate)
    new = []
    for i, b in enumerate(base):
        t = b.copy()
        t[rng.integers(0, t.shape[0], 6), rng.integers(0, t.shape[1], 6)] ^= 1
        new.append((t, i, (i % 3) - 1, i % 2))  # rdx -1..1, rdy 0..1
    new.sort(key=lambda e: e[0].shape[0])  # height-class order
    enc = [(t, rid, rdx, rdy, base[rid]) for t, rid, rdx, rdy in new]
    seg2 = symbol_dict_refagg_segment(enc, insym_shapes=len(base), num=2,
                                      page=1, refs=(1,),
                                      rtemplate=rtemplate)
    export = [e[0] for e in enc]
    W, H = 140, 80
    instances = [(i % len(export), 5 + 20 * i, 40) for i in range(6)]
    seg_tr = text_region_segment(W, H, instances, export, num=3, refs=(2,))
    stream = page_info_segment(W, H, num=0) + seg1 + seg2 + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    expect = _expected_page(export, instances, W, H, 1, False)
    assert rgb is not None and (_ink(rgb) == expect).all()


@pytest.mark.parametrize("rtemplate", [0, 1])
def test_text_region_refined_instances(rtemplate, tmp_path):
    """Text region with SBREFINE: refined instances (6.4.11) place a
    per-instance refinement of the dictionary symbol, including size
    deltas (RDW/RDH) and offsets (RDX/RDY); plain instances interleave."""
    syms = _glyphs()
    seg_sd, order = symbol_dict_segment(syms, num=1, page=1)
    export = [syms[i] for i in order]
    rng = np.random.default_rng(11 + rtemplate)
    W, H = 150, 70
    instances = []
    placed = []  # (bitmap, s, t) for the expectation
    s = 5
    for i in range(6):
        sid = i % len(export)
        ref = export[sid]
        if i % 2 == 0:
            bm = np.zeros((ref.shape[0] + 2, ref.shape[1] + 1), np.uint8)
            bm[1:1 + ref.shape[0], : ref.shape[1]] = ref
            bm[rng.integers(0, bm.shape[0], 5),
               rng.integers(0, bm.shape[1], 5)] ^= 1
            instances.append((sid, s, 30, bm, 1, -1))
            placed.append((bm, s, 30))
            s += bm.shape[1] + 5
        else:
            instances.append((sid, s, 30))
            placed.append((ref, s, 30))
            s += ref.shape[1] + 5
    seg_tr = text_region_segment(W, H, instances, export, num=2,
                                 refs=(1,), sbrefine=True,
                                 rtemplate=rtemplate)
    stream = page_info_segment(W, H, num=0) + seg_sd + seg_tr
    rgb = _decode(tmp_path, stream, W, H)
    expect = np.zeros((H, W), np.uint8)
    for bm, ps, pt in placed:  # refcorner 1 = top-left
        bh, bw = bm.shape
        expect[pt:pt + bh, ps:ps + bw] |= bm[: max(0, H - pt),
                                             : max(0, W - ps)]
    assert rgb is not None and (_ink(rgb) == expect).all()


@pytest.mark.parametrize("mmr", [False, True])
def test_pattern_dict_halftone_roundtrip(mmr, tmp_path):
    """Pattern dictionary + halftone region: Gray-coded bitplanes select
    per-cell patterns along an axis-aligned grid — pixel-exact vs a
    numpy re-composition (MMR collective cross-checks ccitt.cc against
    PIL's independent G4 encoder)."""
    from tests.jbig2fixtures import (
        halftone_region_segment,
        pattern_dict_segment,
    )

    rng = np.random.default_rng(5 + int(mmr))
    pats = []
    for k in range(5):  # distinctive densities AND shapes
        p = np.zeros((6, 6), np.uint8)
        p.flat[rng.permutation(36)[: k * 8]] = 1
        pats.append(p)
    grid = rng.integers(0, 5, (8, 10)).astype(np.uint16)
    W, H = 10 * 6, 8 * 6
    seg_pd = pattern_dict_segment(pats, num=1, page=1, mmr=mmr)
    seg_ht = halftone_region_segment(grid, pats, W, H, num=2, refs=(1,),
                                     rx=6 * 256, ry=0)
    stream = page_info_segment(W, H, num=0) + seg_pd + seg_ht
    rgb = _decode(tmp_path, stream, W, H)
    expect = np.zeros((H, W), np.uint8)
    for m in range(8):
        for n in range(10):
            expect[m * 6:(m + 1) * 6, n * 6:(n + 1) * 6] |= pats[grid[m, n]]
    assert rgb is not None and (_ink(rgb) == expect).all()


def test_halftone_skewed_grid(tmp_path):
    """Halftone grid vectors with a skew component (HRY != 0) place
    cells on the rotated lattice of 6.6.5.2."""
    from tests.jbig2fixtures import (
        halftone_region_segment,
        pattern_dict_segment,
    )

    rng = np.random.default_rng(9)
    pats = []
    for k in range(4):
        p = np.zeros((4, 4), np.uint8)
        p.flat[rng.permutation(16)[: k * 5]] = 1
        pats.append(p)
    grid = rng.integers(0, 4, (6, 6)).astype(np.uint16)
    W, H = 60, 60
    gx, gy, rx, ry = 2 * 256, 8 * 256, 4 * 256 + 64, 96
    seg_pd = pattern_dict_segment(pats, num=1, page=1)
    seg_ht = halftone_region_segment(grid, pats, W, H, num=2, refs=(1,),
                                     gx=gx, gy=gy, rx=rx, ry=ry)
    stream = page_info_segment(W, H, num=0) + seg_pd + seg_ht
    rgb = _decode(tmp_path, stream, W, H)
    expect = np.zeros((H, W), np.uint8)
    for m in range(6):
        for n in range(6):
            x = (gx + m * ry + n * rx) >> 8
            y = (gy + m * rx - n * ry) >> 8
            pb = pats[grid[m, n]]
            ys, xs = max(0, y), max(0, x)
            ye, xe = min(H, y + 4), min(W, x + 4)
            if ye > ys and xe > xs:
                expect[ys:ye, xs:xe] |= pb[ys - y:ye - y, xs - x:xe - x]
    assert rgb is not None and (_ink(rgb) == expect).all()
