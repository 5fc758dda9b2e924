"""ExtGState /BM blend modes + /SMask soft-mask groups (PDF 11.3.5,
11.6.5): Illustrator/InDesign-class figures (vignettes, multiply-shaded
bars, gradient-faded overlays) rely on these; rendering them as Normal/
opaque silently distorts the pixels detection and OCR consume.

Validation is numeric: each blended overlap is asserted against the
spec formula evaluated in numpy (the fixtures are first-party
hand-written PDFs; no local producer emits blend modes to
cross-validate against — same posture as the /ca tests)."""
import numpy as np
import pytest

from synapta_tpu.io.ingest import open_pdf
from tests.test_shading import _page_objs, _pdf, _stream


def _render(tmp_path, objs, name="b.pdf"):
    p = tmp_path / name
    p.write_bytes(_pdf(objs))
    return np.asarray(open_pdf(str(p)).render(0, dpi=72)).astype(np.int32)


def _two_rects(bm, c1=(0.8, 0.2, 0.4), c2=(0.3, 0.6, 0.9), extra=b""):
    """Rect 1 at (50,150..150,250 page) then rect 2 offset +50, painted
    with /BM `bm`. Returns content + resources."""
    content = (
        b"%.2f %.2f %.2f rg 50 150 100 100 re f\n" % c1 +
        b"/E0 gs %.2f %.2f %.2f rg 100 100 100 100 re f\n" % c2)
    res = (b"/ExtGState << /E0 << /BM /" + bm + b" " + extra +
           b" >> >>")
    return _page_objs(content, res)


# sample points (device px, y flipped: page y=200 -> row 100):
# overlap centre page (125,175) -> [125][125]; rect1-only (75,225) ->
# [75][75]; rect2-only (175,125) -> [175][175]
OV, R1, R2 = (125, 125), (75, 75), (175, 175)


def _sep(mode, cb, cs):
    if mode == "Multiply":
        return cb * cs
    if mode == "Screen":
        return cb + cs - cb * cs
    if mode == "Darken":
        return np.minimum(cb, cs)
    if mode == "Lighten":
        return np.maximum(cb, cs)
    if mode == "Difference":
        return np.abs(cb - cs)
    if mode == "Exclusion":
        return cb + cs - 2 * cb * cs
    if mode == "ColorDodge":
        return np.where(cb <= 0, 0.0,
                        np.where(cs >= 1, 1.0,
                                 np.minimum(1.0, cb / (1 - cs))))
    if mode == "ColorBurn":
        return np.where(cb >= 1, 1.0,
                        np.where(cs <= 0, 0.0,
                                 1 - np.minimum(1.0, (1 - cb) / cs)))
    if mode == "HardLight":
        return np.where(cs <= 0.5, cb * 2 * cs,
                        cb + (2 * cs - 1) - cb * (2 * cs - 1))
    if mode == "SoftLight":
        d = np.where(cb <= 0.25, ((16 * cb - 12) * cb + 4) * cb,
                     np.sqrt(cb))
        return np.where(cs <= 0.5, cb - (1 - 2 * cs) * cb * (1 - cb),
                        cb + (2 * cs - 1) * (d - cb))
    raise ValueError(mode)


@pytest.mark.parametrize("mode", [
    "Multiply", "Screen", "Darken", "Lighten", "Difference", "Exclusion",
    "ColorDodge", "ColorBurn", "HardLight", "SoftLight",
])
def test_separable_blend_formula(mode, tmp_path):
    c1 = np.array([0.8, 0.2, 0.4])
    c2 = np.array([0.3, 0.6, 0.9])
    arr = _render(tmp_path, _two_rects(mode.encode()), mode + ".pdf")
    got = arr[OV[0], OV[1]]
    want = np.round(_sep(mode, c1, c2) * 255)
    assert np.abs(got - want).max() <= 3, (mode, got, want)
    # rect-1-only pixels keep the unblended first color
    assert np.abs(arr[R1[0], R1[1]] - np.round(c1 * 255)).max() <= 2
    # rect-2-only pixels blend against the white page backdrop
    want_bg = np.round(_sep(mode, np.ones(3), c2) * 255)
    assert np.abs(arr[R2[0], R2[1]] - want_bg).max() <= 3


def test_nonseparable_luminosity_blend(tmp_path):
    """Luminosity keeps the backdrop's hue and takes the source's
    luminosity (SetLum(Cb, Lum(Cs)))."""
    c1 = np.array([0.8, 0.2, 0.4])
    c2 = np.array([0.5, 0.5, 0.5])
    arr = _render(tmp_path, _two_rects(b"Luminosity", tuple(c1), tuple(c2)))
    lum = lambda c: 0.3 * c[0] + 0.59 * c[1] + 0.11 * c[2]
    d = lum(c2) - lum(c1)
    want = np.clip(c1 + d, 0, 1)  # no clipping path triggered here
    got = arr[OV[0], OV[1]]
    assert np.abs(got - np.round(want * 255)).max() <= 3, (got, want)


def test_unknown_blend_name_falls_back_to_normal(tmp_path):
    arr = _render(tmp_path, _two_rects(b"NotAMode"))
    assert np.abs(arr[OV[0], OV[1]] -
                  np.round(np.array([0.3, 0.6, 0.9]) * 255)).max() <= 2


def test_blend_composes_with_constant_alpha(tmp_path):
    """/BM /Multiply with /ca 0.5: result = dst + (B(dst,src)-dst)*0.5."""
    c1 = np.array([0.8, 0.2, 0.4])
    c2 = np.array([0.3, 0.6, 0.9])
    arr = _render(tmp_path,
                  _two_rects(b"Multiply", extra=b"/ca 0.5"))
    want = np.round((c1 + (c1 * c2 - c1) * 0.5) * 255)
    assert np.abs(arr[OV[0], OV[1]] - want).max() <= 3


def _smask_objs(group_content, fill=b"0 0 0 rg 50 50 200 200 re f",
                smask_extra=b"", after=b""):
    """Page: set a luminosity soft mask whose group paints
    `group_content` into BBox [50 50 250 250], then fill a big rect."""
    content = b"/E0 gs " + fill + b"\n" + after
    res = (b"/ExtGState << /E0 << /SMask << /S /Luminosity /G 5 0 R " +
           smask_extra + b" >> >> /E1 << /SMask /None >> >> "
           b"/Shading << /SH0 6 0 R >>")
    group = _stream(
        b"/Type /XObject /Subtype /Form /BBox [50 50 250 250] "
        b"/Group << /S /Transparency /CS /DeviceGray >> "
        b"/Resources << /Shading << /SH0 6 0 R >> >>", group_content)
    shading = (b"<< /ShadingType 2 /ColorSpace /DeviceGray "
               b"/Coords [50 0 250 0] /Extend [true true] "
               b"/Function << /FunctionType 2 /Domain [0 1] "
               b"/C0 [1] /C1 [0] /N 1 >> >>")
    return _page_objs(content, res, (group, shading))


def test_softmask_luminosity_gradient(tmp_path):
    """A white->black luminosity gradient mask fades a black fill from
    opaque (left) to fully transparent (right)."""
    arr = _render(tmp_path, _smask_objs(b"q 50 50 200 200 re W n /SH0 sh Q\n"))
    row = arr[150]  # page y=150, inside the fill
    # left edge: mask lum ~1 -> black paint; right edge: lum ~0 -> white page
    assert row[60].max() < 40
    assert row[240].min() > 215
    mid = row[150][0]
    assert 90 < mid < 165  # ~half fade
    # monotone fade left->right
    samples = [int(row[x][0]) for x in range(60, 245, 20)]
    assert all(b >= a - 3 for a, b in zip(samples, samples[1:]))


def test_softmask_bbox_limits_paint(tmp_path):
    """Outside the mask group's /BBox the (black-backdrop) mask is 0 —
    paint must not land there even though the fill rect extends past."""
    objs = _smask_objs(b"1 g 50 50 200 200 re f\n",
                       fill=b"0 0 0 rg 20 20 260 260 re f")
    arr = _render(tmp_path, objs)
    assert arr[150, 150].max() < 40   # inside bbox: mask=1, painted
    assert arr[270, 30].min() > 230   # outside bbox: unpainted
    assert arr[30, 270].min() > 230


def test_softmask_none_restores_opaque(tmp_path):
    """/SMask /None in a later ExtGState clears the mask."""
    objs = _smask_objs(
        b"q 50 50 200 200 re W n /SH0 sh Q\n",
        after=b"/E1 gs 0 0 0 rg 120 120 60 60 re f\n")
    arr = _render(tmp_path, objs)
    # the second fill is fully opaque even on the masked-out right side
    assert arr[150, 160].max() < 25


def test_softmask_applies_to_image(tmp_path):
    """Soft masks modulate image XObjects too (vignetted photos)."""
    import zlib

    # 1x1 dark-gray image scaled over the page
    img_px = zlib.compress(bytes([40, 40, 40]))
    img = _stream(
        b"/Type /XObject /Subtype /Image /Width 1 /Height 1 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
        b"/Filter /FlateDecode", img_px)
    content = b"/E0 gs q 200 0 0 200 50 50 cm /Im Do Q\n"
    res = (b"/ExtGState << /E0 << /SMask << /S /Luminosity /G 6 0 R >> "
           b">> >> /XObject << /Im 5 0 R >>")
    group = _stream(
        b"/Type /XObject /Subtype /Form /BBox [50 50 250 250] "
        b"/Group << /S /Transparency /CS /DeviceGray >> "
        b"/Resources << /Shading << /SH0 7 0 R >> >>",
        b"q 50 50 200 200 re W n /SH0 sh Q\n")
    shading = (b"<< /ShadingType 2 /ColorSpace /DeviceGray "
               b"/Coords [50 0 250 0] /Extend [true true] "
               b"/Function << /FunctionType 2 /Domain [0 1] "
               b"/C0 [1] /C1 [0] /N 1 >> >>")
    objs = _page_objs(content, res, (img, group, shading))
    arr = _render(tmp_path, objs)
    row = arr[150]
    assert row[60].max() < 70     # near-opaque image left
    assert row[240].min() > 215   # faded to page right
