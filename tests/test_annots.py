"""Annotation appearance streams (native/src/content.cc ContentEngine::run).

fitz renders /Annots by default in get_pixmap — the reference's render
path (ref pdf_image_segmentation.py:3651) — so stamps, FreeText boxes,
and widget appearances are part of the page pixels. These fixtures are
hand-assembled; the /Rect<->/BBox/Matrix fitting assertions are computed
independently from the PDF 32000-1 12.5.5 algorithm in the test body.
"""
import io
import os

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


def _annot_page(annot_dicts, extra_objs=(), contents=b""):
    """Page 300x300 whose /Annots are the given dict bodies; appearance
    form objects (and anything else) go in extra_objs starting at 5 0 R."""
    refs = b" ".join(b"%d 0 R" % (5 + len(extra_objs) + k)
                     for k in range(len(annot_dicts)))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
         b"/Resources << >> /Contents 4 0 R /Annots [" + refs + b"] >>"),
        _stream(b"", contents),
    ]
    objs.extend(extra_objs)
    objs.extend(annot_dicts)
    return objs


def _form(bbox, content, matrix=None, extra=b""):
    m = b"" if matrix is None else (b" /Matrix [" + matrix + b"]")
    return _stream(
        b"/Type /XObject /Subtype /Form /BBox [" + bbox + b"]" + m + extra,
        content)


RED_FILL = b"1 0 0 rg 0 0 10 10 re f\n"


def test_square_annot_ap_renders_at_rect(tmp_path):
    """A /Square annot's /AP /N form (BBox 10x10, identity Matrix) is
    scaled onto /Rect [100 100 200 150]: red exactly there, white outside."""
    form = _form(b"0 0 10 10", RED_FILL)
    annot = (b"<< /Type /Annot /Subtype /Square /Rect [100 100 200 150] "
             b"/AP << /N 5 0 R >> >>")
    p = tmp_path / "sq.pdf"
    p.write_bytes(_pdf(_annot_page([annot], extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # page y [100,150] -> device rows [150,200) with the y-flip
    inside = arr[160:190, 110:190]
    assert (inside[..., 0] > 200).all() and (inside[..., 2] < 60).all()
    assert (arr[120, 150] > 240).all()  # above the rect: white
    assert (arr[250, 150] > 240).all()  # below: white
    assert (arr[175, 50] > 240).all()   # left: white


def test_annot_matrix_bbox_fitting(tmp_path):
    """12.5.5: BBox corners go through /Matrix, the transformed extent is
    fitted onto /Rect. A 90-degree Matrix on a 40x10 BBox still fills the
    20x80 Rect completely."""
    form = _form(b"0 0 40 10", b"0 0 1 rg 0 0 40 10 re f\n",
                 matrix=b"0 1 -1 0 0 0")
    annot = (b"<< /Type /Annot /Subtype /Stamp /Rect [50 50 70 130] "
             b"/AP << /N 5 0 R >> >>")
    p = tmp_path / "mx.pdf"
    p.write_bytes(_pdf(_annot_page([annot], extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # rect y [50,130] -> rows [170,250); x [50,70)
    inside = arr[175:245, 53:67]
    assert (inside[..., 2] > 200).all() and (inside[..., 0] < 60).all()
    assert (arr[175, 80] > 240).all()


def test_hidden_and_noview_flags_skip(tmp_path):
    """F bit 2 (Hidden) and bit 6 (NoView) suppress painting."""
    form = _form(b"0 0 10 10", RED_FILL)
    mk = lambda f: (b"<< /Type /Annot /Subtype /Square /F %d "
                    b"/Rect [100 100 200 150] /AP << /N 5 0 R >> >>" % f)
    for flags in (2, 32):
        p = tmp_path / ("f%d.pdf" % flags)
        p.write_bytes(_pdf(_annot_page([mk(flags)], extra_objs=[form])))
        arr = open_pdf(str(p)).render(0, dpi=72)
        assert (arr > 240).all()
    # sanity: flags 4 (Print) still paints
    p = tmp_path / "f4.pdf"
    p.write_bytes(_pdf(_annot_page([mk(4)], extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr[175, 150][0] > 200) and (arr[175, 150][2] < 60)


def test_ap_substate_selected_by_as(tmp_path):
    """/AP /N as a dict of substates: /AS picks the one to paint (the
    checkbox-widget shape). Missing /AS with >1 substates paints nothing."""
    on = _form(b"0 0 10 10", RED_FILL)
    off = _form(b"0 0 10 10", b"")  # empty appearance
    base = (b"<< /Type /Annot /Subtype /Widget /Rect [100 100 200 150] "
            b"/AP << /N << /On 5 0 R /Off 6 0 R >> >>")
    for as_name, painted in ((b" /AS /On >>", True), (b" /AS /Off >>", False),
                             (b" >>", False)):
        p = tmp_path / "as.pdf"
        p.write_bytes(_pdf(_annot_page([base + as_name],
                                       extra_objs=[on, off])))
        arr = open_pdf(str(p)).render(0, dpi=72)
        px = arr[175, 150]
        if painted:
            assert px[0] > 200 and px[2] < 60
        else:
            assert (px > 240).all()


def test_link_and_popup_never_painted(tmp_path):
    """Links/popups are navigation chrome, not page ink (MuPDF skips them
    in fz_run_page_annots), even when they carry an /AP."""
    form = _form(b"0 0 10 10", RED_FILL)
    annots = [
        (b"<< /Type /Annot /Subtype /Link /Rect [100 100 200 150] "
         b"/AP << /N 5 0 R >> >>"),
        (b"<< /Type /Annot /Subtype /Popup /Rect [20 20 80 80] "
         b"/AP << /N 5 0 R >> >>"),
    ]
    p = tmp_path / "ln.pdf"
    p.write_bytes(_pdf(_annot_page(annots, extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr > 240).all()


def test_bbox_clips_appearance_content(tmp_path):
    """The form's /BBox clips its content (PDF 8.10.1): ink drawn outside
    the BBox must not leak outside the fitted /Rect."""
    # content paints a 30x30 square but BBox is 10x10 -> only the BBox
    # portion appears, scaled onto Rect
    form = _form(b"0 0 10 10", b"1 0 0 rg 0 0 30 30 re f\n")
    annot = (b"<< /Type /Annot /Subtype /Square /Rect [100 100 200 150] "
             b"/AP << /N 5 0 R >> >>")
    p = tmp_path / "clip.pdf"
    p.write_bytes(_pdf(_annot_page([annot], extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr[175, 150][0] > 200)       # inside rect painted
    assert (arr[175, 220] > 240).all()    # right of rect: clipped
    assert (arr[130, 150] > 240).all()    # above rect (higher y): clipped


def test_annot_without_ap_is_graceful(tmp_path):
    """AP-less annotations with no ink to synthesize (no /C //IC colors,
    no /QuadPoints) paint nothing and never crash; degenerate /Rect or
    /BBox forms are skipped."""
    annots = [
        b"<< /Type /Annot /Subtype /Square /Rect [100 100 200 150] >>",
        b"<< /Type /Annot /Subtype /Highlight /Rect [0 0 10 10] "
        b"/AP << >> >>",
        # degenerate rect + bbox forms
        b"<< /Type /Annot /Subtype /Square /Rect [100 100 100 100] "
        b"/AP << /N 5 0 R >> >>",
    ]
    form = _form(b"0 0 0 0", RED_FILL)
    p = tmp_path / "noap.pdf"
    p.write_bytes(_pdf(_annot_page(annots, extra_objs=[form])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr > 240).all()


def test_annot_over_page_content_composites(tmp_path):
    """Annotation ink paints OVER the page content (annots run after the
    content stream), matching fitz z-order."""
    form = _form(b"0 0 10 10", RED_FILL)
    annot = (b"<< /Type /Annot /Subtype /Stamp /Rect [100 100 200 150] "
             b"/AP << /N 5 0 R >> >>")
    # page content: full-page black fill
    p = tmp_path / "z.pdf"
    p.write_bytes(_pdf(_annot_page([annot], extra_objs=[form],
                                   contents=b"0 0 0 rg 0 0 300 300 re f\n")))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert arr[175, 150][0] > 200          # annot red wins inside rect
    assert (arr[250, 150] < 40).all()      # black page elsewhere

# ---------------------------------------------------------------------------
# Appearance SYNTHESIS for annots without /AP (MuPDF pdf_appearance.c
# class of behavior): the engine builds the ink from the annotation
# dictionary's geometry/color entries. Expected pixels below are derived
# by hand from the fixtures (page 300x300 at 72 dpi -> device row =
# 300 - page_y).
# ---------------------------------------------------------------------------


def test_synth_square_border_and_interior(tmp_path):
    """Square without /AP: /C border stroked at /BS /W inset to stay
    inside /Rect, /IC interior filled."""
    annot = (b"<< /Type /Annot /Subtype /Square /Rect [100 100 200 150] "
             b"/C [1 0 0] /IC [0 0 1] /BS << /W 4 >> >>")
    p = tmp_path / "sq.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # left border band: stroke width 4 centered at x=102
    assert arr[175, 102][0] > 180 and arr[175, 102][2] < 80
    # top border: page y=148 -> device row 152
    assert arr[152, 150][0] > 180 and arr[152, 150][2] < 80
    inside = arr[160:190, 110:190]
    assert (inside[..., 2] > 180).all() and (inside[..., 0] < 80).all()
    assert (arr[175, 95] > 240).all()   # outside: white
    assert (arr[140, 150] > 240).all()  # above rect


def test_synth_circle_fill_misses_corners(tmp_path):
    """Circle without /AP: /IC fills the inscribed ellipse; /Rect corners
    stay unpainted (it is an ellipse, not the rect)."""
    annot = (b"<< /Type /Annot /Subtype /Circle /Rect [100 100 200 200] "
             b"/IC [0 1 0] >>")
    p = tmp_path / "ci.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    c = arr[150, 150]  # center: green fill
    assert c[1] > 180 and c[0] < 80 and c[2] < 80
    assert (arr[195, 105] > 240).all()  # rect corner: outside the ellipse
    assert (arr[105, 195] > 240).all()


def test_synth_line_and_ink(tmp_path):
    """Line strokes /L with /C at /BS /W; Ink strokes each /InkList
    polyline."""
    annots = [
        (b"<< /Type /Annot /Subtype /Line /Rect [40 40 260 260] "
         b"/L [50 50 250 250] /C [0 0 1] /BS << /W 3 >> >>"),
        (b"<< /Type /Annot /Subtype /Ink /Rect [40 40 260 260] "
         b"/InkList [[50 250 250 250]] /C [0 1 0] /BS << /W 3 >> >>"),
    ]
    p = tmp_path / "li.pdf"
    p.write_bytes(_pdf(_annot_page(annots)))
    arr = open_pdf(str(p)).render(0, dpi=72)
    mid = arr[150, 150]  # line midpoint (150,150)
    assert mid[2] > 180 and mid[0] < 80
    assert (arr[150, 180] > 240).all()  # off the diagonal
    ink = arr[50, 150]  # ink stroke at page y=250 -> row 50
    assert ink[1] > 150 and ink[0] < 100
    assert (arr[60, 150] > 240).all()


def test_synth_highlight_multiplies(tmp_path):
    """Highlight without /AP fills its /QuadPoints AABBs with /C through
    a Multiply blend: white turns yellow, black page ink stays black
    (how real highlighters and MuPDF's synthesized highlights behave)."""
    # bottom strip (page y<100) painted black by the page content
    annot = (b"<< /Type /Annot /Subtype /Highlight /Rect [50 50 250 150] "
             b"/C [1 1 0] "
             b"/QuadPoints [50 150 250 150 50 50 250 50] >>")
    p = tmp_path / "hl.pdf"
    p.write_bytes(_pdf(_annot_page(
        [annot], contents=b"0 0 0 rg 0 0 300 100 re f\n")))
    arr = open_pdf(str(p)).render(0, dpi=72)
    over_white = arr[175, 150]  # page y=125: white * yellow = yellow
    assert over_white[0] > 200 and over_white[1] > 200 and over_white[2] < 60
    over_black = arr[225, 150]  # page y=75: black * yellow = black
    assert (over_black < 60).all()
    assert (arr[130, 150] > 240).all()  # above the quad: untouched white


def test_synth_markup_opacity_ca(tmp_path):
    """/CA markup opacity applies to synthesized ink: a half-alpha red
    fill over white blends to pink."""
    annot = (b"<< /Type /Annot /Subtype /Square /Rect [100 100 200 150] "
             b"/IC [1 0 0] /CA 0.5 >>")
    p = tmp_path / "ca.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    px = arr[175, 150]
    assert px[0] > 240                 # red stays saturated
    assert 90 < px[1] < 170 and 90 < px[2] < 170  # half-blended with white


def test_synth_strikeout_underline_squiggly(tmp_path):
    """Text-markup lines land in the right zone of each quad: StrikeOut
    mid-height, Underline near the bottom, Squiggly wiggles at the
    bottom; the rest of the quad stays white."""
    quads = b"/QuadPoints [100 140 200 140 100 100 200 100]"
    mk = lambda sub: (b"<< /Type /Annot /Subtype /" + sub +
                      b" /Rect [100 100 200 140] /C [1 0 0] " + quads + b" >>")
    # StrikeOut: y = 100 + 40*0.45 = 118 -> row 182
    p = tmp_path / "so.pdf"
    p.write_bytes(_pdf(_annot_page([mk(b"StrikeOut")])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert arr[182, 150][0] > 180 and arr[182, 150][1] < 100
    assert (arr[165, 150] > 240).all() and (arr[195, 150] > 240).all()
    # Underline: y ~ 100 + 40*0.08 + lw/2 ~ 104.6 -> row ~195
    p = tmp_path / "ul.pdf"
    p.write_bytes(_pdf(_annot_page([mk(b"Underline")])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    band = arr[193:198, 120:180]
    assert (band[..., 1] < 200).any()          # some red ink in the band
    assert (arr[170, 150] > 240).all()         # mid-quad untouched
    # Squiggly: ink somewhere in the bottom zone, none at mid-height
    p = tmp_path / "sq2.pdf"
    p.write_bytes(_pdf(_annot_page([mk(b"Squiggly")])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr[186:200, 110:190][..., 1] < 200).any()
    assert (arr[165, 150] > 240).all()


def test_synth_polygon(tmp_path):
    """Polygon without /AP: /Vertices closed, /IC filled, /C stroked."""
    annot = (b"<< /Type /Annot /Subtype /Polygon /Rect [40 140 260 260] "
             b"/Vertices [150 250 250 150 50 150] /C [0 0 0] "
             b"/IC [0 1 0] /BS << /W 2 >> >>")
    p = tmp_path / "pg.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    c = arr[117, 150]  # triangle centroid (page ~(150,183))
    assert c[1] > 180 and c[0] < 80
    assert (arr[117, 60] > 240).all()  # outside the triangle, inside rect


def test_synth_freetext_text_background_border(tmp_path):
    """FreeText without /AP: /C background filled, default 1pt black
    border, /Contents laid out with the /DA color+size (12.5.6.6)."""
    annot = (b"<< /Type /Annot /Subtype /FreeText /Rect [50 200 250 260] "
             b"/C [1 1 0] /DA (0 0 1 rg /Helv 14 Tf) "
             b"/Contents (Hello) >>")
    p = tmp_path / "ft.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # background: yellow away from the text (right half, lower band)
    bg = arr[80:95, 180:240]
    assert (bg[..., 0] > 200).all() and (bg[..., 1] > 200).all()
    assert (bg[..., 2] < 100).all()
    # text: blue ink in the first-line band near the left edge
    band = arr[42:58, 52:140]
    blue = (band[..., 2].astype(int) - band[..., 0].astype(int)) > 80
    assert blue.any(), "no blue /DA-colored text ink"
    # border: black frame at the rect edge (page x=50 -> col 50)
    assert (arr[70, 50] < 100).all()
    # outside stays white
    assert (arr[70, 40] > 240).all()


def test_synth_freetext_wraps_and_centers(tmp_path):
    """Long /Contents word-wraps to multiple lines inside /Rect; /Q 1
    centers each line."""
    words = b"lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    annot = (b"<< /Type /Annot /Subtype /FreeText /Rect [60 120 240 260] "
             b"/DA (0 g /Helv 12 Tf) /Q 1 /BS << /W 0 >> "
             b"/Contents (" + words + b") >>")
    p = tmp_path / "ftw.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    ink = (arr[..., 0] < 128)
    rows = np.where(ink.any(axis=1))[0]
    cols = np.where(ink.any(axis=0))[0]
    assert len(rows) > 0, "no text ink at all"
    # multiple lines: ink spans well beyond one 12pt line height
    assert rows.max() - rows.min() > 20, (rows.min(), rows.max())
    # /Q 1: ink is horizontally centered on the rect center (col 150)
    centroid = cols.mean()
    assert abs(centroid - 150) < 15, centroid
    # stays inside /Rect (cols 60..240, rows 40..180)
    assert cols.min() >= 60 and cols.max() <= 240
    assert rows.min() >= 40 and rows.max() <= 180


def test_synth_stamp_banner(tmp_path):
    """Stamp without /AP: rounded green banner for /Approved with the
    spaced-uppercase name as text; corners stay unpainted (rounded)."""
    annot = (b"<< /Type /Annot /Subtype /Stamp /Rect [60 100 240 160] "
             b"/Name /Approved >>")
    p = tmp_path / "st.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # top border band: green stroke (page y~158 -> device row ~142)
    top = arr[140:146, 130:170]
    green = (top[..., 1].astype(int) - top[..., 0].astype(int)) > 40
    assert green.any(), "no green border stroke"
    # text ink somewhere in the central band
    mid = arr[160:182, 80:220]
    assert ((mid[..., 1].astype(int) - mid[..., 0].astype(int)) > 40).any()
    # rounded corner: the /Rect corner itself stays white
    assert (arr[198, 62] > 240).all()
    assert (arr[142, 62] > 240).all()


def test_synth_stamp_camelcase_and_color_families(tmp_path):
    """/NotApproved renders red; camel-case name still produces ink."""
    annot = (b"<< /Type /Annot /Subtype /Stamp /Rect [40 100 260 160] "
             b"/Name /NotApproved >>")
    p = tmp_path / "st2.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    ink = arr[138:202, 40:262]
    red = (ink[..., 0].astype(int) - ink[..., 1].astype(int)) > 40
    assert red.any(), "no red stamp ink"


def test_annotations_flow_through_pipeline(tmp_path):
    """E2E: a page whose figure region carries AP-less annotations
    (Highlight over the chart, a FreeText note, a red /NotApproved
    stamp) runs the full pipeline; the synthesized annotation ink is
    part of the rendered crop pixels, like fitz get_pixmap's default."""
    from synapta_tpu.config import PipelineConfig
    from synapta_tpu.llm.fake import DisabledClient
    from synapta_tpu.pipeline import VisualSegmentationPipeline

    # 612x792 page: a boxed "chart" (drawings) above a caption line,
    # non-embedded Helvetica (substitute-font path), three AP-less annots
    # overlapping the figure region
    contents = (
        b"1 w 0 G 100 420 400 260 re S\n"
        b"120 440 m 180 560 l 260 500 l 340 620 l 420 520 l S\n"
        b"BT /F1 11 Tf 100 395 Td (Figure 3.1 Annotated trend chart) Tj ET\n"
    )
    annots = [
        (b"<< /Type /Annot /Subtype /Highlight /Rect [120 500 300 560] "
         b"/C [1 1 0] /QuadPoints [120 560 300 560 120 500 300 500] >>"),
        (b"<< /Type /Annot /Subtype /FreeText /Rect [310 430 470 470] "
         b"/DA (0 0 1 rg /Helv 10 Tf) /Contents (check this spike) >>"),
        (b"<< /Type /Annot /Subtype /Stamp /Rect [350 580 490 640] "
         b"/Name /NotApproved >>"),
    ]
    refs = b" ".join(b"%d 0 R" % (6 + k) for k in range(len(annots)))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
         b"/Annots [" + refs + b"] >>"),
        _stream(b"", contents),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ] + annots
    p = tmp_path / "annotbook.pdf"
    p.write_bytes(_pdf(objs))

    out = str(tmp_path / "annot_out")
    pipe = VisualSegmentationPipeline(
        book_id="annotbook", pdf_path=str(p), output_dir=out,
        config=PipelineConfig(use_vision_llm=False, pages_per_batch=1),
        llm_client=DisabledClient(), resume=False,
    )
    segs = pipe.process()
    pipe.close()
    assert pipe.stats.errors == 0
    assert len(segs) >= 1
    # the crop covering the chart contains the synthesized annotation ink
    from PIL import Image

    found_yellow = found_red = False
    for f in os.listdir(out):
        if not f.endswith(".png"):
            continue
        arr = np.asarray(Image.open(os.path.join(out, f)).convert("RGB"))
        r = arr[..., 0].astype(int)
        g = arr[..., 1].astype(int)
        b = arr[..., 2].astype(int)
        if ((r > 180) & (g > 180) & (b < 120)).any():
            found_yellow = True
        if (((r - g) > 60) & ((r - b) > 60) & (r > 100)).any():
            found_red = True
    assert found_yellow, "highlight ink missing from crops"
    assert found_red, "stamp ink missing from crops"


def test_synth_widget_text_field_and_checkbox(tmp_path):
    """AP-less Widget fields: a /Tx field renders /MK decoration and its
    /V value via /DA; a checked /Btn renders a check mark."""
    annots = [
        (b"<< /Type /Annot /Subtype /Widget /FT /Tx /Rect [50 220 250 250] "
         b"/V (Jordan Smith) /DA (0 0 1 rg /Helv 0 Tf) "
         b"/MK << /BG [0.9 0.9 0.9] /BC [0 0 0] >> /BS << /W 1 >> >>"),
        (b"<< /Type /Annot /Subtype /Widget /FT /Btn /Rect [100 100 130 130] "
         b"/V /Yes /MK << /BC [0 0 0] >> /BS << /W 1 >> >>"),
    ]
    p = tmp_path / "wid.pdf"
    p.write_bytes(_pdf(_annot_page(annots)))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # text field: gray background band inside the rect
    band = arr[55:75, 180:240]
    assert ((band > 215) & (band < 245)).all(), "no /MK /BG fill"
    # blue /DA-colored value text near the left
    txt = arr[52:78, 52:170]
    assert ((txt[..., 2].astype(int) - txt[..., 0].astype(int)) > 80).any()
    # border stroke at the rect edge
    assert (arr[65, 50] < 100).all()
    # checkbox: black check ink inside, border at edge
    inner = arr[175:195, 105:128]
    assert (inner < 100).any(), "no check-mark ink"
    assert (arr[185, 100] < 100).all()
    # unchecked sibling would paint nothing: outside stays white
    assert (arr[65, 40] > 240).all()


def test_synth_widget_inherits_from_parent_and_acroform(tmp_path):
    """Field /FT //V inherited through /Parent; /DA from the AcroForm."""
    parent = (b"<< /FT /Tx /V (inherited value) /T (root) "
              b"/Kids [6 0 R] >>")
    annot = (b"<< /Type /Annot /Subtype /Widget /Parent 5 0 R "
             b"/Rect [60 150 260 180] >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R /AcroForm << /DA (0 g /Helv 10 Tf) "
        b"/Fields [5 0 R] >> >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
         b"/Resources << >> /Contents 4 0 R /Annots [6 0 R] >>"),
        _stream(b"", b""),
        parent,
        annot,
    ]
    p = tmp_path / "widp.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    ink = arr[120:150, 60:260]
    assert (ink < 100).any(), "inherited /V text not rendered"


def test_synth_widget_choice_field(tmp_path):
    """AP-less /Ch field renders its selected /V (array takes the
    first entry) like a text field."""
    annot = (b"<< /Type /Annot /Subtype /Widget /FT /Ch "
             b"/Rect [60 150 260 180] /V [(Equities) (Bonds)] "
             b"/DA (0 g /Helv 10 Tf) >>")
    p = tmp_path / "widc.pdf"
    p.write_bytes(_pdf(_annot_page([annot])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr[120:150, 60:260] < 100).any(), "choice value not rendered"

def test_synth_widget_radio_group_keys_on_as(tmp_path):
    """Radio group: /V lives on the parent field, each kid widget carries
    its own /AS on-state — only the kid whose /AS equals /V is painted
    (MuPDF pdf_appearance.c keys on/off per widget)."""
    parent = b"<< /FT /Btn /V /Opt2 /T (grp) /Kids [6 0 R 7 0 R] >>"
    kid1 = (b"<< /Type /Annot /Subtype /Widget /Parent 5 0 R /AS /Opt1 "
            b"/Rect [60 100 90 130] >>")
    kid2 = (b"<< /Type /Annot /Subtype /Widget /Parent 5 0 R /AS /Opt2 "
            b"/Rect [160 100 190 130] >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [5 0 R] >> >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
         b"/Resources << >> /Contents 4 0 R /Annots [6 0 R 7 0 R] >>"),
        _stream(b"", b""),
        parent,
        kid1,
        kid2,
    ]
    p = tmp_path / "radio.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    unselected = arr[170:200, 60:90]
    selected = arr[170:200, 160:190]
    assert (unselected > 240).all(), "unselected radio kid painted a check"
    assert (selected < 100).any(), "selected radio kid missing its check"


def test_synth_widget_signature_field(tmp_path):
    """AP-less /Sig fields: a signed field (dict /V) renders the signer
    /Name as a fitted placeholder; an unsigned field paints nothing."""
    sig = b"<< /Type /Sig /Filter /Adobe.PPKLite /Name (Avery Quinn) >>"
    signed = (b"<< /Type /Annot /Subtype /Widget /FT /Sig "
              b"/Rect [50 150 250 200] /V 5 0 R >>")
    unsigned = (b"<< /Type /Annot /Subtype /Widget /FT /Sig "
                b"/Rect [50 60 250 110] >>")
    p = tmp_path / "sig.pdf"
    p.write_bytes(_pdf(_annot_page([signed, unsigned], extra_objs=[sig])))
    arr = open_pdf(str(p)).render(0, dpi=72)
    assert (arr[100:150, 50:250] < 100).any(), "signer name not rendered"
    assert (arr[190:240, 50:250] > 240).all(), "unsigned field painted ink"
