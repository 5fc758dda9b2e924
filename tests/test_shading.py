"""Axial/radial shading paint (native/src/content.cc build_shading +
raster.cc draw_shading): the `sh` operator and PatternType-2 pattern
fills, with exponential (Type 2) and stitching (Type 3) functions.
Gradient-filled chart bars are ubiquitous in finance textbooks; the
reference rendered them via MuPDF (ref pdf_image_segmentation.py:3638).
Pixel assertions check the gradient's endpoint colors and monotonicity.
"""
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


def _page_objs(contents, extra_res=b"", extra_objs=()):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 300] "
         b"/Resources << " + extra_res + b" >> /Contents 4 0 R >>"),
        _stream(b"", contents),
    ]
    objs.extend(extra_objs)
    return objs


def test_sh_axial_red_to_blue(tmp_path):
    """`sh` paints the clip with a left-to-right red->blue axial gradient."""
    # clip to a 200x100 rect at (50,100); shade along x from 50 to 250
    content = b"q 50 100 200 100 re W n /S0 sh Q\n"
    shading = (b"<< /ShadingType 2 /ColorSpace /DeviceRGB "
               b"/Coords [50 0 250 0] /Extend [true true] "
               b"/Function << /FunctionType 2 /Domain [0 1] "
               b"/C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>")
    objs = _page_objs(content, b"/Shading << /S0 " + shading + b" >>")
    p = tmp_path / "ax.pdf"
    p.write_bytes(_pdf(objs))
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)  # 300x300 px, y flipped (top-left origin)
    # page y in [100,200] -> device rows [100,200); sample row 150
    row = arr[150]
    left, mid, right = row[55], row[150], row[245]
    assert left[0] > 200 and left[2] < 60      # red end
    assert right[2] > 200 and right[0] < 60    # blue end
    assert abs(int(mid[0]) - 128) < 30 and abs(int(mid[2]) - 128) < 30
    # outside the clip stays white
    assert (arr[50, 150] > 240).all()


def test_pattern_fill_axial_vertical(tmp_path):
    """A rect filled through a /Pattern cs shading pattern (the gradient
    chart-bar case), vertical white->black, stitching function."""
    content = (b"/Pattern cs /P0 scn 100 50 80 200 re f\n")
    # two stitched Type-2 halves: white->gray, gray->black
    fn = (b"<< /FunctionType 3 /Domain [0 1] /Bounds [0.5] "
          b"/Encode [0 1 0 1] /Functions ["
          b"<< /FunctionType 2 /Domain [0 1] /C0 [1 1 1] /C1 [0.5 0.5 0.5] /N 1 >> "
          b"<< /FunctionType 2 /Domain [0 1] /C0 [0.5 0.5 0.5] /C1 [0 0 0] /N 1 >>"
          b"] >>")
    pat = (b"<< /PatternType 2 /Shading << /ShadingType 2 "
           b"/ColorSpace /DeviceRGB /Coords [0 50 0 250] "
           b"/Extend [true true] /Function " + fn + b" >> >>")
    objs = _page_objs(content, b"/Pattern << /P0 " + pat + b" >>")
    p = tmp_path / "pat.pdf"
    p.write_bytes(_pdf(objs))
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)
    col = arr[:, 140]  # inside the bar (x in [100,180])
    # page y=50 (gradient start, white) = device row 249; y=250 -> row 50
    assert col[245][0] > 230          # bottom: near white
    assert col[55][0] < 40            # top: near black
    mid = col[150]                    # t = 0.5 -> mid gray
    assert abs(int(mid[0]) - 128) < 30
    # outside the bar: white page
    assert (arr[150, 50] > 240).all()
    # gradient is monotone down the bar
    inside = col[60:245, 0].astype(int)
    assert (np.diff(inside) >= -12).all() and inside[0] < inside[-1]


def test_sh_radial(tmp_path):
    """Radial white-center -> black-edge gradient via `sh`."""
    content = b"q 50 50 200 200 re W n /S0 sh Q\n"
    shading = (b"<< /ShadingType 3 /ColorSpace /DeviceGray "
               b"/Coords [150 150 0 150 150 90] /Extend [false true] "
               b"/Function << /FunctionType 2 /Domain [0 1] "
               b"/C0 [1] /C1 [0] /N 1 >> >>")
    objs = _page_objs(content, b"/Shading << /S0 " + shading + b" >>")
    p = tmp_path / "rad.pdf"
    p.write_bytes(_pdf(objs))
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)
    center = arr[150, 150]
    edge = arr[150, 235]   # radius ~85 from center, near r1=90
    assert center[0] > 230           # white center
    assert edge[0] < 60              # dark rim
    # radially monotone: sample a ray
    ray = arr[150, 150:238, 0].astype(int)
    assert (np.diff(ray) <= 10).all()


def test_tiling_pattern_checker_cells(tmp_path):
    """PatternType-1 cells tile truly (round-3 upgrade from the former
    mid-gray degrade): a black quarter-cell produces an alternating
    checker of black and background inside the fill."""
    content = b"/Pattern cs /P0 scn 100 100 100 100 re f\n"
    cell = _stream(
        b"/PatternType 1 /PaintType 1 /TilingType 1 /BBox [0 0 10 10] "
        b"/XStep 10 /YStep 10 /Resources << >>",
        b"0 0 5 5 re f\n")
    objs = _page_objs(content, b"/Pattern << /P0 5 0 R >>", (cell,))
    p = tmp_path / "tile.pdf"
    p.write_bytes(_pdf(objs))
    doc = open_pdf(str(p))
    arr = doc.render(0, dpi=72)
    # fill spans display y 100..200, x 100..200; cell paints pattern-space
    # lower-left quarter. Probe one painted and one background sample.
    region = arr[100:200, 100:200, 0].astype(int)
    dark = int((region < 80).sum())
    light = int((region > 200).sum())
    # quarter coverage: ~25% dark, ~75% background
    assert 1500 < dark < 3800, dark
    assert 5500 < light < 8500, light


def test_rg_after_pattern_fill_resets_to_flat_color(tmp_path):
    """g/rg/k implicitly select a device colorspace (PDF 8.6.8), ending
    any active pattern fill — real streams switch back from
    `/Pattern cs /P0 scn` with a plain `rg` and expect the flat color,
    not the pattern repeated."""
    content = (b"/Pattern cs /P0 scn 50 50 80 200 re f\n"
               b"1 0 0 rg 180 50 80 200 re f\n")
    pat = (b"<< /PatternType 2 /Shading << /ShadingType 2 "
           b"/ColorSpace /DeviceRGB /Coords [0 50 0 250] "
           b"/Extend [true true] /Function "
           b"<< /FunctionType 2 /Domain [0 1] /C0 [1 1 1] /C1 [0 0 0] "
           b"/N 1 >> >> >>")
    objs = _page_objs(content, b"/Pattern << /P0 " + pat + b" >>")
    p = tmp_path / "patrg.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    flat = arr[150, 220]
    assert flat[0] > 220 and flat[1] < 40 and flat[2] < 40, flat.tolist()


def test_separation_and_cmyk_scn_colors(tmp_path):
    """Separation tints run through their tint transform into the
    alternate space — this spot color maps tint t to CMYK (0,t,t,0), so
    full tint paints RED, not gray (and certainly not the white the old
    DeviceGray misread produced). 4-operand sc in DeviceCMYK uses the
    CMYK formula."""
    content = (b"/CS0 cs 1.0 scn 20 200 60 50 re f "
               b"0.2 scn 120 200 60 50 re f "
               b"/DeviceCMYK cs 0 1 1 0 sc 220 200 60 50 re f")
    objs = _page_objs(
        content,
        b"/ColorSpace << /CS0 [/Separation /Spot1 /DeviceCMYK "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0 0] "
        b"/C1 [0 1 1 0] /N 1 >>] >>",
    )
    p = tmp_path / "sep.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    full, light, red = arr[75, 50], arr[75, 150], arr[75, 250]
    # tint 1.0 -> CMYK (0,1,1,0) = pure red via the tint transform
    assert full[0] > 220 and full[1] < 40 and full[2] < 40, full.tolist()
    # tint 0.2 -> CMYK (0,.2,.2,0) = pale pink (255, ~204, ~204)
    assert light[0] > 230 and 180 < light[1] < 225, light.tolist()
    assert red[0] > 220 and red[1] < 50 and red[2] < 50, red.tolist()


def test_tiling_pattern_fill(tmp_path):
    """PatternType-1 tiling fills (hatched chart bars) render the real
    cell tiled through the path — previously a mid-gray degrade. Covers
    colored (PaintType 1) and uncolored (PaintType 2, painted in the
    caller's fill color) cells."""
    cell1 = b"1 0 0 rg 0 0 4 10 re f"         # red vertical bar
    cell2 = b"0 0 10 4 re f"                  # uncolored horizontal bar
    def pat(ptype, cell):
        return (b"<< /Type /Pattern /PatternType 1 /PaintType " +
                str(ptype).encode() +
                b" /TilingType 1 /BBox [0 0 10 10] /XStep 10 /YStep 10 "
                b"/Resources << >> /Length " + str(len(cell)).encode() +
                b" >>\nstream\n" + cell + b"\nendstream")
    content = (b"/Pattern cs /P0 scn 20 150 200 100 re f "
               b"0 0.6 0 rg /Pattern cs /P1 scn 20 20 200 100 re f")
    objs = _page_objs(content,
                      b"/Pattern << /P0 5 0 R /P1 6 0 R >>",
                      (pat(1, cell1), pat(2, cell2)))
    p = tmp_path / "tile.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # colored: vertical red bars across the upper rect (display y 50..150)
    row = arr[100, 20:220]
    red = int(((row[:, 0] > 180) & (row[:, 1] < 90)).sum())
    trans = int(np.abs(np.diff((row[:, 1] < 90).astype(int))).sum())
    assert 50 < red < 130 and trans > 20, (red, trans)
    # uncolored: horizontal GREEN bars (caller fill color) in the lower
    # rect (display y 180..280) — probe a column for on/off runs
    col = arr[180:280, 120]
    green = int(((col[:, 1] > 120) & (col[:, 0] < 90)).sum())
    vtrans = int(np.abs(np.diff((col[:, 0] < 90).astype(int))).sum())
    assert 20 < green < 70 and vtrans > 10, (green, vtrans)


def test_type4_calculator_shading(tmp_path):
    """FunctionType-4 (PostScript calculator) shading functions evaluate
    through the PS mini-interpreter instead of degrading to mid-gray.
    Covers arithmetic/stack ops and ifelse branching."""
    def fnobj(prog: bytes) -> bytes:
        return (b"<< /FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1] "
                b"/Length " + str(len(prog)).encode() +
                b" >>\nstream\n" + prog + b"\nendstream")

    shading = (b"<< /ShadingType 2 /ColorSpace /DeviceRGB "
               b"/Coords [20 150 280 150] /Extend [true true] "
               b"/Function 5 0 R >>")

    # red -> blue via { dup 1 exch sub exch 0 exch } = (1-x, 0, x)
    objs = _page_objs(b"/S0 sh", b"/Shading << /S0 " + shading + b" >>",
                      (fnobj(b"{ dup 1 exch sub exch 0 exch }"),))
    p = tmp_path / "ps4.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    left, mid, right = arr[150, 25], arr[150, 150], arr[150, 275]
    assert left[0] > 220 and left[2] < 40, left.tolist()
    assert right[2] > 220 and right[0] < 40, right.tolist()
    assert 90 < mid[0] < 165 and 90 < mid[2] < 165, mid.tolist()

    # banded via conditional: { 0.5 lt { 1 0 0 } { 0 0 1 } ifelse }
    objs = _page_objs(b"/S0 sh", b"/Shading << /S0 " + shading + b" >>",
                      (fnobj(b"{ 0.5 lt { 1 0 0 } { 0 0 1 } ifelse }"),))
    p2 = tmp_path / "ps4b.pdf"
    p2.write_bytes(_pdf(objs))
    arr = open_pdf(str(p2)).render(0, dpi=72)
    assert arr[150, 60][0] > 220 and arr[150, 240][2] > 220


def test_extgstate_constant_alpha_and_dash(tmp_path):
    """ExtGState /ca //CA constant alpha (matplotlib's alpha= fills emit
    these — rendering them opaque hid content beneath), plus /LW and /D
    dash through the gs operator."""
    content = (b"0 0 1 rg 20 100 200 100 re f "
               b"/GS0 gs 1 0 0 rg 20 100 100 100 re f "
               b"/GS1 gs 0 0 0 RG 4 w 20 50 m 280 50 l S")
    egs = (b"/ExtGState << /GS0 << /ca 0.5 >> "
           b"/GS1 << /CA 0.25 /LW 4 /D [[10 10] 0] >> >>")
    p = tmp_path / "alpha.pdf"
    p.write_bytes(_pdf(_page_objs(content, egs)))
    arr = open_pdf(str(p)).render(0, dpi=72)
    pure, blend = arr[150, 180], arr[150, 60]
    assert pure[2] > 220 and pure[0] < 40, pure.tolist()   # unblended blue
    assert 100 < blend[0] < 160 and 100 < blend[2] < 160, blend.tolist()
    row = arr[250, 20:280, 0].astype(int)
    vals = row[row < 210]
    trans = int(np.abs(np.diff((row < 210).astype(int))).sum())
    assert trans > 10, trans                    # ExtGState /D dashes
    assert 160 < vals.mean() < 210, vals.mean()  # 25% stroke alpha


def test_function_based_shading_type1(tmp_path):
    """ShadingType 1 (function-based): a 2-input Type-4 calculator maps
    (x, y) to color over the Domain; the /Matrix places the domain
    square on the page. Exercises the N-input function evaluator."""
    prog = b"{ exch 0 exch }"  # (x, y) -> rgb (y, 0, x)
    fn = (b"<< /FunctionType 4 /Domain [0 1 0 1] /Range [0 1 0 1 0 1] "
          b"/Length " + str(len(prog)).encode() + b" >>\nstream\n" +
          prog + b"\nendstream")
    shading = (b"<< /ShadingType 1 /ColorSpace /DeviceRGB "
               b"/Domain [0 1 0 1] /Matrix [280 0 0 280 10 10] "
               b"/Function 5 0 R >>")
    p = tmp_path / "sh1.pdf"
    p.write_bytes(_pdf(_page_objs(
        b"/S0 sh", b"/Shading << /S0 " + shading + b" >>", (fn,))))
    arr = open_pdf(str(p)).render(0, dpi=72)
    a, b, m = arr[270, 30], arr[30, 270], arr[150, 150]
    assert a.max() < 50, a.tolist()                     # domain (0,0): dark
    assert b[0] > 200 and b[2] > 200 and b[1] < 40, b.tolist()
    assert 100 < m[0] < 160 and 100 < m[2] < 160, m.tolist()


def test_devicen_exact_tints(tmp_path):
    """Multi-colorant DeviceN scn runs its tint transform exactly via
    the N-input evaluator: two tints map to CMYK (0, t0, t1, 0)."""
    prog = b"{ 0 3 1 roll 0 }"  # (t0, t1) -> (0, t0, t1, 0)
    fn = (b"<< /FunctionType 4 /Domain [0 1 0 1] "
          b"/Range [0 1 0 1 0 1 0 1] /Length " +
          str(len(prog)).encode() + b" >>\nstream\n" + prog +
          b"\nendstream")
    content = b"/CS0 cs 1.0 0 scn 20 200 60 50 re f 0 1.0 scn 120 200 60 50 re f"
    objs = _page_objs(
        content,
        b"/ColorSpace << /CS0 [/DeviceN [/SpotA /SpotB] /DeviceCMYK "
        b"5 0 R] >>", (fn,))
    p = tmp_path / "dn.pdf"
    p.write_bytes(_pdf(objs))
    arr = open_pdf(str(p)).render(0, dpi=72)
    a, b = arr[75, 50], arr[75, 150]
    # t=(1,0): CMYK (0,1,0,0) magenta; t=(0,1): CMYK (0,0,1,0) yellow
    assert a[0] > 220 and a[1] < 40 and a[2] > 220, a.tolist()
    assert b[0] > 220 and b[1] > 220 and b[2] < 40, b.tolist()


def test_mesh_shading_type4_gouraud(tmp_path):
    """ShadingType 4 (free-form Gouraud triangles): vertex stream
    decodes and each triangle interpolates barycentrically — corners
    come out pure, the centroid is the even mix."""
    import struct

    def vert(flag, x, y, r, g, b):
        return (bytes([flag]) +
                struct.pack(">HH", int(x / 300 * 65535),
                            int(y / 300 * 65535)) + bytes([r, g, b]))

    stream = (vert(0, 20, 20, 255, 0, 0) + vert(0, 280, 20, 0, 255, 0) +
              vert(0, 150, 280, 0, 0, 255))
    sh = (b"<< /ShadingType 4 /ColorSpace /DeviceRGB "
          b"/BitsPerCoordinate 16 /BitsPerComponent 8 /BitsPerFlag 8 "
          b"/Decode [0 300 0 300 0 1 0 1 0 1] /Length " +
          str(len(stream)).encode() + b" >>\nstream\n" + stream +
          b"\nendstream")
    p = tmp_path / "mesh.pdf"
    p.write_bytes(_pdf(_page_objs(b"/S0 sh",
                                  b"/Shading << /S0 5 0 R >>", (sh,))))
    arr = open_pdf(str(p)).render(0, dpi=72)
    r, g, b = arr[270, 30], arr[270, 270], arr[40, 150]
    c = arr[190, 150]
    assert r[0] > 180 and r[1] < 90, r.tolist()
    assert g[1] > 180 and g[0] < 90, g.tolist()
    assert b[2] > 180 and b[0] < 90, b.tolist()
    assert all(40 < v < 180 for v in c), c.tolist()


def _coons_vert16(x, y):
    import struct
    return struct.pack(">HH", int(round(x / 300 * 65535)),
                       int(round(y / 300 * 65535)))


def _coons_patch6(flag, pts, cols):
    data = bytes([flag])
    for x, y in pts:
        data += _coons_vert16(x, y)
    for c in cols:
        data += bytes(c)
    return data


def _mesh_sh(stype, stream, extra=b""):
    return (b"<< /ShadingType " + str(stype).encode() +
            b" /ColorSpace /DeviceRGB /BitsPerCoordinate 16 "
            b"/BitsPerComponent 8 /BitsPerFlag 8 "
            b"/Decode [0 300 0 300 0 1 0 1 0 1] " + extra +
            b"/Length " + str(len(stream)).encode() +
            b" >>\nstream\n" + stream + b"\nendstream")


# The square [50,250]^2 whose bottom edge (p11->p41 via p21, p31) bows
# down to y=12.5 at midspan; all other edges straight.  Stream order per
# PDF 32000 type-6 figure: p11 p12 p13 p14 p24 p34 p44 p43 p42 p41 p31 p21.
_COONS_PTS = [
    (50, 50), (50, 117), (50, 183), (50, 250),       # left edge
    (117, 250), (183, 250), (250, 250),              # top edge
    (250, 183), (250, 117), (250, 50),               # right edge
    (183, 0), (117, 0),                              # bowed bottom edge
]
_COONS_COLS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 0, 255)]


def test_mesh_shading_type6_coons_exact(tmp_path):
    """ShadingType 6 (Coons patch): boundary Bezier curves are honored —
    a bowed bottom edge paints BELOW the corner chord, which the old
    corner-quad approximation left white. Corner colors stay pure."""
    stream = _coons_patch6(0, _COONS_PTS, _COONS_COLS)
    p = tmp_path / "coons.pdf"
    p.write_bytes(_pdf(_page_objs(
        b"/S0 sh", b"/Shading << /S0 5 0 R >>",
        (_mesh_sh(6, stream),))))
    arr = open_pdf(str(p)).render(0, dpi=72)
    # bulge: PDF (150, 20) is below the p11-p41 chord (y=50) but inside
    # the bowed edge (y=12.5 at midspan)
    bulge = arr[300 - 20, 150]
    assert bulge.max() - bulge.min() > 30 or bulge.mean() < 220, (
        bulge.tolist())
    # corners
    c1 = arr[300 - 55, 55]     # near p11: red
    c3 = arr[300 - 245, 245]   # near p44: blue
    assert c1[0] > 170 and c1[2] < 110, c1.tolist()
    assert c3[2] > 170 and c3[0] < 110, c3.tolist()


def test_mesh_shading_type7_matches_type6_then_diverges(tmp_path):
    """ShadingType 7 (tensor patch): with interior control points at the
    spec's Coons positions the render matches the type-6 patch; with the
    interior displaced the interior color field moves while the patch
    boundary (set by boundary points alone) stays identical."""
    import numpy as np

    g = np.zeros((4, 4, 2))
    order6 = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 3), (2, 3), (3, 3),
              (3, 2), (3, 1), (3, 0), (2, 0), (1, 0)]
    for (i, j), (x, y) in zip(order6, _COONS_PTS):
        g[i][j] = (x, y)
    # spec Coons interior formulas (zero-based)
    g[1][1] = (-4 * g[0][0] + 6 * (g[0][1] + g[1][0]) -
               2 * (g[0][3] + g[3][0]) + 3 * (g[3][1] + g[1][3]) -
               g[3][3]) / 9
    g[1][2] = (-4 * g[0][3] + 6 * (g[0][2] + g[1][3]) -
               2 * (g[0][0] + g[3][3]) + 3 * (g[3][2] + g[1][0]) -
               g[3][0]) / 9
    g[2][1] = (-4 * g[3][0] + 6 * (g[3][1] + g[2][0]) -
               2 * (g[3][3] + g[0][0]) + 3 * (g[0][1] + g[2][3]) -
               g[0][3]) / 9
    g[2][2] = (-4 * g[3][3] + 6 * (g[3][2] + g[2][3]) -
               2 * (g[3][0] + g[0][3]) + 3 * (g[0][2] + g[2][0]) -
               g[0][0]) / 9

    def render7(interior_dx):
        pts = list(_COONS_PTS)
        for i, j in [(1, 1), (1, 2), (2, 2), (2, 1)]:  # p22 p23 p33 p32
            pts.append((min(300, g[i][j][0] + interior_dx), g[i][j][1]))
        stream = _coons_patch6(0, pts, _COONS_COLS)
        p = tmp_path / f"tensor{interior_dx}.pdf"
        p.write_bytes(_pdf(_page_objs(
            b"/S0 sh", b"/Shading << /S0 5 0 R >>",
            (_mesh_sh(7, stream),))))
        return open_pdf(str(p)).render(0, dpi=72).astype(int)

    stream6 = _coons_patch6(0, _COONS_PTS, _COONS_COLS)
    p6 = tmp_path / "c6.pdf"
    p6.write_bytes(_pdf(_page_objs(
        b"/S0 sh", b"/Shading << /S0 5 0 R >>", (_mesh_sh(6, stream6),))))
    arr6 = open_pdf(str(p6)).render(0, dpi=72).astype(int)
    arr7 = render7(0)
    assert np.abs(arr6 - arr7).mean() < 1.0  # Coons == tensor at spec pts

    warped = render7(60)
    mid = np.abs(arr7[100:200, 100:200] - warped[100:200, 100:200])
    assert mid.mean() > 5.0, mid.mean()      # interior field moved
    covered7 = (arr7 < 250).any(axis=2)
    coveredw = (warped < 250).any(axis=2)
    assert (covered7 != coveredw).mean() < 0.01  # boundary unchanged


def test_mesh_shading_type6_continuation_flag2(tmp_path):
    """A second Coons patch with edge flag 2 reuses the previous patch's
    p44->p41 edge and its c3/c4 colors, extending the paint to the right
    with the correct shared geometry."""
    patch_a = _coons_patch6(0, _COONS_PTS, _COONS_COLS)
    # flag-2 continuation: 8 new boundary points (p24 p34 p44 p43 p42
    # p41 p31 p21) and 2 new colors (c3, c4)
    pts_b = [
        (266, 50), (282, 50), (298, 50),      # p24 p34 p44
        (298, 117), (298, 183), (298, 250),   # p43 p42 p41
        (282, 250), (266, 250),               # p31 p21
    ]
    patch_b = _coons_patch6(2, pts_b, [(255, 255, 0), (0, 255, 255)])
    p = tmp_path / "cont.pdf"
    p.write_bytes(_pdf(_page_objs(
        b"/S0 sh", b"/Shading << /S0 5 0 R >>",
        (_mesh_sh(6, patch_a + patch_b),))))
    arr = open_pdf(str(p)).render(0, dpi=72)
    near_c3 = arr[300 - 55, 294]    # new p44 corner: yellow
    near_c4 = arr[300 - 245, 294]   # new p41 corner: cyan
    assert near_c3[0] > 150 and near_c3[1] > 150 and near_c3[2] < 120, (
        near_c3.tolist())
    assert near_c4[1] > 150 and near_c4[2] > 150 and near_c4[0] < 120, (
        near_c4.tolist())
    # shared edge continuity: pixels just left/right of x=250 both painted
    left, right = arr[150, 246], arr[150, 254]
    assert left.min() < 250 and right.min() < 250
